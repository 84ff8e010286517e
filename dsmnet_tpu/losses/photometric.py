"""Self-supervised photometric loss family (reference losses/loss.py:149-512).

Pure-function ports of the four per-level losses and the two pyramid
orchestrators, designed to sit inside a single jitted train step that
runs both the original and the flipped-view forward pass:

  * ``common``     — 0.425*(1-SSIM) + 0.15*L1 + w*C_ds3 + w*LR-consistency
  * ``depthmono``  — Monodepth variant with C_ds1 smoothness
  * ``cap``        — configurable: 'ds'/'lr' substrings in the loss name
                     toggle the smoothness / LR terms
  * ``sssmnet``    — adds loop-closure |im - im_wrap1|, 2nd-order
                     smoothness, and the max-disparity heuristic

Shared machinery: the similarity-gated weight w = max(0, SSIM-0.75)/2 +
0.001 (loss.py:33-34) computed with a stop-gradient, occlusion weighting
from LR-disparity agreement (loss.py:393-404), and the image pyramid via
::2 striding (loss.py:17-22).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import (
    c_ds1,
    c_ds2,
    c_ds3,
    c_imdiff1,
    imwarp,
    ssim_map,
    upsample_bilinear,
    warp_disparity,
)

__all__ = [
    "photometric_pyramid_loss",
    "weight_common",
    "PhotoLossConfig",
]

_BASE_W_AP = 1.0
_W_MDH = 1e-4


@dataclasses.dataclass(frozen=True)
class PhotoLossConfig:
    """Static configuration parsed from the reference's loss-name DSL."""

    kind: str  # 'common' | 'depthmono' | 'cap' | 'sssmnet'
    flag_mask: bool = False
    with_ds: bool = True  # cap only: 'ds' substring toggle (loss.py:270)
    with_lr: bool = True  # cap only: 'lr' substring toggle (loss.py:275)


def _wfun(sim: jnp.ndarray) -> jnp.ndarray:
    """Similarity-gated ds/lr weight (loss.py:33-34)."""
    return jnp.maximum(0.0, sim - 0.75) / 2.0 + 0.001


def _masked_mean(x, mask):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def _similarity(ssim, mask_ap, fallback_all: bool):
    """stop-grad mean SSIM over the valid-warp mask; ``fallback_all``
    reproduces the <1024-valid-pixels guard (loss.py:157-158)."""
    sim_masked = _masked_mean(ssim, mask_ap)
    if fallback_all:
        count = jnp.sum(mask_ap)
        sim = jnp.where(count < 1024, jnp.mean(ssim), sim_masked)
    else:
        sim = sim_masked
    return jax.lax.stop_gradient(sim)


def weight_common(disp, disp_wrap, factor=1.0):
    """Occlusion weight from LR disparity agreement (loss.py:393-404):
    1.0 below 1px, linear ramp to 0.01 at 3px, 0.01 beyond."""
    delt = jax.lax.stop_gradient(jnp.abs(disp - disp_wrap)) / factor
    ramp = 1.0 - (delt - 1.0) * (0.99 / 2.0)
    w = jnp.where(delt < 1.0, 1.0, jnp.where(delt < 3.0, ramp, 0.01))
    return w


def _apply_occlusion(C_ap, C_lr, invalid, mask_ap, w_common):
    """Occlusion masking shared by all kinds (loss.py:170-178):
    weight_im = 1 where (invalid & mask_ap), else w_common;
    weight_lr = 0 where invalid, else w_common."""
    if w_common is None:
        return C_ap, C_lr
    weight_im = jnp.where(invalid & mask_ap, 1.0, w_common)
    weight_lr = jnp.where(invalid, 0.0, w_common)
    return C_ap * weight_im, C_lr * weight_lr


def _level_loss(cfg: PhotoLossConfig, im, im_wrap, disp, aux, factor, w_common):
    """One pyramid level.  ``aux`` is disp_wrap for common/depthmono/cap
    and im_wrap1 (the loop-closure warp) for sssmnet."""
    ssim = ssim_map(im, im_wrap)
    mask_ap = im_wrap[..., :1] != 0
    fallback = cfg.kind in ("common", "depthmono")
    w = _wfun(_similarity(ssim, mask_ap, fallback))

    if cfg.kind == "sssmnet":
        C_ap = (0.85 * 0.5) * (1.0 - ssim) + 0.15 * (
            jnp.abs(im - im_wrap) + c_imdiff1(im, im_wrap)
        )
        C_lr = jnp.abs(im - aux)
        invalid = aux[..., :1] == 0
    else:
        C_ap = (0.85 * 0.5) * (1.0 - ssim) + 0.15 * jnp.abs(im - im_wrap)
        C_lr = jnp.abs(disp - aux)
        invalid = aux == 0

    C_ap, C_lr = _apply_occlusion(C_ap, C_lr, invalid, mask_ap, w_common)

    C_ap_m = jnp.mean(C_ap)
    C_lr_m = jnp.mean(C_lr)

    if cfg.kind == "common":
        return C_ap_m * _BASE_W_AP + jnp.mean(c_ds3(im, disp)) * w + C_lr_m * w
    if cfg.kind == "depthmono":
        return C_ap_m * _BASE_W_AP + jnp.mean(c_ds1(im, disp)) * w + C_lr_m * w
    if cfg.kind == "cap":
        C = C_ap_m * _BASE_W_AP
        if cfg.with_ds:
            C = C + jnp.mean(c_ds1(im, disp)) * (w / factor)
        if cfg.with_lr:
            C = C + C_lr_m * w
        return C
    if cfg.kind == "sssmnet":
        return (
            C_ap_m * _BASE_W_AP
            + jnp.mean(c_ds2(im, disp)) * (w / factor)
            + C_lr_m * w
            + jnp.mean(jnp.abs(disp)) * _W_MDH
        )
    raise ValueError(cfg.kind)


def _strided_pyramid(im, levels):
    """Image pyramid by ::2 striding (loss.py:17-22)."""
    pyr = [im]
    for _ in range(1, levels):
        pyr.append(pyr[-1][:, ::2, ::2, :])
    return pyr


def photometric_pyramid_loss(
    cfg: PhotoLossConfig,
    imR_src: jnp.ndarray,
    imL: jnp.ndarray,
    dispLs: list[jnp.ndarray],
    scales: list[int],
    left_top: tuple[int, int],
    imR1_src: jnp.ndarray,
    imL1: jnp.ndarray,
    dispL1s: list[jnp.ndarray],
    scales1: list[int],
    left_top1: tuple[int, int],
    weights: jnp.ndarray,
    eps: float = 5.5e-5,
) -> jnp.ndarray:
    """Two-view photometric pyramid loss (loss.py:424-512).

    ``imR_src``/``imR1_src`` are the *uncropped* right sources so the warp
    can sample real content outside the crop window (``left_top``);
    ``imL``/``imL1`` are the cropped left targets.  ``weights`` is the
    per-scale curriculum vector.
    """
    count = len(scales)
    maxlevel = min(2, max(scales))
    i0 = next(i for i, s in enumerate(scales) if s == maxlevel)
    h, w = dispLs[i0].shape[1], dispLs[i0].shape[2]
    imLs = _strided_pyramid(imL, maxlevel + 1)
    imL1s = _strided_pyramid(imL1, maxlevel + 1)

    loss = jnp.asarray(0.0, imL.dtype)
    for i in range(count):
        level = scales[i]
        if level > maxlevel:
            up = 2 ** (level - maxlevel)
            dispL = upsample_bilinear(dispLs[i], up)[:, :h, :w, :]
            dispL1 = upsample_bilinear(dispL1s[i], up)[:, :h, :w, :]
            scale_factor = 2**maxlevel
        else:
            dispL, dispL1 = dispLs[i], dispL1s[i]
            scale_factor = 2**level

        imL_wrap = imwarp(imR_src, dispL, False, left_top, scale_factor, eps)
        imL1_wrap = imwarp(imR1_src, dispL1, False, left_top1, scale_factor, eps)

        w_common = w_common1 = None
        if cfg.kind == "sssmnet":
            aux = warp_disparity(imL1_wrap, dispL, eps)  # imL_wrap1 loop closure
            aux1 = warp_disparity(imL_wrap, dispL1, eps)
            if cfg.flag_mask:
                dispL_wrap = warp_disparity(dispL1, dispL, eps)
                dispL1_wrap = warp_disparity(dispL, dispL1, eps)
                w_common = weight_common(dispL, dispL_wrap, scale_factor)
                w_common1 = weight_common(dispL1, dispL1_wrap, scale_factor)
        else:
            aux = warp_disparity(dispL1, dispL, eps)  # dispL_wrap
            aux1 = warp_disparity(dispL, dispL1, eps)
            if cfg.flag_mask:
                w_common = weight_common(dispL, aux, scale_factor)
                w_common1 = weight_common(dispL1, aux1, scale_factor)

        im_t = imLs[min(level, maxlevel)]
        im1_t = imL1s[min(level, maxlevel)]
        tmp = _level_loss(cfg, im_t, imL_wrap, dispL, aux, 2**level, w_common)
        tmp1 = _level_loss(cfg, im1_t, imL1_wrap, dispL1, aux1, 2**level, w_common1)
        loss = loss + (tmp + tmp1) * weights[level]
    return loss
