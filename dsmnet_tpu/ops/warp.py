"""Disparity-based view synthesis (image warping) as a vectorized gather.

Re-implements the semantics of the reference's ``imwrap_BCHW``
(reference: utils/imwrap.py:37-72) without its per-batch/per-row Python
grid-building loop: the sample grid there reduces to the closed form

    px(i, j) = X0 + j*scale - disp[i, j]              (fliplr=False)
    px(i, j) = (W0-1-X0) - j*scale + disp[i, j]       (fliplr=True)
    py(i, j) = Y0 + i*scale

where (X0, Y0) = ``left_top`` is the crop window origin inside the source
image and ``scale`` relates output pixels to source pixels.  Sampling is
bilinear with zero padding outside the source extent — identical to
``F.grid_sample(..., padding_mode='zeros')`` with the align_corners=True
normalization torch 0.3 used.

The reference adds a small random epsilon to the source image before
sampling (utils/imwrap.py:70-71) so that genuinely-sampled pixels are
nonzero and downstream ``im_wrap != 0`` masks identify out-of-view
regions.  We keep that semantic via the ``eps`` argument (a deterministic
default inside jit; pass a value drawn from a PRNG for exact parity).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["imwarp", "warp_disparity"]


def imwarp(
    im_src: jnp.ndarray,
    disp: jnp.ndarray,
    fliplr: bool = False,
    left_top: tuple[float, float] = (0.0, 0.0),
    scale_factor: float = 1.0,
    eps: float = 5.5e-5,
) -> jnp.ndarray:
    """Warp ``im_src`` (N,H0,W0,C) by left-view disparity ``disp`` (N,H,W,1).

    Returns the synthesized left view (N,H,W,C).  ``left_top`` is (x, y) in
    source pixels; ``scale_factor`` maps one output pixel to that many
    source pixels (used when warping a full-resolution source with a
    pyramid-level disparity; reference losses/loss.py:449-452).
    """
    n, h0, w0, c = im_src.shape
    nb, h, w, cd = disp.shape
    assert cd == 1, f"disparity must have one channel, got {cd}"

    x0, y0 = left_top
    jj = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1,1,W)
    ii = jnp.arange(h, dtype=jnp.float32)[None, :, None]  # (1,H,1)
    d = disp[..., 0]  # (N,H,W)

    if fliplr:
        px = (w0 - 1.0 - x0) - jj * scale_factor + d
    else:
        px = x0 + jj * scale_factor - d

    src = im_src + jnp.asarray(eps, im_src.dtype)

    # Horizontal fast path: at every loss call site the crop origin and
    # scale are integers (left_top = (nedge, nedge), scale = 2^level),
    # so the vertical sample coordinate y0 + i*s is EXACT — the source
    # rows are a static strided slice and the 4-tap bilinear gather
    # collapses to a 2-tap horizontal one.  Warp gathers are the
    # self-supervised step's largest cost (~32% of the b1 step, r5
    # trace); this halves them.  Bit-identical to the generic path
    # (there wy == 0 and the bottom taps contribute exactly zero).
    s_i = int(scale_factor) if float(scale_factor).is_integer() else None
    y0_i = int(y0) if float(y0).is_integer() else None
    if (
        s_i is not None and y0_i is not None
        and 0 <= y0_i and y0_i + s_i * (h - 1) < h0
    ):
        rows = src[:, y0_i : y0_i + s_i * h : s_i]  # (N, H, W0, C)
        return _bilinear_gather_zero_pad_h(rows, px)

    py = jnp.broadcast_to(y0 + ii * scale_factor, d.shape)
    return _bilinear_gather_zero_pad(src, px, py)


def _bilinear_gather_zero_pad_h(rows, px):
    """2-tap horizontal bilinear sample: rows (N,H,W0,C) are already the
    correct source rows; px (N,H,W) float column coords; out-of-range
    taps contribute zero (grid_sample 'zeros' semantics)."""
    n, h, w0, c = rows.shape

    x0f = jnp.floor(px)
    wx = (px - x0f).astype(rows.dtype)[..., None]
    x0 = x0f.astype(jnp.int32)

    def tap(xi):
        valid = ((xi >= 0) & (xi <= w0 - 1))[..., None].astype(rows.dtype)
        xc = jnp.clip(xi, 0, w0 - 1)
        vals = jnp.take_along_axis(rows, xc[..., None], axis=2)
        return vals * valid

    v0 = tap(x0)
    v1 = tap(x0 + 1)
    return v0 * (1.0 - wx) + v1 * wx


def _bilinear_gather_zero_pad(
    src: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample ``src`` (N,H0,W0,C) at float pixel coords (N,H,W).

    Out-of-bounds corner taps contribute zero (grid_sample 'zeros'
    semantics: each bilinear corner outside the image is a zero sample,
    partial borders blend toward zero).
    """
    n, h0, w0, c = src.shape

    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = (px - x0f).astype(src.dtype)[..., None]  # (N,H,W,1)
    wy = (py - y0f).astype(src.dtype)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    def tap(yi, xi):
        valid = (
            (xi >= 0) & (xi <= w0 - 1) & (yi >= 0) & (yi <= h0 - 1)
        )[..., None].astype(src.dtype)
        xc = jnp.clip(xi, 0, w0 - 1)
        yc = jnp.clip(yi, 0, h0 - 1)
        # flatten spatial for a single-axis gather: TPU-friendlier than a 2-D
        # gather and lets XLA vectorize the trailing channel dim
        flat = src.reshape(n, h0 * w0, c)
        idx = yc * w0 + xc  # (N,H,W)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1
        ).reshape(*idx.shape, c)
        return vals * valid

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def warp_disparity(
    disp_other: jnp.ndarray,
    disp: jnp.ndarray,
    eps: float = 5.5e-5,
) -> jnp.ndarray:
    """Warp the flipped-view disparity map into this view (LR-consistency).

    Shorthand for the reference's ``imwrap_BCHW(dispL1, dispL, fliplr=True,
    LeftTop=[0,0], scale_factor=1)`` pattern (losses/loss.py:451-452).
    """
    return imwarp(disp_other, disp, fliplr=True, left_top=(0.0, 0.0), scale_factor=1.0, eps=eps)
