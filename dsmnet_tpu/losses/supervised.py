"""Supervised pyramid disparity loss (reference losses/loss.py:326-338,407-421).

Per-level: upsample the level's prediction to full resolution
(align-corners bilinear, scale 2^level), masked (gt > 0) L1, plus an
optional smoothness term 0.1 * mean(clip(|dx|+|dy|, 0, 1)) over the same
mask.  Levels are combined with the curriculum weights (indexed by
*scale*, not output position).

All levels are computed and weighted every step — the reference skips
``weight <= 0`` levels, but after its per-epoch curriculum adjustment
every weight has a 0.01 floor (loss.py:379-391), so computing all levels
matches the running behavior and keeps the jitted graph static.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import diff1_dx, diff1_dy, upsample_bilinear

__all__ = ["supervised_pyramid_loss", "supervised_level_loss"]


def supervised_level_loss(
    disp_gt: jnp.ndarray,
    disp: jnp.ndarray,
    flag_smooth: bool = False,
    factor: float = 1.0,
) -> jnp.ndarray:
    """Masked L1 (+ optional clipped smoothness) at one level
    (loss.py:326-338)."""
    mask = (disp_gt > 0).astype(disp.dtype)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(jnp.abs(disp_gt - disp) * mask) / count
    if flag_smooth:
        dxdy = (jnp.abs(diff1_dx(disp)) + jnp.abs(diff1_dy(disp))) / factor
        smooth = jnp.sum(jnp.clip(dxdy, 0.0, 1.0) * mask) / count
        loss = loss + 0.1 * smooth
    return loss


def supervised_pyramid_loss(
    disp_gt: jnp.ndarray,
    disps: list[jnp.ndarray],
    scales: list[int],
    weights: jnp.ndarray,
    flag_smooth: bool = True,
) -> jnp.ndarray:
    """Weighted sum of per-level supervised losses (loss.py:407-421).

    ``weights`` is the per-scale curriculum vector (count_levels,).
    """
    h, w = disp_gt.shape[1], disp_gt.shape[2]
    loss = jnp.asarray(0.0, disp_gt.dtype)
    for i, level in enumerate(scales):
        pred = disps[i]
        if level > 0:
            pred = upsample_bilinear(pred, 2**level)[:, :h, :w, :]
        loss = loss + weights[level] * supervised_level_loss(
            disp_gt, pred, flag_smooth, factor=1.0
        )
    return loss
