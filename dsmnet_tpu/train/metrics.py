"""Accuracy metrics and host-side meters.

D1/EPE exactly as the reference driver computes them (stereo.py:103-113):
EPE = mean |d - d_gt| over d_gt > 0; D1 = percentage of valid pixels
that are neither within 3px nor within 5% of ground truth.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["d1_epe", "AverageMeter"]


def d1_epe(disp: jnp.ndarray, disp_gt: jnp.ndarray):
    """Returns (d1_percent, epe) as scalars; zero-valid-pixel batches give
    (0, 0) rather than NaN so meters can skip them."""
    mask = (disp_gt > 0).astype(disp.dtype)
    count = jnp.sum(mask)
    safe = jnp.maximum(count, 1.0)
    diff = jnp.abs(disp_gt - disp)
    epe = jnp.sum(diff * mask) / safe
    good = (diff <= 3.0) | (diff / jnp.maximum(disp_gt, 1e-9) <= 0.05)
    d1 = 100.0 - 100.0 * jnp.sum(good.astype(disp.dtype) * mask) / safe
    d1 = jnp.where(count > 0, d1, 0.0)
    epe = jnp.where(count > 0, epe, 0.0)
    return d1, epe


class AverageMeter:
    """Running value/average meter (reference utils/utils.py:87-117)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
