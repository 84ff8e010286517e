"""Align-corners bilinear/trilinear resizing as dense interpolation matmuls.

The reference relies on torch-0.3 ``nn.Upsample(mode='bilinear')`` and
``F.upsample(..., mode='trilinear')`` whose (only) behavior was
``align_corners=True`` (reference: models/dispnet.py:22, losses/loss.py:417,
models/psmnet/stackhourglass.py:152-163).  ``jax.image.resize`` implements
half-pixel (align_corners=False) sampling, so we build the exact
align-corners interpolation operators ourselves.

TPU-first design: 1-D interpolation is expressed as a small dense matrix
``A[out, in]`` and applied with an einsum per axis — these lower to MXU
matmuls that XLA fuses with neighboring ops, instead of gather chains.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = [
    "interp_matrix",
    "resize_bilinear",
    "upsample2x",
    "upsample_bilinear",
    "resize_trilinear",
]


@functools.lru_cache(maxsize=None)
def interp_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Dense 1-D align-corners linear interpolation matrix (n_out, n_in).

    Row i holds the bilinear weights with which input samples combine to
    produce output sample i, with src = i * (n_in-1)/(n_out-1).
    """
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1 or n_out == 1:
        # degenerate axes: every output copies input sample 0 (align-corners
        # with a single output lands on src=0)
        A[:, 0] = 1.0
        return A
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    j0 = np.floor(src).astype(np.int64)
    j0 = np.minimum(j0, n_in - 2)
    frac = (src - j0).astype(np.float32)
    rows = np.arange(n_out)
    A[rows, j0] = 1.0 - frac
    A[rows, j0 + 1] = frac
    return A


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Align-corners bilinear resize of NHWC ``x`` to spatial ``out_hw``."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    dt = x.dtype
    Ah = jnp.asarray(interp_matrix(oh, h), dtype=dt)
    Aw = jnp.asarray(interp_matrix(ow, w), dtype=dt)
    x = jnp.einsum("ih,nhwc->niwc", Ah, x)
    x = jnp.einsum("jw,niwc->nijc", Aw, x)
    return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x align-corners bilinear upsample of NHWC ``x``.

    Mirrors torch-0.3 ``nn.Upsample(scale_factor=2, mode='bilinear')``
    (reference: models/dispnet.py:22,87).
    """
    n, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w))


def upsample_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Integer-factor align-corners bilinear upsample of NHWC ``x``."""
    n, h, w, c = x.shape
    return resize_bilinear(x, (scale * h, scale * w))


def resize_trilinear(x: jnp.ndarray, out_dhw: tuple[int, int, int]) -> jnp.ndarray:
    """Align-corners trilinear resize of NDHWC ``x`` to ``out_dhw``.

    Mirrors torch-0.3 ``F.upsample(cost, [D, H, W], mode='trilinear')`` used
    to lift PSMNet's 1/4-resolution cost volumes to full resolution
    (reference: models/psmnet/stackhourglass.py:152-163).
    """
    n, d, h, w, c = x.shape
    od, oh, ow = out_dhw
    if (od, oh, ow) == (d, h, w):
        return x
    dt = x.dtype
    Ad = jnp.asarray(interp_matrix(od, d), dtype=dt)
    Ah = jnp.asarray(interp_matrix(oh, h), dtype=dt)
    Aw = jnp.asarray(interp_matrix(ow, w), dtype=dt)
    x = jnp.einsum("ed,ndhwc->nehwc", Ad, x)
    x = jnp.einsum("ih,nehwc->neiwc", Ah, x)
    x = jnp.einsum("jw,neiwc->neijc", Aw, x)
    return x
