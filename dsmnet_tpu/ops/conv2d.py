"""stride-1 SAME 3x3 2-D convolution with a measured-fast custom VJP.

The 2-D feature towers (PSMNet submodule.py:65-140, GCNet gcnet.py:14-29,
the DispNet-family encoders) run their 3x3 stride-1 convs through this
op.  On TPU, shapes whose channel counts fold into dense 128-lane rows
(C, Co in {32, 64, 128} with aligned W) route to the Pallas kernels
(ops/conv2d_pallas.py) — XLA's native NHWC conv runs the 32-channel
half-resolution convs at ~13 TFLOP/s, fill-bound on Cout (r5 trace,
~22 ms of the b4 PSMNet step).  dx is the same forward kernel with the
flipped, channel-swapped kernel; dK is the transpose contraction of the
same patch matrix.  Everything else falls back to lax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d_same"]


def _conv(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, k, (1, 1), [(1, 1)] * 2,
                                    dimension_numbers=dn)


def _use_pallas(x, k):
    from . import config
    from .conv2d_pallas import pallas2d_ok

    return config.conv3d_mode() == "pallas" and pallas2d_ok(x.shape, k.shape)


@jax.custom_vjp
def conv2d_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """stride-1 SAME conv, x (N,H,W,C), k (3,3,C,Co)."""
    if _use_pallas(x, k):
        from .conv2d_pallas import conv2d_fwd_pallas

        return conv2d_fwd_pallas(x, k)
    return _conv(x, k)


def _fwd(x, k):
    return conv2d_same(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    if _use_pallas(x, k) and _use_pallas(g, k.swapaxes(2, 3)):
        from .conv2d_pallas import conv2d_dk_pallas, conv2d_fwd_pallas

        k_t = jnp.flip(k, axis=(0, 1)).swapaxes(2, 3)
        dx = conv2d_fwd_pallas(g, k_t)
        dk = conv2d_dk_pallas(x, g)
        return dx, dk.astype(k.dtype)
    _, vjp = jax.vjp(_conv, x, k)
    return vjp(g)


conv2d_same.defvjp(_fwd, _bwd)
