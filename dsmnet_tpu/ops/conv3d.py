"""3-D convolution with a fast custom backward for TPU.

Forward: native lax NDHWC conv.  Round-2 measurement note: with TRACED
kernels (the honest training scenario — parameters are jit arguments),
the native conv is the fastest XLA formulation at PSMNet volume shapes
(1.5 ms for the 48.9 GFLOP 32->32 conv, ~32 TFLOP/s).  Two rewrites
that look faster under constant-kernel microbenches — W-folding
(space-to-depth along W, ``_conv_wfold``) and Co-padding — are both
slower once the kernel is traced, and a hand-written Pallas im2col
kernel (patches over (kd,kh,c), kw in the matmul N dimension, folded
dense-lane storage) bottoms out at ~2.3 ms on lane-granularity patch
assembly (scripts/proto_conv3d_pallas.py).  They are kept only for
benchmarking; see PERF.md.

XLA's autodiff of the kernel-gradient IS poor (9.4 ms for one 32->32
conv where 27 deep einsum contractions run in 1.2 ms), so the op is
wrapped in a ``custom_vjp``:

  * forward: native lax conv
  * dx: conv of the cotangent with the spatially-flipped,
    channel-transposed kernel (the standard transpose identity)
  * dK: per-tap deep einsum

Used automatically by ``models.layers.ConvBN`` for eligible 3-D convs
(stride 1, SAME, undilated — every regularizer conv except the
stride-2 down-samplers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv3d_same"]


def _conv(x, k, pads):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, k, (1, 1, 1), pads, dimension_numbers=dn)


def _fold_kernel_w(k):
    """Map a (3,3,3,Ci,Co) kernel to the W-folded (3,3,3,2Ci,2Co) kernel.

    With xf = x.reshape(..., W/2, 2Ci) (adjacent W columns stacked on
    channels), output parity p at folded column u reads original columns
    w-1, w, w+1 for w = 2u+p, which live in folded columns u-1..u+1:
      p=0: (u-1, hi)=w-1, (u, lo)=w, (u, hi)=w+1
      p=1: (u, lo)=w-1,  (u, hi)=w, (u+1, lo)=w+1
    """
    ci, co = k.shape[3], k.shape[4]
    kf = jnp.zeros((3, 3, 3, 2 * ci, 2 * co), k.dtype)
    kf = kf.at[:, :, 0, ci:, :co].set(k[:, :, 0])
    kf = kf.at[:, :, 1, :ci, :co].set(k[:, :, 1])
    kf = kf.at[:, :, 1, ci:, :co].set(k[:, :, 2])
    kf = kf.at[:, :, 1, :ci, co:].set(k[:, :, 0])
    kf = kf.at[:, :, 1, ci:, co:].set(k[:, :, 1])
    kf = kf.at[:, :, 2, :ci, co:].set(k[:, :, 2])
    return kf


def _conv_wfold(x, k):
    """Exact stride-1 SAME 3x3x3 conv via W-folding (requires W even)."""
    n, D, H, W, ci = x.shape
    co = k.shape[-1]
    xf = x.reshape(n, D, H, W // 2, 2 * ci)
    y = _conv(xf, _fold_kernel_w(k), [(1, 1)] * 3)
    return y.reshape(n, D, H, W, co)


def _conv_fast(x, k):
    """Stride-1 SAME conv — native lax (fastest with traced kernels)."""
    pads = [((s - 1) // 2, (s - 1) // 2) for s in k.shape[:3]]
    return _conv(x, k, pads)


@jax.custom_vjp
def conv3d_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """stride-1 SAME 3-D conv, x (N,D,H,W,Ci), k (kd,kh,kw,Ci,Co), odd dims."""
    return _conv_fast(x, k)


def _fwd(x, k):
    return conv3d_same(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    kd, kh, kw, ci, co = k.shape
    # dx: correlate the cotangent with the flipped, channel-swapped kernel
    # (also a stride-1 SAME conv -> same fast formulation)
    k_t = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)  # (kd,kh,kw,Co,Ci)
    dx = _conv_fast(g, k_t)

    # dK: one deep contraction per tap over the zero-padded input
    n, D, H, W, _ = x.shape
    xp = jnp.pad(
        x,
        ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
    )
    taps = []
    for dd in range(kd):
        for dh in range(kh):
            for dw in range(kw):
                xs = lax.dynamic_slice(xp, (0, dd, dh, dw, 0), (n, D, H, W, ci))
                taps.append(
                    jnp.einsum(
                        "ndhwc,ndhwo->co", xs, g,
                        preferred_element_type=jnp.float32,
                    )
                )
    dk = jnp.stack(taps).reshape(kd, kh, kw, ci, co).astype(k.dtype)
    return dx, dk


conv3d_same.defvjp(_fwd, _bwd)
