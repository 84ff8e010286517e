"""1-D horizontal correlation (DispNetC / iResNet cost feature).

Semantics of the reference's ``Corr1d`` (models/util_conv.py:56-86):

    corr[n, h, w, d] = sum_c fL[n, h, w, c] * fR[n, h, w - d*stride, c]

for w - d*stride >= 0, else 0; channel d is left all-zero when d >= W
(the reference's ``if i >= w: break``).  ``kernel_size > 1`` applies a
k x k average-pool smoothing with stride 1 and k//2 zero padding,
*including* the padding in the divisor (torch AvgPool2d default).

Layouts are NHWC (features) -> NHWD (correlation), unlike the
reference's NCHW Python loop which assigns strided slices per shift.

Two implementations:
  * ``corr1d_reference`` — pure jnp (static shift slices), used as the
    golden model and as the backward pass.
  * a Pallas TPU kernel that computes all D shifts for a row-block of the
    image in VMEM in one pass (one read of fL/fR per row-block instead of
    D strided reads), wrapped in a ``custom_vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["corr1d", "corr1d_reference"]


def _avg_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k mean pool, stride 1, zero pad k//2, divisor k*k (torch default
    count_include_pad=True; reference models/util_conv.py:82-85)."""
    p = k // 2
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (p, p), (p, p), (0, 0)],
    )
    return s / float(k * k)


def _dot_sim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Default similarity: channel dot product (util_conv.py:64-66)."""
    return jnp.sum(a * b, axis=-1)


def corr1d_reference(fL: jnp.ndarray, fR: jnp.ndarray, D: int, stride: int = 1,
                     simfun=None) -> jnp.ndarray:
    """Golden jnp implementation. fL/fR (N,H,W,C) -> (N,H,W,D).

    ``simfun(a, b) -> (N,H,W')`` scores aligned feature vectors; the
    reference's Corr1d accepts e.g. a cosine similarity the same way
    (util_conv.py:64-66); default is the dot product."""
    simfun = simfun or _dot_sim
    n, h, w, c = fL.shape
    outs = [simfun(fL, fR)]
    for d in range(1, D):
        idx = d * stride
        if d >= w or idx >= w:
            outs.append(jnp.zeros((n, h, w), fL.dtype))
            continue
        s = simfun(fL[:, :, idx:, :], fR[:, :, : w - idx, :])
        outs.append(jnp.pad(s, ((0, 0), (0, 0), (idx, 0))))
    return jnp.stack(outs, axis=-1)


def _corr_kernel(fL_ref, fRp_ref, out_ref, *, D: int, stride: int, W: int, PD: int):
    # fL (1, TH, W, C); fRp (1, TH, W+PD, C) left-padded with PD zero
    # columns so every shift is a static full-width window and the w < idx
    # region is zero for free (no in-kernel pad/concat — Mosaic-friendly).
    fL = fL_ref[0]
    th = fL.shape[0]
    for d in range(D):
        idx = d * stride
        if d < W and idx < W:
            win = fRp_ref[0, :, PD - idx : PD - idx + W, :]
            s = jnp.sum(fL * win, axis=-1)  # (TH, W)
        else:
            s = jnp.zeros((th, W), fL.dtype)
        out_ref[0, :, :, d] = s


def _corr1d_pallas_fwd(fL, fR, D: int, stride: int, interpret: bool = False):
    n, h, w, c = fL.shape
    pd = (D - 1) * stride
    fRp = jnp.pad(fR, ((0, 0), (0, 0), (pd, 0), (0, 0)))
    th = 8
    while h % th:
        th //= 2
    grid = (n, h // th)
    return pl.pallas_call(
        functools.partial(_corr_kernel, D=D, stride=stride, W=w, PD=pd),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w + pd, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, D), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, D), fL.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * D * c,
            bytes_accessed=(2 * n * h * w * c + n * h * w * D) * fL.dtype.itemsize,
            transcendentals=0,
        ),
    )(fL, fRp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _corr1d_pallas(fL, fR, D: int, stride: int, interpret: bool = False):
    return _corr1d_pallas_fwd(fL, fR, D, stride, interpret)


def _corr1d_vjp_fwd(fL, fR, D, stride, interpret):
    return _corr1d_pallas_fwd(fL, fR, D, stride, interpret), (fL, fR)


def _corr1d_vjp_bwd(D, stride, interpret, res, g):
    fL, fR = res
    n, h, w, c = fL.shape
    dfL = jnp.zeros_like(fL)
    dfR = jnp.zeros_like(fR)
    for d in range(D):
        idx = d * stride
        if d >= w or idx >= w:
            continue
        gd = g[:, :, :, d : d + 1]  # (N,H,W,1)
        if idx == 0:
            dfL = dfL + gd * fR
            dfR = dfR + gd * fL
        else:
            gds = gd[:, :, idx:, :]
            dfL = dfL.at[:, :, idx:, :].add(gds * fR[:, :, : w - idx, :])
            dfR = dfR.at[:, :, : w - idx, :].add(gds * fL[:, :, idx:, :])
    return dfL, dfR


_corr1d_pallas.defvjp(_corr1d_vjp_fwd, _corr1d_vjp_bwd)


def corr1d(
    fL: jnp.ndarray,
    fR: jnp.ndarray,
    D: int,
    stride: int = 1,
    kernel_size: int = 1,
    use_pallas: bool | None = None,
    interpret: bool = False,
    simfun=None,
) -> jnp.ndarray:
    """1-D horizontal correlation, (N,H,W,C) x2 -> (N,H,W,D).

    Default implementation is the jnp shift formulation: re-measured at
    model level on TPU v5e in r4 (scripts/bench_defaults.py) it outruns
    the Pallas kernel in every config — DispNetC fwd 375x1242 f32
    3.40 vs 4.77 ms / bf16 3.24 vs 4.28; iResNet f32 51.0 vs 53.7 /
    bf16 37.5 vs 39.4 — even though the Pallas kernel wins standalone
    (0.274 vs 0.363 ms): XLA fuses the D static-shift multiplies with
    neighbouring ops, which the custom-call boundary forfeits.  The
    Pallas kernel remains opt-in via ``use_pallas=True`` /
    ``ops.config.use_pallas``.
    """
    from . import config

    if use_pallas is None:
        # default False: the XLA-fused jnp path wins at model level
        use_pallas = config.use_pallas if config.use_pallas is not None else False
    if simfun is not None:
        # custom similarity (e.g. cosine) only exists on the jnp path;
        # the Pallas kernel hard-codes the dot product
        corr = corr1d_reference(fL, fR, D, stride, simfun)
    elif use_pallas:
        corr = _corr1d_pallas(fL, fR, D, stride, interpret)
    else:
        corr = corr1d_reference(fL, fR, D, stride)
    if kernel_size > 1:
        assert kernel_size % 2 == 1
        corr = _avg_pool_same(corr, kernel_size)
    return corr
