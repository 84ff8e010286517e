"""Concatenation cost volume (GCNet / PSMNet matching stage).

Semantics (reference models/gcnet.py:131-135, psmnet/stackhourglass.py:124-133):

    cost[n, d, h, w, :F] = fL[n, h, w]            (left half)
    cost[n, d, h, w, F:] = fR[n, h, w - d]        (right half, 0 if w < d)

GCNet leaves the left half dense for every d; PSMNet zeroes it where
w < d as well — controlled by ``mask_left``.

Layout: NHWC features -> (N, D, H, W, 2F) volume, i.e. channels-last
NDHWC ready for 3-D convolutions on TPU.

The volume is D x larger than its inputs, so building it is pure HBM
bandwidth.  The Pallas kernel streams one (row-block x W) feature tile
through VMEM and writes all D slices from it (inputs are read once per
row-block, not once per disparity), with the shifted right-half realized
as a dynamic slice into a left-padded copy of fR.  A ``custom_vjp``
provides the (linear) backward pass in jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["concat_cost_volume", "concat_cost_volume_reference"]


def concat_cost_volume_reference(
    fL: jnp.ndarray, fR: jnp.ndarray, D: int, mask_left: bool = True
) -> jnp.ndarray:
    """Golden jnp implementation. (N,H,W,F) x2 -> (N,D,H,W,2F)."""
    n, h, w, f = fL.shape
    slices = []
    for d in range(D):
        if d == 0:
            left, right = fL, fR
        elif d >= w:
            # whole slice out of range: the reference's in-place loop
            # assigns nothing (gcnet.py:131-135 with an empty [..., i:]
            # target), so the slice stays zero
            right = jnp.zeros_like(fR)
            left = jnp.zeros_like(fL) if mask_left else fL
        else:
            right = jnp.pad(fR[:, :, : w - d, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
            if mask_left:
                left = jnp.pad(fL[:, :, d:, :], ((0, 0), (0, 0), (d, 0), (0, 0)))
            else:
                left = fL
        slices.append(jnp.concatenate([left, right], axis=-1))
    return jnp.stack(slices, axis=1)


def _cv_kernel(fL_ref, fRp_ref, out_ref, *, D: int, W: int, F: int, mask_left: bool):
    d = pl.program_id(2)
    fL = fL_ref[0]  # (TH, W, F)
    th = fL.shape[0]
    # right half: fR[w - d] == fRp[w - d + D] -> window of width W at D - d;
    # the pad zeros already blank the w < d region, no mask needed
    right = fRp_ref[0, :, pl.ds(D - d, W), :]
    if mask_left:
        col = jax.lax.broadcasted_iota(jnp.int32, (th, W, F), 1)
        left = fL * (col >= d).astype(fL.dtype)
    else:
        left = fL
    # single full-lane store (2F lanes) instead of two half-lane stores
    out_ref[0, 0] = jnp.concatenate([left, right], axis=-1)


def _cost_volume_pallas_fwd(fL, fR, D: int, mask_left: bool, interpret: bool = False):
    n, h, w, f = fL.shape
    fRp = jnp.pad(fR, ((0, 0), (0, 0), (D, 0), (0, 0)))
    th = 16
    while h % th:
        th //= 2
    grid = (n, h // th, D)  # d fastest: fL/fR tiles stay resident across d
    return pl.pallas_call(
        functools.partial(_cv_kernel, D=D, W=w, F=f, mask_left=mask_left),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, f), lambda i, j, d: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w + D, f), lambda i, j, d: (i, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, w, 2 * f), lambda i, j, d: (i, d, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, D, h, w, 2 * f), fL.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=(2 * n * h * w * f + n * D * h * w * 2 * f) * fL.dtype.itemsize,
            transcendentals=0,
        ),
    )(fL, fRp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cost_volume_pallas(fL, fR, D: int, mask_left: bool, interpret: bool = False):
    return _cost_volume_pallas_fwd(fL, fR, D, mask_left, interpret)


def _cv_vjp_fwd(fL, fR, D, mask_left, interpret):
    return _cost_volume_pallas_fwd(fL, fR, D, mask_left, interpret), None


def _cv_vjp_bwd(D, mask_left, interpret, res, g):
    del res  # the op is linear; shapes come from the cotangent
    n, _, h, w, f2 = g.shape
    f = f2 // 2
    dtype = g.dtype
    gl = g[..., :f]  # (N,D,H,W,F)
    gr = g[..., f:]
    if mask_left:
        col = jnp.arange(w)[None, None, None, :, None]
        dd = jnp.arange(D)[None, :, None, None, None]
        gl = gl * (col >= dd).astype(g.dtype)
    dfL = jnp.sum(gl, axis=1)
    # dfR[w] += sum_d gr[d, w + d]
    dfR = jnp.zeros((n, h, w, f), dtype)
    for d in range(D):
        if d == 0:
            dfR = dfR + gr[:, 0]
        elif d < w:
            dfR = dfR.at[:, :, : w - d, :].add(gr[:, d, :, d:, :])
    return dfL, dfR


_cost_volume_pallas.defvjp(_cv_vjp_fwd, _cv_vjp_bwd)


def concat_cost_volume(
    fL: jnp.ndarray,
    fR: jnp.ndarray,
    D: int,
    mask_left: bool = True,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Concatenation cost volume, (N,H,W,F) x2 -> (N,D,H,W,2F).

    If a parallel sharding context is active, the volume is constrained
    to (data, -, spatial, -, -) so GSPMD spatially partitions the 3-D
    conv stack that consumes it (the "context parallelism" axis of this
    domain, SURVEY §5)."""
    from ..parallel.context import shard_cost_volume
    from . import config

    if use_pallas is None:
        # default jnp: XLA's fused pad+concat assembly is 7x faster
        # than the Pallas volume kernel standalone (0.325 vs 2.34 ms at
        # the PSMNet D=48 shape, PERF.md op table — r3 shipped the
        # Pallas path as the f32 default against its own measurement;
        # r4 fixes the default to the measured winner).  Opt in via
        # use_pallas=True / ops.config.use_pallas for benchmarking.
        use_pallas = config.use_pallas if config.use_pallas is not None else False
    if fL.dtype == jnp.bfloat16:
        # the kernel's dynamic sublane slice needs 16-row alignment for
        # bf16 tiles, which the per-d offset cannot guarantee — Mosaic
        # rejects it; XLA's pad+concat handles bf16 fine
        use_pallas = False
    if use_pallas:
        vol = _cost_volume_pallas(fL, fR, D, mask_left, interpret)
    else:
        vol = concat_cost_volume_reference(fL, fR, D, mask_left)
    return shard_cost_volume(vol)
