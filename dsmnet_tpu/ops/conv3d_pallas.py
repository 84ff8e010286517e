"""Pallas TPU kernels for the stride-1 SAME 3x3x3 convolution family.

XLA's native NDHWC conv3d runs the PSMNet regularizer's 32->32
full-volume convs at ~16 TFLOP/s on v5e (3.0 ms for 48.9 GFLOP,
scripts/bench_bn.py) — ~8% MFU.  The structural problem is GEMM fill:
Cout=32 fills 32/128 output lanes, and XLA's conv lowering loses
another 2x on top.

These kernels restructure the conv as ONE well-filled GEMM per block:

  * the 3 kw taps fold into the GEMM N dimension (z has 3*Co lanes; a
    shifted in-VMEM add recombines them into y — the "kwfold" trick,
    N fill 96/128 for Co=32);
  * the 9 (kd,kh) taps fold into the GEMM K dimension by assembling a
    patch matrix P (M, 9*Ci) from shifted VMEM windows (K fill
    288/384 after lane padding);
  * M is a (DB, HB, W) output block, streamed over a halo-DMA'd
    window of the padded input.

The kernel-gradient kernel reuses the same window structure with the
taps assembled on M (9*Ci rows) against kw-shifted cotangent copies on
N (3*Co lanes), contracting over all positions of the block —
accumulated in a VMEM-resident (9*Ci, 3*Co) f32 output across grid
steps.

Reference semantics: models/psmnet/stackhourglass.py:73-149 /
models/gcnet.py:32-101 (the 3-D regularizer convs these accelerate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_same_pallas_fwd", "conv3d_dk_pallas"]


def _pick_blocks(D, H, W, ci, co, cap=9_500_000):
    """Largest (DB, HB) whose working set fits comfortably in VMEM."""
    for db, hb in ((8, 8), (4, 8), (8, 4), (4, 4), (2, 4), (4, 2), (2, 2),
                   (1, 2), (2, 1), (1, 1)):
        if D % db or H % hb:
            continue
        m = db * hb * W
        need = (
            (db + 2) * (hb + 2) * W * ci * 2      # x window (bf16)
            + m * 9 * ci * 2                       # patch matrix
            + m * 3 * co * 4                       # z accumulator (f32)
            + 2 * db * hb * W * co * 2             # double-buffered out
        )
        if need <= cap:
            return db, hb
    return 1, 1


def _fwd_kernel(xp_ref, kz_ref, y_ref, xwin, zbuf, sem, *, DB, HB, W, ci, co):
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cp = pltpu.make_async_copy(
        xp_ref.at[i, pl.ds(j * DB, DB + 2), pl.ds(k * HB, HB + 2)], xwin, sem
    )
    cp.start()
    cp.wait()
    m = DB * HB * W
    parts = []
    for dd in range(3):
        for dh in range(3):
            parts.append(xwin[dd:dd + DB, dh:dh + HB].reshape(m, ci))
    P = jnp.concatenate(parts, axis=1)                       # (M, 9ci)
    z = jnp.dot(P, kz_ref[:], preferred_element_type=jnp.float32)
    # kw recombination via a W-padded scratch (Mosaic rejects the
    # pad/concat formulation): y[w] = z[w-1,tap0] + z[w,tap1] + z[w+1,tap2]
    zbuf[:, :, 0, :] = jnp.zeros((DB, HB, 3 * co), jnp.float32)
    zbuf[:, :, W + 1, :] = jnp.zeros((DB, HB, 3 * co), jnp.float32)
    zbuf[:, :, 1:W + 1, :] = z.reshape(DB, HB, W, 3 * co)
    y = (
        zbuf[:, :, 0:W, 0:co]
        + zbuf[:, :, 1:W + 1, co:2 * co]
        + zbuf[:, :, 2:W + 2, 2 * co:3 * co]
    )
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3d_same_pallas_fwd(x, k, interpret: bool = False):
    """stride-1 SAME 3x3x3 conv; x (N,D,H,W,Ci), k (3,3,3,Ci,Co)."""
    n, D, H, W, ci = x.shape
    co = k.shape[-1]
    assert k.shape[:3] == (3, 3, 3)
    db, hb = _pick_blocks(D, H, W, ci, co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    kz = jnp.moveaxis(k, 2, 3).reshape(3 * 3 * ci, 3 * co).astype(x.dtype)
    grid = (n, D // db, H // hb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, DB=db, HB=hb, W=W, ci=ci, co=co),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3 * 3 * ci, 3 * co), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, db, hb, W, co), lambda i, j, k: (i, j, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D, H, W, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((db + 2, hb + 2, W, ci), x.dtype),
            pltpu.VMEM((db, hb, W + 2, 3 * co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * n * D * H * W * ci * co,
            bytes_accessed=(n * D * H * W * (ci + co)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, kz)


def _dk_kernel(xp_ref, gp_ref, dk_ref, xwin, gwin, sem1, sem2,
               *, DB, HB, W, ci, co):
    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    cp1 = pltpu.make_async_copy(
        xp_ref.at[i, pl.ds(j * DB, DB + 2), pl.ds(k * HB, HB + 2)], xwin, sem1
    )
    cp2 = pltpu.make_async_copy(
        gp_ref.at[i, pl.ds(j * DB, DB), pl.ds(k * HB, HB)], gwin, sem2
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    m = DB * HB * W
    # cotangent with the 3 kw shifts on lanes: gcat (M, 3co);
    # gcat[:, dw] = g[w + 1 - dw] (gp is W-padded by 1 each side)
    gcat = jnp.concatenate(
        [gwin[:, :, 2 - dw:2 - dw + W].reshape(m, co) for dw in range(3)], axis=1
    )
    parts = []
    for dd in range(3):
        for dh in range(3):
            parts.append(xwin[dd:dd + DB, dh:dh + HB].reshape(m, ci))
    P = jnp.concatenate(parts, axis=1)                       # (M, 9ci)
    acc = lax.dot_general(
        P, gcat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                         # (9ci, 3co)

    @pl.when((i == 0) & (j == 0) & (k == 0))
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    dk_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3d_dk_pallas(x, g, interpret: bool = False):
    """Kernel gradient of the stride-1 SAME 3x3x3 conv.

    x (N,D,H,W,Ci) input, g (N,D,H,W,Co) cotangent -> (3,3,3,Ci,Co) f32.
    """
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
    db, hb = _pick_blocks(D, H, W, ci, co)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    grid = (n, D // db, H // hb)
    out = pl.pallas_call(
        functools.partial(_dk_kernel, DB=db, HB=hb, W=W, ci=ci, co=co),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((9 * ci, 3 * co), lambda i, j, k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * ci, 3 * co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((db + 2, hb + 2, W, ci), x.dtype),
            pltpu.VMEM((db, hb, W + 2, co), g.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * n * D * H * W * ci * co,
            bytes_accessed=(n * D * H * W * (ci + co)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, gp)
    # rows are (dd, dh, ci); lanes are (dw, co)
    dk = out.reshape(3, 3, ci, 3, co)
    return jnp.transpose(dk, (0, 1, 3, 2, 4))
