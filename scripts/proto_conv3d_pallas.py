"""Prototype: Pallas TPU conv3d (3x3x3, stride 1, SAME) on W-folded
dense-lane storage.

Key constraints discovered on v5e Mosaic:
  * HBM arrays are tiled (1, 128) on the minor dim: DMA slices must be
    128-aligned, so a C=32 minor dim cannot be sliced densely.
  * (ht, W*C) -> (ht*W, C) in-kernel reshapes are unsupported.

Design that satisfies both:
  * store x folded: (N, D+2, H+2, W/r, r*C) with r*C == 128 (dense
    lanes, aligned DMA)
  * grid (N, H/ht, D), d innermost; ring of 3 DMA'd slabs so each
    input element is read ~once
  * per w-parity pw: patches (ht*UF, 9C) over (kd, kh, c) from lane
    slices of the merged slabs (merges are layout-free)
  * matmul (ht*UF, 9C) @ (9C, 3Co): kw lives in the N dimension
  * combine: each (pw, kw) pair maps to an output parity and a folded
    u-shift in {-1, 0, 1}; assemble the folded output with masked
    sublane rolls + lane concatenation
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsmnet_tpu.utils.benchtime import time_op


def _kernel(xp_ref, km_ref, out_ref, ring, sems, *, ht, UF, r, C, Co, D, mode):
    n = pl.program_id(0)
    j = pl.program_id(1)
    d = pl.program_id(2)
    h0 = j * ht

    def dma(pad_idx, slot):
        return pltpu.make_async_copy(
            xp_ref.at[n, pad_idx, pl.ds(h0, ht + 2), :, :],
            ring.at[slot],
            sems.at[slot],
        )

    @pl.when(d == 0)
    def _():
        dma(0, 0).start()
        dma(1, 1).start()
        dma(0, 0).wait()
        dma(1, 1).wait()

    slot2 = (d + 2) % 3
    dma(d + 2, slot2).start()
    dma(d + 2, slot2).wait()

    M = ht * UF
    if mode == "dma":
        out_ref[0, 0] = ring[d % 3, 0:ht].astype(out_ref.dtype) * 0.0
        return
    # merged slab views per (kd, kh): (ht*UF, r*C)
    merged = []
    for kd in range(3):
        slab = ring[(d + kd) % 3]  # (ht+2, UF, r*C)
        for kh in range(3):
            merged.append(slab[kh : kh + ht].reshape(M, r * C).astype(jnp.bfloat16))

    km = km_ref[:]  # (9C, 3Co) bf16
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    u_of = rows % UF

    if mode == "noextract":
        # DMA + merge + cast only; no lane extraction, no concat
        s = merged[0]
        for m in merged[1:]:
            s = s + m
        acc = s[:, :Co].astype(jnp.float32)
        out_ref[0, 0] = jnp.concatenate([acc] * r, axis=-1).astype(
            out_ref.dtype).reshape(ht, UF, r * Co)
        return

    if mode == "patches":
        acc = jnp.zeros((M, r * Co), jnp.float32)
        for pw in range(r):
            patches = jnp.concatenate(
                [m[:, pw * C : (pw + 1) * C] for m in merged], axis=-1
            )
            acc = acc + jnp.sum(patches, axis=-1, keepdims=True).astype(jnp.float32)
        out_ref[0, 0] = acc.astype(out_ref.dtype).reshape(ht, UF, r * Co)
        return

    if mode == "dots":
        acc = jnp.zeros((M, r * Co), jnp.float32)
        big = jnp.concatenate([m for m in merged], axis=-1)  # (M, 9*128)
        for pw in range(r):
            P = jnp.dot(big[:, : 9 * C], km, preferred_element_type=jnp.float32)
            acc = acc + jnp.concatenate([P[:, :Co]] * r, axis=-1)
        out_ref[0, 0] = acc.astype(out_ref.dtype).reshape(ht, UF, r * Co)
        return

    outs = [None] * r  # per output parity: (M, Co) f32
    for pw in range(r):
        patches = jnp.concatenate(
            [m[:, pw * C : (pw + 1) * C] for m in merged], axis=-1
        )  # (M, 9C)
        P = jnp.dot(patches, km, preferred_element_type=jnp.float32)
        for kw in range(3):
            t = pw - kw + 1
            po = t % r
            sh = (t - po) // r  # -1, 0, +1
            piece = P[:, kw * Co : (kw + 1) * Co]
            if sh == 1:
                piece = pltpu.roll(piece, 1, 0)
                piece = jnp.where(u_of == 0, 0.0, piece)
            elif sh == -1:
                piece = pltpu.roll(piece, M - 1, 0)
                piece = jnp.where(u_of == UF - 1, 0.0, piece)
            outs[po] = piece if outs[po] is None else outs[po] + piece

    acc = jnp.concatenate(outs, axis=-1)  # (M, r*Co)
    out_ref[0, 0] = acc.astype(out_ref.dtype).reshape(ht, UF, r * Co)


def conv3d_pallas(x, k, ht=None, interpret=False, mode="full"):
    n, D, H, W, C = x.shape
    Co = k.shape[-1]
    assert k.shape[:3] == (3, 3, 3)
    r = max(1, 128 // C)
    assert W % r == 0 and r * C == 128, (W, C, r)
    UF = W // r
    if ht is None:
        ht = 32
        while H % ht:
            ht //= 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    xp = xp.reshape(n, D + 2, H + 2, UF, r * C)
    km = k.transpose(0, 1, 3, 2, 4).reshape(9 * C, 3 * Co).astype(jnp.bfloat16)
    grid = (n, H // ht, D)
    out = pl.pallas_call(
        functools.partial(_kernel, ht=ht, UF=UF, r=r, C=C, Co=Co, D=D, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ht, UF, r * Co), lambda n, j, d: (n, d, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, D, H, UF, r * Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, ht + 2, UF, r * C), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * C * Co * n * D * H * W,
            bytes_accessed=(n * D * H * W * (C + Co)) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, km)
    return out.reshape(n, D, H, W, Co)


def conv_ref(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--shape", default="1,48,96,192,32")
    ap.add_argument("--cout", type=int, default=32)
    ap.add_argument("--ht", type=int, default=None)
    ap.add_argument("--modes", default="full")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    n, D, H, W, C = map(int, args.shape.split(","))
    co = args.cout

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, D, H, W, C), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, C, co) * 0.1, dt)

    if args.check:
        y = conv3d_pallas(x, k, ht=args.ht)
        yr = conv_ref(x, k)
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - yr.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(yr.astype(jnp.float32))))
        print(f"max abs err {err:.3e}  (scale {scale:.2f}, rel {err/scale:.2e})")

    flops = 2 * 27 * C * co * n * D * H * W
    for mode in args.modes.split(","):
        if mode == "lax":
            t = time_op(lambda a: conv_ref(a, k), x)
            print(f"lax:               {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TFLOP/s")
            continue
        t = time_op(lambda a: conv3d_pallas(a, k, ht=args.ht, mode=mode), x)
        print(f"pallas[{mode:8s}]: {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TFLOP/s")
