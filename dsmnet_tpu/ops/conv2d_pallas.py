"""Pallas TPU kernels for the stride-1 SAME 3x3 2-D convolution.

The PSMNet feature tower's 32-channel half-resolution convs (firstconv
+ layer1, submodule.py:66-75) run at ~13 TFLOP/s through XLA's native
NHWC conv2d on v5e — Cout=32 fills 32 of 128 output lanes — and cost
~22 ms of the b4 train step (r5 trace).  GCNet's 2-D residual tower
(gcnet.py:14-29) has the same shape class.

2-D port of the folded-lane conv3d kernels (ops/conv3d_pallas.py): the
input is viewed by a FREE reshape as (N, H, W/r, r*C) with r*C = 128,
so every lane is data.  Per w-parity pw the patch matrix concatenates
the three kh-shifted slab slices (M, 3C); ONE GEMM (M, 3C) @ (3C, 3Co)
puts the kw taps on the GEMM N dimension (kwfold); each (pw, kw)
product maps to an output parity and a folded-u shift in {-1, 0, +1}
realized as masked sublane rolls.  The kernel-gradient contracts the
same patch matrices against a slotted cotangent built IN VMEM (two
masked rolls + lane concat) into a VMEM-resident (3C, 3Co) f32 block.

Boundary handling is in-kernel (predicated halo DMAs + zeroed edge
rows) — no caller-side padding.  Grid is (N, H/ht) with a 2-slot slab
ring prefetching the next h-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv2d_fwd_pallas", "conv2d_dk_pallas", "pallas2d_ok"]


def _fold(ci):
    return max(1, 128 // ci)


def pallas2d_ok(x_shape, k_shape) -> bool:
    n, H, W, C = x_shape
    if k_shape[:2] != (3, 3):
        return False
    Co = k_shape[-1]
    # C == Co == 32 only: that is where native XLA is Cout-fill bound
    # (~13 TFLOP/s in-model); at 64 channels native runs ~60 TFLOP/s and
    # the shallow-K (3C) folded GEMM measured SLOWER in-model (b4 step
    # 12.55 vs 13.18 fps with 64-ch routed through Pallas)
    if C != 32 or Co != 32:
        return False
    r = 128 // C
    if W % r:
        return False
    return (W * C // 128) % 8 == 0 and H >= 2


def _pick_ht(H, UF, C, Co, r, itemsize, gl=0):
    ht = 64
    while ht > 1:
        if H % ht == 0:
            m = ht * UF
            est = (
                2 * (ht + 2) * UF * r * C * itemsize   # slab ring
                + m * 3 * C * itemsize                  # patches
                + m * 3 * Co * 4                        # GEMM out
                + m * r * Co * 4                        # parity accs
                + 2 * ht * UF * r * Co * itemsize       # out blocks
                + ht * UF * gl * itemsize               # dK g slab
            )
            # 3x slack: Mosaic stack temporaries for the per-parity
            # rolls overflowed the 16 MB scoped-vmem limit at 2x
            if est * 3 <= 14_000_000:
                return ht
        ht //= 2
    return 1


def _slab_io2(x_ref, ring, sems_m, sems_t, sems_b, n, j, *, ht, UF, L, J):
    """Boundary-aware slab fill: slab rows 0..ht+1 map to input rows
    h0-1..h0+ht of image n.  2-slot ring: tile j is waited at step j
    (started by step j-1's prefetch or, for j==0, here), tile j+1 is
    prefetched."""

    def mid(jt, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(jt * ht, ht), :, :],
            ring.at[slot, pl.ds(1, ht)], sems_m.at[slot],
        )

    def top(jt, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(jt * ht - 1, 1), :, :],
            ring.at[slot, pl.ds(0, 1)], sems_t.at[slot],
        )

    def bot(jt, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(jt * ht + ht, 1), :, :],
            ring.at[slot, pl.ds(ht + 1, 1)], sems_b.at[slot],
        )

    def start(jt, slot):
        mid(jt, slot).start()

        @pl.when(jt > 0)
        def _():
            top(jt, slot).start()

        @pl.when(jt < J - 1)
        def _():
            bot(jt, slot).start()

        @pl.when(jt == 0)
        def _():
            ring[slot, 0] = jnp.zeros((UF, L), ring.dtype)

        @pl.when(jt == J - 1)
        def _():
            ring[slot, ht + 1] = jnp.zeros((UF, L), ring.dtype)

    def wait(jt, slot):
        mid(jt, slot).wait()

        @pl.when(jt > 0)
        def _():
            top(jt, slot).wait()

        @pl.when(jt < J - 1)
        def _():
            bot(jt, slot).wait()

    @pl.when(j == 0)
    def _():
        start(0, 0)

    @pl.when(j + 1 < J)
    def _():
        start(j + 1, (j + 1) % 2)

    wait(j, j % 2)


def _fwd_kernel(x_ref, km_ref, out_ref, ring, sems_m, sems_t, sems_b,
                *, ht, UF, r, C, Co, J):
    n = pl.program_id(0)
    j = pl.program_id(1)

    _slab_io2(x_ref, ring, sems_m, sems_t, sems_b, n, j,
              ht=ht, UF=UF, L=r * C, J=J)

    M = ht * UF
    slab = ring[j % 2]
    merged = [slab[kh:kh + ht].reshape(M, r * C) for kh in range(3)]

    km = km_ref[:]  # (3C, 3Co)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    u_of = rows % UF

    outs = [None] * r
    for pw in range(r):
        patches = jnp.concatenate(
            [m[:, pw * C:(pw + 1) * C] for m in merged], axis=-1
        )  # (M, 3C)
        P = jnp.dot(patches, km, preferred_element_type=jnp.float32)
        for kw in range(3):
            t = pw - kw + 1
            po = t % r
            sh = (t - po) // r
            piece = P[:, kw * Co:(kw + 1) * Co]
            if sh == 1:
                piece = pltpu.roll(piece, 1, 0)
                piece = jnp.where(u_of == 0, 0.0, piece)
            elif sh == -1:
                piece = pltpu.roll(piece, M - 1, 0)
                piece = jnp.where(u_of == UF - 1, 0.0, piece)
            outs[po] = piece if outs[po] is None else outs[po] + piece

    acc = jnp.concatenate(outs, axis=-1)
    out_ref[0] = acc.astype(out_ref.dtype).reshape(ht, UF, r * Co)


def conv2d_fwd_pallas_folded(xf, k, W: int, ht: int | None = None,
                             interpret: bool = False):
    """xf (N, H, W/r, 128) unpadded folded view, k (3, 3, C, Co) ->
    folded (N, H, W/r, r*Co)."""
    n, H, UF, L = xf.shape
    C, Co = k.shape[2], k.shape[3]
    r = _fold(C)
    assert r * C == 128 == L and UF * r == W, (xf.shape, k.shape, W)
    if ht is None:
        ht = _pick_ht(H, UF, C, Co, r, xf.dtype.itemsize)
    km = k.transpose(0, 2, 1, 3).reshape(3 * C, 3 * Co).astype(xf.dtype)
    J = H // ht
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ht=ht, UF=UF, r=r, C=C, Co=Co, J=J),
        grid=(n, J),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ht, UF, r * Co), lambda n, j: (n, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, H, UF, r * Co), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ht + 2, UF, r * C), xf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * C * Co * n * H * W,
            bytes_accessed=(n * H * W * (C + Co)) * xf.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, km)


@functools.partial(jax.jit, static_argnames=("ht", "interpret"))
def conv2d_fwd_pallas(x, k, ht: int | None = None, interpret: bool = False):
    """stride-1 SAME 3x3 conv; x (N,H,W,C), k (3,3,C,Co)."""
    n, H, W, C = x.shape
    Co = k.shape[-1]
    r = _fold(C)
    xf = x.reshape(n, H, W // r, r * C)
    out = conv2d_fwd_pallas_folded(xf, k, W, ht=ht, interpret=interpret)
    return out.reshape(n, H, W, Co)


def _dk_kernel(x_ref, gf_ref, dk_ref, ring, gslab, sems_m, sems_t, sems_b,
               gsem, *, ht, UF, r, C, Co, J):
    n = pl.program_id(0)
    j = pl.program_id(1)

    gcp = pltpu.make_async_copy(
        gf_ref.at[n, pl.ds(j * ht, ht), :, :], gslab, gsem
    )
    gcp.start()

    _slab_io2(x_ref, ring, sems_m, sems_t, sems_b, n, j,
              ht=ht, UF=UF, L=r * C, J=J)

    gcp.wait()

    M = ht * UF
    slab = ring[j % 2]
    merged = [slab[kh:kh + ht].reshape(M, r * C) for kh in range(3)]

    gm = gslab[:].reshape(M, r * Co)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    u_of = rows % UF
    prev = pltpu.roll(gm[:, (r - 1) * Co:].astype(jnp.float32), 1, 0)
    prev = jnp.where(u_of == 0, 0.0, prev).astype(gm.dtype)
    nxt = pltpu.roll(gm[:, :Co].astype(jnp.float32), M - 1, 0)
    nxt = jnp.where(u_of == UF - 1, 0.0, nxt).astype(gm.dtype)
    ge = jnp.concatenate([prev, gm, nxt], axis=-1)  # (M, (r+2)Co)

    first = (n == 0) & (j == 0)

    @pl.when(first)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    acc = jnp.zeros((3 * C, 3 * Co), jnp.float32)
    for pw in range(r):
        patches = jnp.concatenate(
            [m[:, pw * C:(pw + 1) * C] for m in merged], axis=-1
        )
        gsel = ge[:, pw * Co:(pw + 3) * Co]
        acc = acc + lax.dot_general(
            patches, gsel, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[:] += acc


def conv2d_dk_pallas_folded(xf, gf, k_shape, W: int, ht: int | None = None,
                            interpret: bool = False):
    """xf (N,H,W/r,128) folded input, gf (N,H,W/r,r*Co) folded cotangent
    -> (3,3,C,Co) f32."""
    n, H, UF, L = xf.shape
    C, Co = k_shape[2], k_shape[3]
    r = _fold(C)
    assert r * C == 128 == L and UF * r == W, (xf.shape, k_shape, W)
    assert gf.shape == (n, H, UF, r * Co), gf.shape
    if ht is None:
        ht = _pick_ht(H, UF, C, Co, r, xf.dtype.itemsize,
                      gl=(2 * r + 2) * Co)
    J = H // ht
    out = pl.pallas_call(
        functools.partial(_dk_kernel, ht=ht, UF=UF, r=r, C=C, Co=Co, J=J),
        grid=(n, J),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((3 * C, 3 * Co), lambda n, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * C, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ht + 2, UF, r * C), xf.dtype),
            pltpu.VMEM((ht, UF, r * Co), gf.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * C * Co * n * H * W,
            bytes_accessed=(n * H * W * (C + Co)) * xf.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, gf)
    # rows are (kh, C); lanes are (dw reversed, Co)
    dk = out.reshape(3, C, 3, Co)[:, :, ::-1, :]
    return jnp.transpose(dk, (0, 2, 1, 3))


@functools.partial(jax.jit, static_argnames=("ht", "interpret"))
def conv2d_dk_pallas(x, g, ht: int | None = None, interpret: bool = False):
    """Kernel gradient: x (N,H,W,C), g (N,H,W,Co) -> (3,3,C,Co) f32."""
    n, H, W, C = x.shape
    Co = g.shape[-1]
    r = _fold(C)
    xf = x.reshape(n, H, W // r, r * C)
    gf = g.reshape(n, H, W // r, r * Co)
    return conv2d_dk_pallas_folded(xf, gf, (3, 3, C, Co), W, ht=ht,
                                   interpret=interpret)
