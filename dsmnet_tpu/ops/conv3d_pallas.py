"""Pallas TPU kernels for the stride-1 SAME 3x3x3 convolution family.

XLA's native NDHWC conv3d runs the PSMNet regularizer's 32->32
full-volume convs at ~16 TFLOP/s on v5e (2.9 ms for 48.9 GFLOP;
scripts/bench_bn.py, scripts/proto_conv3d_pallas.py) — ~8% MFU, fill-
bound by Cout=32 against 128 output lanes plus lowering losses.

Storage scheme (constraints discovered on v5e Mosaic, see the proto
script): HBM arrays are tiled (8, 128) on the two minor dims, so a
C=32 minor dim can be neither DMA-sliced nor repacked for free.  Both
kernels therefore run on *W-folded dense-lane* views built by a free
XLA reshape:

    x (N, D+2, H+2, W, C)  ->  (N, D+2, H+2, W/r, r*C),  r*C = 128

Forward kernel (reference workload: the 3-D hourglass convs,
models/psmnet/stackhourglass.py:73-149):
  * grid (N, H/ht, D), d innermost; ring of 4 DMA'd (ht+2, W/r, 128)
    slabs with one-slab-ahead prefetch (DMA overlaps compute);
  * per w-parity pw: patches (ht*UF, 9C) from lane extractions of the
    nine (kd, kh)-shifted slab merges;
  * ONE matmul per parity (M, 9C) @ (9C, 3Co) — kw lives in the GEMM N
    dimension (kwfold), K = 9C = 288 deep;
  * each (pw, kw) product maps to an output parity and a folded
    u-shift in {-1,0,+1}: masked sublane rolls + lane concat assemble
    the folded output.

Kernel-gradient kernel: same slab machinery for x; the cotangent is
DMA'd in its canonical folded form and extended IN VMEM to a *slotted*
view (M, (r+2)*Co) where slot s holds g at w = u*r + s - 1 (two masked
sublane rolls + a lane concat).  For each x-parity pw the three kw
taps pair with slots pw+2-dw — a contiguous 3Co lane window, in
reversed-dw order — so the per-parity contraction is ONE
(M, 9C)^T (M, 3Co) matmul accumulated into a VMEM-resident (9C, 3Co)
f32 output across all grid steps.

Both kernels consume UNPADDED inputs: D/H boundary halos are predicated
DMAs / zeroed edge rows (`_slab_io`), so callers never materialize a
padded HBM copy of the volume.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_fwd_pallas", "conv3d_dk_pallas"]


def _fold(ci):
    r = max(1, 128 // ci)
    return r


def _pick_ht(H, UF, C, Co, r, itemsize, n_slabs=4, gl=0):
    """Largest ht whose kernel working set stays well under VMEM.

    Counts the DMA ring, one parity's patch matrix, the f32 GEMM
    output, the per-parity f32 accumulators, the double-buffered
    output block and (for dK) the cotangent slab, with 2x slack for
    Mosaic temporaries — f32 at wide shapes otherwise overflows the
    16 MB scoped-vmem budget."""
    ht = 32
    while ht > 1:
        if H % ht == 0:
            m = ht * UF
            est = (
                n_slabs * (ht + 2) * UF * r * C * itemsize  # ring
                + m * 9 * C * itemsize                       # patches
                + m * 3 * Co * 4                             # GEMM out
                + m * r * Co * 4                             # parity accs
                + 2 * ht * UF * r * Co * itemsize            # out blocks
                + ht * UF * gl * itemsize                    # dK g slab
            )
            if est * 2 <= 14_000_000:
                return ht
        ht //= 2
    return 1


def _slab_io(x_ref, ring, sems_m, sems_t, sems_b, n, j, d, h0,
             *, ht, UF, r, C, D, J):
    """Boundary-aware slab fill for the UNPADDED folded input.

    Slab rows 0..ht+1 map to input h0-1..h0+ht; pad index p maps to
    input depth p-1.  Out-of-range depth slabs are memset to zero; the
    top/bottom halo rows are DMA'd only when the neighbour tile exists
    (the j==0 / j==J-1 halo rows are zeroed once at d==0 and no DMA
    ever touches them).  This replaces the caller-side jnp.pad, which
    materialized a full HBM copy of the volume per conv (r5 trace:
    ~18 ms/step of pads + their layout copies at b4)."""

    def mid(p, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, p - 1, pl.ds(h0, ht), :, :],
            ring.at[slot, pl.ds(1, ht)], sems_m.at[slot],
        )

    def top(p, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, p - 1, pl.ds(h0 - 1, 1), :, :],
            ring.at[slot, pl.ds(0, 1)], sems_t.at[slot],
        )

    def bot(p, slot):
        return pltpu.make_async_copy(
            x_ref.at[n, p - 1, pl.ds(h0 + ht, 1), :, :],
            ring.at[slot, pl.ds(ht + 1, 1)], sems_b.at[slot],
        )

    def start(p, slot):
        valid = (p >= 1) & (p <= D)

        @pl.when(valid)
        def _():
            mid(p, slot).start()

            @pl.when(j > 0)
            def _():
                top(p, slot).start()

            @pl.when(j < J - 1)
            def _():
                bot(p, slot).start()

        @pl.when(jnp.logical_not(valid))
        def _():
            ring[slot] = jnp.zeros((ht + 2, UF, r * C), ring.dtype)

    def wait(p, slot):
        valid = (p >= 1) & (p <= D)

        @pl.when(valid)
        def _():
            mid(p, slot).wait()

            @pl.when(j > 0)
            def _():
                top(p, slot).wait()

            @pl.when(j < J - 1)
            def _():
                bot(p, slot).wait()

    # zero the halo rows no DMA will ever write for this (n, j) pass
    @pl.when((d == 0) & (j == 0))
    def _():
        for s in range(4):
            ring[s, 0] = jnp.zeros((UF, r * C), ring.dtype)

    @pl.when((d == 0) & (j == J - 1))
    def _():
        for s in range(4):
            ring[s, ht + 1] = jnp.zeros((UF, r * C), ring.dtype)

    @pl.when(d == 0)
    def _():
        start(0, 0)
        start(1, 1)
        start(2, 2)
        wait(0, 0)
        wait(1, 1)

    @pl.when(d + 3 < D + 2)
    def _():
        start(d + 3, (d + 3) % 4)

    wait(d + 2, (d + 2) % 4)


def _fwd_kernel(x_ref, km_ref, out_ref, ring, sems_m, sems_t, sems_b,
                *, ht, UF, r, C, Co, D, J):
    n = pl.program_id(0)
    j = pl.program_id(1)
    d = pl.program_id(2)
    h0 = j * ht

    _slab_io(x_ref, ring, sems_m, sems_t, sems_b, n, j, d, h0,
             ht=ht, UF=UF, r=r, C=C, D=D, J=J)

    M = ht * UF
    merged = []
    for kd in range(3):
        slab = ring[(d + kd) % 4]  # (ht+2, UF, r*C)
        for kh in range(3):
            merged.append(slab[kh:kh + ht].reshape(M, r * C))

    km = km_ref[:]  # (9C, 3Co)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    u_of = rows % UF

    outs = [None] * r  # per output parity: (M, Co) f32
    for pw in range(r):
        patches = jnp.concatenate(
            [m[:, pw * C:(pw + 1) * C] for m in merged], axis=-1
        )  # (M, 9C)
        P = jnp.dot(patches, km, preferred_element_type=jnp.float32)
        for kw in range(3):
            t = pw - kw + 1
            po = t % r
            sh = (t - po) // r  # -1, 0, +1 folded-u shift
            piece = P[:, kw * Co:(kw + 1) * Co]
            if sh == 1:
                piece = pltpu.roll(piece, 1, 0)
                piece = jnp.where(u_of == 0, 0.0, piece)
            elif sh == -1:
                piece = pltpu.roll(piece, M - 1, 0)
                piece = jnp.where(u_of == UF - 1, 0.0, piece)
            outs[po] = piece if outs[po] is None else outs[po] + piece

    acc = jnp.concatenate(outs, axis=-1)  # (M, r*Co)
    out_ref[0, 0] = acc.astype(out_ref.dtype).reshape(ht, UF, r * Co)


def conv3d_fwd_pallas_folded(xf, k, W: int, ht: int | None = None,
                             interpret: bool = False):
    """Folded-core stride-1 conv on the UNPADDED folded view
    (N, D, H, W/r, 128) with r = 128//C; returns the folded output
    (N, D, H, W/r, r*Co).  D/H boundaries are handled inside the kernel
    (predicated halo DMAs + edge memsets, `_slab_io`) — callers no
    longer materialize a padded HBM copy of the volume per conv (the
    pads + their layout copies cost ~18 ms/step at b4, r5 trace)."""
    n, D, H, UF, L = xf.shape
    C = k.shape[3]
    Co = k.shape[-1]
    assert k.shape[:3] == (3, 3, 3)
    r = _fold(C)
    assert r * C == 128 == L and UF * r == W, (xf.shape, k.shape, W)
    if ht is None:
        ht = _pick_ht(H, UF, C, Co, r, xf.dtype.itemsize)
    km = k.transpose(0, 1, 3, 2, 4).reshape(9 * C, 3 * Co).astype(xf.dtype)
    J = H // ht
    grid = (n, J, D)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, ht=ht, UF=UF, r=r, C=C, Co=Co, D=D,
                          J=J),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ht, UF, r * Co), lambda n, j, d: (n, d, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, D, H, UF, r * Co), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, ht + 2, UF, r * C), xf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * C * Co * n * D * H * W,
            bytes_accessed=(n * D * H * W * (C + Co)) * xf.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, km)


@functools.partial(jax.jit, static_argnames=("ht", "interpret"))
def conv3d_fwd_pallas(x, k, ht: int | None = None, interpret: bool = False):
    """stride-1 SAME 3x3x3 conv; x (N,D,H,W,C), k (3,3,3,C,Co).

    Requires 128 % C == 0 and W % (128//C) == 0 (PSMNet/GCNet volume
    shapes satisfy both).  1.5-1.9x faster than the native lax conv at
    hourglass shapes on v5e (PERF.md round 3)."""
    n, D, H, W, C = x.shape
    Co = k.shape[-1]
    r = _fold(C)
    assert W % r == 0 and r * C == 128, (W, C)
    UF = W // r
    xf = x.reshape(n, D, H, UF, r * C)
    out = conv3d_fwd_pallas_folded(xf, k, W, ht=ht, interpret=interpret)
    return out.reshape(n, D, H, W, Co)


def _dk_kernel(x_ref, gf_ref, dk_ref, ring, gslab, sems_m, sems_t, sems_b,
               gsem, *, ht, UF, r, C, Co, D, J, GL):
    n = pl.program_id(0)
    j = pl.program_id(1)
    d = pl.program_id(2)
    h0 = j * ht

    gcp = pltpu.make_async_copy(
        gf_ref.at[n, d, pl.ds(h0, ht), :, :], gslab, gsem
    )
    gcp.start()

    _slab_io(x_ref, ring, sems_m, sems_t, sems_b, n, j, d, h0,
             ht=ht, UF=UF, r=r, C=C, D=D, J=J)

    gcp.wait()

    M = ht * UF
    merged = []
    for kd in range(3):
        slab = ring[(d + kd) % 4]
        for kh in range(3):
            merged.append(slab[kh:kh + ht].reshape(M, r * C))

    # slotted cotangent built IN VMEM: slot s of folded column u holds
    # g at w = u*r + s - 1, i.e. [prev column's last block | g | next
    # column's first block].  The r4 version materialized this as an
    # XLA-side (r+2)*Co-lane HBM tensor — ~4.4 ms of concat/slice/pad
    # fusions and 2x cotangent DMA traffic per conv bwd (r5 trace).
    gm = gslab[:].reshape(M, GL)[:, :r * Co]
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    u_of = rows % UF
    prev = pltpu.roll(gm[:, (r - 1) * Co:].astype(jnp.float32), 1, 0)
    prev = jnp.where(u_of == 0, 0.0, prev).astype(gm.dtype)
    nxt = pltpu.roll(gm[:, :Co].astype(jnp.float32), M - 1, 0)
    nxt = jnp.where(u_of == UF - 1, 0.0, nxt).astype(gm.dtype)
    ge = jnp.concatenate([prev, gm, nxt], axis=-1)  # (M, (r+2)Co)

    first = (n == 0) & (j == 0) & (d == 0)

    @pl.when(first)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    acc = jnp.zeros((9 * C, 3 * Co), jnp.float32)
    for pw in range(r):
        patches = jnp.concatenate(
            [m[:, pw * C:(pw + 1) * C] for m in merged], axis=-1
        )  # (M, 9C)
        gsel = ge[:, pw * Co:(pw + 3) * Co]  # slots pw..pw+2 = dw 2,1,0
        acc = acc + lax.dot_general(
            patches, gsel, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dk_ref[:] += acc


def conv3d_dk_pallas_folded(xf, gf, k_shape, W: int, ht: int | None = None,
                            interpret: bool = False):
    """Folded-core kernel gradient: xf (N,D,H,W/r,128) UNPADDED folded
    input, gf (N,D,H,W/r,r*Co) folded cotangent -> (3,3,3,C,Co) f32.
    Boundaries handled in-kernel (`_slab_io`)."""
    n, D, H, UF, L = xf.shape
    C, Co = k_shape[3], k_shape[4]
    r = _fold(C)
    assert r * C == 128 == L and UF * r == W, (xf.shape, k_shape, W)
    assert gf.shape == (n, D, H, UF, r * Co), (gf.shape, (n, D, H, UF, r * Co))
    if ht is None:
        ht = _pick_ht(H, UF, C, Co, r, xf.dtype.itemsize,
                      gl=(2 * r + 2) * Co)
    # Mosaic DMA slices need 128-aligned lanes: pad the cotangent's
    # lane dim when r*Co < 128 (e.g. GCNet's 64->32 convs)
    GL = max(r * Co, 128)
    if r * Co < GL:
        gf = jnp.pad(gf, ((0, 0),) * 4 + ((0, GL - r * Co),))
    J = H // ht
    grid = (n, J, D)
    out = pl.pallas_call(
        functools.partial(_dk_kernel, ht=ht, UF=UF, r=r, C=C, Co=Co, D=D,
                          J=J, GL=GL),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((9 * C, 3 * Co), lambda n, j, d: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * C, 3 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, ht + 2, UF, r * C), xf.dtype),
            pltpu.VMEM((ht, UF, GL), gf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * C * Co * n * D * H * W,
            bytes_accessed=(n * D * H * W * (C + Co)) * xf.dtype.itemsize,
            transcendentals=0,
        ),
    )(xf, gf)
    # rows are (kd, kh, C); lanes are (dw reversed, Co)
    dk = out.reshape(3, 3, C, 3, Co)[:, :, :, ::-1, :]
    return jnp.transpose(dk, (0, 1, 3, 2, 4))


@functools.partial(jax.jit, static_argnames=("ht", "interpret"))
def conv3d_dk_pallas(x, g, ht: int | None = None, interpret: bool = False):
    """Kernel gradient of the stride-1 SAME 3x3x3 conv.

    x (N,D,H,W,C) input, g (N,D,H,W,Co) cotangent -> (3,3,3,C,Co) f32.
    Same shape constraints as conv3d_fwd_pallas."""
    n, D, H, W, C = x.shape
    Co = g.shape[-1]
    r = _fold(C)
    assert W % r == 0 and r * C == 128, (W, C)
    UF = W // r
    xf = x.reshape(n, D, H, UF, r * C)
    gf = g.reshape(n, D, H, UF, r * Co)
    return conv3d_dk_pallas_folded(xf, gf, (3, 3, 3, C, Co), W, ht=ht,
                                   interpret=interpret)
