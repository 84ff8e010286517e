"""Pallas TPU kernels for the stride-2 SAME(p=1) 3x3x3 convolution.

The hourglass down-path convs (reference stackhourglass.py:24-31 conv1/
conv3, gcnet.py:42-55 l21-l30) run at ~9 TFLOP/s through XLA's strided
conv lowering and are the concentrated backward fat of the PSMNet train
step (PERF.md r3 "Hourglass decomposition").

Scheme (sibling of the stride-1 folded-lane kernels, conv3d_pallas.py):

  * The padded input is viewed — by a FREE row-major reshape — as a
    parity tensor (N, (D+2)/2, 2, (H+2)/2, 2, W/4, 4C): stride-2 taps
    in D/H become *contiguous* slab slices (td=0 -> even plane j, td=1
    -> odd plane j, td=2 -> even plane j+1; same for th inside a slab),
    and the W stride lives entirely in the 4C lane groups.
  * Output is computed folded as (N, D/2, H/2, W/4, 2Co): one row of
    the GEMM covers BOTH output w-parities po of a folded column uo.
    Input w = 2(2*uo+po) + tw - 1 = 4*uo + s with s = 2po+tw-1 in
    [-1, 3]: s in [0,4) are lane slices of column uo, s = -1 is the
    pw=3 lane slice of column uo-1 (one masked sublane roll).
  * Patch matrix A = [9 full (td,th) slices (M, 4C) | 9 rolled side
    slices (M, C)] -> ONE GEMM (M, 45C) @ (45C, 2Co) with the kernel
    laid out per (pw, po) validity (tw = pw+1-2po), zero elsewhere.
    45C/27C = 1.67x dense FLOPs, but at full 128-lane MXU fill and
    45C-deep K vs the native lowering's strided gather.
  * dK is the transpose contraction A^T G of the SAME patch matrix
    against the folded cotangent (N, D/2, H/2, W/4, 2Co), accumulated
    into a VMEM-resident (45C, 2Co) f32 block across the whole grid;
    invalid (pw, po) entries are simply never read by the epilogue.
  * dx is NOT here: it is exactly the k=3 s=2 transposed conv, which
    ops.conv3d.deconv3d_k3s2 already runs as a parity-folded dense
    GEMM (0.28 ms fwd at the conv1 cotangent shape vs 1.2 ms for the
    XLA transpose identity).

Constraints: D, H, W even; W % 4 == 0; C % 32 == 0 (lane groups 4C a
multiple of 128); Co % 8 == 0.  Both hourglass shapes (32->64 and
64->64) and GCNet's l21/l24/l27/l30 qualify.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_s2_fwd_pallas", "conv3d_s2_dk_pallas", "s2_pallas_ok"]


def s2_pallas_ok(x_shape, k_shape, itemsize: int = 2,
                 check_tiling: bool = True) -> bool:
    n, D, H, W, C = x_shape
    if k_shape[:3] != (3, 3, 3):
        return False
    Co = k_shape[-1]
    # the slab DMA's second-minor extent W/4 must be tile-aligned
    # (Mosaic: "Slice shape along dimension 5 must be aligned to tiling");
    # the sublane tile is 8 for both f32 and bf16 (bf16 packs (2,1)
    # inside T(8,128) — conv3's UF=24 bf16 compiles, GCNet's UF=12 does
    # not, either dtype).  check_tiling=False skips this (interpret mode
    # has no DMA tiling).
    del itemsize
    if check_tiling and (W // 4) % 8 != 0:
        return False
    return (
        D % 2 == 0 and H % 2 == 0 and W % 4 == 0
        and C % 32 == 0 and C <= 128 and Co % 8 == 0 and Co <= 128
        and D >= 4 and H >= 4
    )


def _pick_hto(H2, UF, F, C, Co, itemsize, extra_lanes=0):
    """Largest output-row block whose working set fits VMEM with slack.

    Counts the 4+2 slab ring, the patch matrix, the f32 GEMM result,
    the double-buffered output block, and (dK) the cotangent slab +
    f32 accumulator, with 2x slack for Mosaic temporaries."""
    KT = 9 * F + 9 * C
    hto = 32
    while hto > 1:
        if H2 % hto == 0:
            M = hto * UF
            est = (
                6 * (hto + 1) * 2 * UF * F * itemsize      # slab rings
                + M * KT * itemsize                         # patch matrix
                + M * 2 * Co * 4                            # GEMM out f32
                + 2 * hto * UF * 2 * Co * itemsize          # out blocks
                + M * extra_lanes * itemsize                # dK g slab
                + KT * 2 * Co * 4                           # dK accumulator
            )
            if est * 2 <= 14_000_000:
                return hto
        hto //= 2
    return 1


def _patches(ring_e, ring_o, d, hto, UF, F, C):
    """Build the (M, 9F) main and (M, 9C) side patch matrices.

    Slabs are (hto+1, 2, UF, F): even-plane ring slot j%4 holds padded
    plane 2j, odd slot j%2 holds 2j+1; inside a slab, h-parity is the
    second axis (even rows first).  The side matrix holds the pw=3 lane
    groups UNSHIFTED — the required "column uo-1" shift is applied to
    the f32 GEMM product instead (Mosaic has no bf16 sublane rotate)."""
    M = hto * UF
    mains = []
    for td in range(3):
        if td == 0:
            slab = ring_e[d % 4]
        elif td == 1:
            slab = ring_o[d % 2]
        else:
            slab = ring_e[(d + 1) % 4]
        for th in range(3):
            if th == 0:
                sl = slab[0:hto, 0]
            elif th == 1:
                sl = slab[0:hto, 1]
            else:
                sl = slab[1:hto + 1, 0]
            mains.append(sl.reshape(M, F))
    A = jnp.concatenate(mains, axis=-1)
    B = jnp.concatenate([m[:, F - C:F] for m in mains], axis=-1)
    return A, B


def _fwd_kernel(xq_ref, km_ref, out_ref, ring_e, ring_o, sem_e, sem_o,
                *, hto, UF, F, C, Co, D2):
    n = pl.program_id(0)
    j = pl.program_id(1)
    d = pl.program_id(2)
    h0 = j * hto

    def dma_e(jd, slot):
        return pltpu.make_async_copy(
            xq_ref.at[n, jd, 0, pl.ds(h0, hto + 1), :, :, :],
            ring_e.at[slot], sem_e.at[slot],
        )

    def dma_o(jd, slot):
        return pltpu.make_async_copy(
            xq_ref.at[n, jd, 1, pl.ds(h0, hto + 1), :, :, :],
            ring_o.at[slot], sem_o.at[slot],
        )

    @pl.when(d == 0)
    def _():
        dma_e(0, 0).start()
        dma_o(0, 0).start()
        dma_e(0, 0).wait()
        dma_o(0, 0).wait()

    # prefetch one output-plane ahead
    @pl.when(d + 2 <= D2)
    def _():
        dma_e(d + 2, (d + 2) % 4).start()

    @pl.when(d + 1 < D2)
    def _():
        dma_o(d + 1, (d + 1) % 2).start()

    @pl.when(d == 0)
    def _():
        dma_e(1, 1).start()

    dma_e(d + 1, (d + 1) % 4).wait()

    @pl.when(d > 0)
    def _():
        dma_o(d, d % 2).wait()

    A, B = _patches(ring_e, ring_o, d, hto, UF, F, C)
    M = hto * UF
    P = jnp.dot(A, km_ref[0:9 * F], preferred_element_type=jnp.float32)
    S = jnp.dot(B, km_ref[9 * F:], preferred_element_type=jnp.float32)
    # side product belongs to column uo-1's pw=3 data read by column uo:
    # shift rows down by one, zeroing uo == 0 (w = -1 is the zero pad)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    S = jnp.where((rows % UF) == 0, 0.0, pltpu.roll(S, 1, 0))
    out_ref[0, 0] = (P + S).astype(out_ref.dtype).reshape(hto, UF, 2 * Co)


def _fwd_kernel_matrix(k, F):
    """(3,3,3,C,Co) -> (9F+9C, 2Co) laid out for the patch matrix."""
    C, Co = k.shape[3], k.shape[4]
    main = jnp.zeros((3, 3, 4, C, 2, Co), k.dtype)
    for po in range(2):
        for tw in range(3):
            pw = 2 * po + tw - 1
            if 0 <= pw < 4:
                main = main.at[:, :, pw, :, po, :].set(k[:, :, tw])
    side = jnp.zeros((3, 3, C, 2, Co), k.dtype)
    side = side.at[:, :, :, 0, :].set(k[:, :, 0])
    return jnp.concatenate(
        [main.reshape(9 * F, 2 * Co), side.reshape(9 * C, 2 * Co)], axis=0
    )


def _parity_view(x):
    """Free reshape of the padded input to the stride-2 parity view."""
    n, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    return xp.reshape(n, (D + 2) // 2, 2, (H + 2) // 2, 2, W // 4, 4 * C)


def conv3d_s2_fwd_pallas_padded(xp, k, W: int, hto: int | None = None,
                                interpret: bool = False):
    """Folded-core stride-2 conv: xp is the D/H-padded FOLDED input
    (N, D+2, H+2, W*C/128, 128); returns folded (N, D/2, H/2, W/4, 2Co).
    The parity regroup from the canonical folded form is a free
    row-major reshape."""
    n, Dp, Hp, _, _ = xp.shape
    D, H = Dp - 2, Hp - 2
    C, Co = k.shape[3], k.shape[4]
    F = 4 * C
    UF = W // 4
    D2, H2 = D // 2, H // 2
    if hto is None:
        hto = _pick_hto(H2, UF, F, C, Co, xp.dtype.itemsize)
    xq = xp.reshape(n, (D + 2) // 2, 2, (H + 2) // 2, 2, UF, F)
    km = _fwd_kernel_matrix(k, F).astype(xp.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, hto=hto, UF=UF, F=F, C=C, Co=Co, D2=D2),
        grid=(n, H2 // hto, D2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hto, UF, 2 * Co), lambda n, j, d: (n, d, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, D2, H2, UF, 2 * Co), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, hto + 1, 2, UF, F), xp.dtype),
            pltpu.VMEM((2, hto + 1, 2, UF, F), xp.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 45 * C * 2 * Co * n * D2 * H2 * UF,
            bytes_accessed=(n * D * H * W * C
                            + n * D2 * H2 * UF * 2 * Co) * xp.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, km)


@functools.partial(jax.jit, static_argnames=("hto", "interpret"))
def conv3d_s2_fwd_pallas(x, k, hto: int | None = None,
                         interpret: bool = False):
    """stride-2 SAME(p=1) 3x3x3 conv; x (N,D,H,W,C) -> (N,D/2,H/2,W/2,Co)."""
    n, D, H, W, C = x.shape
    Co = k.shape[-1]
    assert s2_pallas_ok(x.shape, k.shape, x.dtype.itemsize,
                        check_tiling=not interpret), (x.shape, k.shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    xp = xp.reshape(n, D + 2, H + 2, W * C // 128, 128)
    out = conv3d_s2_fwd_pallas_padded(xp, k, W, hto=hto, interpret=interpret)
    return out.reshape(n, D // 2, H // 2, W // 2, Co)


def _dk_kernel(xq_ref, gf_ref, dk_ref, ring_e, ring_o, gslab,
               sem_e, sem_o, gsem, *, hto, UF, F, C, Co, D2):
    n = pl.program_id(0)
    j = pl.program_id(1)
    d = pl.program_id(2)
    h0 = j * hto

    def dma_e(jd, slot):
        return pltpu.make_async_copy(
            xq_ref.at[n, jd, 0, pl.ds(h0, hto + 1), :, :, :],
            ring_e.at[slot], sem_e.at[slot],
        )

    def dma_o(jd, slot):
        return pltpu.make_async_copy(
            xq_ref.at[n, jd, 1, pl.ds(h0, hto + 1), :, :, :],
            ring_o.at[slot], sem_o.at[slot],
        )

    gcp = pltpu.make_async_copy(
        gf_ref.at[n, d, pl.ds(h0, hto), :, :], gslab, gsem
    )
    gcp.start()

    @pl.when(d == 0)
    def _():
        dma_e(0, 0).start()
        dma_o(0, 0).start()
        dma_e(0, 0).wait()
        dma_o(0, 0).wait()

    @pl.when(d + 2 <= D2)
    def _():
        dma_e(d + 2, (d + 2) % 4).start()

    @pl.when(d + 1 < D2)
    def _():
        dma_o(d + 1, (d + 1) % 2).start()

    @pl.when(d == 0)
    def _():
        dma_e(1, 1).start()

    dma_e(d + 1, (d + 1) % 4).wait()

    @pl.when(d > 0)
    def _():
        dma_o(d, d % 2).wait()

    gcp.wait()

    A, B = _patches(ring_e, ring_o, d, hto, UF, F, C)
    M = hto * UF
    G = gslab[:].reshape(M, 2 * Co)

    # side contraction pairs X3[hh, uo-1] with G[hh, uo] == X3[hh, uo]
    # with G[hh, uo+1]: shift the (f32) cotangent up one row, zeroing
    # the uo == UF-1 wrap rows, then cast back (lossless)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    Gs = jnp.where(
        (rows % UF) == UF - 1, 0.0,
        pltpu.roll(G.astype(jnp.float32), M - 1, 0),
    ).astype(G.dtype)

    first = (n == 0) & (j == 0) & (d == 0)

    @pl.when(first)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)

    dk_ref[0:9 * F, :] += lax.dot_general(
        A, G, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[9 * F:, :] += lax.dot_general(
        B, Gs, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def conv3d_s2_dk_pallas_padded(xp, gf, k_shape, W: int,
                               hto: int | None = None,
                               interpret: bool = False):
    """Folded-core stride-2 kernel gradient: xp (N,D+2,H+2,W*C/128,128)
    padded folded input, gf (N,D/2,H/2,W/4,2Co) folded cotangent ->
    (3,3,3,C,Co) f32."""
    n, Dp, Hp, _, _ = xp.shape
    D, H = Dp - 2, Hp - 2
    C, Co = k_shape[3], k_shape[4]
    F = 4 * C
    UF = W // 4
    D2, H2 = D // 2, H // 2
    KT = 9 * F + 9 * C
    if hto is None:
        hto = _pick_hto(H2, UF, F, C, Co, xp.dtype.itemsize,
                        extra_lanes=2 * Co)
    xq = xp.reshape(n, (D + 2) // 2, 2, (H + 2) // 2, 2, UF, F)
    assert gf.shape == (n, D2, H2, UF, 2 * Co), gf.shape
    block = pl.pallas_call(
        functools.partial(_dk_kernel, hto=hto, UF=UF, F=F, C=C, Co=Co, D2=D2),
        grid=(n, H2 // hto, D2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((KT, 2 * Co), lambda n, j, d: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((KT, 2 * Co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, hto + 1, 2, UF, F), xp.dtype),
            pltpu.VMEM((2, hto + 1, 2, UF, F), xp.dtype),
            pltpu.VMEM((hto, UF, 2 * Co), gf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 45 * C * 2 * Co * n * D2 * H2 * UF,
            bytes_accessed=(n * D * H * W * C
                            + n * D2 * H2 * UF * 2 * Co) * xp.dtype.itemsize,
            transcendentals=0,
        ),
    )(xq, gf)
    # epilogue: gather the valid (pw, po) entries per tap tw
    main = block[: 9 * F].reshape(3, 3, 4, C, 2, Co)
    side = block[9 * F:].reshape(3, 3, C, 2, Co)
    taps = []
    for tw in range(3):
        acc = jnp.zeros((3, 3, C, Co), jnp.float32)
        for po in range(2):
            pw = 2 * po + tw - 1
            if 0 <= pw < 4:
                acc = acc + main[:, :, pw, :, po, :]
        if tw == 0:
            acc = acc + side[:, :, :, 0, :]
        taps.append(acc)
    return jnp.stack(taps, axis=2)  # (3, 3, 3, C, Co)


@functools.partial(jax.jit, static_argnames=("hto", "interpret"))
def conv3d_s2_dk_pallas(x, g, hto: int | None = None,
                        interpret: bool = False):
    """Kernel gradient of the stride-2 conv: x (N,D,H,W,C),
    g (N,D/2,H/2,W/2,Co) -> (3,3,3,C,Co) f32."""
    n, D, H, W, C = x.shape
    Co = g.shape[-1]
    assert s2_pallas_ok(x.shape, (3, 3, 3, C, Co), x.dtype.itemsize,
                        check_tiling=not interpret), (x.shape, g.shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    xp = xp.reshape(n, D + 2, H + 2, W * C // 128, 128)
    gf = g.reshape(n, D // 2, H // 2, W // 4, 2 * Co)
    return conv3d_s2_dk_pallas_padded(xp, gf, (3, 3, 3, C, Co), W, hto=hto,
                                      interpret=interpret)
