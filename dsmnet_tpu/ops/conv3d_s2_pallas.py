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


# --------------------------------------------------------------- dx (folded)
#
# dx of the stride-2 conv IS the k3/s2/p1/op1 transposed conv of the
# cotangent.  The XLA route (unfold g -> parity-folded deconv GEMM ->
# fold dx) is GEMM-fast but pays ~10 ms of layout copies per call at
# the b4 conv1 shape (r5 trace: the [4,24,2,48,2,96,2,32] parity views
# and [4,48,96,48,128] fold boundaries are the largest copy cluster in
# the step).  This kernel reads the FOLDED cotangent and writes the
# FOLDED dx directly — no parity materialization, no unfold/fold.
#
# Geometry (C = 32, so one folded output column uo covers w-columns
# x = 4*uo + pw, pw in [0,4), lane = pw*C + c):
#   dx[z, y, x, c] = sum_{td,th,tw} k[td,th,tw,c,co] * g[gz, gy, w, co]
#   with gz = (z+1-td)/2 integral (z even -> td=1; z odd -> td in {0,2}),
#   same for gy, and w = (x+1-tw)/2 -> folded g column/parity:
#     (pw=0, tw=1) -> (uo, po=0)    (pw=1, tw=0) -> (uo, po=1)
#     (pw=1, tw=2) -> (uo, po=0)    (pw=2, tw=1) -> (uo, po=1)
#     (pw=3, tw=2) -> (uo, po=1)    (pw=3, tw=0) -> (uo+1, po=0) [side]
# The four (pz, py) output parities run as four GEMMs (N = 128) against
# per-parity kernel matrices; the side (uo+1) read is realized by
# rolling the f32 side product up one row (the dK kernel's trick).
# Output is written as the parity view (N, D/2, 2, H/2, 2, UF, 128)
# whose reshape to the canonical folded (N, D, H, UF, 128) is free.

# patch-order (dz, dy) -> (td, th) per parity; dz-major
_DX_TDH = {
    (0, 0): [(1, 1)],
    (0, 1): [(1, 2), (1, 0)],
    (1, 0): [(2, 1), (0, 1)],
    (1, 1): [(2, 2), (2, 0), (0, 2), (0, 0)],
}
_DX_TW = {(0, 0): 1, (1, 1): 0, (1, 0): 2, (2, 1): 1, (3, 1): 2}
_PARITIES = [(0, 0), (0, 1), (1, 0), (1, 1)]


def s2_dx_pallas_ok(x_shape, k_shape, itemsize: int = 2,
                    check_tiling: bool = True) -> bool:
    """x_shape is the forward INPUT (= dx output) logical shape."""
    n, D, H, W, C = x_shape
    if k_shape[:3] != (3, 3, 3):
        return False
    Co = k_shape[-1]
    if check_tiling and (W // 4) % 8 != 0:
        return False
    return (
        C == 32 and 8 <= Co <= 64 and Co % 8 == 0
        and D % 2 == 0 and H % 2 == 0 and W % 4 == 0 and D >= 4 and H >= 4
    )


def _dx_kernel_matrix(k):
    """(3,3,3,C,Co) -> concatenated per-parity main+side matrices
    (rows: [main p00 | p01 | p10 | p11 | side p00 | p01 | p10 | p11],
    cols: out lane = pw*C + c)."""
    C, Co = k.shape[3], k.shape[4]
    blocks = []
    for p in _PARITIES:
        for td, th in _DX_TDH[p]:
            blk = jnp.zeros((2, Co, 4 * C), k.dtype)
            for (pw, po), tw in _DX_TW.items():
                blk = blk.at[po, :, pw * C:(pw + 1) * C].set(
                    k[td, th, tw].swapaxes(0, 1))
            blocks.append(blk.reshape(2 * Co, 4 * C))
    for p in _PARITIES:
        for td, th in _DX_TDH[p]:
            blk = jnp.zeros((Co, 4 * C), k.dtype)
            blk = blk.at[:, 3 * C:].set(k[td, th, 0].swapaxes(0, 1))
            blocks.append(blk)
    return jnp.concatenate(blocks, axis=0)


def _dx_offsets(Co):
    """Static row offsets of each parity's main/side block in the
    concatenated kernel matrix."""
    offs = {}
    off = 0
    for p in _PARITIES:
        n = len(_DX_TDH[p])
        offs[("m", p)] = (off, n * 2 * Co)
        off += n * 2 * Co
    for p in _PARITIES:
        n = len(_DX_TDH[p])
        offs[("s", p)] = (off, n * Co)
        off += n * Co
    return offs, off


def _dx_kernel(gq_ref, km_ref, out_ref, ring, sem, *, hto, UF, C, Co, D2):
    n = pl.program_id(0)
    j = pl.program_id(1)
    zo = pl.program_id(2)
    h0 = j * hto
    L = 2 * Co

    def dma(plane, slot):
        return pltpu.make_async_copy(
            gq_ref.at[n, plane, pl.ds(h0, hto + 1), :, :],
            ring.at[slot], sem.at[slot],
        )

    @pl.when(zo == 0)
    def _():
        dma(0, 0).start()
        dma(0, 0).wait()
        dma(1, 1).start()

    # one-ahead prefetch (padded planes run to index D2)
    @pl.when(zo + 2 <= D2)
    def _():
        dma(zo + 2, (zo + 2) % 4).start()

    dma(zo + 1, (zo + 1) % 4).wait()

    slab_a = ring[zo % 4]        # g plane zo   (hto+1, UF, 2Co)
    slab_b = ring[(zo + 1) % 4]  # g plane zo+1
    M = hto * UF
    A = {
        (0, 0): slab_a[0:hto].reshape(M, L),
        (0, 1): slab_a[1:hto + 1].reshape(M, L),
        (1, 0): slab_b[0:hto].reshape(M, L),
        (1, 1): slab_b[1:hto + 1].reshape(M, L),
    }
    dzdy = {
        (0, 0): [(0, 0)],
        (0, 1): [(0, 0), (0, 1)],
        (1, 0): [(0, 0), (1, 0)],
        (1, 1): [(0, 0), (0, 1), (1, 0), (1, 1)],
    }
    offs, _total = _dx_offsets(Co)
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    for pz, py in _PARITIES:
        taps = dzdy[(pz, py)]
        P = jnp.concatenate([A[t] for t in taps], axis=-1) \
            if len(taps) > 1 else A[taps[0]]
        o, ln = offs[("m", (pz, py))]
        res = jnp.dot(P, km_ref[o:o + ln],
                      preferred_element_type=jnp.float32)
        Ps = jnp.concatenate([A[t][:, :Co] for t in taps], axis=-1) \
            if len(taps) > 1 else A[taps[0]][:, :Co]
        o, ln = offs[("s", (pz, py))]
        S = jnp.dot(Ps, km_ref[o:o + ln],
                    preferred_element_type=jnp.float32)
        # side product belongs at out column uo = (g column) - 1
        S = jnp.where((rows % UF) == UF - 1, 0.0, pltpu.roll(S, M - 1, 0))
        out_ref[0, 0, pz, :, py] = (res + S).astype(out_ref.dtype).reshape(
            hto, UF, 4 * C)


def conv3d_s2_dx_pallas_folded(gf, k, hto: int | None = None,
                               interpret: bool = False):
    """Folded dx of the stride-2 conv: gf (N, D/2, H/2, W/4, 2Co) folded
    cotangent, k (3,3,3,32,Co) -> folded dx (N, D, H, W*C/128, 128)."""
    n, D2, H2, UF, L = gf.shape
    C, Co = k.shape[3], k.shape[4]
    assert C == 32 and L == 2 * Co, (gf.shape, k.shape)
    gp = jnp.pad(gf, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    km = _dx_kernel_matrix(k).astype(gf.dtype)
    if hto is None:
        hto = 32
        while hto > 1:
            if H2 % hto == 0:
                est = (
                    4 * (hto + 1) * UF * L * gf.dtype.itemsize   # ring
                    + hto * UF * 8 * Co * gf.dtype.itemsize      # patches
                    + 4 * hto * UF * 128 * 4                     # products
                    + 2 * hto * UF * 4 * 128 * gf.dtype.itemsize # out blocks
                )
                if est * 2 <= 14_000_000:
                    break
            hto //= 2
    out = pl.pallas_call(
        functools.partial(_dx_kernel, hto=hto, UF=UF, C=C, Co=Co, D2=D2),
        grid=(n, H2 // hto, D2),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 2, hto, 2, UF, 4 * C),
            lambda n, j, zo: (n, zo, 0, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, D2, 2, H2, 2, UF, 4 * C),
                                       gf.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, hto + 1, UF, L), gf.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (9 * 2 * Co + 9 * Co) * n * D2 * H2 * UF * 128,
            bytes_accessed=(n * D2 * H2 * UF * L
                            + n * D2 * H2 * UF * 4 * 128) * gf.dtype.itemsize,
            transcendentals=0,
        ),
    )(gp, km)
    return out.reshape(n, 2 * D2, 2 * H2, UF, 128)
