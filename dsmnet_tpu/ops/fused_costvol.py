"""Fused concat-cost-volume + first 3-D convolution.

PSMNet's matching stage builds a (N, D, H, W, 2F) volume and immediately
convolves it (dres0, 3x3x3, SAME, no bias —
psmnet/stackhourglass.py:124-135).  Because every volume voxel is just a
(possibly masked / shifted) copy of a 2-D feature, the 3-D convolution
collapses exactly:

    out[d,h,w,o] = sum_{dd,dh,dw,c} K[dd,dh,dw,c,o] * vol[d+dd,h+dh,w+dw,c]

  left half  (c < F):  vol = fL[h',w'] * [w' >= d']   (mask_left)
  right half (c >= F): vol = fR[h', w'-d'] * [w'-d' >= 0]

  =>  out[d,h,w,o] =   sum_{dd,dw} A_{dd,dw}[h,w,o]   * leftmask(d,w)
                     + sum_{dd,dw} B_{dd,dw}[h, w+dw-(d+dd), o] * extent(d,w)

with A/B small 2-D "tap maps" (3-tap dh convolutions of fL / fR against
kernel slices) that are *independent of d*.  The O(D*H*W*27*2F) conv
FLOPs become O(H*W*9*3*F) map FLOPs plus a pure shift/mask/add assembly
— and the 2F-channel volume is never materialized (HBM traffic for the
stage drops ~4x; the conv drops ~1000x in FLOPs).

This module provides the exact jnp decomposition (differentiable, used
as the spec and CPU path) and the composed reference for testing.
Validity bookkeeping:
  * A maps zero-pad w+dw out of [0, W-1] (volume extent) via the shift;
  * B contributions additionally require 0 <= w+dw <= W-1 explicitly and
    get u = w+dw-(d+dd) < 0 for free from index masking;
  * taps with d+dd outside [0, D-1] are dropped (conv pad in D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "cost_volume_conv3x3",
    "cost_volume_conv3x3_reference",
]

_TAPS = [(dd, dw) for dd in (-1, 0, 1) for dw in (-1, 0, 1)]


def cost_volume_conv3x3_reference(fL, fR, kernel, D: int, mask_left: bool = True):
    """Golden composition: build the volume, run lax 3-D conv (SAME)."""
    from .cost_volume import concat_cost_volume_reference

    vol = concat_cost_volume_reference(fL, fR, D, mask_left)
    dn = lax.conv_dimension_numbers(
        vol.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    return lax.conv_general_dilated(
        vol, kernel, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn
    )


def _conv_dh(x, k):
    """3-tap conv over H contracting features: x (N,H,W,F), k (3,F,O)."""
    dn = lax.conv_dimension_numbers(x.shape, (3, 1) + k.shape[1:],
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, k[:, None], (1, 1), [(1, 1), (0, 0)], dimension_numbers=dn
    )


def _shift_w(x, s: int):
    """x shifted so out[..., w, :] = x[..., w+s, :], zero padded."""
    if s == 0:
        return x
    n, h, w, c = x.shape
    if s > 0:
        return jnp.pad(x[:, :, s:, :], ((0, 0), (0, 0), (0, s), (0, 0)))
    return jnp.pad(x[:, :, :w + s, :], ((0, 0), (0, 0), (-s, 0), (0, 0)))


def _tap_maps(fL, fR, kernel):
    """A/B tap maps keyed by (dd, dw) — see module docstring."""
    f = fL.shape[-1]
    KL = kernel[..., :f, :]   # (3,3,3,F,O) over (dd,dh,dw)
    KR = kernel[..., f:, :]
    A, B = {}, {}
    for i, dd in enumerate((-1, 0, 1)):
        for k, dw in enumerate((-1, 0, 1)):
            A[(dd, dw)] = _shift_w(_conv_dh(fL, KL[i, :, k]), dw)
            B[(dd, dw)] = _conv_dh(fR, KR[i, :, k])
    return A, B


def _assemble_jnp(A, B, D, W, mask_left, dtype, d_values=None, w_values=None):
    """Exact assembly of the tap maps (spec / CPU path).

    ``d_values`` / ``w_values`` restrict the output to those disparity
    slices / image columns (used to patch the Pallas kernel's interior
    formula at the boundaries)."""
    some = next(iter(A.values()))
    n, h, w, o = some.shape
    dv = jnp.arange(D) if d_values is None else jnp.asarray(d_values)
    wv = jnp.arange(w) if w_values is None else jnp.asarray(w_values)
    d_iota = dv[None, :, None, None, None]
    w_iota = wv[None, None, None, :, None]
    if w_values is not None:
        A = {k: jnp.stack([v[:, :, int(i), :] for i in w_values], axis=2)
             for k, v in A.items()}
    out = jnp.zeros((n, dv.shape[0], h, wv.shape[0], o), dtype)
    for dd, dw in _TAPS:
        dval = (d_iota + dd >= 0) & (d_iota + dd <= D - 1)
        wext = (w_iota + dw >= 0) & (w_iota + dw <= w - 1)
        a = A[(dd, dw)][:, None]
        if mask_left:
            lmask = dval & (w_iota + dw >= d_iota + dd)
        else:
            lmask = dval
        out = out + jnp.where(lmask, a, 0.0)
        u = w_iota + dw - (d_iota + dd)
        uval = dval & wext & (u >= 0)
        uc = jnp.clip(u[0, :, 0, :, 0], 0, w - 1)
        b = B[(dd, dw)]
        bg = jnp.moveaxis(b[:, :, uc, :], 2, 1)
        out = out + jnp.where(uval, bg, 0.0)
    return out


def _place_w(col, left, W):
    """(n, h, L, o) column -> (n, h, W, o) with out[v] = col[v - left]
    (zero outside); left may be negative.  All indices static."""
    n, h, L, o = col.shape
    if left >= 0:
        seg = col[:, :, : max(0, min(L, W - left)), :]
    else:
        seg = col[:, :, -left: max(-left, min(L, W - left)), :]
        left = 0
    pad_r = W - left - seg.shape[2]
    return jnp.pad(seg, ((0, 0), (0, 0), (left, pad_r), (0, 0)))


def _stem_bwd(fL, fR, kernel, D, mask_left, g):
    """Manual VJP of the fused volume+conv — scatter-free, and (r5)
    single-pass over the volume.

    XLA's autodiff of the assembly turns the nine B-map gathers into
    volume-sized scatter-adds (full stem grad 12.2 ms at the PSMNet
    shape), and gather-based backwards are worse still on TPU (seconds).
    The r4 version was gather/scatter-free but still made 18 masked
    full-volume reductions (9 dA + 9 dB) plus three skew buildups
    (~15 ms of transposes/pads at b4, r5 trace).  The algebra collapses:

      * dA[(dd,dw)][w] = sum_{d <= w+dw-dd} g[d,w] — a prefix sum: ONE
        cumsum over D, then each tap is a strided-slice diagonal
        extraction cum[w+e, w] (stride W+1 on the flat view) plus
        single-row corrections for the d-range exclusions;
      * dB[(dd,dw)][v] = sum_d g[d, v+d+dd-dw] — every tap is a
        W-shift of ONE anti-diagonal sum T[u] = sum_d g[d, u+d]
        (skew-reshape + one reduction), minus single-row terms (the
        d-range exclusions) and a flipped single-column term (the
        w-boundary condition of dw = +1).

    Exact — verified against jax.vjp of the raw decomposition
    (tests/test_ops.py)."""
    f = fL.shape[-1]
    n, h, W = fL.shape[0], fL.shape[1], fL.shape[2]
    o = kernel.shape[-1]
    KL = kernel[..., :f, :].astype(jnp.float32)
    KR = kernel[..., f:, :].astype(jnp.float32)
    S = jnp.sum(g, axis=1, dtype=jnp.float32)          # (n,h,W,o)

    # H-shifted input stacks reused by every tap's kernel gradient
    fLp = jnp.pad(fL, ((0, 0), (1, 1), (0, 0), (0, 0)))
    fRp = jnp.pad(fR, ((0, 0), (1, 1), (0, 0), (0, 0)))
    fLs = jnp.stack([fLp[:, kh:kh + h] for kh in range(3)])
    fRs = jnp.stack([fRp[:, kh:kh + h] for kh in range(3)])

    gt = jnp.moveaxis(g, 1, 2)                         # (n,h,D,W,o)
    row0 = gt[:, :, 0].astype(jnp.float32)             # (n,h,W,o)
    rowN = gt[:, :, D - 1].astype(jnp.float32)
    colW = gt[:, :, :, W - 1, :]                       # (n,h,D,o)

    # ---- ONE anti-diagonal sum: T[u] = sum_d g[d, u+d], u = j - 2
    Wp = W + D + 4
    gp = jnp.pad(gt, ((0, 0), (0, 0), (0, 0), (2, D + 2), (0, 0)))
    flat = gp.reshape(n, h, D * Wp, o)
    flat = jnp.pad(flat, ((0, 0), (0, 0), (0, D), (0, 0)))
    skew = flat.reshape(n, h, D, Wp + 1, o)
    T = jnp.sum(skew, axis=2, dtype=jnp.float32)       # (n,h,Wp+1,o)

    # ---- ONE prefix sum + 5 diagonal extractions: E[e][w] = cum[w+e, w]
    # (0 for w+e < 0, S for w+e > D-1)
    if mask_left:
        # prefix sums over D as a triangular matmul: XLA lowers cumsum
        # via reduce_window plus a full f32 convert of the volume
        # (~6 ms at b4, r5 trace); the (D, D) GEMM reads bf16 directly
        # and runs on the MXU
        tri = jnp.tril(jnp.ones((D, D), gt.dtype))
        cum = lax.dot_general(
            tri, gt, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32)        # (D, n, h, W, o)
        cum = jnp.moveaxis(cum, 0, 2)                  # (n, h, D, W, o)
        cflat = cum.reshape(n, h, D * W, o)
        E = {}
        for e in range(-2, 3):
            lo = max(0, -e)
            hi = max(lo, min(W, D - e))
            cnt = hi - lo
            if cnt > 0:
                s0 = (lo + e) * W + lo
                part = lax.slice(
                    cflat, (0, 0, s0, 0),
                    (n, h, s0 + (cnt - 1) * (W + 1) + 1, o),
                    (1, 1, W + 1, 1),
                )
            else:
                part = jnp.zeros((n, h, 0, o), jnp.float32)
            E[e] = jnp.concatenate(
                [jnp.zeros((n, h, lo, o), jnp.float32), part,
                 S[:, :, hi:W, :]], axis=2)

    dfL = jnp.zeros(fL.shape, jnp.float32)
    dfR = jnp.zeros(fR.shape, jnp.float32)
    dKL = jnp.zeros(KL.shape, jnp.float32)
    dKR = jnp.zeros(KR.shape, jnp.float32)

    w_iota = jnp.arange(W)[None, None, :, None]

    for i, dd in enumerate((-1, 0, 1)):
        for k, dw in enumerate((-1, 0, 1)):
            # ---- left cotangent map: dA = sum_{d in rows} g[d, w],
            #      d <= w + e with e = dw - dd ----
            e = dw - dd
            if mask_left:
                dA = E[e]
                if dd == -1:
                    dA = dA - jnp.where(w_iota + e >= 0, row0, 0.0)
                elif dd == 1:
                    dA = jnp.where(w_iota + e >= D - 1, S - rowN, dA)
            else:
                dA = S
                if dd == -1:
                    dA = S - row0
                elif dd == 1:
                    dA = S - rowN
            dC = _shift_w(dA, -dw)                      # shift_w transpose
            k2 = jnp.flip(KL[i, :, k], 0).swapaxes(1, 2)
            dfL = dfL + _conv_dh(dC, k2)
            dKL = dKL.at[i, :, k].add(jnp.einsum(
                "knhwf,nhwo->kfo", fLs, dC.astype(fLs.dtype),
                preferred_element_type=jnp.float32))

            # ---- right cotangent map: dB[v] = sum_{d in rows}
            #      g[d, v+d+delta] minus the w-boundary term ----
            delta = dd - dw
            dB = lax.slice_in_dim(T, delta + 2, delta + 2 + W, axis=2)
            if dd == -1:
                dB = dB - _shift_w(row0, delta)
            elif dd == 1:
                dB = dB - _shift_w(rowN, delta + D - 1)
            if dw == 1:
                # skew counted g[d*, W-1] at d* = W-1-v-delta; the
                # assembly's wext zeroed that column for this tap
                col = colW
                if dd == -1:
                    col = col.at[:, :, 0, :].set(0)
                elif dd == 1:
                    col = col.at[:, :, D - 1, :].set(0)
                hit = _place_w(jnp.flip(col, axis=2), W - D - delta, W)
                dB = dB - hit.astype(jnp.float32)
            # dw == -1 hits g[d*, 0] only at (dd=-1, v=0, d*=0), which
            # the d-range exclusion already removed — no correction
            k2r = jnp.flip(KR[i, :, k], 0).swapaxes(1, 2)
            dfR = dfR + _conv_dh(dB, k2r)
            dKR = dKR.at[i, :, k].add(jnp.einsum(
                "knhwf,nhwo->kfo", fRs, dB.astype(fRs.dtype),
                preferred_element_type=jnp.float32))

    dkernel = jnp.concatenate([dKL, dKR], axis=-2).astype(kernel.dtype)
    return dfL.astype(fL.dtype), dfR.astype(fR.dtype), dkernel


def cost_volume_conv3x3_raw(fL, fR, kernel, D: int, mask_left: bool = True):
    """Autodiff-able decomposition (no custom VJP) — test reference."""
    A, B = _tap_maps(fL, fR, kernel)
    return _assemble_jnp(A, B, D, fL.shape[2], mask_left, fL.dtype)


def _assemble_grouped(fL, fR, kernel, D, mask_left):
    """Assembly with the nine tap maps GROUPED by diagonal offset.

    For interior d in [1, D-2] every tap is d-valid, so a left map's
    contribution pattern depends only on m = dd - dw (mask w >= d+m) and
    a right map's only on e = dw - dd (gather at u = w - d + e): summing
    the maps within each group first cuts the volume-sized assembly
    terms from 18 to 10 (multiplicities 1/2/3/2/1) — the b4 trace
    showed ~23 ms of gather fusions + ~14 ms of stack copies in this
    assembly.  The d = 0 / d = D-1 rows and the w = 0 / w = W-1 columns
    (where per-tap validity differs inside a group) are patched with
    the exact per-tap formula."""
    W = fL.shape[2]
    A, B = _tap_maps(fL, fR, kernel)
    dtype = fL.dtype
    if D < 3 or W < 3:
        return _assemble_jnp(A, B, D, W, mask_left, dtype)
    Am, Be = {}, {}
    for dd in (-1, 0, 1):
        for dw in (-1, 0, 1):
            m, e = dd - dw, dw - dd
            a, b = A[(dd, dw)], B[(dd, dw)]
            Am[m] = a if m not in Am else Am[m] + a
            Be[e] = b if e not in Be else Be[e] + b

    n, h, w, o = Am[0].shape
    d_iota = jnp.arange(1, D - 1)[None, :, None, None, None]
    w_iota = jnp.arange(w)[None, None, None, :, None]
    out = jnp.zeros((n, D - 2, h, w, o), dtype)
    for m, a in sorted(Am.items()):
        a = a[:, None]
        if mask_left:
            out = out + jnp.where(w_iota >= d_iota + m, a, 0.0)
        else:
            out = out + a
    for e, b in sorted(Be.items()):
        u = w_iota + e - d_iota
        uc = jnp.clip(u[0, :, 0, :, 0], 0, w - 1)
        bg = jnp.moveaxis(b[:, :, uc, :], 2, 1)
        out = out + jnp.where(u >= 0, bg, 0.0)

    interior_d = list(range(1, D - 1))
    cols = _assemble_jnp(A, B, D, W, mask_left, dtype,
                         d_values=interior_d, w_values=[0, W - 1])
    mid = jnp.concatenate(
        [cols[:, :, :, 0:1], out[:, :, :, 1:W - 1], cols[:, :, :, 1:2]],
        axis=3,
    )
    lo = _assemble_jnp(A, B, D, W, mask_left, dtype, d_values=[0])
    hi = _assemble_jnp(A, B, D, W, mask_left, dtype, d_values=[D - 1])
    return jnp.concatenate([lo, mid, hi], axis=1)


def _assemble_skew(fL, fR, kernel, D, mask_left):
    """Gather-free assembly via the skew-reshape trick (r5).

    The r4 grouped assembly still paid ~23 ms of gather fusions and
    ~14 ms of stack copies per b4 step: each right group e was gathered
    at u = w - d + e with a (D, W) index array, and the d/w boundary
    patches were applied as whole-volume concatenations.  This version
    removes every gather and every concat:

      * RIGHT: all five e-groups collapse into ONE combined 2-D map
        first (u = w - d + e means group e is a static W-shift of the
        same base offset), then the single per-d offset -d is realized
        by the skew re-view — broadcast the padded map over D, re-view
        rows at length Wp-1, and row d reads column j - d.  One volume
        copy, no index arrays.
      * LEFT: sum_m Am * [w >= d+m] depends on j = w - d only through
        which prefix of the m-sorted maps applies, so it is a fused
        chain of selects among six precomputed 2-D prefix maps.
      * BOUNDARIES (d = 0 / D-1 rows, w = 0 / W-1 columns, where per-tap
        validity differs): exact thin patches applied with
        iota-compare ``jnp.where`` — they fuse into the same output
        write instead of re-copying the volume.
    """
    W = fL.shape[2]
    A, B = _tap_maps(fL, fR, kernel)
    dtype = fL.dtype
    if D < 3 or W < 3:
        return _assemble_jnp(A, B, D, W, mask_left, dtype)

    Am, Be = {}, {}
    for dd in (-1, 0, 1):
        for dw in (-1, 0, 1):
            m, e = dd - dw, dw - dd
            a, b = A[(dd, dw)], B[(dd, dw)]
            Am[m] = a if m not in Am else Am[m] + a
            Be[e] = b if e not in Be else Be[e] + b

    n, h, w, o = Am[0].shape

    # ---- right half: one skewed broadcast of the combined map ----
    # interior rows d in [1, D-2], interior cols w in [1, W-2]:
    # contribution = sum_e Be[e][w - d + e], zeros where w - d + e < 0
    PB = D + 2
    Wp = W + PB + 4  # left margin PB (covers u >= -D-1), right margin 4
    Bsum = jnp.zeros((n, h, Wp, o), dtype)
    for e, b in Be.items():
        # place Be[e] so that column (PB + v - e) holds Be[e][v]:
        # reading column w - d + PB then yields Be[e][w - d + e]
        Bsum = Bsum + jnp.pad(
            b, ((0, 0), (0, 0), (PB - e, 4 + e), (0, 0)))
    Bb = jnp.broadcast_to(Bsum[:, :, None], (n, h, D, Wp, o))
    flat = Bb.reshape(n, h, D * Wp, o)
    skew = flat[:, :, : D * (Wp - 1)].reshape(n, h, D, Wp - 1, o)
    right = skew[:, :, :, PB : PB + W, :]  # [d, w] = Bsum[w - d + PB]
    right = jnp.moveaxis(right, 2, 1)      # (n, D, h, W, o)

    d_iota = jnp.arange(D)[None, :, None, None, None]
    w_iota = jnp.arange(W)[None, None, None, :, None]
    j = w_iota - d_iota

    # ---- left half: prefix-map select on j = w - d ----
    if mask_left:
        order = sorted(Am)  # (-2, -1, 0, 1, 2)
        prefix = []
        acc = None
        for m in order:
            acc = Am[m] if acc is None else acc + Am[m]
            prefix.append(acc[:, None])  # sum of maps with m <= order[i]
        # j >= 2 -> all taps pass; j == k in [-2, 1] -> prefix up to k;
        # j < -2 -> zero
        left = jnp.where(j >= 2, prefix[4],
               jnp.where(j == 1, prefix[3],
               jnp.where(j == 0, prefix[2],
               jnp.where(j == -1, prefix[1],
               jnp.where(j == -2, prefix[0], jnp.zeros((), dtype))))))
    else:
        left = jnp.broadcast_to(sum(Am.values())[:, None],
                                (n, D, h, W, o))

    out = left + right

    # ---- exact boundary patches, fused as where-selects ----
    cols = _assemble_jnp(A, B, D, W, mask_left, dtype,
                         w_values=[0, W - 1])          # (n, D, h, 2, o)
    out = jnp.where(w_iota == 0, cols[:, :, :, 0:1, :], out)
    out = jnp.where(w_iota == W - 1, cols[:, :, :, 1:2, :], out)
    rows = _assemble_jnp(A, B, D, W, mask_left, dtype,
                         d_values=[0, D - 1])          # (n, 2, h, W, o)
    out = jnp.where(d_iota == 0, rows[:, 0:1], out)
    out = jnp.where(d_iota == D - 1, rows[:, 1:2], out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_jnp(fL, fR, kernel, D, mask_left):
    from . import config

    assemble = _assemble_skew if config.stem_assembly == "skew" \
        else _assemble_grouped
    return assemble(fL, fR, kernel, D, mask_left)


def _fused_jnp_fwd(fL, fR, kernel, D, mask_left):
    return _fused_jnp(fL, fR, kernel, D, mask_left), (fL, fR, kernel)


def _fused_jnp_bwd(D, mask_left, res, g):
    return _stem_bwd(*res, D, mask_left, g)


_fused_jnp.defvjp(_fused_jnp_fwd, _fused_jnp_bwd)


def cost_volume_conv3x3(fL, fR, kernel, D: int, mask_left: bool = True,
                        use_pallas: bool | None = None, interpret: bool = False):
    """Fused volume+conv via the tap-map decomposition.

    fL/fR (N,H,W,F); kernel (3,3,3,2F,O) in DHWIO layout; returns
    (N,D,H,W,O) — equal (up to float association) to
    ``cost_volume_conv3x3_reference``.  On TPU the assembly runs as a
    Pallas kernel that keeps all 18 tap maps VMEM-resident across the
    d-axis so HBM traffic is essentially the output write.
    """
    from . import config

    if use_pallas is None:
        # default jnp: XLA's fused assembly measures faster than the
        # current Pallas assemble (4.0 vs 6.2 ms at PSMNet production
        # shape — dynamic sublane shifts dominate the kernel; see PERF.md)
        use_pallas = config.use_pallas if config.use_pallas is not None else False
    from ..parallel.context import shard_cost_volume

    if use_pallas:
        out = _fused_pallas(fL, fR, kernel, D, mask_left, interpret)
    else:
        out = _fused_jnp(fL, fR, kernel, D, mask_left)
    return shard_cost_volume(out)


def _interior_kernel(*refs, D, W, O, PB, mask_left, ms, es):
    """Interior-formula assembly: valid for d in [1, D-2] and w in
    [1, W-2]; boundaries are patched exactly in XLA afterwards.

    refs: len(ms) left maps grouped by m = dd-dw (or one dense map when
    mask_left=False), then len(es) right maps grouped by e = dw-dd
    (left-padded by PB columns), then the output block.
    """
    n_left = len(ms) if mask_left else 1
    L_refs = refs[:n_left]
    B_refs = refs[n_left:n_left + len(es)]
    out_ref = refs[n_left + len(es)]
    d = pl.program_id(2)
    th = L_refs[0].shape[1]
    acc = jnp.zeros((th, W, O), jnp.float32)
    if mask_left:
        col = jax.lax.broadcasted_iota(jnp.int32, (th, W, 1), 1)
        for g, m in enumerate(ms):
            a = L_refs[g][0].astype(jnp.float32)
            acc = acc + a * (col >= d + m).astype(jnp.float32)
    else:
        acc = acc + L_refs[0][0].astype(jnp.float32)
    for g, e in enumerate(es):
        off = PB + e - d  # >= 1 for d <= D-1 (PB = D + 2)
        b = B_refs[g][0, :, pl.ds(off, W), :]
        acc = acc + b.astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _fused_pallas_fwd(fL, fR, kernel, D, mask_left, interpret=False):
    in_dtype = fL.dtype
    if in_dtype == jnp.bfloat16:
        # dynamic sublane slices need 16-row alignment for bf16 tiles;
        # run the (small) tap maps and assembly in f32 instead
        fL = fL.astype(jnp.float32)
        fR = fR.astype(jnp.float32)
        kernel = kernel.astype(jnp.float32)
    A, B = _tap_maps(fL, fR, kernel)
    n, h, w, o = A[_TAPS[0]].shape
    pb = D + 2

    # interior grouping: left by m = dd-dw, right by e = dw-dd
    ms = (-2, -1, 0, 1, 2)
    es = (-2, -1, 0, 1, 2)
    if mask_left:
        Lg = [sum(A[(dd, dw)] for dd, dw in _TAPS if dd - dw == m) for m in ms]
    else:
        Lg = [sum(A.values())]
    Bg = [
        jnp.pad(sum(B[(dd, dw)] for dd, dw in _TAPS if dw - dd == e),
                ((0, 0), (0, 0), (pb, 3), (0, 0)))
        for e in es
    ]

    th = 8
    while h % th:
        th //= 2
    grid = (n, h // th, D)  # d fastest: map tiles stay resident across d
    l_spec = pl.BlockSpec((1, th, w, o), lambda i, j, d: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, th, w + pb + 3, o), lambda i, j, d: (i, j, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_interior_kernel, D=D, W=w, O=o, PB=pb,
                          mask_left=mask_left, ms=ms, es=es),
        grid=grid,
        in_specs=[l_spec] * len(Lg) + [b_spec] * len(Bg),
        out_specs=pl.BlockSpec((1, 1, th, w, o), lambda i, j, d: (i, d, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, D, h, w, o), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 10 * n * D * h * w * o,
            bytes_accessed=(n * D * h * w * o + 10 * n * h * w * o) * 4,
            transcendentals=0,
        ),
    )(*Lg, *Bg)

    # exact boundary patches (d = 0 / D-1 slices; w = 0 / W-1 columns),
    # applied as concatenations (scatter updates on the big tensor crash
    # the TPU compile helper)
    w_patch = _assemble_jnp(A, B, D, w, mask_left, jnp.float32,
                            w_values=[0, w - 1])           # (N,D,H,2,O)
    out = jnp.concatenate(
        [w_patch[:, :, :, 0:1, :], out[:, :, :, 1:w - 1, :],
         w_patch[:, :, :, 1:2, :]], axis=3)
    d_patch = _assemble_jnp(A, B, D, w, mask_left, jnp.float32,
                            d_values=[0, D - 1])           # (N,2,H,W,O)
    out = jnp.concatenate(
        [d_patch[:, 0:1], out[:, 1:D - 1], d_patch[:, 1:2]], axis=1)
    return out.astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_pallas(fL, fR, kernel, D, mask_left, interpret=False):
    return _fused_pallas_fwd(fL, fR, kernel, D, mask_left, interpret)


def _fused_vjp_fwd(fL, fR, kernel, D, mask_left, interpret):
    return _fused_pallas_fwd(fL, fR, kernel, D, mask_left, interpret), (fL, fR, kernel)


def _fused_vjp_bwd(D, mask_left, interpret, res, g):
    return _stem_bwd(*res, D, mask_left, g)


_fused_pallas.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


