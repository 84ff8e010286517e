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

__all__ = ["conv3d_same", "deconv3d_k3s2"]


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


def _conv_kwfold(x, k):
    """Stride-1 SAME conv with the kw taps folded into Cout.

    The MXU processes GEMM output-lane tiles of 128; the regularizer's
    Co=32 convs fill 32/128 = 25% of them, which is where the native
    conv plateaus (~32 TFLOP/s on a ~147 TFLOP/s chip).  Computing
    z = conv3d(x, K as (kd,kh,1,Ci,kw*Co)) raises the fill to
    kw*Co/128, and y recombines z with kw shifted adds (elementwise,
    HBM-bound).  Requires kw == 3 (every regularizer conv)."""
    n, D, H, W, ci = x.shape
    kd, kh, kw, _, co = k.shape
    assert kw == 3, kw
    kz = jnp.moveaxis(k, 2, 3).reshape(kd, kh, 1, ci, 3 * co)
    pads = [((kd - 1) // 2,) * 2, ((kh - 1) // 2,) * 2, (0, 0)]
    z = _conv(x, kz, pads)
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    return (
        zp[:, :, :, 0:W, 0:co]
        + zp[:, :, :, 1 : W + 1, co : 2 * co]
        + zp[:, :, :, 2 : W + 2, 2 * co : 3 * co]
    )


def _pallas_ok(ci: int, W: int, H: int, itemsize: int = 2) -> bool:
    """Shape gate for the folded-lane Pallas kernels (conv3d_pallas.py):
    channels must divide 128, W must fold into dense 128-lane rows, and
    the folded width W/r must be DMA-tile-aligned (8 sublanes f32, 16
    bf16 — Mosaic rejects unaligned second-minor slab slices)."""
    if not (ci >= 8 and 128 % ci == 0 and W % (128 // ci) == 0 and H % 8 == 0):
        return False
    del itemsize  # sublane tile is 8 for f32 AND bf16 (packed (2,1))
    return (W * ci // 128) % 8 == 0


def _conv_tapfold(x, k):
    """Stride-1 SAME conv with ALL taps folded into Cout: a 1x1x1 conv
    (pure GEMM) to (taps*Co) channels, recombined by shifted adds.  The
    winning forward for tiny Cout (classifier c1, Co=1): the native
    conv is Cout-fill-bound at ~3 ms there while this runs in one
    deep-K GEMM + one fused elementwise pass."""
    kd, kh, kw, ci, co = k.shape
    n, D, H, W, _ = x.shape
    kz = jnp.transpose(k, (3, 0, 1, 2, 4)).reshape(1, 1, 1, ci, kd * kh * kw * co)
    z = _conv(x, kz, [(0, 0)] * 3)                      # (n,D,H,W,taps*co)
    zp = jnp.pad(z, ((0, 0), (kd // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2,
                     (0, 0)))
    y = None
    t = 0
    for dd in range(kd):
        for dh in range(kh):
            for dw in range(kw):
                piece = lax.dynamic_slice(
                    zp, (0, dd, dh, dw, t * co), (n, D, H, W, co))
                y = piece if y is None else y + piece
                t += 1
    return y


def _conv_cin1(x, k):
    """Stride-1 SAME conv for ONE input channel as a 27-tap stencil:
    out[.., c] = sum_taps x[shifted] * k[tap, 0, c].  REJECTED as the
    classifier-c1 dx formulation: in-model it measured +116 ms on the
    b4 step (584 vs 468 ms) — XLA materializes the shifted volume
    intermediates instead of fusing the stencil.  Kept for
    benchmarking (scripts/bench_classdx.py)."""
    kd, kh, kw, _, co = k.shape
    n, D, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kd // 2,) * 2, (kh // 2,) * 2,
                     (kw // 2,) * 2, (0, 0)))
    y = None
    for dd in range(kd):
        for dh in range(kh):
            for dw in range(kw):
                piece = lax.dynamic_slice(
                    xp, (0, dd, dh, dw, 0), (n, D, H, W, 1))
                term = piece * k[dd, dh, dw, 0]
                y = term if y is None else y + term
    return y


def _conv_cin1_gemm(x, k):
    """Stride-1 SAME conv for ONE input channel as tap-im2col + GEMM:
    stack the 27 shifted single-channel views on lanes, then one
    (M, 27) @ (27, Co) dot.  Inside the full train graph XLA lowers the
    native Cin=1 conv as a ~8 ms loop fusion (r5 trace, x3 classifier
    dx at b4) even though it emits a 2 ms conv standalone; the explicit
    GEMM pins the contraction to the MXU and the patch build to plain
    bandwidth."""
    kd, kh, kw, _, co = k.shape
    n, D, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kd // 2,) * 2, (kh // 2,) * 2,
                     (kw // 2,) * 2, (0, 0)))
    taps = [
        lax.dynamic_slice(xp, (0, dd, dh, dw, 0), (n, D, H, W, 1))
        for dd in range(kd) for dh in range(kh) for dw in range(kw)
    ]
    P = jnp.concatenate(taps, axis=-1)                    # (n,D,H,W,taps)
    km = k.reshape(kd * kh * kw, co)
    return lax.dot_general(P, km, (((4,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)


def _conv_fast(x, k):
    """Stride-1 SAME conv — formulation picked by ops.config.conv3d_mode()."""
    from . import config

    if x.shape[-1] == 1 and k.shape[0] * k.shape[1] * k.shape[2] <= 27 \
            and k.shape[-1] >= 8:
        return _conv_cin1_gemm(x, k)
    if k.shape[-1] < 8 and k.shape[-1] * k.shape[0] * k.shape[1] * k.shape[2] <= 32:
        return _conv_tapfold(x, k)
    mode = config.conv3d_mode()
    if (
        mode == "pallas"
        and k.shape[:3] == (3, 3, 3)
        and k.shape[-1] >= 8
        and _pallas_ok(x.shape[-1], x.shape[3], x.shape[2], x.dtype.itemsize)
    ):
        from .conv3d_pallas import conv3d_fwd_pallas

        return conv3d_fwd_pallas(x, k)
    if mode == "kwfold" and k.shape[2] == 3:
        return _conv_kwfold(x, k)
    pads = [((s - 1) // 2, (s - 1) // 2) for s in k.shape[:3]]
    return _conv(x, k, pads)


@jax.custom_vjp
def conv3d_same(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """stride-1 SAME 3-D conv, x (N,D,H,W,Ci), k (kd,kh,kw,Ci,Co), odd dims."""
    return _conv_fast(x, k)


def _fwd(x, k):
    return conv3d_same(x, k), (x, k)


def _dk_pertap(x, g, kd, kh, kw):
    """dK as one deep einsum per tap — 27 GEMMs with (Ci,Co)=(32,32)
    output tiles (6%% MXU fill).  Kept as the golden reference and the
    non-(3,3,3) fallback."""
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
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
    return jnp.stack(taps).reshape(kd, kh, kw, ci, co)


def _dk_stacked(x, g):
    """dK for the 3x3x3 tap grid as ONE GEMM: the 9 (kd,kh) taps of x
    stack into the M dimension (9*Ci = 288 rows) and the 3 kw taps of g
    into the N dimension (3*Co = 96 lanes), contracting over all
    N*D*H*W positions.  2.1x faster than per-tap on v5e bf16 (1.46 vs
    3.03 ms at the hourglass shape; scripts/bench_dk.py) — the per-tap
    einsums are fill-bound at 32x32 output tiles while this runs a
    (288, 96) tile; the remaining cost is materializing the 12 shifted
    views (HBM-bound)."""
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    A = jnp.stack([xp[:, dd:dd + D, dh:dh + H]
                   for dd in range(3) for dh in range(3)])      # (9,n,D,H,W,ci)
    B = jnp.stack([gp[:, :, :, 2 - dw:2 - dw + W]
                   for dw in range(3)])                          # (3,n,D,H,W,co)
    dk = jnp.einsum("andhwc,bndhwo->acbo", A, B,
                    preferred_element_type=jnp.float32)          # (9,ci,3,co)
    return jnp.transpose(dk.reshape(3, 3, ci, 3, co), (0, 1, 3, 2, 4))


def _dk_ntap(x, g, kd, kh, kw):
    """dK with ALL taps stacked on the GEMM N dimension as shifted
    copies of the cotangent: one (Ci, taps*Co) GEMM.  The winning
    formulation when Co is tiny (classifier c1 has Co=1, where per-tap
    would re-read the 57 MB input 27 times for 1.5 GFLOP)."""
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
    gp = jnp.pad(
        g,
        ((0, 0), (kd // 2, kd // 2), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
    )
    parts = []
    for dd in range(kd):
        for dh in range(kh):
            for dw in range(kw):
                parts.append(lax.dynamic_slice(
                    gp, (0, kd - 1 - dd, kh - 1 - dh, kw - 1 - dw, 0), g.shape))
    B = jnp.concatenate(parts, axis=-1)                  # (n,D,H,W,taps*co)
    dk = jnp.einsum("ndhwc,ndhwt->ct", x, B,
                    preferred_element_type=jnp.float32)   # (ci, taps*co)
    return jnp.moveaxis(dk.reshape(ci, kd * kh * kw, co), 0, 1).reshape(
        kd, kh, kw, ci, co)


def _bwd(res, g):
    x, k = res
    kd, kh, kw, ci, co = k.shape
    # dx: correlate the cotangent with the flipped, channel-swapped kernel
    # (also a stride-1 SAME conv -> same fast formulation)
    k_t = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)  # (kd,kh,kw,Co,Ci)
    dx = _conv_fast(g, k_t)

    from . import config

    dk_mode = config.conv3d_dk_mode()
    if co < 8:
        dk = _dk_ntap(x, g, kd, kh, kw)
    elif (
        dk_mode == "pallas"
        and (kd, kh, kw) == (3, 3, 3)
        and _pallas_ok(ci, x.shape[3], x.shape[2], x.dtype.itemsize)
    ):
        from .conv3d_pallas import conv3d_dk_pallas

        dk = conv3d_dk_pallas(x, g)
    elif (kd, kh, kw) == (3, 3, 3) and dk_mode == "stacked":
        dk = _dk_stacked(x, g)
    else:
        dk = _dk_pertap(x, g, kd, kh, kw)
    return dx, dk.astype(k.dtype)


conv3d_same.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# k=3 stride-2 conv (hourglass down-path) via space-to-depth
# ---------------------------------------------------------------------------

def _space_to_depth3(x):
    """(N,D,H,W,C) -> (N,D/2,H/2,W/2,8C); channel order (pd,ph,pw,c)."""
    n, D, H, W, c = x.shape
    x = x.reshape(n, D // 2, 2, H // 2, 2, W // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
    return x.reshape(n, D // 2, H // 2, W // 2, 8 * c)


def _s2d_kernel(k):
    """Map a (3,3,3,Ci,Co) s2/p1 kernel onto the dense (2,2,2,8Ci,Co)
    kernel of the space-to-depth formulation.  1-D identity: input index
    2p+t-1 = 2(p-1+o)+q with window offset o and parity q, so t = 2o+q-1
    ((o,q)=(0,0) is out of kernel support -> zero slot).  64/27 = 2.37x
    dense FLOPs, but the GEMM runs 8Ci deep with full M tiles instead of
    XLA's strided-conv lowering (~9 TFLOP/s at the conv1 shape)."""
    ci, co = k.shape[3], k.shape[4]
    k2 = jnp.zeros((2, 2, 2, 2, 2, 2, ci, co), k.dtype)
    for od in range(2):
        for oh in range(2):
            for ow in range(2):
                for pd in range(2):
                    for ph in range(2):
                        for pw in range(2):
                            td, th, tw = 2 * od + pd - 1, 2 * oh + ph - 1, 2 * ow + pw - 1
                            if 0 <= td <= 2 and 0 <= th <= 2 and 0 <= tw <= 2:
                                k2 = k2.at[od, oh, ow, pd, ph, pw].set(k[td, th, tw])
    return k2.reshape(2, 2, 2, 8 * ci, co)


def _conv_s2_s2d(x, k):
    """Exact k=3 s=2 p=1 conv via space-to-depth + dense (2,2,2) conv."""
    x2 = _space_to_depth3(x)
    return _conv(x2, _s2d_kernel(k), [(1, 0)] * 3)


def _conv_s2_native(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, k, (2, 2, 2), [(1, 1)] * 3,
                                    dimension_numbers=dn)


@jax.custom_vjp
def conv3d_s2(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """stride-2 SAME(p=1) 3x3x3 conv; x (N,D,H,W,Ci) with even D/H/W,
    k (3,3,3,Ci,Co).  Pallas folded-parity kernel on TPU (r4)."""
    from . import config

    mode = config.conv3d_s2_mode()
    if mode == "pallas":
        from .conv3d_s2_pallas import conv3d_s2_fwd_pallas, s2_pallas_ok

        if s2_pallas_ok(x.shape, k.shape, x.dtype.itemsize):
            return conv3d_s2_fwd_pallas(x, k)
    if mode == "s2d":
        return _conv_s2_s2d(x, k)
    return _conv_s2_native(x, k)


def _s2_fwd(x, k):
    return conv3d_s2(x, k), (x, k)


def _s2_bwd(res, g):
    x, k = res
    from . import config

    if config.conv3d_s2_mode() == "pallas":
        from .conv3d_s2_pallas import conv3d_s2_dk_pallas, s2_pallas_ok

        if s2_pallas_ok(x.shape, k.shape, x.dtype.itemsize):
            # dx IS the k=3 s=2 transposed conv of the cotangent with the
            # forward kernel (exact identity, tested) -> parity-folded
            # dense GEMM instead of XLA's strided transpose lowering
            # (0.28 vs 1.2 ms at the conv1 cotangent shape, PERF.md r4)
            dx = _deconv_parity(g, k) if config.deconv3d_mode() == "parity" \
                else _deconv_native(g, k)
            dk = conv3d_s2_dk_pallas(x, g)
            return dx, dk.astype(k.dtype)

    # fallbacks: dx through XLA's transposed-conv identity; dK via
    # per-tap deep einsums on the space-to-depth view (8 taps with
    # (8Ci, Co) output tiles instead of XLA's strided kernel-grad)
    _, vjp_x = jax.vjp(lambda a: _conv_s2_native(a, k), x)
    dx, = vjp_x(g)
    x2p = jnp.pad(_space_to_depth3(x),
                  ((0, 0), (1, 0), (1, 0), (1, 0), (0, 0)))
    n, Do, Ho, Wo, c8 = x2p.shape
    no, Dg, Hg, Wg, co = g.shape
    taps = []
    for od in range(2):
        for oh in range(2):
            for ow in range(2):
                xs = lax.dynamic_slice(x2p, (0, od, oh, ow, 0),
                                       (no, Dg, Hg, Wg, c8))
                taps.append(jnp.einsum("ndhwc,ndhwo->co", xs, g,
                                       preferred_element_type=jnp.float32))
    dk2 = jnp.stack(taps).reshape(2, 2, 2, 2, 2, 2, c8 // 8, co)
    ci = c8 // 8
    dk = jnp.zeros((3, 3, 3, ci, co), jnp.float32)
    for td in range(3):
        for th in range(3):
            for tw in range(3):
                od, pd = (td + 1) // 2, (td + 1) % 2
                oh, ph = (th + 1) // 2, (th + 1) % 2
                ow, pw = (tw + 1) // 2, (tw + 1) % 2
                dk = dk.at[td, th, tw].set(dk2[od, oh, ow, pd, ph, pw])
    return dx, dk.astype(k.dtype)


conv3d_s2.defvjp(_s2_fwd, _s2_bwd)


# ---------------------------------------------------------------------------
# k=3 stride-2 transposed conv (PSMNet/GCNet hourglass up-path)
# ---------------------------------------------------------------------------

def _deconv_native(x, k):
    """lax conv_transpose matching flax ConvTranspose(k=3, s=2,
    padding [(1,2)], transpose_kernel=True); k is (3,3,3,Co,Ci)."""
    return lax.conv_transpose(
        x, k, (2, 2, 2), [(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), transpose_kernel=True,
    )


def _deconv_parity(x, k):
    """Same deconv as one dense (2,2,2) conv with all 8 output parities
    folded into Cout (8Co), then a pixel-shuffle.

    With Kr = the spatially-flipped, channel-swapped kernel that
    conv_transpose applies, the 1-D identity for s=2/k=3/pads (1,2) is
    y[2u] = x[u].Kr[1]; y[2u+1] = x[u].Kr[0] + x[u+1].Kr[2], so parity p
    at window offset o uses Kr[{(0,0):1,(1,0):0,(1,1):2}[(p,o)]] and is
    zero elsewhere.  The zero slots cost 64/27 = 2.37x FLOPs but the
    GEMM runs at full output-lane tiles (8Co >= 128 for Co >= 16)
    instead of Co/128."""
    n, D, H, W, ci = x.shape
    co = k.shape[-2]
    kr = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)  # (3,3,3,Ci,Co)
    sel = {(0, 0): 1, (1, 0): 0, (1, 1): 2}
    kb = jnp.zeros((2, 2, 2, ci, 8, co), k.dtype)
    for p in range(8):
        pd, ph, pw = (p >> 2) & 1, (p >> 1) & 1, p & 1
        for o in range(8):
            od, oh, ow = (o >> 2) & 1, (o >> 1) & 1, o & 1
            idx = (sel.get((pd, od)), sel.get((ph, oh)), sel.get((pw, ow)))
            if None in idx:
                continue
            kb = kb.at[od, oh, ow, :, p].set(kr[idx])
    kb = kb.reshape(2, 2, 2, ci, 8 * co)
    z = _conv(x, kb, [(0, 1)] * 3)  # (n,D,H,W,8co)
    z = z.reshape(n, D, H, W, 2, 2, 2, co)
    z = jnp.transpose(z, (0, 1, 4, 2, 5, 3, 6, 7))
    return z.reshape(n, 2 * D, 2 * H, 2 * W, co)


def deconv3d_k3s2(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact-2x transposed 3-D conv (k=3, s=2, torch geometry p=1 op=1);
    x (N,D,H,W,Ci), k (3,3,3,Co,Ci) — the flax transpose_kernel layout.
    Formulation picked by ops.config.deconv3d_mode()."""
    from . import config

    if config.deconv3d_mode() == "parity":
        return _deconv_parity(x, k)
    return _deconv_native(x, k)
