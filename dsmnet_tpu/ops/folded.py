"""Folded dense-lane volume pathway for the 3-D regularizer.

On TPU, HBM arrays are tiled (sublane, 128-lane) on their two minor
dims, so any (..., W, C<128) cost-volume tensor is physically
lane-padded 128/C-fold, and every op boundary that materializes one
pays the padding in bandwidth.  The r4 b4 trace showed ~150 ms/step of
pads, refolds and layout copies around the regularizer's convs.

The fix: keep the volume in the *canonical folded form*

    (N, D, H, W*C/128, 128)

between ops.  All folded factorizations are free row-major reshapes of
each other — (W/r, r*C) for the stride-1 kernels, (W/4, 4C) for the
stride-2 parity kernels, (UF, r, C) for per-channel BatchNorm — so the
fold relayout is paid ONCE after the cost-volume stem and once at each
unfolded consumer (classifier head, deconv), not per conv.

``folded_conv3d_same`` / ``folded_conv3d_s2`` are custom-VJP convs on
the folded form, routing to the Pallas folded cores on TPU and to an
unfold->lax->fold composition elsewhere (CPU tests run the same API).
Reference semantics: stackhourglass.py:73-149 (the 3-D regularizer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "foldable",
    "fold",
    "unfold",
    "folded_conv3d_same",
    "folded_conv3d_s2",
    "folded_conv3d_to1",
    "folded_deconv3d_k3s2",
    "folded_batchnorm_view",
]


def foldable(shape) -> bool:
    """Whether a logical (N, D, H, W, C) volume fits the folded form."""
    n, D, H, W, C = shape
    return (W * C) % 128 == 0 and C <= 128 and 128 % C == 0


def fold(x):
    """(N, D, H, W, C) -> (N, D, H, W*C/128, 128).  One relayout pass
    (lane compaction); cheap on dense inputs, and the only place the
    128/C padding of the unfolded form is ever touched."""
    n, D, H, W, C = x.shape
    return x.reshape(n, D, H, W * C // 128, 128)

def unfold(xf, C: int):
    """Inverse of fold for logical channel count C."""
    n, D, H, UF, L = xf.shape
    return xf.reshape(n, D, H, UF * 128 // C, C)


def folded_batchnorm_view(xf, C: int):
    """Free view (N, D, H, UF, r, C) whose last axis is the logical
    channel — hand to BatchNorm so statistics pool per channel, not per
    folded lane."""
    n, D, H, UF, L = xf.shape
    return xf.reshape(n, D, H, UF, L // C, C)


def _s1_pallas_ok(C, Co, W, itemsize=2):
    if 128 % C or 128 % Co or C < 8 or Co < 8:
        return False
    if W % (128 // C) or W % (128 // Co):
        return False
    del itemsize  # sublane tile is 8 for f32 AND bf16 (packed (2,1))
    return (W * C // 128) % 8 == 0 and (W * Co // 128) % 8 == 0


def _use_pallas():
    from . import config

    return config.conv3d_mode() == "pallas"


def _pad_dh(xf):
    return jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))


def _conv_ref(x, k, strides):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, k, strides, [(1, 1)] * 3,
                                    dimension_numbers=dn)


# ------------------------------------------------------------- stride 1

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def folded_conv3d_same(xf, k, C: int, W: int):
    """stride-1 SAME 3x3x3 conv on the folded volume.

    xf (N, D, H, W*C/128, 128), k (3,3,3,C,Co) with 128 % Co == 0;
    returns (N, D, H, W*Co/128, 128)."""
    n, D, H, UF, L = xf.shape
    Co = k.shape[-1]
    if _use_pallas() and _s1_pallas_ok(C, Co, W, xf.dtype.itemsize):
        from .conv3d_pallas import conv3d_fwd_pallas_folded

        out = conv3d_fwd_pallas_folded(xf, k, W)
        return out.reshape(n, D, H, W * Co // 128, 128)
    y = _conv_ref(unfold(xf, C), k, (1, 1, 1))
    return fold(y)


def _s1_fwd(xf, k, C, W):
    return folded_conv3d_same(xf, k, C, W), (xf, k)


def _s1_bwd(C, W, res, g):
    xf, k = res
    n, D, H, _, _ = xf.shape
    Co = k.shape[-1]
    if _use_pallas() and _s1_pallas_ok(C, Co, W, xf.dtype.itemsize):
        from .conv3d_pallas import conv3d_dk_pallas_folded, conv3d_fwd_pallas_folded

        # dx: stride-1 conv of the cotangent with the flipped,
        # channel-swapped kernel — same folded kernel, roles swapped
        k_t = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)
        rg = 128 // Co
        gx = g.reshape(n, D, H, W // rg, 128)
        dx = conv3d_fwd_pallas_folded(gx, k_t, W)
        dx = dx.reshape(n, D, H, W * C // 128, 128)
        r = 128 // C
        gf = g.reshape(n, D, H, W // r, r * Co)
        dk = conv3d_dk_pallas_folded(xf, gf, k.shape, W)
        return dx, dk.astype(k.dtype)
    _, vjp = jax.vjp(
        lambda a, b: fold(_conv_ref(unfold(a, C), b, (1, 1, 1))), xf, k
    )
    return vjp(g)


folded_conv3d_same.defvjp(_s1_fwd, _s1_bwd)


# ------------------------------------------------- Cout=1 classifier head
#
# The PSMNet classifier c1 (32 -> 1, 3x3x3; stackhourglass.py:88-98) is
# tiny in FLOPs but the unfold -> tapfold route pays ~6.6 ms/head at b4
# (r5 trace): the unfold materializes the 4x lane-padded (.., W, 32)
# tensor and the tapfold's 1x1x1 conv reads it lane-fill bound.  On the
# folded form the channel contraction is ONE dense 128-lane GEMM: with
# lane = j*C + c (j = w subgroup), S = xf @ kron(eye(r), km.T) computes
# every (subgroup, tap) partial dot at full MXU utilization — and with
# j-MAJOR columns (col = j*27 + t) the flat minor order (uf, j*27+t)
# equals (w, t), so S reshapes row-major to the (N, D, H, W, 27) tap
# stack that the proven tapfold recombination (27 single-lane shifted
# adds, ~2.7 ms fused at b4) already consumes.  Earlier recombinations
# directly on the (UF, r*27) form were measured and rejected: XLA
# materializes r-lane tap pieces with up to 128x layout padding
# (scripts/bench_c1.py; one variant OOMed at b4).
#
# Backward delegates to the unfold composition, whose conv3d_same VJP
# already carries the measured-good dx (_conv_cin1_gemm) and dK
# (_dk_ntap) formulations.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def folded_conv3d_to1(xf, k, C: int, W: int):
    """stride-1 SAME 3x3x3 conv with Cout=1 on the folded volume.

    xf (N, D, H, W*C/128, 128), k (3,3,3,C,1); returns the UNFOLDED
    (N, D, H, W, 1) — a 1-channel map is not foldable and feeds the
    regression head directly."""
    n, D, H, UF, L = xf.shape
    assert L == 128 and k.shape[:3] == (3, 3, 3) and k.shape[-1] == 1
    r = 128 // C
    acc = jnp.promote_types(xf.dtype, jnp.float32)
    km = k.reshape(27, C)  # rows t = kd*9 + kh*3 + kw
    A = jnp.kron(jnp.eye(r, dtype=km.dtype), km.T)  # A[j*C+c, j*27+t]
    S = lax.dot_general(xf, A, (((4,), (0,)), ((), ())),
                        preferred_element_type=acc).astype(xf.dtype)
    z = S.reshape(n, D, H, W, 27)  # free: (uf, j*27+t) == (w, t)
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = None
    for dd in range(3):
        for dh in range(3):
            for dw in range(3):
                t = dd * 9 + dh * 3 + dw
                piece = lax.dynamic_slice(
                    zp, (0, dd, dh, dw, t), (n, D, H, W, 1)).astype(acc)
                y = piece if y is None else y + piece
    return y.astype(xf.dtype)


def _to1_fwd(xf, k, C, W):
    return folded_conv3d_to1(xf, k, C, W), (xf, k)


def _to1_bwd(C, W, res, g):
    from .conv3d import conv3d_same

    xf, k = res
    _, vjp = jax.vjp(lambda a, b: conv3d_same(unfold(a, C), b), xf, k)
    return vjp(g)


folded_conv3d_to1.defvjp(_to1_fwd, _to1_bwd)


# ------------------------------------------------------------- stride 2

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def folded_conv3d_s2(xf, k, C: int, W: int):
    """stride-2 SAME(p=1) 3x3x3 conv on the folded volume.

    xf (N, D, H, W*C/128, 128), k (3,3,3,C,Co); returns the folded
    (N, D/2, H/2, W*Co/256, 128)."""
    from .conv3d_s2_pallas import s2_pallas_ok

    n, D, H, _, _ = xf.shape
    Co = k.shape[-1]
    if _use_s2_pallas() and s2_pallas_ok((n, D, H, W, C), k.shape, xf.dtype.itemsize) \
            and (W // 2 * Co) % 128 == 0:
        from .conv3d_s2_pallas import conv3d_s2_fwd_pallas_padded

        xp = _pad_dh(xf)
        out = conv3d_s2_fwd_pallas_padded(xp, k, W)  # (n,D/2,H/2,W/4,2Co)
        return out.reshape(n, D // 2, H // 2, W // 2 * Co // 128, 128)
    y = _conv_ref(unfold(xf, C), k, (2, 2, 2))
    return fold(y)


def _use_s2_pallas():
    from . import config

    return config.conv3d_s2_mode() == "pallas"


def _s2f_fwd(xf, k, C, W):
    return folded_conv3d_s2(xf, k, C, W), (xf, k)


def _s2f_bwd(C, W, res, g):
    from .conv3d_s2_pallas import s2_pallas_ok

    xf, k = res
    n, D, H, _, _ = xf.shape
    Co = k.shape[-1]
    if _use_s2_pallas() and s2_pallas_ok((n, D, H, W, C), k.shape, xf.dtype.itemsize) \
            and (W // 2 * Co) % 128 == 0:
        from . import config
        from .conv3d import _deconv_native, _deconv_parity
        from .conv3d_s2_pallas import conv3d_s2_dk_pallas_padded

        # dx IS the k3/s2 transposed conv of the cotangent with the
        # forward kernel (exact identity, tests/test_ops.py).  For the
        # C=32 shapes (PSMNet conv1) the folded Pallas dx kernel reads
        # the folded cotangent and writes the folded dx directly — the
        # unfold -> parity deconv -> fold route paid ~10 ms of layout
        # copies per call at b4 (r5 trace)
        from .conv3d_s2_pallas import (conv3d_s2_dx_pallas_folded,
                                       s2_dx_pallas_ok)

        if s2_dx_pallas_ok((n, D, H, W, C), k.shape, xf.dtype.itemsize):
            dx = conv3d_s2_dx_pallas_folded(g, k)
        else:
            gu = unfold(g, Co)
            dxu = _deconv_parity(gu, k) if config.deconv3d_mode() == "parity" \
                else _deconv_native(gu, k)
            dx = fold(dxu)
        xp = _pad_dh(xf)
        gf = g.reshape(n, D // 2, H // 2, W // 4, 2 * Co)
        dk = conv3d_s2_dk_pallas_padded(xp, gf, k.shape, W)
        return dx, dk.astype(k.dtype)
    _, vjp = jax.vjp(
        lambda a, b: fold(_conv_ref(unfold(a, C), b, (2, 2, 2))), xf, k
    )
    return vjp(g)


folded_conv3d_s2.defvjp(_s2f_fwd, _s2f_bwd)


# ------------------------------------------------------- folded deconv k3s2
#
# The hourglass/GCNet up-path deconvs previously round-tripped through
# the unfolded form (unfold -> parity deconv -> fold); for the 64 -> 32
# full-volume deconv6 that boundary is the r5 trace's largest remaining
# copy cluster (~23 ms/b4 of parity views).  The three stride-2 Pallas
# kernels close under transposition, so the folded deconv needs no new
# kernel:
#     deconv fwd      == conv3d_s2_dx_pallas_folded (dx of the s2 conv)
#     deconv d(input) == conv3d_s2_fwd_pallas_padded (the s2 conv)
#     deconv dW       == conv3d_s2_dk_pallas_padded (roles swapped)
# Gate: Cin == 64 (so the folded input IS the kernel's (D/2, H/2,
# W_out/4, 2*64) cotangent layout) and Cout == 32 (128-lane folded
# output groups), i.e. exactly conv6 / l36.


def _fdc_eligible(xf, kp, W_in):
    from .conv3d_s2_pallas import s2_dx_pallas_ok, s2_pallas_ok

    n, D2, H2, _, L = xf.shape
    Cout, Cin = kp.shape[3], kp.shape[4]
    if not (Cin == 64 and L == 128 and Cout == 32):
        return False
    out_shape = (n, 2 * D2, 2 * H2, 2 * W_in, Cout)
    return (
        _use_s2_pallas()
        and s2_dx_pallas_ok(out_shape, (3, 3, 3, Cout, Cin),
                            xf.dtype.itemsize)
        and s2_pallas_ok(out_shape, (3, 3, 3, Cout, Cin),
                         xf.dtype.itemsize)
    )


def _fdc_primal(xf, kp, Cin: int, W_in: int):
    from .conv3d import _deconv_native, _deconv_parity
    from .conv3d_s2_pallas import conv3d_s2_dx_pallas_folded

    if _fdc_eligible(xf, kp, W_in):
        return conv3d_s2_dx_pallas_folded(xf, kp)
    from . import config

    xu = unfold(xf, Cin)
    yu = _deconv_parity(xu, kp) if config.deconv3d_mode() == "parity" \
        else _deconv_native(xu, kp)
    return fold(yu)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def folded_deconv3d_k3s2(xf, kp, Cin: int, W_in: int):
    """ConvTranspose3d k=3 s=2 p=1 op=1 on the folded volume.

    xf (N, D2, H2, W_in*Cin/128, 128); kp (3,3,3,Cout,Cin) — the
    _FastDeconv3d parameter layout; returns the folded
    (N, 2*D2, 2*H2, 2*W_in*Cout/128, 128)."""
    return _fdc_primal(xf, kp, Cin, W_in)


def _fdc_fwd(xf, kp, Cin, W_in):
    return folded_deconv3d_k3s2(xf, kp, Cin, W_in), (xf, kp)


def _fdc_bwd(Cin, W_in, res, g):
    xf, kp = res
    if _fdc_eligible(xf, kp, W_in):
        from .conv3d_s2_pallas import (conv3d_s2_dk_pallas_padded,
                                       conv3d_s2_fwd_pallas_padded)

        Cout = kp.shape[3]
        W_out = 2 * W_in
        gp = _pad_dh(g)
        dxf = conv3d_s2_fwd_pallas_padded(gp, kp, W_out)
        dk = conv3d_s2_dk_pallas_padded(
            gp, xf, (3, 3, 3, Cout, Cin), W_out)
        return dxf, dk.astype(kp.dtype)
    _, vjp = jax.vjp(lambda a, b: _fdc_primal(a, b, Cin, W_in), xf, kp)
    return vjp(g)


folded_deconv3d_k3s2.defvjp(_fdc_fwd, _fdc_bwd)
