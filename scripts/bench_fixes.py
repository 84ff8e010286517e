"""Targeted microbenches for the round-2 XLA-level fixes:

1. classifier c1 (32->1): pad Co to 8 vs 32 (then W-fold)
2. hourglass deconv (ConvTranspose3d k3 s2): native vs subpixel formulation
3. fused stem vs unfused (XLA build + W-folded conv)
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.ops.conv3d import _conv, _conv_wfold
from dsmnet_tpu.utils.benchtime import time_op

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="float32")
ap.add_argument("--part", default="all")
args = ap.parse_args()
dt = jnp.dtype(args.dtype)
rng = np.random.RandomState(0)

if args.part in ("all", "c1"):
    # ---- classifier c1: (1,48,96,192,32) -> Co=1
    x = jnp.asarray(rng.randn(1, 48, 96, 192, 32), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, 32, 1) * 0.1, dt)

    def pad_co(k, co):
        return jnp.concatenate(
            [k, jnp.zeros(k.shape[:4] + (co - k.shape[4],), k.dtype)], -1)

    t = time_op(lambda a: _conv(a, k, [(1, 1)] * 3), x)
    print(f"c1 native Co=1:        {t*1e3:7.3f} ms")
    t = time_op(lambda a: _conv_wfold(a, pad_co(k, 8))[..., :1], x)
    print(f"c1 pad8 + wfold:       {t*1e3:7.3f} ms")
    t = time_op(lambda a: _conv(a, pad_co(k, 8), [(1, 1)] * 3)[..., :1], x)
    print(f"c1 pad8 native:        {t*1e3:7.3f} ms")
    t = time_op(lambda a: _conv_wfold(a, pad_co(k, 32))[..., :1], x)
    print(f"c1 pad32 + wfold:      {t*1e3:7.3f} ms")
    t = time_op(lambda a: _conv(a, pad_co(k, 32), [(1, 1)] * 3)[..., :1], x)
    print(f"c1 pad32 native:       {t*1e3:7.3f} ms")

if args.part in ("all", "deconv"):
    # ---- hourglass deconv6: (1,24,48,96,64) -> (1,48,96,192,32), k3 s2
    xi = jnp.asarray(rng.randn(1, 24, 48, 96, 64), dt)
    kt = jnp.asarray(rng.randn(3, 3, 3, 32, 64) * 0.1, dt)  # flax transpose_kernel: (k..., out, in)

    def deconv_native(x, kt):
        # lax.conv_transpose torch geometry p=1 op=1 -> pads (1,2)
        return lax.conv_transpose(
            x, kt, (2, 2, 2), [(1, 2)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), transpose_kernel=True)

    t = time_op(lambda a: deconv_native(a, kt), xi)
    print(f"deconv6 native:        {t*1e3:7.3f} ms")

    def deconv_subpixel(x, kt):
        """Transposed conv k=3 s=2 as 8 parity convs + interleave.

        out[2m+p] = sum over input taps: for parity p, out position
        2m+p receives kernel taps t with (2m+p) = 2*i - 1 + t... Each
        output parity (pd,ph,pw) is a 2x2x2-kernel conv (taps of same
        parity) over the input."""
        n, D, H, W, ci = x.shape
        co = kt.shape[3]
        # conv_transpose(x, k)[o] = sum_i x[i] * k[o - 2i + pad_lo]
        # with torch geometry pad_lo = 1: out[o] = sum_t k[t] x[(o+1-t)/2]
        # t in 0..2, (o+1-t) even. For o=2m: t=1, x[m]; t=... o+1-t in
        # {2m+1, 2m, 2m-1} -> even only 2m -> t=1 exactly.   For o=2m+1:
        # o+1-t in {2m+2, 2m+1, 2m} -> t=0: x[m+1], t=2: x[m].
        # So per axis: even outputs take tap 1; odd outputs take taps 0,2.
        k = jnp.flip(kt, (0, 1, 2))  # transpose_kernel flips spatially
        k = k.swapaxes(3, 4)  # (kd,kh,kw,ci,co) after unflip/swap
        outs = {}
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        for pd in range(2):
            for ph in range(2):
                for pw in range(2):
                    acc = None
                    for td in ((1,) if pd == 0 else (0, 2)):
                        for th in ((1,) if ph == 0 else (0, 2)):
                            for tw in ((1,) if pw == 0 else (0, 2)):
                                sd = (pd + 1 - td) // 2 + (1 if td == 0 else 0)
                                # x index m + delta: delta = (p+1-t)/2
                                ddl = (pd + 1 - td) // 2
                                dhl = (ph + 1 - th) // 2
                                dwl = (pw + 1 - tw) // 2
                                xs = lax.dynamic_slice(
                                    xp, (0, ddl, dhl, dwl, 0), (n, D, H, W, ci))
                                v = jnp.einsum(
                                    "ndhwc,co->ndhwo", xs, k[td, th, tw],
                                    preferred_element_type=jnp.float32).astype(x.dtype)
                                acc = v if acc is None else acc + v
                    outs[(pd, ph, pw)] = acc
        # interleave parities
        out = jnp.stack([outs[(pd, ph, pw)]
                         for pd in range(2) for ph in range(2) for pw in range(2)],
                        axis=-2)
        out = out.reshape(n, D, H, W, 2, 2, 2, co)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(n, 2 * D, 2 * H, 2 * W, co)
        return out

    y0 = deconv_native(xi, kt)
    y1 = deconv_subpixel(xi, kt)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print(f"  subpixel rel err: {err/float(jnp.max(jnp.abs(y0))):.2e}")
    t = time_op(lambda a: deconv_subpixel(a, kt), xi)
    print(f"deconv6 subpixel:      {t*1e3:7.3f} ms")

if args.part in ("all", "stem"):
    # ---- stem: build D/4 volume + first conv 64->32
    fL = jnp.asarray(rng.randn(1, 96, 192, 32), dt)
    fR = jnp.asarray(rng.randn(1, 96, 192, 32), dt)
    kc = jnp.asarray(rng.randn(3, 3, 3, 64, 32) * 0.1, dt)

    from dsmnet_tpu.ops.cost_volume import concat_cost_volume_reference
    from dsmnet_tpu.ops.fused_costvol import cost_volume_conv3x3

    def unfused(a, b):
        vol = concat_cost_volume_reference(a, b, 48, True)
        return _conv_wfold(vol, kc)

    t = time_op(unfused, fL, fR)
    print(f"stem unfused (wfold):  {t*1e3:7.3f} ms")
    t = time_op(lambda a, b: cost_volume_conv3x3(a, b, kc, 48, True), fL, fR)
    print(f"stem fused jnp:        {t*1e3:7.3f} ms")
