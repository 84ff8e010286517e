"""Why is the bf16 stride-1 conv3d SLOWER than f32 on v5e?

Measures the (1,48,96,192,32->32) PSMNet conv under dtype/accumulation
variants, plus the Co=1 classifier conv (classif c1) whose output-lane
fill is 1/128 under the native formulation.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv3d_dtype.py
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.utils import time_op


def conv(x, k, pref=None):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=pref,
    )


def main():
    n, D, H, W, ci, co = 1, 48, 96, 192, 32, 32
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.randn(n, D, H, W, ci), jnp.float32)
    kf = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, jnp.float32)
    xb, kb = xf.astype(jnp.bfloat16), kf.astype(jnp.bfloat16)
    flops = 2 * 27 * ci * co * n * D * H * W

    def rep(name, fn, *a):
        t = time_op(fn, *a)
        print(f"{name:36s} {t*1e3:8.3f} ms  {flops/t/1e12:6.2f} TFLOP/s",
              flush=True)

    rep("f32 in, f32 out (default prec)", lambda x, k: conv(x, k), xf, kf)
    rep("bf16 in, bf16 out", lambda x, k: conv(x, k), xb, kb)
    rep("bf16 in, pref f32 out", lambda x, k: conv(x, k, jnp.float32), xb, kb)
    rep("bf16 in, pref f32, cast bf16",
        lambda x, k: conv(x, k, jnp.float32).astype(jnp.bfloat16), xb, kb)

    # classifier c1: Co=1 (n-fill 1/128). Alternatives: full 27-tap fold
    # (n=27) or moving the contraction to the channel axis via einsum.
    k1f = jnp.asarray(rng.randn(3, 3, 3, ci, 1) * 0.1, jnp.float32)
    k1b = k1f.astype(jnp.bfloat16)
    flops1 = 2 * 27 * ci * 1 * n * D * H * W

    def rep1(name, fn, *a):
        t = time_op(fn, *a)
        print(f"{name:36s} {t*1e3:8.3f} ms  {flops1/t/1e12:6.2f} TFLOP/s",
              flush=True)

    def conv_c1_fold27(x, k):
        # all 27 taps into Cout; combine = 27 shifted adds of 1-ch maps
        kz = jnp.transpose(k[..., 0], (3, 0, 1, 2)).reshape(ci, 27)
        kz = kz[None, None, None]  # (1,1,1,ci,27), channel t = kd*9+kh*3+kw
        z = conv(x, kz)  # (n,D,H,W,27)
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = None
        for t in range(27):
            kd, r = divmod(t, 9)
            kh, kw = divmod(r, 3)
            piece = zp[:, kd : kd + D, kh : kh + H, kw : kw + W, t : t + 1]
            out = piece if out is None else out + piece
        return out

    y_ref = conv(xf, k1f)
    y = conv_c1_fold27(xf, k1f)
    err = float(jnp.max(jnp.abs(y - y_ref)))
    print(f"  c1 fold27 abs err: {err:.2e}")

    rep1("c1 f32 native (Co=1)", lambda x, k: conv(x, k), xf, k1f)
    rep1("c1 bf16 native (Co=1)", lambda x, k: conv(x, k), xb, k1b)
    rep1("c1 f32 fold27", conv_c1_fold27, xf, k1f)
    rep1("c1 bf16 fold27", conv_c1_fold27, xb, k1b)

    # --- dK (kernel gradient): 27 per-tap deep einsums (ops/conv3d._bwd).
    # Measured inside training at ~5.7 ms/conv in bf16 — check whether
    # XLA's sibling-fusion of the 27 reductions survives each dtype.
    gf = jnp.asarray(rng.randn(n, D, H, W, co), jnp.float32)
    gb = gf.astype(jnp.bfloat16)

    def dk_taps(x, g):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        taps = []
        for dd in range(3):
            for dh in range(3):
                for dw in range(3):
                    xs = lax.dynamic_slice(xp, (0, dd, dh, dw, 0),
                                           (n, D, H, W, ci))
                    taps.append(jnp.einsum(
                        "ndhwc,ndhwo->co", xs, g,
                        preferred_element_type=jnp.float32))
        return jnp.stack(taps).reshape(3, 3, 3, ci, co)

    def dk_g3(x, g):
        # kw-shifts stacked on g channels: 9 einsums at n = 3co
        gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
        g3 = jnp.concatenate(
            [gp[:, :, :, 2 - dw : 2 - dw + W, :] for dw in range(3)], axis=-1)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
        taps = []
        for dd in range(3):
            for dh in range(3):
                xs = lax.dynamic_slice(xp, (0, dd, dh, 0, 0), (n, D, H, W, ci))
                taps.append(jnp.einsum(
                    "ndhwc,ndhwo->co", xs, g3,
                    preferred_element_type=jnp.float32))
        out = jnp.stack(taps).reshape(3, 3, ci, 3, co)  # (kd,kh,ci,kw,co)
        return jnp.transpose(out, (0, 1, 3, 2, 4))

    d_ref = dk_taps(xf, gf)
    d_g3 = dk_g3(xf, gf)
    errdk = float(jnp.max(jnp.abs(d_g3 - d_ref)))
    print(f"  dK g3 abs err: {errdk:.2e} (scale "
          f"{float(jnp.max(jnp.abs(d_ref))):.1f})")

    flopsk = 2 * 27 * ci * co * n * D * H * W

    def repk(name, fn, x, g):
        t = time_op(lambda xx, gg: jnp.sum(fn(xx, gg)), x, g)
        print(f"{name:36s} {t*1e3:8.3f} ms  {flopsk/t/1e12:6.2f} TFLOP/s",
              flush=True)

    repk("dK 27-tap einsum f32", dk_taps, xf, gf)
    repk("dK 27-tap einsum bf16", dk_taps, xb, gb)
    repk("dK g3 (9 einsums, n=3co) f32", dk_g3, xf, gf)
    repk("dK g3 (9 einsums, n=3co) bf16", dk_g3, xb, gb)


if __name__ == "__main__":
    main()
