"""Backward-cost survey of the non-stride-1 3-D conv pieces of the
PSMNet hourglass: stride-2 down convs and k3/s2 parity deconvs.

For each piece at its in-model shape: forward time, full XLA-autodiff
fwd+grad(dx,dK) time, and (for s2 convs) a candidate hand dK that
stacks all 27 strided x-views into the GEMM M dimension.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bwd_pieces.py
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.ops.conv3d import _deconv_parity, _deconv_native
from dsmnet_tpu.utils.benchtime import time_op


def conv_s2(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, k, (2, 2, 2), [(1, 1)] * 3,
                                    dimension_numbers=dn)


def dk_s2_stacked(x, g):
    """dK for the s2/p1 3x3x3 conv: dk[t] = sum_pos x[2*pos+t-1] g[pos].
    All 27 taps are strided slices of the padded input; stack them on M
    (27*Ci rows) against g on N (Co lanes)."""
    n, D, H, W, ci = x.shape
    _, Do, Ho, Wo, co = g.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    views = []
    for dd in range(3):
        for dh in range(3):
            for dw in range(3):
                views.append(lax.slice(
                    xp, (0, dd, dh, dw, 0),
                    (n, dd + 2 * Do - 1, dh + 2 * Ho - 1, dw + 2 * Wo - 1, ci),
                    (1, 2, 2, 2, 1)))
    A = jnp.stack(views)                                        # (27,n,Do,Ho,Wo,ci)
    dk = jnp.einsum("andhwc,ndhwo->aco", A, g,
                    preferred_element_type=jnp.float32)
    return dk.reshape(3, 3, 3, ci, co)


def report(name, fn, *a, flop=None):
    t = time_op(fn, *a, n_big=6)
    line = f"{name:34s} {t*1e3:8.3f} ms"
    if flop:
        line += f"  {flop/t/1e12:6.1f} TFLOP/s"
    print(line, flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)

    def arr(*s):
        return jnp.asarray(rng.randn(*s), dt)

    # ---- stride-2 convs (hourglass conv1 at full vol, conv3 at half) ----
    for nm, xs, ci, co in [("conv1 s2 32->64 @48x96x192", (1, 48, 96, 192, 32), 32, 64),
                           ("conv3 s2 64->64 @24x48x96", (1, 24, 48, 96, 64), 64, 64)]:
        x = arr(*xs)
        k = arr(3, 3, 3, ci, co) * 0.05
        y = conv_s2(x, k)
        flop = 2 * 27 * ci * co * int(np.prod(y.shape[:-1]))
        report(f"{nm} fwd", conv_s2, x, k, flop=flop)

        def fg(a, b):
            def f(xk):
                return jnp.sum(conv_s2(*xk).astype(jnp.float32))
            dx, dk = jax.grad(f)((a, b))
            return dx + jnp.sum(dk).astype(a.dtype)

        report(f"{nm} fwd+grad(XLA)", fg, x, k)
        g = jnp.ones_like(y)
        ref = np.asarray(jax.grad(lambda kk: jnp.sum(conv_s2(x, kk).astype(jnp.float32)))(k), np.float64)
        cand = np.asarray(dk_s2_stacked(x, g), np.float64)
        err = np.abs(cand - ref).max() / (np.abs(ref).max() + 1e-9)
        report(f"{nm} dK stacked27 (err {err:.1e})", dk_s2_stacked, x, g, flop=flop)

    # ---- parity deconvs (hourglass conv5/conv6) ----
    for nm, xs, co in [("conv5 dec 64->64 @12x24x48", (1, 12, 24, 48, 64), 64),
                       ("conv6 dec 64->32 @24x48x96", (1, 24, 48, 96, 64), 32)]:
        x = arr(*xs)
        k = arr(3, 3, 3, co, x.shape[-1]) * 0.05
        flop = 2 * 8 * x.shape[-1] * 8 * co * int(np.prod(x.shape[1:4]))
        report(f"{nm} fwd parity", _deconv_parity, x, k, flop=flop)
        report(f"{nm} fwd native", _deconv_native, x, k)

        def make_fgd(f):
            def fgd(a, b):
                def h(xk):
                    return jnp.sum(f(*xk).astype(jnp.float32))
                dx, dk = jax.grad(h)((a, b))
                return dx + jnp.sum(dk).astype(a.dtype)
            return fgd

        report(f"{nm} fwd+grad parity(XLA)", make_fgd(_deconv_parity), x, k)
        report(f"{nm} fwd+grad native(XLA)", make_fgd(_deconv_native), x, k)


if __name__ == "__main__":
    main()
