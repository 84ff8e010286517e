"""Stride-2 3x3x3 conv piece timings at the hourglass down-path shapes.

conv1: (1,48,96,192,32) -> (1,24,48,96,64)   [stackhourglass.py:24-25]
conv3: (1,24,48,96,64)  -> (1,12,24,48,64)   [stackhourglass.py:28-29]

Measures fwd (native vs s2d), dx (native transpose identity), and dK
(current s2d per-tap) separately, plus the full custom-VJP grad, to
decide which piece deserves a Pallas kernel (VERDICT r3 next-#1).

  PYTHONPATH=/root/repo python scripts/bench_s2.py [--dtype bfloat16] [--batch N]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.ops import conv3d as c3
from dsmnet_tpu.utils.benchtime import time_op

SHAPES = {
    "conv1": ((48, 96, 192, 32), 64),
    "conv3": ((24, 48, 96, 64), 64),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", default=1, type=int)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)

    rng = np.random.RandomState(0)
    for name, ((D, H, W, C), Co) in SHAPES.items():
        x = jnp.asarray(rng.rand(args.batch, D, H, W, C), dt)
        k = jnp.asarray(rng.rand(3, 3, 3, C, Co) * 0.1, dt)
        g = jnp.asarray(rng.rand(args.batch, D // 2, H // 2, W // 2, Co), dt)
        gflop = 2 * 27 * C * Co * args.batch * (D // 2) * (H // 2) * (W // 2) / 1e9

        def dx_native(gg, kk):
            _, vjp = jax.vjp(lambda a: c3._conv_s2_native(a, kk), x)
            return vjp(gg)[0]

        def dk_cur(xx, gg):
            return c3._s2_bwd((xx, k), gg)[1]

        def full(xx, kk):
            def f(a, b):
                return jnp.sum(c3.conv3d_s2(a, b).astype(jnp.float32) ** 2)
            l, grads = jax.value_and_grad(f, argnums=(0, 1))(xx, kk)
            return grads[1]

        rows = {
            "fwd_native": (lambda xx, kk: c3._conv_s2_native(xx, kk), (x, k), gflop),
            "fwd_s2d": (lambda xx, kk: c3._conv_s2_s2d(xx, kk), (x, k), gflop * 64 / 27),
            "dx_native": (dx_native, (g, k), gflop),
            # label reflects the ACTIVE conv3d_s2 mode: with the TPU default
            # conv3d_s2_mode()=='pallas' this times the Pallas dK kernel, not
            # the s2d per-tap path (ADVICE r4)
            f"dk_{c3.config.conv3d_s2_mode()}": (dk_cur, (x, g), gflop),
            "fullgrad": (full, (x, k), 3 * gflop),
        }
        for rname, (fn, fargs, gf) in rows.items():
            try:
                t = time_op(fn, *fargs, n_small=1, n_big=7) * 1e3
                print(f"{name} b{args.batch} {rname:14s} {t:7.3f} ms  "
                      f"{gf / t:7.1f} TFLOP/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name} b{args.batch} {rname:14s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
