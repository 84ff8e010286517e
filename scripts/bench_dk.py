"""dK formulation shootout for the stride-1 SAME 3x3x3 conv backward.

The round-2 measurement showed the kernel-gradient is the dominant cost
of the PSMNet train step: the per-tap deep einsum runs 27 GEMMs with a
32x32 output tile each (6.25% MXU fill -> ~8.6 TFLOP/s observed).

Candidate: stack the (kd,kh) taps of x into the GEMM M dimension and
the kw taps of g into the N dimension -> ONE GEMM with a (9*Ci, 3*Co)
= (288, 96) output tile (56% fill after 128-padding) at the price of
materializing 9 shifted x copies + 3 shifted g copies.

  PYTHONPATH=/root/repo python scripts/bench_dk.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.utils.benchtime import time_op


def dk_pertap(x, g, k=3):
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dd in range(k):
        for dh in range(k):
            for dw in range(k):
                xs = lax.dynamic_slice(xp, (0, dd, dh, dw, 0), (n, D, H, W, ci))
                taps.append(
                    jnp.einsum("ndhwc,ndhwo->co", xs, g,
                               preferred_element_type=jnp.float32)
                )
    return jnp.stack(taps).reshape(k, k, k, ci, co)


def dk_stacked93(x, g):
    """(dd,dh) taps of x on M, dw taps of g on N: one (288,96) GEMM."""
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


def dk_stacked39(x, g):
    """dd taps of x on M, (dh,dw) taps of g on N: one (96,288) GEMM."""
    n, D, H, W, ci = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    gp = jnp.pad(g, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    A = jnp.stack([xp[:, dd:dd + D] for dd in range(3)])         # (3,n,D,H,W,ci)
    B = jnp.stack([gp[:, :, 2 - dh:2 - dh + H, 2 - dw:2 - dw + W]
                   for dh in range(3) for dw in range(3)])       # (9,n,D,H,W,co)
    dk = jnp.einsum("andhwc,bndhwo->acbo", A, B,
                    preferred_element_type=jnp.float32)          # (3,ci,9,co)
    return jnp.transpose(dk.reshape(3, ci, 3, 3, co), (0, 2, 3, 1, 4))


def dk_autodiff(x, g):
    def f(k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
        y = lax.conv_general_dilated(x, k, (1, 1, 1), [(1, 1)] * 3,
                                     dimension_numbers=dn)
        return jnp.sum(y * g)

    k0 = jnp.zeros((3, 3, 3, x.shape[-1], g.shape[-1]), x.dtype)
    return jax.grad(f)(k0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--shape", default="1,48,96,192,32")
    ap.add_argument("--co", default=32, type=int)
    args = ap.parse_args()
    shp = tuple(map(int, args.shape.split(",")))
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shp), dt)
    g = jnp.asarray(rng.randn(*shp[:-1], args.co), dt)

    flop = 2 * 27 * shp[-1] * args.co * int(np.prod(shp[:-1]))
    ref = np.asarray(dk_pertap(x, g), np.float64)
    for name, fn in [("pertap", dk_pertap), ("stack93", dk_stacked93),
                     ("stack39", dk_stacked39), ("autodiff", dk_autodiff)]:
        out = np.asarray(fn(x, g), np.float64)
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        t = time_op(fn, x, g, n_big=8)
        print(f"{name:10s} {t*1e3:7.3f} ms  {flop/t/1e12:6.1f} TFLOP/s  "
              f"relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
