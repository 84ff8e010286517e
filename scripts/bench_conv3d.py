"""Microbench: 3x3x3 conv3d formulations at PSMNet volume shape.

PSMNet's regularizer is ~25 32-channel 3-D convs over the (D,H,W) cost
volume; PERF.md measured the whole forward at ~8 TFLOP/s.  This script
times one conv at production shape (N=1, D=48, H=96, W=192, C=32->32)
under different formulations to find the fastest building block.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.utils.benchtime import time_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--shape", default="1,48,96,192,32")
    ap.add_argument("--cout", type=int, default=32)
    args = ap.parse_args()
    dt = jnp.dtype(args.dtype)
    n, D, H, W, ci = map(int, args.shape.split(","))
    co = args.cout

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, D, H, W, ci), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, dt)

    flops = 2 * 27 * ci * co * n * D * H * W
    print(f"shape={x.shape} cout={co} dtype={dt.name}  {flops/1e9:.1f} GFLOP")

    def report(name, fn, *a):
        t = time_op(fn, *a)
        print(f"{name:28s} {t*1e3:8.3f} ms   {flops/t/1e12:7.2f} TFLOP/s")

    # 1. native NDHWC lax conv
    def conv_ndhwc(x, k):
        dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return lax.conv_general_dilated(x, k, (1, 1, 1), "SAME", dimension_numbers=dn)

    report("lax NDHWC", conv_ndhwc, x, k)

    # 2. native NCDHW lax conv
    xc = jnp.moveaxis(x, -1, 1)
    kc = jnp.transpose(k, (4, 3, 0, 1, 2))

    def conv_ncdhw(xc, kc):
        dn = lax.conv_dimension_numbers(xc.shape, kc.shape, ("NCDHW", "OIDHW", "NCDHW"))
        return lax.conv_general_dilated(xc, kc, (1, 1, 1), "SAME", dimension_numbers=dn)

    report("lax NCDHW", conv_ncdhw, xc, kc)

    # 3. kd-decomposed: 3 batched 2-D convs over (H,W), batch = N*D shifts
    def conv_kd2d(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = None
        for dd in range(3):
            xs = lax.dynamic_slice_in_dim(xp, dd, D, axis=1)
            xs2 = xs.reshape(n * D, H, W, ci)
            dn = lax.conv_dimension_numbers(
                xs2.shape, k[dd].shape, ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(xs2, k[dd], (1, 1), "SAME",
                                         dimension_numbers=dn)
            out = y if out is None else out + y
        return out.reshape(n, D, H, W, co)

    report("3x conv2d (kd taps)", conv_kd2d, x, k)

    # 4. im2col matmul: 27 shifted reads -> (M, 864) @ (864, co)
    def conv_im2col(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        cols = []
        for dd in range(3):
            for dh in range(3):
                for dw in range(3):
                    cols.append(lax.dynamic_slice(
                        xp, (0, dd, dh, dw, 0), (n, D, H, W, ci)))
        patches = jnp.concatenate(cols, axis=-1)  # (n,D,H,W,27*ci)
        return jnp.einsum("ndhwk,ko->ndhwo", patches,
                          k.reshape(27 * ci, co),
                          preferred_element_type=jnp.float32).astype(x.dtype)

    report("im2col einsum", conv_im2col, x, k)

    # 5. tap-summed matmuls: 27 accumulated (M,32)@(32,co)
    def conv_taps(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        out = jnp.zeros((n, D, H, W, co), jnp.float32)
        for dd in range(3):
            for dh in range(3):
                for dw in range(3):
                    xs = lax.dynamic_slice(xp, (0, dd, dh, dw, 0), (n, D, H, W, ci))
                    out = out + jnp.einsum(
                        "ndhwc,co->ndhwo", xs, k[dd, dh, dw],
                        preferred_element_type=jnp.float32)
        return out.astype(x.dtype)

    report("27x tap matmul", conv_taps, x, k)

    # 6. W-folded: move pairs of W into channels (space-to-depth along W),
    # conv with adjusted kernel so Cin=64, halving W.
    # y[w] needs x[w-1:w+2]; with w = 2u+p, taps live in u-1..u+1 at 64ch.
    def conv_s2d_w(x, k):
        # fold W by 2 -> (n, D, H, W/2, 2*ci)
        xf = x.reshape(n, D, H, W // 2, 2 * ci)
        # build 64->64 kernel over (kd,kh,kw=3) in folded space: output
        # position u, parity p reads original w=2u+p-1..2u+p+1 which spans
        # folded u-1..u+1 (6 original columns, only 3 used per parity).
        kf = jnp.zeros((3, 3, 3, 2 * ci, 2 * co), k.dtype)
        # parity 0: w-1 = 2(u-1)+1, w = 2u+0, w+1 = 2u+1
        kf = kf.at[:, :, 0, ci:, :co].set(k[:, :, 0])
        kf = kf.at[:, :, 1, :ci, :co].set(k[:, :, 1])
        kf = kf.at[:, :, 1, ci:, :co].set(k[:, :, 2])
        # parity 1: w-1 = 2u+0, w = 2u+1, w+1 = 2(u+1)+0
        kf = kf.at[:, :, 1, :ci, co:].set(k[:, :, 0])
        kf = kf.at[:, :, 1, ci:, co:].set(k[:, :, 1])
        kf = kf.at[:, :, 2, :ci, co:].set(k[:, :, 2])
        dn = lax.conv_dimension_numbers(xf.shape, kf.shape, ("NDHWC", "DHWIO", "NDHWC"))
        yf = lax.conv_general_dilated(xf, kf, (1, 1, 1), "SAME",
                                      dimension_numbers=dn)
        return yf.reshape(n, D, H, W, co)

    y_ref = conv_ndhwc(x, k)
    y_f = conv_s2d_w(x, k)
    err = float(jnp.max(jnp.abs(y_ref - y_f)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"  s2d-W rel err: {err:.2e}")
    report("W-folded conv (64ch)", conv_s2d_w, x, k)

    # 7. DW-folded: fold both D and W by 2 -> 128 channels
    def conv_s2d_dw(x, k):
        xf = x.reshape(n, D // 2, 2, H, W // 2, 2, ci)
        xf = jnp.moveaxis(xf, 2, -2).reshape(n, D // 2, H, W // 2, 4 * ci)
        kf = jnp.zeros((3, 3, 3, 4 * ci, 4 * co), k.dtype)
        for pd in range(2):
            for pw in range(2):
                o = (pd * 2 + pw) * co
                for td in range(3):   # original d-tap: d + td - 1 = 2u+pd+td-1
                    for tw in range(3):
                        wd, rd = divmod(pd + td - 1, 2)   # folded offset, parity
                        ww, rw = divmod(pw + tw - 1, 2)
                        i = (rd * 2 + rw) * ci
                        kf = kf.at[wd + 1, :, ww + 1, i:i + ci, o:o + co].set(
                            k[td, :, tw])
        dn = lax.conv_dimension_numbers(xf.shape, kf.shape, ("NDHWC", "DHWIO", "NDHWC"))
        yf = lax.conv_general_dilated(xf, kf, (1, 1, 1), "SAME",
                                      dimension_numbers=dn)
        yf = yf.reshape(n, D // 2, H, W // 2, 2, 2, co)
        yf = jnp.moveaxis(yf, 4, 2).reshape(n, D, H, W, co)
        return yf

    y_f2 = conv_s2d_dw(x, k)
    err2 = float(jnp.max(jnp.abs(y_ref - y_f2)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"  s2d-DW rel err: {err2:.2e}")
    report("DW-folded conv (128ch)", conv_s2d_dw, x, k)

    # 8. kd-concat: stack the 3 d-shifted volumes on channels (Cin=3*ci),
    # one 2-D conv with kernel (3,3,3*ci,co).  No redundant FLOPs; the
    # contraction depth seen by the MXU is 9*3*ci = 864.
    def conv_kdcat(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xcat = jnp.concatenate(
            [lax.dynamic_slice_in_dim(xp, dd, D, axis=1) for dd in range(3)],
            axis=-1,
        ).reshape(n * D, H, W, 3 * ci)
        kcat = k.reshape(3, 3, 3, ci, co).transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * ci, co)
        dn = lax.conv_dimension_numbers(xcat.shape, kcat.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(xcat, kcat, (1, 1), "SAME", dimension_numbers=dn)
        return y.reshape(n, D, H, W, co)

    y_kc = conv_kdcat(x, k)
    errk = float(jnp.max(jnp.abs(y_ref - y_kc)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"  kd-cat rel err: {errk:.2e}")
    report("kd-concat conv2d (96ch in)", conv_kdcat, x, k)

    # 9. kd-concat + W-folded: Cin = 2*3*ci = 192, Cout = 2*co
    def conv_kdcat_wfold(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        xcat = jnp.concatenate(
            [lax.dynamic_slice_in_dim(xp, dd, D, axis=1) for dd in range(3)],
            axis=-1,
        ).reshape(n * D, H, W // 2, 2 * 3 * ci)
        kcat = k.reshape(3, 3, 3, ci, co).transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * ci, co)
        c2 = 3 * ci
        kf = jnp.zeros((3, 2, 2 * c2, 2 * co), k.dtype)
        kf = kf.at[:, 0, c2:, :co].set(kcat[:, 0])
        kf = kf.at[:, 1, :c2, :co].set(kcat[:, 1])
        kf = kf.at[:, 1, c2:, :co].set(kcat[:, 2])
        kf = kf.at[:, 1, :c2, co:].set(kcat[:, 0])
        kf = kf.at[:, 1, c2:, co:].set(kcat[:, 1])
        kf = kf.at[:, 2, :c2, co:].set(kcat[:, 2])
        dn = lax.conv_dimension_numbers(xcat.shape, kf.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xcat, kf, (1, 1), [(1, 1), (1, 0)], dimension_numbers=dn)
        return y.reshape(n, D, H, W, co)

    y_kw = conv_kdcat_wfold(x, k)
    errkw = float(jnp.max(jnp.abs(y_ref - y_kw)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    print(f"  kd-cat+Wfold rel err: {errkw:.2e}")
    report("kd-cat + W-fold (192ch in)", conv_kdcat_wfold, x, k)


if __name__ == "__main__":
    main()
