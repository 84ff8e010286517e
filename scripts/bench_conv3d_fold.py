"""Conv3d "tap-fold into Cout" formulations, traced kernels.

The MXU processes GEMM lane tiles of 128: an im2col conv with Co=32
fills 32/128 = 25% of the output lanes, which is exactly where the
native conv plateaus (~32 TFLOP/s on the v5e calibrated at ~147).
Folding kernel taps into the *output* channel dimension raises the lane
fill without changing the math:

  kw-fold : z = conv3d(x, K as (3,3,1,Ci,3Co)); y[w] = sum_kw z[w+kw-1, kw]
            -> GEMM N-dim 3*Co (96/128 = 75% for Co=32), combine is a
               3-slice shifted add (elementwise, HBM-bound)
  khkw    : z = conv3d(x, K as (3,1,1,Ci,9Co)); combine over 9 shifts

The combine re-reads/writes the 3x (or 9x) intermediate, so the net win
depends on whether the GEMM was compute-bound.  Run on TPU:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv3d_fold.py \
      [--dtype bfloat16] [--shape 1,48,96,192,32] [--cout 32]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.utils.benchtime import time_op


def conv_ndhwc(x, k, pads="SAME"):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    return lax.conv_general_dilated(x, k, (1, 1, 1), pads, dimension_numbers=dn)


def conv_kwfold(x, k):
    """y = conv3d(x, k) with kw folded into Cout then shift-combined."""
    n, D, H, W, ci = x.shape
    co = k.shape[-1]
    # (3,3,3,ci,co) -> (3,3,1,ci,3co): kw tap kw lands in channels [kw*co, ...)
    kz = jnp.moveaxis(k, 2, 3).reshape(3, 3, 1, ci, 3 * co)
    z = conv_ndhwc(x, kz, pads=[(1, 1), (1, 1), (0, 0)])  # (n,D,H,W,3co)
    zp = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    return (
        zp[:, :, :, 0:W, 0:co]
        + zp[:, :, :, 1 : W + 1, co : 2 * co]
        + zp[:, :, :, 2 : W + 2, 2 * co : 3 * co]
    )


def conv_kdfold(x, k):
    """kd folded into Cout: kernel (1,3,3,Ci,3Co) — a plain 2-D 3x3 conv
    over (H,W) with batch N*D — then a shifted add along D (outer axis,
    no relayout)."""
    n, D, H, W, ci = x.shape
    co = k.shape[-1]
    # (3,3,3,ci,co) -> (1,3,3,ci,3co): kd tap lands in channels [kd*co, ...)
    kz = jnp.transpose(k, (1, 2, 3, 0, 4)).reshape(1, 3, 3, ci, 3 * co)
    z = conv_ndhwc(x, kz, pads=[(0, 0), (1, 1), (1, 1)])  # (n,D,H,W,3co)
    zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    return (
        zp[:, 0:D, :, :, 0:co]
        + zp[:, 1 : D + 1, :, :, co : 2 * co]
        + zp[:, 2 : D + 2, :, :, 2 * co : 3 * co]
    )


def conv_khkwfold(x, k):
    """kh and kw both folded into Cout (9x), combined over 9 shifts."""
    n, D, H, W, ci = x.shape
    co = k.shape[-1]
    # (kd,kh,kw,ci,co) -> (kd,ci,kh,kw,co) -> (kd,1,1,ci,9co), channel
    # block (kh*3+kw)*co holds tap (kh,kw)
    kz = jnp.transpose(k, (0, 3, 1, 2, 4)).reshape(3, ci, 9 * co)[:, None, None]
    z = conv_ndhwc(x, kz, pads=[(1, 1), (0, 0), (0, 0)])
    zp = jnp.pad(z, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for kh in range(3):
        for kw in range(3):
            key = (kh * 3 + kw) * co
            piece = zp[:, :, kh : kh + H, kw : kw + W, key : key + co]
            out = piece if out is None else out + piece
    return out


def deconv_ref(x, k):
    """flax ConvTranspose(k=3, s=2, padding [(1,2)], transpose_kernel=True)
    equivalent (models/psmnet.py hourglass conv5/conv6).  k is the model
    parameter layout (3,3,3,Cout,Cin)."""
    return lax.conv_transpose(
        x, k, (2, 2, 2), [(1, 2)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), transpose_kernel=True,
    )


def deconv_parity_fold(x, k):
    """Same deconv as one dense (2,2,2) conv with all 8 output parities
    folded into Cout (8Co), then depth-to-space.

    With Kr = spatially-flipped, channel-swapped k (what conv_transpose
    applies), the 1-D identity for stride 2 / k 3 / pads (1,2) is
      y[2u]   = x[u] . Kr[1]
      y[2u+1] = x[u] . Kr[0] + x[u+1] . Kr[2]
    so parity p with offset o contributes Kr[1] at (0,0), Kr[0] at
    (1,0), Kr[2] at (1,1), zero elsewhere.  The zero slots cost 64/27 =
    2.37x FLOPs but the GEMM runs at full lane tiles (n = 8Co).
    """
    n, D, H, W, ci = x.shape
    co = k.shape[-2]
    kr = jnp.flip(k, axis=(0, 1, 2)).swapaxes(3, 4)  # (3,3,3,Ci,Co)
    sel = {(0, 0): 1, (1, 0): 0, (1, 1): 2}  # (parity, offset) -> Kr index
    kb = jnp.zeros((2, 2, 2, ci, 8, co), x.dtype)  # traced-kernel friendly
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                for od in range(2):
                    for oh in range(2):
                        for ow in range(2):
                            kd = sel.get((pd, od))
                            kh = sel.get((ph, oh))
                            kw = sel.get((pw, ow))
                            if None in (kd, kh, kw):
                                continue
                            kb = kb.at[od, oh, ow, :,
                                       pd * 4 + ph * 2 + pw].set(kr[kd, kh, kw])
    kb = kb.reshape(2, 2, 2, ci, 8 * co)
    z = conv_ndhwc(x, kb, pads=[(0, 1)] * 3)  # (n,D,H,W,8co)
    z = z.reshape(n, D, H, W, 2, 2, 2, co)
    z = jnp.transpose(z, (0, 1, 4, 2, 5, 3, 6, 7))
    return z.reshape(n, 2 * D, 2 * H, 2 * W, co)


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

    y_ref = conv_ndhwc(x, k)
    for name, fn in [("kw-fold", conv_kwfold), ("kd-fold", conv_kdfold),
                     ("khkw-fold", conv_khkwfold)]:
        y = fn(x, k)
        err = float(jnp.max(jnp.abs((y - y_ref).astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32))))
        print(f"  {name} rel err: {err/scale:.2e}")

    def report(name, fn):
        t = time_op(fn, x, k)
        print(f"{name:28s} {t*1e3:8.3f} ms   {flops/t/1e12:7.2f} TFLOP/s",
              flush=True)

    report("lax NDHWC", conv_ndhwc)
    report("kw-fold (3Co + combine)", conv_kwfold)
    report("kd-fold (2D conv, 3Co)", conv_kdfold)
    report("khkw-fold (9Co + combine)", conv_khkwfold)

    # deconv (hourglass conv6 shape: half-res 64ch -> full-res co)
    xd = jnp.asarray(rng.randn(n, D // 2, H // 2, W // 2, 2 * ci), dt)
    kd = jnp.asarray(rng.randn(3, 3, 3, co, 2 * ci) * 0.1, dt)  # (Cout, Cin)
    dflops = 2 * 27 * (2 * ci) * co * n * (D // 2) * (H // 2) * (W // 2)
    yd_ref = deconv_ref(xd, kd)
    yd = deconv_parity_fold(xd, kd)
    errd = float(jnp.max(jnp.abs((yd - yd_ref).astype(jnp.float32))))
    sd = float(jnp.max(jnp.abs(yd_ref.astype(jnp.float32))))
    print(f"  deconv parity-fold rel err: {errd/sd:.2e}")

    def dreport(name, fn):
        t = time_op(fn, xd, kd)
        print(f"{name:28s} {t*1e3:8.3f} ms   {dflops/t/1e12:7.2f} TFLOP/s "
              f"(useful)", flush=True)

    dreport("lax conv_transpose", deconv_ref)
    dreport("deconv parity-fold (8Co)", deconv_parity_fold)


if __name__ == "__main__":
    main()
