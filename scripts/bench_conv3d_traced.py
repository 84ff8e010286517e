"""Conv3d formulation matrix with TRACED kernels (the honest training
scenario — parameters are jit arguments, not constants).

Round-2 correction: the earlier bench_conv3d.py closed kernels over the
jit boundary as constants, which distorts XLA's conv lowering (constant
kernel relayout is free).  With traced kernels the ranking changes
completely: native NDHWC wins and W-folding loses.
"""

import argparse

import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.ops.conv3d import _conv, _conv_wfold
from dsmnet_tpu.utils.benchtime import time_op

SHAPES = [
    # (n, D, H, W, Ci, Co, tag)
    (1, 48, 96, 192, 64, 32, "dres0_0 (unfused stem)"),
    (1, 48, 96, 192, 32, 32, "dres/classif c0"),
    (1, 24, 48, 96, 64, 64, "hourglass conv2"),
    (1, 12, 24, 48, 64, 64, "hourglass conv4"),
    (1, 48, 96, 192, 32, 1, "classif c1"),
]

ap = argparse.ArgumentParser()
ap.add_argument("--dtype", default="float32")
args = ap.parse_args()
dt = jnp.dtype(args.dtype)

for n, D, H, W, ci, co, tag in SHAPES:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, D, H, W, ci), dt)
    k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, dt)
    flops = 2 * 27 * ci * co * n * D * H * W
    t0 = time_op(lambda a, kk: _conv(a, kk, [(1, 1)] * 3), x, k)
    line = f"{tag:24s} ({D:3d},{H:3d},{W:3d},{ci:3d}->{co:3d}): " \
           f"native {t0*1e3:7.3f} ({flops/t0/1e12:5.1f}TF)"
    if W % 2 == 0:
        t1 = time_op(lambda a, kk: _conv_wfold(a, kk), x, k)
        line += f"  wfold {t1*1e3:7.3f}"
    # NCDHW
    xc = jnp.moveaxis(x, -1, 1)
    kc = jnp.transpose(k, (4, 3, 0, 1, 2))

    def conv_ncdhw(xc, kc):
        dn = lax.conv_dimension_numbers(xc.shape, kc.shape,
                                        ("NCDHW", "OIDHW", "NCDHW"))
        return lax.conv_general_dilated(xc, kc, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)
    t2 = time_op(conv_ncdhw, xc, kc)
    line += f"  ncdhw {t2*1e3:7.3f}"
    print(line, flush=True)
