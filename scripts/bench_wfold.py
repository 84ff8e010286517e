"""Native vs W-folded conv3d across the PSMNet/GCNet regularizer shapes."""

import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.ops.conv3d import _conv, _conv_wfold
from dsmnet_tpu.utils.benchtime import time_op

SHAPES = [
    # (n, D, H, W, Ci, Co)            # which conv
    (1, 48, 96, 192, 64, 32),          # dres0_0 (unfused path)
    (1, 48, 96, 192, 32, 32),          # dres0_1/dres1/classif c0
    (1, 24, 48, 96, 64, 64),           # hourglass conv2
    (1, 12, 24, 48, 64, 64),           # hourglass conv4
    (1, 48, 96, 192, 32, 8),           # classif c1 (Co padded to 8)
    (1, 96, 192, 384, 64, 32),         # gcnet full-volume conv (384x768 in)
]

for dt in (jnp.float32, jnp.bfloat16):
    print(f"--- {jnp.dtype(dt).name}")
    for n, D, H, W, ci, co in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(n, D, H, W, ci), dt)
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, dt)
        flops = 2 * 27 * ci * co * n * D * H * W
        t0 = time_op(lambda a: _conv(a, k, [(1, 1)] * 3), x)
        t1 = time_op(lambda a: _conv_wfold(a, k), x)
        print(
            f"({D:3d},{H:3d},{W:3d}) {ci:3d}->{co:3d}: "
            f"native {t0*1e3:7.3f} ms ({flops/t0/1e12:5.1f} TF)  "
            f"wfold {t1*1e3:7.3f} ms ({flops/t1/1e12:5.1f} TF)  "
            f"{'WFOLD' if t1 < t0 else 'native'}"
        )
