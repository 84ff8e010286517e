"""Micro-test: can Mosaic reshape (ht, W*C) -> (ht*W, C) in-kernel, and
how fast?  This is the layout pivot the Pallas conv3d needs to build
im2col patches from densely-stored (lane-packed) input slabs.
"""

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsmnet_tpu.utils.benchtime import time_op

HT, W, C = 8, 192, 32


def k_reshape(x_ref, o_ref):
    x = x_ref[:]  # (HT, W*C)
    o_ref[:] = x.reshape(HT * W, C)


def k_copy(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(HT * W, C) * 1.0


def run(kern, reps=1):
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((HT * W, C), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    return f


x = jnp.asarray(np.random.RandomState(0).randn(HT, W * C), jnp.float32)
f = run(k_reshape)
y = f(x)
ref = np.asarray(x).reshape(HT * W, C)
print("correct:", np.allclose(np.asarray(y), ref))
t = time_op(f, x, n_big=101)
print(f"reshape kernel: {t*1e6:.2f} us for {x.nbytes/1e6:.2f} MB")
