"""Classifier-c1 backward-dx formulations at the exact b4 shape.

The r4 trace attributes ~30 ms of the 483 ms b4 step to the dx of the
three (32 -> 1)-channel classifier convs: after the channel swap the
cotangent conv is (3,3,3,1,32) with ONE input channel.  Candidates:

  native   — lax conv as-is (the default; K-depth 27, fill-bound)
  stencil  — 27 shifted broadcast-multiply adds (_conv_cin1; rejected
             in-model: +116 ms — XLA materializes the shifts)
  cpad8    — zero-pad the cotangent to 8 channels so the GEMM K-depth
             is 216 and lanes fill like the other small convs
  wfold    — fold g's W into lanes (x128) then per-tap GEMM

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_classdx.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.ops import conv3d as c3
from dsmnet_tpu.utils.benchtime import time_op


def main():
    rng = np.random.RandomState(0)
    n, D, H, W = 4, 48, 96, 192
    g = jnp.asarray(rng.rand(n, D, H, W, 1), jnp.bfloat16)
    kt = jnp.asarray(rng.rand(3, 3, 3, 1, 32) * 0.1, jnp.bfloat16)

    def native(gg, kk):
        return c3._conv(gg, kk, [(1, 1)] * 3)

    def stencil(gg, kk):
        return c3._conv_cin1(gg, kk)

    def cpad8(gg, kk):
        gp = jnp.pad(gg, ((0, 0),) * 4 + ((0, 7),))
        kp = jnp.pad(kk, ((0, 0),) * 3 + ((0, 7), (0, 0)))
        return c3._conv(gp, kp, [(1, 1)] * 3)

    for name, fn in (("native", native), ("stencil", stencil),
                     ("cpad8", cpad8)):
        try:
            t = time_op(fn, g, kt, n_small=1, n_big=7) * 1e3
            print(f"{name:8s} {t:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
