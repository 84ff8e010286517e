"""BatchNorm cost diagnosis at the PSMNet full-volume shape.

Round-3 stage timing showed ConvBN(3-D, bn=True) fwd = 2.99 ms where
the bare conv is ~1.5 ms: BatchNorm at (1,48,96,192,32) costs as much
as the 48.9-GFLOP conv.  Theoretical BN cost is ~3 passes over 56.6 MB
(~0.2 ms).  This bench isolates which formulation pays what.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_bn.py
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.ops.conv3d import conv3d_same
from dsmnet_tpu.utils.benchtime import time_op


def hand_bn_relu(y, gamma, beta, eps=1e-5, stat_dtype=jnp.float32):
    yf = y.astype(stat_dtype)
    m = jnp.mean(yf, axis=(0, 1, 2, 3))
    v = jnp.mean(jnp.square(yf), axis=(0, 1, 2, 3)) - jnp.square(m)
    a = (gamma.astype(stat_dtype) * jax.lax.rsqrt(v + eps))
    b = beta.astype(stat_dtype) - m * a
    return nn.relu(y * a.astype(y.dtype) + b.astype(y.dtype))


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 48, 96, 192, 32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, 32, 32) * 0.05, jnp.bfloat16)
    gamma = jnp.ones((32,), jnp.float32)
    beta = jnp.zeros((32,), jnp.float32)

    t = time_op(conv3d_same, x, k, n_big=6)
    print(f"conv only                    {t*1e3:7.3f} ms", flush=True)

    t = time_op(lambda a, b: nn.relu(conv3d_same(a, b)), x, k, n_big=6)
    print(f"conv + relu                  {t*1e3:7.3f} ms", flush=True)

    t = time_op(lambda a, b: hand_bn_relu(conv3d_same(a, b), gamma, beta),
                x, k, n_big=6)
    print(f"conv + hand BN(f32 stats)    {t*1e3:7.3f} ms", flush=True)

    t = time_op(lambda a, b: hand_bn_relu(conv3d_same(a, b), gamma, beta,
                                          stat_dtype=jnp.bfloat16), x, k, n_big=6)
    print(f"conv + hand BN(bf16 stats)   {t*1e3:7.3f} ms", flush=True)

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.bfloat16)
    bv = bn.init(jax.random.PRNGKey(0), x)

    def flax_bn(a, b):
        y = conv3d_same(a, b)
        out, _ = bn.apply(bv, y, mutable=["batch_stats"])
        return nn.relu(out)

    t = time_op(flax_bn, x, k, n_big=6)
    print(f"conv + flax BN + relu        {t*1e3:7.3f} ms", flush=True)

    # BN alone (no conv) for the subtraction
    t = time_op(lambda a: hand_bn_relu(a, gamma, beta), x, n_big=6)
    print(f"hand BN alone (f32 stats)    {t*1e3:7.3f} ms", flush=True)

    def flax_bn_only(a):
        out, _ = bn.apply(bv, a, mutable=["batch_stats"])
        return nn.relu(out)

    t = time_op(flax_bn_only, x, n_big=6)
    print(f"flax BN alone                {t*1e3:7.3f} ms", flush=True)

    # gradient cost comparison
    def g_flax(a, b):
        return jax.grad(lambda xx: jnp.sum(flax_bn(xx, b).astype(jnp.float32)))(a)

    t = time_op(g_flax, x, k, n_big=6)
    print(f"conv+flaxBN fwd+bwd(dx)      {t*1e3:7.3f} ms", flush=True)

    def g_hand(a, b):
        return jax.grad(lambda xx: jnp.sum(
            hand_bn_relu(conv3d_same(xx, b), gamma, beta).astype(jnp.float32)))(a)

    t = time_op(g_hand, x, k, n_big=6)
    print(f"conv+handBN fwd+bwd(dx)      {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
