"""A/B the classifier c1 (32 -> 1) formulations at the b4 shape.

  python -m scripts.bench_c1
"""
import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.ops.conv3d import conv3d_same
from dsmnet_tpu.ops.folded import fold, folded_conv3d_to1, unfold
from dsmnet_tpu.utils.benchtime import time_op, time_pytree_step


def main():
    n, D, H, W, C = 4, 48, 96, 192, 32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, D, H, W, C), jnp.bfloat16)
    xf = fold(x)
    k = jnp.asarray(rng.randn(3, 3, 3, C, 1) * 0.1, jnp.bfloat16)

    unf = lambda a, b: conv3d_same(unfold(a, C), b)
    fol = lambda a, b: folded_conv3d_to1(a, b, C, W)

    for name, fn in [("unfold+tapfold", unf), ("folded_to1", fol)]:
        t_f = time_op(lambda a: fn(a, k), xf)
        g = jax.jit(jax.grad(lambda a, b: jnp.sum(
            fn(a, b).astype(jnp.float32) ** 2), argnums=(0, 1)))
        t_g = time_op(lambda a: g(a, k)[0], xf)
        print(f"{name:16s} fwd {t_f*1e3:7.3f} ms   fwd+fullgrad {t_g*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
