"""Full-gradient (dx + dparams) stage timing: feature tower, hourglass,
single c1 conv — hunting the part of the 237 ms train step that the
3-D-conv pieces (scripts/bench_pieces2.py) do not explain.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fullgrads.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.models.layers import ConvBN, compute_dtype
from dsmnet_tpu.models.psmnet import _FeatureExtraction, _Hourglass
from dsmnet_tpu.utils.benchtime import time_op

rng = np.random.RandomState(0)


def rep(name, fn, *a):
    t = time_op(fn, *a, n_big=6)
    print(f"{name:36s} {t*1e3:8.2f} ms", flush=True)


def fullgrad(mod, variables, x):
    def loss(v, xx):
        return jnp.sum(mod.apply(v, xx, train=False).astype(jnp.float32))

    gx, gv = jax.grad(lambda xx, v: loss(v, xx), argnums=(0, 1))(x, variables)
    return gx + sum(jnp.sum(l) for l in jax.tree.leaves(gv)).astype(gx.dtype)


with compute_dtype(jnp.bfloat16):
    imL = jnp.asarray(rng.rand(1, 384, 768, 3), jnp.float32)
    feat = _FeatureExtraction()
    fv = feat.init(jax.random.PRNGKey(0), imL, train=False)
    rep("feature tower fwd",
        lambda x: feat.apply(fv, x, train=False), imL)
    rep("feature tower FULL grad", lambda x: fullgrad(feat, fv, x), imL)

    vol = jnp.asarray(rng.rand(1, 48, 96, 192, 32), jnp.bfloat16)
    hg = _Hourglass(32)
    hv = hg.init(jax.random.PRNGKey(3), vol, None, None, train=False)

    def hg_fullgrad(x):
        def loss(v, xx):
            return jnp.sum(hg.apply(v, xx, None, None, train=False)[0]
                           .astype(jnp.float32))
        gx, gv = jax.grad(lambda xx, v: loss(v, xx), argnums=(0, 1))(x, hv)
        return gx + sum(jnp.sum(l) for l in jax.tree.leaves(gv)).astype(gx.dtype)

    rep("hourglass fwd",
        lambda x: hg.apply(hv, x, None, None, train=False)[0], vol)
    rep("hourglass FULL grad", hg_fullgrad, vol)

    c1 = ConvBN(1, 3, 1, dims=3, use_bias=False, bn=False, relu=False)
    cv = c1.init(jax.random.PRNGKey(2), vol, train=False)
    rep("c1 conv 32->1 fwd", lambda x: c1.apply(cv, x, train=False), vol)

    def c1_fullgrad(x):
        def loss(v, xx):
            return jnp.sum(c1.apply(v, xx, train=False).astype(jnp.float32))
        gx, gv = jax.grad(lambda xx, v: loss(v, xx), argnums=(0, 1))(x, cv)
        return gx + sum(jnp.sum(l) for l in jax.tree.leaves(gv)).astype(gx.dtype)

    rep("c1 conv 32->1 FULL grad", c1_fullgrad, vol)
