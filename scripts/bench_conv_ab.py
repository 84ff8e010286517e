"""In-model A/B of conv3d implementations on the PSMNet train step.

Times fwd+loss and fwd+bwd(+update) per (conv3d_impl, conv3d_dk)
config with a full-pytree dependency chain (all gradient leaves are
consumed — no dead-code elimination, unlike naive single-leaf grad
timing).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_conv_ab.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.losses import parse_loss_name, supervised_pyramid_loss
from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.ops import config
from dsmnet_tpu.utils.benchtime import time_op, time_pytree_step
from dsmnet_tpu.train import create_train_state

model = create_model("psmnet", maxdisparity=192)
state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(64, 128))
spec = parse_loss_name("supervised", model.count_levels, 1)
weights = jnp.asarray(spec.weights(10))
rng = np.random.RandomState(0)
b = rng.rand(1, 384, 768, 7).astype(np.float32)
b[..., 6] = b[..., 6] * 100 + 1
b = jnp.asarray(b)


def fwd_loss(params, batch):
    imL, imR, dispL = batch[..., :3], batch[..., 3:6], batch[..., 6:7]
    variables = {"params": params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    (scales, disps), _ = model.apply(variables, imL, imR, train=True,
                                     mutable=["batch_stats"])
    return supervised_pyramid_loss(dispL, disps, scales, weights, True)


grad_fn = jax.grad(fwd_loss)

with compute_dtype(jnp.bfloat16):
    for impl, dk in [("native", "pertap"), ("native", "pallas"),
                     ("pallas", "pallas")]:
        config.conv3d_impl = impl
        config.conv3d_dk = dk
        t = time_op(lambda bb, p: fwd_loss(p, bb), b, state.params,
                    n_small=1, n_big=4)
        t2 = time_pytree_step(
            lambda p, bb: jax.tree.map(lambda a, g: a - 1e-9 * g, p,
                                       grad_fn(p, bb)),
            state.params, b, n_small=1, n_big=4)
        print(f"[{impl:6s}/{dk:6s}] fwd+loss {t*1e3:7.1f} ms   "
              f"fwd+bwd {t2*1e3:7.1f} ms", flush=True)
