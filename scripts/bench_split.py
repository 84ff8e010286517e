"""Split PSMNet train-step time into forward / forward+backward / full
step (Adam + BN) at the contract shape (384x768, maxdisparity 192).

Locates where the train-step milliseconds live (round-2 follow-up to
VERDICT weak items 2/3: is the gap the conv3d VJP, the optimizer, or
the forward itself?).

Run on TPU:  python scripts/bench_split.py [--dtype bfloat16] [--batch 1]
"""

from __future__ import annotations

import argparse
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.losses import parse_loss_name, supervised_pyramid_loss
from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.train import create_train_state, make_supervised_train_step
from dsmnet_tpu.utils import time_op, time_pytree_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", default=1, type=int)
    ap.add_argument("--hw", default="384,768")
    args = ap.parse_args()
    h, w = map(int, args.hw.split(","))

    model = create_model("psmnet", maxdisparity=192)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(64, 128))
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    rng = np.random.RandomState(0)
    b = rng.rand(args.batch, h, w, 7).astype(np.float32)
    b[..., 6] = b[..., 6] * 100 + 1
    b = jnp.asarray(b)

    ctx = (
        compute_dtype(jnp.bfloat16)
        if args.dtype == "bfloat16"
        else contextlib.nullcontext()
    )

    def fwd_loss(params, batch):
        imL, imR, dispL = batch[..., :3], batch[..., 3:6], batch[..., 6:7]
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (scales, disps), _ = model.apply(
            variables, imL, imR, train=True, mutable=["batch_stats"]
        )
        return supervised_pyramid_loss(dispL, disps, scales, weights, True)

    with ctx:
        # batch array first: time_op threads its timing dependency through
        # the first argument, which must be an array (not the params pytree)
        t = time_op(lambda bb, p: fwd_loss(p, bb), b, state.params,
                    n_small=1, n_big=4)
        print(f"forward+loss (train mode)   {t*1e3:8.1f} ms")

        grad_fn = jax.grad(fwd_loss)

        def fwd_bwd(params, batch):
            return grad_fn(params, batch)

        t = time_pytree_step(
            lambda p, bb: jax.tree.map(lambda a, g: a - 1e-9 * g, p, fwd_bwd(p, bb)),
            state.params, b, n_small=1, n_big=4)
        print(f"forward+backward(+sgd)      {t*1e3:8.1f} ms")

        step = make_supervised_train_step(model, tx)

        def one(s, bb):
            ns, _ = step(s, bb, 1e-4, weights)
            return ns

        t = time_pytree_step(one, state, b, n_small=1, n_big=4)
        print(f"full train step (Adam+BN)   {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
