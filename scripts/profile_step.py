"""Capture a jax.profiler trace of the flagship b4 train step.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py \
      [--batch 4] [--dtype bfloat16] [--out /tmp/jaxprof]

Writes an xplane trace; analyze with scripts/profile_report.py.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=4, type=int)
    ap.add_argument("--net", default="psmnet")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", default=3, type=int)
    ap.add_argument("--out", default="/tmp/jaxprof")
    args = ap.parse_args()

    import contextlib

    from dsmnet_tpu.losses import parse_loss_name
    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.models.layers import compute_dtype
    from dsmnet_tpu.train import create_train_state, make_supervised_train_step

    model = create_model(args.net, maxdisparity=192)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(64, 128))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    rng = np.random.RandomState(0)
    b = rng.rand(args.batch, 384, 768, 7).astype(np.float32)
    b[..., 6] = b[..., 6] * 100 + 1
    b = jnp.asarray(b)

    @jax.jit
    def one(state, batch):
        new_state, _ = step(state, batch, 1e-4, weights)
        return new_state

    ctx = (compute_dtype(jnp.bfloat16) if args.dtype == "bfloat16"
           else contextlib.nullcontext())
    with ctx:
        state = one(state, b)
        jax.block_until_ready(state.params)
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                state = one(state, b)
            jax.block_until_ready(state.params)
    print("trace written to", args.out)


if __name__ == "__main__":
    main()
