"""A/B: fused-stem assembly formulations inside the full PSMNet train
step (VERDICT r4 task #2 — the ~55 ms/b4 of assembly machinery).

Compares the r4 diagonal-grouped assembly (5 right-group gathers +
boundary concats) against the r5 gather-free skew assembly on the real
contract config (supervised 384x768 bf16), plus the standalone op.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_stem_ab.py [--batch 4]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.ops import config
from dsmnet_tpu.train import create_train_state, make_supervised_train_step
from dsmnet_tpu.utils.benchtime import time_pytree_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", default="384x768")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    rng = np.random.RandomState(0)
    b = np.zeros((args.batch, h, w, 7), np.float32)
    b[..., :6] = rng.rand(args.batch, h, w, 6)
    b[..., 6] = rng.rand(args.batch, h, w) * 90 + 1
    b = jnp.asarray(b)

    for mode in ("grouped", "skew"):
        config.stem_assembly = mode
        model = create_model("psmnet", maxdisparity=192)
        state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                       sample_hw=(64, 128))
        step = make_supervised_train_step(model, tx)
        spec = parse_loss_name("supervised", model.count_levels, 1)
        weights = jnp.asarray(spec.weights(10))
        def one(s, bb):
            new_s, _ = step(s, bb, 1e-4, weights)
            return new_s

        with compute_dtype(jnp.bfloat16):
            ms = time_pytree_step(one, state, b, n_small=1, n_big=6,
                                  reps=4) * 1e3
        fps = args.batch / (ms / 1e3)
        print(f"assembly={mode:8s} b{args.batch} {args.hw}: "
              f"step {ms:7.1f} ms  {fps:6.2f} fps/chip", flush=True)


if __name__ == "__main__":
    main()
