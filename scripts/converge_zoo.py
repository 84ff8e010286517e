"""Quantitative synthetic convergence for the model zoo (VERDICT r3 #5).

Trains each cost-volume model on the procedural synthetic dataset until
the held-out full-resolution EPE drops below the target (default 1.5 px)
or the step budget runs out, and prints the curve — upgrading the zoo
learning bar from "loss -10% in 12 steps" (tests/test_train_zoo.py) to
"solves the task".

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/converge_zoo.py \
      [--nets psmnet,gcnet] [--steps 400] [--target 1.5] [--hw 96x128]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.data import BatchLoader, SyntheticStereoDataset
from dsmnet_tpu.data.transforms import eval_transform
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.train import (
    create_train_state,
    make_supervised_eval_step,
    make_supervised_train_step,
)


def run(net: str, steps: int, target: float, hw, maxd: int, lr: float,
        batch: int, eval_every: int = 20):
    h, w = hw
    train_ds = SyntheticStereoDataset(n=16, hw=hw, max_disp=maxd // 2,
                                      transform=eval_transform(), seed=0)
    val_ds = SyntheticStereoDataset(n=4, hw=hw, max_disp=maxd // 2,
                                    transform=eval_transform(), seed=7)
    loader = BatchLoader(train_ds, batch_size=batch, shuffle=True,
                         num_workers=1, seed=0)
    val_batches = [jnp.asarray(b) for b, _ in
                   BatchLoader(val_ds, batch_size=4, shuffle=False,
                               num_workers=1)]

    model = create_model(net, maxdisparity=maxd)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   sample_hw=(max(h // 2, 64), max(w // 2, 64)))
    step = make_supervised_train_step(model, tx)
    evstep = make_supervised_eval_step(model)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))

    curve = []
    n = 0
    done = False
    while n < steps and not done:
        for b, _ in loader:
            state, m = step(state, jnp.asarray(b), lr, weights)
            n += 1
            if n % eval_every == 0 or n >= steps:
                epes = [float(evstep(state, vb, weights)["epe"])
                        for vb in val_batches]
                epe = float(np.mean(epes))
                loss = float(m["loss"])
                curve.append((n, loss, epe))
                print(f"  {net} step {n:4d}  loss {loss:8.4f}  val EPE {epe:6.3f}")
                if epe < target:
                    done = True
            if n >= steps or done:
                break
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default="psmnet,gcnet")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--target", type=float, default=1.5)
    ap.add_argument("--hw", default="96x128")
    ap.add_argument("--maxdisparity", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    results = {}
    for net in args.nets.split(","):
        print(f"== {net} ==")
        curve = run(net, args.steps, args.target, (h, w),
                    args.maxdisparity, args.lr, args.batch)
        final = curve[-1]
        results[net] = {"steps": final[0], "epe": final[2],
                        "hit_target": final[2] < args.target,
                        "curve": curve}
        print(f"{net}: EPE {final[2]:.3f} after {final[0]} steps "
              f"({'HIT' if final[2] < args.target else 'MISS'} target {args.target})")
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != 'curve'}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
