"""GT-free self-supervised synthetic convergence (VERDICT r4 task #1a).

Trains models with the photometric ``depthmono-mask`` loss (BASELINE
config #5's loss, reference stereo_selfsupervised.py:16-95 +
losses/loss.py:196-236) on synthetic stereo pairs WITHOUT ground truth,
then measures held-out full-resolution EPE against GT the loss never
saw.  Passing EPE < 3 px proves the whole self-supervised stack — warp
epsilon semantics, SSIM gate, occlusion ramp, flip double-forward — has
the right signs and actually solves the task, not just "decreases".

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/converge_selfsup.py \
      [--nets dispnetcorr,psmnet] [--steps 600] [--target 3.0]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.data import BatchLoader, SyntheticStereoDataset
from dsmnet_tpu.data.transforms import selfsup_eval_transform
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.train import (
    create_train_state,
    make_selfsup_eval_step,
    make_selfsup_train_step,
)


def run(net: str, steps: int, target: float, hw, maxd: int, lr: float,
        batch: int, loss_name: str, eval_every: int = 25,
        curriculum_steps: int = 0, tex_scale: int = 16):
    h, w = hw
    # tex_scale 16: photometric attraction basin ~ half the texture
    # wavelength; the default fine texture (tex_scale 4) leaves GT
    # disparities of 8-11 px OUTSIDE the basin (measured: a barrier at
    # 0.5*GT), which no optimizer crosses — with 16 the loss is
    # monotone from 0 to GT and the task is well-posed GT-free
    # train WITHOUT ground truth — the loss sees images only
    train_ds = SyntheticStereoDataset(n=16, hw=hw, max_disp=maxd // 2,
                                      transform=selfsup_eval_transform(),
                                      seed=0, with_gt=False,
                                      tex_scale=tex_scale)
    # held-out val WITH GT for the EPE measurement
    val_ds = SyntheticStereoDataset(n=4, hw=hw, max_disp=maxd // 2,
                                    transform=selfsup_eval_transform(), seed=7,
                                    tex_scale=tex_scale)
    loader = BatchLoader(train_ds, batch_size=batch, shuffle=True,
                         num_workers=2, seed=0)
    val_batches = [jnp.asarray(b) for b, _ in
                   BatchLoader(val_ds, batch_size=4, shuffle=False,
                               num_workers=1)]

    model = create_model(net, maxdisparity=maxd)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   sample_hw=(max(h // 2, 64), max(w // 2, 64)))
    # the reference's coarse-to-fine level-weight curriculum
    # (losses/loss.py:379-391): sweep the 1-hot from the coarsest pyramid
    # level to the finest over the first ``curriculum_steps`` steps —
    # exactly what makes pyramid self-supervision converge (the coarse
    # levels have the wide photometric basin)
    steps_per_ep = max(1, len(train_ds) // batch)
    max_ep = max(1, curriculum_steps // steps_per_ep)
    spec = parse_loss_name(loss_name, model.count_levels, max_ep)
    nedge = 64 if spec.flag_mask else 0
    step = make_selfsup_train_step(model, tx, spec.photo, nedge)
    evstep = make_selfsup_eval_step(model, spec.photo)
    rng = jax.random.PRNGKey(42)

    curve = []
    n = 0
    done = False
    best = float("inf")
    while n < steps and not done:
        for b, _ in loader:
            weights = jnp.asarray(spec.weights(n // steps_per_ep))
            state, m = step(state, jnp.asarray(b), lr, weights, rng)
            n += 1
            if n % eval_every == 0 or n >= steps:
                epes = [float(evstep(state, vb, weights, rng)["epe"])
                        for vb in val_batches]
                epe = float(np.mean(epes))
                best = min(best, epe)
                loss = float(m["loss"])
                curve.append((n, loss, epe))
                print(f"  {net} step {n:4d}  loss {loss:8.4f}  "
                      f"heldout EPE {epe:6.3f}", flush=True)
                if epe < target:
                    done = True
            if n >= steps or done:
                break
    return curve, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default="dispnetcorr,psmnet")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--target", type=float, default=3.0)
    ap.add_argument("--hw", default="192x320")
    ap.add_argument("--maxdisparity", type=int, default=32)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--loss", default="depthmono-mask")
    ap.add_argument("--curriculum", type=int, default=400,
                    help="steps over which the level curriculum sweeps")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    results = {}
    for net in args.nets.split(","):
        print(f"== {net} ({args.loss}) ==", flush=True)
        curve, best = run(net, args.steps, args.target, (h, w),
                          args.maxdisparity, args.lr, args.batch, args.loss,
                          curriculum_steps=args.curriculum)
        final = curve[-1]
        results[net] = {"steps": final[0], "epe": final[2], "best_epe": best,
                        "hit_target": best < args.target}
        print(f"{net}: heldout EPE {final[2]:.3f} (best {best:.3f}) after "
              f"{final[0]} steps "
              f"({'HIT' if best < args.target else 'MISS'} target {args.target})")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
