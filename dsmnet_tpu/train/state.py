"""Train state, optimizer, LR schedule, checkpoint I/O.

Optimizer matches the reference: Adam(beta1, beta2, eps=1e-8)
(stereo.py:40) with the epoch-keyed step-decay schedule
lr = lr0 * 0.5^(((epoch - epoch0)//stride) + 1) for epoch >= epoch0
(stereo.py:95-101).  The learning rate is passed into the jitted step as
a scalar so the epoch loop can change it without recompiling.

Checkpoints keep the reference's semantics (utils/utils.py:31-53,
stereo.py:73-93): a single atomic file holding
{epoch, best_prec, params, batch_stats, opt_state}, written via
tmp+rename, with a ``model_best`` copy and a weights-only best file.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import flax
import flax.serialization
import jax
import jax.numpy as jnp
import optax

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "lr_for_epoch",
    "save_checkpoint",
    "load_checkpoint",
]


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(beta1: float = 0.9, beta2: float = 0.999):
    """Bias-corrected Adam direction; the step scales by -lr at use site."""
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8)


def create_train_state(model, rng, sample_hw=(64, 96), beta1=0.9, beta2=0.999):
    """Initialize parameters with a dummy forward and build the opt state."""
    h, w = sample_hw
    imL = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(rng, imL, imL, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(beta1, beta2)
    opt_state = tx.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.zeros((), jnp.int32)), tx


def lr_for_epoch(epoch: int, lr0: float, epoch0: int, stride: int) -> float:
    """Step-decay schedule (stereo.py:95-101)."""
    if epoch < epoch0:
        return lr0
    n = (epoch - epoch0) // stride + 1
    return lr0 * (0.5**n)


def _ckpt_paths(dirpath: str):
    return (
        os.path.join(dirpath, "model_checkpoint.msgpack"),
        os.path.join(dirpath, "model_best.msgpack"),
        os.path.join(dirpath, "weight_best.msgpack"),
    )


def save_checkpoint(dirpath: str, state: TrainState, epoch: int, best_prec: float,
                    is_best: bool) -> None:
    """Atomic tmp+rename write; best copies mirror utils/utils.py:31-42."""
    os.makedirs(dirpath, exist_ok=True)
    path, path_best, path_wbest = _ckpt_paths(dirpath)
    payload = {
        "epoch": epoch,
        "best_prec": float(best_prec),
        "state": flax.serialization.to_state_dict(jax.device_get(state)),
    }
    blob = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    shutil.move(tmp, path)
    if is_best:
        shutil.copyfile(path, path_best)
        weights = flax.serialization.msgpack_serialize(
            {"params": flax.serialization.to_state_dict(jax.device_get(state.params))}
        )
        with open(path_wbest + ".tmp", "wb") as f:
            f.write(weights)
        shutil.move(path_wbest + ".tmp", path_wbest)


def load_checkpoint(dirpath: str, template: TrainState, best: bool = False):
    """Returns (state, epoch, best_prec) or None (utils/utils.py:45-53)."""
    path, path_best, _ = _ckpt_paths(dirpath)
    p = path_best if best else path
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    state = flax.serialization.from_state_dict(template, payload["state"])
    return state, int(payload["epoch"]), float(payload["best_prec"])


def load_weights(path: str, params_template):
    """Weights-only restore for --path_weight finetune/test (stereo.py:59-64)."""
    with open(path, "rb") as f:
        payload = flax.serialization.msgpack_restore(f.read())
    return flax.serialization.from_state_dict(params_template, payload["params"])
