"""Jitted train/eval steps for supervised and self-supervised training.

Everything per-step runs inside one ``jax.jit``: the forward pass(es),
loss, backward, Adam update — and for the self-supervised path also the
horizontal flip, border crop, color augmentation, and all four warps per
pyramid level (the reference does these on CPU / as separate CUDA ops:
stereo_selfsupervised.py:44-95).  The self-supervised step folds the
reference's two weight-shared forward passes (original + flipped pair)
into a single differentiated graph.

Donated state buffers let XLA update parameters in place.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..losses import (
    PhotoLossConfig,
    photometric_pyramid_loss,
    supervised_pyramid_loss,
)
from .color_aug import color_augment_batch
from .metrics import d1_epe
from .state import TrainState

__all__ = [
    "make_supervised_train_step",
    "make_supervised_eval_step",
    "make_selfsup_train_step",
    "make_selfsup_eval_step",
]


def _variables(state: TrainState):
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


def _apply(model, params, batch_stats, imL, imR, train):
    """Forward with BN mutation threaded through explicitly."""
    variables = {"params": params}
    has_bn = bool(batch_stats)
    if has_bn:
        variables["batch_stats"] = batch_stats
    if train and has_bn:
        out, mut = model.apply(variables, imL, imR, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]
    out = model.apply(variables, imL, imR, train=train)
    return out, batch_stats


def make_supervised_train_step(model, tx, flag_smooth: bool = True):
    """Supervised step (stereo_supervised.py:43-119): split the 7-channel
    batch, forward, pyramid loss, Adam, D1/EPE on the full-res output."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, lr, weights):
        imL, imR, dispL = batch[..., :3], batch[..., 3:6], batch[..., 6:7]

        def loss_fn(params):
            (scales, disps), new_bs = _apply(model, params, state.batch_stats, imL, imR, True)
            loss = supervised_pyramid_loss(dispL, disps, scales, weights, flag_smooth)
            return loss, (disps[0], new_bs)

        (loss, (d0, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        d1, epe = d1_epe(d0, dispL)
        new_state = TrainState(params, new_bs, new_opt, state.step + 1)
        return new_state, {"loss": loss, "d1": d1, "epe": epe}

    return step


def make_supervised_eval_step(model, flag_smooth: bool = True):
    """Eval mirrors validate() (stereo_supervised.py:121-186): BN in
    inference mode, loss + D1/EPE, returns the full-res disparity."""

    @jax.jit
    def step(state: TrainState, batch, weights):
        imL, imR, dispL = batch[..., :3], batch[..., 3:6], batch[..., 6:7]
        (scales, disps), _ = _apply(model, state.params, state.batch_stats, imL, imR, False)
        loss = supervised_pyramid_loss(dispL, disps, scales, weights, flag_smooth)
        d1, epe = d1_epe(disps[0], dispL)
        return {"loss": loss, "d1": d1, "epe": epe, "disp": disps[0]}

    return step


def _selfsup_views(batch, nedge: int, rng, jitter: bool):
    """Flip / crop / color-augment plumbing shared by train and eval
    (stereo_selfsupervised.py:59-95)."""
    h, w = batch.shape[1], batch.shape[2]
    batch1 = jnp.flip(batch, axis=2)
    he, we = h - nedge, w - nedge
    crop = batch[:, nedge:he, nedge:we, :6]
    batch_aug = color_augment_batch(rng, crop, jitter=jitter)
    batch1_aug = jnp.flip(batch_aug, axis=2)
    views = {
        # model inputs (augmented + normalized)
        "imL_pre": batch_aug[..., :3],
        "imR_pre": batch_aug[..., 3:6],
        "imL1_pre": batch1_aug[..., 3:6],
        "imR1_pre": batch1_aug[..., :3],
        # loss inputs ([0,1] raw)
        "imL": batch[:, nedge:he, nedge:we, :3],
        "imR_src": batch[..., 3:6],
        "imL1": batch1[:, nedge:he, nedge:we, 3:6],
        "imR1_src": batch1[..., :3],
    }
    if batch.shape[-1] >= 7:
        views["dispL"] = batch[:, nedge:he, nedge:we, 6:7]
    return views


def make_selfsup_train_step(model, tx, cfg: PhotoLossConfig, nedge: int):
    """Self-supervised step: double forward + photometric pyramid loss.

    ``nedge`` is 64 when occlusion masking is on (the crop border lets
    warps sample real content outside the window;
    stereo_selfsupervised.py:60,85-95)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, lr, weights, rng):
        k_aug, k_eps = jax.random.split(jax.random.fold_in(rng, state.step))
        v = _selfsup_views(batch, nedge, k_aug, jitter=True)
        eps = 1e-4 * (jax.random.uniform(k_eps) + 0.1)  # imwrap.py:70

        def loss_fn(params):
            (scales, disps), bs1 = _apply(
                model, params, state.batch_stats, v["imL_pre"], v["imR_pre"], True
            )
            (scales1, disps1), bs2 = _apply(
                model, params, bs1, v["imL1_pre"], v["imR1_pre"], True
            )
            loss = photometric_pyramid_loss(
                cfg,
                v["imR_src"], v["imL"], disps, scales, (nedge, nedge),
                v["imR1_src"], v["imL1"], disps1, scales1, (nedge, nedge),
                weights, eps=eps,
            )
            return loss, (disps[0], bs2)

        (loss, (d0, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)

        if "dispL" in v:
            d1, epe = d1_epe(d0, v["dispL"])
        else:
            d1 = epe = jnp.asarray(-1.0)
        new_state = TrainState(params, new_bs, new_opt, state.step + 1)
        return new_state, {"loss": loss, "d1": d1, "epe": epe}

    return step


def make_selfsup_eval_step(model, cfg: PhotoLossConfig):
    """Validation (stereo_selfsupervised.py:148-241): normalize only (no
    jitter), nedge=0, loss + optional D1/EPE."""

    @jax.jit
    def step(state: TrainState, batch, weights, rng):
        v = _selfsup_views(batch, 0, rng, jitter=False)
        (scales, disps), _ = _apply(
            model, state.params, state.batch_stats, v["imL_pre"], v["imR_pre"], False
        )
        (scales1, disps1), _ = _apply(
            model, state.params, state.batch_stats, v["imL1_pre"], v["imR1_pre"], False
        )
        loss = photometric_pyramid_loss(
            cfg,
            v["imR_src"], v["imL"], disps, scales, (0, 0),
            v["imR1_src"], v["imL1"], disps1, scales1, (0, 0),
            weights,
        )
        if "dispL" in v:
            d1, epe = d1_epe(disps[0], v["dispL"])
        else:
            d1 = epe = jnp.asarray(-1.0)
        return {"loss": loss, "d1": d1, "epe": epe, "disp": disps[0]}

    return step
