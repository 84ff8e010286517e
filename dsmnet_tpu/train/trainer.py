"""Training drivers — the TPU-native equivalent of stereo.py +
stereo_supervised.py + stereo_selfsupervised.py.

One ``Trainer`` owns model/state/loss/checkpoints and the epoch loop;
the supervised vs self-supervised difference is which jitted step
factory it wires in.  Host-side responsibilities mirror the reference:
per-epoch LR decay, loss level-weight curriculum, periodic validation,
best-D1 checkpointing with auto-resume, loss-history persistence
(json instead of pickle) and an optional training-curve PNG
(stereo.py:190-248).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import LossSpec, parse_loss_name
from ..models import create_model
from .metrics import AverageMeter, d1_epe
from .state import (
    create_train_state,
    load_checkpoint,
    load_weights,
    lr_for_epoch,
    save_checkpoint,
)
from .steps import (
    make_selfsup_eval_step,
    make_selfsup_train_step,
    make_supervised_eval_step,
    make_supervised_train_step,
)

log = logging.getLogger(__name__)

__all__ = ["TrainConfig", "Trainer"]


@dataclasses.dataclass
class TrainConfig:
    """CLI-facing configuration (reference main.py:16-38 argparse flags)."""

    mode: str = "train"  # train | finetune | test | submit
    epochs: int = 150
    net: str = "dispnet"
    maxdisparity: int = 192
    loss_name: str = "supervised"
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    lr_epoch0: int = 50
    lr_stride: int = 20
    val_freq: int = 1
    print_freq: int = 20
    batchsize: int = 1
    output: str = "output"
    dataset: str = "kitti2015-tr"
    dataset_val: str = "kitti2015-tr"
    path_weight: str = ""
    flag_model: str = ""
    seed: int = 0
    plot_curves: bool = False  # matplotlib curve PNG per validation
    dtype: str = "float32"  # computation dtype: float32 | bfloat16
    profile_dir: str = ""  # jax.profiler trace dir (traces steps 10-15)
    remat: bool = False  # rematerialize heavy blocks (trade FLOPs for HBM)


class Trainer:
    """Owns model, optimizer, loss spec, checkpoint dir, and step fns."""

    def __init__(self, cfg: TrainConfig, loader_train=None, loader_val=None,
                 mesh=None):
        self.cfg = cfg
        self.loader_train = loader_train
        self.loader_val = loader_val
        self.mesh = mesh

        model_kwargs = {}
        if cfg.remat:
            from ..models import MODELS

            if any(f.name == "remat" for f in dataclasses.fields(MODELS[cfg.net])):
                model_kwargs["remat"] = True
            else:
                log.warning("--remat requested but %s has no remat support", cfg.net)
        self.model = create_model(cfg.net, cfg.maxdisparity, **model_kwargs)
        # finetune skips the curriculum (stereo.py:46)
        maxepoch_adjust = 0 if cfg.mode == "finetune" else int(cfg.lr_epoch0 * 3 // 4)
        self.spec: LossSpec = parse_loss_name(
            cfg.loss_name, self.model.count_levels, max(maxepoch_adjust, 1)
            if maxepoch_adjust > 0 else 1,
        )
        if cfg.mode == "finetune":
            self.spec = dataclasses.replace(self.spec, maxepoch_weight_adjust=0)

        self.dirpath = os.path.join(
            cfg.output, f"{cfg.mode}_{cfg.dataset}", f"{cfg.net}_{cfg.loss_name}"
        )

        rng = jax.random.PRNGKey(cfg.seed)
        self.state, self.tx = create_train_state(
            self.model, rng, beta1=cfg.beta1, beta2=cfg.beta2
        )
        self.epoch = 0
        self.best_prec = float("inf")
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

        if cfg.path_weight and os.path.exists(cfg.path_weight):
            params = load_weights(cfg.path_weight, self.state.params)
            self.state = self.state.replace(params=params)
            log.info("loaded pretrained weights: %s", cfg.path_weight)

        if cfg.mode in ("train", "finetune"):
            restored = load_checkpoint(self.dirpath, self.state)
            if restored is not None:
                self.state, last_epoch, self.best_prec = restored
                self.epoch = last_epoch + 1
                log.info("resumed checkpoint at epoch %d", self.epoch)

        # mesh-parallel placement: replicate params, shard batches over
        # 'data', optionally shard cost-volume H over 'model'
        self._sharding_ctx = None
        if mesh is not None:
            from ..parallel import ShardingContext, replicate

            self.state = replicate(self.state, mesh)
            spatial = "model" if mesh.shape.get("model", 1) > 1 else None
            self._sharding_ctx = ShardingContext(mesh, "data", spatial)

        nedge = 64 if self.spec.flag_mask else 0
        if self.spec.supervised:
            self._train_step = make_supervised_train_step(self.model, self.tx)
            self._eval_step = make_supervised_eval_step(self.model)
        else:
            self._train_step = make_selfsup_train_step(
                self.model, self.tx, self.spec.photo, nedge
            )
            self._eval_step = make_selfsup_eval_step(self.model, self.spec.photo)

        log.info(
            "[%s] model: %s, loss: %s, resumed epochs: %d",
            cfg.mode, cfg.net, cfg.loss_name, self.epoch,
        )

    # ------------------------------------------------------------- epochs

    def _weights(self, epoch):
        return jnp.asarray(self.spec.weights(epoch))

    def _place_batch(self, batch):
        """Host numpy batch -> device array (sharded over 'data' on a mesh).

        Multi-host: each host supplies its local (local_N, ...) numpy batch
        and the result is one global jax.Array sharded over 'data' across
        the pod (reference obligation SURVEY §2.6 — the commented-out DDP
        at stereo.py:34)."""
        if self.mesh is not None:
            if jax.process_count() > 1:
                from ..parallel.multihost import global_batch_from_host_local

                return global_batch_from_host_local(np.asarray(batch), self.mesh)
            from ..parallel import shard_batch

            return shard_batch(jnp.asarray(batch), self.mesh)
        return jnp.asarray(batch)

    def _ctx(self):
        import contextlib

        stack = contextlib.ExitStack()
        if self._sharding_ctx is not None:
            from ..parallel import activate

            stack.enter_context(activate(self._sharding_ctx))
        if self.cfg.dtype != "float32":
            import jax.numpy as jnp

            from ..models.layers import compute_dtype

            stack.enter_context(compute_dtype(jnp.dtype(self.cfg.dtype)))
        return stack

    def train_epoch(self) -> tuple[float, float, float]:
        cfg = self.cfg
        lr = lr_for_epoch(self.epoch, cfg.lr, cfg.lr_epoch0, cfg.lr_stride)
        weights = self._weights(self.epoch)
        log.info("lr: %.6f | level weights: %s", lr, np.asarray(weights).round(3))

        meters = {k: AverageMeter() for k in ("loss", "d1", "epe", "bt", "dt")}
        t0 = time.time()
        for i, (batch, _names) in enumerate(self.loader_train):
            # profiler window: steps 10-15 of the first profiled epoch
            # (jax.profiler traces viewable in xprof/tensorboard)
            if self.cfg.profile_dir and self.epoch == 0:
                if i == 10:
                    jax.profiler.start_trace(self.cfg.profile_dir)
                elif i == 15:
                    jax.profiler.stop_trace()
            n = batch.shape[0]
            batch = self._place_batch(batch)
            meters["dt"].update(time.time() - t0)
            with self._ctx():
                if self.spec.supervised:
                    self.state, m = self._train_step(self.state, batch, lr, weights)
                else:
                    self.state, m = self._train_step(
                        self.state, batch, lr, weights, self._rng
                    )
            m = jax.device_get(m)
            meters["loss"].update(m["loss"], n)
            if m["d1"] >= 0:
                meters["d1"].update(m["d1"], n)
                meters["epe"].update(m["epe"], n)
            meters["bt"].update(time.time() - t0)
            t0 = time.time()
            if i % cfg.print_freq == 0:
                log.info(
                    "Train: [%d][%d/%d] | Time %.3f (%.3f) | Data %.3f (%.3f) | "
                    "Loss %.4f (%.4f) | D1 %.3f (%.3f) | EPE %.3f (%.3f)",
                    self.epoch, i, len(self.loader_train),
                    meters["bt"].val, meters["bt"].avg,
                    meters["dt"].val, meters["dt"].avg,
                    meters["loss"].val, meters["loss"].avg,
                    meters["d1"].val, meters["d1"].avg,
                    meters["epe"].val, meters["epe"].avg,
                )
        log.info(
            "mean train loss: %.3f | mean D1: %.3f | mean EPE: %.3f",
            meters["loss"].avg, meters["d1"].avg, meters["epe"].avg,
        )
        return meters["loss"].avg, meters["epe"].avg, meters["d1"].avg

    def validate(self) -> tuple[float, float, float]:
        weights = self._weights(max(self.epoch, 0))
        meters = {k: AverageMeter() for k in ("loss", "d1", "epe")}
        for i, (batch, _names) in enumerate(self.loader_val):
            n = batch.shape[0]
            batch = self._place_batch(batch)
            with self._ctx():
                if self.spec.supervised:
                    m = self._eval_step(self.state, batch, weights)
                else:
                    m = self._eval_step(self.state, batch, weights, self._rng)
            m = jax.device_get(m)
            meters["loss"].update(m["loss"], n)
            if m["d1"] >= 0:
                meters["d1"].update(m["d1"], n)
                meters["epe"].update(m["epe"], n)
            if i % self.cfg.print_freq == 0:
                log.info(
                    "Val: [%d][%d/%d] | Loss %.4f (%.4f) | D1 %.3f (%.3f) | "
                    "EPE %.3f (%.3f)",
                    self.epoch, i, len(self.loader_val),
                    meters["loss"].val, meters["loss"].avg,
                    meters["d1"].val, meters["d1"].avg,
                    meters["epe"].val, meters["epe"].avg,
                )
        log.info(
            "mean val loss: %.3f | mean D1: %.3f | mean EPE: %.3f",
            meters["loss"].avg, meters["d1"].avg, meters["epe"].avg,
        )
        return meters["loss"].avg, meters["epe"].avg, meters["d1"].avg

    def start(self) -> None:
        """Epoch loop with validation/checkpoint/history (stereo.py:190-248)."""
        cfg = self.cfg
        if cfg.mode == "test":
            self.validate()
            return

        hist_path = os.path.join(self.dirpath, "loss_history.json")
        hist = {
            "loss": [], "epe": [], "d1": [],
            "epochs_val": [], "loss_val": [], "epe_val": [], "d1_val": [],
        }
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                hist = json.load(f)

        t_start = time.time()
        epoch0 = self.epoch
        for epoch in range(epoch0, cfg.epochs):
            self.epoch = epoch
            mloss, mepe, md1 = self.train_epoch()
            hist["loss"].append(mloss)
            hist["epe"].append(mepe)
            hist["d1"].append(md1)

            if epoch % cfg.val_freq == 0 or epoch == cfg.epochs - 1:
                vloss, vepe, vd1 = self.validate()
                hist["epochs_val"].append(epoch)
                hist["loss_val"].append(vloss)
                hist["epe_val"].append(vepe)
                hist["d1_val"].append(vd1)

                is_best = vd1 < self.best_prec
                self.best_prec = min(vd1, self.best_prec)
                save_checkpoint(self.dirpath, self.state, epoch, self.best_prec, is_best)
                os.makedirs(self.dirpath, exist_ok=True)
                with open(hist_path + ".tmp", "w") as f:
                    json.dump(hist, f)
                os.replace(hist_path + ".tmp", hist_path)
                if cfg.plot_curves:
                    self._plot_curves(hist)

            elapsed = (time.time() - t_start) / 3600.0
            total = elapsed * (cfg.epochs - epoch0) / max(epoch + 1 - epoch0, 1)
            log.info("Progress: %.2f | %.2f (hour)", elapsed, total)

    def _plot_curves(self, hist):
        """3-panel loss/EPE/D1 curve PNG (stereo.py:232-243)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cfg = self.cfg
        fig, axes = plt.subplots(1, 3, figsize=(18, 5))
        for ax, key, label in zip(axes, ("loss", "epe", "d1"), ("Loss", "EPE", "D1")):
            ax.plot(hist[key], label="train")
            ax.plot(hist["epochs_val"], hist[f"{key}_val"], label="val")
            ax.set_xlabel("epoch")
            ax.set_ylabel(label)
            ax.legend()
        fig.savefig(
            f"check_{cfg.mode}_{cfg.dataset}_{cfg.net}_{cfg.loss_name}.png"
        )
        plt.close(fig)

    # ------------------------------------------------------------- submit

    def submit(self, out_dir: str = "submit") -> dict:
        """Inference + PNG export loop (stereo.py:115-187)."""
        cfg = self.cfg
        dirpath = os.path.join(out_dir, f"{cfg.dataset}_{cfg.flag_model}")
        # short-circuit: results already exported (stereo.py:124-137)
        if os.path.exists(dirpath + ".json"):
            with open(dirpath + ".json") as f:
                prior = json.load(f)
            for i, name in enumerate(prior["filename"]):
                if prior["D1"]:
                    log.info("submit(cached): %s | time %.3f D1 %.3f epe %.3f",
                             name, prior["time"][i], prior["D1"][i], prior["epe"][i])
                else:
                    log.info("submit(cached): %s | time %.3f", name, prior["time"][i])
            return prior
        os.makedirs(dirpath, exist_ok=True)
        results = {"filename": [], "time": [], "D1": [], "epe": []}

        import cv2

        weights = self._weights(0)
        t_end = time.time()
        for batch, names in self.loader_val:
            batch = jnp.asarray(batch)
            has_gt = batch.shape[-1] >= 7
            if not has_gt:
                pad = jnp.zeros(batch.shape[:-1] + (1,), batch.dtype)
                batch7 = jnp.concatenate([batch[..., :6], pad], axis=-1)
            else:
                batch7 = batch[..., :7]
            m = self._eval_step(self.state, batch7, weights) if self.spec.supervised \
                else self._eval_step(self.state, batch7, weights, self._rng)
            disp = np.asarray(jax.device_get(m["disp"]))
            results["filename"].append(names[0])
            results["time"].append(time.time() - t_end)
            t_end = time.time()
            if has_gt:
                results["D1"].append(float(m["d1"]))
                results["epe"].append(float(m["epe"]))
                log.info("submit: %s | time %.3f D1 %.3f epe %.3f",
                         names[0], results["time"][-1], results["D1"][-1],
                         results["epe"][-1])
            else:
                log.info("submit: %s | time %.3f", names[0], results["time"][-1])
            out_name = os.path.splitext(names[0])[0] + ".png"
            # KITTI submission convention: uint16 PNG at 1/256 px precision.
            # (The reference wrote the raw float through cv2, silently
            # truncating to uint8 — stereo.py:172-174; fixed here.)
            d16 = np.clip(disp[0, :, :, 0] * 256.0, 0, 65535).astype(np.uint16)
            cv2.imwrite(os.path.join(dirpath, out_name), d16)
        with open(dirpath + ".json", "w") as f:
            json.dump(results, f)
        return results
