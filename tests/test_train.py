"""End-to-end training tests on the synthetic dataset.

The strongest test in the suite: a small DispNet must *learn* the
synthetic planar disparity (loss and EPE strictly decrease) through the
full supervised stack, and the self-supervised step must run both
forwards + photometric loss and reduce the loss.  Also covers LR
schedule golden values, checkpoint round-trips, and metric math.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsmnet_tpu.data import BatchLoader, SyntheticStereoDataset
from dsmnet_tpu.data.transforms import eval_transform, supervised_train_transform
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.train import (
    TrainConfig,
    Trainer,
    create_train_state,
    d1_epe,
    load_checkpoint,
    lr_for_epoch,
    make_selfsup_train_step,
    make_supervised_train_step,
    save_checkpoint,
)


def test_lr_schedule_matches_reference():
    # stereo.py:95-101: lr halves every `stride` epochs after epoch0
    assert lr_for_epoch(0, 1e-4, 50, 20) == 1e-4
    assert lr_for_epoch(49, 1e-4, 50, 20) == 1e-4
    assert lr_for_epoch(50, 1e-4, 50, 20) == pytest.approx(5e-5)
    assert lr_for_epoch(69, 1e-4, 50, 20) == pytest.approx(5e-5)
    assert lr_for_epoch(70, 1e-4, 50, 20) == pytest.approx(2.5e-5)


def test_d1_epe_golden():
    gt = np.zeros((1, 4, 4, 1), np.float32)
    gt[0, :, 2:, 0] = 100.0
    pred = np.full((1, 4, 4, 1), 104.0, np.float32)
    d1, epe = jax.device_get(d1_epe(jnp.asarray(pred), jnp.asarray(gt)))
    # diff=4 > 3px but 4/100 < 5% -> good pixels -> d1 = 0
    assert d1 == pytest.approx(0.0)
    assert epe == pytest.approx(4.0)
    pred10 = np.full((1, 4, 4, 1), 110.0, np.float32)
    d1, epe = jax.device_get(d1_epe(jnp.asarray(pred10), jnp.asarray(gt)))
    assert d1 == pytest.approx(100.0)
    assert epe == pytest.approx(10.0)


def _make_supervised_bits(maxdisp=32, hw=(64, 96)):
    model = create_model("dispnet", maxdisparity=maxdisp)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=hw)
    step = make_supervised_train_step(model, tx)
    return model, state, tx, step


def test_supervised_step_learns_synthetic():
    ds = SyntheticStereoDataset(n=4, hw=(64, 96), max_disp=16,
                                transform=eval_transform())
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    model, state, tx, step = _make_supervised_bits()
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))  # past curriculum: full weight on 0

    losses = []
    for it in range(6):
        for batch, _ in loader:
            state, m = step(state, jnp.asarray(batch), 1e-4, weights)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses[0]} -> {losses[-1]}"


def test_selfsup_step_runs_and_improves():
    ds = SyntheticStereoDataset(n=2, hw=(64, 96), max_disp=12, with_gt=True,
                                transform=lambda x: __import__(
                                    "dsmnet_tpu.data.transforms",
                                    fromlist=["to_unit"]).to_unit(x))
    loader = BatchLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    model = create_model("dispnet", maxdisparity=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    spec = parse_loss_name("depthmono", model.count_levels, 1)
    step = make_selfsup_train_step(model, tx, spec.photo, nedge=0)
    weights = jnp.asarray(spec.weights(10))
    rng = jax.random.PRNGKey(7)

    losses = []
    for it in range(8):
        for batch, _ in loader:
            state, m = step(state, jnp.asarray(batch), 1e-4, weights, rng)
            losses.append(float(m["loss"]))
            assert float(m["d1"]) >= 0  # GT channel present
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_selfsup_step_with_mask_and_nedge():
    from dsmnet_tpu.data.transforms import to_unit

    # nedge=64 needs > 128 px each dim; keep single small-ish sample
    ds = SyntheticStereoDataset(n=1, hw=(192, 256), max_disp=12, with_gt=False,
                                transform=to_unit)
    loader = BatchLoader(ds, batch_size=1, num_workers=1)
    model = create_model("dispnet", maxdisparity=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    spec = parse_loss_name("Cap_ds-mask", model.count_levels, 1)
    assert spec.flag_mask
    step = make_selfsup_train_step(model, tx, spec.photo, nedge=64)
    weights = jnp.asarray(spec.weights(10))
    for batch, _ in loader:
        state, m = step(state, jnp.asarray(batch), 1e-4, weights, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        assert float(m["d1"]) == -1.0  # no GT channel


def test_checkpoint_roundtrip(tmp_path):
    model, state, tx, step = _make_supervised_bits()
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, epoch=3, best_prec=1.25, is_best=True)
    template, _ = create_train_state(model, jax.random.PRNGKey(1))
    restored, epoch, best = load_checkpoint(d, template)
    assert epoch == 3 and best == 1.25
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert os.path.exists(os.path.join(d, "model_best.msgpack"))
    assert os.path.exists(os.path.join(d, "weight_best.msgpack"))


def test_trainer_end_to_end(tmp_path):
    from dsmnet_tpu.data.transforms import eval_transform

    cfg = TrainConfig(
        mode="train", epochs=2, net="dispnet", maxdisparity=32,
        loss_name="supervised", lr=1e-4, val_freq=1, print_freq=100,
        batchsize=2, output=str(tmp_path / "out"), dataset="synthetic",
    )
    tr_ds = SyntheticStereoDataset(n=4, hw=(64, 96), max_disp=16,
                                   transform=eval_transform())
    loader = BatchLoader(tr_ds, batch_size=2, num_workers=1)
    t = Trainer(cfg, loader_train=loader, loader_val=loader)
    t.start()
    # history written, checkpoint resumable
    assert os.path.exists(os.path.join(t.dirpath, "loss_history.json"))
    t2 = Trainer(cfg, loader_train=loader, loader_val=loader)
    assert t2.epoch == 2  # resumed past both epochs


def test_trainer_submit(tmp_path):
    from dsmnet_tpu.data.transforms import eval_transform

    cfg = TrainConfig(
        mode="submit", epochs=1, net="dispnet", maxdisparity=32,
        loss_name="supervised", batchsize=1, output=str(tmp_path / "out"),
        dataset="synthetic", flag_model="t",
    )
    ds = SyntheticStereoDataset(n=2, hw=(64, 96), max_disp=16,
                                transform=eval_transform())
    loader = BatchLoader(ds, batch_size=1, num_workers=1)
    t = Trainer(cfg, loader_val=loader)
    out = t.submit(out_dir=str(tmp_path / "submit"))
    assert len(out["filename"]) == 2
    assert os.path.exists(str(tmp_path / "submit" / "synthetic_t" / "synthetic_000000.png"))


def test_trainer_finetune_loads_weights_and_skips_curriculum(tmp_path):
    from dsmnet_tpu.data.transforms import eval_transform

    # first: brief training run produces a weights file
    cfg = TrainConfig(mode="train", epochs=1, net="dispnet", maxdisparity=32,
                      loss_name="supervised", batchsize=2, val_freq=1,
                      print_freq=100, output=str(tmp_path / "out"),
                      dataset="synthetic")
    ds = SyntheticStereoDataset(n=2, hw=(64, 96), max_disp=16,
                                transform=eval_transform())
    loader = BatchLoader(ds, batch_size=2, num_workers=1)
    t = Trainer(cfg, loader_train=loader, loader_val=loader)
    t.start()
    weight_path = os.path.join(t.dirpath, "weight_best.msgpack")
    assert os.path.exists(weight_path)

    cfg_ft = TrainConfig(mode="finetune", epochs=1, net="dispnet",
                         maxdisparity=32, loss_name="supervised", batchsize=2,
                         output=str(tmp_path / "out_ft"), dataset="synthetic",
                         path_weight=weight_path, print_freq=100)
    t2 = Trainer(cfg_ft, loader_train=loader, loader_val=loader)
    # finetune: curriculum disabled -> full weight on the finest level
    w = t2.spec.weights(0)
    assert w[0] == 1.0
    # weights actually loaded
    a = jax.tree_util.tree_leaves(t.state.params)[0]
    b = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_submit_cache(tmp_path):
    from dsmnet_tpu.data.transforms import eval_transform

    cfg = TrainConfig(mode="submit", net="dispnet", maxdisparity=32,
                      loss_name="supervised", batchsize=1,
                      output=str(tmp_path / "o"), dataset="synthetic",
                      flag_model="x")
    ds = SyntheticStereoDataset(n=1, hw=(64, 96), max_disp=16,
                                transform=eval_transform())
    loader = BatchLoader(ds, batch_size=1, num_workers=1)
    t = Trainer(cfg, loader_val=loader)
    out1 = t.submit(out_dir=str(tmp_path / "s"))
    out2 = t.submit(out_dir=str(tmp_path / "s"))  # cached short-circuit
    assert out1["filename"] == out2["filename"]
