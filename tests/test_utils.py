"""Tests for offline evaluation metrics, timing helper, viz, multihost."""

import numpy as np
import pytest

from dsmnet_tpu.parallel import host_shard
from dsmnet_tpu.utils import compute_errors, evaluate_pair, warp_pixel_error


def test_evaluate_pair_golden():
    gt = np.zeros((8, 8), np.float32)
    gt[:, 4:] = 100.0
    pred = np.full((8, 8), 104.0, np.float32)
    d1, epe, pix = evaluate_pair(pred, gt)
    assert d1 == pytest.approx(0.0)  # 4px error but < 5% of 100
    assert epe == pytest.approx(4.0)
    assert pix == -1.0


def test_evaluate_pair_no_gt():
    d1, epe, pix = evaluate_pair(np.ones((4, 4)), None)
    assert (d1, epe, pix) == (-1.0, -1.0, -1.0)


def test_warp_pixel_error_zero_for_perfect_disparity(rng):
    h, w, d = 16, 48, 5
    base = rng.rand(h, w + d, 3).astype(np.float32)
    imL = base[:, :w]
    imR = base[:, d:]
    # imL[x] == imR[x - d]
    err_good = warp_pixel_error(imL, imR, np.full((h, w), float(d)))
    err_bad = warp_pixel_error(imL, imR, np.full((h, w), float(d + 3)))
    assert err_good < 1e-3
    assert err_bad > err_good


def test_compute_errors_golden():
    gt = np.full((10,), 10.0)
    pred = np.full((10,), 12.0)
    abs_rel, sq_rel, rmse, rmse_log, d1, a1, a2, a3 = compute_errors(gt, pred)
    assert abs_rel == pytest.approx(0.2)
    assert sq_rel == pytest.approx(0.4)
    assert rmse == pytest.approx(2.0)
    assert a1 == 1.0  # 12/10 = 1.2 < 1.25
    assert d1 == pytest.approx(0.0)  # 2px < 3px


def test_host_shard_partitions_everything():
    items = list(range(10))
    shards = [host_shard(items, pi, 3) for pi in range(3)]
    assert sorted(sum(shards, [])) == items
    assert {len(s) for s in shards} <= {3, 4}


def test_save_grid(tmp_path, rng):
    from dsmnet_tpu.utils.viz import save_grid

    p = str(tmp_path / "grid.png")
    save_grid(p, rng.rand(8, 8, 3), rng.rand(1, 8, 8, 1))
    import os

    assert os.path.getsize(p) > 0


def test_time_op_cpu_sanity():
    import jax.numpy as jnp

    from dsmnet_tpu.utils import time_op

    x = jnp.ones((256, 256))
    t = time_op(lambda a: a @ a, x, n_small=1, n_big=4, reps=1)
    assert 0 < t < 1.0  # seconds per op, sane on CPU
