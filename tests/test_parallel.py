"""Parallelism tests on the simulated 8-device CPU mesh.

Verifies: DP train step equivalence to single-device (same loss, synced
params), batch/param placement, spatial sharding of the cost volume via
the sharding context, and a (data x model) mesh running a full train
step with both axes active.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dsmnet_tpu import parallel
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.ops import concat_cost_volume
from dsmnet_tpu.train import create_train_state, make_supervised_train_step


def _batch(n, h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    b = rng.rand(n, h, w, 7).astype(np.float32)
    b[..., 6] = b[..., 6] * 10 + 1
    return jnp.asarray(b)


def test_mesh_shapes():
    mesh = parallel.make_mesh()
    assert mesh.devices.size == 8
    mesh2 = parallel.make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        parallel.make_mesh(data=16, model=1)


def test_dp_step_matches_single_device():
    model = create_model("dispnet", maxdisparity=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    batch = _batch(8)

    # single device
    s1, m1 = step(state, batch, 1e-4, weights)

    # data-parallel: shard batch, replicate params (fresh state — the jitted
    # step donates its input state; same PRNGKey -> identical init)
    state2, _ = create_train_state(model, jax.random.PRNGKey(0))
    mesh = parallel.make_mesh(data=8)
    state_r = jax.tree.map(
        lambda x: jax.device_put(x, parallel.replicated_sharding(mesh)), state2
    )
    batch_s = parallel.shard_batch(batch, mesh)
    s2, m2 = step(state_r, batch_s, 1e-4, weights)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-6)


def test_cost_volume_sharding_constraint():
    mesh = parallel.make_mesh(data=2, model=4)
    ctx = parallel.ShardingContext(mesh, data_axis="data", spatial_axis="model")
    fL = jnp.ones((2, 8, 32, 8))
    fR = jnp.ones((2, 8, 32, 8))

    with parallel.activate(ctx):
        @jax.jit
        def build(a, b):
            return concat_cost_volume(a, b, 6, use_pallas=False)

        vol = build(fL, fR)
        assert vol.shape == (2, 6, 8, 32, 16)
        # the constraint must be present in the lowered module: the volume is
        # tiled 2-way on batch (data) and 4-way on H (model) = [2,1,4,1,1]
        txt = build.lower(fL, fR).as_text()
    assert (
        '[{"data"}, {}, {"model"}, {}, {}]' in txt  # shardy representation
        or "devices=[2,1,4,1,1]" in txt  # GSPMD representation
    ), "spatial sharding constraint missing from lowered module"


def test_spatially_sharded_gcnet_step():
    # full GCNet train step with batch on 'data' and cost volume H on 'model'
    mesh = parallel.make_mesh(data=2, model=4)
    model = create_model("gcnet", maxdisparity=16)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(32, 64))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    batch = _batch(2, h=32, w=64)

    ctx = parallel.ShardingContext(mesh, data_axis="data", spatial_axis="model")
    state_r = jax.tree.map(
        lambda x: jax.device_put(x, parallel.replicated_sharding(mesh)), state
    )
    batch_s = jax.device_put(batch, NamedSharding(mesh, P("data")))
    with parallel.activate(ctx):
        s2, m = step(state_r, batch_s, 1e-4, weights)
    assert np.isfinite(float(m["loss"]))


def test_halo_conv2d_matches_unsharded(rng):
    from jax import lax

    from dsmnet_tpu.parallel.halo import halo_conv2d

    mesh = parallel.make_mesh(data=1, model=8)
    x = jnp.asarray(rng.randn(2, 32, 16, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x, k, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=dn)
    out = halo_conv2d(x, k, mesh, axis_name="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_multihost_batch_assembly():
    """global_batch_from_host_local on the CPU mesh (1 process: local =
    global) and the Trainer._place_batch multihost plumbing."""
    from dsmnet_tpu.parallel.multihost import (
        global_batch_from_host_local,
        host_shard,
        shard_dataset_for_host,
    )

    mesh = parallel.make_mesh(data=8)
    b = np.random.RandomState(0).rand(8, 4, 6, 7).astype(np.float32)
    arr = global_batch_from_host_local(b, mesh)
    assert arr.shape == (8, 4, 6, 7)
    np.testing.assert_allclose(np.asarray(arr), b)
    assert arr.sharding.spec == P("data", None, None, None)

    # dataset sharding: strided split of the path lists, in place
    class FakeDS:
        paths_img_left = [f"L{i}" for i in range(10)]
        paths_img_right = [f"R{i}" for i in range(10)]
        paths_disp_left = None
        paths_disp_right = None

    ds = FakeDS()
    import dsmnet_tpu.parallel.multihost as mh

    orig_idx, orig_cnt = jax.process_index, jax.process_count
    try:
        # simulate host 1 of 2
        jax.process_index = lambda: 1
        jax.process_count = lambda: 2
        shard_dataset_for_host(ds)
    finally:
        jax.process_index, jax.process_count = orig_idx, orig_cnt
    assert ds.paths_img_left == ["L1", "L3", "L5", "L7", "L9"]
    assert ds.paths_img_right == ["R1", "R3", "R5", "R7", "R9"]
    assert host_shard(list(range(6)), 0, 3) == [0, 3]


def test_trainer_place_batch_on_mesh(tmp_path):
    from dsmnet_tpu.train import TrainConfig, Trainer

    mesh = parallel.make_mesh(data=8)
    cfg = TrainConfig(mode="train", net="dispnet", maxdisparity=32,
                      output=str(tmp_path / "o"), dataset="synthetic")
    t = Trainer(cfg, mesh=mesh)
    placed = t._place_batch(np.zeros((8, 4, 6, 7), np.float32))
    assert placed.sharding.spec[0] == "data"


def test_halo_conv2d_1x1(rng):
    from jax import lax

    from dsmnet_tpu.parallel.halo import halo_conv2d

    mesh = parallel.make_mesh(data=1, model=4)
    x = jnp.asarray(rng.randn(1, 16, 8, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 3, 5).astype(np.float32))
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    ref = lax.conv_general_dilated(x, k, (1, 1), [(0, 0), (0, 0)],
                                   dimension_numbers=dn)
    out = halo_conv2d(x, k, mesh, axis_name="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)
