"""Model zoo contract tests: shapes, pyramid structure, odd-size inputs.

Mirrors the reference's smoke harness (models/test_models_debug.py:12-20)
which forwards every registry model on odd-sized inputs, plus parameter
and gradient sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsmnet_tpu.models import MODELS, create_model

# small maxdisparity + sizes keep CPU tests quick; cost-volume models
# need maxdisparity divisible by 4
SMALL = dict(maxdisparity=32)


def init_and_run(name, h, w, train=True, **kw):
    model = create_model(name, **SMALL, **kw)
    imL = jnp.asarray(np.random.RandomState(0).rand(1, h, w, 3), jnp.float32)
    imR = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
    out, _ = model.apply(
        variables, imL, imR, train=train,
        mutable=["batch_stats"] if train else [],
    )
    return model, variables, out


@pytest.mark.parametrize("name", sorted(MODELS))
def test_forward_shapes_even(name):
    h, w = 64, 96
    model, variables, (scales, disps) = init_and_run(name, h, w, train=False)
    assert scales[0] == 0
    assert disps[0].shape == (1, h, w, 1)
    for s, d in zip(scales, disps):
        assert d.shape[1] * 2**s >= h and d.shape[2] * 2**s >= w
        assert d.shape[-1] == 1
    assert len(disps) == len(scales)
    assert np.all(np.isfinite(np.asarray(disps[0])))


@pytest.mark.parametrize("name", ["dispnet", "dispnetcorr"])
def test_forward_shapes_odd(name):
    # odd sizes exercise the crop-glue (reference test_models_debug.py uses
    # 257x513); keep it small on CPU
    h, w = 65, 97
    _, _, (scales, disps) = init_and_run(name, h, w, train=False)
    assert disps[0].shape == (1, h, w, 1)


def test_pyramid_levels_dispnet():
    _, _, (scales, disps) = init_and_run("dispnet", 64, 64, train=False)
    assert scales == [0, 1, 2, 3, 4, 5, 6]
    assert disps[1].shape[1] == 32 and disps[6].shape[1] == 1


@pytest.mark.parametrize("name", ["gcnet", "psmnet", "iresnet", "psmnet_basic"])
def test_cost_volume_zoo_odd_size(name):
    """KITTI eval is 375x1242 (odd H) — the cost-volume models take
    different crop/resize paths than the dispnet family and must accept
    odd inputs too (VERDICT r1 weak item 6)."""
    h, w = 49, 67
    _, _, (scales, disps) = init_and_run(name, h, w, train=False)
    assert disps[0].shape == (1, h, w, 1)
    assert np.isfinite(np.asarray(disps[0])).all()


def test_iresnet_refinement_outputs():
    _, _, (scales, disps) = init_and_run("iresnet", 64, 64, train=False)
    # 8 initial levels (6..0) + 3 refinement outputs (2,1,0)
    assert scales == [0, 1, 2, 0, 1, 2, 3, 4, 5, 6]


def test_psmnet_three_heads():
    _, _, (scales, disps) = init_and_run("psmnet", 64, 64, train=True)
    assert scales == [0, 0, 0]
    for d in disps:
        assert d.shape == (1, 64, 64, 1)


def test_gcnet_single_head():
    _, _, (scales, disps) = init_and_run("gcnet", 64, 64, train=False)
    assert scales == [0]
    assert disps[0].shape == (1, 64, 64, 1)
    # soft-argmin output bounded by the (doubled) disparity range
    arr = np.asarray(disps[0])
    assert arr.min() >= 0.0 and arr.max() <= SMALL["maxdisparity"]


def test_clamp_mode():
    _, _, (scales, disps) = init_and_run("dispnet", 64, 64, train=False, )
    model = create_model("dispnet", **SMALL)
    imL = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imL, imL, train=False)
    _, disps = model.apply(variables, imL, imL, train=False, clamp=True)
    assert np.asarray(disps[0]).min() >= 1e-6


def test_dispnet_grad_flows():
    model = create_model("dispnet", **SMALL)
    imL = jnp.ones((1, 64, 64, 3)) * 0.5
    imR = jnp.ones((1, 64, 64, 3)) * 0.4
    variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)

    def loss(params):
        scales, disps = model.apply({"params": params}, imL, imR, train=False)
        return sum(jnp.mean(jnp.abs(d)) for d in disps)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_param_init_statistics():
    # conv kernels follow N(0, sqrt(2/(k*k*out))) (util_conv.py:36-44)
    model = create_model("dispnet", **SMALL)
    imL = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), imL, imL, train=False)
    k = variables["params"]["conv1"]["Conv_0"]["kernel"]  # (7,7,6,64)
    expected = np.sqrt(2.0 / (7 * 7 * 64))
    assert abs(np.std(np.asarray(k)) - expected) / expected < 0.15


def test_gcnet_lr_bidirectional():
    import jax
    from dsmnet_tpu.models.gcnet import GCNetLR

    model = GCNetLR(maxdisparity=16)
    imL = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 3), jnp.float32)
    imR = jnp.asarray(np.random.RandomState(1).rand(1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
    oL, oR = model.apply(variables, imL, imR, train=False)
    assert oL.shape == (1, 32, 64, 1) and oR.shape == (1, 32, 64, 1)
    assert np.all(np.isfinite(np.asarray(oL)))


def test_psmnet_folded_regularizer_equivalent(rng):
    """The folded dense-lane regularizer pathway (ops/folded.py) must
    be a pure re-layout: same param tree, same outputs as the unfolded
    path (on CPU both route to the same lax convs through
    unfold->conv->fold, so agreement is exact up to association)."""
    import jax

    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.ops import config

    model = create_model("psmnet", maxdisparity=16)
    imL = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    imR = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))

    old = config.folded_regularizer
    try:
        config.folded_regularizer = False
        v0 = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
        out0 = model.apply(v0, imL, imR, train=False)[1]
        config.folded_regularizer = True
        v1 = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
        assert jax.tree.map(lambda a: a.shape, v0) == \
            jax.tree.map(lambda a: a.shape, v1), "param tree changed"
        out1 = model.apply(v0, imL, imR, train=False)[1]
    finally:
        config.folded_regularizer = old
    for i, (a, b) in enumerate(zip(out0, out1)):
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-3, (i, err)


def test_gcnet_folded_regularizer_equivalent(rng):
    """GCNet's folded 3-D hourglass pathway (ops/folded.py) is a pure
    re-layout: same param tree, same eval outputs as the unfolded path."""
    import jax

    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.ops import config

    model = create_model("gcnet", maxdisparity=32)
    imL = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    imR = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))

    old = config.folded_regularizer
    try:
        config.folded_regularizer = False
        v0 = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
        out0 = model.apply(v0, imL, imR, train=False)[1][0]
        config.folded_regularizer = True
        v1 = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
        assert jax.tree.map(lambda a: a.shape, v0) == \
            jax.tree.map(lambda a: a.shape, v1), "param tree changed"
        out1 = model.apply(v0, imL, imR, train=False)[1][0]
    finally:
        config.folded_regularizer = old
    err = float(jnp.max(jnp.abs(out0 - out1)))
    assert err < 1e-3, err


def test_gcnet_volume_remat_step_equivalent(rng):
    """GCNet remat=True (volume rebuilt inside the checkpointed l21/l19
    stages, VERDICT r4 task #3) must be a pure memory-schedule change:
    identical param tree, same train-step loss and updated params as the
    non-remat folded path."""
    import jax

    from dsmnet_tpu.losses import parse_loss_name
    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.ops import config
    from dsmnet_tpu.train import create_train_state, make_supervised_train_step

    batch = np.zeros((1, 32, 64, 7), np.float32)
    batch[..., :6] = rng.rand(1, 32, 64, 6)
    batch[..., 6] = rng.rand(1, 32, 64) * 10 + 1
    batch = jnp.asarray(batch)

    old = config.folded_regularizer
    try:
        config.folded_regularizer = True

        from dsmnet_tpu.losses import supervised_pyramid_loss

        def loss_and_grads(remat):
            model = create_model("gcnet", maxdisparity=32, remat=remat)
            state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                          sample_hw=(32, 64))
            spec = parse_loss_name("supervised", model.count_levels, 1)
            weights = jnp.asarray(spec.weights(10))
            imL, imR, gt = batch[..., :3], batch[..., 3:6], batch[..., 6:7]

            def f(params):
                (scales, disps), _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imL, imR, train=True, mutable=["batch_stats"])
                return supervised_pyramid_loss(gt, disps, scales, weights, True)

            return jax.value_and_grad(f)(state.params)

        loss0, g0 = loss_and_grads(False)
        loss1, g1 = loss_and_grads(True)
    finally:
        config.folded_regularizer = old
    assert float(loss1) == pytest.approx(float(loss0), rel=1e-5)
    # compare gradients with a per-leaf relative bound plus an absolute
    # floor: conv biases feeding BatchNorm have mathematically ZERO
    # gradient (BN subtracts the mean), so those leaves are pure fp noise
    # at ~1e-6 and any relative measure on them is meaningless (Adam
    # would likewise amplify them into +-lr sign flips)
    bad = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))) > 1e-5
        and float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-6))
        > 1e-3, g0, g1)
    assert not any(jax.tree.leaves(bad)), "grads diverged beyond fp noise"
