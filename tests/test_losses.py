"""Loss-family tests: curriculum, occlusion weights, supervised and
photometric semantics (gradient flow + correct-disparity-minimizes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsmnet_tpu.losses import (
    PhotoLossConfig,
    parse_loss_name,
    photometric_pyramid_loss,
    supervised_pyramid_loss,
    weight_adjust_levels,
    weight_common,
)


# ------------------------------------------------------------- name DSL


def test_parse_loss_names():
    s = parse_loss_name("supervised", 7, 10)
    assert s.supervised and s.photo is None
    s = parse_loss_name("depthmono-mask", 7, 10)
    assert s.photo.kind == "depthmono" and s.photo.flag_mask
    s = parse_loss_name("Cap_ds-mask", 1, 1)
    assert s.photo.kind == "cap" and s.photo.with_ds and not s.photo.with_lr
    s = parse_loss_name("Cap_ds_lr", 1, 1)
    assert s.photo.with_ds and s.photo.with_lr and not s.photo.flag_mask
    s = parse_loss_name("SsSMnet-mask", 7, 10)
    assert s.photo.kind == "sssmnet"
    with pytest.raises(ValueError):
        parse_loss_name("bogus")


# ---------------------------------------------------------- curriculum


def _reference_weight_adjust(epoch, count_level, maxepoch):
    """Literal port of loss.py:379-391 for cross-checking."""
    weight_levels = [0.01] * count_level
    if count_level == 1 or epoch >= maxepoch:
        weight_levels[0] = 1
        return weight_levels
    x = (1 - epoch / float(maxepoch)) * (count_level - 1)
    idx = int(x)
    w = x - idx
    weight_levels[idx] = 1 - w
    if idx < count_level - 1:
        weight_levels[idx + 1] = w
    return weight_levels


@pytest.mark.parametrize("count,maxepoch", [(7, 10), (1, 5), (7, 1)])
def test_weight_adjust_matches_reference(count, maxepoch):
    for epoch in range(0, maxepoch + 2):
        ours = weight_adjust_levels(epoch, count, maxepoch)
        ref = _reference_weight_adjust(epoch, count, maxepoch)
        np.testing.assert_allclose(ours, np.asarray(ref, np.float32), atol=1e-6)


# ------------------------------------------------------ occlusion weight


def test_weight_common_piecewise():
    disp = jnp.asarray(np.array([[0.0, 0.5, 1.0, 2.0, 3.0, 10.0]])[None, ..., None])
    dispw = jnp.zeros_like(disp)
    w = np.asarray(weight_common(disp, dispw, factor=1.0))[0, 0, :, 0]
    # delt = |disp|: <1 -> 1.0 ; [1,3) -> 1-(d-1)*0.495 ; >=3 -> 0.01
    np.testing.assert_allclose(
        w, [1.0, 1.0, 1.0 - 0.0, 1.0 - 0.495, 0.01, 0.01], atol=1e-6
    )


# ------------------------------------------------------------ supervised


def test_supervised_masked_l1():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, :, 4:, 0] = 10.0
    pred = np.full((1, 8, 8, 1), 12.0, np.float32)
    w = jnp.ones((1,))
    loss = supervised_pyramid_loss(
        jnp.asarray(gt), [jnp.asarray(pred)], [0], w, flag_smooth=False
    )
    np.testing.assert_allclose(float(loss), 2.0, atol=1e-5)


def test_supervised_pyramid_upsamples_levels():
    gt = np.full((1, 8, 8, 1), 5.0, np.float32)
    lvl1 = np.full((1, 4, 4, 1), 5.0, np.float32)
    w = jnp.asarray([0.5, 0.5])
    loss = supervised_pyramid_loss(
        jnp.asarray(gt), [jnp.asarray(gt), jnp.asarray(lvl1)], [0, 1], w, False
    )
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-5)


def test_supervised_smoothness_term():
    gt = np.full((1, 8, 8, 1), 5.0, np.float32)
    pred = np.tile(np.arange(8, dtype=np.float32)[None, None, :, None] * 2, (1, 8, 1, 1))
    w = jnp.ones((1,))
    l_plain = supervised_pyramid_loss(jnp.asarray(gt), [jnp.asarray(pred)], [0], w, False)
    l_smooth = supervised_pyramid_loss(jnp.asarray(gt), [jnp.asarray(pred)], [0], w, True)
    assert float(l_smooth) > float(l_plain)


# ----------------------------------------------------------- photometric


def _shifted_pair(rng, h=64, w=96, shift=4):
    """Stereo pair with uniform GT disparity = ``shift`` under the
    reference warp convention imL[x] == imR[x - d]."""
    base = rng.rand(1, h, w + shift, 3).astype(np.float32)
    # smooth it so SSIM is meaningful
    for _ in range(2):
        base[:, 1:-1, 1:-1] = 0.25 * (
            base[:, :-2, 1:-1] + base[:, 2:, 1:-1] + base[:, 1:-1, :-2] + base[:, 1:-1, 2:]
        )
    imL = base[:, :, :w]
    imR = base[:, :, shift:]
    return jnp.asarray(imL), jnp.asarray(imR)


@pytest.mark.parametrize("kind", ["common", "depthmono", "cap", "sssmnet"])
@pytest.mark.parametrize("flag_mask", [False, True])
def test_photometric_correct_disparity_lower_loss(rng, kind, flag_mask):
    cfg = PhotoLossConfig(kind, flag_mask)
    imL, imR = _shifted_pair(rng, shift=4)
    imL1 = jnp.flip(imR, axis=2)  # flipped view: left <-> right swap + mirror
    imR1 = jnp.flip(imL, axis=2)
    h, w = imL.shape[1], imL.shape[2]

    def loss_for(disp_value):
        d0 = jnp.full((1, h, w, 1), disp_value, jnp.float32)
        d1 = jnp.full((1, h // 2, w // 2, 1), disp_value / 2, jnp.float32)
        weights = jnp.asarray([0.6, 0.4])
        return photometric_pyramid_loss(
            cfg, imR, imL, [d0, d1], [0, 1], (0, 0),
            imR1, imL1, [d0, d1], [0, 1], (0, 0), weights, eps=1e-5,
        )

    good = float(loss_for(4.0))
    bad = float(loss_for(12.0))
    assert np.isfinite(good) and np.isfinite(bad)
    assert good < bad


def test_photometric_differentiable(rng):
    cfg = PhotoLossConfig("depthmono", True)
    imL, imR = _shifted_pair(rng, h=32, w=48, shift=2)
    imL1 = jnp.flip(imR, axis=2)
    imR1 = jnp.flip(imL, axis=2)
    h, w = imL.shape[1], imL.shape[2]
    weights = jnp.asarray([1.0])

    def loss(d):
        return photometric_pyramid_loss(
            cfg, imR, imL, [d], [0], (0, 0), imR1, imL1, [d], [0], (0, 0), weights
        )

    d = jnp.full((1, h, w, 1), 2.0)
    g = jax.grad(loss)(d)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)


def test_photometric_levels_above_two_upsampled(rng):
    # a scale-3 output must be upsampled to the scale-2 pyramid level
    cfg = PhotoLossConfig("depthmono", False)
    imL, imR = _shifted_pair(rng, h=64, w=64, shift=2)
    imL1 = jnp.flip(imR, axis=2)
    imR1 = jnp.flip(imL, axis=2)
    weights = jnp.asarray([0.25, 0.25, 0.25, 0.25])
    disps = [jnp.full((1, 64 // 2**s, 64 // 2**s, 1), 2.0 / 2**s) for s in range(4)]
    loss = photometric_pyramid_loss(
        cfg, imR, imL, disps, [0, 1, 2, 3], (0, 0),
        imR1, imL1, disps, [0, 1, 2, 3], (0, 0), weights,
    )
    assert np.isfinite(float(loss))
