"""Golden tests for the core ops against torch (CPU) and hand references.

The torch cross-checks pin our NHWC/JAX implementations to the exact
numerical semantics the reference relied on (align-corners upsampling,
grid_sample zero padding, SSIM window math, Corr1d shift rules).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dsmnet_tpu.ops import (
    concat_cost_volume,
    concat_cost_volume_reference,
    corr1d,
    corr1d_reference,
    c_ds1,
    c_ds2,
    c_ds3,
    diff1_dx,
    diff1_dy,
    imwarp,
    resize_bilinear,
    resize_trilinear,
    soft_argmin,
    ssim_map,
    upsample2x,
)


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------- resize


@pytest.mark.parametrize("hw", [(6, 9), (17, 13)])
def test_upsample2x_matches_torch_align_corners(rng, hw):
    h, w = hw
    x = rng.randn(2, h, w, 3).astype(np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x)))
    theirs = F.interpolate(
        torch.from_numpy(to_nchw(x)), scale_factor=2, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_resize_bilinear_matches_torch(rng):
    x = rng.randn(1, 5, 7, 2).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (20, 28)))
    theirs = F.interpolate(
        torch.from_numpy(to_nchw(x)), size=(20, 28), mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_resize_trilinear_matches_torch(rng):
    x = rng.randn(1, 4, 5, 6, 1).astype(np.float32)
    ours = np.asarray(resize_trilinear(jnp.asarray(x), (12, 20, 24)))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    theirs = F.interpolate(xt, size=(12, 20, 24), mode="trilinear", align_corners=True).numpy()
    np.testing.assert_allclose(
        ours, np.transpose(theirs, (0, 2, 3, 4, 1)), rtol=1e-5, atol=1e-5
    )


# ---------------------------------------------------------------- warp


def _torch_imwrap(im_src, disp, fliplr=False, left_top=(0, 0), scale_factor=1):
    """Literal re-derivation of reference utils/imwrap.py:37-72 (no eps)."""
    bn, _, h0, w0 = im_src.shape
    bn, c, h, w = disp.shape
    x, y = left_top
    x = x * 2.0 / (w0 - 1) - 1
    y = y * 2.0 / (h0 - 1) - 1
    x1 = x + (w - 1) * scale_factor * 2.0 / (w0 - 1)
    y1 = y + (h - 1) * scale_factor * 2.0 / (h0 - 1)
    row = torch.linspace(x, x1, w)
    col = torch.linspace(y, y1, h)
    grid = torch.zeros(bn, h, w, 2)
    grid[:, :, :, 0] = row.view(1, 1, w)
    grid[:, :, :, 1] = col.view(1, h, 1)
    k = -1.0 if fliplr else 1.0
    grid[:, :, :, 0] = k * (grid[:, :, :, 0] - disp.squeeze(1) * 2.0 / (w0 - 1))
    return F.grid_sample(im_src, grid, padding_mode="zeros", align_corners=True)


@pytest.mark.parametrize("fliplr", [False, True])
@pytest.mark.parametrize("left_top,scale", [((0, 0), 1), ((3, 2), 1), ((4, 4), 2)])
def test_imwarp_matches_torch_grid_sample(rng, fliplr, left_top, scale):
    h0, w0 = 24, 32
    h, w = 10, 12
    im = rng.rand(2, h0, w0, 3).astype(np.float32)
    disp = (rng.rand(2, h, w, 1) * 6 - 1).astype(np.float32)
    ours = np.asarray(
        imwarp(jnp.asarray(im), jnp.asarray(disp), fliplr=fliplr, left_top=left_top,
               scale_factor=scale, eps=0.0)
    )
    theirs = _torch_imwrap(
        torch.from_numpy(to_nchw(im)),
        torch.from_numpy(np.transpose(disp, (0, 3, 1, 2))),
        fliplr=fliplr,
        left_top=left_top,
        scale_factor=scale,
    ).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_imwarp_shifts_columns(rng):
    # constant disparity k shifts the image right by k: out[x] = src[x-k]
    im = rng.rand(1, 4, 16, 1).astype(np.float32)
    disp = np.full((1, 4, 16, 1), 3.0, np.float32)
    out = np.asarray(imwarp(jnp.asarray(im), jnp.asarray(disp), eps=0.0))
    np.testing.assert_allclose(out[:, :, 3:, :], im[:, :, :-3, :], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, :, :3, :], 0.0, atol=1e-6)


def test_imwarp_differentiable():
    im = jnp.ones((1, 6, 8, 1))
    disp = jnp.full((1, 6, 8, 1), 1.5)
    g = jax.grad(lambda d: jnp.sum(imwarp(im, d, eps=0.0)))(disp)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- ssim


def _torch_ssim_ref(img1, img2, window_size=11):
    """Reference losses/SSIM.py:24-42 (_ssim with window/channel, groups=1)."""
    from math import exp

    channel = img1.shape[1]
    gauss = torch.tensor(
        [exp(-((x - window_size // 2) ** 2) / (2 * 1.5**2)) for x in range(window_size)]
    )
    gauss = (gauss / gauss.sum()).float()
    _2d = gauss.unsqueeze(1).mm(gauss.unsqueeze(0)).unsqueeze(0).unsqueeze(0)
    window = _2d.expand(channel, 1, window_size, window_size).contiguous()
    window = window.transpose(0, 1) / channel
    pad = window_size // 2
    mu1 = F.conv2d(img1, window, padding=pad, groups=1)
    mu2 = F.conv2d(img2, window, padding=pad, groups=1)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=pad, groups=1) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=pad, groups=1) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=pad, groups=1) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def test_ssim_matches_reference(rng):
    a = rng.rand(1, 20, 24, 3).astype(np.float32)
    b = np.clip(a + 0.05 * rng.randn(1, 20, 24, 3).astype(np.float32), 0, 1)
    ours = np.asarray(ssim_map(jnp.asarray(a), jnp.asarray(b)))
    theirs = _torch_ssim_ref(
        torch.from_numpy(to_nchw(a)), torch.from_numpy(to_nchw(b))
    ).numpy()
    assert theirs.shape[1] == 1
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-4, atol=1e-5)


def test_ssim_identity_is_one(rng):
    a = rng.rand(1, 16, 16, 3).astype(np.float32)
    m = np.asarray(ssim_map(jnp.asarray(a), jnp.asarray(a)))
    # interior should be ~1 (borders too: identical images)
    assert m.min() > 0.99


# ---------------------------------------------------------------- corr1d


def _torch_corr1d(fL, fR, D, stride=1, kernel_size=1):
    """Reference models/util_conv.py:56-86 (Corr1d.forward)."""
    bn, c, h, w = fL.shape
    corrmap = torch.zeros(bn, D, h, w)
    corrmap[:, 0] = (fL * fR).sum(dim=1)
    for i in range(1, D):
        if i >= w:
            break
        idx = i * stride
        if idx >= w:
            continue
        corrmap[:, i, :, idx:] = (fL[:, :, :, idx:] * fR[:, :, :, :-idx]).sum(dim=1)
    if kernel_size > 1:
        corrmap = torch.nn.AvgPool2d(kernel_size, stride=1, padding=kernel_size // 2)(corrmap)
    return corrmap


@pytest.mark.parametrize("D,stride,k", [(8, 1, 1), (11, 2, 1), (5, 1, 3), (40, 1, 1)])
def test_corr1d_reference_matches_torch(rng, D, stride, k):
    fL = rng.randn(2, 6, 32, 16).astype(np.float32)  # N,H,W,C
    fR = rng.randn(2, 6, 32, 16).astype(np.float32)
    ours = np.asarray(corr1d(jnp.asarray(fL), jnp.asarray(fR), D, stride, k, use_pallas=False))
    theirs = _torch_corr1d(
        torch.from_numpy(to_nchw(fL)), torch.from_numpy(to_nchw(fR)), D, stride, k
    ).numpy()
    np.testing.assert_allclose(ours, to_nhwc(theirs), rtol=1e-4, atol=1e-4)


def test_corr1d_custom_simfun_cosine(rng):
    """The reference Corr1d accepts a pluggable similarity
    (util_conv.py:64-66); check a cosine simfun against numpy."""
    fL = rng.randn(1, 4, 12, 8).astype(np.float32)
    fR = rng.randn(1, 4, 12, 8).astype(np.float32)

    def cosine(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
        return num / den

    out = np.asarray(corr1d(jnp.asarray(fL), jnp.asarray(fR), 5, simfun=cosine))
    # numpy golden
    want = np.zeros((1, 4, 12, 5), np.float32)
    for d in range(5):
        a = fL[:, :, d:, :]
        b = fR[:, :, : 12 - d if d else None, :]
        s = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-8
        )
        want[:, :, d:, d] = s
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_corr1d_pallas_interpret_matches_reference(rng):
    fL = jnp.asarray(rng.randn(1, 8, 32, 16).astype(np.float32))
    fR = jnp.asarray(rng.randn(1, 8, 32, 16).astype(np.float32))
    ref = corr1d_reference(fL, fR, 9, 1)
    out = corr1d(fL, fR, 9, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_corr1d_pallas_grad_matches_reference(rng):
    fL = jnp.asarray(rng.randn(1, 4, 16, 8).astype(np.float32))
    fR = jnp.asarray(rng.randn(1, 4, 16, 8).astype(np.float32))

    def loss_p(a, b):
        return jnp.sum(corr1d(a, b, 5, use_pallas=True, interpret=True) ** 2)

    def loss_r(a, b):
        return jnp.sum(corr1d(a, b, 5, use_pallas=False) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(fL, fR)
    gr = jax.grad(loss_r, argnums=(0, 1))(fL, fR)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- cost volume


def _torch_cost_volume(fL, fR, D, mask_left=True):
    """Reference psmnet/stackhourglass.py:124-133 / gcnet.py:131-135."""
    n, f, h, w = fL.shape
    cost = torch.zeros(n, 2 * f, D, h, w)
    for i in range(D):
        if i > 0:
            if mask_left:
                cost[:, :f, i, :, i:] = fL[:, :, :, i:]
            else:
                cost[:, :f, i] = fL
            cost[:, f:, i, :, i:] = fR[:, :, :, :-i]
        else:
            cost[:, :f, i] = fL
            cost[:, f:, i] = fR
    return cost


@pytest.mark.parametrize("mask_left", [True, False])
def test_cost_volume_reference_matches_torch(rng, mask_left):
    fL = rng.randn(1, 6, 20, 8).astype(np.float32)
    fR = rng.randn(1, 6, 20, 8).astype(np.float32)
    ours = np.asarray(
        concat_cost_volume(jnp.asarray(fL), jnp.asarray(fR), 7, mask_left, use_pallas=False)
    )
    theirs = _torch_cost_volume(
        torch.from_numpy(to_nchw(fL)), torch.from_numpy(to_nchw(fR)), 7, mask_left
    ).numpy()
    # theirs: (N, 2F, D, H, W) -> (N, D, H, W, 2F)
    theirs = np.transpose(theirs, (0, 2, 3, 4, 1))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mask_left", [True, False])
def test_cost_volume_pallas_interpret_matches_reference(rng, mask_left):
    fL = jnp.asarray(rng.randn(1, 8, 24, 8).astype(np.float32))
    fR = jnp.asarray(rng.randn(1, 8, 24, 8).astype(np.float32))
    ref = concat_cost_volume_reference(fL, fR, 6, mask_left)
    out = concat_cost_volume(fL, fR, 6, mask_left, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_cost_volume_pallas_grad_matches_reference(rng):
    fL = jnp.asarray(rng.randn(1, 4, 16, 4).astype(np.float32))
    fR = jnp.asarray(rng.randn(1, 4, 16, 4).astype(np.float32))

    def loss(a, b, use_pallas):
        cv = concat_cost_volume(a, b, 5, True, use_pallas=use_pallas, interpret=True)
        return jnp.sum(cv * cv)

    gp = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(fL, fR)
    gr = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(fL, fR)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- soft argmin


def test_soft_argmin_peaks_at_min_cost(rng):
    n, d, h, w = 1, 16, 4, 4
    target = rng.randint(0, d, size=(n, h, w))
    cost = np.ones((n, d, h, w), np.float32) * 50.0
    for i in range(h):
        for j in range(w):
            cost[0, target[0, i, j], i, j] = 0.0
    out = np.asarray(soft_argmin(jnp.asarray(cost), negate=True))
    np.testing.assert_allclose(out[0, :, :, 0], target[0], atol=1e-2)


def test_soft_argmin_matches_torch_softmax_expectation(rng):
    cost = rng.randn(2, 12, 5, 6).astype(np.float32)
    ours = np.asarray(soft_argmin(jnp.asarray(cost), negate=False))
    p = torch.softmax(torch.from_numpy(cost), dim=1)
    dvals = torch.arange(12).float()
    theirs = torch.einsum("ndhw,d->nhw", p, dvals).numpy()[..., None]
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- gradients


def test_diff1_matches_torch_pad(rng):
    x = rng.randn(1, 5, 7, 3).astype(np.float32)
    xt = torch.from_numpy(to_nchw(x))
    dx_ref = F.pad(xt[:, :, :, 1:] - xt[:, :, :, :-1], [0, 1, 0, 0]).numpy()
    dy_ref = F.pad(xt[:, :, 1:] - xt[:, :, :-1], [0, 0, 0, 1]).numpy()
    np.testing.assert_allclose(np.asarray(diff1_dx(jnp.asarray(x))), to_nhwc(dx_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(diff1_dy(jnp.asarray(x))), to_nhwc(dy_ref), atol=1e-6)


def test_smoothness_terms_finite_and_shaped(rng):
    img = jnp.asarray(rng.rand(2, 12, 14, 3).astype(np.float32))
    disp = jnp.asarray(rng.rand(2, 12, 14, 1).astype(np.float32) * 20)
    for fn in (c_ds1, c_ds2, c_ds3):
        out = fn(img, disp)
        assert out.shape == (2, 12, 14, 1)
        assert np.all(np.isfinite(np.asarray(out)))


# ------------------------------------------------------- fused costvol+conv


@pytest.mark.parametrize("mask_left", [True, False])
def test_fused_costvol_conv_matches_composition(rng, mask_left):
    from dsmnet_tpu.ops.fused_costvol import (
        cost_volume_conv3x3,
        cost_volume_conv3x3_reference,
    )

    fL = jnp.asarray(rng.randn(2, 8, 12, 4).astype(np.float32))
    fR = jnp.asarray(rng.randn(2, 8, 12, 4).astype(np.float32))
    K = jnp.asarray(rng.randn(3, 3, 3, 8, 5).astype(np.float32) * 0.1)
    ref = cost_volume_conv3x3_reference(fL, fR, K, 6, mask_left)
    out_j = cost_volume_conv3x3(fL, fR, K, 6, mask_left, use_pallas=False)
    out_p = cost_volume_conv3x3(fL, fR, K, 6, mask_left, use_pallas=True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref), atol=1e-5)


def test_fused_costvol_conv_gradients(rng):
    from dsmnet_tpu.ops.fused_costvol import cost_volume_conv3x3

    fL = jnp.asarray(rng.randn(1, 4, 8, 4).astype(np.float32))
    fR = jnp.asarray(rng.randn(1, 4, 8, 4).astype(np.float32))
    K = jnp.asarray(rng.randn(3, 3, 3, 8, 3).astype(np.float32) * 0.1)

    def loss(up):
        return lambda a, b, k: jnp.sum(
            cost_volume_conv3x3(a, b, k, 6, True, use_pallas=up, interpret=True) ** 2
        )

    gp = jax.grad(loss(True), argnums=(0, 1, 2))(fL, fR, K)
    gr = jax.grad(loss(False), argnums=(0, 1, 2))(fL, fR, K)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_psmnet_fused_stem_equivalent(rng):
    """PSMNet with the fused stem must match the unfused composition when
    given the same parameters."""
    import jax as _jax

    from dsmnet_tpu.models import create_model

    imL = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    imR = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    fused = create_model("psmnet", maxdisparity=32, fused_stem=True)
    plain = create_model("psmnet", maxdisparity=32, fused_stem=False)
    vf = fused.init(_jax.random.PRNGKey(0), imL, imR, train=False)
    vp = _jax.tree_util.tree_map(lambda x: x, plain.init(_jax.random.PRNGKey(0), imL, imR, train=False))
    # graft the fused kernel + BN into the plain structure
    vp["params"]["dres0_0"]["Conv_0"]["kernel"] = vf["params"]["dres0_0"]["kernel"]
    vp["params"]["dres0_0"]["BatchNorm_0"] = vf["params"]["dres0_0"]["BatchNorm_0"]
    _, df = fused.apply(vf, imL, imR, train=False)
    _, dp = plain.apply(vp, imL, imR, train=False)
    # float association through 3 hourglasses + softmax expectation leaves
    # sub-0.01px noise on the regressed disparity
    diff = np.abs(np.asarray(df[0]) - np.asarray(dp[0]))
    assert diff.max() < 0.05 and diff.mean() < 1e-4, (diff.max(), diff.mean())


def test_trilinear_soft_argmin_exact(rng):
    from dsmnet_tpu.ops import resize_trilinear, soft_argmin
    from dsmnet_tpu.ops.regression import trilinear_soft_argmin

    cost = jnp.asarray(rng.randn(2, 8, 6, 10, 1).astype(np.float32))
    ref = soft_argmin(resize_trilinear(cost, (32, 24, 40))[..., 0], negate=False)
    for chunk in (8, 3, 24):
        out = trilinear_soft_argmin(cost, (32, 24, 40), h_chunk=chunk)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_conv3d_same_matches_lax(rng):
    from jax import lax

    from dsmnet_tpu.ops.conv3d import conv3d_same

    x = jnp.asarray(rng.randn(2, 6, 8, 10, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 5).astype(np.float32) * 0.2)
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
    ref = lax.conv_general_dilated(x, k, (1, 1, 1), [(1, 1)] * 3,
                                   dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(conv3d_same(x, k)), np.asarray(ref),
                               atol=1e-5)

    def l_ref(x, k):
        return jnp.sum(lax.conv_general_dilated(
            x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn) ** 3)

    def l_our(x, k):
        return jnp.sum(conv3d_same(x, k) ** 3)

    gr = jax.grad(l_ref, argnums=(0, 1))(x, k)
    go = jax.grad(l_our, argnums=(0, 1))(x, k)
    for a, b in zip(gr, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3)


def test_conv3d_kwfold_matches_native(rng):
    """kw-fold-into-Cout formulation is exact (ops/conv3d.py)."""
    from dsmnet_tpu.ops import config
    from dsmnet_tpu.ops.conv3d import conv3d_same

    x = jnp.asarray(rng.randn(1, 5, 7, 11, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2)
    old = config.conv3d_impl
    try:
        config.conv3d_impl = "native"
        ref = conv3d_same(x, k)
        g_ref = jax.grad(lambda a, b: jnp.sum(conv3d_same(a, b) ** 2),
                         argnums=(0, 1))(x, k)
        config.conv3d_impl = "kwfold"
        out = conv3d_same(x, k)
        g_out = jax.grad(lambda a, b: jnp.sum(conv3d_same(a, b) ** 2),
                         argnums=(0, 1))(x, k)
    finally:
        config.conv3d_impl = old
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    for a, b in zip(g_ref, g_out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3)


def test_stem_manual_backward_matches_autodiff(rng):
    """Scatter-free manual VJP of the fused volume+conv equals autodiff
    of the raw decomposition (ops/fused_costvol.py _stem_bwd)."""
    from dsmnet_tpu.ops.fused_costvol import _stem_bwd, cost_volume_conv3x3_raw

    for (n, h, w, f, o, D, ml) in [(1, 6, 12, 4, 5, 6, True),
                                   (2, 5, 10, 3, 4, 5, False)]:
        fL = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))
        fR = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))
        K = jnp.asarray(rng.randn(3, 3, 3, 2 * f, o).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(n, D, h, w, o).astype(np.float32))

        def loss(a, b, k):
            return jnp.sum(cost_volume_conv3x3_raw(a, b, k, D, ml) * g)

        ref = jax.grad(loss, argnums=(0, 1, 2))(fL, fR, K)
        man = _stem_bwd(fL, fR, K, D, ml, g)
        for r, m in zip(ref, man):
            np.testing.assert_allclose(np.asarray(m), np.asarray(r),
                                       rtol=1e-4, atol=1e-4)


def test_conv3d_pallas_kernels_interpret(rng):
    """Folded-lane Pallas conv3d fwd + dK match lax / per-tap exactly
    (interpret mode; the real-TPU path is measured in PERF.md)."""
    from jax import lax

    from dsmnet_tpu.ops.conv3d import _dk_pertap
    from dsmnet_tpu.ops.conv3d_pallas import conv3d_dk_pallas, conv3d_fwd_pallas

    for shape, co in [((1, 6, 8, 16, 32), 32), ((2, 4, 8, 8, 64), 32),
                      ((1, 4, 8, 8, 128), 128)]:
        ci = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(*shape[:-1], co).astype(np.float32))
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
        ref = lax.conv_general_dilated(x, k, (1, 1, 1), [(1, 1)] * 3,
                                       dimension_numbers=dn)
        out = conv3d_fwd_pallas(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
        dk = conv3d_dk_pallas(x, g, interpret=True)
        np.testing.assert_allclose(np.asarray(dk),
                                   np.asarray(_dk_pertap(x, g, 3, 3, 3)),
                                   rtol=1e-4, atol=1e-3)


def test_conv3d_s2_s2d_matches_native(rng):
    """Space-to-depth stride-2 conv (+ custom VJP) equals the native
    strided conv and its autodiff (ops/conv3d.py conv3d_s2)."""
    from dsmnet_tpu.ops.conv3d import _conv_s2_native, _conv_s2_s2d, conv3d_s2

    x = jnp.asarray(rng.randn(2, 4, 6, 8, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 3).astype(np.float32) * 0.2)
    np.testing.assert_allclose(np.asarray(_conv_s2_s2d(x, k)),
                               np.asarray(_conv_s2_native(x, k)),
                               rtol=1e-5, atol=1e-5)

    gr = jax.grad(lambda a, b: jnp.sum(_conv_s2_native(a, b) ** 3),
                  argnums=(0, 1))(x, k)
    go = jax.grad(lambda a, b: jnp.sum(conv3d_s2(a, b) ** 3),
                  argnums=(0, 1))(x, k)
    for a, b in zip(gr, go):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-3)


def test_conv3d_dk_ntap_matches_pertap(rng):
    """Tiny-Cout taps-on-N kernel gradient is exact (used for Co<8,
    e.g. the PSMNet classifier's 1-channel head)."""
    from dsmnet_tpu.ops.conv3d import _dk_ntap, _dk_pertap

    x = jnp.asarray(rng.randint(-3, 4, (2, 5, 6, 7, 16)).astype(np.float32))
    g = jnp.asarray(rng.randint(-3, 4, (2, 5, 6, 7, 1)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(_dk_ntap(x, g, 3, 3, 3)),
                                  np.asarray(_dk_pertap(x, g, 3, 3, 3)))


def test_deconv3d_parity_matches_native(rng):
    """Parity-folded transposed conv is exact, incl. odd input sizes and
    gradients (ops/conv3d.py deconv3d_k3s2)."""
    from dsmnet_tpu.ops import config
    from dsmnet_tpu.ops.conv3d import _deconv_native, _deconv_parity

    for shape in [(1, 4, 6, 8, 5), (2, 3, 5, 7, 4)]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 6, shape[-1]).astype(np.float32) * 0.2)
        ref = _deconv_native(x, k)
        out = _deconv_parity(x, k)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
        g_ref = jax.grad(lambda a, b: jnp.sum(_deconv_native(a, b) ** 2),
                         argnums=(0, 1))(x, k)
        g_out = jax.grad(lambda a, b: jnp.sum(_deconv_parity(a, b) ** 2),
                         argnums=(0, 1))(x, k)
        for a, b in zip(g_ref, g_out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                       atol=1e-3)


def test_psmnet_forward_invariant_to_conv3d_impl(rng):
    """Whole-model check: PSMNet outputs match across conv3d/deconv3d
    formulations (native vs kwfold/parity)."""
    import jax as _jax

    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.ops import config

    imL = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    imR = jnp.asarray(rng.rand(1, 32, 64, 3).astype(np.float32))
    model = create_model("psmnet", maxdisparity=16)
    old_c, old_d = config.conv3d_impl, config.deconv3d_impl
    try:
        config.conv3d_impl, config.deconv3d_impl = "native", "native"
        v = model.init(_jax.random.PRNGKey(0), imL, imR, train=False)
        _, d_ref = model.apply(v, imL, imR, train=False)
        config.conv3d_impl, config.deconv3d_impl = "kwfold", "parity"
        _, d_new = model.apply(v, imL, imR, train=False)
    finally:
        config.conv3d_impl, config.deconv3d_impl = old_c, old_d
    diff = np.abs(np.asarray(d_ref[0]) - np.asarray(d_new[0]))
    assert diff.max() < 0.05 and diff.mean() < 1e-3, (diff.max(), diff.mean())


def test_conv3d_s2_pallas_kernels_interpret(rng):
    """Folded-parity stride-2 Pallas fwd + dK match the native strided
    conv / its kernel gradient exactly (interpret mode; real-TPU timings
    in PERF.md r4)."""
    from jax import lax

    from dsmnet_tpu.ops.conv3d_s2_pallas import (
        conv3d_s2_dk_pallas,
        conv3d_s2_fwd_pallas,
        s2_pallas_ok,
    )

    # the real-TPU gate also requires DMA tile alignment of W/4, which
    # these interpret-mode shapes deliberately ignore; check the gate
    # separately at the production shapes
    assert s2_pallas_ok((4, 48, 96, 192, 32), (3, 3, 3, 32, 64), 2)
    assert s2_pallas_ok((4, 24, 48, 96, 64), (3, 3, 3, 64, 64), 2)
    assert not s2_pallas_ok((1, 12, 24, 48, 64), (3, 3, 3, 64, 64), 4)

    for shape, co in [((2, 4, 8, 8, 32), 8), ((1, 4, 8, 16, 32), 64),
                      ((1, 6, 4, 8, 64), 16)]:
        ci = shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, ci, co).astype(np.float32) * 0.1)
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
        ref = lax.conv_general_dilated(x, k, (2, 2, 2), [(1, 1)] * 3,
                                       dimension_numbers=dn)
        out = conv3d_s2_fwd_pallas(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

        g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
        dk_ref = jax.vjp(
            lambda kk: lax.conv_general_dilated(
                x, kk, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn), k
        )[1](g)[0]
        dk = conv3d_s2_dk_pallas(x, g, interpret=True)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                                   rtol=1e-4, atol=1e-3)


def test_conv3d_s2_dx_is_deconv(rng):
    """The stride-2 conv's input gradient IS deconv3d geometry with the
    forward kernel as-is — the identity the Pallas backward relies on
    (ops/conv3d.py _s2_bwd r4)."""
    from dsmnet_tpu.ops.conv3d import (
        _conv_s2_native,
        _deconv_native,
        _deconv_parity,
    )

    x = jnp.asarray(rng.randn(1, 4, 6, 8, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 8, 4).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.randn(1, 2, 3, 4, 4).astype(np.float32))
    dx_ref = jax.vjp(lambda a: _conv_s2_native(a, k), x)[1](g)[0]
    np.testing.assert_allclose(np.asarray(_deconv_native(g, k)),
                               np.asarray(dx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(_deconv_parity(g, k)),
                               np.asarray(dx_ref), rtol=1e-5, atol=1e-4)


def test_fused_stem_grouped_assembly_exact(rng):
    """The diagonal-grouped interior assembly (+ exact boundary patches)
    equals the raw per-tap composition, including tiny D/W where the
    boundary rows dominate (ops/fused_costvol.py _assemble_grouped)."""
    from dsmnet_tpu.ops.fused_costvol import (
        _assemble_grouped,
        cost_volume_conv3x3_reference,
    )

    for (n, h, w, f, o, D, ml) in [(1, 6, 12, 4, 5, 6, True),
                                   (2, 5, 10, 3, 4, 5, False),
                                   (1, 4, 9, 4, 4, 3, True),
                                   (1, 4, 8, 2, 3, 7, True)]:
        fL = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))
        fR = jnp.asarray(rng.randn(n, h, w, f).astype(np.float32))
        K = jnp.asarray(rng.randn(3, 3, 3, 2 * f, o).astype(np.float32) * 0.1)
        ref = cost_volume_conv3x3_reference(fL, fR, K, D, ml)
        got = _assemble_grouped(fL, fR, K, D, ml)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mask_left", [True, False])
@pytest.mark.parametrize("shape", [(6, 8, 12), (16, 8, 12), (4, 5, 3)])
def test_fused_stem_skew_assembly_exact(rng, mask_left, shape):
    """The r5 gather-free skew assembly must equal both the r4 grouped
    assembly and the volume+conv composition, including D >= W and the
    d/w boundary rows the interior formula patches."""
    from dsmnet_tpu.ops.fused_costvol import (
        _assemble_grouped,
        _assemble_skew,
        cost_volume_conv3x3_reference,
    )

    D, h, w = shape
    fL = jnp.asarray(rng.randn(2, h, w, 4).astype(np.float32))
    fR = jnp.asarray(rng.randn(2, h, w, 4).astype(np.float32))
    K = jnp.asarray(rng.randn(3, 3, 3, 8, 5).astype(np.float32) * 0.1)
    ref = cost_volume_conv3x3_reference(fL, fR, K, D, mask_left)
    out_g = _assemble_grouped(fL, fR, K, D, mask_left)
    out_s = _assemble_skew(fL, fR, K, D, mask_left)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref), atol=1e-5)


def test_conv3d_cin1_stencil_exact(rng):
    """The Cin=1 stencil path (classifier-c1 backward dx shape) must
    equal the native conv, forward and as the dx of a Co=1 conv."""
    from dsmnet_tpu.ops.conv3d import _conv, _conv_cin1, conv3d_same

    x1 = jnp.asarray(rng.randn(2, 6, 8, 10, 1).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 3, 1, 32).astype(np.float32) * 0.1)
    ref = _conv(x1, k1, [(1, 1)] * 3)
    out = _conv_cin1(x1, k1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # full grads of a (32 -> 1) conv route dx through the stencil
    x = jnp.asarray(rng.randn(1, 6, 8, 10, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 32, 1).astype(np.float32) * 0.1)

    def f(conv):
        return lambda a, b: jnp.sum(conv(a, b) ** 2)

    ref_conv = lambda a, b: _conv(a, b, [(1, 1)] * 3)
    g0 = jax.grad(f(ref_conv), argnums=(0, 1))(x, k)
    g1 = jax.grad(f(conv3d_same), argnums=(0, 1))(x, k)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_s2_dx_pallas_folded_exact(rng):
    """The folded Pallas dx kernel must equal the vjp of the reference
    stride-2 conv, including the D/H tail planes and the side (uo+1)
    column, in interpret mode on CPU."""
    from dsmnet_tpu.ops.conv3d_s2_pallas import (
        conv3d_s2_dx_pallas_folded,
        s2_dx_pallas_ok,
    )
    from dsmnet_tpu.ops.folded import fold, unfold

    n, D, H, W, C, Co = 1, 6, 8, 32, 32, 16
    assert s2_dx_pallas_ok((n, D, H, W, C), (3, 3, 3, C, Co),
                           check_tiling=False)
    x = jnp.asarray(rng.randn(n, D, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, C, Co).astype(np.float32) * 0.1)
    g = jnp.asarray(
        rng.randn(n, D // 2, H // 2, W // 2, Co).astype(np.float32))

    def f(a):
        dn = jax.lax.conv_dimension_numbers(
            a.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            a, k, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn)

    _, vjp = jax.vjp(f, x)
    ref = vjp(g)[0]

    gf = g.reshape(n, D // 2, H // 2, W // 4, 2 * Co)
    dxf = conv3d_s2_dx_pallas_folded(gf, k, interpret=True)
    dx = unfold(dxf, C)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_folded_deconv_transposition_identities(rng):
    """folded_deconv3d_k3s2's Pallas route reuses the stride-2 kernel
    trio under transposition; verify all three roles against the XLA
    parity deconv in interpret mode: fwd == deconv, d(input) == the s2
    conv of the cotangent, dW == the swapped-roles dK."""
    from dsmnet_tpu.ops.conv3d import _deconv_parity
    from dsmnet_tpu.ops.conv3d_s2_pallas import (
        conv3d_s2_dk_pallas_padded,
        conv3d_s2_dx_pallas_folded,
        conv3d_s2_fwd_pallas_padded,
    )
    from dsmnet_tpu.ops.folded import _pad_dh, fold, unfold

    n, D2, H2, W_in, Cin, Cout = 1, 3, 4, 32, 64, 32
    W_out = 2 * W_in
    x = jnp.asarray(rng.randn(n, D2, H2, W_in, Cin).astype(np.float32))
    kp = jnp.asarray(rng.randn(3, 3, 3, Cout, Cin).astype(np.float32) * 0.1)
    xf = fold(x)

    ref, vjp = jax.vjp(lambda a, b: _deconv_parity(a, b), x, kp)

    out = unfold(conv3d_s2_dx_pallas_folded(xf, kp, interpret=True), Cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    g = jnp.asarray(rng.randn(*ref.shape).astype(np.float32))
    dx_ref, dk_ref = vjp(g)
    gp = _pad_dh(fold(g))
    dinp = conv3d_s2_fwd_pallas_padded(gp, kp, W_out, interpret=True)
    np.testing.assert_allclose(
        np.asarray(unfold(dinp.reshape(n, D2, H2, W_in * Cin // 128, 128),
                          Cin)),
        np.asarray(dx_ref), atol=1e-4, rtol=1e-4)
    dk = conv3d_s2_dk_pallas_padded(gp, xf, (3, 3, 3, Cout, Cin), W_out,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               atol=1e-3, rtol=1e-3)


def test_imwarp_horizontal_fast_path_matches_generic(rng):
    """Integer scale + integer origin must route through the 2-tap
    horizontal path and equal the generic 4-tap gather exactly."""
    from dsmnet_tpu.ops.warp import _bilinear_gather_zero_pad, imwarp

    src = jnp.asarray(rng.rand(2, 40, 56, 3).astype(np.float32))
    for scale, lt, h, w in ((1, (8, 8), 24, 40), (2, (4, 4), 16, 24),
                            (1, (0, 0), 40, 56)):
        disp = jnp.asarray((rng.rand(2, h, w, 1) * 9 - 2).astype(np.float32))
        out = imwarp(src, disp, False, lt, float(scale))
        # generic reference: force the slow path with a float origin
        # epsilon too small to change any sample
        jj = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        ii = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        px = lt[0] + jj * scale - disp[..., 0]
        py = jnp.broadcast_to(lt[1] + ii * scale + 0.0, px.shape)
        ref = _bilinear_gather_zero_pad(src + 5.5e-5, px, py)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
        # fliplr route too
        out_f = imwarp(src, disp, True, lt, float(scale))
        pxf = (src.shape[2] - 1.0 - lt[0]) - jj * scale + disp[..., 0]
        ref_f = _bilinear_gather_zero_pad(src + 5.5e-5, pxf, py)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                                   atol=1e-6)


def test_conv3d_cin1_gemm_exact(rng):
    """The Cin=1 im2col-GEMM path (classifier-dx shape) equals the
    native conv, forward and as the dx of a Co=1 conv."""
    from dsmnet_tpu.ops.conv3d import _conv, _conv_cin1_gemm, conv3d_same

    x1 = jnp.asarray(rng.randn(2, 6, 8, 10, 1).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, 3, 1, 32).astype(np.float32) * 0.1)
    ref = _conv(x1, k1, [(1, 1)] * 3)
    np.testing.assert_allclose(np.asarray(_conv_cin1_gemm(x1, k1)),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)

    x = jnp.asarray(rng.randn(1, 6, 8, 10, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 32, 1).astype(np.float32) * 0.1)
    ref_conv = lambda a, b: _conv(a, b, [(1, 1)] * 3)
    g0 = jax.grad(lambda a, b: jnp.sum(ref_conv(a, b) ** 2),
                  argnums=(0, 1))(x, k)
    g1 = jax.grad(lambda a, b: jnp.sum(conv3d_same(a, b) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_folded_conv3d_to1_exact(rng):
    """The folded Cout=1 classifier head (lane GEMM + shifted adds)
    equals unfold -> native conv, forward and full gradients."""
    from dsmnet_tpu.ops.conv3d import _conv
    from dsmnet_tpu.ops.folded import fold, folded_conv3d_to1, unfold

    n, D, H, W, C = 2, 6, 8, 16, 32
    x = jnp.asarray(rng.randn(n, D, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, C, 1).astype(np.float32) * 0.1)
    xf = fold(x)

    ref = _conv(x, k, [(1, 1)] * 3)
    out = folded_conv3d_to1(xf, k, C, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    g0 = jax.grad(
        lambda a, b: jnp.sum(_conv(unfold(a, C), b, [(1, 1)] * 3) ** 2),
        argnums=(0, 1),
    )(xf, k)
    g1 = jax.grad(
        lambda a, b: jnp.sum(folded_conv3d_to1(a, b, C, W) ** 2),
        argnums=(0, 1),
    )(xf, k)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # C=64 (r=2) shape family as used by GCNet-width heads
    C2, W2 = 64, 8
    x2 = jnp.asarray(rng.randn(1, 4, 6, W2, C2).astype(np.float32))
    k2 = jnp.asarray(rng.randn(3, 3, 3, C2, 1).astype(np.float32) * 0.1)
    ref2 = _conv(x2, k2, [(1, 1)] * 3)
    out2 = folded_conv3d_to1(fold(x2), k2, C2, W2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5, rtol=1e-5)


def test_conv2d_pallas_exact(rng):
    """2-D folded Pallas kernels (interpret mode) equal the native lax
    conv — forward, dx-as-flipped-forward, and dK — at C=32 and C=64
    tower shapes including H/W boundaries."""
    from dsmnet_tpu.ops.conv2d import _conv
    from dsmnet_tpu.ops.conv2d_pallas import conv2d_dk_pallas, conv2d_fwd_pallas

    for (n, H, W, C, Co) in [(2, 8, 64, 32, 32), (1, 6, 64, 64, 32),
                             (1, 4, 32, 64, 64)]:
        x = jnp.asarray(rng.randn(n, H, W, C).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(n, H, W, Co).astype(np.float32))
        ref = _conv(x, k)
        out = conv2d_fwd_pallas(x, k, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        _, vjp = jax.vjp(_conv, x, k)
        dx_ref, dk_ref = vjp(g)
        k_t = jnp.flip(k, axis=(0, 1)).swapaxes(2, 3)
        dx = conv2d_fwd_pallas(g, k_t, interpret=True)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                                   atol=1e-4, rtol=1e-4)
        dk = conv2d_dk_pallas(x, g, interpret=True)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                                   atol=1e-3, rtol=1e-4)
