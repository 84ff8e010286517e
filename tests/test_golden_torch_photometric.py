"""Photometric-loss golden tests: every self-supervised loss kind's VALUE
pinned against an independent torch port of the reference loss stack
(VERDICT r4 task #1b — the last unproven BASELINE configuration's math).

The torch oracle re-implements, from the written spec:
  * imwrap_BCHW (LeftTop / scale_factor / fliplr grid semantics,
    /root/reference/utils/imwrap.py:37-72) with the DETERMINISTIC warp
    epsilon both sides share (the reference draws a random 1e-4-scale
    epsilon per call; dsmnet_tpu.ops.warp.imwarp defaults to 5.5e-5),
  * the channel-collapse SSIM (losses/SSIM.py:24-42 _ssim),
  * the gradient/smoothness primitives C_ds1/C_ds2/C_ds3/C_imdiff1 and
    wfun similarity gate (losses/loss.py:24-147),
  * the four per-level losses loss_common / loss_depthmono /
    loss_Cap_ds_lr / loss_SsSMnet incl. the <1024-valid-pixel fallback
    and occlusion weight masking (losses/loss.py:149-338),
  * weight_common (losses/loss.py:393-404) and the two-view pyramid
    orchestrators losses_pyramid1/losses_pyramid2 (losses/loss.py:424-512).

Inputs are a CONSISTENT synthetic stereo scene (so the SSIM similarity
gate is exercised above its 0.75 threshold with near-GT disparities and
below it with wrong disparities), a 7-level disparity pyramid with
levels>2 hitting the upsample path, crop windows with nonzero LeftTop,
and both -mask and unmasked variants.  Both sides run in f64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from dsmnet_tpu.losses import (
    PhotoLossConfig,
    parse_loss_name,
    photometric_pyramid_loss,
    weight_adjust_levels,
)

EPS = 5.5e-5  # dsmnet_tpu.ops.warp.imwarp default


# ------------------------------------------------------------ torch oracle

def _gaussian_window(ws=11, sigma=1.5):
    g = torch.tensor([float(np.exp(-((x - ws // 2) ** 2) / (2 * sigma**2)))
                      for x in range(ws)], dtype=torch.float64)
    g = g / g.sum()
    w2 = g[:, None] @ g[None, :]
    return w2[None, None]


def ssim_t(img1, img2, ws=11):
    """SSIM.py:24-42 _ssim: channel-collapsed window (window.T/C, groups=1)
    -> a 1-channel ssim map from C-channel inputs."""
    c = img1.shape[1]
    win = _gaussian_window(ws).to(img1.dtype)
    win = win.expand(c, 1, ws, ws).contiguous()
    win = win.transpose(0, 1) / c  # (1, C, ws, ws)
    pad = ws // 2
    mu1 = F.conv2d(img1, win, padding=pad)
    mu2 = F.conv2d(img2, win, padding=pad)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, win, padding=pad) - mu1_sq
    s2 = F.conv2d(img2 * img2, win, padding=pad) - mu2_sq
    s12 = F.conv2d(img1 * img2, win, padding=pad) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))


def imwrap_t(im_src, disp, fliplr=False, left_top=(0, 0), scale=1):
    """imwrap.py:37-72 with deterministic epsilon EPS."""
    n, c, h0, w0 = im_src.shape
    h, w = disp.shape[2], disp.shape[3]
    x0, y0 = left_top
    jj = torch.arange(w, dtype=im_src.dtype).view(1, 1, w)
    ii = torch.arange(h, dtype=im_src.dtype).view(1, h, 1)
    d = disp[:, 0]
    if fliplr:
        px = (w0 - 1.0 - x0) - jj * scale + d
    else:
        px = x0 + jj * scale - d
    py = (y0 + ii * scale).expand(n, h, w)
    gx = px * 2.0 / (w0 - 1) - 1
    gy = py * 2.0 / (h0 - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(im_src + EPS, grid, mode="bilinear",
                         padding_mode="zeros", align_corners=True)


def d1x(img):
    return F.pad(img[:, :, :, 1:] - img[:, :, :, :-1], [0, 1, 0, 0])


def d1y(img):
    return F.pad(img[:, :, 1:] - img[:, :, :-1], [0, 0, 0, 1])


def d2x(img):
    d = img[:, :, :, 2:] + img[:, :, :, :-2] - 2 * img[:, :, :, 1:-1]
    return F.pad(d, [1, 1, 0, 0])


def d2y(img):
    d = img[:, :, 2:] + img[:, :, :-2] - 2 * img[:, :, 1:-1]
    return F.pad(d, [0, 0, 1, 1])


def dzx(disp):
    d = disp[:, :, :, 1:-1] / disp[:, :, :, 2:] + \
        disp[:, :, :, 1:-1] / disp[:, :, :, :-2] - 2
    return F.pad(d, [1, 1, 0, 0])


def dzy(disp):
    d = disp[:, :, 1:-1] / disp[:, :, 2:] + \
        disp[:, :, 1:-1] / disp[:, :, :-2] - 2
    return F.pad(d, [0, 0, 1, 1])


def c_imdiff1_t(img, imw):
    return torch.abs(d1x(img) - d1x(imw)) + torch.abs(d1y(img) - d1y(imw))


def c_ds1_t(img, disp):
    wx = torch.exp(-torch.sum(torch.abs(d1x(img)), 1, keepdim=True))
    wy = torch.exp(-torch.sum(torch.abs(d1y(img)), 1, keepdim=True))
    return torch.abs(d1x(disp)) * wx + torch.abs(d1y(disp)) * wy


def c_ds2_t(img, disp):
    wx = torch.exp(-torch.sum(torch.abs(d2x(img)), 1, keepdim=True))
    wy = torch.exp(-torch.sum(torch.abs(d2y(img)), 1, keepdim=True))
    return torch.abs(d2x(disp)) * wx + torch.abs(d2y(disp)) * wy


def c_ds3_t(img, disp):
    dp = torch.abs(disp) + 1
    ddx = torch.abs(dzx(dp)).clamp(0, 10)
    ddy = torch.abs(dzy(dp)).clamp(0, 10)
    ix = torch.abs(d1x(img))
    iy = torch.abs(d1y(img))
    mx = ix.mean(-1, True).mean(-2, True).mean(-3, True)
    my = iy.mean(-1, True).mean(-2, True).mean(-3, True)
    wx = torch.exp(-ix.max(dim=1, keepdim=True)[0] / (0.5 * mx))
    wy = torch.exp(-iy.max(dim=1, keepdim=True)[0] / (0.5 * my))
    return ddx * wx + ddy * wy


def wfun_t(sim):
    return max(0.0, sim - 0.75) / 2 + 0.001


def weight_common_t(disp, disp_wrap, factor=1.0):
    delt = (torch.abs(disp - disp_wrap) / factor).detach()
    w = torch.full_like(delt, 0.01)
    w[delt < 3] = 1.0 - (delt[delt < 3] - 1) * (0.99 / 2)
    w[delt < 1] = 1.0
    return w


def level_loss_t(kind, loss_name, im, im_wrap, disp, aux, factor, wc):
    """losses/loss.py:154-324 — one per-level loss.  ``aux`` is disp_wrap
    (common/depthmono/cap) or im_wrap1 (sssmnet)."""
    ssim = ssim_t(im, im_wrap)
    mask_ap = (im_wrap[:, :1] != 0).detach()
    if kind in ("common", "depthmono") and int(mask_ap.sum()) < 1024:
        mask_ap[:] = True
    sim = ssim.expand_as(im_wrap[:, :1])[mask_ap].mean().item() \
        if ssim.shape[1] == 1 else ssim[mask_ap].mean().item()
    w = wfun_t(sim)

    if kind == "sssmnet":
        C_ap = (0.85 * 0.5) * (1 - ssim) + 0.15 * (
            torch.abs(im - im_wrap) + c_imdiff1_t(im, im_wrap))
        C_lr = torch.abs(im - aux)
        invalid = aux[:, :1] == 0
    else:
        C_ap = (0.85 * 0.5) * (1 - ssim) + 0.15 * torch.abs(im - im_wrap)
        C_lr = torch.abs(disp - aux)
        invalid = aux == 0

    if wc is not None:
        mask_im = (invalid & mask_ap).detach()
        weight_im = wc.clone()
        weight_im[mask_im.expand_as(wc)] = 1.0
        weight_lr = wc.clone()
        weight_lr[invalid.expand_as(wc)] = 0.0
        C_ap = C_ap * weight_im
        C_lr = C_lr * weight_lr

    C_ap_m = C_ap.mean()
    C_lr_m = C_lr.mean()
    if kind == "common":
        return C_ap_m + c_ds3_t(im, disp).mean() * w + C_lr_m * w
    if kind == "depthmono":
        return C_ap_m + c_ds1_t(im, disp).mean() * w + C_lr_m * w
    if kind == "cap":
        C = C_ap_m
        if "ds" in loss_name:
            C = C + c_ds1_t(im, disp).mean() * (w / factor)
        if "lr" in loss_name:
            C = C + C_lr_m * w
        return C
    if kind == "sssmnet":
        return (C_ap_m + c_ds2_t(im, disp).mean() * (w / factor)
                + C_lr_m * w + torch.abs(disp).mean() * 1e-4)
    raise ValueError(kind)


def pyramid_loss_t(kind, loss_name, flag_mask, imR_src, imL, dispLs, scales,
                   left_top, imR1_src, imL1, dispL1s, left_top1, weights):
    """losses/loss.py:424-512 losses_pyramid1/2."""
    count = len(scales)
    maxlevel = min(2, max(scales))
    i0 = next(i for i, s in enumerate(scales) if s == maxlevel)
    h, w = dispLs[i0].shape[2], dispLs[i0].shape[3]
    imLs, imL1s = [imL], [imL1]
    for _ in range(maxlevel):
        imLs.append(imLs[-1][:, :, ::2, ::2])
        imL1s.append(imL1s[-1][:, :, ::2, ::2])
    loss = torch.zeros((), dtype=imL.dtype)
    for i in range(count):
        level = scales[i]
        if level > maxlevel:
            sf = 2 ** maxlevel
            up = 2 ** (level - maxlevel)
            dispL = F.interpolate(dispLs[i], scale_factor=up, mode="bilinear",
                                  align_corners=True)[:, :, :h, :w]
            dispL1 = F.interpolate(dispL1s[i], scale_factor=up, mode="bilinear",
                                   align_corners=True)[:, :, :h, :w]
        else:
            sf = 2 ** level
            dispL, dispL1 = dispLs[i], dispL1s[i]
        imL_wrap = imwrap_t(imR_src, dispL, False, left_top, sf)
        imL1_wrap = imwrap_t(imR1_src, dispL1, False, left_top1, sf)
        wc = wc1 = None
        if kind == "sssmnet":
            aux = imwrap_t(imL1_wrap, dispL, True, (0, 0), 1)
            aux1 = imwrap_t(imL_wrap, dispL1, True, (0, 0), 1)
            if flag_mask:
                dL_w = imwrap_t(dispL1, dispL, True, (0, 0), 1)
                dL1_w = imwrap_t(dispL, dispL1, True, (0, 0), 1)
                wc = weight_common_t(dispL, dL_w, sf)
                wc1 = weight_common_t(dispL1, dL1_w, sf)
        else:
            aux = imwrap_t(dispL1, dispL, True, (0, 0), 1)
            aux1 = imwrap_t(dispL, dispL1, True, (0, 0), 1)
            if flag_mask:
                wc = weight_common_t(dispL, aux, sf)
                wc1 = weight_common_t(dispL1, aux1, sf)
        im_t = imLs[min(level, maxlevel)]
        im1_t = imL1s[min(level, maxlevel)]
        tmp = level_loss_t(kind, loss_name, im_t, imL_wrap, dispL, aux,
                           2 ** level, wc)
        tmp1 = level_loss_t(kind, loss_name, im1_t, imL1_wrap, dispL1, aux1,
                            2 ** level, wc1)
        loss = loss + (tmp + tmp1) * weights[level]
    return loss


# ------------------------------------------------------------ fixture scene

def _scene(good_disp: bool, h=128, w=192, y0=16, x0=32, seed=0):
    """A consistent stereo scene: smooth texture, ramp disparity, right
    view sampled so imL[x] == imR[x - d].  Returns NCHW torch f64 inputs
    for the oracle and the same data for the jax side.

    good_disp=True feeds near-GT disparity pyramids (SSIM gate > 0.75);
    False feeds wrong constant disparities (gate below threshold).
    """
    import cv2

    rng = np.random.RandomState(seed)
    H0, W0 = h + y0 + 16, w + x0 + 64
    tex = rng.rand(H0 // 8 + 2, W0 // 8 + 2, 3).astype(np.float64)
    tex = cv2.resize(tex, (W0 + 40, H0), interpolation=cv2.INTER_CUBIC)
    tex = np.clip(tex, 0, 1)
    # non-integer endpoints: samples must not land EXACTLY on the image
    # boundary — the reference's normalize/denormalize grid round-trip
    # leaves such knife-edge samples a float-epsilon inside bounds (tiny
    # nonzero), our direct pixel form gives exact 0, and the
    # ``disp_wrap == 0`` occlusion test would then disagree on a
    # measure-zero set that real (non-integer) disparities never hit
    d0, d1 = 6.037, 13.913
    disp_full = np.linspace(d0, d1, H0)[:, None] * np.ones((1, W0))
    imL_src = tex[:, :W0]
    xs = np.arange(W0)[None, :] + disp_full
    xi = np.clip(np.floor(xs).astype(np.int64), 0, tex.shape[1] - 2)
    fr = xs - np.floor(xs)
    rows = np.arange(H0)[:, None]
    imR_src = tex[rows, xi] * (1 - fr[..., None]) + \
        tex[rows, xi + 1] * fr[..., None]

    # crops (the driver feeds cropped left targets + uncropped sources,
    # stereo_selfsupervised.py:60-95)
    imL = imL_src[y0:y0 + h, x0:x0 + w]
    gt = disp_full[y0:y0 + h, x0:x0 + w]

    # flipped-view pair: mirror both views and swap roles (the flipped
    # batch of stereo_selfsupervised.py:44-46,67)
    imL1_src = imL_src[:, ::-1].copy()
    imR1_src_ = imR_src  # unused; the flipped pair warps from flip(imL_src)
    imL1 = imR_src[y0:y0 + h, x0 + 0:x0 + w][:, ::-1].copy()

    scales = [0, 1, 2, 3, 4, 5, 6]
    dispLs, dispL1s = [], []
    for lvl in scales:
        hs, ws = h // 2 ** lvl, w // 2 ** lvl
        if good_disp:
            d = gt[::2 ** lvl, ::2 ** lvl][:hs, :ws]
        else:
            d = np.full((hs, ws), 3.37 + 0.61 * lvl)  # non-integer: see d0/d1
        dispLs.append(d[None, :, :, None].astype(np.float64))
        # flipped-view disparity: mirror of the level disparity
        dispL1s.append(d[:, ::-1][None, :, :, None].astype(np.float64))

    return {
        "imR_src": imR_src[None].astype(np.float64),
        "imL": imL[None].astype(np.float64),
        "imR1_src": imL1_src[None].astype(np.float64),
        "imL1": imL1[None].astype(np.float64),
        "dispLs": dispLs,
        "dispL1s": dispL1s,
        "scales": scales,
        "left_top": (float(x0), float(y0)),
    }


def to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


@pytest.mark.parametrize("loss_name", [
    "common", "common-mask", "depthmono", "depthmono-mask",
    "Cap_ds_lr-mask", "Cap_ds", "Cap_lr", "SsSMnet", "SsSMnet-mask",
])
@pytest.mark.parametrize("good_disp", [True, False])
def test_photometric_value_matches_torch(loss_name, good_disp):
    spec = parse_loss_name(loss_name, count_levels=7, maxepoch_weight_adjust=5)
    weights = weight_adjust_levels(3, 7, 5)  # mid-curriculum, non-trivial
    sc = _scene(good_disp)

    with jax.enable_x64():
        ours = photometric_pyramid_loss(
            spec.photo,
            jnp.asarray(sc["imR_src"]), jnp.asarray(sc["imL"]),
            [jnp.asarray(d) for d in sc["dispLs"]], sc["scales"],
            sc["left_top"],
            jnp.asarray(sc["imR1_src"]), jnp.asarray(sc["imL1"]),
            [jnp.asarray(d) for d in sc["dispL1s"]], sc["scales"],
            sc["left_top"],
            jnp.asarray(weights, jnp.float64),
        )
        ours = float(ours)

    kind = spec.photo.kind
    ref = pyramid_loss_t(
        kind, loss_name.split("-")[0].lower(), spec.flag_mask,
        to_nchw(sc["imR_src"]), to_nchw(sc["imL"]),
        [to_nchw(d) for d in sc["dispLs"]], sc["scales"], sc["left_top"],
        to_nchw(sc["imR1_src"]), to_nchw(sc["imL1"]),
        [to_nchw(d) for d in sc["dispL1s"]], sc["left_top"],
        weights,
    )
    ref = float(ref)
    # rel 1e-6: the f32 interpolation-matrix constants in ops/resize.py
    # leave ~6e-9 residual under x64; any term/sign/weight error is >1e-3
    assert ref == pytest.approx(ours, rel=1e-6), (
        f"{loss_name} good={good_disp}: ours {ours} vs torch {ref}")


def test_good_disparity_gates_similarity_above_threshold():
    """Sanity check on the fixture itself: with near-GT disparities the
    full-res warp reconstructs imL well enough that the wfun gate opens
    (mean SSIM > 0.75), so the masked/gated branches really execute."""
    sc = _scene(True)
    imw = imwrap_t(to_nchw(sc["imR_src"]), to_nchw(sc["dispLs"][0]),
                   False, sc["left_top"], 1)
    sim = ssim_t(to_nchw(sc["imL"]), imw).mean().item()
    assert sim > 0.75, sim
    sc_bad = _scene(False)
    imw = imwrap_t(to_nchw(sc_bad["imR_src"]), to_nchw(sc_bad["dispLs"][0]),
                   False, sc_bad["left_top"], 1)
    sim_bad = ssim_t(to_nchw(sc_bad["imL"]), imw).mean().item()
    assert sim_bad < 0.75, sim_bad
