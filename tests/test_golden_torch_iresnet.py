"""Whole-model golden test: iResNet forward vs an independent torch NCHW
implementation with the same weights (VERDICT r4 task #4).

The torch twin re-implements the reference architecture
(/root/reference/models/iresnet.py:17-197) from the written spec: the
multi-scale shared stem (7x7/s2, 5x5/s2 convs + k4/s2 and k8/s4
deconvs fused to full-res 32-ch descriptors), the initial-disparity
subnet (Corr1d D=81 + redir + DispNetC-style decoder with 0.1-scaled pr
heads and align-corners upsampling), and the warp-based refinement
subnet (imwrap_BCHW of the right descriptors by -pr0, reconstruction
error, Corr1d D=41 k=3 s=2 with avg-pool smoothing, residual heads
added to pr2/pr1/pr0) — the exact composition VERDICT r4 missing-#3
flagged.  This family has no BatchNorm (iresnet.py:14 flag_bn=False),
so weights map directly; both sides run f64 eval with the SAME
deterministic warp epsilon (the reference adds a random 1e-4-scale
epsilon, utils/imwrap.py:70-71; ours defaults to 5.5e-5 — the twin uses
that value).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dsmnet_tpu.models import create_model

WARP_EPS = 5.5e-5  # dsmnet_tpu.ops.warp.imwarp default


# ---------------------------------------------------------------- torch twin

class ConvR(tnn.Module):
    """conv2d_bn with flag_bn=False (util_conv.py:115-128): conv+ReLU."""

    def __init__(self, ci, co, k, s, relu=True):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, padding=(k - 1) // 2, bias=True)
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        return F.relu(x) if self.relu else x


class DeconvR(tnn.Module):
    """deconv2d_bn, bn off: p=(k-1)//2, op=s-(k-2p) (util_conv.py:131-146)."""

    def __init__(self, ci, co, k, s):
        super().__init__()
        p = (k - 1) // 2
        op = s - (k - 2 * p)
        self.conv = tnn.ConvTranspose2d(ci, co, k, s, padding=p,
                                        output_padding=op, bias=True)

    def forward(self, x):
        return F.relu(self.conv(x))


def corr1d_t(fL, fR, D, stride=1, kernel_size=1):
    """util_conv.py:56-86 Corr1d: channel-sum dot product at shifts
    i*stride, zero where w < shift, optional avg-pool smoothing."""
    n, c, h, w = fL.shape
    maps = [(fL * fR).sum(1)]
    for i in range(1, D):
        idx = i * stride
        m = fL.new_zeros(n, h, w)
        if i < w and idx < w:
            m[:, :, idx:] = (fL[:, :, :, idx:] * fR[:, :, :, :w - idx]).sum(1)
        maps.append(m)
    out = torch.stack(maps, dim=1)
    if kernel_size > 1:
        out = F.avg_pool2d(out, kernel_size, stride=1,
                           padding=kernel_size // 2)
    return out


def imwrap_t(im_src, disp):
    """utils/imwrap.py:37-72 with LeftTop=(0,0), scale=1, fliplr=False and
    the deterministic epsilon: sample at px = j - disp."""
    n, c, h0, w0 = im_src.shape
    h, w = disp.shape[2], disp.shape[3]
    jj = torch.arange(w, dtype=im_src.dtype).view(1, 1, w)
    ii = torch.arange(h, dtype=im_src.dtype).view(1, h, 1)
    px = jj - disp.squeeze(1)
    py = ii.expand(n, h, w)
    gx = px * 2.0 / (w0 - 1) - 1
    gy = py * 2.0 / (h0 - 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return F.grid_sample(im_src + WARP_EPS, grid, mode="bilinear",
                         padding_mode="zeros", align_corners=True)


def up2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear",
                         align_corners=True)


def cat2d(*seq):
    h = min(t.shape[2] for t in seq)
    w = min(t.shape[3] for t in seq)
    return torch.cat([t[:, :, :h, :w] for t in seq], dim=1)


class TorchIResNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = ConvR(3, 64, 7, 2)
        self.conv2 = ConvR(64, 128, 5, 2)
        self.deconv1_s = DeconvR(64, 32, 4, 2)
        self.deconv2_s = DeconvR(128, 32, 8, 4)
        self.conv_de1_de2 = ConvR(64, 32, 1, 1)

        self.redir = ConvR(128, 64, 1, 1)
        self.conv3 = ConvR(81 + 64, 256, 3, 2)
        self.conv3_1 = ConvR(256, 256, 3, 1)
        self.conv4 = ConvR(256, 512, 3, 2)
        self.conv4_1 = ConvR(512, 512, 3, 1)
        self.conv5 = ConvR(512, 512, 3, 2)
        self.conv5_1 = ConvR(512, 512, 3, 1)
        self.conv6 = ConvR(512, 1024, 3, 2)
        self.conv6_1 = ConvR(1024, 1024, 3, 1)
        self.pr6 = tnn.Conv2d(1024, 1, 3, 1, padding=1)
        self.deconv5 = DeconvR(1024, 512, 4, 2)
        self.iconv5 = ConvR(1025, 512, 3, 1)
        self.pr5 = tnn.Conv2d(512, 1, 3, 1, padding=1)
        self.deconv4 = DeconvR(512, 256, 4, 2)
        self.iconv4 = ConvR(769, 256, 3, 1)
        self.pr4 = tnn.Conv2d(256, 1, 3, 1, padding=1)
        self.deconv3 = DeconvR(256, 128, 4, 2)
        self.iconv3 = ConvR(385, 128, 3, 1)
        self.pr3 = tnn.Conv2d(128, 1, 3, 1, padding=1)
        self.deconv2 = DeconvR(128, 64, 4, 2)
        self.iconv2 = ConvR(193, 64, 3, 1)
        self.pr2 = tnn.Conv2d(64, 1, 3, 1, padding=1)
        self.deconv1 = DeconvR(64, 32, 4, 2)
        self.iconv1 = ConvR(97, 32, 3, 1)
        self.pr1 = tnn.Conv2d(32, 1, 3, 1, padding=1)
        self.deconv0 = DeconvR(32, 32, 4, 2)
        self.iconv0 = ConvR(65, 32, 3, 1)
        self.pr0 = tnn.Conv2d(32, 1, 3, 1, padding=1)

        self.r_conv0 = ConvR(65, 32, 3, 1)
        self.r_conv1 = ConvR(32, 64, 3, 2)
        self.c_conv1 = ConvR(64, 64, 3, 1)
        self.r_conv1_1 = ConvR(105, 64, 3, 1)
        self.r_conv2 = ConvR(64, 128, 3, 2)
        self.r_conv2_1 = ConvR(128, 128, 3, 1)
        self.r_res2 = tnn.Conv2d(128, 1, 3, 1, padding=1)
        self.r_deconv1 = DeconvR(128, 64, 4, 2)
        self.r_iconv1 = ConvR(129, 64, 3, 1)
        self.r_res1 = tnn.Conv2d(64, 1, 3, 1, padding=1)
        self.r_deconv0 = DeconvR(64, 32, 4, 2)
        self.r_iconv0 = ConvR(65, 32, 3, 1)
        self.r_res0 = tnn.Conv2d(32, 1, 3, 1, padding=1)

    def forward(self, imL, imR):
        h, w = imL.shape[2], imL.shape[3]
        out = []
        conv1L, conv1R = self.conv1(imL), self.conv1(imR)
        conv2L, conv2R = self.conv2(conv1L), self.conv2(conv1R)
        d1L = self.deconv1_s(conv1L)[:, :, :h, :w]
        d1R = self.deconv1_s(conv1R)[:, :, :h, :w]
        d2L, d2R = self.deconv2_s(conv2L), self.deconv2_s(conv2R)
        descL = self.conv_de1_de2(cat2d(d1L, d2L))
        descR = self.conv_de1_de2(cat2d(d1R, d2R))

        corr = corr1d_t(conv2L, conv2R, D=81)
        redir = self.redir(conv2L)
        conv3_1 = self.conv3_1(self.conv3(torch.cat([corr, redir], 1)))
        conv4_1 = self.conv4_1(self.conv4(conv3_1))
        conv5_1 = self.conv5_1(self.conv5(conv4_1))
        conv6_1 = self.conv6_1(self.conv6(conv5_1))

        pr6 = self.pr6(conv6_1)
        out.insert(0, pr6)
        iconv5 = self.iconv5(cat2d(self.deconv5(conv6_1), up2(pr6), conv5_1))
        pr5 = self.pr5(iconv5)
        out.insert(0, pr5)
        iconv4 = self.iconv4(cat2d(self.deconv4(iconv5), up2(pr5), conv4_1))
        pr4 = self.pr4(iconv4)
        out.insert(0, pr4)
        iconv3 = self.iconv3(cat2d(self.deconv3(iconv4), up2(pr4), conv3_1))
        pr3 = self.pr3(iconv3)
        out.insert(0, pr3)
        iconv2 = self.iconv2(cat2d(self.deconv2(iconv3), up2(pr3), conv2L))
        pr2 = self.pr2(iconv2)
        out.insert(0, pr2)
        iconv1 = self.iconv1(cat2d(self.deconv1(iconv2), up2(pr2), conv1L))
        pr1 = self.pr1(iconv1)
        out.insert(0, pr1)
        iconv0 = self.iconv0(cat2d(self.deconv0(iconv1), up2(pr1), descL))
        pr0 = self.pr0(iconv0)
        out.insert(0, pr0)

        r_pr2, r_pr1, r_pr0 = pr2, pr1, pr0
        w_descL = imwrap_t(descR, -r_pr0)
        recon = torch.abs(descL - w_descL)
        r_conv0 = self.r_conv0(cat2d(recon, r_pr0, descL))
        r_conv1 = self.r_conv1(r_conv0)
        c1L, c1R = self.c_conv1(conv1L), self.c_conv1(conv1R)
        r_corr = corr1d_t(c1L, c1R, D=41, stride=2, kernel_size=3)
        r_conv1_1 = self.r_conv1_1(cat2d(r_conv1, r_corr))
        r_conv2_1 = self.r_conv2_1(self.r_conv2(r_conv1_1))
        r_res2 = self.r_res2(r_conv2_1)
        out.insert(0, r_pr2 + r_res2)
        r_iconv1 = self.r_iconv1(cat2d(self.r_deconv1(r_conv2_1),
                                       up2(r_res2), r_conv1_1))
        r_res1 = self.r_res1(r_iconv1)
        out.insert(0, r_pr1 + r_res1)
        r_iconv0 = self.r_iconv0(cat2d(self.r_deconv0(r_iconv1),
                                       up2(r_res1), r_conv0))
        r_res0 = self.r_res0(r_iconv0)
        out.insert(0, r_pr0 + r_res0)
        return out


# ------------------------------------------------------------ weight export

def _conv(t, p):
    k = np.asarray(p["kernel"], np.float64)
    t.weight.data = torch.from_numpy(np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    t.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _deconv(t, p):
    k = np.asarray(p["kernel"], np.float64)  # (kh,kw,out,in), flipped-tap
    t.weight.data = torch.from_numpy(np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    t.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def export_weights(tm, params):
    convs = ["conv1", "conv2", "conv_de1_de2", "redir", "conv3", "conv3_1",
             "conv4", "conv4_1", "conv5", "conv5_1", "conv6", "conv6_1",
             "iconv5", "iconv4", "iconv3", "iconv2", "iconv1", "iconv0",
             "r_conv0", "r_conv1", "c_conv1", "r_conv1_1", "r_conv2",
             "r_conv2_1", "r_iconv1", "r_iconv0"]
    deconvs = ["deconv1_s", "deconv2_s", "deconv5", "deconv4", "deconv3",
               "deconv2", "deconv1", "deconv0", "r_deconv1", "r_deconv0"]
    heads = ["pr6", "pr5", "pr4", "pr3", "pr2", "pr1", "pr0",
             "r_res2", "r_res1", "r_res0"]
    for name in convs:
        _conv(getattr(tm, name).conv, params[name]["Conv_0"])
    for name in deconvs:
        _deconv(getattr(tm, name).conv, params[name]["ConvTranspose_0"])
    for name in heads:
        _conv(getattr(tm, name), params[name]["ConvBN_0"]["Conv_0"])


def run_golden(h=64, w=96):
    rng = np.random.RandomState(0)
    imL = rng.rand(1, h, w, 3)
    imR = rng.rand(1, h, w, 3)
    with jax.enable_x64():
        model = create_model("iresnet", maxdisparity=192)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(imL, jnp.float32),
                               jnp.asarray(imR, jnp.float32), train=False)
        variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                 variables)
        tm = TorchIResNet().double()
        export_weights(tm, variables["params"])
        tm.eval()
        scales, disps = model.apply(variables, jnp.asarray(imL),
                                    jnp.asarray(imR), train=False)
        disps = [np.asarray(d, np.float64) for d in disps]
    with torch.no_grad():
        touts = tm(torch.from_numpy(imL.transpose(0, 3, 1, 2)),
                   torch.from_numpy(imR.transpose(0, 3, 1, 2)))
    return scales, disps, [t.numpy() for t in touts]


def test_iresnet_matches_torch_golden():
    scales, disps, touts = run_golden()
    # 7 pyramid levels + 3 refinement outputs, refined pr0 first
    assert scales == [0, 1, 2, 0, 1, 2, 3, 4, 5, 6]
    assert len(disps) == len(touts) == 10
    for i, (ours, ref) in enumerate(zip(disps, touts)):
        ours = ours[..., 0]  # NHWC -> (N,H,W)
        ref = ref[:, 0]
        assert ours.shape == ref.shape, (i, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref))
        scale = max(np.max(np.abs(ref)), 1e-3)
        assert err / scale < 1e-5, f"out {i}: max err {err} (scale {scale})"
