"""Whole-model golden test: GCNet forward vs an independent torch NCHW
implementation with the same weights (VERDICT r4 task #4).

The torch twin re-implements the reference architecture
(/root/reference/models/gcnet.py:14-137 + util_conv.py:115-269) in
modern torch from the written spec: 5x5/s2 conv+BN+ReLU stem, 8
BasicBlocks (final-ReLU variant), plain 3x3 conv2, the left-half-dense
concat cost volume at D=maxdisp/2 (gcnet.py:131-135: fL is written at
EVERY disparity slice, fR shifted with zero fill), the l19..l32 conv3d
encoder, the five ConvTranspose3d (k3,s2,p1,op1) decoder stages with
crop-to-min additive skips (myAdd3d), and softmax(-cost) expectation
over the doubled disparity axis.

This validates exactly what VERDICT r4 missing-#3 called out: GCNet's
BN-heavy 3-D tower and all five ConvTranspose3d geometries.  Weights
are randomized, BN running statistics are harvested from one f64
train-mode pass (see test_golden_torch_psmnet.run_golden for why), and
both sides run in f64 eval mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from dsmnet_tpu.models import create_model


# ---------------------------------------------------------------- torch twin

class ConvBN2d(tnn.Module):
    """util_conv.py:115-128 conv2d_bn: bias ON, BN, ReLU."""

    def __init__(self, ci, co, k, s, bias=True, bn=True, relu=True):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, padding=(k - 1) // 2, bias=bias)
        self.bn = tnn.BatchNorm2d(co) if bn else None
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.relu else x


class ConvBN3d(tnn.Module):
    """util_conv.py:148-160 conv3d_bn: bias ON, BN, ReLU."""

    def __init__(self, ci, co, s):
        super().__init__()
        self.conv = tnn.Conv3d(ci, co, 3, s, padding=1, bias=True)
        self.bn = tnn.BatchNorm3d(co)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class DeconvBN3d(tnn.Module):
    """util_conv.py:162-178 deconv3d_bn, k=3 s=2: p=1, op=1.  (The
    reference wraps the 5-D output in BatchNorm2d — a torch-0.3 quirk;
    per-channel semantics equal BatchNorm3d, used here.)"""

    def __init__(self, ci, co, bn=True, relu=True):
        super().__init__()
        self.conv = tnn.ConvTranspose3d(ci, co, 3, 2, padding=1,
                                        output_padding=1, bias=True)
        self.bn = tnn.BatchNorm3d(co) if bn else None
        self.relu = relu

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.relu else x


class BasicBlockGC(tnn.Module):
    """util_conv.py:180-209: conv+bn+relu, conv+bn, add, FINAL relu."""

    def __init__(self, planes):
        super().__init__()
        self.c1 = ConvBN2d(planes, planes, 3, 1, bias=False)
        self.c2 = ConvBN2d(planes, planes, 3, 1, bias=False, relu=False)

    def forward(self, x):
        return F.relu(self.c2(self.c1(x)) + x)


def my_add3d(a, b):
    """util_fun.py:41-51 myAdd3d: crop both to min (d,h,w) then add."""
    d = min(a.shape[2], b.shape[2])
    h = min(a.shape[3], b.shape[3])
    w = min(a.shape[4], b.shape[4])
    return a[:, :, :d, :h, :w] + b[:, :, :d, :h, :w]


class TorchGCNet(tnn.Module):
    def __init__(self, maxdisp):
        super().__init__()
        self.D = maxdisp // 2
        F_ = 32
        self.conv1 = ConvBN2d(3, 32, 5, 2)
        self.blocks = tnn.Sequential(*[BasicBlockGC(32) for _ in range(8)])
        self.conv2 = tnn.Conv2d(32, 32, 3, 1, padding=1, bias=True)

        self.l19 = ConvBN3d(F_ * 2, F_, 1)
        self.l20 = ConvBN3d(F_, F_, 1)
        self.l21 = ConvBN3d(F_ * 2, F_ * 2, 2)
        self.l22 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l23 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l24 = ConvBN3d(F_ * 2, F_ * 2, 2)
        self.l25 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l26 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l27 = ConvBN3d(F_ * 2, F_ * 2, 2)
        self.l28 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l29 = ConvBN3d(F_ * 2, F_ * 2, 1)
        self.l30 = ConvBN3d(F_ * 2, F_ * 4, 2)
        self.l31 = ConvBN3d(F_ * 4, F_ * 4, 1)
        self.l32 = ConvBN3d(F_ * 4, F_ * 4, 1)
        self.l33 = DeconvBN3d(F_ * 4, F_ * 2)
        self.l34 = DeconvBN3d(F_ * 2, F_ * 2)
        self.l35 = DeconvBN3d(F_ * 2, F_ * 2)
        self.l36 = DeconvBN3d(F_ * 2, F_)
        self.l37 = DeconvBN3d(F_, 1, bn=False, relu=False)

    def cost_volume(self, fL, fR):
        """gcnet.py:131-135: left half DENSE at all slices, right shifted."""
        n, c, h, w = fL.shape
        vol = fL.new_zeros(n, 2 * c, self.D, h, w)
        vol[:, :c, 0] = fL
        vol[:, c:, 0] = fR
        for i in range(1, self.D):
            vol[:, :c, i] = fL
            vol[:, c:, i, :, i:] = fR[:, :, :, :-i]
        return vol

    def forward(self, imL, imR):
        fL = self.conv2(self.blocks(self.conv1(imL)))
        fR = self.conv2(self.blocks(self.conv1(imR)))
        x18 = self.cost_volume(fL, fR)
        x21 = self.l21(x18)
        x24 = self.l24(x21)
        x27 = self.l27(x24)
        x32 = self.l32(self.l31(self.l30(x27)))
        x29 = self.l29(self.l28(x27))
        x33 = my_add3d(self.l33(x32), x29)
        x26 = self.l26(self.l25(x24))
        x34 = my_add3d(self.l34(x33), x26)
        x23 = self.l23(self.l22(x21))
        x35 = my_add3d(self.l35(x34), x23)
        x20 = self.l20(self.l19(x18))
        x36 = my_add3d(self.l36(x35), x20)
        x37 = self.l37(x36)  # (N, 1, 2D, H, W)
        p = F.softmax(-x37.squeeze(1), dim=1)
        d = torch.arange(p.shape[1], dtype=p.dtype)
        out = (p * d.view(1, -1, 1, 1)).sum(1, keepdim=True)
        h, w = imL.shape[2], imL.shape[3]
        return out[:, :, :h, :w]


# ------------------------------------------------------------ weight export

def _fill_conv(tconv, p, transpose3d=False):
    k = np.asarray(p["kernel"], np.float64)
    if transpose3d:
        w = k.transpose(4, 3, 0, 1, 2)  # flax (kd,kh,kw,out,in) -> torch
    elif k.ndim == 5:
        w = k.transpose(4, 3, 0, 1, 2)
    else:
        w = k.transpose(3, 2, 0, 1)
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(w))
    if "bias" in p and tconv.bias is not None:
        tconv.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _fill_bn(tbn, p, s):
    tbn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())


def _fill_convbn(tmod, p, s):
    key = "Conv_0" if "Conv_0" in p else "ConvTranspose_0"
    _fill_conv(tmod.conv, p[key], transpose3d=(key == "ConvTranspose_0"))
    if tmod.bn is not None:
        _fill_bn(tmod.bn, p["BatchNorm_0"], s["BatchNorm_0"])


def export_weights(tm, params, stats):
    f2, s2 = params["layer2d"], stats["layer2d"]
    _fill_convbn(tm.conv1, f2["conv1"], s2["conv1"])
    for i in range(8):
        bp = f2["block1"][f"ResBlockGC_{i}"]
        bs = s2["block1"][f"ResBlockGC_{i}"]
        _fill_convbn(tm.blocks[i].c1, bp["ConvBN_0"], bs["ConvBN_0"])
        _fill_convbn(tm.blocks[i].c2, bp["ConvBN_1"], bs["ConvBN_1"])
    _fill_conv(tm.conv2, f2["conv2"]["Conv_0"])

    f3, s3 = params["layer3d"], stats["layer3d"]
    for i in range(19, 37):
        name = f"l{i}"
        _fill_convbn(getattr(tm, name), f3[name], s3[name])
    _fill_conv(tm.l37.conv, f3["l37"]["ConvTranspose_0"], transpose3d=True)


def run_golden(maxdisp=24, h=64, w=96):
    """Run the flax GCNet and its weight-matched torch twin in f64.

    maxdisp=24 -> D=12 (not a multiple of 16) keeps the UNFOLDED
    _Feature3D path, whose parameter tree the export maps; the folded
    pathway is equality-tested against it separately (test_ops)."""
    import flax

    from tests.test_golden_torch_psmnet import _randomize_stats

    rng = np.random.RandomState(0)
    imL = rng.rand(1, h, w, 3)
    imR = rng.rand(1, h, w, 3)
    with jax.enable_x64():
        model = create_model("gcnet", maxdisparity=maxdisp)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.asarray(imL, jnp.float32),
                               jnp.asarray(imR, jnp.float32), train=False)
        variables = _randomize_stats(variables, rng)
        variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                                 variables)
        _, upd = model.apply(variables, jnp.asarray(imL), jnp.asarray(imR),
                             train=True, mutable=["batch_stats"])
        old = flax.traverse_util.flatten_dict(variables["batch_stats"])
        new = flax.traverse_util.flatten_dict(upd["batch_stats"])
        stats = {k: (new[k] - 0.9 * old[k]) / 0.1 for k in old}
        variables = {
            "params": variables["params"],
            "batch_stats": flax.traverse_util.unflatten_dict(stats),
        }
        tm = TorchGCNet(maxdisp).double()
        export_weights(tm, variables["params"], variables["batch_stats"])
        tm.eval()
        scales, disps = model.apply(variables, jnp.asarray(imL),
                                    jnp.asarray(imR), train=False)
        ours = np.asarray(disps[0], np.float64)
    with torch.no_grad():
        tout = tm(torch.from_numpy(imL.transpose(0, 3, 1, 2)),
                  torch.from_numpy(imR.transpose(0, 3, 1, 2)))
    return scales, ours, tout.numpy()


def test_gcnet_matches_torch_golden():
    scales, ours, ref = run_golden()
    assert scales == [0]
    ours = ours[..., 0]          # NHWC (N,H,W,1) -> (N,H,W)
    ref = ref[:, 0]              # NCHW (N,1,H,W) -> (N,H,W)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    err = np.max(np.abs(ours - ref))
    scale = max(np.max(np.abs(ref)), 1e-3)
    assert err / scale < 1e-5, f"max err {err} (scale {scale})"
