"""Whole-model golden test: PSMNet forward vs an independent torch NCHW
implementation with the same weights (VERDICT r3 missing-#1 / next-#4).

The torch twin re-implements the reference architecture
(/root/reference/models/psmnet/stackhourglass.py:64-168 + submodule.py:
65-140) in modern torch from the written spec: firstconv stack, 4
residual stages (3/16/3/3 blocks, stride-2 layer2, dilation-2 layer4),
the padding=dilation convbn quirk (the SPP 1x1 branch convs pad by 1
before their align-corners bilinear upsample), the D/4 concat cost
volume with both halves masked for w < d, dres0/dres1, three stacked
hourglasses with the presqu=pre1 quirk on the third, cumulative
classifier costs, and align-corners trilinear upsample + softmax
expectation regression.

Weights are randomized, BatchNorm running statistics are harvested from
a real train-mode pass, and both sides run in f64 (see run_golden for
why), so eval-mode agreement validates the NHWC<->NCHW layout mapping,
every conv/deconv geometry, BN semantics, the fused cost-volume stem,
and the chunked trilinear regression — end to end, to 1e-6 relative.
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
    """Reference convbn (submodule.py:10-13): padding follows DILATION,
    not (k-1)//2 — including for 1x1 kernels."""

    def __init__(self, ci, co, k, s, dilation=1):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn = tnn.BatchNorm2d(co)

    def forward(self, x):
        return self.bn(self.conv(x))


class ConvBN3d(tnn.Module):
    def __init__(self, ci, co, s=1):
        super().__init__()
        self.conv = tnn.Conv3d(ci, co, 3, s, padding=1, bias=False)
        self.bn = tnn.BatchNorm3d(co)

    def forward(self, x):
        return self.bn(self.conv(x))


class Block(tnn.Module):
    """submodule.py:21-43: convbn+relu, convbn, (+downsample), NO final relu."""

    def __init__(self, ci, planes, stride, dilation):
        super().__init__()
        self.c1 = ConvBN2d(ci, planes, 3, stride, dilation)
        self.c2 = ConvBN2d(planes, planes, 3, 1, dilation)
        self.down = None
        if stride != 1 or ci != planes:
            self.down = tnn.Sequential(
                tnn.Conv2d(ci, planes, 1, stride, bias=False),
                tnn.BatchNorm2d(planes))

    def forward(self, x):
        y = self.c2(F.relu(self.c1(x)))
        return y + (self.down(x) if self.down is not None else x)


def up_bilinear(x, size):
    return F.interpolate(x, size, mode="bilinear", align_corners=True)


class Features(tnn.Module):
    """submodule.py:65-140."""

    def __init__(self):
        super().__init__()
        self.first = tnn.ModuleList([ConvBN2d(3, 32, 3, 2), ConvBN2d(32, 32, 3, 1),
                                     ConvBN2d(32, 32, 3, 1)])

        def stage(ci, planes, blocks, stride, dilation):
            mods = [Block(ci, planes, stride, dilation)]
            for _ in range(1, blocks):
                mods.append(Block(planes, planes, 1, dilation))
            return tnn.Sequential(*mods)

        self.layer1 = stage(32, 32, 3, 1, 1)
        self.layer2 = stage(32, 64, 16, 2, 1)
        self.layer3 = stage(64, 128, 3, 1, 1)
        self.layer4 = stage(128, 128, 3, 1, 2)
        self.branches = tnn.ModuleList(
            [ConvBN2d(128, 32, 1, 1) for _ in range(4)])
        self.pools = (64, 32, 16, 8)
        self.last0 = ConvBN2d(320, 128, 3, 1)
        self.last1 = tnn.Conv2d(128, 32, 1, 1, 0, bias=False)

    def forward(self, x):
        for c in self.first:
            x = F.relu(c(x))
        x = self.layer1(x)
        raw = self.layer2(x)
        skip = self.layer4(self.layer3(raw))
        h, w = skip.shape[2], skip.shape[3]
        outs = []
        for pool, br in zip(self.pools, self.branches):
            b = F.avg_pool2d(skip, pool, pool)
            outs.append(up_bilinear(F.relu(br(b)), (h, w)))
        fused = torch.cat([raw, skip] + outs[::-1], dim=1)
        return self.last1(F.relu(self.last0(fused)))


class Hourglass(tnn.Module):
    def __init__(self, p):
        super().__init__()
        self.conv1 = ConvBN3d(p, 2 * p, 2)
        self.conv2 = ConvBN3d(2 * p, 2 * p, 1)
        self.conv3 = ConvBN3d(2 * p, 2 * p, 2)
        self.conv4 = ConvBN3d(2 * p, 2 * p, 1)
        self.conv5 = tnn.ConvTranspose3d(2 * p, 2 * p, 3, 2, padding=1,
                                         output_padding=1, bias=False)
        self.conv5_bn = tnn.BatchNorm3d(2 * p)
        self.conv6 = tnn.ConvTranspose3d(2 * p, p, 3, 2, padding=1,
                                         output_padding=1, bias=False)
        self.conv6_bn = tnn.BatchNorm3d(p)

    def forward(self, x, presqu, postsqu):
        out = F.relu(self.conv1(x))
        pre = self.conv2(out)
        pre = F.relu(pre + postsqu) if postsqu is not None else F.relu(pre)
        out = F.relu(self.conv4(F.relu(self.conv3(pre))))
        post = self.conv5_bn(self.conv5(out))
        post = F.relu(post + (presqu if presqu is not None else pre))
        return self.conv6_bn(self.conv6(post)), pre, post


class TorchPSMNet(tnn.Module):
    def __init__(self, maxdisp):
        super().__init__()
        self.maxdisp = maxdisp
        self.features = Features()
        self.dres0_0 = ConvBN3d(64, 32)
        self.dres0_1 = ConvBN3d(32, 32)
        self.dres1_0 = ConvBN3d(32, 32)
        self.dres1_1 = ConvBN3d(32, 32)
        self.hg = tnn.ModuleList([Hourglass(32) for _ in range(3)])
        self.cls = tnn.ModuleList()
        for _ in range(3):
            self.cls.append(tnn.ModuleDict({
                "c0": ConvBN3d(32, 32),
                "c1": tnn.Conv3d(32, 1, 3, 1, padding=1, bias=False)}))

    def cost_volume(self, fL, fR):
        n, c, h, w = fL.shape
        D = self.maxdisp // 4
        cost = fL.new_zeros(n, 2 * c, D, h, w)
        for d in range(D):
            cost[:, :c, d, :, d:] = fL[:, :, :, d:]
            cost[:, c:, d, :, d:] = fR[:, :, :, : w - d] if d else fR
        return cost

    def regress(self, cost, h, w):
        up = F.interpolate(cost, (self.maxdisp, h, w), mode="trilinear",
                           align_corners=True)
        p = F.softmax(up.squeeze(1), dim=1)
        d = torch.arange(self.maxdisp, dtype=p.dtype)
        return (p * d.view(1, -1, 1, 1)).sum(1)

    def forward(self, imL, imR):
        fL, fR = self.features(imL), self.features(imR)
        cost = self.cost_volume(fL, fR)
        c0 = F.relu(self.dres0_1(F.relu(self.dres0_0(cost))))
        c0 = self.dres1_1(F.relu(self.dres1_0(c0))) + c0
        out1, pre1, post1 = self.hg[0](c0, None, None)
        out1 = out1 + c0
        out2, pre2, post2 = self.hg[1](out1, pre1, post1)
        out2 = out2 + c0
        out3, _, _ = self.hg[2](out2, pre1, post2)
        out3 = out3 + c0
        costs = []
        acc = None
        for out, cl in zip((out1, out2, out3), self.cls):
            c = cl["c1"](F.relu(cl["c0"](out)))
            acc = c if acc is None else acc + c
            costs.append(acc)
        h, w = imL.shape[2], imL.shape[3]
        pred1 = self.regress(costs[0], h, w)
        pred2 = self.regress(costs[1], h, w)
        pred3 = self.regress(costs[2], h, w)
        return [pred3, pred2, pred1]


# ------------------------------------------------------------ weight export

def _fill_conv(tconv, p, transpose3d=False):
    k = np.asarray(p["kernel"], np.float64)
    if transpose3d:
        # flax transpose_kernel layout (kd,kh,kw,out,in) with flipped-tap
        # semantics == torch ConvTranspose3d weight (in,out,kd,kh,kw)
        w = k.transpose(4, 3, 0, 1, 2)
    elif k.ndim == 5:
        w = k.transpose(4, 3, 0, 1, 2)
    else:
        w = k.transpose(3, 2, 0, 1)
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(w))


def _fill_bn(tbn, p, s):
    tbn.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())


def _fill_convbn(tmod, p, s):
    _fill_conv(tmod.conv, p["Conv_0"])
    _fill_bn(tmod.bn, p["BatchNorm_0"], s["BatchNorm_0"])


def _randomize_stats(variables, rng):
    """Give every BN non-trivial running stats and affine params so the
    eval-mode normalization is actually exercised.  The perturbations
    are variance-preserving (sigma approx 1): with ~50 BN layers in
    series, anything multiplicative compounds exponentially and pushes
    activations out of f32's comparable range."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = {}
    for path, v in flat.items():
        v = np.asarray(v)
        if path[-1] == "mean":
            v = rng.randn(*v.shape).astype(np.float32) * 0.02
        elif path[-1] == "var":
            v = (0.95 + 0.1 * rng.rand(*v.shape)).astype(np.float32)
        elif path[-1] == "scale":
            v = (1 + 0.03 * rng.randn(*v.shape)).astype(np.float32)
        elif path[-1] == "bias" and v.ndim == 1:
            v = (0.02 * rng.randn(*v.shape)).astype(np.float32)
        out[path] = jnp.asarray(v)
    return flax.core.freeze(flax.traverse_util.unflatten_dict(out)).unfreeze()


def export_weights(tm, params, stats):
    """Copy the flax PSMNet parameter/stat trees into the torch twin."""
    fe, fs = params["feature_extraction"], stats["feature_extraction"]
    for i in range(3):
        _fill_convbn(tm.features.first[i], fe[f"firstconv{i}"], fs[f"firstconv{i}"])
    for lname, blocks, tstage in [("layer1", 3, tm.features.layer1),
                                  ("layer2", 16, tm.features.layer2),
                                  ("layer3", 3, tm.features.layer3),
                                  ("layer4", 3, tm.features.layer4)]:
        for i in range(blocks):
            bp, bs = fe[f"{lname}_{i}"], fs[f"{lname}_{i}"]
            tb = tstage[i]
            _fill_convbn(tb.c1, bp["ConvBN_0"], bs["ConvBN_0"])
            _fill_convbn(tb.c2, bp["ConvBN_1"], bs["ConvBN_1"])
            if tb.down is not None:
                _fill_conv(tb.down[0], bp["ConvBN_2"]["Conv_0"])
                _fill_bn(tb.down[1], bp["ConvBN_2"]["BatchNorm_0"],
                         bs["ConvBN_2"]["BatchNorm_0"])
    for i in range(4):
        _fill_convbn(tm.features.branches[i], fe[f"branch{i}"], fs[f"branch{i}"])
    _fill_convbn(tm.features.last0, fe["lastconv0"], fs["lastconv0"])
    _fill_conv(tm.features.last1, fe["lastconv1"]["Conv_0"])

    # fused stem stores its conv kernel directly under dres0_0
    _fill_conv(tm.dres0_0.conv, {"kernel": params["dres0_0"]["kernel"]})
    _fill_bn(tm.dres0_0.bn, params["dres0_0"]["BatchNorm_0"],
             stats["dres0_0"]["BatchNorm_0"])
    for name, tmod in [("dres0_1", tm.dres0_1), ("dres1_0", tm.dres1_0),
                       ("dres1_1", tm.dres1_1)]:
        _fill_convbn(tmod, params[name], stats[name])
    for i, dres in enumerate(("dres2", "dres3", "dres4")):
        hp, hs = params[dres], stats[dres]
        thg = tm.hg[i]
        for c in ("conv1", "conv2", "conv3", "conv4"):
            _fill_convbn(getattr(thg, c), hp[c], hs[c])
        for c in ("conv5", "conv6"):
            _fill_conv(getattr(thg, c), {"kernel": hp[c]["kernel"]},
                       transpose3d=True)
            _fill_bn(getattr(thg, f"{c}_bn"), hp[f"{c}_bn"], hs[f"{c}_bn"])
    for i, cname in enumerate(("classif1", "classif2", "classif3")):
        _fill_convbn(tm.cls[i]["c0"], params[cname]["c0"], stats[cname]["c0"])
        _fill_conv(tm.cls[i]["c1"], params[cname]["c1"]["Conv_0"])


def run_golden(maxdisp=16, h=256, w=320):
    """Run the flax PSMNet and its weight-matched torch twin in f64.

    Two precision traps make f32 comparison meaningless here:
      * identity running stats normalize nothing, so random-init stacks
        drift to ~1e5 activations over 50 layers — fixed by harvesting
        REAL batch statistics from one train-mode apply (the pure batch
        stats are recovered from the momentum update new = 0.9 old +
        0.1 batch with old = (0, 1)), which keeps activations O(1);
      * XLA's CPU convolution is itself only ~2.6e-3-accurate vs an
        exact f64 conv (torch's is exact), and the small per-layer BN
        variances amplify that ~10x per stage.  Running BOTH sides in
        f64 removes the kernel-precision term and leaves pure model
        semantics.
    """
    import flax

    rng = np.random.RandomState(0)
    imL = rng.rand(1, h, w, 3)
    imR = rng.rand(1, h, w, 3)
    with jax.enable_x64():
        model = create_model("psmnet", maxdisparity=maxdisp)
        # init with f32 images (some param inits hard-code f32), then
        # promote the whole tree to f64 for the comparison run
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
        tm = TorchPSMNet(maxdisp).double()
        export_weights(tm, variables["params"], variables["batch_stats"])
        tm.eval()
        scales, disps = model.apply(variables, jnp.asarray(imL),
                                    jnp.asarray(imR), train=False)
        disps = [np.asarray(d, np.float64) for d in disps]
    with torch.no_grad():
        touts = tm(torch.from_numpy(imL.transpose(0, 3, 1, 2)),
                   torch.from_numpy(imR.transpose(0, 3, 1, 2)))
    return disps, [t.numpy() for t in touts]


def test_psmnet_matches_torch_golden():
    disps, touts = run_golden()
    assert len(disps) == 3
    for i, (ours, ref) in enumerate(zip(disps, touts)):
        if ours.ndim == 4:
            ours = ours[..., 0]
        assert ours.shape == ref.shape, (i, ours.shape, ref.shape)
        err = np.max(np.abs(ours - ref))
        scale = max(np.max(np.abs(ref)), 1e-3)
        assert err / scale < 1e-6, f"head {i}: max err {err} (scale {scale})"
