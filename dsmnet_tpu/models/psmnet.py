"""PSMNet: SPP feature pyramid + stacked 3-D hourglasses + regression.

TPU-native re-design of models/psmnet/stackhourglass.py + submodule.py:
NHWC features, the Pallas ``concat_cost_volume`` kernel for the D/4
volume (reference Python loop stackhourglass.py:124-133, with the left
half masked like the right), NDHWC 3-D convs, align-corners trilinear
upsampling of the classifier costs to full resolution, and softmax
expectation disparity regression (stackhourglass.py:147-168).

Faithful quirks kept on purpose:
  * convbn uses padding=dilation for every kernel (submodule.py:10-13),
    so the SPP 1x1 branch convs pad by 1 before their bilinear upsample.
  * the third hourglass receives ``presqu=pre1`` (stackhourglass.py:144).
  * classifier costs accumulate: cost2 += cost1, cost3 += cost2.
  * train mode emits [pred3, pred2, pred1] all at scale 0; ``count_levels``
    is 1 so the loss weights the three heads equally (BASELINE.md notes
    this differs from the paper's 0.5/0.7/1.0).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..ops import concat_cost_volume, resize_bilinear
from ..ops.fused_costvol import cost_volume_conv3x3
from ..ops.regression import trilinear_soft_argmin
from ..parallel.context import shard_activation
from .layers import (
    ConvBN,
    FoldedConvBN3d,
    FoldedConvTo1,
    make_bn,
    ResBlockPSM,
    _FastDeconv3d,
    _FastDeconv3dFolded,
    conv_kernel_init,
    crop_add,
    default_dtype,
    siamese,
    torch_fanin_uniform,
)

__all__ = ["PSMNet"]


def _avg_pool(x, k):
    """k x k average pool, stride k (SPP branches, submodule.py:81-95)."""
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), [(0, 0)] * 4
    )
    return s / float(k * k)


class _FeatureExtraction(nn.Module):
    """submodule.py:65-140: stem + 4 residual stages + SPP + fuse -> 32ch @1/4."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(32, 3, 2, use_bias=False, bn=True, padding=1, name="firstconv0")(x, train)
        x = ConvBN(32, 3, 1, use_bias=False, bn=True, padding=1, name="firstconv1")(x, train)
        x = ConvBN(32, 3, 1, use_bias=False, bn=True, padding=1, name="firstconv2")(x, train)

        def stage(x, planes, blocks, stride, dilation, name):
            x = ResBlockPSM(planes, stride, dilation, name=f"{name}_0")(x, train)
            for i in range(1, blocks):
                x = ResBlockPSM(planes, 1, dilation, name=f"{name}_{i}")(x, train)
            return x

        x = stage(x, 32, 3, 1, 1, "layer1")
        raw = stage(x, 64, 16, 2, 1, "layer2")
        x = stage(raw, 128, 3, 1, 1, "layer3")
        skip = stage(x, 128, 3, 1, 2, "layer4")

        h, w = skip.shape[1], skip.shape[2]
        branches = []
        for i, k in enumerate((64, 32, 16, 8)):
            b = _avg_pool(skip, k)
            b = ConvBN(32, 1, 1, use_bias=False, bn=True, padding=1, name=f"branch{i}")(b, train)
            branches.append(resize_bilinear(b, (h, w)))

        fused = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)
        fused = ConvBN(128, 3, 1, use_bias=False, bn=True, padding=1, name="lastconv0")(fused, train)
        fused = ConvBN(32, 1, 1, use_bias=False, bn=False, relu=False, padding=0,
                       name="lastconv1")(fused, train)
        return fused


class _Hourglass(nn.Module):
    """stackhourglass.py:22-62: stride-2 down x2, deconv up x2 with
    presqu/postsqu cross-connections.

    With ``folded=True`` the whole stage runs on the dense-lane folded
    volume (ops/folded.py) — identical math and parameter tree, but no
    per-conv pad/refold/layout traffic; only the two deconvs round-trip
    through the unfolded form (coarse scales, cheap)."""

    planes: int
    folded: bool = False
    W: int = 0  # logical input W when folded

    @nn.compact
    def __call__(self, x, presqu, postsqu, train: bool = True):
        p = self.planes
        if self.folded:
            return self._folded(x, presqu, postsqu, train)
        c = lambda f, s, relu, name: ConvBN(
            f, 3, s, dims=3, use_bias=False, bn=True, relu=relu, name=name
        )
        out = c(p * 2, 2, True, "conv1")(x, train)
        pre = c(p * 2, 1, False, "conv2")(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = c(p * 2, 2, True, "conv3")(pre, train)
        out = c(p * 2, 1, True, "conv4")(out, train)

        # conv5/conv6: ConvTranspose3d k=3 s=2 p=1 op=1 (exact 2x) + BN;
        # torch geometry -> lax pads (k-1-p, k-1-p+op) = (1, 2), which is
        # exactly ops.conv3d.deconv3d_k3s2 (parity-folded GEMM on TPU)
        def up(f, name, y):
            y = _FastDeconv3d(
                f, use_bias=False, kernel_init=torch_fanin_uniform,
                bias_init=torch_fanin_uniform, dtype=default_dtype(), name=name,
            )(y)
            return make_bn(train, name=f"{name}_bn")(y)

        post = up(p * 2, "conv5", out)
        post = nn.relu(crop_add(post, presqu if presqu is not None else pre))
        out = up(p, "conv6", post)
        return out, pre, post

    def _folded(self, x, presqu, postsqu, train):
        from ..ops.folded import fold, folded_batchnorm_view, unfold

        p = self.planes
        W = self.W
        fc = lambda f, Ci, Wl, s, relu, name: FoldedConvBN3d(
            f, Ci, Wl, s, relu, name=name
        )
        out = fc(p * 2, p, W, 2, True, "conv1")(x, train)
        pre = fc(p * 2, p * 2, W // 2, 1, False, "conv2")(out, train)
        pre = nn.relu(pre + postsqu) if postsqu is not None else nn.relu(pre)

        out = fc(p * 2, p * 2, W // 2, 2, True, "conv3")(pre, train)
        out = fc(p * 2, p * 2, W // 4, 1, True, "conv4")(out, train)

        def up(f, name, y, Ci, W_in):
            if Ci == 64 and f == 32:
                # stays folded end-to-end (folded_deconv3d_k3s2): the
                # unfold/parity/fold round-trip of the full-volume
                # deconv6 was the largest remaining copy cluster in the
                # r5 trace (~23 ms/b4)
                yf = _FastDeconv3dFolded(
                    f, Ci, W_in, use_bias=False,
                    kernel_init=torch_fanin_uniform,
                    bias_init=torch_fanin_uniform, dtype=default_dtype(),
                    name=name,
                )(y)
            else:
                yu = unfold(y, Ci)
                yu = _FastDeconv3d(
                    f, use_bias=False, kernel_init=torch_fanin_uniform,
                    bias_init=torch_fanin_uniform, dtype=default_dtype(),
                    name=name,
                )(yu)
                yf = fold(yu)
            v = folded_batchnorm_view(yf, f)
            v = make_bn(train, name=f"{name}_bn")(v)
            return v.reshape(yf.shape)

        post = up(p * 2, "conv5", out, p * 2, W // 4)
        post = nn.relu(post + (presqu if presqu is not None else pre))
        out = up(p, "conv6", post, p * 2, W // 2)
        return out, pre, post


class _FusedStem(nn.Module):
    """Cost-volume build + dres0 first conv, fused (ops/fused_costvol.py):
    the D/4 x H x W x 2F volume is never materialized."""

    features: int
    D: int
    mask_left: bool = True

    @nn.compact
    def __call__(self, fL, fR, train: bool = True):
        f2 = 2 * fL.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init, (3, 3, 3, f2, self.features)
        )
        dt = default_dtype()
        if dt is not None:
            kernel = kernel.astype(dt)
            fL = fL.astype(dt)
            fR = fR.astype(dt)
        x = cost_volume_conv3x3(fL, fR, kernel, self.D, self.mask_left)
        x = make_bn(train)(x)
        return nn.relu(x)


class _Classifier(nn.Module):
    """stackhourglass.py:88-98: convbn3d+relu then 1-ch 3D conv."""

    folded: bool = False
    W: int = 0

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.folded:
            # c1 stays folded: lane-dense GEMM + free reshape into the
            # proven tapfold recombination (ops/folded.py
            # folded_conv3d_to1) — no unfold, no lane-padded read
            x = FoldedConvBN3d(32, 32, self.W, 1, name="c0")(x, train)
            return FoldedConvTo1(32, self.W, name="c1")(x)
        x = ConvBN(32, 3, 1, dims=3, use_bias=False, bn=True, name="c0")(x, train)
        x = ConvBN(1, 3, 1, dims=3, use_bias=False, bn=False, relu=False,
                   name="c1")(x, train)
        return x


class PSMNet(nn.Module):
    """models/psmnet/stackhourglass.py:64-168 (stacked-hourglass variant)."""

    maxdisparity: int = 192
    count_levels: int = 1
    fused_stem: bool = True  # fuse volume build + dres0 first conv
    remat: bool = False  # rematerialize hourglasses (trade FLOPs for HBM)

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        feat = _FeatureExtraction(name="feature_extraction")
        # one batch-2N tower pass for both views (layers.siamese); then
        # H-shard the 2-D features under a spatial mesh axis so they are
        # not fully replicated when the cost volume is sharded (GSPMD
        # inserts the conv halo exchanges)
        fL, fR = siamese(lambda x, t: feat(x, t), imL, imR, train)
        fL = shard_activation(fL)
        fR = shard_activation(fR)

        D4 = self.maxdisparity // 4

        c3 = lambda f, relu, name: ConvBN(f, 3, 1, dims=3, use_bias=False, bn=True,
                                          relu=relu, name=name)
        if self.fused_stem:
            cost0 = _FusedStem(32, D4, name="dres0_0")(fL, fR, train)
        else:
            cost = concat_cost_volume(fL, fR, D4, mask_left=True)
            cost0 = c3(32, True, "dres0_0")(cost, train)

        # folded-regularizer pathway (ops/folded.py): pay the fold
        # relayout once here instead of per-conv pad/layout traffic
        from ..ops import config as ops_config
        from ..ops.folded import fold, foldable

        H4, W4 = cost0.shape[2], cost0.shape[3]
        use_folded = (
            ops_config.folded_enabled()
            and foldable(cost0.shape)
            and D4 % 4 == 0 and H4 % 4 == 0 and W4 % 8 == 0
        )

        if use_folded:
            ff = lambda relu, name: FoldedConvBN3d(32, 32, W4, 1, relu, name=name)
            cf = fold(cost0)
            cf = ff(True, "dres0_1")(cf, train)
            d1 = ff(True, "dres1_0")(cf, train)
            d1 = ff(False, "dres1_1")(d1, train)
            cost0 = d1 + cf

            HG = nn.remat(_Hourglass, static_argnums=(4,)) if self.remat \
                else _Hourglass
            hg = lambda name: HG(32, folded=True, W=W4, name=name)
        else:
            cost0 = c3(32, True, "dres0_1")(cost0, train)
            d1 = c3(32, True, "dres1_0")(cost0, train)
            d1 = c3(32, False, "dres1_1")(d1, train)
            cost0 = crop_add(d1, cost0)

            HG = nn.remat(_Hourglass, static_argnums=(4,)) if self.remat \
                else _Hourglass
            hg = lambda name: HG(32, name=name)

        add = (lambda a, b: a + b) if use_folded else crop_add
        out1, pre1, post1 = hg("dres2")(cost0, None, None, train)
        out1 = add(out1, cost0)
        out2, pre2, post2 = hg("dres3")(out1, pre1, post1, train)
        out2 = add(out2, cost0)
        out3, pre3, post3 = hg("dres4")(out2, pre1, post2, train)
        out3 = add(out3, cost0)

        cls = lambda name: _Classifier(folded=use_folded, W=W4, name=name)
        cost1 = cls("classif1")(out1, train)
        cost2 = crop_add(cls("classif2")(out2, train), cost1)
        cost3 = crop_add(cls("classif3")(out3, train), cost2)

        h, w = imL.shape[1], imL.shape[2]
        full = (self.maxdisparity, h, w)

        def regress(cost):
            # chunked trilinear + softmax expectation: never materializes
            # the (N, D, H, W) upsampled logits (ops/regression.py)
            return trilinear_soft_argmin(cost, full, negate=False)

        pred3 = regress(cost3)
        pred1 = regress(cost1)
        pred2 = regress(cost2)
        if clamp:
            pred3 = jnp.clip(pred3, 1e-6, max(self.maxdisparity, w))
        return [0, 0, 0], [pred3, pred2, pred1]
