"""iResNet: initial disparity + iterative warp-based refinement.

TPU-native re-design of models/iresnet.py: the stem fuses stride-2/4
features back to full resolution 32-ch descriptors (iresnet.py:27-31,
93-104); the initial-disparity subnet is a DispNetC-style decoder over
an 81-shift correlation (iresnet.py:34-62,107-165); the refinement
subnet warps the right descriptors by -disp, forms a reconstruction
error, runs a stride-2 smoothed correlation (D=41, k=3, s=2) and adds
residuals to pr2/pr1/pr0 (iresnet.py:64-79,167-197).  The loop count is
static (default 1, as in the reference signature), so it unrolls cleanly
under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import corr1d, imwarp, upsample2x
from .layers import ConvBN, DeconvBN, crop_cat

__all__ = ["IResNet"]


class _PrHead(nn.Module):
    @nn.compact
    def __call__(self, x):
        return ConvBN(1, 3, 1, relu=False, kernel_scale=0.1)(x)


class IResNet(nn.Module):
    maxdisparity: int = 192
    count_levels: int = 7
    iterations: int = 1

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        h, w = imL.shape[1], imL.shape[2]
        outs, scales = [], []

        # ---- multi-scale shared stem (iresnet.py:27-31,93-104)
        conv1 = ConvBN(64, 7, 2, name="conv1")
        conv2 = ConvBN(128, 5, 2, name="conv2")
        deconv1_s = DeconvBN(32, 4, 2, name="deconv1_s")
        deconv2_s = DeconvBN(32, 8, 4, name="deconv2_s")
        conv_de = ConvBN(32, 1, 1, name="conv_de1_de2")

        # both views through the shared stem as one batch-2N pass
        # (layers.siamese; no BN in this family, bit-identical per view)
        n = imL.shape[0]
        conv1LR = conv1(jnp.concatenate([imL, imR], axis=0), train)
        conv2LR = conv2(conv1LR, train)
        up1LR = deconv1_s(conv1LR, train)[:, :h, :w, :]
        up2LR = deconv2_s(conv2LR, train)
        descLR = conv_de(crop_cat(up1LR, up2LR), train)
        conv1L, conv1R = conv1LR[:n], conv1LR[n:]
        conv2L, conv2R = conv2LR[:n], conv2LR[n:]
        descL, descR = descLR[:n], descLR[n:]

        # ---- initial disparity subnet (iresnet.py:107-165)
        corr = corr1d(conv2L, conv2R, D=81)
        redir = ConvBN(64, 1, 1, name="redir")(conv2L, train)
        x = ConvBN(256, 3, 2, name="conv3")(jnp.concatenate([corr, redir], -1), train)
        conv3_1 = ConvBN(256, 3, 1, name="conv3_1")(x, train)
        x = ConvBN(512, 3, 2, name="conv4")(conv3_1, train)
        conv4_1 = ConvBN(512, 3, 1, name="conv4_1")(x, train)
        x = ConvBN(512, 3, 2, name="conv5")(conv4_1, train)
        conv5_1 = ConvBN(512, 3, 1, name="conv5_1")(x, train)
        x = ConvBN(1024, 3, 2, name="conv6")(conv5_1, train)
        conv6_1 = ConvBN(1024, 3, 1, name="conv6_1")(x, train)

        pr6 = _PrHead(name="pr6")(conv6_1)
        outs.insert(0, pr6); scales.insert(0, 6)

        chans = {5: 512, 4: 256, 3: 128, 2: 64, 1: 32}
        skips = {5: conv5_1, 4: conv4_1, 3: conv3_1, 2: conv2L, 1: conv1L}
        x, pr = conv6_1, pr6
        prs = {}
        iconvs = {}
        for lvl in (5, 4, 3, 2, 1):
            deconv = DeconvBN(chans[lvl], 4, 2, name=f"deconv{lvl}")(x, train)
            x = ConvBN(chans[lvl], 3, 1, name=f"iconv{lvl}")(
                crop_cat(deconv, upsample2x(pr), skips[lvl]), train
            )
            pr = _PrHead(name=f"pr{lvl}")(x)
            prs[lvl] = pr
            iconvs[lvl] = x
            outs.insert(0, pr); scales.insert(0, lvl)

        deconv0 = DeconvBN(32, 4, 2, name="deconv0")(iconvs[1], train)
        iconv0 = ConvBN(32, 3, 1, name="iconv0")(
            crop_cat(deconv0, upsample2x(prs[1]), descL), train
        )
        pr0 = _PrHead(name="pr0")(iconv0)
        outs.insert(0, pr0); scales.insert(0, 0)

        # ---- iterative refinement (iresnet.py:64-79,167-197)
        r_pr2, r_pr1, r_pr0 = prs[2], prs[1], pr0
        r_conv0_m = ConvBN(32, 3, 1, name="r_conv0")
        r_conv1_m = ConvBN(64, 3, 2, name="r_conv1")
        c_conv1_m = ConvBN(64, 3, 1, name="c_conv1")
        r_conv1_1_m = ConvBN(64, 3, 1, name="r_conv1_1")
        r_conv2_m = ConvBN(128, 3, 2, name="r_conv2")
        r_conv2_1_m = ConvBN(128, 3, 1, name="r_conv2_1")
        r_res2_m = _PrHead(name="r_res2")
        r_deconv1_m = DeconvBN(64, 4, 2, name="r_deconv1")
        r_iconv1_m = ConvBN(64, 3, 1, name="r_iconv1")
        r_res1_m = _PrHead(name="r_res1")
        r_deconv0_m = DeconvBN(32, 4, 2, name="r_deconv0")
        r_iconv0_m = ConvBN(32, 3, 1, name="r_iconv0")
        r_res0_m = _PrHead(name="r_res0")

        # loop-invariant shared projection, both views in one batch pass
        c1LR = c_conv1_m(conv1LR, train)
        c1L, c1R = c1LR[:n], c1LR[n:]

        for _ in range(self.iterations):
            w_descL = imwarp(descR, -r_pr0)
            recon_err = jnp.abs(descL - w_descL)
            r_conv0 = r_conv0_m(crop_cat(recon_err, r_pr0, descL), train)
            r_conv1 = r_conv1_m(r_conv0, train)
            r_corr = corr1d(c1L, c1R, D=41, stride=2, kernel_size=3)
            r_conv1_1 = r_conv1_1_m(crop_cat(r_conv1, r_corr), train)
            r_conv2_1 = r_conv2_1_m(r_conv2_m(r_conv1_1, train), train)

            r_res2 = r_res2_m(r_conv2_1)
            r_pr2 = r_pr2 + r_res2
            outs.insert(0, r_pr2); scales.insert(0, 2)

            r_iconv1 = r_iconv1_m(
                crop_cat(r_deconv1_m(r_conv2_1, train), upsample2x(r_res2), r_conv1_1),
                train,
            )
            r_res1 = r_res1_m(r_iconv1)
            r_pr1 = r_pr1 + r_res1
            outs.insert(0, r_pr1); scales.insert(0, 1)

            r_iconv0 = r_iconv0_m(
                crop_cat(r_deconv0_m(r_iconv1, train), upsample2x(r_res1), r_conv0),
                train,
            )
            r_res0 = r_res0_m(r_iconv0)
            r_pr0 = r_pr0 + r_res0
            outs.insert(0, r_pr0); scales.insert(0, 0)

        outs = [o.astype(jnp.float32) for o in outs]  # heads back to f32
        if clamp:
            outs[0] = jnp.clip(outs[0], 1e-6, max(self.maxdisparity, w))
        return scales, outs
