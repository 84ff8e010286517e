"""GCNet: concat cost volume + 3-D conv hourglass + soft-argmin.

TPU-native re-design of models/gcnet.py: the D x H x W x 2F cost volume
is built at 1/2 resolution by the Pallas ``concat_cost_volume`` kernel
(reference builds it with a Python shift loop, gcnet.py:131-135), the
3-D hourglass runs as NDHWC XLA convs on the MXU, and disparity is
recovered with softmax(-cost) expectation (gcnet.py:104-110).

Structure (gcnet.py:14-111):
  * 2-D features: 5x5/s2 conv + 8 residual blocks + 3x3 conv -> 32ch @1/2
  * volume: D = maxdisparity//2 concat volume (left half dense)
  * encoder: stride-2 3D convs l21/l24/l27/l30 (+two refine convs each)
  * decoder: five stride-2 transposed 3D convs l33..l37 with additive
    crop-glue skips; skip branches l19/20, l22/23, l25/26, l28/29
  * soft-argmin over the full-resolution 2D-long disparity axis
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import concat_cost_volume, soft_argmin
from ..parallel.context import shard_activation
from .layers import (ConvBN, DeconvBN, FoldedConvBN3d, FoldedDeconvBN3d,
                     crop_add, res_stack_gc, siamese)

__all__ = ["GCNet", "GCNetLR"]

_F = 32


class _Feature2D(nn.Module):
    """gcnet.py:14-29: 5x5/s2 conv(+BN+ReLU), 8 res blocks, plain 3x3."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = ConvBN(_F, 5, 2, bn=True, name="conv1")(x, train)
        x = res_stack_gc(_F, blocks=8, name="block1")(x, train)
        x = ConvBN(_F, 3, 1, relu=False, bn=False, name="conv2")(x, train)
        return x


class _Feature3D(nn.Module):
    """gcnet.py:32-111: 3-D hourglass over the cost volume + soft-argmin.

    With ``folded=True`` the encoder/skip convs run on the dense-lane
    folded volume (ops/folded.py) — GCNet's 64-channel volume is stored
    2x lane-padded in the unfolded form, so folding also HALVES the live
    volume memory.  Identical math and parameter tree."""

    folded: bool = False
    W: int = 0  # logical W of the input volume when folded
    remat: bool = False  # stage-wise rematerialization (folded path)
    D: int = 0  # volume disparity slices (only used when fL/fR passed)

    @nn.compact
    def __call__(self, vol, train: bool = True, fL=None, fR=None):
        if self.folded:
            return self._folded(vol, train, fL, fR)
        c3 = lambda f, s, name: ConvBN(f, 3, s, dims=3, bn=True, name=name)
        d3 = lambda f, name: DeconvBN(f, 3, 2, dims=3, bn=True, name=name)

        x18 = vol
        x21 = c3(_F * 2, 2, "l21")(x18, train)
        x24 = c3(_F * 2, 2, "l24")(x21, train)
        x27 = c3(_F * 2, 2, "l27")(x24, train)
        x30 = c3(_F * 4, 2, "l30")(x27, train)
        x31 = c3(_F * 4, 1, "l31")(x30, train)
        x32 = c3(_F * 4, 1, "l32")(x31, train)

        x29 = c3(_F * 2, 1, "l29")(c3(_F * 2, 1, "l28")(x27, train), train)
        x33 = crop_add(d3(_F * 2, "l33")(x32, train), x29)

        x26 = c3(_F * 2, 1, "l26")(c3(_F * 2, 1, "l25")(x24, train), train)
        x34 = crop_add(d3(_F * 2, "l34")(x33, train), x26)

        x23 = c3(_F * 2, 1, "l23")(c3(_F * 2, 1, "l22")(x21, train), train)
        x35 = crop_add(d3(_F * 2, "l35")(x34, train), x23)

        x20 = c3(_F, 1, "l20")(c3(_F, 1, "l19")(x18, train), train)
        x36 = crop_add(d3(_F, "l36")(x35, train), x20)

        x37 = DeconvBN(1, 3, 2, dims=3, bn=False, relu=False, name="l37")(x36, train)
        # (N, D2, H2, W2, 1) -> soft-argmin over the doubled disparity axis
        return soft_argmin(x37[..., 0], negate=True)

    def _folded(self, vol, train, fL=None, fR=None):
        from ..ops.folded import fold, unfold

        W = self.W
        # stage-wise remat: save only each stage's input; recompute the
        # conv+BN in the backward.  Cuts the 384x768 b1 train footprint
        # enough to matter because every GCNet volume tensor is ~0.9 GB.
        FC = nn.remat(FoldedConvBN3d, static_argnums=(2,)) if self.remat \
            else FoldedConvBN3d
        DB = nn.remat(DeconvBN, static_argnums=(2,)) if self.remat \
            else DeconvBN
        fc = lambda f, Ci, Wl, s, name: FC(
            f, Ci, Wl, s, relu=True, use_bias=True, name=name
        )

        def up(f, name, y, Ci):
            if Ci == 64 and f == 32:
                # folded end-to-end (ops/folded.folded_deconv3d_k3s2):
                # no unfold/parity/fold copies for the full-volume l36
                W_in = y.shape[3] * 128 // Ci
                FD = nn.remat(FoldedDeconvBN3d, static_argnums=(2,)) \
                    if self.remat else FoldedDeconvBN3d
                return FD(f, Ci, W_in, name=name)(y, train)
            yu = unfold(y, Ci)
            yu = DB(f, 3, 2, dims=3, bn=True, name=name)(yu, train)
            return fold(yu)

        if fL is not None:
            # volume rematerialization (VERDICT r4 task #3): the folded
            # volume x18 is 0.9 GB bf16 at the 384x768 recipe crop and is
            # consumed by BOTH l21 (encoder entry) and l19 (skip branch) —
            # keeping it as a backward residual is what pushed the r4
            # footprint 2% past one v5e.  Building it INSIDE each
            # consumer's checkpointed stage makes the saved residuals the
            # two 4.5 MB feature maps instead; the backward rebuilds the
            # volume (a bandwidth-only broadcast/shift, ~1 ms) twice.
            def _vol(a, b):
                return fold(concat_cost_volume(a, b, self.D, mask_left=False))

            def _enc_in(mdl, a, b):
                return mdl(_vol(a, b), train)

            def _skip_in(mdl19, mdl20, a, b):
                return mdl20(mdl19(_vol(a, b), train), train)

            l21m = fc(_F * 2, _F * 2, W, 2, "l21")
            l19m = fc(_F, _F * 2, W, 1, "l19")
            l20m = fc(_F, _F, W, 1, "l20")
            x21 = nn.remat(_enc_in)(l21m, fL, fR)
            x24 = fc(_F * 2, _F * 2, W // 2, 2, "l24")(x21, train)
            x27 = fc(_F * 2, _F * 2, W // 4, 2, "l27")(x24, train)
            x30 = fc(_F * 4, _F * 2, W // 8, 2, "l30")(x27, train)
            x31 = fc(_F * 4, _F * 4, W // 16, 1, "l31")(x30, train)
            x32 = fc(_F * 4, _F * 4, W // 16, 1, "l32")(x31, train)

            x29 = fc(_F * 2, _F * 2, W // 8, 1, "l29")(
                fc(_F * 2, _F * 2, W // 8, 1, "l28")(x27, train), train)
            x33 = up(_F * 2, "l33", x32, _F * 4) + x29

            x26 = fc(_F * 2, _F * 2, W // 4, 1, "l26")(
                fc(_F * 2, _F * 2, W // 4, 1, "l25")(x24, train), train)
            x34 = up(_F * 2, "l34", x33, _F * 2) + x26

            x23 = fc(_F * 2, _F * 2, W // 2, 1, "l23")(
                fc(_F * 2, _F * 2, W // 2, 1, "l22")(x21, train), train)
            x35 = up(_F * 2, "l35", x34, _F * 2) + x23

            # skip branch built late so its forward live window is short
            x20 = nn.remat(_skip_in)(l19m, l20m, fL, fR)
            x36 = up(_F, "l36", x35, _F * 2) + x20

            x37 = DeconvBN(1, 3, 2, dims=3, bn=False, relu=False,
                           name="l37")(unfold(x36, _F), train)
            return soft_argmin(x37[..., 0], negate=True)

        x18 = fold(vol)  # C = 2F = 64
        x21 = fc(_F * 2, _F * 2, W, 2, "l21")(x18, train)
        x24 = fc(_F * 2, _F * 2, W // 2, 2, "l24")(x21, train)
        x27 = fc(_F * 2, _F * 2, W // 4, 2, "l27")(x24, train)
        x30 = fc(_F * 4, _F * 2, W // 8, 2, "l30")(x27, train)
        x31 = fc(_F * 4, _F * 4, W // 16, 1, "l31")(x30, train)
        x32 = fc(_F * 4, _F * 4, W // 16, 1, "l32")(x31, train)

        x29 = fc(_F * 2, _F * 2, W // 8, 1, "l29")(
            fc(_F * 2, _F * 2, W // 8, 1, "l28")(x27, train), train)
        x33 = up(_F * 2, "l33", x32, _F * 4) + x29

        x26 = fc(_F * 2, _F * 2, W // 4, 1, "l26")(
            fc(_F * 2, _F * 2, W // 4, 1, "l25")(x24, train), train)
        x34 = up(_F * 2, "l34", x33, _F * 2) + x26

        x23 = fc(_F * 2, _F * 2, W // 2, 1, "l23")(
            fc(_F * 2, _F * 2, W // 2, 1, "l22")(x21, train), train)
        x35 = up(_F * 2, "l35", x34, _F * 2) + x23

        x20 = fc(_F, _F, W, 1, "l20")(
            fc(_F, _F * 2, W, 1, "l19")(x18, train), train)
        x36 = up(_F, "l36", x35, _F * 2) + x20

        x37 = DeconvBN(1, 3, 2, dims=3, bn=False, relu=False,
                       name="l37")(unfold(x36, _F), train)
        return soft_argmin(x37[..., 0], negate=True)


class GCNet(nn.Module):
    """models/gcnet.py:113-137. Returns a single full-resolution map."""

    maxdisparity: int = 192
    count_levels: int = 1
    remat: bool = False  # rematerialize 3-D tower stages (folded path)

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        feat = _Feature2D(name="layer2d")
        # one batch-2N tower pass (layers.siamese) + H-sharding (psmnet.py)
        fL, fR = siamese(lambda x, t: feat(x, t), imL, imR, train)
        fL = shard_activation(fL)
        fR = shard_activation(fR)
        D = self.maxdisparity // 2
        from ..ops import config as ops_config
        from ..ops.folded import foldable

        n = fL.shape[0]
        h2, w2 = fL.shape[1], fL.shape[2]
        vol_shape = (n, D, h2, w2, 2 * fL.shape[-1])
        use_folded = (
            ops_config.folded_enabled() and foldable(vol_shape)
            and D % 16 == 0 and h2 % 16 == 0 and w2 % 16 == 0
        )
        reg = _Feature3D(folded=use_folded, W=w2, remat=self.remat, D=D,
                         name="layer3d")
        if use_folded and self.remat:
            # volume built inside the consumer stages' remat (see
            # _Feature3D._folded) — never a saved backward residual
            disp = reg(None, train, fL=fL, fR=fR)
        else:
            vol = concat_cost_volume(fL, fR, D, mask_left=False)
            disp = reg(vol, train)
        h, w = imL.shape[1], imL.shape[2]
        disp = disp[:, :h, :w, :]
        if clamp:
            disp = jnp.clip(disp, 1e-6, max(self.maxdisparity, w))
        return [0], [disp]


class GCNetLR(nn.Module):
    """Bidirectional GCNet (gcnet.py:139-167 gcnet_LR): shares the 2-D/3-D
    towers and regresses both the left and the right disparity.

    The right view is computed with the mirror trick the reference's own
    deploy tool uses for right disparities (deploy/deploy.py:61-65):
    swap + flip the pair, reuse the left-view volume/regularizer, and
    un-mirror the result.  (The reference's gcnet_LR instead builds xR
    with opposite shifts and runs the unmirrored regularizer — the same
    correspondence geometry up to the conv weights' horizontal
    orientation; this variant is unreachable from its factory.)"""

    maxdisparity: int = 192

    @nn.compact
    def __call__(self, imL, imR, train: bool = True):
        assert imL.shape == imR.shape
        feat = _Feature2D(name="layer2d")
        # one batch-2N tower pass (layers.siamese) + H-sharding (psmnet.py)
        fL, fR = siamese(lambda x, t: feat(x, t), imL, imR, train)
        fL = shard_activation(fL)
        fR = shard_activation(fR)
        D = self.maxdisparity // 2
        volL = concat_cost_volume(fL, fR, D, mask_left=False)
        # right-view volume == left-view volume of the horizontally
        # mirrored pair (swap + flip W), evaluated with shared weights
        volR = concat_cost_volume(
            jnp.flip(fR, axis=2), jnp.flip(fL, axis=2), D, mask_left=False
        )
        reg = _Feature3D(name="layer3d")
        h, w = imL.shape[1], imL.shape[2]
        oL = reg(volL, train)[:, :h, :w, :]
        oR = jnp.flip(reg(volR, train), axis=2)[:, :h, :w, :]
        return oL, oR
