"""DispNet and DispNetC (1-D correlation variant).

TPU-native re-design of the reference encoder-decoder pair
(models/dispnet.py, models/dispnetcorr.py): NHWC layout, XLA convs on
the MXU, and the Pallas ``corr1d`` kernel for DispNetC's 41-shift
correlation at 1/4 resolution (dispnetcorr.py:27,77).

Contract (shared by the whole zoo): ``__call__(imL, imR)`` returns
``(scales, disps)`` where ``scales[i]`` is the log2 downsample factor of
``disps[i]`` and ``disps[0]`` is full resolution.  ``count_levels`` feeds
the loss's level-weight curriculum (dispnet.py:19, losses/loss.py:379).

Note: in test mode the reference clamps ``out[-1]`` — the *coarsest*
level — to [1e-6, maxD] (dispnet.py:127), an apparent indexing slip since
all consumers read ``disps[0]``.  We clamp the full-resolution output,
which is the evident intent (deploy/deploy.py:31 uses disps[0]).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import corr1d, upsample2x
from .layers import ConvBN, DeconvBN, crop_cat

__all__ = ["DispNet", "DispNetC"]


class _PrHead(nn.Module):
    """Disparity prediction head: plain 3x3 conv, weights scaled by 0.1
    (dispnet.py:37,61-62)."""

    @nn.compact
    def __call__(self, x):
        return ConvBN(1, 3, 1, relu=False, kernel_scale=0.1)(x)


class _DispDecoder(nn.Module):
    """The shared 6-level decoder (dispnet.py:36-122): deconv + crop-concat
    [deconv, upsampled pr, skip] + iconv + 1-ch pr head per level."""

    @nn.compact
    def __call__(self, bottleneck, skips, train: bool = True):
        # skips: dict level -> feature map (5: conv5b, 4: conv4b, 3: conv3b,
        # 2: conv2, 1: conv1)
        chans = {5: 512, 4: 256, 3: 128, 2: 64, 1: 32}
        outs, scales = [], []

        pr = _PrHead(name="pr6")(bottleneck)
        outs.insert(0, pr)
        scales.insert(0, 6)

        x = bottleneck
        for lvl in (5, 4, 3, 2, 1):
            pr_up = upsample2x(pr)
            deconv = DeconvBN(chans[lvl], 4, 2, name=f"deconv{lvl}")(x, train)
            x = ConvBN(chans[lvl], 3, 1, name=f"iconv{lvl}")(
                crop_cat(deconv, pr_up, skips[lvl]), train
            )
            pr = _PrHead(name=f"pr{lvl}")(x)
            outs.insert(0, pr)
            scales.insert(0, lvl)
        return scales, outs


def _finalize(scales, outs, im_shape, clamp: bool, maxdisp: int, delt: float = 1e-6):
    """Upsample pr1 to full res, crop to the input extent, optionally clamp
    (dispnet.py:122-127)."""
    h, w = im_shape[1], im_shape[2]
    pr0 = upsample2x(outs[0])[:, :h, :w, :]
    outs = [pr0] + outs
    scales = [0] + scales
    outs = [o.astype(jnp.float32) for o in outs]  # heads back to f32
    if clamp:
        outs[0] = jnp.clip(outs[0], delt, max(maxdisp, w))
    return scales, outs


class DispNet(nn.Module):
    """Plain encoder-decoder on concat(imL, imR) (models/dispnet.py)."""

    maxdisparity: int = 192
    count_levels: int = 7

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        x = jnp.concatenate([imL, imR], axis=-1)
        conv1 = ConvBN(64, 7, 2, name="conv1")(x, train)
        conv2 = ConvBN(128, 5, 2, name="conv2")(conv1, train)
        conv3a = ConvBN(256, 5, 2, name="conv3a")(conv2, train)
        conv3b = ConvBN(256, 3, 1, name="conv3b")(conv3a, train)
        conv4a = ConvBN(512, 3, 2, name="conv4a")(conv3b, train)
        conv4b = ConvBN(512, 3, 1, name="conv4b")(conv4a, train)
        conv5a = ConvBN(512, 3, 2, name="conv5a")(conv4b, train)
        conv5b = ConvBN(512, 3, 1, name="conv5b")(conv5a, train)
        conv6a = ConvBN(1024, 3, 2, name="conv6a")(conv5b, train)
        conv6b = ConvBN(1024, 3, 1, name="conv6b")(conv6a, train)

        skips = {5: conv5b, 4: conv4b, 3: conv3b, 2: conv2, 1: conv1}
        scales, outs = _DispDecoder(name="decoder")(conv6b, skips, train)
        return _finalize(scales, outs, imL.shape, clamp, self.maxdisparity)


class DispNetC(nn.Module):
    """Siamese towers + 1-D correlation (D=41) + redir skip
    (models/dispnetcorr.py:25-79)."""

    maxdisparity: int = 192
    count_levels: int = 7
    corr_d: int = 41

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        conv1 = ConvBN(64, 7, 2, name="conv1")
        conv2 = ConvBN(128, 5, 2, name="conv2")
        # both views through the shared towers as one batch-2N pass
        # (layers.siamese; no BN in this family, bit-identical per view)
        n = imL.shape[0]
        conv1LR = conv1(jnp.concatenate([imL, imR], axis=0), train)
        conv2LR = conv2(conv1LR, train)
        conv1L = conv1LR[:n]
        conv2L, conv2R = conv2LR[:n], conv2LR[n:]

        corr = corr1d(conv2L, conv2R, D=self.corr_d)
        redir = ConvBN(64, 1, 1, name="redir")(conv2L, train)
        x = jnp.concatenate([corr, redir], axis=-1)

        conv3a = ConvBN(256, 5, 2, name="conv3a")(x, train)
        conv3b = ConvBN(256, 3, 1, name="conv3b")(conv3a, train)
        conv4a = ConvBN(512, 3, 2, name="conv4a")(conv3b, train)
        conv4b = ConvBN(512, 3, 1, name="conv4b")(conv4a, train)
        conv5a = ConvBN(512, 3, 2, name="conv5a")(conv4b, train)
        conv5b = ConvBN(512, 3, 1, name="conv5b")(conv5a, train)
        conv6a = ConvBN(1024, 3, 2, name="conv6a")(conv5b, train)
        conv6b = ConvBN(1024, 3, 1, name="conv6b")(conv6a, train)

        skips = {5: conv5b, 4: conv4b, 3: conv3b, 2: conv2L, 1: conv1L}
        scales, outs = _DispDecoder(name="decoder")(conv6b, skips, train)
        return _finalize(scales, outs, imL.shape, clamp, self.maxdisparity)
