"""PSMNet (basic): the non-hourglass variant (models/psmnet/basic.py).

Same SPP feature extractor and D/4 concat cost volume as the stacked
model, regularized by five residual 3-D conv blocks and a single
classifier (basic.py:18-42,80-90).  Registered as ``psmnet_basic``; the
reference defines it but never wires it into its factory — included for
complete zoo parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops import concat_cost_volume
from ..ops.regression import trilinear_soft_argmin
from .layers import ConvBN, crop_add
from .psmnet import _FeatureExtraction

__all__ = ["PSMNetBasic"]


class PSMNetBasic(nn.Module):
    maxdisparity: int = 192
    count_levels: int = 1

    @nn.compact
    def __call__(self, imL, imR, train: bool = True, clamp: bool = False):
        assert imL.shape == imR.shape
        feat = _FeatureExtraction(name="feature_extraction")
        fL = feat(imL, train)
        fR = feat(imR, train)
        cost = concat_cost_volume(fL, fR, self.maxdisparity // 4, mask_left=True)

        c3 = lambda f, relu, name: ConvBN(f, 3, 1, dims=3, use_bias=False, bn=True,
                                          relu=relu, name=name)
        x = c3(32, True, "dres0_0")(cost, train)
        x = c3(32, True, "dres0_1")(x, train)
        for i in range(1, 5):
            y = c3(32, True, f"dres{i}_0")(x, train)
            y = c3(32, False, f"dres{i}_1")(y, train)
            x = crop_add(y, x)

        out = c3(32, True, "classify_0")(x, train)
        out = ConvBN(1, 3, 1, dims=3, use_bias=False, bn=False, relu=False,
                     name="classify_1")(out, train)

        h, w = imL.shape[1], imL.shape[2]
        pred = trilinear_soft_argmin(out, (self.maxdisparity, h, w), negate=False)
        if clamp:
            pred = jnp.clip(pred, 1e-6, max(self.maxdisparity, w))
        return [0], [pred]
