"""Stage-level timing of PSMNet forward: feature extraction vs cost
stem vs hourglasses vs classifiers+regression.

Drives the round-2 optimization priority (VERDICT item 1): which stage
owns the 46.6 ms forward.
"""

from __future__ import annotations

import argparse
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.models.psmnet import _FeatureExtraction, _Hourglass, _Classifier, _FusedStem
from dsmnet_tpu.ops.regression import trilinear_soft_argmin
from dsmnet_tpu.utils.benchtime import time_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--hw", default="384,768")
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()
    h, w = map(int, args.hw.split(","))
    train = args.train

    rng = np.random.RandomState(0)
    imL = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)

    ctx = (
        compute_dtype(jnp.bfloat16)
        if args.dtype == "bfloat16"
        else contextlib.nullcontext()
    )

    with ctx:
        # --- feature extraction ---
        feat = _FeatureExtraction()
        fvars = feat.init(jax.random.PRNGKey(0), imL, train=False)

        def feat_fwd(im):
            return feat.apply(fvars, im, train=False)

        t = time_op(feat_fwd, imL, n_big=6)
        print(f"feature_extraction (x1)      {t*1e3:8.2f} ms")

        fL = feat_fwd(imL)
        fR = fL + 0.01
        D4 = 192 // 4

        # --- fused stem (volume + dres0_0) ---
        stem = _FusedStem(32, D4)
        svars = stem.init(jax.random.PRNGKey(1), fL, fR, train=False)

        def stem_fwd(a, b):
            return stem.apply(svars, a, b, train=False)

        t = time_op(stem_fwd, fL, fR, n_big=6)
        print(f"fused stem (vol+conv)        {t*1e3:8.2f} ms")

        vol = stem_fwd(fL, fR)

        # --- one 32->32 convbn3d at full volume ---
        from dsmnet_tpu.models.layers import ConvBN

        c3 = ConvBN(32, 3, 1, dims=3, use_bias=False, bn=True)
        cvars = c3.init(jax.random.PRNGKey(2), vol, train=False)

        def c3_fwd(v):
            return c3.apply(cvars, v, train=False)

        t3 = time_op(c3_fwd, vol, n_big=6)
        print(f"one convbn3d 32->32 full vol {t3*1e3:8.2f} ms")

        # --- one hourglass ---
        hg = _Hourglass(32)
        hvars = hg.init(jax.random.PRNGKey(3), vol, None, None, train=False)

        def hg_fwd(v):
            return hg.apply(hvars, v, None, None, train=False)[0]

        t = time_op(hg_fwd, vol, n_big=6)
        print(f"one hourglass                {t*1e3:8.2f} ms")

        # --- one classifier ---
        cl = _Classifier()
        clvars = cl.init(jax.random.PRNGKey(4), vol, train=False)

        def cl_fwd(v):
            return cl.apply(clvars, v, train=False)

        t = time_op(cl_fwd, vol, n_big=6)
        print(f"one classifier               {t*1e3:8.2f} ms")

        cost = cl_fwd(vol)

        # --- one regression head ---
        def reg_fwd(c):
            return trilinear_soft_argmin(c, (192, h, w), negate=False)

        t = time_op(reg_fwd, cost, n_big=6)
        print(f"one trilinear regression     {t*1e3:8.2f} ms")

        # --- whole model for reference ---
        model = create_model("psmnet", maxdisparity=192)
        imR = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)

        def fwd(a, v, b):
            return model.apply(v, a, b, train=False)[1][0]

        t = time_op(fwd, imL, variables, imR, n_big=6)
        print(f"WHOLE psmnet forward         {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
