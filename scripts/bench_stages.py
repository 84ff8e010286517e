"""Stage-level timing of PSMNet: feature extraction vs cost stem vs
hourglasses vs classifiers vs regression — forward AND forward+backward.

Locates where the train-step milliseconds live (fwd 67 ms / bwd ~170 ms
at 384x768 bf16, scripts/bench_split.py).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stages.py \
      [--dtype bfloat16] [--hw 384,768]
"""

from __future__ import annotations

import argparse
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import ConvBN, compute_dtype
from dsmnet_tpu.models.psmnet import (
    _Classifier,
    _FeatureExtraction,
    _FusedStem,
    _Hourglass,
)
from dsmnet_tpu.ops.regression import trilinear_soft_argmin
from dsmnet_tpu.utils.benchtime import time_op


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--hw", default="384,768")
    ap.add_argument("--no-grad", action="store_true")
    args = ap.parse_args()
    h, w = map(int, args.hw.split(","))

    rng = np.random.RandomState(0)
    imL = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)

    ctx = (
        compute_dtype(jnp.bfloat16)
        if args.dtype == "bfloat16"
        else contextlib.nullcontext()
    )

    def report(name, fn, *a):
        """fn(primal_arg, *rest) -> array; times fwd and fwd+bwd."""
        t = time_op(fn, *a, n_big=6)
        line = f"{name:28s} fwd {t*1e3:8.2f} ms"
        if not args.no_grad:
            def loss(x, *rest):
                return jnp.sum(fn(x, *rest).astype(jnp.float32))

            def fwdbwd(x, *rest):
                return jax.grad(loss)(x, *rest)

            tg = time_op(fwdbwd, *a, n_big=6)
            line += f"   fwd+bwd(dx) {tg*1e3:8.2f} ms"
        print(line, flush=True)

    with ctx:
        feat = _FeatureExtraction()
        fvars = feat.init(jax.random.PRNGKey(0), imL, train=False)

        def feat_fwd(im):
            return feat.apply(fvars, im, train=False)

        report("feature_extraction (x1)", feat_fwd, imL)

        fL = feat_fwd(imL)
        fR = fL + 0.01
        D4 = 192 // 4

        stem = _FusedStem(32, D4)
        svars = stem.init(jax.random.PRNGKey(1), fL, fR, train=False)
        report("fused stem (vol+conv)",
               lambda a, b: stem.apply(svars, a, b, train=False), fL, fR)

        vol = stem.apply(svars, fL, fR, train=False)

        c3 = ConvBN(32, 3, 1, dims=3, use_bias=False, bn=True)
        cvars = c3.init(jax.random.PRNGKey(2), vol, train=False)
        report("one convbn3d 32->32 full",
               lambda v: c3.apply(cvars, v, train=False), vol)

        if not args.no_grad:
            # full grad (dx + dK) of the single conv — the honest
            # per-conv backward cost inside training
            def c3_loss(v, cv):
                return jnp.sum(c3.apply(cv, v, train=False).astype(jnp.float32))

            def c3_full(v, cv):
                gx, gv = jax.grad(c3_loss, argnums=(0, 1))(v, cv)
                leaves = jax.tree_util.tree_leaves(gv)
                return gx + sum(jnp.sum(l) for l in leaves).astype(gx.dtype)

            t = time_op(c3_full, vol, cvars, n_big=6)
            print(f"{'  conv3d full grad (dx+dK)':28s} fwd+bwd {t*1e3:8.2f} ms",
                  flush=True)

        hg = _Hourglass(32)
        hvars = hg.init(jax.random.PRNGKey(3), vol, None, None, train=False)
        report("one hourglass",
               lambda v: hg.apply(hvars, v, None, None, train=False)[0], vol)

        cl = _Classifier()
        clvars = cl.init(jax.random.PRNGKey(4), vol, train=False)
        report("one classifier",
               lambda v: cl.apply(clvars, v, train=False), vol)

        cost = cl.apply(clvars, vol, train=False)
        report("one trilinear regression",
               lambda c: trilinear_soft_argmin(c, (192, h, w), negate=False),
               cost)

        model = create_model("psmnet", maxdisparity=192)
        imR = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)
        report("WHOLE psmnet",
               lambda a, v, b: model.apply(v, a, b, train=False)[1][0],
               imL, variables, imR)


if __name__ == "__main__":
    main()
