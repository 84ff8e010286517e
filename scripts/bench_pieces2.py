"""Round-3 consolidated timing of the yet-unmeasured PSMNet step pieces:
classifier, regression (current vs H-up-hoisted candidate), supervised
pyramid loss, fused stem full grad, parity deconv full grad.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_pieces2.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.models.psmnet import _Classifier, _FusedStem
from dsmnet_tpu.ops.conv3d import _deconv_parity
from dsmnet_tpu.ops.regression import trilinear_soft_argmin
from dsmnet_tpu.ops.resize import interp_matrix
from dsmnet_tpu.losses import supervised_pyramid_loss
from dsmnet_tpu.utils.benchtime import time_op

H, W = 384, 768
rng = np.random.RandomState(0)


def rep(name, fn, *a):
    t = time_op(fn, *a, n_big=6)
    print(f"{name:36s} {t*1e3:8.2f} ms", flush=True)


def grad_of(fn, argnum=0):
    def g(*a):
        return jax.grad(lambda x: jnp.sum(
            fn(*a[:argnum], x, *a[argnum + 1:]).astype(jnp.float32)))(a[argnum])
    return g


def tri_v2(cost, out_dhw, h_chunk=16):
    """Candidate: hoist the H-upsample out of the chunk loop so each
    chunk reads only its own coarse rows (the current version re-reads
    the full D-upsampled volume for every chunk)."""
    n, dc, hc_, wc, _ = cost.shape
    d, h, w = out_dhw
    x = cost[..., 0].astype(jnp.float32)
    Ad = jnp.asarray(interp_matrix(d, dc))
    Ah = jnp.asarray(interp_matrix(h, hc_))
    Aw = jnp.asarray(interp_matrix(w, wc))
    x = jnp.einsum("ed,ndhw->nehw", Ad, x)          # (N, D, Hc, Wc)
    x = jnp.einsum("ih,ndhw->ndiw", Ah, x)          # (N, D, H, Wc)
    nch = h // h_chunk
    xc = jnp.moveaxis(x.reshape(n, d, nch, h_chunk, wc), 2, 0)
    dvals = jnp.arange(d, dtype=jnp.float32)

    def one(xr):                                     # (N, D, hc, Wc)
        full = jnp.einsum("jw,ndiw->ndij", Aw, xr)   # (N, D, hc, W)
        p = jax.nn.softmax(full, axis=1)
        return jnp.einsum("ndij,d->nij", p, dvals)

    out = lax.map(one, xc)
    return jnp.moveaxis(out, 0, 1).reshape(n, h, w)[..., None]


with compute_dtype(jnp.bfloat16):
    vol = jnp.asarray(rng.rand(1, 48, 96, 192, 32), jnp.bfloat16)

    # classifier (c0 convbn + c1 conv->1ch)
    cl = _Classifier()
    clv = cl.init(jax.random.PRNGKey(4), vol, train=False)

    def clf(v):
        return cl.apply(clv, v, train=False)

    rep("classifier fwd", clf, vol)

    def clf_fullgrad(v):
        gx, gv = jax.grad(
            lambda a, b: jnp.sum(cl.apply(b, a, train=False).astype(jnp.float32)),
            argnums=(0, 1))(v, clv)
        return gx + sum(jnp.sum(l) for l in jax.tree.leaves(gv)).astype(gx.dtype)

    rep("classifier full grad", clf_fullgrad, vol)

    cost = clf(vol)

    # regression current vs v2
    def reg(c):
        return trilinear_soft_argmin(c, (192, H, W), negate=False)

    rep("regression fwd (current)", reg, cost)
    rep("regression fwd+bwd (current)", grad_of(reg), cost)

    def reg2(c):
        return tri_v2(c, (192, H, W))

    err = float(jnp.abs(reg2(cost) - reg(cost)).max())
    rep(f"regression fwd (v2, err {err:.1e})", reg2, cost)
    rep("regression fwd+bwd (v2)", grad_of(reg2), cost)

    # supervised pyramid loss on 3 full-res heads
    disp_gt = jnp.asarray(rng.rand(1, H, W, 1) * 100 + 1, jnp.float32)
    preds = [jnp.asarray(rng.rand(1, H, W, 1) * 90 + 1, jnp.float32) for _ in range(3)]
    wts = jnp.ones((3,), jnp.float32)

    def loss3(p0, p1, p2):
        return supervised_pyramid_loss(disp_gt, [p0, p1, p2], [0, 0, 0], wts, True)

    rep("supervised loss fwd (3 heads)", loss3, *preds)
    rep("supervised loss fwd+bwd", grad_of(loss3), *preds)

    # fused stem full grad
    fL = jnp.asarray(rng.rand(1, 96, 192, 32), jnp.bfloat16)
    fR = jnp.asarray(rng.rand(1, 96, 192, 32), jnp.bfloat16)
    stem = _FusedStem(32, 48)
    sv = stem.init(jax.random.PRNGKey(1), fL, fR, train=False)

    def stem_fullgrad(a, b):
        ga, gv = jax.grad(
            lambda aa, vv: jnp.sum(stem.apply(vv, aa, b, train=False)
                                   .astype(jnp.float32)), argnums=(0, 1))(a, sv)
        return ga + sum(jnp.sum(l) for l in jax.tree.leaves(gv)).astype(ga.dtype)

    rep("fused stem full grad", stem_fullgrad, fL, fR)

    # parity deconv full grads at hourglass shapes
    for nm, xs, co in [("conv5 dec 64->64 @12x24x48", (1, 12, 24, 48, 64), 64),
                       ("conv6 dec 64->32 @24x48x96", (1, 24, 48, 96, 64), 32)]:
        x = jnp.asarray(rng.randn(*xs) * 0.5, jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, 3, co, xs[-1]) * 0.05, jnp.bfloat16)

        def dec_fullgrad(a, b):
            ga, gk = jax.grad(
                lambda aa, bb: jnp.sum(_deconv_parity(aa, bb)
                                       .astype(jnp.float32)), argnums=(0, 1))(a, b)
            return ga + jnp.sum(gk).astype(ga.dtype)

        rep(f"{nm} fwd", _deconv_parity, x, k)
        rep(f"{nm} full grad", dec_fullgrad, x, k)
