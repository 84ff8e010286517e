"""Benchmark harness — prints ONE JSON line for the driver.

Primary contract metric (BASELINE.json north star): **PSMNet supervised
train frames/s/chip** at the reference's crop resolution 384x768
(DSMnet_train_sceneflow.sh recipe) — one fwd+bwd+Adam step through the
full SPP + cost volume + stacked 3-D hourglass stack.

``vs_baseline`` anchors against the PSMNet paper's published runtime of
0.41 s/frame on its Titan Xp (arXiv:1803.08669, cited in BASELINE.md) —
the only published speed number for the flagship model.  That number is
*inference*; training costs ~3x more, so the ratio understates the true
speedup.  The reference repo itself publishes no throughput numbers.

Timing uses a serialized in-jit dependency chain with a host fetch
(dsmnet_tpu/utils/benchtime.py) — naive block_until_ready loops are
wildly optimistic through remote-executor TPU attachments.

Extras (as '#'-prefixed lines, not part of the single-line contract):
  --fwd      per-model forward fps at KITTI resolution (mirrors the
             reference's models/test_models_time.py harness)
  --ops      per-kernel microbenches (Pallas vs jnp corr / cost volume)
  --memory   peak-memory-vs-width sweep (mirrors test_models_memory.py)
  --scaling  batch-size sweep: train fps vs per-chip batch
  --dtype    bfloat16 switches the conv stacks to MXU-native compute
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def bench_forward(net="dispnetcorr", h=375, w=1242, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.models.layers import compute_dtype
    from dsmnet_tpu.utils import time_op

    model = create_model(net, maxdisparity=192)
    rng = np.random.RandomState(0)
    imL = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    imR = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    # init at a small shape: params are shape-independent (fully conv)
    # and a full-size f32 init forward OOMs for GCNet-at-1242 class
    # models before the (bf16) timing even starts
    small = jnp.zeros((1, 256, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)

    def fwd(imL, variables, imR):
        _, disps = model.apply(variables, imL, imR, train=False)
        return disps[0]

    import contextlib

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" else contextlib.nullcontext()
    with ctx:
        t = time_op(fwd, imL, variables, imR, n_small=1, n_big=6)
    return 1.0 / t


def bench_train(net="psmnet", h=384, w=768, batch=1, dtype="float32", remat=False):
    """Train-step throughput (fwd+bwd+Adam) at crop-ish resolution."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.losses import parse_loss_name
    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.models.layers import compute_dtype
    from dsmnet_tpu.train import create_train_state, make_supervised_train_step
    from dsmnet_tpu.utils import time_pytree_step

    kwargs = {"remat": True} if remat else {}
    model = create_model(net, maxdisparity=192, **kwargs)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(64, 128))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    rng = np.random.RandomState(0)
    b = rng.rand(batch, h, w, 7).astype(np.float32)
    b[..., 6] = b[..., 6] * 100 + 1
    b = jnp.asarray(b)

    def one(state, batch):
        new_state, _ = step(state, batch, 1e-4, weights)
        return new_state

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" else contextlib.nullcontext()
    with ctx:
        # n_big=6/reps=4: the r3 driver capture (5.806) vs builder quotes
        # (6.17) disagreed by ~6% run to run; longer chains + best-of-4
        # keep the contract number within ~2-3% (VERDICT r3 weak-#4)
        t = time_pytree_step(one, state, b, n_small=1, n_big=6, reps=4)
    return batch / t


def bench_selfsup(net="dispnetcorr", h=384, w=768, batch=1, dtype="bfloat16"):
    """Self-supervised step throughput: flip + color-aug + DOUBLE forward
    + photometric pyramid loss + Adam, all in one jit (the reference's
    KITTI-raw depthmono-mask recipe, DSMnet_train_kitti-raw.sh)."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.losses import parse_loss_name
    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.models.layers import compute_dtype
    from dsmnet_tpu.train import create_train_state, make_selfsup_train_step
    from dsmnet_tpu.utils import time_pytree_step

    model = create_model(net, maxdisparity=192)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(64, 128))
    spec = parse_loss_name("depthmono-mask", model.count_levels, 1)
    step = make_selfsup_train_step(model, tx, spec.photo, nedge=64)
    weights = jnp.asarray(spec.weights(10))
    rng = np.random.RandomState(0)
    b = jnp.asarray(rng.rand(batch, h, w, 6).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def one(state, batch):
        new_state, _ = step(state, batch, 1e-4, weights, key)
        return new_state

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" else contextlib.nullcontext()
    with ctx:
        # n_big=6/reps=4: the r3 driver capture (5.806) vs builder quotes
        # (6.17) disagreed by ~6% run to run; longer chains + best-of-4
        # keep the contract number within ~2-3% (VERDICT r3 weak-#4)
        t = time_pytree_step(one, state, b, n_small=1, n_big=6, reps=4)
    return batch / t


def bench_ops():
    import jax.numpy as jnp

    from dsmnet_tpu.ops import (
        concat_cost_volume,
        concat_cost_volume_reference,
        corr1d,
        corr1d_reference,
    )
    from dsmnet_tpu.utils import time_op

    rng = np.random.RandomState(0)
    fL = jnp.asarray(rng.rand(1, 96, 312, 128), jnp.float32)
    fR = jnp.asarray(rng.rand(1, 96, 312, 128), jnp.float32)
    gL = jnp.asarray(rng.rand(1, 96, 312, 32), jnp.float32)
    gR = jnp.asarray(rng.rand(1, 96, 312, 32), jnp.float32)
    out = {}
    out["corr1d_pallas_ms"] = time_op(lambda a, b: corr1d(a, b, 41, use_pallas=True), fL, fR) * 1e3
    out["corr1d_jnp_ms"] = time_op(lambda a, b: corr1d_reference(a, b, 41), fL, fR) * 1e3
    out["costvol_pallas_ms"] = time_op(
        lambda a, b: concat_cost_volume(a, b, 48, use_pallas=True), gL, gR) * 1e3
    out["costvol_jnp_ms"] = time_op(
        lambda a, b: concat_cost_volume_reference(a, b, 48), gL, gR) * 1e3
    return out


def bench_memory(net="dispnetcorr", widths=(512, 768, 1024), h=384):
    """Peak-memory-vs-width sweep mirroring models/test_models_memory.py."""
    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.models import create_model

    out = {}
    for w in widths:
        model = create_model(net, maxdisparity=192)
        imL = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), imL, imL, train=False)
        fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False)[1][0])
        compiled = fwd.lower(variables, imL, imL).compile()
        ma = compiled.memory_analysis()
        if ma is not None:
            # compile-time HBM footprint: live temps + args + outputs
            # (runtime memory_stats() is unavailable through the remote
            # attachment)
            out[w] = int(ma.temp_size_in_bytes + ma.argument_size_in_bytes
                         + ma.output_size_in_bytes)
        else:
            jax.block_until_ready(fwd(variables, imL, imL))
            stats = jax.local_devices()[0].memory_stats() or {}
            out[w] = stats.get("peak_bytes_in_use",
                               stats.get("bytes_in_use", -1))
    return out


BASELINE_TRAIN_FPS = 2.44  # PSMNet paper: 0.41 s/frame (inference!) @ Titan Xp
BASELINE_FWD_FPS = 16.7    # DispNet paper: 0.06 s/frame @ 1242x375

# Published per-model INFERENCE runtime (s/frame at KITTI-ish resolution)
# from the papers the reference reproduces (BASELINE.md table) — the honest
# apples-to-apples anchor for bench_forward, since no training throughput
# was ever published for any of them.
PAPER_INFER_S = {
    "dispnet": 0.06,      # arXiv:1512.02134, 1242x375
    "dispnetcorr": 0.06,  # arXiv:1512.02134
    "iresnet": 0.12,      # arXiv:1712.01039 (KITTI leaderboard runtime)
    "gcnet": 0.90,        # arXiv:1703.04309
    "psmnet": 0.41,       # arXiv:1803.08669
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="psmnet")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    # batch 4 = the reference's own SceneFlow recipe batch
    # (DSMnet_train_sceneflow.sh:11) and the best measured fps/chip
    ap.add_argument("--batch", default=4, type=int)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--ops", action="store_true")
    ap.add_argument("--fwd", action="store_true")
    ap.add_argument("--selfsup", action="store_true")
    ap.add_argument("--memory", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    args = ap.parse_args()

    if args.ops:
        for k, v in bench_ops().items():
            print(f"# {k}: {v:.3f}")
    if args.fwd:
        for net in ("dispnet", "dispnetcorr", "iresnet", "gcnet", "psmnet"):
            fps = bench_forward(net, dtype=args.dtype)
            vs = fps * PAPER_INFER_S[net]
            print(f"# {net}_fwd_fps_375x1242_{args.dtype}: {fps:.3f} "
                  f"(vs paper inference {PAPER_INFER_S[net]:.2f}s/frame: {vs:.2f}x)")
    if args.memory:
        for w, b in bench_memory(args.net).items():
            print(f"# {args.net}_peak_bytes_w{w}: {b}")
    if args.selfsup:
        # --net psmnet reproduces BASELINE config #5's shape: the flagship
        # with double forward + photometric pyramid (stereo_selfsupervised.py)
        fps = bench_selfsup(net=args.net, batch=args.batch, dtype=args.dtype)
        print(f"# {args.net}_selfsup_fps_384x768_{args.dtype}_b{args.batch}: {fps:.3f}")
    if args.scaling:
        for b in (1, 2, 4, 8):
            try:
                fps = bench_train(args.net, batch=b, dtype=args.dtype,
                                  remat=args.remat)
                print(f"# {args.net}_train_fps_384x768_b{b}: {fps:.3f}")
            except Exception as e:  # noqa: BLE001 — OOM at large batch
                print(f"# {args.net}_train_fps_384x768_b{b}: failed ({type(e).__name__})")

    fps = bench_train(args.net, batch=args.batch, dtype=args.dtype,
                      remat=args.remat)
    print(json.dumps({
        "metric": f"{args.net}_train_fps_384x768_{args.dtype}_b{args.batch}",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_TRAIN_FPS, 3),
    }))


if __name__ == "__main__":
    main()
