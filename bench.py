"""Benchmark harness — prints ONE JSON line for the driver.

Mirrors the reference's only perf harness (models/test_models_time.py:
11-45: timed forward passes at KITTI resolution 1x3x375x1242) on the
flagship correlation model and reports frames/s.

Timing uses a serialized in-jit dependency chain with a host fetch
(dsmnet_tpu/utils/benchtime.py) — naive block_until_ready loops are
wildly optimistic through remote-executor TPU attachments.

``vs_baseline`` compares against the DispNet paper's published runtime
of 0.06 s/frame (~16.7 fps) on its 2015-era GPU (arXiv:1512.02134,
cited in BASELINE.md) — the closest thing the reference repo has to a
published speed number.

Extras (not part of the single-line contract):
  --ops    per-kernel microbenches (Pallas vs jnp corr / cost volume)
  --train  PSMNet supervised train-step throughput at crop resolution
  --dtype  bfloat16 switches the conv stacks to MXU-native compute
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
    variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)

    def fwd(imL, variables, imR):
        _, disps = model.apply(variables, imL, imR, train=False)
        return disps[0]

    import contextlib

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" else contextlib.nullcontext()
    with ctx:
        t = time_op(fwd, imL, variables, imR, n_small=1, n_big=6)
    return 1.0 / t


def bench_train(net="psmnet", h=256, w=512, batch=1, dtype="float32"):
    """Train-step throughput (fwd+bwd+Adam) at crop-ish resolution."""
    import contextlib

    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.losses import parse_loss_name
    from dsmnet_tpu.models import create_model
    from dsmnet_tpu.models.layers import compute_dtype
    from dsmnet_tpu.train import create_train_state, make_supervised_train_step
    from dsmnet_tpu.utils import time_pytree_step

    model = create_model(net, maxdisparity=192)
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
        t = time_pytree_step(one, state, b, n_small=1, n_big=4)
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
        jax.block_until_ready(fwd(variables, imL, imL))
        stats = jax.local_devices()[0].memory_stats() or {}
        out[w] = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", -1))
    return out


BASELINE_FPS = 16.7  # DispNet paper: 0.06 s/frame @ 1242x375


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="dispnetcorr")
    # f32 measured faster than bf16 for the conv-dominated DispNetC forward
    # on v5e (PERF.md); bf16 available for the cost-volume models
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--ops", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--memory", action="store_true")
    args = ap.parse_args()

    if args.ops:
        for k, v in bench_ops().items():
            print(f"# {k}: {v:.3f}")
    if args.train:
        fps = bench_train(dtype=args.dtype)
        print(f"# psmnet_train_fps_256x512: {fps:.3f}")
    if args.memory:
        for w, b in bench_memory(args.net).items():
            print(f"# {args.net}_peak_bytes_w{w}: {b}")

    fps = bench_forward(args.net, dtype=args.dtype)
    print(json.dumps({
        "metric": f"{args.net}_fwd_fps_375x1242_{args.dtype}",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
