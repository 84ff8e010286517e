"""Benchmark harness — prints ONE JSON line for the driver.

Mirrors the reference's only perf harness (models/test_models_time.py:
11-45: 100 timed forward passes at KITTI resolution 1x3x375x1242,
2 warmup) on the flagship correlation model, then reports frames/s.

``vs_baseline`` compares against the DispNet paper's published runtime
of 0.06 s/frame (~16.7 fps) on its 2015-era GPU (arXiv:1512.02134,
cited in BASELINE.md) — the closest thing the reference repo has to a
published speed number.

Extra per-op microbenches can be run with --ops (not part of the
single-line contract).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 16.7  # DispNet paper: 0.06 s/frame @ 1242x375


def _sync(x):
    import jax

    jax.block_until_ready(x)


def bench_forward(net="dispnetcorr", h=375, w=1242, iters=50, warmup=3):
    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.models import create_model

    model = create_model(net, maxdisparity=192)
    rng = np.random.RandomState(0)
    imL = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    imR = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imL, imR, train=False)

    @jax.jit
    def fwd(variables, imL, imR):
        _, disps = model.apply(variables, imL, imR, train=False)
        return disps[0]

    for _ in range(warmup):
        _sync(fwd(variables, imL, imR))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, imL, imR)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def bench_ops():
    """Per-kernel microbenches: Pallas vs jnp corr1d and cost volume."""
    import jax
    import jax.numpy as jnp

    from dsmnet_tpu.ops import (
        concat_cost_volume,
        concat_cost_volume_reference,
        corr1d,
        corr1d_reference,
    )

    rng = np.random.RandomState(0)
    fL = jnp.asarray(rng.rand(1, 96, 312, 128), jnp.float32)
    fR = jnp.asarray(rng.rand(1, 96, 312, 128), jnp.float32)
    gL = jnp.asarray(rng.rand(1, 96, 312, 32), jnp.float32)
    gR = jnp.asarray(rng.rand(1, 96, 312, 32), jnp.float32)

    def timeit(fn, *args, iters=20):
        f = jax.jit(fn)
        _sync(f(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        _sync(out)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {}
    results["corr1d_pallas_ms"] = timeit(
        lambda a, b: corr1d(a, b, 41, use_pallas=True), fL, fR
    )
    results["corr1d_jnp_ms"] = timeit(
        lambda a, b: corr1d_reference(a, b, 41), fL, fR
    )
    results["costvol_pallas_ms"] = timeit(
        lambda a, b: concat_cost_volume(a, b, 48, use_pallas=True), gL, gR
    )
    results["costvol_jnp_ms"] = timeit(
        lambda a, b: concat_cost_volume_reference(a, b, 48), gL, gR
    )
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="dispnetcorr")
    ap.add_argument("--iters", default=50, type=int)
    ap.add_argument("--ops", action="store_true", help="also run op microbenches")
    args = ap.parse_args()

    if args.ops:
        for k, v in bench_ops().items():
            print(f"# {k}: {v:.3f}")

    fps = bench_forward(args.net, iters=args.iters)
    print(json.dumps({
        "metric": f"{args.net}_fwd_fps_375x1242",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
