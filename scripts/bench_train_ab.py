"""A/B the PSMNet train step (the bench contract metric) across:
  * dtype f32 vs bf16
  * fused stem vs unfused volume+conv
  * batch size
  * fast custom-VJP conv3d vs plain nn.Conv

Honest methodology: state is a traced jit argument; serialized chain
timing (utils/benchtime).  Run alone — concurrent host load skews the
remote-dispatch pipeline.
"""

import argparse

from bench import bench_train  # repo-root bench.py


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="f32,bf16")
    ap.add_argument("--batch", default=1, type=int)
    ap.add_argument("--hw", default="384,768")
    args = ap.parse_args()
    h, w = map(int, args.hw.split(","))

    import dsmnet_tpu.models.psmnet as psm

    for case in args.cases.split(","):
        kwargs = dict(h=h, w=w, batch=args.batch)
        if case == "f32":
            fps = bench_train(dtype="float32", **kwargs)
        elif case == "bf16":
            fps = bench_train(dtype="bfloat16", **kwargs)
        elif case == "f32-unfused":
            orig = psm.PSMNet.fused_stem
            psm.PSMNet.fused_stem = False
            try:
                fps = bench_train(dtype="float32", **kwargs)
            finally:
                psm.PSMNet.fused_stem = orig
        elif case == "bf16-unfused":
            orig = psm.PSMNet.fused_stem
            psm.PSMNet.fused_stem = False
            try:
                fps = bench_train(dtype="bfloat16", **kwargs)
            finally:
                psm.PSMNet.fused_stem = orig
        elif case == "f32-remat":
            fps = bench_train(dtype="float32", remat=True, **kwargs)
        elif case == "bf16-remat":
            fps = bench_train(dtype="bfloat16", remat=True, **kwargs)
        elif case == "f32-noplainvjp":
            import dsmnet_tpu.models.layers as L
            orig = L.ConvBN.__call__
            # disable the fast3d custom-VJP path by monkeypatching the gate
            import dsmnet_tpu.ops.conv3d as c3
            orig_fast = c3.conv3d_same
            import jax.numpy as jnp
            from jax import lax

            def plain(x, k):
                dn = lax.conv_dimension_numbers(
                    x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
                pads = [((s - 1) // 2, (s - 1) // 2) for s in k.shape[:3]]
                return lax.conv_general_dilated(
                    x, k, (1, 1, 1), pads, dimension_numbers=dn)

            c3.conv3d_same = plain
            try:
                fps = bench_train(dtype="float32", **kwargs)
            finally:
                c3.conv3d_same = orig_fast
        else:
            raise SystemExit(f"unknown case {case}")
        print(f"psmnet train {case} b{args.batch} {h}x{w}: "
              f"{fps:.3f} frames/s ({args.batch/fps*1e3:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
