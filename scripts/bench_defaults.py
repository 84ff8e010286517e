"""Model-level A/B for every kernel default (VERDICT r3 next-#3).

Re-validates each op-implementation switch INSIDE the model that uses
it, per (shape, dtype) — the defaults must cite these numbers:

  * corr1d Pallas vs jnp inside DispNetC + iResNet forward (KITTI res)
  * concat cost volume Pallas vs jnp inside f32 + bf16 GCNet forward
  * stride-2 conv3d pallas vs native inside the PSMNet train step

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_defaults.py
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.ops import config
from dsmnet_tpu.utils import time_op


def fwd_time(net, dtype, h=375, w=1242, maxd=192):
    model = create_model(net, maxdisparity=maxd)
    rng = np.random.RandomState(0)
    imL = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    imR = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    small = jnp.zeros((1, 256, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), small, small, train=False)

    def fwd(imL, variables, imR):
        return model.apply(variables, imL, imR, train=False)[1][0]

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" \
        else contextlib.nullcontext()
    with ctx:
        return time_op(fwd, imL, variables, imR, n_small=1, n_big=6) * 1e3


def main():
    print("== corr1d: use_pallas inside DispNetC / iResNet fwd ==")
    for net in ("dispnetcorr", "iresnet"):
        for dtype in ("float32", "bfloat16"):
            row = {}
            for up in (False, True):
                config.use_pallas = up
                try:
                    row["pallas" if up else "jnp"] = fwd_time(net, dtype)
                except Exception as e:  # noqa: BLE001
                    row["pallas" if up else "jnp"] = float("nan")
                    print(f"  {net} {dtype} use_pallas={up}: {type(e).__name__}")
            config.use_pallas = None
            print(f"  {net} {dtype}: jnp {row.get('jnp', float('nan')):7.2f} ms | "
                  f"pallas {row.get('pallas', float('nan')):7.2f} ms")

    print("== cost volume: use_pallas inside GCNet fwd (384x768) ==")
    for dtype in ("float32", "bfloat16"):
        row = {}
        for up in (False, True):
            config.use_pallas = up
            try:
                row["pallas" if up else "jnp"] = fwd_time(
                    "gcnet", dtype, h=384, w=768)
            except Exception as e:  # noqa: BLE001
                row["pallas" if up else "jnp"] = float("nan")
                print(f"  gcnet {dtype} use_pallas={up}: {type(e).__name__}")
        config.use_pallas = None
        print(f"  gcnet {dtype}: jnp {row.get('jnp', float('nan')):7.2f} ms | "
              f"pallas {row.get('pallas', float('nan')):7.2f} ms")


if __name__ == "__main__":
    main()
