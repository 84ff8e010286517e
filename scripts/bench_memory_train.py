"""Compile-time HBM footprint of the TRAIN step: batch x remat matrix.

Mirrors the reference's memory harness (models/test_models_memory.py:
21-64) for the training configuration that matters (VERDICT r3 next-#6):
records what remat actually saves and whether b8 fits the 15.75 GB chip.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_memory_train.py
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.models.layers import compute_dtype
from dsmnet_tpu.train import create_train_state, make_supervised_train_step


def footprint(batch: int, remat: bool, h=384, w=768, dtype="bfloat16"):
    kwargs = {"remat": True} if remat else {}
    model = create_model("psmnet", maxdisparity=192, **kwargs)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   sample_hw=(64, 128))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))
    b = np.zeros((batch, h, w, 7), np.float32)
    b[..., 6] = 10.0
    b = jnp.asarray(b)
    import contextlib

    ctx = compute_dtype(jnp.bfloat16) if dtype == "bfloat16" \
        else contextlib.nullcontext()
    with ctx:
        lowered = step.lower(state, b, 1e-4, weights)
        compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    return {
        "temp": ma.temp_size_in_bytes,
        "args": ma.argument_size_in_bytes,
        "out": ma.output_size_in_bytes,
    }


def main():
    gib = 1 << 30
    for remat in (False, True):
        for batch in (1, 2, 4, 8):
            try:
                r = footprint(batch, remat)
                if r is None:
                    print(f"b{batch} remat={remat}: memory_analysis unavailable")
                    continue
                tot = r["temp"] + r["args"] + r["out"]
                print(f"b{batch} remat={int(remat)}: temp {r['temp']/gib:6.2f} GiB"
                      f"  args {r['args']/gib:5.2f}  out {r['out']/gib:5.2f}"
                      f"  total {tot/gib:6.2f} GiB "
                      f"{'FITS' if tot < 15.75 * gib else 'OOM'} (15.75 budget)")
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:120] if str(e) else type(e).__name__
                print(f"b{batch} remat={int(remat)}: compile failed — {msg}")


if __name__ == "__main__":
    main()
