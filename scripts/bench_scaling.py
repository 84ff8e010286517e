"""Data-parallel scaling harness on the simulated 8-device CPU mesh.

Measures train-step wall time vs data-axis size with a FIXED per-device
batch (weak scaling): perfect scaling = flat step time = efficiency 1.0.
On real hardware the same harness shape applies across chips/hosts; here
it validates that the sharded program's collective structure does not
degrade step time as the data axis grows (BASELINE.md:41-47 obligation;
single-chip env, so CPU-simulated).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
"""

from __future__ import annotations

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    # append (not setdefault): the axon sitecustomize pre-sets XLA_FLAGS
    # at interpreter start, which would make a setdefault a no-op
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from dsmnet_tpu import parallel
from dsmnet_tpu.losses import parse_loss_name
from dsmnet_tpu.models import create_model
from dsmnet_tpu.train import create_train_state, make_supervised_train_step


def step_time(mesh, data, per_device_batch=1, h=64, w=96, iters=4):
    model = create_model("dispnetcorr", maxdisparity=32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), sample_hw=(h, w))
    step = make_supervised_train_step(model, tx)
    spec = parse_loss_name("supervised", model.count_levels, 1)
    weights = jnp.asarray(spec.weights(10))

    n = data * per_device_batch
    rng = np.random.RandomState(0)
    b = rng.rand(n, h, w, 7).astype(np.float32)
    b[..., 6] = b[..., 6] * 10 + 1
    batch = parallel.shard_batch(jnp.asarray(b), mesh)
    state = jax.tree.map(
        lambda x: jax.device_put(x, parallel.replicated_sharding(mesh)), state
    )

    state, m = step(state, batch, 1e-4, weights)  # compile + warmup
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, 1e-4, weights)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def main():
    # This host has 2 physical cores simulating 8 XLA devices, so naive
    # weak scaling just measures total work.  The meaningful quantity
    # here is SPMD overhead: sharded over N virtual devices vs ONE
    # device at the SAME global batch — efficiency = t_1dev / t_Ndev.
    # On real multi-chip hardware the same harness measures true weak
    # scaling (each device is real compute).
    base = {}
    for data in (1, 2, 4, 8):
        gb = 8  # fixed global batch
        mesh1 = parallel.make_mesh(data=1, model=1, devices=jax.devices()[:1])
        if 1 not in base:
            base[1] = step_time(mesh1, 1, per_device_batch=gb)
            print(f"single-device, global batch {gb}: step {base[1]*1e3:8.1f} ms")
        mesh = parallel.make_mesh(data=data, model=1,
                                  devices=jax.devices()[:data])
        t = step_time(mesh, data, per_device_batch=gb // data)
        eff = base[1] / t
        print(f"data={data}: step {t*1e3:8.1f} ms | global batch {gb} | "
              f"SPMD efficiency vs 1 device {eff:6.1%}")


if __name__ == "__main__":
    main()
