"""Device mesh construction and data/param placement.

The reference has zero distributed support (its DistributedDataParallel
line is commented out, stereo.py:34).  Here parallelism is built on
``jax.sharding``: a (data, model) mesh; batches sharded over ``data``;
parameters replicated; optional spatial sharding of tall activations /
cost volumes over ``model``.  Gradient all-reduce is inserted by XLA
over ICI.  Multi-host: call ``jax.distributed.initialize`` first and
feed per-host shards via ``make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
]


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh.  ``data=None`` uses all remaining
    devices after the model axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard a (N, ...) batch over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh, np.ndim(batch), axis))
