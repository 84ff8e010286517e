"""Global sharding context consulted by compute ops.

TPU-native parallelism here is declarative: the trainer activates a
mesh + axis mapping, and ops apply ``with_sharding_constraint`` at the
tensors that matter (the D x H x W cost volume, activations).  XLA's
GSPMD partitioner then inserts the halo exchanges for spatially-sharded
convolutions and the gradient all-reduces over ICI — no hand-written
collectives (SURVEY §2.6, §5: the cost volume is this domain's
"context parallelism" dimension).
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "ShardingContext",
    "activate",
    "current",
    "shard_cost_volume",
    "shard_activation",
]


@dataclasses.dataclass(frozen=True)
class ShardingContext:
    mesh: Mesh
    data_axis: str | None = "data"
    spatial_axis: str | None = None  # shards H of activations / cost volumes


_ctx: contextvars.ContextVar[ShardingContext | None] = contextvars.ContextVar(
    "dsmnet_sharding", default=None
)


@contextlib.contextmanager
def activate(ctx: ShardingContext):
    token = _ctx.set(ctx)
    try:
        yield ctx
    finally:
        _ctx.reset(token)


def current() -> ShardingContext | None:
    return _ctx.get()


def shard_cost_volume(vol):
    """Constrain a (N, D, H, W, C) cost volume: batch over the data axis,
    H over the spatial axis.  XLA adds conv halo exchange as needed."""
    ctx = current()
    if ctx is None:
        return vol
    spec = P(ctx.data_axis, None, ctx.spatial_axis, None, None)
    return jax.lax.with_sharding_constraint(vol, NamedSharding(ctx.mesh, spec))


def shard_activation(x):
    """Constrain an NHWC activation: batch over data, H over spatial."""
    ctx = current()
    if ctx is None:
        return x
    spec = P(ctx.data_axis, ctx.spatial_axis, None, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(ctx.mesh, spec))
