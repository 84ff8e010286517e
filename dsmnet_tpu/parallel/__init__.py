"""Parallelism: device meshes, DP/spatial sharding, sharding context."""

from .halo import halo_conv2d
from .context import (
    ShardingContext,
    activate,
    current,
    shard_activation,
    shard_cost_volume,
)
from .mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .multihost import (
    global_batch_from_host_local,
    host_shard,
    init_distributed,
    is_primary_host,
    shard_dataset_for_host,
)

__all__ = [
    "ShardingContext",
    "activate",
    "current",
    "shard_activation",
    "shard_cost_volume",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
    "global_batch_from_host_local",
    "host_shard",
    "init_distributed",
    "is_primary_host",
    "shard_dataset_for_host",
    "halo_conv2d",
]
