from .mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
    stacked_batch_sharding,
    shard_stacked_batch,
)

__all__ = [
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
    "stacked_batch_sharding",
    "shard_stacked_batch",
]
