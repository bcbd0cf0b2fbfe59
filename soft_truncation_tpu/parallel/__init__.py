from .mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "replicated_sharding",
    "batch_sharding",
    "shard_batch",
]
