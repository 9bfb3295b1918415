from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
