from .mesh import (
    init_distributed, make_mesh, shard_batch, replicate, batch_sharding,
    spatial_batch_sharding,
)

__all__ = [
    "init_distributed", "make_mesh", "shard_batch", "replicate",
    "batch_sharding", "spatial_batch_sharding",
]
