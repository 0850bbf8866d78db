from .distributed import initialize_multihost, shard_global_batch
from .mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    image_sharding,
    make_mesh,
    max_safe_spatial_shards,
    replicate_state,
    replicated,
    shard_batch,
    validate_spatial_shards,
)

__all__ = [
    "DATA_AXIS",
    "SPACE_AXIS",
    "batch_sharding",
    "image_sharding",
    "initialize_multihost",
    "make_mesh",
    "max_safe_spatial_shards",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_global_batch",
    "validate_spatial_shards",
]
