from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
]
