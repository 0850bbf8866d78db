"""Device-mesh utilities for data-parallel + spatially partitioned runs.

The reference is single-GPU only (README strikes multi-GPU out,
SURVEY.md §2.10); the TPU-native scaling path is batch-axis data
parallelism over a ``jax.sharding.Mesh``. Parameters and optimizer state
are replicated; batches are sharded on the ``data`` axis; the gradient
all-reduce is inserted by XLA during jit lowering and rides ICI.

Spatial partitioning (``TPU.SPATIAL_SHARDS > 1``) adds a second mesh axis
that splits the image HEIGHT dimension across devices — the convnet
analog of sequence parallelism. The convolution halo exchanges at shard
boundaries are inserted by XLA's SPMD partitioner from the sharding
annotation alone (no manual ppermute): activations live H-sharded from
the stem down, cutting per-device activation memory by the spatial
factor, which is what lets a batch that would overflow one chip's HBM —
or a single very large image — run without host round-trips.

BatchNorm note: since the whole train step is one jitted SPMD program,
batch-stat reductions are global means over the full (sharded) batch —
i.e. sync-BN semantics by construction, on either mesh shape.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    num_devices: Optional[int] = None, devices=None, spatial: int = 1
) -> Mesh:
    """1-D ``(data,)`` mesh, or ``(data, space)`` when ``spatial > 1``.

    ``num_devices`` is the TOTAL device count (data shards x spatial
    shards); it must be divisible by ``spatial``.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    if spatial > 1:
        if len(devices) % spatial != 0:
            raise ValueError(
                f"{len(devices)} devices do not divide into "
                f"spatial={spatial} shards"
            )
        grid = np.array(devices).reshape(-1, spatial)
        return Mesh(grid, (DATA_AXIS, SPACE_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis (replicated over
    the space axis if one exists)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) images: batch over ``data``, height over ``space``."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return batch_sharding(mesh)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh: batch axis over ``data``
    everywhere; the ``img`` entry additionally H-sharded over ``space``
    on a spatial mesh.

    Multi-host meshes route through
    ``parallel.distributed.shard_global_batch`` (each process feeds only
    the rows its local devices own)."""
    if jax.process_count() > 1:
        from .distributed import shard_global_batch

        return shard_global_batch(batch, mesh)
    row = batch_sharding(mesh)
    img = image_sharding(mesh)
    return {
        k: (jax.device_put(v, img) if k == "img"
            else jax.tree.map(lambda x: jax.device_put(x, row), v))
        for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        # Cross-host replication: every process holds identical values
        # (deterministic init / restored checkpoint); hand jax the local
        # copy per addressable shard.
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        return jax.tree.map(put, state)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
