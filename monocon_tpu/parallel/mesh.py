"""Device-mesh utilities for data-parallel training/inference.

The reference is single-GPU only (README strikes multi-GPU out,
SURVEY.md §2.10); the TPU-native scaling path is batch-axis data
parallelism over a ``jax.sharding.Mesh``. Parameters and optimizer state
are replicated; batches are sharded on the ``data`` axis; the gradient
all-reduce is inserted by XLA during jit lowering and rides ICI.

BatchNorm note: since the whole train step is one jitted SPMD program,
batch-stat reductions are global means over the full (sharded) batch —
i.e. sync-BN semantics by construction.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, batch-axis sharded.

    Multi-host meshes route through
    ``parallel.distributed.shard_global_batch`` (each process feeds only
    the rows its local devices own)."""
    if jax.process_count() > 1:
        from .distributed import shard_global_batch

        return shard_global_batch(batch, mesh)
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


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
