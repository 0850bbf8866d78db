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

Spatial-shard safety envelope: GSPMD's conv halo exchange was measured
(virtual CPU mesh, this repo) to MISCOMPUTE when a shard's slice of the
convolved axis is too thin — a 3x3 stride-2 conv with 2 input rows per
shard, a 3x3 stride-1 conv with 1 row per shard, and a 7x7 stride-1 conv
with 2 rows per shard all return garbage (relative error ~3), while one
row more each is exact to f32 roundoff; lhs-dilated (transposed) convs
and reduce_window are exact at any thinness. Empirical rule: a conv
needs >= (window//2 + stride) input rows per shard. For the DLA
architecture the binding ops are the stride-2 3x3 convs (input H/16) and
the stride-1 3x3 convs at the deepest level (H/32);
:func:`max_safe_spatial_shards` encodes that envelope and the engine
enforces it.
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


def max_safe_spatial_shards(pad_h: int) -> int:
    """Largest spatial shard count proven numerically exact for DLA.

    Every conv must keep >= (window//2 + stride) input rows per shard
    (see module docstring for the measured GSPMD halo misbehavior below
    that). The binding constraints in DLA-34/46/60/102 + DLAUp + heads:

      * 3x3 stride-2 convs consuming the H/16 feature map -> need
        (pad_h // 16) / shards >= 3;
      * 3x3 stride-1 convs on the H/32 map -> need
        (pad_h // 32) / shards >= 2.

    (The stem's 7x7 runs at full H; the neck's transposed convs and the
    decode max-pool were measured exact at any thinness.)

    Uneven deep-map splits: the per-level row counts here use floor
    division, but when a level's height does not divide the shard count
    GSPMD partitions it unevenly (ceil per shard, thin/padded last
    shard) — e.g. pad_h=320 at 4 shards leaves the H/32 map's 10 rows
    split 3/3/3/1. This was probed on the FULL model (measured round 4,
    virtual CPU mesh): train-step losses match a single device to 3e-6
    and the eval forward to f32 roundoff at 320/4, and even a 1-row
    deep shard (128/4 eval forward) is exact — the model's propagated
    partitioning avoids the isolated-conv miscompute configuration.
    Regression-tested by
    ``tests/test_parallel.py::test_uneven_deep_map_spatial_parity``.
    """
    return max(1, min((pad_h // 16) // 3, (pad_h // 32) // 2))


def validate_spatial_shards(pad_h: int, spatial: int) -> None:
    """Raise unless ``spatial`` H-shards of a ``pad_h`` canvas stay in
    the proven-exact halo-exchange envelope (and divide it evenly)."""
    if spatial <= 1:
        return
    if pad_h % spatial != 0:
        raise ValueError(
            f"TPU.SPATIAL_SHARDS={spatial} does not divide the batch "
            f"canvas height {pad_h}"
        )
    safe = max_safe_spatial_shards(pad_h)
    if spatial > safe:
        raise ValueError(
            f"TPU.SPATIAL_SHARDS={spatial} exceeds the numerically safe "
            f"limit {safe} for canvas height {pad_h}: below "
            f"(window//2 + stride) rows per shard, GSPMD's conv halo "
            f"exchange miscomputes (see parallel/mesh.py). Reduce the "
            f"shard count or raise TPU.PAD_HW[0]."
        )


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
