"""Multi-host (DCN) initialization and host-local batch placement.

The reference is single-GPU (SURVEY.md §2.10); the TPU-native scaling path
beyond one host is ``jax.distributed.initialize`` + the same SPMD train
step over a global mesh: intra-host gradient/BN collectives ride ICI,
cross-host segments ride DCN — XLA plans both from the same sharding
annotations, no NCCL/MPI code.

Enable with ``TPU.MULTIHOST: true`` (reads the standard env contract:
``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``,
which TPU pod runtimes set automatically — on real pods
``jax.distributed.initialize()`` with no args autodetects). Tested on CPU
with 2 processes x 4 virtual devices and gloo collectives
(tests/test_multihost.py).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh

from .mesh import batch_sharding, image_sharding


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """``jax.distributed.initialize`` from args or the standard env vars.

    Must run before any jax device use. Returns the process id. No-op
    (returns 0) when neither args nor env request multi-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Real TPU pods: initialize() autodetects from the TPU runtime.
        # Outside a pod this would hang, so only no-arg-init when the
        # runtime provides coordinates.
        if os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
            return jax.process_index()
        return 0

    # CPU cross-process collectives need gloo. Platform must be inspected
    # WITHOUT initializing the backend (jax.distributed.initialize must
    # run first), so read the config/env, never jax.default_backend().
    platform = (jax.config.jax_platforms
                or os.environ.get("JAX_PLATFORMS", ""))
    if str(platform).startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def shard_global_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a *globally identical* host batch onto a (possibly multi-host)
    mesh, batch-axis sharded.

    Every process holds the same global batch (the loaders are
    deterministic in (seed, epoch, position), so each host materializes
    identical arrays); each process hands jax only the rows its local
    devices own via ``make_array_from_callback`` — no cross-host data
    exchange. Single-process meshes take the plain ``device_put`` path.
    """
    if jax.process_count() == 1:
        from .mesh import shard_batch

        return shard_batch(batch, mesh)
    row = batch_sharding(mesh)
    img = image_sharding(mesh)

    def put(sharding):
        def place(x):
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx]
            )

        return place

    return {
        k: (put(img)(v) if k == "img"
            else jax.tree.map(put(row), v))
        for k, v in batch.items()
    }
