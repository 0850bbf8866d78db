"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed cluster (gloo CPU collectives, 4 virtual
devices per process), runs ONE SPMD train step over the global 8-device
mesh on a deterministic tiny batch, and writes the loss dict to
``$MULTIHOST_OUT`` as JSON. The parent test compares both processes'
outputs against a single-process run of the same global batch — proving
the cross-process collectives (grad all-reduce, BN global moments)
reproduce single-host numerics.

Launched with env: JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4,
JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID, MULTIHOST_OUT.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's site hook re-exports JAX_PLATFORMS=axon at interpreter
# startup, so the parent's env is not enough — force the virtual CPU
# platform through jax.config BEFORE any backend use (same dance as
# tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from monocon_tpu.parallel import initialize_multihost  # noqa: E402


def make_batch(batch, pad_hw):
    import numpy as np

    rng = np.random.default_rng(0)
    o = 30
    label = {
        "gt_bboxes": np.zeros((batch, o, 4), np.float32),
        "gt_labels": np.zeros((batch, o), np.float32),
        "gt_bboxes_3d": np.zeros((batch, o, 7), np.float32),
        "depths": np.zeros((batch, o), np.float32),
        "gt_kpts_2d": np.zeros((batch, o, 18), np.float32),
        "gt_kpts_valid_mask": np.zeros((batch, o, 9), np.float32),
        "mask": np.zeros((batch, o), np.float32),
    }
    for b in range(batch):
        for i in range(2):
            x1, y1 = rng.uniform(0, 40), rng.uniform(0, 30)
            label["gt_bboxes"][b, i] = [x1, y1, x1 + 30, y1 + 20]
            label["gt_labels"][b, i] = rng.integers(0, 3)
            label["gt_bboxes_3d"][b, i] = [0, 1.5, 20, 1.6, 1.5, 3.9, 0.3]
            label["depths"][b, i] = 20.0
            label["gt_kpts_2d"][b, i] = rng.uniform(0, 90, 18)
            label["gt_kpts_valid_mask"][b, i] = 2
            label["mask"][b, i] = 1
    return {
        "img": rng.normal(size=(batch, *pad_hw, 3)).astype(np.float32),
        "label": label,
    }


def main():
    pid = initialize_multihost()

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import make_mesh, replicate_state, shard_batch
    from monocon_tpu.solver import build_optimizer

    pad_hw = (64, 96)
    mesh = make_mesh()  # global: 8 devices across 2 processes
    assert mesh.devices.size == 8

    # Warm-up collective: establish the gloo TCP pairs while the
    # cross-process skew is seconds. The real train-step compile takes
    # minutes on this one-core host and the two workers can finish far
    # apart; gloo's pair-connect timeout is shorter than that, so the
    # first collective must happen BEFORE the big compile.
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    warm = jax.device_put(
        np.arange(8, dtype=np.float32), NamedSharding(mesh, P("data"))
    )
    assert float(jnp.sum(warm)) == 28.0

    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=10)
    state = replicate_state(create_train_state(variables, optimizer), mesh)

    batch = make_batch(8, pad_hw)
    with mesh:
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        step = jax.jit(make_train_step(model, optimizer))
        state, losses = step(state, sharded)
        # Losses are replicated scalars — fully addressable on each host.
        host_losses = {k: float(v) for k, v in losses.items()}

    with open(os.environ["MULTIHOST_OUT"], "w") as f:
        json.dump({"process": pid, "losses": host_losses}, f)
    print(f"worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
