"""Multi-host (DCN) data parallelism: 2 processes x 4 virtual CPU devices.

Spawns two subprocesses that join a jax.distributed cluster (gloo CPU
collectives) and run ONE jitted SPMD train step over the global 8-device
mesh (tests/multihost_worker.py); asserts both produce identical losses,
equal to a single-process 1-device run of the same deterministic batch —
the cross-process all-reduces reproduce single-host numerics. This is the
CPU-virtualized proof of SURVEY §2.10's ICI+DCN scaling path
(parallel/distributed.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"worker{i}.json" for i in range(2)]
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(i),
            MULTIHOST_OUT=str(outs[i]),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py")],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=1400)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    l0, l1 = results[0]["losses"], results[1]["losses"]
    assert set(l0) == set(l1) and "total_loss" in l0
    for k in l0:
        assert l0[k] == pytest.approx(l1[k], rel=1e-6), k
        assert np.isfinite(l0[k]), k

    # Ground truth: the same global batch through a single-process,
    # 1-device mesh in THIS process (conftest provides the virtual mesh).
    import jax
    import jax.numpy as jnp

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import make_mesh, replicate_state, shard_batch
    from monocon_tpu.solver import build_optimizer
    from multihost_worker import make_batch

    pad_hw = (64, 96)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=10)
    mesh = make_mesh(1)
    state = replicate_state(create_train_state(variables, optimizer), mesh)
    batch = make_batch(8, pad_hw)
    with mesh:
        sharded = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        step = jax.jit(make_train_step(model, optimizer))
        _, losses = step(state, sharded)
    for k, v in l0.items():
        assert v == pytest.approx(float(losses[k]), rel=2e-5, abs=1e-6), (
            f"multihost != single-process: {k}"
        )
