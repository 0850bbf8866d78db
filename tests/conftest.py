"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py and the driver's compile checks;
unit tests must be hermetic and fast.

Note: this environment imports jax at interpreter startup (site hook) and
pins JAX_PLATFORMS=axon (the tunneled TPU), so plain env-var edits here are
too late — we must go through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — on this host
# XLA:CPU AOT artifacts reload with mismatched machine features ("could
# lead to SIGILL") and produce nondeterministic numerics.

import zlib

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Per-test RNG, seeded from the test's node id.

    Function-scoped ON PURPOSE: a session-scoped shared stream makes every
    test's inputs depend on which tests drew before it, so an in-suite
    failure need not reproduce in isolation (this bit round 4:
    test_remat_step_matches_plain failed in-suite, passed alone). With the
    seed derived from the node id, a test sees the exact same inputs
    in-suite, alone, and under any -k selection.
    """
    return np.random.default_rng(zlib.crc32(request.node.nodeid.encode()))
