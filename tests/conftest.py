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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
