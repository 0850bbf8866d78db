"""Honor JAX_PLATFORMS for CLI entry points.

This image imports jax at interpreter startup (PYTHONPATH site hook), which
latches the platform before user env vars can take effect. CLIs call
:func:`apply_platform_env` first so ``JAX_PLATFORMS=cpu python train.py``
behaves as users expect.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    platform = os.environ.get("JAX_PLATFORMS")
    if platform:
        import jax

        try:
            jax.config.update("jax_platforms", platform)
        except RuntimeError:
            pass  # backends already initialized; keep the active platform
