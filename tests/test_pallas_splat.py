"""Pallas splat kernel parity vs the dense jnp path (interpret mode on the
CPU test mesh; compiled-mode parity is exercised on real TPU)."""

import numpy as np

import jax.numpy as jnp

from monocon_tpu.ops.gaussian import splat_max_heatmap
from monocon_tpu.ops.pallas_splat import splat_max_heatmap_pallas


def _random_instances(rng, b, n, c, h, w):
    centers = np.stack(
        [rng.integers(-5, w + 5, (b, n)), rng.integers(-5, h + 5, (b, n))],
        axis=-1,
    ).astype(np.int32)
    radius = rng.integers(0, 15, (b, n)).astype(np.int32)
    chan = rng.integers(0, c, (b, n)).astype(np.int32)
    valid = rng.random((b, n)) < 0.7
    return (jnp.asarray(centers), jnp.asarray(radius), jnp.asarray(chan),
            jnp.asarray(valid))


def test_pallas_splat_matches_jnp(rng):
    b, n, c, h, w = 2, 12, 3, 32, 200  # w not a multiple of the 128 tile
    args = _random_instances(rng, b, n, c, h, w)
    ref = splat_max_heatmap(*args, c, h, w)
    got = splat_max_heatmap_pallas(*args, c, h, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_splat_single_channel(rng):
    # single-channel path + an all-invalid batch element
    centers, radius, chan, valid = _random_instances(rng, 2, 8, 1, 24, 128)
    valid = valid.at[1].set(False)
    ref = splat_max_heatmap(centers, radius, chan, valid, 1, 24, 128)
    got = splat_max_heatmap_pallas(centers, radius, chan, valid, 1, 24, 128,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert float(np.asarray(got)[1].max()) == 0.0


def test_generate_targets_pallas_path(rng):
    """Full generate_targets with the pallas path (interpret) == jnp path."""
    import sys

    sys.path.insert(0, "tests")
    from test_ops_parity import random_label_batch

    from monocon_tpu.ops.pallas_splat import splat_max_heatmap_pallas as sp
    import monocon_tpu.ops.targets as targets_mod

    label = random_label_batch(rng, b=2, o=30, feat_hw=(24, 80),
                               pad_hw=(96, 320))
    dev = {k: jnp.asarray(v) for k, v in label.items()}

    # monkeypatch the pallas entry to interpret mode for CPU execution
    orig = targets_mod._splat

    def patched(centers, radius, chan, valid, nc, fh, fw, use_pallas):
        if use_pallas:
            return sp(centers, radius, chan, valid, nc, fh, fw,
                      interpret=True)
        return orig(centers, radius, chan, valid, nc, fh, fw, False)

    targets_mod._splat = patched
    try:
        tp = targets_mod.generate_targets(dev, (24, 80), (96, 320),
                                          use_pallas=True)
    finally:
        targets_mod._splat = orig
    tj = targets_mod.generate_targets(dev, (24, 80), (96, 320),
                                      use_pallas=False)
    for key in ("center_heatmap_target", "kpt_heatmap_target"):
        np.testing.assert_allclose(
            np.asarray(tp[key]), np.asarray(tj[key]), rtol=1e-5, atol=1e-6,
            err_msg=key,
        )


def test_resolve_pallas_targets_dispatch(monkeypatch):
    """Default resolution: env > explicit config > auto (OFF everywhere —
    the dense jnp path wins on-chip both standalone and in-context; see
    resolve_pallas_targets's docstring and artifacts/r5/pallas_ab.json)."""
    import pytest

    from monocon_tpu.ops import targets as targets_mod

    resolve = targets_mod.resolve_pallas_targets
    monkeypatch.delenv("MONOCON_PALLAS_TARGETS", raising=False)

    # Explicit config forces the path regardless of platform.
    assert resolve(True) is True
    assert resolve(False) is False

    # auto -> OFF on every platform (measured decision, round 5).
    assert resolve("auto") is False
    monkeypatch.setattr(targets_mod.jax, "default_backend", lambda: "tpu")
    assert resolve("auto") is False

    # Env var overrides everything, including explicit config.
    monkeypatch.setenv("MONOCON_PALLAS_TARGETS", "1")
    assert resolve(False) is True
    monkeypatch.setenv("MONOCON_PALLAS_TARGETS", "0")
    assert resolve(True) is False

    monkeypatch.delenv("MONOCON_PALLAS_TARGETS", raising=False)
    with pytest.raises(ValueError):
        resolve("definitely-not-a-setting")
