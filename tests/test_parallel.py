"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_and_shardings():
    from monocon_tpu.parallel import batch_sharding, make_mesh, shard_batch

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    x = jnp.zeros((16, 4))
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.sharding == batch_sharding(mesh)
    # Each device holds 1/8 of the batch axis.
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 4)}


def test_spatial_mesh_image_sharding():
    """A (data, space) mesh shards images over batch AND height; label
    trees stay batch-sharded (replicated over space)."""
    from monocon_tpu.parallel import image_sharding, make_mesh, shard_batch

    mesh = make_mesh(8, spatial=2)
    assert dict(mesh.shape) == {"data": 4, "space": 2}
    batch = {
        "img": jnp.zeros((8, 64, 96, 3)),
        "label": {"mask": jnp.zeros((8, 30))},
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["img"].sharding == image_sharding(mesh)
    img_shards = {s.data.shape for s in sharded["img"].addressable_shards}
    assert img_shards == {(2, 32, 96, 3)}  # B/4, H/2
    lab_shards = {
        s.data.shape for s in sharded["label"]["mask"].addressable_shards
    }
    assert lab_shards == {(2, 30)}


def test_spatial_step_matches_single_device(rng):
    """The H-sharded (4 data x 2 space) train step must reproduce
    single-device numerics: XLA's halo exchanges at the height-shard
    boundaries are exact, and BN/grad reductions stay global.

    pad_hw keeps every conv inside the measured halo-exchange safety
    envelope (validate_spatial_shards): H=128 / 2 shards leaves the
    deepest stride-2 conv 4 input rows per shard."""
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import (
        make_mesh, replicate_state, shard_batch, validate_spatial_shards,
    )
    from monocon_tpu.solver import build_optimizer
    from tests.test_ops_parity import random_label_batch

    pad_hw = (128, 64)
    validate_spatial_shards(pad_hw[0], 2)  # in-envelope by construction
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=10, use_scheduler=False)
    step = jax.jit(make_train_step(model, optimizer))

    label = random_label_batch(rng, b=8, o=30, feat_hw=(32, 16),
                               pad_hw=pad_hw)
    batch = {
        "img": jnp.asarray(
            rng.normal(size=(8, *pad_hw, 3)).astype(np.float32)
        ),
        "label": {k: jnp.asarray(v) for k, v in label.items()},
    }

    state1 = create_train_state(variables, optimizer)
    _, losses_single = step(state1, batch)

    mesh = make_mesh(8, spatial=2)
    state2 = replicate_state(create_train_state(variables, optimizer), mesh)
    with mesh:
        _, losses_spatial = step(state2, shard_batch(batch, mesh))

    for k in losses_single:
        np.testing.assert_allclose(
            float(losses_single[k]), float(losses_spatial[k]),
            rtol=1e-4, err_msg=k,
        )


def test_uneven_deep_map_spatial_parity(rng):
    """A canvas whose deep feature maps do NOT divide the spatial shard
    count must still reproduce single-device numerics: pad_h=320 at 4
    shards passes validate_spatial_shards (320 % 4 == 0, max_safe=5) but
    leaves the H/32 map's 10 rows to an uneven GSPMD partition
    (ceil-split 3/3/3/1). Measured round 4: the full model's propagated
    partitioning stays exact here (the isolated thin-conv miscompute
    never materializes) — this test fences that measurement."""
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.parallel import make_mesh, replicate_state
    from monocon_tpu.parallel.mesh import (
        image_sharding, batch_sharding, validate_spatial_shards,
    )
    from monocon_tpu.data.synthetic import DEFAULT_P2

    pad_hw = (320, 64)
    validate_spatial_shards(pad_hw[0], 4)  # passes despite uneven H/32
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )

    def fwd(variables, image, p2):
        pred = model.apply(variables, image, train=False)
        return decode_predictions(pred, p2, pad_hw)

    img = jnp.asarray(rng.normal(size=(8, *pad_hw, 3)).astype(np.float32))
    p2 = jnp.asarray(np.tile(DEFAULT_P2[None], (8, 1, 1)).astype(np.float32))
    ref = jax.jit(fwd)(variables, img, p2)

    mesh = make_mesh(8, spatial=4)  # 2 data x 4 space
    out = jax.jit(fwd)(
        replicate_state(variables, mesh),
        jax.device_put(img, image_sharding(mesh)),
        jax.device_put(p2, batch_sharding(mesh)),
    )
    for k in ref:
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(out[k], np.float32)
        scale = max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5,
                                   err_msg=k)


def test_spatial_shard_envelope():
    """validate_spatial_shards encodes the measured GSPMD halo-exchange
    envelope: a conv needs >= (window//2 + stride) input rows per shard
    (below that, H-sharded convs were measured to return garbage —
    parallel/mesh.py module docstring). Check the boundary cases."""
    import pytest

    from monocon_tpu.parallel import (
        max_safe_spatial_shards, validate_spatial_shards,
    )

    # Production canvas: 384/16=24 rows at the stride-2 convs (/3 -> 8),
    # 384/32=12 at the deepest stride-1 convs (/2 -> 6).
    assert max_safe_spatial_shards(384) == 6
    validate_spatial_shards(384, 2)
    validate_spatial_shards(384, 6)
    with pytest.raises(ValueError, match="numerically safe"):
        validate_spatial_shards(384, 8)
    # Tiny canvases admit no spatial sharding at all: 64/16=4 rows at the
    # stride-2 convs is exactly the measured-broken case for 2 shards.
    assert max_safe_spatial_shards(64) == 1
    with pytest.raises(ValueError, match="numerically safe"):
        validate_spatial_shards(64, 2)
    # Non-dividing shard counts are rejected before the envelope check.
    with pytest.raises(ValueError, match="does not divide"):
        validate_spatial_shards(384, 5)
    # The test canvas used by the numeric spatial tests is in-envelope.
    assert max_safe_spatial_shards(128) == 2


def test_engine_rejects_unsafe_spatial_config(tmp_path):
    """Engine construction must fail loudly on an out-of-envelope
    SPATIAL_SHARDS (before touching data), and when spatial sharding is
    requested without a static canvas."""
    import pytest

    from monocon_tpu.config import get_default_cfg
    from monocon_tpu.engine.engine import MonoConEngine

    cfg = get_default_cfg()
    cfg.DATA.ROOT = str(tmp_path)  # never reached
    cfg.TPU.SPATIAL_SHARDS = 8     # limit at 384 px is 6
    with pytest.raises(ValueError, match="numerically safe"):
        MonoConEngine(cfg)

    cfg.TPU.SPATIAL_SHARDS = 2
    cfg.TPU.PAD_HW = None
    with pytest.raises(ValueError, match="static TPU.PAD_HW"):
        MonoConEngine(cfg)


def test_spatial_eval_matches_single_device(rng):
    """The inference forward on the H-sharded dp x sp mesh must reproduce
    single-device head maps — halo exchanges are exact on the eval path
    too. Compared on the continuous predictions (heatmaps / regression
    maps): decode's discrete top-k is deliberately excluded, since with
    near-tied scores it amplifies f32 reduction-order noise into
    different-but-equivalent selections. pad_hw stays inside the
    validate_spatial_shards halo-exchange envelope."""
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import make_mesh, shard_batch

    pad_hw = (128, 64)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )

    @jax.jit
    def forward(image):
        return model.apply(variables, image, train=False)

    image = jnp.asarray(
        rng.normal(size=(8, *pad_hw, 3)).astype(np.float32)
    )

    single = forward(image)

    mesh = make_mesh(8, spatial=2)
    with mesh:
        batch = shard_batch({"img": image}, mesh)
        spatial = forward(batch["img"])

    for k in single:
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(spatial[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_spatial_4way_interior_shards(rng):
    """4-way H-sharding exercises INTERIOR shards (two-sided halo
    exchange), which the 2-shard tests never hit. Canvas H=256 keeps
    4 shards inside the validated envelope (max_safe_spatial_shards(256)
    == 4). Eval forward must reproduce single-device head maps."""
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import (
        make_mesh, max_safe_spatial_shards, shard_batch,
    )

    assert max_safe_spatial_shards(256) == 4
    pad_hw = (256, 32)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )

    @jax.jit
    def forward(image):
        return model.apply(variables, image, train=False)

    image = jnp.asarray(
        rng.normal(size=(2, *pad_hw, 3)).astype(np.float32)
    )
    single = forward(image)

    mesh = make_mesh(8, spatial=4)  # 2 data x 4 space
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    with mesh:
        batch = shard_batch({"img": image}, mesh)
        spatial = forward(batch["img"])

    for k in single:
        np.testing.assert_allclose(
            np.asarray(single[k]), np.asarray(spatial[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_step_compiles_to_collectives(rng):
    """The compiled SPMD train step must contain cross-device collectives
    (all-reduce) — gradients and sync-BN statistics ride the mesh's data
    axis rather than being recomputed per replica. Guards against a
    silent fallback to replicated compute."""
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import make_mesh, replicate_state, shard_batch
    from monocon_tpu.solver import build_optimizer
    from tests.test_ops_parity import random_label_batch

    pad_hw = (64, 96)
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=10, use_scheduler=False)
    step = jax.jit(make_train_step(model, optimizer))

    label = random_label_batch(rng, b=8, o=30, feat_hw=(16, 24),
                               pad_hw=pad_hw)
    batch = {
        "img": jnp.asarray(
            rng.normal(size=(8, *pad_hw, 3)).astype(np.float32)
        ),
        "label": {k: jnp.asarray(v) for k, v in label.items()},
    }

    mesh = make_mesh(8)
    state = replicate_state(create_train_state(variables, optimizer), mesh)
    with mesh:
        compiled = step.lower(state, shard_batch(batch, mesh)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "sharded step compiled without collectives"


def test_parallel_step_matches_single_device(rng):
    """The sharded train step must be numerically equivalent to the
    single-device step (same batch, same init)."""
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.parallel import make_mesh, replicate_state, shard_batch
    from monocon_tpu.solver import build_optimizer
    from tests.test_ops_parity import random_label_batch

    pad_hw = (64, 96)
    model, variables = create_detector_state(jax.random.PRNGKey(0), image_hw=pad_hw)
    optimizer = build_optimizer(total_steps=10, use_scheduler=False)
    step = jax.jit(make_train_step(model, optimizer))

    label = random_label_batch(rng, b=8, o=30, feat_hw=(16, 24), pad_hw=pad_hw)
    batch = {
        "img": jnp.asarray(rng.normal(size=(8, *pad_hw, 3)).astype(np.float32)),
        "label": {k: jnp.asarray(v) for k, v in label.items()},
    }

    state1 = create_train_state(variables, optimizer)
    _, losses_single = step(state1, batch)

    mesh = make_mesh(8)
    state2 = create_train_state(variables, optimizer)
    state2 = replicate_state(state2, mesh)
    with mesh:
        _, losses_sharded = step(state2, shard_batch(batch, mesh))

    for k in losses_single:
        np.testing.assert_allclose(
            float(losses_single[k]), float(losses_sharded[k]),
            rtol=1e-4, err_msg=k,
        )
