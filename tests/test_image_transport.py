"""uint8 image transport + on-device normalization (TPU.IMAGE_TRANSPORT).

The engine ships raw uint8 pixels and folds ImageNet normalization into
the jitted programs (ops/image_norm.py) instead of normalizing on the
host (reference default_transforms.py:376-407). For integral pixels the
two paths must agree exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monocon_tpu.data.loader import collate
from monocon_tpu.data.transforms import (
    Normalize,
    Pad,
    QuantizeU8,
    default_test_transforms,
    default_train_transforms,
)
from monocon_tpu.ops.image_norm import normalize_if_raw


def test_quantize_u8_rounds_and_clips():
    img = np.array([[[-3.2, 0.4, 99.5], [255.9, 300.0, 128.0]]], np.float32)
    out = QuantizeU8()({"img": img}, None)["img"]
    assert out.dtype == np.uint8
    assert out.tolist() == [[[0, 0, 100], [255, 255, 128]]]
    # uint8 input passes through untouched (no copy)
    u = np.zeros((2, 2, 3), np.uint8)
    assert QuantizeU8()({"img": u}, None)["img"] is u


def test_device_normalize_matches_host_normalize_exactly():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)

    host = Normalize()({"img": img.copy()}, None)["img"]
    dev = np.asarray(normalize_if_raw(jnp.asarray(img)))
    np.testing.assert_array_equal(host, dev)


def test_normalize_if_raw_passes_floats_through():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 4, 3)),
                    jnp.float32)
    assert normalize_if_raw(x) is x


def test_collate_preserves_uint8_canvas():
    rng = np.random.default_rng(2)

    def sample(h, w):
        return {
            "img": rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8),
            "img_metas": {},
            "calib": type("C", (), {"P2": np.eye(3, 4, dtype=np.float32)})(),
            "label": None,
        }

    batch = collate([sample(40, 60), sample(32, 64)], pad_hw=(48, 64))
    assert batch["img"].dtype == np.uint8
    assert batch["img"].shape == (2, 48, 64, 3)
    # zero padding outside each sample's extent
    assert batch["img"][0, 40:].sum() == 0 and batch["img"][0, :, 60:].sum() == 0


def test_default_pipelines_device_normalize_variants():
    test_dn = default_test_transforms(device_normalize=True)
    assert [type(t).__name__ for t in test_dn] == ["Pad"]
    test_host = default_test_transforms(device_normalize=False)
    assert [type(t).__name__ for t in test_host] == ["Normalize", "Pad"]

    train_dn = default_train_transforms((64, 160), device_normalize=True)
    names = [type(t).__name__ for t in train_dn]
    assert "QuantizeU8" in names and "Normalize" not in names
    assert names[-1] == "Pad"

    # eval pipeline on an integral image: uint8 route == host-normalize
    # route after device-side normalization, bit for bit
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(96, 320, 3)).astype(np.uint8)
    s_dn = {"img": img.copy(), "img_metas": {}}
    s_host = {"img": img.copy(), "img_metas": {}}
    for t in test_dn:
        s_dn = t(s_dn, None)
    for t in test_host:
        s_host = t(s_host, None)
    dn_norm = np.asarray(normalize_if_raw(jnp.asarray(s_dn["img"])))
    np.testing.assert_array_equal(dn_norm, s_host["img"])


def test_train_step_equal_under_uint8_transport():
    """Train-step losses identical for uint8 vs pre-normalized f32 input
    when pixels are integral (the only difference is where normalization
    runs)."""
    import jax

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.solver import build_optimizer

    rng = np.random.default_rng(4)
    b, o, hw = 2, 30, (96, 320)
    raw = rng.integers(0, 256, size=(b, *hw, 3)).astype(np.uint8)
    # Normalize's (1,1,3) constants broadcast over (B,H,W,3) too.
    host_norm = Normalize()({"img": raw.copy()}, None)["img"]

    label = {
        "gt_bboxes": np.zeros((b, o, 4), np.float32),
        "gt_labels": np.zeros((b, o), np.float32),
        "gt_bboxes_3d": np.zeros((b, o, 7), np.float32),
        "depths": np.zeros((b, o), np.float32),
        "gt_kpts_2d": np.zeros((b, o, 18), np.float32),
        "gt_kpts_valid_mask": np.full((b, o, 9), 2, np.float32),
        "mask": np.zeros((b, o), np.float32),
    }
    label["gt_bboxes"][:, 0] = [40, 30, 120, 80]
    label["depths"][:, 0] = 20.0
    label["gt_kpts_2d"][:, 0] = 80.0
    label["mask"][:, 0] = 1
    label = {k: jnp.asarray(v) for k, v in label.items()}

    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=hw
    )
    opt = build_optimizer(total_steps=10)
    step = jax.jit(make_train_step(model, opt))

    losses = {}
    for name, img in (("uint8", raw), ("float32", host_norm)):
        state = create_train_state(variables, opt)
        _, metrics = step(state, {"img": jnp.asarray(img), "label": label})
        losses[name] = {k: float(v) for k, v in metrics.items()}

    assert losses["uint8"] == pytest.approx(losses["float32"], rel=1e-6)


def _calib_stub():
    return type("C", (), {"P2": np.eye(3, 4, dtype=np.float32)})()


def test_non_multiple_image_border_matches_float32_transport():
    """KITTI-style non-/32 image (e.g. 375x1242 -> 384x1248): the float32
    transport normalizes BEFORE zero-padding, so its border is exactly 0.0;
    the uint8 transport must reproduce that via the img_hw border mask in
    normalize_if_raw (raw-zero pixels would otherwise normalize to
    ~(-2.12, -2.04, -1.80)). Whole pipeline: transforms -> collate ->
    on-device normalize, bit-for-bit equality."""
    rng = np.random.default_rng(5)
    h, w = 47, 94  # pads to (64, 96); both dims have a real border
    img = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)

    def run(device_normalize):
        s = {"img": img.copy(), "img_metas": {}, "calib": _calib_stub(),
             "label": None}
        for t in default_test_transforms(device_normalize=device_normalize):
            s = t(s, None)
        return collate([s], pad_hw=(64, 128))

    b_u8 = run(True)
    b_f32 = run(False)
    assert b_u8["img"].dtype == np.uint8
    assert b_u8["img_hw"].tolist() == [[h, w]]
    dev = np.asarray(
        normalize_if_raw(jnp.asarray(b_u8["img"]), jnp.asarray(b_u8["img_hw"]))
    )
    np.testing.assert_array_equal(dev, b_f32["img"])
    # the border really is the mean pixel (0.0), not a raw-zero artifact
    assert np.all(dev[0, h:] == 0.0) and np.all(dev[0, :, w:] == 0.0)
    # and without the mask the border would differ (guards against the test
    # silently passing if Pad stops zero-filling)
    unmasked = np.asarray(normalize_if_raw(jnp.asarray(b_u8["img"])))
    assert np.abs(unmasked[0, h:]).max() > 1.5
