"""Dataset + transform + loader tests on the synthetic KITTI tree, plus
transform parity against the reference implementations with controlled
random parameters."""

import sys

import numpy as np
import pytest

from monocon_tpu.data import MonoConDataset, DataLoader, collate
from monocon_tpu.data.synthetic import generate_kitti_dataset

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_pipe")
    generate_kitti_dataset(str(root), num_train=6, num_val=3, seed=11)
    return str(root)


@pytest.fixture(scope="module")
def ref_transforms():
    sys.path.insert(0, REFERENCE)
    try:
        from transforms import default_transforms as ref_dt  # noqa
        from transforms import geo_aware_transforms as ref_gt  # noqa
    finally:
        sys.path.pop(0)
    return ref_dt, ref_gt


def _numpy_sample(dataset, idx, train=False):
    """A raw (pre-transform) sample as plain numpy for parity drives."""
    ds = MonoConDataset(dataset.base_root, dataset.split, transforms=[])
    return ds.get_sample(idx)


def _to_ref_dict(sample):
    """Our sample -> the reference's data_dict layout (numpy stage)."""
    import copy

    label = {k: v.copy().astype(np.float32) for k, v in sample["label"].items()}
    label["mask"] = sample["label"]["mask"].astype(np.float32).copy()
    return {
        "img": sample["img"].copy(),
        "img_metas": dict(sample["img_metas"]),
        "calib": copy.deepcopy(sample["calib"]),
        "label": label,
    }


def test_dataset_sample_structure(kitti_root):
    ds = MonoConDataset(kitti_root, "train")
    sample = ds.get_sample(0, np.random.default_rng(0))
    assert sample["img"].ndim == 3 and sample["img"].shape[2] == 3
    assert sample["img"].shape[0] % 32 == 0 and sample["img"].shape[1] % 32 == 0
    label = sample["label"]
    assert label["gt_bboxes"].shape == (30, 4)
    assert label["mask"].dtype == bool
    assert label["mask"].any()
    # valid objects carry positive depth and in-range class ids
    m = label["mask"]
    assert (label["depths"][m] >= 2).all() and (label["depths"][m] <= 65).all()
    assert set(np.unique(label["gt_labels"][m])) <= {0.0, 1.0, 2.0}


def test_decoded_image_cache(kitti_root, tmp_path):
    """DATA.IMAGE_CACHE write-through: the second read serves the exact
    decoded pixels from disk (no PNG decode), torn/garbage cache entries
    degrade to a re-decode, and cached samples equal uncached ones through
    the full train pipeline."""
    import os

    cache_dir = str(tmp_path / "cache")
    plain = MonoConDataset(kitti_root, "train")
    cached = MonoConDataset(kitti_root, "train", image_cache=cache_dir)
    assert cached.image_cache is not None

    rng_pair = lambda: np.random.default_rng(7)  # noqa: E731
    a = plain.get_sample(0, rng_pair())
    b = cached.get_sample(0, rng_pair())  # miss: decodes + persists
    sid = cached.sample_ids[0]
    assert sid in cached.image_cache
    c = cached.get_sample(0, rng_pair())  # hit: reads the .npy
    np.testing.assert_array_equal(a["img"], b["img"])
    np.testing.assert_array_equal(a["img"], c["img"])
    for k in a["label"]:
        np.testing.assert_array_equal(a["label"][k], c["label"][k])

    # Cache hits bypass the PNG entirely.
    raw = cached.image_cache.get(sid)
    img_direct, _ = plain.load_image(0)
    np.testing.assert_array_equal(raw, img_direct)

    # A torn/corrupt entry is a miss, not a crash; it gets rewritten.
    path = cached.image_cache._path(sid)
    with open(path, "wb") as f:
        f.write(b"\x93NUMPY garbage")
    assert cached.image_cache.get(sid) is None
    d = cached.get_sample(0, rng_pair())
    np.testing.assert_array_equal(a["img"], d["img"])
    assert cached.image_cache.get(sid) is not None
    assert os.path.getsize(path) > 100


def test_dataset_determinism(kitti_root):
    ds = MonoConDataset(kitti_root, "train")
    a = ds.get_sample(1, np.random.default_rng(42))
    b = ds.get_sample(1, np.random.default_rng(42))
    np.testing.assert_array_equal(a["img"], b["img"])
    for k in a["label"]:
        np.testing.assert_array_equal(a["label"][k], b["label"][k])


def test_flip_parity_with_reference(kitti_root, ref_transforms):
    ref_dt, _ = ref_transforms
    ds = MonoConDataset(kitti_root, "train", transforms=[])
    sample = ds.get_sample(0)

    from monocon_tpu.data.transforms import RandomHorizontalFlip

    ours = RandomHorizontalFlip(prob=1.0)(
        _to_ref_dict(sample), np.random.default_rng(0)
    )
    theirs = ref_dt.RandomHorizontalFlip(prob=1.0)(_to_ref_dict(sample))

    np.testing.assert_array_equal(ours["img"], theirs["img"])
    np.testing.assert_allclose(ours["calib"].P2, theirs["calib"].P2, rtol=1e-6)
    for key in ("gt_bboxes", "gt_bboxes_3d", "centers2d", "gt_kpts_2d",
                "gt_kpts_valid_mask"):
        np.testing.assert_allclose(
            ours["label"][key], theirs["label"][key], rtol=1e-5, atol=1e-4,
            err_msg=key,
        )


def test_shift_parity_with_reference(kitti_root, ref_transforms):
    ref_dt, _ = ref_transforms
    ds = MonoConDataset(kitti_root, "train", transforms=[])
    sample = ds.get_sample(1)

    from monocon_tpu.data.transforms import apply_shift

    # Force the reference shift to known values by seeding its global RNG
    # and reading back what it drew.
    np.random.seed(7)
    ref_shift = ref_dt.RandomShift(prob=1.0, shift_range=(-32, 32))
    theirs = ref_shift(_to_ref_dict(sample))
    sx, sy = theirs["img_metas"]["shift_params"]
    assert theirs["img_metas"]["is_shifted"]

    ours = apply_shift(_to_ref_dict(sample), sx, sy)
    np.testing.assert_array_equal(ours["img"], theirs["img"])
    np.testing.assert_allclose(ours["calib"].P2, theirs["calib"].P2, rtol=1e-6)
    for key in ("gt_bboxes", "gt_bboxes_3d", "centers2d", "depths",
                "gt_kpts_2d", "gt_kpts_valid_mask", "mask"):
        np.testing.assert_allclose(
            np.asarray(ours["label"][key], np.float64),
            np.asarray(theirs["label"][key], np.float64),
            rtol=1e-5, atol=1e-4, err_msg=key,
        )


def test_crop_parity_with_reference(kitti_root, ref_transforms):
    _, ref_gt = ref_transforms
    import random as pyrandom

    ds = MonoConDataset(kitti_root, "train", transforms=[])
    sample = ds.get_sample(2)

    from monocon_tpu.data.transforms import apply_crop

    pyrandom.seed(3)
    ref_crop = ref_gt.RandomCrop3D(
        prob=1.0, crop_size=(320, 960), hide_kpts_in_crop_area=True
    )
    theirs = ref_crop(_to_ref_dict(sample))
    coord = theirs["img_metas"]["crop_coord"]
    assert theirs["img_metas"]["is_cropped"]

    ours = apply_crop(_to_ref_dict(sample), coord, 0.2, True)
    np.testing.assert_array_equal(ours["img"], theirs["img"])
    for key in ("gt_bboxes", "gt_bboxes_3d", "centers2d", "depths",
                "gt_kpts_2d", "gt_kpts_valid_mask", "mask"):
        np.testing.assert_allclose(
            np.asarray(ours["label"][key], np.float64),
            np.asarray(theirs["label"][key], np.float64),
            rtol=1e-5, atol=1e-4, err_msg=key,
        )


def test_flip_projection_consistency(kitti_root):
    """Geometric invariant: after flip, stored centers2d must equal the
    projection of the flipped 3D boxes through the flipped P2 (up to the
    w-1 pixel-grid convention)."""
    from monocon_tpu.data import projected_centers_3d, shift_cam, yaw_local_to_global
    from monocon_tpu.data.transforms import RandomHorizontalFlip

    ds = MonoConDataset(kitti_root, "train", transforms=[])
    sample = ds.get_sample(0)
    flipped = RandomHorizontalFlip(prob=1.0)(sample, np.random.default_rng(0))

    label = flipped["label"]
    m = label["mask"]
    calib = flipped["calib"]
    loc2 = label["gt_bboxes_3d"][m, :3]
    dims = label["gt_bboxes_3d"][m, 3:6]
    # stored loc is cam2; projection helper expects cam0
    loc0 = shift_cam(loc2, calib, 2, 0)
    centers = projected_centers_3d(loc0, dims, calib)
    np.testing.assert_allclose(
        centers[:, 0], label["centers2d"][m, 0], atol=1.01  # the -1 offset
    )
    np.testing.assert_allclose(centers[:, 1], label["centers2d"][m, 1], atol=1e-3)


def test_collate_and_loader(kitti_root):
    ds = MonoConDataset(kitti_root, "train")
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        pad_hw=(384, 1248), seed=1)
    seen = 0
    for batch in loader:
        assert batch["img"].shape[1:] == (384, 1248, 3)
        assert batch["p2"].shape == (batch["img"].shape[0], 3, 4)
        assert batch["label"]["gt_bboxes"].shape[1:] == (30, 4)
        assert batch["img_metas"]["pad_shape"][0] == (384, 1248)
        seen += batch["img"].shape[0]
    assert seen == len(ds)

    # epoch determinism
    loader.set_epoch(3)
    b1 = next(iter(loader))
    loader.set_epoch(3)
    b2 = next(iter(loader))
    np.testing.assert_array_equal(b1["img"], b2["img"])


def test_loader_sync_mode_matches_threaded(kitti_root):
    """num_workers=0 (synchronous sample loading, the 1-core-host mode)
    must yield bit-identical batches to the threaded pool: ordering and
    per-sample augmentation RNG are derived from (seed, epoch, position),
    never from worker scheduling."""
    ds = MonoConDataset(kitti_root, "train")
    kw = dict(batch_size=3, shuffle=True, pad_hw=(96, 320), seed=7)
    for epoch in (0, 2):
        threaded = DataLoader(ds, num_workers=2, **kw)
        threaded.set_epoch(epoch)
        sync = DataLoader(ds, num_workers=0, **kw)
        sync.set_epoch(epoch)
        pairs = list(zip(threaded, sync))
        assert pairs
        for bt, bs in pairs:
            np.testing.assert_array_equal(bt["img"], bs["img"])
            np.testing.assert_array_equal(
                bt["label"]["gt_bboxes"], bs["label"]["gt_bboxes"]
            )


def test_loader_staging_ring_correctness(kitti_root):
    """The H2D staging-canvas ring must never corrupt batches: with
    staging='force' and a copying device_put_fn, every batch's device
    image equals the same loader run without staging, across enough
    batches to wrap the ring several times."""
    import jax
    import jax.numpy as jnp

    def copying_put(batch):
        out = dict(batch)
        # explicit host copy then device array — models a real transfer
        out["img"] = jnp.asarray(np.array(batch["img"], copy=True))
        return out

    ds = MonoConDataset(kitti_root, "train")
    kw = dict(batch_size=2, shuffle=True, num_workers=2,
              pad_hw=(96, 320), seed=5)
    ref_imgs = []
    for epoch in (1, 2, 3):
        ref = DataLoader(ds, staging="off", **kw)
        ref.set_epoch(epoch)
        ref_imgs.extend(np.array(b["img"]) for b in ref)

    staged = DataLoader(ds, device_put_fn=copying_put, staging="force",
                        staging_buffers=2, **kw)
    got = []
    for epoch in (1, 2, 3):
        staged.set_epoch(epoch)
        for b in staged:
            assert isinstance(b["img"], jax.Array)
            got.append(np.asarray(b["img"]))
    assert len(got) == len(ref_imgs) and len(got) >= 6
    for a, b in zip(ref_imgs, got):
        np.testing.assert_array_equal(a, b)


def test_loader_staging_auto_is_safe_on_cpu(kitti_root):
    """staging='auto' must NOT reuse canvases on CPU, where device_put
    zero-copies aligned numpy arrays (the jax.Array would alias the
    canvas and later batches would overwrite earlier ones)."""
    import jax
    import jax.numpy as jnp

    def put(batch):
        out = dict(batch)
        out["img"] = jnp.asarray(batch["img"])
        return out

    ds = MonoConDataset(kitti_root, "train")
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        pad_hw=(96, 320), seed=5, device_put_fn=put)
    batches = [b["img"] for b in loader]
    again = [np.array(b["img"]) for b in
             DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        pad_hw=(96, 320), seed=5)]
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(np.asarray(a), b)
