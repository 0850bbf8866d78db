"""Coverage for the remaining inventory items: ImageNet backbone import,
coco-style eval, raw dataset, profiling utils, config round-trip."""

import os
import sys

import numpy as np
import pytest


def test_imagenet_backbone_conversion(tmp_path):
    """A DLA-34 ImageNet classification state dict (with fc head) loads
    into the backbone subtree."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        torch.manual_seed(0)
        from model.backbone.dla import DLA as TorchDLA
    finally:
        sys.path.pop(0)
    torch_bb = TorchDLA(34, pretrained=False)
    state = torch_bb.state_dict()
    # fake classifier head entries like the model-zoo files carry
    state["fc.weight"] = torch.zeros(1000, 512)
    state["fc.bias"] = torch.zeros(1000)
    path = str(tmp_path / "dla34_imagenet.pth")
    torch.save(state, path)

    import jax
    import jax.numpy as jnp

    from monocon_tpu.models.dla import DLA
    from monocon_tpu.utils.torch_convert import load_imagenet_backbone

    variables = load_imagenet_backbone(path)
    bb = DLA(34)
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 96)).astype(np.float32)
    torch_bb.eval()
    with torch.no_grad():
        ref = torch_bb(torch.from_numpy(x))
    ours = bb.apply(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    )
    for i, (a, b) in enumerate(zip(ours, ref)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b.numpy(),
            rtol=1e-3, atol=1e-4, err_msg=f"level{i}",
        )


def test_coco_style_eval(rng):
    from monocon_tpu.eval import kitti_eval_coco_style
    from tests.test_kitti_eval import random_scene

    gts, dts = random_scene(rng, num_images=10, objs_per_img=8)
    result = kitti_eval_coco_style(gts, dts, ["Car"])
    assert "coco AP@0.50:0.05:0.95" in result
    assert "bbox AP" in result and "3d   AP" in result


def test_raw_dataset_and_video(tmp_path):
    import cv2

    from monocon_tpu.data import KITTIRawDataset
    from monocon_tpu.utils.visualizer import Visualizer

    frames = tmp_path / "frames"
    frames.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(frames / f"{i:010d}.png"),
                    rng.integers(0, 255, (96, 320, 3), np.uint8))
    calib = tmp_path / "calib_cam_to_cam.txt"
    calib.write_text(
        "P_rect_02: 7.2e+02 0.0 6.0e+02 4.4e+01 0.0 7.2e+02 1.7e+02 "
        "2.1e-01 0.0 0.0 1.0 2.7e-03\n"
    )
    ds = KITTIRawDataset(str(frames), str(calib))
    assert len(ds) == 3
    s = ds[0]
    assert s["img"].shape[0] == 1 and s["img"].shape[3] == 3
    assert s["ori_img"].shape[1:3] == (96, 320)
    assert s["calib"][0].P2.shape == (3, 4)

    vis_format = [
        {"img_bbox": {"boxes_3d": np.zeros((0, 7)),
                      "scores_3d": np.zeros(0),
                      "labels_3d": np.zeros(0, np.int32)},
         "img_bbox2d": [np.zeros((0, 5))] * 3}
        for _ in range(3)
    ]
    viz = Visualizer(ds, vis_format)
    out = tmp_path / "video"
    viz.export_as_video(str(out), ["bev"], fps=5)
    assert os.path.getsize(out / "bev.mp4") > 0

    # test_raw.py's uint8 transport: raw frames stay uint8 with ori_img
    # kept, and in-jit normalization equals the host Normalize pipeline.
    import jax.numpy as jnp

    from monocon_tpu.data.transforms import default_raw_transforms
    from monocon_tpu.ops.image_norm import normalize_if_raw

    ds_u8 = KITTIRawDataset(
        str(frames), str(calib),
        transforms=default_raw_transforms(device_normalize=True),
    )
    s_u8 = ds_u8[0]
    assert s_u8["img"].dtype == np.uint8
    assert s_u8["ori_img"].shape[1:3] == (96, 320)
    np.testing.assert_array_equal(
        np.asarray(normalize_if_raw(jnp.asarray(s_u8["img"]))),
        s["img"],
    )


def test_frame_shape_header_only(tmp_path, monkeypatch):
    """frame_shape reads PNG IHDR and JPEG SOF headers without a pixel
    decode (test_raw.py sweeps a whole drive with it before timing);
    cv2.imread is stubbed out to prove neither format falls back."""
    import cv2

    from monocon_tpu.data import KITTIRawDataset
    from monocon_tpu.data import kitti_raw

    calib = tmp_path / "calib_cam_to_cam.txt"
    calib.write_text("P_rect_02: " + " ".join(["1.0"] * 12) + "\n")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 320, 3), np.uint8)
    for tag, ext, flags in [
            ("png", "png", []),
            ("jpg_baseline", "jpg", [cv2.IMWRITE_JPEG_QUALITY, 90]),
            ("jpg_progressive", "jpg", [cv2.IMWRITE_JPEG_PROGRESSIVE, 1])]:
        d = tmp_path / f"frames_{tag}"
        d.mkdir()
        cv2.imwrite(str(d / f"0000000000.{ext}"), img, flags)
        ds = KITTIRawDataset(str(d), str(calib), img_extension=ext)
        monkeypatch.setattr(
            kitti_raw.cv2, "imread",
            lambda *_: (_ for _ in ()).throw(AssertionError("decoded")))
        assert ds.frame_shape(0) == (96, 320)
        monkeypatch.undo()


def test_profiling_utils():
    import jax.numpy as jnp

    from monocon_tpu.utils.profiling import sync_timer, timed

    @timed
    def f(x):
        return x + 1

    result, elapsed = f(1)
    assert result == 2 and elapsed >= 0

    dt = sync_timer(lambda x: x * 2, jnp.ones((8, 8)), iters=3, warmup=1)
    assert dt > 0


def test_config_roundtrip(tmp_path):
    from monocon_tpu.config import export_cfg, get_default_cfg, load_cfg

    cfg = get_default_cfg()
    cfg.DATA.BATCH_SIZE = 12
    path = str(tmp_path / "cfg.yaml")
    export_cfg(cfg, path)
    cfg2 = load_cfg(path)
    assert cfg2.DATA.BATCH_SIZE == 12
    assert cfg2.MODEL.BACKBONE.NUM_LAYERS == 34
    assert cfg2.to_plain_dict() == cfg.to_plain_dict()


def test_fetch_dla_weights_tool(tmp_path, monkeypatch):
    """scripts/fetch_dla_weights: hash verification, cache skip, and the
    .pth -> Flax .npz convert path on a synthetic state dict (the download
    itself is stubbed — no network here)."""
    import hashlib
    import importlib.util

    import torch

    spec = importlib.util.spec_from_file_location(
        "fetch_dla_weights",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "fetch_dla_weights.py"),
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    sys.path.insert(0, "/root/reference")
    try:
        torch.manual_seed(0)
        from model.backbone.dla import DLA as TorchDLA
    finally:
        sys.path.pop(0)
    state = TorchDLA(34, pretrained=False).state_dict()
    state["fc.weight"] = torch.zeros(1000, 512)
    state["fc.bias"] = torch.zeros(1000)

    served = str(tmp_path / "served.pth")
    torch.save(state, served)
    digest = hashlib.sha256(open(served, "rb").read()).hexdigest()
    monkeypatch.setitem(tool.NUM_LAYERS_TO_HASH, 34, ("dla34", digest[:8]))

    def fake_urlretrieve(url, dst):
        assert url.startswith(tool.BASE_URL)
        import shutil

        shutil.copy(served, dst)

    monkeypatch.setattr(tool.urllib.request, "urlretrieve", fake_urlretrieve)

    out_dir = str(tmp_path / "weights")
    path = tool.fetch(34, out_dir)
    assert os.path.isfile(path) and digest[:8] in path
    # cached second call: downloading again would fail the assert on a
    # poisoned urlretrieve
    monkeypatch.setattr(
        tool.urllib.request, "urlretrieve",
        lambda *a: (_ for _ in ()).throw(AssertionError("re-downloaded")),
    )
    assert tool.fetch(34, out_dir) == path

    # hash mismatch is rejected
    bad = str(tmp_path / "weights2")
    monkeypatch.setitem(tool.NUM_LAYERS_TO_HASH, 34, ("dla34", "00000000"))
    monkeypatch.setattr(
        tool.urllib.request, "urlretrieve",
        lambda url, dst: __import__("shutil").copy(served, dst),
    )
    with pytest.raises(RuntimeError, match="SHA256"):
        tool.fetch(34, bad)

    # convert: npz round-trips the Flax variable tree
    npz_path = tool.convert(path)
    import numpy as np_
    from flax.traverse_util import flatten_dict

    from monocon_tpu.utils.torch_convert import load_imagenet_backbone

    variables = load_imagenet_backbone(path)
    loaded = np_.load(npz_path)
    flat = flatten_dict(variables["params"])
    some = [("backbone", "base_conv", "kernel"),
            ("backbone", "level0", "block0", "conv", "kernel")]
    for key in some:
        np_.testing.assert_array_equal(
            loaded["/".join(("params",) + key)], np_.asarray(flat[key])
        )


def test_visualizer_get_labels(tmp_path):
    """Visualizer.get_labels == mask-filtered GT (reference
    utils/visualizer.py:49-64)."""
    from monocon_tpu.data import MonoConDataset
    from monocon_tpu.data.synthetic import generate_kitti_dataset
    from monocon_tpu.utils.visualizer import Visualizer

    root = str(tmp_path / "kitti")
    generate_kitti_dataset(root, num_train=2, num_val=2,
                           image_hw=(160, 512), seed=7)
    ds = MonoConDataset(root, "val")
    vis_format = [
        {"img_bbox": {"boxes_3d": np.zeros((0, 7)),
                      "scores_3d": np.zeros(0), "labels_3d": np.zeros(0)},
         "img_bbox2d": [np.zeros((0, 5))] * 3}
        for _ in range(len(ds))
    ]
    vis = Visualizer(ds, vis_format)
    (bboxes, labels) = vis.get_labels(0, ["gt_bboxes", "gt_labels"])
    mask = ds[0]["label"]["mask"].astype(bool)
    n = int(mask.sum())
    assert bboxes.shape == (n, 4) and labels.shape == (n,)
    np.testing.assert_array_equal(bboxes, ds[0]["label"]["gt_bboxes"][mask])
    (only,) = vis.get_labels(0, "gt_labels")
    np.testing.assert_array_equal(only, labels)


def test_batched_frames_stacking_and_pipeline():
    """BatchedFrames stacks per-frame (1,H,W,C) samples into fixed-shape
    batches, pads the tail by frame repetition, and composes with
    pipelined_frames so batched results equal the per-frame ones
    (test_raw.py --batch N)."""
    from monocon_tpu.utils.streaming import BatchedFrames, pipelined_frames

    class Frames:
        def __len__(self):
            return 7

        def __getitem__(self, i):
            img = np.full((1, 4, 6, 3), i, np.uint8)
            return {"img": img}

    ds = Frames()
    bf = BatchedFrames(ds, 3)
    assert len(bf) == 3  # ceil(7 / 3)
    b0, b2 = bf[0], bf[2]
    assert b0["img"].shape == (3, 4, 6, 3) and b0["count"] == 3
    np.testing.assert_array_equal(b0["img"][:, 0, 0, 0], [0, 1, 2])
    # final partial batch: one real frame + two repeats, count = 1
    assert b2["img"].shape == (3, 4, 6, 3) and b2["count"] == 1
    np.testing.assert_array_equal(b2["img"][:, 0, 0, 0], [6, 6, 6])
    with pytest.raises(IndexError):
        bf[3]
    with pytest.raises(ValueError):
        BatchedFrames(ds, 0)

    def infer(batch):
        return batch["img"].astype(np.float32) * 2.0  # stand-in device op

    def finalize(decoded, batch):
        return [decoded[i] for i in range(batch["count"])]

    batched = []
    for vis in pipelined_frames(bf, infer, finalize):
        batched.extend(vis)
    per_frame = []
    for vis in pipelined_frames(
        BatchedFrames(ds, 1), infer, finalize
    ):
        per_frame.extend(vis)
    assert len(batched) == len(per_frame) == 7
    for a, b in zip(batched, per_frame):
        np.testing.assert_array_equal(a, b)
