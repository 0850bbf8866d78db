"""Decode + eval-format parity vs the reference inference path
(decode_heatmap -> _get_eval_formats -> convert_to_kitti_*)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_env(tmp_path_factory):
    sys.path.insert(0, REFERENCE)
    try:
        import torch

        torch.manual_seed(0)
        from model.dense_heads.monocon_heads import MonoConDenseHeads
        from utils.data_classes import KITTICalibration
    finally:
        sys.path.pop(0)

    from monocon_tpu.data.synthetic import make_calib_text

    tmp = tmp_path_factory.mktemp("calib")
    p = tmp / "c.txt"
    p.write_text(make_calib_text())
    return {
        "heads": MonoConDenseHeads(in_ch=64),
        "calib": KITTICalibration(str(p)),
        "calib_path": str(p),
    }


def make_pred(rng, b, feat_hw):
    shapes = {
        "center_heatmap_pred": 3, "kpt_heatmap_pred": 9, "wh_pred": 2,
        "offset_pred": 2, "kpt_heatmap_offset_pred": 2,
        "center2kpt_offset_pred": 18, "dim_pred": 3, "depth_pred": 2,
        "alpha_cls_pred": 12, "alpha_offset_pred": 12,
    }
    pred = {}
    for k, c in shapes.items():
        arr = rng.normal(size=(b, *feat_hw, c)).astype(np.float32)
        if "heatmap_pred" in k and "offset" not in k:
            # mild logits: saturating the [1e-4, 1-1e-4] clamp would create
            # massive score ties and make top-k ordering ambiguous
            arr = np.clip(1 / (1 + np.exp(-1.5 * arr)), 1e-4, 1 - 1e-4)
        if k == "wh_pred":
            arr = np.abs(arr) * 8
        if k == "dim_pred":
            arr = np.abs(arr) + 1.0
        if k == "depth_pred":
            arr[..., 0] = np.abs(arr[..., 0]) * 25 + 2
            arr[..., 1] = arr[..., 1] * 0.1
        pred[k] = arr
    return pred


def test_decode_parity(ref_env, rng):
    import torch

    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.utils.convert import split_batch_detections

    b, feat_hw, pad_hw = 2, (24, 80), (96, 320)
    pred = make_pred(rng, b, feat_hw)
    pred_nchw = {
        k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2)).copy())
        for k, v in pred.items()
    }
    calib = ref_env["calib"]
    data_dict = {
        "img_metas": {"pad_shape": [pad_hw] * b},
        "calib": [calib] * b,
    }
    with torch.no_grad():
        ref_2d, ref_3d, ref_labels = ref_env["heads"]._get_bboxes(
            data_dict, pred_nchw
        )

    p2 = jnp.asarray(np.tile(calib.P2[None], (b, 1, 1)).astype(np.float32))
    decoded = decode_predictions(
        {k: jnp.asarray(v) for k, v in pred.items()}, p2, pad_hw
    )
    ours = split_batch_detections(
        {k: np.asarray(v) for k, v in decoded.items()}, 0.4
    )

    for i in range(b):
        theirs_2d = ref_2d[i].numpy()
        theirs_3d = ref_3d[i].numpy()
        theirs_lb = ref_labels[i].numpy()
        # order by score desc on both sides
        oi = np.argsort(-ours[i]["scores"])
        ti = np.argsort(-theirs_2d[:, 4])
        assert len(oi) == len(ti), (len(oi), len(ti))
        np.testing.assert_allclose(
            ours[i]["bboxes_2d"][oi], theirs_2d[ti], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            ours[i]["bboxes_3d"][oi], theirs_3d[ti], rtol=1e-3, atol=1e-3
        )
        np.testing.assert_array_equal(ours[i]["labels"][oi], theirs_lb[ti])


def test_kitti_format_parity(ref_env, rng):
    import torch

    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.utils.convert import (
        convert_to_kitti_2d,
        convert_to_kitti_3d,
        split_batch_detections,
        to_vis_format,
    )

    b, feat_hw, pad_hw = 2, (24, 80), (96, 320)
    pred = make_pred(rng, b, feat_hw)
    pred_nchw = {
        k: torch.from_numpy(np.transpose(v, (0, 3, 1, 2)).copy())
        for k, v in pred.items()
    }
    calib = ref_env["calib"]
    metas = {
        "pad_shape": [pad_hw] * b,
        "sample_idx": [11, 22],
        "ori_shape": [(94, 317), (94, 317)],
    }
    data_dict = {"img_metas": metas, "calib": [calib] * b}
    with torch.no_grad():
        ref_fmt = ref_env["heads"]._get_eval_formats(
            {"img": torch.zeros(b, 3, *pad_hw), **data_dict}, pred_nchw
        )

    p2 = jnp.asarray(np.tile(calib.P2[None], (b, 1, 1)).astype(np.float32))
    decoded = decode_predictions(
        {k: jnp.asarray(v) for k, v in pred.items()}, p2, pad_hw
    )
    per_image = split_batch_detections(
        {k: np.asarray(v) for k, v in decoded.items()}, 0.4
    )
    from monocon_tpu.data.calib import Calibration

    our_calib = Calibration.from_file(ref_env["calib_path"])
    kitti_3d = convert_to_kitti_3d(per_image, metas, [our_calib] * b)
    kitti_2d = convert_to_kitti_2d(per_image, metas)

    for i in range(b):
        ref3d = ref_fmt["img_bbox"][i]
        ours3d = kitti_3d[i]
        # order by score
        oi = np.argsort(-ours3d["score"])
        ti = np.argsort(-ref3d["score"])
        assert len(oi) == len(ti)
        np.testing.assert_array_equal(ours3d["name"][oi], ref3d["name"][ti])
        for key in ("bbox", "dimensions", "location"):
            np.testing.assert_allclose(
                ours3d[key][oi], ref3d[key][ti], rtol=1e-3, atol=2e-3,
                err_msg=key,
            )
        for key in ("alpha", "rotation_y", "score"):
            np.testing.assert_allclose(
                ours3d[key][oi], ref3d[key][ti], rtol=1e-3, atol=2e-3,
                err_msg=key,
            )
        np.testing.assert_array_equal(
            ours3d["sample_idx"][oi], ref3d["sample_idx"][ti]
        )

        ref2d = ref_fmt["img_bbox2d"][i]
        ours2d = kitti_2d[i]
        o2 = np.lexsort((-ours2d["score"], ours2d["name"]))
        t2 = np.lexsort((-ref2d["score"], ref2d["name"]))
        np.testing.assert_array_equal(ours2d["name"][o2], ref2d["name"][t2])
        np.testing.assert_allclose(
            ours2d["bbox"][o2], ref2d["bbox"][t2], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            ours2d["score"][o2], ref2d["score"][t2], rtol=1e-4
        )

    # vis format structure
    vis = to_vis_format(per_image)
    assert set(vis[0].keys()) == {"img_bbox", "img_bbox2d"}
    assert len(vis[0]["img_bbox2d"]) == 3
