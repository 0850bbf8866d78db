"""Golden parity tests for the KITTI domain core against the reference
implementation (imported read-only from /root/reference, which is pure
numpy/torch for these modules)."""

import os
import sys

import numpy as np
import pytest

from monocon_tpu.data import (
    Calibration,
    ObjectLabels,
    projected_centers_3d,
    projected_keypoints,
    shift_cam,
    yaw_global_to_local,
)
from monocon_tpu.data.geometry import (
    boxes3d_to_corners,
    corners_to_image_bbox,
    project_to_image,
)
from monocon_tpu.data.synthetic import (
    DEFAULT_P2,
    generate_kitti_dataset,
    make_calib_text,
    make_label_line,
)

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    sys.path.insert(0, REFERENCE)
    try:
        from utils import data_classes as ref_dc  # noqa
        from utils import geometry_ops as ref_geo  # noqa
    finally:
        sys.path.pop(0)
    return ref_dc, ref_geo


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    generate_kitti_dataset(str(root), num_train=3, num_val=2, seed=7)
    return str(root)


def _write_calib(tmp_path):
    path = os.path.join(tmp_path, "calib.txt")
    with open(path, "w") as f:
        f.write(make_calib_text())
    return path


def test_calib_parse_matches_reference(ref_modules, tmp_path):
    ref_dc, _ = ref_modules
    path = _write_calib(str(tmp_path))

    ours = Calibration.from_file(path)
    theirs = ref_dc.KITTICalibration(path)

    np.testing.assert_allclose(ours.P2, theirs.P2, rtol=1e-6)
    np.testing.assert_allclose(ours.C2V, theirs.C2V, rtol=1e-5)
    np.testing.assert_allclose(ours.V2I, theirs.V2I, rtol=1e-5)
    assert ours.cu == pytest.approx(theirs.cu)
    assert ours.fv == pytest.approx(theirs.fv)
    assert ours.tx == pytest.approx(theirs.tx)
    assert ours.ty == pytest.approx(theirs.ty)


def test_calib_rescale_matches_reference(ref_modules, tmp_path):
    ref_dc, _ = ref_modules
    path = _write_calib(str(tmp_path))
    ours = Calibration.from_file(path)
    theirs = ref_dc.KITTICalibration(path)
    ours.rescale(0.7, 1.3)
    theirs.rescale(0.7, 1.3)
    np.testing.assert_allclose(ours.P2, theirs.P2, rtol=1e-6)
    assert ours.cu == pytest.approx(theirs.cu)


def test_corners_match_reference(ref_modules):
    _, ref_geo = ref_modules
    rng = np.random.default_rng(1)
    centers = rng.normal(size=(5, 3)) * np.array([5, 1, 20]) + np.array([0, 1.5, 30])
    dims = rng.uniform(0.5, 4.0, size=(5, 3))
    rys = rng.uniform(-np.pi, np.pi, size=5)

    for origin in [(0.5, 1.0, 0.5), (0.5, 0.5, 0.5)]:
        ours = boxes3d_to_corners(centers, dims, rys, origin=origin)
        theirs = ref_geo.center_to_corner_box3d(
            centers, dims, rys, origin=origin, axis=1
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-8)


def test_projection_matches_reference(ref_modules):
    _, ref_geo = ref_modules
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(7, 3)) * np.array([5, 2, 10]) + np.array([0, 1, 30])
    ours = project_to_image(pts, DEFAULT_P2, with_depth=True)
    theirs = ref_geo.points_cam2img(pts, DEFAULT_P2, with_depth=True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_label_parse_and_level(ref_modules, tmp_path):
    ref_dc, _ = ref_modules
    calib_path = _write_calib(str(tmp_path))
    label_path = os.path.join(str(tmp_path), "label.txt")
    lines = [
        make_label_line(name="Car", truncated=0.1, occluded=0,
                        bbox=(300, 160, 420, 240)),
        make_label_line(name="Pedestrian", truncated=0.4, occluded=2,
                        bbox=(500, 170, 540, 200), dim_hwl=(1.8, 0.6, 0.9),
                        loc=(3.0, 1.6, 14.0), ry=1.2, alpha=1.0),
        "DontCare -1 -1 -10 500.00 170.00 590.00 190.00 -1 -1 -1 -1000 -1000 -1000 -10",
    ]
    with open(label_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    ours = ObjectLabels.from_file(label_path)
    ref_calib = ref_dc.KITTICalibration(calib_path)
    theirs = ref_dc.KITTIMultiObjects.get_objects_from_label(label_path, ref_calib)
    theirs_all = theirs.original_objects

    assert len(ours) == len(theirs_all)
    for i, obj in enumerate(theirs_all.obj_list):
        assert ours.name[i] == obj.cls_str
        assert ours.cls_idx[i] == obj.cls_num
        np.testing.assert_allclose(ours.bbox[i], obj.box2d, rtol=1e-5)
        np.testing.assert_allclose(ours.dim_lhw[i], obj.dim, rtol=1e-5)
        np.testing.assert_allclose(ours.loc[i], obj.loc, rtol=1e-5)
        assert ours.ry[i] == pytest.approx(obj.ry)
        assert ours.levels[i] == obj.level

    # info_dict parity for the evaluator
    ours_info = ours.info_dict()
    theirs_info = theirs_all.info_dict
    np.testing.assert_array_equal(ours_info["name"], theirs_info["name"])
    for key in ("truncated", "occluded", "alpha", "rotation_y", "score"):
        np.testing.assert_allclose(
            ours_info[key], np.asarray(theirs_info[key], dtype=np.float64),
            rtol=1e-6)
    for key in ("bbox", "dimensions", "location"):
        np.testing.assert_allclose(ours_info[key], theirs_info[key], rtol=1e-5)


def test_projected_center_and_kpts_match_reference(ref_modules, tmp_path):
    ref_dc, _ = ref_modules
    calib_path = _write_calib(str(tmp_path))
    label_path = os.path.join(str(tmp_path), "label.txt")
    rng = np.random.default_rng(3)
    lines = []
    for _ in range(6):
        z = float(rng.uniform(8, 50))
        lines.append(
            make_label_line(
                loc=(float(rng.uniform(-8, 8)), float(rng.uniform(1.2, 2.0)), z),
                ry=float(rng.uniform(-np.pi, np.pi)),
                dim_hwl=(1.5, 1.7, 4.2),
            )
        )
    with open(label_path, "w") as f:
        f.write("\n".join(lines) + "\n")

    ours = ObjectLabels.from_file(label_path)
    calib = Calibration.from_file(calib_path)
    ref_calib = ref_dc.KITTICalibration(calib_path)
    theirs = ref_dc.KITTIMultiObjects.get_objects_from_label(label_path, ref_calib)

    # Reference converts cam0->cam2 and global->local yaw in the dataset
    # before computing projections (dataset/monocon_dataset.py:84-85); its
    # projected_center internally converts back to cam0 + gravity center.
    loc_cam2 = shift_cam(ours.loc, calib, 0, 2)
    ry_local = yaw_global_to_local(ours.ry, loc_cam2)
    theirs.convert_cam(0, 2)
    theirs.convert_yaw("global", "local")

    # Our pure functions take the cam0 / global state directly.
    loc_cam0 = shift_cam(loc_cam2, calib, 2, 0)
    ry_global = ry_local + np.arctan2(loc_cam2[:, 0], loc_cam2[:, 2])

    centers = projected_centers_3d(loc_cam0, ours.dim_lhw, calib)
    kpts = projected_keypoints(loc_cam0, ours.dim_lhw, ry_global, calib)

    for i, obj in enumerate(theirs.obj_list):
        np.testing.assert_allclose(centers[i], obj.projected_center, rtol=1e-4)
        ref_kpts = obj.projected_kpts
        np.testing.assert_allclose(kpts[i], ref_kpts, rtol=1e-4, atol=1e-3)


def test_synthetic_dataset_layout(kitti_root):
    assert os.path.isfile(os.path.join(kitti_root, "ImageSets", "train.txt"))
    assert os.path.isfile(
        os.path.join(kitti_root, "training", "image_2", "000000.png")
    )
    labels = ObjectLabels.from_file(
        os.path.join(kitti_root, "training", "label_2", "000000.txt")
    )
    assert len(labels) >= 1
    assert (labels.cls_idx == -1).sum() == 1  # the DontCare line
