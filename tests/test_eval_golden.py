"""Golden parity: our KITTI AP evaluator vs the reference
``engine/kitti_eval/eval.py``, executed in pure Python via a numba stub.

The reference decorates at import time (eval.py:14,90,128,167,297 and the
cuda kernels in rotate_iou.py), and numba is absent in this image — so we
inject a stub numba module (identity ``jit``, ``prange = range``) before
importing it. ``rotate_iou_gpu_eval`` is monkeypatched with our host
``rotate_iou_matrix`` on BOTH sides, so metrics 1/2 (BEV/3D) compare the
*protocol* — thresholds (eval.py:14-32), clean_data (:35-87), greedy
matching (:167-285), fused PR accumulation (:297-344), eval_class
orchestration (:456-574), AP40/AP11 + result dict (:577-812), and the coco
variant (:646-663,815-884). The rotated-IoU kernel itself is validated
separately in test_kitti_eval.py / test_rotate_iou oracle tests.
"""

import sys
import types

import numpy as np
import pytest

from monocon_tpu.eval import kitti_eval as our_kitti_eval
from monocon_tpu.eval.kitti_eval import (
    _OVERLAP_LOOSE,
    _OVERLAP_STRICT,
    kitti_eval_coco_style as our_coco_eval,
)
from monocon_tpu.eval.protocol import (
    clean_data as our_clean_data,
    d3_box_overlap as our_d3_box_overlap,
    eval_class as our_eval_class,
    image_box_overlap as our_image_box_overlap,
    select_thresholds,
)
from monocon_tpu.eval.rotate_iou import rotate_iou_matrix

REF_ENGINE = "/root/reference/engine"


def _identity_jit(*args, **kwargs):
    """Stand-in for numba.jit / cuda.jit: decoration becomes a no-op."""
    if args and callable(args[0]):
        return args[0]

    def deco(fn):
        return fn

    return deco


@pytest.fixture(scope="module")
def ref_eval():
    """Import the reference eval module under a stub numba, with its GPU
    rotated-IoU swapped for our host kernel (same kernel both sides)."""
    numba_stub = types.ModuleType("numba")
    numba_stub.jit = _identity_jit
    numba_stub.njit = _identity_jit
    numba_stub.prange = range
    numba_stub.float32 = np.float32
    cuda_stub = types.ModuleType("numba.cuda")
    cuda_stub.jit = _identity_jit
    numba_stub.cuda = cuda_stub

    saved_modules = {
        k: sys.modules.get(k)
        for k in ("numba", "numba.cuda", "kitti_eval", "kitti_eval.eval",
                  "kitti_eval.rotate_iou")
    }
    sys.modules["numba"] = numba_stub
    sys.modules["numba.cuda"] = cuda_stub
    sys.path.insert(0, REF_ENGINE)
    try:
        import kitti_eval.eval as ref_mod

        def adapter(boxes, query_boxes, criterion=-1, device_id=0):
            return rotate_iou_matrix(
                np.asarray(boxes, np.float64),
                np.asarray(query_boxes, np.float64),
                criterion,
            )

        ref_mod.rotate_iou_gpu_eval = adapter
        sys.modules["kitti_eval.rotate_iou"].rotate_iou_gpu_eval = adapter
        yield ref_mod
    finally:
        sys.path.remove(REF_ENGINE)
        for k, v in saved_modules.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------- scenes

GT_NAMES = np.array(
    ["Car", "Pedestrian", "Cyclist", "Van", "Person_sitting", "Truck",
     "Misc"]
)
GT_NAME_P = np.array([0.38, 0.18, 0.12, 0.12, 0.06, 0.08, 0.06])
DT_NAMES = np.array(["Car", "Pedestrian", "Cyclist"])


def rich_scene(rng, num_images, max_objs=11):
    """Randomized GT/DT pairs exercising every protocol branch: neighbor
    classes (Van, Person_sitting), DontCare regions, out-of-scope classes,
    truncation/occlusion/height ignore levels, dropped GT, false positives,
    and one empty detection image."""
    gts, dts = [], []
    for img in range(num_images):
        n = int(rng.integers(2, max_objs))
        names = rng.choice(GT_NAMES, n, p=GT_NAME_P).astype(object)
        x1 = rng.uniform(0, 1100, n)
        y1 = rng.uniform(0, 250, n)
        w = rng.uniform(30, 250, n)
        h = rng.uniform(18, 140, n)  # spans MIN_HEIGHT thresholds 25/40
        bbox = np.stack([x1, y1, x1 + w, y1 + h], -1)
        truncated = rng.uniform(0.0, 0.7, n)
        occluded = rng.integers(0, 4, n).astype(np.float64)
        locs = np.stack([rng.uniform(-25, 25, n), rng.uniform(0.8, 2.2, n),
                         rng.uniform(4, 70, n)], -1)
        dims = np.stack([rng.uniform(1.2, 2.1, n), rng.uniform(0.5, 4.8, n),
                         rng.uniform(1.4, 2.8, n)], -1)  # h, w, l
        rys = rng.uniform(-np.pi, np.pi, n)
        alphas = rys - np.arctan2(locs[:, 0], locs[:, 2])

        dc = rng.random(n) < 0.12
        names[dc] = "DontCare"
        truncated[dc] = -1.0
        occluded[dc] = -1.0

        gts.append({
            "name": np.array(names),
            "truncated": truncated,
            "occluded": occluded,
            "alpha": alphas,
            "bbox": bbox.astype(np.float64),
            "dimensions": dims.astype(np.float64),
            "location": locs.astype(np.float64),
            "rotation_y": rys,
            "score": np.full(n, -1.0),
        })

        if img == 1:  # one image with zero detections
            keep = np.zeros(n, dtype=bool)
        else:
            keep = (rng.random(n) >= 0.25) & ~dc
        m = int(keep.sum())
        n_fp = int(rng.integers(0, 3))
        jit = lambda a, s: a + rng.normal(0.0, s, a.shape)
        dt_bbox = np.concatenate(
            [jit(bbox[keep], 4.0),
             np.stack([
                 (fx := rng.uniform(0, 1100, n_fp)),
                 (fy := rng.uniform(0, 250, n_fp)),
                 fx + rng.uniform(25, 220, n_fp),
                 fy + rng.uniform(18, 130, n_fp),
             ], -1)]
        )
        dt_names = np.concatenate(
            [names[keep], rng.choice(DT_NAMES, n_fp)]
        )
        dt_locs = np.concatenate(
            [jit(locs[keep], 0.4),
             np.stack([rng.uniform(-25, 25, n_fp),
                       rng.uniform(0.8, 2.2, n_fp),
                       rng.uniform(4, 70, n_fp)], -1)]
        )
        dt_dims = np.concatenate(
            [dims[keep] * rng.uniform(0.9, 1.1, (m, 3)),
             np.stack([rng.uniform(1.2, 2.1, n_fp),
                       rng.uniform(0.5, 4.8, n_fp),
                       rng.uniform(1.4, 2.8, n_fp)], -1)]
        )
        dt_rys = np.concatenate(
            [jit(rys[keep], 0.08), rng.uniform(-np.pi, np.pi, n_fp)]
        )
        dt_alphas = np.concatenate(
            [jit(alphas[keep], 0.08), rng.uniform(-np.pi, np.pi, n_fp)]
        )
        dts.append({
            "name": np.array(dt_names),
            "truncated": np.zeros(m + n_fp),
            "occluded": np.zeros(m + n_fp),
            "alpha": dt_alphas,
            "bbox": dt_bbox.astype(np.float64),
            "dimensions": dt_dims.astype(np.float64),
            "location": dt_locs.astype(np.float64),
            "rotation_y": dt_rys,
            "score": rng.uniform(0.05, 1.0, m + n_fp),
        })
    return gts, dts


def _norm_lines(s):
    return [ln.strip() for ln in s.splitlines() if ln.strip()]


# ----------------------------------------------------------------- tests


def test_golden_sub_functions(ref_eval, rng):
    """thresholds / clean_data / bbox IoU / 3D overlap vs eval.py:14-164."""
    for num_gt in (7, 40, 200):
        scores = rng.uniform(0, 1, num_gt + int(rng.integers(0, 30)))
        ref_th = np.array(ref_eval.get_thresholds(scores.copy(), num_gt))
        ours = select_thresholds(scores.copy(), num_gt)
        np.testing.assert_array_equal(ours, ref_th)

    gts, dts = rich_scene(rng, num_images=12)
    for g, d in zip(gts, dts):
        for cls in (0, 1, 2):
            for diff in (0, 1, 2):
                ref = ref_eval.clean_data(g, d, cls, diff)
                got = our_clean_data(g, d, cls, diff)
                assert got[0] == ref[0]
                assert list(got[1]) == list(ref[1])
                assert list(got[2]) == list(ref[2])
                ref_dc = (np.stack(ref[3]) if ref[3]
                          else np.zeros((0, 4)))
                np.testing.assert_array_equal(got[3], ref_dc)

        for crit in (-1, 0, 1):
            ref_ov = ref_eval.image_box_overlap(
                d["bbox"].copy(), g["bbox"].copy(), crit
            )
            np.testing.assert_allclose(
                our_image_box_overlap(d["bbox"], g["bbox"], crit),
                ref_ov, atol=1e-12,
            )

        cam_d = np.concatenate(
            [d["location"], d["dimensions"], d["rotation_y"][:, None]], 1
        )
        cam_g = np.concatenate(
            [g["location"], g["dimensions"], g["rotation_y"][:, None]], 1
        )
        ref_3d = ref_eval.d3_box_overlap(cam_d.copy(), cam_g.copy())
        np.testing.assert_allclose(
            our_d3_box_overlap(cam_d, cam_g), ref_3d, atol=1e-6
        )


def test_golden_eval_class_pr_tables(ref_eval, rng):
    """Full PR/recall/AOS tables vs eval.py:456-574 for all 3 metrics."""
    gts, dts = rich_scene(rng, num_images=100)
    min_ovl = np.stack([_OVERLAP_STRICT, _OVERLAP_LOOSE])[:, :, [0, 1, 2]]
    for metric, aos in ((0, True), (0, False), (1, False), (2, False)):
        ref = ref_eval.eval_class(
            gts, dts, [0, 1, 2], [0, 1, 2], metric, min_ovl,
            compute_aos=aos,
        )
        got = our_eval_class(
            gts, dts, [0, 1, 2], [0, 1, 2], metric, min_ovl,
            compute_aos=aos,
        )
        for key in ("precision", "recall", "orientation"):
            np.testing.assert_allclose(
                got[key], ref[key], atol=1e-10,
                err_msg=f"metric={metric} aos={aos} {key}",
            )


def test_golden_kitti_eval_end_to_end(ref_eval, rng):
    """Top-level kitti_eval on 100 images: every AP40 number and the
    result table vs eval.py:666-812 (3 metrics x 2 regimes x 3 classes x
    3 difficulties, AOS auto-enabled)."""
    gts, dts = rich_scene(rng, num_images=100)
    classes = ["Car", "Pedestrian", "Cyclist"]
    ref_str, ref_ret = ref_eval.kitti_eval(
        gts, dts, list(classes), eval_types=["bbox", "bev", "3d"]
    )
    our_str, our_ret = our_kitti_eval(
        gts, dts, list(classes), eval_types=["bbox", "bev", "3d"]
    )
    assert set(our_ret) == set(ref_ret)
    for k in ref_ret:
        assert our_ret[k] == pytest.approx(ref_ret[k], abs=1e-10), k
    assert _norm_lines(our_str) == _norm_lines(ref_str)


def test_golden_kitti_eval_aos_off(ref_eval, rng):
    """Invalid predicted alphas (-10) must disable AOS on both sides
    (eval.py:714-729)."""
    gts, dts = rich_scene(rng, num_images=100)
    for d in dts:
        d["alpha"] = np.full(len(d["alpha"]), -10.0)
    ref_str, ref_ret = ref_eval.kitti_eval(
        gts, dts, ["Car"], eval_types=["bbox", "bev", "3d"]
    )
    our_str, our_ret = our_kitti_eval(
        gts, dts, ["Car"], eval_types=["bbox", "bev", "3d"]
    )
    assert "aos" not in our_str and "aos" not in ref_str
    assert set(our_ret) == set(ref_ret)
    for k in ref_ret:
        assert our_ret[k] == pytest.approx(ref_ret[k], abs=1e-10), k
    assert _norm_lines(our_str) == _norm_lines(ref_str)


def test_golden_coco_style(ref_eval, rng, monkeypatch):
    """coco-style AP string vs eval.py:815-884 (10-overlap sweep, AP11)."""
    # The reference passes a float num to np.linspace (eval.py:652, its
    # overlap_ranges array is float) — legal on its pinned numpy, a
    # TypeError on this one. Shim the cast; not a protocol divergence.
    orig_linspace = np.linspace
    monkeypatch.setattr(
        np, "linspace",
        lambda start, stop, num=50, **kw: orig_linspace(
            start, stop, int(num), **kw
        ),
    )
    # Reference bug: do_coco_style_eval passes compute_aos (a bool) as
    # do_eval's eval_types parameter (eval.py:653-656; upstream mmdet3d's
    # do_eval has a separate compute_aos param this fork dropped), so the
    # reference coco path crashes unconditionally. Shim the intended
    # signature to golden-test the rest of the coco pipeline.
    orig_do_eval = ref_eval.do_eval
    monkeypatch.setattr(
        ref_eval, "do_eval",
        lambda g, d, c, m, eval_types: orig_do_eval(
            g, d, c, m,
            ["bbox", "bev", "3d"] + (["aos"] if eval_types is True else [])
            if isinstance(eval_types, bool) else eval_types,
        ),
    )
    gts, dts = rich_scene(rng, num_images=40)
    ref_str = ref_eval.kitti_eval_coco_style(gts, dts, ["Car", "Cyclist"])
    our_str = our_coco_eval(gts, dts, ["Car", "Cyclist"])
    assert _norm_lines(our_str) == _norm_lines(ref_str)
