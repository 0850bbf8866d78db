"""Official KITTI AP evaluation protocol (AP40/AP11, bbox/BEV/3D/AOS).

Behavioral parity with the reference ``engine/kitti_eval/eval.py`` — the
41-recall-point threshold selection, per-difficulty ignore rules, greedy
TP/FP matching with DontCare suppression, precision right-envelope, and the
two overlap regimes — implemented in numpy/Python with the per-image greedy
matcher swappable for the C++ implementation in ``native.py`` (the numba
replacement, SURVEY.md §2.9).

Annotation dicts: {'name','truncated','occluded','alpha','bbox',
'dimensions','location','rotation_y','score'} per image.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .rotate_iou import rotate_iou_matrix, rotate_iou_pairs

CLASS_NAMES = ("Car", "Pedestrian", "Cyclist", "Van", "Person_sitting")
N_SAMPLE_PTS = 41

# Per-difficulty ignore rules (eval.py:36-39).
MIN_HEIGHT = (40, 25, 25)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.3, 0.5)


def select_thresholds(scores: np.ndarray, num_gt: int,
                      num_sample_pts: int = N_SAMPLE_PTS) -> np.ndarray:
    """Pick score thresholds hitting ~41 evenly spaced recall points
    (eval.py:14-32)."""
    scores = np.sort(scores)[::-1]
    current_recall = 0.0
    thresholds = []
    for i, score in enumerate(scores):
        l_recall = (i + 1) / num_gt
        r_recall = (i + 2) / num_gt if i < len(scores) - 1 else l_recall
        if ((r_recall - current_recall) < (current_recall - l_recall)
                and i < len(scores) - 1):
            continue
        thresholds.append(score)
        current_recall += 1.0 / (num_sample_pts - 1.0)
    return np.array(thresholds)


def _clean_cache(gt: Dict, dt: Dict) -> Dict[str, np.ndarray]:
    """The class/difficulty-invariant inputs of :func:`clean_data` for one
    image. ``eval_class`` runs clean_data classes x difficulties (9x)
    times per image; the string lowering and DontCare collection here are
    the expensive part, so hoisting them cuts val-scale clean time ~5x."""
    return {
        "names_gt": np.char.lower(np.asarray(gt["name"], dtype=np.str_)),
        "heights_gt": gt["bbox"][:, 3] - gt["bbox"][:, 1],
        "occluded": np.asarray(gt["occluded"]),
        "truncated": np.asarray(gt["truncated"]),
        "dc": gt["bbox"][np.asarray(gt["name"]) == "DontCare"]
              .astype(np.float64).reshape(-1, 4),
        "names_dt": np.char.lower(np.asarray(dt["name"], dtype=np.str_)),
        "heights_dt": np.abs(dt["bbox"][:, 3] - dt["bbox"][:, 1]),
    }


def _clean_from_cache(cache: Dict[str, np.ndarray], current_class: int,
                      difficulty: int):
    """Ignore-level assignment from a prepared cache — the variable part
    of :func:`clean_data` (eval.py:35-87), vectorized over objects.

    Returns (num_valid_gt, ignored_gt, ignored_dt):
      ignored codes: 0 = count, 1 = ignore (neighbors/too-hard), -1 = skip.

    Memoized per (class, difficulty) inside ``cache``: the ignore codes
    are metric-invariant, so with the cache shared across do_eval's three
    eval_class calls the bev/3d passes reuse the bbox pass's results.
    Callers must treat the returned arrays as read-only.
    """
    memo_key = ("memo", current_class, difficulty)
    if memo_key in cache:
        return cache[memo_key]
    cls_name = CLASS_NAMES[current_class].lower()
    names_gt = cache["names_gt"]

    # valid: 1 = the class itself, 0 = neighbor class, -1 = other.
    valid = np.where(names_gt == cls_name, 1, -1)
    if cls_name == "pedestrian":
        valid = np.where(names_gt == "person_sitting", 0, valid)
    elif cls_name == "car":
        valid = np.where(names_gt == "van", 0, valid)
    too_hard = (
        (cache["occluded"] > MAX_OCCLUSION[difficulty])
        | (cache["truncated"] > MAX_TRUNCATION[difficulty])
        | (cache["heights_gt"] <= MIN_HEIGHT[difficulty])
    )
    counted = (valid == 1) & ~too_hard
    ignored_gt = np.full(len(names_gt), -1, dtype=np.int64)
    ignored_gt[counted] = 0
    ignored_gt[(valid == 0) | ((valid == 1) & too_hard)] = 1
    num_valid = int(counted.sum())

    ignored_dt = np.where(
        cache["heights_dt"] < MIN_HEIGHT[difficulty], np.int64(1),
        np.where(cache["names_dt"] == cls_name, np.int64(0), np.int64(-1)),
    )
    cache[memo_key] = (num_valid, ignored_gt, ignored_dt)
    return cache[memo_key]


def _flat_clean_caches(gt_annos: List[Dict], dt_annos: List[Dict]) -> Dict:
    """Concatenated clean-data inputs over ALL images, plus offsets.

    The ignore-code assignment (:func:`_clean_from_cache`) is elementwise
    over objects, so one vectorized pass over the flattened object arrays
    per (class, difficulty) replaces ``num_images`` Python calls — at
    val scale (3769 images x 27 (metric,cls,diff) combos) the per-image
    call overhead alone was ~1.4 s of the evaluator's host time
    (artifacts/r5/eval_scale.json profile). Results are memoized per
    (class, difficulty) in ``memo`` — they are metric-invariant, so
    do_eval's three eval_class calls share them.
    """
    def cat(parts, dtype=None):
        return (np.concatenate(parts) if parts
                else np.zeros(0, dtype or np.float64))

    names_gt = cat([np.asarray(a["name"], dtype=np.str_)
                    for a in gt_annos], np.str_)
    return {
        "gt_off": np.concatenate(
            [[0], np.cumsum([len(a["name"]) for a in gt_annos])]
        ).astype(np.int64),
        "dt_off": np.concatenate(
            [[0], np.cumsum([len(a["name"]) for a in dt_annos])]
        ).astype(np.int64),
        "names_gt": np.char.lower(names_gt),
        "heights_gt": cat([a["bbox"][:, 3] - a["bbox"][:, 1]
                           for a in gt_annos]),
        "occluded": cat([np.asarray(a["occluded"]) for a in gt_annos],
                        np.int64),
        "truncated": cat([np.asarray(a["truncated"]) for a in gt_annos]),
        "dc": [a["bbox"][np.asarray(a["name"]) == "DontCare"]
               .astype(np.float64).reshape(-1, 4) for a in gt_annos],
        "names_dt": np.char.lower(cat([np.asarray(a["name"], dtype=np.str_)
                                       for a in dt_annos], np.str_)),
        "heights_dt": cat([np.abs(a["bbox"][:, 3] - a["bbox"][:, 1])
                           for a in dt_annos]),
        "memo": {},
    }


def _clean_all_from_flat(flat: Dict, current_class: int, difficulty: int):
    """Vectorized-over-all-images :func:`_clean_from_cache`: identical
    ignore semantics (eval.py:35-87), computed on the concatenated object
    arrays. Returns (total_valid_gt, ignored_gt_flat, ignored_dt_flat);
    per-image arrays are offset slices of the flats. Memoized per
    (class, difficulty); callers must treat the arrays as read-only."""
    key = (current_class, difficulty)
    if key in flat["memo"]:
        return flat["memo"][key]
    cls_name = CLASS_NAMES[current_class].lower()
    names_gt = flat["names_gt"]

    valid = np.where(names_gt == cls_name, 1, -1)
    if cls_name == "pedestrian":
        valid = np.where(names_gt == "person_sitting", 0, valid)
    elif cls_name == "car":
        valid = np.where(names_gt == "van", 0, valid)
    too_hard = (
        (flat["occluded"] > MAX_OCCLUSION[difficulty])
        | (flat["truncated"] > MAX_TRUNCATION[difficulty])
        | (flat["heights_gt"] <= MIN_HEIGHT[difficulty])
    )
    counted = (valid == 1) & ~too_hard
    ignored_gt = np.full(len(names_gt), -1, dtype=np.int64)
    ignored_gt[counted] = 0
    ignored_gt[(valid == 0) | ((valid == 1) & too_hard)] = 1
    total_valid = int(counted.sum())

    ignored_dt = np.where(
        flat["heights_dt"] < MIN_HEIGHT[difficulty], np.int64(1),
        np.where(flat["names_dt"] == cls_name, np.int64(0), np.int64(-1)),
    )
    flat["memo"][key] = (total_valid, ignored_gt, ignored_dt)
    return flat["memo"][key]


def clean_data(gt: Dict, dt: Dict, current_class: int, difficulty: int):
    """Ignore-level assignment (eval.py:35-87), vectorized over objects
    (the reference's per-object Python loop was ~12% of val-scale wall).

    Returns (num_valid_gt, ignored_gt, ignored_dt, dc_bboxes):
      ignored codes: 0 = count, 1 = ignore (neighbors/too-hard), -1 = skip.
    """
    cache = _clean_cache(gt, dt)
    num_valid, ignored_gt, ignored_dt = _clean_from_cache(
        cache, current_class, difficulty
    )
    return num_valid, ignored_gt, ignored_dt, cache["dc"]


def image_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                      criterion: int = -1) -> np.ndarray:
    """Vectorized axis-aligned IoU matrix (eval.py:90-119)."""
    n, k = boxes.shape[0], qboxes.shape[0]
    if n == 0 or k == 0:
        return np.zeros((n, k))
    iw = (np.minimum(boxes[:, None, 2], qboxes[None, :, 2])
          - np.maximum(boxes[:, None, 0], qboxes[None, :, 0]))
    ih = (np.minimum(boxes[:, None, 3], qboxes[None, :, 3])
          - np.maximum(boxes[:, None, 1], qboxes[None, :, 1]))
    inter = np.where((iw > 0) & (ih > 0), iw * ih, 0.0)
    area1 = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))[:, None]
    area2 = ((qboxes[:, 2] - qboxes[:, 0]) * (qboxes[:, 3] - qboxes[:, 1]))[None]
    if criterion == -1:
        denom = area1 + area2 - inter
    elif criterion == 0:
        denom = np.broadcast_to(area1, inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(area2, inter.shape)
    else:
        denom = np.ones_like(inter)
    return np.where(inter > 0, inter / denom, 0.0)


def bev_boxes(anno: Dict) -> np.ndarray:
    return np.concatenate(
        [anno["location"][:, [0, 2]], anno["dimensions"][:, [0, 2]],
         anno["rotation_y"][:, None]], axis=1,
    )


def camera_boxes(anno: Dict) -> np.ndarray:
    return np.concatenate(
        [anno["location"], anno["dimensions"], anno["rotation_y"][:, None]],
        axis=1,
    )


def d3_box_overlap(boxes: np.ndarray, qboxes: np.ndarray,
                   criterion: int = -1) -> np.ndarray:
    """Rotated BEV intersection x vertical overlap (eval.py:128-164).
    Camera boxes (x,y,z,l,h,w,ry); y points down, y is the box bottom."""
    rinc = rotate_iou_matrix(
        boxes[:, [0, 2, 3, 5, 6]], qboxes[:, [0, 2, 3, 5, 6]], 2
    ).astype(np.float64)
    iw = (np.minimum(boxes[:, None, 1], qboxes[None, :, 1])
          - np.maximum(boxes[:, None, 1] - boxes[:, None, 4],
                       qboxes[None, :, 1] - qboxes[None, :, 4]))
    vol1 = (boxes[:, 3] * boxes[:, 4] * boxes[:, 5])[:, None]
    vol2 = (qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5])[None]
    inc = np.where(iw > 0, iw * rinc, 0.0)
    if criterion == -1:
        denom = vol1 + vol2 - inc
    elif criterion == 0:
        denom = np.broadcast_to(vol1, inc.shape)
    elif criterion == 1:
        denom = np.broadcast_to(vol2, inc.shape)
    else:
        denom = np.ones_like(inc)
    return np.where((rinc > 0) & (iw > 0), inc / denom, 0.0)


def compute_overlap(gt: Dict, dt: Dict, metric: int) -> np.ndarray:
    """Per-image (num_dt, num_gt) overlap matrix for a metric
    (0 bbox / 1 bev / 2 3d)."""
    if metric == 0:
        return image_box_overlap(dt["bbox"], gt["bbox"])
    if metric == 1:
        return rotate_iou_matrix(bev_boxes(dt), bev_boxes(gt)).astype(np.float64)
    if metric == 2:
        return d3_box_overlap(camera_boxes(dt), camera_boxes(gt))
    raise ValueError(metric)


# Flat-pair chunk size for the batched rotated-IoU sweep: bounds the
# (P, _MAX_V, 2) float64 clip buffers (~100 MB peak per chunk).
_PAIR_CHUNK = 262_144


def compute_overlaps_all(gt_annos: List[Dict], dt_annos: List[Dict],
                         metric: int) -> List[np.ndarray]:
    """Every image's (num_dt, num_gt) overlap matrix in ONE batched
    rotated-IoU sweep.

    Identical results to ``[compute_overlap(gt_i, dt_i, metric)]`` — the
    clip kernel is already vectorized over pairs, so flattening all
    images' pair grids removes the 3769-iteration Python loop that
    dominated val-scale eval wall time (~9.6 s of 18.5 s; the reference
    instead launches one numba.cuda kernel per image,
    eval.py:128-133/347-422). Metric 0's axis-aligned IoU stays
    per-image (vectorized and cheap).
    """
    n_img = len(gt_annos)
    if metric == 0:
        return [image_box_overlap(dt_annos[i]["bbox"], gt_annos[i]["bbox"])
                for i in range(n_img)]
    to_boxes = bev_boxes if metric == 1 else camera_boxes
    dts = [to_boxes(d) for d in dt_annos]
    gts = [to_boxes(g) for g in gt_annos]

    # Flatten every image's (num_dt x num_gt) pair grid, row-major.
    d_flat = np.concatenate(
        [np.repeat(d, g.shape[0], axis=0) for d, g in zip(dts, gts)]
        or [np.zeros((0, dts[0].shape[1] if dts else 5))])
    g_flat = np.concatenate(
        [np.tile(g, (d.shape[0], 1)) for d, g in zip(dts, gts)]
        or [np.zeros_like(d_flat)])

    chunks = []
    for lo in range(0, len(d_flat), _PAIR_CHUNK):
        d_c = d_flat[lo:lo + _PAIR_CHUNK]
        g_c = g_flat[lo:lo + _PAIR_CHUNK]
        if metric == 1:
            chunks.append(rotate_iou_pairs(d_c, g_c).astype(np.float64))
        else:
            chunks.append(_d3_overlap_pairs(d_c, g_c))
    flat = (np.concatenate(chunks) if chunks
            else np.zeros(0, dtype=np.float64))

    out, pos = [], 0
    for d, g in zip(dts, gts):
        cnt = d.shape[0] * g.shape[0]
        out.append(flat[pos:pos + cnt].reshape(d.shape[0], g.shape[0]))
        pos += cnt
    return out


def _d3_overlap_pairs(boxes: np.ndarray, qboxes: np.ndarray) -> np.ndarray:
    """Pairwise (aligned) 3D overlap — the elementwise form of
    :func:`d3_box_overlap` at criterion -1."""
    rinc = rotate_iou_pairs(
        boxes[:, [0, 2, 3, 5, 6]], qboxes[:, [0, 2, 3, 5, 6]], 2
    ).astype(np.float64)
    iw = (np.minimum(boxes[:, 1], qboxes[:, 1])
          - np.maximum(boxes[:, 1] - boxes[:, 4],
                       qboxes[:, 1] - qboxes[:, 4]))
    vol1 = boxes[:, 3] * boxes[:, 4] * boxes[:, 5]
    vol2 = qboxes[:, 3] * qboxes[:, 4] * qboxes[:, 5]
    inc = np.where(iw > 0, iw * rinc, 0.0)
    denom = vol1 + vol2 - inc
    return np.where((rinc > 0) & (iw > 0), inc / denom, 0.0)


NO_DETECTION = -10_000_000.0


def match_image(
    overlaps: np.ndarray,   # (num_dt, num_gt)
    gt_alphas: np.ndarray,
    dt_alphas: np.ndarray,
    dt_scores: np.ndarray,
    dt_bboxes: np.ndarray,
    ignored_gt: np.ndarray,
    ignored_dt: np.ndarray,
    dc_bboxes: np.ndarray,
    metric: int,
    min_overlap: float,
    thresh: float = 0.0,
    compute_fp: bool = False,
    compute_aos: bool = False,
) -> Tuple[int, int, int, float, np.ndarray]:
    """Greedy per-image TP/FP/FN matching (eval.py:167-285). Returns
    (tp, fp, fn, similarity, tp_scores)."""
    det_size = len(dt_scores)
    gt_size = len(gt_alphas)
    assigned = np.zeros(det_size, dtype=bool)
    ignored_threshold = (
        dt_scores < thresh if compute_fp else np.zeros(det_size, dtype=bool)
    )

    tp = fp = fn = 0
    similarity = 0.0
    tp_scores = []
    deltas = []
    for i in range(gt_size):
        if ignored_gt[i] == -1:
            continue
        det_idx = -1
        valid_detection = NO_DETECTION
        max_overlap = 0.0
        assigned_ignored_det = False
        for j in range(det_size):
            if ignored_dt[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            overlap = overlaps[j, i]
            if overlap <= min_overlap:
                continue
            if not compute_fp:
                if dt_scores[j] > valid_detection:
                    det_idx, valid_detection = j, dt_scores[j]
            elif (ignored_dt[j] == 0
                  and (overlap > max_overlap or assigned_ignored_det)):
                max_overlap, det_idx = overlap, j
                valid_detection, assigned_ignored_det = 1.0, False
            elif (ignored_dt[j] == 1 and valid_detection == NO_DETECTION):
                det_idx, valid_detection = j, 1.0
                assigned_ignored_det = True

        if valid_detection == NO_DETECTION and ignored_gt[i] == 0:
            fn += 1
        elif valid_detection != NO_DETECTION and (
                ignored_gt[i] == 1 or ignored_dt[det_idx] == 1):
            assigned[det_idx] = True
        elif valid_detection != NO_DETECTION:
            tp += 1
            tp_scores.append(dt_scores[det_idx])
            if compute_aos:
                deltas.append(gt_alphas[i] - dt_alphas[det_idx])
            assigned[det_idx] = True

    if compute_fp:
        fp = int(np.sum(~assigned & (ignored_dt == 0) & ~ignored_threshold))
        if metric == 0 and len(dc_bboxes) > 0:
            overlaps_dc = image_box_overlap(dt_bboxes, dc_bboxes, 0)
            nstuff = 0
            for i in range(dc_bboxes.shape[0]):
                for j in range(det_size):
                    if (assigned[j] or ignored_dt[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if overlaps_dc[j, i] > min_overlap:
                        assigned[j] = True
                        nstuff += 1
            fp -= nstuff
        if compute_aos:
            if tp > 0 or fp > 0:
                similarity = float(
                    np.sum((1.0 + np.cos(np.asarray(deltas))) / 2.0)
                )
            else:
                similarity = -1.0
    return tp, fp, fn, similarity, np.array(tp_scores)


def collect_thresh_scores(image_args, metric: int,
                          min_overlap: float) -> np.ndarray:
    """Matched-TP scores at thresh=0 across all images — the input to
    :func:`select_thresholds`. Dispatches to the C++ matcher
    (``native.batch_match_scores``); results are identical to running
    :func:`match_image` with ``compute_fp=False`` per image (the
    reference's numba-JIT loop, eval.py:128-133). ``image_args`` is a
    per-image list of dicts or a prebuilt ``native.FlatPack``."""
    from .native import batch_match_scores

    return batch_match_scores(image_args, metric, min_overlap)


def eval_class(
    gt_annos: List[Dict],
    dt_annos: List[Dict],
    current_classes: Sequence[int],
    difficultys: Sequence[int],
    metric: int,
    min_overlaps: np.ndarray,   # (num_overlap, metric, class)
    compute_aos: bool = False,
    caches: Optional[Dict] = None,
) -> Dict[str, np.ndarray]:
    """PR curves per (class, difficulty, overlap) — eval.py:456-574.

    ``caches``: optional precomputed :func:`_flat_clean_caches` structure —
    it is metric-invariant (including its per-(class,difficulty) memo), so
    :func:`kitti_eval.do_eval` builds it once and shares it across the
    bbox/bev/3d calls instead of paying it 3x at val scale."""
    from .native import FlatPack, batch_match  # may fall back to Python

    assert len(gt_annos) == len(dt_annos)
    num_images = len(gt_annos)
    overlaps = compute_overlaps_all(gt_annos, dt_annos, metric)

    shape = (len(current_classes), len(difficultys),
             min_overlaps.shape[0], N_SAMPLE_PTS)
    precision = np.zeros(shape)
    recall = np.zeros(shape)
    aos = np.zeros(shape)

    # Everything except the ignore codes is class/difficulty-invariant:
    # build the flat clean inputs, f64 views, and the flattened C++ pack
    # once, not per (class, difficulty, regime) — at val scale the
    # re-flattening otherwise dominates the evaluator's host time.
    if caches is None:
        caches = _flat_clean_caches(gt_annos, dt_annos)
    image_args = [
        dict(
            overlaps=overlaps[i],
            gt_alphas=gt_annos[i]["alpha"].astype(np.float64),
            dt_alphas=dt_annos[i]["alpha"].astype(np.float64),
            dt_scores=dt_annos[i]["score"].astype(np.float64),
            dt_bboxes=dt_annos[i]["bbox"].astype(np.float64),
            ignored_gt=None,
            ignored_dt=None,
            dc_bboxes=caches["dc"][i],
        )
        for i in range(num_images)
    ]
    pack = FlatPack(image_args)

    for m, cls in enumerate(current_classes):
        for d, difficulty in enumerate(difficultys):
            total_valid_gt, ig_gt_flat, ig_dt_flat = _clean_all_from_flat(
                caches, cls, difficulty
            )
            pack.set_ignored_flat(ig_gt_flat, ig_dt_flat)
            for k in range(min_overlaps.shape[0]):
                min_overlap = float(min_overlaps[k, metric, m])
                if total_valid_gt == 0:
                    continue
                all_scores = collect_thresh_scores(
                    pack, metric, min_overlap
                )
                thresholds = select_thresholds(all_scores, total_valid_gt)
                if len(thresholds) == 0:
                    continue
                pr = batch_match(
                    pack, metric, min_overlap, thresholds, compute_aos
                )  # (T, 4): tp, fp, fn, similarity
                t = len(thresholds)
                recall[m, d, k, :t] = pr[:, 0] / (pr[:, 0] + pr[:, 2])
                precision[m, d, k, :t] = pr[:, 0] / (pr[:, 0] + pr[:, 1])
                if compute_aos:
                    aos[m, d, k, :t] = pr[:, 3] / (pr[:, 0] + pr[:, 1])
                # Right-envelope (max over the tail) — eval.py:555-562.
                for i in range(t):
                    precision[m, d, k, i] = np.max(precision[m, d, k, i:])
                    recall[m, d, k, i] = np.max(recall[m, d, k, i:])
                    if compute_aos:
                        aos[m, d, k, i] = np.max(aos[m, d, k, i:])
    return {"recall": recall, "precision": precision, "orientation": aos}


def get_map11(prec: np.ndarray) -> np.ndarray:
    return sum(prec[..., i] for i in range(0, prec.shape[-1], 4)) / 11 * 100


def get_map40(prec: np.ndarray) -> np.ndarray:
    return sum(prec[..., i] for i in range(1, prec.shape[-1])) / 40 * 100
