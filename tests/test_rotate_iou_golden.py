"""Golden parity: our vectorized rotated-IoU kernel vs the reference's
numba.cuda device functions run pure-Python under a cuda stub.

The reference kernel (engine/kitti_eval/rotate_iou.py:20-277) is a chain of
plain-Python device functions (``rbbox_to_corners`` -> ``inter`` ->
``devRotateIoUEval``) decorated with ``cuda.jit(device=True)`` and using
``cuda.local.array`` scratch buffers. Stubbing ``cuda.jit`` to identity and
``cuda.local.array`` to ``np.zeros`` makes them directly callable on host, so
our Sutherland–Hodgman clip (monocon_tpu/eval/rotate_iou.py) can be compared
pairwise against the reference's point-in-quad + segment-intersection +
vertex-sort algorithm — the one evaluator stage test_eval_golden.py cannot
cover (it monkeypatches the IoU kernel identically on both sides).

The element ordering matters: the reference kernel computes
``iou[n, k] = devRotateIoUEval(query_boxes[k], boxes[n])``
(rotate_iou.py:327-334), which swaps the criterion-0/1 denominators relative
to its own docstring; we emulate exactly that call pattern here.

Precision: the stub maps ``numba.float32`` scratch dtype to float64 so the
comparison isolates *algorithm*, not storage rounding (the device functions'
arithmetic is dtype-agnostic). A separate test runs the reference at its
shipped float32 storage against our float64 path to bound the end-to-end
numeric gap of the real deployment pairing.
"""

import sys
import types

import numpy as np
import pytest

from monocon_tpu.eval.rotate_iou import rotate_iou_matrix

REF_ENGINE = "/root/reference/engine"


def _identity_jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(fn):
        return fn

    return deco


@pytest.fixture(scope="module")
def ref_riou():
    """Reference rotate_iou module imported under a numba/cuda stub.

    ``numba.float32`` (the scratch-buffer dtype) is a mutable attribute on
    the stub, resolved at call time inside the device functions — tests flip
    it between float64 (algorithm comparison) and float32 (shipped storage).
    """
    numba_stub = types.ModuleType("numba")
    numba_stub.jit = _identity_jit
    numba_stub.njit = _identity_jit
    numba_stub.prange = range
    numba_stub.float32 = np.float64
    cuda_stub = types.ModuleType("numba.cuda")
    cuda_stub.jit = _identity_jit
    cuda_stub.local = types.SimpleNamespace(
        array=lambda shape, dtype: np.zeros(shape, dtype=dtype)
    )
    cuda_stub.shared = types.SimpleNamespace(
        array=lambda shape, dtype: np.zeros(shape, dtype=dtype)
    )
    numba_stub.cuda = cuda_stub

    saved = {
        k: sys.modules.get(k)
        for k in ("numba", "numba.cuda", "kitti_eval", "kitti_eval.eval",
                  "kitti_eval.rotate_iou")
    }
    for k in saved:
        sys.modules.pop(k, None)
    sys.modules["numba"] = numba_stub
    sys.modules["numba.cuda"] = cuda_stub
    sys.path.insert(0, REF_ENGINE)
    try:
        import kitti_eval.rotate_iou as mod

        mod._stub = numba_stub  # handle for dtype flipping
        yield mod
    finally:
        sys.path.remove(REF_ENGINE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def ref_matrix(mod, boxes, qboxes, criterion=-1, scratch_dtype=np.float64):
    """Emulate the kernel's output contract pairwise on host
    (rotate_iou.py:327-334: iou[n, k] = dev(qbox_k, box_n))."""
    mod._stub.float32 = scratch_dtype
    n, k = boxes.shape[0], qboxes.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    for i in range(n):
        for j in range(k):
            out[i, j] = mod.devRotateIoUEval(qboxes[j], boxes[i], criterion)
    mod._stub.float32 = np.float64
    return out


def random_boxes(rng, n, center_scale=20.0, size_lo=0.2, size_hi=8.0):
    return np.column_stack([
        rng.uniform(-center_scale, center_scale, n),
        rng.uniform(-center_scale, center_scale, n),
        rng.uniform(size_lo, size_hi, n),
        rng.uniform(size_lo, size_hi, n),
        rng.uniform(-np.pi, np.pi, n),
    ])


# ------------------------------------------------------------- randomized


# Our matrix is returned as float32 (matching rotate_iou_gpu_eval's output
# dtype contract); the float64 algorithmic agreement is therefore visible
# only up to one float32 ulp of the result magnitude.
F32_ULP = dict(atol=1e-7, rtol=1e-6)


@pytest.mark.parametrize("criterion", [-1, 2])
def test_randomized_sparse(ref_riou, criterion):
    """100x100 spread-out boxes (mostly disjoint, some overlaps)."""
    rng = np.random.default_rng(0)
    boxes = random_boxes(rng, 100)
    qboxes = random_boxes(rng, 100)
    ours = rotate_iou_matrix(boxes, qboxes, criterion)
    ref = ref_matrix(ref_riou, boxes, qboxes, criterion)
    np.testing.assert_allclose(ours, ref, **F32_ULP)


@pytest.mark.parametrize("criterion", [-1, 2])
def test_randomized_dense(ref_riou, criterion):
    """70x70 clustered boxes — nearly every pair intersects, exercising the
    clip/intersection machinery on thousands of genuine polygon overlaps."""
    rng = np.random.default_rng(1)
    boxes = random_boxes(rng, 70, center_scale=3.0, size_lo=0.5, size_hi=5.0)
    qboxes = random_boxes(rng, 70, center_scale=3.0, size_lo=0.5, size_hi=5.0)
    ours = rotate_iou_matrix(boxes, qboxes, criterion)
    ref = ref_matrix(ref_riou, boxes, qboxes, criterion)
    assert (ref > 1e-6).mean() > 0.5  # the scene is actually dense
    np.testing.assert_allclose(ours, ref, **F32_ULP)


def test_randomized_kitti_like(ref_riou):
    """BEV boxes with KITTI statistics: z in [0, 70], small |ry| clusters
    around 0 and ±pi/2 — the distribution the evaluator actually sees."""
    rng = np.random.default_rng(2)

    def kitti_bev(n):
        ry = rng.choice([0.0, np.pi / 2, -np.pi / 2], n) + rng.normal(0, 0.2, n)
        return np.column_stack([
            rng.uniform(-20, 20, n), rng.uniform(0, 70, n),
            rng.uniform(1.4, 2.2, n), rng.uniform(3.2, 4.8, n), ry,
        ])

    boxes, qboxes = kitti_bev(80), kitti_bev(80)
    ours = rotate_iou_matrix(boxes, qboxes, -1)
    ref = ref_matrix(ref_riou, boxes, qboxes, -1)
    np.testing.assert_allclose(ours, ref, **F32_ULP)


def test_criterion_0_1_swap(ref_riou):
    """The reference's 0/1 criteria divide by the *other* operand's area than
    its docstring claims (kernel arg order, rotate_iou.py:332-334); assert we
    reproduce the as-implemented behavior, not the documented one."""
    rng = np.random.default_rng(3)
    boxes = random_boxes(rng, 20, center_scale=2.0)
    qboxes = random_boxes(rng, 20, center_scale=2.0)
    for criterion in (0, 1):
        ours = rotate_iou_matrix(boxes, qboxes, criterion)
        ref = ref_matrix(ref_riou, boxes, qboxes, criterion)
        np.testing.assert_allclose(ours, ref, **F32_ULP)
    # and the swap is real: criterion 0 == inter / area(qbox)
    inter = rotate_iou_matrix(boxes, qboxes, 2).astype(np.float64)
    area_q = (qboxes[:, 2] * qboxes[:, 3])[None, :]
    np.testing.assert_allclose(
        rotate_iou_matrix(boxes, qboxes, 0), inter / area_q, atol=1e-6
    )


# ------------------------------------------------------------ adversarial


def test_adversarial_geometries(ref_riou):
    """Exact degenerate configurations: identical boxes, nested, shared
    edges/vertices, near-zero extents, ±pi angles, slivers."""
    eps = 1e-6
    pairs = [
        # identical
        ([0, 0, 2, 4, 0.3], [0, 0, 2, 4, 0.3]),
        # identical up to angle +- pi (same rectangle)
        ([0, 0, 2, 4, np.pi - 1e-9], [0, 0, 2, 4, -np.pi + 1e-9]),
        # nested, same center
        ([0, 0, 6, 6, 0.1], [0, 0, 2, 2, 0.1]),
        # nested, inner touching one edge of outer
        ([0, 0, 6, 6, 0.0], [2, 0, 2, 2, 0.0]),
        # side-by-side sharing a full edge (zero-area intersection)
        ([0, 0, 2, 2, 0.0], [2, 0, 2, 2, 0.0]),
        # sharing exactly one vertex
        ([0, 0, 2, 2, 0.0], [2, 2, 2, 2, 0.0]),
        # near-zero width sliver crossing a box
        ([0, 0, eps, 10, 0.0], [0, 0, 4, 4, 0.7]),
        # both slivers, crossing at 90°
        ([0, 0, eps, 10, 0.0], [0, 0, eps, 10, np.pi / 2]),
        # 45° diamond inscribed in a square
        ([0, 0, 2, 2, 0.0], [0, 0, np.sqrt(2), np.sqrt(2), np.pi / 4]),
        # large offset, disjoint
        ([0, 0, 2, 2, 1.0], [50, 50, 2, 2, -1.0]),
        # long thin boxes crossing at a shallow angle
        ([0, 0, 0.2, 30, 0.0], [0, 0, 0.2, 30, 0.05]),
    ]
    boxes = np.array([p[0] for p in pairs], dtype=np.float64)
    qboxes = np.array([p[1] for p in pairs], dtype=np.float64)
    for criterion in (-1, 2):
        ours = np.diagonal(rotate_iou_matrix(boxes, qboxes, criterion))
        ref = np.array([
            ref_matrix(ref_riou, boxes[i:i + 1], qboxes[i:i + 1], criterion)[0, 0]
            for i in range(len(pairs))
        ])
        np.testing.assert_allclose(ours, ref, atol=1e-7, rtol=1e-6)
    # analytic spot values (IoU)
    iou = np.diagonal(rotate_iou_matrix(boxes, qboxes, -1))
    assert iou[0] == pytest.approx(1.0, abs=1e-9)       # identical
    assert iou[2] == pytest.approx(4 / 36, abs=1e-9)     # nested 2x2 in 6x6
    assert iou[4] == pytest.approx(0.0, abs=1e-9)        # shared edge
    assert iou[5] == pytest.approx(0.0, abs=1e-9)        # shared vertex
    assert iou[8] == pytest.approx(0.5, abs=1e-9)        # inscribed diamond
    assert iou[9] == pytest.approx(0.0, abs=1e-9)        # disjoint


def test_adversarial_perturbed(ref_riou):
    """The same degenerate families jittered by 1e-3 — near-degenerate but
    outside the reference's knife-edge instability (see
    test_reference_fragility_documented); both algorithms must agree."""
    rng = np.random.default_rng(4)
    base = np.array([
        [0, 0, 2, 2, 0.0], [2, 0, 2, 2, 0.0], [2, 2, 2, 2, 0.0],
        [0, 0, 6, 6, 0.0], [2, 0, 2, 2, 0.0], [0, 0, 2, 4, 0.3],
    ])
    for _ in range(50):
        jit = base + rng.normal(0, 1e-3, base.shape)
        jit2 = base + rng.normal(0, 1e-3, base.shape)
        ours = rotate_iou_matrix(jit, jit2, -1)
        ref = ref_matrix(ref_riou, jit, jit2, -1)
        np.testing.assert_allclose(ours, ref, atol=1e-7, rtol=1e-6)


# ------------------------------------------ reference defects, documented


def test_reference_buffer_overflow_documented(ref_riou):
    """The same rectangle described twice (w/h swapped + 90° rotation)
    makes the reference emit >8 intersection points — overflowing its
    16-float ``int_pts`` local array (rotate_iou.py:239): an out-of-bounds
    write on real CUDA, an IndexError under the numpy stub. Our clip's
    fixed-size buffers cannot overflow; assert both behaviors."""
    box = np.array([[1, -1, 2, 4, 0.25]])
    qbox = np.array([[1, -1, 4, 2, 0.25 + np.pi / 2]])
    with pytest.raises(IndexError):
        ref_matrix(ref_riou, box, qbox, -1)
    assert rotate_iou_matrix(box, qbox, -1)[0, 0] == pytest.approx(1.0, abs=1e-6)


def test_reference_fragility_documented(ref_riou):
    """At ~1e-9 perturbations of coincident boxes the reference drops
    vertices (its boundary tests are exact-`>=` point-in-quad + strict-sign
    segment crossings, rotate_iou.py:99-114,158-173), yielding self-IoU as
    low as 0 — while the Sutherland–Hodgman clip degrades continuously.
    Deterministic for the fixed seed; documents why near-knife-edge inputs
    are excluded from the golden comparison above."""
    rng = np.random.default_rng(4)
    base = np.array([
        [0, 0, 2, 2, 0.0], [2, 0, 2, 2, 0.0], [2, 2, 2, 2, 0.0],
        [0, 0, 6, 6, 0.0], [2, 0, 2, 2, 0.0], [0, 0, 2, 4, 0.3],
    ])
    jit = base + rng.normal(0, 1e-9, base.shape)
    ours_diag = np.diagonal(rotate_iou_matrix(jit, jit, -1))
    np.testing.assert_allclose(ours_diag, 1.0, atol=1e-6)
    ref_diag = np.diagonal(ref_matrix(ref_riou, jit, jit, -1))
    assert ref_diag.min() < 0.99  # reference loses vertices at the knife edge


# --------------------------------------------------- float32 storage gap


def test_float32_storage_gap(ref_riou):
    """Run the reference at its shipped float32 scratch precision (inputs
    cast to float32 as rotate_iou_gpu_eval does, rotate_iou.py:359-360)
    against our float64 path: bounds the deployment-pairing numeric gap."""
    rng = np.random.default_rng(5)
    boxes = random_boxes(rng, 40, center_scale=3.0)
    qboxes = random_boxes(rng, 40, center_scale=3.0)
    ours = rotate_iou_matrix(boxes, qboxes, -1)
    ref32 = ref_matrix(
        ref_riou, boxes.astype(np.float32), qboxes.astype(np.float32),
        -1, scratch_dtype=np.float32,
    )
    np.testing.assert_allclose(ours, ref32, atol=2e-4)
