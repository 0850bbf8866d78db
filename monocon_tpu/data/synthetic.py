"""Synthetic mini-KITTI dataset generator (for tests and benchmarks).

Writes a directory tree with the real KITTI layout::

    root/training/{image_2,calib,label_2}/XXXXXX.{png,txt,txt}
    root/ImageSets/{train,val,trainval,test}.txt

The reference repo has no test fixtures at all (SURVEY.md §4); this module is
the foundation of the from-scratch test strategy.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

# A realistic KITTI P2 (values in the ballpark of the real sequences).
DEFAULT_P2 = np.array(
    [
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ],
    dtype=np.float32,
)

DEFAULT_IMAGE_HW = (375, 1242)


def make_calib_text(p2: Optional[np.ndarray] = None) -> str:
    p2 = DEFAULT_P2 if p2 is None else p2
    p0 = p2.copy()
    p0[0, 3] = 0.0
    p0[1, 3] = 0.0
    p0[2, 3] = 0.0
    p1 = p0.copy()
    p1[0, 3] = -387.5744
    p3 = p0.copy()
    p3[0, 3] = -339.5
    r0 = np.eye(3, dtype=np.float32)
    v2c = np.array(
        [
            [7.53e-03, -9.99e-01, -6.17e-04, -4.07e-03],
            [1.48e-02, 7.28e-04, -9.99e-01, -7.63e-02],
            [9.99e-01, 7.52e-03, 1.48e-02, -2.72e-01],
        ],
        dtype=np.float32,
    )
    i2v = np.array(
        [
            [9.99e-01, 7.55e-03, -2.03e-03, -8.09e-01],
            [-7.85e-03, 9.98e-01, -5.32e-02, 3.20e-01],
            [2.02e-03, 5.32e-02, 9.98e-01, -7.99e-01],
        ],
        dtype=np.float32,
    )

    def fmt(name, mat):
        return name + ": " + " ".join(f"{v:.12e}" for v in mat.flatten())

    return "\n".join(
        [
            fmt("P0", p0),
            fmt("P1", p1),
            fmt("P2", p2),
            fmt("P3", p3),
            fmt("R0_rect", r0),
            fmt("Tr_velo_to_cam", v2c),
            fmt("Tr_imu_to_velo", i2v),
        ]
    ) + "\n"


def make_label_line(
    name: str = "Car",
    truncated: float = 0.0,
    occluded: int = 0,
    alpha: float = -0.2,
    bbox: Sequence[float] = (390.0, 180.0, 510.0, 250.0),
    dim_hwl: Sequence[float] = (1.5, 1.7, 4.1),
    loc: Sequence[float] = (-2.0, 1.8, 25.0),
    ry: float = -0.3,
    score: Optional[float] = None,
) -> str:
    parts = [
        name,
        f"{truncated:.2f}",
        f"{occluded:d}",
        f"{alpha:.2f}",
        *[f"{v:.2f}" for v in bbox],
        *[f"{v:.2f}" for v in dim_hwl],
        *[f"{v:.2f}" for v in loc],
        f"{ry:.2f}",
    ]
    if score is not None:
        parts.append(f"{score:.4f}")
    return " ".join(parts)


def random_scene_labels(rng: np.ndarray, num_objects: int, p2: np.ndarray,
                        image_hw=DEFAULT_IMAGE_HW):
    """Generate physically consistent labels: sample 3D boxes, derive the 2D
    box from the projected corners so geometry round-trips in tests.

    Returns ``(label_lines, draw_specs)`` — the specs carry each labeled
    object's projected corners so ``render_scene`` can draw it (a detector
    can only *generalize* to held-out images if the objects are visually
    rendered, not just described in the label file)."""
    from .geometry import boxes3d_to_corners, corners_to_image_bbox

    names = ["Car", "Pedestrian", "Cyclist"]
    dims = {
        "Car": (1.55, 1.65, 4.0),
        "Pedestrian": (1.75, 0.6, 0.85),
        "Cyclist": (1.72, 0.6, 1.76),
    }
    lines = []
    specs = []
    for _ in range(num_objects):
        name = names[int(rng.integers(0, 3))]
        h, w, l = dims[name]
        h *= float(rng.uniform(0.9, 1.1))
        w *= float(rng.uniform(0.9, 1.1))
        l *= float(rng.uniform(0.9, 1.1))
        z = float(rng.uniform(6.0, 55.0))
        x = float(rng.uniform(-0.04, 0.04)) * z * 10.0
        y = float(rng.uniform(1.4, 2.0))
        ry = float(rng.uniform(-np.pi, np.pi))
        loc = np.array([[x, y, z]])
        corners = boxes3d_to_corners(loc, np.array([[l, h, w]]), np.array([ry]))
        bbox = corners_to_image_bbox(corners, p2)[0]
        bbox[0::2] = np.clip(bbox[0::2], 0, image_hw[1])
        bbox[1::2] = np.clip(bbox[1::2], 0, image_hw[0])
        if (bbox[2] - bbox[0]) < 8 or (bbox[3] - bbox[1]) < 8:
            continue
        alpha = ry - float(np.arctan2(x, z))
        lines.append(
            make_label_line(
                name=name,
                truncated=float(rng.uniform(0, 0.12)),
                occluded=int(rng.integers(0, 2)),
                alpha=alpha,
                bbox=bbox,
                dim_hwl=(h, w, l),
                loc=(x, y, z),
                ry=ry,
            )
        )
        specs.append({"name": name, "corners": corners[0], "z": z})
    if not lines:
        # Fallback: one easy car placed via the actual projection so its
        # box is guaranteed inside this image size.
        loc = np.array([[0.0, 1.6, 12.0]])
        dims = np.array([[4.0, 1.55, 1.65]])
        corners = boxes3d_to_corners(loc, dims, np.array([0.0]))
        bbox = corners_to_image_bbox(corners, p2)[0]
        bbox[0::2] = np.clip(bbox[0::2], 0, image_hw[1])
        bbox[1::2] = np.clip(bbox[1::2], 0, image_hw[0])
        lines = [make_label_line(bbox=bbox, loc=(0.0, 1.6, 12.0),
                                 dim_hwl=(1.55, 1.65, 4.0), ry=0.0,
                                 alpha=0.0)]
        specs = [{"name": "Car", "corners": corners[0], "z": 12.0}]
    # A DontCare region, as in real KITTI files.
    lines.append(
        "DontCare -1 -1 -10 500.00 170.00 590.00 190.00 -1 -1 -1 -1000 -1000 -1000 -10"
    )
    return lines, specs


# Distinct channel-dominant colors per class (RGB) so classification is
# visually learnable from synthetic scenes.
CLASS_COLORS = {
    "Car": (205, 65, 55),
    "Pedestrian": (55, 195, 70),
    "Cyclist": (70, 90, 210),
}


def render_scene(render_rng: np.random.Generator, image_hw, specs,
                 p2: np.ndarray) -> np.ndarray:
    """Draw the labeled objects onto a smooth random background.

    Each object is the filled convex hull of its 8 projected 3D corners in
    its class color (brightness-jittered per instance), with the front face
    outlined darker as an orientation cue, drawn far-to-near so occlusion
    matches depth. The background is a low-frequency field + fine noise —
    stationary statistics across images, so a detector must learn the
    objects, not memorize backgrounds."""
    import cv2

    from .geometry import project_to_image

    h, w = image_hw
    base = render_rng.integers(90, 166, size=(6, 8, 3)).astype(np.uint8)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_LINEAR)
    img = img.astype(np.int16)
    img += render_rng.integers(-12, 13, size=img.shape).astype(np.int16)
    img = np.clip(img, 0, 255).astype(np.uint8)

    for spec in sorted(specs, key=lambda s: -s["z"]):
        uv = project_to_image(spec["corners"], p2)  # (8, 2)
        pts = np.round(uv).astype(np.int32)
        color = np.asarray(CLASS_COLORS[spec["name"]], np.float32)
        color = color * float(render_rng.uniform(0.75, 1.25))
        col = tuple(int(c) for c in np.clip(color, 0, 255))
        hull = cv2.convexHull(pts.reshape(-1, 1, 2))
        cv2.fillConvexPoly(img, hull, col)
        edge = tuple(int(c * 0.55) for c in col)
        cv2.polylines(img, [pts[:4].reshape(-1, 1, 2)], True, edge, 1)
    return img


def generate_kitti_dataset(
    root: str,
    num_train: int = 4,
    num_val: int = 2,
    image_hw=DEFAULT_IMAGE_HW,
    max_objects: int = 6,
    seed: int = 0,
) -> None:
    """Write a synthetic KITTI tree with `num_train + num_val` samples."""
    import cv2

    rng = np.random.default_rng(seed)
    training = os.path.join(root, "training")
    for sub in ("image_2", "calib", "label_2"):
        os.makedirs(os.path.join(training, sub), exist_ok=True)
    os.makedirs(os.path.join(root, "ImageSets"), exist_ok=True)

    # Scale the intrinsics to the requested image size (as a camera resize
    # would) so projections land inside the frame for any image_hw.
    p2 = DEFAULT_P2.copy()
    p2[0] *= image_hw[1] / DEFAULT_IMAGE_HW[1]
    p2[1] *= image_hw[0] / DEFAULT_IMAGE_HW[0]

    total = num_train + num_val
    ids = [f"{i:06d}" for i in range(total)]
    for i, sample_id in enumerate(ids):
        with open(os.path.join(training, "calib", f"{sample_id}.txt"), "w") as f:
            f.write(make_calib_text(p2))
        n_obj = int(rng.integers(1, max_objects + 1))
        lines, specs = random_scene_labels(rng, n_obj, p2, image_hw)
        with open(os.path.join(training, "label_2", f"{sample_id}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        # Rendering randomness comes from a per-sample stream so the label
        # content above is a pure function of (seed, sample order).
        img = render_scene(np.random.default_rng((seed, i)), image_hw,
                           specs, p2)
        cv2.imwrite(os.path.join(training, "image_2", f"{sample_id}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as f:
        f.write("\n".join(ids[:num_train]) + "\n")
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("\n".join(ids[num_train:]) + "\n")
    with open(os.path.join(root, "ImageSets", "trainval.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    # 'test' split points at the same images, mirroring KITTI's testing/ dir.
    testing = os.path.join(root, "testing")
    for sub in ("image_2", "calib"):
        os.makedirs(os.path.join(testing, sub), exist_ok=True)
        src_dir = os.path.join(training, sub)
        for sample_id in ids[num_train:]:
            ext = "png" if sub == "image_2" else "txt"
            src = os.path.join(src_dir, f"{sample_id}.{ext}")
            dst = os.path.join(testing, sub, f"{sample_id}.{ext}")
            with open(src, "rb") as fs, open(dst, "wb") as fd:
                fd.write(fs.read())
    with open(os.path.join(root, "ImageSets", "test.txt"), "w") as f:
        f.write("\n".join(ids[num_train:]) + "\n")
