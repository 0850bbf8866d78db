"""2D / projected-3D / BEV visualization + video export (host, OpenCV).

Parity: reference ``utils/visualizer.py`` — translucent 2D boxes,
12-edge 3D wireframes, 60 m BEV canvas at scale 10 with polar grid,
per-class colors, mp4 export for raw sequences. Operates on numpy
detections (our vis format) instead of torch tensors.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import cv2
import numpy as np

from ..data.geometry import boxes3d_to_corners, project_to_image

CLASSES = ("Pedestrian", "Cyclist", "Car")
CLASS_IDX_TO_COLOR = {0: (255, 0, 0), 1: (0, 255, 0), 2: (0, 0, 255)}

# Wireframe edges over the corner ordering of boxes3d_to_corners
# (reference visualizer.py:117-118).
LINE_INDICES = ((0, 1), (0, 3), (0, 4), (1, 2), (1, 5), (3, 2), (3, 7),
                (4, 5), (4, 7), (2, 6), (5, 6), (6, 7))


class Visualizer:
    def __init__(
        self,
        dataset,
        vis_format: List[Dict[str, Any]],
        scale_hw: Optional[Sequence[float]] = None,
    ):
        assert len(dataset) == len(vis_format), (
            "dataset length must equal the number of vis results")
        self.dataset = dataset
        self.pred_bbox_2d = [f["img_bbox2d"] for f in vis_format]
        self.pred_bbox_3d = [f["img_bbox"] for f in vis_format]
        self.scale_hw = np.array([1.0, 1.0] if scale_hw is None else scale_hw)
        self.mode = ("raw" if dataset.__class__.__name__ == "KITTIRawDataset"
                     else "normal")

    # ------------------------------------------------------------------
    def get_labels(self, idx: int, search_key) -> List[np.ndarray]:
        """GT label arrays for image ``idx``, mask-filtered to valid rows.

        Parity: reference ``Visualizer.get_labels``
        (utils/visualizer.py:49-64)."""
        assert self.mode == "normal", (
            "This method is only available in 'normal' mode.")
        label = self.dataset[int(idx)]["label"]
        mask = np.asarray(label["mask"]).astype(bool)
        keys = [search_key] if isinstance(search_key, str) else search_key
        return [np.asarray(label[k])[mask] for k in keys]

    def _load_image(self, idx: int) -> np.ndarray:
        if self.mode == "normal":
            return self.dataset.load_image(idx)[0].copy()
        return np.ascontiguousarray(self.dataset[idx]["ori_img"][0])

    def _load_calib(self, idx: int):
        if self.mode == "normal":
            return self.dataset.load_calib(idx)
        return self.dataset[idx]["calib"][0]

    # ------------------------------------------------------------------
    def plot_bboxes_2d(self, idx: int, save_path: Optional[str] = None):
        image = self._load_image(idx)
        s = 1.0 / np.array([*self.scale_hw[::-1], *self.scale_hw[::-1]])
        for c_idx, boxes in enumerate(self.pred_bbox_2d[idx]):
            color = CLASS_IDX_TO_COLOR[c_idx]
            for box in np.asarray(boxes):
                coords = (box[:4] * s).astype(np.int32)
                image = self._transparent_box(image, coords, color)
        return self._emit(image, save_path)

    def plot_bboxes_3d(self, idx: int, save_path: Optional[str] = None):
        image = self._load_image(idx)
        calib = self._load_calib(idx)
        boxes = np.asarray(self.pred_bbox_3d[idx]["boxes_3d"])
        labels = np.asarray(self.pred_bbox_3d[idx]["labels_3d"])
        if len(boxes) > 0:
            corners = boxes3d_to_corners(
                boxes[:, :3], boxes[:, 3:6], boxes[:, 6]
            )                                             # (N, 8, 3)
            proj = project_to_image(corners, calib.P2)    # (N, 8, 2)
            s = 1.0 / self.scale_hw[::-1]
            proj = (np.round(proj - 1) * s).astype(np.int32)
            for n in range(len(boxes)):
                color = CLASS_IDX_TO_COLOR[int(labels[n])]
                for start, end in LINE_INDICES:
                    image = cv2.line(
                        image, tuple(proj[n, start]), tuple(proj[n, end]),
                        color, thickness=2, lineType=cv2.LINE_AA,
                    )
        return self._emit(image, save_path)

    def plot_bev(self, idx: int, save_path: Optional[str] = None):
        MAX_DIST, SCALE = 60, 10
        r = MAX_DIST * SCALE
        space = np.zeros((r * 2, r * 2, 3), dtype=np.uint8)
        for theta in np.linspace(0, np.pi, 7):
            space = cv2.line(
                space,
                (int(r - r * np.cos(theta)), int(r - r * np.sin(theta))),
                (r, r), (255, 255, 255), 2, cv2.LINE_AA,
            )
        for radius in np.linspace(0, r, 5)[1:]:
            space = cv2.circle(space, (r, r), int(radius), (255, 255, 255),
                               2, cv2.LINE_AA)
        space = space[:r, :, :]

        boxes = np.asarray(self.pred_bbox_3d[idx]["boxes_3d"])
        labels = np.asarray(self.pred_bbox_3d[idx]["labels_3d"])
        if len(boxes) > 0:
            bev = boxes[:, [0, 2, 3, 5, 6]].copy()        # x, z, l, w, ry
            bev[:, :4] *= SCALE
            bev[:, 1] *= -1
            bev[:, :2] += r
            for n in range(len(bev)):
                rect = ((bev[n, 0], bev[n, 1]), (bev[n, 2], bev[n, 3]),
                        float(bev[n, 4] * 180 / np.pi))
                pts = np.asarray(cv2.boxPoints(rect)).astype(np.int32)
                color = CLASS_IDX_TO_COLOR[int(labels[n])]
                space = cv2.drawContours(space, [pts], -1, color,
                                         thickness=-1, lineType=cv2.LINE_AA)
        return self._emit(space, save_path)

    # ------------------------------------------------------------------
    def export_as_video(
        self,
        save_dir: str,
        plot_items: Sequence[str] = ("2d", "3d", "bev"),
        fps: int = 20,
    ) -> None:
        assert self.mode == "raw", "video export needs a raw-sequence dataset"
        fn_map = {"2d": self.plot_bboxes_2d, "3d": self.plot_bboxes_3d,
                  "bev": self.plot_bev}
        os.makedirs(save_dir, exist_ok=True)
        for item in plot_items:
            frames = [fn_map[item](i) for i in range(len(self.dataset))]
            path = os.path.join(save_dir, f"{item}.mp4")
            h, w = frames[0].shape[:2]
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
            )
            for frame in frames:
                writer.write(cv2.cvtColor(frame.astype(np.uint8),
                                          cv2.COLOR_RGB2BGR))
            writer.release()

    # ------------------------------------------------------------------
    @staticmethod
    def _transparent_box(image, box, color, alpha: float = 0.2):
        x1, y1, x2, y2 = [int(v) for v in box]
        outlined = cv2.rectangle(image.copy(), (x1, y1), (x2, y2), color,
                                 thickness=2, lineType=cv2.LINE_AA)
        filled = cv2.rectangle(image.copy(), (x1, y1), (x2, y2), color, -1)
        return cv2.addWeighted(filled, alpha, outlined, 1 - alpha, 0)

    @staticmethod
    def _emit(image, save_path):
        if save_path is not None:
            cv2.imwrite(save_path, cv2.cvtColor(image.astype(np.uint8),
                                                cv2.COLOR_RGB2BGR))
            return None
        return image
