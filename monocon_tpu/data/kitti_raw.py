"""KITTI raw drive sequences for video inference.

Parity: reference ``dataset/kitti_raw_dataset.py`` — globs the frames of a
drive, parses ``calib_cam_to_cam.txt`` for P_rect_02, keeps the
unnormalized frame for video export, fakes the batch dim.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Optional

import cv2
import numpy as np

from .calib import Calibration
from .transforms import Compose, default_raw_transforms


def parse_cam_to_cam(path: str) -> np.ndarray:
    """Extract P_rect_02 (3, 4) from a KITTI-raw calib_cam_to_cam.txt."""
    with open(path) as f:
        for line in f:
            if line.startswith("P_rect_02"):
                vals = np.array(line.split(":")[1].split(), dtype=np.float32)
                return vals.reshape(3, 4)
    raise ValueError(f"P_rect_02 not found in {path}")


def _jpeg_shape(f) -> Optional[tuple]:
    """(h, w) from a JPEG's SOF segment via header seeks (no pixel
    decode). ``f`` is positioned anywhere past the 2-byte SOI; returns
    None on any malformed structure (caller falls back to cv2)."""
    f.seek(2)
    while True:
        b = f.read(2)
        if len(b) < 2 or b[0] != 0xFF:
            return None
        marker = b[1]
        while marker == 0xFF:  # fill bytes before a marker are legal
            nxt = f.read(1)
            if not nxt:
                return None
            marker = nxt[0]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue  # standalone markers carry no length
        seg = f.read(2)
        if len(seg) < 2:
            return None
        length = int.from_bytes(seg, "big")
        # SOF0-15 except DHT(C4)/JPG(C8)/DAC(CC): precision, height, width.
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            payload = f.read(5)
            if len(payload) < 5:
                return None
            return (int.from_bytes(payload[1:3], "big"),
                    int.from_bytes(payload[3:5], "big"))
        f.seek(length - 2, 1)


class KITTIRawDataset:
    def __init__(
        self,
        image_dir: str,
        calib_file: str,
        transforms: Optional[list] = None,
        img_extension: str = "png",
    ):
        pattern = os.path.join(image_dir, f"*.{img_extension}")
        self.image_files = sorted(glob.glob(pattern))
        assert self.image_files, f"no frames matching {pattern}"
        self.calib = Calibration.from_p2(parse_cam_to_cam(calib_file))
        self.transforms = Compose(
            default_raw_transforms() if transforms is None else transforms
        )

    def __len__(self) -> int:
        return len(self.image_files)

    def frame_shape(self, idx: int) -> tuple:
        """Raw (h, w) of frame ``idx`` from the file header — no full
        decode, so checking a whole drive for uniform resolution (one jit
        shape = one compile) is cheap. PNG reads IHDR, JPEG walks the
        segment list to a SOF marker; other formats fall back to a full
        decode (so a whole-drive sweep over them decodes every frame —
        callers should early-exit on the first mismatch)."""
        path = self.image_files[idx]
        with open(path, "rb") as f:
            head = f.read(26)
            if head[:8] == b"\x89PNG\r\n\x1a\n":
                w = int.from_bytes(head[16:20], "big")
                h = int.from_bytes(head[20:24], "big")
                return (h, w)
            if head[:2] == b"\xff\xd8":
                hw = _jpeg_shape(f)
                if hw is not None:
                    return hw
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img.shape[:2]

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.image_files[idx]
        bgr = cv2.imread(path)
        if bgr is None:
            raise FileNotFoundError(path)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        sample = {
            "img": rgb,
            "img_metas": {
                "idx": idx,
                "sample_idx": idx,
                "image_path": path,
                "ori_shape": rgb.shape[:2],
            },
            "calib": self.calib.copy(),
            "label": None,
        }
        sample = self.transforms(sample)
        # Fake batch dimension (reference Convert_3D_to_4D,
        # default_transforms.py:460-479).
        sample["img"] = sample["img"][None]
        if "ori_img" in sample:
            sample["ori_img"] = sample["ori_img"][None]
        sample["img_metas"] = {k: [v] for k, v in sample["img_metas"].items()}
        sample["calib"] = [sample["calib"]]
        return sample
