from .convert import (
    convert_to_kitti_2d,
    convert_to_kitti_3d,
    split_batch_detections,
    to_vis_format,
)
from .logging_utils import MetricsWriter, progress_bar, tprint

__all__ = [
    "convert_to_kitti_2d",
    "convert_to_kitti_3d",
    "split_batch_detections",
    "to_vis_format",
    "MetricsWriter",
    "progress_bar",
    "tprint",
]
