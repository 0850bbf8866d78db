from .kitti_eval import kitti_eval, kitti_eval_coco_style
from .protocol import eval_class, clean_data, image_box_overlap
from .rotate_iou import rotate_iou_matrix

__all__ = [
    "kitti_eval",
    "kitti_eval_coco_style",
    "eval_class",
    "clean_data",
    "image_box_overlap",
    "rotate_iou_matrix",
]
