from .calib import Calibration
from .labels import (
    CLASS_TO_IDX,
    IDX_TO_CLASS,
    ObjectLabels,
    object_levels,
    projected_centers_3d,
    projected_keypoints,
    shift_cam,
    yaw_global_to_local,
    yaw_local_to_global,
    bottom_to_gravity_center,
)
from . import geometry, transforms
from .base_dataset import KittiMono3D, load_split_ids
from .kitti_raw import KITTIRawDataset
from .loader import DataLoader, collate
from .monocon_dataset import DEFAULT_FILTER_CONFIG, MonoConDataset, empty_labels

__all__ = [
    "KittiMono3D",
    "load_split_ids",
    "KITTIRawDataset",
    "DataLoader",
    "collate",
    "MonoConDataset",
    "DEFAULT_FILTER_CONFIG",
    "empty_labels",
    "transforms",
    "Calibration",
    "ObjectLabels",
    "CLASS_TO_IDX",
    "IDX_TO_CLASS",
    "object_levels",
    "projected_centers_3d",
    "projected_keypoints",
    "shift_cam",
    "yaw_global_to_local",
    "yaw_local_to_global",
    "bottom_to_gravity_center",
    "geometry",
]
