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
from . import geometry

__all__ = [
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
