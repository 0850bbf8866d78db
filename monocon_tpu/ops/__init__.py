from .gaussian import gaussian_radius, splat_max_heatmap
from .heatmap import gather_feature, local_maximum, topk_from_heatmap
from .targets import angle_to_class, class_to_angle, generate_targets

__all__ = [
    "gaussian_radius",
    "splat_max_heatmap",
    "gather_feature",
    "local_maximum",
    "topk_from_heatmap",
    "angle_to_class",
    "class_to_angle",
    "generate_targets",
]
