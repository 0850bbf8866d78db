from .losses import (
    dim_aware_l1_loss,
    gaussian_focal_loss,
    laplacian_aleatoric_uncertainty_loss,
    masked_binary_cross_entropy,
    masked_l1_loss,
)

__all__ = [
    "dim_aware_l1_loss",
    "gaussian_focal_loss",
    "laplacian_aleatoric_uncertainty_loss",
    "masked_binary_cross_entropy",
    "masked_l1_loss",
]
