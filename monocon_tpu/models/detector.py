"""MonoCon detector: DLA backbone -> DLA-Up neck -> dense heads.

Parity: reference ``model/detector/monocon_detector.py``. The forward is a
pure function of (params, batch_stats, image); training losses, decode, and
eval-format conversion are separate composable stages (ops/, engine/).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .dla import ARCH_SETTINGS, DLA
from .heads import MonoConHeads
from .neck import DLAUp

Dtype = Any


class MonoConDetector(nn.Module):
    num_layers: int = 34
    num_classes: int = 3
    num_kpts: int = 9
    num_alpha_bins: int = 12
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, image: jnp.ndarray, train: bool = False,
                 valid: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """image: (B, H, W, 3) normalized NHWC -> prediction dict at
        stride 4. ``valid`` (B,) 0/1 keeps padded remainder rows out of
        every BatchNorm batch statistic (see layers.bn_mask)."""
        channels = ARCH_SETTINGS[self.num_layers][2]
        feats = DLA(self.num_layers, dtype=self.dtype, name="backbone")(
            image, train=train, valid=valid
        )
        neck_out = DLAUp(
            in_features_list=tuple(channels[2:]),
            scales_list=(1, 2, 4, 8),
            start_level=2,
            dtype=self.dtype,
            name="neck",
        )(feats, train=train, valid=valid)
        # Head input width: 64 for DLA-34/46, 128 otherwise
        # (reference monocon_detector.py:45-48).
        feat_ch = 64 if self.num_layers in (34, 46) else 128
        return MonoConHeads(
            num_classes=self.num_classes,
            num_kpts=self.num_kpts,
            num_alpha_bins=self.num_alpha_bins,
            feat_ch=feat_ch,
            dtype=self.dtype,
            name="heads",
        )(neck_out, train=train, valid=valid)


def create_detector_state(
    rng,
    num_layers: int = 34,
    num_classes: int = 3,
    image_hw: Tuple[int, int] = (384, 1280),
    dtype: Optional[Dtype] = None,
) -> Tuple[MonoConDetector, Dict[str, Any]]:
    """Initialize model variables ({'params', 'batch_stats'})."""
    import jax

    model = MonoConDetector(
        num_layers=num_layers, num_classes=num_classes, dtype=dtype
    )
    dummy = jnp.zeros((1, *image_hw, 3), jnp.float32)
    # jit the initializer: one compiled program instead of hundreds of
    # eager op dispatches (and it hits the persistent compilation cache).
    init_fn = jax.jit(lambda r, x: model.init(r, x, train=False))
    variables = jax.tree.map(lambda a: a, init_fn(rng, dummy))
    return model, variables
