"""MonoCon dense prediction heads (Flax linen, NHWC).

Parity: reference ``model/dense_heads/monocon_heads.py:38-200``. This module
holds only the *network* (10 heads) and the prediction post-ops; target
generation lives in ``ops/targets.py``, losses in ``engine/train_step.py``,
decoding in ``ops/decode.py`` — fixing the reference's layering violations
(SURVEY.md §1).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import AttnBatchNorm

Dtype = Any

EPS = 1e-12
HEAT_MIN, HEAT_MAX = 1e-4, 1.0 - 1e-4


def small_normal_init(key, shape, dtype=jnp.float32):
    """N(0, 0.001) init for regression-head convs
    (reference init_weights, monocon_heads.py:139-146)."""
    return jax.random.normal(key, shape, dtype) * 0.001


class HeadBranch(nn.Module):
    """3x3 conv -> AttnBN(10) -> ReLU -> 1x1 conv
    (reference ``_build_head``, monocon_heads.py:114-120)."""

    feat_ch: int
    out_ch: int
    final_bias_init: float = 0.0
    small_init: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid=None) -> jnp.ndarray:
        kinit = small_normal_init if self.small_init else nn.initializers.kaiming_normal()
        x = nn.Conv(self.feat_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=kinit, dtype=self.dtype, name="conv1")(x)
        x = AttnBatchNorm(self.feat_ch, num_affine=10, momentum=0.03,
                          eps=1e-3, dtype=self.dtype, name="norm")(
            x, train=train, valid=valid)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_ch, (1, 1),
            kernel_init=kinit,
            bias_init=nn.initializers.constant(self.final_bias_init),
            dtype=self.dtype, name="conv2",
        )(x)
        return x


class DirBranch(nn.Module):
    """Shared dir feature -> separate bin-cls / bin-residual 1x1 convs
    (reference ``_build_dir_head``, monocon_heads.py:123-131)."""

    feat_ch: int
    num_bins: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False, valid=None):
        feat = nn.Conv(self.feat_ch, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=small_normal_init, dtype=self.dtype,
                       name="feat_conv")(x)
        feat = AttnBatchNorm(self.feat_ch, num_affine=10, momentum=0.03,
                             eps=1e-3, dtype=self.dtype, name="feat_norm")(
            feat, train=train, valid=valid)
        feat = nn.relu(feat)
        cls = nn.Conv(self.num_bins, (1, 1), kernel_init=small_normal_init,
                      dtype=self.dtype, name="cls_conv")(feat)
        reg = nn.Conv(self.num_bins, (1, 1), kernel_init=small_normal_init,
                      dtype=self.dtype, name="reg_conv")(feat)
        return cls, reg


class MonoConHeads(nn.Module):
    """The 10 MonoCon prediction heads over the stride-4 feature map.

    Output dict (all NHWC, float32 at the boundary):
      center_heatmap (C_cls), kpt_heatmap (9): sigmoid-clamped;
      wh (2), offset (2), kpt_heatmap_offset (2), center2kpt_offset (18);
      dim (3); depth (2: [1/sigmoid(x)-1, log_var]);
      alpha_cls (12), alpha_offset (12): raw logits / residuals.
    """

    num_classes: int = 3
    num_kpts: int = 9
    num_alpha_bins: int = 12
    feat_ch: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False,
                 valid=None) -> Dict[str, jnp.ndarray]:
        # Heatmap prior bias: -log((1-p)/p), p=0.1 (monocon_heads.py:134-137).
        prior_bias = float(-math.log((1 - 0.1) / 0.1))
        mk = lambda out_ch, name, bias=0.0: HeadBranch(
            self.feat_ch, out_ch, final_bias_init=bias, dtype=self.dtype,
            name=name,
        )

        center_heatmap = mk(self.num_classes, "heatmap", prior_bias)(feat, train, valid=valid)
        kpt_heatmap = mk(self.num_kpts, "kpt_heatmap", prior_bias)(feat, train, valid=valid)
        wh = mk(2, "wh")(feat, train, valid=valid)
        offset = mk(2, "offset")(feat, train, valid=valid)
        kpt_heatmap_offset = mk(2, "kpt_heatmap_offset")(feat, train, valid=valid)
        center2kpt_offset = mk(self.num_kpts * 2, "center2kpt_offset")(feat, train, valid=valid)
        dim = mk(3, "dim")(feat, train, valid=valid)
        depth = mk(2, "depth")(feat, train, valid=valid)
        alpha_cls, alpha_offset = DirBranch(
            self.feat_ch, self.num_alpha_bins, dtype=self.dtype, name="dir"
        )(feat, train, valid=valid)

        # Prediction post-ops (reference _get_predictions,
        # monocon_heads.py:165-200), in float32 for numerical parity.
        f32 = lambda t: t.astype(jnp.float32)
        center_heatmap = jnp.clip(jax.nn.sigmoid(f32(center_heatmap)), HEAT_MIN, HEAT_MAX)
        kpt_heatmap = jnp.clip(jax.nn.sigmoid(f32(kpt_heatmap)), HEAT_MIN, HEAT_MAX)
        depth = f32(depth)
        depth_val = 1.0 / (jax.nn.sigmoid(depth[..., 0:1]) + EPS) - 1.0
        depth = jnp.concatenate([depth_val, depth[..., 1:2]], axis=-1)

        return {
            "center_heatmap_pred": center_heatmap,
            "kpt_heatmap_pred": kpt_heatmap,
            "wh_pred": f32(wh),
            "offset_pred": f32(offset),
            "kpt_heatmap_offset_pred": f32(kpt_heatmap_offset),
            "center2kpt_offset_pred": f32(center2kpt_offset),
            "dim_pred": f32(dim),
            "depth_pred": depth,
            "alpha_cls_pred": f32(alpha_cls),
            "alpha_offset_pred": f32(alpha_offset),
        }
