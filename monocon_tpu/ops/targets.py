"""Dense training-target generation, fully vectorized for jit.

The reference builds targets with a host-side Python double loop over
batch x objects on every training step (utils/target_generator.py:45-134),
the top vectorization target identified in SURVEY.md §3.1. Here the whole
thing is a batched array program over fixed (B, O) shapes that runs inside
the jitted train step — no host round-trips, no dynamic shapes.

Layout note: heatmap targets are produced NHWC ((B, H, W, C)) to match the
model's prediction layout.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .gaussian import gaussian_radius, splat_max_heatmap

PI = math.pi


import os


def resolve_pallas_targets(setting: object = "auto") -> bool:
    """Decide whether target generation uses the Pallas splat kernel.

    Precedence: env ``MONOCON_PALLAS_TARGETS=0/1`` overrides everything;
    then an explicit True/False ``setting`` (config ``TPU.PALLAS_TARGETS``);
    then ``'auto'``: OFF everywhere — the dense jnp path wins on the real
    chip, measured both standalone and in-context (round-5 device-trace
    A/B, ``scripts/pallas_train_ab.py``, artifact
    ``artifacts/r5/pallas_ab.json``): targets-only at B=16 the jnp program
    is 0.37 ms device vs pallas 3.57 ms (~10x), and the full bf16 train
    step is 108.2 ms/step (jnp) vs 111.3 ms (pallas). The round-4 auto-ON
    flip rested on an unrecorded '3.8 vs ~30 ms' comparison that the A/B
    could not reproduce; round 2's 'plain XLA stays the default' decision
    was correct. The kernel remains available via explicit config/env for
    shapes where tile-level support culling could win (e.g. much larger
    feature maps with sparse objects).
    """
    env = os.environ.get("MONOCON_PALLAS_TARGETS")
    if env is not None:
        if env not in ("0", "1"):
            # As strict as the config knob below: a typo ("true", "yes")
            # must not silently force the kernel OFF.
            raise ValueError(
                f"MONOCON_PALLAS_TARGETS must be '0' or '1', got {env!r}"
            )
        return env == "1"
    if isinstance(setting, bool):
        return setting
    if setting != "auto":
        raise ValueError(
            f"TPU.PALLAS_TARGETS must be true/false/'auto', got {setting!r}"
        )
    return False


def _splat(centers, radius, chan, valid, num_channels, feat_h, feat_w,
           use_pallas: Optional[bool]):
    """Dispatch Gaussian splatting: the Pallas TPU kernel with tile-level
    support culling, else the dense jnp path."""
    if use_pallas is None:
        use_pallas = resolve_pallas_targets()
    if use_pallas:
        from .pallas_splat import splat_max_heatmap_pallas

        return splat_max_heatmap_pallas(
            centers, radius, chan, valid, num_channels, feat_h, feat_w
        )
    return splat_max_heatmap(
        centers, radius, chan, valid, num_channels, feat_h, feat_w
    )


def angle_to_class(alpha: jnp.ndarray, num_bins: int = 12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha angle -> (bin index, residual), vectorized.

    Parity: reference ``TargetGenerator._convert_angle_to_class``
    (utils/target_generator.py:141-149).
    """
    two_pi = 2.0 * PI
    bin_size = two_pi / num_bins
    angle = jnp.mod(alpha, two_pi)
    shifted = jnp.mod(angle + bin_size / 2.0, two_pi)
    cls = jnp.floor(shifted / bin_size).astype(jnp.int32)
    residual = shifted - (cls.astype(shifted.dtype) * bin_size + bin_size / 2.0)
    return cls, residual


def class_to_angle(cls: jnp.ndarray, residual: jnp.ndarray, num_bins: int = 12) -> jnp.ndarray:
    """Inverse of :func:`angle_to_class`, wrapped to [-pi, pi].

    Parity: reference ``decode_alpha`` tail (monocon_heads.py:388-396).
    """
    bin_size = 2.0 * PI / num_bins
    alpha = cls.astype(residual.dtype) * bin_size + residual
    alpha = jnp.where(alpha > PI, alpha - 2 * PI, alpha)
    alpha = jnp.where(alpha < -PI, alpha + 2 * PI, alpha)
    return alpha


def generate_targets(
    label: Dict[str, jnp.ndarray],
    feat_hw: Tuple[int, int],
    pad_hw: Tuple[int, int],
    num_classes: int = 3,
    num_kpts: int = 9,
    num_alpha_bins: int = 12,
    use_pallas: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """Build all dense + sparse training targets for one batch.

    Args:
        label: fixed-shape batch label dict with keys
            ``gt_bboxes (B,O,4), gt_labels (B,O), gt_bboxes_3d (B,O,7),
            depths (B,O), gt_kpts_2d (B,O,2*num_kpts),
            gt_kpts_valid_mask (B,O,num_kpts), mask (B,O)``.
        feat_hw: static feature-map (H, W) (stride-4 map).
        pad_hw: static padded-image (H, W).

    Returns:
        Target dict matching the reference container
        (utils/target_generator.py:152-177), with heatmaps in NHWC.
    """
    feat_h, feat_w = feat_hw
    pad_h, pad_w = pad_hw
    h_ratio = feat_h / pad_h
    w_ratio = feat_w / pad_w

    bboxes = label["gt_bboxes"].astype(jnp.float32)          # (B, O, 4)
    mask = label["mask"].astype(bool)                        # (B, O)
    cls_ids = label["gt_labels"].astype(jnp.int32)           # (B, O)
    bboxes_3d = label["gt_bboxes_3d"].astype(jnp.float32)    # (B, O, 7)
    depths = label["depths"].astype(jnp.float32)             # (B, O)
    kpts = label["gt_kpts_2d"].astype(jnp.float32)           # (B, O, 2K)
    kpts_vis = label["gt_kpts_valid_mask"].astype(jnp.float32)  # (B, O, K)

    b, o = mask.shape
    k = num_kpts

    # --- object centers on the feature grid -------------------------------
    ctx = (bboxes[..., 0] + bboxes[..., 2]) * w_ratio / 2.0  # (B, O)
    cty = (bboxes[..., 1] + bboxes[..., 3]) * h_ratio / 2.0
    ctx_int = ctx.astype(jnp.int32)                          # trunc, >= 0
    cty_int = cty.astype(jnp.int32)

    feat_box_w = (bboxes[..., 2] - bboxes[..., 0]) * w_ratio
    feat_box_h = (bboxes[..., 3] - bboxes[..., 1]) * h_ratio

    radius_f = gaussian_radius(feat_box_h, feat_box_w)
    radius = jnp.maximum(0, jnp.trunc(radius_f)).astype(jnp.int32)  # (B, O)

    # --- center-class heatmap --------------------------------------------
    centers_int = jnp.stack([ctx_int, cty_int], axis=-1)     # (B, O, 2)
    center_heatmap = _splat(
        centers_int, radius, cls_ids, mask, num_classes, feat_h, feat_w,
        use_pallas,
    )                                                        # (B, C, H, W)

    # --- per-object regression rows --------------------------------------
    m2 = mask[..., None].astype(jnp.float32)
    indices = jnp.where(mask, cty_int * feat_w + ctx_int, 0).astype(jnp.int32)
    wh_target = jnp.stack([feat_box_w, feat_box_h], axis=-1) * m2
    offset_target = jnp.stack(
        [ctx - ctx_int.astype(jnp.float32), cty - cty_int.astype(jnp.float32)],
        axis=-1,
    ) * m2
    dim_target = bboxes_3d[..., 3:6] * m2
    depth_target = depths[..., None] * m2

    alpha = bboxes_3d[..., 6]
    alpha_cls, alpha_res = angle_to_class(alpha, num_alpha_bins)
    alpha_cls_target = jnp.where(mask, alpha_cls, 0)[..., None]
    alpha_offset_target = (alpha_res * mask.astype(alpha_res.dtype))[..., None]

    # --- keypoints --------------------------------------------------------
    kpts = kpts.reshape(b, o, k, 2)
    kx = kpts[..., 0] * w_ratio                              # (B, O, K)
    ky = kpts[..., 1] * h_ratio
    kx_int = jnp.trunc(kx).astype(jnp.int32)                 # trunc-toward-0
    ky_int = jnp.trunc(ky).astype(jnp.int32)

    kpt_visible = (kpts_vis >= 1) & mask[..., None]          # (B, O, K)
    kpt_in_feat = (
        (kx_int >= 0) & (kx_int < feat_w) & (ky_int >= 0) & (ky_int < feat_h)
    )
    kpt_splat = kpt_visible & kpt_in_feat

    # center->kpt offsets, relative to the *integer* object center.
    c2k_x = (kx - ctx_int.astype(jnp.float32)[..., None])
    c2k_y = (ky - cty_int.astype(jnp.float32)[..., None])
    vis_f = kpt_visible.astype(jnp.float32)
    c2k = jnp.stack([c2k_x * vis_f, c2k_y * vis_f], axis=-1) # (B, O, K, 2)
    center2kpt_offset_target = c2k.reshape(b, o, 2 * k)
    mask_center2kpt_offset = jnp.repeat(vis_f, 2, axis=-1).reshape(b, o, 2 * k)

    # kpt heatmaps: one channel per keypoint index. The channel is a static
    # axis, so dispatch each keypoint's O instances separately instead of
    # masking O*K instances against every channel (9x less work).
    kpt_centers = jnp.stack([kx_int, ky_int], axis=-1)        # (B, O, K, 2)
    if use_pallas is None:
        use_pallas = resolve_pallas_targets()
    if use_pallas:
        # One kernel launch over all O*K instances; the tile cull makes the
        # per-instance cost negligible.
        kpt_channel = jnp.broadcast_to(
            jnp.arange(k, dtype=jnp.int32)[None, None, :], (b, o, k)
        )
        kpt_heatmap = _splat(
            kpt_centers.reshape(b, o * k, 2),
            jnp.repeat(radius[..., None], k, axis=-1).reshape(b, o * k),
            kpt_channel.reshape(b, o * k),
            kpt_splat.reshape(b, o * k),
            k, feat_h, feat_w, True,
        )
    else:
        # Dense jnp path: dispatch per keypoint (static channel axis) to
        # avoid masking O*K instances against every channel.
        zero_chan = jnp.zeros((b, o), jnp.int32)
        kpt_heatmap = jnp.concatenate(
            [
                _splat(
                    kpt_centers[:, :, ki], radius, zero_chan,
                    kpt_splat[:, :, ki], 1, feat_h, feat_w, False,
                )
                for ki in range(k)
            ],
            axis=1,
        )                                                    # (B, K, H, W)

    splat_f = kpt_splat.astype(jnp.float32)
    indices_kpt = jnp.where(kpt_splat, ky_int * feat_w + kx_int, 0)
    kh_off = jnp.stack(
        [
            (kx - kx_int.astype(jnp.float32)) * splat_f,
            (ky - ky_int.astype(jnp.float32)) * splat_f,
        ],
        axis=-1,
    )
    kpt_heatmap_offset_target = kh_off.reshape(b, o, 2 * k)
    mask_kpt_heatmap_offset = jnp.repeat(splat_f, 2, axis=-1).reshape(b, o, 2 * k)

    return {
        # NHWC heatmaps (model layout).
        "center_heatmap_target": jnp.transpose(center_heatmap, (0, 2, 3, 1)),
        "kpt_heatmap_target": jnp.transpose(kpt_heatmap, (0, 2, 3, 1)),
        "wh_target": wh_target,
        "offset_target": offset_target,
        "dim_target": dim_target,
        "alpha_cls_target": alpha_cls_target,
        "alpha_offset_target": alpha_offset_target,
        "depth_target": depth_target,
        "center2kpt_offset_target": center2kpt_offset_target,
        "kpt_heatmap_offset_target": kpt_heatmap_offset_target,
        "indices": indices,
        "indices_kpt": indices_kpt.reshape(b, o * k),
        "mask_target": mask,
        "mask_center2kpt_offset": mask_center2kpt_offset,
        "mask_kpt_heatmap_offset": mask_kpt_heatmap_offset,
    }
