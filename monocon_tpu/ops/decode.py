"""Batched 3D box decoding from head predictions — the hot inference path.

Parity: reference ``decode_heatmap`` / ``calculate_roty`` /
``convert_pts2D_to_pts3D`` (monocon_heads.py:399-558), redesigned TPU-first:

  * everything stays (B, K) fixed-shape with a validity mask — the
    reference's ragged per-image lists (monocon_heads.py:467-482) appear
    only at the final host conversion;
  * per-sample calibration enters as a (B, 3, 4) array; the 4x4 inverse
    projection is one batched solve instead of a Python loop over samples;
  * the origin shift to (0.5, 1.0, 0.5) (reference ``_get_bboxes``,
    monocon_heads.py:313-329) is fused in.

Everything here runs under jit on device.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax.numpy as jnp

from .heatmap import gather_feature, local_maximum, topk_from_heatmap
from .targets import class_to_angle

PI = math.pi


def decode_predictions(
    pred: Dict[str, jnp.ndarray],
    p2: jnp.ndarray,
    pad_hw: Tuple[int, int],
    topk: int = 30,
    local_maximum_kernel: int = 3,
    num_kpts: int = 9,
    num_alpha_bins: int = 12,
) -> Dict[str, jnp.ndarray]:
    """Decode head outputs into 2D + 3D boxes.

    Args:
        pred: head prediction dict (NHWC).
        p2: (B, 3, 4) per-sample camera projection matrices.
        pad_hw: static padded image (H, W).

    Returns dict with:
        bboxes_2d (B, K, 5): x1 y1 x2 y2 score (score already
            uncertainty-weighted);
        bboxes_3d (B, K, 7): x y z l h w ry, bottom-center origin;
        labels (B, K) int32 class ids;
        scores (B, K) final scores (same as bboxes_2d[..., 4]).
    """
    heatmap = pred["center_heatmap_pred"]
    b, feat_h, feat_w, _ = heatmap.shape
    img_h, img_w = pad_hw
    x_scale = img_w / feat_w
    y_scale = img_h / feat_h

    keep = local_maximum(heatmap, kernel=local_maximum_kernel)
    scores, inds, labels, ys, xs = topk_from_heatmap(keep, k=topk)
    ysf = ys.astype(jnp.float32)
    xsf = xs.astype(jnp.float32)

    wh = gather_feature(pred["wh_pred"], inds)                    # (B, K, 2)
    offset = gather_feature(pred["offset_pred"], inds)            # (B, K, 2)
    ctx = xsf + offset[..., 0]
    cty = ysf + offset[..., 1]

    x1 = (ctx - wh[..., 0] / 2.0) * x_scale
    y1 = (cty - wh[..., 1] / 2.0) * y_scale
    x2 = (ctx + wh[..., 0] / 2.0) * x_scale
    y2 = (cty + wh[..., 1] / 2.0) * y_scale

    # Alpha from bin argmax + per-bin residual.
    alpha_cls = gather_feature(pred["alpha_cls_pred"], inds)      # (B, K, A)
    alpha_off = gather_feature(pred["alpha_offset_pred"], inds)   # (B, K, A)
    cls = jnp.argmax(alpha_cls, axis=-1)                          # (B, K)
    residual = jnp.take_along_axis(alpha_off, cls[..., None], axis=-1)[..., 0]
    alpha = class_to_angle(cls, residual, num_alpha_bins)         # (B, K)

    # Depth + uncertainty-weighted score (monocon_heads.py:439-441).
    depth_pred = gather_feature(pred["depth_pred"], inds)         # (B, K, 2)
    sigma = jnp.exp(-depth_pred[..., 1])
    final_scores = scores * sigma

    # Projected 3D center = 9th keypoint offset from the peak cell
    # (monocon_heads.py:443-457).
    c2k = gather_feature(pred["center2kpt_offset_pred"], inds)    # (B, K, 18)
    center_u = (c2k[..., 2 * num_kpts - 2] + xsf) * x_scale
    center_v = (c2k[..., 2 * num_kpts - 1] + ysf) * y_scale

    # rot_y = alpha + atan2(u - cu, fu) (calculate_roty,
    # monocon_heads.py:485-515).
    fu = p2[:, 0:1, 0]                                            # (B, 1)
    cu = p2[:, 0:1, 2]
    rot_y = alpha + jnp.arctan2(center_u - cu, jnp.broadcast_to(fu, center_u.shape))
    rot_y = jnp.where(rot_y > PI, rot_y - 2 * PI, rot_y)
    rot_y = jnp.where(rot_y < -PI, rot_y + 2 * PI, rot_y)

    # Unproject (u, v, depth) -> camera xyz: one batched inverse of the
    # 4x4-padded P2 (vs the reference's per-sample Python loop,
    # monocon_heads.py:541-557).
    depth = depth_pred[..., 0]
    viewpad = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
    viewpad = viewpad.at[:, :3, :4].set(p2.astype(jnp.float32))
    inv_view = jnp.linalg.inv(viewpad)                            # (B, 4, 4)
    homo = jnp.stack(
        [center_u * depth, center_v * depth, depth, jnp.ones_like(depth)],
        axis=-1,
    )                                                             # (B, K, 4)
    center3d = jnp.einsum("bki,bji->bkj", homo, inv_view)[..., :3]

    dim = gather_feature(pred["dim_pred"], inds)                  # (B, K, 3)

    # Origin shift (0.5, 0.5, 0.5) -> (0.5, 1.0, 0.5): y += h/2
    # (reference _get_bboxes, monocon_heads.py:319-328).
    center3d = center3d.at[..., 1].add(dim[..., 1] * 0.5)

    bboxes_2d = jnp.stack([x1, y1, x2, y2, final_scores], axis=-1)
    bboxes_3d = jnp.concatenate(
        [center3d, dim, rot_y[..., None]], axis=-1
    )
    return {
        "bboxes_2d": bboxes_2d,
        "bboxes_3d": bboxes_3d,
        "labels": labels.astype(jnp.int32),
        "scores": final_scores,
    }
