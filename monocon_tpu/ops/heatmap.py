"""Heatmap decode primitives (device-side, jit-friendly, NHWC layout).

TPU-native replacements for the reference's torch decode ops
(utils/tensor_ops.py:17-59): max-pool NMS via ``lax.reduce_window``, flat
top-k via ``lax.top_k``, and index gathers via ``take_along_axis``. All
shapes are static; results are (B, K) masked, never ragged.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def local_maximum(heatmap: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """Keep only local maxima of an NHWC heatmap (3x3 max-pool NMS).

    Parity: reference ``get_local_maximum`` (utils/tensor_ops.py:17-21).
    """
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heatmap,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heatmap, heatmap, 0.0)


def topk_from_heatmap(
    scores: jnp.ndarray, k: int = 30
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flat top-k over an NHWC heatmap.

    Parity: reference ``get_topk_from_heatmap`` (utils/tensor_ops.py:24-31),
    modulo tie-breaking order (we flatten HWC-major instead of CHW-major).

    Returns:
        (topk_scores, topk_spatial_inds, topk_classes, topk_ys, topk_xs),
        each (B, K). ``topk_spatial_inds`` indexes the flattened H*W plane
        and feeds :func:`gather_feature`.
    """
    b, h, w, c = scores.shape
    flat = scores.reshape(b, h * w * c)
    topk_scores, flat_inds = jax.lax.top_k(flat, k)
    spatial = flat_inds // c
    clses = flat_inds % c
    ys = spatial // w
    xs = spatial % w
    return topk_scores, spatial, clses, ys, xs


def gather_feature(feat: jnp.ndarray, spatial_inds: jnp.ndarray) -> jnp.ndarray:
    """Gather per-pixel feature vectors at flat spatial indices.

    NHWC equivalent of the reference ``transpose_and_gather_feat``
    (utils/tensor_ops.py:55-59) — NHWC needs no transpose.

    Args:
        feat: (B, H, W, C).
        spatial_inds: (B, K) flat indices into the H*W plane.

    Returns:
        (B, K, C).
    """
    b, h, w, c = feat.shape
    flat = feat.reshape(b, h * w, c)
    inds = spatial_inds[..., None].astype(jnp.int32)
    # mode="clip": out-of-range indices (masked slots, boundary boxes)
    # clamp instead of filling with NaN.
    return jnp.take_along_axis(flat, inds, axis=1, mode="clip")
