"""MonoCon training criterions as pure JAX functions.

Parity with the reference ``losses/`` package (losses/*.py), re-expressed as
masked fixed-shape reductions: where the reference boolean-filters gathered
rows into ragged ``(M, C)`` tensors, we keep ``(B, O, C)`` and divide by the
masked element count — mathematically identical means, jit-friendly shapes.

All functions take a float ``mask`` broadcastable to the row dimension and
guard the empty-mask case with a zero loss (the reference crashes there —
its known batch<=4 fragility, README.MD:208-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def _masked_mean(loss: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over elements where mask==1. ``mask`` broadcasts against loss."""
    mask = jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
    total = jnp.sum(mask)
    return jnp.where(total > 0, jnp.sum(loss * mask) / jnp.maximum(total, 1.0), 0.0)


def gaussian_focal_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    gamma: float = 2.0,
    beta: float = 4.0,
    sample_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """CenterNet penalty-reduced focal loss on sigmoid heatmaps.

    Parity: reference ``GaussianFocalLoss`` (losses/focal_loss.py:22-44).
    ``pred`` must already be sigmoid-clamped to (0, 1).

    ``sample_weight`` (B,) zeroes whole samples (padded batch rows) out of
    both loss terms and the positive count.
    """
    eps = 1e-12
    pos = (target == 1.0).astype(pred.dtype)
    neg = (target < 1.0).astype(pred.dtype)

    neg_weights = jnp.power(1.0 - target, beta)
    pos_loss = jnp.log(pred + eps) * jnp.power(1.0 - pred, gamma) * pos
    neg_loss = jnp.log(1.0 - pred + eps) * jnp.power(pred, gamma) * neg_weights * neg

    if sample_weight is not None:
        w = sample_weight.reshape(
            (-1,) + (1,) * (pred.ndim - 1)
        ).astype(pred.dtype)
        pos, pos_loss, neg_loss = pos * w, pos_loss * w, neg_loss * w

    num_pos = jnp.sum(pos)
    pos_sum = jnp.sum(pos_loss)
    neg_sum = jnp.sum(neg_loss)
    return jnp.where(
        num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0)
    )


def masked_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    avg_factor: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """L1 with mean-over-valid-elements or explicit ``avg_factor``.

    Parity: reference ``L1Loss`` (losses/l1_loss.py) /
    ``weight_reduce_loss`` (losses/utils.py:20-34).
    """
    diff = jnp.abs(pred - target)
    mask = jnp.broadcast_to(mask, diff.shape).astype(diff.dtype)
    if avg_factor is not None:
        return jnp.sum(diff * mask) / avg_factor
    return _masked_mean(diff, mask)


def dim_aware_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    dims: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Dimension-aware L1: |d - d*| / stop_grad(d), rescaled so its mean
    matches the plain L1 mean (detached compensation weight).

    Parity: reference ``DimAwareL1Loss`` (losses/dim_loss.py:14-24).
    """
    dims = jax.lax.stop_gradient(dims)
    diff = jnp.abs(pred - target)
    loss = diff / dims
    l1_mean = _masked_mean(diff, mask)
    loss_mean = _masked_mean(loss, mask)
    # Raw division, matching the reference exactly (dims may be negative or
    # tiny early in training; the reference does not guard either).
    compensation = jax.lax.stop_gradient(
        jnp.where(loss_mean == 0, 1.0, l1_mean / loss_mean)
    )
    return _masked_mean(loss * compensation, mask)


def laplacian_aleatoric_uncertainty_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    log_variance: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """sqrt(2) * exp(-s) * |x - x*| + s, averaged over valid rows.

    Parity: reference ``LaplacianAleatoricUncertaintyLoss``
    (losses/depth_loss.py:11-20) — including its 1.4142 constant.
    """
    loss = 1.4142 * jnp.exp(-log_variance) * jnp.abs(pred - target) + log_variance
    return _masked_mean(loss, mask)


def masked_binary_cross_entropy(
    logits: jnp.ndarray,
    onehot: jnp.ndarray,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Sigmoid BCE against one-hot targets, mean over valid elements.

    Parity: reference ``CrossEntropyLoss(use_sigmoid=True)``
    (losses/cross_entropy_loss.py:13-40).
    """
    # Numerically stable BCE-with-logits.
    loss = jnp.maximum(logits, 0) - logits * onehot + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return _masked_mean(loss, mask)
