"""Jitted training step: target generation + forward + 10 losses + update.

The whole step — including dense target generation, which the reference
runs as a host-side Python loop every iteration
(utils/target_generator.py:45-134) — is one XLA program. Loss math parity:
reference ``MonoConDenseHeads._get_losses`` (monocon_heads.py:203-310) with
its loss weights (wh 0.1, all others 1.0, monocon_heads.py:98-111).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import (
    dim_aware_l1_loss,
    gaussian_focal_loss,
    laplacian_aleatoric_uncertainty_loss,
    masked_binary_cross_entropy,
    masked_l1_loss,
)
from ..ops.heatmap import gather_feature
from ..ops.image_norm import normalize_if_raw
from ..ops.targets import generate_targets

EPS = 1e-12


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def compute_losses(
    pred: Dict[str, jnp.ndarray],
    target: Dict[str, jnp.ndarray],
    num_kpts: int = 9,
    num_alpha_bins: int = 12,
    sample_valid: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """All ten criterions on fixed-shape (B, O) masked rows.

    ``sample_valid`` (B,) zeroes padded batch rows out of every loss term
    (object rows via the mask, heatmap pixels via the focal sample weight);
    together with the BN batch-stat mask (models.layers.bn_mask) a batch
    padded to a static size yields exactly the same losses and the same
    new ``batch_stats`` as the unpadded batch."""
    indices = target["indices"]                    # (B, O)
    indices_kpt = target["indices_kpt"]            # (B, O*K)
    mask = target["mask_target"].astype(jnp.float32)  # (B, O)
    if sample_valid is not None:
        mask = mask * sample_valid.astype(jnp.float32)[:, None]
    row_mask = mask[..., None]                     # (B, O, 1)
    b, o = mask.shape

    gathered = {
        key: gather_feature(pred[key], indices)
        for key in ("offset_pred", "wh_pred", "dim_pred", "depth_pred",
                    "center2kpt_offset_pred", "alpha_cls_pred",
                    "alpha_offset_pred")
    }

    loss_offset = masked_l1_loss(gathered["offset_pred"], target["offset_target"], row_mask)
    loss_wh = 0.1 * masked_l1_loss(gathered["wh_pred"], target["wh_target"], row_mask)
    loss_dim = dim_aware_l1_loss(
        gathered["dim_pred"], target["dim_target"], gathered["dim_pred"], row_mask
    )

    depth_pred = gathered["depth_pred"][..., 0:1]
    depth_log_var = gathered["depth_pred"][..., 1:2]
    loss_depth = laplacian_aleatoric_uncertainty_loss(
        depth_pred, target["depth_target"], depth_log_var, row_mask
    )

    loss_center_heatmap = gaussian_focal_loss(
        pred["center_heatmap_pred"], target["center_heatmap_target"],
        sample_weight=sample_valid,
    )
    loss_kpt_heatmap = gaussian_focal_loss(
        pred["kpt_heatmap_pred"], target["kpt_heatmap_target"],
        sample_weight=sample_valid,
    )

    # center->kpt offsets: pred zeroed outside the kpt mask, averaged by the
    # kpt-mask count (monocon_heads.py:257-264).
    m_c2k = target["mask_center2kpt_offset"] * row_mask
    c2k_pred = gathered["center2kpt_offset_pred"] * m_c2k
    loss_center2kpt = masked_l1_loss(
        c2k_pred, target["center2kpt_offset_target"], row_mask,
        avg_factor=jnp.sum(m_c2k) + EPS,
    )

    # kpt-heatmap sub-pixel offsets: gathered at per-kpt indices; the
    # reference averages |pred - target| over *valid-object rows* by the
    # kpt-mask count without zeroing unmasked components
    # (monocon_heads.py:266-275) — reproduced faithfully.
    kh_pred = gather_feature(pred["kpt_heatmap_offset_pred"], indices_kpt)
    kh_pred = kh_pred.reshape(b, o, num_kpts * 2)
    m_kh = target["mask_kpt_heatmap_offset"] * row_mask
    loss_kpt_heatmap_offset = masked_l1_loss(
        kh_pred * row_mask, target["kpt_heatmap_offset_target"], row_mask,
        avg_factor=jnp.sum(m_kh) + EPS,
    )

    # Alpha bin classification (sigmoid BCE vs one-hot) + residual L1 at
    # the target bin (monocon_heads.py:282-298).
    alpha_cls = target["alpha_cls_target"][..., 0].astype(jnp.int32)  # (B, O)
    onehot = jax.nn.one_hot(alpha_cls, num_alpha_bins, dtype=jnp.float32)
    loss_alpha_cls = masked_binary_cross_entropy(
        gathered["alpha_cls_pred"], onehot, row_mask
    )
    alpha_res_pred = jnp.sum(
        gathered["alpha_offset_pred"] * onehot, axis=-1, keepdims=True
    )
    loss_alpha_reg = masked_l1_loss(
        alpha_res_pred, target["alpha_offset_target"], row_mask
    )

    return {
        "loss_center_heatmap": loss_center_heatmap,
        "loss_wh": loss_wh,
        "loss_offset": loss_offset,
        "loss_dim": loss_dim,
        "loss_center2kpt_offset": loss_center2kpt,
        "loss_kpt_heatmap": loss_kpt_heatmap,
        "loss_kpt_heatmap_offset": loss_kpt_heatmap_offset,
        "loss_alpha_cls": loss_alpha_cls,
        "loss_alpha_reg": loss_alpha_reg,
        "loss_depth": loss_depth,
    }


# Rematerialization policies for the optional whole-model checkpoint wrap
# (memory-pressure experiments; None = let XLA decide, the default).
REMAT_POLICIES = {
    "full": None,  # save nothing: recompute the whole forward in backward
    "dots": "checkpoint_dots",
    "dots_no_batch": "dots_with_no_batch_dims_saveable",
}


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    feat_stride: int = 4,
    use_pallas: "bool | None" = None,
    remat: "str | None" = None,
):
    """Build the jittable train step closure.

    The returned function maps (state, batch) -> (state, loss_dict) where
    ``batch = {'img': (B,H,W,3), 'label': {...fixed-shape...}}``. Heatmap
    target shapes derive from the static image shape. ``use_pallas``
    selects the target-generation splat path (None: platform-aware
    default, ops/targets.py resolve_pallas_targets). ``remat`` wraps the
    model apply in ``jax.checkpoint`` with a named policy
    (REMAT_POLICIES) to trade recompute FLOPs for activation memory —
    an anti-lever against XLA's spontaneous ``.remat`` duplication under
    HBM pressure (observed at B=64, see STATUS round-3 training notes).
    """
    policy = None
    if remat is not None:
        name = REMAT_POLICIES[remat]
        policy = (getattr(jax.checkpoint_policies, name)
                  if name is not None else None)

    def train_step(state: TrainState, batch: Dict[str, Any]):
        # uint8 transport -> f32; img_hw zeroes the padded border to match
        # the float32 transport's post-Normalize 0.0 fill.
        img = normalize_if_raw(batch["img"], batch.get("img_hw"))
        valid = batch.get("valid")  # (B,) 0/1 for padded remainder batches
        pad_hw = (img.shape[1], img.shape[2])
        feat_hw = (pad_hw[0] // feat_stride, pad_hw[1] // feat_stride)
        target = generate_targets(batch["label"], feat_hw, pad_hw,
                                  use_pallas=use_pallas)

        def apply_fn(params, img):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                img,
                train=True,
                # padded remainder rows stay out of BN batch statistics
                # (masked moments, exact) — see models.layers.bn_mask
                valid=valid,
                mutable=["batch_stats"],
            )

        if remat is not None:
            apply_fn = jax.checkpoint(apply_fn, policy=policy)

        def loss_fn(params):
            pred, new_model_state = apply_fn(params, img)
            losses = compute_losses(pred, target, sample_valid=valid)
            total = sum(losses.values())
            return total, (losses, new_model_state["batch_stats"])

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        losses["total_loss"] = total
        return new_state, losses

    return train_step


def create_train_state(
    variables: Dict[str, Any], optimizer: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
