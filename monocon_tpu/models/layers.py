"""Shared model building blocks (Flax linen, NHWC).

BatchNorm momentum note: torch updates running stats as
``running = (1 - m_torch) * running + m_torch * batch``; flax as
``running = m_flax * running + (1 - m_flax) * batch`` — so
``m_flax = 1 - m_torch`` (torch 0.1 -> flax 0.9, torch 0.03 -> flax 0.97).

Under data parallelism with jit+NamedSharding the batch reductions inside
BatchNorm are global (XLA inserts the collectives), so cross-replica
"sync BN" comes for free — no axis_name plumbing required.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import normalization as _fl_norm

Dtype = Any

# torch BatchNorm2d defaults used across the backbone/neck (momentum=0.1).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def bn_mask(valid: Optional[jnp.ndarray], ndim: int) -> Optional[jnp.ndarray]:
    """(B,) 0/1 sample-validity -> BN batch-stat mask broadcastable to an
    ``ndim``-rank activation, or None when all rows are real.

    Batches padded to a static size (DataLoader.pad_to_batch) repeat
    samples; losses mask them exactly, and this mask keeps them out of the
    BatchNorm batch moments too (flax computes ``mean(..., where=mask)``),
    so train numerics match the reference's smaller final batch
    (engine/monocon_engine.py:58-72) instead of seeing repeated rows."""
    if valid is None:
        return None
    return valid.astype(bool).reshape(valid.shape + (1,) * (ndim - 1))


class TorchBatchNorm(nn.BatchNorm):
    """``nn.BatchNorm`` with torch's running-variance semantics.

    torch ``BatchNorm2d`` normalizes train-mode activations with the BIASED
    batch variance but accumulates the UNBIASED (Bessel-corrected, n/(n-1))
    variance into ``running_var``; flax stores the biased one. The per-update
    deviation is negligible for spatial BN (n = B*H*W) but is a factor
    B/(B-1) for the AttnWeights ``(B,1,1,K)`` BN (attentive_norm.py:104-109)
    where the reduction count is just the batch — ~7%/update at B=16.
    Eval mode reads ``running_var``, so reference parity requires the torch
    rule. Variable collections/names ('batch_stats': mean/var) and the
    ``mask=`` API are identical to ``nn.BatchNorm``; only the ``ra_var``
    update line differs. The flax-internal ``_compute_stats``/
    ``_normalize`` helpers are reused DELIBERATELY (flax is pinned in
    this image): normalization numerics stay bit-identical to upstream
    ``nn.BatchNorm``, so every parity test pins them too — if a flax
    upgrade moves these, the f64 goldens fail loudly.
    """

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask: Optional[jnp.ndarray] = None):
        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _fl_norm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable(
            "batch_stats", "var",
            lambda s: jnp.ones(s, jnp.float32), feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _fl_norm._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=None, axis_index_groups=None,
                use_fast_variance=self.use_fast_variance, mask=mask,
                # honor the flax knob (default True): False computes the
                # batch-moment sweeps in the activation dtype (bf16) —
                # a bandwidth experiment, NOT the parity configuration
                # (scripts/train_perf_experiments.py --bf16-stats).
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                if mask is None:
                    n = 1.0
                    for ax in reduction_axes:
                        n *= x.shape[ax]
                    bessel = n / max(n - 1.0, 1.0)  # static -> folded
                else:
                    n = jnp.sum(
                        jnp.broadcast_to(mask, x.shape),
                        axis=reduction_axes, dtype=jnp.float32)
                    bessel = n / jnp.maximum(n - 1.0, 1.0)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        return _fl_norm._normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale,
            self.bias_init, self.scale_init,
            self.force_float32_reductions,
        )


def he_normal_conv_init(key, shape, dtype=jnp.float32):
    """Reference conv init: N(0, sqrt(2 / (kh*kw*out_ch)))
    (model/backbone/dla.py:264-269, dla_neck.py:74-80)."""
    kh, kw, _, out_ch = shape
    std = jnp.sqrt(2.0 / (kh * kw * out_ch))
    return jax.random.normal(key, shape, dtype) * std


class ConvBnRelu(nn.Module):
    """3x3/any conv -> BN -> ReLU block (reference ``Conv2dBlock``,
    dla_neck.py:11-35, and the DLA stem/level convs)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size // 2)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=he_normal_conv_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x, mask=bn_mask(valid, x.ndim))
        return nn.relu(x)


def hsigmoid_v2(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 6 (reference ``HSigmoidv2``, attentive_norm.py:12-21)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class AttnWeights(nn.Module):
    """Instance attention over K affine transforms (attn_mode=0, RSD pooling).

    Parity: reference ``AttnWeights`` (model/norm/attentive_norm.py:24-112):
    y = mean(x) * rsqrt(var(x) + eps) over spatial dims, then
    1x1 conv (no bias) -> BN -> hard-sigmoid. Returns (B, K).
    """

    num_affine: int
    eps_var: float = 1e-3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # RSD pooling over H, W. torch.var_mean uses the unbiased estimator.
        # One-pass moments: jnp.var's two-pass form materializes the centered
        # tensor in f32 (measured 1.7 ms per head at (16,96,320,64) on a v5e
        # — 40% of the whole forward across the 10 heads); sum and
        # sum-of-squares fuse into a single read of the feature map (and into
        # the producing conv's epilogue). f32 accumulation over the 30k-pixel
        # reduction keeps the cancellation error ~1e-5 relative, inside the
        # model parity tolerance; the result only modulates a hard sigmoid.
        n = x.shape[1] * x.shape[2]
        # promote, don't hardcode f32: bf16/f32 -> f32 (the TPU path),
        # f64 stays f64 (the x64 gradient-golden test path).
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        s1 = jnp.mean(xf, axis=(1, 2), keepdims=True)         # (B, 1, 1, C)
        s2 = jnp.mean(xf * xf, axis=(1, 2), keepdims=True)
        mean = s1
        var = (s2 - s1 * s1) * (n / max(n - 1, 1))
        var = jnp.maximum(var, 0.0)
        y = mean * jax.lax.rsqrt(var + self.eps_var)          # (B, 1, 1, C)
        y = y.astype(x.dtype)

        y = nn.Conv(
            self.num_affine,
            (1, 1),
            use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(),
            dtype=self.dtype,
            name="conv",
        )(y)
        y = TorchBatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(y, mask=bn_mask(valid, y.ndim))
        y = hsigmoid_v2(y)
        return y.reshape(y.shape[0], self.num_affine)


class AttnBatchNorm(nn.Module):
    """Attentive normalization: affine-free BN modulated by attention-mixed
    per-sample affine pairs.

    Parity: reference ``AttnBatchNorm2d`` (attentive_norm.py:118-164):
    out = (y @ weight_) * BN(x) + (y @ bias_) with weight_ ~ N(1, 0.1),
    bias_ ~ N(0, 0.1), K=10 affines, BN momentum 0.03 / eps 1e-3.
    """

    features: int
    num_affine: int = 10
    momentum: float = 0.03  # torch momentum; flax uses 1 - this
    eps: float = 1e-3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        normed = TorchBatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            use_scale=False,
            use_bias=False,
            dtype=self.dtype,
            name="bn",
        )(x, mask=bn_mask(valid, x.ndim))

        y = AttnWeights(self.num_affine, dtype=self.dtype, name="attn")(
            x, train=train, valid=valid
        )                                                       # (B, K)

        weight_ = self.param(
            "weight_",
            lambda key, shape: 1.0 + 0.1 * jax.random.normal(key, shape),
            (self.num_affine, self.features),
        )
        bias_ = self.param(
            "bias_",
            lambda key, shape: 0.1 * jax.random.normal(key, shape),
            (self.num_affine, self.features),
        )
        scale = (y @ weight_.astype(y.dtype))[:, None, None, :]  # (B,1,1,C)
        shift = (y @ bias_.astype(y.dtype))[:, None, None, :]
        return scale * normed + shift
