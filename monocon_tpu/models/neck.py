"""DLA-Up neck (iterative deep aggregation) in Flax linen, NHWC.

Parity: reference ``model/backbone/dla_neck.py``. Upsampling uses a
depthwise fractionally-strided convolution (the transposed-conv equivalent)
initialized to bilinear interpolation weights — expressed directly with
``lax.conv_general_dilated`` (lhs_dilation = stride, feature_group_count =
channels), which XLA maps onto the TPU conv emitters without materializing
the zero-stuffed input.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu

Dtype = Any


def bilinear_upsample_kernel(factor: int) -> jnp.ndarray:
    """(2f, 2f) bilinear interpolation kernel (reference
    ``fill_upconv_weights``, dla_neck.py:83-92)."""
    size = 2 * factor
    f = math.ceil(size / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    rng = jnp.arange(size, dtype=jnp.float32)
    w1d = 1.0 - jnp.abs(rng / f - c)
    return w1d[:, None] * w1d[None, :]


class DepthwiseUpsample(nn.Module):
    """Per-channel learnable 2x/4x/8x upsampling, bilinear-initialized.

    Equivalent to torch ``ConvTranspose2d(C, C, k=2f, stride=f, padding=f/2,
    groups=C, bias=False)`` (dla_neck.py:56-64).
    """

    features: int
    factor: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.factor
        size = 2 * f

        def init(key, shape, dtype=jnp.float32):
            k = bilinear_upsample_kernel(f)
            return jnp.broadcast_to(k[:, :, None, None], shape).astype(dtype)

        kernel = self.param("kernel", init, (size, size, 1, self.features))
        pad = size - 1 - f // 2
        dtype = x.dtype
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(f, f),
            feature_group_count=self.features,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class IDAUp(nn.Module):
    """Iterative deep aggregation over one scale pyramid
    (reference ``IDAUp``, dla_neck.py:41-106)."""

    in_features_list: Sequence[int]
    up_factors_list: Sequence[int]
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False,
                 valid=None) -> List[jnp.ndarray]:
        assert len(layers) == len(self.in_features_list)
        outs = list(layers)
        for i in range(1, len(outs)):
            proj = ConvBnRelu(self.features, kernel_size=3, dtype=self.dtype,
                              name=f"proj_{i}")(outs[i], train=train,
                                                valid=valid)
            up = DepthwiseUpsample(self.features, int(self.up_factors_list[i]),
                                   dtype=self.dtype, name=f"up_{i}")(proj)
            outs[i] = ConvBnRelu(
                self.features, kernel_size=3, dtype=self.dtype,
                name=f"node_{i}",
            )(jnp.concatenate([outs[i - 1], up], axis=-1), train=train,
              valid=valid)
        return outs


class DLAUp(nn.Module):
    """Full DLA-Up: iteratively aggregates levels[start:] down to one
    stride-4 map (reference ``DLAUp``, dla_neck.py:109-143; the detector
    consumes result[0])."""

    in_features_list: Sequence[int] = (64, 128, 256, 512)
    scales_list: Sequence[int] = (1, 2, 4, 8)
    start_level: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False,
                 valid=None) -> jnp.ndarray:
        layers = list(layers[self.start_level:])
        channels = list(self.in_features_list)
        scales = list(self.scales_list)
        n = len(channels)
        for i in range(n - 1):
            j = -i - 2
            ida = IDAUp(
                in_features_list=tuple(channels[j:]),
                up_factors_list=tuple(s // scales[j] for s in scales[j:]),
                features=channels[j],
                dtype=self.dtype,
                name=f"ida_{i}",
            )
            layers[j:] = ida(layers[j:], train=train, valid=valid)
            scales[j + 1:] = [scales[j]] * len(scales[j + 1:])
            channels[j + 1:] = [channels[j]] * len(channels[j + 1:])
        return layers[-1]
