"""DLA (Deep Layer Aggregation) backbone in Flax linen, NHWC.

Behavioral parity with the reference ``model/backbone/dla.py``: same
architecture table (DLA-34/46/60/102), recursive trees with root
aggregation, 7x7 stride-1 stem, six output levels at strides
1/1/2/4/8/16/32 relative... (levels 0-5 at strides 1,2,4,8,16,32).
ImageNet weights are imported from a local torch checkpoint via
``monocon_tpu.utils.torch_convert`` (no network download).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BN_EPS, BN_MOMENTUM, ConvBnRelu, he_normal_conv_init

Dtype = Any


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs with residual (reference dla.py:12-50)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        pad = self.dilation
        out = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, kernel_init=he_normal_conv_init,
            dtype=self.dtype, name="conv1",
        )(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, kernel_init=he_normal_conv_init,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _bn(train, self.dtype, "bn2")(out)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 2 (reference dla.py:53-104)."""

    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.features // 2
        pad = self.dilation
        out = nn.Conv(bottle, (1, 1), use_bias=False,
                      kernel_init=he_normal_conv_init,
                      dtype=self.dtype, name="conv1")(x)
        out = _bn(train, self.dtype, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            bottle, (3, 3), strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, kernel_init=he_normal_conv_init,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _bn(train, self.dtype, "bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=he_normal_conv_init,
                      dtype=self.dtype, name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 aggregation node over concatenated children
    (reference dla.py:107-132)."""

    features: int
    residual: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, *children, train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=he_normal_conv_init,
                    dtype=self.dtype, name="conv")(x)
        x = _bn(train, self.dtype, "bn")(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (reference dla.py:135-204)."""

    levels: int
    block: str  # 'basic' | 'bottleneck'
    in_features: int
    features: int
    strides: int = 1
    level_root: bool = False
    root_dim: int = 0
    dilation: int = 1
    root_residual: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.features
        if self.level_root:
            root_dim += self.in_features
        self._root_dim = root_dim

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        if self.levels == 1:
            self.tree1 = block_cls(
                self.features, strides=self.strides,
                dilation=self.dilation, dtype=self.dtype,
            )
            self.tree2 = block_cls(
                self.features, strides=1, dilation=self.dilation,
                dtype=self.dtype,
            )
            self.root = Root(self.features, residual=self.root_residual,
                             dtype=self.dtype)
        else:
            self.tree1 = Tree(
                levels=self.levels - 1, block=self.block,
                in_features=self.in_features, features=self.features,
                strides=self.strides, root_dim=0, dilation=self.dilation,
                root_residual=self.root_residual, dtype=self.dtype,
            )
            self.tree2 = Tree(
                levels=self.levels - 1, block=self.block,
                in_features=self.features, features=self.features,
                root_dim=root_dim + self.features, dilation=self.dilation,
                root_residual=self.root_residual, dtype=self.dtype,
            )

        if self.in_features != self.features:
            self.project_conv = nn.Conv(
                self.features, (1, 1), use_bias=False,
                kernel_init=he_normal_conv_init, dtype=self.dtype,
                name="project_conv",
            )
            self.project_bn_def = True
        else:
            self.project_bn_def = False
        if self.project_bn_def:
            self.project_bn = nn.BatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
                name="project_bn",
            )

    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = [] if children is None else children
        if self.strides > 1:
            bottom = nn.max_pool(
                x, (self.strides, self.strides),
                strides=(self.strides, self.strides),
            )
        else:
            bottom = x
        if self.project_bn_def:
            residual = self.project_bn(
                self.project_conv(bottom), use_running_average=not train
            )
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual=residual, train=train)
        if self.levels == 1:
            x2 = self.tree2(x1, train=train)
            return self.root(x2, x1, *children, train=train)
        children.append(x1)
        return self.tree2(x1, children=children, train=train)


# (block, per-level depths, per-level channels, residual_root) — reference
# dla.py:210-214.
ARCH_SETTINGS = {
    34: ("basic", (1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), False),
    46: ("bottleneck", (1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256), False),
    60: ("bottleneck", (1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), False),
    102: ("bottleneck", (1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), True),
}


class MultiLevelConv(nn.Module):
    """Stacked conv-bn-relu (reference ``_make_multilevel_conv``,
    dla.py:280-298)."""

    features: int
    num_levels: int
    strides: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_levels):
            x = ConvBnRelu(
                self.features, kernel_size=3,
                strides=self.strides if i == 0 else 1,
                dtype=self.dtype, name=f"block{i}",
            )(x, train=train)
        return x


class DLA(nn.Module):
    """Deep Layer Aggregation backbone; returns 6 feature levels."""

    num_layers: int = 34
    dtype: Optional[Dtype] = None

    @property
    def channels(self) -> Sequence[int]:
        return ARCH_SETTINGS[self.num_layers][2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block, levels, channels, residual_root = ARCH_SETTINGS[self.num_layers]

        x = nn.Conv(channels[0], (7, 7), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_normal_conv_init,
                    dtype=self.dtype, name="base_conv")(x)
        x = _bn(train, self.dtype, "base_bn")(x)
        x = nn.relu(x)

        outputs = []
        x = MultiLevelConv(channels[0], levels[0], dtype=self.dtype,
                           name="level0")(x, train=train)
        outputs.append(x)
        x = MultiLevelConv(channels[1], levels[1], strides=2,
                           dtype=self.dtype, name="level1")(x, train=train)
        outputs.append(x)
        for i, (lvl, ch) in enumerate(zip(levels[2:], channels[2:]), start=2):
            x = Tree(
                levels=lvl, block=block, in_features=outputs[-1].shape[-1],
                features=ch, strides=2, level_root=(i != 2),
                root_residual=residual_root, dtype=self.dtype,
                name=f"level{i}",
            )(x, train=train)
            outputs.append(x)
        return tuple(outputs)
