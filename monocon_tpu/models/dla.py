"""DLA (Deep Layer Aggregation) backbone in Flax linen, NHWC.

Behavioral parity with the reference ``model/backbone/dla.py``: same
architecture table (DLA-34/46/60/102), recursive trees with root
aggregation, 7x7 stride-1 stem, six output levels at strides
1/1/2/4/8/16/32 relative... (levels 0-5 at strides 1,2,4,8,16,32).
ImageNet weights are imported from a local torch checkpoint via
``monocon_tpu.utils.torch_convert`` (no network download).

TPU note — width-blocked stem. The reference stem (7x7 s1 3->16 at full
resolution, then 3x3 s1 16->16, then 3x3 s2 16->32) maps terribly onto
the MXU: <=16 of 128 lanes used, and XLA pads/transposes full-resolution
activations between the convs (measured ~56% of the whole forward). We
compute the same three convs (and level2's maxpool + entry conv) in
W-only space-to-depth domain instead: the width axis is blocked by 4 into
channels, which in NHWC is a PURE RESHAPE (W and C are memory-adjacent),
so no layout-transpose copies exist anywhere in the stem. Each kernel is
re-expressed by an exact reindexing (``_wblock_kernel``) — numerically
the same convolution — and W-only blocking also wastes 4x fewer padded
block-kernel FLOPs than the earlier (4,4) blocking (scripts/
stem_experiments.py: direct 21.1 ms, (4,4)-block 7.1 ms, W-block 6.2 ms
for the chain at batch 16 bf16 on a v5e). Parameters stay in the
reference's full-resolution layout, so init, checkpoints, and torch
weight import are unchanged; BatchNorm statistics are reduced per
ORIGINAL channel (across the folded phases), identical to full-res BN.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import (BN_EPS, BN_MOMENTUM, ConvBnRelu, TorchBatchNorm, bn_mask,
                     he_normal_conv_init)

Dtype = Any


def w_space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W/b,b*C), channel layout (pj, c) — a pure
    reshape (W and C are adjacent in NHWC memory order)."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // b, b * C)


def w_depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of :func:`w_space_to_depth` (also a pure reshape)."""
    B, H, Wb, P = x.shape
    return x.reshape(B, H, Wb * b, P // b)


def _wblock_kernel(k: jnp.ndarray, block: int, stride: int, pad: int):
    """Re-express a full-resolution conv kernel (kh,kw,ci,co) as a W-only
    block-domain kernel: H stays plain (apply the original stride/pad on
    H via the conv itself), W is blocked with block-domain stride 1 and
    output block ``block // stride``. Exact reindexing — every original
    tap lands once, the rest of the block kernel is zero. Returns
    (kernel (kh, kbw, block*ci, bo*co), (pad_w_lo, pad_w_hi))."""
    kh, kw, ci, co = k.shape
    bo = block // stride
    lo = (0 - pad) // block
    hi = max((stride * q + kw - 1 - pad) // block for q in range(bo))
    kbw = hi - lo + 1

    # Static index maps for one gather + one scatter over the tap table.
    v_, qj_ = np.meshgrid(np.arange(kw), np.arange(bo), indexing="ij")
    v_, qj_ = v_.ravel(), qj_.ravel()
    bj, pj = np.divmod(stride * qj_ + v_ - pad, block)
    t = len(v_)
    bj_idx = np.broadcast_to((bj - lo)[:, None, None], (t, ci, co))
    ci_idx = np.broadcast_to(
        pj[:, None, None] * ci + np.arange(ci)[None, :, None], (t, ci, co))
    co_idx = np.broadcast_to(
        qj_[:, None, None] * co + np.arange(co)[None, None, :], (t, ci, co))

    kb = jnp.zeros((kh, kbw, block * ci, bo * co), k.dtype)
    kb = kb.at[:, bj_idx, ci_idx, co_idx].set(k[:, v_])
    return kb, (-lo, hi)


class _ConvKernel(nn.Module):
    """A bare conv kernel parameter, param-tree-compatible with
    ``nn.Conv(use_bias=False)`` (child param named ``kernel``)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", he_normal_conv_init, self.shape)


def _wblock_conv(xb, k_full, block, stride, pad, dtype):
    """Convolution in W-block domain: the W stride folds into the block
    kernel; the H stride/padding apply plainly."""
    kb, pad_w = _wblock_kernel(k_full, block, stride, pad)
    if dtype is not None:
        xb, kb = xb.astype(dtype), kb.astype(dtype)
    return lax.conv_general_dilated(
        xb, kb, (stride, 1), [(pad, pad), pad_w],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _block_bn(bn: nn.BatchNorm, xb: jnp.ndarray, channels: int,
              valid=None):
    """Apply BN in block domain with statistics per ORIGINAL channel:
    reshape (B,Hb,Wb,P*C) -> (B,Hb,Wb,P,C) so the feature axis is the
    original channel and the folded phases join the reduction axes."""
    B, Hb, Wb, P = xb.shape
    x5 = xb.reshape(B, Hb, Wb, P // channels, channels)
    return bn(x5, mask=bn_mask(valid, x5.ndim)).reshape(B, Hb, Wb, P)


class _S2DConvBnRelu(nn.Module):
    """ConvBnRelu computed in W-block space-to-depth domain.
    Param-tree-compatible with :class:`ConvBnRelu` (children
    ``conv``/``bn``)."""

    features: int
    in_features: int
    kernel_size: int = 3
    strides: int = 1
    block: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xb: jnp.ndarray, train: bool = False,
                 valid=None) -> jnp.ndarray:
        k = _ConvKernel(
            (self.kernel_size, self.kernel_size, self.in_features,
             self.features),
            name="conv",
        )()
        xb = _wblock_conv(xb, k, self.block, self.strides,
                          self.kernel_size // 2, self.dtype)
        xb = _block_bn(_bn(train, self.dtype, "bn"), xb, self.features,
                       valid=valid)
        return nn.relu(xb)


class _S2DStemLevel(nn.Module):
    """MultiLevelConv(num_levels=1) computed in block domain
    (param-tree-compatible: single child ``block0``)."""

    features: int
    in_features: int
    strides: int = 1
    block: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xb: jnp.ndarray, train: bool = False,
                 valid=None) -> jnp.ndarray:
        return _S2DConvBnRelu(
            self.features, self.in_features, kernel_size=3,
            strides=self.strides, block=self.block, dtype=self.dtype,
            name="block0",
        )(xb, train=train, valid=valid)


def _bn(train: bool, dtype, name: str) -> nn.BatchNorm:
    return TorchBatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        dtype=dtype,
        name=name,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs with residual (reference dla.py:12-50).

    ``s2d_entry``: ``x`` arrives in W-block(2) space-to-depth layout
    (``residual`` stays plain); conv1 is computed as the equivalent
    block-domain conv. Requires strides == 2 and dilation == 1 (the
    level-2 entry)."""

    features: int
    strides: int = 1
    dilation: int = 1
    s2d_entry: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False,
                 valid=None):
        if residual is None:
            residual = x
        pad = self.dilation
        if self.s2d_entry:
            assert self.strides == 2 and self.dilation == 1
            k = _ConvKernel((3, 3, x.shape[-1] // 2, self.features),
                            name="conv1")()
            out = _wblock_conv(x, k, 2, 2, 1, self.dtype)
        else:
            out = nn.Conv(
                self.features, (3, 3), strides=(self.strides, self.strides),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, kernel_init=he_normal_conv_init,
                dtype=self.dtype, name="conv1",
            )(x)
        out = _bn(train, self.dtype, "bn1")(out, mask=bn_mask(valid, out.ndim))
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False, kernel_init=he_normal_conv_init,
            dtype=self.dtype, name="conv2",
        )(out)
        out = _bn(train, self.dtype, "bn2")(out, mask=bn_mask(valid, out.ndim))
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 2 (reference dla.py:53-104).

    ``s2d_entry``: as in :class:`BasicBlock` — conv1 (1x1) runs in block
    domain, conv2 (3x3 s2) folds back to plain layout."""

    features: int
    strides: int = 1
    dilation: int = 1
    s2d_entry: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False,
                 valid=None):
        if residual is None:
            residual = x
        bottle = self.features // 2
        pad = self.dilation
        if self.s2d_entry:
            assert self.strides == 2 and self.dilation == 1
            k1 = _ConvKernel((1, 1, x.shape[-1] // 2, bottle),
                             name="conv1")()
            out = _wblock_conv(x, k1, 2, 1, 0, self.dtype)  # stays W-b2
            out = _block_bn(_bn(train, self.dtype, "bn1"), out, bottle,
                            valid=valid)
            out = nn.relu(out)
            k2 = _ConvKernel((3, 3, bottle, bottle), name="conv2")()
            out = _wblock_conv(out, k2, 2, 2, 1, self.dtype)  # plain
        else:
            out = nn.Conv(bottle, (1, 1), use_bias=False,
                          kernel_init=he_normal_conv_init,
                          dtype=self.dtype, name="conv1")(x)
            out = _bn(train, self.dtype, "bn1")(out, mask=bn_mask(valid, out.ndim))
            out = nn.relu(out)
            out = nn.Conv(
                bottle, (3, 3), strides=(self.strides, self.strides),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, kernel_init=he_normal_conv_init,
                dtype=self.dtype, name="conv2",
            )(out)
        out = _bn(train, self.dtype, "bn2")(out, mask=bn_mask(valid, out.ndim))
        out = nn.relu(out)
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=he_normal_conv_init,
                      dtype=self.dtype, name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out, mask=bn_mask(valid, out.ndim))
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 aggregation node over concatenated children
    (reference dla.py:107-132)."""

    features: int
    residual: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, *children, train: bool = False, valid=None):
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    kernel_init=he_normal_conv_init,
                    dtype=self.dtype, name="conv")(x)
        x = _bn(train, self.dtype, "bn")(x, mask=bn_mask(valid, x.ndim))
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (reference dla.py:135-204).

    ``s2d_entry``: ``x`` arrives in W-block(2) space-to-depth layout (half
    width, 2x channels); the downsample (maxpool 2x2 == H-pair max + W
    phase max), projection and tree1's first conv consume it directly.
    Only supported for the single-level strided entry tree (level 2)."""

    levels: int
    block: str  # 'basic' | 'bottleneck'
    in_features: int
    features: int
    strides: int = 1
    level_root: bool = False
    root_dim: int = 0
    dilation: int = 1
    root_residual: bool = False
    s2d_entry: bool = False
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
                dilation=self.dilation, s2d_entry=self.s2d_entry,
                dtype=self.dtype,
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
            self.project_bn = TorchBatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, dtype=self.dtype,
                name="project_bn",
            )

    def __call__(self, x, residual=None, children=None,
                 train: bool = False, valid=None):
        children = [] if children is None else children
        if self.s2d_entry:
            assert self.strides == 2 and self.levels == 1
            # maxpool 2x2/s2 of the full-res tensor == max over H pairs
            # plus max over the 2 folded W-phases of its W-block(2) layout.
            b, h, wb, p = x.shape
            bottom = nn.max_pool(x, (2, 1), strides=(2, 1))
            bottom = bottom.reshape(b, h // 2, wb, 2, p // 2).max(axis=3)
        elif self.strides > 1:
            bottom = nn.max_pool(
                x, (self.strides, self.strides),
                strides=(self.strides, self.strides),
            )
        else:
            bottom = x
        if self.project_bn_def:
            residual = self.project_bn(
                self.project_conv(bottom), use_running_average=not train,
                mask=bn_mask(valid, bottom.ndim),
            )
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual=residual, train=train, valid=valid)
        if self.levels == 1:
            x2 = self.tree2(x1, train=train, valid=valid)
            return self.root(x2, x1, *children, train=train, valid=valid)
        children.append(x1)
        return self.tree2(x1, children=children, train=train, valid=valid)


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
    def __call__(self, x, train: bool = False, valid=None):
        for i in range(self.num_levels):
            x = ConvBnRelu(
                self.features, kernel_size=3,
                strides=self.strides if i == 0 else 1,
                dtype=self.dtype, name=f"block{i}",
            )(x, train=train, valid=valid)
        return x


class DLA(nn.Module):
    """Deep Layer Aggregation backbone; returns 6 feature levels.

    ``s2d_stem`` computes the three full-resolution stem convs in W-only
    block-4 space-to-depth domain (exact same convolution, MXU-friendly,
    zero layout copies — see module docstring); parameters are identical
    either way.
    """

    num_layers: int = 34
    dtype: Optional[Dtype] = None
    s2d_stem: bool = True

    @property
    def channels(self) -> Sequence[int]:
        return ARCH_SETTINGS[self.num_layers][2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 valid=None) -> Tuple[jnp.ndarray, ...]:
        block, levels, channels, residual_root = ARCH_SETTINGS[self.num_layers]

        outputs = []
        use_s2d = (
            self.s2d_stem and levels[0] == 1 and levels[1] == 1
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0
        )
        if use_s2d:
            k1 = _ConvKernel((7, 7, x.shape[-1], channels[0]),
                             name="base_conv")()
            xb = w_space_to_depth(x, 4)                 # pure reshape
            xb = _wblock_conv(xb, k1, 4, 1, 3, self.dtype)
            xb = _block_bn(_bn(train, self.dtype, "base_bn"), xb,
                           channels[0], valid=valid)
            xb = nn.relu(xb)
            xb = _S2DStemLevel(channels[0], channels[0], dtype=self.dtype,
                               name="level0")(xb, train=train, valid=valid)
            outputs.append(w_depth_to_space(xb, 4))     # level0, stride 1
            xb = _S2DStemLevel(channels[1], channels[0], strides=2,
                               dtype=self.dtype, name="level1")(
                                   xb, train=train, valid=valid)  # W-b2 of s2
            x = w_depth_to_space(xb, 2)                 # level1, stride 2
            outputs.append(x)
        else:
            x = nn.Conv(channels[0], (7, 7), padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=he_normal_conv_init,
                        dtype=self.dtype, name="base_conv")(x)
            x = _bn(train, self.dtype, "base_bn")(x, mask=bn_mask(valid, x.ndim))
            x = nn.relu(x)

            x = MultiLevelConv(channels[0], levels[0], dtype=self.dtype,
                               name="level0")(x, train=train, valid=valid)
            outputs.append(x)
            x = MultiLevelConv(channels[1], levels[1], strides=2,
                               dtype=self.dtype, name="level1")(x, train=train,
                                                                valid=valid)
            outputs.append(x)
        for i, (lvl, ch) in enumerate(zip(levels[2:], channels[2:]), start=2):
            s2d_entry = i == 2 and use_s2d and lvl == 1
            x = Tree(
                levels=lvl, block=block, in_features=outputs[-1].shape[-1],
                features=ch, strides=2, level_root=(i != 2),
                root_residual=residual_root, s2d_entry=s2d_entry,
                dtype=self.dtype, name=f"level{i}",
            )(xb if s2d_entry else x, train=train, valid=valid)
            outputs.append(x)
        return tuple(outputs)
