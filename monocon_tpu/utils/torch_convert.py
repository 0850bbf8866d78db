"""Convert reference PyTorch checkpoints to monocon_tpu Flax variables.

Handles both full detector checkpoints (``ckpt['state_dict']['model']``,
reference monocon_detector.py:80-82) and bare backbone/ImageNet state dicts.
Layout transforms:
  * Conv2d        OIHW -> HWIO
  * ConvTranspose2d (depthwise) (C,1,kh,kw) -> flip(kh,kw) -> (kh,kw,1,C)
    (transposed convolution convolves; our dilated conv correlates)
  * BatchNorm     weight/bias -> scale/bias; running_mean/var -> batch_stats
  * AttnBN        weight_/bias_ kept (K, C)

This module is host-side tooling; torch (CPU) is only imported on demand.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _upconv(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d depthwise weight (C, 1, kh, kw):
    # equivalent correlation kernel = spatially flipped, laid out HWIO
    # with I=1 (feature_group_count=C).
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 1, 0))


# Head name mapping: torch sequential-head names -> our branch names.
_HEAD_NAMES = {
    "heatmap_head": "heatmap",
    "kpt_heatmap_head": "kpt_heatmap",
    "wh_head": "wh",
    "offset_head": "offset",
    "kpt_heatmap_offset_head": "kpt_heatmap_offset",
    "center2kpt_offset_head": "center2kpt_offset",
    "dim_head": "dim",
    "depth_head": "depth",
}


def _map_backbone(rest: str) -> Tuple[Tuple[str, ...], str]:
    """Map a torch backbone-relative key to (our path prefix, kind).

    kind: 'conv' | 'bn' — decides the tensor transform and leaf naming.
    """
    parts = rest.split(".")
    if parts[0] == "base_layer":
        return (("backbone", "base_conv") if parts[1] == "0"
                else ("backbone", "base_bn")), ("conv" if parts[1] == "0" else "bn")
    if parts[0] in ("level0", "level1"):
        idx = int(parts[1])
        block, sub = divmod(idx, 3)  # [conv, bn, relu] triples
        name = "conv" if sub == 0 else "bn"
        return ("backbone", parts[0], f"block{block}", name), name
    # Tree levels: level2..5 with nested tree1/tree2/root/project.
    path = ["backbone", parts[0]]
    i = 1
    while i < len(parts) - 1:
        p = parts[i]
        if p in ("tree1", "tree2"):
            path.append(p)
            i += 1
        elif p == "root":
            path.append("root")
            nxt = parts[i + 1]
            path.append("conv" if nxt == "conv" else "bn")
            return tuple(path), ("conv" if nxt == "conv" else "bn")
        elif p == "project":
            sub = parts[i + 1]
            path.append("project_conv" if sub == "0" else "project_bn")
            return tuple(path), ("conv" if sub == "0" else "bn")
        elif p in ("conv1", "conv2", "conv3"):
            path.append(p)
            return tuple(path), "conv"
        elif p in ("bn1", "bn2", "bn3"):
            path.append(p)
            return tuple(path), "bn"
        else:
            raise KeyError(f"unmapped backbone key part: {p} in {rest}")
    raise KeyError(f"unmapped backbone key: {rest}")


def _map_neck(rest: str) -> Tuple[Tuple[str, ...], str]:
    parts = rest.split(".")
    ida, mod = parts[0], parts[1]
    if mod.startswith("up_"):
        return ("neck", ida, mod), "upconv"
    sub = parts[2]  # 'conv' or 'bn1'
    name = "conv" if sub == "conv" else "bn"
    return ("neck", ida, mod, name), name


def _map_head(rest: str) -> Tuple[Tuple[str, ...], str]:
    parts = rest.split(".")
    mod = parts[0]
    if mod in ("dir_feat", "dir_cls", "dir_reg"):
        if mod == "dir_feat":
            idx = parts[1]
            if idx == "0":
                return ("heads", "dir", "feat_conv"), "conv"
            # AttnBatchNorm2d internals
            return _map_attnbn(("heads", "dir", "feat_norm"), parts[2:], parts[1:])
        name = "cls_conv" if mod == "dir_cls" else "reg_conv"
        return ("heads", "dir", name), "conv"
    branch = _HEAD_NAMES[mod]
    idx = parts[1]
    if idx == "0":
        return ("heads", branch, "conv1"), "conv"
    if idx == "3":
        return ("heads", branch, "conv2"), "conv"
    # idx == '1': AttnBatchNorm2d
    return _map_attnbn(("heads", branch, "norm"), parts[2:], parts[1:])


def _map_attnbn(base: Tuple[str, ...], sub_parts, _full) -> Tuple[Tuple[str, ...], str]:
    """Map AttnBatchNorm2d-relative keys.

    torch layout: {running_mean,running_var} (affine-free BN), weight_,
    bias_, attn_weights.attention.{0:conv,1:bn}.
    """
    if not sub_parts:  # direct leaf like weight_ handled by caller via kind
        raise KeyError("attnbn leaf missing")
    p = sub_parts[0]
    if p in ("running_mean", "running_var"):
        return base + ("bn",), "bn"
    if p in ("weight_", "bias_"):
        return base, "attn_affine"
    if p == "attn_weights":
        idx = sub_parts[2]
        if idx == "0":
            return base + ("attn", "conv"), "conv"
        return base + ("attn", "bn"), "bn"
    raise KeyError(f"unmapped attnbn key: {sub_parts}")


def convert_state_dict(
    state: Dict[str, np.ndarray],
) -> Dict[str, Dict[str, Any]]:
    """torch detector state dict -> {'params': ..., 'batch_stats': ...}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for key, val in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = val.detach().cpu().numpy() if hasattr(val, "detach") else np.asarray(val)
        top, rest = key.split(".", 1)
        leaf = rest.rsplit(".", 1)[-1]

        if top == "backbone":
            path, kind = _map_backbone(rest)
        elif top == "neck":
            path, kind = _map_neck(rest)
        elif top == "head":
            path, kind = _map_head(rest)
        else:
            raise KeyError(f"unknown top-level module: {top}")

        if kind == "conv":
            if leaf == "weight":
                _set(params, path + ("kernel",), _conv(arr))
            else:
                _set(params, path + ("bias",), arr)
        elif kind == "upconv":
            _set(params, path + ("kernel",), _upconv(arr))
        elif kind == "bn":
            if leaf == "weight":
                _set(params, path + ("scale",), arr)
            elif leaf == "bias":
                _set(params, path + ("bias",), arr)
            elif leaf == "running_mean":
                _set(stats, path + ("mean",), arr)
            elif leaf == "running_var":
                _set(stats, path + ("var",), arr)
        elif kind == "attn_affine":
            _set(params, path + (leaf,), arr)
        else:
            raise KeyError(f"unknown kind {kind} for {key}")

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, Dict[str, Any]]:
    """Load a reference ``.pth`` detector checkpoint and convert it.

    Accepts the engine checkpoint format ({'state_dict': {'model': ...}}),
    a bare state dict, or {'model': ...}.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        state = ckpt["state_dict"]
        if isinstance(state, dict) and "model" in state:
            state = state["model"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        state = ckpt["model"]
    else:
        state = ckpt
    return convert_state_dict(state)


def load_imagenet_backbone(path: str) -> Dict[str, Dict[str, Any]]:
    """Convert a DLA ImageNet classification checkpoint (keys without the
    'backbone.' prefix and with an fc head we drop) into variables for the
    backbone subtree only."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    filtered = {
        f"backbone.{k}": v
        for k, v in state.items()
        if not k.startswith("fc") and "num_batches_tracked" not in k
    }
    return convert_state_dict(filtered)
