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


# ---------------------------------------------------------------------------
# Reverse direction: Flax variables -> reference-loadable torch state dict.
# ---------------------------------------------------------------------------

def _inv_conv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))  # HWIO -> OIHW


def _inv_upconv(k: np.ndarray) -> np.ndarray:
    # inverse of _upconv: (kh,kw,1,C) -> (C,1,kh,kw), then un-flip.
    w = np.transpose(k, (3, 2, 0, 1))
    return np.ascontiguousarray(w[:, :, ::-1, ::-1])


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _export_bn(out, tkey, params, stats) -> None:
    if params is not None and "scale" in params:
        out[f"{tkey}.weight"] = _np(params["scale"])
        out[f"{tkey}.bias"] = _np(params["bias"])
    out[f"{tkey}.running_mean"] = _np(stats["mean"])
    out[f"{tkey}.running_var"] = _np(stats["var"])
    out[f"{tkey}.num_batches_tracked"] = np.zeros((), np.int64)


def _export_conv(out, tkey, params) -> None:
    out[f"{tkey}.weight"] = _inv_conv(_np(params["kernel"]))
    if "bias" in params:
        out[f"{tkey}.bias"] = _np(params["bias"])


def _export_attnbn(out, tkey, params, stats) -> None:
    """AttnBatchNorm2d: affine-free BN stats at the module root, weight_/
    bias_ affines, attn_weights.attention = [1x1 conv, BN]."""
    out[f"{tkey}.weight_"] = _np(params["weight_"])
    out[f"{tkey}.bias_"] = _np(params["bias_"])
    out[f"{tkey}.running_mean"] = _np(stats["bn"]["mean"])
    out[f"{tkey}.running_var"] = _np(stats["bn"]["var"])
    out[f"{tkey}.num_batches_tracked"] = np.zeros((), np.int64)
    _export_conv(out, f"{tkey}.attn_weights.attention.0",
                 params["attn"]["conv"])
    _export_bn(out, f"{tkey}.attn_weights.attention.1",
               params["attn"]["bn"], stats["attn"]["bn"])


def _export_tree(out, tkey, params, stats) -> None:
    """A DLA Tree level (tree1/tree2 recursion, root, project, blocks)."""
    for name, sub in params.items():
        st = (stats or {}).get(name, {})
        if name in ("tree1", "tree2"):
            # either a nested Tree or a bare block — same child grammar
            _export_tree(out, f"{tkey}.{name}", sub, st)
        elif name == "root":
            _export_conv(out, f"{tkey}.root.conv", sub["conv"])
            _export_bn(out, f"{tkey}.root.bn", sub["bn"],
                       stats["root"]["bn"])
        elif name == "project_conv":
            _export_conv(out, f"{tkey}.project.0", sub)
        elif name == "project_bn":
            _export_bn(out, f"{tkey}.project.1", sub, stats["project_bn"])
        elif name.startswith("conv"):
            _export_conv(out, f"{tkey}.{name}", sub)
        elif name.startswith("bn"):
            _export_bn(out, f"{tkey}.{name}", sub, stats[name])
        else:
            raise KeyError(f"unmapped tree child {name} under {tkey}")


_HEAD_NAMES_INV = {v: k for k, v in _HEAD_NAMES.items()}


def export_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """monocon_tpu Flax variables -> the reference's torch state dict.

    Exact inverse of :func:`convert_state_dict` (layout transforms
    reversed; ``num_batches_tracked`` buffers emitted as 0 — the
    reference uses fixed BN momentum, so torch never reads them). The
    result loads into ``model.detector.MonoConDetector`` with
    ``load_state_dict(strict=True)`` after ``torch.from_numpy`` (see
    :func:`save_torch_checkpoint`), letting TPU-trained weights flow
    back to the reference ecosystem.
    """
    params, stats = variables["params"], variables["batch_stats"]
    params = _to_host_tree(params)
    stats = _to_host_tree(stats)
    out: Dict[str, np.ndarray] = {}

    # Backbone.
    bb_p, bb_s = params["backbone"], stats["backbone"]
    _export_conv(out, "backbone.base_layer.0", bb_p["base_conv"])
    _export_bn(out, "backbone.base_layer.1", bb_p["base_bn"],
               bb_s["base_bn"])
    for lvl in ("level0", "level1"):
        for bname, block in bb_p[lvl].items():
            i = int(bname[len("block"):])
            _export_conv(out, f"backbone.{lvl}.{3 * i}", block["conv"])
            _export_bn(out, f"backbone.{lvl}.{3 * i + 1}", block["bn"],
                       bb_s[lvl][bname]["bn"])
    for lvl, sub in bb_p.items():
        if lvl.startswith("level") and lvl not in ("level0", "level1"):
            _export_tree(out, f"backbone.{lvl}", sub, bb_s[lvl])

    # Neck: ida_N { up_M (depthwise transposed conv), proj_M/node_M }.
    for ida, mods in params["neck"].items():
        for mod, sub in mods.items():
            tkey = f"neck.{ida}.{mod}"
            if mod.startswith("up_"):
                out[f"{tkey}.weight"] = _inv_upconv(_np(sub["kernel"]))
            else:
                _export_conv(out, f"{tkey}.conv", sub["conv"])
                _export_bn(out, f"{tkey}.bn1", sub["bn"],
                           stats["neck"][ida][mod]["bn"])

    # Heads.
    for branch, sub in params["heads"].items():
        st = stats["heads"][branch]
        if branch == "dir":
            _export_conv(out, "head.dir_feat.0", sub["feat_conv"])
            _export_attnbn(out, "head.dir_feat.1", sub["feat_norm"],
                           st["feat_norm"])
            _export_conv(out, "head.dir_cls.0", sub["cls_conv"])
            _export_conv(out, "head.dir_reg.0", sub["reg_conv"])
            continue
        tname = _HEAD_NAMES_INV[branch]
        _export_conv(out, f"head.{tname}.0", sub["conv1"])
        _export_attnbn(out, f"head.{tname}.1", sub["norm"], st["norm"])
        _export_conv(out, f"head.{tname}.3", sub["conv2"])

    return out


def _to_host_tree(tree):
    """Recursively materialize a (possibly frozen/flax) mapping of arrays
    as plain dicts of numpy arrays."""
    if hasattr(tree, "items"):
        return {k: _to_host_tree(v) for k, v in tree.items()}
    return np.asarray(tree)


def save_torch_checkpoint(
    variables: Dict[str, Any],
    path: str,
    epoch: int = 0,
    iters: int = 0,
) -> None:
    """Write a reference-format ``.pth`` engine checkpoint
    (engine/base_engine.py:176-187: {'engine_attrs': ...,
    'state_dict': {'model': ..., 'optimizer': None, 'scheduler': None}})
    from Flax variables, loadable by the reference's
    ``load_checkpoint`` / ``test.py --checkpoint_file``."""
    import torch

    model_sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in export_state_dict(variables).items()}
    engine_dict = {
        "engine_attrs": {"epochs": epoch, "global_iters": iters},
        "state_dict": {"model": model_sd, "optimizer": None,
                       "scheduler": None},
    }
    torch.save(engine_dict, path)
