"""Configuration tree for monocon_tpu.

Key-compatible with the reference yacs tree (reference:
``config/monocon_configs.py:4-64``) so existing YAML override files keep
working, but implemented on a plain attribute-dict core (no yacs dependency).
TPU-specific knobs live under ``TPU.*`` and are additive.
"""

from __future__ import annotations

import copy
from typing import Any, Dict

import yaml


class ConfigNode(dict):
    """A dict with attribute access and recursive merge, yacs-compatible
    enough for this project's config files."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)

    def merge_from_dict(self, other: Dict[str, Any]) -> None:
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), ConfigNode):
                self[k].merge_from_dict(v)
            elif isinstance(v, dict):
                self[k] = _to_node(v)
            else:
                self[k] = v

    def merge_from_file(self, path: str) -> None:
        with open(path) as f:
            data = yaml.safe_load(f)
        if data:
            self.merge_from_dict(data)

    def to_plain_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            out[k] = v.to_plain_dict() if isinstance(v, ConfigNode) else v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_plain_dict(), default_flow_style=False)


def _to_node(d: Dict[str, Any]) -> ConfigNode:
    node = ConfigNode()
    for k, v in d.items():
        node[k] = _to_node(v) if isinstance(v, dict) else v
    return node


_DEFAULTS: Dict[str, Any] = {
    "VERSION": "tpu-v0.1.0",
    "DESCRIPTION": "MonoCon-TPU Default Configuration",
    "OUTPUT_DIR": "",
    "SEED": -1,
    "GPU_ID": 0,  # kept for config-file compatibility; unused on TPU
    "USE_BENCHMARK": True,  # kept for compatibility; XLA autotunes convs itself
    "DATA": {
        "ROOT": "/data/kitti",
        "BATCH_SIZE": 8,
        "NUM_WORKERS": 4,
        "TRAIN_SPLIT": "train",
        "TEST_SPLIT": "val",
        "CROP_HW": [320, 960],  # train-time RandomCrop3D size
        "AUGMENT": True,  # additive: disable train-time augmentation
        # Decoded-uint8 image cache (data/image_cache.py): '' off,
        # 'auto' = {ROOT}/_decoded_cache/{split}, else a directory path.
        # After the first epoch warms it, PNG decode (the host input
        # bottleneck: ~65-80 img/s/core vs ~150 img/s/chip device demand)
        # is replaced by a page-cache read.
        "IMAGE_CACHE": "",
        "FILTER": {
            "MIN_HEIGHT": 25,
            "MIN_DEPTH": 2,
            "MAX_DEPTH": 65,
            "MAX_TRUNCATION": 0.5,
            "MAX_OCCLUSION": 2,
        },
    },
    "MODEL": {
        "BACKBONE": {
            "NUM_LAYERS": 34,
            "IMAGENET_PRETRAINED": True,
            # Local path to a DLA ImageNet .pth (e.g. dla34-ba72cf86.pth
            # from the reference's model zoo); converted at engine build.
            # Empty: He initialization (reference fallback, dla.py:264).
            "PRETRAINED_PATH": "",
        },
        "HEAD": {
            "NUM_CLASSES": 3,
            "MAX_OBJS": 30,
        },
    },
    "SOLVER": {
        "OPTIM": {
            "LR": 2.25e-4,
            "WEIGHT_DECAY": 1e-5,
            "NUM_EPOCHS": 200,
        },
        "SCHEDULER": {
            "ENABLE": True,
        },
        "CLIP_GRAD": {
            "ENABLE": True,
            "NORM_TYPE": 2.0,
            "MAX_NORM": 35,
        },
    },
    "PERIOD": {
        "EVAL_PERIOD": 10,
        "LOG_PERIOD": 50,
        # Preemption-safe mid-epoch checkpointing, in steps (0 = off).
        # Additive over the reference (which only checkpoints at eval
        # epochs); useful on preemptible TPU pools.
        "CKPT_PERIOD_STEPS": 0,
    },
    # TPU-native knobs (additive over the reference key tree). Every key
    # here must be consumed somewhere (tests/test_config_audit.py); note
    # BatchNorm statistics are cross-replica by construction — the SPMD
    # train step computes batch moments over the global batch and XLA
    # inserts the collectives — so there is no sync-BN switch.
    "TPU": {
        "COMPUTE_DTYPE": "float32",  # 'bfloat16' for max MXU throughput
        "NUM_DEVICES": -1,            # -1: all (global) devices
        # >1: accumulate gradients over this many loader batches per
        # optimizer step (optax.MultiSteps): the effective batch is
        # BATCH_SIZE x GRAD_ACCUM_STEPS without the activation memory of
        # the large batch. Clipping/schedules/AdamW see the mean gradient;
        # BN batch stats update per microbatch.
        "GRAD_ACCUM_STEPS": 1,
        # >1: also split the image HEIGHT over a second mesh axis of this
        # size (devices = data_shards x SPATIAL_SHARDS). XLA inserts the
        # conv halo exchanges; activation memory per device drops by the
        # spatial factor. The batch axis then only needs to divide
        # devices/SPATIAL_SHARDS — e.g. batch 8 on 16 chips as 8x2.
        "SPATIAL_SHARDS": 1,
        # Join a jax.distributed cluster at engine start (multi-host DCN
        # scaling; see parallel/distributed.py for the env contract).
        "MULTIHOST": False,
        "PREFETCH_BATCHES": 2,        # host->device prefetch depth
        # Gaussian-splat target generation via the Pallas TPU kernel.
        # 'auto': OFF everywhere — the dense jnp path wins on-chip both
        # standalone (0.37 vs 3.57 ms device at B=16) and in-context
        # (bf16 train step 108.2 vs 111.3 ms/step), round-5 A/B
        # (artifacts/r5/pallas_ab.json). true/false force a path; the env
        # var MONOCON_PALLAS_TARGETS=0/1 overrides everything (see
        # ops/targets.py resolve_pallas_targets).
        "PALLAS_TARGETS": "auto",
        "PAD_HW": [384, 1248],        # static batch canvas (null: per-batch)
        # 'uint8': ship raw pixels, normalize on device (4x fewer H2D
        # bytes; exact for eval incl. the padded border). For augmented
        # train pixels it CLIPS photometric out-of-range values to
        # [0, 255] before rounding — a distribution change on saturated
        # pixels vs the reference, which normalizes the unclipped float
        # (see data/transforms.py QuantizeU8). 'float32':
        # host-normalized, the reference's exact input numerics.
        "IMAGE_TRANSPORT": "uint8",
    },
}


def get_default_cfg() -> ConfigNode:
    """Reference parity: ``utils/engine_utils.py:38-40``."""
    return _to_node(_DEFAULTS)


def load_cfg(cfg_file: str) -> ConfigNode:
    """Reference parity: ``utils/engine_utils.py:42-46`` (merge YAML over
    defaults, new keys allowed)."""
    cfg = get_default_cfg()
    cfg.merge_from_file(cfg_file)
    return cfg


def export_cfg(cfg: ConfigNode, save_path: str) -> None:
    """Reference parity: ``utils/engine_utils.py:49-52``."""
    with open(save_path, "w") as f:
        f.write(cfg.dump())
