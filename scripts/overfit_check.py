"""Convergence smoke check: overfit 4 synthetic images and confirm the full
pipeline (targets -> gradients -> optimizer -> decode -> KITTI AP) coheres.

Run on an accelerator (takes ~10 min): ``python scripts/overfit_check.py``.
Expected: all losses -> ~0 and nonzero AP40 entries (2.5 per class is the
maximum AP40 with 1-2 valid GTs — the 41-point protocol undersamples tiny
sets; see tests/test_kitti_eval.py).

Verified on TPU v5e (round 1): 4000 steps -> total loss -2.4 (aleatoric
depth goes negative), 52 nonzero AP entries incl. 3D strict-0.7.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from monocon_tpu.data import DataLoader, MonoConDataset
from monocon_tpu.data.synthetic import generate_kitti_dataset
from monocon_tpu.data.transforms import Normalize, Pad
from monocon_tpu.engine import create_train_state, make_train_step
from monocon_tpu.models import create_detector_state
from monocon_tpu.ops.decode import decode_predictions
from monocon_tpu.solver import build_optimizer
from monocon_tpu.utils.convert import (
    convert_to_kitti_2d,
    convert_to_kitti_3d,
    split_batch_detections,
)


def main(steps: int = 4000, lr: float = 5e-4, dtype: str = "float32") -> int:
    root = tempfile.mkdtemp()
    generate_kitti_dataset(root, num_train=4, num_val=4,
                           image_hw=(192, 640), seed=21)
    ds = MonoConDataset(root, "train", transforms=[Normalize(), Pad(32)])
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2,
                        pad_hw=(192, 640), seed=0)
    batch = next(iter(loader))
    dev = {
        "img": jnp.asarray(batch["img"]),
        "label": {k: jnp.asarray(v) for k, v in batch["label"].items()},
    }

    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=(192, 640),
        dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
    )
    opt = build_optimizer(lr=lr, total_steps=steps, use_scheduler=True)
    state = create_train_state(variables, opt)
    step = jax.jit(make_train_step(model, opt), donate_argnums=0)
    for i in range(steps):
        state, losses = step(state, dev)
        if i % 1000 == 0:
            print(f"step {i}: total={float(losses['total_loss']):.3f}",
                  flush=True)
    print("final:", {k: round(float(v), 3) for k, v in losses.items()})

    @jax.jit
    def fwd(v, im, p2):
        return decode_predictions(
            model.apply(v, im, train=False), p2, (192, 640)
        )

    decoded = fwd(
        {"params": state.params, "batch_stats": state.batch_stats},
        dev["img"], jnp.asarray(batch["p2"]),
    )
    per = split_batch_detections(
        {k: np.asarray(v) for k, v in decoded.items()}, 0.05
    )
    print("detections per image:", [len(p["scores"]) for p in per])
    res = ds.evaluate(
        {
            "img_bbox": convert_to_kitti_3d(per, batch["img_metas"],
                                            batch["calib"]),
            "img_bbox2d": convert_to_kitti_2d(per, batch["img_metas"]),
        },
        verbose=False,
    )
    nonzero = {k: round(v, 2) for k, v in res.items() if v > 0}
    print(f"nonzero AP entries: {len(nonzero)}")
    ok = len(nonzero) > 0 and float(losses["loss_center_heatmap"]) < 0.1
    print("CONVERGENCE CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--dtype", default="float32",
                    help="'bfloat16' validates the mixed-precision "
                         "training path (TPU.COMPUTE_DTYPE)")
    a = ap.parse_args()
    raise SystemExit(main(a.steps, a.lr, a.dtype))
