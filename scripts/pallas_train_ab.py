"""Settle the Pallas-splat TRAIN default with one table (VERDICT round-4 #3).

One on-chip A/B of the FULL train step — {jnp, pallas} targets x
{bf16, f32} x {B=16, 32} — with BOTH the device-trace ms/step (the honest
number on the tunneled platform) and wall ms/step, plus the targets-only
kernel A/B at B=16 to reconcile:

  * round-2 STATUS: "pallas LOSES wall standalone (24.15 vs 20.89 ms) and
    in-context (-4%)" — measured through the axon tunnel, where per-
    pallas_call host dispatch overhead dominates;
  * the round-4 ops/targets.py comment: "~8x faster on-device (3.8 ms vs
    ~30 ms at B=16)" — a device-trace claim with no recorded table.

The resolve_pallas_targets 'auto' default for real (non-axon) TPU hosts
must match whatever the bf16-in-context rows of this table say.

Run alone on the TPU (each full-train-step compile ~10 min through the
tunnel; 6 step configs + 2 kernel configs):
  python scripts/pallas_train_ab.py [--json artifacts/r5/pallas_ab.json]
  python scripts/pallas_train_ab.py --quick   # bf16 B=16 rows only
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

PAD_HW = (384, 1280)
O = 30


def make_label(b: int) -> dict:
    rng = np.random.default_rng(0)
    label = {
        "gt_bboxes": np.zeros((b, O, 4), np.float32),
        "gt_labels": np.zeros((b, O), np.float32),
        "gt_bboxes_3d": np.zeros((b, O, 7), np.float32),
        "depths": np.zeros((b, O), np.float32),
        "gt_kpts_2d": np.zeros((b, O, 18), np.float32),
        "gt_kpts_valid_mask": np.zeros((b, O, 9), np.float32),
        "mask": np.zeros((b, O), np.float32),
    }
    for i in range(b):
        n = int(rng.integers(3, 12))
        for j in range(n):
            x1, y1 = rng.uniform(0, 1000), rng.uniform(0, 250)
            w, h = rng.uniform(40, 200), rng.uniform(30, 110)
            label["gt_bboxes"][i, j] = [x1, y1, x1 + w, y1 + h]
            label["gt_labels"][i, j] = rng.integers(0, 3)
            label["gt_bboxes_3d"][i, j] = [0, 1.5, 20, 1.6, 1.5, 3.9, 0.3]
            label["depths"][i, j] = rng.uniform(5, 60)
            label["gt_kpts_2d"][i, j] = rng.uniform(0, 1200, 18)
            label["gt_kpts_valid_mask"][i, j] = 2
            label["mask"][i, j] = 1
    return label


def measure(step_fn, state, batch, iters, trace_dir):
    """(wall_ms, device_ms) per call, steady-state."""
    import jax

    from monocon_tpu.utils.profiling import (
        device_op_seconds,
        device_trace,
        sync_timer,
    )

    wall = min(sync_timer(step_fn, state, batch, iters=iters, warmup=2)
               for _ in range(3)) * 1e3
    if os.path.isdir(trace_dir):
        shutil.rmtree(trace_dir)
    with device_trace(trace_dir):
        out = None
        for _ in range(iters):
            out = step_fn(state, batch)
        from monocon_tpu.utils.profiling import block_on

        block_on(out)
    device = device_op_seconds(trace_dir) / iters * 1e3
    return wall, device


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="only the decision-relevant bf16 B=16 rows")
    ap.add_argument("--grid", default="",
                    help="comma list of dtype:batch configs to run (e.g. "
                         "'bfloat16:32,float32:16'), for resuming after a "
                         "transient tunnel failure; also skips the "
                         "targets-only rows")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.targets import generate_targets
    from monocon_tpu.solver import build_optimizer
    from monocon_tpu.utils.profiling import (
        device_op_seconds,
        device_trace,
        sync_timer,
    )

    platform = jax.devices()[0].platform
    print(f"platform: {platform} ({jax.devices()[0].device_kind})")
    rows = []

    # -- targets-only kernel A/B (B=16): the '3.8 vs ~30 ms' claim -------
    feat_hw = (PAD_HW[0] // 4, PAD_HW[1] // 4)
    label16 = {k: jnp.asarray(v) for k, v in make_label(16).items()}
    for name, flag in () if args.grid else (("jnp", False), ("pallas", True)):
        fn = jax.jit(lambda lab, f=flag: jax.tree.map(
            lambda x: x.sum(),
            generate_targets(lab, feat_hw, PAD_HW, use_pallas=f)))
        wall = min(sync_timer(fn, label16, iters=20, warmup=3)
                   for _ in range(3)) * 1e3
        tdir = f"/tmp/pallas_ab_targets_{name}"
        if os.path.isdir(tdir):
            shutil.rmtree(tdir)
        with device_trace(tdir):
            acc = None
            for _ in range(20):
                acc = fn(label16)
            from monocon_tpu.utils.profiling import block_on

            block_on(acc)
        dev = device_op_seconds(tdir) / 20 * 1e3
        rows.append({"what": f"targets only B=16 ({name})",
                     "wall_ms": round(wall, 2), "device_ms": round(dev, 2)})
        print(rows[-1])

    # -- full train step grid --------------------------------------------
    grid = [("bfloat16", 16), ("bfloat16", 32), ("float32", 16)]
    if args.quick:
        grid = [("bfloat16", 16)]
    if args.grid:
        grid = [(d, int(b)) for d, b in
                (c.split(":") for c in args.grid.split(","))]
    rng = np.random.default_rng(1)
    for dtype, b in grid:
        model, variables = create_detector_state(
            jax.random.PRNGKey(0), image_hw=PAD_HW,
            dtype=jnp.bfloat16 if dtype == "bfloat16" else None,
        )
        optimizer = build_optimizer(total_steps=100)
        batch = {
            "img": jnp.asarray(
                rng.normal(size=(b, *PAD_HW, 3)).astype(np.float32)),
            "label": {k: jnp.asarray(v) for k, v in make_label(b).items()},
        }
        for name, flag in (("jnp", False), ("pallas", True)):
            state = create_train_state(variables, optimizer)
            step = jax.jit(
                make_train_step(model, optimizer, use_pallas=flag))
            t0 = time.time()
            wall, dev = measure(
                step, state, batch, args.iters,
                f"/tmp/pallas_ab_{dtype}_{b}_{name}")
            rows.append({
                "what": f"train step {dtype} B={b} ({name} targets)",
                "wall_ms": round(wall, 2), "device_ms": round(dev, 2),
                "img_s_device": round(b / (dev / 1e3), 1),
            })
            print(f"{rows[-1]}  [{time.time() - t0:.0f}s incl. compile]")

    print(f"\nplatform: {platform}, canvas {PAD_HW}, iters {args.iters}")
    print("| measurement | wall ms | device ms |")
    print("|---|---|---|")
    for r in rows:
        print(f"| {r['what']} | {r['wall_ms']} | {r['device_ms']} |")

    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump({"platform": platform,
                       "device_kind": jax.devices()[0].device_kind,
                       "pad_hw": PAD_HW, "iters": args.iters,
                       "rows": rows}, f, indent=1)
        print(f"-> {args.json}")


if __name__ == "__main__":
    main()
