"""Train-step performance experiment matrix (VERDICT r2 #3).

Measures device-side ms/step (profiler trace, not wall clock) and XLA
cost-analysis MFU for a grid of train-step variants:

  * batch size (16 / 32 / 64)
  * compute dtype (bf16 / f32)
  * BN valid-mask on a full batch (None vs all-ones) — the masked-moments
    path must not tax the common no-padding case

Usage: python scripts/train_perf_experiments.py [--batches 16,32] \
           [--dtypes bfloat16] [--iters 6] [--mask-check]
Each variant costs one XLA compile (~10 min through the tunnel on first
run), so select deliberately.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import json

import numpy as np

V5E_PEAK = {"bfloat16": 197e12, "float32": 98.5e12}


def make_label(b, o, rng):
    label = {
        "gt_bboxes": np.zeros((b, o, 4), np.float32),
        "gt_labels": np.zeros((b, o), np.float32),
        "gt_bboxes_3d": np.zeros((b, o, 7), np.float32),
        "depths": np.zeros((b, o), np.float32),
        "gt_kpts_2d": np.zeros((b, o, 18), np.float32),
        "gt_kpts_valid_mask": np.full((b, o, 9), 2, np.float32),
        "mask": np.zeros((b, o), np.float32),
    }
    for i in range(b):
        n = int(rng.integers(3, 12))
        x1 = rng.uniform(0, 1000, n)
        y1 = rng.uniform(0, 250, n)
        label["gt_bboxes"][i, :n] = np.stack(
            [x1, y1, x1 + rng.uniform(40, 200, n),
             y1 + rng.uniform(30, 110, n)], axis=-1)
        label["gt_labels"][i, :n] = rng.integers(0, 3, n)
        label["gt_bboxes_3d"][i, :n] = [0, 1.5, 20, 1.6, 1.5, 3.9, 0.3]
        label["depths"][i, :n] = rng.uniform(5, 60, n)
        label["gt_kpts_2d"][i, :n] = rng.uniform(0, 1200, (n, 18))
        label["mask"][i, :n] = 1
    return label


def top_ops(log_dir, iters, n=12):
    """Top-n device ops (name, ms/step) from the newest trace."""
    import glob
    import gzip
    from collections import defaultdict

    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz"))
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        events = json.load(f)["traceEvents"]
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {p for p, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    totals = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "XLA Ops" not in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        totals[e["name"]] += e.get("dur", 0) / 1e6
    return sorted(
        ((name, t / iters * 1e3) for name, t in totals.items()),
        key=lambda kv: -kv[1],
    )[:n]


def measure(step_fn, state, batch, iters, show_ops=False):
    import jax

    from monocon_tpu.utils.profiling import (
        block_on,
        device_op_seconds,
        device_trace,
    )

    out = None
    for _ in range(2):
        state2, out = step_fn(state, batch)
    block_on(out)
    log_dir = "/tmp/monocon_trainperf"
    with device_trace(log_dir):
        s = state
        for _ in range(iters):
            s, out = step_fn(s, batch)
        block_on(out)
    sec = device_op_seconds(log_dir) / iters
    if show_ops:
        for name, ms in top_ops(log_dir, iters):
            print(f"    {name[:76]:<76} {ms:8.3f} ms")
    return sec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16")
    ap.add_argument("--dtypes", default="bfloat16")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mask-check", action="store_true",
                    help="also measure the all-ones valid-mask variant")
    ap.add_argument("--accum", type=int, default=1,
                    help=">1: build the optimizer with grad_accum=k "
                         "(optax.MultiSteps) to measure the per-microbatch "
                         "accumulation tax vs the plain step")
    ap.add_argument("--ops", action="store_true",
                    help="print the top device ops per variant")
    ap.add_argument("--remat", default=None,
                    choices=["full", "dots", "dots_no_batch"],
                    help="wrap the model apply in jax.checkpoint with this "
                         "policy (kills XLA's spontaneous .remat of BN-stat "
                         "sweeps under HBM pressure at the cost of "
                         "recompute; VERDICT r3 #4a)")
    ap.add_argument("--bf16-stats", action="store_true",
                    help="compute BN batch-moment sweeps in the activation "
                         "dtype instead of f32 (bandwidth experiment on the "
                         "backward's reduction tail; VERDICT r3 #4b — NOT "
                         "the parity configuration)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.solver import build_optimizer

    if args.bf16_stats:
        # Default every TorchBatchNorm to activation-dtype moment sweeps.
        # (Mutating __dataclass_fields__[...].default does NOT work —
        # dataclass defaults are baked into the generated __init__ at
        # class creation — so wrap __init__ and assert the flag flips.)
        from monocon_tpu.models.layers import TorchBatchNorm

        _orig_init = TorchBatchNorm.__init__

        def _bf16_stats_init(self, *a, **kw):
            kw.setdefault("force_float32_reductions", False)
            _orig_init(self, *a, **kw)

        TorchBatchNorm.__init__ = _bf16_stats_init
        assert TorchBatchNorm(momentum=0.9).force_float32_reductions is False, (
            "--bf16-stats patch did not take effect")

    pad_hw = (384, 1280)
    rng = np.random.default_rng(0)
    rows = []
    variant_suffix = (f"+remat:{args.remat}" if args.remat else "") + (
        "+bf16stats" if args.bf16_stats else "")
    for dtype_name in args.dtypes.split(","):
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else None
        model, variables = create_detector_state(
            jax.random.PRNGKey(0), image_hw=pad_hw, dtype=dtype
        )
        optimizer = build_optimizer(total_steps=1000,
                                    grad_accum=args.accum)
        step_fn = jax.jit(make_train_step(model, optimizer,
                                          remat=args.remat))
        for b in map(int, args.batches.split(",")):
            image = jnp.asarray(
                rng.normal(size=(b, *pad_hw, 3)).astype(np.float32))
            label = {k: jnp.asarray(v)
                     for k, v in make_label(b, 30, rng).items()}
            variants = [("plain" + variant_suffix,
                         {"img": image, "label": label})]
            if args.mask_check:
                variants.append((
                    "valid=1s",
                    {"img": image, "label": label,
                     "valid": jnp.ones((b,), jnp.float32)},
                ))
            for tag, batch in variants:
                state = create_train_state(variables, optimizer)
                sec = measure(step_fn, state, batch, args.iters,
                              show_ops=args.ops)
                cost = step_fn.lower(state, batch).compile().cost_analysis()
                if isinstance(cost, list):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0))
                mfu = flops / sec / V5E_PEAK[dtype_name] if sec else 0.0
                row = {
                    "dtype": dtype_name, "batch": b, "variant": tag,
                    "device_ms": round(sec * 1e3, 2),
                    "img_per_s": round(b / sec, 1),
                    "gflops_per_step": round(flops / 1e9, 1),
                    "mfu_pct": round(100 * mfu, 1),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    print("\nsummary:")
    for r in rows:
        print(f"  {r['dtype']:9s} B={r['batch']:<3d} {r['variant']:8s} "
              f"{r['device_ms']:8.2f} ms  {r['img_per_s']:7.1f} img/s  "
              f"MFU {r['mfu_pct']:.1f}%")


if __name__ == "__main__":
    main()
