"""Profile the flagship forward on the current platform and print the top
ops by device time, plus an MFU estimate.

Usage: python scripts/profile_forward.py [--batch 16] [--iters 5]
Writes the raw jax.profiler trace under /tmp/monocon_trace (TensorBoard
compatible) and prints a parsed per-op summary to stdout.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s, one v5e chip


def trace_events(log_dir):
    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    assert paths, f"no trace found under {log_dir}"
    latest = max(paths, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def summarize(events, min_pct=0.5):
    """Aggregate device-lane complete events by op name."""
    # Find TPU/device process ids: lanes whose name mentions TPU or XLA Ops.
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    totals = defaultdict(float)
    total_time = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e["pid"], e["tid"]), "")
        if "XLA Ops" not in lane and "Steps" not in lane:
            if "XLA" not in lane:
                continue
        if "XLA Ops" not in lane:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        totals[e["name"]] += dur
        total_time += dur
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"\ntotal device op time: {total_time * 1e3:.2f} ms")
    print(f"{'op':<72} {'ms':>9} {'%':>6}")
    shown = 0.0
    for name, t in rows:
        pct = 100 * t / total_time if total_time else 0
        if pct < min_pct:
            break
        shown += pct
        print(f"{name[:72]:<72} {t * 1e3:9.3f} {pct:6.2f}")
    print(f"(shown: {shown:.1f}%)")
    return total_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--train", action="store_true",
                    help="profile the training step instead of inference")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from monocon_tpu.data.synthetic import DEFAULT_P2
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.utils.profiling import block_on, device_trace

    pad_hw = (384, 1280)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw, dtype=dtype
    )

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.normal(size=(args.batch, *pad_hw, 3)).astype(np.float32)
    )
    p2 = jnp.asarray(np.tile(DEFAULT_P2[None], (args.batch, 1, 1)))

    if args.train:
        from monocon_tpu.engine import create_train_state, make_train_step
        from monocon_tpu.solver import build_optimizer

        optimizer = build_optimizer(total_steps=1000)
        state = create_train_state(
            jax.tree.map(lambda a: a, variables), optimizer
        )
        step_fn = jax.jit(make_train_step(model, optimizer))
        b, o = args.batch, 30
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
        label = {k: jnp.asarray(v) for k, v in label.items()}
        batch = {"img": image, "label": label}

        def run(s):
            return step_fn(s, batch)

        arg0 = state
        lowered = step_fn.lower(state, batch)
    else:

        @jax.jit
        def forward(variables, image, p2):
            pred = model.apply(variables, image, train=False)
            return decode_predictions(pred, p2, pad_hw)

        def run(v):
            return forward(v, image, p2)

        arg0 = variables
        lowered = forward.lower(variables, image, p2)

    out = None
    for _ in range(3):
        out = run(arg0)
    block_on(out)

    log_dir = "/tmp/monocon_trace"
    with device_trace(log_dir):
        for _ in range(args.iters):
            out = run(arg0)
        block_on(out)

    total = summarize(trace_events(log_dir))
    per_step = total / args.iters
    # Approximate FLOPs from XLA's own cost analysis.
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops", 0.0)
    except Exception:
        flops = 0.0
    print(f"\nper-step device time: {per_step * 1e3:.2f} ms "
          f"({args.batch / per_step:.1f} img/s)")
    if flops:
        mfu = flops / per_step / V5E_PEAK_BF16
        print(f"XLA cost-analysis FLOPs/step: {flops / 1e9:.1f} GF "
              f"-> MFU {100 * mfu:.1f}% of v5e bf16 peak")


if __name__ == "__main__":
    main()
