"""Settle the Pallas question with data (VERDICT round-1 #8).

Measures on the current platform, B=16, best-of-3 windows:
  1. target generation alone: jnp splat vs Pallas splat (device + wall)
  2. full train step (f32): jnp targets vs Pallas targets
  3. decode cost in context: eval forward with vs without 3D decode

Prints a markdown table for ROUND2_NOTES.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from monocon_tpu.data.synthetic import DEFAULT_P2
    from monocon_tpu.engine import create_train_state, make_train_step
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.ops.targets import generate_targets
    from monocon_tpu.solver import build_optimizer
    from monocon_tpu.utils.profiling import sync_timer

    B, pad_hw = 16, (384, 1280)
    feat_hw = (pad_hw[0] // 4, pad_hw[1] // 4)
    rng = np.random.default_rng(0)
    o = 30
    label = {
        "gt_bboxes": np.zeros((B, o, 4), np.float32),
        "gt_labels": np.zeros((B, o), np.float32),
        "gt_bboxes_3d": np.zeros((B, o, 7), np.float32),
        "depths": np.zeros((B, o), np.float32),
        "gt_kpts_2d": np.zeros((B, o, 18), np.float32),
        "gt_kpts_valid_mask": np.zeros((B, o, 9), np.float32),
        "mask": np.zeros((B, o), np.float32),
    }
    for b in range(B):
        n = int(rng.integers(3, 12))
        for i in range(n):
            x1, y1 = rng.uniform(0, 1000), rng.uniform(0, 250)
            w, h = rng.uniform(40, 200), rng.uniform(30, 110)
            label["gt_bboxes"][b, i] = [x1, y1, x1 + w, y1 + h]
            label["gt_labels"][b, i] = rng.integers(0, 3)
            label["gt_bboxes_3d"][b, i] = [0, 1.5, 20, 1.6, 1.5, 3.9, 0.3]
            label["depths"][b, i] = rng.uniform(5, 60)
            label["gt_kpts_2d"][b, i] = rng.uniform(0, 1200, 18)
            label["gt_kpts_valid_mask"][b, i] = 2
            label["mask"][b, i] = 1
    label_dev = {k: jnp.asarray(v) for k, v in label.items()}

    rows = []

    # -- 1. target generation alone ------------------------------------
    for name, flag in (("jnp splat", False), ("pallas splat", True)):
        fn = jax.jit(lambda lab, f=flag: jax.tree.map(
            lambda x: x.sum(),
            generate_targets(lab, feat_hw, pad_hw, use_pallas=f),
        ))
        try:
            dt = min(sync_timer(fn, label_dev, iters=20, warmup=3)
                     for _ in range(3))
            rows.append((f"targets only ({name})", dt * 1e3))
        except Exception as exc:  # pallas may be unsupported on CPU
            rows.append((f"targets only ({name})", float("nan")))
            print(f"  [{name} failed: {type(exc).__name__}: {exc}]")

    # -- 2. full train step --------------------------------------------
    model, variables = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw
    )
    optimizer = build_optimizer(total_steps=100)
    img = jnp.asarray(rng.normal(size=(B, *pad_hw, 3)).astype(np.float32))
    batch = {"img": img, "label": label_dev}
    for name, flag in (("jnp targets", False), ("pallas targets", True)):
        state = create_train_state(variables, optimizer)
        step = jax.jit(make_train_step(model, optimizer, use_pallas=flag))
        try:
            dt = min(
                sync_timer(step, state, batch, iters=10, warmup=2)
                for _ in range(3)
            )
            rows.append((f"train step f32 ({name})", dt * 1e3))
        except Exception as exc:
            rows.append((f"train step f32 ({name})", float("nan")))
            print(f"  [{name} failed: {type(exc).__name__}: {exc}]")

    # -- 3. decode in context (bf16 serving config) ---------------------
    # Decode alone on precomputed head outputs (comparing forward-only vs
    # forward+decode instead is misleading: decode does not consume the
    # two kpt-heatmap branches, so XLA dead-code-eliminates them from the
    # fused program and "forward+decode" comes out FASTER than "forward").
    model_bf, var_bf = create_detector_state(
        jax.random.PRNGKey(0), image_hw=pad_hw, dtype=jnp.bfloat16
    )
    p2 = jnp.asarray(np.tile(DEFAULT_P2[None], (B, 1, 1)))

    pred = jax.jit(lambda v, im: model_bf.apply(v, im, train=False))(
        var_bf, img)
    pred = jax.tree.map(lambda x: x.block_until_ready(), pred)
    decode_only = jax.jit(lambda pr, p: jax.tree.map(
        lambda x: x.sum(), decode_predictions(pr, p, pad_hw)))
    fwd_decode = jax.jit(lambda v, im, p: jax.tree.map(
        lambda x: x.sum(),
        decode_predictions(model_bf.apply(v, im, train=False), p, pad_hw)))
    dt_do = min(sync_timer(decode_only, pred, p2, iters=20, warmup=3)
                for _ in range(3))
    dt_d = min(sync_timer(fwd_decode, var_bf, img, p2, iters=20, warmup=3)
               for _ in range(3))
    rows.append(("3D decode alone (XLA ops, on head outputs)", dt_do * 1e3))
    rows.append(("forward + 3D decode bf16", dt_d * 1e3))

    print(f"\nplatform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind}), B={B}, {pad_hw}")
    print("| measurement | ms/step (best-of-3, wall incl. dispatch) |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")


if __name__ == "__main__":
    main()
