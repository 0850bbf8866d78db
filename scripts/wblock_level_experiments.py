"""W-block deeper-level experiment (VERDICT round-3 #5).

The stem's W-only space-to-depth trick won 3.4x because 16-ch
full-resolution convs used <16 of 128 MXU lanes AND XLA inserted layout
copies. Extending it to level2's stride-1 64-ch convs (H/4) is NOT free:
a stride-1 conv in W-block(b) domain computes b-fold FLOPs (the block
kernel is dense over b*ci x b*co but only 1/b of its taps are nonzero),
so the lane-fill gain (64 -> 128 lanes = 2x) must beat the 2x FLOP
inflation to win. This script measures exactly that op-level A/B on the
real device — plain NHWC vs the bit-equivalent W-block(2) program — for
each remaining narrow conv shape in DLA-34's level2, before committing to
a model rewrite. (The level1 32-ch convs already run blocked inside the
stem path, dla.py:462-468.)

Run alone on an idle chip: python scripts/wblock_level_experiments.py
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

    from monocon_tpu.models.dla import _wblock_kernel, w_space_to_depth
    from monocon_tpu.utils.profiling import sync_timer
    from jax import lax

    B = int(os.environ.get("WB_BATCH", "128"))
    dt = jnp.bfloat16
    # (tag, H, W, ci, co): the stride-1 convs still plain in the s2d path.
    shapes = [
        ("level2 3x3 s1 64ch @H/4", 96, 320, 64, 64),
        ("root 1x1 128->64 @H/4", 96, 320, 128, 64),
        ("level3 3x3 s1 128ch @H/8 (ref)", 48, 160, 128, 128),
    ]
    rng = np.random.default_rng(0)
    print(f"B={B} bf16, per-op best-of-3 x 30 iters "
          f"(plain vs W-block(2), identical math)")
    print(f"| conv | plain ms | w-block2 ms | ratio |")
    print(f"|---|---|---|---|")
    for tag, h, w, ci, co in shapes:
        ksz = 3 if "3x3" in tag else 1
        pad = ksz // 2
        x = jnp.asarray(rng.normal(size=(B, h, w, ci)).astype(np.float32),
                        dtype=dt)
        k = jnp.asarray(
            rng.normal(size=(ksz, ksz, ci, co)).astype(np.float32))

        def plain(x, k):
            return lax.conv_general_dilated(
                x, k.astype(dt), (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def blocked(x, k):
            xb = w_space_to_depth(x, 2)
            kb, pad_w = _wblock_kernel(k, 2, 1, pad)
            return lax.conv_general_dilated(
                xb, kb.astype(dt), (1, 1), [(pad, pad), pad_w],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        fp = jax.jit(plain)
        fb = jax.jit(blocked)
        # numerics check once (bf16 tolerance)
        yp = np.asarray(fp(x, k), np.float32)
        yb = np.asarray(fb(x, k), np.float32).reshape(yp.shape[0],
                                                      yp.shape[1], -1, 2,
                                                      co)
        yb = yb.reshape(yp.shape[0], yp.shape[1], -1, co)
        err = np.max(np.abs(yb - yp)) / (np.max(np.abs(yp)) + 1e-9)
        tp = min(sync_timer(fp, x, k, iters=30, warmup=5) for _ in range(3))
        tb = min(sync_timer(fb, x, k, iters=30, warmup=5) for _ in range(3))
        print(f"| {tag} | {tp * 1e3:.3f} | {tb * 1e3:.3f} | "
              f"{tb / tp:.2f}x | (rel err {err:.1e})")


if __name__ == "__main__":
    main()
