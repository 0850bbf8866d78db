"""Export a monocon_tpu checkpoint to the reference's torch .pth format.

Takes an Orbax checkpoint directory (as written by training) — or a .pth,
for format rewrites — and writes a reference-engine checkpoint
(base_engine.py:176-187) that ``load_state_dict(strict=True)``-loads into
``model.detector.MonoConDetector``, so TPU-trained weights flow back to
the reference's test.py / visualizers / downstream consumers.

Usage:
    python scripts/export_torch_ckpt.py \
        --checkpoint outputs/checkpoints/epoch_200_final \
        --out monocon_tpu_epoch200.pth
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="Orbax checkpoint dir (or a .pth to rewrite)")
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tooling

    from monocon_tpu.engine.checkpoint import load_weights_auto
    from monocon_tpu.utils.torch_convert import save_torch_checkpoint

    variables = load_weights_auto(args.checkpoint, None)

    epoch = iters = 0
    meta_path = os.path.join(args.checkpoint, "meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        epoch = int(meta.get("epoch", 0))
        iters = int(meta.get("global_iters", 0))

    save_torch_checkpoint(variables, args.out, epoch=epoch, iters=iters)
    print(f"wrote {args.out} (epoch {epoch}, iters {iters})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
