"""Evaluate / visualize a trained MonoCon checkpoint on KITTI.

Mirrors the reference ``test.py`` flags (test.py:13-26): --config_file,
--checkpoint_file (orbax dir or reference .pth), --evaluate, --visualize,
--save_dir. ``--gpu_id`` is accepted for compatibility and ignored on TPU.
"""

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse

from monocon_tpu.config import get_default_cfg, load_cfg
from monocon_tpu.engine.engine import MonoConEngine
from monocon_tpu.utils import tprint


def parse_args():
    parser = argparse.ArgumentParser(description="MonoCon-TPU evaluation")
    parser.add_argument("--config_file", type=str, default=None)
    parser.add_argument("--checkpoint_file", type=str, required=True,
                        help="orbax checkpoint dir or reference .pth")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--gpu_id", type=int, default=0,
                        help="compatibility no-op on TPU")
    parser.add_argument("--evaluate", action="store_true")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--save_dir", type=str, default="./vis_results")
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = load_cfg(args.config_file) if args.config_file else get_default_cfg()
    if args.data_root:
        cfg.DATA.ROOT = args.data_root

    engine = MonoConEngine(cfg, is_test=True)
    engine.load_checkpoint(args.checkpoint_file)
    tprint(f"Checkpoint '{args.checkpoint_file}' loaded.")

    if args.evaluate:
        engine.evaluate()
    if args.visualize:
        engine.visualize(args.save_dir, draw_items=["2d", "3d", "bev"])
        tprint(f"Visualizations saved to '{args.save_dir}'.")


if __name__ == "__main__":
    main()
