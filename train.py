"""Train MonoCon on KITTI (TPU-native).

Mirrors the reference ``train.py`` flow: default config (+ optional YAML
override), random-seed resolution, engine construction, training with
auto-resume. The reference's cudnn/TF32 toggles have no TPU analog — XLA
handles conv algorithm selection.
"""

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import random

from monocon_tpu.config import get_default_cfg, load_cfg
from monocon_tpu.engine.engine import MonoConEngine
from monocon_tpu.utils import tprint


def parse_args():
    parser = argparse.ArgumentParser(description="MonoCon-TPU training")
    parser.add_argument("--config_file", type=str, default=None,
                        help="optional YAML config override")
    parser.add_argument("--data_root", type=str, default=None,
                        help="KITTI root (overrides DATA.ROOT)")
    parser.add_argument("--output_dir", type=str, default=None,
                        help="output directory (overrides OUTPUT_DIR)")
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = load_cfg(args.config_file) if args.config_file else get_default_cfg()
    if args.data_root:
        cfg.DATA.ROOT = args.data_root
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if args.num_epochs:
        cfg.SOLVER.OPTIM.NUM_EPOCHS = args.num_epochs
    if args.batch_size:
        cfg.DATA.BATCH_SIZE = args.batch_size

    # Random seed resolution (reference train.py:31-36).
    if cfg.SEED == -1:
        cfg.SEED = random.randint(0, 2**31 - 1)
    tprint(f"Using random seed {cfg.SEED}.")

    engine = MonoConEngine(cfg)
    engine.train()


if __name__ == "__main__":
    main()
