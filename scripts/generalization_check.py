"""Generalization check: train on 200 synthetic KITTI images, evaluate
AP40 on 100 HELD-OUT images (not the overfit smoke test — the val split is
disjoint, so nontrivial AP here demonstrates the full train->decode->AP
pipeline learns transferable structure, the closest this sandbox gets to
the reference's real-KITTI AP table without network/data access).

Run: python scripts/generalization_check.py [--epochs 40]
(TPU: ~10-15 min; prints per-epoch loss and final AP40 table.)
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--train", type=int, default=200)
    ap.add_argument("--val", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--augment", action="store_true",
                    help="keep the full train-time augmentation (needs far "
                         "more epochs to converge; the default trains bare, "
                         "which is enough to demonstrate held-out AP)")
    ap.add_argument("--dtype", default="float32",
                    help="'bfloat16' validates the recommended "
                         "mixed-precision training config at AP level")
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (init + shuffle + augmentation); "
                         "the dataset itself stays fixed for comparability "
                         "across the seed-variance study")
    ap.add_argument("--snapshot-eval", type=int, default=3, metavar="K",
                    help="also evaluate the last K decade checkpoints "
                         "(epoch ~N-10(K-1)..N): a within-run late-training "
                         "AP spread diagnoses ulp-level trajectory chaos vs "
                         "a genuine seed outlier without K extra runs. The "
                         "headline numbers reported are the MEDIAN over "
                         "these snapshots + the final model (Car-2D swings "
                         "~16 AP across the last 30 epochs of one run — "
                         "round-4 measurement — so single stopping-epoch "
                         "values are noise). 0 disables.")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from monocon_tpu.config import get_default_cfg
    from monocon_tpu.data.synthetic import generate_kitti_dataset
    from monocon_tpu.engine import MonoConEngine

    root = tempfile.mkdtemp(prefix="kitti_gen_")
    out = args.out or tempfile.mkdtemp(prefix="mc_gen_out_")
    t0 = time.time()
    generate_kitti_dataset(root, num_train=args.train, num_val=args.val,
                           image_hw=(192, 640), seed=11)
    print(f"synthetic dataset ({args.train} train / {args.val} val) "
          f"in {time.time() - t0:.0f}s -> {root}")

    cfg = get_default_cfg()
    cfg.DATA.ROOT = root
    cfg.OUTPUT_DIR = out
    cfg.DATA.BATCH_SIZE = args.batch
    cfg.DATA.NUM_WORKERS = 4
    cfg.SOLVER.OPTIM.NUM_EPOCHS = args.epochs
    cfg.PERIOD.EVAL_PERIOD = -1   # we evaluate once at the end
    cfg.PERIOD.LOG_PERIOD = 10
    cfg.SEED = args.seed
    cfg.TPU.PAD_HW = [192, 640]
    cfg.DATA.CROP_HW = [160, 512]
    cfg.DATA.AUGMENT = bool(args.augment)
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    # Decoded-image cache: epochs 2..N skip the PNG decode (bit-identical
    # pixels, tests/test_data_pipeline.py::test_decoded_image_cache) — on
    # this 1-core host the decode otherwise dominates epoch wall time.
    cfg.DATA.IMAGE_CACHE = "auto"
    cfg.MODEL.BACKBONE.IMAGENET_PRETRAINED = False
    steps_per_epoch = -(-args.train // args.batch)
    if args.snapshot_eval > 0:
        # Checkpoint every ~10 epochs so late-training snapshots exist.
        cfg.PERIOD.CKPT_PERIOD_STEPS = 10 * steps_per_epoch

    engine = MonoConEngine(cfg)
    engine.train()

    results = engine.evaluate(verbose=True)
    # Keys are '{container}/{ap_type}' (data/base_dataset.py:124), e.g.
    # 'img_bbox/KITTI/Car_2D_AP40_moderate_strict'. Print ALL THREE
    # classes — "multi-class training" is only demonstrated if Pedestrian
    # and Cyclist reach nonzero held-out AP too (reference evaluates the
    # 3-class list, dataset/base_dataset.py:119-152).
    keys = []
    for cls in ("Car", "Pedestrian", "Cyclist"):
        keys += [
            f"img_bbox/KITTI/{cls}_2D_AP40_moderate_strict",
            f"img_bbox/KITTI/{cls}_3D_AP40_moderate_loose",
            f"img_bbox/KITTI/{cls}_3D_AP40_moderate_strict",
        ]
    keys.append("img_bbox/KITTI/Overall_3D_AP40_moderate")
    print("\nheld-out AP40 (synthetic val, disjoint from train):")
    for k in keys:
        if k in results:
            print(f"  {k}: {results[k]:.2f}")
    nonzero = sum(1 for k, v in results.items()
                  if k.startswith("img_bbox/") and v > 0)
    ok = (results.get("img_bbox/KITTI/Car_2D_AP40_moderate_strict", 0.0)
          > 5.0)
    print(f"({nonzero} nonzero held-out AP entries)")

    # Within-run late-training snapshot evals (see --snapshot-eval help).
    snapshots = {}
    if args.snapshot_eval > 0:
        import glob as _glob

        ckpts = sorted(
            p for p in _glob.glob(os.path.join(out, "checkpoints", "epoch_*"))
            if not p.endswith("_final")
        )[-args.snapshot_eval:]
        hdr = ("epoch", "Car_2D_mod", "Car_3D_mod@0.5")
        print("\nlate-training snapshot evals (within-run AP spread):")
        print("  {:>8} {:>10} {:>14}".format(*hdr))
        for path in ckpts:
            engine.load_checkpoint(path)
            r = engine.evaluate(verbose=False)
            epoch = os.path.basename(path).split("_")[1]
            c2d = r.get("img_bbox/KITTI/Car_2D_AP40_moderate_strict", 0.0)
            c3d = r.get("img_bbox/KITTI/Car_3D_AP40_moderate_loose", 0.0)
            snapshots[epoch] = {
                k: float(v) for k, v in r.items()
                if "_AP40_moderate" in k
            }
            print(f"  {epoch:>8} {c2d:>10.2f} {c3d:>14.2f}")

    # Oscillation-robust headline: per-metric MEDIAN over {final model +
    # the K late-training snapshots}. Stopping-epoch AP oscillates (Car-2D
    # ±16 within one run's last 30 epochs, round-4 measurement), so
    # cross-seed / cross-round comparisons must use these medians, never a
    # single stopping-epoch value.
    import numpy as _np

    median_results = {}
    if snapshots:
        metric_keys = {k for snap in snapshots.values() for k in snap}
        for k in sorted(metric_keys):
            vals = [snap[k] for snap in snapshots.values() if k in snap]
            if k in results:
                vals.append(float(results[k]))
            median_results[k] = float(_np.median(vals))
        print("\nmedian over final + last "
              f"{len(snapshots)} snapshots (the comparable numbers):")
        for k in keys:
            if k in median_results:
                print(f"  {k}: {median_results[k]:.2f}")

    # Persist the full result dict so seed-variance / multi-class studies
    # aggregate from artifacts instead of scraped stdout.
    record = {
        "seed": args.seed, "train": args.train, "val": args.val,
        "epochs": args.epochs, "augment": bool(args.augment),
        "dtype": args.dtype, "batch": args.batch,
        "results": {k: float(v) for k, v in results.items()},
        "snapshots": snapshots,
        "median_results": median_results,
    }
    json_path = os.path.join(out, f"ap_seed{args.seed}.json")
    with open(json_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"full AP record -> {json_path}")
    print("GENERALIZATION CHECK:", "PASS" if ok else "FAIL",
          f"(checkpoints in {out})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
