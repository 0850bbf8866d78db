"""Measure end-to-end eval pipeline throughput (VERDICT round-1 #5).

Times the full `MonoConEngine.evaluate` path on a synthetic KITTI val set:
the software-pipelined detection collection (jitted forward+decode on
device, overlapped with host KITTI conversion) and the AP evaluation,
reported separately. The collection fps is the number to compare against
bench.py's device-side fps — the gap is host-pipeline overhead.

Usage: python scripts/eval_throughput.py [--num_val 256] [--batch 16]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_val", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from monocon_tpu.config import get_default_cfg
    from monocon_tpu.data.synthetic import generate_kitti_dataset
    from monocon_tpu.engine.engine import MonoConEngine

    root = tempfile.mkdtemp()
    generate_kitti_dataset(root, num_train=1, num_val=args.num_val, seed=3)

    cfg = get_default_cfg()
    cfg.DATA.ROOT = root
    cfg.DATA.BATCH_SIZE = args.batch
    cfg.TPU.COMPUTE_DTYPE = args.dtype
    engine = MonoConEngine(cfg, is_test=True, auto_resume=False)

    def timed_collect():
        """engine.evaluate's pipelined loop, without the AP stage."""
        container = {"img_bbox": [], "img_bbox2d": []}
        pending = None
        t0 = time.perf_counter()
        for batch in engine.test_loader:
            decoded = engine._dispatch_eval(batch)
            if pending is not None:
                engine._collect_eval(*pending, container)
            pending = (decoded, batch)
        engine._collect_eval(*pending, container)
        return time.perf_counter() - t0, container

    # Warmup run compiles the eval program and primes the loader caches.
    timed_collect()

    best_fps, container = 0.0, None
    for _ in range(3):
        dt, container = timed_collect()
        best_fps = max(best_fps, args.num_val / dt)

    t0 = time.perf_counter()
    engine.test_dataset.evaluate(
        container, eval_classes=("Pedestrian", "Cyclist", "Car"),
        verbose=False,
    )
    ap_s = time.perf_counter() - t0

    import jax

    print(f"platform: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind}), "
          f"B={args.batch}, {args.dtype}, {args.num_val} images")
    print(f"collection (forward+decode+host KITTI convert, pipelined): "
          f"{best_fps:.1f} img/s  (best of 3)")
    print(f"AP evaluation: {ap_s:.2f} s for {args.num_val} images")


if __name__ == "__main__":
    main()
