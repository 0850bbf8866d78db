"""Raw-streaming throughput at video scale (VERDICT round-3 #2).

BASELINE config #3 is "KITTI raw sequence streaming inference with
video-rate preprocessing"; this measures it end-to-end: a synthetic drive
of a few hundred 375x1242 frames -> ``test_raw.py`` (software-pipelined
PNG decode -> uint8 H2D -> jitted forward + 3D decode -> D2H ->
vis-format conversion) -> mp4 export, with a per-stage serial attribution
so the bottleneck is named, not guessed. Reference analog: the strictly
serial per-frame loop in ``test_raw.py:56-65``.

Run alone (1-core host: concurrent TPU work corrupts every wall number):
  python scripts/streaming_bench.py [--frames 300] [--json out.json]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

RAW_HW = (375, 1242)  # KITTI raw camera resolution


def generate_drive(root: str, num_frames: int, seed: int = 0) -> tuple:
    """Synthetic KITTI-raw drive: rendered frames + calib_cam_to_cam.txt."""
    import cv2

    from monocon_tpu.data.synthetic import (
        DEFAULT_P2,
        random_scene_labels,
        render_scene,
    )

    frames_dir = os.path.join(root, "image_02", "data")
    # Clear any previous run's frames: a leftover larger drive would make
    # the dataset glob stream more frames than this run claims to time.
    if os.path.isdir(frames_dir):
        shutil.rmtree(frames_dir)
    os.makedirs(frames_dir)
    rng = np.random.default_rng(seed)
    for i in range(num_frames):
        _, specs = random_scene_labels(rng, int(rng.integers(2, 7)),
                                       DEFAULT_P2, RAW_HW)
        img = render_scene(rng, RAW_HW, specs, DEFAULT_P2)
        cv2.imwrite(os.path.join(frames_dir, f"{i:010d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    calib_path = os.path.join(root, "calib_cam_to_cam.txt")
    with open(calib_path, "w") as f:
        f.write("P_rect_02: "
                + " ".join(f"{v:.6e}" for v in DEFAULT_P2.reshape(-1))
                + "\n")
    return frames_dir, calib_path


def make_checkpoint(root: str) -> str:
    """Save an (untrained) DLA-34 checkpoint test_raw.py can load."""
    import jax
    import jax.numpy as jnp

    from monocon_tpu.engine.checkpoint import save_checkpoint
    from monocon_tpu.engine.train_step import TrainState
    from monocon_tpu.models import create_detector_state

    _, variables = create_detector_state(jax.random.PRNGKey(0),
                                         image_hw=(64, 96))
    state = TrainState(params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=None, step=jnp.zeros((), jnp.int32))
    return save_checkpoint(os.path.join(root, "ckpt"), state, epoch=0,
                           global_iters=0)


def stage_attribution(frames_dir: str, calib_path: str, ckpt: str,
                      n: int) -> dict:
    """Serial per-stage timing over n frames: host decode / device step
    (forced) / D2H+vis conversion / vis frame rendering."""
    import jax
    import jax.numpy as jnp

    from monocon_tpu.data import KITTIRawDataset
    from monocon_tpu.data.transforms import default_raw_transforms
    from monocon_tpu.engine.checkpoint import load_weights_auto
    from monocon_tpu.models import create_detector_state
    from monocon_tpu.ops.decode import decode_predictions
    from monocon_tpu.ops.image_norm import normalize_if_raw
    from monocon_tpu.utils import split_batch_detections, to_vis_format

    dataset = KITTIRawDataset(
        frames_dir, calib_path,
        transforms=default_raw_transforms(device_normalize=True),
    )
    model, variables = create_detector_state(jax.random.PRNGKey(0))
    variables = load_weights_auto(ckpt, variables)

    @jax.jit
    def forward(variables, image, p2, img_hw):
        image = normalize_if_raw(image, img_hw)
        pred = model.apply(variables, image, train=False)
        return decode_predictions(pred, p2, (image.shape[1], image.shape[2]))

    def infer(sample):
        p2 = jnp.asarray(sample["calib"][0].P2[None].astype(np.float32))
        img_hw = jnp.asarray(
            np.array(sample["img_metas"]["unpadded_shape"], np.int32))
        return forward(variables, jnp.asarray(sample["img"]), p2, img_hw)

    jax.block_until_ready(infer(dataset[0]))  # compile outside timings

    t_decode = t_device = t_final = 0.0
    for i in range(n):
        t0 = time.perf_counter()
        sample = dataset[i]
        t_decode += time.perf_counter() - t0

        t0 = time.perf_counter()
        decoded = jax.block_until_ready(infer(sample))
        t_device += time.perf_counter() - t0

        t0 = time.perf_counter()
        per_image = split_batch_detections(
            {k: np.asarray(v) for k, v in decoded.items()}, 0.4)
        to_vis_format(per_image)
        t_final += time.perf_counter() - t0
    return {
        "frames": n,
        "host_decode_ms": 1e3 * t_decode / n,
        "device_step_forced_ms": 1e3 * t_device / n,
        "d2h_vis_convert_ms": 1e3 * t_final / n,
        "serial_sum_ms": 1e3 * (t_decode + t_device + t_final) / n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--attrib-frames", type=int, default=60)
    ap.add_argument("--root", default="/tmp/streaming_bench")
    ap.add_argument("--json", default="")
    args = ap.parse_args()

    t0 = time.perf_counter()
    frames_dir, calib_path = generate_drive(args.root, args.frames)
    print(f"drive: {args.frames} frames {RAW_HW} "
          f"({time.perf_counter() - t0:.0f}s)")
    ckpt = make_checkpoint(args.root)

    record = {"frames": args.frames, "hw": RAW_HW}

    # Per-stage serial attribution (what the pipeline must hide).
    stages = stage_attribution(frames_dir, calib_path, ckpt,
                               args.attrib_frames)
    record["stages"] = stages
    print("serial per-frame attribution "
          f"({args.attrib_frames} frames):")
    for k, v in stages.items():
        if k != "frames":
            print(f"  {k:>24}: {v:7.2f} ms")

    # End-to-end: the actual CLI (pipelined streaming + mp4 export).
    save_dir = os.path.join(args.root, "out")
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "test_raw.py"),
         "--data_dir", frames_dir, "--calib_file", calib_path,
         "--checkpoint_file", ckpt, "--save_dir", save_dir],
        capture_output=True, text=True,
    )
    total_s = time.perf_counter() - t0
    sys.stdout.write(proc.stdout[-2000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"test_raw.py failed rc={proc.returncode}")
    for line in proc.stdout.splitlines():
        if "fps end-to-end" in line:
            fps = float(line.split("(")[1].split(" fps")[0])
            record["stream_fps"] = fps
            record["stream_ms_per_frame"] = 1e3 / fps
    record["cli_total_s"] = total_s  # includes compile + mp4 export
    print(f"CLI total (incl. compile + 3x mp4 export): {total_s:.1f}s")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"-> {args.json}")


if __name__ == "__main__":
    main()
