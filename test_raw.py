"""Video inference on KITTI raw drive sequences.

Mirrors the reference ``test_raw.py`` flags (test_raw.py:16-32):
--data_dir (frames), --calib_file (calib_cam_to_cam.txt),
--checkpoint_file, --gpu_id (no-op), --save_dir, --fps.
"""

from monocon_tpu.utils.platform import apply_platform_env

apply_platform_env()

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from monocon_tpu.data import KITTIRawDataset
from monocon_tpu.data.transforms import default_raw_transforms
from monocon_tpu.engine.checkpoint import load_weights_auto
from monocon_tpu.ops.image_norm import normalize_if_raw
from monocon_tpu.models import create_detector_state
from monocon_tpu.ops.decode import decode_predictions
from monocon_tpu.utils import split_batch_detections, to_vis_format, tprint
from monocon_tpu.utils.streaming import BatchedFrames, pipelined_frames
from monocon_tpu.utils.visualizer import Visualizer


def parse_args():
    parser = argparse.ArgumentParser(description="MonoCon-TPU raw inference")
    parser.add_argument("--data_dir", type=str, required=True,
                        help="directory with the drive's image_2 frames")
    parser.add_argument("--calib_file", type=str, required=True,
                        help="calib_cam_to_cam.txt of the drive")
    parser.add_argument("--checkpoint_file", type=str, required=True)
    parser.add_argument("--gpu_id", type=int, default=0,
                        help="accepted for reference drop-in compatibility; "
                             "device selection is XLA's (no-op)")
    parser.add_argument("--save_dir", type=str, default="./raw_results")
    parser.add_argument("--fps", type=int, default=25,
                        help="FPS of the result video (reference default)")
    parser.add_argument("--score_threshold", type=float, default=0.4)
    parser.add_argument("--batch", type=int, default=1,
                        help="frames per device step. 1 = lowest-latency "
                             "online streaming; larger batches trade "
                             "latency for throughput when re-detecting a "
                             "recorded drive offline (the v5e forward runs "
                             "~3.4x more img/s at B=128 than at B=1)")
    return parser.parse_args()


def main():
    args = parse_args()
    # Frames cross to the device as raw uint8; normalization happens
    # inside the jitted forward (4x fewer bytes per frame).
    dataset = KITTIRawDataset(
        args.data_dir, args.calib_file,
        transforms=default_raw_transforms(device_normalize=True),
    )
    tprint(f"{len(dataset)} frames found.")

    model, variables = create_detector_state(jax.random.PRNGKey(0))
    variables = load_weights_auto(args.checkpoint_file, variables)

    @jax.jit
    def forward(variables, image, p2, img_hw):
        image = normalize_if_raw(image, img_hw)
        pad_hw = (image.shape[1], image.shape[2])
        pred = model.apply(variables, image, train=False)
        return decode_predictions(pred, p2, pad_hw)

    # All frames of a drive must share one resolution (KITTI drives do):
    # one jit shape = one compile, and the last partial batch is padded by
    # frame repetition. frame_shape reads PNG/JPEG headers only, so
    # checking the whole drive is cheap (early-exit keeps even the
    # full-decode fallback for exotic formats from decoding the drive
    # twice). A mixed-resolution drive would recompile (~minutes on TPU)
    # inside the timed loop and poison the fps number.
    raw_hw0 = dataset.frame_shape(0)
    for i in range(1, len(dataset)):
        hw_i = dataset.frame_shape(i)
        if hw_i != raw_hw0:
            raise SystemExit(
                f"frame {i} is {hw_i}, differing from frame 0's {raw_hw0} "
                "resolution; pad-free batching and single-compile "
                "streaming need a uniform-resolution drive"
            )

    # The calib and padded extent are drive-wide constants: upload once.
    sample0 = dataset[0]
    p2 = jnp.asarray(np.tile(
        sample0["calib"][0].P2[None].astype(np.float32), (args.batch, 1, 1)
    ))
    # img_metas values carry the fake batch dim already (kitti_raw.py
    # wraps every meta in a 1-element list), so this tiles (1,2) -> (b,2).
    img_hw = jnp.asarray(np.tile(
        np.array(sample0["img_metas"]["unpadded_shape"], np.int32),
        (args.batch, 1),
    ))
    frames = BatchedFrames(dataset, args.batch)

    def infer(batch):
        """Dispatch one frame batch; returns device arrays WITHOUT
        forcing them."""
        return forward(variables, jnp.asarray(batch["img"]), p2, img_hw)

    def finalize(decoded, batch):
        """Force D2H + vis conversion (runs while the NEXT batch
        computes); padded repeat-frames are dropped via ``count``."""
        per_image = split_batch_detections(
            {k: np.asarray(v) for k, v in decoded.items()},
            args.score_threshold,
        )
        return to_vis_format(per_image[: batch["count"]])

    # Software-pipelined streaming: frame decode (threads), device compute,
    # and D2H/vis conversion overlap — see monocon_tpu/utils/streaming.py.
    # Warm up the jit cache outside the timed window, and force the result
    # so the device queue is drained when the timer starts.
    jax.block_until_ready(infer(frames[0]))
    t0 = time.perf_counter()
    results = []
    for vis in pipelined_frames(frames, infer, finalize):
        results.extend(vis)
    stream_s = time.perf_counter() - t0
    tprint(
        f"Streamed {len(dataset)} frames in {stream_s:.2f}s "
        f"({len(dataset) / stream_s:.1f} fps end-to-end: decode + "
        f"forward + 3D decode, pipelined"
        + (f", batch {args.batch}" if args.batch > 1 else "")
        + ")."
    )

    visualizer = Visualizer(dataset, results)
    visualizer.export_as_video(args.save_dir, ["2d", "3d", "bev"], args.fps)
    tprint(f"Videos exported to '{args.save_dir}'.")


if __name__ == "__main__":
    main()
