"""Software-pipelined streaming inference for frame sequences.

The reference's raw-video path is strictly serial per frame: host decode
-> H2D -> forward -> D2H -> vis conversion (test_raw.py:56-60). On TPU the
device dispatch is asynchronous, so the three stages can overlap for free:

  * frame i+1..i+p decode on a small thread pool (cv2/numpy release the
    GIL) while
  * frame i computes on the device (jax dispatch returns immediately), and
  * frame i-1's result transfers D2H and converts to vis format on the
    host.

Wall-clock per frame then approaches max(host decode, device step, D2H)
instead of their sum — on a v5e the 3.5 ms device step hides entirely
behind the host decode of a 1242x375 PNG.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Sequence

import numpy as np


class BatchedFrames:
    """View a per-frame dataset as fixed-size stacked uint8 batches.

    Offline drive processing wants batch throughput, not frame latency:
    the v5e forward+decode runs 980 img/s at B=128 vs 288 img/s at B=1
    (STATUS), so re-detecting a recorded drive is ~3.4x faster batched.
    The reference's raw path is strictly B=1 (test_raw.py:56-65); this is
    a TPU-side extension driven by ``test_raw.py --batch N``.

    ``__getitem__(j)`` stacks frames ``j*b .. j*b+b-1`` into one
    ``{'img': (b, H, W, C), 'count': k}`` sample; the final partial batch
    is padded by repeating its last frame (``count`` tells the consumer
    how many rows are real) so every batch has the one compiled shape.
    Frames must share one resolution — callers assert this up front
    (``KITTIRawDataset.frame_shape`` reads headers only).

    Thread-safety matches the wrapped dataset's: each call touches only
    its own frames, so it is safe under ``pipelined_frames``'s pool iff
    the wrapped ``__getitem__`` is.
    """

    def __init__(self, dataset: Sequence[Any], batch: int):
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        self.dataset = dataset
        self.batch = batch

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch)

    def __getitem__(self, j: int) -> Dict[str, Any]:
        n = len(self.dataset)
        lo = j * self.batch
        if not 0 <= lo < n:
            raise IndexError(j)
        idxs = range(lo, min(n, lo + self.batch))
        imgs = [self.dataset[i]["img"] for i in idxs]  # each (1, H, W, C)
        count = len(imgs)
        imgs += [imgs[-1]] * (self.batch - count)
        return {"img": np.concatenate(imgs, axis=0), "count": count}


def pipelined_frames(
    dataset: Sequence[Any],
    infer: Callable[[Any], Any],
    finalize: Callable[[Any, Any], Any],
    prefetch: int = 3,
    workers: int = 2,
) -> Iterator[Any]:
    """Run ``finalize(infer(sample), sample)`` over every dataset index, in
    order, with loading / device compute / result materialization
    overlapped.

    ``infer`` should dispatch device work and return WITHOUT forcing the
    result to host (jax's async dispatch makes this the default);
    ``finalize`` forces it (e.g. ``np.asarray``) one frame later, while the
    next frame computes. Yields ``finalize``'s return values in frame
    order.

    Thread-safety requirement: ``dataset.__getitem__`` is called from
    ``workers`` pool threads concurrently, so it must be thread-safe and
    stateless per call (no shared mutable caches, no sequential readers
    like a single cv2.VideoCapture). ``KITTIRawDataset`` qualifies: each
    call opens/decodes its own frame file.
    """
    n = len(dataset)
    if n == 0:
        return
    with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
        loads: deque = deque()
        for i in range(min(max(1, prefetch), n)):
            loads.append(pool.submit(dataset.__getitem__, i))
        next_i = len(loads)

        pending = None  # (decoded_still_on_device, sample) of frame idx-1
        for _ in range(n):
            sample = loads.popleft().result()
            if next_i < n:
                loads.append(pool.submit(dataset.__getitem__, next_i))
                next_i += 1
            decoded = infer(sample)
            if pending is not None:
                yield finalize(*pending)
            pending = (decoded, sample)
        yield finalize(*pending)
