"""Timing + device profiling utilities.

Covers the reference's tracing surface (``utils/decorators.py`` timer,
SURVEY.md §5) and extends it with the TPU-native tools: ``jax.profiler``
trace capture and a sync-aware timer that defeats the async dispatch queue.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Any, Callable, Tuple

import jax
import numpy as np


def timed(fn: Callable) -> Callable:
    """Wrap ``fn`` to return ``(result, elapsed_seconds)``.

    Parity: reference ``decorator_timer`` (utils/decorators.py:4-11).
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs) -> Tuple[Any, float]:
        t0 = time.time()
        result = fn(*args, **kwargs)
        return result, time.time() - t0

    return wrapper


def block_on(tree: Any) -> Any:
    """Force completion of every array in a pytree via host transfer of a
    derived scalar (the axon platform's block_until_ready can return before
    the queue drains)."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    for leaf in leaves:
        np.asarray(jax.device_get(leaf.ravel()[:1] if leaf.ndim else leaf))
    return tree


def sync_timer(fn: Callable, *args, iters: int = 10, warmup: int = 2,
               **kwargs) -> float:
    """Steady-state seconds/call of a device function."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    block_on(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    block_on(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler device trace (open with TensorBoard or parse
    the emitted trace.json.gz)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_op_seconds(log_dir: str) -> float:
    """Total device-lane XLA-op seconds in the newest trace under
    ``log_dir`` — the honest per-step denominator on this tunneled
    platform, where wall-clock varies ±50% (see CLAUDE.md). Used by
    bench.py and scripts/profile_forward.py."""
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(
        os.path.join(log_dir, "plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {log_dir}")
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        events = json.load(f)["traceEvents"]

    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        if "XLA Ops" not in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        total += e.get("dur", 0) / 1e6  # us -> s
    return total
