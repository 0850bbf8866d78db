"""Console + TensorBoard logging helpers.

Parity: reference ``utils/engine_utils.py`` (tprint:83, progress bar:91)
and the TensorBoard tag scheme (``loss/*``, ``eval/*`` —
engine/base_engine.py:227-231)."""

from __future__ import annotations

import os
from datetime import datetime
from typing import Dict


def count_params(params) -> int:
    """Total parameter count of a params pytree (reference
    ``count_trainable_params``, utils/engine_utils.py:34)."""
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))


def export_dict_to_csv(data: Dict, save_path: str) -> None:
    """Column-per-key CSV export (reference ``export_dict_to_csv``,
    utils/engine_utils.py:55-57)."""
    import csv

    keys = list(data.keys())
    rows = zip(*[data[k] if isinstance(data[k], (list, tuple)) else [data[k]]
                 for k in keys])
    with open(save_path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(keys)
        writer.writerows(rows)


def tprint(message: str, indent: bool = False) -> None:
    now = str(datetime.now())[:-7]
    line = f"[{now}] {message}"
    if indent:
        line = "\n" + line
    print(line, flush=True)


def progress_bar(current: int, total: int, bins: int = 20,
                 filled: str = "#", empty: str = " ") -> str:
    frac = min(max(current / max(total, 1), 0.0), 1.0)
    n = int(frac * bins)
    return f"[{filled * n}{empty * (bins - n)}][{frac * 100:5.2f}%]"


class MetricsWriter:
    """TensorBoard writer with a JSONL fallback (always writes JSONL too,
    so metrics are machine-readable without TB)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def add_scalars(self, values: Dict[str, float], tag: str,
                    step: int) -> None:
        import json

        payload = {"step": step, "tag": tag}
        for name, value in values.items():
            full = f"{tag}/{name}"
            payload[name] = float(value)
            if self._tb is not None:
                self._tb.add_scalar(full, float(value), step)
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
