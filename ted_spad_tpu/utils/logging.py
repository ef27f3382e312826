"""Observability: run-scoped metrics logging + profiling hooks.

The reference logs scalars to tensorboardX per run_id under logs/ (train_anonymizer.py:327,
41-43; mgfn main.py:46, 97-102) plus stdout prints, and its only profiling control is
``cudnn.benchmark=True`` (SURVEY.md §5). Here:
  - :class:`MetricsWriter` appends JSONL scalars (machine-readable, no deps) and mirrors to
    tensorboardX when available;
  - :func:`profile_trace` wraps a block in ``jax.profiler`` (XLA/TPU timeline; the
    cudnn.benchmark equivalent is XLA's autotuning, on by default);
  - :class:`StepTimer` gives per-step wall/throughput stats (per-epoch prints,
    train_anonymizer.py:552-553).
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import time
from typing import Any


class MetricsWriter:
    def __init__(self, log_dir: str, run_id: str):
        self.dir = os.path.join(log_dir, run_id)
        os.makedirs(self.dir, exist_ok=True)
        self._f = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._tb = None
        try:  # optional mirror (reference parity: tensorboardX SummaryWriter)
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(self.dir)
        except Exception:  # noqa: BLE001 — not in the image; JSONL is canonical
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        # NaN means "no measurement this epoch" (e.g. val_l1 on non-val epochs) —
        # JSONL records it (json 'NaN' literal, parseable by python/pandas), but the
        # tensorboardX mirror is skipped: add_scalar prints a noisy
        # "NaN or Inf found in input tensor." per call and plots nothing useful.
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}) + "\n")
        self._f.flush()
        if self._tb is not None and math.isfinite(float(value)):
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def text(self, tag: str, content: str) -> None:
        with open(os.path.join(self.dir, f"{tag}.txt"), "w") as f:
            f.write(content)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """``with profile_trace('logs/run'): step()`` -> XLA trace viewable in TensorBoard/
    Perfetto. The TPU-native replacement for cudnn.benchmark-style tuning inspection."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timing; ``rate(n_items)`` -> items/sec over the window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    def mean_step_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def rate(self, items_per_step: int = 1) -> float:
        m = self.mean_step_s()
        return items_per_step / m if m > 0 else 0.0


def config_dump(writer: MetricsWriter, params: Any) -> None:
    """Full config-to-text dump (mgfn main.py:21-27 save_config equivalent)."""
    import dataclasses

    if dataclasses.is_dataclass(params):
        content = "\n".join(f"{f.name}: {getattr(params, f.name)}" for f in dataclasses.fields(params))
    else:
        content = str(params)
    writer.text("config", content)
