"""Profiling & tracing hooks.

The reference has no profiling at all (SURVEY.md 5.1 — tqdm bars only).
Here: ``trace()`` wraps a region in a jax.profiler trace (viewable in
TensorBoard/XProf/Perfetto), ``annotate()`` names sub-regions on the device
timeline, and ``StepTimer`` records per-step wall times + simple throughput
stats to JSONL for the training loop.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the device timeline (use around jitted calls)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with EMA + JSONL sink."""

    def __init__(self, path: Optional[str] = None, ema: float = 0.9):
        self.path = path
        self.ema = ema
        self._avg = None
        self._last = None
        if path:
            Path(path).parent.mkdir(parents=True, exist_ok=True)

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._last = dt
        self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        return False

    @property
    def last_s(self) -> Optional[float]:
        return self._last

    @property
    def avg_s(self) -> Optional[float]:
        return self._avg

    def log(self, step: int, **extra):
        if not self.path:
            return
        rec = {"step": step, "step_time_s": self._last, "avg_step_time_s": self._avg}
        rec.update(extra)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
