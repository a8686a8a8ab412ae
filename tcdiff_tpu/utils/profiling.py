"""Profiling / step-time instrumentation.

The reference has no profiling at all — progress is tqdm bars
(`/root/reference/TCDiff.py:200-204`). Here: `jax.profiler` trace capture
(inspectable in XProf/TensorBoard) plus a lightweight step timer that
reports steps/sec and seconds-of-motion throughput, the framework's
north-star metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into log_dir (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA-smoothed step timing with derived throughput metrics."""

    def __init__(self, smoothing: float = 0.9):
        self._smoothing = smoothing
        self._avg = None
        self._last = None

    def tick(self) -> None:
        self._last = time.perf_counter()

    def tock(self, steps: int = 1) -> float:
        """steps>1: the timed dispatch covered that many train steps (a
        lax.scan block) — the EMA tracks per-STEP time either way."""
        dt = (time.perf_counter() - self._last) / max(1, steps)
        self._avg = dt if self._avg is None else self._smoothing * self._avg + (1 - self._smoothing) * dt
        return dt

    @property
    def avg_step_s(self) -> Optional[float]:
        return self._avg

    def metrics(self, motion_seconds_per_step: float = 0.0) -> dict:
        if self._avg is None:
            return {}
        out = {"step_time_s": self._avg, "steps_per_sec": 1.0 / self._avg}
        if motion_seconds_per_step:
            out["motion_s_per_sec"] = motion_seconds_per_step / self._avg
        return out
