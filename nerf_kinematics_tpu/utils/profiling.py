"""Profiling & throughput tracing.

SURVEY.md §5.1: the reference only logged a tqdm step rate; here profiling is
first-class — a ``jax.profiler`` trace context for TensorBoard-viewable
device traces, and a ThroughputMeter producing the rays/sec/chip north-star
metric (BASELINE.json).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir`` (view with
    TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Sliding-window rays/sec (and steps/sec) counter."""

    window: int = 50
    _times: List[float] = field(default_factory=list)
    _rays: List[int] = field(default_factory=list)

    def tick(self, n_rays: int) -> None:
        self._times.append(time.perf_counter())
        self._rays.append(n_rays)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._rays.pop(0)

    @property
    def rays_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return sum(self._rays[1:]) / max(dt, 1e-9)

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / max(dt, 1e-9)
