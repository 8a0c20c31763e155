"""Profiling helpers.

The reference has no tracing/profiling at all (SURVEY §5); its only
'profiling' is the static MAC counter. TPU-native answer: `jax.profiler`
traces viewable in XProf/TensorBoard, plus the analytic MAC/ratio report.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: `with trace('runs/profile'): step(...)`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup exclusion; forces a host fetch of a
    scalar so remote runtimes can't report async-dispatch fantasy numbers."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
