"""Profiling / tracing — the TPU replacement for the reference's
observability gap (SURVEY.md §5: the reference has no tracing; its
TensorBoard graph tracing is explicitly disabled because deformable
attention's `.item()` calls break it, train.py:665-669; ours traces fine
because the step is one compiled program).

- `trace(logdir)`: context manager around jax.profiler for a TensorBoard-
  viewable device trace.
- `annotate(name)`: named region that shows up in the trace timeline.
- `step_timer`: lightweight rolling wall-clock stats for train loops.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace into `logdir` (view with TensorBoard's
    profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: `with annotate('matcher'): ...`."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling throughput stats for a training loop."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def mean_sec(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        m = self.mean_sec
        return batch_size / m if m == m and m > 0 else float("nan")
