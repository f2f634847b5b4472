"""Tracing / profiling helpers (survey §5.1).

The reference's only observability is printf progress meters; here the
training and evaluation hot paths can be wrapped in ``jax.profiler`` trace
annotations and dumped as a Perfetto/TensorBoard trace.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_context(label: str) -> Iterator[None]:
    """Named region visible in the profiler timeline."""
    with jax.profiler.TraceAnnotation(label):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Cheap rolling triples/s estimator for the metrics stream."""

    def __init__(self, window: int = 50):
        import collections
        import time

        self._times = collections.deque(maxlen=window)
        self._clock = time.perf_counter

    def tick(self) -> None:
        self._times.append(self._clock())

    def rate(self, units_per_tick: float) -> float:
        if len(self._times) < 2:
            return 0.0
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) * units_per_tick / dt if dt > 0 else 0.0
