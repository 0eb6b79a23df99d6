"""Tracing / profiling hooks (SURVEY.md §5).

The reference's only observability is a verbose per-iteration loss print;
the build adds structured fit history on the estimator (loss_history_,
step_times_) plus these jax.profiler wrappers for real device traces."""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace around a block::

        with profiling.trace("/tmp/cmf-trace"):
            model.fit(X, Y)
    View with tensorboard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in traces (host + device timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Host-side wall-clock timer with a durable event log.

    Used by examples/benchmarks; the solver loop records its own per-block
    times on the estimator (step_times_)."""

    def __init__(self) -> None:
        self.events: List[tuple] = []

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.events.append((name, time.perf_counter() - t0))

    def total(self, name: Optional[str] = None) -> float:
        return sum(dt for n, dt in self.events if name is None or n == name)
