"""Profiling & tracing hooks.

The reference has no profiler (SURVEY.md §5 'Tracing / profiling: none').
Here: a `jax.profiler` trace context (XPlane dumps viewable in
TensorBoard/XProf) plus lightweight wall-clock step metering that the
trainer logs per epoch (images/sec)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepMeter:
    """Windowed wall-clock throughput meter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._items = 0
        self._steps = 0

    def tick(self, items: int):
        self._items += items
        self._steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def items_per_sec(self) -> float:
        return self._items / max(self.elapsed, 1e-9)

    @property
    def ms_per_step(self) -> float:
        return self.elapsed / max(self._steps, 1) * 1000.0
