"""Profiling hooks (first-class, per SURVEY §5: the reference has none —
only NCCL_DEBUG env vars; on TPU we expose jax.profiler traces).

Usage:
    with trace("/tmp/tb"):        # view in TensorBoard / xprof
        step(...)

    timer = StepTimer()
    with timer:
        state, log = step(state, batch)
    print(timer.last_ms, timer.mean_ms)
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Range annotation visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timer with warmup-aware running mean."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.count = 0
        self.total = 0.0
        self.last_ms = float("nan")

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.last_ms = dt * 1e3
        self.count += 1
        if self.count > self.skip_first:
            self.total += dt

    @property
    def mean_ms(self) -> float:
        """Warmup-excluded running mean; falls back to the last measured
        step before enough post-warmup samples exist (avoids logging NaN
        on the first line)."""
        n = self.count - self.skip_first
        if n > 0:
            return self.total / n * 1e3
        return self.last_ms
