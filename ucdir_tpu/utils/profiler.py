"""Profiling hooks — jax.profiler traces + per-step timing.

The reference has no tracing/profiling (SURVEY.md §5: only tqdm bars); these
utilities are the TPU-native observability layer: XLA-level traces viewable in
TensorBoard/Perfetto plus a lightweight step timer for throughput logs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open in TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Exponential-moving-average step timer for steady-state throughput."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            (1 - self.alpha) * self.avg + self.alpha * dt

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else 0.0


def annotate(name: str):
    """TraceAnnotation context for named regions inside profiles."""
    return jax.profiler.TraceAnnotation(name)
