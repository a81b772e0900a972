"""Profiling / debugging utilities.

The reference has no tracing at all (SURVEY.md §5) — only wall-clock prints.
Here:
  - ``profile_trace(dir)``: context manager around jax.profiler start/stop_trace
    (view with TensorBoard or xprof)
  - ``annotate(name)``: TraceAnnotation for labeling regions inside a step
  - ``enable_nan_debugging()``: jax_debug_nans mode, the TPU-native analog of
    the reference's per-batch NaN/Inf health checks
  - ``StepTimer``: EMA per-step wall-clock timing for training loops
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


class StepTimer:
    """Exponential-moving-average step timer with steps/sec reporting."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (1 - self.alpha) * self.ema + self.alpha * dt
        return dt

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.ema if self.ema else 0.0
