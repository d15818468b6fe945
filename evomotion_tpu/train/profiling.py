"""Profiling and step-timing utilities.

The reference has no tracing/profiling at all (SURVEY §5) — only a progress
bar. The rebuild adds: jax.profiler trace capture around training phases and
lightweight wall-clock phase timers feeding the env-steps/s metric.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock phase timer with per-phase totals and rates."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def rate(self, name: str, units_per_call: float) -> float:
        """units/s for a phase (e.g. env-steps/s with units = horizon*n_envs)."""
        total = self.totals.get(name, 0.0)
        if total <= 0:
            return 0.0
        return self.counts[name] * units_per_call / total

    def summary(self) -> str:
        parts = [
            f"{k}: {self.totals[k]:.2f}s/{self.counts[k]}x" for k in sorted(self.totals)
        ]
        return ", ".join(parts)
