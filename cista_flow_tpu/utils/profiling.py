"""Profiling & tracing (first-class here; the reference has none —
SURVEY.md §5.1).

* ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-viewable TPU traces.
* ``annotate(name)``: named region visible in the trace timeline.
* ``StepTimer``: host-side per-step wall timing with percentile summaries
  (blocks on device results so times are honest).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): run_steps()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate('flow_net'): ...``."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates per-step wall times; blocks on a result pytree."""

    def __init__(self, name: str = "step", warmup: int = 1):
        self.name = name
        self.warmup = warmup
        self.times: list[float] = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def measure(self, result_getter=None):
        self.start()
        yield self
        self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {"name": self.name, "steps": 0}
        t = np.array(self.times)
        return {
            "name": self.name,
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3),
            "max_ms": float(t.max() * 1e3),
        }

    def __str__(self):
        s = self.summary()
        if s.get("steps", 0) == 0:
            return f"[{self.name}] no samples"
        return (f"[{s['name']}] {s['steps']} steps: mean {s['mean_ms']:.2f}ms "
                f"p50 {s['p50_ms']:.2f}ms p90 {s['p90_ms']:.2f}ms "
                f"max {s['max_ms']:.2f}ms")
