"""Profiling hooks.

The reference's only observability is wall-clock AverageMeters
(SURVEY.md §5.1). Here: a jax.profiler trace context for device timelines
(view in TensorBoard/XProf) plus a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a device profile into `logdir` when set; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates host-side step latencies with percentile summary."""

    def __init__(self):
        self._times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    def summary(self) -> dict:
        if not self._times:
            return {}
        import numpy as np
        a = np.asarray(self._times)
        return {"mean_s": float(a.mean()), "p50_s": float(np.percentile(a, 50)),
                "p95_s": float(np.percentile(a, 95)), "n": len(a)}
