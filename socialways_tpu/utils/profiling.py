"""Tracing / profiling helpers.

The reference's only timing is a wall-clock epoch print via the removed
``time.clock`` (train.py:440,558).  Here: a jax.profiler trace context for
TensorBoard-viewable device traces, and a per-step timer with percentile
summaries."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; reports mean/p50/p99."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0 = 0.0

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p99_s": float(np.percentile(t, 99)),
            "total_s": float(t.sum()),
        }
