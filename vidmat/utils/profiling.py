"""Tracing / profiling hooks (SURVEY.md §5).

- ``maybe_profile(n)``: context manager wrapping the steady-state loop in
  ``jax.profiler.trace`` (Perfetto/TensorBoard viewable) when n > 0.
- ``annotate(name)``: stage-level annotation (ingest/net/refine/composite)
  that shows up on the trace timeline.
- ``FrameTimer``: lightweight per-frame latency ring buffer for p50/p99
  without tracing overhead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def maybe_profile(num_frames: int, logdir: str = "/tmp/vidmat_trace"):
    """Trace the enclosed block with jax.profiler when num_frames > 0."""
    if not num_frames:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
    print(f"profile trace written to {logdir}")


def annotate(name: str):
    """Stage annotation context (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class FrameTimer:
    """Ring buffer of per-frame wall times; O(1) memory for long videos."""

    def __init__(self, capacity: int = 4096):
        self.buf = np.zeros(capacity, np.float64)
        self.n = 0
        self.capacity = capacity
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.buf[self.n % self.capacity] = now - self._last
            self.n += 1
        self._last = now

    def percentiles(self, ps=(50, 99)) -> dict:
        if not self.n:
            return {f"p{p}_ms": 0.0 for p in ps}
        valid = self.buf[:min(self.n, self.capacity)]
        return {f"p{p}_ms": float(np.percentile(valid, p) * 1e3) for p in ps}
