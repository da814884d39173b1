"""Parity and quality metrics (BASELINE.json:2: alpha MAD/SAD vs reference)."""

from __future__ import annotations

import json
import time
from typing import Any, Dict

import numpy as np


def mad(a, b) -> float:
    """Mean absolute difference (the <=1e-3 parity metric, BASELINE.json:5)."""
    return float(np.mean(np.abs(np.asarray(a, np.float64) -
                                np.asarray(b, np.float64))))


def sad(a, b) -> float:
    """Sum of absolute differences, in thousands (matting-literature unit)."""
    return float(np.sum(np.abs(np.asarray(a, np.float64) -
                               np.asarray(b, np.float64))) / 1000.0)


class RunMetrics:
    """Structured per-run metrics sink (SURVEY.md §5 observability):
    fps/chip, p50/p99 per-frame latency, MAD vs oracle when available."""

    def __init__(self) -> None:
        self.frame_times: list[float] = []
        self.extra: Dict[str, Any] = {}
        self._frames_per_obs = 1
        self._t0 = time.perf_counter()

    def record_frame(self, seconds: float) -> None:
        self.frame_times.append(seconds)

    def record_chunk(self, seconds: float, k: int) -> None:
        """One latency observation per K-frame dispatch (the chunked scan
        path). Percentiles from chunk observations are per-DISPATCH, not
        per-frame — summary() labels them so (dividing by K would fabricate
        per-frame observations that were never made)."""
        self.frame_times.append(seconds)
        self._frames_per_obs = k

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = dict(self.extra)
        if self.frame_times:
            t = np.array(self.frame_times)
            k = self._frames_per_obs
            out.update(
                frames=len(t) * k,
                fps=float(len(t) * k / t.sum()),
                p50_ms=float(np.percentile(t, 50) * 1e3),
                p99_ms=float(np.percentile(t, 99) * 1e3),
            )
            if k > 1:
                out["latency_granularity"] = f"per-{k}-frame-dispatch"
        out["wall_s"] = time.perf_counter() - self._t0
        return out

    def dump(self) -> str:
        return json.dumps(self.summary())
