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
        # Each observation is (seconds, frames_covered) — mixing
        # record_frame with record_chunk (e.g. a chunked run draining its
        # partial tail per-frame) stays correct: frames = sum(k_i),
        # fps = sum(k_i) / sum(t_i) (ADVICE round 2: a single global k
        # mis-scaled mixed-granularity runs).
        self.observations: list[tuple[float, int]] = []
        self.extra: Dict[str, Any] = {}
        self._t0 = time.perf_counter()

    def record_frame(self, seconds: float) -> None:
        self.observations.append((seconds, 1))

    def record_chunk(self, seconds: float, k: int) -> None:
        """One latency observation per K-frame dispatch (the chunked scan
        path). Percentiles over mixed-granularity observations are
        per-DISPATCH, not per-frame — summary() labels them so (dividing
        by K would fabricate per-frame observations that were never
        made)."""
        self.observations.append((seconds, k))

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = dict(self.extra)
        if self.observations:
            t = np.array([s for s, _ in self.observations])
            ks = [k for _, k in self.observations]
            out.update(
                frames=int(sum(ks)),
                fps=float(sum(ks) / t.sum()),
                p50_ms=float(np.percentile(t, 50) * 1e3),
                p99_ms=float(np.percentile(t, 99) * 1e3),
            )
            kset = set(ks)
            if kset != {1}:
                # Label honestly: uniform K -> per-K-frame-dispatch; a mixed
                # run (chunked body + per-frame tail drain) must not imply
                # every percentile observation covers K frames.
                if len(kset) == 1:
                    out["latency_granularity"] = (
                        f"per-{ks[0]}-frame-dispatch")
                else:
                    out["latency_granularity"] = (
                        "mixed-granularity dispatch (k in "
                        f"{sorted(kset)}; percentiles are per-dispatch)")
        out["wall_s"] = time.perf_counter() - self._t0
        return out

    def dump(self) -> str:
        return json.dumps(self.summary())
