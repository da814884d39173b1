"""Config presets, resize shape snapping, debug guards, profiling utils."""

import numpy as np
import pytest

import jax.numpy as jnp

from vidmat.config import PRESETS
from vidmat.ops.resize import downsample_ratio_shape
from vidmat.pipeline.video import auto_downsample_ratio
from vidmat.utils.debug import check_finite
from vidmat.utils.profiling import FrameTimer


def test_presets_exist_for_every_ladder_rung():
    # BASELINE.json:6-12 — five ladder configs, plus the round-5
    # errormap serving preset (refine.mode="errormap" earned its place
    # vs the guided tail on hair-heavy hard content; see QUALITY.md).
    assert set(PRESETS) == {"pr1_image", "clip_480p", "video_1080p",
                            "video_4k", "multistream",
                            "video_1080p_errormap"}
    for name, f in PRESETS.items():
        out = f()
        assert len(out) in (2, 3)


def test_downsample_shape_snaps_to_16():
    for h, w, r in [(1088, 1920, 0.25), (2176, 3840, 0.125),
                    (480, 864, 0.5), (99, 131, 0.3)]:
        nh, nw = downsample_ratio_shape(h, w, r)
        assert nh % 16 == 0 and nw % 16 == 0
        assert nh >= 16 and nw >= 16


def test_auto_ratio():
    assert auto_downsample_ratio(480, 640) == 1.0
    assert 0.2 < auto_downsample_ratio(1080, 1920) < 0.5
    assert auto_downsample_ratio(2160, 3840) >= 0.125


def test_check_finite():
    check_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        check_finite({"a": jnp.array([1.0, np.nan])}, "x")


def test_frame_timer_percentiles():
    t = FrameTimer(capacity=8)
    import time

    for _ in range(5):
        t.tick()
        time.sleep(0.001)
    p = t.percentiles()
    assert p["p50_ms"] > 0


def test_run_metrics_chunk_accounting():
    """Chunked dispatches record one observation per chunk (VERDICT r1
    weak #7: per-frame p50/p99 must not be fabricated from chunk totals);
    fps still counts frames, and the summary labels the granularity."""
    from vidmat.utils.metrics import RunMetrics

    m = RunMetrics()
    for _ in range(10):
        m.record_chunk(0.04, k=4)
    s = m.summary()
    assert s["frames"] == 40
    assert abs(s["fps"] - 100.0) < 1e-6
    assert abs(s["p50_ms"] - 40.0) < 1e-6  # per-dispatch, not /4
    assert s["latency_granularity"] == "per-4-frame-dispatch"

    m2 = RunMetrics()
    m2.record_frame(0.01)
    assert "latency_granularity" not in m2.summary()

    # Mixed granularity (chunked run draining its tail per-frame) must
    # count frames per observation, not scale by one global k (ADVICE r2).
    m3 = RunMetrics()
    m3.record_chunk(0.04, k=4)   # 4 frames in 40 ms
    m3.record_frame(0.01)        # 1 frame in 10 ms
    s3 = m3.summary()
    assert s3["frames"] == 5
    assert abs(s3["fps"] - 100.0) < 1e-6  # 5 frames / 0.05 s
    # The label must not claim every observation covers kmax frames when
    # granularities are mixed (a reader dividing p50 by k would be ~4x
    # wrong for the per-frame observations).
    assert "mixed-granularity" in s3["latency_granularity"]
    assert "[1, 4]" in s3["latency_granularity"]
