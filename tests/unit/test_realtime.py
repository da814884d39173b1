"""Realtime (live) serving driver: latest-wins mailbox + pacing + stats."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import time

import numpy as np
import pytest

from vidmat.pipeline.realtime import LatestMailbox, RealtimeMatting


class TestLatestMailbox:
    def test_latest_wins_and_drop_accounting(self):
        box = LatestMailbox()
        for i in range(10):
            box.put(i)
        box.close()
        assert box.get() == 9          # only the newest survives
        assert box.get() is None       # closed and drained
        assert box.produced == 10
        assert box.dropped == 9
        assert box.produced == box.dropped + 1

    def test_get_blocks_until_put(self):
        import threading

        box = LatestMailbox()
        threading.Timer(0.05, lambda: box.put("x")).start()
        assert box.get(timeout=5.0) == "x"

    def test_get_timeout(self):
        box = LatestMailbox()
        with pytest.raises(TimeoutError):
            box.get(timeout=0.05)

    def test_put_after_close_raises(self):
        box = LatestMailbox()
        box.close()
        with pytest.raises(RuntimeError):
            box.put(1)


@pytest.fixture(scope="module")
def rt_session():
    # Non-/16 native size on purpose: exercises the pad/crop path.
    return RealtimeMatting(90, 120, downsample_ratio=1.0)


def _frames(n, h=90, w=120):
    from vidmat.io.fixtures import synthetic_frame

    return [synthetic_frame(h, w, i / n)[0] for i in range(n)]


class TestRealtimeMatting:
    def test_keeps_up_processes_everything(self, rt_session):
        # Warm the compile first so pacing isn't fighting the first-call
        # compile; then a slow producer (4 fps vs a warmed CPU step)
        # must see zero drops.
        rt_session.run(_frames(1), pace_fps=None)
        rt_session.reset()
        frames = _frames(6)
        stats = rt_session.run(frames, pace_fps=4.0)
        assert stats["processed"] == stats["produced"] == len(frames)
        assert stats["dropped"] == 0
        assert stats["p50_ms"] > 0

    def test_overrun_drops_not_queues(self, rt_session):
        # Unpaced producer: all frames land immediately; the consumer can
        # only ever see the newest -> drops are reported, and
        # produced == processed + dropped always holds.
        rt_session.reset()
        frames = _frames(30)
        stats = rt_session.run(frames, pace_fps=None)
        assert stats["produced"] == len(frames)
        assert stats["processed"] + stats["dropped"] == stats["produced"]
        assert stats["dropped"] > 0  # 30 instant puts vs ~100ms CPU steps

    def test_outputs_written_and_cropped(self, rt_session, tmp_path):
        rt_session.reset()
        comps = []
        stats = rt_session.run(
            _frames(4), pace_fps=15.0,
            output_alpha=str(tmp_path / "a_%03d.png"),
            output_composition=str(tmp_path / "c_%03d.png"),
            on_frame=lambda a, c: comps.append((a.shape, c.shape)))
        import glob

        assert stats["processed"] == 4
        assert len(glob.glob(str(tmp_path / "a_*.png"))) == 4
        assert len(glob.glob(str(tmp_path / "c_*.png"))) == 4
        # outputs are cropped to the NATIVE size, not the /16 bucket
        assert comps[0] == ((90, 120), (90, 120, 3))

    def test_max_frames_stops_early(self, rt_session):
        # Paced source so frames keep arriving: the consumer must stop at
        # max_frames and signal the producer to stop early. (Unpaced, all
        # 10 puts collapse into the 1-slot mailbox before a second get —
        # latest-wins would correctly process just 1.)
        rt_session.reset()
        stats = rt_session.run(_frames(10), pace_fps=4.0, max_frames=2)
        assert stats["processed"] == 2
        assert stats["produced"] <= 10

    def test_wrong_frame_size_rejected(self, rt_session):
        rt_session.reset()
        with pytest.raises(ValueError, match="live frame"):
            rt_session.run(_frames(2, h=64, w=64), pace_fps=None)


def test_cli_live_on_file(tmp_path):
    """File-as-camera: the CLI probes size/fps, paces the producer, and
    reports the stats JSON."""
    import json
    import subprocess
    import sys

    import imageio.v3 as iio

    from vidmat.io.fixtures import synthetic_frame

    src = tmp_path / "src"
    src.mkdir()
    for i in range(4):
        iio.imwrite(src / f"f_{i:03d}.png",
                    synthetic_frame(64, 80, i / 4)[0])
    out = subprocess.run(
        [sys.executable, "-m", "vidmat.cli", "live", str(src),
         "--pace-fps", "10", "--downsample-ratio", "1.0",
         "--output-alpha", str(tmp_path / "a.mp4")],
        capture_output=True, text=True, timeout=600,
        cwd=str(__import__("pathlib").Path(__file__).
                resolve().parents[2]))
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["processed"] >= 1
    assert stats["processed"] + stats["dropped"] == stats["produced"]


def test_frame_iter_rejects_bad_camera(monkeypatch):
    from vidmat.pipeline import realtime

    class FakeCap:
        def __init__(self, idx):
            pass

        def isOpened(self):
            return False

    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    with pytest.raises(RuntimeError, match="camera"):
        list(realtime._frame_iter(3))


def test_realtime_with_bg_plate():
    """RealtimeMatting serves the clean-plate family (fixed camera setup
    == exactly the pre-captured-plate scenario)."""
    import numpy as np

    from vidmat.config import ModelConfig
    from vidmat.io.fixtures import synthetic_plate_clip
    from vidmat.models.weights import init_params
    from vidmat.pipeline.realtime import RealtimeMatting

    cfg = ModelConfig(use_bg_plate=True)
    clip = list(synthetic_plate_clip(64, 64, 4, seed=6))
    rt = RealtimeMatting(64, 64, model_cfg=cfg,
                         variables=init_params(cfg, seed=1),
                         downsample_ratio=1.0, dtype="float32",
                         bg_plate=clip[0][2])
    stats = rt.run(iter([f for f, _, _ in clip]), pace_fps=1000.0)
    assert stats["processed"] >= 1
    assert stats["produced"] == stats["processed"] + stats["dropped"]
