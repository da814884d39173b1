"""Real-time (live) serving driver: latest-wins frame scheduling.

Offline conversion (pipeline.video) processes EVERY frame — correct for
files, wrong for a live feed: when the producer (camera / capture
thread) outpaces the serving step, queueing frames only grows latency
without bound. Live serving wants the FRESHEST frame; stale ones should
be dropped, and the drop count reported. (The reference tree was empty
at survey time — SURVEY.md §0; repos of its shape ship a webcam/live
demo on exactly this policy [DOMAIN].)

This driver adds that policy around the shared serving step:

- a **1-slot latest-wins mailbox** between the capture thread and the
  device loop — `put` overwrites, overwritten frames count as dropped;
  no shared mutable state beyond the lock-guarded slot (SURVEY.md §5
  race-detection disposition: queue/mailbox handoffs only);
- the serving step is :class:`vidmat.pipeline.stepper.VideoStepper`
  (the stepfactory body — fused ingest/planar/tail kernels on TPU),
  composition computed on device from the stepper's device outputs
  (no extra D2H round-trip);
- a **pacing harness** so a file can stand in for a camera: the
  producer sleeps frames onto the mailbox at ``pace_fps``.

Camera sources: pass an integer (cv2.VideoCapture device index). File
paths, image-sequence dirs/patterns, and frame iterables work the same
way minus the hardware.
"""

from __future__ import annotations

import threading
import time
from typing import Iterable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from vidmat.config import ModelConfig


class LatestMailbox:
    """One-slot handoff: `put` overwrites (counting the overwritten frame
    as dropped); `get` blocks for a fresh item or channel close."""

    _CLOSED = object()

    def __init__(self) -> None:
        self._cond = threading.Condition()
        self._item = None
        self._fresh = False
        self._closed = False
        self.dropped = 0
        self.produced = 0

    def put(self, item) -> None:
        with self._cond:
            if self._closed:
                raise RuntimeError("mailbox is closed")
            if self._fresh:
                self.dropped += 1
            self._item = item
            self._fresh = True
            self.produced += 1
            self._cond.notify()

    def close(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()

    def get(self, timeout: Optional[float] = None):
        """Newest item, or None when the channel is closed and drained."""
        with self._cond:
            if not self._cond.wait_for(
                    lambda: self._fresh or self._closed, timeout=timeout):
                raise TimeoutError("no frame arrived within timeout")
            if not self._fresh:
                return None  # closed and drained
            self._fresh = False
            return self._item


def _frame_iter(source: Union[int, str, Iterable[np.ndarray]]):
    """Resolve a live source: camera index -> cv2 capture; path -> video/
    image-sequence reader; otherwise assume an iterable of frames."""
    if isinstance(source, int) or (isinstance(source, str)
                                   and source.isdigit()):
        import cv2

        cap = cv2.VideoCapture(int(source))
        if not cap.isOpened():
            raise RuntimeError(f"cannot open camera {source}")

        def gen():
            # try/finally: the consumer may abandon the generator early
            # (max_frames / stop event) — GeneratorExit must still release
            # the capture device.
            try:
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            finally:
                cap.release()

        return gen()
    if isinstance(source, str):
        from vidmat.io.reader import VideoReader, image_sequence

        seq = image_sequence(source)
        return seq if seq is not None else iter(VideoReader(source))
    return iter(source)


class RealtimeMatting:
    """Live matting session with latest-wins scheduling.

    >>> rt = RealtimeMatting(192, 256)
    >>> stats = rt.run(frames, output_composition="live.mp4",
    ...                pace_fps=30.0)
    >>> stats["dropped"], stats["achieved_fps"]
    """

    def __init__(self, height: int, width: int,
                 model_cfg: Optional[ModelConfig] = None,
                 variables=None, downsample_ratio: float = 1.0,
                 dtype: str = "bfloat16",
                 static_skip_eps: Optional[float] = None,
                 bg_color=(0.0, 1.0, 0.0),
                 bg_plate=None):
        from vidmat.pipeline.stepper import VideoStepper

        if bg_plate is not None and model_cfg is None:
            # clean-plate family (BGMv2 lineage): a fixed camera setup is
            # exactly the live-serving case a pre-captured plate fits
            from vidmat.models.weights import plate_default_config

            model_cfg = plate_default_config()
        # Sources come at native size; serve on the /16-padded bucket and
        # crop outputs (same convention as pipeline.video).
        self.h, self.w = height, width
        self._ph = height + ((-height) % 16)
        self._pw = width + ((-width) % 16)
        self._stepper = VideoStepper(
            model_cfg or ModelConfig(), self._ph, self._pw,
            variables=variables,
            downsample_ratio=downsample_ratio, dtype=dtype,
            static_skip_eps=static_skip_eps, bg_plate=bg_plate)
        bg = jnp.asarray(bg_color, jnp.float32)
        h, w = height, width

        @jax.jit
        def _finish(alpha, fgr):
            from vidmat.ops.composite import composite_rgba

            comp = composite_rgba(fgr, alpha, bg)[:, :h, :w, :3]
            a8 = jnp.round(jnp.clip(alpha[:, :h, :w, 0], 0.0, 1.0)
                           * 255.0).astype(jnp.uint8)
            return a8, comp

        self._finish = _finish

    def reset(self) -> None:
        self._stepper.reset()

    def run(self, source: Union[int, str, Iterable[np.ndarray]], *,
            output_alpha: Optional[str] = None,
            output_composition: Optional[str] = None,
            pace_fps: Optional[float] = None,
            max_frames: Optional[int] = None,
            fps_hint: float = 30.0,
            frame_timeout: float = 30.0,
            warmup: bool = True,
            on_frame=None) -> dict:
        """Serve a live source until it ends (or ``max_frames`` outputs).

        pace_fps: producer pacing for file-backed simulation of a camera
        (None = produce as fast as the source decodes — a camera is
        naturally paced, a file is not). on_frame(alpha_u8, comp_u8)
        is called per PROCESSED frame. warmup (default True) compiles
        the serving step on a dummy frame BEFORE the producer starts —
        otherwise the latest-wins mailbox silently drops the feed's
        opening seconds while XLA compiles (measured: a 12-frame unpaced
        source lost 11 frames to first-step compile). Returns the stats
        dict: produced / processed / dropped, achieved_fps, p50/p99 step
        latency ms.
        """
        from vidmat.io.writer import VideoWriter

        if warmup:
            zero = np.zeros((self._ph, self._pw, 3), np.uint8)
            a_d, f_d = self._stepper.step_device(zero)
            jax.block_until_ready(self._finish(a_d, f_d))
            self._stepper.reset()  # the dummy frame must not taint state

        box = LatestMailbox()
        stop = threading.Event()

        def produce():
            try:
                t_next = time.perf_counter()
                for frame in _frame_iter(source):
                    if stop.is_set():
                        break
                    if pace_fps:
                        t_next += 1.0 / pace_fps
                        delay = t_next - time.perf_counter()
                        if delay > 0:
                            time.sleep(delay)
                    box.put(np.ascontiguousarray(frame))
            finally:
                box.close()

        producer = threading.Thread(target=produce, daemon=True)
        writers = []
        w_alpha = w_comp = None
        if output_alpha:
            w_alpha = VideoWriter(output_alpha, fps=fps_hint)
            writers.append(w_alpha)
        if output_composition:
            w_comp = VideoWriter(output_composition, fps=fps_hint)
            writers.append(w_comp)

        lat = []
        processed = 0
        t_start = time.perf_counter()
        producer.start()
        try:
            while max_frames is None or processed < max_frames:
                frame = box.get(timeout=frame_timeout)
                if frame is None:
                    break  # source ended
                if frame.shape[:2] != (self.h, self.w):
                    raise ValueError(
                        f"live frame is {frame.shape[:2]}, session was "
                        f"built for {(self.h, self.w)}")
                t0 = time.perf_counter()
                if (self._ph, self._pw) != (self.h, self.w):
                    from vidmat.io.native import pad_stack

                    frame = pad_stack([frame], self._ph, self._pw)[0]
                alpha_d, fgr_d = self._stepper.step_device(frame)
                a8, comp = self._finish(alpha_d, fgr_d)
                a8 = np.asarray(a8)[0]
                comp = np.asarray(comp)[0]
                lat.append(time.perf_counter() - t0)
                processed += 1
                if w_alpha is not None:
                    w_alpha.write(a8)
                if w_comp is not None:
                    w_comp.write(comp)
                if on_frame is not None:
                    on_frame(a8, comp)
        finally:
            stop.set()
            # Drain the slot so a paced producer blocked in put() never is
            # (put never blocks on a mailbox — it overwrites), then join.
            producer.join(timeout=frame_timeout)
            for wtr in writers:
                wtr.close()

        wall = time.perf_counter() - t_start
        lat_arr = np.asarray(lat) if lat else np.zeros(1)
        return {
            "produced": box.produced,
            "processed": processed,
            "dropped": box.dropped,
            "achieved_fps": processed / wall if wall > 0 else 0.0,
            "p50_ms": float(np.percentile(lat_arr, 50) * 1e3),
            "p99_ms": float(np.percentile(lat_arr, 99) * 1e3),
            "wall_s": wall,
        }
