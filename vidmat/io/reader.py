"""Host-side video/image decode with a prefetch ring.

The codec work (container demux + entropy decode) has no TPU equivalent and
stays on host (SURVEY.md §2.1); everything after "decoded RGB bytes" runs
on-device. To keep the chip fed at 1080p (>200 fps target, BASELINE.json:5)
decode runs on a background thread pushing into a bounded queue — the device
loop never blocks on the decoder in steady state (SURVEY.md §7 "feeding the
chip").

Fault handling (SURVEY.md §5 failure detection): a corrupt frame is skipped
and reported; the pipeline holds the last temporal state rather than
aborting the stream.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Union

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover - cv2 is present in the target image
    _HAS_CV2 = False


def read_image(path: str) -> np.ndarray:
    """Read an image file -> (H, W, 3) uint8 RGB (or (H, W) for grayscale
    trimaps)."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3 and img.shape[-1] == 4:
            img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
        elif img.ndim == 3:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return img
    import imageio.v3 as iio

    return iio.imread(path)


class VideoReader:
    """Iterates (H, W, 3) uint8 RGB frames from a video file."""

    def __init__(self, path: str):
        if not _HAS_CV2:
            raise RuntimeError("cv2 unavailable; pass a frame iterator "
                               "instead of a path")
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise FileNotFoundError(path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        self.cap.release()

    def close(self) -> None:
        self.cap.release()


_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def image_sequence(path: str):
    """Frame iterator over an image sequence, or None when ``path`` does
    not name one. Accepted forms (the symmetric counterparts of
    VideoWriter's PNG-sequence output modes):

      - a directory of image files (sorted by name)
      - a printf-style pattern (``frames/alpha_%05d.png``)
      - a glob (``frames/*.png``)

    Frames with an alpha channel are delivered as RGB (the matte input
    contract); grayscale images are broadcast to 3 channels."""
    import glob as _glob
    import os
    import re

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if os.path.splitext(f)[1].lower() in _IMG_EXTS)
    elif "%" in os.path.basename(path):
        # Honor the pattern's declared numbering: lexicographic sort
        # scrambles unpadded %d sequences (1, 10, 11, 2, ...), so sort by
        # the integer the %d field captured instead.
        m = re.search(r"%0?\d*d", path)
        rx = re.compile(re.escape(path[:m.start()]) + r"(\d+)"
                        + re.escape(path[m.end():]) + "$")
        matched = []
        for p in _glob.glob(re.sub(r"%0?\d*d", "*", path)):
            mm = rx.match(p)
            if mm:
                matched.append((int(mm.group(1)), p))
        files = [p for _, p in sorted(matched)]
    elif any(ch in path for ch in "*?["):
        files = sorted(_glob.glob(path))
    else:
        return None
    if not files:
        return None

    def gen():
        for p in files:
            img = read_image(p)
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            yield np.ascontiguousarray(img[..., :3])

    return gen()


class FrameSource:
    """Threaded prefetching frame source over any frame iterable.

    Concurrency model (SURVEY.md §5 race detection): a single producer
    thread and a bounded queue; no shared mutable state beyond the queue —
    the handoff is the synchronization point.

    ``fault_hook`` (testing): callable(frame_idx, frame) -> frame | raise;
    used to inject decode faults (SURVEY.md §5 fault injection).

    ``start``/``count`` trim the stream: the first ``start`` frames are
    decoded but not delivered (sequential skip — exact, unlike container
    keyframe seeking), and delivery stops after ``count`` frames.
    """

    _END = object()

    def __init__(self, frames: Union[str, Iterable[np.ndarray]],
                 prefetch: int = 8, fault_hook=None,
                 start: int = 0, count: Optional[int] = None):
        if isinstance(frames, str):
            seq = image_sequence(frames)
            if seq is not None:
                self.fps = 30.0
                self.frames: Iterable[np.ndarray] = seq
            else:
                reader = VideoReader(frames)
                self.fps = reader.fps
                self.frames = reader
        else:
            self.fps = 30.0
            self.frames = frames
        self.q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.fault_hook = fault_hook
        self.dropped = 0
        if start < 0 or (count is not None and count < 0):
            raise ValueError("start/count must be non-negative")
        self._start = start
        self._count = count
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self) -> None:
        delivered = 0
        try:
            for i, frame in enumerate(self.frames):
                if i < self._start:
                    continue
                if self._count is not None and delivered >= self._count:
                    break
                if self.fault_hook is not None:
                    try:
                        frame = self.fault_hook(i, frame)
                    except Exception:
                        self.dropped += 1
                        continue  # skip corrupt frame, keep stream alive
                self.q.put(frame)
                delivered += 1
        finally:
            self.q.put(self._END)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            item = self.q.get()
            if item is self._END:
                break
            yield item
