"""Host-side encode: alpha / foreground / composite stream writers.

Encode runs on a background thread fed by a bounded queue so D2H transfer
and video encode overlap with device compute (SURVEY.md L0/L4 layers).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Optional

import numpy as np

try:
    import cv2
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def write_image(path: str, image: np.ndarray) -> None:
    """Write (H, W, {1,3,4}) uint8 or float [0,1] image."""
    img = image
    if img.dtype != np.uint8:
        img = np.round(np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    if _HAS_CV2:
        if img.ndim == 3:
            code = cv2.COLOR_RGBA2BGRA if img.shape[-1] == 4 else cv2.COLOR_RGB2BGR
            img = cv2.cvtColor(img, code)
        cv2.imwrite(path, img)
    else:
        import imageio.v3 as iio

        iio.imwrite(path, img)


class VideoWriter:
    """Threaded frame-stream writer; frames are (H, W, C) uint8 RGB/gray.

    Output target by path shape:
      *.mp4 / *.avi ...   — video container via cv2
      a directory, or a pattern containing '%' (e.g. out/alpha_%05d.png)
      — numbered image sequence (the research-repo-style export [DOMAIN])
    """

    _END = object()

    def __init__(self, path: str, fps: float = 30.0, queue_size: int = 16):
        self.path = path
        self.fps = fps
        self._seq_pattern: Optional[str] = None
        if "%" in path:
            self._seq_pattern = path
        elif os.path.splitext(path)[1].lower() in ("", ".d") or \
                os.path.isdir(path):
            self._seq_pattern = os.path.join(path, "%05d.png")
        elif os.path.splitext(path)[1].lower() in (".png", ".jpg", ".jpeg",
                                                   ".webp"):
            base, ext = os.path.splitext(path)
            self._seq_pattern = f"{base}_%05d{ext}"
        if self._seq_pattern is None and not _HAS_CV2:
            raise RuntimeError("cv2 unavailable for video encode")
        self._n = 0
        self._writer: Optional["cv2.VideoWriter"] = None
        self.q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._thread = threading.Thread(target=self._consume, daemon=True)
        self._error: Optional[Exception] = None
        self._thread.start()

    def _open(self, h: int, w: int) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        self._writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))

    def _consume(self) -> None:
        try:
            while True:
                frame = self.q.get()
                if frame is VideoWriter._END:
                    break
                if self._seq_pattern is not None:
                    p = self._seq_pattern % self._n
                    os.makedirs(os.path.dirname(os.path.abspath(p)),
                                exist_ok=True)
                    write_image(p, frame)  # PNG keeps the alpha channel
                    self._n += 1
                    continue
                if frame.ndim == 2:
                    frame = np.repeat(frame[..., None], 3, axis=-1)
                if frame.shape[-1] == 4:
                    frame = frame[..., :3]
                if self._writer is None:
                    self._open(frame.shape[0], frame.shape[1])
                self._writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        except Exception as e:  # surfaced on close()
            self._error = e

    def write(self, frame: np.ndarray) -> None:
        if frame.dtype != np.uint8:
            frame = np.round(np.clip(frame, 0.0, 1.0) * 255.0).astype(np.uint8)
        self.q.put(frame)

    def close(self) -> None:
        self.q.put(VideoWriter._END)
        self._thread.join()
        if self._writer is not None:
            self._writer.release()
        if self._error is not None:
            raise self._error
