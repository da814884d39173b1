"""Canonical trimap normalization shared by every serving surface.

One definition of the byte convention (uint8 {0, 128, 255} == float
{0, 0.5, 1} for bg/unknown/fg) so the streaming stepper
(pipeline/stepper.py), the offline pipeline (pipeline/video.py), and the
AOT bundle loader (deploy.py) cannot drift — they previously carried
three near-copies of this block with diverging validation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class PreTrimmedTrimaps:
    """Marker wrapper: a per-frame trimap iterable ALREADY trimmed to the
    run's [start_frame, start_frame + max_frames) window.

    The pipeline trims a raw trimap_source itself so frame i pairs with
    trimap i; adapters that derive trimaps from another stream (the
    mask_source path) trim the RAW stream first and convert only the
    delivered frames — this wrapper tells the pipeline not to trim
    again (double-trimming would misalign the pairing)."""

    def __init__(self, frames):
        self.frames = frames

    def __iter__(self):
        return iter(self.frames)


def canon_trimap_u8(tri: np.ndarray, hw: Tuple[int, int],
                    frame_idx: Optional[int] = None) -> np.ndarray:
    """Validate and normalize a user trimap to the (H, W) uint8 canon.

    Accepts (H, W) / (H, W, 1) / (H, W, 3) (a trimap stored as video
    decodes 3-channel; the first channel is taken), uint8 {0, 128, 255}
    or float {0, 0.5, 1}. Raises on a resolution mismatch with ``hw``.
    """
    tri = np.asarray(tri)
    if tri.ndim == 3:
        tri = tri[..., 0]
    if tri.ndim != 2 or tri.shape != tuple(hw):
        at = "" if frame_idx is None else f" frame {frame_idx}"
        raise ValueError(
            f"trimap{at} is {tri.shape}, input frame is {tuple(hw)} — "
            "trimaps must match the input resolution frame-for-frame")
    if tri.dtype != np.uint8:
        tri = np.round(np.clip(tri.astype(np.float32), 0.0, 1.0)
                       * 255.0).astype(np.uint8)
    return tri
