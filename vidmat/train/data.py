"""Training data: synthetic clip batcher (offline environment — SURVEY.md §4).

Real-data training would plug a video-dataset reader into the same iterator
contract: yields (clips (T,N,H,W,3), gt_alpha (T,N,H,W,1), gt_fgr (T,N,H,W,3))
float32 batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from vidmat.io.fixtures import synthetic_frame


def synthetic_clip_batches(t: int = 4, n: int = 2, h: int = 64, w: int = 64,
                           seed: int = 0
                           ) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]]:
    """Endless iterator of synthetic training batches with exact gt alpha."""
    rng = np.random.RandomState(seed)
    while True:
        clips = np.zeros((t, n, h, w, 3), np.float32)
        alphas = np.zeros((t, n, h, w, 1), np.float32)
        fgrs = np.zeros((t, n, h, w, 3), np.float32)
        for b in range(n):
            s = int(rng.randint(0, 10000))
            t0 = rng.rand()
            for ti in range(t):
                frame, alpha = synthetic_frame(h, w, t0 + ti / 30.0, seed=s)
                clips[ti, b] = frame.astype(np.float32) / 255.0
                alphas[ti, b] = alpha
                # exact foreground: frame where alpha>0 (disk color blend)
                fgrs[ti, b] = clips[ti, b]
        yield clips, alphas, fgrs


def alpha_to_trimap(alpha: np.ndarray, band: float = 0.08,
                    lo: float = 0.05, hi: float = 0.95) -> np.ndarray:
    """Derive a {0, 0.5, 1} trimap from ground-truth alpha: definite fg/bg
    where alpha is saturated, unknown in a dilated band around the edge.

    band: fraction of the short side used as the unknown-band dilation
    radius (distance-free approximation via box dilation).
    """
    a = alpha[..., 0] if alpha.ndim == 3 else alpha
    h, w = a.shape
    r = max(1, int(band * min(h, w)))
    unknown = (a > lo) & (a < hi)
    # box-dilate the unknown band with a cumulative-sum trick
    pad = np.pad(unknown.astype(np.int32), r)
    ii = pad.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    s = (ii[2 * r + 1:, 2 * r + 1:] - ii[:-2 * r - 1, 2 * r + 1:]
         - ii[2 * r + 1:, :-2 * r - 1] + ii[:-2 * r - 1, :-2 * r - 1])
    dilated = s[:h, :w] > 0
    tri = np.where(a >= hi, 1.0, 0.0).astype(np.float32)
    tri[dilated] = 0.5
    return tri[..., None]


def synthetic_trimap_batches(t: int = 1, n: int = 2, h: int = 64,
                             w: int = 64, seed: int = 0):
    """Batches for the trimap-conditioned model: clips carry a 4th input
    channel with the {0, 0.5, 1} trimap derived from gt alpha."""
    for clips, alphas, fgrs in synthetic_clip_batches(t, n, h, w, seed):
        tri = np.stack([
            np.stack([alpha_to_trimap(alphas[ti, b]) for b in range(n)])
            for ti in range(t)])
        clips4 = np.concatenate([clips, tri], axis=-1)
        yield clips4, alphas, fgrs
