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
