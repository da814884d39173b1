"""Chunked temporal scan: process K frames per jitted call with lax.scan.

This is the long-context mechanism of the framework (SURVEY.md §5): the
recurrent carry gives O(1) memory over unbounded video, and chunking over K
frames amortizes dispatch while keeping the hidden state on-device between
chunks (the CP/sequence-parallel analog for a recurrent conv net —
SURVEY.md §2.2: true ring/Ulysses attention is N/A, no attention layers).

Inside one chunk the per-frame conv work is inherently sequential through
the GRU, but XLA pipelines the encoder of frame t+1 against the decoder of
frame t within the scan body schedule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vidmat.models.matting_net import MattingNetwork


def make_chunk_step(net: MattingNetwork, cdtype=jnp.float32):
    """Build a jittable chunk step.

    chunk_step(variables, frames, state) -> (alphas, fgrs, new_state)
      frames: (K, N, H, W, 3) float in [0,1] (already ingested/resized)
      state:  RecurrentState for (N, H, W)
    """

    def chunk_step(variables, frames, state):
        frames = frames.astype(cdtype)

        def scan_body(state, x):
            alpha, fgr, new_state = net.apply(variables, x, state)
            return new_state, (alpha, fgr)

        new_state, (alphas, fgrs) = jax.lax.scan(scan_body, state, frames)
        return alphas, fgrs, new_state

    return chunk_step
