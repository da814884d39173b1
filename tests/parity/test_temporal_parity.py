"""Temporal parity (BASELINE.json:8): run the recurrent loop for many frames
on both implementations and compare per-frame — recurrent drift compounds,
so checking only the final frame would hide it (SURVEY.md §4/§7)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_clip
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.torch_oracle import TorchMattingNetwork
from vidmat.models.weights import (init_params, load_into_torch,
                                   randomize_bn_stats)
from vidmat.pipeline.scan import make_chunk_step
from vidmat.utils.metrics import mad

TOL = 1e-3
H, W, FRAMES = 96, 112, 24  # small spatial, enough frames to surface drift


def test_temporal_parity_per_frame():
    cfg = ModelConfig()
    variables = randomize_bn_stats(init_params(cfg, seed=0), seed=1)
    oracle = TorchMattingNetwork(cfg)
    load_into_torch(oracle, variables)
    net = MattingNetwork(cfg)

    frames = [f for f, _ in synthetic_clip(H, W, FRAMES, seed=3)]

    # JAX loop (chunked scan, chunk=6 to also exercise chunk boundaries).
    chunk_step = jax.jit(make_chunk_step(net))
    state = init_state(cfg, 1, H, W)
    j_alphas = []
    with jax.default_matmul_precision("float32"):
        for s in range(0, FRAMES, 6):
            batch = np.stack([f.astype(np.float32) / 255.0
                              for f in frames[s:s + 6]])[:, None]
            alphas, fgrs, state = chunk_step(variables, jnp.asarray(batch),
                                             state)
            j_alphas.extend(np.asarray(alphas)[:, 0])

    # Torch per-frame loop.
    t_state = None
    t_alphas = []
    for f in frames:
        x = torch.from_numpy(f.astype(np.float32) / 255.0
                             ).permute(2, 0, 1)[None]
        a, _, t_state = oracle(x, t_state)
        t_alphas.append(a[0].permute(1, 2, 0).numpy())

    per_frame = [mad(j, t) for j, t in zip(j_alphas, t_alphas)]
    assert max(per_frame) <= TOL, (
        f"max per-frame alpha MAD {max(per_frame):.2e} at "
        f"frame {int(np.argmax(per_frame))}; first/last "
        f"{per_frame[0]:.2e}/{per_frame[-1]:.2e}")


def test_state_reset_isolation():
    """Resetting state must reproduce the cold-start output exactly —
    per-stream reset is the failure-recovery primitive (SURVEY.md §5)."""
    cfg = ModelConfig()
    variables = init_params(cfg, seed=5)
    net = MattingNetwork(cfg)
    chunk_step = jax.jit(make_chunk_step(net))

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.rand(4, 1, 64, 64, 3).astype(np.float32))

    s0 = init_state(cfg, 1, 64, 64)
    a1, _, state = chunk_step(variables, frames, s0)
    # warm state differs from cold
    a2, _, _ = chunk_step(variables, frames, state)
    assert mad(np.asarray(a1), np.asarray(a2)) > 0
    # reset reproduces cold start bit-for-bit
    a3, _, _ = chunk_step(variables, frames, init_state(cfg, 1, 64, 64))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a3))
