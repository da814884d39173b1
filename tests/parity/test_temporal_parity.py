"""Temporal parity (BASELINE.json:8): run the recurrent loop for many frames
on both implementations and compare per-frame — recurrent drift compounds,
so checking only the final frame would hide it (SURVEY.md §4/§7)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


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
# The pinned ladder rung is 100 frames @ 480p (BASELINE.json:8); spatial
# size is reduced to ~480p/4 (128x224, /16-aligned) for CI budget — drift
# is a function of the recurrent chain LENGTH, which runs at full 100
# frames.
H, W, FRAMES = 128, 224, 100


def test_temporal_parity_per_frame_100():
    cfg = ModelConfig()
    variables = randomize_bn_stats(init_params(cfg, seed=0), seed=1)
    oracle = TorchMattingNetwork(cfg)
    load_into_torch(oracle, variables)
    net = MattingNetwork(cfg)

    frames = [f for f, _ in synthetic_clip(H, W, FRAMES, seed=3)]

    # JAX loop (chunked scan, chunk=10 to also exercise chunk boundaries).
    chunk_step = jax.jit(make_chunk_step(net))
    state = init_state(cfg, 1, H, W)
    j_alphas = []
    with jax.default_matmul_precision("float32"):
        for s in range(0, FRAMES, 10):
            batch = np.stack([f.astype(np.float32) / 255.0
                              for f in frames[s:s + 10]])[:, None]
            alphas, fgrs, state = chunk_step(variables, jnp.asarray(batch),
                                             state)
            j_alphas.extend(np.asarray(alphas)[:, 0])

    # Torch per-frame loop.
    t_state = None
    t_alphas = []
    for f in frames:
        x = torch.from_numpy(f.astype(np.float32) / 255.0
                             ).permute(2, 0, 1)[None]
        with torch.no_grad():
            a, _, t_state = oracle(x, t_state)
        t_alphas.append(a[0].permute(1, 2, 0).numpy())

    per_frame = [mad(j, t) for j, t in zip(j_alphas, t_alphas)]
    if max(per_frame) > TOL:
        curve = " ".join(f"{v:.1e}" for v in per_frame)
        raise AssertionError(
            f"max per-frame alpha MAD {max(per_frame):.2e} at frame "
            f"{int(np.argmax(per_frame))} (tol {TOL:.0e}); drift curve:\n"
            f"{curve}")


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
