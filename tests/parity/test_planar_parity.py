"""Planar forward path vs MattingNetwork.apply — the planar Pallas
execution of the SAME variables must reproduce the Flax model (float32,
recurrent rollout, both s2d variants). Interpret mode on CPU; compiled on
TPU by bench.py --net=planar."""

import numpy as np

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_clip
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.planar import build_planar_forward, planar_init_state
from vidmat.models.weights import init_params, randomize_bn_stats
from vidmat.utils.metrics import mad

TOL = 2e-4  # f32 everywhere; BN folding reassociates, bilinear glue rounds


def _rollout(cfg, h, w, frames=3, seed=0):
    variables = randomize_bn_stats(init_params(cfg, seed=seed), seed=1)
    net = MattingNetwork(cfg)
    fwd = build_planar_forward(cfg, h, w, dtype=jnp.float32, interpret=True)

    state_ref = init_state(cfg, 1, h, w) if cfg.recurrent else None
    state_pl = (planar_init_state(cfg, h, w, jnp.float32)
                if cfg.recurrent else None)
    outs = []
    with jax.default_matmul_precision("float32"):
        for f, _ in synthetic_clip(h, w, frames, seed=7):
            x = jnp.asarray(f.astype(np.float32) / 255.0)[None]
            a_ref, f_ref, state_ref = net.apply(variables, x, state_ref)
            a_pl, f_pl, state_pl = fwd(variables, x, state_pl)
            outs.append((mad(a_ref, a_pl), mad(f_ref, f_pl)))
    return outs


def test_planar_forward_matches_flax_s2d1():
    outs = _rollout(ModelConfig(), 48, 64)
    worst = max(max(o) for o in outs)
    assert worst <= TOL, f"per-frame (alpha, fgr) MADs: {outs}"


def test_planar_forward_matches_flax_s2d2():
    outs = _rollout(ModelConfig(space_to_depth=2), 64, 96)
    worst = max(max(o) for o in outs)
    assert worst <= TOL, f"per-frame (alpha, fgr) MADs: {outs}"
