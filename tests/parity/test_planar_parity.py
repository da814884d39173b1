"""Planar forward path vs MattingNetwork.apply — the planar Pallas
execution of the SAME variables must reproduce the Flax model (float32,
recurrent rollout, both s2d variants). Interpret mode on CPU; compiled on
TPU by bench.py --net=planar."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


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


def test_planar_batched_matches_per_frame():
    """batch_planar_forward (vmapped planar path, the multi-stream serving
    configuration) must be bit-identical to per-stream single-frame calls,
    including the recurrent carry."""
    from vidmat.models.planar import (batch_planar_forward,
                                      planar_init_state_batched)

    cfg = ModelConfig(space_to_depth=2)
    h, w, b = 64, 96, 2
    variables = randomize_bn_stats(init_params(cfg, seed=3), seed=4)
    fwd = build_planar_forward(cfg, h, w, dtype=jnp.float32, interpret=True)
    fb = batch_planar_forward(fwd)

    rng = np.random.RandomState(11)
    state_b = planar_init_state_batched(cfg, b, h, w, jnp.float32)
    states_1 = [planar_init_state(cfg, h, w, jnp.float32) for _ in range(b)]
    with jax.default_matmul_precision("float32"):
        for _ in range(2):  # two steps: carry equality matters
            frames = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
            a_b, f_b, state_b = fb(variables, frames, state_b)
            for i in range(b):
                a1, f1, states_1[i] = fwd(variables, frames[i:i + 1],
                                          states_1[i])
                np.testing.assert_array_equal(np.asarray(a_b[i]),
                                              np.asarray(a1[0]))
                np.testing.assert_array_equal(np.asarray(f_b[i]),
                                              np.asarray(f1[0]))
                for lb, l1 in zip(jax.tree_util.tree_leaves(state_b),
                                  jax.tree_util.tree_leaves(states_1[i])):
                    np.testing.assert_array_equal(np.asarray(lb[i]),
                                                  np.asarray(l1))


def test_planar_bf16_serving_quality_neutral():
    """The serving presets switch conv_impl to planar claiming quality
    neutrality; check it in the SERVING dtype (bf16): planar and Flax
    forwards on the same variables must agree to within bf16 rounding
    over a short recurrent rollout."""
    cfg = ModelConfig(space_to_depth=2)
    h, w = 64, 96
    variables = randomize_bn_stats(init_params(cfg, seed=5), seed=6)
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    fwd = build_planar_forward(cfg, h, w, dtype=jnp.bfloat16,
                               interpret=True)
    state_ref = init_state(cfg, 1, h, w, jnp.bfloat16)
    state_pl = planar_init_state(cfg, h, w, jnp.bfloat16)
    worst = 0.0
    for f, _ in synthetic_clip(h, w, 3, seed=13):
        x = jnp.asarray(f.astype(np.float32) / 255.0)[None]
        a_ref, f_ref, state_ref = net.apply(variables, x, state_ref)
        a_pl, f_pl, state_pl = fwd(variables, x, state_pl)
        worst = max(worst, mad(a_ref, a_pl), mad(f_ref, f_pl))
    # bf16 has ~3 decimal digits; the two paths reassociate differently
    # (folded BN, tap-sum order, matmul upsample), so agreement is to
    # rounding, not bit-exact.
    assert worst <= 2e-2, worst


def test_planar_fused_matches_unfused_across_pitch_regimes():
    """The fused-pair/fused-GRU forward must match the fully unfused
    chain to f32-ulp level in BOTH fit-guard regimes: small pitches
    (every site fused) and a wide frame whose level-0 pitch exceeds the
    fusion halo budget (d0+head and the wide GRU stages fall back to the
    two-call chain — the 480p-geometry loss, docs/PERFORMANCE.md).

    Tolerance note: the fused kernels compute the same values from the
    same operands, but the first conv's matmuls run at a halo-extended N
    dimension, and XLA's CPU dot (interpret mode) reassociates the K
    accumulation differently per shape — measured <=2 f32 ulps
    (~1.2e-7) across a recurrent rollout. The kernel-level unit tests
    pin bit-equality at matched shapes."""
    from vidmat.ops.pallas.planar import conv2_fits, conv3x3_taps

    for h, w in ((48, 64), (32, 1008)):
        cfg = ModelConfig()
        variables = randomize_bn_stats(init_params(cfg, seed=5), seed=6)
        fwd_f = build_planar_forward(cfg, h, w, dtype=jnp.float32,
                                     interpret=True, fuse_pairs=True)
        fwd_u = build_planar_forward(cfg, h, w, dtype=jnp.float32,
                                     interpret=True, fuse_pairs=False)
        st_f = planar_init_state(cfg, h, w, jnp.float32)
        st_u = planar_init_state(cfg, h, w, jnp.float32)
        for f, _ in synthetic_clip(h, w, 2, seed=9):
            x = jnp.asarray(f.astype(np.float32) / 255.0)[None]
            a_f, f_f, st_f = fwd_f(variables, x, st_f)
            a_u, f_u, st_u = fwd_u(variables, x, st_u)
            np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_u),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(f_f), np.asarray(f_u),
                                       atol=1e-6)
    # the wide geometry must actually exercise the fallback regime
    assert not conv2_fits(conv3x3_taps(1008), conv3x3_taps(1008))


def test_planar_forward_matches_flax_size_variants():
    """The planar path must reproduce the Flax model for the shipped size
    variants too (MODEL_SIZES small/large change channel counts — GRU
    features, sublane tiling, and split boundaries all shift)."""
    from vidmat.config import MODEL_SIZES

    for name in ("small", "large"):
        outs = _rollout(MODEL_SIZES[name], 48, 64, frames=2, seed=11)
        worst = max(max(o) for o in outs)
        assert worst <= TOL, f"{name}: per-frame (alpha, fgr) MADs: {outs}"
