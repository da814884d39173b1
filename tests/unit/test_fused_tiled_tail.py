"""Fused tiled refine tail (VERDICT r2 item 4): the 4K-rung tiling path
runs per-coarse-tile GF stats, feather-blends the COEFFICIENT grids, and
applies the whole-frame fused refine+composite kernel once.

The blend commutes exactly with the pointwise apply (shared guide), so the
fused-tiled output must agree with (a) the unfused tiled XLA reference to
within feather-ramp quantization and (b) the seam-free untiled fused tail
to within a couple of u8 steps — which also bounds any seam artifact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import init_params
from vidmat.ops.pallas.composite_kernel import unpack_rgba_host
from vidmat.pipeline.stepfactory import build_serving_body


def test_fused_tiled_tail_matches_references():
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 256
    ratio = 0.25
    refine = RefineConfig(mode="guided")

    body_ft, plan_ft = build_serving_body(
        net, cfg, refine, h, w, ratio, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, tile_size=64,
        tile_overlap=16)
    assert plan_ft.packed, "tiled rung must take the fused packed tail"
    body_ref, plan_ref = build_serving_body(
        net, cfg, refine, h, w, ratio, cdtype=jnp.float32, bg=None,
        use_pallas=False, tile_size=64, tile_overlap=16)
    body_unt, _ = build_serving_body(
        net, cfg, refine, h, w, ratio, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True)

    rng = np.random.RandomState(0)
    f = jnp.asarray(rng.randint(0, 255, (1, h, w, 3), np.uint8))

    packed, _ = jax.jit(body_ft)(v, f, plan_ft.make_state(1))
    alpha_ft = unpack_rgba_host(np.asarray(packed))[..., 3].astype(int)
    (alpha_u8, _, _), _ = jax.jit(body_ref)(v, f, plan_ref.make_state(1))
    alpha_ref = np.asarray(alpha_u8)[..., 0].astype(int)
    packed_u, _ = jax.jit(body_unt)(v, f, plan_ft.make_state(1))
    alpha_unt = unpack_rgba_host(np.asarray(packed_u))[..., 3].astype(int)

    d_ref = np.abs(alpha_ft - alpha_ref)
    assert d_ref.max() <= 6 and d_ref.mean() < 0.3, (d_ref.max(),
                                                     d_ref.mean())
    d_unt = np.abs(alpha_ft - alpha_unt)
    assert d_unt.max() <= 3 and d_unt.mean() < 0.05, (d_unt.max(),
                                                      d_unt.mean())


def test_pool_misaligned_tiling_raises():
    """Tile geometry that does not align with the coarse pool is invalid
    on every tiled path (fused and unfused alike) — it must fail loudly
    at trace time, not silently fuse with wrong geometry."""
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    refine = RefineConfig(mode="guided")
    # overlap 18 is not divisible by pool 4
    body, plan = build_serving_body(
        net, cfg, refine, 256, 256, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, tile_size=64,
        tile_overlap=18)
    v = init_params(cfg)
    f = jnp.asarray(np.random.RandomState(1).randint(
        0, 255, (1, 256, 256, 3), np.uint8))
    with pytest.raises(ValueError, match="align with the coarse pool"):
        jax.jit(body)(v, f, plan.make_state(1))
