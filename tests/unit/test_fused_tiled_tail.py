"""Fused tiled refine tail (VERDICT r2 item 4): the 4K-rung tiling path
runs per-coarse-tile GF stats, feather-blends the COEFFICIENT grids, and
applies the whole-frame fused refine+composite kernel once.

The blend commutes exactly with the pointwise apply (shared guide), so the
fused-tiled output must agree with (a) the unfused tiled XLA reference to
within feather-ramp quantization and (b) the seam-free untiled fused tail
to within a couple of u8 steps — which also bounds any seam artifact."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


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


def test_fused_refine_float_matches_oracle():
    """fused_refine_float (the float-output serving tail) must match the
    XLA coefficient-resize + apply reference within float tolerance."""
    from vidmat.ops.guided_filter import gray_guide
    from vidmat.ops.pallas.refine_kernel import fused_refine_float
    from vidmat.ops.resize import resize_bilinear

    rng = np.random.RandomState(5)
    h, w, pool = 64, 128, 4
    frame = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    a_lr = rng.uniform(-1, 1, (1, h // pool, w // pool, 4)
                       ).astype(np.float32)
    b_lr = rng.uniform(-0.5, 1, (1, h // pool, w // pool, 4)
                       ).astype(np.float32)
    alpha, fgr = fused_refine_float(jnp.asarray(frame), jnp.asarray(a_lr),
                                    jnp.asarray(b_lr), pool=pool,
                                    interpret=True)
    guide = gray_guide(jnp.asarray(frame).astype(jnp.float32) / 255.0)
    A = resize_bilinear(jnp.asarray(a_lr), h, w)
    B = resize_bilinear(jnp.asarray(b_lr), h, w)
    out = A * guide + B
    np.testing.assert_allclose(np.asarray(alpha),
                               np.clip(np.asarray(out[..., 0:1]), 0, 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fgr),
                               np.clip(np.asarray(out[..., 1:4]), 0, 1),
                               atol=1e-5)


def test_float_tail_in_serving_body_matches_xla_tail():
    """The float-output serving body with the fused float tail (interpret
    kernels) must track the pure-XLA float body on the same weights.

    Trained weights + synthetic content: random weights on noise park the
    fgr field at the clip boundaries where the guided-filter stats are
    ill-conditioned (eps-dominated), amplifying the benign area-pool vs
    bilinear coarse-guide difference between the two paths."""
    import os

    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "checkpoints", "synthetic_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("demo checkpoint not present")
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.models.weights import load_checkpoint

    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = load_checkpoint(ckpt, template=init_params(cfg))
    h = w = 128
    refine = RefineConfig(mode="guided")
    body_k, plan_k = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, float_output=True)
    body_x, plan_x = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=False, float_output=True)
    frame, _ = synthetic_frame(h, w, 0.4, seed=7)
    f = jnp.asarray(frame)[None]
    (a_k, f_k), _ = jax.jit(body_k)(v, f, plan_k.make_state(1))
    (a_x, f_x), _ = jax.jit(body_x)(v, f, plan_x.make_state(1))
    da = np.abs(np.asarray(a_k) - np.asarray(a_x))
    df = np.abs(np.asarray(f_k) - np.asarray(f_x))
    # Round-5 root cause of the old 0.0072-mean divergence (VERDICT r4
    # item 8; tools/analyze_tail_divergence.py): the two paths
    # downsampled the coarse frame DIFFERENTLY — fused ingest area-pools,
    # the XLA fallback bilinear-sampled (aliasing at pool=4). With the
    # ingest monkeypatched to bilinear the bodies agreed to 1.8e-8 mean,
    # attributing 100% of the divergence to the ingest semantics; the
    # fused tail arithmetic was tight all along. Fix: the XLA fallback
    # now area-pools at integer pools (stepfactory.ingest_x) — also the
    # better (antialiased) downsample, and what TPU serving always ran.
    # Residual bound: the kernel pools via MXU matmuls, XLA via
    # reshape-mean — f32 summation-order ulps amplified by the net's
    # edge sensitivity (measured mean 3.9e-4, max 6.6e-3 on the r4
    # checkpoint); gate restored 1e-2 -> 1.5e-3 mean, tighter than the
    # original 2e-3.
    assert da.max() < 2e-2 and da.mean() < 1.5e-3, (da.max(), da.mean())
    assert df.max() < 2e-2 and df.mean() < 1.5e-3, (df.max(), df.mean())


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


def test_matting_session_tiled_matches_direct_body():
    """MattingSession(tile_size=...) serves the tiled float tail: its
    output must be EXACTLY what build_serving_body constructs with the
    same tile geometry (the session is pure plumbing over the factory),
    and stay in the same ballpark as the untiled session — the tight
    tiled-vs-untiled agreement is pinned separately with the packed tail
    (test_fused_tiled_tail_matches_references); with random weights the
    float paths only get a loose mean bound here."""
    import vidmat

    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 256
    sess_t = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg,
                                   downsample_ratio=0.25, tile_size=64,
                                   tile_overlap=16)
    sess_u = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg,
                                   downsample_ratio=0.25)
    body, plan = build_serving_body(
        net, cfg, RefineConfig(mode="guided"), h, w, 0.25,
        cdtype=jnp.float32, bg=None, use_pallas=False, float_frames=True,
        float_output=True, tile_size=64, tile_overlap=16)
    state = plan.make_state(1)

    from vidmat.io.fixtures import synthetic_frame

    for i in range(2):
        f, _ = synthetic_frame(h, w, i / 2, seed=3)
        a_t, f_t = sess_t.step(f)
        a_u, f_u = sess_u.step(f)
        fj = jnp.asarray(f.astype(np.float32) / 255.0)[None]
        (a_d, f_d), state = jax.jit(body)(v, fj, state)
        np.testing.assert_array_equal(a_t, np.asarray(a_d)[0])
        np.testing.assert_array_equal(f_t, np.asarray(f_d)[0])
        assert np.abs(a_t - a_u).mean() < 1e-2
        assert np.abs(f_t - f_u).mean() < 1e-2
