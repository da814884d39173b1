"""Serving-body output contracts (stepfactory) — the alpha-only plan.

The packed path is TPU-only in the pipeline (CPU runs the u8-tuple
path), so the contract is pinned here with interpret-mode kernels, and
the real-TPU compile is covered by bench --mode / the driver headline.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): interpret-kernel serving-body
# programs, ~540 s of compile on the 1-core box; the quick tier
# covers the serving body via test_quick_e2e + test_no_retrace.
pytestmark = _pytest_tier.mark.slow


import numpy as np

import jax.numpy as jnp

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import init_params
from vidmat.pipeline.stepfactory import build_serving_body


def test_alpha_only_body_matches_packed_high_byte():
    """alpha_only=True must return exactly the packed word's high byte
    (the quantized alpha), as (N, H, W) uint8 — the 4x-smaller D2H for
    convert_video(output_alpha=...) with no other outputs."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w, ratio = 128, 192, 0.5
    kw = dict(cdtype=jnp.bfloat16, bg=None, pallas_interpret=True,
              use_pallas=True)
    body_p, plan_p = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, **kw)
    body_a, plan_a = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, alpha_only=True, **kw)
    assert plan_p.packed and not plan_p.alpha_only
    assert plan_a.alpha_only

    frame = np.random.RandomState(0).randint(0, 255, (1, h, w, 3),
                                             np.uint8)
    sp = plan_p.make_state(1)
    sa = plan_a.make_state(1)
    packed, _ = body_p(variables, jnp.asarray(frame), sp)
    alpha, _ = body_a(variables, jnp.asarray(frame), sa)
    assert alpha.dtype == jnp.uint8 and alpha.shape == (1, h, w)
    want = (np.asarray(packed) >> 24).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(alpha), want)


def test_alpha_only_ignored_off_packed_paths():
    """alpha_only must be a no-op for float-output / non-pallas bodies
    (their callers consume tuples/floats)."""
    cfg = ModelConfig()
    net = MattingNetwork(cfg, dtype=jnp.float32)
    _, plan = build_serving_body(net, cfg, RefineConfig(), 64, 96, 0.5,
                                 cdtype=jnp.float32, bg=None,
                                 use_pallas=False, alpha_only=True)
    assert not plan.alpha_only and not plan.packed


def test_static_skip_reuses_coeffs_and_counts():
    """static_skip_eps: identical frames take the reuse branch (skip
    counter advances, outputs bit-stable); a changed frame takes the
    compute branch and produces exactly what the plain body produces."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w, ratio = 128, 192, 0.5
    kw = dict(cdtype=jnp.bfloat16, bg=None, pallas_interpret=True,
              use_pallas=True)
    body_s, plan_s = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, static_skip_eps=0.5 / 255,
                                        **kw)
    body_p, plan_p = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        ratio, **kw)
    assert plan_s.static_skip and not plan_p.static_skip

    rng = np.random.RandomState(3)
    f0 = rng.randint(0, 255, (1, h, w, 3), np.uint8)
    f1 = rng.randint(0, 255, (1, h, w, 3), np.uint8)  # a real scene change

    ss = plan_s.make_state(1)
    sp = plan_p.make_state(1)
    outs_s, outs_p = [], []
    for f in (f0, f0, f0, f1):
        o_s, ss = body_s(variables, jnp.asarray(f), ss)
        o_p, sp = body_p(variables, jnp.asarray(f), sp)
        outs_s.append(np.asarray(o_s))
        outs_p.append(np.asarray(o_p))

    # two identical repeats skipped, the scene change computed
    assert int(np.asarray(ss[1][3])) == 2
    # static frames: output is bit-stable across the skipped repeats
    np.testing.assert_array_equal(outs_s[0], outs_s[1])
    np.testing.assert_array_equal(outs_s[1], outs_s[2])
    # first frame and the changed frame ran the same compute branch as
    # the plain body with the same state history — equal to +-1 u8 (the
    # lax.cond region compiles its branch separately, so XLA fuses the
    # GF-coeff math differently at ~1 f32 ulp; measured: 1 byte of 98304
    # off by 1)
    d = (outs_s[0].view(np.uint8).astype(int)
         - outs_p[0].view(np.uint8).astype(int))
    assert np.abs(d).max() <= 1
    assert np.isfinite(np.asarray(ss[1][1], np.float32)).all()

    with np.testing.assert_raises(ValueError):
        plan_s.make_state(2)  # batch-1 feature


def test_static_skip_float_tail_session():
    """The streaming MattingSession (bf16 serving mode, float-output
    tail) gets the static-scene fast path too: identical frames skip the
    net (counter advances, outputs stable), and the carry save/load
    round-trips (the coefficient cache is ephemeral — a resume
    recomputes on its first frame)."""
    import os
    import tempfile

    from vidmat.api import MattingSession
    from vidmat.models.weights import init_params
    from vidmat.pipeline import stepfactory

    # interpret-mode kernels on CPU (the serving path is TPU-only
    # otherwise): patch the builder default like the multistream tests
    orig = stepfactory.build_serving_body

    def patched(*a, **kw):
        kw["pallas_interpret"] = True
        kw.setdefault("use_pallas", True)
        return orig(*a, **kw)

    stepfactory.build_serving_body = patched
    try:
        cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
        sess = MattingSession(128, 192, variables=init_params(cfg),
                              model_cfg=cfg, downsample_ratio=0.5,
                              dtype="bfloat16", static_skip_eps=0.5 / 255)
        st = sess._stepper
        assert st._plan.static_skip
        rng = np.random.RandomState(5)
        f0 = rng.randint(0, 255, (128, 192, 3), np.uint8)
        a0, _ = sess.step(f0)
        a1, _ = sess.step(f0)
        a2, _ = sess.step(f0)
        assert int(np.asarray(st.state[1][3])) == 2
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_array_equal(a0, a1)

        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "carry")
            sess.save_state(p, frame_index=3)
            idx = sess.load_state(p)
        assert idx == 3
        # resume: cache reset forces the compute branch on the next frame
        assert int(np.asarray(st.state[1][3])) == 0
        a3, _ = sess.step(f0)
        assert np.isfinite(a3).all()
    finally:
        stepfactory.build_serving_body = orig


def test_static_skip_need_fgr_keeps_tuple_contract():
    """need_fgr (raw-foreground consumers) forces the u8-tuple output;
    the static-skip body must preserve that contract (the first cut
    returned raw floats and crashed flush's 3-tuple unpack)."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w = 128, 192
    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5,
                                    cdtype=jnp.bfloat16, bg=None,
                                    need_fgr=True, use_pallas=True,
                                    pallas_interpret=True,
                                    static_skip_eps=0.5 / 255)
    assert plan.static_skip and not plan.packed
    f = np.random.RandomState(1).randint(0, 255, (1, h, w, 3), np.uint8)
    outs, st = body(variables, jnp.asarray(f), plan.make_state(1))
    assert isinstance(outs, tuple) and len(outs) == 3
    alpha_u8, fgr_u8, rgba = outs
    assert alpha_u8.dtype == jnp.uint8 and fgr_u8.shape == (1, h, w, 3)
    # and the skip branch keeps the same contract
    outs2, st = body(variables, jnp.asarray(f), st)
    assert isinstance(outs2, tuple) and len(outs2) == 3
    assert int(np.asarray(st[1][3])) == 1


def test_static_skip_drift_bounded_by_reference_frame():
    """The skip delta compares against the frame the cached coefficients
    were computed FROM (not the merely-previous frame): a slow fade with
    sub-eps per-frame steps must still recompute once the cumulative
    drift vs the reference exceeds eps."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w = 128, 192
    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5,
                                    cdtype=jnp.bfloat16, bg=None,
                                    use_pallas=True, pallas_interpret=True,
                                    static_skip_eps=2.0 / 255)
    base = np.random.RandomState(2).randint(0, 200, (1, h, w, 3), np.uint8)
    st = plan.make_state(1)
    # +1 u8 per frame: per-frame delta ~1/255 < eps, cumulative crosses
    # eps=2/255 after ~3 frames — with previous-frame comparison this
    # sequence would never recompute.
    for i in range(6):
        f = (base + np.uint8(i)).astype(np.uint8)
        _, st = body(variables, jnp.asarray(f), st)
    skips = int(np.asarray(st[1][3]))
    assert 0 < skips < 5, skips  # some skipped, but recomputes happened


def test_static_skip_quality_neutral_on_mixed_content():
    """QUALITY gate for the fast path on mixed static/moving content
    (shipped trained weights, ground-truth alpha): per-frame matte
    quality with skipping must match the plain body. Bit-equality is NOT
    expected — the recurrent state freezes across skipped frames (the
    documented caveat), so post-skip frames differ transiently by a few
    u8 — but MAD vs ground truth must stay equal within a third of the
    checkpoint's own error."""
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.models.weights import default_variables

    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = default_variables(cfg)  # checkpoints/fast_demo
    h, w = 128, 192
    kw = dict(cdtype=jnp.bfloat16, bg=None, pallas_interpret=True,
              use_pallas=True)
    body_s, plan_s = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        0.5, static_skip_eps=0.5 / 255,
                                        **kw)
    body_p, plan_p = build_serving_body(net, cfg, RefineConfig(), h, w,
                                        0.5, **kw)

    # 3 held frames (t fixed), then 3 moving frames
    ts = [0.2, 0.2, 0.2, 0.4, 0.6, 0.8]
    clip = [synthetic_frame(h, w, t, seed=4) for t in ts]
    ss, sp = plan_s.make_state(1), plan_p.make_state(1)
    mads_s, mads_p = [], []
    for f, gt in clip:
        fj = jnp.asarray(f[None])
        o_s, ss = body_s(variables, fj, ss)
        o_p, sp = body_p(variables, fj, sp)
        a_s = ((np.asarray(o_s)[0] >> 24) / 255.0).astype(np.float32)
        a_p = ((np.asarray(o_p)[0] >> 24) / 255.0).astype(np.float32)
        mads_s.append(np.abs(a_s - gt[..., 0]).mean())
        mads_p.append(np.abs(a_p - gt[..., 0]).mean())
    assert int(np.asarray(ss[1][3])) == 2  # the two held repeats skipped
    for ms, mp in zip(mads_s, mads_p):
        assert ms <= mp + max(0.3 * mp, 1e-3), (mads_s, mads_p)


def test_chunk_body_bit_exact_vs_per_frame():
    """The chunk-batched dispatch body (stateless work vmapped over the
    K-frame chunk, only the recurrent decoder scanned) must be
    bit-identical to running the per-frame body sequentially — vmapped
    Pallas just adds a grid dimension."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w, k = 128, 192, 3
    body, plan = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5,
                                    cdtype=jnp.bfloat16, bg=None,
                                    use_pallas=True, pallas_interpret=True)
    assert plan.chunk_body is not None

    rng = np.random.RandomState(8)
    frames = jnp.asarray(rng.randint(0, 255, (k, 1, h, w, 3), np.uint8))
    st = plan.make_state(1)
    outs_c, ns_c = plan.chunk_body(variables, frames, st)

    st = plan.make_state(1)
    outs_p = []
    for i in range(k):
        o, st = body(variables, frames[i], st)
        outs_p.append(np.asarray(o))
    np.testing.assert_array_equal(np.asarray(outs_c),
                                  np.stack(outs_p))
    for a, b in zip(ns_c, st):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_body_alpha_only():
    """Chunk-batched + alpha_only: (K, 1, H, W) uint8 output, equal to
    the packed high byte."""
    cfg = ModelConfig(space_to_depth=2, conv_impl="planar")
    net = MattingNetwork(cfg, dtype=jnp.bfloat16)
    variables = init_params(cfg)
    h, w, k = 128, 192, 2
    _, plan_a = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5,
                                   cdtype=jnp.bfloat16, bg=None,
                                   use_pallas=True, pallas_interpret=True,
                                   alpha_only=True)
    _, plan_p = build_serving_body(net, cfg, RefineConfig(), h, w, 0.5,
                                   cdtype=jnp.bfloat16, bg=None,
                                   use_pallas=True, pallas_interpret=True)
    frames = jnp.asarray(np.random.RandomState(9).randint(
        0, 255, (k, 1, h, w, 3), np.uint8))
    outs_a, _ = plan_a.chunk_body(variables, frames, plan_a.make_state(1))
    outs_p, _ = plan_p.chunk_body(variables, frames, plan_p.make_state(1))
    assert outs_a.dtype == jnp.uint8 and outs_a.shape == (k, 1, h, w)
    np.testing.assert_array_equal(
        np.asarray(outs_a), (np.asarray(outs_p) >> 24).astype(np.uint8))
