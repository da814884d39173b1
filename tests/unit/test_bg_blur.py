"""Portrait-mode background blur (stepfactory ``bg_blur``): the foreground
is composited over a blurred version of the source frame.

The background is synthesized at the COARSE grid (box blur of the ingested
frame) and bilinearly upsampled — on the fused packed tail the upsample
happens INSIDE the refine kernel (bg_mode='coarse', the same banded
matmuls as the coefficient grids), so the full-res background never
materializes in HBM. These tests pin:
  - the kernel's coarse-bg mode against the XLA resize+composite oracle
  - the fused serving body against the unfused XLA body (same semantics)
  - per-frame bg isolation in the batched (chunk / multistream) form
  - the VMEM estimator with the coarse-bg resident block
"""

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


def test_fused_coarse_bg_kernel_vs_oracle():
    """bg_mode='coarse' of fused_refine_composite: in-kernel bilinear
    upsample of the coarse background must match the XLA resize_bilinear
    + composite reference to quantization (the banded matrices implement
    the same half-pixel, edge-clamped semantics)."""
    from vidmat.ops.guided_filter import gray_guide
    from vidmat.ops.pallas.refine_kernel import fused_refine_composite
    from vidmat.ops.resize import resize_bilinear

    rng = np.random.RandomState(7)
    h, w, pool, n = 64, 128, 4, 2
    frame = rng.randint(0, 255, (n, h, w, 3), np.uint8)
    a_lr = rng.uniform(-1, 1, (n, h // pool, w // pool, 4)
                       ).astype(np.float32)
    b_lr = rng.uniform(-0.5, 1, (n, h // pool, w // pool, 4)
                       ).astype(np.float32)
    bgc = rng.uniform(0, 1, (n, h // pool, w // pool, 3)).astype(np.float32)

    packed = fused_refine_composite(
        jnp.asarray(frame), jnp.asarray(a_lr), jnp.asarray(b_lr),
        bg=jnp.asarray(bgc), pool=pool, interpret=True)
    rgba = unpack_rgba_host(np.asarray(packed)).astype(np.int32)

    guide = gray_guide(jnp.asarray(frame).astype(jnp.float32) / 255.0)
    A = resize_bilinear(jnp.asarray(a_lr), h, w)
    B = resize_bilinear(jnp.asarray(b_lr), h, w)
    out = A * guide + B
    alpha = jnp.clip(out[..., 0:1], 0.0, 1.0)
    fgr = jnp.clip(out[..., 1:4], 0.0, 1.0)
    bg_up = jnp.clip(resize_bilinear(jnp.asarray(bgc), h, w), 0.0, 1.0)
    rgb = fgr * alpha + bg_up * (1.0 - alpha)
    want_rgb = np.round(np.clip(np.asarray(rgb), 0, 1) * 255).astype(int)
    want_a = np.round(np.asarray(alpha[..., 0]) * 255).astype(int)

    assert np.abs(rgba[..., :3] - want_rgb).max() <= 1
    assert np.abs(rgba[..., 3] - want_a).max() <= 1


def test_coarse_bg_is_per_frame():
    """The coarse background is vmapped with the batch: each frame must
    blend against ITS OWN background (the chunk-batched and multistream
    forms depend on this)."""
    from vidmat.ops.pallas.refine_kernel import fused_refine_composite

    h, w, pool, n = 32, 64, 4, 2
    frame = np.zeros((n, h, w, 3), np.uint8)
    # alpha == 0 everywhere (a = 0, b = 0) -> output is exactly the bg.
    a_lr = np.zeros((n, h // pool, w // pool, 4), np.float32)
    b_lr = np.zeros((n, h // pool, w // pool, 4), np.float32)
    bgc = np.zeros((n, h // pool, w // pool, 3), np.float32)
    bgc[0, ..., 0] = 1.0  # frame 0: red bg
    bgc[1, ..., 2] = 1.0  # frame 1: blue bg

    packed = fused_refine_composite(
        jnp.asarray(frame), jnp.asarray(a_lr), jnp.asarray(b_lr),
        bg=jnp.asarray(bgc), pool=pool, interpret=True)
    rgba = unpack_rgba_host(np.asarray(packed))
    assert (rgba[0, ..., 0] == 255).all() and (rgba[0, ..., 2] == 0).all()
    assert (rgba[1, ..., 2] == 255).all() and (rgba[1, ..., 0] == 0).all()


def test_bg_blur_body_fused_vs_float_tail():
    """The in-kernel coarse-bg upsample (packed fused body) must match
    the XLA-composited float-tail body bit-near-exactly: need_fgr=True
    shares the SAME Pallas ingest and net forward and upsamples the
    blurred background with resize_bilinear instead — isolating exactly
    the in-kernel vs XLA upsample+blend difference (same half-pixel
    semantics, so only quantization may differ)."""
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 128
    refine = RefineConfig(mode="guided")

    body_k, plan_k = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, bg_blur=8)
    assert plan_k.packed
    body_f, plan_f = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, bg_blur=8, need_fgr=True)
    assert not plan_f.packed

    rng = np.random.RandomState(3)
    f = jnp.asarray(rng.randint(0, 255, (1, h, w, 3), np.uint8))
    packed, _ = jax.jit(body_k)(v, f, plan_k.make_state(1))
    rgba_k = unpack_rgba_host(np.asarray(packed)).astype(int)
    (_, _, rgba_f), _ = jax.jit(body_f)(v, f, plan_f.make_state(1))
    rgba_f = np.asarray(rgba_f).astype(int)

    d = np.abs(rgba_k - rgba_f)
    assert d.max() <= 1, (d.max(), d.mean())


def test_bg_blur_body_fused_vs_xla_synthetic():
    """Cross-path sanity on real (synthetic-fixture) content: the fused
    body and the pure-XLA body blur slightly different coarse frames
    (area-pool vs bilinear ingest), so agreement is loose-but-bounded on
    structured content (the noise-frame worst case is excluded by
    construction of the feature: backgrounds are smooth after the blur)."""
    from vidmat.io.fixtures import synthetic_frame

    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 128
    refine = RefineConfig(mode="guided")
    body_k, plan_k = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, bg_blur=8)
    body_x, plan_x = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=False, bg_blur=8)

    frame, _ = synthetic_frame(h, w, 0.3, seed=11)
    f = jnp.asarray(frame)[None]
    packed, _ = jax.jit(body_k)(v, f, plan_k.make_state(1))
    rgba_k = unpack_rgba_host(np.asarray(packed)).astype(int)
    (_, _, rgba_x), _ = jax.jit(body_x)(v, f, plan_x.make_state(1))
    rgba_x = np.asarray(rgba_x).astype(int)

    d = np.abs(rgba_k - rgba_x)
    assert d.mean() < 1.5 and d.max() <= 16, (d.max(), d.mean())


def test_bg_blur_background_region_is_blurred():
    """Semantics: where alpha ~= 0 the composition must be the blurred
    source, not the source — high-frequency background texture loses
    variance; where alpha ~= 1 the foreground stays sharp (equal to the
    no-bg premultiplied output)."""
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 128
    pool = 4
    refine = RefineConfig(mode="guided")
    body, plan = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, bg_blur=12)

    # Checkerboard texture: near-zero mean change under an 8px-coarse
    # blur window, large pointwise change.
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((xx // 2 + yy // 2) % 2 * 255).astype(np.uint8)
    frame = np.stack([checker] * 3, axis=-1)[None]
    packed, _ = jax.jit(body)(v, jnp.asarray(frame), plan.make_state(1))
    rgba = unpack_rgba_host(np.asarray(packed)).astype(np.float32)

    alpha = rgba[0, ..., 3] / 255.0
    bg_mask = alpha < 0.05
    assert bg_mask.mean() > 0.2, "random-weight net should leave bg regions"
    src = frame[0, ..., 0].astype(np.float32)
    comp = rgba[0, ..., 0]
    # Pointwise the blurred background must sit far from the 0/255
    # checker values while its local mean stays near the source's.
    mid = np.abs(comp[bg_mask] - 127.5)
    assert np.median(mid) < 40, "background was not blurred"
    assert np.abs(comp[bg_mask].mean() - src[bg_mask].mean()) < 20


def test_bg_blur_chunk_body_matches_per_frame():
    """The chunk-batched dispatch body (batched encoder + scanned decoder
    + batched tail) must blend each chunk frame against ITS OWN blurred
    background, bit-exactly matching a per-frame scan of the plain body."""
    cfg = ModelConfig(conv_impl="planar")
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 64
    refine = RefineConfig(mode="guided")
    body, plan = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, bg_blur=6)
    assert plan.chunk_body is not None

    rng = np.random.RandomState(9)
    k = 3
    frames = jnp.asarray(rng.randint(0, 255, (k, 1, h, w, 3), np.uint8))

    state = plan.make_state(1)
    outs = []
    for i in range(k):
        out, state = body(v, frames[i], state)
        outs.append(np.asarray(out))
    per_frame = np.stack(outs)

    chunk_out, _ = plan.chunk_body(v, frames, plan.make_state(1))
    np.testing.assert_array_equal(np.asarray(chunk_out), per_frame)


def test_bg_blur_excludes_other_bg():
    cfg = ModelConfig()
    net = MattingNetwork(cfg)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_serving_body(net, cfg, RefineConfig(), 64, 64, 0.25,
                           bg=jnp.asarray((0.0, 1.0, 0.0)), bg_blur=8)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_serving_body(net, cfg, RefineConfig(), 64, 64, 0.25,
                           bg=None, bg_dynamic=True, bg_blur=8)


def test_refine_tiles_fit_with_coarse_bg():
    """VMEM sizing: the coarse bg adds a tile-independent resident block
    (3/8 of one coefficient grid) — the estimate must grow, the ladder
    geometries must still fit, and the pool=2-at-4K overflow must still
    be refused."""
    from vidmat.ops.pallas.refine_kernel import (pick_refine_tiles,
                                                 refine_tiles_fit)

    # 1080p pool=4 and 4K pool=8: fused path with bg_blur must fit.
    assert refine_tiles_fit(1088, 1920, 272, 480, has_bg_coarse=True)
    assert refine_tiles_fit(2176, 3840, 272, 480, has_bg_coarse=True)
    # pool=2 at 4K could never fit; the bg block must not flip that.
    assert not refine_tiles_fit(2176, 3840, 1088, 1920, has_bg_coarse=True)
    # The estimator accounts for the bg block: with it, the picked tile
    # must be <= the plain tile at a geometry near the budget edge.
    th0, wc0 = pick_refine_tiles(2176, 3840, 272, 480)
    th1, wc1 = pick_refine_tiles(2176, 3840, 272, 480, has_bg_coarse=True)
    assert th1 * wc1 <= th0 * wc0
