"""Trimap-conditioned VIDEO matting (DIM-lineage family, video rung).

The reference tree was empty at survey time (SURVEY.md §0); trimap
conditioning is pinned by BASELINE.json:7 ("+ trimap if required") and
extended here from the single-image rung to the full video pipeline:
per-frame trimaps ride the serving step as a 4th uint8 channel.
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import vidmat
from vidmat.config import ModelConfig, RefineConfig
from vidmat.io.fixtures import synthetic_frame
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import init_params
from vidmat.pipeline.stepfactory import build_serving_body
from vidmat.train.data import alpha_to_trimap

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "checkpoints",
    "trimap_demo")


def _clip_with_trimaps(h, w, n, seed=0):
    frames, trimaps, gts = [], [], []
    for i in range(n):
        frame, gt = synthetic_frame(h, w, i / max(n, 1), seed=seed)
        tri = alpha_to_trimap(gt)  # float {0, 0.5, 1}, (H, W, 1)
        frames.append(frame)
        trimaps.append(np.round(tri[..., 0] * 255).astype(np.uint8))
        gts.append(gt)
    return frames, trimaps, gts


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="trimap checkpoint not present")
def test_trimap_video_quality(tmp_path):
    """convert_video with per-frame trimaps mattes a held-out synthetic
    clip with the shipped trimap_demo weights (model_cfg auto-selected
    from trimap_source)."""
    import imageio.v3 as iio

    h, w, n = 96, 128, 4
    frames, trimaps, gts = _clip_with_trimaps(h, w, n, seed=123)
    pat = str(tmp_path / "a_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat,
                             trimap_source=trimaps,
                             downsample_ratio=1.0)
    assert m["frames"] == n
    mads = []
    for i in range(n):
        a = iio.imread(pat % i).astype(np.float32) / 255.0
        mads.append(np.abs(a - gts[i][..., 0]).mean())
    assert max(mads) < 0.02, mads


def test_trimap_clamps_alpha(tmp_path):
    """The matte is clamped to the trimap's definite regions: fg bytes
    (255) force alpha 255, bg bytes (0) force 0 — even with random
    weights (the clamp is part of the model family's contract)."""
    import imageio.v3 as iio

    h, w, n = 64, 64, 2
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)
    frames, _, _ = _clip_with_trimaps(h, w, n, seed=7)
    # All-fg trimap for frame 0, all-bg for frame 1.
    trimaps = [np.full((h, w), 255, np.uint8), np.zeros((h, w), np.uint8)]
    pat = str(tmp_path / "c_%03d.png")
    vidmat.convert_video(frames, output_alpha=pat, trimap_source=trimaps,
                         downsample_ratio=1.0, model_cfg=cfg, variables=v)
    assert (iio.imread(pat % 0) == 255).all()
    assert (iio.imread(pat % 1) == 0).all()


def test_trimap_serving_body_fused_vs_tuple():
    """The fused packed Pallas tail (interpret mode) on 4-channel trimap
    frames matches the u8-tuple path bit-near-exactly: both share the
    SAME Pallas ingest and net forward, isolating the RGB slices feeding
    the guide/tail (the trimap byte must never leak into the composite)."""
    from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

    cfg = ModelConfig(use_trimap=True, recurrent=False)
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h = w = 128
    refine = RefineConfig(mode="guided")

    body_k, plan_k = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True)
    assert plan_k.packed
    body_t, plan_t = build_serving_body(
        net, cfg, refine, h, w, 0.25, cdtype=jnp.float32, bg=None,
        use_pallas=True, pallas_interpret=True, need_fgr=True)
    assert not plan_t.packed

    frame, gt = synthetic_frame(h, w, 0.4, seed=5)
    tri = np.round(alpha_to_trimap(gt)[..., 0] * 255).astype(np.uint8)
    f4 = jnp.asarray(np.concatenate([frame, tri[..., None]], -1))[None]

    packed, _ = jax.jit(body_k)(v, f4, plan_k.make_state(1))
    rgba_k = unpack_rgba_host(np.asarray(packed)).astype(int)
    (_, _, rgba_t), _ = jax.jit(body_t)(v, f4, plan_t.make_state(1))
    rgba_t = np.asarray(rgba_t).astype(int)
    d = np.abs(rgba_k - rgba_t)
    assert d.max() <= 1, (d.max(), d.mean())
    # (No definite-region assertion here: with RANDOM weights the guided
    # upsample's window at the tiny coarse grid legitimately bleeds the
    # unclamped unknown band into clamped regions. The clamp contract is
    # pinned at ratio 1.0 in test_trimap_clamps_alpha and with trained
    # weights in test_trimap_video_quality.)


def test_trimap_matches_image_stepper_per_frame():
    """Video trimap serving (XLA fp32 body, ratio 1.0) equals the
    single-image trimap path frame-for-frame: recurrent=False means the
    video rung IS per-frame inference, so the two public surfaces must
    agree on identical inputs/weights."""
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    net = MattingNetwork(cfg)
    v = init_params(cfg)
    h, w = 64, 96
    body, plan = build_serving_body(
        net, cfg, RefineConfig(), h, w, 1.0, cdtype=jnp.float32, bg=None,
        use_pallas=False, float_output=True)

    from vidmat.pipeline.stepper import ImageStepper

    stepper = ImageStepper(cfg, variables=v)
    for i in range(2):
        frame, gt = synthetic_frame(h, w, i / 2, seed=21)
        tri = np.round(alpha_to_trimap(gt)[..., 0] * 255).astype(np.uint8)
        f4 = jnp.asarray(np.concatenate([frame, tri[..., None]], -1))[None]
        (alpha_v, _), _ = jax.jit(body)(v, f4, plan.make_state(1))
        alpha_i, _ = stepper(frame, tri)  # uint8 trimap -> /255, same path
        np.testing.assert_allclose(np.asarray(alpha_v)[0], alpha_i,
                                   atol=2e-5)


def test_trimap_streaming_session():
    """MattingSession supports the trimap family: step(frame, trimap)
    with a trimap-conditioned config equals the single-image path
    (recurrent=False — per-frame inference)."""
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)
    h, w = 64, 96
    sess = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg)

    from vidmat.pipeline.stepper import ImageStepper

    stepper = ImageStepper(cfg, variables=v)
    frame, gt = synthetic_frame(h, w, 0.3, seed=13)
    tri = np.round(alpha_to_trimap(gt)[..., 0] * 255).astype(np.uint8)
    alpha_s, _ = sess.step(frame, trimap=tri)
    alpha_i, _ = stepper(frame, tri)
    np.testing.assert_allclose(alpha_s, alpha_i, atol=2e-5)

    with pytest.raises(ValueError, match="trimap"):
        sess.step(frame)


def test_trimap_video_errors():
    h, w = 64, 64
    frames = [np.zeros((h, w, 3), np.uint8)] * 3
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)

    with pytest.raises(ValueError, match="trimap_source"):
        vidmat.convert_video(frames, model_cfg=cfg, variables=v,
                             downsample_ratio=1.0)
    with pytest.raises(ValueError, match="not trimap-conditioned"):
        vidmat.convert_video(frames, model_cfg=ModelConfig(),
                             variables=init_params(ModelConfig()),
                             trimap_source=[np.zeros((h, w), np.uint8)] * 3,
                             downsample_ratio=1.0)
    with pytest.raises(ValueError, match="trimap stream ended"):
        vidmat.convert_video(frames, model_cfg=cfg, variables=v,
                             trimap_source=[np.zeros((h, w), np.uint8)],
                             downsample_ratio=1.0)
    with pytest.raises(ValueError, match="must match the input"):
        vidmat.convert_video(
            frames, model_cfg=cfg, variables=v,
            trimap_source=[np.zeros((h // 2, w), np.uint8)] * 3,
            downsample_ratio=1.0)


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="trimap checkpoint not present")
def test_cli_video_trimap(tmp_path):
    import json as _json
    import subprocess
    import sys

    import imageio.v3 as iio

    h, w, n = 96, 128, 3
    frames, trimaps, gts = _clip_with_trimaps(h, w, n, seed=42)
    for i, t in enumerate(trimaps):
        iio.imwrite(str(tmp_path / f"tri_{i:03d}.png"), t)
    from vidmat.io.writer import VideoWriter

    src = str(tmp_path / "in.mp4")
    vw = VideoWriter(src, fps=10)
    for f in frames:
        vw.write(f)
    vw.close()
    out = subprocess.run(
        [sys.executable, "-m", "vidmat.cli", "video", src,
         "--output-alpha", str(tmp_path / "a_%03d.png"),
         "--trimap", str(tmp_path / "tri_%03d.png"),
         "--downsample-ratio", "1.0"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
    assert out.returncode == 0, out.stderr[-2000:]
    stats = _json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["frames"] == n
    a = iio.imread(str(tmp_path / "a_000.png")).astype(np.float32) / 255.0
    # mp4 recompression perturbs the input; the trimap still pins the
    # definite regions, so the matte must track gt loosely.
    assert np.abs(a - gts[0][..., 0]).mean() < 0.05


def test_session_rejects_trimap_on_non_trimap_model():
    """Passing trimap= to a session built with a non-trimap config must
    raise (it would otherwise be silently ignored — inconsistent with
    convert_video and ServingBundle, which both raise)."""
    h, w = 64, 64
    cfg = ModelConfig()
    sess = vidmat.MattingSession(h, w, variables=init_params(cfg),
                                 model_cfg=cfg, downsample_ratio=1.0)
    with pytest.raises(ValueError, match="not trimap-conditioned"):
        sess.step(np.zeros((h, w, 3), np.uint8),
                  trimap=np.zeros((h, w), np.uint8))
