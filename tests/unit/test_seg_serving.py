"""Segmentation inference surface (VERDICT r3 item 5): the co-trained
seg head served end-to-end — stepfactory output_seg body, planar tap,
MattingSession(output='seg'), convert_video(output_segmentation=...)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.models.weights import init_params, randomize_bn_stats


def test_planar_seg_tap_matches_flax():
    """models/planar.py output='seg' executes the same variables as
    MattingNetwork(seg_pass=True) — logits equal at fp32, state advances
    identically (the shared-trunk contract)."""
    from vidmat.models.matting_net import MattingNetwork, init_state
    from vidmat.models.planar import build_planar_forward, planar_init_state

    for s2d in (1, 2):
        cfg = ModelConfig(space_to_depth=s2d)
        v = randomize_bn_stats(init_params(cfg, seed=3, with_seg=True),
                               seed=4)
        h = w = 64
        frame = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
        net = MattingNetwork(cfg)
        with jax.default_matmul_precision("float32"):
            seg_ref, none_ref, ns_ref = net.apply(
                v, jnp.asarray(frame), init_state(cfg, 1, h, w),
                seg_pass=True)
        fwd = build_planar_forward(cfg, h, w, dtype=jnp.float32,
                                   interpret=True, output="seg")
        seg_p, none_p, ns_p = fwd(v, jnp.asarray(frame),
                                  planar_init_state(cfg, h, w, jnp.float32))
        assert none_ref is None and none_p is None
        np.testing.assert_allclose(np.asarray(seg_p), np.asarray(seg_ref),
                                   atol=1e-4)


def test_seg_session_surface():
    """MattingSession(output='seg'): (H, W, 1) float32 probability in
    [0, 1], fgr slot None, temporal state carried (a second step from a
    warmed state differs from a cold one on the recurrent family)."""
    from vidmat.api import MattingSession

    cfg = ModelConfig()
    v = init_params(cfg, seed=7, with_seg=True)
    sess = MattingSession(64, 64, variables=v, model_cfg=cfg, output="seg")
    rng = np.random.RandomState(1)
    f0 = rng.randint(0, 255, (64, 64, 3), np.uint8)
    f1 = rng.randint(0, 255, (64, 64, 3), np.uint8)
    m0, fg = sess.step(f0)
    assert fg is None and m0.shape == (64, 64, 1)
    assert m0.dtype == np.float32 and 0.0 <= m0.min() and m0.max() <= 1.0
    warm = sess.step(f1)[0]
    sess.reset()
    sess.step(f1)
    cold = sess.step(f1)[0]
    assert not np.allclose(warm, cold)  # the GRU state is load-bearing


def test_seg_session_refuses_matting_checkpoint():
    """A matting-only checkpoint (no seg_head) must be refused loudly at
    construction, not fail deep inside apply."""
    from vidmat.api import MattingSession

    cfg = ModelConfig()
    v = init_params(cfg, seed=7)  # no seg_head
    with pytest.raises(ValueError, match="seg_head"):
        MattingSession(64, 64, variables=v, model_cfg=cfg, output="seg")


def test_convert_video_segmentation_output(tmp_path):
    """convert_video(output_segmentation=...) writes a mask video 1:1
    with the input frames, and refuses to combine with matting outputs."""
    import cv2

    import vidmat
    from vidmat.io.fixtures import synthetic_frames_only

    cfg = ModelConfig()
    v = init_params(cfg, seed=5, with_seg=True)
    frames = list(synthetic_frames_only(64, 96, 5))
    out = str(tmp_path / "seg.mp4")
    m = vidmat.convert_video(frames, output_segmentation=out,
                             variables=v, model_cfg=cfg,
                             downsample_ratio=1.0)
    assert m["frames"] == 5
    cap = cv2.VideoCapture(out)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 5

    with pytest.raises(ValueError, match="separate"):
        vidmat.convert_video(frames, output_segmentation=out,
                             output_alpha=str(tmp_path / "a.mp4"),
                             variables=v, model_cfg=cfg)


def test_seg_checkpoint_quality_gate():
    """The shipped co-trained checkpoint must segment held-out clips at
    IoU >= 0.95 through the PUBLIC seg surface, with the matting output
    not regressed (the co-training bargain)."""
    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "checkpoints", "seg_demo")
    if not os.path.isdir(ckpt):
        pytest.skip("seg_demo checkpoint not present")
    from vidmat.api import MattingSession
    from vidmat.io.fixtures import synthetic_clip
    from vidmat.utils.metrics import mad

    cfg = ModelConfig()
    seg = MattingSession(96, 96, model_cfg=cfg, output="seg")
    from vidmat.models.weights import seg_default_variables

    mat = MattingSession(96, 96, variables=seg_default_variables(cfg),
                         model_cfg=cfg)
    ious, mads = [], []
    for f, gt in synthetic_clip(96, 96, 10, seed=24680):
        mask, _ = seg.step(f)
        pred = mask[..., 0] > 0.5
        gtb = gt[..., 0] > 0.5
        ious.append((pred & gtb).sum() / max((pred | gtb).sum(), 1))
        mads.append(mad(mat.step(f)[0], gt))
    assert np.mean(ious) >= 0.95, np.mean(ious)
    assert np.mean(mads) < 0.01, np.mean(mads)


def test_seg_checkpoint_hard_suite_gate():
    """Hard-suite seg gates on seeds DISJOINT from the report seeds
    (VERDICT r4 item 2): (a) the co-trained head must segment the
    EXTENDED hard suite (io/fixtures HARD2 — pan, hair, occluder,
    noise, shutter blur, exposure drift, JPEG); the r4 head measured
    IoU 0.49 here, the r5 co-train from the hard-trained trunk 0.87.
    (b) The co-trained trunk's matting must stay within a bounded
    factor of the BASE checkpoint on the same clip (the co-training
    bargain, pinned relative so it tracks base improvements; measured
    ratio ~4.2x)."""
    ckpt = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "checkpoints", "seg_demo")
    base_ckpt = os.path.join(os.path.dirname(ckpt), "synthetic_demo")
    if not (os.path.isdir(ckpt) and os.path.isdir(base_ckpt)):
        pytest.skip("seg_demo/base checkpoints not present")
    from vidmat.api import MattingSession
    from vidmat.io.fixtures import HARD2, synthetic_clip, synthetic_hard_clip
    from vidmat.models.weights import seg_default_variables
    from vidmat.utils.metrics import mad

    cfg = ModelConfig()
    seg_vars = seg_default_variables(cfg)
    ious = []
    seg_mads, base_mads = [], []
    for seed in (31415, 271828):
        seg = MattingSession(96, 96, model_cfg=cfg, output="seg")
        mat = MattingSession(96, 96, variables=seg_vars, model_cfg=cfg)
        base = MattingSession(96, 96, model_cfg=cfg)  # auto-loads base
        for f, gt in synthetic_hard_clip(96, 96, 8, seed=seed, **HARD2):
            mask, _ = seg.step(f)
            pred = mask[..., 0] > 0.5
            gtb = gt[..., 0] > 0.5
            ious.append((pred & gtb).sum() / max((pred | gtb).sum(), 1))
        for f, gt in synthetic_clip(96, 96, 8, seed=seed):
            seg_mads.append(mad(mat.step(f)[0], gt))
            base_mads.append(mad(base.step(f)[0], gt))
    assert np.mean(ious) >= 0.80, np.mean(ious)
    ratio = np.mean(seg_mads) / max(np.mean(base_mads), 1e-6)
    assert ratio < 8.0, (np.mean(seg_mads), np.mean(base_mads))
