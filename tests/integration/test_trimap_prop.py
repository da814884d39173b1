"""Trimap PROPAGATION (recurrent trimap family, checkpoints/trimap_prop_demo).

The reference tree was empty at survey time (SURVEY.md §0); trimap
conditioning is pinned by BASELINE.json:7 and temporal propagation by
BASELINE.json:8. This family combines them: the user annotates a KEYFRAME
trimap (frame 0), later frames ride an all-unknown (0.5) trimap, and the
ConvGRU carries the constraint forward — trained by
tools/train_eval.py --trimap keyframe/mixed (train/data.py keyframe mode).
"""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import os

import numpy as np
import pytest

import vidmat
from vidmat.config import ModelConfig
from vidmat.io.fixtures import synthetic_frame
from vidmat.models.weights import init_params
from vidmat.train.data import alpha_to_trimap

CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "checkpoints",
    "trimap_prop_demo")


def _clip(h, w, n, seed=0):
    frames, gts = [], []
    for i in range(n):
        frame, gt = synthetic_frame(h, w, i / max(n, 1), seed=seed)
        frames.append(frame)
        gts.append(gt)
    return frames, gts


def test_default_checkpoint_selection():
    """The registry resolves each trimap family to its own checkpoint:
    per-frame (non-recurrent, s2d=1) -> trimap_demo, propagation
    (recurrent, s2d=2) -> trimap_prop_demo; the unshipped combinations
    resolve to None."""
    from vidmat.models.weights import default_checkpoint_path

    per_frame = default_checkpoint_path(
        ModelConfig(use_trimap=True, recurrent=False))
    prop = default_checkpoint_path(
        ModelConfig(use_trimap=True, space_to_depth=2))
    if per_frame is not None:
        assert per_frame.endswith("trimap_demo")
    if prop is not None:
        assert prop.endswith("trimap_prop_demo")
    # Unshipped: recurrent trimap at s2d=1, non-recurrent at s2d=2.
    assert default_checkpoint_path(
        ModelConfig(use_trimap=True, space_to_depth=1)) is None
    assert default_checkpoint_path(
        ModelConfig(use_trimap=True, space_to_depth=2,
                    recurrent=False)) is None


def test_single_trimap_detection(tmp_path):
    """_single_trimap: a bare array or single image file is a KEYFRAME;
    streams (lists, dirs/patterns, video paths) are not."""
    import imageio.v3 as iio

    from vidmat.pipeline.video import _single_trimap

    tri = np.full((32, 32), 128, np.uint8)
    assert _single_trimap(tri) is tri
    p = str(tmp_path / "key.png")
    iio.imwrite(p, tri)
    loaded = _single_trimap(p)
    assert loaded is not None and loaded.shape[:2] == (32, 32)
    assert _single_trimap([tri, tri]) is None
    assert _single_trimap(str(tmp_path / "tris")) is None  # not a file
    assert _single_trimap(str(tmp_path / "t_%03d.png")) is None


def test_keyframe_requires_recurrent():
    frames, gts = _clip(64, 64, 2, seed=3)
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    with pytest.raises(ValueError, match="keyframe"):
        vidmat.convert_video(frames, model_cfg=cfg,
                             variables=init_params(cfg),
                             trimap_source=np.full((64, 64), 128, np.uint8),
                             downsample_ratio=1.0)


def test_stream_end_continuation(tmp_path):
    """A trimap stream shorter than the input CONTINUES on all-unknown
    trimaps for the recurrent family (sparse annotation), instead of the
    per-frame family's lockstep error."""
    import imageio.v3 as iio

    h, w, n = 64, 64, 4
    frames, gts = _clip(h, w, n, seed=11)
    cfg = ModelConfig(use_trimap=True, space_to_depth=2)
    v = init_params(cfg)
    tris = [np.round(alpha_to_trimap(gts[i])[..., 0] * 255
                     ).astype(np.uint8) for i in range(2)]  # 2 of 4
    pat = str(tmp_path / "a_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat, model_cfg=cfg,
                             variables=v, trimap_source=tris,
                             downsample_ratio=1.0)
    assert m["frames"] == n
    assert os.path.exists(pat % (n - 1))


def test_session_neutral_autofill():
    """MattingSession with the recurrent trimap family: trimap=None
    auto-fills all-unknown (the propagation convention) and must equal an
    explicit neutral trimap bit-for-bit; the keyframe step changes the
    carried state (the constraint actually propagates)."""
    h, w = 64, 64
    cfg = ModelConfig(use_trimap=True, space_to_depth=2)
    v = init_params(cfg)
    frames, gts = _clip(h, w, 3, seed=5)
    tri0 = np.round(alpha_to_trimap(gts[0])[..., 0] * 255).astype(np.uint8)

    sess_a = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg)
    sess_b = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg)
    a0, _ = sess_a.step(frames[0], trimap=tri0)
    b0, _ = sess_b.step(frames[0],
                        trimap=np.full((h, w), 128, np.uint8))
    a1, _ = sess_a.step(frames[1])  # None -> neutral autofill
    b1, _ = sess_b.step(frames[1], trimap=np.full((h, w), 128, np.uint8))
    # Same inputs after frame 0 but different frame-0 trimaps: the
    # explicit-neutral twin must match the autofill twin only when the
    # keyframes match — here they differ, so states must differ.
    assert not np.allclose(a1, b1)

    sess_c = vidmat.MattingSession(h, w, variables=v, model_cfg=cfg)
    c0, _ = sess_c.step(frames[0], trimap=tri0)
    c1, _ = sess_c.step(frames[1], trimap=np.full((h, w), 128, np.uint8))
    np.testing.assert_array_equal(a0, c0)
    np.testing.assert_array_equal(a1, c1)


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="trimap_prop checkpoint not present")
def test_keyframe_propagation_quality(tmp_path):
    """convert_video with a SINGLE keyframe trimap (model_cfg
    auto-selected) mattes a held-out synthetic clip: the GRU propagates
    the frame-0 annotation across the remaining frames."""
    import imageio.v3 as iio

    h, w, n = 96, 96, 6
    frames, gts = _clip(h, w, n, seed=987)
    key = np.round(alpha_to_trimap(gts[0])[..., 0] * 255).astype(np.uint8)
    pat = str(tmp_path / "a_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat, trimap_source=key,
                             downsample_ratio=1.0)
    assert m["frames"] == n
    mads = [np.abs(iio.imread(pat % i).astype(np.float32) / 255.0
                   - gts[i][..., 0]).mean() for i in range(n)]
    assert float(np.mean(mads)) < 0.02, mads


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="trimap_prop checkpoint not present")
def test_perframe_trimaps_on_prop_family(tmp_path):
    """The mixed-trained propagation checkpoint also serves per-frame
    trimap streams (model_cfg forced to the recurrent family)."""
    import imageio.v3 as iio

    h, w, n = 96, 96, 4
    frames, gts = _clip(h, w, n, seed=654)
    tris = [np.round(alpha_to_trimap(g)[..., 0] * 255).astype(np.uint8)
            for g in gts]
    cfg = ModelConfig(use_trimap=True, space_to_depth=2)
    pat = str(tmp_path / "a_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat, model_cfg=cfg,
                             trimap_source=tris, downsample_ratio=1.0)
    assert m["frames"] == n
    mads = [np.abs(iio.imread(pat % i).astype(np.float32) / 255.0
                   - gts[i][..., 0]).mean() for i in range(n)]
    assert float(np.mean(mads)) < 0.02, mads


def test_trimap_batches_keyframe_modes():
    """train/data.py keyframe modes: 'only' gives frame 0 its trimap and
    all-0.5 after; 'off' gives every frame its own; 'mixed' yields both
    batch kinds."""
    from vidmat.train.data import synthetic_trimap_batches

    t, n, h, w = 3, 2, 32, 32
    it = synthetic_trimap_batches(t=t, n=n, h=h, w=w, seed=4,
                                  keyframe="only")
    clips4, _, _ = next(it)
    assert clips4.shape == (t, n, h, w, 4)
    tri = clips4[..., 3]
    assert not np.all(tri[0] == 0.5)  # frame 0 annotated
    assert np.all(tri[1:] == 0.5)     # frames 1.. all-unknown

    it = synthetic_trimap_batches(t=t, n=n, h=h, w=w, seed=4,
                                  keyframe="off")
    tri = next(it)[0][..., 3]
    assert not np.all(tri[1:] == 0.5)  # every frame annotated

    kinds = set()
    it = synthetic_trimap_batches(t=t, n=n, h=h, w=w, seed=4,
                                  keyframe="mixed")
    for _ in range(12):
        tri = next(it)[0][..., 3]
        kinds.add(bool(np.all(tri[1:] == 0.5)))
        if len(kinds) == 2:
            break
    assert kinds == {True, False}


def test_trimap_from_mask():
    """trimap_from_mask: eroded interior = 1, boundary band = 0.5, far
    exterior = 0; uint8 and float masks agree; int band = pixels."""
    from vidmat.train.data import trimap_from_mask

    h = w = 64
    yy, xx = np.mgrid[:h, :w]
    disk = ((yy - 32) ** 2 + (xx - 32) ** 2 <= 20 ** 2)
    tri = trimap_from_mask(disk.astype(np.float32), band=4)
    assert tri.shape == (h, w, 1) and tri.dtype == np.float32
    assert set(np.unique(tri)) <= {0.0, 0.5, 1.0}
    assert tri[32, 32, 0] == 1.0          # deep interior
    assert tri[1, 1, 0] == 0.0            # far exterior
    assert tri[32, 32 + 20, 0] == 0.5     # on the boundary
    # a band must exist on BOTH sides of the edge
    assert tri[32, 32 + 20 + 2, 0] == 0.5
    assert tri[32, 32 + 20 - 2, 0] == 0.5

    tri_u8 = trimap_from_mask((disk * 255).astype(np.uint8), band=4)
    np.testing.assert_array_equal(tri, tri_u8)
    # fractional band: 0.04 * 64 = 2 px -> narrower unknown ring
    tri_frac = trimap_from_mask(disk.astype(np.float32), band=0.04)
    assert (tri_frac == 0.5).sum() < (tri == 0.5).sum()
    # 3-channel mask input (e.g. a mask saved as RGB PNG)
    rgb = np.repeat((disk * 255).astype(np.uint8)[..., None], 3, axis=-1)
    np.testing.assert_array_equal(trimap_from_mask(rgb, band=4), tri)
    with pytest.raises(ValueError, match="band"):
        trimap_from_mask(disk.astype(np.float32), band=0)


def test_trimap_from_mask_package_export():
    assert vidmat.trimap_from_mask is not None
