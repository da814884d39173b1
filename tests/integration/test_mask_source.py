"""Segmentation-mask entry into trimap-conditioned matting.

Users rarely hold a real trimap; a rough binary mask (from any segmenter,
or hand-painted) is the practical annotation. ``mask_source`` /
``matte_image(mask=...)`` convert masks to trimaps on the fly
(train.data.trimap_from_mask) and ride the existing trimap machinery, so
these tests pin the adapter against the manual trimap path — identical
outputs by construction, any weights.
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
from vidmat.train.data import trimap_from_mask

PROP_CKPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "checkpoints",
    "trimap_prop_demo")


def _clip_with_masks(h, w, n, seed=0):
    frames, masks = [], []
    for i in range(n):
        frame, gt = synthetic_frame(h, w, i / max(n, 1), seed=seed)
        frames.append(frame)
        masks.append(((gt[..., 0] >= 0.5) * 255).astype(np.uint8))
    return frames, masks


def _read_all(pat, n):
    import imageio.v3 as iio

    return [iio.imread(pat % i) for i in range(n)]


def test_mask_source_stream_equals_manual_trimaps(tmp_path):
    """A per-frame mask stream produces EXACTLY the frames the manual
    trimap_from_mask -> trimap_source path produces (same weights)."""
    h, w, n = 64, 96, 3
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)
    frames, masks = _clip_with_masks(h, w, n, seed=11)

    pat_m = str(tmp_path / "m_%03d.png")
    vidmat.convert_video(frames, output_alpha=pat_m, mask_source=masks,
                         model_cfg=cfg, variables=v, downsample_ratio=1.0)
    pat_t = str(tmp_path / "t_%03d.png")
    tris = [trimap_from_mask(m) for m in masks]
    vidmat.convert_video(frames, output_alpha=pat_t, trimap_source=tris,
                         model_cfg=cfg, variables=v, downsample_ratio=1.0)
    for am, at in zip(_read_all(pat_m, n), _read_all(pat_t, n)):
        np.testing.assert_array_equal(am, at)


@pytest.mark.skipif(not os.path.isdir(PROP_CKPT),
                    reason="propagation checkpoint not present")
def test_mask_keyframe_selects_propagation_family(tmp_path):
    """A SINGLE mask array routes to the keyframe-propagation family
    (auto model_cfg + shipped trimap_prop_demo weights) and matches the
    manual keyframe-trimap call frame-for-frame."""
    h, w, n = 64, 96, 3
    frames, masks = _clip_with_masks(h, w, n, seed=23)

    pat_m = str(tmp_path / "km_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat_m,
                             mask_source=masks[0], downsample_ratio=1.0)
    assert m["frames"] == n
    pat_t = str(tmp_path / "kt_%03d.png")
    vidmat.convert_video(frames, output_alpha=pat_t,
                         trimap_source=trimap_from_mask(masks[0]),
                         downsample_ratio=1.0)
    for am, at in zip(_read_all(pat_m, n), _read_all(pat_t, n)):
        np.testing.assert_array_equal(am, at)


def test_matte_image_mask_equals_manual():
    h, w = 64, 96
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)
    frame, gt = synthetic_frame(h, w, 0.4, seed=3)
    mask = ((gt[..., 0] >= 0.5) * 255).astype(np.uint8)

    a_m, f_m = vidmat.matte_image(frame, mask=mask, variables=v, cfg=cfg)
    a_t, f_t = vidmat.matte_image(frame, trimap=trimap_from_mask(mask),
                                  variables=v, cfg=cfg)
    np.testing.assert_array_equal(a_m, a_t)
    np.testing.assert_array_equal(f_m, f_t)


def test_mask_and_trimap_mutually_exclusive():
    h, w = 32, 32
    frame = np.zeros((h, w, 3), np.uint8)
    mask = np.zeros((h, w), np.uint8)
    with pytest.raises(ValueError, match="not both"):
        vidmat.matte_image(frame, trimap=np.zeros((h, w), np.float32),
                           mask=mask)
    with pytest.raises(ValueError, match="not both"):
        vidmat.convert_video([frame], mask_source=mask,
                             trimap_source=np.zeros((h, w), np.float32))


def test_trimap_from_mask_bands():
    """Unknown band straddles the mask boundary; interior/exterior stay
    definite; int band = pixels, float band = fraction of short side."""
    h = w = 40
    mask = np.zeros((h, w), np.uint8)
    mask[10:30, 10:30] = 255
    tri = trimap_from_mask(mask, band=3)[..., 0]
    assert tri.shape == (h, w)
    assert tri[20, 20] == 1.0          # deep interior
    assert tri[2, 2] == 0.0            # far exterior
    assert tri[10, 20] == 0.5          # on the boundary
    assert tri[8, 20] == 0.5 and tri[12, 20] == 0.5  # band straddles
    # float band: fraction of short side (0.075*40 = 3 px) — same result
    np.testing.assert_array_equal(
        tri, trimap_from_mask(mask, band=0.075)[..., 0])


def test_mask_source_start_frame_alignment_and_lazy_conversion(
        tmp_path, monkeypatch):
    """With start_frame trimming, mask i must still pair with frame i
    (the adapter trims the RAW mask stream, marked pre-trimmed so the
    pipeline does not trim again), and skipped masks must never run
    through the O(H*W) trimap conversion."""
    import vidmat.train.data as td

    h, w, n, start = 64, 96, 5, 3
    cfg = ModelConfig(use_trimap=True, recurrent=False)
    v = init_params(cfg)
    frames, masks = _clip_with_masks(h, w, n, seed=23)

    calls = []
    real = td.trimap_from_mask

    def counting(mask, band=0.04):
        calls.append(1)
        return real(mask, band=band)

    monkeypatch.setattr(td, "trimap_from_mask", counting)
    pat_m = str(tmp_path / "m_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pat_m,
                             mask_source=masks, start_frame=start,
                             model_cfg=cfg, variables=v,
                             downsample_ratio=1.0)
    assert m["frames"] == n - start
    assert len(calls) == n - start  # skipped masks never converted
    monkeypatch.undo()

    # Reference: trim both streams by hand, no start_frame.
    pat_t = str(tmp_path / "t_%03d.png")
    tris = [trimap_from_mask(mm) for mm in masks[start:]]
    vidmat.convert_video(frames[start:], output_alpha=pat_t,
                         trimap_source=tris, model_cfg=cfg, variables=v,
                         downsample_ratio=1.0)
    for am, at in zip(_read_all(pat_m, n - start),
                      _read_all(pat_t, n - start)):
        np.testing.assert_array_equal(am, at)
