"""ClipDirDataset: directory-format real-data training adapter.

Fixture datasets are generated on the fly (offline environment) in the
exact on-disk layout public matting datasets use — fgr/pha clip dirs plus
background stills — via io.fixtures.write_synthetic_matting_dataset.
"""

import numpy as np
import pytest

from vidmat.io.fixtures import write_synthetic_matting_dataset
from vidmat.train.dataset import ClipDirDataset, with_trimaps


@pytest.fixture(scope="module")
def ds_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("matting_ds")
    return write_synthetic_matting_dataset(
        str(root), num_clips=2, frames=6, h=96, w=96, seed=3)


def test_batches_shapes_and_ranges(ds_paths):
    ds = ClipDirDataset(ds_paths["fgr"], ds_paths["pha"],
                        bgr_root=ds_paths["bgr"], clip_len=3, batch=2,
                        size=64, seed=0)
    clips, alphas, fgrs = next(ds.batches())
    assert clips.shape == (3, 2, 64, 64, 3)
    assert alphas.shape == (3, 2, 64, 64, 1)
    assert fgrs.shape == (3, 2, 64, 64, 3)
    for a in (clips, alphas, fgrs):
        assert a.dtype == np.float32
        assert a.min() >= 0.0 and a.max() <= 1.0
    # the fixture mattes actually contain a foreground
    assert alphas.max() > 0.9 and alphas.min() < 0.1


def test_composite_consistency_solid_bg(ds_paths):
    # identity geometry: crop == source size, no jitter/flip/pan, solid bg
    ds = ClipDirDataset(ds_paths["fgr"], ds_paths["pha"], bgr_root=None,
                        clip_len=2, batch=1, size=96, seed=1,
                        motion_aug=False, flip=False, scale_jitter=0.0)
    clips, alphas, fgrs = next(ds.batches())
    # residual outside the matte is the (constant) background color
    resid = clips - fgrs * alphas
    mask = alphas[..., 0] < 1e-3
    assert mask.sum() > 100
    for t in range(2):
        bg_px = resid[t, 0][mask[t, 0]]
        # one solid color (mask pixels carry alpha up to 1e-3, so the
        # (1-a)*bg residual varies at that order)
        assert bg_px.std(axis=0).max() < 1e-3
    # full composite identity: resid == (1-alpha) * color everywhere
    color = resid[0, 0][mask[0, 0]][0]
    recon = fgrs * alphas + (1.0 - alphas) * color
    np.testing.assert_allclose(clips, recon, atol=2e-3)


def test_determinism(ds_paths):
    mk = lambda: ClipDirDataset(ds_paths["fgr"], ds_paths["pha"],
                                bgr_root=ds_paths["bgr"], clip_len=2,
                                batch=2, size=64, seed=7)
    a = next(mk().batches())
    b = next(mk().batches())
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_background_pans_across_clip(ds_paths):
    ds = ClipDirDataset(ds_paths["fgr"], ds_paths["pha"],
                        bgr_root=ds_paths["bgr"], clip_len=4, batch=1,
                        size=64, seed=0, motion_aug=True)
    # pan velocity is sampled per clip; across a few samples at least one
    # background must move between frames
    moved = 0.0
    for _, sample in zip(range(4), ds.batches()):
        clips, alphas, _ = sample
        bg_region = (alphas[..., 0] < 1e-3)
        common = bg_region.all(axis=0)[0]  # static-bg pixels visible all t
        if common.sum() < 50:
            continue
        moved = max(moved, float(np.abs(
            clips[1:, 0][:, common] - clips[:-1, 0][:, common]).max()))
    assert moved > 0.01


def test_flat_dir_is_one_clip(ds_paths, tmp_path):
    import shutil

    flat_f, flat_p = tmp_path / "f", tmp_path / "p"
    shutil.copytree(f"{ds_paths['fgr']}/clip_000", flat_f)
    shutil.copytree(f"{ds_paths['pha']}/clip_000", flat_p)
    ds = ClipDirDataset(str(flat_f), str(flat_p), clip_len=8, batch=1,
                        size=64, seed=0)  # clip_len > frames: loops
    clips, alphas, _ = next(ds.batches())
    assert clips.shape[0] == 8 and np.isfinite(clips).all()


def test_mismatched_roots_raise(ds_paths, tmp_path):
    import shutil

    pha_one = tmp_path / "pha_one"  # 1 clip vs fgr's 2
    shutil.copytree(f"{ds_paths['pha']}/clip_000", pha_one / "clip_000")
    with pytest.raises(ValueError, match="mirror"):
        ClipDirDataset(ds_paths["fgr"], str(pha_one))
    with pytest.raises(FileNotFoundError):
        ClipDirDataset(ds_paths["fgr"], str(tmp_path / "nope"))


def test_with_trimaps(ds_paths):
    ds = ClipDirDataset(ds_paths["fgr"], ds_paths["pha"], clip_len=2,
                        batch=1, size=64, seed=0)
    clips4, alphas, _ = next(with_trimaps(ds.batches()))
    assert clips4.shape[-1] == 4
    tri = clips4[..., 3]
    assert set(np.unique(tri)).issubset({0.0, 0.5, 1.0})
    # known-fg pixels are saturated in alpha
    assert alphas[tri == 1.0].min() > 0.9


def test_train_step_runs_on_dataset(ds_paths):
    from vidmat.config import ModelConfig
    from vidmat.train.loop import train_on_clips

    ds = ClipDirDataset(ds_paths["fgr"], ds_paths["pha"],
                        bgr_root=ds_paths["bgr"], clip_len=2, batch=1,
                        size=64, seed=0)
    losses = []
    train_on_clips(ModelConfig(), ds.batches(), num_steps=2,
                   callback=lambda i, m: losses.append(float(m["loss"])))
    assert len(losses) == 2 and all(np.isfinite(losses))
