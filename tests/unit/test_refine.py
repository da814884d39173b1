"""Tiling + error-map refinement tests (SURVEY.md §4: seam-free 4K tiling)."""

import numpy as np

import jax
import jax.numpy as jnp

from vidmat.refine.tiling import TileLayout, tile_frame, tiled_apply, untile_frame


def test_tile_untile_identity():
    """tile -> untile with any overlap must reproduce the frame exactly
    (weights normalize to 1 everywhere) — the seam-free criterion."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 100, 140, 3).astype(np.float32))
    for tile, ov in [(64, 16), (48, 8), (140, 0)]:
        layout = TileLayout(100, 140, tile, ov)
        out = untile_frame(tile_frame(x, layout), layout, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-5, err_msg=f"tile={tile} ov={ov}")


def test_tiled_apply_matches_global_for_pointwise():
    """A pointwise fn must commute with tiling (no seam artifacts)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 96, 128, 3).astype(np.float32))
    fn = lambda t: jnp.tanh(t * 2.0)
    out = tiled_apply(fn, x, tile=48, overlap=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x)), atol=1e-5)


def test_tile_layout_counts():
    lay = TileLayout(2176, 3840, 1024, 128)  # 4K frame (BASELINE.json:10)
    assert lay.ys[0] == 0 and lay.ys[-1] == 2176 - 1024
    assert lay.xs[-1] == 3840 - 1024
    assert lay.num_tiles == len(lay.ys) * len(lay.xs)


def test_errormap_refiner_shapes_and_targeting():
    """The refiner must (a) keep shapes, (b) only modify alpha inside the
    selected worst-error patches."""
    from vidmat.refine.errormap import ErrorMapRefiner

    h, w = 64, 96
    hf, wf = 128, 192
    rng = np.random.RandomState(2)
    rgb_full = jnp.asarray(rng.rand(1, hf, wf, 3).astype(np.float32))
    rgb_lr = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    alpha_lr = jnp.asarray(rng.rand(1, h, w, 1).astype(np.float32))

    ref = ErrorMapRefiner(num_patches=8, patch_size=16)
    variables = ref.init(jax.random.PRNGKey(0), rgb_full, rgb_lr, alpha_lr)
    alpha, err = ref.apply(variables, rgb_full, rgb_lr, alpha_lr)
    assert alpha.shape == (1, hf, wf, 1)
    assert err.shape == (1, h, w, 1)

    # vs plain upsample: at most 8 * 16x16 patches may differ
    from vidmat.ops.resize import resize_bilinear

    base = np.asarray(resize_bilinear(alpha_lr, hf, wf))
    diff = (np.abs(np.asarray(alpha) - np.clip(base, 0, 1)) > 1e-7)
    changed_px = diff.sum()
    assert changed_px <= 8 * 16 * 16, changed_px


def test_tiled_guided_upsample_matches_whole_frame():
    """Per-tile guided refinement with overlap >= 2*radius*pool must match
    the whole-frame filter (seam-free 4K path, BASELINE.json:10)."""
    from vidmat.ops.guided_filter import guided_upsample
    from vidmat.refine.tiling import tiled_guided_upsample

    # realistic content (the GF approximation is exact on locally-smooth
    # signals; white noise over-states the tile-edge truncation residual)
    from vidmat.io.fixtures import synthetic_frame
    from vidmat.ops.resize import resize_bilinear

    h, w, pool = 128, 192, 2
    img, gt = synthetic_frame(h, w, 0.3, seed=5)
    frame = jnp.asarray(img.astype(np.float32) / 255.0)[None]
    a_lr = resize_bilinear(jnp.asarray(gt)[None], h // pool, w // pool)
    f_lr = resize_bilinear(frame, h // pool, w // pool)

    whole_a, whole_f = guided_upsample(frame, a_lr, f_lr, radius=4)
    tile_a, tile_f = tiled_guided_upsample(frame, a_lr, f_lr,
                                           tile=64, overlap=32, radius=4)
    # interiors match; the tiny residual is the per-tile edge-truncation
    # band of the box filter
    assert np.abs(np.asarray(whole_a) - np.asarray(tile_a)).mean() < 5e-3
    # seams: no discontinuity at tile boundaries
    ta = np.asarray(tile_a)[0, :, :, 0]
    seam_jump = np.abs(np.diff(ta, axis=1)).max()
    smooth_jump = np.abs(np.diff(np.asarray(whole_a)[0, :, :, 0],
                                 axis=1)).max()
    assert seam_jump < smooth_jump * 1.5 + 0.05
