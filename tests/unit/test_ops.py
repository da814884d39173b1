"""Unit tests: canonical ops vs independent numpy/torch oracles
(SURVEY.md §4 unit tier)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_resize_matches_torch_bilinear():
    """Canonical resize contract: torch align_corners=False semantics
    (SURVEY.md §7 parity risk list)."""
    import torch
    import torch.nn.functional as F
    from vidmat.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(16, 16, 32, 32), (17, 23, 34, 46), (64, 48, 16, 12)]:
        x = rng.rand(2, h, w, 3).astype(np.float32)
        j = np.asarray(resize_bilinear(jnp.asarray(x), oh, ow))
        t = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (oh, ow),
                          mode="bilinear", align_corners=False
                          ).permute(0, 2, 3, 1).numpy()
        assert np.abs(j - t).max() < 1e-5


def _naive_box_mean(x: np.ndarray, r: int) -> np.ndarray:
    """O(HW * r^2) reference box mean with edge truncation."""
    n, h, w, c = x.shape
    out = np.zeros_like(x)
    for i in range(h):
        for j in range(w):
            ys, ye = max(i - r, 0), min(i + r + 1, h)
            xs, xe = max(j - r, 0), min(j + r + 1, w)
            out[:, i, j] = x[:, ys:ye, xs:xe].mean(axis=(1, 2))
    return out


def test_box_filter_vs_naive():
    from vidmat.ops.guided_filter import _box_filter

    rng = np.random.RandomState(1)
    x = rng.rand(1, 21, 17, 2).astype(np.float32)
    for r in (1, 3, 5):
        got = np.asarray(_box_filter(jnp.asarray(x), r))
        want = _naive_box_mean(x, r)
        assert np.abs(got - want).max() < 1e-4, f"radius {r}"


def test_guided_filter_identity_guide():
    """With guide == src and tiny eps, the filter must approximately return
    the source (a = cov/var ~= 1, b ~= 0)."""
    from vidmat.ops.guided_filter import guided_filter

    rng = np.random.RandomState(2)
    src = rng.rand(1, 40, 40, 1).astype(np.float32)
    out = np.asarray(guided_filter(jnp.asarray(src), jnp.asarray(src),
                                   radius=3, eps=1e-8))
    # Guided filter averages a, b over windows, so match is approximate but
    # should be close for a self-guided signal.
    assert np.abs(out - src).mean() < 0.05


def test_guided_filter_edge_preservation():
    """A sharp edge in the guide must survive refinement: filter a blurred
    alpha with a sharp guide and check the edge sharpens."""
    from vidmat.ops.guided_filter import guided_filter

    h = w = 32
    edge = np.zeros((1, h, w, 1), np.float32)
    edge[:, :, w // 2:] = 1.0
    blurred = np.asarray(
        jnp.asarray(edge))  # start from sharp
    # blur with a crude 5-wide box along x
    k = 5
    blurred = np.stack([np.convolve(row, np.ones(k) / k, mode="same")
                        for row in edge[0, :, :, 0]], axis=0)[None, ..., None]
    out = np.asarray(guided_filter(jnp.asarray(edge.astype(np.float32)),
                                   jnp.asarray(blurred.astype(np.float32)),
                                   radius=4, eps=1e-6))
    mid = w // 2
    jump_in = blurred[0, h // 2, mid, 0] - blurred[0, h // 2, mid - 1, 0]
    jump_out = out[0, h // 2, mid, 0] - out[0, h // 2, mid - 1, 0]
    assert jump_out > jump_in * 1.5, (jump_in, jump_out)


def test_composite_rgba():
    from vidmat.ops.composite import composite_rgba

    fgr = jnp.full((1, 8, 8, 3), 0.8)
    alpha = jnp.full((1, 8, 8, 1), 0.5)
    out = np.asarray(composite_rgba(fgr, alpha, jnp.array([0.0, 1.0, 0.0])))
    assert out.dtype == np.uint8 and out.shape == (1, 8, 8, 4)
    # 0.8*0.5 + bg*(0.5): R = 0.4 -> 102, G = 0.4+0.5 -> 230, A -> 128
    assert abs(int(out[0, 0, 0, 0]) - 102) <= 1
    assert abs(int(out[0, 0, 0, 1]) - 230) <= 1
    assert abs(int(out[0, 0, 0, 3]) - 128) <= 1


def test_composite_no_bg_premultiplied():
    from vidmat.ops.composite import composite_rgba

    fgr = jnp.full((1, 4, 4, 3), 1.0)
    alpha = jnp.full((1, 4, 4, 1), 0.25)
    out = np.asarray(composite_rgba(fgr, alpha, None))
    assert abs(int(out[0, 0, 0, 0]) - 64) <= 1  # premultiplied


def test_space_to_depth_roundtrip():
    from vidmat.models.matting_net import depth_to_space, space_to_depth

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y, 2)),
                                  np.asarray(x))


def test_rgba_image_roundtrip(tmp_path):
    import os

    from vidmat.io.reader import read_image
    from vidmat.io.writer import write_image

    rgba = np.random.RandomState(0).randint(0, 255, (16, 20, 4), np.uint8)
    p = os.path.join(str(tmp_path), "x.png")
    write_image(p, rgba)
    np.testing.assert_array_equal(read_image(p), rgba)
