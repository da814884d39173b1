"""Pallas kernel tests vs jnp/numpy oracles in interpreter mode
(SURVEY.md §5: Pallas interpret=True as the kernel sanitizer)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidmat.ops.composite import composite_rgba
from vidmat.ops.guided_filter import _box_filter
from vidmat.ops.pallas import (composite_rgba_packed, guided_filter_coeffs,
                               ingest_pool_normalize)
from vidmat.ops.pallas.composite_kernel import unpack_rgba_host


def test_composite_kernel_matches_oracle():
    rng = np.random.RandomState(0)
    fgr = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    alpha = jnp.asarray(rng.rand(2, 32, 128, 1).astype(np.float32))
    bg_img = jnp.asarray(rng.rand(32, 128, 3).astype(np.float32))
    for bg in (None, jnp.array([0.0, 1.0, 0.0]), bg_img):
        packed = composite_rgba_packed(fgr, alpha, bg, interpret=True)
        got = unpack_rgba_host(np.asarray(packed))
        want = np.asarray(composite_rgba(fgr, alpha, bg))
        assert np.abs(got.astype(int) - want.astype(int)).max() == 0


def test_ingest_kernel_area_pool():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 64, 128, 3), np.uint8)
    for pool in (1, 2, 4):
        out = np.asarray(ingest_pool_normalize(
            jnp.asarray(img), pool=pool, out_dtype=jnp.float32,
            interpret=True))
        ref = img.astype(np.float32).reshape(
            1, 64 // pool, pool, 128 // pool, pool, 3).mean((2, 4)) / 255.0
        assert np.abs(out - ref).max() < 1e-5, f"pool {pool}"


def test_ingest_kernel_custom_normalization():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (1, 32, 128, 3), np.uint8)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    scale = 1.0 / (255.0 * std)
    offset = -mean / std
    out = np.asarray(ingest_pool_normalize(
        jnp.asarray(img), pool=1, scale=scale, offset=offset,
        out_dtype=jnp.float32, interpret=True))
    ref = (img.astype(np.float32) / 255.0 - mean) / std
    assert np.abs(out - ref).max() < 1e-4


def test_gf_kernel_matches_box_filter_oracle():
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.rand(1, 32, 48, 1).astype(np.float32))
    p = jnp.asarray(rng.rand(1, 32, 48, 4).astype(np.float32))
    r, eps = 3, 1e-4
    ma, mb = guided_filter_coeffs(g, p, radius=r, eps=eps, interpret=True)
    I = g
    mean_I = _box_filter(I, r)
    mean_p = _box_filter(p, r)
    corr_Ip = _box_filter(I * p, r)
    corr_II = _box_filter(I * I, r)
    var_I = corr_II - mean_I * mean_I
    cov = corr_Ip - mean_I * mean_p
    a = cov / (var_I + eps)
    b = mean_p - a * mean_I
    assert np.abs(np.asarray(ma) - np.asarray(_box_filter(a, r))).max() < 1e-3
    assert np.abs(np.asarray(mb) - np.asarray(_box_filter(b, r))).max() < 1e-3


def test_guided_upsample_pallas_close_to_xla():
    from vidmat.ops.guided_filter import guided_upsample
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(4)
    rgb = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    a_lr = jnp.asarray(rng.rand(1, 32, 48, 1).astype(np.float32))
    f_lr = jnp.asarray(rng.rand(1, 32, 48, 3).astype(np.float32))
    ax, fx = guided_upsample(rgb, a_lr, f_lr, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        ap, fp = guided_upsample(rgb, a_lr, f_lr, impl="pallas")
    assert np.abs(np.asarray(ax) - np.asarray(ap)).max() < 1e-2
    assert np.abs(np.asarray(fx) - np.asarray(fp)).max() < 1e-2


def test_fused_refine_composite_matches_oracle():
    """North-star fused kernel: coeff upsample + guided apply + composite +
    RGBA pack in one pass vs the unfused jnp oracle (interpret mode)."""
    from vidmat.ops.guided_filter import gray_guide
    from vidmat.ops.pallas.refine_kernel import fused_refine_composite
    from vidmat.ops.resize import resize_bilinear

    rng = np.random.RandomState(7)
    n, h, w, pool = 2, 64, 128, 4
    frame = rng.randint(0, 255, (n, h, w, 3), np.uint8)
    a_lr = rng.uniform(-0.5, 1.5, (n, h // pool, w // pool, 4)
                       ).astype(np.float32)
    b_lr = rng.uniform(-0.5, 1.0, (n, h // pool, w // pool, 4)
                       ).astype(np.float32)

    bg_img = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    for bg in (None, jnp.array([0.0, 1.0, 0.0]), bg_img):
        got = unpack_rgba_host(np.asarray(fused_refine_composite(
            jnp.asarray(frame), jnp.asarray(a_lr), jnp.asarray(b_lr), bg,
            pool=pool, interpret=True)))
        guide = gray_guide(jnp.asarray(frame).astype(jnp.float32) / 255.0)
        A = resize_bilinear(jnp.asarray(a_lr), h, w)
        B = resize_bilinear(jnp.asarray(b_lr), h, w)
        out = A * guide + B
        alpha = jnp.clip(out[..., 0:1], 0, 1)
        fgr = jnp.clip(out[..., 1:4], 0, 1)
        want = np.asarray(composite_rgba(fgr, alpha, bg))
        d = np.abs(got.astype(int) - want.astype(int))
        assert d.max() <= 1, d.max()  # +-1 quantization of f32 rounding


def test_refine_tile_sizing():
    """pick_refine_tiles must return dividing tile sizes that fit the
    scoped-VMEM budget at every ladder shape (the 4K full-width tile
    measured 16.06-18.66 MB against a 16 MB limit — compiler-reported);
    refine_tiles_fit must reject coefficient grids no tiling can hold
    (stepfactory falls back to the unfused guided path there)."""
    from vidmat.ops.pallas.refine_kernel import (pick_refine_tiles,
                                                 refine_tiles_fit)

    for h, w, hl, wl in [(1088, 1920, 272, 480),   # 1080p ds=0.25
                         (2176, 3840, 272, 480),   # 4K ds=0.125
                         (4352, 7680, 272, 480),   # 8K ds=0.0625
                         (128, 128, 32, 32)]:      # unit-test shapes
        th, wc = pick_refine_tiles(h, w, hl, wl)
        assert h % th == 0 and w % wc == 0, (h, w, th, wc)
        assert refine_tiles_fit(h, w, hl, wl), (h, w, th, wc)
        wl_pad = -(-wl // 128) * 128
        est = (2 * 2 * 4 * hl * wl_pad * 4 + wl * wc * 4 + th * wc * 24)
        assert est <= 13 * 2**20, (h, w, th, wc, est)

    # Coeff grids that cannot fit regardless of tiling: the fused path
    # must be rejected, not compiled into a scoped-VMEM failure.
    assert not refine_tiles_fit(2176, 3840, 1088, 1920)  # pool=2 at 4K
    assert not refine_tiles_fit(960, 1728, 480, 864)     # pool=2, huge wl


def test_ingest_kernel_vmem_fallback(monkeypatch):
    """When no legal Mosaic tiling fits scoped VMEM (e.g. 2160p pool=4:
    oh=540 has no %8 divisor; 4K pool=2: the column pooling matrix alone
    is ~29 MB), ingest_pool_normalize must fall back to the exact XLA
    reshape-mean pool instead of a Mosaic compile failure."""
    import vidmat.ops.pallas.ingest_kernel as ik

    assert ik._pick_tile_oh(540, 4, 3840) is None
    assert ik._pick_tile_oh(1088, 2, 3840) is None

    monkeypatch.setattr(ik, "_pick_tile_oh", lambda *a, **k: None)
    rng = np.random.RandomState(6)
    img = rng.randint(0, 255, (1, 32, 128, 3), np.uint8)
    out = np.asarray(ik.ingest_pool_normalize(
        jnp.asarray(img), pool=4, out_dtype=jnp.float32, interpret=True))
    ref = img.astype(np.float32).reshape(
        1, 8, 4, 32, 4, 3).mean((2, 4)) / 255.0
    assert np.abs(out - ref).max() < 1e-5
