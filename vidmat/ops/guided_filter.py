"""Guided filter for alpha refinement (He et al. guided filter [DOMAIN];
BASELINE.json:5,9 pin "guided-filter alpha refinement").

Edge-aware upsampling of a coarse alpha matte using the full-resolution RGB
frame (gray-projected guide) as the edge prior:

  q = mean(a) * I + mean(b),  a = cov(I, p) / (var(I) + eps),  b = mean(p) - a * mean(I)

Two implementations:
  - ``guided_filter``: pure-XLA box filters via cumulative sums. XLA fuses
    the elementwise algebra; the cumsum runs on the VPU. This is the default
    (SURVEY.md §7: pure-XLA first, Pallas where the profile says so).
  - ``vidmat.ops.pallas.gf_kernel``: fused Pallas kernel for the box-filter
    passes (hot path at 1080p/4K).

All arrays NHWC float.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_filter(x: jax.Array, r: int) -> jax.Array:
    """Box sum with window (2r+1)^2, edge-truncated (each output is the MEAN
    over valid in-window pixels), via integral images. NHWC, O(HW)."""
    n, h, w, c = x.shape
    # Normalizer (# valid pixels per window) is separable: rows(i) * cols(j).
    # Computing it as an outer product avoids a full-image reduce-window that
    # XLA otherwise constant-folds at O(seconds) compile cost.
    def counts(size: int) -> jax.Array:
        idx = jnp.arange(size)
        return (jnp.minimum(idx + r + 1, size)
                - jnp.maximum(idx - r, 0)).astype(x.dtype)
    norm = (counts(h)[:, None] * counts(w)[None, :])[None, :, :, None]
    return _box_sum(x, r) / norm


def _box_sum(x: jax.Array, r: int) -> jax.Array:
    # Separable windowed sums via reduce_window (zero padding = edge
    # truncation; _box_filter's count grid normalizes). Exact per-window
    # summation of 2r+1 values per axis — an integral image would carry
    # cumsum magnitudes ~2e6 at 1080p+ whose 4-corner difference loses
    # ~1e-2 of alpha precision to cancellation (ADVICE round 1); cost is
    # O(r) per pixel, fine for the r<=8 radii used here.
    win = 2 * r + 1
    s = jax.lax.reduce_window(
        x, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, win, 1, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (r, r), (0, 0), (0, 0)))
    return jax.lax.reduce_window(
        s, jnp.zeros((), x.dtype), jax.lax.add,
        window_dimensions=(1, 1, win, 1), window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (r, r), (0, 0)))


def box_blur(x: jax.Array, radius: int) -> jax.Array:
    """Edge-truncated (2r+1)² mean blur, NHWC — the background synthesizer
    for the portrait-blur compositing path (stepfactory bg_blur): applied
    at the COARSE grid, its bilinear upsample approximates a large-radius
    full-res bokeh at coarse-grid cost."""
    return _box_filter(x, radius)


def guided_filter(guide: jax.Array, src: jax.Array, radius: int = 4,
                  eps: float = 1e-4) -> jax.Array:
    """Filter ``src`` guided by ``guide`` (single-channel guide).

    guide: (N, H, W, 1) — typically gray-projected RGB.
    src:   (N, H, W, C) — alpha (C=1) or alpha+fgr stacked.
    """
    f32 = jnp.float32
    I = guide.astype(f32)
    p = src.astype(f32)
    mean_I = _box_filter(I, radius)
    mean_p = _box_filter(p, radius)
    corr_Ip = _box_filter(I * p, radius)
    corr_II = _box_filter(I * I, radius)
    var_I = corr_II - mean_I * mean_I
    cov_Ip = corr_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I
    mean_a = _box_filter(a, radius)
    mean_b = _box_filter(b, radius)
    return (mean_a * I + mean_b).astype(src.dtype)


def gray_guide(rgb: jax.Array) -> jax.Array:
    """Luma projection used as the guided-filter guide. NHWC (..., 3) -> (..., 1)."""
    w = jnp.array([0.299, 0.587, 0.114], rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)


def guided_upsample(rgb_full: jax.Array, alpha_lr: jax.Array,
                    fgr_lr: jax.Array, radius: int = 4, eps: float = 1e-4,
                    impl: str = "xla",
                    interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Upsample coarse (alpha, fgr) to the full-res grid with a FAST guided
    filter (BASELINE.json:10 'downsample-ratio coarse pass + full-res
    refine').

    Fast variant (He & Sun 2015 [DOMAIN]): all box-filter statistics are
    computed at the coarse network resolution against a downsampled guide;
    only the affine coefficients (a, b) are upsampled, and the full-res work
    is a single fused multiply-add ``a * guide_full + b``. At 1080p/ds=0.25
    this removes every full-res box filter from the hot path (~5-6ms/frame
    on v5e vs filtering at full res; see BENCH notes). The full-resolution
    reference implementation stays available as ``guided_filter`` (used by
    tests and the non-coarse path).
    """
    from vidmat.ops.resize import resize_bilinear

    n, h, w, _ = rgb_full.shape
    nl, hl, wl, _ = alpha_lr.shape
    f32 = jnp.float32

    guide_full = gray_guide(rgb_full.astype(f32))
    I = resize_bilinear(guide_full, hl, wl)
    p = jnp.concatenate([alpha_lr, fgr_lr], axis=-1).astype(f32)

    if impl == "pallas":
        # Fused single-kernel statistics (vidmat.ops.pallas.gf_kernel).
        from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs

        ma, mb = guided_filter_coeffs(I, p, radius=radius, eps=eps,
                                      interpret=interpret)
        mean_a = resize_bilinear(ma, h, w)
        mean_b = resize_bilinear(mb, h, w)
    else:
        mean_I = _box_filter(I, radius)
        mean_p = _box_filter(p, radius)
        corr_Ip = _box_filter(I * p, radius)
        corr_II = _box_filter(I * I, radius)
        var_I = corr_II - mean_I * mean_I
        cov_Ip = corr_Ip - mean_I * mean_p
        a = cov_Ip / (var_I + eps)
        b = mean_p - a * mean_I
        mean_a = resize_bilinear(_box_filter(a, radius), h, w)
        mean_b = resize_bilinear(_box_filter(b, radius), h, w)
    out = mean_a * guide_full + mean_b
    alpha = jnp.clip(out[..., 0:1], 0.0, 1.0)
    fgr = jnp.clip(out[..., 1:4], 0.0, 1.0)
    return alpha, fgr
