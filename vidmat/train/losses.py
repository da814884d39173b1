"""Matting losses (SURVEY.md §3.5: alpha L1 + composition + gradient +
temporal coherence — the standard video-matting loss family [DOMAIN]).

All terms are elementwise/reduction ops that XLA fuses into the backward
conv pipeline; nothing here needs a custom kernel.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _sobel(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Spatial gradients via central differences on NHWC (T folded in N)."""
    dy = x[:, 1:, :, :] - x[:, :-1, :, :]
    dx = x[:, :, 1:, :] - x[:, :, :-1, :]
    return dy, dx


# 5-tap binomial [1 4 6 4 1]/16 — the standard Burt-Adelson pyramid filter.
# Kept as a host constant: a module-level jnp array would initialize the
# XLA backend at import time, which breaks multi-host startup ordering
# (jax.distributed.initialize must run before any backend touch).
import numpy as _np

_GAUSS5 = _np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], _np.float32) / 16.0


def _blur_down(x: jax.Array) -> jax.Array:
    """Separable 5-tap Gaussian blur + 2x decimation on NHWC.

    Runs as two depthwise 1D convs (XLA maps these onto fused
    elementwise/reduce pipelines at these channel counts; no custom kernel
    warranted for a training-only op)."""
    n, h, w, c = x.shape
    k = jnp.asarray(_GAUSS5, x.dtype)
    xt = jnp.moveaxis(x, -1, 1).reshape(n * c, 1, h, w)
    kh = k.reshape(1, 1, 5, 1)
    kw = k.reshape(1, 1, 1, 5)
    xt = jax.lax.conv_general_dilated(xt, kh, (1, 1), [(2, 2), (0, 0)])
    xt = jax.lax.conv_general_dilated(xt, kw, (1, 1), [(0, 0), (2, 2)])
    xt = xt[:, :, ::2, ::2]
    hh, ww = xt.shape[2], xt.shape[3]
    return jnp.moveaxis(xt.reshape(n, c, hh, ww), 1, -1)


def laplacian_pyramid_loss(pred: jax.Array, gt: jax.Array,
                           levels: int = 5) -> jax.Array:
    """Multi-scale L1 over Laplacian pyramid bands (the RVM-family alpha
    loss that sharpens hair/fine-structure edges which a plain L1 washes
    out). Band k is weighted 2^k — coarse bands carry larger magnitudes
    per pixel after repeated blurring.

    pred/gt: (N, H, W, C); levels capped so the coarsest band is >= 4 px.
    """
    import math

    h, w = pred.shape[1], pred.shape[2]
    levels = max(1, min(levels, int(math.log2(min(h, w))) - 1))
    loss = jnp.zeros((), pred.dtype)
    for k in range(levels):
        if k == levels - 1:
            bp, bg = pred, gt
        else:
            dp, dg = _blur_down(pred), _blur_down(gt)
            up_shape = pred.shape
            bp = pred - jax.image.resize(dp, up_shape, "bilinear")
            bg = gt - jax.image.resize(dg, up_shape, "bilinear")
            pred, gt = dp, dg
        loss = loss + (2.0 ** k) * jnp.mean(jnp.abs(bp - bg))
    return loss


def matting_loss(pred_alpha: jax.Array, pred_fgr: jax.Array,
                 gt_alpha: jax.Array, gt_fgr: Optional[jax.Array],
                 frames: jax.Array,
                 temporal_axis: bool = True,
                 laplacian_weight: float = 0.0,
                 boundary_weight: float = 0.0) -> tuple[jax.Array, Dict]:
    """Compute the composite matting loss.

    pred_alpha/gt_alpha: (T, N, H, W, 1); pred_fgr: (T, N, H, W, 3)
    gt_fgr: optional ground-truth foreground; when None the composition term
    uses gt_alpha-weighted frame reconstruction instead.
    frames: (T, N, H, W, 3) input RGB.
    laplacian_weight: weight for the multi-scale Laplacian-pyramid alpha
    term (0 disables it — it costs a pyramid fwd+bwd per step).
    boundary_weight: weight for an extra L1 term restricted to the
    dilated edge band of the ground truth (the unknown-region emphasis
    of the trimap-matting literature [DOMAIN]). Motivation (round-5
    plate diagnosis): on camouflage content the error concentrates
    ~100% in the boundary band (interior/background near-perfect) —
    the global mean L1 barely moves when the band sharpens, so the
    optimizer parks at a fuzzy-median edge.
    Returns (scalar loss, dict of unweighted terms).
    """
    t, n, h, w, _ = pred_alpha.shape
    flat = lambda x: x.reshape((t * n,) + x.shape[2:])
    pa, ga = flat(pred_alpha), flat(gt_alpha)
    pf, fr = flat(pred_fgr), flat(frames[..., :3])  # drop trimap channel

    # alpha L1 + Laplacian-free gradient term
    l_alpha = jnp.mean(jnp.abs(pa - ga))
    pdy, pdx = _sobel(pa)
    gdy, gdx = _sobel(ga)
    l_grad = jnp.mean(jnp.abs(pdy - gdy)) + jnp.mean(jnp.abs(pdx - gdx))

    # composition: predicted fgr must reconstruct the frame inside the matte
    if gt_fgr is not None:
        gf = flat(gt_fgr)
        l_fgr = jnp.mean(jnp.abs((pf - gf) * (ga > 0)))
    else:
        l_fgr = jnp.mean(jnp.abs(pf * ga - fr * ga))

    # temporal coherence: dA/dt consistency (suppresses flicker)
    if temporal_axis and t > 1:
        pdt = pred_alpha[1:] - pred_alpha[:-1]
        gdt = gt_alpha[1:] - gt_alpha[:-1]
        l_temp = jnp.mean(jnp.abs(pdt - gdt))
    else:
        l_temp = jnp.zeros((), pa.dtype)

    total = l_alpha + l_grad + l_fgr + 5.0 * l_temp
    terms = {"alpha": l_alpha, "grad": l_grad, "fgr": l_fgr,
             "temporal": l_temp}
    if laplacian_weight > 0.0:
        l_lap = laplacian_pyramid_loss(pa, ga)
        total = total + laplacian_weight * l_lap
        terms["laplacian"] = l_lap
    if boundary_weight > 0.0:
        # Edge band = 5x5 max-pool dilation of the non-saturated gt
        # region; the band-mean L1 weights every edge pixel equally no
        # matter how small the band is relative to the frame.
        band = ((ga > 0.02) & (ga < 0.98)).astype(pa.dtype)
        band = jax.lax.reduce_window(band, jnp.zeros((), pa.dtype),
                                     jax.lax.max, (1, 5, 5, 1),
                                     (1, 1, 1, 1), "SAME")
        l_band = (jnp.sum(jnp.abs(pa - ga) * band)
                  / jnp.maximum(jnp.sum(band), 1.0))
        total = total + boundary_weight * l_band
        terms["boundary"] = l_band
    return total, terms

def segmentation_loss(logits: jax.Array, gt_mask: jax.Array
                      ) -> tuple[jax.Array, Dict]:
    """Sigmoid BCE for the segmentation co-training pass (RVM-lineage
    [DOMAIN]: matting batches interleave with binary-mask segmentation
    batches that supervise the shared trunk through a separate 1-channel
    head; real segmentation datasets provide this label at scale).

    logits/gt_mask: (T, N, H, W, 1); gt_mask in {0, 1} float.
    Returns (scalar BCE, {"seg_bce", "seg_iou"}) — IoU at threshold 0 is
    a metric only, not part of the loss.
    """
    l = logits.astype(jnp.float32)
    m = gt_mask.astype(jnp.float32)
    # numerically stable BCE-with-logits: max(l,0) - l*m + log1p(exp(-|l|))
    bce = jnp.mean(jnp.maximum(l, 0.0) - l * m
                   + jnp.log1p(jnp.exp(-jnp.abs(l))))
    pred = (l > 0.0).astype(jnp.float32)
    inter = jnp.sum(pred * m)
    union = jnp.sum(jnp.maximum(pred, m))
    # Empty union (all-background batch, all-negative prediction) is a
    # perfect prediction: IoU 1, not 0.
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-8), 1.0)
    return bce, {"seg_bce": bce, "seg_iou": iou}
