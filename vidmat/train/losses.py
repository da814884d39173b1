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


def matting_loss(pred_alpha: jax.Array, pred_fgr: jax.Array,
                 gt_alpha: jax.Array, gt_fgr: Optional[jax.Array],
                 frames: jax.Array,
                 temporal_axis: bool = True) -> tuple[jax.Array, Dict]:
    """Compute the composite matting loss.

    pred_alpha/gt_alpha: (T, N, H, W, 1); pred_fgr: (T, N, H, W, 3)
    gt_fgr: optional ground-truth foreground; when None the composition term
    uses gt_alpha-weighted frame reconstruction instead.
    frames: (T, N, H, W, 3) input RGB.
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
    return total, {"alpha": l_alpha, "grad": l_grad, "fgr": l_fgr,
                   "temporal": l_temp}
