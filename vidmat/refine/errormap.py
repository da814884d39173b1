"""Error-map-guided patch refinement (BASELINE.json:5 "error-map
upsampling"; BackgroundMattingV2-lineage [DOMAIN, SURVEY.md §1.1]).

Flow:
  1. A small conv head predicts a per-pixel error map from the coarse
     (alpha, rgb) pair at network resolution.
  2. The error map is pooled onto the full-res patch grid; the K worst
     patches are selected with jax.lax.top_k (K static -> static shapes,
     no retraces).
  3. The K patches are gathered from full-res (rgb, alpha_up), refined by a
     small conv net as ONE (N*K, P, P, C) batch (MXU-friendly — no Python
     per-patch loop), and scattered back with feathered edges.

Everything is jit-compatible; patch gather/scatter uses dynamic_slice under
lax.scan over the static K.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vidmat.models.layers import ConvBNAct
from vidmat.ops.resize import resize_bilinear


class ErrorHead(nn.Module):
    """Predict per-pixel refinement-need from (rgb_lr, alpha_lr)."""

    @nn.compact
    def __call__(self, rgb_lr: jax.Array, alpha_lr: jax.Array) -> jax.Array:
        x = jnp.concatenate([rgb_lr, alpha_lr], axis=-1)
        x = ConvBNAct(16, name="c1")(x)
        e = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="c2")(x)
        return jax.nn.relu(e)


class PatchRefineNet(nn.Module):
    """Refine one full-res patch given (rgb, alpha_up): residual alpha."""

    features: int = 24

    @nn.compact
    def __call__(self, patches: jax.Array) -> jax.Array:
        x = ConvBNAct(self.features, name="c1")(patches)
        x = ConvBNAct(self.features, name="c2")(x)
        x = ConvBNAct(self.features, name="c3")(x)
        res = nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="head")(x)
        return res


def _feather(p: int, band: int) -> np.ndarray:
    ramp = np.ones(p, np.float32)
    if band > 0:
        e = np.linspace(1.0 / (band + 1), 1.0, band, dtype=np.float32)
        ramp[:band] = e
        ramp[-band:] = e[::-1]
    return (ramp[:, None] * ramp[None, :])[..., None]


class ErrorMapRefiner(nn.Module):
    """Full error-map refinement stage.

    __call__(rgb_full, rgb_lr, alpha_lr) -> (alpha_full, error_map)
      rgb_full: (N, H, W, 3); rgb_lr/alpha_lr at network res.
    K patches of size P are refined at full res; alpha elsewhere is the
    bilinear upsample.
    """

    num_patches: int = 64
    patch_size: int = 16

    @nn.compact
    def __call__(self, rgb_full: jax.Array, rgb_lr: jax.Array,
                 alpha_lr: jax.Array) -> Tuple[jax.Array, jax.Array]:
        n, hf, wf, _ = rgb_full.shape
        p = self.patch_size
        k = self.num_patches

        err = ErrorHead(name="error_head")(rgb_lr, alpha_lr)
        alpha_up = resize_bilinear(alpha_lr, hf, wf)

        # Pool the error map onto the full-res patch grid.
        gh, gw = hf // p, wf // p
        err_full = resize_bilinear(err, gh, gw)[..., 0]  # (N, gh, gw)
        flat = err_full.reshape(n, gh * gw)
        _, idx = jax.lax.top_k(flat, k)  # (N, k)
        py = (idx // gw) * p
        px = (idx % gw) * p

        # Gather K patches per batch element: (N, K, P, P, 4)
        src = jnp.concatenate([rgb_full, alpha_up], axis=-1)

        def gather_one(src_b, py_b, px_b):
            def g(i):
                return jax.lax.dynamic_slice(src_b, (py_b[i], px_b[i], 0),
                                             (p, p, src_b.shape[-1]))
            return jax.vmap(g)(jnp.arange(k))

        patches = jax.vmap(gather_one)(src, py, px)
        patches = patches.reshape(n * k, p, p, src.shape[-1])

        res = PatchRefineNet(name="refine_net")(patches)
        res = res.reshape(n, k, p, p, 1)

        feather = jnp.asarray(_feather(p, max(2, p // 8)))

        # Scatter refined residuals back with feathered blending.
        def scatter_one(alpha_b, res_b, py_b, px_b):
            def body(carry, i):
                cur = jax.lax.dynamic_slice(carry, (py_b[i], px_b[i], 0),
                                            (p, p, 1))
                upd = cur + res_b[i] * feather
                return jax.lax.dynamic_update_slice(
                    carry, upd, (py_b[i], px_b[i], 0)), None
            out, _ = jax.lax.scan(body, alpha_b, jnp.arange(k))
            return out

        alpha = jax.vmap(scatter_one)(alpha_up, res, py, px)
        return jnp.clip(alpha, 0.0, 1.0), err
