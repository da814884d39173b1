"""Fused composite + quantize + RGBA pack kernel (BASELINE.json:5: "fused
Pallas kernels that emit composited RGBA directly").

TPU-first layout decision: instead of materializing an (H, W, 4) uint8
tensor (minor dim 4 wastes 124 of 128 lanes), the kernel consumes planar
(C, H, W) float inputs (W in lanes) and emits one (H, W) uint32 per pixel
with the four channels packed by integer shifts in the VPU:

    word = R | G << 8 | B << 16 | A << 24   (little-endian RGBA)

The host views the uint32 array as (H, W, 4) uint8 with zero copy
(np.ndarray.view). Channel interleaving therefore costs integer ALU ops
instead of a strided relayout — the kernel is a single HBM read per input
and a single write of the packed output.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _composite_kernel(fgr_ref, alpha_ref, bg_ref, out_ref, *,
                      bg_mode: str = "color"):
    a = alpha_ref[0]  # (Th, W)
    # Mosaic lacks a direct f32->u32 cast; quantized values are in [0, 255]
    # so a signed i32 cast followed by a reinterpret is exact.
    word = jnp.zeros(a.shape, jnp.int32)
    if bg_mode == "color":
        use_bg = bg_ref[0, 3] > 0.5  # flag channel: bg valid
    for c in range(3):
        f = fgr_ref[c]
        if bg_mode == "image":
            # per-pixel background replacement: bg_ref is the (3, Th, W)
            # planar bg tile riding the same row grid as fgr
            rgb = f * a + bg_ref[c] * (1.0 - a)
        else:
            bg_c = bg_ref[0, c]
            rgb = jnp.where(use_bg, f * a + bg_c * (1.0 - a), f * a)
        q = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0).astype(jnp.int32)
        word = word | (q << (8 * c))
    qa = jnp.round(jnp.clip(a, 0.0, 1.0) * 255.0).astype(jnp.int32)
    out_ref[...] = pltpu.bitcast(word | (qa << 24), jnp.uint32)


@functools.partial(jax.jit, static_argnames=("bg_mode", "interpret"))
def _composite_call(fgr_chw: jax.Array, alpha_hw: jax.Array,
                    bg: jax.Array, bg_mode: str = "color",
                    interpret: bool = False) -> jax.Array:
    c, h, w = fgr_chw.shape
    # Pick the largest tile height that divides h AND keeps the working set
    # (fgr 3ch f32 + alpha f32 + u32 out — plus the 3ch f32 bg tile in
    # image mode — all double-buffered) under the 16MB scoped-VMEM budget;
    # 4K-wide frames overflowed with fixed 128-row tiles. Lanes pad w up
    # to a multiple of 128, so budget against the padded width (ADVICE
    # round 2: w=1936 pads to 2048 lanes).
    w_pad = -(-w // 128) * 128
    planes = 8 if bg_mode == "image" else 5
    budget_rows = max(8, (6 * 1024 * 1024) // (w_pad * 4 * planes))
    tile_h = 8
    for cand in (256, 128, 64, 32, 16, 8):
        if h % cand == 0 and cand <= budget_rows:
            tile_h = cand
            break
    grid = (h // tile_h,)
    bg_spec = (pl.BlockSpec((3, tile_h, w), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
               if bg_mode == "image" else
               pl.BlockSpec((1, 4), lambda i: (0, 0),
                            memory_space=pltpu.SMEM))
    kernel = functools.partial(_composite_kernel, bg_mode=bg_mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, tile_h, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            bg_spec,
        ],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fgr_chw, alpha_hw[None], bg)


def composite_rgba_packed(fgr: jax.Array, alpha: jax.Array,
                          bg: Optional[jax.Array] = None,
                          interpret: bool = False) -> jax.Array:
    """Fused composite producing packed RGBA words.

    fgr: (N, H, W, 3) float [0,1]; alpha: (N, H, W, 1)
    bg:  (3,) color, (H, W, 3) replacement image shared across the batch,
         (N, H, W, 3) per-frame replacement images (e.g. the blurred
         source frames of the portrait-blur path), or None (premultiplied
         output)
    Returns (N, H, W) uint32; view as uint8 RGBA via
    ``np.asarray(out).view(np.uint8).reshape(N, H, W, 4)``.
    """
    fgr_chw = jnp.transpose(fgr.astype(jnp.float32), (0, 3, 1, 2))
    alpha_hw = alpha.astype(jnp.float32)[..., 0]
    if bg is not None and jnp.ndim(bg) == 4:
        bg_p = jnp.transpose(jnp.asarray(bg, jnp.float32), (0, 3, 1, 2))
        fn = jax.vmap(lambda f, a, b: _composite_call(
            f, a, b, bg_mode="image", interpret=interpret))
        return fn(fgr_chw, alpha_hw, bg_p)
    if bg is not None and jnp.ndim(bg) == 3:
        bg_p = jnp.transpose(jnp.asarray(bg, jnp.float32), (2, 0, 1))
        fn = jax.vmap(lambda f, a: _composite_call(
            f, a, bg_p, bg_mode="image", interpret=interpret))
        return fn(fgr_chw, alpha_hw)
    if bg is None:
        bg4 = jnp.zeros((4,), jnp.float32)
    else:
        bg4 = jnp.concatenate([jnp.asarray(bg, jnp.float32),
                               jnp.ones((1,), jnp.float32)])
    fn = jax.vmap(lambda f, a: _composite_call(f, a, bg4[None],
                                               interpret=interpret))
    return fn(fgr_chw, alpha_hw)


def unpack_rgba_host(packed: np.ndarray) -> np.ndarray:
    """Zero-copy host view of packed words as (N, H, W, 4) uint8 RGBA."""
    arr = np.ascontiguousarray(packed)
    return arr.view(np.uint8).reshape(*arr.shape, 4)
