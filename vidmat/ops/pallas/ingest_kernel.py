"""Fused frame-ingest kernel: uint8 -> area-downsample -> normalize -> bf16
(BASELINE.json:5 "fused Pallas frame-ingest stage (decode -> resize ->
normalize -> tensor pack)").

Layout: operates on planar (C, H, W) uint8 (the NHWC->planar pack is a
single XLA transpose fused into the surrounding graph; W stays in lanes for
the kernel). Downsampling is s x s area pooling (s in {1, 2, 4, 8}) — the
correct antialiased semantics for the power-of-two coarse-pass ratios the
workload ladder pins (ds = 0.5 / 0.25 / 0.125, BASELINE.json:9-10); the
generic-ratio path stays on jax.image.resize.

Per-channel normalize (x * scale_c + offset_c) covers both the [0,1]
convention (scale = 1/255) and mean/std whitening.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ingest_kernel(img_ref, params_ref, out_ref, *, pool: int,
                   out_dtype):
    c = pl.program_id(0)
    # Mosaic has no direct u8->f32 cast; widen through i32 (exact for u8).
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)  # (Th*pool, W)
    if pool > 1:
        # Area pooling as two matmuls with 0/1 pooling matrices generated
        # from iota in-register: out = A @ x @ B. Strided slices/reshapes
        # lower to unsupported gathers on Mosaic; matmuls ride the MXU.
        th_s, w = x.shape
        th, ow = th_s // pool, w // pool
        a_rows = jax.lax.broadcasted_iota(jnp.int32, (th, th_s), 0)
        a_cols = jax.lax.broadcasted_iota(jnp.int32, (th, th_s), 1)
        A = (a_cols // pool == a_rows).astype(jnp.float32)
        b_rows = jax.lax.broadcasted_iota(jnp.int32, (w, ow), 0)
        b_cols = jax.lax.broadcasted_iota(jnp.int32, (w, ow), 1)
        B = (b_rows // pool == b_cols).astype(jnp.float32)
        x = jnp.dot(jnp.dot(A, x, preferred_element_type=jnp.float32), B,
                    preferred_element_type=jnp.float32)
        x = x * (1.0 / (pool * pool))
    scale = params_ref[0, c]
    offset = params_ref[1, c]
    out_ref[0] = (x * scale + offset).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("pool", "out_dtype", "interpret"))
def _ingest_call(img_chw: jax.Array, params: jax.Array, pool: int,
                 out_dtype, interpret: bool = False) -> jax.Array:
    c, h, w = img_chw.shape
    oh, ow = h // pool, w // pool
    tile_oh = oh
    for cand in (256, 128, 64, 32, 16, 8):
        if oh % cand == 0:
            tile_oh = cand
            break
    grid = (c, oh // tile_oh)
    kernel = functools.partial(_ingest_kernel, pool=pool,
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, oh, ow), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_oh * pool, w), lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda ci, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_oh, ow), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_chw, params)


def ingest_pool_normalize(frames_u8: jax.Array, pool: int = 1,
                          scale=None, offset=None,
                          out_dtype=jnp.bfloat16,
                          interpret: bool = False) -> jax.Array:
    """Fused ingest: (N, H, W, 3) uint8 -> (N, H/pool, W/pool, 3) normalized.

    Default normalization maps to [0, 1] (scale = 1/255, offset = 0);
    pass per-channel ``scale``/``offset`` (3,) for mean/std whitening.
    """
    n, h, w, c = frames_u8.shape
    if h % pool or w % pool:
        raise ValueError(f"frame {h}x{w} not divisible by pool {pool}")
    if scale is None:
        scale = jnp.full((c,), 1.0 / 255.0, jnp.float32)
    if offset is None:
        offset = jnp.zeros((c,), jnp.float32)
    params = jnp.stack([jnp.asarray(scale, jnp.float32),
                        jnp.asarray(offset, jnp.float32)])
    planar = jnp.transpose(frames_u8, (0, 3, 1, 2))
    fn = jax.vmap(lambda im: _ingest_call(im, params, pool, out_dtype,
                                          interpret=interpret))
    out = fn(planar)
    return jnp.transpose(out, (0, 2, 3, 1))
