"""Fused frame-ingest kernel: uint8 -> area-downsample -> normalize -> bf16
(BASELINE.json:5 "fused Pallas frame-ingest stage (decode -> resize ->
normalize -> tensor pack)").

Layout: operates on planar (C, H, W) uint8 (the NHWC->planar pack is a
single XLA transpose fused into the surrounding graph; W stays in lanes for
the kernel). Downsampling is s x s area pooling (s in {1, 2, 4, 8}) — the
correct antialiased semantics for the power-of-two coarse-pass ratios the
workload ladder pins (ds = 0.5 / 0.25 / 0.125, BASELINE.json:9-10); the
generic-ratio path stays on jax.image.resize.

Pooling runs as two matmuls with 0/1 pooling matrices, out = A @ x @ B —
strided slices/reshapes lower to unsupported gathers on Mosaic; matmuls
ride the MXU. Round-3 restructuring (tools/bench_tail_kernels.py): the
matrices are built ONCE in XLA and passed as constant operands (the first
cut built B — ~1M elements of iota/compare at 1080p — inside EVERY grid
program), row tiles are divisor-aware (272 coarse rows forced the old
power-of-two tile to 16 -> 51 tiny programs; now 136 -> 6), and the dots
stay f32 (explicit bf16 operand casts measured slower — relayout cost;
docs/PERFORMANCE.md round 3).

Per-channel normalize (x * scale_c + offset_c) covers both the [0,1]
convention (scale = 1/255) and mean/std whitening.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ingest_kernel(img_ref, a_ref, b_ref, params_ref, out_ref, *,
                   pool: int, out_dtype, mxu_bf16: bool = False):
    ci = pl.program_id(0)
    # Mosaic has no direct u8->f32 cast; widen through i32 (exact for u8).
    x = img_ref[0].astype(jnp.int32).astype(jnp.float32)
    if pool > 1:
        f32 = jnp.float32
        if mxu_bf16:
            # BIT-EXACT bf16 formulation (kept as the measured
            # alternative — slower on v5e, tools/bench_tail_kernels.py):
            # 0/1 matrices and u8 integer values are exact in bf16 and
            # the MXU accumulates in f32, so the row pass is exact; its
            # sums (<= 255*pool) exceed bf16's 8 significand bits, so the
            # column pass splits hi (multiples of pool) + lo (integers
            # < pool), both exact.
            bf = jnp.bfloat16
            x1 = jnp.dot(a_ref[...].astype(bf), x.astype(bf),
                         preferred_element_type=f32)
            hi = jnp.floor(x1 * (1.0 / pool)) * pool
            lo = x1 - hi
            bb = b_ref[...].astype(bf)
            x = (jnp.dot(hi.astype(bf), bb, preferred_element_type=f32)
                 + jnp.dot(lo.astype(bf), bb, preferred_element_type=f32))
        else:
            x = jnp.dot(jnp.dot(a_ref[...], x, preferred_element_type=f32),
                        b_ref[...], preferred_element_type=f32)
        x = x * (1.0 / (pool * pool))
    scale = params_ref[0, ci]
    offset = params_ref[1, ci]
    out_ref[0] = (x * scale + offset).astype(out_dtype)


def _pick_tile_oh(oh: int, pool: int, w: int,
                  budget: int = 12 * 2**20):
    """Largest row tile that keeps one program's resident set under the
    scoped-VMEM budget: double-buffered u8 input block, the f32 widened
    block + row-pooled temp, the constant A (th, th*pool) and B (w, ow)
    pooling matrices, and the double-buffered output block (counted f32 —
    out_dtype may be). Tiles must divide oh AND satisfy Mosaic's block
    rule (second-to-last block dim % 8 == 0, or the full dim). Returns
    None when NO legal tile fits (e.g. oh with no %8 divisor at a large
    resolution, or B alone over budget) — the caller falls back to the
    XLA pooling path instead of a Mosaic scoped-VMEM compile failure."""
    ow = w // pool

    def est(th):
        return (2 * th * pool * w              # u8 input, double-buffered
                + th * pool * w * 4            # f32 widen
                + th * w * 4                   # A @ x temp
                + (th * th * pool * 4 + w * ow * 4 if pool > 1 else 0)
                + 2 * th * ow * 4)             # out block (f32 worst), dbuf
    cands = sorted((d for d in range(1, oh + 1)
                    if oh % d == 0 and (d % 8 == 0 or d == oh)),
                   reverse=True)
    return next((d for d in cands if est(d) <= budget), None)


def _pool_matrices(th_s: int, w: int, pool: int):
    """0/1 area-pooling matrices A (th, th_s) row-sum and B (w, ow)
    column-sum, built once in XLA (f32)."""
    th, ow = th_s // pool, w // pool
    a_rows = jax.lax.broadcasted_iota(jnp.int32, (th, th_s), 0)
    a_cols = jax.lax.broadcasted_iota(jnp.int32, (th, th_s), 1)
    A = (a_cols // pool == a_rows).astype(jnp.float32)
    b_rows = jax.lax.broadcasted_iota(jnp.int32, (w, ow), 0)
    b_cols = jax.lax.broadcasted_iota(jnp.int32, (w, ow), 1)
    B = (b_rows // pool == b_cols).astype(jnp.float32)
    return A, B


@functools.partial(jax.jit,
                   static_argnames=("pool", "out_dtype", "interpret",
                                    "mxu_bf16"))
def _ingest_call(img_chw: jax.Array, params: jax.Array, pool: int,
                 out_dtype, interpret: bool = False,
                 mxu_bf16: bool = False) -> jax.Array:
    c, h, w = img_chw.shape
    oh, ow = h // pool, w // pool
    tile_oh = _pick_tile_oh(oh, pool, w)
    assert tile_oh is not None  # caller (ingest_pool_normalize) checked
    grid = (c, oh // tile_oh)
    A, B = (_pool_matrices(tile_oh * pool, w, pool) if pool > 1
            else (jnp.zeros((8, 128), jnp.float32),) * 2)
    kernel = functools.partial(_ingest_kernel, pool=pool,
                               out_dtype=out_dtype, mxu_bf16=mxu_bf16)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, oh, ow), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_oh * pool, w), lambda ci, i: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            const,
            const,
            pl.BlockSpec((2, c), lambda ci, i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_oh, ow), lambda ci, i: (ci, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_chw, A, B, params)


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
    if pool > 1 and _pick_tile_oh(h // pool, pool, w) is None:
        # No legal Mosaic tiling fits scoped VMEM at this geometry (rare:
        # an oh with no %8 divisor at a large resolution, or the column
        # pooling matrix alone over budget). XLA's reshape-mean area pool
        # is exact and fuses with the normalize — correct, just not the
        # kernel path.
        x = frames_u8.astype(jnp.float32).reshape(
            n, h // pool, pool, w // pool, pool, c).mean((2, 4))
        sc = jnp.asarray(scale, jnp.float32)
        off = jnp.asarray(offset, jnp.float32)
        return (x * sc + off).astype(out_dtype)
    params = jnp.stack([jnp.asarray(scale, jnp.float32),
                        jnp.asarray(offset, jnp.float32)])
    planar = jnp.transpose(frames_u8, (0, 3, 1, 2))
    fn = jax.vmap(lambda im: _ingest_call(im, params, pool, out_dtype,
                                          interpret=interpret))
    out = fn(planar)
    return jnp.transpose(out, (0, 2, 3, 1))
