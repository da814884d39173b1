"""4K tiled inference with overlap blending (BASELINE.json:10).

TPU-first design (SURVEY.md §3.3): tiles become a batch dimension — one
batched (vmapped/implicitly-batched) call over all tiles keeps the MXU fed
with large uniform work instead of a Python tile loop; the overlap blend is
a feathered weighted scatter-add, precomputed as a constant weight mask so
XLA folds it into the gather/scatter epilogue.

Static shapes throughout: the tile grid is computed at trace time from the
(static) frame shape, so there is exactly one compiled program per
resolution bucket (SURVEY.md §7 'avoiding retraces').
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TileLayout:
    """Static tile grid for (h, w) with tile size t and overlap v.

    Tiles are placed at stride (t - v); the last row/col is clamped so tiles
    never run off the frame (their overlap with the previous tile simply
    grows). All geometry is Python ints — static under jit.
    """

    h: int
    w: int
    tile: int
    overlap: int

    @property
    def tile_h(self) -> int:
        return min(self.tile, self.h)

    @property
    def tile_w(self) -> int:
        return min(self.tile, self.w)

    @property
    def ys(self) -> Tuple[int, ...]:
        return self._starts(self.h, self.tile_h)

    @property
    def xs(self) -> Tuple[int, ...]:
        return self._starts(self.w, self.tile_w)

    def _starts(self, size: int, tile: int) -> Tuple[int, ...]:
        stride = tile - self.overlap
        if size <= tile:
            return (0,)
        starts = list(range(0, size - tile, stride))
        starts.append(size - tile)
        return tuple(starts)

    @property
    def num_tiles(self) -> int:
        return len(self.ys) * len(self.xs)


def _ramp(size: int, overlap: int) -> np.ndarray:
    ramp = np.ones(size, np.float32)
    if overlap > 0 and size > overlap * 2:
        e = np.linspace(1.0 / (overlap + 1), 1.0, overlap, dtype=np.float32)
        ramp[:overlap] = e
        ramp[-overlap:] = e[::-1]
    return ramp


def _feather_weight(tile_h: int, tile_w: int, overlap: int) -> np.ndarray:
    """2D feather mask: linear ramp over the overlap band on each edge.

    Interior tiles then blend with sum-of-weights normalization; the
    normalizer is precomputed per layout so the runtime cost is one
    multiply-add per pixel.
    """
    return _ramp(tile_h, overlap)[:, None] * _ramp(tile_w, overlap)[None, :]


def tile_frame(frame: jax.Array, layout: TileLayout) -> jax.Array:
    """(N, H, W, C) -> (N * num_tiles, tile, tile, C) tile batch."""
    n, h, w, c = frame.shape
    th, tw = layout.tile_h, layout.tile_w
    tiles = []
    for y in layout.ys:
        for x in layout.xs:
            tiles.append(
                jax.lax.slice(frame, (0, y, x, 0), (n, y + th, x + tw, c)))
    return jnp.concatenate(tiles, axis=0)


def untile_frame(tiles: jax.Array, layout: TileLayout, n: int) -> jax.Array:
    """Inverse of tile_frame with feathered overlap blending.

    tiles: (N * num_tiles, tile, tile, C) -> (N, H, W, C)
    """
    th, tw = layout.tile_h, layout.tile_w
    c = tiles.shape[-1]
    weight = jnp.asarray(
        _feather_weight(th, tw, layout.overlap))[None, :, :, None]

    acc = jnp.zeros((n, layout.h, layout.w, c), tiles.dtype)
    norm = jnp.zeros((n, layout.h, layout.w, 1), tiles.dtype)
    i = 0
    for y in layout.ys:
        for x in layout.xs:
            tb = tiles[i * n:(i + 1) * n] * weight
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(
                    acc, (0, y, x, 0), (n, th, tw, c)) + tb, (0, y, x, 0))
            norm = jax.lax.dynamic_update_slice(
                norm, jax.lax.dynamic_slice(
                    norm, (0, y, x, 0), (n, th, tw, 1)) + weight, (0, y, x, 0))
            i += 1
    return acc / norm


def tiled_apply(fn, frame: jax.Array, tile: int, overlap: int) -> jax.Array:
    """Apply a stateless per-tile function over a frame with overlap blending.

    fn: (B, tile, tile, Cin) -> (B, tile, tile, Cout), applied to ALL tiles
    as one batch (MXU-friendly).
    """
    n, h, w, _ = frame.shape
    layout = TileLayout(h, w, tile, overlap)
    tiles = tile_frame(frame, layout)
    out_tiles = fn(tiles)
    return untile_frame(out_tiles, layout, n)


def tiled_guided_upsample(frame: jax.Array, alpha_lr: jax.Array,
                          fgr_lr: jax.Array, tile: int, overlap: int,
                          radius: int = 4, eps: float = 1e-4,
                          impl: str = "xla"):
    """Tiled/patch full-res guided refinement with overlap blending
    (BASELINE.json:10): each full-res tile is refined against its own
    coarse crop, all tiles as ONE batch, then feather-blended.

    The guided filter is a local operator (window 2r+1), so per-tile
    statistics with overlap >= 2 * radius * pool match the whole-frame
    filter away from numerical noise — this path exists to bound memory at
    very large resolutions (6K/8K) where whole-frame full-res intermediates
    would pressure HBM.

    frame: (N, H, W, 3) float32; alpha_lr/fgr_lr at H/pool x W/pool with an
    integer pool; tile and overlap must be divisible by pool.
    """
    from vidmat.ops.guided_filter import guided_upsample

    n, h, w, _ = frame.shape
    nl, hl, wl, _ = alpha_lr.shape
    pool = h // hl
    if h % hl or w % wl or tile % pool or overlap % pool:
        raise ValueError("tile/overlap must align with the coarse pool")

    layout = TileLayout(h, w, tile, overlap)
    lr_layout = TileLayout(hl, wl, tile // pool, overlap // pool)
    if (len(layout.ys) != len(lr_layout.ys)
            or len(layout.xs) != len(lr_layout.xs)):
        raise ValueError("tile grid mismatch between full and coarse res; "
                         "choose tile/overlap so both grids align")

    tiles = tile_frame(frame, layout)
    a_tiles = tile_frame(alpha_lr, lr_layout)
    f_tiles = tile_frame(fgr_lr, lr_layout)
    a_ref, f_ref = guided_upsample(tiles, a_tiles, f_tiles, radius, eps,
                                   impl=impl)
    alpha = untile_frame(a_ref, layout, n)
    fgr = untile_frame(f_ref, layout, n)
    return alpha, fgr
