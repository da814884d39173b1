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


def _inv_norm(layout: TileLayout) -> np.ndarray:
    """Precomputed reciprocal of the summed feather weights (1, H, W, 1).

    The normalizer depends only on the (static) layout, so it is built on
    host with numpy and baked into the compiled program as a constant —
    the runtime blend is then pure weighted accumulate + one multiply,
    half the dynamic-update-slice traffic of accumulating norm on device.
    """
    th, tw = layout.tile_h, layout.tile_w
    weight = _feather_weight(th, tw, layout.overlap)
    norm = np.zeros((layout.h, layout.w), np.float32)
    for y in layout.ys:
        for x in layout.xs:
            norm[y:y + th, x:x + tw] += weight
    return (1.0 / norm)[None, :, :, None]


def _segments(starts: Tuple[int, ...], tsize: int, total: int):
    """Static decomposition of [0, total) into maximal segments with a
    CONSTANT set of covering tiles. Returns [(seg_start, seg_len,
    [(tile_idx, local_offset), ...])]. With the standard overlapped grid
    each segment is covered by 1 or 2 tiles (more if tiles overlap deeply
    — handled generically)."""
    cuts = sorted({0, total} | {s for s in starts} | {s + tsize
                                                      for s in starts})
    segs = []
    for a, b in zip(cuts[:-1], cuts[1:]):
        if a >= total or b <= 0:
            continue
        cover = [(i, a - s) for i, s in enumerate(starts)
                 if s <= a and b <= s + tsize]
        segs.append((a, b - a, cover))
    return segs


def untile_frame(tiles: jax.Array, layout: TileLayout, n: int) -> jax.Array:
    """Inverse of tile_frame with feathered overlap blending.

    tiles: (N * num_tiles, tile, tile, C) -> (N, H, W, C)

    The overlap-blend scatter is reformulated as a STATIC segment
    decomposition: the frame splits (per axis) into segments whose covering
    tile set is constant, so the blend is `concat(sum of <=2 weighted tile
    slices per segment)` — every byte is written exactly once, with no
    read-modify-write chain. The naive dynamic-update-slice accumulation
    this replaces measured 28x off the HBM roofline at 4K (XLA copies the
    full accumulator per update — tools/bench_tiling.py, docs/
    PERFORMANCE.md); this form is single-pass. The sum-of-feather-weights
    normalizer depends only on the layout and is baked in as a host
    constant (_inv_norm).
    """
    th, tw = layout.tile_h, layout.tile_w
    c = tiles.shape[-1]
    nx = len(layout.xs)
    weight = jnp.asarray(
        _feather_weight(th, tw, layout.overlap))[None, :, :, None]
    xsegs = _segments(layout.xs, tw, layout.w)
    ysegs = _segments(layout.ys, th, layout.h)

    def xstrip(iy: int) -> jax.Array:
        """Tile row iy composed along x: (n, th, W, c)."""
        parts = []
        for _, slen, cover in xsegs:
            acc = None
            for jx, off in cover:
                t = tiles[(iy * nx + jx) * n:(iy * nx + jx + 1) * n]
                part = (t[:, :, off:off + slen]
                        * weight[:, :, off:off + slen])
                acc = part if acc is None else acc + part
            parts.append(acc)
        return jnp.concatenate(parts, axis=2)

    strips = {iy: xstrip(iy)
              for iy in range(len(layout.ys))}
    rows = []
    for _, slen, cover in ysegs:
        acc = None
        for iy, off in cover:
            part = strips[iy][:, off:off + slen]
            acc = part if acc is None else acc + part
        rows.append(acc)
    out = jnp.concatenate(rows, axis=1)
    return out * jnp.asarray(_inv_norm(layout), tiles.dtype)


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
                          impl: str = "xla", interpret: bool = False):
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
                                   impl=impl, interpret=interpret)
    alpha = untile_frame(a_ref, layout, n)
    fgr = untile_frame(f_ref, layout, n)
    return alpha, fgr
