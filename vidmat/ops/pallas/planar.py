"""Production planar conv kernels: the round-2 path of conv_kernel.py.

Why (docs/PERFORMANCE.md "next structural target"): XLA's lowering of
small-channel NHWC convs moves ~27x the real bytes — channels sit in lanes
and are padded to 128, so HBM traffic scales with H*W*128 regardless of C.
The serving net still pays ~950 MB/frame of padded traffic after round 1's
tail fusion.

Layout: **flattened pitch-aligned planes** ``(C, TOTAL)``:

  - each image row occupies ``pitch = roundup(W+2, 128)`` lanes (one zero
    pad column each side + alignment zeros), so row-offset taps (dy) are
    128-aligned slices — free on Mosaic; only dx = +-1 taps need a lane
    relayout;
  - rows are flattened: P = (H+2)*pitch, rounded up to the lane-chunk
    size BLOCK, with a BLOCK-sized zero margin on each end, so the SAME
    (C, TOTAL) shape is both a kernel input and a kernel output — layers
    chain with zero glue copies;
  - pixels live in lanes (waste bounded by the pitch remainder, ~6%),
    channels in sublanes (no 128x padding).

In this layout a KxK convolution is::

    out[:, chunk] = sum_over_taps  W_tap @ x[:, chunk + offset_tap]

 - the grid runs over lane chunks of BLOCK pixels; each chunk does one
   aligned dynamic window read per input plane and T static value slices
   (bounded VMEM temps — a full-plane roll formulation exceeded the 16 MB
   scoped budget at 144x240 grids, and Mosaic requires dynamic lane-slice
   starts to be provably 128-aligned);
 - each tap is one (C_out, C_in) x (C_in, BLOCK) MXU matmul, f32 accum;
 - the zero pad ring makes every interior output correct with no per-tap
   masking; ONE interior-mask multiply at the end re-zeroes pad/margin
   positions, preserving the chaining invariant (margins chunks skip
   compute entirely and just write zeros).

Concatenation inputs (decoder skips, GRU [x, h]) never materialize: a conv
over a concat is the sum of per-plane tap matmuls (linearity), so the
kernel takes a LIST of input planes with per-plane weight stacks.

Stride-2 convs are handled by the caller as 4-tap convs on a
space-to-depth-packed plane with rearranged weights (see
stride2_tap_weights), so this kernel only ever sees stride 1.

Measured on TPU v5e (tools/bench_planar.py, bf16, per layer inside a
30-deep chain): 144x240x16->16 0.009-0.012 ms vs XLA 0.025-0.039 (2-3x),
HBM 2.5 MB vs 21.5 MB; 144x240x36->36 1.2-1.4x; 72x120x40 1.1-2x.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane-chunk size: each grid program emits (C_out, BLOCK) pixels. Large
# enough for MXU-efficient matmul N dims and to amortize slice relayouts,
# small enough that per-chunk temporaries stay well under VMEM limits.
# Also the zero-margin size on each plane end (must be >= the aligned tap
# window reach, pitch + 128). Env-tunable for the block-size sweep
# (tools/bench_block_size.py) — the serving grids are overhead-bound
# (a 16ch layer measures ~3x its byte roofline at batch 8), so the chunk
# size trades per-program overhead against margin waste and VMEM.
import os as _os

BLOCK = int(_os.environ.get("VIDMAT_PLANAR_BLOCK", "4096"))
if BLOCK < 512 or BLOCK % 128:
    # Explicit raise (not assert — python -O strips asserts): the margin
    # invariant needs BLOCK >= the aligned tap reach of every grid served
    # (pitch + 128); 512 admits only tiny toy widths, anything lower is
    # never valid.
    raise ValueError(f"VIDMAT_PLANAR_BLOCK={BLOCK}: must be a positive "
                     "multiple of 128, >= 512")


def _align128(n: int) -> int:
    return -(-n // 128) * 128


def plane_sizes(h: int, w: int) -> Tuple[int, int, int]:
    """(pitch, P, TOTAL) for an (h, w) interior grid."""
    pitch = _align128(w + 2)
    p = (h + 2) * pitch
    p_pad = -(-p // BLOCK) * BLOCK
    return pitch, p, BLOCK + p_pad + BLOCK


def conv3x3_taps(w: int) -> Tuple[int, Tuple[int, ...], Tuple[int, ...]]:
    """Tap structure (pitch, dys, dxs) for a 3x3 stride-1 conv on an
    interior width w; weights ordered [dy, dx] row-major
    (conv_tap_weights)."""
    return (_align128(w + 2), (-1, 0, 1), (-1, 0, 1))


def stride2_taps(w_packed: int) -> Tuple[int, Tuple[int, ...],
                                         Tuple[int, ...]]:
    """Tap structure matching stride2_tap_weights on the packed plane of
    interior width w_packed = W/2."""
    return (_align128(w_packed + 2), (-1, 0), (-1, 0))


def conv1x1_taps(w: int) -> Tuple[int, Tuple[int, ...], Tuple[int, ...]]:
    """Tap structure for a 1x1 conv (single centered tap)."""
    return (_align128(w + 2), (0,), (0,))


def _load_window(ref, base, align, block):
    """Aligned dynamic window read around a chunk (Mosaic requires dynamic
    lane-slice starts to be provably 128-aligned; base and align are
    multiples of 128)."""
    start = pl.multiple_of(base - align, 128)
    return ref[:, pl.ds(start, block + 2 * align)]


def _tap_accum(win, w, taps, align, block, start=0, size=None):
    """sum over (dy, dx) taps of w[t] @ win[:, tap region].

    One lane relayout per DISTINCT dx (the d-shifted sub-window); every dy
    tap is then a free 128-aligned static slice of it. This is the
    kernel's VPU hot spot — 2 shifted sub-windows instead of 6 per-tap
    relayouts for a 3x3.
    """
    pitch, dys, dxs = taps
    size = block if size is None else size
    c = win.shape[0]
    reach = max(-min(dys), max(dys)) * pitch
    acc = None
    for j, d in enumerate(dxs):
        s0 = align + start + d - reach
        sub = jax.lax.slice(win, (0, s0), (c, s0 + size + 2 * reach))
        for i, dy in enumerate(dys):
            t = i * len(dxs) + j
            xo = (dy * pitch) + reach
            xt = jax.lax.slice(sub, (0, xo), (c, xo + size))
            part = jnp.dot(w[t], xt, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc


def taps_align(taps) -> int:
    pitch, dys, dxs = taps
    reach = max(-min(dys), max(dys)) * pitch + max(-min(dxs), max(dxs))
    return _align128(max(reach, 1))


def taps_halo(taps) -> int:
    pitch, dys, dxs = taps
    return max(-min(dys), max(dys)) * pitch + max(-min(dxs), max(dxs))


def _conv_kernel(*refs, taps, n_in, act, block, align):
    # refs: x_0..x_{n-1} (C_i, TOTAL), w_0..w_{n-1} (T, C_out, C_i),
    #       scale (C_out, 1), bias (C_out, 1), mask (1, BLOCK),
    #       out (C_out, BLOCK)
    xs = refs[:n_in]
    ws = refs[n_in:2 * n_in]
    scale_ref, bias_ref, mask_ref, out_ref = refs[2 * n_in:]
    i = pl.program_id(0)
    margin = jnp.logical_or(i == 0, i == pl.num_programs(0) - 1)

    @pl.when(margin)
    def _():
        # Margin chunks only uphold the zero invariant; no compute (their
        # window reads would also fall off the plane ends).
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(margin))
    def _():
        base = i * block
        acc = None
        for x_ref, w_ref in zip(xs, ws):
            w = w_ref[...]  # plane dtype (bf16 on the serving path)
            win = _load_window(x_ref, base, align, block)
            part = _tap_accum(win, w, taps, align, block)
            acc = part if acc is None else acc + part
        out = acc * scale_ref[...] + bias_ref[...]
        if act == "relu":
            out = jnp.maximum(out, 0.0)
        out_ref[...] = (out * mask_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "act", "out_dtype",
                                             "interpret"))
def planar_conv(xs: Sequence[jax.Array], ws: Sequence[jax.Array],
                taps, scale: jax.Array, bias: jax.Array,
                mask: jax.Array, act: str = "relu",
                out_dtype=None, interpret: bool = False) -> jax.Array:
    """Fused multi-plane tap-conv + affine + activation + interior mask.

    xs:      input planes [(C_i, TOTAL)] (build with to_planar; kernel
             outputs chain directly).
    ws:      per-plane tap weight stacks [(T, C_out, C_i)], plane dtype.
    taps:    static tap structure (pitch, dys, dxs) — conv3x3_taps /
             stride2_taps / conv1x1_taps.
    scale/bias: (C_out, 1) f32 — the BN-folded affine (1/0 for a plain
             conv with its bias in `bias`).
    mask:    (1, TOTAL) f32 interior mask (interior_mask).
    act:     "relu" | "none".
    Returns (C_out, TOTAL) in out_dtype (default xs[0].dtype).
    """
    xs = tuple(xs)
    ws = tuple(ws)
    c_out = ws[0].shape[1]
    total = xs[0].shape[1]
    assert total % BLOCK == 0 and mask.shape[1] == total
    out_dtype = out_dtype or xs[0].dtype
    n_in = len(xs)
    align = taps_align(taps)
    if BLOCK < align:
        raise ValueError(
            f"lane chunk BLOCK={BLOCK} < aligned tap reach {align} — grid "
            "too wide for this chunk size (raise VIDMAT_PLANAR_BLOCK)")
    kernel = functools.partial(_conv_kernel, taps=taps, n_in=n_in,
                               act=act, block=BLOCK, align=align)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    chunk = pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // BLOCK,),
        out_shape=jax.ShapeDtypeStruct((c_out, total), out_dtype),
        in_specs=[full] * (2 * n_in + 2) + [chunk],
        out_specs=pl.BlockSpec((c_out, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*xs, *ws, scale, bias, mask)


# Fusion pays a halo tax: the first stage is evaluated on a chunk
# extended by the second stage's reach, so the extra compute fraction is
# ~(extension / BLOCK). Measured (tools/bench_fused_pairs.py): at the
# 1080p serving geometry (pitches <= 256, extension <= 12.6%) fusion wins
# 1.03-1.08x; at the full-res 480p geometry (pitches up to 896, extension
# up to 44%) it LOSES 0.92x. The guards below cap the extension at 1/6 of
# the chunk — keeping every measured-win site and rejecting every
# measured-loss one.
_FUSE_HALO_BUDGET = BLOCK // 6


def conv2_fits(taps, taps2) -> bool:
    """True when a fused two-conv chain (planar_conv2) over these tap
    structures fits the BLOCK lane-chunk AND its halo-extension overhead
    (2 * second-conv reach) stays under the fusion budget — large pitches
    (e.g. level-0 of a full-res net) keep the two-call chain."""
    return (BLOCK >= _align128(taps_halo(taps) + taps_halo(taps2))
            and 2 * taps_halo(taps2) <= _FUSE_HALO_BUDGET)


def _conv2_kernel(*refs, taps, taps2, n_in, act, act2, block, halo, align):
    """Fused two-conv chain: y = conv2(act(affine1(conv1(xs)))).

    conv1 is evaluated on a halo-extended chunk (same pattern as the GRU's
    gate conv) so conv2's taps read in-register values; the mid plane
    never visits HBM. The mid value is masked with the interior mask
    (sliced from the full (1, TOTAL) ref) before conv2 — conv2's taps
    assume the zero-pad-ring invariant, exactly as if the mid plane had
    been written out by planar_conv.
    """
    # refs: x_0..x_{n-1}, w_0..w_{n-1}, scale1, bias1, w2 (T2, C2, C_mid),
    #       scale2, bias2, mask8 (8, TOTAL), mask (1, BLOCK) chunk,
    #       out (C2, BLOCK)
    xs = refs[:n_in]
    ws = refs[n_in:2 * n_in]
    (s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, maskf_ref, mask_ref,
     out_ref) = refs[2 * n_in:]
    i = pl.program_id(0)
    margin = jnp.logical_or(i == 0, i == pl.num_programs(0) - 1)

    @pl.when(margin)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(margin))
    def _():
        base = i * block
        ext = block + 2 * halo
        acc = None
        for x_ref, w_ref in zip(xs, ws):
            win = _load_window(x_ref, base, align, block)
            part = _tap_accum(win, w_ref[...], taps, align, block,
                              start=-halo, size=ext)
            acc = part if acc is None else acc + part
        mid = acc * s1_ref[...] + b1_ref[...]
        if act == "relu":
            mid = jnp.maximum(mid, 0.0)
        # Interior mask over the extended positions [base-halo, base+
        # block+halo): upholds the zero invariant the second conv relies
        # on; cast to the plane dtype so the fused chain is bit-identical
        # to two planar_conv calls. Mosaic cannot broadcast or slice a
        # lane-offset 1-row vector, so the mask ref carries 8 sublane rows
        # (mask8 on the host side); the misaligned ext slice and the
        # channel tiling then touch only full-rank tensors — the same
        # lowering pattern as the GRU's h_ext.
        c_mid = mid.shape[0]
        mwin8 = _load_window(maskf_ref, base, align, block)
        mext8 = jax.lax.slice(mwin8, (0, align - halo),
                              (8, align - halo + ext))
        reps = -(-c_mid // 8)
        mext = jnp.concatenate([mext8] * reps, axis=0)[:c_mid]
        mid = (mid * mext).astype(xs[0].dtype)
        out = (_tap_accum(mid, w2_ref[...], taps2, halo, block)
               * s2_ref[...] + b2_ref[...])
        if act2 == "relu":
            out = jnp.maximum(out, 0.0)
        out_ref[...] = (out * mask_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "taps2", "act",
                                             "act2", "out_dtype",
                                             "interpret"))
def planar_conv2(xs: Sequence[jax.Array], ws: Sequence[jax.Array], taps,
                 scale: jax.Array, bias: jax.Array, w2: jax.Array, taps2,
                 scale2: jax.Array, bias2: jax.Array, mask: jax.Array,
                 act: str = "relu", act2: str = "none", out_dtype=None,
                 interpret: bool = False) -> jax.Array:
    """Fused conv→affine→act→conv→affine[→act] over planar planes; both
    convs share one grid pass and the intermediate plane stays in VMEM
    (~2x the first conv's HBM traffic saved at full-res levels —
    docs/PERFORMANCE.md round-2 planar breakdown).

    Both tap structures must be stride-1 on the SAME grid (e.g. two 3x3
    convs). Returns (C_out2, TOTAL)."""
    xs = tuple(xs)
    ws = tuple(ws)
    c_out2 = w2.shape[1]
    total = xs[0].shape[1]
    assert total % BLOCK == 0 and mask.shape[1] == total
    assert taps[0] == taps2[0], "both convs must run on the same grid"
    out_dtype = out_dtype or xs[0].dtype
    n_in = len(xs)
    halo = taps_halo(taps2)
    align = _align128(taps_halo(taps) + halo)
    if BLOCK < align:
        raise ValueError(
            f"lane chunk BLOCK={BLOCK} < aligned tap reach {align} — grid "
            "too wide for this chunk size (raise VIDMAT_PLANAR_BLOCK)")
    kernel = functools.partial(_conv2_kernel, taps=taps, taps2=taps2,
                               n_in=n_in, act=act, act2=act2, block=BLOCK,
                               halo=halo, align=align)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    chunk = pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    # See the _conv2_kernel mask note (8 sublane rows). Carried in the
    # PLANE dtype: 0/1 is exact in bf16, and the full-ref read is half the
    # f32 traffic — the read that made the d0+head fusion a traffic wash
    # in round 2 (docs/PERFORMANCE.md).
    mask8 = jnp.broadcast_to(mask.astype(xs[0].dtype), (8, total))
    return pl.pallas_call(
        kernel,
        grid=(total // BLOCK,),
        out_shape=jax.ShapeDtypeStruct((c_out2, total), out_dtype),
        in_specs=[full] * (2 * n_in + 5) + [full, chunk],
        out_specs=pl.BlockSpec((c_out2, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*xs, *ws, scale, bias, w2, scale2, bias2, mask8, mask)


def conv_gru_fits(taps) -> bool:
    """True when the fused decoder-stage conv+GRU (planar_conv_gru) fits
    the BLOCK lane chunk (the 3x3 conv must be evaluated out to the GRU's
    gate halo plus the candidate conv's tap reach — 3 halos total) AND
    the conv's 4-halo extension stays under the fusion budget (see
    _FUSE_HALO_BUDGET)."""
    return (BLOCK >= _align128(3 * taps_halo(taps))
            and 4 * taps_halo(taps) <= _FUSE_HALO_BUDGET)


def _conv_gru_kernel(*refs, taps, n_in, feats, block, halo, align):
    """Fused decoder stage: 3x3 ConvBNAct over a multi-plane concat,
    split into [a | b], then the ConvGRU step h' = GRU(b, h) — one grid
    pass; the conv output (the GRU's input) never visits HBM.

    The conv is evaluated on a 2-halo-extended chunk (ext2) so the gate
    conv (needs b at +-halo around gate positions, themselves computed on
    a 1-halo extension for the candidate's r*h taps) reads in-register
    values — the same halo-chaining as planar_conv2 + _gru_kernel. The
    mid value is interior-masked and cast to the plane dtype before the
    GRU taps, so the fusion computes the same math on the same operands
    as the planar_conv -> slice -> planar_gru chain (equal to <=2 f32
    ulps: the halo-extended matmul N dim lets the dot reassociate —
    tests/parity pins the tolerance, the unit test pins bit-equality at
    matched shapes).
    """
    # refs: x_0..x_{n-1}, w_0..w_{n-1} (T, feats, C_i), scale (feats, 1),
    #       bias (feats, 1), h (half, TOTAL), wgx, wgh (T, 2*half, half),
    #       bg (2*half, 1), wcx, wch (T, half, half), bc (half, 1),
    #       mask8 (8, TOTAL), mask (1, BLOCK) chunk,
    #       outs: a (half, BLOCK), h' (half, BLOCK)
    xs = refs[:n_in]
    ws = refs[n_in:2 * n_in]
    (s_ref, b_ref, h_ref, wgx_ref, wgh_ref, bg_ref, wcx_ref, wch_ref,
     bc_ref, maskf_ref, mask_ref, a_ref, out_ref) = refs[2 * n_in:]
    half = feats // 2
    i = pl.program_id(0)
    margin = jnp.logical_or(i == 0, i == pl.num_programs(0) - 1)

    @pl.when(margin)
    def _():
        a_ref[...] = jnp.zeros_like(a_ref)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(margin))
    def _():
        base = i * block
        ext = block + 2 * halo      # gate positions
        ext2 = block + 4 * halo     # conv (b) positions
        acc = None
        for x_ref, w_ref in zip(xs, ws):
            win = _load_window(x_ref, base, align, block)
            part = _tap_accum(win, w_ref[...], taps, align, block,
                              start=-2 * halo, size=ext2)
            acc = part if acc is None else acc + part
        mid = jnp.maximum(acc * s_ref[...] + b_ref[...], 0.0)
        # Interior mask + plane-dtype cast: exactly what planar_conv
        # writes out, so the GRU sees bit-identical inputs.
        mwin8 = _load_window(maskf_ref, base, align, block)
        mext8 = jax.lax.slice(mwin8, (0, align - 2 * halo),
                              (8, align - 2 * halo + ext2))
        reps = -(-feats // 8)
        mext = jnp.concatenate([mext8] * reps, axis=0)[:feats]
        mid = (mid * mext).astype(xs[0].dtype)

        a_ref[...] = (mid[:half, 2 * halo:2 * halo + block]
                      .astype(a_ref.dtype))

        bpl = mid[half:]                       # (half, ext2), plane dtype
        hw = _load_window(h_ref, base, align, block)
        rz = (_tap_accum(bpl, wgx_ref[...], taps, 2 * halo, block,
                         start=-halo, size=ext)
              + _tap_accum(hw, wgh_ref[...], taps, align, block,
                           start=-halo, size=ext) + bg_ref[...])
        rz = jax.nn.sigmoid(rz)
        r = rz[:half, :]                       # (half, ext) f32
        z = rz[half:, halo:halo + block]
        h_ext = jax.lax.slice(hw, (0, align - halo),
                              (half, align - halo + ext))
        rh = (r * h_ext.astype(jnp.float32)).astype(hw.dtype)

        c = jnp.tanh(_tap_accum(bpl, wcx_ref[...], taps, 2 * halo, block)
                     + _tap_accum(rh, wch_ref[...], taps, halo, block)
                     + bc_ref[...])
        h_c = jax.lax.slice(hw, (0, align),
                            (half, align + block)).astype(jnp.float32)
        out = (1.0 - z) * h_c + z * c
        out_ref[...] = (out * mask_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def planar_conv_gru(xs: Sequence[jax.Array], ws: Sequence[jax.Array],
                    taps, scale: jax.Array, bias: jax.Array, h: jax.Array,
                    wgx: jax.Array, wgh: jax.Array, bg: jax.Array,
                    wcx: jax.Array, wch: jax.Array, bc: jax.Array,
                    mask: jax.Array,
                    interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused decoder stage (models/planar.py dec_stage): ConvBNAct(relu)
    over the plane list, split [a | b], h' = ConvGRU(b, h). Returns
    (a (half, TOTAL), h' (half, TOTAL)); same math as the
    planar_conv -> slice -> planar_gru chain (ulp-level, see kernel
    docstring)."""
    xs = tuple(xs)
    ws = tuple(ws)
    feats = ws[0].shape[1]
    half = feats // 2
    total = xs[0].shape[1]
    assert total % BLOCK == 0 and h.shape == (half, total)
    n_in = len(xs)
    halo = taps_halo(taps)
    align = _align128(3 * halo)
    if BLOCK < align:
        raise ValueError(
            f"lane chunk BLOCK={BLOCK} < aligned tap reach {align} — grid "
            "too wide for this chunk size (raise VIDMAT_PLANAR_BLOCK)")
    kernel = functools.partial(_conv_gru_kernel, taps=taps, n_in=n_in,
                               feats=feats, block=BLOCK, halo=halo,
                               align=align)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    chunk = pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((half, BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    mask8 = jnp.broadcast_to(mask.astype(xs[0].dtype), (8, total))
    a, h_new = pl.pallas_call(
        kernel,
        grid=(total // BLOCK,),
        out_shape=(jax.ShapeDtypeStruct((half, total), xs[0].dtype),
                   jax.ShapeDtypeStruct((half, total), h.dtype)),
        in_specs=[full] * (2 * n_in + 10) + [chunk],
        out_specs=(out_spec, out_spec),
        interpret=interpret,
    )(*xs, *ws, scale, bias, h, wgx, wgh, bg, wcx, wch, bc, mask8, mask)
    return a, h_new


def _gru_kernel(x_ref, h_ref, wgx_ref, wgh_ref, bg_ref, wcx_ref, wch_ref,
                bc_ref, mask_ref, out_ref, *, taps, features, block,
                halo, align):
    """Fused ConvGRU step in planar layout (models/layers.py ConvGRUCell):

      r, z = sigmoid(split(conv3x3([x, h])))
      c    = tanh(conv3x3([x, r * h]))
      h'   = (1 - z) * h + z * c

    The candidate conv reads r*h at tap offsets, so gates are computed on a
    halo-extended chunk (block + 2*halo); r*h taps are static slices of
    that extended value (align=halo in _tap_accum terms).
    """
    i = pl.program_id(0)
    margin = jnp.logical_or(i == 0, i == pl.num_programs(0) - 1)

    @pl.when(margin)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(margin))
    def _():
        base = i * block
        ext = block + 2 * halo

        xw = _load_window(x_ref, base, align, block)  # (C, block+2*align)
        hw = _load_window(h_ref, base, align, block)

        # Gates on the halo-extended chunk: positions [-halo, block+halo).
        rz = (_tap_accum(xw, wgx_ref[...], taps, align, block,
                         start=-halo, size=ext)
              + _tap_accum(hw, wgh_ref[...], taps, align, block,
                           start=-halo, size=ext) + bg_ref[...])
        rz = jax.nn.sigmoid(rz)
        r = rz[:features, :]                        # (C, ext) f32
        z = rz[features:, halo:halo + block]        # (C, block), central
        h_ext = jax.lax.slice(hw, (0, align - halo),
                              (features, align - halo + ext))
        rh = (r * h_ext.astype(jnp.float32)).astype(hw.dtype)

        c = jnp.tanh(_tap_accum(xw, wcx_ref[...], taps, align, block)
                     + _tap_accum(rh, wch_ref[...], taps, halo, block)
                     + bc_ref[...])
        h_c = jax.lax.slice(hw, (0, align),
                            (features, align + block)).astype(jnp.float32)
        out = (1.0 - z) * h_c + z * c
        out_ref[...] = (out * mask_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("taps", "interpret"))
def planar_gru(x: jax.Array, h: jax.Array, wgx: jax.Array, wgh: jax.Array,
               bg: jax.Array, wcx: jax.Array, wch: jax.Array, bc: jax.Array,
               mask: jax.Array, taps,
               interpret: bool = False) -> jax.Array:
    """Fused ConvGRU: x, h (C, TOTAL) -> h' (C, TOTAL). Weight stacks
    (T, ., C) in plane dtype; biases (2C, 1) / (C, 1) f32."""
    c, total = h.shape
    halo = taps_halo(taps)
    align = _align128(2 * halo)
    if BLOCK < align:
        raise ValueError(
            f"lane chunk BLOCK={BLOCK} < gates halo + tap reach {align} — "
            "grid too wide for this chunk size (raise VIDMAT_PLANAR_BLOCK)")
    kernel = functools.partial(_gru_kernel, taps=taps, features=c,
                               block=BLOCK, halo=halo, align=align)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(total // BLOCK,),
        out_shape=jax.ShapeDtypeStruct((c, total), h.dtype),
        in_specs=[full] * 8 + [pl.BlockSpec((1, BLOCK), lambda i: (0, i),
                                            memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, h, wgx, wgh, bg, wcx, wch, bc, mask)


# ---- XLA-side layout glue ----


def to_planar(x: jax.Array) -> jax.Array:
    """(1, H, W, C) -> flattened pitch-aligned plane (C, TOTAL)."""
    _, h, w, c = x.shape
    pitch, p, total = plane_sizes(h, w)
    pl_ = jnp.transpose(x[0], (2, 0, 1))         # (C, H, W)
    pl_ = jnp.pad(pl_, ((0, 0), (1, 1), (1, pitch - w - 1)))
    flat = pl_.reshape(c, p)
    return jnp.pad(flat, ((0, 0), (BLOCK, total - BLOCK - p)))


def from_planar(p: jax.Array, h: int, w: int) -> jax.Array:
    """(C, TOTAL) -> (1, H, W, C)."""
    pitch, psz, _ = plane_sizes(h, w)
    c = p.shape[0]
    x = p[:, BLOCK:BLOCK + psz].reshape(c, h + 2, pitch)[:, 1:h + 1,
                                                         1:w + 1]
    return jnp.transpose(x, (1, 2, 0))[None]


def interior_mask(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(1, TOTAL) mask: 1 on interior pixels, 0 on pad ring, pitch
    alignment lanes, and margins."""
    import numpy as np

    pitch, p, total = plane_sizes(h, w)
    m = np.zeros((h + 2, pitch), np.float32)
    m[1:h + 1, 1:w + 1] = 1.0
    flat = np.zeros(total, np.float32)
    flat[BLOCK:BLOCK + p] = m.reshape(-1)
    return jnp.asarray(flat[None], dtype)


def conv_tap_weights(kernel: jax.Array, dtype=None) -> jax.Array:
    """Flax conv kernel (KH, KW, C_in, C_out) -> tap stack (KH*KW, C_out,
    C_in), tap order [dy, dx] row-major (matches conv3x3_offsets)."""
    kh, kw, ci, co = kernel.shape
    w = jnp.transpose(kernel, (0, 1, 3, 2)).reshape(kh * kw, co, ci)
    return w.astype(dtype) if dtype is not None else w


def stride2_tap_weights(kernel: jax.Array, c_in: int, dtype=None
                        ) -> jax.Array:
    """Rearrange a 3x3 stride-2 conv kernel for a space-to-depth-packed
    input plane.

    A stride-2 3x3 conv on grid (H, W) equals a stride-1 conv with 2x2 taps
    (offsets {-1, 0} per axis) on the s2d(2)-packed grid (H/2, W/2) with
    4*C_in channels: input row r = 2*h_out + dy - 1 lands on packed row
    h_out + ry with phase py, where dy -> (ry, py) = {0: (-1, 1), 1: (0, 0),
    2: (0, 1)} (same for columns). Packed channel order is [py, px, ci]
    (ci fastest — models.matting_net.space_to_depth).

    kernel: (3, 3, C_in, C_out). Returns (4, C_out, 4*C_in), taps ordered
    [(ry, rx)] row-major over {-1, 0}^2 (use stride2_offsets).
    """
    import numpy as np

    k = np.asarray(kernel, np.float32)
    co = k.shape[3]
    dymap = {0: (-1, 1), 1: (0, 0), 2: (0, 1)}
    out = np.zeros((2, 2, co, 4 * c_in), np.float32)
    for dy in range(3):
        ry, py = dymap[dy]
        for dx in range(3):
            rx, px = dymap[dx]
            ph = (py * 2 + px) * c_in
            out[ry + 1, rx + 1, :, ph:ph + c_in] += k[dy, dx].T
    w = jnp.asarray(out.reshape(4, co, 4 * c_in))
    return w.astype(dtype) if dtype is not None else w


def fold_bn(bn_scale: jax.Array, bn_bias: jax.Array, bn_mean: jax.Array,
            bn_var: jax.Array, eps: float) -> Tuple[jax.Array, jax.Array]:
    """Inference BatchNorm -> per-channel affine (scale, bias), shaped
    (C, 1) f32 for the kernel."""
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    scale = inv.astype(jnp.float32)[:, None]
    bias = (bn_bias - bn_mean * inv).astype(jnp.float32)[:, None]
    return scale, bias
