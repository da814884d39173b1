"""Planar-kernel forward path for MattingNetwork (inference, batch 1).

This executes the SAME Flax variables as models.matting_net.MattingNetwork,
but runs every conv/GRU through the planar Pallas kernels
(vidmat.ops.pallas.planar) so small-channel activations never touch
lane-padded NHWC layouts in HBM — the round-2 structural perf target
(docs/PERFORMANCE.md: XLA's conv lowering moves ~27x real bytes at these
channel counts).

Design:
  - activations live as flattened pitch-aligned planes (C, TOTAL);
    channel concats never materialize (multi-plane conv = sum of per-plane
    tap matmuls), channel splits are cheap sublane slices;
  - stride-2 encoder convs run as 4-tap convs on space-to-depth-packed
    planes (stride2_tap_weights);
  - BatchNorm is folded into each conv's affine (inference);
  - XLA glue (upsample2x, s2d packing, plane<->grid reshapes) operates on
    (C, H, W) planar grids — W in lanes, so no 128x channel padding —
    costing ~2x real bytes per transition;
  - the recurrent state is carried as planar planes between frames (no
    per-frame NHWC round-trips).

Parity: tests/parity/test_planar_parity.py pins this against
MattingNetwork.apply to float32 exactness over recurrent rollouts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig
from vidmat.ops.pallas.planar import (BLOCK, conv1x1_taps, conv2_fits,
                                      conv3x3_taps, conv_gru_fits,
                                      conv_tap_weights, fold_bn,
                                      interior_mask, planar_conv,
                                      planar_conv2, planar_conv_gru,
                                      planar_gru, plane_sizes, stride2_taps)


# ---- XLA glue on planar grids ----


def plane_to_grid(p: jax.Array, h: int, w: int) -> jax.Array:
    """(C, TOTAL) -> (C, h, w) interior grid."""
    pitch, psz, _ = plane_sizes(h, w)
    return p[:, BLOCK:BLOCK + psz].reshape(-1, h + 2, pitch)[:, 1:h + 1,
                                                             1:w + 1]


def grid_to_plane(g: jax.Array) -> jax.Array:
    """(C, h, w) -> (C, TOTAL) flattened pitch-aligned plane."""
    c, h, w = g.shape
    pitch, psz, total = plane_sizes(h, w)
    g = jnp.pad(g, ((0, 0), (1, 1), (1, pitch - w - 1)))
    return jnp.pad(g.reshape(c, psz), ((0, 0), (BLOCK, total - BLOCK - psz)))


def s2d_grid(g: jax.Array, r: int) -> jax.Array:
    """(C, h, w) -> (r*r*C, h/r, w/r), channel order [ry, rx, c] (c fastest)
    — mirrors models.matting_net.space_to_depth.

    Implemented as 0/1 selection matmuls (extract = transpose of the d2s
    interleave): a naive 5D reshape/transpose materializes intermediates
    whose trailing dim is r (TPU pads them to 128 lanes, ~64x traffic at
    r=2), and strided lane slices lower as slow gathers."""
    c, h, w = g.shape
    f32 = jnp.float32
    gf = g.astype(f32)
    blocks = []
    for ry in range(r):
        er = _interleave_mat(h // r, r, ry, f32)  # (h, h/r): extraction
        for rx in range(r):
            ec = _interleave_mat(w // r, r, rx, f32)
            blocks.append(jnp.einsum("hH,chw,wW->cHW", er, gf, ec))
    return jnp.concatenate(blocks, axis=0).astype(g.dtype)


def _interleave_mat(n: int, r: int, phase: int, dtype) -> jax.Array:
    """(n*r, n) selection matrix: out[i*r + phase] = in[i]."""
    rows = jnp.arange(n * r)
    cols = jnp.arange(n)
    return ((rows[:, None] == cols[None, :] * r + phase)
            .astype(dtype))


def d2s_grid(g: jax.Array, r: int) -> jax.Array:
    """Inverse of s2d_grid: (r*r*C, h, w) -> (C, h*r, w*r).

    Phase interleaving via 0/1 selection matmuls (the repo-standard trick
    for lane-crossing data movement — see ops/pallas/ingest_kernel.py's
    pooling matmuls): a strided scatter or a trailing-dim-r transpose
    would either lower poorly or lane-pad."""
    cc, h, w = g.shape
    c = cc // (r * r)
    f32 = jnp.float32
    out = None
    for ry in range(r):
        er = _interleave_mat(h, r, ry, f32)
        for rx in range(r):
            ec = _interleave_mat(w, r, rx, f32)
            blk = g[(ry * r + rx) * c:(ry * r + rx + 1) * c].astype(f32)
            part = jnp.einsum("Hh,chw,Ww->cHW", er, blk, ec)
            out = part if out is None else out + part
    return out.astype(g.dtype)


def _bilinear_up_mat(n: int, dtype) -> jax.Array:
    """(2n, n) half-pixel bilinear 2x upsample matrix (same sampling as
    jax.image.resize bilinear, antialias=False)."""
    rows = jnp.arange(2 * n)
    src = jnp.clip((rows.astype(jnp.float32) + 0.5) / 2.0 - 0.5, 0.0,
                   float(n - 1))
    l = jnp.floor(src)
    fr = src - l
    li = l.astype(jnp.int32)
    cols = jnp.arange(n)
    m = (jnp.where(cols[None, :] == li[:, None], 1.0 - fr[:, None], 0.0)
         + jnp.where(cols[None, :] == li[:, None] + 1, fr[:, None], 0.0))
    return m.astype(dtype)


def upsample2x_grid(g: jax.Array) -> jax.Array:
    """2x bilinear (half-pixel centers) on a planar grid — identical
    sampling to ops.resize.upsample2x (NHWC) per channel.

    Implemented as two banded matmuls in the PLANE dtype with f32
    accumulation: jax.image.resize lowers to the same einsum but with f32
    intermediates — 22.9 MB vs 5.2 MB for this form at the 40ch 72x120
    decoder site in ISOLATION (cost_analysis). In the full serving step
    XLA fusion already absorbs most of those intermediates, so the
    in-context saving is modest (180.2 -> 177.7 MB/frame; docs/
    PERFORMANCE.md round-2 — recorded so the isolated number is not
    mistaken for a step-level win). bf16 serving pays one intermediate
    rounding (<=0.008 abs on [0,1]-scale activations); the f32 test dtype
    keeps full precision."""
    c, h, w = g.shape
    R = _bilinear_up_mat(h, g.dtype)
    C = _bilinear_up_mat(w, g.dtype)
    t = jnp.einsum("Hh,chw->cHw", R, g,
                   preferred_element_type=jnp.float32).astype(g.dtype)
    return jnp.einsum("chw,Ww->chW", t, C,
                      preferred_element_type=jnp.float32).astype(g.dtype)


def stride2_tap_weights_jnp(kernel: jax.Array, c_in: int, dtype
                            ) -> jax.Array:
    """Trace-safe (pure jnp) version of planar.stride2_tap_weights."""
    co = kernel.shape[3]
    out = jnp.zeros((2, 2, co, 4 * c_in), jnp.float32)
    dymap = {0: (-1, 1), 1: (0, 0), 2: (0, 1)}
    for dy in range(3):
        ry, py = dymap[dy]
        for dx in range(3):
            rx, px = dymap[dx]
            ph = (py * 2 + px) * c_in
            out = out.at[ry + 1, rx + 1, :, ph:ph + c_in].add(
                kernel[dy, dx].T.astype(jnp.float32))
    return out.reshape(4, co, 4 * c_in).astype(dtype)


# ---- forward builder ----


class PlanarState(NamedTuple):
    """Recurrent carry as planar planes (no per-frame NHWC round trips)."""

    h3: jax.Array
    h2: jax.Array
    h1: jax.Array


def planar_init_state(cfg: ModelConfig, height: int, width: int,
                      dtype=jnp.bfloat16) -> PlanarState:
    """Zero planar carry for a (height, width) FRAME grid (pre-s2d dims,
    mirroring models.matting_net.init_state)."""
    d = cfg.dec_channels
    s = cfg.space_to_depth

    def zeros(c, div):
        h, w = height // (div * s), width // (div * s)
        _, _, total = plane_sizes(h, w)
        return jnp.zeros((c, total), dtype)

    return PlanarState(h3=zeros(d[0] // 2, 8), h2=zeros(d[1] // 2, 4),
                       h1=zeros(d[2] // 2, 2))


def planar_init_state_batched(cfg: ModelConfig, batch: int, height: int,
                              width: int, dtype=jnp.bfloat16) -> PlanarState:
    """Zero planar carry with a leading batch/stream axis (multi-stream
    serving: one state slot per stream, SURVEY.md §3.4)."""
    one = planar_init_state(cfg, height, width, dtype)
    return jax.tree_util.tree_map(
        lambda z: jnp.zeros((batch,) + z.shape, z.dtype), one)


def batch_planar_forward(forward):
    """Lift a build_planar_forward single-frame forward to a batched one
    via jax.vmap (the Pallas batching rule adds a leading grid dimension;
    bit-exactness vs the per-frame loop is pinned in
    tests/parity/test_planar_parity.py).

    Batched contract: frames (B, H, W, C), state leaves (B, ...) ->
    alpha/fgr (B, H, W, 1/3), new state (B, ...).
    """
    def fb(variables, frames, state):
        def one(fr, st):
            return forward(variables, fr[None], st)

        alpha, fgr, ns = jax.vmap(one)(frames, state)
        return alpha[:, 0], fgr[:, 0], ns

    return fb


def build_planar_forward(cfg: ModelConfig, height: int, width: int,
                         dtype=jnp.bfloat16, interpret: bool = False,
                         fuse_pairs: bool = True, output: str = "matte"):
    """Build forward(variables, frame, state) -> (alpha, fgr, new_state)
    for a fixed (height, width) frame bucket (divisible by 16 *
    space_to_depth).

    frame: (1, height, width, in_channels) float32 in [0, 1].
    state: PlanarState (planar_init_state) or None (cold start).
    alpha/fgr: (1, height, width, 1/3) float32 — identical contract to
    MattingNetwork.apply (matting_net.py MattingNetwork.__call__).

    output="seg": the segmentation-head tap (matting_net.py seg_pass) —
    the SAME trunk (encoder, bottleneck, recurrent decoder, d0) with the
    co-trained ``seg_head`` conv in place of the matting head; returns
    (seg_logits (1, height, width, 1) float32, None, new_state). The
    recurrent state advances exactly as the matting pass (shared GRU),
    and the d0+seg_head pair fuses into one planar_conv2 kernel exactly
    like d0+head does.

    fuse_pairs: run adjacent conv pairs (encoder s2a+s2b / s3a+s3b /
    s4a+s4b, and d0+head) as single planar_conv2 kernels — the stride-2
    conv is already a stride-1 4-tap conv on the packed plane, so both
    convs of each pair share a grid. Same math on the same operands as
    the two-call chain (the mid plane simply stays in VMEM; equal to
    <=2 f32 ulps — the halo-extended matmul N dim lets the dot
    reassociate); per-site it applies only where
    the combined halo fits the lane chunk (conv2_fits — at full-res-1080p
    level-0 pitches the pair falls back to two calls).
    """
    s = cfg.space_to_depth
    assert height % (16 * s) == 0 and width % (16 * s) == 0
    g = [(height // (s * d), width // (s * d)) for d in (1, 2, 4, 8, 16)]
    masks = [interior_mask(h, w) for (h, w) in g]
    taps3 = [conv3x3_taps(w) for (_, w) in g]
    taps2 = [stride2_taps(w // 2) for (_, w) in g[:4]]
    # Static per-site fusion decisions (pair = stride2 conv at `level`
    # feeding the 3x3 at level+1; d0 = the level-0 3x3 pair d0+head).
    fuse_enc = {lvl: fuse_pairs and conv2_fits(taps2[lvl], taps3[lvl + 1])
                for lvl in (1, 2, 3)}
    fuse_d0 = fuse_pairs and conv2_fits(taps3[0], taps3[0])
    # decoder stages run at levels 3/2/1 (d3/d2/d1)
    fuse_dec = {lvl: (fuse_pairs and cfg.recurrent
                      and conv_gru_fits(taps3[lvl]))
                for lvl in (1, 2, 3)}
    eps = cfg.bn_eps
    kconv = functools.partial(planar_conv, interpret=interpret)
    kconv2 = functools.partial(planar_conv2, interpret=interpret)
    kconvgru = functools.partial(planar_conv_gru, interpret=interpret)
    kgru = functools.partial(planar_gru, interpret=interpret)

    def cba_w(p, st):
        """ConvBNAct -> (tap kernel source, folded scale/bias)."""
        scale, bias = fold_bn(p["bn"]["scale"], p["bn"]["bias"],
                              st["bn"]["mean"], st["bn"]["var"], eps)
        return p["conv"]["kernel"], scale, bias

    def split_tap_weights(kernel, splits):
        """Per-plane tap stacks for a conv over a multi-plane concat
        (one implementation for the plain, fused-pair, and fused-GRU
        call sites)."""
        ws = []
        o = 0
        for csz in splits:
            ws.append(conv_tap_weights(kernel[:, :, o:o + csz], dtype))
            o += csz
        return ws

    def pack_stride2(plane, level):
        """s2d(2)-packed plane at level+1 geometry + stride-2 tap
        weights factory — the shared input form of a stride-2 conv."""
        h, w = g[level]
        return grid_to_plane(s2d_grid(plane_to_grid(plane, h, w), 2))

    def stride2_conv(plane, level, kernel, scale, bias):
        """ConvBNAct stride 2: level grid -> level+1 grid."""
        wst = stride2_tap_weights_jnp(kernel, kernel.shape[2], dtype)
        return kconv([pack_stride2(plane, level)], [wst], taps2[level],
                     scale, bias, masks[level + 1])

    def conv3(planes, level, kernel, scale, bias, splits, act="relu"):
        """3x3 stride-1 ConvBNAct over a multi-plane concat."""
        return kconv(planes, split_tap_weights(kernel, splits),
                     taps3[level], scale, bias, masks[level], act=act)

    def encode(variables, frame):
        """Stateless half: ingest-to-planes + encoder + bottleneck. The
        returned tuple of planes is a plain pytree, so offline chunked
        conversion can jax.vmap this half over a K-frame chunk (the
        recurrent decode below stays a scan) — the encoder kernels then
        amortize their per-launch overhead K-fold exactly like the
        multistream batch does."""
        prm = variables["params"]
        stt = variables["batch_stats"]
        enc_p, enc_s = prm["encoder"], stt["encoder"]

        assert frame.shape[0] == 1, "planar path is batch-1 (serving)"
        fg = jnp.transpose(frame[0], (2, 0, 1))          # (C_in, H, W)
        rgb = fg[:3].astype(jnp.float32)
        xg = s2d_grid(fg.astype(dtype), s) if s > 1 else fg.astype(dtype)
        x_in = grid_to_plane(xg)                          # level-0 plane
        tri = (fg[3:4] if cfg.use_trimap and frame.shape[-1] >= 4
               else None)

        def enc_stage(plane, level, name_a, name_b):
            """Encoder stage: stride-2 ConvBNAct (level -> level+1) + 3x3
            ConvBNAct at level+1 — one fused planar_conv2 kernel when the
            combined halo fits (the mid feature plane stays in VMEM),
            else the two-call chain (same math either way; ulp-level
            equality pinned in tests/parity)."""
            ka, sa, ba = cba_w(enc_p[name_a], enc_s[name_a])
            kb, sb, bb = cba_w(enc_p[name_b], enc_s[name_b])
            if fuse_enc[level]:
                wst = stride2_tap_weights_jnp(ka, ka.shape[2], dtype)
                return kconv2([pack_stride2(plane, level)], [wst],
                              taps2[level], sa, ba,
                              conv_tap_weights(kb, dtype), taps3[level + 1],
                              sb, bb, masks[level + 1], act="relu",
                              act2="relu")
            f = stride2_conv(plane, level, ka, sa, ba)
            return conv3([f], level + 1, kb, sb, bb, (kb.shape[2],))

        # ---- encoder (matting_net.py Encoder: stem + s2a/b + s3a/b + s4a/b)
        k, sc, bi = cba_w(enc_p["stem"], enc_s["stem"])
        f1 = stride2_conv(x_in, 0, k, sc, bi)
        f2 = enc_stage(f1, 1, "s2a", "s2b")
        f3 = enc_stage(f2, 2, "s3a", "s3b")
        f4 = enc_stage(f3, 3, "s4a", "s4b")

        # ---- bottleneck gate (layers.py BottleneckGate)
        bp, bs = prm["bottleneck"], stt["bottleneck"]
        k, sc, bi = cba_w(bp["proj"], bs["proj"])
        proj = kconv([f4], [conv_tap_weights(k, dtype)], conv1x1_taps(g[4][1]),
                     sc, bi, masks[4])
        h4, w4 = g[4]
        gmean = jnp.sum(f4.astype(jnp.float32), axis=1) / float(h4 * w4)
        gk = bp["gate"]["kernel"][0, 0].astype(jnp.float32)  # (C, F)
        gb = bp["gate"]["bias"].astype(jnp.float32)
        gate = jax.nn.sigmoid(gmean @ gk + gb)               # (F,)
        b4 = (proj.astype(jnp.float32) * gate[:, None]).astype(dtype)
        return x_in, rgb, tri, f1, f2, f3, b4

    def decode(variables, enc, state: Optional[PlanarState]):
        """Recurrent half: decoder stages + full-res head on an encoded
        frame (`enc` = encode()'s tuple)."""
        prm = variables["params"]
        stt = variables["batch_stats"]
        x_in, rgb, tri, f1, f2, f3, b4 = enc

        # ---- decoder (matting_net.py DecoderStage: upsample + skip concat
        #      + conv + split-half ConvGRU)
        def dec_stage(name, xs, src_level, skip, h_prev, feats):
            lvl = src_level - 1
            h2_, w2_ = g[src_level]
            ups = [grid_to_plane(upsample2x_grid(plane_to_grid(p, h2_, w2_)))
                   for p in xs]
            p = prm[name]
            st_ = stt[name]
            k, sc, bi = cba_w(p["conv"], st_["conv"])
            splits = tuple(pl_.shape[0] for pl_ in ups) + (
                k.shape[2] - sum(pl_.shape[0] for pl_ in ups),)
            if not cfg.recurrent:
                return [conv3(ups + [skip], lvl, k, sc, bi, splits)], None
            half = feats // 2
            gp = p["gru"]
            kg, kc = gp["gates"]["kernel"], gp["cand"]["kernel"]
            gru_w = (conv_tap_weights(kg[:, :, :half], dtype),
                     conv_tap_weights(kg[:, :, half:], dtype),
                     gp["gates"]["bias"].astype(jnp.float32)[:, None],
                     conv_tap_weights(kc[:, :, :half], dtype),
                     conv_tap_weights(kc[:, :, half:], dtype),
                     gp["cand"]["bias"].astype(jnp.float32)[:, None])
            if h_prev is None:
                _, _, total_ = plane_sizes(*g[lvl])
                h_prev = jnp.zeros((half, total_), dtype)
            if fuse_dec[lvl]:
                # Fused decoder stage: conv + split + ConvGRU in one
                # kernel — the GRU's input never visits HBM (same math
                # as the chain below; ulp-level equality pinned in
                # tests/parity).
                a, h_new = kconvgru(ups + [skip],
                                    split_tap_weights(k, splits),
                                    taps3[lvl], sc, bi, h_prev, *gru_w,
                                    masks[lvl])
                return [a, h_new], h_new
            x = conv3(ups + [skip], lvl, k, sc, bi, splits)
            a, b = x[:half], x[half:]
            h_new = kgru(b, h_prev, *gru_w, masks[lvl], taps3[lvl])
            return [a, h_new], h_new

        d = cfg.dec_channels
        h3 = h2 = h1 = None
        if state is not None:
            h3, h2, h1 = state.h3, state.h2, state.h1
        xs, n3 = dec_stage("d3", [b4], 4, f3, h3, d[0])
        xs, n2 = dec_stage("d2", xs, 3, f2, h2, d[1])
        xs, n1 = dec_stage("d1", xs, 2, f1, h1, d[2])

        # ---- full-res stage conditioned on the (packed) raw frame
        h1_, w1_ = g[1]
        ups = [grid_to_plane(upsample2x_grid(plane_to_grid(p, h1_, w1_)))
               for p in xs]
        cond = x_in if s > 1 else grid_to_plane(rgb.astype(dtype))
        k, sc, bi = cba_w(prm["d0"], stt["d0"])
        splits = tuple(pl_.shape[0] for pl_ in ups) + (
            x_in.shape[0] if s > 1 else 3,)
        head_name = "seg_head" if output == "seg" else "head"
        hk = prm[head_name]["kernel"]
        hb = prm[head_name]["bias"].astype(jnp.float32)[:, None]
        ones = jnp.ones((hk.shape[3], 1), jnp.float32)
        if fuse_d0:
            # d0 + head as one fused kernel. Round 2 measured this pair a
            # traffic WASH (the f32 mask8 ref read back what the skipped
            # mid round trip saved); with the mask operand in the plane
            # dtype the byte balance turns positive, and the saved kernel
            # launch is wall-clock the pair-fusion benchmark measures
            # (docs/PERFORMANCE.md round 3).
            out = kconv2(ups + [cond], split_tap_weights(k, splits),
                         taps3[0], sc, bi,
                         conv_tap_weights(hk, dtype), taps3[0], ones, hb,
                         masks[0], act="relu", act2="none")
        else:
            x = conv3(ups + [cond], 0, k, sc, bi, splits)
            out = conv3([x], 0, hk, ones, hb, (hk.shape[2],), act="none")

        og = plane_to_grid(out, *g[0]).astype(jnp.float32)
        if s > 1:
            og = d2s_grid(og, s)                          # (4, H, W)
        if output == "seg":
            new_state = (PlanarState(h3=n3, h2=n2, h1=n1) if cfg.recurrent
                         else state)
            # Raw logits, mirroring matting_net's seg_pass contract.
            return jnp.transpose(og[0:1], (1, 2, 0))[None], None, new_state
        alpha = jnp.clip(og[0:1], 0.0, 1.0)
        fgr = jnp.clip(og[1:4] + rgb, 0.0, 1.0)

        if tri is not None:
            alpha = jnp.where(tri >= 0.75, 1.0,
                              jnp.where(tri <= 0.25, 0.0, alpha))

        new_state = (PlanarState(h3=n3, h2=n2, h1=n1) if cfg.recurrent
                     else state)
        alpha_nhwc = jnp.transpose(alpha, (1, 2, 0))[None]
        fgr_nhwc = jnp.transpose(fgr, (1, 2, 0))[None]
        return alpha_nhwc, fgr_nhwc, new_state

    def forward(variables, frame, state: Optional[PlanarState]):
        return decode(variables, encode(variables, frame), state)

    forward.encode = encode
    forward.decode = decode
    return forward
