"""The flagship recurrent matting network (Flax, NHWC, TPU-first).

Capability parity targets (reference tree was empty — SURVEY.md §0 — so these
are pinned to the driver ladder, BASELINE.json:6-12):
  - single-image matting, optionally trimap-conditioned (BASELINE.json:7)
  - frame-to-frame temporal propagation via recurrent hidden state
    (BASELINE.json:8-9)
  - coarse-pass inference at a downsample ratio with full-res refinement
    handled by the refine stage (BASELINE.json:10)

Architecture (RVM-lineage [DOMAIN], re-designed for the MXU):
  encoder: conv stem + 3 conv stages at strides 2/4/8/16
  bottleneck: LR-ASPP-style global gate
  decoder: 3 upsample stages with skip concat + split-half ConvGRU
           (recurrent state = the GRU half-channels at strides 8/4/2),
           final full-res stage conditioned on the raw frame
  heads: alpha (1ch) + foreground residual (3ch)

The temporal state is a pytree of three feature maps; the pipeline keeps it
resident in HBM across frames (BASELINE.json:5 "temporal propagation state
kept resident in HBM").
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vidmat.config import ModelConfig
from vidmat.models.layers import BottleneckGate, ConvBNAct, ConvGRUCell
from vidmat.ops.resize import upsample2x


class RecurrentState(NamedTuple):
    """Per-stream temporal state: ConvGRU hidden maps at strides 8/4/2.

    Shapes for an (N, H, W, 3) input:
      h3: (N, H/8,  W/8,  dec_channels[0] // 2)
      h2: (N, H/4,  W/4,  dec_channels[1] // 2)
      h1: (N, H/2,  W/2,  dec_channels[2] // 2)
    """

    h3: jax.Array
    h2: jax.Array
    h1: jax.Array


def init_state(cfg: ModelConfig, batch: int, height: int, width: int,
               dtype=jnp.float32) -> RecurrentState:
    """Zero-initialized temporal state for a (batch, height, width) stream
    (height/width are the FRAME dims; space_to_depth shifts the feature
    grids down by the packing factor)."""
    d = cfg.dec_channels
    s = cfg.space_to_depth
    return RecurrentState(
        h3=jnp.zeros((batch, height // (8 * s), width // (8 * s),
                      d[0] // 2), dtype),
        h2=jnp.zeros((batch, height // (4 * s), width // (4 * s),
                      d[1] // 2), dtype),
        h1=jnp.zeros((batch, height // (2 * s), width // (2 * s),
                      d[2] // 2), dtype),
    )


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C) -> (N, H/r, W/r, r*r*C), channel order [dy, dx, c]
    (c fastest). Mirrored exactly by the torch oracle."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of space_to_depth."""
    n, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h * r, w * r, c)


class Encoder(nn.Module):
    cfg: ModelConfig
    dtype: Optional[object] = None
    bn_train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        c = self.cfg.enc_channels
        eps = self.cfg.bn_eps

        def cba(feats, stride, name):
            return ConvBNAct(feats, stride=stride, bn_eps=eps,
                             dtype=self.dtype, bn_train=self.bn_train,
                             name=name)

        f1 = cba(c[0], 2, "stem")(x)
        f2 = cba(c[1], 1, "s2b")(cba(c[1], 2, "s2a")(f1))
        f3 = cba(c[2], 1, "s3b")(cba(c[2], 2, "s3a")(f2))
        f4 = cba(c[3], 1, "s4b")(cba(c[3], 2, "s4a")(f3))
        return f1, f2, f3, f4


class DecoderStage(nn.Module):
    """Upsample 2x -> concat skip -> conv -> split-half ConvGRU.

    The GRU runs on the second half of the channels only (RVM-style): the
    first half is a pure feed-forward path, which halves recurrence FLOPs and
    keeps the carried state small in HBM.
    """

    features: int
    recurrent: bool
    bn_eps: float = 1e-5
    dtype: Optional[object] = None
    bn_train: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array,
                 h: Optional[jax.Array]):
        x = upsample2x(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBNAct(self.features, bn_eps=self.bn_eps, dtype=self.dtype,
                      bn_train=self.bn_train, name="conv")(x)
        if not self.recurrent:
            return x, None
        a, b = jnp.split(x, 2, axis=-1)
        if h is None:
            h = jnp.zeros_like(b)
        h_new = ConvGRUCell(self.features // 2, dtype=self.dtype,
                            name="gru")(b, h)
        return jnp.concatenate([a, h_new], axis=-1), h_new


class MattingNetwork(nn.Module):
    """Recurrent encoder-decoder matting network.

    __call__(frame, state) -> (alpha, fgr, new_state)
      frame: (N, H, W, cfg.in_channels) in [0, 1]; H, W divisible by 16.
             Channel order: RGB, then the {0, 0.5, 1} trimap (use_trimap),
             then the clean background plate RGB (use_bg_plate — BGMv2-
             lineage conditioning; the plate channels flow through the
             stem and, at s2d>1, the full-res cond concat like any other
             input evidence).
      state: RecurrentState or None (None = cold start, zeros).
      alpha: (N, H, W, 1) in [0, 1]
      fgr:   (N, H, W, 3) in [0, 1]

    __call__(frame, state, seg_pass=True) -> (seg_logits, None, new_state)
      Segmentation co-training pass (RVM-lineage [DOMAIN]): the SAME
      trunk (encoder, bottleneck, recurrent decoder, d0) with a separate
      1-channel ``seg_head`` emitting person-segmentation logits at
      (N, H, W, 1). Training interleaves matting batches (exact synthetic
      alpha) with segmentation batches (binary masks — the supervision
      signal real segmentation datasets provide at scale), which trains
      the shared trunk for subject understanding without matting-grade
      labels; only the tiny per-head convs are task-specific. Inference
      never takes this branch, so matting-only checkpoints (no
      ``seg_head`` subtree) are unaffected; co-training inits via
      ``weights.init_params(cfg, with_seg=True)`` or grafts a shipped
      checkpoint via ``weights.graft_seg_params``.
    """

    cfg: ModelConfig = ModelConfig()
    # Computation dtype: None = float32 (parity path); jnp.bfloat16 for the
    # serving path (params stay float32; flax casts per-layer).
    dtype: Optional[object] = None
    # Training mode for BatchNorm: batch statistics + mutable running-stat
    # updates. Inference (default) uses frozen running stats. A frozen-BN
    # training path leaves the deep stack unnormalized and was the root
    # cause of the s2d variant's optimization collapse.
    bn_train: bool = False

    @nn.compact
    def __call__(self, frame: jax.Array,
                 state: Optional[RecurrentState] = None,
                 seg_pass: bool = False):
        cfg = self.cfg
        d = cfg.dec_channels
        eps = cfg.bn_eps
        dt = self.dtype
        rec = cfg.recurrent
        s2d = cfg.space_to_depth
        rgb = frame[..., :3]
        if dt is not None:
            frame = frame.astype(dt)
        x_in = space_to_depth(frame, s2d) if s2d > 1 else frame

        bt = self.bn_train
        f1, f2, f3, f4 = Encoder(cfg, dtype=dt, bn_train=bt,
                                 name="encoder")(x_in)
        b4 = BottleneckGate(cfg.enc_channels[3], bn_eps=eps, dtype=dt,
                            bn_train=bt, name="bottleneck")(f4)

        h3 = h2 = h1 = None
        if state is not None:
            h3, h2, h1 = state.h3, state.h2, state.h1

        x, n3 = DecoderStage(d[0], rec, eps, dt, bt, name="d3")(b4, f3, h3)
        x, n2 = DecoderStage(d[1], rec, eps, dt, bt, name="d2")(x, f2, h2)
        x, n1 = DecoderStage(d[2], rec, eps, dt, bt, name="d1")(x, f1, h1)

        # Full-res stage: upsample + condition on the raw frame (no GRU at
        # full res — state stays small). With space_to_depth the stage runs
        # on the packed grid and the head emits all subpixels, restored by
        # depth_to_space.
        x = upsample2x(x)
        cond = space_to_depth(frame, s2d) if s2d > 1 else rgb.astype(x.dtype)
        x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        x = ConvBNAct(d[3], bn_eps=eps, dtype=dt, bn_train=bt,
                      name="d0")(x)

        if seg_pass:
            new_state = (RecurrentState(h3=n3, h2=n2, h1=n1) if rec
                         else state)
            seg = nn.Conv(s2d * s2d, (3, 3), padding=((1, 1), (1, 1)),
                          dtype=dt, name="seg_head")(x)
            if s2d > 1:
                seg = depth_to_space(seg, s2d)
            return seg.astype(jnp.float32), None, new_state

        out = nn.Conv(4 * s2d * s2d, (3, 3), padding=((1, 1), (1, 1)),
                      dtype=dt, name="head")(x)
        if s2d > 1:
            out = depth_to_space(out, s2d)
        out = out.astype(jnp.float32)
        rgb = rgb.astype(jnp.float32)

        alpha = jnp.clip(out[..., 0:1], 0.0, 1.0)
        fgr = jnp.clip(out[..., 1:4] + rgb, 0.0, 1.0)

        if cfg.use_trimap and frame.shape[-1] >= 4:
            # Trimap-conditioned matting: known fg/bg regions are pinned and
            # only the unknown band is predicted (Deep-Image-Matting-lineage
            # behavior [DOMAIN]).
            tri = frame[..., 3:4]
            alpha = jnp.where(tri >= 0.75, 1.0,
                              jnp.where(tri <= 0.25, 0.0, alpha))

        if rec:
            new_state = RecurrentState(h3=n3, h2=n2, h1=n1)
        else:
            new_state = state
        return alpha, fgr, new_state
