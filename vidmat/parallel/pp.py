"""Pipeline-parallel stage overlap for single-stream serving (SURVEY.md
§2.2 "PP": optional stage-pipelining of ingest→net→refine→composite across
cores — the one parallelism axis left optional in the MVP).

Why PP at all: a single recurrent stream cannot be data-parallelized
(frame t's network pass consumes frame t-1's state), so one stream's
throughput is capped by one chip's step time no matter how many chips are
idle. The serving chain, however, splits cleanly at the coefficient
boundary the fused tail already exposes (pipeline/stepfactory.py):

  stage 0 (coarse, recurrent):  ingest → planar net → GF coefficient grids
  stage 1 (full-res, stateless): fused refine+composite kernel → packed RGBA

Stage 1 for frame t needs only (frame t, coeff grids t) — not the
recurrent state — so device 1 can refine frame t-1 while device 0 runs the
network on frame t. Steady-state throughput becomes
``1 / max(t_coarse, t_refine)`` instead of ``1 / (t_coarse + t_refine)``,
at a latency cost of exactly one frame.

TPU-native shape of the implementation (how, not what):

- One SPMD program under ``jax.shard_map`` over a 2-device ``('pp',)``
  mesh axis. The per-device stage is selected at runtime by
  ``lax.cond(lax.axis_index('pp') == 0, ...)`` — XLA's conditional
  executes only the taken branch, so each device pays only its stage's
  cost. Both branches return identically-shaped dummies for the other
  stage's outputs (a zero-filled packed frame on device 0, zero coeff
  grids on device 1; ~0.01 ms of HBM writes at 1080p — noise).
- The stage handoff is a ``lax.ppermute`` ring shift of the coarse
  coefficient grids (2 × (1, H/pool, W/pool, 4) f32 — ~4 MB at 1080p,
  ~0.05 ms on a v5e ICI link). Collectives sit OUTSIDE the cond: every
  device reaches them every step.
- The input frame arrives replicated (both devices need it: device 0
  ingests it, device 1 stores it for next step's refine); per-device
  carry (recurrent state on device 0; pending frame + coeffs on
  device 1) is a pytree stacked on a leading pp axis and sharded over it.
- ``chunk=K`` wraps the step in ``lax.scan`` inside the shard_map — the
  pipeline streams through the chunk with the same one-frame skew, and
  the per-dispatch floor is amortized K-fold exactly as in
  pipeline/video.py.

The stage functions are ``ServingPlan.fused_stage0/1`` — the SAME
closures the one-shot serving body composes — so pipelined outputs are
bit-identical to single-device serving by construction
(tests/unit/test_pp.py pins this against MultiStreamMatting on the
virtual CPU mesh).

Scope: the split requires the fully fused packed tail (integer pool > 1,
guided refinement, coefficient grids resident in VMEM — the 1080p/4K
preset configs, tiled or not). Deeper splits (partitioning the conv stack
itself) would ship multi-megabyte skip tensors over ICI every hop for a
net whose whole forward is ~0.2 ms — measured against this model class
the coefficient boundary is the only cut where the payload (4 MB) is
small relative to the stage work on both sides.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import default_variables
from vidmat.pipeline.stepfactory import build_serving_body


class PipelinedMatting:
    """Two-device stage-pipelined serving of ONE recurrent stream.

    step(frame_u8 (H, W, 3)) -> (alpha (H, W, 1), rgba (H, W, 4)) for the
    PREVIOUS frame (None on the first call — pipeline fill); flush()
    drains the last in-flight frame. convert(frames) hides the skew and
    yields one aligned output per input frame.
    """

    def __init__(self, height: int, width: int, mesh: Mesh,
                 cfg: ModelConfig = ModelConfig(), variables=None,
                 downsample_ratio: float = 0.25,
                 refine: RefineConfig = RefineConfig(),
                 dtype: str = "bfloat16",
                 bg_color: Optional[Tuple[float, float, float]] = None,
                 bg_blur: Optional[int] = None,
                 tile_size: Optional[int] = None,
                 tile_overlap: int = 64,
                 chunk: int = 1,
                 use_pallas: Optional[bool] = None,
                 pallas_interpret: bool = False):
        if mesh.devices.size != 2 or len(mesh.axis_names) != 1:
            raise ValueError(
                "PipelinedMatting needs a 1-axis mesh of exactly 2 devices "
                f"(got shape {dict(zip(mesh.axis_names, mesh.devices.shape))});"
                " for >2 devices run pipelined pairs under multi-stream DP")
        if height % 16 or width % 16:
            raise ValueError("height/width must be multiples of 16")
        if bg_blur and bg_color is not None:
            raise ValueError("bg_blur composites over a blur of the "
                             "source frame; it is mutually exclusive "
                             "with bg_color")
        if cfg.use_trimap or cfg.use_bg_plate:
            # The frame carry slot is 3-channel RGB; a trimap-conditioned
            # stream (4-channel frames) or a plate-conditioned model (a
            # per-run plate constant on stage 0) would mismatch the
            # shard_map carry structure deep inside jit. Fail at
            # construction instead.
            raise ValueError(
                "PipelinedMatting does not support conditioned models "
                "(use_trimap / use_bg_plate); serve those through "
                "convert_video / MattingSession / MultiStreamMatting")
        self.h, self.w = height, width
        self.cfg = cfg
        self.variables = jax.tree_util.tree_map(
            jnp.asarray, variables if variables is not None
            else default_variables(cfg))
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        net = MattingNetwork(cfg, dtype=cdtype if dtype == "bfloat16"
                             else None)
        bg = (jnp.asarray(bg_color, jnp.float32)
              if bg_color is not None else None)
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu" or pallas_interpret)

        _, plan = build_serving_body(
            net, cfg, refine, height, width, downsample_ratio,
            cdtype=cdtype, bg=bg, use_pallas=use_pallas,
            tile_size=tile_size, tile_overlap=tile_overlap,
            bg_blur=bg_blur, pallas_interpret=pallas_interpret)
        if plan.fused_stage0 is None:
            raise ValueError(
                "pipeline-parallel serving needs the fully fused tail: an "
                "integer downsample pool > 1, refine mode 'guided', a "
                "Pallas backend, and coefficient grids that fit VMEM "
                f"(got pool={plan.pool}, mode={refine.mode!r}, "
                f"use_pallas={use_pallas})")
        stage0, stage1 = plan.fused_stage0, plan.fused_stage1
        self._plan = plan
        hl, wl = plan.net_h, plan.net_w
        ax = mesh.axis_names[0]
        h_, w_ = height, width

        use_blur = self._use_blur = bool(bg_blur)

        def local_step(variables, frame_u8, carry):
            # carry leaves arrive with the local (1,)-sized pp axis in
            # front; index it off to recover each device's private slot.
            # bg_blur adds one slot: the pending coarse blurred
            # background (a stage-0 product, ppermuted with the grids).
            if use_blur:
                st_stk, pa_stk, pb_stk, pg_stk, pf_stk = carry
                pg = pg_stk[0]
            else:
                st_stk, pa_stk, pb_stk, pf_stk = carry
            st = jax.tree_util.tree_map(lambda l: l[0], st_stk)
            pa, pb, pf = pa_stk[0], pb_stk[0], pf_stk[0]
            idx = jax.lax.axis_index(ax)

            if use_blur:
                def coarse(_):
                    (ma, mb, bgc), ns = stage0(variables, frame_u8, st)
                    return (ma, mb, bgc.astype(jnp.float32),
                            jnp.zeros((1, h_, w_), jnp.uint32), ns)

                def refine_prev(_):
                    out = stage1(pf, pa, pb, pg)
                    return (jnp.zeros_like(pa), jnp.zeros_like(pb),
                            jnp.zeros_like(pg), out, st)

                ma, mb, bgc, out, ns = jax.lax.cond(idx == 0, coarse,
                                                    refine_prev, None)
            else:
                def coarse(_):
                    (ma, mb), ns = stage0(variables, frame_u8, st)
                    return ma, mb, jnp.zeros((1, h_, w_), jnp.uint32), ns

                def refine_prev(_):
                    out = stage1(pf, pa, pb, bg)
                    return jnp.zeros_like(pa), jnp.zeros_like(pb), out, st

                ma, mb, out, ns = jax.lax.cond(idx == 0, coarse,
                                               refine_prev, None)
            # Handoff OUTSIDE the cond (every device participates): ring-
            # shift the coefficient grids one hop; device 1 receives the
            # grids it will apply next step, device 0 receives zeros.
            perm = [(0, 1), (1, 0)]
            ra = jax.lax.ppermute(ma, ax, perm)
            rb = jax.lax.ppermute(mb, ax, perm)
            ns_stk = jax.tree_util.tree_map(lambda l: l[None], ns)
            if use_blur:
                rg = jax.lax.ppermute(bgc, ax, perm)
                new_carry = (ns_stk, ra[None], rb[None], rg[None],
                             frame_u8[None])
            else:
                new_carry = (ns_stk, ra[None], rb[None], frame_u8[None])
            return out[None], new_carry

        self.chunk = max(1, chunk)
        if self.chunk == 1:
            def step(variables, frame_u8, carry):
                return local_step(variables, frame_u8, carry)
        else:
            def step(variables, frames_u8, carry):
                def sbody(c, f):
                    out, nc = local_step(variables, f, c)
                    return nc, out
                new_carry, outs = jax.lax.scan(sbody, carry, frames_u8)
                return outs, new_carry

        rep, sh = P(), P(ax)
        # Chunked outputs carry the scan's K axis in front; the pp axis
        # (device 1 holds the real frames) is axis 1 there, axis 0 for
        # the per-frame step.
        out_sh = sh if self.chunk == 1 else P(None, ax)
        # check_vma=False: pallas_call outputs carry no varying-mesh-axis
        # annotation, and the replicated frame is intentionally stored
        # into the per-device (sharded) carry.
        self._step = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(rep, rep, sh),
            out_specs=(out_sh, sh), check_vma=False))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P(ax))
        self._fed = 0
        self._last = None
        self.reset()

    def reset(self) -> None:
        """Empty the pipeline and zero the recurrent state."""
        plan = self._plan
        hl, wl = plan.net_h, plan.net_w
        st = plan.make_state(1)
        carry = (
            jax.tree_util.tree_map(
                lambda l: jnp.stack([l, jnp.zeros_like(l)]), st),
            jnp.zeros((2, 1, hl, wl, 4), jnp.float32),
            jnp.zeros((2, 1, hl, wl, 4), jnp.float32),
            *((jnp.zeros((2, 1, hl, wl, 3), jnp.float32),)
              if self._use_blur else ()),
            jnp.zeros((2, 1, self.h, self.w, 3), jnp.uint8),
        )
        self._carry = jax.device_put(carry, self._sharding)
        self._fed = 0
        self._last = None

    def _dispatch(self, frames_u8: jnp.ndarray) -> np.ndarray:
        """Run one (possibly chunked) device step; returns host RGBA
        (K, H, W, 4) in feed order — entry k is the output for the frame
        fed one step BEFORE frames_u8[k]."""
        if self.chunk > 1:
            # scan carries the (N=1) batch axis per step: (K, 1, H, W, 3)
            frames_u8 = frames_u8[:, None]
        out, self._carry = self._step(self.variables, frames_u8,
                                      self._carry)
        # out: chunk==1 -> (2, 1, H, W); chunk=K -> (K, 2, 1, H, W) with
        # the pp axis stacked by the out_spec. Keep device 1's slice.
        packed = np.asarray(out)
        packed = packed[:, 1, 0] if packed.ndim == 5 else packed[1]
        from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

        return unpack_rgba_host(packed)

    def step(self, frame_u8: np.ndarray
             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Feed one (H, W, 3) uint8 frame; returns (alpha (H, W, 1),
        rgba (H, W, 4)) for the PREVIOUS frame, or None on the first call
        while the pipeline fills. chunk must be 1 for the streaming step;
        use convert() for chunked throughput mode."""
        if self.chunk != 1:
            raise ValueError("step() is the chunk=1 streaming API; "
                             "use convert() with chunk>1")
        rgba = self._dispatch(jnp.asarray(frame_u8[None]))[0]
        self._fed += 1
        self._last = np.asarray(frame_u8)
        if self._fed == 1:
            return None
        return rgba[..., 3:4], rgba

    def flush(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Drain the in-flight frame (re-feeds the last frame to advance
        the pipe; its stage-0 work is discarded)."""
        if self._fed == 0 or self._last is None:
            return None
        rgba = self._dispatch(jnp.asarray(self._last[None]))[0]
        return rgba[..., 3:4], rgba

    def convert(self, frames: Iterable[np.ndarray]
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Pipeline a whole clip: yields (alpha, rgba) aligned 1:1 with
        the input frames (the 1-frame skew and the tail drain are handled
        internally). Resets state first; terminal — the pipeline is
        drained when the iterator ends."""
        self.reset()
        # Global output index: output k is the refinement of input k-1
        # (input 0.. n-1 real, n.. pad repeats of the last frame), so the
        # aligned outputs are exactly 1 <= k <= n.
        k = 0
        n_seen = 0
        buf: list = []
        last = None

        def run(chunk_frames, n_total=None):
            nonlocal k
            out = self._dispatch(jnp.asarray(np.stack(chunk_frames)))
            self._fed += len(chunk_frames)
            for rgba in out:
                if k >= 1 and (n_total is None or k <= n_total):
                    yield rgba[..., 3:4], rgba
                k += 1

        for f in frames:
            buf.append(f)
            last = f
            n_seen += 1
            if len(buf) == self.chunk:
                yield from run(buf)
                buf = []
        if last is None:
            return
        # Drain: at least one extra fed position pushes the final output
        # out; pad the (possibly empty) trailing chunk with repeats of
        # the last frame. Their stage-0 work is discarded by the k-index
        # gate above.
        pad = (self.chunk - len(buf)) or self.chunk
        buf.extend([last] * pad)
        yield from run(buf, n_total=n_seen)
