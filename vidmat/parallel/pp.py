"""Pipeline-parallel stage overlap for recurrent-stream serving (SURVEY.md
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

- One SPMD program under ``jax.shard_map``. The per-device stage is
  selected at runtime by ``lax.cond(lax.axis_index('pp') == 0, ...)`` —
  XLA's conditional executes only the taken branch, so each device pays
  only its stage's cost. Both branches return identically-shaped dummies
  for the other stage's outputs (a zero-filled packed frame on device 0,
  zero coeff grids on device 1; ~0.01 ms of HBM writes at 1080p — noise).
- The stage handoff is a ``lax.ppermute`` ring shift of the coarse
  coefficient grids (2 × (1, H/pool, W/pool, 4) f32 — ~4 MB at 1080p,
  ~0.05 ms on a v5e ICI link). Collectives sit OUTSIDE the cond: every
  device reaches them every step.
- The input frame arrives replicated along 'pp' (both devices need it:
  device 0 ingests it, device 1 stores it for next step's refine);
  per-device carry (recurrent state on device 0; pending frame + coeffs
  on device 1) is a pytree stacked on a leading pp axis and sharded over
  it.
- ``chunk=K`` wraps the step in ``lax.scan`` inside the shard_map — the
  pipeline streams through the chunk with the same one-frame skew, and
  the per-dispatch floor is amortized K-fold exactly as in
  pipeline/video.py.

DP×PP composition (``PipelinedStreams``): the pipelined pair generalizes
to S independent streams over a 2-axis ``('stream', 'pp')`` mesh of S×2
devices — one SPMD program where the stream axis shards the frame batch
(pure DP, zero cross-stream communication) and each stream-row runs the
2-stage cond/ppermute pipeline above (``ppermute`` over a named axis
permutes within each row of the mesh). N streams over 2N chips, each at
pipelined throughput. ``PipelinedMatting`` is the S=1 adapter preserving
the single-stream (H, W, 3) API on a plain 2-device mesh.

Conditioned families ride along: a trimap-conditioned model takes
(H, W, 4) uint8 frames (RGB + the {0, 128, 255} trimap byte — the same
convention as MultiStreamMatting / the stepfactory body), sizing the
pending-frame carry slot accordingly; the clean-plate family's plate is a
stage-0 build-time constant (``bg_plate=`` — stepfactory ``cond_const``),
so it never touches the carry or the ppermute ring at all.

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


class PipelinedStreams:
    """S independent recurrent streams, each 2-stage pipelined: the DP×PP
    composition over a ``('stream', 'pp')`` mesh of S×2 devices.

    step(frames_u8 (S, H, W, C)) -> (alpha (S, H, W, 1),
    rgba (S, H, W, 4)) for the PREVIOUS round (None on the first call —
    pipeline fill); flush() drains the last in-flight round. convert()
    hides the skew and yields one aligned (alpha, rgba) round per input
    round. C is 3 (RGB) or 4 for a trimap-conditioned ``cfg`` (RGB plus
    a uint8 {0, 128, 255} trimap channel — MultiStreamMatting's frame
    convention).
    """

    def __init__(self, num_streams: int, height: int, width: int,
                 mesh: Mesh,
                 cfg: ModelConfig = ModelConfig(), variables=None,
                 downsample_ratio: float = 0.25,
                 refine: RefineConfig = RefineConfig(),
                 dtype: str = "bfloat16",
                 bg_color: Optional[Tuple[float, float, float]] = None,
                 bg_blur: Optional[int] = None,
                 bg_plate: Optional[np.ndarray] = None,
                 tile_size: Optional[int] = None,
                 tile_overlap: int = 64,
                 chunk: int = 1,
                 use_pallas: Optional[bool] = None,
                 pallas_interpret: bool = False):
        shape = dict(zip(mesh.axis_names, mesh.devices.shape))
        if (len(mesh.axis_names) != 2
                or mesh.devices.shape[1] != 2
                or mesh.devices.shape[0] != num_streams):
            raise ValueError(
                f"PipelinedStreams needs a ('stream', 'pp')-shaped 2-axis "
                f"mesh of num_streams x 2 devices; got num_streams="
                f"{num_streams}, mesh {shape}")
        if height % 16 or width % 16:
            raise ValueError("height/width must be multiples of 16")
        if bg_blur and bg_color is not None:
            raise ValueError("bg_blur composites over a blur of the "
                             "source frame; it is mutually exclusive "
                             "with bg_color")
        self.s = num_streams
        self.h, self.w = height, width
        self.in_c = 4 if cfg.use_trimap else 3
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
            bg_blur=bg_blur, pallas_interpret=pallas_interpret,
            # The clean plate is a stage-0 traced constant (stepfactory
            # cond_const): replicated per device, consumed only by the
            # coarse branch — nothing rides the carry or the ring.
            bg_plate=(jnp.asarray(bg_plate) if bg_plate is not None
                      else None))
        if plan.fused_stage0 is None:
            raise ValueError(
                "pipeline-parallel serving needs the fully fused tail: an "
                "integer downsample pool > 1, refine mode 'guided', a "
                "Pallas backend, and coefficient grids that fit VMEM "
                f"(got pool={plan.pool}, mode={refine.mode!r}, "
                f"use_pallas={use_pallas})")
        stage0, stage1 = plan.fused_stage0, plan.fused_stage1
        self._plan = plan
        s_ax, ax = mesh.axis_names
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
            # shift the coefficient grids one hop within the stream row;
            # device 1 receives the grids it will apply next step,
            # device 0 receives zeros.
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
        strip = jax.tree_util.tree_map
        if self.chunk == 1:
            def step(variables, frames_u8, carry):
                # local shapes: frames (1, 1, H, W, C) [stream, N, ...],
                # carry leaves (1, 1, ...) [stream, pp, ...] — strip the
                # stream axis, run the pp-local step, re-add it.
                c = strip(lambda l: l[0], carry)
                out, nc = local_step(variables, frames_u8[0], c)
                return out[None], strip(lambda l: l[None], nc)
        else:
            def step(variables, frames_u8, carry):
                # local frames: (K, 1, 1, H, W, C) [K, stream, N, ...] —
                # strip the stream axis (axis 1), scan over K.
                c = strip(lambda l: l[0], carry)

                def sbody(cc, f):
                    out, ncc = local_step(variables, f, cc)
                    return ncc, out

                nc, outs = jax.lax.scan(sbody, c, frames_u8[:, 0])
                return outs[:, None], strip(lambda l: l[None], nc)

        rep, sh = P(), P(s_ax, ax)
        # Frames shard over 'stream' and replicate over 'pp'; chunked
        # tensors carry the scan's K axis in front.
        f_sh = P(s_ax) if self.chunk == 1 else P(None, s_ax)
        out_sh = P(s_ax, ax) if self.chunk == 1 else P(None, s_ax, ax)
        # check_vma=False: pallas_call outputs carry no varying-mesh-axis
        # annotation, and the replicated frame is intentionally stored
        # into the per-device (sharded) carry.
        self._step = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(rep, f_sh, sh),
            out_specs=(out_sh, sh), check_vma=False))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, sh)
        self._frame_sharding = NamedSharding(mesh, f_sh)
        self._fed = 0
        self._last = None
        self.reset()

    def reset(self) -> None:
        """Empty the pipeline and zero the recurrent state."""
        plan = self._plan
        hl, wl = plan.net_h, plan.net_w
        st = plan.make_state(1)
        s = self.s

        def stack(l):
            # (S, 2, ...) — per-stream, per-stage private slots (all-zero
            # at reset; device 0's slice is the live recurrent state).
            return jnp.zeros((s, 2) + l.shape, l.dtype)

        carry = (
            jax.tree_util.tree_map(stack, st),
            jnp.zeros((s, 2, 1, hl, wl, 4), jnp.float32),
            jnp.zeros((s, 2, 1, hl, wl, 4), jnp.float32),
            *((jnp.zeros((s, 2, 1, hl, wl, 3), jnp.float32),)
              if self._use_blur else ()),
            jnp.zeros((s, 2, 1, self.h, self.w, self.in_c), jnp.uint8),
        )
        self._carry = jax.device_put(carry, self._sharding)
        self._fed = 0
        self._last = None

    def _check_channels(self, frames_u8) -> None:
        if frames_u8.shape[-1] != self.in_c:
            kind = ("trimap-conditioned (RGB + trimap channel)"
                    if self.in_c == 4 else "RGB")
            raise ValueError(
                f"frames have {frames_u8.shape[-1]} channels; this "
                f"{kind} model takes {self.in_c}")

    def _dispatch(self, rounds_u8: np.ndarray) -> np.ndarray:
        """Run one (possibly chunked) device step on (K, S, H, W, C)
        rounds; returns host RGBA (K, S, H, W, 4) in feed order — round k
        is the output for the round fed one step BEFORE rounds_u8[k]."""
        self._check_channels(rounds_u8)
        if self.chunk > 1:
            x = jnp.asarray(rounds_u8[:, :, None])   # (K, S, 1, H, W, C)
        else:
            x = jnp.asarray(rounds_u8[0][:, None])   # (S, 1, H, W, C)
        x = jax.device_put(x, self._frame_sharding)
        out, self._carry = self._step(self.variables, x, self._carry)
        # out: chunk==1 -> (S, 2, 1, H, W); chunk=K -> (K, S, 2, 1, H, W).
        # Keep the pp=1 (refine-stage) column.
        packed = np.asarray(out)
        packed = (packed[:, :, 1, 0] if packed.ndim == 6
                  else packed[None, :, 1, 0])
        from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

        return unpack_rgba_host(packed)

    def step(self, frames_u8: np.ndarray
             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Feed one (S, H, W, C) uint8 round; returns (alpha (S, H, W, 1),
        rgba (S, H, W, 4)) for the PREVIOUS round, or None on the first
        call while the pipeline fills. chunk must be 1 for the streaming
        step; use convert() for chunked throughput mode."""
        if self.chunk != 1:
            raise ValueError("step() is the chunk=1 streaming API; "
                             "use convert() with chunk>1")
        rgba = self._dispatch(np.asarray(frames_u8)[None])[0]
        self._fed += 1
        self._last = np.asarray(frames_u8)
        if self._fed == 1:
            return None
        return rgba[..., 3:4], rgba

    def flush(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Drain the in-flight round (re-feeds the last round to advance
        the pipe; its stage-0 work is discarded). chunk must be 1 — the
        streaming step/flush pair; convert() owns chunked draining (a
        chunk>1 dispatch here would feed a K=1 round into the K=chunk
        compiled program)."""
        if self.chunk != 1:
            raise ValueError("flush() is the chunk=1 streaming API; "
                             "convert() drains the pipeline itself "
                             "with chunk>1")
        if self._fed == 0 or self._last is None:
            return None
        rgba = self._dispatch(self._last[None])[0]
        return rgba[..., 3:4], rgba

    def convert(self, rounds: Iterable[np.ndarray]
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Pipeline a whole clip of (S, H, W, C) rounds: yields
        (alpha, rgba) aligned 1:1 with the input rounds (the 1-round skew
        and the tail drain are handled internally). Resets state first;
        terminal — the pipeline is drained when the iterator ends."""
        self.reset()
        # Global output index: output k is the refinement of input k-1
        # (input 0.. n-1 real, n.. pad repeats of the last round), so the
        # aligned outputs are exactly 1 <= k <= n.
        k = 0
        n_seen = 0
        buf: list = []
        last = None

        def run(chunk_rounds, n_total=None):
            nonlocal k
            out = self._dispatch(np.stack(chunk_rounds))
            self._fed += len(chunk_rounds)
            for rgba in out:
                if k >= 1 and (n_total is None or k <= n_total):
                    yield rgba[..., 3:4], rgba
                k += 1

        for f in rounds:
            buf.append(np.asarray(f))
            last = buf[-1]
            n_seen += 1
            if len(buf) == self.chunk:
                yield from run(buf)
                buf = []
        if last is None:
            return
        # Drain: at least one extra fed position pushes the final output
        # out; pad the (possibly empty) trailing chunk with repeats of
        # the last round. Their stage-0 work is discarded by the k-index
        # gate above.
        pad = (self.chunk - len(buf)) or self.chunk
        buf.extend([last] * pad)
        yield from run(buf, n_total=n_seen)


class PipelinedMatting(PipelinedStreams):
    """Two-device stage-pipelined serving of ONE recurrent stream: the
    S=1 adapter over PipelinedStreams, preserving the single-stream
    (H, W, C) frame API on a plain 1-axis 2-device mesh.

    step(frame_u8 (H, W, C)) -> (alpha (H, W, 1), rgba (H, W, 4)) for the
    PREVIOUS frame (None on the first call — pipeline fill); flush()
    drains the last in-flight frame. convert(frames) hides the skew and
    yields one aligned output per input frame.
    """

    def __init__(self, height: int, width: int, mesh: Mesh, **kwargs):
        if mesh.devices.size != 2 or len(mesh.axis_names) != 1:
            raise ValueError(
                "PipelinedMatting needs a 1-axis mesh of exactly 2 devices "
                f"(got shape {dict(zip(mesh.axis_names, mesh.devices.shape))});"
                " for N streams x 2 stages use PipelinedStreams on a "
                "('stream', 'pp') mesh of Nx2 devices")
        m2 = Mesh(mesh.devices.reshape(1, 2), ("stream", mesh.axis_names[0]))
        super().__init__(1, height, width, m2, **kwargs)

    def step(self, frame_u8: np.ndarray
             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        r = super().step(np.asarray(frame_u8)[None])
        return None if r is None else (r[0][0], r[1][0])

    def flush(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        r = super().flush()
        return None if r is None else (r[0][0], r[1][0])

    def convert(self, frames: Iterable[np.ndarray]
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for alpha, rgba in super().convert(
                np.asarray(f)[None] for f in frames):
            yield alpha[0], rgba[0]
