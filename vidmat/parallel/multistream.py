"""Multi-stream real-time serving: N concurrent streams batched across TPU
cores with per-stream temporal state (BASELINE.json:11).

Design (SURVEY.md §3.4): streams are embarrassingly data-parallel — the
batch dim IS the stream dim, sharded over the mesh 'stream' axis. The whole
step is one jitted SPMD program; in steady state there is no cross-device
communication (each core runs its streams' convs locally). Per-stream state
lives in a batched RecurrentState pytree sharded the same way, so a stream
reset is a masked zero of its state slot — no host round-trip, no batch
stall (SURVEY.md §5 failure detection / per-stream isolation).

Host side: one decode thread per stream feeds per-stream queues; the serving
loop gathers one frame per stream, stacks, and enqueues a single H2D copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vidmat.config import ModelConfig, RefineConfig
from vidmat.models.matting_net import MattingNetwork
from vidmat.models.weights import default_variables
from vidmat.pipeline.stepfactory import build_serving_body


class MultiStreamMatting:
    """Batched matting over S independent streams of identical resolution.

    step(frames_u8 (S, H, W, C), reset_mask (S,) bool) ->
        (alpha_u8, fgr_u8) on host.

    C is 3 (RGB), or 4 for a trimap-conditioned ``cfg`` (RGB plus a
    uint8 {0, 128, 255} trimap channel per stream — e.g. from an
    upstream per-stream segmentation model via
    ``train.data.trimap_from_mask``); the serving body consumes the
    stacked 4-channel frame exactly as ``convert_video(trimap_source=)``
    does (pipeline/stepfactory.py body contract).
    """

    def __init__(self, num_streams: int, height: int, width: int,
                 cfg: ModelConfig = ModelConfig(), variables=None,
                 mesh: Optional[Mesh] = None,
                 downsample_ratio: float = 1.0,
                 refine: RefineConfig = RefineConfig(),
                 dtype: str = "bfloat16",
                 bg_color: Optional[Tuple[float, float, float]] = None,
                 bg_blur: Optional[int] = None,
                 bg_plate: Optional[np.ndarray] = None,
                 chunk: int = 1,
                 use_pallas: Optional[bool] = None,
                 pallas_interpret: bool = False):
        if height % 16 or width % 16:
            raise ValueError("height/width must be multiples of 16")
        if bg_blur and bg_color is not None:
            raise ValueError("bg_blur composites over a blur of each "
                             "stream's own frames; it is mutually "
                             "exclusive with bg_color")
        if mesh is not None and num_streams % mesh.devices.size:
            # Cheap precondition first — before the (possibly raising,
            # seconds-long) default-checkpoint restore below.
            raise ValueError(
                f"num_streams={num_streams} must divide evenly over the "
                f"{mesh.devices.size}-device mesh (per-device local batch)")
        if bg_plate is not None:
            bg_plate = np.asarray(bg_plate)
            if bg_plate.ndim == 4 and bg_plate.shape[0] != num_streams:
                raise ValueError(
                    f"per-stream bg_plate batch {bg_plate.shape[0]} != "
                    f"num_streams {num_streams}")
            if bg_plate.ndim == 4 and mesh is not None:
                # A per-stream plate is a closure CONSTANT of the body;
                # under shard_map constants replicate per device, so an
                # (S, ...) plate cannot pair with the local (S/ndev, ...)
                # shard. A SHARED plate broadcasts fine on every path.
                raise ValueError(
                    "per-stream bg_plate is a single-chip feature; on a "
                    "mesh use one shared (H, W, 3) plate, or run one "
                    "MultiStreamMatting per device group")
        self.s = num_streams
        self.h, self.w = height, width
        self.in_c = 4 if cfg.use_trimap else 3
        self.cfg = cfg
        # Shipped trained weights or a loud error — never silent
        # random-weight serving (VERDICT r2 item 2); committed to device
        # once (numpy leaves re-transfer on every jitted call).
        self.variables = jax.tree_util.tree_map(
            jnp.asarray, variables if variables is not None
            else default_variables(cfg))
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.cdtype = cdtype

        net = MattingNetwork(cfg, dtype=cdtype if dtype == "bfloat16"
                             else None)
        bg = jnp.asarray(bg_color, jnp.float32) if bg_color is not None else None

        # Shared serving body (vidmat.pipeline.stepfactory) — one
        # implementation with pipeline/video.py and bench.py. The meshed
        # path runs the SAME body under jax.shard_map over the stream
        # axis: streams are embarrassingly data-parallel, each device
        # executes its local shard's batch, and Pallas calls are
        # per-device local — so the fused ingest/planar/tail kernels
        # apply on multi-chip serving too (VERDICT r2 item 1; the round-2
        # GSPMD path had to fall back to XLA convs).
        # pallas_interpret lets the CPU-mesh tests drive the real kernel
        # path in interpreter mode.
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          or pallas_interpret)
        # bg None keeps the raw-foreground output contract (the packed word
        # carries composited RGB), so it forces the u8-tuple path.
        # bg_blur (portrait mode): each stream composites over a blur of
        # its OWN frames — the coarse background is synthesized per batch
        # row inside the body (vmapped with the stream axis), so it
        # shards over the mesh with everything else.
        body, plan = build_serving_body(
            net, cfg, refine, height, width, downsample_ratio,
            cdtype=cdtype, bg=bg, use_pallas=use_pallas,
            need_fgr=(bg is None and not bg_blur), bg_blur=bg_blur,
            pallas_interpret=pallas_interpret,
            # Clean-plate conditioning: one shared (H, W, 3) plate
            # broadcasts over the stream batch on every path (under
            # shard_map the replicated constant broadcasts to the local
            # shard); per-stream (S, H, W, 3) plates ride the single-chip
            # vmapped path (validated above).
            bg_plate=(jnp.asarray(bg_plate) if bg_plate is not None
                      else None))
        self.net_h, self.net_w = plan.net_h, plan.net_w
        self._state_hw = (plan.state_h, plan.state_w)
        self._packed = plan.packed

        def frame_step(variables, frames_u8, state, reset_mask):
            # masked per-stream state reset (scene cut / stream restart);
            # rank-agnostic: NHWC RecurrentState leaves are (S, h, w, c),
            # planar-path leaves are (S, C, TOTAL)
            keep = 1.0 - reset_mask.astype(cdtype)
            state = jax.tree_util.tree_map(
                lambda h: h * keep.reshape((-1,) + (1,) * (h.ndim - 1)),
                state)
            outs, new_state = body(variables, frames_u8, state)
            if plan.packed:
                # alpha rides the high byte; host unpacks the single packed
                # D2H (io.native.unpack_rgba) — keep it packed on-device.
                return outs, outs, new_state
            alpha_u8, fgr_u8, rgba = outs
            out = rgba if (bg is not None or bg_blur) else fgr_u8
            return alpha_u8, out, new_state

        self.chunk = max(1, chunk)
        if self.chunk == 1:
            step = frame_step
        else:
            # Throughput mode: K frames per stream per dispatch via
            # lax.scan — amortizes the per-call dispatch floor K-fold at
            # the cost of K-frame output latency (the caller opts in;
            # serve() reports latency_granularity accordingly).
            def step(variables, frames_u8, state, reset_mask):
                def sbody(s, fr):
                    f, r = fr
                    a, o, ns = frame_step(variables, f, s, r)
                    return ns, (a, o)
                new_state, (alpha, out) = jax.lax.scan(
                    sbody, state, (frames_u8, reset_mask))
                return alpha, out, new_state

        if mesh is not None:
            # shard_map over the stream axis (SURVEY.md §3.4): each device
            # traces the serving body on its LOCAL (S/n_dev) batch, so the
            # Pallas kernels run per-device — no GSPMD partitioning of
            # pallas_call needed, no cross-device communication in steady
            # state (streams are independent).
            stream_ax = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(stream_ax))
            self._sharding = shard
            rep, sh = P(), P(stream_ax)
            # _step1: per-frame dispatch (also serves partial tail chunks
            # in chunked mode — compiled lazily on first use).
            # check_vma=False: pallas_call outputs carry no varying-mesh-
            # axis annotation, and the body is communication-free anyway
            # (each stream's chain touches only its own shard).
            self._step1 = jax.jit(jax.shard_map(
                frame_step, mesh=mesh, in_specs=(rep, sh, sh, sh),
                out_specs=(sh, sh, sh), check_vma=False))
            if self.chunk == 1:
                self._step = self._step1
                self._frame_sharding = shard
            else:
                # Chunked inputs/outputs carry a leading time axis; the
                # stream axis (sharded) is axis 1.
                tsh = P(None, stream_ax)
                self._step = jax.jit(jax.shard_map(
                    step, mesh=mesh, in_specs=(rep, tsh, sh, tsh),
                    out_specs=(tsh, tsh, sh), check_vma=False))
                self._frame_sharding = NamedSharding(mesh, tsh)
        else:
            self._sharding = None
            self._frame_sharding = None
            self._step1 = jax.jit(frame_step)
            self._step = self._step1 if self.chunk == 1 else jax.jit(step)
        self.mesh = mesh
        self.state = plan.make_state(num_streams)
        if self._sharding is not None:
            self.state = jax.device_put(self.state, self._sharding)

    def step(self, frames_u8: np.ndarray,
             reset_mask: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        """One dispatch. chunk=1: frames (S, H, W, 3), reset (S,).
        chunk=K: frames (K, S, H, W, 3), reset (K, S); outputs carry the
        matching leading K axis."""
        if reset_mask is None:
            shape = (self.s,) if self.chunk == 1 else (self.chunk, self.s)
            reset_mask = np.zeros(shape, bool)
        return self._dispatch(self._step, self._frame_sharding,
                              frames_u8, reset_mask)

    def _dispatch(self, step_fn, sharding, frames_u8, reset_mask):
        if frames_u8.shape[-1] != self.in_c:
            kind = ("trimap-conditioned (RGB + trimap channel)"
                    if self.in_c == 4 else "RGB")
            raise ValueError(
                f"frames have {frames_u8.shape[-1]} channels; this "
                f"{kind} model takes {self.in_c}")
        f = jnp.asarray(frames_u8)
        if sharding is not None:
            f = jax.device_put(f, sharding)
        alpha_u8, out_u8, self.state = step_fn(
            self.variables, f, self.state, jnp.asarray(reset_mask))
        if self._packed:
            # One packed-RGBA D2H for the whole batch; zero-copy host split.
            from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

            rgba = unpack_rgba_host(np.asarray(out_u8))
            return rgba[..., 3:4], rgba
        return np.asarray(alpha_u8), np.asarray(out_u8)

    def step_device(self, frames_u8, reset_mask):
        """Device-resident step for benchmarking (no D2H)."""
        alpha_u8, out_u8, self.state = self._step(
            self.variables, frames_u8, self.state, reset_mask)
        return alpha_u8, out_u8

    def serve(self, stream_sources: Sequence[Iterable[np.ndarray]],
              on_output=None, max_frames: Optional[int] = None) -> dict:
        """Drive S live streams: per-stream decode threads -> stacked batch
        step -> demux to on_output(stream_idx, frame_idx, alpha, out).

        A stream that ends (or faults) keeps its slot alive with its last
        frame and a standing reset flag, so the batch never stalls
        (SURVEY.md §5 elastic per-stream recovery)."""
        from vidmat.utils.metrics import RunMetrics

        qs: List[queue.Queue] = [queue.Queue(maxsize=4) for _ in range(self.s)]
        _END = object()

        def produce(i, src):
            try:
                for frame in src:
                    qs[i].put(frame)
            finally:
                qs[i].put(_END)

        threads = [threading.Thread(target=produce, args=(i, s), daemon=True)
                   for i, s in enumerate(stream_sources)]
        for t in threads:
            t.start()

        metrics = RunMetrics()
        last = [None] * self.s
        alive = [True] * self.s
        n = 0
        import time

        # Native threaded pad+stack (C++ framestage) — the host-side
        # batch-assembly hot path for S concurrent streams.
        from vidmat.io.native import pad_stack

        def gather_round():
            """One (S,) round of frames + reset flags; returns None when
            every stream is done and drained."""
            reset = np.zeros((self.s,), bool)
            for i in range(self.s):
                if not alive[i]:
                    continue
                item = qs[i].get()
                if item is _END:
                    alive[i] = False
                    reset[i] = True  # slot recycles; state cleared
                else:
                    last[i] = item
            if all(f is None for f in last):
                return None
            batch = pad_stack(
                [f if f is not None else
                 np.zeros((self.h, self.w, self.in_c), np.uint8)
                 for f in last],
                self.h, self.w)
            return batch, reset, list(alive)

        while any(alive) and (max_frames is None or n < max_frames):
            # Gather up to `chunk` rounds; a full chunk goes through the
            # scan step (one dispatch), a partial tail (stream ended or
            # max_frames boundary mid-chunk) drains per-frame via _step1 —
            # no filler frames, no spurious state resets.
            want = self.chunk if max_frames is None else min(
                self.chunk, max_frames - n)
            rounds = []
            while len(rounds) < want and any(alive):
                r = gather_round()
                if r is None:
                    break
                rounds.append(r)
            if not rounds:
                break
            k = len(rounds)
            t0 = time.perf_counter()
            if self.chunk > 1 and k == self.chunk:
                batch = np.stack([r[0] for r in rounds])
                reset = np.stack([r[1] for r in rounds])
                alpha, out = self.step(batch, reset)
                per_round = [(alpha[j], out[j]) for j in range(k)]
            else:
                per_round = []
                for b, rs, _ in rounds:
                    a, o = self._dispatch(self._step1, self._sharding, b, rs)
                    per_round.append((a, o))
            dt = time.perf_counter() - t0
            for _ in range(k):
                metrics.record_frame(dt / k)
            if on_output is not None:
                for j, (a_j, o_j) in enumerate(per_round):
                    for i in range(self.s):
                        if rounds[j][2][i]:
                            on_output(i, n + j, a_j[i], o_j[i])
            n += k
        summary = metrics.summary()
        summary["batch_steps"] = n
        summary["stream_fps"] = summary.get("fps", 0.0) * self.s
        if self.chunk > 1:
            # dt/k above is an amortized per-round cost, not an observed
            # per-frame latency (same caveat as pipeline chunking).
            summary["latency_granularity"] = (
                f"per-{self.chunk}-round-dispatch")
        return summary
