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
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.weights import init_params
from vidmat.ops.composite import composite_rgba
from vidmat.ops.guided_filter import guided_upsample
from vidmat.ops.resize import downsample_ratio_shape, resize_bilinear


class MultiStreamMatting:
    """Batched matting over S independent streams of identical resolution.

    step(frames_u8 (S, H, W, 3), reset_mask (S,) bool) ->
        (alpha_u8, fgr_u8) on host.
    """

    def __init__(self, num_streams: int, height: int, width: int,
                 cfg: ModelConfig = ModelConfig(), variables=None,
                 mesh: Optional[Mesh] = None,
                 downsample_ratio: float = 1.0,
                 refine: RefineConfig = RefineConfig(),
                 dtype: str = "bfloat16",
                 bg_color: Optional[Tuple[float, float, float]] = None):
        if height % 16 or width % 16:
            raise ValueError("height/width must be multiples of 16")
        self.s = num_streams
        self.h, self.w = height, width
        self.cfg = cfg
        self.variables = variables if variables is not None else init_params(cfg)
        cdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.cdtype = cdtype

        if downsample_ratio < 1.0:
            net_h, net_w = downsample_ratio_shape(height, width,
                                                  downsample_ratio)
        else:
            net_h, net_w = height, width
        self.net_h, self.net_w = net_h, net_w
        full = (net_h, net_w) == (height, width)
        net = MattingNetwork(cfg, dtype=cdtype if dtype == "bfloat16"
                             else None)
        bg = jnp.asarray(bg_color, jnp.float32) if bg_color is not None else None
        mult = 16 * cfg.space_to_depth
        pad_nh, pad_nw = -net_h % mult, -net_w % mult
        self._state_hw = (net_h + pad_nh, net_w + pad_nw)
        use_pallas = jax.default_backend() == "tpu"

        def step(variables, frames_u8, state, reset_mask):
            # masked per-stream state reset (scene cut / stream restart)
            keep = (1.0 - reset_mask.astype(cdtype)).reshape(-1, 1, 1, 1)
            state = jax.tree_util.tree_map(lambda h: h * keep, state)

            frames = frames_u8.astype(jnp.float32) * (1.0 / 255.0)
            x = frames.astype(cdtype)
            if not full:
                x = resize_bilinear(x, net_h, net_w)
            x = (jnp.pad(x, ((0, 0), (0, pad_nh), (0, pad_nw), (0, 0)),
                         mode="edge") if (pad_nh or pad_nw) else x)
            alpha, fgr, new_state = net.apply(variables, x, state)
            alpha = alpha[:, :net_h, :net_w].astype(jnp.float32)
            fgr = fgr[:, :net_h, :net_w].astype(jnp.float32)
            pool = (height // net_h
                    if (not full and height % net_h == 0
                        and width % net_w == 0
                        and height // net_h == width // net_w) else 0)
            if (use_pallas and pool > 1 and refine.mode == "guided"
                    and bg is not None):
                # fully fused tail (see pipeline/video.py): emits packed
                # RGBA; alpha is the high byte.
                from vidmat.ops.guided_filter import gray_guide
                from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs
                from vidmat.ops.pallas.refine_kernel import (
                    fused_refine_composite)

                x32 = (x[:, :net_h, :net_w] if (pad_nh or pad_nw)
                       else x).astype(jnp.float32)
                p = jnp.concatenate([alpha, fgr], axis=-1)
                ma, mb = guided_filter_coeffs(gray_guide(x32), p,
                                              radius=refine.guided_radius,
                                              eps=refine.guided_eps)
                packed = fused_refine_composite(frames_u8, ma, mb, bg,
                                                pool=pool)
                alpha_u8 = (packed >> 24).astype(jnp.uint8)
                rgba_u8 = jnp.stack(
                    [((packed >> (8 * c)) & 0xFF).astype(jnp.uint8)
                     for c in range(4)], axis=-1)
                return alpha_u8[..., None], rgba_u8, new_state
            if not full:
                if refine.mode == "guided":
                    alpha, fgr = guided_upsample(frames, alpha, fgr,
                                                 refine.guided_radius,
                                                 refine.guided_eps)
                else:
                    alpha = resize_bilinear(alpha, height, width)
                    fgr = resize_bilinear(fgr, height, width)
            alpha_u8 = jnp.round(alpha * 255.0).astype(jnp.uint8)
            if bg is not None:
                out = composite_rgba(fgr, alpha, bg)
            else:
                out = jnp.round(fgr * 255.0).astype(jnp.uint8)
            return alpha_u8, out, new_state

        if mesh is not None:
            stream_ax = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(stream_ax))
            self._sharding = shard
            self._step = jax.jit(
                step,
                in_shardings=(None, shard, shard, shard),
                out_shardings=(shard, shard, shard),
            )
        else:
            self._sharding = None
            self._step = jax.jit(step)
        self.mesh = mesh
        self.state = init_state(cfg, num_streams, *self._state_hw, cdtype)
        if self._sharding is not None:
            self.state = jax.device_put(self.state, self._sharding)

    def step(self, frames_u8: np.ndarray,
             reset_mask: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        if reset_mask is None:
            reset_mask = np.zeros((self.s,), bool)
        f = jnp.asarray(frames_u8)
        if self._sharding is not None:
            f = jax.device_put(f, self._sharding)
        alpha_u8, out_u8, self.state = self._step(
            self.variables, f, self.state, jnp.asarray(reset_mask))
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
        while any(alive) and (max_frames is None or n < max_frames):
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
                break
            # Native threaded pad+stack (C++ framestage) — the host-side
            # batch-assembly hot path for S concurrent streams.
            from vidmat.io.native import pad_stack

            batch = pad_stack(
                [f if f is not None else
                 np.zeros((self.h, self.w, 3), np.uint8) for f in last],
                self.h, self.w)
            t0 = time.perf_counter()
            alpha, out = self.step(batch, reset)
            metrics.record_frame(time.perf_counter() - t0)
            if on_output is not None:
                for i in range(self.s):
                    if alive[i]:
                        on_output(i, n, alpha[i], out[i])
            n += 1
        summary = metrics.summary()
        summary["batch_steps"] = n
        summary["stream_fps"] = summary.get("fps", 0.0) * self.s
        return summary
