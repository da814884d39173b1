"""Full video pipeline driver: decode -> device steady-state -> encode.

Layer L5 of the plan (SURVEY.md §1.2). Steady-state design (BASELINE.json:5):
  - host decode thread feeds a prefetch queue (vidmat.io.FrameSource)
  - per-frame device step is one jitted call: ingest (resize/normalize) ->
    recurrent net -> guided-filter refine -> composite; recurrent state never
    leaves HBM
  - a one-frame software pipeline overlaps D2H readback + host encode of
    frame t-1 with device compute of frame t
  - writers consume from bounded queues on their own threads

Per-frame host work is limited to the H2D enqueue of decoded uint8 RGB —
normalization, resize, packing all happen on-device (zero host-side per-frame
preprocessing, BASELINE.json:5).
"""

from __future__ import annotations

import time
from typing import Iterable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vidmat.config import ModelConfig, PipelineConfig
from vidmat.models.matting_net import MattingNetwork, init_state
from vidmat.models.weights import init_params
from vidmat.ops.composite import composite_rgba
from vidmat.ops.guided_filter import guided_upsample
from vidmat.ops.resize import downsample_ratio_shape, resize_bilinear
from vidmat.io.reader import FrameSource
from vidmat.io.writer import VideoWriter
from vidmat.utils.metrics import RunMetrics


def auto_downsample_ratio(h: int, w: int) -> float:
    """Coarse-pass ratio heuristic: aim the network at ~512px on the short
    side (RVM-style auto ratio [DOMAIN])."""
    short = min(h, w)
    if short <= 512:
        return 1.0
    return max(0.125, 512.0 / short)


def _load_default_refiner(refiner, h: int, w: int, net_h: int, net_w: int):
    """Load the shipped trained error-map refiner weights, or raise.

    Conv params are resolution-independent, so a fixed-shape template init
    is enough to shape the checkpoint restore.
    """
    import os

    import jax.random as jrandom

    from vidmat.models.weights import load_checkpoint

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))),
        "checkpoints", "errormap_demo")
    template = refiner.init(
        jrandom.PRNGKey(0),
        jnp.zeros((1, h, w, 3), jnp.float32),
        jnp.zeros((1, net_h, net_w, 3), jnp.float32),
        jnp.zeros((1, net_h, net_w, 1), jnp.float32))
    if not os.path.isdir(ckpt):
        raise ValueError(
            "refine.mode='errormap' needs trained refiner weights: pass "
            "refiner_variables=... (the default checkpoint "
            f"{ckpt} is not present). Random-weight refinement would "
            "silently degrade the alpha, so it is refused.")
    return load_checkpoint(ckpt, template=template)


class VideoPipeline:
    """End-to-end video matting (BASELINE.json:8-10 rungs)."""

    def __init__(self, model_cfg: ModelConfig = ModelConfig(),
                 pipe_cfg: Optional[PipelineConfig] = None,
                 variables=None, downsample_ratio: Optional[float] = None,
                 bg_color: Optional[Tuple[float, float, float]] = None,
                 refiner_variables=None):
        self.model_cfg = model_cfg
        self.pipe_cfg = pipe_cfg or PipelineConfig()
        self.variables = (variables if variables is not None
                          else init_params(model_cfg))
        self.downsample_ratio = downsample_ratio
        self.bg_color = bg_color
        cdtype = (jnp.bfloat16 if self.pipe_cfg.dtype == "bfloat16"
                  else None)
        self.net = MattingNetwork(model_cfg, dtype=cdtype)
        self._refiner = None
        self._refiner_vars = refiner_variables
        if self.pipe_cfg.refine.mode == "errormap":
            from vidmat.refine.errormap import ErrorMapRefiner

            self._refiner = ErrorMapRefiner(
                num_patches=self.pipe_cfg.refine.errormap_patches,
                patch_size=self.pipe_cfg.refine.errormap_patch_size)

    def _build_step(self, h: int, w: int, ratio: float,
                    need_fgr: bool = False):
        """One jitted device step for a (h, w) stream at a coarse ratio.

        Also returns a jitted chunk step (lax.scan of the same body over K
        stacked frames) when pipe_cfg.chunk_size > 1 — the dispatch-
        amortizing path for offline conversion on directly-attached TPUs
        (on the dev tunnel per-frame dispatch measured faster; see
        docs/PERFORMANCE.md).
        """
        cfg = self.pipe_cfg
        cdtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        net_h, net_w = ((h, w) if ratio >= 1.0
                        else downsample_ratio_shape(h, w, ratio))
        full = (net_h, net_w) == (h, w)
        refine = cfg.refine
        bg = (jnp.asarray(self.bg_color, jnp.float32)
              if self.bg_color is not None else None)
        net = self.net
        refiner = None
        if self._refiner is not None and (net_h, net_w) != (h, w):
            if self._refiner_vars is None:
                # Never run errormap refinement with random weights: the
                # patch residuals would silently DEGRADE the alpha (ADVICE
                # round 1). Auto-load the shipped trained refiner, or fail
                # loudly so the caller passes refiner_variables.
                self._refiner_vars = _load_default_refiner(
                    self._refiner, h, w, net_h, net_w)
            refiner = (self._refiner, self._refiner_vars)

        # Pallas serving path (auto on TPU): fused area-pool ingest when the
        # coarse ratio is an integer pool, fused GF stats, packed composite.
        use_pallas = (cfg.use_pallas if cfg.use_pallas is not None
                      else jax.default_backend() == "tpu")
        # The packed word holds composited RGB (premultiplied when bg is
        # None) + alpha; a raw-foreground output needs the tuple path.
        use_packed = use_pallas and not need_fgr
        pool = (h // net_h if (not full and h % net_h == 0
                               and w % net_w == 0
                               and h // net_h == w // net_w) else 0)
        gf_impl = "pallas" if use_pallas else "xla"
        # space_to_depth models need the coarse grid padded to 16*s2d.
        mult = 16 * self.model_cfg.space_to_depth
        pad_nh = -net_h % mult
        pad_nw = -net_w % mult
        # fully fused tail (coeffs at coarse res + one-pass refine/composite
        # kernel) applies on the packed pallas path with an integer pool
        # and guided refinement without tiling.
        use_fused = (use_packed and pool > 1 and refine.mode == "guided"
                     and not cfg.tile_size)

        def body(variables, frame_u8, state):
            # Ingest: uint8 HWC -> float, resize, normalize — all on-device.
            frame = frame_u8.astype(jnp.float32) * (1.0 / 255.0)
            if use_pallas and pool:
                from vidmat.ops.pallas import ingest_pool_normalize

                x = ingest_pool_normalize(frame_u8, pool=pool,
                                          out_dtype=cdtype)
            else:
                x = frame.astype(cdtype)
                if not full:
                    x = resize_bilinear(x, net_h, net_w)
            xp = (jnp.pad(x, ((0, 0), (0, pad_nh), (0, pad_nw), (0, 0)),
                          mode="edge") if (pad_nh or pad_nw) else x)
            alpha, fgr, new_state = net.apply(variables, xp, state)
            alpha = alpha[:, :net_h, :net_w].astype(jnp.float32)
            fgr = fgr[:, :net_h, :net_w].astype(jnp.float32)
            if use_fused:
                from vidmat.ops.guided_filter import gray_guide
                from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs
                from vidmat.ops.pallas.refine_kernel import (
                    fused_refine_composite)

                p = jnp.concatenate([alpha, fgr], axis=-1)
                ma, mb = guided_filter_coeffs(
                    gray_guide(x.astype(jnp.float32)), p,
                    radius=refine.guided_radius, eps=refine.guided_eps)
                packed = fused_refine_composite(frame_u8, ma, mb, bg,
                                                pool=pool)
                return packed, new_state
            if not full:
                if refine.mode == "guided" and cfg.tile_size and pool:
                    # Tiled/patch full-res refine with overlap blending
                    # (BASELINE.json:10) — bounds full-res intermediates at
                    # very large resolutions.
                    from vidmat.refine.tiling import tiled_guided_upsample

                    alpha, fgr = tiled_guided_upsample(
                        frame, alpha, fgr, cfg.tile_size, cfg.tile_overlap,
                        refine.guided_radius, refine.guided_eps,
                        impl=gf_impl)
                elif refine.mode == "guided":
                    alpha, fgr = guided_upsample(
                        frame, alpha, fgr, refine.guided_radius,
                        refine.guided_eps, impl=gf_impl)
                elif refine.mode == "errormap" and refiner is not None:
                    x32 = x.astype(jnp.float32)
                    alpha, _err = refiner[0].apply(refiner[1], frame, x32,
                                                   alpha)
                    fgr = resize_bilinear(fgr, h, w)
                else:
                    alpha = resize_bilinear(alpha, h, w)
                    fgr = resize_bilinear(fgr, h, w)
            if use_packed:
                from vidmat.ops.pallas import composite_rgba_packed

                packed = composite_rgba_packed(fgr, alpha, bg)
                # alpha rides the high byte of the packed words; fgr is the
                # low 24 bits — writers unpack the one packed D2H transfer.
                return packed, new_state
            rgba = composite_rgba(fgr, alpha, bg)
            alpha_u8 = jnp.round(alpha * 255.0).astype(jnp.uint8)
            fgr_u8 = jnp.round(fgr * 255.0).astype(jnp.uint8)
            return (alpha_u8, fgr_u8, rgba), new_state

        step = jax.jit(body)
        chunk_step = None
        if cfg.chunk_size > 1:
            @jax.jit
            def chunk_step(variables, frames_u8, state):
                # frames_u8: (K, 1, H, W, 3)
                def scan_body(s, f):
                    outs, ns = body(variables, f, s)
                    return ns, outs
                new_state, outs = jax.lax.scan(scan_body, state, frames_u8)
                return outs, new_state

        return step, chunk_step, (net_h + pad_nh, net_w + pad_nw)

    def run(self, input_source: Union[str, Iterable[np.ndarray]],
            output_alpha: Optional[str] = None,
            output_foreground: Optional[str] = None,
            output_composition: Optional[str] = None,
            progress: bool = False) -> dict:
        source = FrameSource(input_source)
        metrics = RunMetrics()
        writers = {}
        step = None
        state = None
        pending = None  # (device outputs of previous frame) — 1-frame pipeline

        def flush(outs):
            fh, fw = self._crop  # drop the bucket padding before encode
            if isinstance(outs, tuple):
                alpha_u8, fgr_u8, rgba = outs
                if "alpha" in writers:
                    writers["alpha"].write(np.asarray(alpha_u8)[0, :fh, :fw])
                if "fgr" in writers:
                    writers["fgr"].write(np.asarray(fgr_u8)[0, :fh, :fw])
                if "comp" in writers:
                    writers["comp"].write(np.asarray(rgba)[0, :fh, :fw])
                return
            # Pallas path: one packed-RGBA D2H, host-side zero-copy split.
            from vidmat.ops.pallas.composite_kernel import unpack_rgba_host

            rgba = unpack_rgba_host(np.asarray(outs))[0, :fh, :fw]
            if "alpha" in writers:
                writers["alpha"].write(rgba[..., 3])
            if "fgr" in writers:
                writers["fgr"].write(rgba[..., :3])
            if "comp" in writers:
                writers["comp"].write(rgba)

        n = 0
        chunk_step = None
        chunk_buf = []
        t_prev = time.perf_counter()
        for frame in source:
            if step is None:
                fh, fw = frame.shape[:2]
                # Ratio resolution order: explicit constructor arg >
                # PipelineConfig.downsample_ratio > auto heuristic.
                ratio = self.downsample_ratio
                if ratio is None:
                    ratio = self.pipe_cfg.downsample_ratio
                if ratio is None:
                    ratio = auto_downsample_ratio(fh, fw)
                ph, pw = fh + ((-fh) % 16), fw + ((-fw) % 16)
                step, chunk_step, (state_h, state_w) = self._build_step(
                    ph, pw, ratio, need_fgr=bool(output_foreground))
                cdtype = (jnp.bfloat16 if self.pipe_cfg.dtype == "bfloat16"
                          else jnp.float32)
                state = (init_state(self.model_cfg, 1, state_h, state_w,
                                    cdtype)
                         if self.model_cfg.recurrent else None)
                if output_alpha:
                    writers["alpha"] = VideoWriter(output_alpha, source.fps)
                if output_foreground:
                    writers["fgr"] = VideoWriter(output_foreground, source.fps)
                if output_composition:
                    writers["comp"] = VideoWriter(output_composition,
                                                  source.fps)
                self._crop = (fh, fw)
                self._pad = (ph - fh, pw - fw)

            if self._pad != (0, 0):
                from vidmat.io.native import pad_stack

                host_frame = pad_stack([frame],
                                       frame.shape[0] + self._pad[0],
                                       frame.shape[1] + self._pad[1])
            else:
                host_frame = frame[None]
            if chunk_step is not None:
                # Chunked path: K frames per dispatch via lax.scan.
                chunk_buf.append(host_frame)
                if len(chunk_buf) < self.pipe_cfg.chunk_size:
                    continue
                stacked = jnp.asarray(np.stack(chunk_buf))
                chunk_buf = []
                outs_k, state = chunk_step(self.variables, stacked, state)
                if pending is not None:
                    flush(pending)
                    pending = None
                k = self.pipe_cfg.chunk_size
                for i in range(k):
                    part = (jax.tree_util.tree_map(lambda x: x[i], outs_k)
                            if isinstance(outs_k, tuple) else outs_k[i])
                    if i < k - 1:
                        flush(part)
                    else:
                        pending = part  # overlap last frame's D2H/encode
                    n += 1
                    t_now = time.perf_counter()
                    metrics.record_frame((t_now - t_prev) / k)
                t_prev = time.perf_counter()
                continue
            outs, state = step(self.variables, jnp.asarray(host_frame),
                               state)
            if pending is not None:
                flush(pending)  # overlap: host writes frame t-1 while device
                # computes frame t
            pending = outs
            n += 1
            t_now = time.perf_counter()
            metrics.record_frame(t_now - t_prev)
            t_prev = t_now
            if progress and n % 50 == 0:
                print(f"frame {n}", flush=True)

        # Drain the partial last chunk with the per-frame step.
        for host_frame in chunk_buf:
            outs, state = step(self.variables, jnp.asarray(host_frame),
                               state)
            if pending is not None:
                flush(pending)
            pending = outs
            n += 1
        if pending is not None:
            jax.block_until_ready(pending)
            flush(pending)
        for wtr in writers.values():
            wtr.close()
        out = metrics.summary()
        out["frames"] = n
        out["dropped_frames"] = source.dropped
        return out
