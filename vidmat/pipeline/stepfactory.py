"""Single source of truth for the serving step body.

Round 1 grew three drifting near-copies of the same ~60-line serving body
(``pipeline/video.py``, ``parallel/multistream.py``, ``bench.py``) — and the
multistream copy silently lost the fused Pallas ingest win. This factory is
the one implementation all three call sites build from (VERDICT round 1,
item 5).

The body maps one uint8 frame batch through the full serving chain:

  ingest (fused Pallas area-pool+normalize on TPU, bilinear elsewhere)
  -> recurrent matting net (bf16, space-to-depth aware padding)
  -> refinement tail (fully fused Pallas refine+composite when the coarse
     ratio is an integer pool; else guided / tiled / errormap / bilinear)
  -> output packing (one uint32 RGBA word per pixel on the Pallas path, so
     the host does a single D2H; else u8 tuple)

All shapes are static per (h, w, ratio) bucket so the jitted step never
retraces in steady state (SURVEY.md §7 "avoiding retraces").
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from vidmat.config import ModelConfig, RefineConfig
from vidmat.ops.composite import composite_rgba
from vidmat.ops.guided_filter import guided_upsample
from vidmat.ops.resize import downsample_ratio_shape, resize_bilinear


@dataclasses.dataclass(frozen=True)
class ServingPlan:
    """Static facts about a built serving body that call sites need."""

    net_h: int          # coarse grid fed to the network (pre-s2d-padding)
    net_w: int
    state_h: int        # recurrent-state grid (coarse + s2d padding)
    state_w: int
    pool: int           # integer area-pool factor (0 = non-integer ratio)
    packed: bool        # body returns (N,H,W) uint32 packed RGBA
    alpha_only: bool    # body returns (N,H,W) uint8 alpha (packed>>24)
    static_skip: bool   # body carries a (net_state, coeff-cache) tuple and
    #                     skips the net on static frames (see
    #                     static_skip_eps)
    full: bool          # network runs at full resolution (no coarse pass)
    # Chunk-batched dispatch body (or None): takes (K, 1, H, W, 3) uint8
    # frames and runs the STATELESS work (ingest + planar encoder +
    # bottleneck + GF stats + fused tail) batched over the chunk — only
    # the recurrent decoder scans. Same contract as lax.scan-ning the
    # per-frame body: (outs (K, ...), new_state).
    chunk_body: object = None
    # Zero recurrent carry for a given batch size (None when the model is
    # non-recurrent). The carry TYPE depends on the conv path: NHWC
    # RecurrentState for "xla", planar planes for "planar".
    make_state: object = None
    # Pipeline-parallel stage split of the fused path (set only when the
    # body takes the fully fused tail). The one-shot body composes these
    # two (plus the on-device alpha-byte extract when plan.alpha_only),
    # so a 2-device pipeline built from them is bit-identical to
    # single-device serving by construction (parallel/pp.py):
    #   fused_stage0(variables, frame_u8, state) -> (ma, mb), new_state
    #     (with bg_blur: -> (ma, mb, coarse_bg), new_state — the blurred
    #     coarse background is a stage-0 product, handed to stage 1)
    #   fused_stage1(frame_u8, ma, mb, bgv) -> (N, H, W) uint32 packed
    fused_stage0: object = None
    fused_stage1: object = None


def build_serving_body(
    net,
    model_cfg: ModelConfig,
    refine: RefineConfig,
    h: int,
    w: int,
    ratio: float,
    *,
    cdtype=jnp.bfloat16,
    bg: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    need_fgr: bool = False,
    tile_size: Optional[int] = None,
    tile_overlap: int = 64,
    refiner: Optional[tuple] = None,
    refine_at_full: bool = False,
    bg_dynamic: bool = False,
    pallas_interpret: bool = False,
    float_frames: bool = False,
    float_output: bool = False,
    alpha_only: bool = False,
    static_skip_eps: Optional[float] = None,
    bg_blur: Optional[int] = None,
    bg_plate: Optional[jax.Array] = None,
    output_seg: bool = False,
) -> Tuple[Callable, ServingPlan]:
    """Build the (un-jitted) serving body for a static (h, w, ratio) bucket.

    net:      a constructed MattingNetwork (its dtype decides the conv path).
    bg:       (3,) float background, or None (premultiplied-alpha output).
    use_pallas: None = auto (TPU backend only). Pallas calls are not GSPMD-
              partitionable, so pass False when the body runs under a
              sharded GSPMD jit; under jax.shard_map the calls are
              per-device local and the kernels apply (the multistream
              mesh path — VERDICT r2 item 1).
    pallas_interpret: run every Pallas kernel in interpreter mode (the
              kernel sanitizer) — lets CPU tests execute the REAL kernel
              serving path, e.g. under a virtual shard_map mesh.
    float_frames: the body takes (N, h, w, C) float32 frames in [0, 1]
              instead of uint8 (the fp32 parity contract of the streaming
              stepper). Disables the u8-consuming kernels (ingest, fused
              tail); everything else is shared.
    float_output: return (alpha (N,h,w,1), fgr (N,h,w,3)) float32 instead
              of quantized/packed output — no composite, no quantization
              (streaming MattingSession contract; parity harnesses).
    need_fgr: caller needs RAW foreground; forces the u8-tuple output (the
              packed word carries composited/premultiplied RGB).
    refiner:  optional (ErrorMapRefiner, variables) for refine.mode
              == 'errormap'.
    refine_at_full: also run guided refinement when the net runs at full
              resolution (edge-aware smoothing rather than upsampling).
    bg_dynamic: per-frame background replacement (video background): the
              body takes an extra (N, h, w, 3) float [0,1] bg argument
              traced per call instead of a baked constant (`bg` must be
              None). Single-frame serving path (N = 1).
    alpha_only: the caller consumes ONLY the alpha matte (e.g.
              convert_video with just output_alpha): the packed-path body
              extracts the alpha byte on device and returns (N, h, w)
              uint8 — a 4x smaller D2H than the packed words (2 MB vs
              8 MB at 1080p). Exact: the byte is the same quantized value
              the packed word carries. Ignored on non-packed paths.
    bg_blur:  portrait-mode background blur — composite the foreground
              over a BLURRED version of the source frame instead of a
              replacement color/image. The value is the blur radius in
              full-resolution pixels; the blur itself is an
              edge-truncated box mean computed at the COARSE grid
              (radius/pool) from the already-ingested frame, then
              bilinearly upsampled. On the fused packed tail the
              upsample happens INSIDE the refine kernel (bg_mode
              'coarse' — the same banded matmuls that upsample the
              coefficient grids), so the full-resolution background
              never materializes in HBM. Mutually exclusive with
              bg / bg_dynamic; ignored when float_output (that contract
              emits raw alpha+fgr, no composite).
    bg_plate: the clean-plate family's pre-captured background plate
              (model_cfg.use_bg_plate — BGMv2 lineage): (h, w, 3) frame
              -dtype image (uint8; float [0,1] when float_frames), or
              (N, h, w, 3) for per-slot plates on a batched single-chip
              body. Ingested ONCE here through the SAME ingest path the
              per-frame frames take (pool/resize + normalize, so the
              plate channels are commensurate with the frame channels)
              and baked into the program as a coarse-grid traced
              constant: zero extra per-frame H2D and zero per-frame
              ingest work, unlike a per-frame input channel. The guide,
              tails, composite, and the static-skip delta all see the
              frame channels only; the net sees ingest(frame) ++ plate.
    output_seg: build the SEGMENTATION body instead of the matting body
              (RVM-lineage downstream/debug output): the same ingest +
              trunk (encoder, bottleneck, recurrent decoder, d0 — the
              recurrent state advances exactly as the matting pass) with
              the co-trained ``seg_head`` (matting_net seg_pass; planar
              tap models/planar.py output='seg'), bilinear upsample of
              the coarse logits to full res, sigmoid. The body returns
              (mask (N, h, w, 1) float32 probability, new_state) — the
              refine/composite tails do not apply to a segmentation mask.
              Requires a co-trained checkpoint (a ``seg_head`` subtree in
              the params — weights.init_params(cfg, with_seg=True) /
              graft_seg_params / the shipped seg_demo).
    static_skip_eps: opt-in static-scene fast path (temporal layer
              caching in the ReFrame sense, PAPERS.md): when the ingested
              coarse frame's mean abs delta vs the previous frame is
              <= eps (in [0,1] units, e.g. 0.5/255), a lax.cond SKIPS the
              net forward + GF-stats (only the taken branch executes on
              TPU) and reuses the cached coefficient grids; the fused
              tail still runs on the CURRENT frame. The carry becomes
              (net_state, (prev_x, ma, mb, skip_count)). Batch-1 fused
              packed path only (under vmap a cond lowers to select and
              executes both branches — no win); ignored elsewhere. The
              recurrent state is frozen across skipped frames — sound
              for truly-static content (the matte should not change),
              and the conservative default threshold keeps ordinary
              video on the compute branch.

    Returns (body, plan) where
      body(variables, frame_u8 (N,h,w,3) uint8, state[, bg_frame])
        -> (outs, new_state)
      With model_cfg.use_trimap the frame is (N,h,w,4) uint8: RGB plus
      the trimap byte ({0, 128, 255} = bg/unknown/fg, normalized /255 on
      device with the RGB — the same semantics ImageStepper applies to a
      uint8 trimap). The net consumes all 4 channels; the guide, tails,
      and composite see RGB only.
      outs = (N,h,w) uint8 alpha          if plan.alpha_only
           | (N,h,w) uint32 packed RGBA   if plan.packed
           | (alpha_u8 (N,h,w,1), fgr_u8 (N,h,w,3), rgba (N,h,w,4))
    """
    if bg_dynamic and bg is not None:
        raise ValueError("bg_dynamic takes bg per call; build with bg=None")
    if bg_blur and (bg is not None or bg_dynamic):
        raise ValueError("bg_blur composites over a blur of the source "
                         "frame; it is mutually exclusive with bg / "
                         "bg_dynamic")
    net_h, net_w = ((h, w) if ratio >= 1.0
                    else downsample_ratio_shape(h, w, ratio))
    if bg_plate is not None and not model_cfg.use_bg_plate:
        raise ValueError(
            "bg_plate given but the model is not plate-conditioned — "
            "build with ModelConfig(use_bg_plate=True) (shipped "
            "plate_demo at space_to_depth=2), or drop bg_plate")
    if model_cfg.use_bg_plate and bg_plate is None:
        raise ValueError(
            "model_cfg.use_bg_plate=True needs the pre-captured clean "
            "background plate: pass bg_plate=<(h, w, 3) image> (the "
            "scene WITHOUT the subject)")
    if bg_plate is not None:
        bg_plate = jnp.asarray(bg_plate)
        if bg_plate.ndim == 3:
            bg_plate = bg_plate[None]
        if bg_plate.shape[-3:] != (h, w, 3):
            raise ValueError(
                f"bg_plate must be ([N,] {h}, {w}, 3) matching the frame "
                f"bucket — got {bg_plate.shape} (resize the plate to the "
                "stream resolution on host first)")
    full = (net_h, net_w) == (h, w)
    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu") or pallas_interpret
    use_packed = use_pallas and not need_fgr and not float_output
    pool = (h // net_h if (not full and h % net_h == 0 and w % net_w == 0
                           and h // net_h == w // net_w) else 0)
    gf_impl = "pallas" if use_pallas else "xla"
    # space_to_depth models need the coarse grid padded to 16*s2d.
    mult = 16 * model_cfg.space_to_depth
    pad_nh = -net_h % mult
    pad_nw = -net_w % mult
    # Fully fused tail (GF coeffs at coarse res + one-pass refine/composite
    # kernel): packed pallas path with an integer pool, guided refinement,
    # and a coefficient grid that fits scoped VMEM (a small pool at a
    # large resolution, e.g. pool=2 at 4K, cannot — the kernel holds both
    # coeff grids resident; refine_kernel.refine_tiles_fit).
    kernel_tail_ok = (use_pallas and pool > 1 and refine.mode == "guided"
                      and not float_frames)
    use_fused = use_packed and kernel_tail_ok
    # Float-output / need_fgr contracts can't take the packed tail, but
    # the SAME in-VMEM banded coefficient upsample applies via the
    # float-emitting kernel variant (fused_refine_float): the XLA
    # dense-interpolation coefficient resize measured ~38 ms/frame at
    # 1080p (~1% MXU efficiency — docs/PERFORMANCE.md round 3).
    use_float_tail = (not use_packed) and kernel_tail_ok
    # Tiled rung (BASELINE.json:10): the feathered overlap blend commutes
    # EXACTLY with the pointwise guided apply (the guide is shared across
    # tiles, so sum_i w_i (a_i g + b_i) = (sum w_i a_i) g + (sum w_i b_i))
    # — so tiling runs per-COARSE-tile GF stats, feather-blends the
    # coefficient grids at coarse res (cheap), and applies the whole-frame
    # fused kernel once. 4K tiled thereby runs at fused-tail speed instead
    # of materializing full-res per-tile intermediates (VERDICT r2 item 4:
    # 207 fps -> 1190).
    if tile_size and kernel_tail_ok:
        geom_ok = (tile_size % pool == 0 and tile_overlap % pool == 0)
        use_fused = use_fused and geom_ok
        use_float_tail = use_float_tail and geom_ok
    if use_fused or use_float_tail:
        from vidmat.ops.pallas.refine_kernel import refine_tiles_fit

        # Per-pixel backgrounds (bg image / bg video) add a (3, th, wc)
        # f32 tile to the kernel's resident set — size with that flag so
        # the estimator never picks an unfittable tile (ADVICE round 2).
        has_bg_image = bg_dynamic or (bg is not None and jnp.ndim(bg) == 3)
        if use_fused:
            use_fused = refine_tiles_fit(h, w, net_h, net_w,
                                         has_bg_image=has_bg_image,
                                         has_bg_coarse=bool(bg_blur))
        if use_float_tail:
            # f32 alpha+fgr output planes: 48 B per output pixel resident.
            use_float_tail = refine_tiles_fit(h, w, net_h, net_w,
                                              px_bytes=48)
    fused_tiled = bool(tile_size) and (use_fused or use_float_tail)

    # Planar Pallas conv path (models/planar.py): the whole net runs in
    # flattened planar layout — small-channel activations never touch
    # lane-padded NHWC in HBM. Batch-1 TPU serving only.
    state_h, state_w = net_h + pad_nh, net_w + pad_nw
    use_planar = use_pallas and model_cfg.conv_impl == "planar"
    planar_fwd = None
    if use_planar:
        from vidmat.models.planar import build_planar_forward

        planar_fwd = build_planar_forward(
            model_cfg, state_h, state_w, dtype=cdtype,
            interpret=pallas_interpret,
            output="seg" if output_seg else "matte")

    def net_apply(variables, xp, state):
        if planar_fwd is not None:
            # Batched (multi-stream) vs single-frame planar serving is
            # decided by the STATE layout, not the frame batch: batched
            # state leaves are (B, C, TOTAL) — under shard_map a local
            # shard can be batch-1 yet still carry the batched state
            # convention (planar_init_state_batched).
            leaves = jax.tree_util.tree_leaves(state)
            batched = (leaves[0].ndim == 3 if leaves
                       else xp.shape[0] > 1)
            if not batched:
                return planar_fwd(variables, xp, state)
            from vidmat.models.planar import batch_planar_forward

            return batch_planar_forward(planar_fwd)(variables, xp, state)
        if output_seg:
            return net.apply(variables, xp, state, seg_pass=True)
        return net.apply(variables, xp, state)

    # Static-scene fast path: any coefficient-consuming fused tail
    # qualifies — the packed tail (convert_video) and the float tail
    # (streaming MattingSession in bf16 serving mode). The fp32 parity
    # stepper (float_frames) keeps the plain body.
    use_static_skip = (static_skip_eps is not None and not float_frames
                       and (use_fused or use_float_tail))

    # Portrait-mode background blur (bg_blur): synthesize the background
    # from the ingested coarse frame. float_output emits raw alpha+fgr
    # (no composite), so the flag is a no-op there by contract.
    use_bg_blur = bool(bg_blur) and not float_output
    if use_bg_blur:
        from vidmat.ops.guided_filter import box_blur

        # Coarse-grid radius that keeps the requested full-res footprint.
        blur_rc = max(1, round(bg_blur * net_h / h))

        def bg_from_x(x):
            """(N, net_h, net_w, 3) [0,1] coarse background: box blur of
            the already-ingested (already [0,1]-normalized) frame (RGB
            channels only — trimap-conditioned frames carry a 4th
            channel)."""
            return box_blur(x[..., :3].astype(jnp.float32), blur_rc)

    def make_state(batch: int):
        if use_static_skip:
            if batch != 1:
                raise ValueError(
                    "static_skip_eps is a batch-1 serving feature (under "
                    "vmap a lax.cond lowers to select and executes both "
                    "branches) — use the plain body for batched serving")
            # ref_x = +inf: the first frame's delta is +inf, forcing the
            # compute branch even on near-black content (a zero init
            # would reuse the zero coefficients whenever the first frames
            # are within eps of black). The reference carries the INGESTED
            # frame channels (4 for trimap-conditioned serving — a trimap
            # change must force recompute; the plate constant is not part
            # of the delta).
            ingest_c = 4 if model_cfg.use_trimap else 3
            cache = (jnp.full((1, net_h, net_w, ingest_c), jnp.inf, cdtype),
                     jnp.zeros((1, net_h, net_w, 4), jnp.float32),  # ma
                     jnp.zeros((1, net_h, net_w, 4), jnp.float32),  # mb
                     jnp.zeros((), jnp.int32))                  # skips
            return (_make_net_state(batch), cache)
        return _make_net_state(batch)

    def _make_net_state(batch: int):
        if not model_cfg.recurrent:
            return None
        if use_planar:
            from vidmat.models.planar import (planar_init_state,
                                              planar_init_state_batched)

            if batch == 1:
                return planar_init_state(model_cfg, state_h, state_w, cdtype)
            return planar_init_state_batched(model_cfg, batch, state_h,
                                             state_w, cdtype)
        from vidmat.models.matting_net import init_state

        return init_state(model_cfg, batch, state_h, state_w, cdtype)

    def ingest_x(frame_u8):
        """Ingest: uint8 HWC -> float, resize, normalize — all on-device.
        (float_frames: the input is already float32 in [0, 1].)"""
        if use_pallas and pool and not float_frames:
            from vidmat.ops.pallas import ingest_pool_normalize

            return ingest_pool_normalize(frame_u8, pool=pool,
                                         out_dtype=cdtype,
                                         interpret=pallas_interpret)
        frame = (frame_u8.astype(jnp.float32) if float_frames
                 else frame_u8.astype(jnp.float32) * (1.0 / 255.0))
        if full:
            return frame.astype(cdtype)
        if pool and frame.shape[1] == net_h * pool \
                and frame.shape[2] == net_w * pool:
            # AREA-POOL at integer pools — the fused ingest kernel's
            # semantics. Round-5 attribution (tools/
            # analyze_tail_divergence.py): the ENTIRE fused-vs-XLA
            # serving divergence (mean |dalpha| 0.0054 on the r4
            # checkpoint) was this downsample — with matched ingest the
            # two bodies agree to float noise (1.8e-8 mean). The box
            # prefilter also antialiases where plain bilinear at
            # pool>=2 does not; pooling accumulates in f32 before the
            # cdtype cast, like the kernel.
            n, hh, ww, c = frame.shape
            x = frame.reshape(n, net_h, pool, net_w, pool, c).mean((2, 4))
            return x.astype(cdtype)
        return resize_bilinear(frame.astype(cdtype), net_h, net_w)

    # Clean-plate conditioning constant: the plate takes the SAME ingest
    # the frames do (commensurate channels), once, eagerly at build time
    # — (N, net_h, net_w, 3) in cdtype, a baked traced constant. The
    # plate is converted to the body's frame dtype contract first (uint8
    # bytes, or float [0,1] for the fp32 parity stepper).
    cond_const = None
    if bg_plate is not None:
        if float_frames:
            plate_in = (bg_plate.astype(jnp.float32) / 255.0
                        if bg_plate.dtype == jnp.uint8
                        else bg_plate.astype(jnp.float32))
        else:
            plate_in = (bg_plate if bg_plate.dtype == jnp.uint8
                        else jnp.round(jnp.clip(
                            bg_plate.astype(jnp.float32), 0.0, 1.0)
                            * 255.0).astype(jnp.uint8))
        cond_const = ingest_x(plate_in)

    def prep_net_input(x):
        """Append the per-run conditioning constant (clean plate) and pad
        to the s2d grid — the one place the net input is assembled (the
        per-frame body, the static-skip compute branch, and the chunked
        encoder all share it)."""
        if cond_const is not None:
            cc = cond_const.astype(x.dtype)
            if cc.shape[0] == 1 and x.shape[0] != 1:
                cc = jnp.broadcast_to(cc, x.shape[:3] + cc.shape[-1:])
            x = jnp.concatenate([x, cc], axis=-1)
        return (jnp.pad(x, ((0, 0), (0, pad_nh), (0, pad_nw), (0, 0)),
                        mode="edge") if (pad_nh or pad_nw) else x)

    def net_from_x(variables, x, state):
        """Recurrent net forward on an ingested coarse frame."""
        alpha, fgr, new_state = net_apply(variables, prep_net_input(x),
                                          state)
        alpha = alpha[:, :net_h, :net_w].astype(jnp.float32)
        fgr = fgr[:, :net_h, :net_w].astype(jnp.float32)
        return alpha, fgr, new_state

    if output_seg:
        # Segmentation body: ingest + shared trunk (seg_pass — the state
        # advances exactly as the matting pass) + bilinear logits
        # upsample + sigmoid. None of the matting tails apply.
        def seg_body(variables, frame_u8, state):
            x = ingest_x(frame_u8)
            logits, _, new_state = net_apply(variables, prep_net_input(x),
                                             state)
            logits = logits[:, :net_h, :net_w].astype(jnp.float32)
            if not full:
                logits = resize_bilinear(logits, h, w)
            return jax.nn.sigmoid(logits), new_state

        plan = ServingPlan(net_h=net_h, net_w=net_w, state_h=state_h,
                           state_w=state_w, pool=pool, packed=False,
                           alpha_only=False, static_skip=False,
                           full=full, make_state=make_state)
        return seg_body, plan

    def coarse_forward(variables, frame_u8, state):
        """Ingest + recurrent net forward — the coarse half of the chain,
        shared by the one-shot body and the pipeline-parallel stage split.

        Returns (x (N, net_h, net_w, C) coarse frame, alpha, fgr (f32,
        coarse res), new_state)."""
        x = ingest_x(frame_u8)
        alpha, fgr, new_state = net_from_x(variables, x, state)
        return x, alpha, fgr, new_state

    def fused_coeffs(x, alpha, fgr, nb):
        """Guided-filter coefficient grids at coarse res for the
        fused tails — whole-frame, or per-coarse-tile stats with the
        feathered segment blend of the COEFFICIENT grids when tiling
        (exact: the apply is pointwise in (a, b), the guide shared)."""
        from vidmat.ops.guided_filter import gray_guide
        from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs

        # x[..., :3]: the guide is built from the RGB channels only (a
        # no-op slice for 3-channel frames; trimap-conditioned serving
        # carries the trimap as a 4th channel for the net).
        guide = gray_guide(x[..., :3].astype(jnp.float32))
        p = jnp.concatenate([alpha, fgr], axis=-1)
        if fused_tiled:
            from vidmat.refine.tiling import (TileLayout, tile_frame,
                                              untile_frame)

            lr_layout = TileLayout(net_h, net_w, tile_size // pool,
                                   tile_overlap // pool)
            ma_t, mb_t = guided_filter_coeffs(
                tile_frame(guide, lr_layout), tile_frame(p, lr_layout),
                radius=refine.guided_radius, eps=refine.guided_eps,
                interpret=pallas_interpret)
            return (untile_frame(ma_t, lr_layout, nb),
                    untile_frame(mb_t, lr_layout, nb))
        return guided_filter_coeffs(
            guide, p, radius=refine.guided_radius,
            eps=refine.guided_eps, interpret=pallas_interpret)

    # Stage split of the fused path (ServingPlan.fused_stage0/1): the
    # one-shot body below composes exactly these two functions, so the
    # 2-device stage pipeline (parallel/pp.py) serves bit-identically to
    # single-device serving by construction. With bg_blur the coarse
    # blurred background is part of the stage-0 product (it derives from
    # the ingested coarse frame, which lives on stage 0) — stage 1 takes
    # it through its existing bgv argument, so the PP handoff is just one
    # more small coarse grid on the ppermute ring.
    def fused_stage0(variables, frame_u8, state):
        x, alpha, fgr, new_state = coarse_forward(variables, frame_u8, state)
        ma, mb = fused_coeffs(x, alpha, fgr, frame_u8.shape[0])
        if use_bg_blur:
            return (ma, mb, bg_from_x(x)), new_state
        return (ma, mb), new_state

    def fused_stage1(frame_u8, ma, mb, bgv):
        from vidmat.ops.pallas.refine_kernel import fused_refine_composite

        # The full-res guide/composite base is RGB; trimap-conditioned
        # frames carry a 4th channel the tail must not see (the slice is
        # an identity for 3-channel frames).
        return fused_refine_composite(frame_u8[..., :3], ma, mb, bgv,
                                      pool=pool,
                                      interpret=pallas_interpret)

    use_alpha_only = alpha_only and use_packed

    def alpha_byte(packed):
        # high byte of the packed word == the quantized alpha (exact)
        return (packed >> 24).astype(jnp.uint8)

    def body_impl(variables, frame_u8, state, bgv):
        if use_fused:
            s0, new_state = fused_stage0(variables, frame_u8, state)
            if use_bg_blur:
                # The coarse blurred bg rides the stage-0 product and is
                # upsampled INSIDE the refine kernel (bg_mode='coarse').
                ma, mb, bgv = s0
            else:
                ma, mb = s0
            out = fused_stage1(frame_u8, ma, mb, bgv)
            return (alpha_byte(out) if use_alpha_only else out), new_state
        # float RGB frame for the guided/errormap/bilinear tails below
        # (trimap-conditioned frames carry a 4th channel for the net only).
        frame = (frame_u8[..., :3].astype(jnp.float32) if float_frames
                 else frame_u8[..., :3].astype(jnp.float32) * (1.0 / 255.0))
        x, alpha, fgr, new_state = coarse_forward(variables, frame_u8, state)
        if use_bg_blur:
            # Unfused tails composite at full res in XLA: same coarse
            # blur, explicit bilinear upsample (identical half-pixel
            # semantics to the kernel's banded matrices).
            bgv = resize_bilinear(bg_from_x(x), h, w)
        if not full:
            if use_float_tail:
                from vidmat.ops.pallas.refine_kernel import fused_refine_float

                ma, mb = fused_coeffs(x, alpha, fgr, frame_u8.shape[0])
                alpha, fgr = fused_refine_float(frame_u8[..., :3], ma, mb,
                                                pool=pool,
                                                interpret=pallas_interpret)
            elif refine.mode == "guided" and tile_size and pool:
                # Tiled/patch full-res refine with overlap blending
                # (BASELINE.json:10) — bounds full-res intermediates at
                # very large resolutions.
                from vidmat.refine.tiling import tiled_guided_upsample

                alpha, fgr = tiled_guided_upsample(
                    frame, alpha, fgr, tile_size, tile_overlap,
                    refine.guided_radius, refine.guided_eps, impl=gf_impl,
                    interpret=pallas_interpret)
            elif refine.mode == "guided":
                alpha, fgr = guided_upsample(
                    frame, alpha, fgr, refine.guided_radius,
                    refine.guided_eps, impl=gf_impl,
                    interpret=pallas_interpret)
            elif refine.mode == "errormap" and refiner is not None:
                x32 = x[..., :3].astype(jnp.float32)
                alpha, _err = refiner[0].apply(refiner[1], frame, x32, alpha)
                fgr = resize_bilinear(fgr, h, w)
            else:
                alpha = resize_bilinear(alpha, h, w)
                fgr = resize_bilinear(fgr, h, w)
        elif refine_at_full and refine.mode == "guided":
            alpha, fgr = guided_upsample(
                frame, alpha, fgr, refine.guided_radius, refine.guided_eps,
                impl=gf_impl, interpret=pallas_interpret)
        return finish_float(alpha, fgr, bgv), new_state

    def finish_float(alpha, fgr, bgv):
        """Output packaging once full-res float alpha/fgr exist — one
        implementation for the plain and static-skip bodies (the first
        static-skip cut duplicated the tail dispatch and silently dropped
        the need_fgr quantize/composite contract)."""
        if float_output:
            return (alpha, fgr)
        if use_packed:
            from vidmat.ops.pallas import composite_rgba_packed

            # alpha rides the high byte of the packed words; composited RGB
            # is the low 24 bits — writers unpack the single packed D2H.
            packed = composite_rgba_packed(fgr, alpha, bgv,
                                           interpret=pallas_interpret)
            return alpha_byte(packed) if use_alpha_only else packed
        rgba = composite_rgba(fgr, alpha, bgv)
        alpha_u8 = jnp.round(alpha * 255.0).astype(jnp.uint8)
        fgr_u8 = jnp.round(fgr * 255.0).astype(jnp.uint8)
        return (alpha_u8, fgr_u8, rgba)

    def body_impl_static(variables, frame_u8, state, bgv):
        """Static-scene fast path (see static_skip_eps): the ingest +
        delta always run; the net + GF stats run under lax.cond only when
        the coarse frame changed vs the frame the CACHED COEFFICIENTS
        were computed from — comparing against the merely-previous frame
        would let sub-eps-per-frame drift (a slow fade) grow unboundedly
        without ever recomputing. The reference frame initializes to +inf
        (make_state) so the first frame — and the first frame after a
        resume — always takes the compute branch, even on near-black
        content."""
        net_state, (ref_x, ma_p, mb_p, skips) = state
        x = ingest_x(frame_u8)
        delta = jnp.mean(jnp.abs(x.astype(jnp.float32)
                                 - ref_x.astype(jnp.float32)))

        def compute(args):
            x_, st = args
            alpha, fgr, ns = net_from_x(variables, x_, st)
            ma, mb = fused_coeffs(x_, alpha, fgr, frame_u8.shape[0])
            return x_, ma, mb, ns

        def reuse(args):
            _, st = args
            return ref_x, ma_p, mb_p, st

        changed = delta > static_skip_eps
        ref_x, ma, mb, ns = jax.lax.cond(changed, compute, reuse,
                                         (x, net_state))
        if use_bg_blur:
            # Blur of the CURRENT frame (x), not the coefficient
            # reference — the tail always runs on the current frame, so
            # the background tracks sub-eps motion too.
            bgv = (bg_from_x(x) if use_fused
                   else resize_bilinear(bg_from_x(x), h, w))
        if use_fused:
            out = fused_stage1(frame_u8, ma, mb, bgv)
            if use_alpha_only:
                out = alpha_byte(out)
        else:  # use_float_tail: full-res float alpha/fgr, shared packaging
            from vidmat.ops.pallas.refine_kernel import fused_refine_float

            alpha, fgr = fused_refine_float(frame_u8[..., :3], ma, mb,
                                            pool=pool,
                                            interpret=pallas_interpret)
            out = finish_float(alpha, fgr, bgv)
        skips = skips + (1 - changed.astype(jnp.int32))
        return out, (ns, (ref_x, ma, mb, skips))

    # Chunk-batched dispatch (offline conversion, chunk_size > 1): the
    # per-frame body's work is ~60% stateless — ingest, planar encoder,
    # bottleneck, GF stats, and the fused tail have no frame-to-frame
    # dependency; only the GRU decoder does. Batch the stateless work
    # over the K-frame chunk (multistream-style per-launch amortization;
    # the encoder kernels run once with a K-deep grid instead of K
    # launches) and scan only the decoder. Bit-exact vs scanning the
    # per-frame body (vmapped Pallas adds a grid dimension; pinned by
    # the chunked-vs-per-frame tests).
    chunk_body = None
    if (use_fused and planar_fwd is not None and not bg_dynamic
            and not use_static_skip and not float_frames):
        def chunk_body(variables, frames_u8, state):
            k = frames_u8.shape[0]

            def enc_one(fr):
                x = ingest_x(fr)
                return x, planar_fwd.encode(variables, prep_net_input(x))

            xs, encs = jax.vmap(enc_one)(frames_u8)

            def sbody(st, enc):
                alpha, fgr, ns = planar_fwd.decode(variables, enc, st)
                return ns, (alpha[:, :net_h, :net_w].astype(jnp.float32),
                            fgr[:, :net_h, :net_w].astype(jnp.float32))

            new_state, (alphas, fgrs) = jax.lax.scan(sbody, state, encs)
            x_k = xs.reshape((k,) + xs.shape[2:])
            ma, mb = fused_coeffs(x_k,
                                  alphas.reshape((k,) + alphas.shape[2:]),
                                  fgrs.reshape((k,) + fgrs.shape[2:]), k)
            bgc = bg_from_x(x_k) if use_bg_blur else bg
            out = fused_stage1(frames_u8.reshape((k,)
                                                 + frames_u8.shape[2:]),
                               ma, mb, bgc)
            if use_alpha_only:
                out = alpha_byte(out)
            return out[:, None], new_state

    impl = body_impl_static if use_static_skip else body_impl
    if bg_dynamic:
        def body(variables, frame_u8, state, bg_frame):
            # bg_frame: (N, h, w, 3) float [0,1]; the Pallas composite/
            # fused tails take an (h, w, 3) image (single-frame path).
            return impl(variables, frame_u8, state, bg_frame[0])
    else:
        def body(variables, frame_u8, state):
            return impl(variables, frame_u8, state, bg)

    plan = ServingPlan(net_h=net_h, net_w=net_w, state_h=state_h,
                       state_w=state_w, pool=pool,
                       packed=use_packed, alpha_only=use_alpha_only,
                       static_skip=use_static_skip,
                       full=full, make_state=make_state,
                       fused_stage0=fused_stage0 if use_fused else None,
                       fused_stage1=fused_stage1 if use_fused else None,
                       chunk_body=chunk_body)
    return body, plan
