"""Public API: video in -> per-frame alpha matte + foreground out.

The reference's exact entry-point names are [UNKNOWN] (empty tree,
SURVEY.md §0/§1.2); this is the clean API the survey plans, shaped like the
RVM-lineage ``convert_video`` contract the driver ladder implies.
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple, Union

import numpy as np

from vidmat.config import ModelConfig, PipelineConfig


def matte_image(image: np.ndarray, trimap: Optional[np.ndarray] = None,
                variables=None, cfg: Optional[ModelConfig] = None,
                mask: Optional[np.ndarray] = None,
                mask_band: float = 0.04,
                bg_plate: Optional[np.ndarray] = None,
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Single-image matting (BASELINE.json:7 PR1 workload).

    image:  (H, W, 3) float [0,1] or uint8 RGB. H, W need not be /16 —
            padded internally.
    trimap: optional (H, W) float {0, 0.5, 1}.
    mask:   optional ROUGH binary segmentation mask (H, W) — from any
            segmenter or hand-painted; converted to a trimap with an
            unknown band of half-width ``mask_band`` straddling the mask
            boundary (train.data.trimap_from_mask) and matted with the
            trimap-conditioned family. Mutually exclusive with trimap.
    bg_plate: optional pre-captured CLEAN BACKGROUND PLATE — an (H, W, 3)
            image of the scene without the subject (BGMv2-lineage
            conditioning). Selects the plate-conditioned family
            (use_bg_plate=True, shipped plate_demo): the plate
            disambiguates camouflaged / background-colored subjects that
            pixel evidence alone cannot separate.
    Returns (alpha (H, W, 1), fgr (H, W, 3)) float32 in [0,1].

    With ``variables=None`` the shipped trained checkpoint is loaded
    (checkpoints/synthetic_demo, trimap_demo when a trimap is given, or
    plate_demo when a plate is given); the no-trimap default config is
    then the recurrent base model run for one frame from a zero state,
    because that is the variant with shipped weights.
    """
    from vidmat.pipeline.stepper import ImageStepper

    if mask is not None:
        if trimap is not None:
            raise ValueError("pass either trimap or mask, not both")
        from vidmat.train.data import trimap_from_mask

        trimap = trimap_from_mask(mask, band=mask_band)
    if cfg is None:
        if bg_plate is not None:
            if trimap is not None:
                raise ValueError(
                    "no shipped checkpoint combines trimap AND plate "
                    "conditioning — pass cfg/variables explicitly for a "
                    "custom-trained combined model")
            # plate family: recurrent s2d=2 (shipped plate_demo), run for
            # one frame from a zero state like the no-trimap default
            from vidmat.models.weights import plate_default_config

            cfg = plate_default_config()
        elif variables is None and trimap is None:
            cfg = ModelConfig()  # recurrent base: shipped synthetic_demo
        else:
            cfg = ModelConfig(recurrent=False, use_trimap=trimap is not None)
    stepper = ImageStepper(cfg, variables=variables)
    return stepper(image, trimap, bg_plate=bg_plate)


def _mask_to_trimap_source(mask_source, band: float,
                           start: int = 0, count: Optional[int] = None):
    """Adapt a segmentation-mask source into a trimap source.

    A single keyframe mask (image path / bare array) becomes one trimap
    array (the keyframe-propagation shape); a per-frame mask stream
    (video path, PNG dir/pattern, iterable) becomes a lazy iterable of
    trimaps. The RAW mask stream is trimmed to [start, start + count)
    BEFORE conversion — skipped masks are decoded (sequential skip) but
    never run through the O(H*W*band) trimap conversion — and the result
    is marked pre-trimmed so the pipeline does not trim it again."""
    from vidmat.pipeline.trimap import PreTrimmedTrimaps
    from vidmat.pipeline.video import _single_trimap
    from vidmat.train.data import trimap_from_mask

    single = _single_trimap(mask_source)
    if single is not None:
        return trimap_from_mask(single, band=band)

    def gen():
        from vidmat.io.reader import FrameSource

        for m in FrameSource(mask_source, start=start, count=count):
            yield trimap_from_mask(m, band=band)

    return PreTrimmedTrimaps(gen())


def convert_video(input_source: Union[str, Iterable[np.ndarray]],
                  output_alpha: Optional[str] = None,
                  output_foreground: Optional[str] = None,
                  output_composition: Optional[str] = None,
                  bg_color: Tuple[float, float, float] = (0.0, 1.0, 0.0),
                  bg_image: Optional[Union[str, np.ndarray]] = None,
                  bg_video: Optional[Union[str, object]] = None,
                  bg_blur: Optional[int] = None,
                  bg_plate: Optional[Union[str, np.ndarray]] = None,
                  downsample_ratio: Optional[float] = None,
                  variables=None,
                  model_cfg: Optional[ModelConfig] = None,
                  pipe_cfg: Optional[PipelineConfig] = None,
                  refiner_variables=None,
                  progress: bool = False,
                  start_frame: int = 0,
                  max_frames: Optional[int] = None,
                  trimap_source: Union[str, Iterable[np.ndarray],
                                       None] = None,
                  mask_source: Union[str, Iterable[np.ndarray],
                                     None] = None,
                  mask_band: float = 0.04,
                  output_segmentation: Optional[str] = None) -> dict:
    """Convert a video to alpha / foreground / composited streams.

    input_source: path to a video file, or an iterator of (H, W, 3) uint8
        RGB frames.
    output_*: optional output paths (any subset). Without any, frames are
        processed and metrics returned (benchmark mode).
    bg_image: background replacement image for the composition output —
        path or (H, W, 3) array; blended per-pixel on device (takes
        precedence over bg_color).
    bg_video: PER-FRAME background replacement — a video path or frame
        iterable consumed in lockstep with the input (looped if shorter);
        takes precedence over bg_image. No recompiles on background
        change (traced step argument).
    bg_blur: portrait-mode background blur — composite the foreground
        over a blurred version of the source frame (radius in full-res
        pixels, e.g. 16); synthesized on device from the coarse frame,
        upsampled inside the fused refine kernel. Takes precedence over
        every other bg option.
    bg_plate: pre-captured CLEAN BACKGROUND PLATE — an image (path or
        (H, W, 3) array) of the scene WITHOUT the subject (BGMv2-lineage
        conditioning). This is a network INPUT that disambiguates
        camouflaged / background-colored subjects, NOT the composite
        background — combine with bg_color/bg_image/bg_video/bg_blur as
        usual. With ``model_cfg=None`` this selects the shipped
        plate-conditioned family (use_bg_plate=True, space_to_depth=2;
        checkpoints/plate_demo). The plate is ingested once and baked
        into the jitted step — zero extra per-frame H2D.
    downsample_ratio: coarse-pass scale; None = auto from resolution
        (BASELINE.json:10).
    start_frame / max_frames: trim the input — skip the first
        ``start_frame`` frames (exact sequential skip) and convert at
        most ``max_frames``. Temporal state starts cold at the trim
        point (trim-then-matte semantics).
    trimap_source: trimaps for trimap-conditioned video matting (the
        DIM-lineage family). Two shapes:
        - PER-FRAME: a video path, PNG dir/pattern, or frame iterable
          consumed in lockstep with the input (trimmed identically
          under start_frame/max_frames). With ``model_cfg=None`` this
          selects the shipped per-frame config/weights (use_trimap=
          True, recurrent=False; checkpoints/trimap_demo).
        - KEYFRAME (propagation): a single image path or (H, W) array —
          the trimap annotates the FIRST frame only and the recurrent
          state carries the constraint forward over all-unknown
          trimaps. With ``model_cfg=None`` this selects the shipped
          propagation config/weights (use_trimap=True, recurrent=True,
          space_to_depth=2; checkpoints/trimap_prop_demo). A per-frame
          stream that ends early continues the same way.
        Values: uint8 {0, 128, 255} or float {0, 0.5, 1} = bg/unknown/
        fg; the matte is clamped to the trimap's definite regions.
    mask_source: ROUGH binary segmentation masks instead of trimaps —
        the practical entry when the user holds a person/object mask
        (from any segmenter, or hand-painted) rather than a real trimap.
        Same two shapes as trimap_source (single keyframe image/array →
        propagation family; video path / PNG dir / iterable → per-frame
        family); each mask is converted on the fly with
        train.data.trimap_from_mask (unknown band of half-width
        ``mask_band`` straddling the mask boundary). Mutually exclusive
        with trimap_source.
    output_segmentation: write the co-trained SEGMENTATION head's mask
        stream (RVM-lineage downstream/debug output) instead of matting
        outputs: the same trunk and temporal recurrence run with the
        ``seg_head`` in place of the matting heads (one pass serves one
        head — request mattes in a separate call). Mutually exclusive
        with the matting outputs and background options; needs a
        co-trained checkpoint (``variables=`` from a train --seg-every
        run, or the shipped checkpoints/seg_demo when variables=None).
    Returns a metrics dict (fps, p50/p99 latency; SURVEY.md §5).
    """
    from vidmat.pipeline.video import VideoPipeline, _single_trimap

    if output_segmentation is not None:
        if output_alpha or output_foreground or output_composition:
            raise ValueError(
                "output_segmentation runs the seg head in place of the "
                "matting heads (one pass, one head — RVM-lineage "
                "segmentation_pass semantics); request the matting "
                "outputs in a separate convert_video call")
        if (trimap_source is not None or mask_source is not None
                or bg_plate is not None):
            raise ValueError(
                "the shipped co-trained segmentation head covers the "
                "unconditioned base family; conditioned segmentation "
                "needs a custom co-trained model_cfg/variables and is "
                "not selected implicitly")
        return _segment_video(input_source, output_segmentation,
                              variables=variables, model_cfg=model_cfg,
                              downsample_ratio=downsample_ratio,
                              progress=progress, start_frame=start_frame,
                              max_frames=max_frames)

    if mask_source is not None:
        if trimap_source is not None:
            raise ValueError("pass either trimap_source or mask_source, "
                             "not both")
        trimap_source = _mask_to_trimap_source(
            mask_source, mask_band, start=start_frame, count=max_frames)
    if trimap_source is not None:
        keyframe = _single_trimap(trimap_source)
        if keyframe is not None:
            # Decoded once here; the pipeline's own _single_trimap check
            # then sees the array instead of re-reading the file.
            trimap_source = keyframe
        if model_cfg is None:
            if bg_plate is not None:
                raise ValueError(
                    "no shipped checkpoint combines trimap AND plate "
                    "conditioning — pass model_cfg/variables explicitly "
                    "for a custom-trained combined model")
            if keyframe is not None:
                model_cfg = ModelConfig(use_trimap=True, space_to_depth=2)
            else:
                model_cfg = ModelConfig(use_trimap=True, recurrent=False)
    if bg_plate is not None and model_cfg is None:
        from vidmat.models.weights import plate_default_config

        model_cfg = plate_default_config()
    pipeline = VideoPipeline(
        model_cfg=model_cfg or ModelConfig(),
        pipe_cfg=pipe_cfg,
        variables=variables,
        downsample_ratio=downsample_ratio,
        bg_color=bg_color if output_composition else None,
        bg_image=bg_image if output_composition else None,
        bg_video=bg_video if output_composition else None,
        bg_blur=bg_blur if output_composition else None,
        bg_plate=bg_plate,
        refiner_variables=refiner_variables,
    )
    return pipeline.run(input_source, output_alpha=output_alpha,
                        output_foreground=output_foreground,
                        output_composition=output_composition,
                        progress=progress, start_frame=start_frame,
                        max_frames=max_frames,
                        trimap_source=trimap_source)


def _segment_video(input_source, output_path: str, *, variables,
                   model_cfg, downsample_ratio, progress, start_frame,
                   max_frames) -> dict:
    """Drive the segmentation body over a frame stream and write the
    mask video (convert_video(output_segmentation=...) backend)."""
    import time

    import jax

    from vidmat.io.reader import FrameSource
    from vidmat.io.writer import VideoWriter
    from vidmat.pipeline.stepper import VideoStepper, pad_to_multiple
    from vidmat.utils.metrics import RunMetrics

    cfg = model_cfg or ModelConfig()
    src = FrameSource(input_source, start=start_frame, count=max_frames)
    stepper = None
    writer = None
    metrics = RunMetrics()
    n = 0
    try:
        for frame in src:
            padded, h, w = pad_to_multiple(np.asarray(frame),
                                           16 * cfg.space_to_depth)
            if stepper is None:
                if downsample_ratio is None:
                    from vidmat.pipeline.video import auto_downsample_ratio

                    ratio = auto_downsample_ratio(padded.shape[0],
                                                  padded.shape[1])
                else:
                    ratio = downsample_ratio
                stepper = VideoStepper(
                    cfg, padded.shape[0], padded.shape[1],
                    variables=variables, downsample_ratio=ratio,
                    dtype=("bfloat16" if jax.default_backend() == "tpu"
                           else "float32"),
                    output="seg")
                writer = VideoWriter(output_path, fps=src.fps)
            t0 = time.perf_counter()
            mask, _ = stepper.step(padded)
            metrics.record_frame(time.perf_counter() - t0)
            m8 = np.round(mask[:h, :w, 0] * 255.0).astype(np.uint8)
            writer.write(np.repeat(m8[..., None], 3, axis=-1))
            n += 1
            if progress and n % 50 == 0:
                print(f"segmented {n} frames", flush=True)
    finally:
        if writer is not None:
            writer.close()
    summary = metrics.summary()
    summary["frames"] = n
    return summary


class MattingSession:
    """Streaming API: push frames, pull (alpha, fgr); temporal state is
    carried on-device between calls (BASELINE.json:8).

    >>> sess = MattingSession()
    >>> for frame in frames:
    ...     alpha, fgr = sess.step(frame)
    """

    def __init__(self, height: int, width: int,
                 variables=None, model_cfg: Optional[ModelConfig] = None,
                 downsample_ratio: float = 1.0, dtype: str = "float32",
                 static_skip_eps: Optional[float] = None,
                 tile_size: Optional[int] = None,
                 tile_overlap: int = 128,
                 bg_plate: Optional[np.ndarray] = None,
                 output: str = "matte"):
        """output="seg" serves the co-trained SEGMENTATION head instead
        of the matting heads (RVM-lineage downstream/debug output): the
        same trunk and temporal state advance, and step() returns
        (mask probability (H, W, 1) float32, None). Needs a co-trained
        checkpoint (variables from a train --seg-every run, or the
        shipped checkpoints/seg_demo when variables=None)."""
        from vidmat.pipeline.stepper import VideoStepper

        if bg_plate is not None and model_cfg is None:
            # clean-plate family (BGMv2 lineage): shipped plate_demo
            from vidmat.models.weights import plate_default_config

            model_cfg = plate_default_config()
        self._stepper = VideoStepper(
            model_cfg or ModelConfig(), height, width,
            variables=variables, downsample_ratio=downsample_ratio,
            dtype=dtype, output=output,
            # static-scene fast path (serving mode, bfloat16 dtype): skip
            # the net on unchanged frames, ~2x measured on static content
            static_skip_eps=static_skip_eps,
            # tiled full-res refine (the 4K rung's per-coarse-tile GF
            # stats + feather-blended coefficients) for big streams,
            # e.g. tile_size=1024, tile_overlap=128 (the video_4k preset)
            tile_size=tile_size, tile_overlap=tile_overlap,
            # clean-plate conditioning: fixed per session, ingested once
            bg_plate=bg_plate)

    def step(self, frame: np.ndarray,
             trimap: Optional[np.ndarray] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        """trimap: ((H, W) uint8 {0,128,255} or float {0,0.5,1}) —
        trimap-conditioned configs only. The non-recurrent per-frame
        family (trimap_demo) requires one every step; the recurrent
        propagation family (trimap_prop_demo: ModelConfig(use_trimap=
        True, space_to_depth=2)) takes one on keyframes and rides
        all-unknown (auto-filled when trimap=None) in between — the GRU
        carries the constraint forward."""
        return self._stepper.step(frame, trimap)

    def reset(self) -> None:
        """Reset temporal state (scene cut / new stream)."""
        self._stepper.reset()

    def save_state(self, path: str, frame_index: int = 0) -> None:
        """Checkpoint the temporal carry for mid-video resume
        (SURVEY.md §5)."""
        self._stepper.save_state(path, frame_index)

    def load_state(self, path: str) -> int:
        """Restore a checkpointed carry; returns the saved frame index."""
        return self._stepper.load_state(path)
