"""Typed configuration system for vidmat.

The reference (empty at survey time — SURVEY.md §0) is reconstructed as an
argparse-driven research repo; the rebuild uses typed dataclasses with presets
matching the five driver workload rungs (BASELINE.json:6-12).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for the recurrent matting network.

    Channel plan is CPU-oracle-sized (BASELINE.json:7 pins a CNN small enough
    for a CPU forward pass) while staying MXU-friendly (plain 3x3 convs,
    channels that tile well onto 128-lane registers after im2col).
    """

    # Encoder channels at strides 2/4/8/16.
    enc_channels: Tuple[int, int, int, int] = (16, 24, 40, 64)
    # Decoder channels at strides 8/4/2/1.
    dec_channels: Tuple[int, int, int, int] = (48, 32, 24, 16)
    # Trimap variant: extra input channel carrying {0, 0.5, 1}.
    use_trimap: bool = False
    # Clean-plate variant (BackgroundMattingV2 lineage [DOMAIN, SURVEY.md
    # §1.1 names the error-map/BGMv2 family]): three extra input channels
    # carrying a pre-captured clean background plate of the scene. The
    # plate disambiguates foreground from background where pixel evidence
    # alone cannot (camouflaged subjects, bg-colored clothing). Serving
    # ingests the plate ONCE to the coarse grid and concatenates it
    # on-device as a traced constant — zero extra per-frame H2D
    # (pipeline/stepfactory.py cond_const).
    use_bg_plate: bool = False
    # Recurrent ConvGRU on half the channels of each decoder stage (RVM-style
    # split-half recurrence [DOMAIN, SURVEY.md §1.1]).
    recurrent: bool = True
    bn_eps: float = 1e-5
    # Space-to-depth input packing factor (1 = off, 2 = pack 2x2 pixels into
    # channels). TPU-first option: activations at small channel counts are
    # lane-padded to 128 on TPU, so HBM traffic scales with H*W*128
    # regardless of C; packing halves H and W at every layer for ~4x less
    # padded traffic (measured: 882 MB -> ~230 MB per 272x480 frame).
    space_to_depth: int = 1
    # Conv execution path: "xla" (Flax/XLA convs) or "planar" (the planar
    # Pallas kernel forward, models/planar.py — same variables, small-
    # channel activations never touch lane-padded NHWC in HBM). "planar"
    # serves batch-1 (vidmat.api), vmapped batches (multistream), and
    # per-device under shard_map on a mesh; training and the parity
    # oracles always run "xla".
    conv_impl: str = "xla"

    @property
    def in_channels(self) -> int:
        # Net-input channel order: RGB, then the trimap byte (index 3 —
        # the pin logic in matting_net/planar/torch_oracle reads it
        # there), then the plate RGB.
        return 3 + (1 if self.use_trimap else 0) + (
            3 if self.use_bg_plate else 0)


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    """Alpha refinement options (BASELINE.json:5 names guided-filter and
    error-map upsampling as the refinement paths)."""

    mode: str = "guided"  # "none" | "guided" | "errormap"
    guided_radius: int = 4
    guided_eps: float = 1e-4
    # error-map path: number of worst 8x8 patches refined at full res
    errormap_patches: int = 256
    errormap_patch_size: int = 16


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Video pipeline configuration."""

    # Coarse-pass scale: network runs at round(H*r) x round(W*r); refinement
    # restores full res (BASELINE.json:10 "downsample-ratio coarse pass").
    # None = auto from resolution (pipeline.video.auto_downsample_ratio);
    # 1.0 = explicitly full-res.
    downsample_ratio: Optional[float] = None
    # Frames per jitted scan chunk (amortizes dispatch, keeps state on-device).
    chunk_size: int = 1
    # Compute dtype for the conv path. Parity mode forces float32.
    dtype: str = "bfloat16"
    refine: RefineConfig = dataclasses.field(default_factory=RefineConfig)
    # 4K tiling (BASELINE.json:10): tile size and overlap at full res.
    tile_size: Optional[int] = None  # None = no tiling
    tile_overlap: int = 64
    # Background for compositing: None = export alpha+fgr only.
    composite_bg: Optional[Tuple[float, float, float]] = None
    # Pallas serving kernels: None = auto (on for the TPU backend).
    use_pallas: Optional[bool] = None
    # Opt-in static-scene fast path (batch-1 fused serving): when the
    # coarse frame's mean abs delta vs the previous frame is <= eps (in
    # [0,1] units, e.g. 0.5/255 = 0.002), the net + GF stats are skipped
    # via lax.cond and the cached coefficient grids are reused; the fused
    # tail still runs on the current frame. None = off (the default —
    # ordinary video stays on the compute branch anyway; see
    # stepfactory.build_serving_body static_skip_eps).
    static_skip_eps: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Multi-stream serving configuration (BASELINE.json:11)."""

    num_streams: int = 8
    height: int = 1088  # padded 1080p (divisible-by-16 canonical bucket)
    width: int = 1920
    downsample_ratio: float = 0.25


# ---- Model size variants (width scaling; all share the same code path,
# oracle mirror, and weight bridge) ----

MODEL_SIZES = {
    "small": ModelConfig(enc_channels=(12, 16, 24, 40),
                         dec_channels=(32, 24, 16, 12)),
    "base": ModelConfig(),
    "large": ModelConfig(enc_channels=(32, 48, 80, 128),
                         dec_channels=(96, 64, 48, 32)),
    # TPU-serving-optimized: space-to-depth packing halves every feature
    # grid (~4x less lane-padded HBM traffic; docs/PERFORMANCE.md).
    "fast": ModelConfig(space_to_depth=2),
}


# ---- Presets: one per BASELINE.json workload rung ----

def preset_pr1_image() -> tuple[ModelConfig, PipelineConfig]:
    """512x512 single-image matting, optional trimap (BASELINE.json:7)."""
    return ModelConfig(recurrent=False), PipelineConfig(
        downsample_ratio=1.0, dtype="float32",
        refine=RefineConfig(mode="none"))


def preset_clip_480p() -> tuple[ModelConfig, PipelineConfig]:
    """100-frame 480p clip with temporal propagation (BASELINE.json:8).

    conv_impl="planar" is quality-neutral (same variables, parity-pinned);
    the model stays s2d=1 — this is the parity-focused rung
    (checkpoints/synthetic_demo, held-out MAD 0.0006)."""
    return ModelConfig(conv_impl="planar"), PipelineConfig(
        downsample_ratio=1.0, chunk_size=10, refine=RefineConfig(mode="none"))


def preset_video_1080p() -> tuple[ModelConfig, PipelineConfig]:
    """1080p recurrent + guided-filter refinement (BASELINE.json:9).

    The TPU serving model: space_to_depth=2 (~4x less lane-padded HBM
    traffic; trained checkpoint checkpoints/fast_demo, held-out MAD
    <=0.002, gated in tests/integration/test_quality.py) with the planar
    Pallas forward (quality-neutral — it executes the same variables,
    parity-pinned; ignored on non-TPU backends). bench.py builds its
    headline config FROM this preset — one source of truth (VERDICT r2
    item 3)."""
    return ModelConfig(space_to_depth=2, conv_impl="planar"), PipelineConfig(
        downsample_ratio=0.25, chunk_size=4,
        refine=RefineConfig(mode="guided"))


def preset_video_1080p_errormap() -> tuple[ModelConfig, PipelineConfig]:
    """1080p recurrent + ERROR-MAP patch refinement (BASELINE.json:5
    "error-map upsampling", BGMv2 lineage) — the quality-first variant
    for hair-heavy / textured-background content.

    Round-5 measurement (tools/eval_errormap.py, hard hair-filament
    fixture at 1088x1920, ds=0.25, 10 frames): error-map MAD 0.0203 /
    unknown-band MAD 0.0410 / unknown-band Grad 24.5k vs guided 0.0304 /
    0.0705 / 29.6k — the guided filter transfers the textured
    background's edges into the matte (guide leakage) exactly on the
    content patch refinement exists for. Gated vs guided in
    tests/integration/test_quality.py. Uses the s2d=1 base family (the
    shipped errormap_demo refiner was trained against its coarse
    output); throughput is XLA-tail class, not the fused-kernel class —
    pick video_1080p when speed dominates."""
    return ModelConfig(conv_impl="planar"), PipelineConfig(
        downsample_ratio=0.25, chunk_size=4,
        refine=RefineConfig(mode="errormap"))


def preset_video_4k() -> tuple[ModelConfig, PipelineConfig]:
    """4K tiled inference with overlap blending (BASELINE.json:10).
    Same serving model as video_1080p (s2d=2 + planar)."""
    return ModelConfig(space_to_depth=2, conv_impl="planar"), PipelineConfig(
        downsample_ratio=0.125, chunk_size=1,
        refine=RefineConfig(mode="guided"), tile_size=1024, tile_overlap=128)


def preset_multistream() -> tuple[ModelConfig, PipelineConfig, StreamConfig]:
    """8 concurrent 1080p streams (BASELINE.json:11). The planar forward
    vmaps over the stream axis on the single-chip path (1709 -> 2651
    aggregate fps measured, BASELINE.md); a sharded mesh runs the SAME
    planar/fused body per-device under jax.shard_map (Pallas calls are
    device-local inside shard_map — parallel/multistream.py)."""
    m, p = preset_video_1080p()
    # The serve loop keeps per-round dispatch (lowest latency; batching 8
    # streams already amortizes the dispatch floor — measured a wash vs
    # chunked in round 2). chunk>1 stays an explicit opt-in
    # (MultiStreamMatting(chunk=K), CLI --chunk).
    return m, dataclasses.replace(p, chunk_size=1), StreamConfig()


PRESETS = {
    "pr1_image": preset_pr1_image,
    "clip_480p": preset_clip_480p,
    "video_1080p": preset_video_1080p,
    "video_1080p_errormap": preset_video_1080p_errormap,
    "video_4k": preset_video_4k,
    "multistream": preset_multistream,
}
