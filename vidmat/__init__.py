"""vidmat — TPU-native video matting framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
video-matting pipeline (tangih/video-matting): video in -> per-frame alpha
matte + foreground out.

Design (see SURVEY.md):
  - Flax encoder-decoder matting network with ConvGRU temporal recurrence,
    jit-compiled for TPU (NHWC layout, MXU-friendly convs).
  - Fused Pallas kernels for frame ingest (resize/normalize/pack), guided
    filter alpha refinement, tile overlap-blend, and RGBA compositing.
  - Recurrent state resident in HBM across frames (lax.scan chunked stepper).
  - Multi-stream serving via jax.sharding Mesh + shard_map.

Reference citation note: /root/reference was empty at build time (SURVEY.md §0);
behavior is built to the driver-pinned workload ladder in BASELINE.json:6-12.
"""

__version__ = "0.1.0"

from vidmat.api import convert_video, matte_image, MattingSession  # noqa: F401
from vidmat.config import (ModelConfig, PipelineConfig, RefineConfig,  # noqa: F401
                           StreamConfig, PRESETS)


def __getattr__(name):
    # Lazy heavyweight exports (avoid importing jax mesh/toolchains at
    # package import).
    if name == "MultiStreamMatting":
        from vidmat.parallel.multistream import MultiStreamMatting

        return MultiStreamMatting
    if name == "make_mesh":
        from vidmat.parallel.mesh import make_mesh

        return make_mesh
    if name == "PipelinedMatting":
        from vidmat.parallel.pp import PipelinedMatting

        return PipelinedMatting
    if name == "PipelinedStreams":
        from vidmat.parallel.pp import PipelinedStreams

        return PipelinedStreams
    if name == "MattingNetwork":
        from vidmat.models.matting_net import MattingNetwork

        return MattingNetwork
    if name == "RealtimeMatting":
        from vidmat.pipeline.realtime import RealtimeMatting

        return RealtimeMatting
    if name == "trimap_from_mask":
        from vidmat.train.data import trimap_from_mask

        return trimap_from_mask
    raise AttributeError(name)
