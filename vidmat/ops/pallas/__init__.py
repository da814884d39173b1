"""Pallas (Mosaic TPU) kernels — the native tier of the framework
(SURVEY.md §2.1: the TPU-native equivalent of the performance-critical work
a CUDA/C++ reference would hand-write).

Kernels:
  composite_kernel — fused composite + quantize + RGBA byte-pack (uint32)
  ingest_kernel    — fused uint8 -> normalized bf16 + area downsample
  gf_kernel        — fused guided-filter statistics at coarse res
  refine_kernel    — fused coeff-upsample + guided apply + composite + pack
                     (the BASELINE.json:5 "emit composited RGBA directly")

Each kernel has a jnp oracle in vidmat.ops.* and is unit-tested against it
in interpret mode on CPU (SURVEY.md §5: interpreter mode as the kernel
sanitizer) and compiled on TPU.
"""

from vidmat.ops.pallas.composite_kernel import composite_rgba_packed  # noqa: F401
from vidmat.ops.pallas.ingest_kernel import ingest_pool_normalize  # noqa: F401
from vidmat.ops.pallas.gf_kernel import guided_filter_coeffs  # noqa: F401
from vidmat.ops.pallas.refine_kernel import fused_refine_composite  # noqa: F401
