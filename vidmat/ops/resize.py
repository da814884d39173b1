"""Canonical resize operations with pinned, oracle-matchable semantics.

Parity to <=1e-3 MAD against the CPU torch oracle (BASELINE.json:5) requires
resize semantics to match *exactly* — the usual source of >1e-3 drift
(SURVEY.md §7 risk list). The canonical contract used framework-wide:

  bilinear, half-pixel centers (torch ``align_corners=False``), no antialias,
  edge-clamped.

``jax.image.resize(method="bilinear", antialias=False)`` implements the same
sampling; the torch oracle uses ``F.interpolate(mode="bilinear",
align_corners=False, antialias=False)``. Unit tests pin the match
(tests/unit/test_resize.py).

All functions take NHWC float arrays.
"""

from __future__ import annotations

import jax


def downsample_ratio_shape(h: int, w: int, ratio: float) -> tuple[int, int]:
    """Coarse-pass shape for a downsample ratio, snapped to multiples of 16
    so encoder stride-16 features stay integral (static-shape requirement for
    XLA; SURVEY.md §7 'avoiding retraces')."""
    def snap(x: int) -> int:
        return max(16, int(round(x * ratio / 16.0)) * 16)
    return snap(h), snap(w)


def resize_bilinear(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize, half-pixel centers, no antialias. NHWC."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return jax.image.resize(x, (n, out_h, out_w, c), method="bilinear",
                            antialias=False)


def upsample2x(x: jax.Array) -> jax.Array:
    """2x bilinear upsample (half-pixel centers). NHWC."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, h * 2, w * 2, c), method="bilinear",
                            antialias=False)
