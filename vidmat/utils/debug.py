"""Debug-mode guards (SURVEY.md §5 race detection / sanitizers).

The framework's concurrency is confined to queue handoffs (reader/writer
threads); the numerical sanitizers are:
  - ``debug_mode()``: enables jax_debug_nans (trap NaN/Inf at the emitting
    op) and disables x64 surprises; use around a failing pipeline run.
  - ``check_finite(tree, name)``: explicit finite-check for pipeline
    outputs in debug builds.
  - Pallas kernels run under ``interpret=True`` via their ``interpret``
    flag or ``pltpu.force_tpu_interpret_mode()`` (used by tests/unit).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Context: trap NaNs inside jitted code (slow; debug only)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_finite(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (host-side; forces D2H)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            keys = "/".join(str(p) for p in path)
            raise FloatingPointError(
                f"non-finite values in {name}:{keys} "
                f"(nan={np.isnan(arr).sum()}, inf={np.isinf(arr).sum()})")
