"""Loader for the C++ framestage extension (native host staging tier).

Builds native/framestage.cpp on first use if no binary is present (g++ is
in the image); falls back to numpy implementations when the toolchain is
unavailable so the framework stays importable anywhere.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import List

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")

_mod = None
_tried = False


def _load():
    global _mod, _tried
    if _tried:
        return _mod
    _tried = True
    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    so = os.path.join(_NATIVE_DIR, f"framestage{suffix}")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR],
                           capture_output=True, check=True, timeout=120)
        except Exception:
            return None
    if os.path.exists(so):
        sys.path.insert(0, _NATIVE_DIR)
        try:
            import framestage  # type: ignore

            _mod = framestage
        finally:
            sys.path.pop(0)
    return _mod


def have_native() -> bool:
    return _load() is not None


def pad_stack(frames: List[np.ndarray], out_h: int, out_w: int,
              threads: int = 0) -> np.ndarray:
    """Edge-pad + stack S frames into a contiguous (S, out_h, out_w, C)
    uint8 batch. Native threaded path when available (3-channel frames —
    the serving hot case; 4-channel trimap-conditioned frames take the
    numpy path)."""
    c = frames[0].shape[-1]
    mod = _load()
    if mod is not None and c == 3:
        return mod.pad_stack(frames, out_h, out_w, threads)
    out = np.empty((len(frames), out_h, out_w, c), np.uint8)
    for i, f in enumerate(frames):
        ph, pw = out_h - f.shape[0], out_w - f.shape[1]
        out[i] = np.pad(f, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return out


def unpack_rgba(packed: np.ndarray) -> np.ndarray:
    """(H, W) uint32 packed RGBA -> owned (H, W, 4) uint8 copy."""
    mod = _load()
    if mod is not None:
        return mod.unpack_rgba(np.ascontiguousarray(packed))
    return np.ascontiguousarray(packed).view(np.uint8).reshape(
        *packed.shape, 4).copy()
