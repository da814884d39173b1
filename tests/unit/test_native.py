"""Native framestage extension tests (C++ host staging tier)."""

import numpy as np
import pytest

from vidmat.io.native import have_native, pad_stack, unpack_rgba


def _ref_pad_stack(frames, out_h, out_w):
    out = np.empty((len(frames), out_h, out_w, 3), np.uint8)
    for i, f in enumerate(frames):
        out[i] = np.pad(f, ((0, out_h - f.shape[0]),
                            (0, out_w - f.shape[1]), (0, 0)), mode="edge")
    return out


def test_pad_stack_matches_numpy():
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 255, (h, w, 3), np.uint8)
              for h, w in [(30, 41), (32, 48), (17, 48)]]
    got = pad_stack(frames, 32, 48)
    want = _ref_pad_stack(frames, 32, 48)
    np.testing.assert_array_equal(got, want)


def test_pad_stack_strided_input():
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (64, 96, 3), np.uint8)
    view = base[::2, ::2]  # non-contiguous
    got = pad_stack([view], 32, 48)
    np.testing.assert_array_equal(got[0], np.ascontiguousarray(view))


def test_unpack_rgba_roundtrip():
    rng = np.random.RandomState(2)
    packed = rng.randint(0, 2**32, (16, 32), dtype=np.uint32)
    got = unpack_rgba(packed)
    want = packed.view(np.uint8).reshape(16, 32, 4)
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not have_native(), reason="native ext unavailable")
def test_native_extension_is_loaded():
    """The image ships g++; the native path must actually be active here."""
    assert have_native()


def test_pad_stack_rejects_bad_shape():
    if not have_native():
        pytest.skip("native-only error path")
    with pytest.raises(ValueError):
        pad_stack([np.zeros((4, 4), np.uint8)], 8, 8)


def test_pad_stack_rejects_degenerate_frames():
    """h==0 or w==0 would underflow pad_one's edge extension (ADVICE r1)."""
    if not have_native():
        pytest.skip("native-only error path")
    for shape in [(0, 4, 3), (4, 0, 3)]:
        with pytest.raises(ValueError):
            pad_stack([np.zeros(shape, np.uint8)], 8, 8)
