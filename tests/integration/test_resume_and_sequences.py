"""Mid-video resume + image-sequence output (SURVEY.md §5)."""

import pytest as _pytest_tier

# Full-tier only (tests/README.md): compile-heavy mesh/interpret
# programs, process spawns, long rollouts, or e2e conversions.
pytestmark = _pytest_tier.mark.slow


import glob
import os
import tempfile

import numpy as np

import vidmat
from vidmat.io.fixtures import synthetic_frames_only


def test_session_state_resume_bitexact():
    """save_state at frame k, resume in a fresh session -> identical
    mattes to the uninterrupted run."""
    frames = list(synthetic_frames_only(64, 80, 8))
    sess = vidmat.MattingSession(64, 80)
    full = [sess.step(f)[0] for f in frames]

    sess2 = vidmat.MattingSession(64, 80,
                                  variables=sess._stepper.variables)
    for f in frames[:4]:
        sess2.step(f)
    d = os.path.join(tempfile.mkdtemp(), "carry")
    sess2.save_state(d, frame_index=4)

    sess3 = vidmat.MattingSession(64, 80,
                                  variables=sess._stepper.variables)
    idx = sess3.load_state(d)
    assert idx == 4
    resumed = [sess3.step(f)[0] for f in frames[4:]]
    for a, b in zip(full[4:], resumed):
        np.testing.assert_array_equal(a, b)


def test_session_state_resume_cross_path_rejected():
    """A carry saved under one serving path must not silently restore
    into a session whose carry type differs (XLA NHWC vs planar planes
    share field names): load_state raises a clear error instead of
    crashing deep inside the next step()."""
    import pytest

    frames = list(synthetic_frames_only(64, 80, 3))
    sess = vidmat.MattingSession(64, 80)  # fp32 parity path, NHWC carry
    for f in frames:
        sess.step(f)
    d = os.path.join(tempfile.mkdtemp(), "carry")
    sess.save_state(d, frame_index=3)

    # Serving path at a coarse ratio: different carry grid (and, with
    # interpret kernels, the planar carry type on the kernel path).
    sess2 = vidmat.MattingSession(64, 80, downsample_ratio=0.25,
                                  variables=sess._stepper.variables)
    with pytest.raises(ValueError, match="different serving path"):
        sess2.load_state(d)


def test_convert_video_png_sequence_output():
    frames = list(synthetic_frames_only(64, 80, 5))
    d = tempfile.mkdtemp()
    pattern = os.path.join(d, "alpha_%03d.png")
    m = vidmat.convert_video(frames, output_alpha=pattern,
                             downsample_ratio=1.0)
    files = sorted(glob.glob(os.path.join(d, "alpha_*.png")))
    assert len(files) == 5
    from vidmat.io.reader import read_image

    img = read_image(files[0])
    assert img.shape[:2] == (64, 80)
