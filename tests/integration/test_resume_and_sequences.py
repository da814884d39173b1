"""Mid-video resume + image-sequence output (SURVEY.md §5)."""

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
