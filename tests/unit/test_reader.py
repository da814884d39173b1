"""Frame-source unit tests (vidmat/io/reader)."""

import numpy as np

from vidmat.io.reader import FrameSource, image_sequence
from vidmat.io.writer import write_image


def _write_indexed(path, idx):
    # Encode the frame index in the pixel value so order is observable.
    write_image(str(path), np.full((8, 8, 3), idx, np.uint8))


class TestImageSequencePatterns:
    def test_unpadded_pattern_numeric_order(self, tmp_path):
        """frames/%d.png with 12 frames must deliver 1..12 in numeric
        order — lexicographic glob order (1, 10, 11, 12, 2, ...) would
        feed the recurrent model a temporally scrambled clip."""
        for i in range(1, 13):
            _write_indexed(tmp_path / f"{i}.png", i)
        seq = image_sequence(str(tmp_path / "%d.png"))
        got = [int(f[0, 0, 0]) for f in seq]
        assert got == list(range(1, 13))

    def test_padded_pattern_still_works(self, tmp_path):
        for i in range(5):
            _write_indexed(tmp_path / f"a_{i:05d}.png", i)
        seq = image_sequence(str(tmp_path / "a_%05d.png"))
        got = [int(f[0, 0, 0]) for f in seq]
        assert got == list(range(5))

    def test_pattern_ignores_non_matching_files(self, tmp_path):
        for i in range(3):
            _write_indexed(tmp_path / f"f{i}.png", i)
        _write_indexed(tmp_path / "other.png", 99)
        seq = image_sequence(str(tmp_path / "f%d.png"))
        got = [int(f[0, 0, 0]) for f in seq]
        assert got == [0, 1, 2]

    def test_non_sequence_path_returns_none(self, tmp_path):
        assert image_sequence(str(tmp_path / "missing.mp4")) is None


class TestFrameSourceTrim:
    def test_start_count_window(self):
        frames = [np.full((4, 4, 3), i, np.uint8) for i in range(10)]
        got = [int(f[0, 0, 0])
               for f in FrameSource(frames, start=3, count=4)]
        assert got == [3, 4, 5, 6]
