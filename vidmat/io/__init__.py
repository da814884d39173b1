from vidmat.io.reader import FrameSource, VideoReader, read_image  # noqa: F401
from vidmat.io.writer import VideoWriter, write_image  # noqa: F401
from vidmat.io.fixtures import synthetic_clip, synthetic_frame  # noqa: F401
