from vidmat.ops.resize import resize_bilinear, upsample2x, downsample_ratio_shape  # noqa: F401
from vidmat.ops.guided_filter import guided_filter  # noqa: F401
from vidmat.ops.composite import composite_rgba  # noqa: F401
