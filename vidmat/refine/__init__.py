from vidmat.refine.tiling import tile_frame, untile_frame, TileLayout  # noqa: F401
from vidmat.refine.errormap import ErrorMapRefiner  # noqa: F401
