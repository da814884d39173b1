from vidmat.parallel.mesh import make_mesh  # noqa: F401
from vidmat.parallel.multistream import MultiStreamMatting  # noqa: F401
from vidmat.parallel.pp import PipelinedMatting, PipelinedStreams  # noqa: F401
