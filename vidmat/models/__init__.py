from vidmat.models.matting_net import MattingNetwork, RecurrentState  # noqa: F401
from vidmat.models.weights import (  # noqa: F401
    init_params, flax_to_torch_state, save_checkpoint, load_checkpoint,
)
