from vidmat.train.losses import matting_loss  # noqa: F401
from vidmat.train.loop import TrainState, make_train_step, train_on_clips  # noqa: F401
