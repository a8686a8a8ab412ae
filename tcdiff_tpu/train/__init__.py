from tcdiff_tpu.train.state import TrainState, create_train_state
from tcdiff_tpu.train.train_step import make_train_step

__all__ = ["TrainState", "create_train_state", "make_train_step"]
