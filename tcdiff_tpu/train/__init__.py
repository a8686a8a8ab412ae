from tcdiff_tpu.train.state import TrainState, create_train_state
from tcdiff_tpu.train.train_step import make_train_step


def __getattr__(name):
    # lazy: orchestrator pulls in viz/matplotlib, keep base import light
    if name == "TCDiff":
        from tcdiff_tpu.train.orchestrator import TCDiff

        return TCDiff
    raise AttributeError(name)


__all__ = ["TrainState", "create_train_state", "make_train_step", "TCDiff"]
