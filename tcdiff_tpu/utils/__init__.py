from tcdiff_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_reference_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from tcdiff_tpu.utils.logging import MetricLogger, get_logger
from tcdiff_tpu.utils.paths import increment_path, maybe_init_multihost
from tcdiff_tpu.utils.profiling import StepTimer, trace

__all__ = [
    "latest_checkpoint",
    "load_checkpoint",
    "load_reference_checkpoint",
    "restore_train_state",
    "save_checkpoint",
    "MetricLogger",
    "increment_path",
    "maybe_init_multihost",
    "get_logger",
    "StepTimer",
    "trace",
]
