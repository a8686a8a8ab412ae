from tcdiff_tpu.trajdecoder.model import TrajDecoder
from tcdiff_tpu.trajdecoder.kalman import kalman_smooth_batch
from tcdiff_tpu.trajdecoder.rollout import autoregressive_rollout
from tcdiff_tpu.trajdecoder.dataset import SyntheticTrajDataset, TrajDataset
from tcdiff_tpu.trajdecoder.postprocess import (
    get_ci,
    get_motion_with_trans,
    offset2xyz,
    process_traj,
    smooth_data,
)
from tcdiff_tpu.trajdecoder.trainer import TrajTrainer, make_traj_optimizer, make_traj_train_step, traj_losses

__all__ = [
    "TrajDecoder",
    "kalman_smooth_batch",
    "autoregressive_rollout",
    "TrajDataset",
    "SyntheticTrajDataset",
    "TrajTrainer",
    "make_traj_optimizer",
    "make_traj_train_step",
    "traj_losses",
    "get_ci",
    "get_motion_with_trans",
    "offset2xyz",
    "process_traj",
    "smooth_data",
]
