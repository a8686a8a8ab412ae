from tcdiff_tpu.trajdecoder.model import TrajDecoder
from tcdiff_tpu.trajdecoder.kalman import kalman_smooth_batch
from tcdiff_tpu.trajdecoder.rollout import autoregressive_rollout

__all__ = ["TrajDecoder", "kalman_smooth_batch", "autoregressive_rollout"]
