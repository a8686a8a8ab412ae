from tcdiff_tpu.interop.torch_convert import (
    dance_decoder_params_from_torch,
    dance_decoder_params_to_torch,
    traj_decoder_params_from_torch,
)

__all__ = [
    "dance_decoder_params_from_torch",
    "dance_decoder_params_to_torch",
    "traj_decoder_params_from_torch",
]
