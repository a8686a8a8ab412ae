from tcdiff_tpu.models.rotary import RotaryEmbedding, apply_rotary, rotary_freqs
from tcdiff_tpu.models.dance_decoder import DanceDecoder

__all__ = ["RotaryEmbedding", "apply_rotary", "rotary_freqs", "DanceDecoder"]
