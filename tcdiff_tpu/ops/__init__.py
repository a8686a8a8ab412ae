from tcdiff_tpu.ops.fused_attention import fused_attention

__all__ = ["fused_attention"]
