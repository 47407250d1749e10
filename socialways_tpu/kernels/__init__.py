from socialways_tpu.kernels.social_attention import (
    social_attention,
    social_attention_fused,
)

__all__ = ["social_attention", "social_attention_fused"]
