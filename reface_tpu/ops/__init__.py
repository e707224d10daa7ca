from reface_tpu.ops.attention import attention_bhnd, multi_head_attention

__all__ = ["attention_bhnd", "multi_head_attention"]
