from animate_anything_tpu.ops.attention import attention, set_default_attn_impl

__all__ = ["attention", "set_default_attn_impl"]
