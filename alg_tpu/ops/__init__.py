from alg_tpu.ops.attention import attention

__all__ = ["attention"]
