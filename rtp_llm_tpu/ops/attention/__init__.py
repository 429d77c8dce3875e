from rtp_llm_tpu.ops.attention.ref import paged_attention_ref

__all__ = ["paged_attention_ref"]
