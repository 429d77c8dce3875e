from rtp_llm_tpu.ops.norms import rms_norm, fused_add_rms_norm
from rtp_llm_tpu.ops.activations import silu_and_mul
from rtp_llm_tpu.ops.rope import compute_rope_freqs, apply_rope

__all__ = [
    "rms_norm",
    "fused_add_rms_norm",
    "silu_and_mul",
    "compute_rope_freqs",
    "apply_rope",
]
