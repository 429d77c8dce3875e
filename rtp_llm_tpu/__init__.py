"""rtp_llm_tpu — a TPU-native LLM inference framework.

A from-scratch JAX/XLA/Pallas serving stack with the capabilities of
alibaba/rtp-llm (see SURVEY.md): OpenAI-compatible frontend, continuous
batching over a paged prefix-reusable KV cache, HF checkpoint loading with
load-time quantization, and TP/DP/EP parallelism expressed as mesh axes.
"""

__version__ = "0.1.0"
