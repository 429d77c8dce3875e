from rtp_llm_tpu.multimodal.processor import MMInputs, MultimodalProcessor

__all__ = ["MMInputs", "MultimodalProcessor"]
