"""LoRA adapters: load-time merge (static) and runtime multi-LoRA (dynamic).

Analog of the reference's LoRA stack (rtp_llm/lora/lora_manager.py:12 +
model_loader LoRA weight load, loader.py:100): adapters are HF PEFT
directories; static adapters merge into the base weights at load, dynamic
adapters are held as stacked (A, B) factors applied per request.
"""

from rtp_llm_tpu.lora.lora import LoraAdapter, LoraManager, load_peft_adapter, merge_lora

__all__ = ["LoraAdapter", "LoraManager", "load_peft_adapter", "merge_lora"]
