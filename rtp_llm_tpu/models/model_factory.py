"""model_type -> model class registry.

Analog of the reference's register_model / ModelFactory
(rtp_llm/model_factory.py:32, model_factory_register.py). The reference
registers 58 model types; families sharing an architecture share a class here.
"""

from __future__ import annotations

from typing import Callable

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.llama_family import LlamaFamilyModel

_REGISTRY: dict[str, Callable[[ModelConfig], object]] = {}


def register_model(model_type: str, factory: Callable[[ModelConfig], object]):
    _REGISTRY[model_type] = factory


for _mt in ("llama", "mistral", "qwen2", "qwen3", "qwen2_moe", "qwen3_moe",
            "mixtral", "gemma", "gemma2", "phi3", "glm4", "cohere",
            "internlm", "internlm2", "yi", "baichuan", "baichuan2", "starcoder2",
            "bloom", "falcon",
            # round 2 additions (reference model_factory_register.py types)
            "qwen", "qwen_7b", "qwen_13b", "qwen_1b8", "qwen_vl",
            "gpt_neox", "gpt_bigcode", "starcoder", "wizardcoder",
            "mpt", "phi", "chatglm", "chat_glm_2", "chat_glm_3", "chatglm4v",
            "chatglm2", "chatglm3", "glm4_moe", "aquila", "xverse",
            "qwen3_coder_moe", "qwen35_dense", "qwen35_moe"):
    register_model(_mt, LlamaFamilyModel)


def _make_deepseek(cfg: ModelConfig):
    from rtp_llm_tpu.models.deepseek import DeepseekModel

    return DeepseekModel(cfg)


for _mt in ("deepseek_v2", "deepseek_v3", "deepseek_v31", "deepseek_v32",
            "kimi_k2", "kimi_k25"):
    register_model(_mt, _make_deepseek)


def _make_kimi_linear(cfg: ModelConfig):
    from rtp_llm_tpu.models.kimi_linear import KimiLinearModel

    return KimiLinearModel(cfg)


register_model("kimi_linear", _make_kimi_linear)

# llava / qwen2_audio: llama-family LM with modality embeddings spliced
# at prefill (flat positions)
def _make_deepseek_vl2(cfg):
    # deepseek-vl2 tiny = MHA trunk (llama family); small/base = MLA
    if cfg.kv_lora_rank > 0:
        from rtp_llm_tpu.models.deepseek import DeepseekModel

        return DeepseekModel(cfg)
    return LlamaFamilyModel(cfg)


register_model("deepseek_vl_v2", _make_deepseek_vl2)
register_model("llava", LlamaFamilyModel)
register_model("qwen2_audio", LlamaFamilyModel)


def _make_qwen2_vl(cfg: ModelConfig):
    from rtp_llm_tpu.models.qwen2_vl import Qwen2VLModel

    return Qwen2VLModel(cfg)


register_model("qwen2_vl", _make_qwen2_vl)
register_model("qwen2_5_vl", _make_qwen2_vl)


def _make_qwen3_vl(cfg: ModelConfig):
    from rtp_llm_tpu.models.qwen2_vl import Qwen3VLModel

    return Qwen3VLModel(cfg)


register_model("qwen3_vl", _make_qwen3_vl)
register_model("qwen3_vl_moe", _make_qwen3_vl)


def _make_qwen3_next(cfg: ModelConfig):
    from rtp_llm_tpu.models.qwen3_next import QwenNextModel

    return QwenNextModel(cfg)


register_model("qwen3_next", _make_qwen3_next)


def _make_bert(cfg: ModelConfig):
    from rtp_llm_tpu.models.bert import BertModel

    return BertModel(cfg)


register_model("bert", _make_bert)
# roberta/xlm-roberta: bert encoder with pad-offset position ids (reference:
# models/bert.py Roberta, position_ids_style=1; classifier/reranker heads in
# downstream_modules/classifier/roberta_classifier.py)
register_model("roberta", _make_bert)
# encoder variants share the BertModel forward, selected by cfg.bert_variant
# (reference: models/megatron_bert.py, models/jina_bert/jina_bert.py)
register_model("megatron_bert", _make_bert)
register_model("jina_bert_code", _make_bert)


# Reference-exact type spellings resolve to the same factories
# (config/model_config.py REFERENCE_TYPE_ALIASES documents each mapping).
from rtp_llm_tpu.config.model_config import REFERENCE_TYPE_ALIASES

for _alias, _target in REFERENCE_TYPE_ALIASES.items():
    if _target in _REGISTRY:
        register_model(_alias, _REGISTRY[_target])


def create_model(cfg: ModelConfig):
    try:
        factory = _REGISTRY[cfg.model_type]
    except KeyError:
        raise ValueError(
            f"unknown model_type {cfg.model_type!r}; registered: {sorted(_REGISTRY)}"
        ) from None
    return factory(cfg)


def registered_model_types() -> list[str]:
    return sorted(_REGISTRY)
