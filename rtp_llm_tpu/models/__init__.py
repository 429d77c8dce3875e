"""Model zoo: pure-function JAX forwards over canonical weight pytrees.

TPU-native analog of the reference's models_py model descs
(rtp_llm/models_py/model_desc/). A model object holds only static metadata
(config, rope tables); ``forward(weights, cache, inputs)`` is a pure function
suitable for jit/shard_map, with the paged KV cache threaded functionally
(donated in the engine's compiled step).
"""

from rtp_llm_tpu.models.batch import ModelInputs, ModelOutputs
from rtp_llm_tpu.models.llama_family import LlamaFamilyModel
from rtp_llm_tpu.models.model_factory import create_model, register_model

__all__ = [
    "ModelInputs",
    "ModelOutputs",
    "LlamaFamilyModel",
    "create_model",
    "register_model",
]
