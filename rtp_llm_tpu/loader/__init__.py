"""Checkpoint loading: HF safetensors -> canonical JAX weight pytree.

TPU-native analog of the reference's model_loader package
(rtp_llm/model_loader/loader.py:31, model_weight_info.py). Weights are loaded
into a flat ``{canonical_name: jnp.ndarray}`` dict with per-layer tensors
stacked along a leading layer axis so the model forward can ``lax.scan`` over
layers (one compiled layer body instead of N inlined copies).
"""

from rtp_llm_tpu.loader.loader import (
    CheckpointLoader, load_eagle_weights, load_model_weights,
)
from rtp_llm_tpu.loader.weight_maps import WeightSpec, get_weight_specs

__all__ = ["CheckpointLoader", "load_eagle_weights", "load_model_weights",
           "WeightSpec", "get_weight_specs"]
