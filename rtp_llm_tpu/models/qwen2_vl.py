"""Qwen2-VL: qwen2 text stack with MRoPE + vision-embedding splice.

Reference analog: the qwen2-vl model desc + multimodal mixin
(rtp_llm/models_py/, rtp_llm/multimodal/multimodal_mixins/) and the C++
MultimodalProcessor (cpp/multimodal_processor/) which applies precomputed
VIT embeddings into the token stream. The vision tower runs in
multimodal/vit.py; this class is the decode path: standard llama-family
layers with 3D MRoPE positions during multimodal prefill
(ModelInputs.mrope_positions) and placeholder-token embedding override
(mm_embeds/mm_mask). Decode steps use ordinary 1D positions — text
continuation has identical t/h/w position streams, which reduces MRoPE to
standard neox rope (the engine offsets positions by the stream's mrope
delta).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.batch import ModelInputs
from rtp_llm_tpu.models.llama_family import LlamaFamilyModel
from rtp_llm_tpu.ops.rope import apply_mrope


class Qwen2VLModel(LlamaFamilyModel):
    is_multimodal = True

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        # section id per rotation pair (mrope_section sums to head_dim//2)
        sec = cfg.mrope_section or (cfg.head_dim // 2,)
        secmap = np.concatenate(
            [np.full(n, i % 3, np.int32) for i, n in enumerate(sec)]
        )
        assert secmap.shape[0] == cfg.head_dim // 2, (sec, cfg.head_dim)
        self.secmap = secmap  # host numpy; embeds as a tiny constant

    def _apply_rope(self, x, inputs: ModelInputs, w=None):
        cos, sin = self._rope_tables(w)
        if inputs.mrope_positions is not None:
            return apply_mrope(x, inputs.mrope_positions, cos, sin,
                               self.secmap)
        if inputs.pos_deltas is not None:
            from rtp_llm_tpu.ops.rope import apply_rope

            shifted = jnp.maximum(
                inputs.positions + inputs.pos_deltas[:, None], 0
            )
            return apply_rope(x, shifted, cos, sin)
        return super()._apply_rope(x, inputs, w)


class Qwen3VLModel(Qwen2VLModel):
    """Qwen3-VL: qwen3 text stack (qk-norm) + INTERLEAVED MRoPE + deepstack
    (reference: qwen3_vl registration; HF Qwen3VLTextRotaryEmbedding
    apply_interleaved_mrope + Qwen3VLModel._deepstack_process).

    Interleaved MRoPE reassigns rotation-pair streams as [T H W T H W ...]
    instead of contiguous sections — expressed here as a different secmap.
    Deepstack: the vision tower also emits K merged feature sets from early
    blocks; mm_embeds packs them channel-wise ([T, H*(1+K)]) and the hidden
    states of the first K layers get feature k added at visual positions.
    """

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        sec = cfg.mrope_section or ()
        half = cfg.head_dim // 2
        secmap = np.zeros((half,), np.int32)  # default stream: T
        if len(sec) == 3:
            secmap[1: sec[1] * 3: 3] = 1  # H
            secmap[2: sec[2] * 3: 3] = 2  # W
        self.secmap = secmap  # host numpy; embeds as a tiny constant
        ds = (cfg.vision_config or {}).get("deepstack_visual_indexes") or ()
        self.num_deepstack = len(ds)

    def _post_layer_hook(self, i, x, inputs: ModelInputs):
        if (inputs.mm_mask is None or self.num_deepstack == 0
                or i >= self.num_deepstack or inputs.mm_embeds is None):
            return x
        h = self.cfg.hidden_size
        ds = inputs.mm_embeds[..., h * (1 + i): h * (2 + i)]
        return jnp.where(inputs.mm_mask[..., None],
                         x + ds.astype(x.dtype), x)
