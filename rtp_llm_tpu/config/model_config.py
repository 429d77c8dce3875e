"""Model architecture configuration.

TPU-native analog of the reference's ModelConfig (rtp_llm/cpp/config/ModelConfig.h
and rtp_llm/models/*_weight.py config derivation): a single dataclass built from a
HuggingFace ``config.json``, normalized across model families.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

# Architecture aliases: model types that reuse another family's forward and
# weight map wholesale (the reference registers these as distinct types in
# rtp_llm/model_factory_register.py; here they normalize to one arch).
# Reference-exact registered names (rtp_llm/model_factory_register.py) that
# are spelling or role variants of families we implement. Mapped to our
# canonical type before any other dispatch, so a user migrating from the
# reference can keep their MODEL_TYPE value verbatim. Role-suffixed types
# (-mtp / _eagle3 / _embedding / _tool) register the same trunk in the
# reference too — the extra modules are selected by engine config there
# (RtpLLMOp.cc:26-98) and by spec/embedding config here.
REFERENCE_TYPE_ALIASES = {
    "qwen_2": "qwen2",
    "qwen_3": "qwen3",
    "qwen_2_moe": "qwen2_moe",
    "qwen_3_moe": "qwen3_moe",
    "qwen_2-mtp": "qwen2",
    "qwen_2_embedding": "qwen2",
    "qwen_agent": "qwen",
    "qwen_tool": "qwen",
    "qwen_3_tool": "qwen3",
    "qwen_v2_audio": "qwen2_audio",
    "qwen35_moe_mtp": "qwen35_moe",
    "qwen3_next_mtp": "qwen3_next",
    "qwen_3_moe_eagle3": "qwen3_moe",
    "deepseek2": "deepseek_v2",
    "deepseek3": "deepseek_v3",
    "deepseek-v3-mtp": "deepseek_v3",
    "chatglm4": "glm4",
    "glm_5": "glm4_moe",
    "glm4_moe_lite": "glm4_moe",
    "gpt_neox_13b": "gpt_neox",
    "megatron-bert": "megatron_bert",  # HF config.json spelling
    "xlm-roberta": "roberta",  # HF config.json spelling (XLMRobertaModel)
    "cosyvoice_qwen": "qwen2",
}

ARCH_ALIASES = {
    "aquila": "llama",
    "xverse": "llama",
    "kimi_k2": "deepseek_v3",   # MLA + sigmoid-routed MoE, deepseek-v3 layout
    "kimi_k25": "deepseek_v3",
    "deepseek_v31": "deepseek_v3",
    "deepseek_v32": "deepseek_v3",  # + DSA sparse indexer when the config
                                    # carries index_topk (models/deepseek.py)
    "qwen3_coder_moe": "qwen3_moe",
    "qwen35_dense": "qwen3",
    "qwen35_moe": "qwen3_moe",
    "starcoder": "gpt_bigcode",
    "wizardcoder": "gpt_bigcode",
    "chat_glm_2": "chatglm",
    "chat_glm_3": "chatglm",
    "chatglm2": "chatglm",
    "chatglm3": "chatglm",
    "qwen_7b": "qwen",
    "qwen_13b": "qwen",
    "qwen_1b8": "qwen",
}


@dataclasses.dataclass
class ModelConfig:
    model_type: str = "qwen2"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_attention_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2 uses qkv bias
    mlp_bias: bool = False
    # qwen3-style per-head q/k norms
    use_qk_norm: bool = False
    # encoder family variant: "bert" (post-LN), "megatron" (pre-LN, final
    # encoder ln), "jina" (ALiBi + gated-gelu + qk post-norm)
    bert_variant: str = "bert"
    # roberta: position ids offset past padding_idx (HF
    # create_position_ids_from_input_ids; reference: models/bert.py Roberta
    # — position_ids_style=1, pad_token_id)
    roberta_positions: bool = False
    pad_token_id: Optional[int] = None
    # activation: silu (llama family) | gelu_tanh (gemma/starcoder)
    hidden_act: str = "silu"
    # gemma: rmsnorm computes x * (1 + w); embeddings scaled by sqrt(hidden)
    norm_unit_offset: bool = False
    scale_embeddings: bool = False
    # gemma2: sandwich norms (pre/post ffn + post-attn applied to attn out),
    # logit softcaps, per-layer sliding pattern, custom query scale
    sandwich_norms: bool = False
    attn_soft_cap: float = 0.0
    final_logit_soft_cap: float = 0.0
    query_pre_attn_scalar: float = 0.0  # 0 = default head_dim
    sliding_window_pattern: int = 0  # every Nth layer is GLOBAL; others SWA
    # glm4: rotate only head_dim*factor dims, pairwise-interleaved angles
    partial_rotary_factor: float = 0.0  # 0 = full standard rope
    # False => gpt_neox/phi style partial rotary: first rotary_dim dims
    # rotate half-split (neox), the rest pass through
    rope_partial_interleaved: bool = True
    # parallel-residual norm wiring: "shared" (cohere/falcon/phi: attn and
    # mlp read the same input_norm output) | "dual" (gpt_neox: mlp reads
    # post_attn_norm applied to the ORIGINAL layer input)
    parallel_norms: str = "shared"
    # gpt_bigcode/starcoder: learned absolute position embeddings (wpe)
    # added at embed time; no RoPE
    use_learned_positions: bool = False
    lm_head_bias: bool = False  # phi-2 carries an lm_head bias
    # cohere: GPT-J pairwise rope over the full head_dim, mean-centered
    # weight-only layernorm, parallel attn+mlp residual, scaled logits
    rope_gptj_pairs: bool = False
    norm_type: str = "rmsnorm"  # rmsnorm | layernorm_nobias (+.bias => full)
    parallel_residual: bool = False
    use_alibi: bool = False  # ALiBi position bias instead of RoPE (bloom)
    logit_scale: float = 0.0  # 0 = disabled
    # sliding-window attention (0 = disabled)
    sliding_window: int = 0
    # MoE (0 experts = dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    num_shared_experts: int = 0
    moe_norm_topk_prob: bool = True
    moe_layer_freq: int = 1  # every Nth layer is MoE
    first_moe_layer: int = 0  # dense layers before MoE starts
    moe_router_score_fn: str = "softmax"  # softmax | sigmoid
    # deepseek-v3 group-limited routing + scaling
    moe_n_group: int = 0
    moe_topk_group: int = 0
    moe_routed_scaling_factor: float = 1.0
    moe_router_bias: bool = False  # e_score_correction_bias
    # hybrid linear attention (qwen3-next): gated DeltaNet layers
    layer_types: Optional[tuple] = None  # per-layer "linear_attention"/"full_attention"
    attn_output_gate: bool = False  # q_proj emits [query; gate] per head
    linear_num_key_heads: int = 0
    linear_num_value_heads: int = 0
    linear_key_head_dim: int = 0
    linear_value_head_dim: int = 0
    linear_conv_kernel_dim: int = 0
    # MLA (deepseek v2/v3); 0 = standard attention
    q_lora_rank: int = 0
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    rope_interleave: bool = False
    num_nextn_predict_layers: int = 0  # deepseek MTP module depth
    # DeepSeek-V3.2 DSA sparse attention indexer (0 topk = dense MLA)
    indexer_topk: int = 0
    indexer_head_dim: int = 0
    indexer_n_heads: int = 0
    # multimodal (qwen2-vl): MRoPE sections + vision token ids + raw vision
    # tower config (consumed by multimodal/vit.py)
    mrope_section: Optional[tuple] = None
    image_token_id: int = 0
    video_token_id: int = 0
    vision_start_token_id: int = 0
    vision_config: Optional[dict] = None
    # dtypes
    dtype: str = "bfloat16"
    # pre-quantized checkpoint info (HF quantization_config: gptq/awq)
    quantization: Optional[dict] = None
    # special tokens
    bos_token_id: Optional[int] = None
    eos_token_id: Any = None  # int or list[int]

    def __post_init__(self):
        if self.head_dim == 0:
            self.head_dim = self.hidden_size // self.num_attention_heads
        if isinstance(self.eos_token_id, int):
            self.eos_token_id = [self.eos_token_id]
        elif self.eos_token_id is None:
            self.eos_token_id = []

    @property
    def eos_token_ids(self) -> list:
        return list(self.eos_token_id or [])

    @property
    def kv_size_per_token_bytes(self) -> int:
        """bytes of KV written per token (bf16)."""
        return 2 * self.num_layers * self.num_kv_heads * self.head_dim * 2

    def is_moe_layer(self, layer_idx: int) -> bool:
        if self.num_experts <= 0:
            return False
        if layer_idx < self.first_moe_layer:
            return False
        return (layer_idx - self.first_moe_layer) % max(self.moe_layer_freq, 1) == 0

    @classmethod
    def from_hf_config(cls, hf: dict, model_type: Optional[str] = None) -> "ModelConfig":
        """Normalize a HuggingFace config.json dict into a ModelConfig.

        Mirrors the derivation the reference does per model family in
        rtp_llm/models/{qwen_v2,llama,...}.py, but data-driven.
        """
        mt = model_type or hf.get("model_type", "qwen2")
        mt = REFERENCE_TYPE_ALIASES.get(mt, mt)
        arch = ARCH_ALIASES.get(mt, mt)
        # gpt2-lineage configs (gpt_bigcode) use n_embd/n_layer/n_head; mpt
        # uses d_model/n_layers
        n_heads = hf.get("num_attention_heads",
                         hf.get("n_head", hf.get("n_heads", 32)))
        hidden = hf.get("hidden_size", hf.get("n_embd", hf.get("d_model", 4096)))
        cfg = cls(
            model_type=mt,
            vocab_size=hf.get("vocab_size", 32000),
            hidden_size=hidden,
            intermediate_size=hf.get("intermediate_size", 4 * hidden),
            num_layers=hf.get("num_hidden_layers",
                              hf.get("num_layers",
                                     hf.get("n_layer", hf.get("n_layers", 32)))),
            num_attention_heads=n_heads,
            num_kv_heads=hf.get("num_key_value_heads", n_heads),
            head_dim=hf.get("head_dim") or hidden // n_heads,
            max_position_embeddings=hf.get("max_position_embeddings", 32768),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            rope_scaling=hf.get("rope_scaling"),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            bos_token_id=hf.get("bos_token_id"),
            eos_token_id=hf.get("eos_token_id"),
        )
        # composite vision-language configs: the LM fields live in
        # text_config (reference: rtp_llm/models/llava.py config derivation)
        if arch == "llava":
            tc = dict(hf.get("text_config") or {})
            cfg = cls.from_hf_config(tc, tc.get("model_type", "llama"))
            cfg.model_type = mt
            cfg.image_token_id = hf.get("image_token_index", 32000)
            cfg.vision_config = hf.get("vision_config")
            if cfg.eos_token_id == [] and hf.get("eos_token_id") is not None:
                e = hf["eos_token_id"]
                cfg.eos_token_id = [e] if isinstance(e, int) else list(e)
            return cfg
        if arch == "qwen2_audio":
            # reference: rtp_llm/models/qwen_v2_audio.py — qwen2 LM +
            # Whisper-style audio tower (multimodal/audio_jax.py)
            tc = dict(hf.get("text_config") or {})
            cfg = cls.from_hf_config(tc, tc.get("model_type", "qwen2"))
            cfg.model_type = mt
            cfg.image_token_id = hf.get("audio_token_index", 151646)
            cfg.vision_config = hf.get("audio_config")
            return cfg
        if arch in ("qwen3_vl", "qwen3_vl_moe"):
            # qwen3 LM + interleaved MRoPE + deepstack vision injection
            tc = dict(hf.get("text_config") or {})
            rs = tc.pop("rope_scaling", None) or {}
            inner = "qwen3_moe" if arch == "qwen3_vl_moe" else "qwen3"
            cfg = cls.from_hf_config({**tc, "model_type": inner}, inner)
            cfg.model_type = mt
            cfg.mrope_section = tuple(rs.get("mrope_section") or ())
            cfg.rope_scaling = None
            cfg.image_token_id = hf.get("image_token_id", 151655)
            cfg.video_token_id = hf.get("video_token_id", 151656)
            cfg.vision_start_token_id = hf.get("vision_start_token_id",
                                               151652)
            cfg.vision_config = hf.get("vision_config")
            return cfg
        if arch == "qwen2_5_vl":  # qwen2-vl LM semantics, nested text_config
            tc = dict(hf.get("text_config") or hf)
            rs = tc.pop("rope_scaling", None) or hf.get("rope_scaling") or {}
            cfg = cls.from_hf_config({**tc, "model_type": "qwen2"}, "qwen2")
            cfg.model_type = mt
            cfg.mrope_section = tuple(rs.get("mrope_section") or ())
            cfg.rope_scaling = None  # mrope handled by the model
            cfg.image_token_id = hf.get("image_token_id", 151655)
            cfg.video_token_id = hf.get("video_token_id", 151656)
            cfg.vision_start_token_id = hf.get("vision_start_token_id", 151652)
            cfg.vision_config = hf.get("vision_config")
            return cfg
        # family-specific normalization
        if arch in ("qwen2", "qwen2_moe"):
            cfg.attention_bias = True
        if arch in ("qwen3", "qwen3_moe"):
            cfg.attention_bias = hf.get("attention_bias", False)
            cfg.use_qk_norm = True
        if arch == "llama":
            cfg.attention_bias = hf.get("attention_bias", False)
        if arch in ("gemma", "gemma2"):
            cfg.hidden_act = "gelu_tanh"
            cfg.norm_unit_offset = True
            cfg.scale_embeddings = True
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        if arch == "gemma2":
            cfg.sandwich_norms = True
            cfg.attn_soft_cap = hf.get("attn_logit_softcapping") or 0.0
            cfg.final_logit_soft_cap = hf.get("final_logit_softcapping") or 0.0
            cfg.query_pre_attn_scalar = hf.get("query_pre_attn_scalar") or 0.0
            cfg.sliding_window = hf.get("sliding_window") or 0
            cfg.sliding_window_pattern = 2  # every 2nd layer global
        if arch == "phi3":
            cfg.rope_theta = hf.get("rope_theta", 10000.0)
        if arch == "cohere":
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-5)
            cfg.norm_type = "layernorm_nobias"
            cfg.parallel_residual = True
            cfg.rope_gptj_pairs = True
            cfg.logit_scale = hf.get("logit_scale", 1.0)
            cfg.use_qk_norm = hf.get("use_qk_norm", False)
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        if arch == "glm4":
            cfg.attention_bias = hf.get("attention_bias", True)
            cfg.sandwich_norms = True
            cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.5)
        if arch == "bert":
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-12)
            cfg.attention_bias = True
        if arch == "roberta":
            # reference: models/bert.py Roberta (register_model "roberta",
            # XLMRobertaModel/RobertaModel archs) — bert encoder with
            # position ids offset past padding_idx (position_ids_style=1)
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-5)
            cfg.attention_bias = True
            cfg.roberta_positions = True
            cfg.pad_token_id = hf.get("pad_token_id", 1)
        if arch == "megatron_bert":
            # pre-LayerNorm bert (reference: models/megatron_bert.py —
            # layernorm_type=pre_layernorm, no embedding LN, final encoder ln)
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-12)
            cfg.attention_bias = True
            cfg.bert_variant = "megatron"
        if arch == "jina_bert_code":
            # reference: models/jina_bert/jina_bert.py — gated-gelu MLP,
            # ALiBi (no position embeddings), qk post-norm
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-12)
            cfg.attention_bias = True
            cfg.bert_variant = "jina"
            cfg.use_alibi = True
            cfg.use_qk_norm = True
            cfg.intermediate_size = hf.get("intermediate_size", 4 * hidden)
        if arch in ("internlm", "yi"):
            # llama architecture; internlm v1 carries attention biases
            cfg.attention_bias = hf.get("bias", arch == "internlm")
        if arch in ("baichuan", "baichuan2"):
            # 7B uses RoPE; 13B (hidden 5120, 40 layers) uses ALiBi — the HF
            # config does not mark it, matching the reference's per-size rule
            cfg.use_alibi = hf.get("use_alibi", cfg.hidden_size >= 5120)
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", False)
        if arch == "starcoder2":
            cfg.rms_norm_eps = hf.get("norm_epsilon", 1e-5)
            cfg.norm_type = "layernorm"
            cfg.attention_bias = hf.get("use_bias", True)
            cfg.hidden_act = "gelu_tanh"
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        if arch == "bloom":
            cfg.rms_norm_eps = hf.get("layer_norm_epsilon", 1e-5)
            cfg.norm_type = "layernorm"
            cfg.use_alibi = True
            cfg.attention_bias = True
            cfg.hidden_act = "gelu_tanh"
            cfg.intermediate_size = hf.get("intermediate_size") or 4 * hidden
            cfg.num_kv_heads = cfg.num_attention_heads  # MHA, fused qkv
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", True)
            cfg.vocab_size = hf.get("vocab_size", 250880)
        if arch == "falcon":
            cfg.rms_norm_eps = hf.get("layer_norm_epsilon", 1e-5)
            cfg.norm_type = "layernorm"
            cfg.parallel_residual = hf.get("parallel_attn", True)
            cfg.hidden_act = "gelu_tanh"
            cfg.attention_bias = hf.get("bias", False)
            if hf.get("multi_query", True) and not hf.get(
                    "new_decoder_architecture", False):
                cfg.num_kv_heads = 1
            elif hf.get("new_decoder_architecture", False):
                cfg.num_kv_heads = hf.get("num_kv_heads", 8)
            cfg.use_alibi = hf.get("alibi", False)
            cfg.intermediate_size = hf.get("ffn_hidden_size") or 4 * hidden
        if arch in ("deepseek_v2", "deepseek_v3"):
            cfg.q_lora_rank = hf.get("q_lora_rank") or 0
            cfg.kv_lora_rank = hf.get("kv_lora_rank", 512)
            cfg.qk_nope_head_dim = hf.get("qk_nope_head_dim", 128)
            cfg.qk_rope_head_dim = hf.get("qk_rope_head_dim", 64)
            cfg.v_head_dim = hf.get("v_head_dim", 128)
            cfg.head_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
            cfg.rope_interleave = hf.get("rope_interleave", True)
            cfg.num_nextn_predict_layers = hf.get(
                "num_nextn_predict_layers", 0) or 0
            cfg.num_experts = hf.get("n_routed_experts", 0) or 0
            cfg.num_experts_per_tok = hf.get("num_experts_per_tok", 8)
            cfg.moe_intermediate_size = hf.get("moe_intermediate_size", 0)
            cfg.num_shared_experts = hf.get("n_shared_experts", 0) or 0
            cfg.first_moe_layer = hf.get("first_k_dense_replace", 0)
            cfg.moe_norm_topk_prob = hf.get("norm_topk_prob", True)
            cfg.moe_router_score_fn = (
                "sigmoid" if arch == "deepseek_v3"
                else hf.get("scoring_func", "softmax")
            )
            cfg.moe_n_group = hf.get("n_group", 0) or 0
            cfg.moe_topk_group = hf.get("topk_group", 0) or 0
            cfg.moe_routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
            cfg.moe_router_bias = arch == "deepseek_v3"
            if hf.get("index_topk") is not None:
                # DeepSeek-V3.2 DSA (reference: deepseek_v2.py:710-714)
                cfg.indexer_topk = hf.get("index_topk", 2048)
                cfg.indexer_head_dim = hf.get("index_head_dim", 128)
                cfg.indexer_n_heads = hf.get("index_n_heads", 64)
        if arch == "deepseek_vl_v2":
            # DeepSeek-VL2 (reference: models/deepseek_vl2/deepseek_vl2.py):
            # deepseek-MoE trunk WITHOUT MLA under "language_config", SigLIP
            # tower + tile processing under vision/projector configs
            lc = hf.get("language_config", hf)
            cfg.vocab_size = lc.get("vocab_size", cfg.vocab_size)
            cfg.hidden_size = lc.get("hidden_size", cfg.hidden_size)
            cfg.intermediate_size = lc.get("intermediate_size",
                                           cfg.intermediate_size)
            cfg.num_layers = lc.get("num_hidden_layers", cfg.num_layers)
            cfg.num_attention_heads = lc.get("num_attention_heads",
                                             cfg.num_attention_heads)
            cfg.num_kv_heads = lc.get("num_key_value_heads",
                                      cfg.num_attention_heads)
            cfg.head_dim = cfg.hidden_size // cfg.num_attention_heads
            cfg.rms_norm_eps = lc.get("rms_norm_eps", 1e-6)
            cfg.rope_theta = lc.get("rope_theta", 10000.0)
            cfg.tie_word_embeddings = lc.get("tie_word_embeddings", False)
            cfg.num_experts = lc.get("n_routed_experts", 0) or 0
            cfg.num_experts_per_tok = lc.get("num_experts_per_tok", 0) or 0
            cfg.moe_intermediate_size = lc.get("moe_intermediate_size", 0)
            cfg.num_shared_experts = lc.get("n_shared_experts", 0) or 0
            cfg.first_moe_layer = lc.get("first_k_dense_replace", 0)
            cfg.moe_norm_topk_prob = lc.get("norm_topk_prob", False)
            cfg.moe_router_score_fn = lc.get("scoring_func", "softmax")
            cfg.moe_n_group = lc.get("n_group", 0) or 0
            cfg.moe_topk_group = lc.get("topk_group", 0) or 0
            cfg.moe_routed_scaling_factor = lc.get("routed_scaling_factor",
                                                   1.0)
            cfg.eos_token_id = lc.get("eos_token_id", cfg.eos_token_id)
            if lc.get("kv_lora_rank"):
                # deepseek-vl2 small/base trunks use MLA (tiny is MHA);
                # the factory routes to the MLA model when these are set
                cfg.q_lora_rank = lc.get("q_lora_rank") or 0
                cfg.kv_lora_rank = lc.get("kv_lora_rank", 512)
                cfg.qk_nope_head_dim = lc.get("qk_nope_head_dim", 128)
                cfg.qk_rope_head_dim = lc.get("qk_rope_head_dim", 64)
                cfg.v_head_dim = lc.get("v_head_dim", 128)
                cfg.head_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
                cfg.rope_interleave = lc.get("rope_interleave", True)
            cfg.vision_config = hf.get("vision_config")
            cfg.image_token_id = hf.get("image_token_id", 128815)  # <image>
        if arch == "qwen2_vl":
            cfg.attention_bias = True
            rs = hf.get("rope_scaling") or {}
            cfg.mrope_section = tuple(rs.get("mrope_section") or ())
            cfg.rope_scaling = None  # mrope handled by the model, not tables
            cfg.image_token_id = hf.get("image_token_id", 151655)
            cfg.video_token_id = hf.get("video_token_id", 151656)
            cfg.vision_start_token_id = hf.get("vision_start_token_id", 151652)
            cfg.vision_config = hf.get("vision_config")
        if arch == "qwen3_next":
            cfg.use_qk_norm = True
            cfg.norm_unit_offset = True  # zero-centered (1+w) RMSNorms
            cfg.attn_output_gate = True
            cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.25)
            cfg.layer_types = tuple(hf.get("layer_types") or ())
            if not cfg.layer_types:
                interval = hf.get("full_attention_interval", 4)
                cfg.layer_types = tuple(
                    "full_attention" if (i + 1) % interval == 0
                    else "linear_attention" for i in range(cfg.num_layers)
                )
            cfg.linear_num_key_heads = hf.get("linear_num_key_heads", 16)
            cfg.linear_num_value_heads = hf.get("linear_num_value_heads", 32)
            cfg.linear_key_head_dim = hf.get("linear_key_head_dim", 128)
            cfg.linear_value_head_dim = hf.get("linear_value_head_dim", 128)
            cfg.linear_conv_kernel_dim = hf.get("linear_conv_kernel_dim", 4)
        if arch == "qwen_vl":
            # qwen v1 trunk + OpenCLIP ViT-bigG tower with resampler
            # (reference: rtp_llm/models/qwen_vl.py:38-56 — image tokens
            # splice between image_start_id/end_id, pad id = start+2)
            vis = hf.get("visual", {})
            cfg.vision_config = vis
            start = int(vis.get("image_start_id", 151857))
            cfg.vision_start_token_id = start
            cfg.image_token_id = start + 2
        if arch in ("qwen", "qwen_vl"):  # qwen v1 (reference: models/qwen.py)
            cfg.attention_bias = True  # fused c_attn carries the only bias
            cfg.rms_norm_eps = hf.get("layer_norm_epsilon", 1e-6)
            # HF QWenMLP splits intermediate_size across w1/w2
            cfg.intermediate_size = hf.get("intermediate_size", 22016) // 2
            cfg.head_dim = hf.get("kv_channels") or cfg.head_dim
            cfg.rope_theta = hf.get("rotary_emb_base", 10000.0)
            cfg.max_position_embeddings = hf.get("seq_length", 8192)
            cfg.rope_scaling = None  # dynamic NTK not modeled (static tables)
        if arch == "gpt_neox":
            cfg.norm_type = "layernorm"
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-5)
            cfg.parallel_residual = hf.get("use_parallel_residual", True)
            cfg.parallel_norms = "dual"
            cfg.partial_rotary_factor = hf.get("rotary_pct", 0.25)
            cfg.rope_partial_interleaved = False
            cfg.rope_theta = hf.get("rotary_emb_base",
                                    hf.get("rope_theta", 10000.0))
            cfg.hidden_act = hf.get("hidden_act", "gelu")
            cfg.attention_bias = hf.get("attention_bias", True)
            cfg.mlp_bias = True
        if arch == "gpt_bigcode":  # starcoder / wizardcoder
            cfg.norm_type = "layernorm"
            cfg.rms_norm_eps = hf.get("layer_norm_epsilon", 1e-5)
            cfg.num_kv_heads = 1 if hf.get("multi_query", True) else n_heads
            cfg.use_learned_positions = True
            cfg.max_position_embeddings = hf.get("n_positions", 8192)
            cfg.attention_bias = True
            cfg.mlp_bias = True
            cfg.hidden_act = ("gelu_tanh"
                              if "tanh" in hf.get("activation_function",
                                                  "gelu_pytorch_tanh")
                              else "gelu")
            cfg.intermediate_size = hf.get("n_inner") or 4 * hidden
            cfg.tie_word_embeddings = hf.get("tie_word_embeddings", True)
        if arch == "mpt":
            no_bias = hf.get("no_bias", True)
            cfg.norm_type = "layernorm_nobias" if no_bias else "layernorm"
            cfg.rms_norm_eps = hf.get("layer_norm_epsilon", 1e-5)
            cfg.use_alibi = bool((hf.get("attn_config") or {}).get("alibi", True))
            cfg.hidden_act = "gelu"
            cfg.attention_bias = not no_bias
            cfg.mlp_bias = not no_bias
            cfg.intermediate_size = int(hf.get("expansion_ratio", 4) * hidden)
            cfg.max_position_embeddings = hf.get("max_seq_len", 2048)
            cfg.tie_word_embeddings = True  # mpt has no separate lm_head
        if arch == "phi":  # phi-1/1.5/2
            cfg.norm_type = "layernorm"
            cfg.rms_norm_eps = hf.get("layer_norm_eps", 1e-5)
            cfg.parallel_residual = True
            cfg.parallel_norms = "shared"
            cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.5)
            cfg.rope_partial_interleaved = False
            cfg.attention_bias = True
            cfg.mlp_bias = True
            cfg.lm_head_bias = True
            cfg.hidden_act = "gelu_tanh"  # gelu_new
        if arch == "chatglm4v":
            # GLM-4V: chatglm trunk + EVA2-CLIP tower (reference:
            # models/chat_glm_v4_vision.py + chatglm4v mixin). The image
            # placeholder (boi token) expands to the tower's full
            # [boi | patches | eoi] embedding run.
            cfg.vision_config = hf.get("vision_config")
            cfg.vision_start_token_id = hf.get("boi_token_id", 0)
            cfg.image_token_id = hf.get("boi_token_id", 0)
        if arch in ("chatglm", "chatglm4v"):  # chatglm2/3 + glm-4v trunk
            cfg.rms_norm_eps = hf.get("layernorm_epsilon", 1e-5)
            if hf.get("multi_query_attention", True):
                cfg.num_kv_heads = hf.get("multi_query_group_num", 2)
            cfg.head_dim = hf.get("kv_channels") or cfg.head_dim
            cfg.partial_rotary_factor = 0.5
            cfg.attention_bias = hf.get("add_qkv_bias", True)
            cfg.intermediate_size = hf.get("ffn_hidden_size",
                                           cfg.intermediate_size)
            cfg.num_layers = hf.get("num_layers", cfg.num_layers)
            cfg.vocab_size = hf.get("padded_vocab_size", cfg.vocab_size)
            cfg.max_position_embeddings = hf.get("seq_length", 32768)
            cfg.rope_theta = 10000.0 * hf.get("rope_ratio", 1)
        if arch == "glm4_moe":  # GLM-4.5 family (HF Glm4MoeForCausalLM)
            cfg.attention_bias = hf.get("attention_bias", True)
            cfg.partial_rotary_factor = hf.get("partial_rotary_factor", 0.5)
            # glm4_moe rotates the partial dims half-split (standard
            # rotate_half), NOT glm4's pairwise-interleaved variant
            cfg.rope_partial_interleaved = False
            cfg.use_qk_norm = hf.get("use_qk_norm", False)
            cfg.num_experts = hf.get("n_routed_experts", 0) or 0
            cfg.num_experts_per_tok = hf.get("num_experts_per_tok", 8)
            cfg.moe_intermediate_size = hf.get("moe_intermediate_size", 0)
            cfg.num_shared_experts = hf.get("n_shared_experts", 0) or 0
            cfg.first_moe_layer = hf.get("first_k_dense_replace", 1)
            cfg.moe_norm_topk_prob = hf.get("norm_topk_prob", True)
            cfg.moe_router_score_fn = "sigmoid"
            cfg.moe_n_group = hf.get("n_group", 0) or 0
            cfg.moe_topk_group = hf.get("topk_group", 0) or 0
            cfg.moe_routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
            cfg.moe_router_bias = True
        if arch == "kimi_linear":  # hybrid KDA + MLA (reference:
            # models/kimi_linear/kimi_linear.py config derivation)
            cfg.q_lora_rank = hf.get("q_lora_rank") or 0
            cfg.kv_lora_rank = hf.get("kv_lora_rank", 512)
            cfg.qk_nope_head_dim = hf.get("qk_nope_head_dim", 128)
            cfg.qk_rope_head_dim = hf.get("qk_rope_head_dim", 64)
            cfg.v_head_dim = hf.get("v_head_dim", 128)
            cfg.head_dim = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
            cfg.rope_interleave = False
            cfg.num_experts = hf.get("num_experts", 0) or 0
            cfg.num_experts_per_tok = hf.get("num_experts_per_token", 8)
            cfg.moe_intermediate_size = hf.get("moe_intermediate_size", 0)
            cfg.num_shared_experts = hf.get("num_shared_experts", 1)
            cfg.first_moe_layer = hf.get("first_k_dense_replace", 1)
            cfg.moe_layer_freq = hf.get("moe_layer_freq", 1)
            cfg.moe_norm_topk_prob = hf.get("moe_renormalize", True)
            cfg.moe_router_score_fn = hf.get(
                "moe_router_activation_func", "sigmoid")
            cfg.moe_n_group = hf.get("num_expert_group", 1) or 0
            cfg.moe_topk_group = hf.get("topk_group", 1) or 0
            cfg.moe_routed_scaling_factor = hf.get("routed_scaling_factor", 1.0)
            cfg.moe_router_bias = True
            lac = hf.get("linear_attn_config") or {}
            cfg.linear_key_head_dim = lac.get("head_dim", 128)
            cfg.linear_value_head_dim = lac.get("head_dim", 128)
            cfg.linear_num_key_heads = lac.get("num_heads", 32)
            cfg.linear_num_value_heads = lac.get("num_heads", 32)
            cfg.linear_conv_kernel_dim = lac.get("short_conv_kernel_size", 4)
            kda = set(lac.get("kda_layers") or ())  # 1-based indices
            cfg.layer_types = tuple(
                "linear_attention" if (i + 1) in kda else "full_attention"
                for i in range(cfg.num_layers)
            )
        qc = hf.get("quantization_config")
        if qc and qc.get("quant_method") in ("gptq", "awq"):
            cfg.quantization = {
                "method": qc.get("quant_method"),
                "bits": qc.get("bits", 4),
                "group_size": qc.get("group_size", 128),
                "desc_act": qc.get("desc_act", False),
            }
        elif qc and qc.get("quant_method") in (
                "smooth_quant", "smoothquant", "omni_quant", "omniquant"):
            # pre-quantized W8A8 checkpoints (reference:
            # model_loader/smooth_quant_weight.py, omni_quant_weight.py)
            cfg.quantization = {"method": qc.get("quant_method")}
        sw = hf.get("sliding_window")
        if sw and hf.get("use_sliding_window", False):
            cfg.sliding_window = int(sw)
        # MoE families (qwen2_moe / qwen3_moe / mixtral)
        if "num_experts" in hf or "num_local_experts" in hf:
            cfg.num_experts = hf.get("num_experts", hf.get("num_local_experts", 0))
            cfg.num_experts_per_tok = hf.get("num_experts_per_tok", hf.get("top_k", 2))
            cfg.moe_intermediate_size = hf.get(
                "moe_intermediate_size", hf.get("intermediate_size", 0)
            )
            cfg.num_shared_experts = hf.get("shared_expert_intermediate_size", 0) and 1 or 0
            cfg.moe_norm_topk_prob = hf.get("norm_topk_prob", True)
            if "decoder_sparse_step" in hf:
                cfg.moe_layer_freq = hf.get("decoder_sparse_step", 1)
        return cfg

    @classmethod
    def from_pretrained(cls, model_path: str, model_type: Optional[str] = None) -> "ModelConfig":
        path = os.path.join(model_path, "config.json")
        with open(path) as f:
            hf = json.load(f)
        return cls.from_hf_config(hf, model_type)
