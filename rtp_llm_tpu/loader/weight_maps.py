"""Canonical weight naming + HF name maps per model family.

Analog of the reference's per-model ``ModelDeployWeightInfo`` weight-name maps
(rtp_llm/model_loader/model_weight_info.py:101, rtp_llm/models/*_weight.py) and
the C++ weight-name registry (rtp_llm/cpp/models/models_weight/W.h:9-182),
re-expressed as a declarative spec table.

Canonical layout conventions (TPU-first):
  * all linear kernels are ``[in_dim, out_dim]`` so forward is ``y = x @ W``
    (HF stores ``[out, in]``; we transpose at load),
  * per-layer tensors are stacked along a leading layer axis ``[L, ...]``,
  * per-expert tensors are stacked ``[L, E, in, out]`` for batched expert
    matmuls on the MXU.

Canonical names:
  embed_tokens [V,H]; final_norm [H]; lm_head [H,V]
  layers.input_norm [L,H]; layers.post_attn_norm [L,H]
  layers.q_proj [L,H,Hq*D] (+ layers.q_bias [L,Hq*D]); k/v likewise
  layers.o_proj [L,Hq*D,H]; layers.q_norm / layers.k_norm [L,D]
  layers.gate_proj / layers.up_proj [L,H,I]; layers.down_proj [L,I,H]
  layers.router [L,H,E]; layers.moe_gate/moe_up [L,E,H,I']; layers.moe_down [L,E,I',H]
  layers.shared_gate/shared_up [L,H,Is]; layers.shared_down [L,Is,H]
  layers.router_bias [L,E]  (e.g. deepseek-v3 e_score_correction_bias)
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Optional

from rtp_llm_tpu.config.model_config import ModelConfig


@dataclasses.dataclass(frozen=True)
class WeightSpec:
    """One canonical tensor: where it comes from in the HF checkpoint and how
    it is laid out / sharded.

    hf_pattern uses ``{l}`` for the layer index and ``{e}`` for the expert
    index. ``transpose`` flips the trailing two dims (HF Linear [out,in] ->
    ours [in,out]). ``shard_axis``: logical TP sharding of the *canonical*
    tensor — name of the dimension ('out' = last axis, 'in' = second-to-last,
    'expert' = expert axis, None = replicated).
    """

    name: str
    hf_pattern: str
    per_layer: bool = False
    per_expert: bool = False
    transpose: bool = False
    shard_axis: Optional[str] = None
    optional: bool = False
    # present only when this predicate on ModelConfig holds
    when: Optional[Callable[[ModelConfig], bool]] = None
    # restrict stacking to a subset of layers (e.g. deepseek's dense-first-K /
    # MoE-rest split); None = all layers. The model maps global layer index ->
    # stack position itself.
    layers_fn: Optional[Callable[[ModelConfig], list]] = None
    # slice rows [a:b] of the HF tensor before transpose (fused qkv/gate_up
    # checkpoints, e.g. phi3)
    hf_slice: Optional[tuple] = None
    # arbitrary checkpoint-side reshape/reorder applied after hf_slice,
    # before transpose (bloom's per-head-interleaved qkv, falcon's fused
    # layouts); (np.ndarray, ModelConfig) -> np.ndarray
    hf_transform: Optional[Callable] = None


def _llama_family_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """Shared spec table for the llama-architecture family: llama 1/2/3,
    qwen2 (qkv bias), qwen3 (qk norm), mistral, and their MoE variants.

    Reference name maps: rtp_llm/models/llama_weight.py, qwen_v2_weight.py.
    """
    has_bias = cfg.attention_bias
    qk_norm = cfg.use_qk_norm
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("input_norm", "model.layers.{l}.input_layernorm.weight", per_layer=True),
        WeightSpec(
            "post_attn_norm",
            "model.layers.{l}.post_attention_layernorm.weight",
            per_layer=True,
            # cohere's parallel-residual layers have no post-attn norm
            when=lambda c: not c.parallel_residual,
        ),
        WeightSpec(
            "q_proj", "model.layers.{l}.self_attn.q_proj.weight",
            per_layer=True, transpose=True, shard_axis="out",
        ),
        WeightSpec(
            "k_proj", "model.layers.{l}.self_attn.k_proj.weight",
            per_layer=True, transpose=True, shard_axis="out",
        ),
        WeightSpec(
            "v_proj", "model.layers.{l}.self_attn.v_proj.weight",
            per_layer=True, transpose=True, shard_axis="out",
        ),
        WeightSpec(
            "o_proj", "model.layers.{l}.self_attn.o_proj.weight",
            per_layer=True, transpose=True, shard_axis="in",
        ),
    ]
    if not cfg.tie_word_embeddings:
        specs.append(WeightSpec("lm_head", "lm_head.weight", transpose=True, shard_axis="out"))
    if has_bias:
        specs += [
            WeightSpec("q_bias", "model.layers.{l}.self_attn.q_proj.bias",
                       per_layer=True, shard_axis="out"),
            WeightSpec("k_bias", "model.layers.{l}.self_attn.k_proj.bias",
                       per_layer=True, shard_axis="out"),
            WeightSpec("v_bias", "model.layers.{l}.self_attn.v_proj.bias",
                       per_layer=True, shard_axis="out"),
            # internlm v1 carries an o_proj bias too (absent elsewhere)
            WeightSpec("o_proj.bias", "model.layers.{l}.self_attn.o_proj.bias",
                       per_layer=True, optional=True,
                       when=lambda c: c.model_type == "internlm"),
        ]
    if qk_norm:
        specs += [
            WeightSpec("q_norm", "model.layers.{l}.self_attn.q_norm.weight", per_layer=True),
            WeightSpec("k_norm", "model.layers.{l}.self_attn.k_norm.weight", per_layer=True),
        ]
    if cfg.sandwich_norms:  # gemma2
        specs += [
            WeightSpec("pre_ffn_norm",
                       "model.layers.{l}.pre_feedforward_layernorm.weight",
                       per_layer=True),
            WeightSpec("post_ffn_norm",
                       "model.layers.{l}.post_feedforward_layernorm.weight",
                       per_layer=True),
        ]

    if cfg.num_experts > 0:
        specs += [
            WeightSpec("router", "model.layers.{l}.mlp.gate.weight",
                       per_layer=True, transpose=True,
                       layers_fn=_moe_layers),
            WeightSpec(
                "moe_gate", "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
                per_layer=True, per_expert=True, transpose=True, shard_axis="expert",
                layers_fn=_moe_layers,
            ),
            WeightSpec(
                "moe_up", "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
                per_layer=True, per_expert=True, transpose=True, shard_axis="expert",
                layers_fn=_moe_layers,
            ),
            WeightSpec(
                "moe_down", "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
                per_layer=True, per_expert=True, transpose=True, shard_axis="expert",
                layers_fn=_moe_layers,
            ),
        ]
        if cfg.num_shared_experts > 0:
            # qwen2-moe style shared expert (+ sigmoid shared-expert gate)
            sh = ("model.layers.{l}.mlp.shared_experts."
                  if cfg.model_type in ("glm4_moe", "deepseek_vl_v2")
                  else "model.layers.{l}.mlp.shared_expert.")
            specs += [
                WeightSpec("shared_gate", sh + "gate_proj.weight",
                           per_layer=True, transpose=True, shard_axis="out",
                           layers_fn=_moe_layers),
                WeightSpec("shared_up", sh + "up_proj.weight",
                           per_layer=True, transpose=True, shard_axis="out",
                           layers_fn=_moe_layers),
                WeightSpec("shared_down", sh + "down_proj.weight",
                           per_layer=True, transpose=True, shard_axis="in",
                           layers_fn=_moe_layers),
                WeightSpec("shared_expert_gate", "model.layers.{l}.mlp.shared_expert_gate.weight",
                           per_layer=True, transpose=True, optional=True,
                           layers_fn=_moe_layers),
            ]
    else:
        specs += [
            WeightSpec("gate_proj", "model.layers.{l}.mlp.gate_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out"),
            WeightSpec("up_proj", "model.layers.{l}.mlp.up_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out"),
            WeightSpec("down_proj", "model.layers.{l}.mlp.down_proj.weight",
                       per_layer=True, transpose=True, shard_axis="in"),
        ]
    if cfg.num_experts > 0 and cfg.first_moe_layer > 0:
        # glm4_moe-style first-K-dense layers keep a plain MLP
        specs += [
            WeightSpec("gate_proj", "model.layers.{l}.mlp.gate_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out",
                       layers_fn=_dense_layers),
            WeightSpec("up_proj", "model.layers.{l}.mlp.up_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out",
                       layers_fn=_dense_layers),
            WeightSpec("down_proj", "model.layers.{l}.mlp.down_proj.weight",
                       per_layer=True, transpose=True, shard_axis="in",
                       layers_fn=_dense_layers),
        ]
    return specs


def _qwen2_vl_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """Qwen2-VL text stack: the llama/qwen2 spec table re-rooted under
    ``model.language_model.`` (transformers >= 4.52 layout; the loader's
    tensor source aliases legacy ``model.layers.*`` checkpoints). The vision
    tower (``model.visual.*``) is consumed by multimodal/vit.py, not the
    canonical weight dict."""
    out = []
    for spec in _llama_family_specs(cfg):
        pat = spec.hf_pattern
        if pat.startswith("model."):
            pat = "model.language_model." + pat[len("model."):]
        out.append(dataclasses.replace(spec, hf_pattern=pat))
    return out


def _qn_full_layers(cfg: ModelConfig) -> list:
    return [i for i, t in enumerate(cfg.layer_types or ()) if t == "full_attention"]


def _qn_linear_layers(cfg: ModelConfig) -> list:
    return [i for i, t in enumerate(cfg.layer_types or ()) if t == "linear_attention"]


def _qwen3_next_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """Qwen3-Next hybrid: gated-DeltaNet linear layers + gated full attention.
    Reference name map: models_py/model_desc/qwen3_next.py; HF
    modeling_qwen3_next. Full-attn weights stack over full_attention layers,
    linear-attn weights over linear_attention layers (layers_fn)."""
    L = "model.layers.{l}."
    A = L + "self_attn."
    X = L + "linear_attn."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        # full-attention layers (q_proj fused [query; gate]: out = Hq*2D)
        WeightSpec("q_proj", A + "q_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_qn_full_layers),
        WeightSpec("k_proj", A + "k_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_qn_full_layers),
        WeightSpec("v_proj", A + "v_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_qn_full_layers),
        WeightSpec("o_proj", A + "o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in", layers_fn=_qn_full_layers),
        WeightSpec("q_norm", A + "q_norm.weight", per_layer=True,
                   layers_fn=_qn_full_layers),
        WeightSpec("k_norm", A + "k_norm.weight", per_layer=True,
                   layers_fn=_qn_full_layers),
        # linear-attention (gated DeltaNet) layers
        WeightSpec("la_qkvz", X + "in_proj_qkvz.weight", per_layer=True,
                   transpose=True, layers_fn=_qn_linear_layers),
        WeightSpec("la_ba", X + "in_proj_ba.weight", per_layer=True,
                   transpose=True, layers_fn=_qn_linear_layers),
        WeightSpec("la_conv", X + "conv1d.weight", per_layer=True,
                   layers_fn=_qn_linear_layers),
        WeightSpec("la_dt_bias", X + "dt_bias", per_layer=True,
                   layers_fn=_qn_linear_layers),
        WeightSpec("la_a_log", X + "A_log", per_layer=True,
                   layers_fn=_qn_linear_layers),
        WeightSpec("la_gate_norm_w", X + "norm.weight", per_layer=True,
                   layers_fn=_qn_linear_layers),
        WeightSpec("la_out_proj", X + "out_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in", layers_fn=_qn_linear_layers),
        WeightSpec("lm_head", "lm_head.weight", transpose=True,
                   shard_axis="out"),
        # sparse MoE with shared expert (qwen2-moe style)
        WeightSpec("router", L + "mlp.gate.weight", per_layer=True,
                   transpose=True, layers_fn=_moe_layers),
        WeightSpec("moe_gate", L + "mlp.experts.{e}.gate_proj.weight",
                   per_layer=True, per_expert=True, transpose=True,
                   shard_axis="expert", layers_fn=_moe_layers),
        WeightSpec("moe_up", L + "mlp.experts.{e}.up_proj.weight",
                   per_layer=True, per_expert=True, transpose=True,
                   shard_axis="expert", layers_fn=_moe_layers),
        WeightSpec("moe_down", L + "mlp.experts.{e}.down_proj.weight",
                   per_layer=True, per_expert=True, transpose=True,
                   shard_axis="expert", layers_fn=_moe_layers),
        WeightSpec("shared_gate", L + "mlp.shared_expert.gate_proj.weight",
                   per_layer=True, transpose=True, shard_axis="out",
                   layers_fn=_moe_layers),
        WeightSpec("shared_up", L + "mlp.shared_expert.up_proj.weight",
                   per_layer=True, transpose=True, shard_axis="out",
                   layers_fn=_moe_layers),
        WeightSpec("shared_down", L + "mlp.shared_expert.down_proj.weight",
                   per_layer=True, transpose=True, shard_axis="in",
                   layers_fn=_moe_layers),
        WeightSpec("shared_expert_gate", L + "mlp.shared_expert_gate.weight",
                   per_layer=True, transpose=True, optional=True,
                   layers_fn=_moe_layers),
    ]
    dense = _dense_layers(cfg)
    if dense:
        specs += [
            WeightSpec("gate_proj", L + "mlp.gate_proj.weight", per_layer=True,
                       transpose=True, shard_axis="out", layers_fn=_dense_layers),
            WeightSpec("up_proj", L + "mlp.up_proj.weight", per_layer=True,
                       transpose=True, shard_axis="out", layers_fn=_dense_layers),
            WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                       transpose=True, shard_axis="in", layers_fn=_dense_layers),
        ]
    return specs


def _dense_layers(cfg: ModelConfig) -> list:
    return [i for i in range(cfg.num_layers) if not cfg.is_moe_layer(i)]


def _moe_layers(cfg: ModelConfig) -> list:
    return [i for i in range(cfg.num_layers) if cfg.is_moe_layer(i)]


def _deepseek_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """DeepSeek V2/V3 (MLA + first-K-dense MoE). Reference name maps:
    rtp_llm/models/deepseek_v2_weight.py; HF modeling_deepseek_v3."""
    L = "model.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("lm_head", "lm_head.weight", transpose=True, shard_axis="out"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        # MLA
        WeightSpec("kv_a_proj", L + "self_attn.kv_a_proj_with_mqa.weight",
                   per_layer=True, transpose=True),
        WeightSpec("kv_a_norm", L + "self_attn.kv_a_layernorm.weight",
                   per_layer=True),
        WeightSpec("kv_b_proj", L + "self_attn.kv_b_proj.weight",
                   per_layer=True, transpose=True, shard_axis="out"),
        WeightSpec("o_proj", L + "self_attn.o_proj.weight",
                   per_layer=True, transpose=True, shard_axis="in"),
    ]
    if cfg.q_lora_rank > 0:
        specs += [
            WeightSpec("q_a_proj", L + "self_attn.q_a_proj.weight",
                       per_layer=True, transpose=True),
            WeightSpec("q_a_norm", L + "self_attn.q_a_layernorm.weight",
                       per_layer=True),
            WeightSpec("q_b_proj", L + "self_attn.q_b_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out"),
        ]
    else:
        specs.append(
            WeightSpec("q_proj", L + "self_attn.q_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out")
        )
    if cfg.indexer_topk > 0:
        # DeepSeek-V3.2 DSA indexer (reference: deepseek_v2.py:185-239
        # mla_indexer_* names; modules/hybrid/indexer.py)
        specs += [
            WeightSpec("idx_wq_b", L + "self_attn.indexer.wq_b.weight",
                       per_layer=True, transpose=True),
            WeightSpec("idx_wk", L + "self_attn.indexer.wk.weight",
                       per_layer=True, transpose=True),
            WeightSpec("idx_k_norm", L + "self_attn.indexer.k_norm.weight",
                       per_layer=True),
            WeightSpec("idx_k_norm.bias", L + "self_attn.indexer.k_norm.bias",
                       per_layer=True),
            WeightSpec("idx_weights_proj",
                       L + "self_attn.indexer.weights_proj.weight",
                       per_layer=True, transpose=True),
        ]
    # dense MLP on non-MoE layers
    specs += [
        WeightSpec("gate_proj", L + "mlp.gate_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_dense_layers),
        WeightSpec("up_proj", L + "mlp.up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_dense_layers),
        WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in", layers_fn=_dense_layers),
    ]
    if cfg.num_experts > 0:
        specs += [
            WeightSpec("router", L + "mlp.gate.weight", per_layer=True,
                       transpose=True, layers_fn=_moe_layers),
            WeightSpec("moe_gate", L + "mlp.experts.{e}.gate_proj.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
            WeightSpec("moe_up", L + "mlp.experts.{e}.up_proj.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
            WeightSpec("moe_down", L + "mlp.experts.{e}.down_proj.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
        ]
        if cfg.moe_router_bias:
            specs.append(
                WeightSpec("router_bias", L + "mlp.gate.e_score_correction_bias",
                           per_layer=True, layers_fn=_moe_layers)
            )
        if cfg.num_shared_experts > 0:
            specs += [
                WeightSpec("shared_gate", L + "mlp.shared_experts.gate_proj.weight",
                           per_layer=True, transpose=True, shard_axis="out",
                           layers_fn=_moe_layers),
                WeightSpec("shared_up", L + "mlp.shared_experts.up_proj.weight",
                           per_layer=True, transpose=True, shard_axis="out",
                           layers_fn=_moe_layers),
                WeightSpec("shared_down", L + "mlp.shared_experts.down_proj.weight",
                           per_layer=True, transpose=True, shard_axis="in",
                           layers_fn=_moe_layers),
            ]
    return specs


def _deepseek_with_mtp_specs(cfg: ModelConfig) -> list[WeightSpec]:
    specs = _deepseek_specs(cfg)
    if getattr(cfg, "num_nextn_predict_layers", 0) > 0:
        specs += _deepseek_mtp_specs(cfg)
    return specs


def _bert_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """HF bert-base naming (reference: bert embedding family weight maps)."""
    L = "encoder.layer.{l}."

    def t(name, pat, **kw):
        return WeightSpec(name, pat, per_layer=True, **kw)

    return [
        WeightSpec("embed_tokens", "embeddings.word_embeddings.weight"),
        WeightSpec("pos_embed", "embeddings.position_embeddings.weight"),
        WeightSpec("type_embed", "embeddings.token_type_embeddings.weight"),
        WeightSpec("embed_norm", "embeddings.LayerNorm.weight"),
        WeightSpec("embed_norm_bias", "embeddings.LayerNorm.bias"),
        t("q_proj", L + "attention.self.query.weight", transpose=True, shard_axis="out"),
        t("q_bias", L + "attention.self.query.bias", shard_axis="out"),
        t("k_proj", L + "attention.self.key.weight", transpose=True, shard_axis="out"),
        t("k_bias", L + "attention.self.key.bias", shard_axis="out"),
        t("v_proj", L + "attention.self.value.weight", transpose=True, shard_axis="out"),
        t("v_bias", L + "attention.self.value.bias", shard_axis="out"),
        t("o_proj", L + "attention.output.dense.weight", transpose=True, shard_axis="in"),
        t("o_bias", L + "attention.output.dense.bias"),
        t("attn_norm", L + "attention.output.LayerNorm.weight"),
        t("attn_norm_bias", L + "attention.output.LayerNorm.bias"),
        t("up_proj", L + "intermediate.dense.weight", transpose=True, shard_axis="out"),
        t("up_bias", L + "intermediate.dense.bias", shard_axis="out"),
        t("down_proj", L + "output.dense.weight", transpose=True, shard_axis="in"),
        t("down_bias", L + "output.dense.bias"),
        t("mlp_norm", L + "output.LayerNorm.weight"),
        t("mlp_norm_bias", L + "output.LayerNorm.bias"),
        WeightSpec("pooler", "pooler.dense.weight", transpose=True, optional=True),
        WeightSpec("pooler_bias", "pooler.dense.bias", optional=True),
    ]


def _megatron_bert_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """Pre-LN bert (reference: models/megatron_bert_weight.py — attention.ln
    as the pre-attn LN, layer.ln as the pre-MLP LN; HF MegatronBertModel adds
    a final encoder.ln which the canonical map carries as final_norm)."""
    L = "encoder.layer.{l}."

    def t(name, pat, **kw):
        return WeightSpec(name, pat, per_layer=True, **kw)

    return [
        WeightSpec("embed_tokens", "embeddings.word_embeddings.weight"),
        WeightSpec("pos_embed", "embeddings.position_embeddings.weight"),
        WeightSpec("type_embed", "embeddings.token_type_embeddings.weight"),
        # no embeddings.LayerNorm: megatron moves every LN into the layers
        t("attn_norm", L + "attention.ln.weight"),
        t("attn_norm_bias", L + "attention.ln.bias"),
        t("q_proj", L + "attention.self.query.weight", transpose=True, shard_axis="out"),
        t("q_bias", L + "attention.self.query.bias", shard_axis="out"),
        t("k_proj", L + "attention.self.key.weight", transpose=True, shard_axis="out"),
        t("k_bias", L + "attention.self.key.bias", shard_axis="out"),
        t("v_proj", L + "attention.self.value.weight", transpose=True, shard_axis="out"),
        t("v_bias", L + "attention.self.value.bias", shard_axis="out"),
        t("o_proj", L + "attention.output.dense.weight", transpose=True, shard_axis="in"),
        t("o_bias", L + "attention.output.dense.bias"),
        t("mlp_norm", L + "ln.weight"),
        t("mlp_norm_bias", L + "ln.bias"),
        t("up_proj", L + "intermediate.dense.weight", transpose=True, shard_axis="out"),
        t("up_bias", L + "intermediate.dense.bias", shard_axis="out"),
        t("down_proj", L + "output.dense.weight", transpose=True, shard_axis="in"),
        t("down_bias", L + "output.dense.bias"),
        WeightSpec("final_norm", "encoder.ln.weight"),
        WeightSpec("final_norm_bias", "encoder.ln.bias"),
        WeightSpec("pooler", "pooler.dense.weight", transpose=True, optional=True),
        WeightSpec("pooler_bias", "pooler.dense.bias", optional=True),
    ]


def _jina_bert_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """jina-bert-v2 qk-post-norm (reference:
    models/jina_bert/jina_bert_weight.py): no positional embeddings (ALiBi),
    LayerNorm on q/k projections, gated-gelu MLP stored as one fused
    ``up_gated_layer`` = [up | gate] row blocks (the reference slices
    up=block 0, gate=block 1 into ffn_w3/ffn_w1)."""
    L = "encoder.layer.{l}."

    def t(name, pat, **kw):
        return WeightSpec(name, pat, per_layer=True, **kw)

    return [
        WeightSpec("embed_tokens", "embeddings.word_embeddings.weight"),
        WeightSpec("type_embed", "embeddings.token_type_embeddings.weight"),
        WeightSpec("embed_norm", "embeddings.LayerNorm.weight"),
        WeightSpec("embed_norm_bias", "embeddings.LayerNorm.bias"),
        t("q_proj", L + "attention.self.query.weight", transpose=True, shard_axis="out"),
        t("q_bias", L + "attention.self.query.bias", shard_axis="out"),
        t("k_proj", L + "attention.self.key.weight", transpose=True, shard_axis="out"),
        t("k_bias", L + "attention.self.key.bias", shard_axis="out"),
        t("v_proj", L + "attention.self.value.weight", transpose=True, shard_axis="out"),
        t("v_bias", L + "attention.self.value.bias", shard_axis="out"),
        t("q_norm", L + "attention.self.layer_norm_q.weight"),
        t("q_norm_bias", L + "attention.self.layer_norm_q.bias"),
        t("k_norm", L + "attention.self.layer_norm_k.weight"),
        t("k_norm_bias", L + "attention.self.layer_norm_k.bias"),
        t("o_proj", L + "attention.output.dense.weight", transpose=True, shard_axis="in"),
        t("o_bias", L + "attention.output.dense.bias"),
        t("attn_norm", L + "attention.output.LayerNorm.weight"),
        t("attn_norm_bias", L + "attention.output.LayerNorm.bias"),
        t("mlp_pre_norm", L + "layer_norm_1.weight"),
        t("mlp_pre_norm_bias", L + "layer_norm_1.bias"),
        # not TP-shardable on 'out': columns are [up | gate] halves and a
        # column split would straddle the concat boundary
        t("up_gate_proj", L + "mlp.up_gated_layer.weight", transpose=True),
        t("down_proj", L + "mlp.down_layer.weight", transpose=True, shard_axis="in"),
        t("down_bias", L + "mlp.down_layer.bias"),
        t("mlp_norm", L + "layer_norm_2.weight"),
        t("mlp_norm_bias", L + "layer_norm_2.bias"),
    ]


def _mtp_layers(cfg: ModelConfig) -> list:
    return [cfg.num_layers]  # HF stores MTP as layer index num_hidden_layers


def _deepseek_mtp_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """DeepSeek MTP (multi-token prediction) module: an extra MLA+MoE layer at
    HF layer index ``num_hidden_layers`` plus the embed/hidden combiner and a
    shared output head (reference: MTP weight plan, RtpLLMOp.cc:26-98; W.h
    MTP names). Canonical names carry an ``mtp_`` prefix; all optional so
    non-MTP checkpoints load unchanged."""
    M = "model.layers.{l}."
    specs = [
        WeightSpec("mtp_enorm", M + "enorm.weight", per_layer=True,
                   optional=True, layers_fn=_mtp_layers),
        WeightSpec("mtp_hnorm", M + "hnorm.weight", per_layer=True,
                   optional=True, layers_fn=_mtp_layers),
        WeightSpec("mtp_eh_proj", M + "eh_proj.weight", per_layer=True,
                   transpose=True, optional=True, layers_fn=_mtp_layers),
        WeightSpec("mtp_head_norm", M + "shared_head.norm.weight",
                   per_layer=True, optional=True, layers_fn=_mtp_layers),
        WeightSpec("mtp_head", M + "shared_head.head.weight", per_layer=True,
                   transpose=True, optional=True, layers_fn=_mtp_layers),
    ]
    for spec in _deepseek_specs(cfg):
        if not spec.per_layer:
            continue
        specs.append(dataclasses.replace(
            spec, name="mtp_" + spec.name, optional=True,
            layers_fn=_mtp_layers,
        ))
    return specs


def _phi3_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """phi3: llama-like with fused qkv_proj and gate_up_proj checkpoints."""
    L = "model.layers.{l}."
    d = cfg.head_dim
    qd, kvd = cfg.num_attention_heads * d, cfg.num_kv_heads * d
    i = cfg.intermediate_size
    return [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("lm_head", "lm_head.weight", transpose=True, shard_axis="out"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        WeightSpec("q_proj", L + "self_attn.qkv_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(0, qd)),
        WeightSpec("k_proj", L + "self_attn.qkv_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(qd, qd + kvd)),
        WeightSpec("v_proj", L + "self_attn.qkv_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out",
                   hf_slice=(qd + kvd, qd + 2 * kvd)),
        WeightSpec("o_proj", L + "self_attn.o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "mlp.gate_up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(0, i)),
        WeightSpec("up_proj", L + "mlp.gate_up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(i, 2 * i)),
        WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]


def _glm4_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """GLM4: qkv bias, fused gate_up, glm sandwich norms mapped onto the
    canonical sandwich names (post_self_attn->post_attn_norm,
    post_attention->pre_ffn_norm, post_mlp->post_ffn_norm)."""
    L = "model.layers.{l}."
    i = cfg.intermediate_size
    return [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("lm_head", "lm_head.weight", transpose=True, shard_axis="out"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_self_attn_layernorm.weight",
                   per_layer=True),
        WeightSpec("pre_ffn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        WeightSpec("post_ffn_norm", L + "post_mlp_layernorm.weight",
                   per_layer=True),
        WeightSpec("q_proj", L + "self_attn.q_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("k_proj", L + "self_attn.k_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("v_proj", L + "self_attn.v_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("q_bias", L + "self_attn.q_proj.bias", per_layer=True,
                   shard_axis="out", optional=True),
        WeightSpec("k_bias", L + "self_attn.k_proj.bias", per_layer=True,
                   shard_axis="out", optional=True),
        WeightSpec("v_bias", L + "self_attn.v_proj.bias", per_layer=True,
                   shard_axis="out", optional=True),
        WeightSpec("o_proj", L + "self_attn.o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "mlp.gate_up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(0, i)),
        WeightSpec("up_proj", L + "mlp.gate_up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(i, 2 * i)),
        WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]


def _mixtral_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """Mixtral: llama attention + block_sparse_moe (w1=gate, w3=up, w2=down)."""
    base = [s for s in _llama_family_specs(
        dataclasses.replace(cfg, num_experts=0)
    ) if s.name not in ("gate_proj", "up_proj", "down_proj")]
    L = "model.layers.{l}.block_sparse_moe."
    return base + [
        WeightSpec("router", L + "gate.weight", per_layer=True, transpose=True),
        WeightSpec("moe_gate", L + "experts.{e}.w1.weight", per_layer=True,
                   per_expert=True, transpose=True, shard_axis="expert"),
        WeightSpec("moe_up", L + "experts.{e}.w3.weight", per_layer=True,
                   per_expert=True, transpose=True, shard_axis="expert"),
        WeightSpec("moe_down", L + "experts.{e}.w2.weight", per_layer=True,
                   per_expert=True, transpose=True, shard_axis="expert"),
    ]


def _norm_pair(name: str, pattern: str, per_layer=True, when=None):
    """LayerNorm weight + bias spec pair (biased-layernorm families)."""
    return [
        WeightSpec(name, pattern + ".weight", per_layer=per_layer, when=when),
        WeightSpec(name + ".bias", pattern + ".bias", per_layer=per_layer,
                   optional=True, when=when),
    ]


def _starcoder2_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """starcoder2 (reference: rtp_llm starcoder2 registration): llama layout
    with biased layernorms, biased linears, no-gate gelu MLP (c_fc/c_proj ->
    up/down canonical names)."""
    L = "model.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        *_norm_pair("final_norm", "model.norm", per_layer=False),
        *_norm_pair("input_norm", L + "input_layernorm"),
        *_norm_pair("post_attn_norm", L + "post_attention_layernorm"),
    ]
    for nm, axis in (("q_proj", "out"), ("k_proj", "out"), ("v_proj", "out"),
                     ("o_proj", "in")):
        specs.append(WeightSpec(
            nm, L + f"self_attn.{nm}.weight", per_layer=True, transpose=True,
            shard_axis=axis))
        specs.append(WeightSpec(
            nm + ".bias", L + f"self_attn.{nm}.bias", per_layer=True,
            optional=True, shard_axis="out" if axis == "out" else None))
    specs += [
        WeightSpec("up_proj", L + "mlp.c_fc.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj.bias", L + "mlp.c_fc.bias", per_layer=True,
                   optional=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.c_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("down_proj.bias", L + "mlp.c_proj.bias", per_layer=True,
                   optional=True),
    ]
    if not cfg.tie_word_embeddings:
        specs.append(WeightSpec("lm_head", "lm_head.weight", transpose=True,
                                shard_axis="out"))
    return specs


def _baichuan_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """baichuan 7B/13B: llama layout with a fused W_pack qkv ([3H, H] equal
    thirds); 13B replaces RoPE with ALiBi (model_config sets use_alibi)."""
    h = cfg.hidden_size
    L = "model.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        WeightSpec("q_proj", L + "self_attn.W_pack.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(0, h)),
        WeightSpec("k_proj", L + "self_attn.W_pack.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(h, 2 * h)),
        WeightSpec("v_proj", L + "self_attn.W_pack.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(2 * h, 3 * h)),
        WeightSpec("o_proj", L + "self_attn.o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "mlp.gate_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj", L + "mlp.up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]
    if not cfg.tie_word_embeddings:
        specs.append(WeightSpec("lm_head", "lm_head.weight", transpose=True,
                                shard_axis="out"))
    return specs


def _bloom_split_qkv(which: int):
    """bloom fuses qkv per head: [n_heads, 3, d, H] interleaved."""
    def f(t, cfg):
        d = cfg.head_dim
        n = cfg.num_attention_heads
        if t.ndim == 2:  # weight [3*n*d, H]
            return t.reshape(n, 3, d, t.shape[-1])[:, which].reshape(
                n * d, t.shape[-1])
        return t.reshape(n, 3, d)[:, which].reshape(n * d)  # bias
    return f


def _bloom_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """bloom: ALiBi, biased layernorms (incl. word-embedding layernorm),
    per-head-interleaved fused qkv, no-gate gelu MLP."""
    L = "h.{l}."
    specs = [
        WeightSpec("embed_tokens", "word_embeddings.weight"),
        *_norm_pair("embed_norm", "word_embeddings_layernorm",
                    per_layer=False),
        *_norm_pair("final_norm", "ln_f", per_layer=False),
        *_norm_pair("input_norm", L + "input_layernorm"),
        *_norm_pair("post_attn_norm", L + "post_attention_layernorm"),
        WeightSpec("o_proj", L + "self_attention.dense.weight",
                   per_layer=True, transpose=True, shard_axis="in"),
        WeightSpec("o_proj.bias", L + "self_attention.dense.bias",
                   per_layer=True, optional=True),
        WeightSpec("up_proj", L + "mlp.dense_h_to_4h.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj.bias", L + "mlp.dense_h_to_4h.bias",
                   per_layer=True, optional=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.dense_4h_to_h.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("down_proj.bias", L + "mlp.dense_4h_to_h.bias",
                   per_layer=True, optional=True),
    ]
    for i, nm in enumerate(("q_proj", "k_proj", "v_proj")):
        specs.append(WeightSpec(
            nm, L + "self_attention.query_key_value.weight", per_layer=True,
            transpose=True, shard_axis="out",
            hf_transform=_bloom_split_qkv(i)))
        specs.append(WeightSpec(
            nm + ".bias", L + "self_attention.query_key_value.bias",
            per_layer=True, optional=True, shard_axis="out",
            hf_transform=_bloom_split_qkv(i)))
    return specs


def _falcon_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """falcon 7B (multi_query + parallel attn/mlp): fused qkv is
    [q(all heads); k; v] contiguous, single input layernorm feeds both
    branches (parallel_residual path)."""
    h, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_kv_heads
    L = "transformer.h.{l}."
    specs = [
        WeightSpec("embed_tokens", "transformer.word_embeddings.weight"),
        *_norm_pair("final_norm", "transformer.ln_f", per_layer=False),
        *_norm_pair("input_norm", L + "input_layernorm"),
        *_norm_pair("post_attn_norm", L + "post_attention_layernorm",
                    when=lambda c: not c.parallel_residual),
        WeightSpec("q_proj", L + "self_attention.query_key_value.weight",
                   per_layer=True, transpose=True, shard_axis="out",
                   hf_slice=(0, hq * d)),
        WeightSpec("k_proj", L + "self_attention.query_key_value.weight",
                   per_layer=True, transpose=True,
                   hf_slice=(hq * d, hq * d + hkv * d)),
        WeightSpec("v_proj", L + "self_attention.query_key_value.weight",
                   per_layer=True, transpose=True,
                   hf_slice=(hq * d + hkv * d, hq * d + 2 * hkv * d)),
        WeightSpec("o_proj", L + "self_attention.dense.weight",
                   per_layer=True, transpose=True, shard_axis="in"),
        WeightSpec("up_proj", L + "mlp.dense_h_to_4h.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.dense_4h_to_h.weight",
                   per_layer=True, transpose=True, shard_axis="in"),
        WeightSpec("lm_head", "lm_head.weight", transpose=True,
                   shard_axis="out", optional=True),
    ]
    return specs




def _llava_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """llava: the language model is a llama-family checkpoint under the
    ``language_model.`` prefix (reference: rtp_llm/models/llava.py weight
    map); the CLIP tower + projector load separately in
    multimodal/clip_jax.py."""
    return [dataclasses.replace(sp, hf_pattern="language_model." + sp.hf_pattern)
            for sp in _llama_family_specs(cfg)]


def _qwen3_vl_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """qwen3_vl: qwen3 LM under the ``model.language_model.`` prefix
    (lm_head stays at root); the vision tower + deepstack mergers load in
    multimodal/vit_jax.Qwen3VisionTower."""
    out = []
    for sp in _llama_family_specs(cfg):
        pat = sp.hf_pattern
        if pat.startswith("model."):
            pat = "model.language_model." + pat[len("model."):]
        out.append(dataclasses.replace(sp, hf_pattern=pat))
    return out


def _kimi_full_layers(cfg: ModelConfig) -> list:
    return [i for i, t in enumerate(cfg.layer_types or ())
            if t == "full_attention"]


def _kimi_linear_layers(cfg: ModelConfig) -> list:
    return [i for i, t in enumerate(cfg.layer_types or ())
            if t == "linear_attention"]


def _kimi_linear_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """kimi_linear (reference: rtp_llm/models/kimi_linear/
    kimi_linear_weight.py): MLA weights on full-attention layers, KDA
    (q/k/v + short convs + LoRA forget/output gates + A_log/dt_bias) on
    linear layers, block_sparse_moe deepseek-style MoE."""
    L = "model.layers.{l}."
    A = L + "self_attn."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        # ---- MLA (full-attention layers only) ----
        WeightSpec("kv_a_proj", A + "kv_a_proj_with_mqa.weight",
                   per_layer=True, transpose=True, layers_fn=_kimi_full_layers),
        WeightSpec("kv_a_norm", A + "kv_a_layernorm.weight",
                   per_layer=True, layers_fn=_kimi_full_layers),
        WeightSpec("kv_b_proj", A + "kv_b_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out",
                   layers_fn=_kimi_full_layers),
        WeightSpec("o_proj", A + "o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in",
                   layers_fn=_kimi_full_layers),
        # ---- KDA (linear layers only) ----
        WeightSpec("kda_q", A + "q_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out",
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_k", A + "k_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out",
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_v", A + "v_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out",
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_beta", A + "b_proj.weight", per_layer=True,
                   transpose=True, layers_fn=_kimi_linear_layers),
        WeightSpec("kda_f_a", A + "f_a_proj.weight", per_layer=True,
                   transpose=True, layers_fn=_kimi_linear_layers),
        WeightSpec("kda_f_b", A + "f_b_proj.weight", per_layer=True,
                   transpose=True, layers_fn=_kimi_linear_layers),
        WeightSpec("kda_g_a", A + "g_a_proj.weight", per_layer=True,
                   transpose=True, layers_fn=_kimi_linear_layers),
        WeightSpec("kda_g_b", A + "g_b_proj.weight", per_layer=True,
                   transpose=True, layers_fn=_kimi_linear_layers),
        WeightSpec("kda_conv_q", A + "q_conv1d.weight", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_conv_k", A + "k_conv1d.weight", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_conv_v", A + "v_conv1d.weight", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_o_norm", A + "o_norm.weight", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_dt_bias", A + "dt_bias", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_a_log", A + "A_log", per_layer=True,
                   layers_fn=_kimi_linear_layers),
        WeightSpec("kda_o", A + "o_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in",
                   layers_fn=_kimi_linear_layers),
    ]
    if cfg.q_lora_rank > 0:
        specs += [
            WeightSpec("q_a_proj", A + "q_a_proj.weight", per_layer=True,
                       transpose=True, layers_fn=_kimi_full_layers),
            WeightSpec("q_a_norm", A + "q_a_layernorm.weight",
                       per_layer=True, layers_fn=_kimi_full_layers),
            WeightSpec("q_b_proj", A + "q_b_proj.weight", per_layer=True,
                       transpose=True, shard_axis="out",
                       layers_fn=_kimi_full_layers),
        ]
    else:
        specs.append(WeightSpec("q_proj", A + "q_proj.weight", per_layer=True,
                                transpose=True, shard_axis="out",
                                layers_fn=_kimi_full_layers))
    if not cfg.tie_word_embeddings:
        specs.append(WeightSpec("lm_head", "lm_head.weight", transpose=True,
                                shard_axis="out"))
    specs += [
        WeightSpec("gate_proj", L + "mlp.gate_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_dense_layers),
        WeightSpec("up_proj", L + "mlp.up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out", layers_fn=_dense_layers),
        WeightSpec("down_proj", L + "mlp.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in", layers_fn=_dense_layers),
    ]
    if cfg.num_experts > 0:
        M = L + "block_sparse_moe."
        specs += [
            WeightSpec("router", M + "gate.weight", per_layer=True,
                       transpose=True, layers_fn=_moe_layers),
            WeightSpec("router_bias", M + "gate.e_score_correction_bias",
                       per_layer=True, layers_fn=_moe_layers),
            WeightSpec("moe_gate", M + "experts.{e}.w1.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
            WeightSpec("moe_up", M + "experts.{e}.w3.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
            WeightSpec("moe_down", M + "experts.{e}.w2.weight",
                       per_layer=True, per_expert=True, transpose=True,
                       shard_axis="expert", layers_fn=_moe_layers),
            WeightSpec("shared_gate", M + "shared_experts.gate_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out",
                       layers_fn=_moe_layers),
            WeightSpec("shared_up", M + "shared_experts.up_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out",
                       layers_fn=_moe_layers),
            WeightSpec("shared_down", M + "shared_experts.down_proj.weight",
                       per_layer=True, transpose=True, shard_axis="in",
                       layers_fn=_moe_layers),
        ]
    return specs


def _neox_split_qkv(which: int):
    """gpt_neox fused query_key_value is per-head interleaved [h, 3, d]
    along the out dim (reference: gpt_neox_weight.py qkv split)."""

    def f(t, cfg):
        h, d = cfg.num_attention_heads, cfg.head_dim
        return t.reshape(h, 3, d, *t.shape[1:])[:, which].reshape(
            h * d, *t.shape[1:])

    return f


def _internlm2_split_qkv(which: int):
    """internlm2 fused wqkv groups rows per kv-head: [Hkv, g+2, d] where
    the first g slots are that group's query heads, then one k, one v
    (reference: rtp_llm internlm2 weight map)."""

    def f(t, cfg):
        hkv = cfg.num_kv_heads
        g = cfg.num_attention_heads // hkv
        d = cfg.head_dim
        t2 = t.reshape(hkv, g + 2, d, *t.shape[1:])
        sel = (t2[:, :g] if which == 0
               else t2[:, g:g + 1] if which == 1 else t2[:, g + 1:])
        return sel.reshape(-1, *t.shape[1:])

    return f


def _internlm2_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """internlm2 (reference: rtp_llm internlm2 registration): llama math
    with grouped fused wqkv and w1/w3/w2 MLP naming."""
    L = "model.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "model.tok_embeddings.weight"),
        WeightSpec("final_norm", "model.norm.weight"),
        WeightSpec("lm_head", "output.weight", transpose=True,
                   shard_axis="out"),
        WeightSpec("input_norm", L + "attention_norm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "ffn_norm.weight", per_layer=True),
        WeightSpec("o_proj", L + "attention.wo.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "feed_forward.w1.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj", L + "feed_forward.w3.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("down_proj", L + "feed_forward.w2.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]
    for j, n in enumerate(("q", "k", "v")):
        specs.append(
            WeightSpec(f"{n}_proj", L + "attention.wqkv.weight",
                       per_layer=True, transpose=True,
                       shard_axis="out" if n == "q" else None,
                       hf_transform=_internlm2_split_qkv(j)))
    return specs


def _qwen_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """qwen v1 (reference: rtp_llm/models/qwen.py QWenWeight): fused c_attn
    qkv with bias, w2 = swiglu gate / w1 = up in HF QWenMLP."""
    L = "transformer.h.{l}."
    qd = cfg.num_attention_heads * cfg.head_dim
    specs = [
        WeightSpec("embed_tokens", "transformer.wte.weight"),
        WeightSpec("final_norm", "transformer.ln_f.weight"),
        WeightSpec("lm_head", "lm_head.weight", transpose=True,
                   shard_axis="out"),
        WeightSpec("input_norm", L + "ln_1.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "ln_2.weight", per_layer=True),
        WeightSpec("o_proj", L + "attn.c_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "mlp.w2.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj", L + "mlp.w1.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.c_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]
    for j, n in enumerate(("q", "k", "v")):
        specs += [
            WeightSpec(f"{n}_proj", L + "attn.c_attn.weight", per_layer=True,
                       transpose=True, shard_axis="out",
                       hf_slice=(j * qd, (j + 1) * qd)),
            WeightSpec(f"{n}_bias", L + "attn.c_attn.bias", per_layer=True,
                       shard_axis="out", hf_slice=(j * qd, (j + 1) * qd)),
        ]
    return specs


def _gpt_neox_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """gpt_neox (reference: rtp_llm/models/gpt_neox.py): per-head-interleaved
    fused qkv, dual-norm parallel residual, biased layernorms and linears."""
    L = "gpt_neox.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "gpt_neox.embed_in.weight"),
        *_norm_pair("final_norm", "gpt_neox.final_layer_norm",
                    per_layer=False),
        WeightSpec("lm_head", "embed_out.weight", transpose=True,
                   shard_axis="out"),
        *_norm_pair("input_norm", L + "input_layernorm"),
        *_norm_pair("post_attn_norm", L + "post_attention_layernorm"),
        WeightSpec("o_proj", L + "attention.dense.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("o_proj.bias", L + "attention.dense.bias", per_layer=True),
        WeightSpec("up_proj", L + "mlp.dense_h_to_4h.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj.bias", L + "mlp.dense_h_to_4h.bias",
                   per_layer=True, shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.dense_4h_to_h.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("down_proj.bias", L + "mlp.dense_4h_to_h.bias",
                   per_layer=True),
    ]
    for j, n in enumerate(("q", "k", "v")):
        specs += [
            WeightSpec(f"{n}_proj", L + "attention.query_key_value.weight",
                       per_layer=True, transpose=True, shard_axis="out",
                       hf_transform=_neox_split_qkv(j)),
            WeightSpec(f"{n}_bias", L + "attention.query_key_value.bias",
                       per_layer=True, shard_axis="out",
                       hf_transform=_neox_split_qkv(j)),
        ]
    return specs


def _gpt_bigcode_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """gpt_bigcode / starcoder / wizardcoder (reference: starcoder.py): MQA
    fused c_attn ([q | kv] rows), learned wpe positions, biased everything."""
    L = "transformer.h.{l}."
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    cuts = (0, qd, qd + kvd, qd + 2 * kvd)
    specs = [
        WeightSpec("embed_tokens", "transformer.wte.weight"),
        WeightSpec("pos_embed", "transformer.wpe.weight"),
        *_norm_pair("final_norm", "transformer.ln_f", per_layer=False),
        *_norm_pair("input_norm", L + "ln_1"),
        *_norm_pair("post_attn_norm", L + "ln_2"),
        WeightSpec("o_proj", L + "attn.c_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("o_proj.bias", L + "attn.c_proj.bias", per_layer=True),
        WeightSpec("up_proj", L + "mlp.c_fc.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj.bias", L + "mlp.c_fc.bias", per_layer=True,
                   shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.c_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("down_proj.bias", L + "mlp.c_proj.bias", per_layer=True),
    ]
    if not cfg.tie_word_embeddings:
        specs.append(WeightSpec("lm_head", "lm_head.weight", transpose=True,
                                shard_axis="out"))
    for j, n in enumerate(("q", "k", "v")):
        specs += [
            WeightSpec(f"{n}_proj", L + "attn.c_attn.weight", per_layer=True,
                       transpose=True,
                       shard_axis="out" if n == "q" else None,
                       hf_slice=(cuts[j], cuts[j + 1])),
            WeightSpec(f"{n}_bias", L + "attn.c_attn.bias", per_layer=True,
                       shard_axis="out" if n == "q" else None,
                       hf_slice=(cuts[j], cuts[j + 1])),
        ]
    return specs


def _mpt_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """mpt (reference: rtp_llm/models/mpt.py): ALiBi, fused straight-sliced
    Wqkv, unbiased layernorms/linears, tied embeddings."""
    L = "transformer.blocks.{l}."
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    cuts = (0, qd, qd + kvd, qd + 2 * kvd)
    specs = [
        WeightSpec("embed_tokens", "transformer.wte.weight"),
        WeightSpec("final_norm", "transformer.norm_f.weight"),
        WeightSpec("input_norm", L + "norm_1.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "norm_2.weight", per_layer=True),
        WeightSpec("o_proj", L + "attn.out_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("up_proj", L + "ffn.up_proj.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("down_proj", L + "ffn.down_proj.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]
    for j, n in enumerate(("q", "k", "v")):
        specs.append(
            WeightSpec(f"{n}_proj", L + "attn.Wqkv.weight", per_layer=True,
                       transpose=True,
                       shard_axis="out" if n == "q" else None,
                       hf_slice=(cuts[j], cuts[j + 1])))
    return specs


def _phi_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """phi-1/2 (reference: rtp_llm/models/phi.py): shared-norm parallel
    residual, partial neox rotary, biased linears incl. lm_head."""
    L = "model.layers.{l}."
    specs = [
        WeightSpec("embed_tokens", "model.embed_tokens.weight"),
        *_norm_pair("final_norm", "model.final_layernorm", per_layer=False),
        WeightSpec("lm_head", "lm_head.weight", transpose=True,
                   shard_axis="out"),
        WeightSpec("lm_head.bias", "lm_head.bias"),
        *_norm_pair("input_norm", L + "input_layernorm"),
        WeightSpec("o_proj", L + "self_attn.dense.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("o_proj.bias", L + "self_attn.dense.bias", per_layer=True),
        WeightSpec("up_proj", L + "mlp.fc1.weight", per_layer=True,
                   transpose=True, shard_axis="out"),
        WeightSpec("up_proj.bias", L + "mlp.fc1.bias", per_layer=True,
                   shard_axis="out"),
        WeightSpec("down_proj", L + "mlp.fc2.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("down_proj.bias", L + "mlp.fc2.bias", per_layer=True),
    ]
    for n in ("q", "k", "v"):
        specs += [
            WeightSpec(f"{n}_proj", L + f"self_attn.{n}_proj.weight",
                       per_layer=True, transpose=True, shard_axis="out"),
            WeightSpec(f"{n}_bias", L + f"self_attn.{n}_proj.bias",
                       per_layer=True, shard_axis="out"),
        ]
    return specs


def _chatglm_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """chatglm2/3 (reference: chat_glm_v2.py / chat_glm_v3.py): GQA fused
    query_key_value with bias, fused swiglu dense_h_to_4h ([gate | up])."""
    L = "transformer.encoder.layers.{l}."
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    cuts = (0, qd, qd + kvd, qd + 2 * kvd)
    i = cfg.intermediate_size
    specs = [
        WeightSpec("embed_tokens",
                   "transformer.embedding.word_embeddings.weight"),
        WeightSpec("final_norm", "transformer.encoder.final_layernorm.weight"),
        WeightSpec("lm_head", "transformer.output_layer.weight",
                   transpose=True, shard_axis="out"),
        WeightSpec("input_norm", L + "input_layernorm.weight", per_layer=True),
        WeightSpec("post_attn_norm", L + "post_attention_layernorm.weight",
                   per_layer=True),
        WeightSpec("o_proj", L + "self_attention.dense.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
        WeightSpec("gate_proj", L + "mlp.dense_h_to_4h.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(0, i)),
        WeightSpec("up_proj", L + "mlp.dense_h_to_4h.weight", per_layer=True,
                   transpose=True, shard_axis="out", hf_slice=(i, 2 * i)),
        WeightSpec("down_proj", L + "mlp.dense_4h_to_h.weight", per_layer=True,
                   transpose=True, shard_axis="in"),
    ]
    for j, n in enumerate(("q", "k", "v")):
        specs.append(
            WeightSpec(f"{n}_proj", L + "self_attention.query_key_value.weight",
                       per_layer=True, transpose=True,
                       shard_axis="out" if n == "q" else None,
                       hf_slice=(cuts[j], cuts[j + 1])))
        if cfg.attention_bias:
            specs.append(
                WeightSpec(f"{n}_bias",
                           L + "self_attention.query_key_value.bias",
                           per_layer=True,
                           shard_axis="out" if n == "q" else None,
                           hf_slice=(cuts[j], cuts[j + 1])))
    return specs


def _deepseek_vl2_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """DeepSeek-VL2 language trunk (reference:
    models/deepseek_vl2/deepseek_vl2_weight.py): deepseek-MoE under a
    ``language.`` checkpoint prefix — MLA attention for small/base
    (kv_lora_rank set, deepseek_vl2_weight.py:38), llama-style MHA for
    tiny. The vision tower and projector load separately
    (multimodal/deepseek_vl2_jax.py)."""
    import dataclasses as _dc

    if cfg.kv_lora_rank > 0:
        base = _deepseek_specs(cfg)
    else:
        base = _llama_family_specs(cfg)
        if cfg.num_experts > 0:
            base = base + [WeightSpec(
                "router_bias",
                "model.layers.{l}.mlp.gate.e_score_correction_bias",
                per_layer=True, layers_fn=_moe_layers, optional=True)]
    return [_dc.replace(sp, hf_pattern="language." + sp.hf_pattern)
            for sp in base]


def _glm4_moe_specs(cfg: ModelConfig) -> list[WeightSpec]:
    """glm4_moe / GLM-4.5 (reference: glm4_moe.py): llama-style attention
    names + deepseek-v3-style routed MoE with e_score_correction_bias."""
    return _llama_family_specs(cfg) + [
        WeightSpec("router_bias",
                   "model.layers.{l}.mlp.gate.e_score_correction_bias",
                   per_layer=True, layers_fn=_moe_layers),
    ]


_FAMILY_BUILDERS: dict[str, Callable[[ModelConfig], list[WeightSpec]]] = {
    "llama": _llama_family_specs,
    "mixtral": _mixtral_specs,
    "glm4": _glm4_specs,
    "cohere": _llama_family_specs,
    "gemma": _llama_family_specs,
    "gemma2": _llama_family_specs,
    "phi3": _phi3_specs,
    "mistral": _llama_family_specs,
    "qwen2": _llama_family_specs,
    "qwen3": _llama_family_specs,
    "qwen2_moe": _llama_family_specs,
    "qwen3_moe": _llama_family_specs,
    "qwen3_next": _qwen3_next_specs,
    "qwen2_vl": _qwen2_vl_specs,
    "qwen2_5_vl": _qwen2_vl_specs,
    "qwen3_vl": _qwen3_vl_specs,
    "qwen3_vl_moe": _qwen3_vl_specs,
    "deepseek_v2": _deepseek_with_mtp_specs,
    "deepseek_vl_v2": _deepseek_vl2_specs,
    "deepseek_v3": _deepseek_with_mtp_specs,
    "bert": _bert_specs,
    "roberta": _bert_specs,  # same layout; names may carry a roberta. prefix
    "megatron_bert": _megatron_bert_specs,
    "jina_bert_code": _jina_bert_specs,
    "internlm": _llama_family_specs,
    "internlm2": _internlm2_specs,
    "yi": _llama_family_specs,
    "baichuan": _baichuan_specs,
    "baichuan2": _baichuan_specs,
    "starcoder2": _starcoder2_specs,
    "bloom": _bloom_specs,
    "falcon": _falcon_specs,
    "qwen": _qwen_specs,
    "qwen_vl": _qwen_specs,  # LLM trunk; the visual tower loads separately
    "qwen_7b": _qwen_specs,
    "qwen_13b": _qwen_specs,
    "qwen_1b8": _qwen_specs,
    "gpt_neox": _gpt_neox_specs,
    "gpt_bigcode": _gpt_bigcode_specs,
    "starcoder": _gpt_bigcode_specs,
    "wizardcoder": _gpt_bigcode_specs,
    "mpt": _mpt_specs,
    "phi": _phi_specs,
    "chatglm": _chatglm_specs,
    "chatglm4v": _chatglm_specs,  # LLM trunk; EVA2-CLIP tower loads separately
    "chat_glm_2": _chatglm_specs,
    "chat_glm_3": _chatglm_specs,
    "chatglm2": _chatglm_specs,
    "chatglm3": _chatglm_specs,
    "glm4_moe": _glm4_moe_specs,
    "kimi_linear": _kimi_linear_specs,
    "llava": _llava_specs,
    "qwen2_audio": _llava_specs,
    "aquila": _llama_family_specs,
    "xverse": _llama_family_specs,
    "kimi_k2": _deepseek_with_mtp_specs,
    "kimi_k25": _deepseek_with_mtp_specs,
    "deepseek_v31": _deepseek_with_mtp_specs,
    "deepseek_v32": _deepseek_with_mtp_specs,
    "qwen3_coder_moe": _llama_family_specs,
    "qwen35_dense": _llama_family_specs,
    "qwen35_moe": _llama_family_specs,
}


from rtp_llm_tpu.config.model_config import REFERENCE_TYPE_ALIASES as _REF_ALIASES

for _alias, _target in _REF_ALIASES.items():
    if _target in _FAMILY_BUILDERS:
        _FAMILY_BUILDERS[_alias] = _FAMILY_BUILDERS[_target]


def register_weight_specs(model_type: str, builder: Callable[[ModelConfig], list[WeightSpec]]):
    """Registry hook mirroring the reference's register_model
    (rtp_llm/model_factory_register.py)."""
    _FAMILY_BUILDERS[model_type] = builder


def get_weight_specs(cfg: ModelConfig) -> list[WeightSpec]:
    try:
        builder = _FAMILY_BUILDERS[cfg.model_type]
    except KeyError:
        raise ValueError(
            f"no weight map registered for model_type={cfg.model_type!r}; "
            f"known: {sorted(_FAMILY_BUILDERS)}"
        ) from None
    specs = builder(cfg)
    return [s for s in specs if s.when is None or s.when(cfg)]


_LAYER_RE = re.compile(r"\{l\}")
_EXPERT_RE = re.compile(r"\{e\}")


def hf_names_for(spec: WeightSpec, num_layers: int, num_experts: int,
                 cfg: Optional[ModelConfig] = None):
    """Enumerate the concrete HF tensor names a spec expands to, as
    (layer, expert, hf_name) tuples (layer/expert are -1 when not applicable)."""
    out = []
    if spec.per_layer and spec.layers_fn is not None and cfg is not None:
        layers = list(spec.layers_fn(cfg))
    else:
        layers = range(num_layers) if spec.per_layer else [-1]
    experts = range(num_experts) if spec.per_expert else [-1]
    for l in layers:
        for e in experts:
            name = spec.hf_pattern
            if l >= 0:
                name = _LAYER_RE.sub(str(l), name)
            if e >= 0:
                name = _EXPERT_RE.sub(str(e), name)
            out.append((l, e, name))
    return out
