"""BERT-family encoder (embedding models).

Reference analog: rtp_llm's bert/megatron-bert/jina-bert embedding families
(models_py/model_desc/bert.py, models/megatron_bert.py,
models/jina_bert/jina_bert.py + models/downstream_modules dense embedding).
Encoder-only: no KV cache, no engine loop — one jitted bidirectional forward
per (bucketed) batch, pooled to sentence embeddings.

Variants (cfg.bert_variant, reference registrations in
rtp_llm/model_factory_register.py):
- "bert":     post-LN (HF BertModel semantics).
- "megatron": pre-LN — no embedding LayerNorm, per-layer `attention.ln` /
  `ln` applied *before* attention / MLP, final `encoder.ln`
  (reference: models/megatron_bert.py `layernorm_type=pre_layernorm`,
  `has_pre_decoder_layernorm=False`; HF MegatronBertModel).
- "jina":     jina-bert-v2 qk-post-norm — no positional embeddings
  (symmetric ALiBi instead), LayerNorms on the q/k projections, gated-gelu
  MLP (`up_gated_layer` = [up | gate] halves, gate activated — the
  reference splits gate=slice 1 / up=slice 0,
  models/jina_bert/jina_bert_weight.py slice_index_transepose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.llama_family import alibi_slopes
from rtp_llm_tpu.ops.norms import layer_norm


class BertModel:
    is_encoder_only = True

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.variant = getattr(cfg, "bert_variant", "bert")
        import numpy as _np
        # host numpy: tiny constant, embeds at lowering without device fetch
        self._slopes = (
            _np.asarray(alibi_slopes(cfg.num_attention_heads), _np.float32)
            if cfg.use_alibi else None
        )

    def _attend(self, q, k, v, neg):
        """q/k/v: [B,T,H,D]; neg: additive mask [B,1,1,T] -> [B,T,H*D] f32."""
        b, t, hq, d = q.shape
        s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * (d ** -0.5)
        if self._slopes is not None:
            # Encoder ALiBi is symmetric: bias = -slope * |i - j|
            # (jina-bert; decoder ALiBi in ops/attention/ref.py is causal).
            pos = jnp.arange(t, dtype=jnp.float32)
            dist = jnp.abs(pos[:, None] - pos[None, :])  # [T,T]
            s = s - self._slopes[None, :, None, None] * dist[None, None]
        p = jax.nn.softmax(s + neg, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
        return o.reshape(b, t, hq * d)

    def encode(self, w: dict, tokens: jnp.ndarray, mask: jnp.ndarray,
               token_type_ids=None) -> jnp.ndarray:
        """tokens/mask: [B, T] -> hidden states [B, T, H]."""
        cfg = self.cfg
        eps = cfg.rms_norm_eps
        b, t = tokens.shape
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(tokens)
        x = jnp.take(w["embed_tokens"], tokens, axis=0) \
            + jnp.take(w["type_embed"], tt, axis=0)
        if "pos_embed" in w:  # jina has none (ALiBi)
            if getattr(cfg, "roberta_positions", False):
                # RoBERTa: positions offset past padding_idx, computed from
                # the mask (HF create_position_ids_from_input_ids; reference:
                # models/bert.py Roberta, position_ids_style=1)
                pad = cfg.pad_token_id if cfg.pad_token_id is not None else 1
                pos = (jnp.cumsum(mask.astype(jnp.int32), axis=1) * mask
                       + pad).astype(jnp.int32)
            else:
                pos = jnp.arange(t, dtype=jnp.int32)[None, :]
            x = x + jnp.take(w["pos_embed"], pos, axis=0)
        if "embed_norm" in w:  # megatron defers all LN into the layers
            x = layer_norm(x, w["embed_norm"], w["embed_norm_bias"], eps)

        hq = cfg.num_attention_heads
        d = cfg.hidden_size // hq
        neg = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)  # [B,1,1,T]

        def qkv(y, i):
            q = y @ w["q_proj"][i] + w["q_bias"][i]
            k = y @ w["k_proj"][i] + w["k_bias"][i]
            v = y @ w["v_proj"][i] + w["v_bias"][i]
            if self.variant == "jina":
                # qk post-norm on the full projections (layer_norm_q/k)
                q = layer_norm(q, w["q_norm"][i], w["q_norm_bias"][i], eps)
                k = layer_norm(k, w["k_norm"][i], w["k_norm_bias"][i], eps)
            return (q.reshape(b, t, hq, d), k.reshape(b, t, hq, d),
                    v.reshape(b, t, hq, d))

        for i in range(cfg.num_layers):
            if self.variant == "megatron":
                # HF MegatronBertModel: LN(x) -> attn -> +x; LN -> mlp -> +x
                a = layer_norm(x, w["attn_norm"][i], w["attn_norm_bias"][i], eps)
                o = self._attend(*qkv(a, i), neg).astype(x.dtype)
                x = x + (o @ w["o_proj"][i] + w["o_bias"][i])
                m = layer_norm(x, w["mlp_norm"][i], w["mlp_norm_bias"][i], eps)
                h = jax.nn.gelu(m @ w["up_proj"][i] + w["up_bias"][i],
                                approximate=False)
                x = x + (h @ w["down_proj"][i] + w["down_bias"][i])
            elif self.variant == "jina":
                o = self._attend(*qkv(x, i), neg).astype(x.dtype)
                x = layer_norm(x + (o @ w["o_proj"][i] + w["o_bias"][i]),
                               w["attn_norm"][i], w["attn_norm_bias"][i], eps)
                # gated-gelu MLP: up_gated = [up | gate], gate activated
                m = layer_norm(x, w["mlp_pre_norm"][i],
                               w["mlp_pre_norm_bias"][i], eps)
                ug = m @ w["up_gate_proj"][i]
                up, gate = jnp.split(ug, 2, axis=-1)
                h = up * jax.nn.gelu(gate, approximate=False)
                x = layer_norm(
                    x + (h @ w["down_proj"][i] + w["down_bias"][i]),
                    w["mlp_norm"][i], w["mlp_norm_bias"][i], eps)
            else:  # post-LN bert
                o = self._attend(*qkv(x, i), neg).astype(x.dtype)
                x = layer_norm(x + (o @ w["o_proj"][i] + w["o_bias"][i]),
                               w["attn_norm"][i], w["attn_norm_bias"][i], eps)
                h = jax.nn.gelu(x @ w["up_proj"][i] + w["up_bias"][i],
                                approximate=False)
                x = layer_norm(x + (h @ w["down_proj"][i] + w["down_bias"][i]),
                               w["mlp_norm"][i], w["mlp_norm_bias"][i], eps)
        if "final_norm" in w:  # megatron encoder.ln
            x = layer_norm(x, w["final_norm"], w["final_norm_bias"], eps)
        return x

    def embed(self, w: dict, tokens, mask, pooling: str = "cls") -> jnp.ndarray:
        """[B, H] L2-normalized sentence embeddings (cls | mean pooling)."""
        h = self.encode(w, tokens, mask).astype(jnp.float32)
        if pooling == "mean":
            m = mask.astype(jnp.float32)[:, :, None]
            e = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        else:
            e = h[:, 0]
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
