"""BERT-family encoder (embedding models).

Reference analog: rtp_llm's bert/megatron-bert/jina-bert embedding families
(models_py/model_desc/bert.py + models/downstream_modules dense embedding).
Encoder-only: no KV cache, no engine loop — one jitted bidirectional forward
per (bucketed) batch, pooled to sentence embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.ops.norms import layer_norm


class BertModel:
    is_encoder_only = True

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg

    def encode(self, w: dict, tokens: jnp.ndarray, mask: jnp.ndarray,
               token_type_ids=None) -> jnp.ndarray:
        """tokens/mask: [B, T] -> hidden states [B, T, H]."""
        cfg = self.cfg
        b, t = tokens.shape
        pos = jnp.arange(t, dtype=jnp.int32)[None, :]
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(tokens)
        x = (
            jnp.take(w["embed_tokens"], tokens, axis=0)
            + jnp.take(w["pos_embed"], pos, axis=0)
            + jnp.take(w["type_embed"], tt, axis=0)
        )
        x = layer_norm(x, w["embed_norm"], w["embed_norm_bias"], cfg.rms_norm_eps)

        hq = cfg.num_attention_heads
        d = cfg.hidden_size // hq
        neg = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e30)  # [B,1,1,T]
        for i in range(cfg.num_layers):
            res = x
            q = (x @ w["q_proj"][i] + w["q_bias"][i]).reshape(b, t, hq, d)
            k = (x @ w["k_proj"][i] + w["k_bias"][i]).reshape(b, t, hq, d)
            v = (x @ w["v_proj"][i] + w["v_bias"][i]).reshape(b, t, hq, d)
            s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * (d ** -0.5)
            p = jax.nn.softmax(s + neg, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
            o = o.reshape(b, t, hq * d).astype(x.dtype)
            x = o @ w["o_proj"][i] + w["o_bias"][i]
            x = layer_norm(x + res, w["attn_norm"][i], w["attn_norm_bias"][i],
                           cfg.rms_norm_eps)
            res = x
            h = jax.nn.gelu(x @ w["up_proj"][i] + w["up_bias"][i],
                            approximate=False)
            x = h @ w["down_proj"][i] + w["down_bias"][i]
            x = layer_norm(x + res, w["mlp_norm"][i], w["mlp_norm_bias"][i],
                           cfg.rms_norm_eps)
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
