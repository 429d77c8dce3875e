"""Qwen3-Next: hybrid linear-attention (gated DeltaNet) + full-attention model.

Reference analog: models_py/model_desc/qwen3_next.py (+ kimi_linear.py) with
the FLA triton kernels and LinearAttentionConfig/HybridAttentionConfig
(cpp/config/ConfigModules.h:557,574) and the linear-state cache group
(cpp/cache/ LinearKVCacheGroup). TPU-native re-design:

  * full-attention layers use the standard paged KV pool (pallas/ref paged
    attention) — only those layers appear in the ``kv`` cache leaf;
  * linear-attention layers carry per-decode-slot state tensors (conv tail +
    recurrent delta-rule state) indexed by ``ModelInputs.state_slots`` — the
    engine pre-assigns the slot before prefill so prefill chunks and decode
    steps address the same state row;
  * a chunk starting at position 0 resets the state (fresh or re-prefilled
    stream) — no host-side state clearing needed;
  * the DeltaNet recurrence is a ``lax.scan`` shared by prefill and decode
    (T=1 is a 1-step scan) with fp32 state.

Layer math matches HF transformers Qwen3Next (modeling_qwen3_next.py):
zero-centered (1+w) RMSNorms, gated attention output (q_proj emits
[query; gate] per head), partial neox rope, l2-normed q/k in the delta rule,
gated RMSNorm + out_proj, qwen2-moe style sparse MLP with shared expert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.batch import ModelInputs, ModelOutputs
from rtp_llm_tpu.models.llama_family import LlamaFamilyModel
from rtp_llm_tpu.ops.attention import paged_attention
from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv
from rtp_llm_tpu.ops.linear_attention import (
    causal_conv1d, gated_delta_rule, l2norm, rms_norm_gated,
)
from rtp_llm_tpu.ops.norms import rms_norm
from rtp_llm_tpu.ops.rope import apply_rope_partial_neox


class QwenNextModel(LlamaFamilyModel):
    is_hybrid = True  # engine: per-slot state, no prefix cache/beam/spec
    supports_deferred_kv = False  # hybrid forward manages its own caches

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        lt = cfg.layer_types or ()
        self.full_layers = [i for i, t in enumerate(lt) if t == "full_attention"]
        self.linear_layers = [i for i, t in enumerate(lt) if t == "linear_attention"]
        self._full_pos = {l: i for i, l in enumerate(self.full_layers)}
        self._lin_pos = {l: i for i, l in enumerate(self.linear_layers)}
        self.conv_dim = (
            2 * cfg.linear_num_key_heads * cfg.linear_key_head_dim
            + cfg.linear_num_value_heads * cfg.linear_value_head_dim
        )

    # ---- cache: paged KV for full layers + per-slot linear state ----

    def cache_shape(self, num_blocks: int, block_size: int) -> tuple:
        c = self.cfg
        return (len(self.full_layers), 2, num_blocks * block_size,
                c.num_kv_heads * c.head_dim)

    def init_cache(self, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
                   max_slots: int = 64):
        if jnp.dtype(dtype) == jnp.int8:
            raise NotImplementedError("int8 KV not supported for hybrid models")
        self.block_size = block_size
        c = self.cfg
        k = c.linear_conv_kernel_dim
        return {
            "kv": jnp.zeros(self.cache_shape(num_blocks, block_size), dtype),
            "conv": jnp.zeros(
                (len(self.linear_layers), max_slots, k - 1, self.conv_dim),
                jnp.bfloat16 if jnp.dtype(dtype) != jnp.float32 else jnp.float32,
            ),
            "rec": jnp.zeros(
                (len(self.linear_layers), max_slots, c.linear_num_value_heads,
                 c.linear_key_head_dim, c.linear_value_head_dim),
                jnp.float32,
            ),
        }

    # ---- forward ----

    def forward(self, weights, cache, inputs: ModelInputs,
                need_all_logits=False, need_all_hidden=False):
        cfg = self.cfg
        b, t = inputs.tokens.shape

        x = jnp.take(weights["embed_tokens"], inputs.tokens, axis=0)

        tpos = inputs.positions
        valid = (inputs.q_offsets[:, None]
                 + jnp.arange(t, dtype=jnp.int32)[None, :]
                 ) < inputs.kv_lens[:, None]  # [B,T]
        slots = token_slots(
            tpos, inputs.block_tables, self.block_size, valid
        ).reshape(-1)
        state_slots = (
            inputs.state_slots if inputs.state_slots is not None
            else jnp.arange(b, dtype=jnp.int32)
        )
        t_real = jnp.maximum(inputs.kv_lens - inputs.q_offsets, 0)
        # chunks starting at position 0 reset the linear state
        fresh = inputs.q_offsets == 0

        for i in range(cfg.num_layers):
            res = x
            h = rms_norm(x, weights["input_norm"][i], cfg.rms_norm_eps)
            if i in self._lin_pos:
                h, cache = self._linear_attn(
                    weights, cache, self._lin_pos[i], h, state_slots,
                    valid, t_real, fresh,
                )
            else:
                h, cache = self._full_attn(
                    weights, cache, self._full_pos[i], h, inputs, slots,
                )
            x = res + h

            res = x
            h = rms_norm(x, weights["post_attn_norm"][i], cfg.rms_norm_eps)
            h = self._moe_mlp(weights, i, h) if cfg.is_moe_layer(i) \
                else self._dense_mlp(weights, i, h)
            x = res + h

        x = rms_norm(x, weights["final_norm"], cfg.rms_norm_eps)
        lm_head = (weights["embed_tokens"].T if cfg.tie_word_embeddings
                   else weights["lm_head"])
        last = jnp.clip(inputs.kv_lens - inputs.q_offsets - 1, 0, t - 1)
        hidden_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = (hidden_last @ lm_head).astype(jnp.float32)
        all_logits = (x @ lm_head).astype(jnp.float32) if need_all_logits else None
        return ModelOutputs(
            logits=logits, hidden=hidden_last, all_logits=all_logits,
            all_hidden=x if need_all_hidden else None,
        ), cache

    # ---- full-attention layer (gated output, partial neox rope) ----

    def _full_attn(self, w, cache, fi, x, inputs: ModelInputs, slots):
        cfg = self.cfg
        b, t, _ = x.shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim

        qg = self._linear(w, "q_proj", fi, x).reshape(b, t, hq, 2 * d)
        q, gate = qg[..., :d], qg[..., d:].reshape(b, t, hq * d)
        k = self._linear(w, "k_proj", fi, x).reshape(b, t, hkv, d)
        v = self._linear(w, "v_proj", fi, x).reshape(b, t, hkv, d)
        q = rms_norm(q, w["q_norm"][fi], cfg.rms_norm_eps)
        k = rms_norm(k, w["k_norm"][fi], cfg.rms_norm_eps)
        cos, sin = self._rope_tables(w)
        q = apply_rope_partial_neox(q, inputs.positions, cos, sin,
                                    self.rotary_dim)
        k = apply_rope_partial_neox(k, inputs.positions, cos, sin,
                                    self.rotary_dim)

        k_cache, v_cache = cache["kv"][fi, 0], cache["kv"][fi, 1]
        k_cache, v_cache = write_kv(
            k_cache, v_cache, k.reshape(-1, hkv, d), v.reshape(-1, hkv, d),
            slots,
        )
        cache = dict(cache)
        cache["kv"] = cache["kv"].at[fi, 0].set(k_cache).at[fi, 1].set(v_cache)

        attn = paged_attention(
            q, k_cache, v_cache, inputs.block_tables, inputs.kv_lens,
            inputs.q_offsets, self.sm_scale, block_size=self.block_size,
            backend=self.attn_backend,
        )
        attn = attn.reshape(b, t, hq * d)
        attn = attn * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(attn.dtype)
        return self._linear(w, "o_proj", fi, attn), cache

    # ---- linear-attention layer (gated DeltaNet) ----

    def _linear_attn(self, w, cache, li, x, state_slots, valid, t_real, fresh):
        cfg = self.cfg
        b, t, _ = x.shape
        hk, hv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
        dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
        r = hv // hk

        # HF in_proj_qkvz groups channels per k-head: [q(dk) k(dk) v(r*dv) z(r*dv)]
        qkvz = self._linear(w, "la_qkvz", li, x).reshape(
            b, t, hk, 2 * dk + 2 * r * dv
        )
        q = qkvz[..., :dk]
        k = qkvz[..., dk : 2 * dk]
        v = qkvz[..., 2 * dk : 2 * dk + r * dv].reshape(b, t, hv, dv)
        z = qkvz[..., 2 * dk + r * dv :].reshape(b, t, hv, dv)
        ba = self._linear(w, "la_ba", li, x).reshape(b, t, hk, 2 * r)
        beta = jax.nn.sigmoid(ba[..., :r].reshape(b, t, hv).astype(jnp.float32))
        a = ba[..., r:].reshape(b, t, hv).astype(jnp.float32)
        g = -jnp.exp(w["la_a_log"][li].astype(jnp.float32)) * jax.nn.softplus(
            a + w["la_dt_bias"][li].astype(jnp.float32)
        )

        # depthwise causal conv over concat(q, k, v) channels, slot state
        mixed = jnp.concatenate(
            [q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1)],
            axis=-1,
        )
        mixed = jnp.where(valid[..., None], mixed, 0)  # mask padded rows
        conv_all = cache["conv"][li]  # [S, K-1, C]
        conv_in = jnp.where(
            fresh[:, None, None], 0, conv_all[state_slots].astype(mixed.dtype)
        )
        conv_w = w["la_conv"][li][:, 0, :].T  # [C,1,K] -> [K,C]
        mixed, conv_new = causal_conv1d(mixed, conv_w, conv_in, t_real)
        q = mixed[..., : hk * dk].reshape(b, t, hk, dk)
        k = mixed[..., hk * dk : 2 * hk * dk].reshape(b, t, hk, dk)
        v = mixed[..., 2 * hk * dk :].reshape(b, t, hv, dv)

        q = l2norm(q)
        k = l2norm(k)
        if r > 1:
            q = jnp.repeat(q, r, axis=2)
            k = jnp.repeat(k, r, axis=2)

        rec_all = cache["rec"][li]  # [S, Hv, Dk, Dv]
        rec_in = jnp.where(
            fresh[:, None, None, None], 0.0, rec_all[state_slots]
        )
        out, rec_new = gated_delta_rule(q, k, v, g, beta, rec_in, valid)

        cache = dict(cache)
        cache["conv"] = cache["conv"].at[li].set(
            conv_all.at[state_slots].set(conv_new.astype(conv_all.dtype))
        )
        cache["rec"] = cache["rec"].at[li].set(
            rec_all.at[state_slots].set(rec_new)
        )

        out = rms_norm_gated(out, w["la_gate_norm_w"][li], z, cfg.rms_norm_eps)
        out = out.reshape(b, t, hv * dv).astype(x.dtype)
        return self._linear(w, "la_out_proj", li, out), cache
