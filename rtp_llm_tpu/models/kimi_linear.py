"""Kimi-Linear: hybrid KDA (Kimi Delta Attention) + MLA full-attention model.

Reference analog: rtp_llm/models/kimi_linear/kimi_linear.py (config
derivation), models_py/model_desc/kimi_linear.py (layer math) and the
triton_kernels/kimi_kda kernels. TPU-native re-design mirrors qwen3_next's
hybrid pattern (models/qwen3_next.py):

  * MLA full-attention layers use the paged latent-row pool (only those
    layers appear in the ``kv`` cache leaf; absorbed-MLA math shared with
    DeepseekModel._mla_attn);
  * KDA layers carry per-decode-slot state (conv tail + [H, Dk, Dv]
    recurrent state) addressed by ``ModelInputs.state_slots``;
  * the KDA recurrence is a ``lax.scan`` shared by prefill and decode
    (ops/linear_attention.kda_rule) — per-key-channel diagonal decay from
    a LoRA forget gate, sigmoid-gated per-head output RMSNorm;
  * MoE is deepseek-v3-style sigmoid routing with e_score_correction_bias
    (``block_sparse_moe`` checkpoint naming).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.batch import ModelInputs, ModelOutputs
from rtp_llm_tpu.models.deepseek import DeepseekModel
from rtp_llm_tpu.ops.kv_cache import token_slots
from rtp_llm_tpu.ops.linear_attention import (
    causal_conv1d, kda_gate, kda_rule, l2norm, rms_norm_gated,
)
from rtp_llm_tpu.ops.norms import rms_norm


class KimiLinearModel(DeepseekModel):
    is_hybrid = True  # engine: per-slot state, no prefix cache/beam/spec
    supports_deferred_kv = False

    def __init__(self, cfg: ModelConfig):
        super().__init__(cfg)
        lt = cfg.layer_types or ()
        self.full_layers = [i for i, t in enumerate(lt)
                            if t == "full_attention"]
        self.linear_layers = [i for i, t in enumerate(lt)
                              if t == "linear_attention"]
        self._full_pos = {l: i for i, l in enumerate(self.full_layers)}
        self._lin_pos = {l: i for i, l in enumerate(self.linear_layers)}
        # merged conv channels: concat(q, k, v) — equal head counts/dims
        self.conv_dim = (
            2 * cfg.linear_num_key_heads * cfg.linear_key_head_dim
            + cfg.linear_num_value_heads * cfg.linear_value_head_dim
        )

    # ---- cache: paged MLA latents for full layers + per-slot KDA state ----

    def cache_shape(self, num_blocks: int, block_size: int) -> tuple:
        return (len(self.full_layers), 1, num_blocks * block_size, self.lanes)

    def init_cache(self, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
                   max_slots: int = 64):
        if jnp.dtype(dtype) == jnp.int8:
            raise NotImplementedError("int8 KV unsupported for MLA latents")
        self.block_size = block_size
        c = self.cfg
        k = c.linear_conv_kernel_dim
        return {
            "kv": jnp.zeros(self.cache_shape(num_blocks, block_size), dtype),
            "conv": jnp.zeros(
                (len(self.linear_layers), max_slots, k - 1, self.conv_dim),
                jnp.float32 if jnp.dtype(dtype) == jnp.float32
                else jnp.bfloat16,
            ),
            "rec": jnp.zeros(
                (len(self.linear_layers), max_slots,
                 c.linear_num_value_heads, c.linear_key_head_dim,
                 c.linear_value_head_dim),
                jnp.float32,
            ),
        }

    # ---- forward ----

    def forward(self, weights, cache, inputs: ModelInputs,
                need_all_logits=False, need_all_hidden=False):
        cfg = self.cfg
        b, t = inputs.tokens.shape
        x = jnp.take(weights["embed_tokens"], inputs.tokens, axis=0)

        valid = (inputs.q_offsets[:, None]
                 + jnp.arange(t, dtype=jnp.int32)[None, :]
                 ) < inputs.kv_lens[:, None]
        slots = token_slots(
            inputs.positions, inputs.block_tables, self.block_size, valid
        ).reshape(-1)
        state_slots = (
            inputs.state_slots if inputs.state_slots is not None
            else jnp.arange(b, dtype=jnp.int32)
        )
        t_real = jnp.maximum(inputs.kv_lens - inputs.q_offsets, 0)
        fresh = inputs.q_offsets == 0  # position-0 chunk resets linear state

        for i in range(cfg.num_layers):
            res = x
            h = rms_norm(x, weights["input_norm"][i], cfg.rms_norm_eps)
            if i in self._lin_pos:
                h, cache = self._kda_attn(
                    weights, cache, self._lin_pos[i], i, h, state_slots,
                    valid, t_real, fresh,
                )
            else:
                fi = self._full_pos[i]  # MLA weights stack over full layers
                h, latent = self._mla_attn(
                    weights, fi, h, inputs, slots, cache["kv"][fi, 0])
                cache = dict(cache)
                cache["kv"] = cache["kv"].at[fi, 0].set(latent)
            x = res + h

            res = x
            h = rms_norm(x, weights["post_attn_norm"][i], cfg.rms_norm_eps)
            p = self._stack_pos(i)
            h = self._moe_mlp(weights, p, h) if cfg.is_moe_layer(i) \
                else self._dense_mlp(weights, p, h)
            x = res + h

        x = rms_norm(x, weights["final_norm"], cfg.rms_norm_eps)
        lm_head = (weights["embed_tokens"].T if cfg.tie_word_embeddings
                   else weights["lm_head"])
        last = jnp.clip(inputs.kv_lens - inputs.q_offsets - 1, 0, t - 1)
        hidden_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = (hidden_last @ lm_head).astype(jnp.float32)
        all_logits = ((x @ lm_head).astype(jnp.float32)
                      if need_all_logits else None)
        return ModelOutputs(
            logits=logits, hidden=hidden_last, all_logits=all_logits,
            all_hidden=x if need_all_hidden else None,
        ), cache

    # ---- KDA layer ----

    def _kda_attn(self, w, cache, li, i, x, state_slots, valid, t_real,
                  fresh):
        """reference: models_py/model_desc/kimi_linear.py:506-513 —
        qkv projections -> merged short conv -> per-channel forget gate
        (f LoRA + A_log/dt_bias) -> KDA recurrence -> sigmoid-gated per-head
        o_norm -> o_proj."""
        cfg = self.cfg
        b, t, _ = x.shape
        hk = cfg.linear_num_key_heads
        hv = cfg.linear_num_value_heads
        dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim

        q = self._linear(w, "kda_q", li, x)
        k = self._linear(w, "kda_k", li, x)
        v = self._linear(w, "kda_v", li, x)
        # forget gate LoRA [B,T,Hv*Dk]; output gate LoRA [B,T,Hv*Dv]
        g_raw = self._linear(w, "kda_f_b", li,
                             self._linear(w, "kda_f_a", li, x))
        gate = self._linear(w, "kda_g_b", li,
                            self._linear(w, "kda_g_a", li, x))
        beta = jax.nn.sigmoid(
            self._linear(w, "kda_beta", li, x).astype(jnp.float32))  # [B,T,Hv]

        mixed = jnp.concatenate([q, k, v], axis=-1)
        mixed = jnp.where(valid[..., None], mixed, 0)
        conv_all = cache["conv"][li]
        conv_in = jnp.where(
            fresh[:, None, None], 0, conv_all[state_slots].astype(mixed.dtype))
        # merged depthwise conv kernel over concat(q|k|v) channels
        # (reference merges q/k/v_conv1d into one tensor at load)
        conv_w = jnp.concatenate(
            [w["kda_conv_q"][li][:, 0, :], w["kda_conv_k"][li][:, 0, :],
             w["kda_conv_v"][li][:, 0, :]], axis=0).T  # [K, C]
        mixed, conv_new = causal_conv1d(mixed, conv_w, conv_in, t_real)
        q = mixed[..., : hk * dk].reshape(b, t, hk, dk)
        k = mixed[..., hk * dk: 2 * hk * dk].reshape(b, t, hk, dk)
        v = mixed[..., 2 * hk * dk:].reshape(b, t, hv, dv)

        q = l2norm(q)
        k = l2norm(k)
        g = kda_gate(g_raw, w["kda_a_log"][li], w["kda_dt_bias"][li])

        rec_all = cache["rec"][li]
        rec_in = jnp.where(fresh[:, None, None, None], 0.0,
                           rec_all[state_slots])
        out, rec_new = kda_rule(q, k, v, g, beta, rec_in, valid)

        cache = dict(cache)
        cache["conv"] = cache["conv"].at[li].set(
            conv_all.at[state_slots].set(conv_new.astype(conv_all.dtype)))
        cache["rec"] = cache["rec"].at[li].set(
            rec_all.at[state_slots].set(rec_new))

        # per-head RMSNorm gated by sigmoid(g_proj) (NOT silu)
        out = rms_norm_gated(out, w["kda_o_norm"][li],
                             gate.reshape(b, t, hv, dv), cfg.rms_norm_eps,
                             activation="sigmoid")
        return self._linear(w, "kda_o", li,
                            out.reshape(b, t, hv * dv).astype(x.dtype)), cache
