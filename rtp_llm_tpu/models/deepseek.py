"""DeepSeek V2/V3 family: MLA attention with a paged latent KV cache.

TPU-native counterpart of the reference's deepseek model descs + MLA kernels
(rtp_llm/models_py/model_desc/ deepseek family, FlashMLA/flashinfer-MLA
backends — attn_factory.py:200 'cuda_mla_impl').

MLA design (the point of the architecture — cache the LATENT, not K/V):
  * per token the cache stores ``[c_kv (kv_lora_rank) ; k_rope (d_rope)]``
    padded to a 128 multiple — one row of the standard [slots, lanes] pool;
  * scores use the absorption identity
        q_nope_h . (W_uk_h c_kv) = (W_uk_h^T q_nope_h) . c_kv
    so the query becomes ``[q_abs (kv_lora) ; q_rope]`` and attention is
    MQA over the latent rows — the SAME paged-attention kernels as the dense
    family (Hkv=1, head_dim = padded lanes), with the latent array passed as
    both K and V (the PV product over the first kv_lora lanes yields
    sum_t p_t c_kv_t);
  * the output context is expanded per head with W_uv afterwards:
        o_h = (sum_t p_t c_kv_t) @ W_uv_h.

Routing (V3): sigmoid scores, e_score_correction_bias added for expert
CHOICE only, group-limited top-k (n_group / topk_group), weights from raw
scores, optional normalization, x routed_scaling_factor — matching HF
DeepseekV3TopkRouter.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.models.batch import ModelInputs, ModelOutputs
from rtp_llm_tpu.ops.attention import paged_attention
from rtp_llm_tpu.ops.kv_cache import token_slots
from rtp_llm_tpu.ops.norms import layer_norm, rms_norm
from rtp_llm_tpu.ops.rope import apply_rope, apply_rope_interleave, compute_rope_freqs
from rtp_llm_tpu.quant.weight_only import quantized_matmul


def _round_up(x, m):
    return (x + m - 1) // m * m


class DeepseekModel:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.cos, self.sin = compute_rope_freqs(
            cfg.qk_rope_head_dim,
            cfg.max_position_embeddings,
            cfg.rope_theta,
            cfg.rope_scaling,
        )
        scale = (cfg.qk_nope_head_dim + cfg.qk_rope_head_dim) ** -0.5
        if cfg.rope_scaling:
            mscale_all_dim = cfg.rope_scaling.get("mscale_all_dim", 0)
            factor = float(cfg.rope_scaling.get("factor", 1.0))
            if mscale_all_dim and factor > 1:
                mscale = 0.1 * mscale_all_dim * math.log(factor) + 1.0
                scale = scale * mscale * mscale
        self.sm_scale = scale
        self.lanes = _round_up(cfg.kv_lora_rank + cfg.qk_rope_head_dim, 128)
        self.block_size = 16
        self.attn_backend = "auto"
        # DeepSeek-V3.2 DSA (sparse attention indexer, reference:
        # models_py/modules/hybrid/indexer.py + fast_topk): a 64-head scorer
        # picks the top-k latent rows each DECODE query attends to. The
        # Hadamard "activation rotation" of the reference is an orthogonal
        # transform applied identically to q and k purely to condition fp8
        # quantization — dot products (and therefore scores) are invariant,
        # so the bf16 TPU scorer omits it.
        self.use_dsa = cfg.indexer_topk > 0 and cfg.indexer_head_dim > 0

    def aux_weights(self) -> dict:
        """Rope tables threaded into the weights pytree by the engine so
        jitted programs take them as arguments, not closed-over constants
        (see ops/rope.compute_rope_freqs docstring)."""
        return {"rope_cos": self.cos, "rope_sin": self.sin}

    def _rope_tables(self, w):
        if w is not None and "rope_cos" in w:
            return w["rope_cos"], w["rope_sin"]
        return self.cos, self.sin

    # ---- cache: latent rows (+ DSA indexer keys) ----

    def cache_shape(self, num_blocks: int, block_size: int) -> tuple:
        return (self.cfg.num_layers, 1, num_blocks * block_size, self.lanes)

    def init_cache(self, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
                   max_slots: int = 0):
        if jnp.dtype(dtype) == jnp.int8:
            raise NotImplementedError(
                "int8 KV cache is not supported for MLA latent caches"
            )
        self.block_size = block_size
        latent = jnp.zeros(self.cache_shape(num_blocks, block_size), dtype)
        if self.use_dsa:
            # per-token 128-dim indexer keys live beside the latent pool
            idx = jnp.zeros((self.cfg.num_layers,
                             num_blocks * block_size,
                             self.cfg.indexer_head_dim), dtype)
            return {"latent": latent, "idx_k": idx}
        return latent

    # ---- layer index mapping (dense-first-K / MoE-rest stacks) ----

    def _stack_pos(self, i: int) -> int:
        cfg = self.cfg
        if cfg.is_moe_layer(i):
            return len([j for j in range(i) if cfg.is_moe_layer(j)])
        return len([j for j in range(i) if not cfg.is_moe_layer(j)])

    @staticmethod
    def _linear(w, name, i, x):
        W = w[name][i]
        s = w.get(name + ".scale")
        z = w.get(name + ".zero")
        if name + ".int4p" in w or name + ".fp4" in w:
            from rtp_llm_tpu.ops.quant_gemm import groupwise_matmul_packed

            return groupwise_matmul_packed(
                x, W, s[i],
                code="e2m1" if name + ".fp4" in w else "s4",
                zero=None if z is None else z[i])
        return quantized_matmul(
            x, W, None if s is None else s[i], None if z is None else z[i]
        )

    # ---- forward ----

    def forward(self, weights, cache, inputs: ModelInputs,
                need_all_logits=False, need_all_hidden=False):
        cfg = self.cfg
        b, t = inputs.tokens.shape
        x = jnp.take(weights["embed_tokens"], inputs.tokens, axis=0)
        if inputs.mm_embeds is not None:
            # deepseek-vl2 small/base: MLA trunk with vision embeddings
            # spliced over placeholder tokens (same contract as
            # LlamaFamilyModel; reference: cpp/multimodal_processor/)
            x = jnp.where(inputs.mm_mask[..., None],
                          inputs.mm_embeds[..., : x.shape[-1]].astype(x.dtype),
                          x)

        valid = (inputs.q_offsets[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
                 ) < inputs.kv_lens[:, None]
        slots = token_slots(
            inputs.positions, inputs.block_tables, self.block_size, valid
        ).reshape(-1)

        for i in range(cfg.num_layers):
            x, cache = self._layer(weights, cache, i, x, inputs, slots)

        pre_norm = x  # MTP chains the PRE-final-norm hidden (hnorm input)
        x = rms_norm(x, weights["final_norm"], cfg.rms_norm_eps)
        lm_head = (weights["embed_tokens"].T if cfg.tie_word_embeddings
                   else weights["lm_head"])
        last = jnp.clip(inputs.kv_lens - inputs.q_offsets - 1, 0, t - 1)
        hidden_last = jnp.take_along_axis(x, last[:, None, None], axis=1)[:, 0]
        logits = (hidden_last @ lm_head).astype(jnp.float32)
        all_logits = (x @ lm_head).astype(jnp.float32) if need_all_logits else None
        return ModelOutputs(
            logits=logits, hidden=hidden_last, all_logits=all_logits,
            all_hidden=pre_norm if need_all_hidden else None,
        ), cache

    def _layer(self, w, cache, i, x, inputs: ModelInputs, slots,
               force_moe=None):
        cfg = self.cfg

        res = x
        x = rms_norm(x, w["input_norm"][i], cfg.rms_norm_eps)
        if self.use_dsa and isinstance(cache, dict):
            x, latent, idxk = self._mla_attn(
                w, i, x, inputs, slots, cache["latent"][i, 0],
                idx_plane=cache["idx_k"][i])
            cache = {"latent": cache["latent"].at[i, 0].set(latent),
                     "idx_k": cache["idx_k"].at[i].set(idxk)}
        else:
            x, latent = self._mla_attn(w, i, x, inputs, slots, cache[i, 0])
            cache = cache.at[i, 0].set(latent)
        x = res + x

        res = x
        x = rms_norm(x, w["post_attn_norm"][i], cfg.rms_norm_eps)
        if force_moe is None:
            p = self._stack_pos(i)
            is_moe = cfg.is_moe_layer(i)
        else:
            p, is_moe = 0, force_moe  # MTP module view (engine/mtp.py)
        if is_moe:
            x = self._moe_mlp(w, p, x)
        else:
            x = self._dense_mlp(w, p, x)
        return res + x, cache

    def _mla_attn(self, w, i, x, inputs: ModelInputs, slots, latent,
                  idx_plane=None):
        """MLA attention in absorbed (latent) form over one layer's latent
        plane; returns (o_proj output, updated latent plane). Shared by the
        dense stack and hybrid models (kimi_linear).

        idx_plane (DSA, DeepSeek-V3.2): this layer's [NS, idx_dim] indexer-
        key pool. Indexer keys for the current tokens are written alongside
        the latent rows, and DECODE queries attend only to the
        ``indexer_topk`` highest-scoring cached rows (score = sum over
        indexer heads of head_gate * relu(q_h . k), reference:
        indexer_ref.py fp8_index). Prefill stays dense — exact whenever the
        context fits in topk, a superset-attention approximation beyond it
        (the reference runs its ragged sparse kernels there)."""
        cfg = self.cfg
        b, t, h = x.shape
        hq = cfg.num_attention_heads
        dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        kvl = cfg.kv_lora_rank

        # ---- q path ----
        if cfg.q_lora_rank > 0:
            qa = self._linear(w, "q_a_proj", i, x)
            qa = rms_norm(qa, w["q_a_norm"][i], cfg.rms_norm_eps)
            q = self._linear(w, "q_b_proj", i, qa)
        else:
            qa = None  # indexer (DSA) reads x directly in this case
            q = self._linear(w, "q_proj", i, x)
        q = q.reshape(b, t, hq, dn + dr)
        q_nope, q_rope = q[..., :dn], q[..., dn:]

        # ---- latent kv ----
        ckv_full = self._linear(w, "kv_a_proj", i, x)  # [B,T,kvl+dr]
        c_kv = rms_norm(ckv_full[..., :kvl], w["kv_a_norm"][i], cfg.rms_norm_eps)
        k_rope = ckv_full[..., kvl:]  # [B,T,dr] single head

        rope_fn = apply_rope_interleave if cfg.rope_interleave else apply_rope
        cos, sin = self._rope_tables(w)
        q_rope = rope_fn(q_rope, inputs.positions, cos, sin)
        k_rope = rope_fn(k_rope[:, :, None, :], inputs.positions,
                         cos, sin)[:, :, 0]

        # absorption: q_abs[..., h, kvl] = q_nope_h @ W_uk_h
        kv_b = w["kv_b_proj"][i].reshape(kvl, hq, dn + dv)
        w_uk = kv_b[..., :dn]  # [kvl, Hq, dn]
        w_uv = kv_b[..., dn:]  # [kvl, Hq, dv]
        q_abs = jnp.einsum("bthd,khd->bthk", q_nope, w_uk)  # [B,T,Hq,kvl]

        # cache write: latent row [c_kv ; k_rope ; pad]
        lane_pad = self.lanes - (kvl + dr)
        latent_row = jnp.concatenate(
            [c_kv, k_rope] + (
                [jnp.zeros(c_kv.shape[:-1] + (lane_pad,), c_kv.dtype)]
                if lane_pad else []
            ),
            axis=-1,
        )  # [B,T,lanes]
        latent = latent.at[slots].set(
            latent_row.reshape(-1, self.lanes).astype(latent.dtype), mode="drop"
        )

        # query in latent space: [q_abs ; q_rope ; pad]
        q_cat = jnp.concatenate(
            [q_abs, q_rope] + (
                [jnp.zeros(q_abs.shape[:-1] + (lane_pad,), q_abs.dtype)]
                if lane_pad else []
            ),
            axis=-1,
        )  # [B,T,Hq,lanes]

        if idx_plane is not None:
            # ---- DSA indexer keys/queries (reference: indexer.py) ----
            di = cfg.indexer_head_dim
            hi = cfg.indexer_n_heads
            qa_src = qa if cfg.q_lora_rank > 0 else x
            qi = self._linear(w, "idx_wq_b", i, qa_src).reshape(b, t, hi, di)
            ki = self._linear(w, "idx_wk", i, x)  # [B,T,di]
            ki = layer_norm(ki, w["idx_k_norm"][i], w["idx_k_norm.bias"][i],
                            cfg.rms_norm_eps)
            # rope over the leading (di - dr) dims (indexer_op.py:126-139);
            # same tables/interleave as the MLA rope
            nr = di - cfg.qk_rope_head_dim
            qi = jnp.concatenate([
                rope_fn(qi[..., :nr], inputs.positions, cos, sin),
                qi[..., nr:]], axis=-1)
            ki = jnp.concatenate([
                rope_fn(ki[:, :, None, :nr], inputs.positions,
                        cos, sin)[:, :, 0],
                ki[..., nr:]], axis=-1)
            idx_plane = idx_plane.at[slots].set(
                ki.reshape(-1, di).astype(idx_plane.dtype), mode="drop")
            # per-(token, head) gate (indexer.py _get_logits_head_gate)
            gate = self._linear(w, "idx_weights_proj", i, x).astype(
                jnp.float32) * (di ** -0.5) * (hi ** -0.5)  # [B,T,Hi]

        mb = inputs.block_tables.shape[1]
        # sparse everywhere the context can exceed topk — decode (T=1),
        # spec-verify windows, AND long prefill chunks (queries processed
        # in chunks of 8 under lax.scan so the [chunk, topk, lanes] gather
        # stays small); V3.2 is trained with sparse attention at all
        # phases, so dense prefill would deviate semantically
        use_sparse = (idx_plane is not None
                      and mb * self.block_size > cfg.indexer_topk)
        if use_sparse:
            ctx = self._dsa_decode(cfg, inputs, latent, idx_plane, q_cat,
                                   qi, gate, kvl)
        else:
            ctx = paged_attention(
                q_cat.astype(latent.dtype), latent, latent,
                inputs.block_tables, inputs.kv_lens, inputs.q_offsets,
                self.sm_scale, block_size=self.block_size,
                backend=self.attn_backend,
            )[..., :kvl]  # [B,T,Hq,kvl]

        # expand context per head with W_uv, then o_proj
        attn = jnp.einsum("bthk,khd->bthd", ctx, w_uv)  # [B,T,Hq,dv]
        out = self._linear(w, "o_proj", i, attn.reshape(b, t, hq * dv))
        if idx_plane is not None:
            return out, latent, idx_plane
        return out, latent

    _DSA_CHUNK = 8  # queries per sparse chunk (bounds the latent gather)

    def _dsa_decode(self, cfg, inputs, latent, idx_plane, q_cat, qi, gate,
                    kvl):
        """Sparse attention (reference: fast_topk + flashmla sparse
        decode): score every cached row with the indexer PER QUERY, keep
        the top-k, and run dense attention over each query's gathered
        latent subset. Long windows (prefill chunks) process queries in
        chunks of ``_DSA_CHUNK`` under ``lax.scan`` so the
        [chunk, topk, lanes] gather stays VMEM-sized regardless of T."""
        b, t = q_cat.shape[:2]
        bs = self.block_size
        bt = inputs.block_tables  # [B, MB]
        j = bt.shape[1] * bs
        slots_all = (bt[:, :, None] * bs
                     + jnp.arange(bs, dtype=bt.dtype)[None, None, :]
                     ).reshape(b, j)  # [B, J] pool rows in position order
        keys = jnp.take(idx_plane, slots_all, axis=0)  # [B, J, di]
        qpos = (inputs.q_offsets[:, None]
                + jnp.arange(t, dtype=jnp.int32)[None, :])  # [B, T]
        k = min(cfg.indexer_topk, j)

        def chunk_ctx(q_c, qi_c, gate_c, qpos_c):
            # q_c [B,C,Hq,lanes], qi_c [B,C,Hi,di], gate_c [B,C,Hi],
            # qpos_c [B,C] -> ctx [B,C,Hq,lanes]
            c = q_c.shape[1]
            s = jnp.einsum("bthd,bjd->bthj",
                           qi_c.astype(jnp.float32),
                           keys.astype(jnp.float32))
            s = jnp.maximum(s, 0.0)
            score = jnp.einsum("bth,bthj->btj", gate_c, s)  # [B, C, J]
            # causal/valid: query at position qpos sees keys at pos <= it
            pos = jnp.arange(j, dtype=jnp.int32)[None, None, :]
            score = jnp.where(pos <= qpos_c[:, :, None], score, -jnp.inf)
            top_score, top_idx = jax.lax.top_k(score, k)  # [B, C, k]
            sel = jnp.take_along_axis(
                jnp.broadcast_to(slots_all[:, None, :], (b, c, j)), top_idx,
                axis=2)  # [B, C, k]
            lat = jnp.take(latent, sel.reshape(b, c * k), axis=0
                           ).reshape(b, c, k, -1)  # [B, C, k, lanes]
            qs = q_c.astype(jnp.float32) * self.sm_scale
            att = jnp.einsum("bthl,btkl->bthk", qs, lat.astype(jnp.float32))
            live = jnp.isfinite(top_score)[:, :, None, :]
            att = jnp.where(live, att, -jnp.inf)
            p = jax.nn.softmax(att, axis=-1)
            p = jnp.where(live, p, 0.0)
            return jnp.einsum("bthk,btkl->bthl", p, lat.astype(jnp.float32))

        ch = self._DSA_CHUNK
        if t <= ch:
            ctx = chunk_ctx(q_cat, qi, gate, qpos)
            return ctx[..., :kvl].astype(q_cat.dtype)

        pad = (-t) % ch
        n = (t + pad) // ch

        def to_chunks(a, fill=0):
            if pad:
                widths = [(0, 0), (0, pad)] + [(0, 0)] * (a.ndim - 2)
                a = jnp.pad(a, widths, constant_values=fill)
            # [B, n*ch, ...] -> [n, B, ch, ...] for scan
            a = a.reshape((b, n, ch) + a.shape[2:])
            return jnp.moveaxis(a, 1, 0)

        # padded queries get qpos -1: every key masks out, live=False
        # everywhere, ctx rows come back 0 and are sliced off below
        xs = (to_chunks(q_cat), to_chunks(qi), to_chunks(gate),
              to_chunks(qpos, fill=-1))

        def body(_, x):
            return None, chunk_ctx(*x)

        _, ctx = jax.lax.scan(body, None, xs)  # [n, B, ch, Hq, lanes]
        ctx = jnp.moveaxis(ctx, 0, 1).reshape(
            (b, n * ch) + ctx.shape[3:])[:, :t]
        return ctx[..., :kvl].astype(q_cat.dtype)  # [B,T,Hq,kvl]

    def _dense_mlp(self, w, p, x):
        gate = self._linear(w, "gate_proj", p, x)
        up = self._linear(w, "up_proj", p, x)
        return self._linear(w, "down_proj", p, jax.nn.silu(gate) * up)

    def _moe_mlp(self, w, p, x):
        cfg = self.cfg
        b, t, h = x.shape
        xt = x.reshape(-1, h)
        n = xt.shape[0]
        e = cfg.num_experts
        scores = jax.nn.sigmoid(
            xt.astype(jnp.float32) @ w["router"][p].astype(jnp.float32)
        ) if cfg.moe_router_score_fn == "sigmoid" else jax.nn.softmax(
            xt.astype(jnp.float32) @ w["router"][p].astype(jnp.float32), axis=-1
        )
        choice = scores
        if "router_bias" in w:
            choice = scores + w["router_bias"][p][None, :].astype(jnp.float32)
        # group-limited routing (V3): keep topk_group groups by top-2-sum score
        if cfg.moe_n_group > 1 and 0 < cfg.moe_topk_group < cfg.moe_n_group:
            g = cfg.moe_n_group
            per = e // g
            grp = choice.reshape(n, g, per)
            top2 = jax.lax.top_k(grp, min(2, per))[0].sum(axis=-1)  # [n,g]
            _, gidx = jax.lax.top_k(top2, cfg.moe_topk_group)
            gmask = jnp.zeros((n, g), bool).at[
                jnp.arange(n)[:, None], gidx
            ].set(True)
            choice = jnp.where(
                jnp.repeat(gmask, per, axis=1), choice, 0.0
            )
        topk = cfg.num_experts_per_tok
        _, idx = jax.lax.top_k(choice, topk)  # [n,k]
        tw = jnp.take_along_axis(scores, idx, axis=-1)  # weights from RAW scores
        if cfg.moe_norm_topk_prob:
            tw = tw / (jnp.sum(tw, axis=-1, keepdims=True) + 1e-20)
        tw = tw * cfg.moe_routed_scaling_factor

        from rtp_llm_tpu.ops.moe import fused_moe

        out = fused_moe(
            xt, idx, tw.astype(xt.dtype),
            w["moe_gate"][p], w["moe_up"][p], w["moe_down"][p],
        )

        if "shared_gate" in w:
            sg = self._linear(w, "shared_gate", p, xt)
            su = self._linear(w, "shared_up", p, xt)
            out = out + self._linear(
                w, "shared_down", p, jax.nn.silu(sg) * su
            ).astype(jnp.float32)
        return out.astype(x.dtype).reshape(b, t, h)
