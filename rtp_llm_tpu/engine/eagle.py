"""EAGLE speculative proposer (single-layer feature-level draft).

Reference analog: the EAGLE/EAGLE3 propose-model plan
(cpp/pybind/multi_gpu_gpt/RtpLLMOp.cc:26-98, EAGLE3 weight names in
cpp/models/models_weight/W.h, docs/backend/speculative_decoding.md).

EAGLE predicts the next-next token from the target model's *feature* (the
pre-final-norm hidden state) fused with the next token's embedding:

    x   = fc([embed(t_{i+1}); h_i])          # [2H] -> [H]
    h'  = eagle_decoder_layer(x)             # one llama-style layer,
                                             # NO input layernorm (EAGLE
                                             # layer 0 uses identity)
    p(t_{i+2}) = softmax(lm_head(final_norm(h')))   # target's own head

TPU-native design (mirrors engine/mtp.py):
  * the EAGLE layer keeps its own 1-layer paged KV pool sharing the target's
    block tables and decode-slot ids;
  * per-slot feature state [S, H] is refreshed after each verify with the
    target's pre-norm hidden at the accepted position (the verify program
    already returns it for MTP);
  * the K-step greedy rollout is one jitted ``lax.scan`` (K+1 steps so the
    K-th draft's KV row is written);
  * verification reuses the engine's T=K+1 target program — EAGLE only
    changes where proposals come from (chain drafts; tree drafts are a
    scheduler variant, not a different model contract).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.ops.attention import paged_attention
from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv
from rtp_llm_tpu.ops.norms import rms_norm
from rtp_llm_tpu.ops.rope import apply_rope, compute_rope_freqs


class EagleRunner:
    """Owns the EAGLE layer's weights, KV pool, per-slot features and jitted
    rollout. ``model`` is the TARGET model (llama family); its config fixes
    the layer geometry and its final_norm + lm_head serve as the draft head.
    """

    def __init__(self, model, target_weights: dict, eagle_weights: dict,
                 num_blocks: int, block_size: int, max_slots: int):
        self.model = model
        self.cfg = model.cfg
        self.w = eagle_weights
        self.tw = target_weights
        self.block_size = block_size
        cfg = model.cfg
        # EAGLE3 (hidden_norm present): the target captures N layers' hidden
        # states, fc fuses [N*H] -> H, and the midlayer consumes
        # cat(input_norm(embed), hidden_norm(feature)) with an H-dim
        # residual (reference: eagle3_* names W.h:27-30; merged hidden
        # PyWrappedModel.cc:746)
        self.is_eagle3 = "hidden_norm" in eagle_weights
        if self.is_eagle3:
            h = cfg.hidden_size
            n_cap = eagle_weights["fc"].shape[0] // h
            # official EAGLE3 capture points: low/mid/high layer outputs
            L = cfg.num_layers
            cand = [2, L // 2, L - 3, 1, L - 1, 0]
            seen: list = []
            for c in cand:
                c = min(max(c, 0), L - 1)
                if c not in seen:
                    seen.append(c)
                if len(seen) == n_cap:
                    break
            while len(seen) < n_cap:  # models shallower than the capture
                seen.append(seen[-1])  # count repeat the deepest layer
            self.capture_layers = tuple(sorted(seen))
        self.cos, self.sin = compute_rope_freqs(
            cfg.head_dim, cfg.max_position_embeddings, cfg.rope_theta,
            cfg.rope_scaling,
        )
        # thread the rope tables through the draft weight dict so the jitted
        # prefill/propose programs take them as arguments, not closed-over
        # constants (see ops/rope.compute_rope_freqs docstring)
        self.w = dict(self.w)
        self.w.setdefault("rope_cos", jnp.asarray(self.cos))
        self.w.setdefault("rope_sin", jnp.asarray(self.sin))
        hkv, d = cfg.num_kv_heads, cfg.head_dim
        self.kv = jnp.zeros((2, num_blocks * block_size, hkv * d),
                            jnp.bfloat16)
        self.hidden = jnp.zeros((max_slots, cfg.hidden_size), jnp.float32)
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(2,))
        self._propose_jit = jax.jit(
            self._propose_impl, donate_argnums=(2, 3), static_argnums=(7,)
        )
        self._set_hidden_jit = jax.jit(
            lambda h, sel, active: jnp.where(active[:, None], sel, h),
            donate_argnums=(0,),
        )

    # ---- the fused input + single decoder layer ----

    def _fuse(self, w, tw, tokens, hidden):
        """EAGLE1: fc([embed(t); h]) -> [..., H].
        EAGLE3: cat(input_norm(embed(t)), hidden_norm(h)) -> [..., 2H]
        (h is the post-fc H-dim feature; fc applies where the target
        feature enters — prefill/update — not per rollout step)."""
        emb = w.get("embed_tokens")
        if emb is None:
            emb = tw["embed_tokens"]
        emb = jnp.take(emb, tokens, axis=0).astype(jnp.float32)
        if self.is_eagle3:
            eps = self.cfg.rms_norm_eps
            e = rms_norm(emb, w["input_norm"], eps)
            hn = rms_norm(hidden.astype(jnp.float32), w["hidden_norm"], eps)
            return jnp.concatenate([e, hn], axis=-1)
        cat = jnp.concatenate([emb, hidden.astype(jnp.float32)], axis=-1)
        return cat.astype(w["fc"].dtype) @ w["fc"]

    def _fc(self, feat):
        """Project the target's captured [..., N*H] feature to [..., H]
        (EAGLE3 fc; identity passthrough for EAGLE1 features)."""
        if not self.is_eagle3:
            return feat
        w = self.w["fc"]
        return (feat.astype(w.dtype) @ w).astype(jnp.float32)

    def _layer(self, w, kv, x, positions, block_tables, kv_lens, q_offsets,
               slots, res=None):
        """One llama decoder layer WITHOUT input layernorm (EAGLE layer 0;
        for EAGLE3 ``x`` is the 2H concat and ``res`` the H-dim feature)."""
        cfg = self.cfg
        b, t, h = x.shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
        res = x if res is None else res.astype(x.dtype)
        q = (x @ w["q_proj"]).reshape(b, t, hq, d)
        k = (x @ w["k_proj"]).reshape(b, t, hkv, d)
        v = (x @ w["v_proj"]).reshape(b, t, hkv, d)
        cos = w.get("rope_cos", self.cos)
        sin = w.get("rope_sin", self.sin)
        q = apply_rope(q, positions, cos, sin)
        k = apply_rope(k, positions, cos, sin)
        k_cache, v_cache = write_kv(
            kv[0], kv[1], k.reshape(-1, hkv, d), v.reshape(-1, hkv, d), slots)
        kv = jnp.stack([k_cache, v_cache])
        attn = paged_attention(
            q, k_cache, v_cache, block_tables, kv_lens, q_offsets,
            d ** -0.5, block_size=self.block_size,
            backend=self.model.attn_backend, mesh=self.model.mesh,
        )
        x = res + attn.reshape(b, t, hq * d) @ w["o_proj"]
        res = x
        xn = rms_norm(x, w["post_attn_norm"], cfg.rms_norm_eps)
        mlp = (jax.nn.silu(xn @ w["gate_proj"]) * (xn @ w["up_proj"])
               ) @ w["down_proj"]
        return res + mlp, kv

    def _head(self, tw, hidden):
        """Head on the EAGLE feature: the draft's own final_norm/lm_head if
        shipped (EAGLE3 draft-vocab heads), else the target's."""
        cfg = self.cfg
        w = self.w
        fn = w.get("final_norm", tw["final_norm"])
        hn = rms_norm(hidden.astype(jnp.float32), fn, cfg.rms_norm_eps)
        if "lm_head" in w:
            lm = w["lm_head"]
        elif cfg.tie_word_embeddings:
            lm = tw["embed_tokens"].T
        else:
            lm = tw["lm_head"]
        return (hn.astype(lm.dtype) @ lm).astype(jnp.float32)

    def _to_target_vocab(self, draft_ids):
        """EAGLE3 draft-vocab heads ship a d2t offset map: target_id =
        draft_id + d2t[draft_id] (official EAGLE3 convention)."""
        d2t = self.w.get("d2t")
        if d2t is None:
            return draft_ids
        return draft_ids + jnp.take(d2t, draft_ids, axis=0)

    # ---- device programs ----

    def _prefill_impl(self, w, tw, kv, tokens, hidden, positions,
                      block_tables, kv_lens, q_offsets):
        """Ingest prompt: feature row i = fuse(token[i+1], target_hidden[i])."""
        h = self._fc(hidden)  # EAGLE3: [.., N*H] target capture -> [.., H]
        x = self._fuse(w, tw, tokens, h).astype(jnp.bfloat16)
        b, t = tokens.shape
        valid = (q_offsets[:, None]
                 + jnp.arange(t, dtype=jnp.int32)[None, :]
                 ) < kv_lens[:, None]
        slots = token_slots(positions, block_tables, self.block_size,
                            valid).reshape(-1)
        _, kv = self._layer(w, kv, x, positions, block_tables, kv_lens,
                            q_offsets, slots,
                            res=h if self.is_eagle3 else None)
        return kv

    def _propose_impl(self, w, tw, kv, hidden, last_tokens, kv_lens,
                      block_tables, k: int):
        """K-token greedy EAGLE rollout. Returns (kv, hidden, drafts [B,K])."""
        active = kv_lens > 0

        def step(carry, _):
            kv, h, cur, pos = carry
            x = self._fuse(w, tw, cur, h)[:, None].astype(jnp.bfloat16)
            positions = jnp.where(active, pos, 0)[:, None]
            kvl = jnp.where(active, pos + 1, 0)
            valid = (pos[:, None] < kvl[:, None])
            slots = token_slots(positions, block_tables, self.block_size,
                                valid).reshape(-1)
            out, kv = self._layer(
                w, kv, x, positions, block_tables, kvl, pos, slots,
                res=h[:, None] if self.is_eagle3 else None)
            h_new = out[:, 0].astype(jnp.float32)
            nxt = jnp.argmax(self._head(tw, h_new), axis=-1).astype(jnp.int32)
            nxt = self._to_target_vocab(nxt)
            nxt = jnp.where(active, nxt, cur)
            h_new = jnp.where(active[:, None], h_new, h)
            return (kv, h_new, nxt, pos + 1), nxt

        (kv, hidden, _, _), drafts = jax.lax.scan(
            step, (kv, hidden, last_tokens, kv_lens), None, length=k + 1
        )
        return kv, hidden, drafts[:k].T

    # ---- host API (mirrors MtpRunner) ----

    def prefill(self, prompt: List[int], hidden_chunks,
                block_row: np.ndarray):
        p = len(prompt)
        block_row_j = jnp.asarray(block_row)[None, :]
        for pos, hid in hidden_chunks:
            t = hid.shape[1]
            n = min(pos + t, p - 1) - pos
            if n <= 0:
                continue
            toks = np.zeros((1, t), np.int32)
            toks[0, :n] = prompt[pos + 1 : pos + 1 + n]
            positions = np.zeros((1, t), np.int32)
            positions[0, :n] = np.arange(pos, pos + n)
            self.kv = self._prefill_jit(
                self.w, self.tw, self.kv, jnp.asarray(toks), hid,
                jnp.asarray(positions), block_row_j,
                jnp.asarray([pos + n], np.int32),
                jnp.asarray([pos], np.int32),
            )

    def set_slot_hidden(self, slot: int, hidden_row):
        row = self._fc(jnp.asarray(hidden_row))
        self.hidden = self.hidden.at[slot].set(row.astype(jnp.float32))

    def propose(self, state, k: int):
        self.kv, self.hidden, drafts = self._propose_jit(
            self.w, self.tw, self.kv, self.hidden, state.last_tokens,
            state.kv_lens, state.block_tables, k,
        )
        return drafts

    def update_hidden(self, hidden_sel, active_mask):
        # EAGLE3: the verify program hands back [S, N*H] captured features;
        # fc-project before storing the per-slot H-dim state
        self.hidden = self._set_hidden_jit(
            self.hidden, self._fc(hidden_sel).astype(jnp.float32),
            active_mask
        )
