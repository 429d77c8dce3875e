"""MTP (multi-token prediction) speculative proposer for DeepSeek models.

Reference analog: the MTP propose-model pipeline (MtpExecutor,
cpp/normal_engine/speculative/MtpExecutor.h:48; MTP module plan,
pybind RtpLLMOp.cc:26-98): the checkpoint ships an extra MLA+MoE layer at HF
layer index ``num_hidden_layers`` whose input is
``eh_proj([enorm(embed(t)); hnorm(h)])`` — the next token's embedding fused
with the target model's pre-final-norm hidden state — and whose output feeds
a shared head that predicts the token after next.

TPU-native design (mirrors engine/draft.py):
  * the MTP layer runs through the SAME DeepseekModel._layer code via a
    weight-name view (``mtp_q_a_proj`` -> ``q_a_proj`` stacked [1, ...]), so
    MLA absorption / paged latent attention are reused verbatim;
  * it keeps its OWN 1-layer latent pool sharing the target's block tables
    and a per-decode-slot hidden-state array [S, H];
  * the K-step greedy rollout is one jitted ``lax.scan`` (K+1 steps: the
    last step writes draft K's KV and hidden);
  * after verify, the engine refreshes each slot's hidden with the target's
    pre-norm hidden at the accepted position (returned by the verify
    program) — rejected-position MTP state is simply rewritten next cycle.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.models.batch import ModelInputs
from rtp_llm_tpu.ops.kv_cache import token_slots
from rtp_llm_tpu.ops.norms import rms_norm


class MtpRunner:
    def __init__(self, model, weights: dict, num_blocks: int, block_size: int,
                 prefill_buckets, max_blocks_per_seq: int, max_slots: int):
        self.model = model
        self.weights = weights
        self.block_size = block_size
        self.buckets = tuple(prefill_buckets)
        self.max_blocks_per_seq = max_blocks_per_seq
        eps = model.cfg.rms_norm_eps
        self.eps = eps
        self.is_moe = "mtp_moe_gate" in weights
        self.kv = jnp.zeros((1, 1, num_blocks * block_size, model.lanes),
                            jnp.bfloat16)
        self.hidden = jnp.zeros((max_slots, model.cfg.hidden_size),
                                jnp.float32)
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._propose_jit = jax.jit(
            self._propose_impl, donate_argnums=(1,), static_argnums=(6,)
        )
        self._set_hidden_jit = jax.jit(
            lambda h, sel, active: jnp.where(active[:, None], sel, h),
            donate_argnums=(0,),
        )

    # ---- weight view: mtp_<name> -> <name> for DeepseekModel._layer ----

    @staticmethod
    def _view(w: dict) -> dict:
        out = {k[4:]: v for k, v in w.items() if k.startswith("mtp_")}
        out["embed_tokens"] = w["embed_tokens"]
        return out

    def _combine(self, w, tokens, hidden):
        """x = eh_proj([enorm(embed(t)); hnorm(h)]) — tokens [...], hidden
        [..., H] -> [..., H]."""
        eps = self.eps
        emb = jnp.take(w["embed_tokens"], tokens, axis=0)
        e = rms_norm(emb.astype(jnp.float32), w["mtp_enorm"][0], eps)
        h = rms_norm(hidden.astype(jnp.float32), w["mtp_hnorm"][0], eps)
        cat = jnp.concatenate([e, h], axis=-1).astype(w["mtp_eh_proj"].dtype)
        return cat @ w["mtp_eh_proj"][0]

    def _head(self, w, h):
        hn = rms_norm(h.astype(jnp.float32), w["mtp_head_norm"][0], self.eps)
        return (hn.astype(w["mtp_head"].dtype) @ w["mtp_head"][0]).astype(
            jnp.float32
        )

    # ---- device programs ----

    def _prefill_impl(self, weights, kv, tokens, hidden, positions,
                      block_tables, kv_lens, q_offsets):
        """Ingest prompt positions: token[i+1] + target hidden[i] at pos i."""
        view = self._view(weights)
        x = self._combine(weights, tokens, hidden).astype(jnp.bfloat16)
        b, t = tokens.shape
        valid = (q_offsets[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
                 ) < kv_lens[:, None]
        slots = token_slots(positions, block_tables, self.block_size,
                            valid).reshape(-1)
        inputs = ModelInputs(tokens=tokens, positions=positions,
                             block_tables=block_tables, kv_lens=kv_lens,
                             q_offsets=q_offsets)
        _, kv = self.model._layer(view, kv, 0, x, inputs, slots,
                                  force_moe=self.is_moe)
        return kv

    def _propose_impl(self, weights, kv, hidden, last_tokens, kv_lens,
                      block_tables, k: int):
        """K-token greedy MTP rollout. Returns (kv, hidden, drafts [B, K])."""
        view = self._view(weights)
        active = kv_lens > 0

        def step(carry, _):
            kv, h, cur, pos = carry
            x = self._combine(weights, cur, h)[:, None].astype(jnp.bfloat16)
            b = cur.shape[0]
            inputs = ModelInputs(
                tokens=cur[:, None],
                positions=jnp.where(active, pos, 0)[:, None],
                block_tables=block_tables,
                kv_lens=jnp.where(active, pos + 1, 0),
                q_offsets=pos,
            )
            valid = (inputs.q_offsets[:, None] < inputs.kv_lens[:, None])
            slots = token_slots(inputs.positions, block_tables,
                                self.block_size, valid).reshape(-1)
            out, kv = self.model._layer(view, kv, 0, x, inputs, slots,
                                        force_moe=self.is_moe)
            h_new = out[:, 0].astype(jnp.float32)
            nxt = jnp.argmax(self._head(weights, h_new), axis=-1).astype(
                jnp.int32
            )
            nxt = jnp.where(active, nxt, cur)
            h_new = jnp.where(active[:, None], h_new, h)
            return (kv, h_new, nxt, pos + 1), nxt

        (kv, hidden, _, _), drafts = jax.lax.scan(
            step, (kv, hidden, last_tokens, kv_lens), None, length=k + 1
        )
        return kv, hidden, drafts[:k].T

    # ---- host API ----

    def prefill(self, prompt: List[int], hidden_chunks, block_row: np.ndarray):
        """hidden_chunks: list of (start_pos, all_hidden [1, T, H] device) from
        the target's chunked prefill. MTP covers positions 0..p-2."""
        p = len(prompt)
        block_row_j = jnp.asarray(block_row)[None, :]
        for pos, hid in hidden_chunks:
            t = hid.shape[1]
            n = min(pos + t, p - 1) - pos  # positions needing MTP rows
            if n <= 0:
                continue
            toks = np.zeros((1, t), np.int32)
            toks[0, :n] = prompt[pos + 1 : pos + 1 + n]
            positions = np.zeros((1, t), np.int32)
            positions[0, :n] = np.arange(pos, pos + n)
            self.kv = self._prefill_jit(
                self.weights, self.kv, jnp.asarray(toks), hid,
                jnp.asarray(positions),
                block_row_j,
                jnp.asarray([pos + n], np.int32),
                jnp.asarray([pos], np.int32),
            )

    def set_slot_hidden(self, slot: int, hidden_row):
        self.hidden = self.hidden.at[slot].set(
            hidden_row.astype(jnp.float32)
        )

    def propose(self, state, k: int):
        self.kv, self.hidden, drafts = self._propose_jit(
            self.weights, self.kv, self.hidden, state.last_tokens,
            state.kv_lens, state.block_tables, k,
        )
        return drafts

    def update_hidden(self, hidden_sel, active_mask):
        self.hidden = self._set_hidden_jit(
            self.hidden, hidden_sel.astype(jnp.float32), active_mask
        )
