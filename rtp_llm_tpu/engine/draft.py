"""Draft-model speculative proposer (the reference's 'vanilla' sp_type).

Reference analog: the speculative executor running a small draft model ahead
of the target model (cpp/normal_engine/speculative/ + docs/backend/
speculative_decoding.md, sp_type 'vanilla'): K greedy draft tokens per stream
are proposed by a separate small model, then verified by the target model's
T=K+1 program (engine._verify_impl).

TPU-first design:
  * the draft model keeps its OWN paged KV pool but SHARES the target
    engine's block tables and slot ids — block bookkeeping is done once, the
    draft pool just mirrors the block ids (its pool is small: a draft model
    has few layers/heads);
  * the K-step greedy rollout is ONE jitted program: a ``lax.scan`` over the
    draft's T=1 decode forward with the cache donated through the scan — no
    host round-trips between draft steps, and the proposals are handed to the
    verify program as a device array;
  * the rollout runs K+1 steps: the last step writes the K-th draft token's
    KV (its logits are discarded), so when the whole window is accepted the
    draft cache has no hole at position kv_len+K;
  * stale draft-KV rows from rejected proposals need no rollback — the next
    rollout re-writes those positions with the real tokens.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.models.batch import ModelInputs


class DraftRunner:
    """Owns the draft model's weights, KV pool and jitted programs."""

    def __init__(self, model, weights: dict, num_blocks: int, block_size: int,
                 prefill_buckets, max_blocks_per_seq: int):
        self.model = model
        self.weights = dict(weights)
        # thread rope tables as program arguments (not closed-over
        # constants) — same rationale as LlmEngine._inject_aux_weights
        for k, v in (getattr(model, "aux_weights", dict)() or {}).items():
            import jax.numpy as _jnp
            self.weights.setdefault(k, _jnp.asarray(v))
        self.block_size = block_size
        self.buckets = tuple(prefill_buckets)
        self.max_blocks_per_seq = max_blocks_per_seq
        # draft KV stays bf16 regardless of the target's kv dtype: the pool is
        # small and the proposer's accuracy directly gates acceptance rate
        self.kv = model.init_cache(num_blocks, block_size, jnp.bfloat16)
        self._prefill_jit = jax.jit(self._prefill_impl, donate_argnums=(1,))
        self._propose_jit = jax.jit(
            self._propose_impl, donate_argnums=(1,), static_argnums=(5,)
        )

    # ---- device programs ----

    def _prefill_impl(self, weights, kv, tokens, positions, block_tables,
                      kv_lens, q_offsets):
        inputs = ModelInputs(
            tokens=tokens, positions=positions, block_tables=block_tables,
            kv_lens=kv_lens, q_offsets=q_offsets,
        )
        _, kv = self.model.forward(weights, kv, inputs)
        return kv

    def _propose_impl(self, weights, kv, last_tokens, kv_lens, block_tables,
                      k: int):
        """Greedy K-token rollout for the whole decode batch.

        last_tokens/kv_lens/block_tables come straight from the target
        engine's DecodeState (same slot layout). Returns (kv, drafts [B, K]).
        """
        active = kv_lens > 0

        def step(carry, _):
            kv, cur, pos = carry  # cache, [B] pending token, [B] its position
            inputs = ModelInputs(
                tokens=cur[:, None],
                positions=jnp.where(active, pos, 0)[:, None],
                block_tables=block_tables,
                kv_lens=jnp.where(active, pos + 1, 0),
                q_offsets=pos,
            )
            out, kv = self.model.forward(weights, kv, inputs)
            nxt = jnp.argmax(out.logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(active, nxt, cur)
            return (kv, nxt, pos + 1), nxt

        # k+1 steps: the extra step writes draft k's KV (output discarded)
        (kv, _, _), drafts = jax.lax.scan(
            step, (kv, last_tokens, kv_lens), None, length=k + 1
        )
        return kv, drafts[:k].T  # [B, K]

    # ---- host API ----

    def prefill(self, prompt: List[int], block_row: np.ndarray):
        """Ingest a stream's FULL prompt into the draft cache (prefix reuse is
        ignored: reused blocks are rewritten with identical rows)."""
        block_row_j = jnp.asarray(block_row)[None, :]
        max_bucket = self.buckets[-1]
        pos = 0
        p = len(prompt)
        while pos < p:
            chunk = prompt[pos : pos + max_bucket]
            t_real = len(chunk)
            bucket = next((b for b in self.buckets if t_real <= b),
                          self.buckets[-1])
            toks = np.zeros((1, bucket), np.int32)
            toks[0, :t_real] = chunk
            positions = np.zeros((1, bucket), np.int32)
            positions[0, :t_real] = np.arange(pos, pos + t_real)
            self.kv = self._prefill_jit(
                self.weights, self.kv,
                jnp.asarray(toks), jnp.asarray(positions), block_row_j,
                jnp.asarray([pos + t_real], np.int32),
                jnp.asarray([pos], np.int32),
            )
            pos += t_real

    def propose(self, state, k: int):
        """Drafts [B, K] (device array) continuing each slot's pending token."""
        self.kv, drafts = self._propose_jit(
            self.weights, self.kv, state.last_tokens, state.kv_lens,
            state.block_tables, k,
        )
        return drafts
