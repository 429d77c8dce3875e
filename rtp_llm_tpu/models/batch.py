"""The engine <-> model batch contract.

TPU analog of the reference's GptModelInputs/GptModelOutputs
(rtp_llm/models_py/bindings/core/OpData.h:34-125, SURVEY.md Appendix A), but
fixed-shape: the engine pads each step's batch to a (batch, seq) bucket so the
jitted step is compiled once per bucket (the analog of the reference's
CUDA-graph runner, cpp/cuda_graph/cuda_graph_runner.h:20, promoted to a core
design decision on TPU).

One layout serves both phases: decode is T=1 with up to max_batch rows;
prefill is T=bucket with one-or-more rows. Inactive (padding) rows carry
``kv_len == 0`` so their tokens mask out of attention and their KV scatter
slots drop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ModelInputs(NamedTuple):
    """Fixed-shape batched model inputs.

    tokens:       [B, T] i32 — input token ids (padded with 0)
    positions:    [B, T] i32 — absolute positions (q_offset + t for valid tokens)
    block_tables: [B, MAX_BLOCKS] i32 — KV block ids per row (0 = null block)
    kv_lens:      [B] i32 — total valid KV length per row *after* this call
                  (0 => inactive row)
    q_offsets:    [B] i32 — absolute position of the row's first query token
                  (= reused-prefix length for prefill; kv_len-1 for decode)
    """

    tokens: jnp.ndarray
    positions: jnp.ndarray
    block_tables: jnp.ndarray
    kv_lens: jnp.ndarray
    q_offsets: jnp.ndarray
    # per-row LoRA adapter ids (0 = none); None when no adapters registered
    adapter_ids: Optional[jnp.ndarray] = None
    # per-row linear-state slot ids for hybrid models (qwen3-next); None =>
    # row index == slot (the decode program's layout)
    state_slots: Optional[jnp.ndarray] = None
    # multimodal prefill (qwen2-vl): 3D MRoPE positions [B, 3, T]; rows of
    # precomputed vision embeddings [B, T, H] overriding token embeddings at
    # mm_mask positions (reference: MultimodalProcessor applying VIT outputs)
    mrope_positions: Optional[jnp.ndarray] = None
    mm_embeds: Optional[jnp.ndarray] = None
    mm_mask: Optional[jnp.ndarray] = None
    # [B] rope-position offset for decode after a multimodal prefill (MRoPE
    # delta); slots/attention still use the sequence positions
    pos_deltas: Optional[jnp.ndarray] = None

    @property
    def batch(self) -> int:
        return self.tokens.shape[0]

    @property
    def seq(self) -> int:
        return self.tokens.shape[1]


class ModelOutputs(NamedTuple):
    """logits: [B, V] f32 — at each row's last valid token.
    hidden:  optional [B, H] — same rows (for embeddings / MTP).
    all_logits: optional [B, T, V] (need_all_logits analog, e.g. ppl eval).
    all_hidden: optional [B, T, H] (embedding pooling / MTP input —
    reference GptModelOutputs.all_hidden_states, OpData.h:102).
    """

    logits: jnp.ndarray
    hidden: Optional[jnp.ndarray] = None
    all_logits: Optional[jnp.ndarray] = None
    all_hidden: Optional[jnp.ndarray] = None
    # deferred KV rows (decode T=1, llama family): ([L,B,Hkv*D], [L,B,Hkv*D])
    # — the engine batches all layers' cache writes into ONE scatter
    kv_writes: Optional[tuple] = None
    # per-MoE-layer gating counts [n_moe_layers, E] i32 for the EPLB loop
    # (reference: need_moe_gating / GptModelOutputs.moe_gating, OpData.h:102)
    moe_gating: Optional[jnp.ndarray] = None
