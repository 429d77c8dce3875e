"""On-device decode batch state.

The TPU-native replacement for the reference's per-step host gather/dispatch
(NormalBatchStreamProcessor): instead of rebuilding batch tensors on host every
step, the decode batch lives on device — last sampled token, kv lengths, block
tables, penalty statistics, per-slot sampling params — and the fused
decode+sample program updates it in place (donated). The host only touches
single slots on stream insert/removal and reads back the sampled tokens.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.ops.sampling import SamplingParams

MAX_LOGIT_BIAS = 32  # per-request cap on logit_bias entries


class DecodeState(NamedTuple):
    last_tokens: jnp.ndarray  # [B] i32 — token to feed this step
    kv_lens: jnp.ndarray  # [B] i32 — tokens already in cache (0 = inactive)
    block_tables: jnp.ndarray  # [B, MB] i32
    prompt_mask: jnp.ndarray  # [B, V] bool
    output_counts: jnp.ndarray  # [B, V] i16 (counts clamp at 32767; halves the hot [B, V] bandwidth in the sampler)
    params: SamplingParams  # [B] each
    adapter_ids: jnp.ndarray  # [B] i32 — LoRA adapter per slot (0 = none)
    forced_tokens: jnp.ndarray  # [B] i32 — next-token override (-1 = none)
    pos_deltas: jnp.ndarray  # [B] i32 — rope position offset (MRoPE delta)
    bias_ids: jnp.ndarray  # [B, MAX_LOGIT_BIAS] i32 (-1 = empty)
    bias_vals: jnp.ndarray  # [B, MAX_LOGIT_BIAS] f32
    # EPLB: accumulated per-expert gating counts [n_moe_layers, E] i32
    # ([0,0] when disabled); the engine reads + resets every eplb_interval
    # steps (reference: ExpertBalancer::stepForward)
    moe_gating: jnp.ndarray
    rng: jax.Array

    @staticmethod
    def init(batch: int, max_blocks: int, vocab: int, seed: int = 0,
             gating_shape: tuple = (0, 0)) -> "DecodeState":
        return DecodeState(
            last_tokens=jnp.zeros((batch,), jnp.int32),
            kv_lens=jnp.zeros((batch,), jnp.int32),
            block_tables=jnp.zeros((batch, max_blocks), jnp.int32),
            prompt_mask=jnp.zeros((batch, vocab), bool),
            output_counts=jnp.zeros((batch, vocab), jnp.int16),
            params=SamplingParams.zeros(batch),
            adapter_ids=jnp.zeros((batch,), jnp.int32),
            forced_tokens=jnp.full((batch,), -1, jnp.int32),
            pos_deltas=jnp.zeros((batch,), jnp.int32),
            bias_ids=jnp.full((batch, MAX_LOGIT_BIAS), -1, jnp.int32),
            bias_vals=jnp.zeros((batch, MAX_LOGIT_BIAS), jnp.float32),
            moe_gating=jnp.zeros(gating_shape, jnp.int32),
            rng=jax.random.PRNGKey(seed),
        )


def params_row_from_config(cfg: GenerateConfig, ban_eos: bool) -> dict:
    """Scalar per-slot sampling params for one request."""
    return dict(
        temperature=np.float32(cfg.temperature),
        top_k=np.int32(cfg.top_k),
        top_p=np.float32(cfg.top_p),
        do_sample=bool(cfg.do_sample),
        repetition_penalty=np.float32(cfg.repetition_penalty),
        presence_penalty=np.float32(cfg.presence_penalty),
        frequency_penalty=np.float32(cfg.frequency_penalty),
        ban_eos=bool(ban_eos),
    )


def insert_slot(
    state: DecodeState,
    slot: jnp.ndarray,  # scalar i32
    token: jnp.ndarray,  # scalar i32 — first generated token (from prefill logits)
    kv_len: jnp.ndarray,  # scalar i32 — prompt length in cache
    block_row: jnp.ndarray,  # [MB] i32
    prompt_mask_row: jnp.ndarray,  # [V] bool
    temperature, top_k, top_p, do_sample,
    repetition_penalty, presence_penalty, frequency_penalty, ban_eos,
    adapter_id=0, pos_delta=0, bias_ids_row=None, bias_vals_row=None,
) -> DecodeState:
    """Write one slot's state (jitted with donated state)."""
    p = state.params
    counts_row = jnp.zeros_like(state.output_counts[0]).at[token].set(1)
    return DecodeState(
        last_tokens=state.last_tokens.at[slot].set(token),
        kv_lens=state.kv_lens.at[slot].set(kv_len),
        block_tables=state.block_tables.at[slot].set(block_row),
        prompt_mask=state.prompt_mask.at[slot].set(prompt_mask_row),
        output_counts=state.output_counts.at[slot].set(counts_row),
        params=SamplingParams(
            temperature=p.temperature.at[slot].set(temperature),
            top_k=p.top_k.at[slot].set(top_k),
            top_p=p.top_p.at[slot].set(top_p),
            do_sample=p.do_sample.at[slot].set(do_sample),
            repetition_penalty=p.repetition_penalty.at[slot].set(repetition_penalty),
            presence_penalty=p.presence_penalty.at[slot].set(presence_penalty),
            frequency_penalty=p.frequency_penalty.at[slot].set(frequency_penalty),
            ban_eos=p.ban_eos.at[slot].set(ban_eos),
        ),
        adapter_ids=state.adapter_ids.at[slot].set(adapter_id),
        forced_tokens=state.forced_tokens.at[slot].set(-1),
        pos_deltas=state.pos_deltas.at[slot].set(pos_delta),
        bias_ids=state.bias_ids.at[slot].set(
            bias_ids_row if bias_ids_row is not None
            else jnp.full_like(state.bias_ids[0], -1)
        ),
        bias_vals=state.bias_vals.at[slot].set(
            bias_vals_row if bias_vals_row is not None
            else jnp.zeros_like(state.bias_vals[0])
        ),
        moe_gating=state.moe_gating,
        rng=state.rng,
    )


def set_counts_row(state: DecodeState, slot: jnp.ndarray,
                   counts_row: jnp.ndarray) -> DecodeState:
    """Restore one slot's output-token counts (preemption recompute re-enters
    decode with its generation history intact, so frequency/presence penalties
    must see the pre-preemption counts)."""
    return state._replace(output_counts=state.output_counts.at[slot].set(counts_row))


def clear_slot(state: DecodeState, slot: jnp.ndarray) -> DecodeState:
    """Deactivate a slot (kv_len=0 masks it everywhere)."""
    return state._replace(kv_lens=state.kv_lens.at[slot].set(0))


def set_block_row(state: DecodeState, slot: jnp.ndarray, block_row: jnp.ndarray) -> DecodeState:
    return state._replace(block_tables=state.block_tables.at[slot].set(block_row))


def set_ban_eos(state: DecodeState, ban: jnp.ndarray) -> DecodeState:
    return state._replace(params=state.params._replace(ban_eos=ban))


def set_forced(state: DecodeState, forced: jnp.ndarray) -> DecodeState:
    return state._replace(forced_tokens=forced)
