"""Speculative decoding: deterministic prompt-lookup proposer + batched verify.

Analog of the reference speculative executor (cpp/normal_engine/speculative/
MtpExecutor.h:48 + docs/backend/speculative_decoding.md, sp_type
'deterministic'): K draft tokens per stream are verified in one T=K+1 forward;
the accepted prefix advances the stream several tokens per engine step.

TPU-first notes:
  * the verify program is just the decode program at T=K+1 — same paged
    attention contract, fixed shapes (one extra compiled variant);
  * rejected draft KV writes need no rollback: a rejected position's slot is
    re-written when the real token at that position is processed next step;
  * greedy acceptance only (sampling streams fall back to the normal decode
    step; rejection-sampling acceptance is the draft-model round's work).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def propose_prompt_lookup(
    token_ids: List[int], k: int, ngram_min: int = 2, ngram_max: int = 4
) -> List[int]:
    """Find the most recent earlier occurrence of the trailing n-gram (longest
    n first) and return the k tokens that followed it. Pads with the last
    token when no continuation is found (padding drafts are simply rejected).
    """
    n_tokens = len(token_ids)
    out: List[int] = []
    for n in range(min(ngram_max, n_tokens - 1), ngram_min - 1, -1):
        tail = token_ids[-n:]
        # search right-to-left, excluding the tail occurrence itself
        for start in range(n_tokens - n - 1, -1, -1):
            if token_ids[start : start + n] == tail:
                cont = token_ids[start + n : start + n + k]
                if cont:
                    out = list(cont)
                break
        if out:
            break
    pad = token_ids[-1] if token_ids else 0
    while len(out) < k:
        out.append(pad)
    return out[:k]


def greedy_verify(
    all_logits: jnp.ndarray,  # [B, T, V] (T = K+1), already penalized/banned
    drafts: jnp.ndarray,  # [B, K]
):
    """Returns (greedy [B,T], n_accepted_plus_one [B]).

    n_accepted_plus_one = number of tokens emitted this step per row: the
    accepted draft prefix plus the model's own next token."""
    g = jnp.argmax(all_logits, axis=-1).astype(jnp.int32)  # [B, T]
    match = (drafts == g[:, :-1]).astype(jnp.int32)  # [B, K]
    accepted = jnp.sum(jnp.cumprod(match, axis=-1), axis=-1)  # [B] in [0..K]
    return g, accepted + 1
