"""Reference paged attention in pure jnp.

Functional ground truth for the Pallas kernels (and the execution path on the
CPU backend in tests). One signature serves both phases — decode is T=1 — the
TPU analog of the reference's per-phase FMHA impl selection
(models_py/modules/factory/attention/attn_factory.py:200).

Semantics: query token t of row b has absolute position q_offset[b] + t and
attends to cache positions p with p <= q_pos and p < kv_len[b] (and, with a
sliding window, p > q_pos - window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def paged_attention_ref(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k_cache: jnp.ndarray,  # [num_slots, Hkv*D] (num_slots = NB * block_size)
    v_cache: jnp.ndarray,  # [num_slots, Hkv*D]
    block_tables: jnp.ndarray,  # [B, max_blocks] int32
    kv_lens: jnp.ndarray,  # [B] int32 — total valid kv length per row
    q_offsets: jnp.ndarray,  # [B] int32 — absolute position of first query token
    sm_scale: float,
    block_size: int,
    sliding_window: int = 0,
    soft_cap: float = 0.0,
    k_scale: jnp.ndarray | None = None,  # [num_slots, Hkv] (int8 KV cache)
    v_scale: jnp.ndarray | None = None,
    cur_k: jnp.ndarray | None = None,  # [B, Hkv*D] current token K (deferred
    cur_v: jnp.ndarray | None = None,  #  writes: cache holds kv_len-1 tokens)
    alibi_slopes: jnp.ndarray | None = None,  # [Hq] (bloom/baichuan-13b)
) -> jnp.ndarray:
    b, t, hq, d = q.shape
    hkv = k_cache.shape[1] // d
    g = hq // hkv  # GQA group size
    s = block_tables.shape[1] * block_size  # padded kv length

    # flat slot indices per row -> gather paged KV as [B, S, Hkv, D]
    idx = (
        block_tables[:, :, None] * block_size
        + jnp.arange(block_size, dtype=jnp.int32)[None, None, :]
    ).reshape(b, s)
    k = k_cache[idx].reshape(b, s, hkv, d)
    v = v_cache[idx].reshape(b, s, hkv, d)

    qf = q.reshape(b, t, hkv, g, d).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if k_scale is not None:  # int8 KV: dequant with per-(slot, head) scales
        kf = kf * k_scale[idx].reshape(b, s, hkv, 1).astype(jnp.float32)
    if v_scale is not None:
        vf = vf * v_scale[idx].reshape(b, s, hkv, 1).astype(jnp.float32)
    scores = jnp.einsum("bthgd,bshd->bhgts", qf, kf, precision=_HI) * sm_scale
    if soft_cap > 0.0:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    kv_pos = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.int32)[None, :], (b, s)
    )
    cached_lens = kv_lens
    if cur_k is not None:
        # deferred-write decode (T=1): append the in-register current token
        # at position kv_len-1
        cached_lens = jnp.maximum(kv_lens - 1, 0)
        ckf = cur_k.reshape(b, 1, hkv, d).astype(jnp.float32)
        cvf = cur_v.reshape(b, 1, hkv, d).astype(jnp.float32)
        if k_scale is not None:
            pass  # cur rows arrive unquantized
        kf = jnp.concatenate([kf, ckf], axis=1)
        vf = jnp.concatenate([vf, cvf], axis=1)
        scores_cur = jnp.einsum(
            "bthgd,bshd->bhgts", qf, ckf, precision=_HI
        ) * sm_scale
        if soft_cap > 0.0:
            scores_cur = soft_cap * jnp.tanh(scores_cur / soft_cap)
        scores = jnp.concatenate([scores, scores_cur], axis=-1)
        kv_pos = jnp.concatenate(
            [kv_pos, jnp.maximum(kv_lens - 1, 0)[:, None]], axis=1
        )
        s = s + 1
    kv_pos = kv_pos[:, None, :]  # [B,1,S]
    q_pos = q_offsets[:, None, None] + jnp.arange(t, dtype=jnp.int32)[None, :, None]
    if alibi_slopes is not None:
        # ALiBi (reference: bloom/baichuan-13b position bias): score += slope
        # * (kv_pos - q_pos) — 0 on the diagonal, growing penalty with
        # distance (slopes are positive, rel is <= 0 under the causal mask)
        rel = (kv_pos - q_pos).astype(jnp.float32)  # [B,T,S]
        slopes = alibi_slopes.astype(jnp.float32).reshape(hkv, g)
        scores = scores + (slopes[None, :, :, None, None]
                           * rel[:, None, None, :, :])
    mask = (kv_pos <= q_pos) & (kv_pos < kv_lens[:, None, None])  # [B,T,S]
    if cur_k is not None:
        valid_cached = jnp.concatenate(
            [jnp.broadcast_to(jnp.arange(s - 1, dtype=jnp.int32)[None, :],
                              (b, s - 1)) < cached_lens[:, None],
             (kv_lens > 0)[:, None]], axis=1,
        )
        mask &= valid_cached[:, None, :]
    if sliding_window > 0:
        mask &= kv_pos > q_pos - sliding_window
    scores = jnp.where(mask[:, None, None, :, :], scores, -jnp.inf)

    # safe softmax: fully-masked rows (inactive slots) produce zeros, not NaN
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    e = jnp.where(mask[:, None, None, :, :], e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(denom, 1e-20)

    out = jnp.einsum("bhgts,bshd->bthgd", p, vf, precision=_HI)
    return out.reshape(b, t, hq, d).astype(q.dtype)
