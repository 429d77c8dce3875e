"""Attention impls + runtime dispatch.

Analog of the reference's AttnImplFactory
(models_py/modules/factory/attention/attn_factory.py:200): picks the fastest
implementation per phase/platform/shape. On TPU, decode (T=1) uses the Pallas
paged kernel; everything else falls back to the jnp reference (XLA-fused),
which is also the CPU-backend path in tests.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from rtp_llm_tpu.ops.attention.ref import paged_attention_ref

_TPU_PLATFORMS = ("tpu", "axon")
# prefill kernel is opt-in until validated on hardware (see pallas_decode's
# fullrow gate for the same policy)
_ENABLE_PALLAS_PREFILL = bool(os.environ.get("RTP_ENABLE_PALLAS_PREFILL"))


def default_backend() -> str:
    try:
        return "pallas" if jax.default_backend() in _TPU_PLATFORMS else "ref"
    except Exception:
        return "ref"


def paged_attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k_cache: jnp.ndarray,  # [slots, Hkv*D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, MB]
    kv_lens: jnp.ndarray,  # [B]
    q_offsets: jnp.ndarray,  # [B]
    sm_scale: float,
    block_size: int,
    sliding_window: int = 0,
    soft_cap: float = 0.0,
    backend: str = "auto",
    k_scale: jnp.ndarray | None = None,  # int8 KV cache per-(slot, head) scales
    v_scale: jnp.ndarray | None = None,
    cur_k: jnp.ndarray | None = None,  # [B, Hkv*D] deferred current-token K/V
    cur_v: jnp.ndarray | None = None,  # (decode T=1: cache holds kv_len-1)
) -> jnp.ndarray:
    b, t, hq, d = q.shape
    hkv = k_cache.shape[1] // d
    if backend == "auto":
        backend = default_backend()
    use_pallas = (
        backend == "pallas"
        and t == 1
        and d % 128 == 0
        and block_size % 8 == 0
        and hq % hkv == 0
        and soft_cap == 0.0
        and k_scale is None  # int8 KV: pallas dequant support pending
    )
    if use_pallas:
        from rtp_llm_tpu.ops.attention.pallas_decode import paged_decode_attention

        out = paged_decode_attention(
            q[:, 0], k_cache, v_cache, block_tables, kv_lens, sm_scale,
            block_size=block_size, sliding_window=sliding_window,
            cur_k=cur_k, cur_v=cur_v,
        )
        return out[:, None]
    use_pallas_prefill = (
        _ENABLE_PALLAS_PREFILL
        and backend == "pallas"
        and b == 1
        and t > 1
        and d % 128 == 0
        and block_size % 8 == 0
        and hq % hkv == 0
        and sliding_window == 0
        and soft_cap == 0.0
        and k_scale is None
        and t % min(128, t) == 0
    )
    if use_pallas_prefill:
        from rtp_llm_tpu.ops.attention.pallas_prefill import paged_prefill_attention

        out = paged_prefill_attention(
            q[0], k_cache, v_cache, block_tables[0], q_offsets[0], kv_lens[0],
            sm_scale, block_size,
        )
        return out[None]
    return paged_attention_ref(
        q, k_cache, v_cache, block_tables, kv_lens, q_offsets, sm_scale,
        block_size=block_size, sliding_window=sliding_window, soft_cap=soft_cap,
        k_scale=k_scale, v_scale=v_scale, cur_k=cur_k, cur_v=cur_v,
    )


__all__ = ["paged_attention", "paged_attention_ref", "default_backend"]
