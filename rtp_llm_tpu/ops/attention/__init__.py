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


def _enable_pallas_prefill() -> bool:
    # prefill kernel is opt-in until validated on hardware (see
    # pallas_decode's fullrow gate for the same policy); config-aware
    # (kernel.enable_pallas_prefill / RTP_ENABLE_PALLAS_PREFILL)
    from rtp_llm_tpu.config import runtime_flags

    return bool(runtime_flags.get("enable_pallas_prefill"))


def default_backend() -> str:
    try:
        return "pallas" if jax.default_backend() in _TPU_PLATFORMS else "ref"
    except Exception:
        return "ref"


def _pallas_decode_sharded(
    mesh, q, k_cache, v_cache, block_tables, kv_lens, sm_scale, block_size,
    sliding_window, cur_k, cur_v, interpret, full_cache=None, layer=-1,
    k_scale_e=None, v_scale_e=None,
):
    """Run the Pallas decode kernel under a live mesh via shard_map.

    GSPMD cannot auto-partition a pallas_call, but the kernel is perfectly
    local once operands are placed: kv heads (cache lane dim + q/out head dim)
    shard over "tp" — the same split the k/v projections use — and the decode
    batch shards over "dp" (reference analog: per-rank local attention after
    the TP head split, models_py/distributed/collective_torch.py:189)."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from rtp_llm_tpu.ops.attention.pallas_decode import paged_decode_attention

    has_cur = cur_k is not None
    hd = k_cache.shape[-1]
    if not has_cur:  # shard_map needs concrete operands
        cur_k = jnp.zeros((q.shape[0], hd), k_cache.dtype)
        cur_v = jnp.zeros((q.shape[0], hd), k_cache.dtype)
    use_full = full_cache is not None
    quant = k_scale_e is not None
    if not quant:  # shard_map needs concrete operands
        k_scale_e = jnp.zeros((q.shape[0], 1, mesh.shape.get("tp", 1)),
                              jnp.bfloat16)
        v_scale_e = jnp.zeros_like(k_scale_e)
    dyn_layer = not isinstance(layer, int)
    layer_arr = (jnp.asarray(layer, jnp.int32).reshape(1) if dyn_layer
                 else jnp.zeros((1,), jnp.int32))

    def local(q, kop, block_tables, kv_lens, cur_k, cur_v, ks_e, vs_e, larr):
        if use_full:
            k_l, v_l, lyr = kop, kop, (-1 if dyn_layer else layer)
        else:
            k_l, v_l, lyr = kop[0], kop[1], -1
        return paged_decode_attention(
            q, k_l, v_l, block_tables, kv_lens, sm_scale,
            block_size=block_size, sliding_window=sliding_window,
            cur_k=cur_k if has_cur else None,
            cur_v=cur_v if has_cur else None,
            interpret=interpret, layer=lyr,
            layer_arr=larr if (use_full and dyn_layer) else None,
            k_scale_e=ks_e if quant else None,
            v_scale_e=vs_e if quant else None,
        )

    kop = full_cache if use_full else (k_cache, v_cache)
    kop_spec = (P(None, None, None, "tp") if use_full
                else (P(None, "tp"), P(None, "tp")))
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(
            P("dp", "tp", None),   # q [B, Hq, D]
            kop_spec,              # cache (full [L,2,NS,HD] or (k, v))
            P("dp", None),         # block_tables
            P("dp"),               # kv_lens
            P("dp", "tp"),         # cur_k
            P("dp", "tp"),         # cur_v
            P("dp", None, "tp"),   # k_scale rows [B, MB*BS, Hkv]
            P("dp", None, "tp"),   # v_scale rows
            P(None),               # layer index [1] (replicated)
        ),
        out_specs=P("dp", "tp", None),
        # pallas_call out_shapes don't carry vma metadata; replication over
        # unused axes (cp) is guaranteed by construction here
        check_vma=False,
    )
    return fn(q, kop, block_tables, kv_lens, cur_k, cur_v,
              k_scale_e, v_scale_e, layer_arr)


def _expand_kv_scales(k_scale, v_scale, block_tables, block_size, hq, hkv):
    """Gather int8-KV per-(slot, head) scales for the fullrow kernel.

    Returns [B, MB*BS, Hkv] rows in block-table order; the kernel expands
    them across query heads with a one-hot MXU matmul (a host-side
    transpose-and-repeat to [B, Hq, MB*BS] costs ~7 ms/step of XLA relayouts
    at b=64). The gather moves ~B*MB*BS*Hkv bf16 values — noise next to the
    int8 KV slabs themselves."""
    b, mb = block_tables.shape
    slots = (block_tables[:, :, None] * block_size
             + jnp.arange(block_size, dtype=block_tables.dtype)[None, None, :]
             ).reshape(b, mb * block_size)
    ks = jnp.take(k_scale, slots, axis=0)  # [B, MB*BS, Hkv] (clamped OOB)
    vs = jnp.take(v_scale, slots, axis=0)
    return ks, vs


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
    mesh=None,  # live jax.sharding.Mesh => shard_map-wrapped kernel
    alibi_slopes: jnp.ndarray | None = None,  # [Hq] => XLA ref path
    full_cache=None,  # whole [L, 2, NS, HD] cache + layer: the pallas
    layer=-1,  # kernel DMAs at a layer offset, avoiding slab copies.
    # int => static offset; traced jax scalar => dynamic (scan-over-layers)
) -> jnp.ndarray:
    b, t, hq, d = q.shape
    hkv = k_cache.shape[1] // d
    if backend == "auto":
        backend = default_backend()
    dyn_layer = not isinstance(layer, int)
    quant_kv = k_scale is not None
    if quant_kv:
        # int8-KV dequant lives in the fullrow kernel only (bucketed context
        # must fit VMEM); composes with deferred writes (bf16 cur token)
        from rtp_llm_tpu.ops.attention import pallas_decode as _pd

        quant_ok = (
            block_tables.shape[1] * block_size <= _pd.fullrow_max_tokens()
        )
    use_pallas = (
        backend == "pallas"
        and t == 1
        and d % 128 == 0
        and block_size % 8 == 0
        and hq % hkv == 0
        and soft_cap == 0.0
        and (not quant_kv or quant_ok)
        and alibi_slopes is None
    )
    multi = mesh is not None and mesh.devices.size > 1
    if use_pallas and multi:
        tp = mesh.shape.get("tp", 1)
        dp = mesh.shape.get("dp", 1)
        # per-shard locality requirements (else XLA ref path below)
        use_pallas = (
            hkv % tp == 0 and hq % tp == 0 and b % dp == 0
            and (hq // tp) % (hkv // tp) == 0
        )
        if use_pallas:
            ks_e = vs_e = None
            if quant_kv:
                ks_e, vs_e = _expand_kv_scales(
                    k_scale, v_scale, block_tables, block_size, hq, hkv)
            out = _pallas_decode_sharded(
                mesh, q[:, 0], k_cache, v_cache, block_tables, kv_lens,
                sm_scale, block_size, sliding_window, cur_k, cur_v,
                interpret=jax.default_backend() == "cpu",
                full_cache=full_cache, layer=layer,
                k_scale_e=ks_e, v_scale_e=vs_e,
            )
            return out[:, None]
    if use_pallas:
        from rtp_llm_tpu.ops.attention.pallas_decode import paged_decode_attention

        ks_e = vs_e = None
        if quant_kv:
            ks_e, vs_e = _expand_kv_scales(
                k_scale, v_scale, block_tables, block_size, hq, hkv)
        if full_cache is not None:
            out = paged_decode_attention(
                q[:, 0], full_cache, full_cache, block_tables, kv_lens,
                sm_scale, block_size=block_size,
                sliding_window=sliding_window,
                cur_k=cur_k, cur_v=cur_v,
                layer=-1 if dyn_layer else layer,
                layer_arr=(jnp.asarray(layer, jnp.int32).reshape(1)
                           if dyn_layer else None),
                k_scale_e=ks_e, v_scale_e=vs_e,
            )
        else:
            out = paged_decode_attention(
                q[:, 0], k_cache, v_cache, block_tables, kv_lens, sm_scale,
                block_size=block_size, sliding_window=sliding_window,
                cur_k=cur_k, cur_v=cur_v,
                k_scale_e=ks_e, v_scale_e=vs_e,
            )
        return out[:, None]
    use_pallas_prefill = (
        _enable_pallas_prefill()
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
        alibi_slopes=alibi_slopes,
    )


__all__ = ["paged_attention", "paged_attention_ref", "default_backend"]
