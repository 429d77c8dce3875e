"""Paged KV cache device ops: slot computation and scatter writes.

TPU-native equivalent of the reference's KV-cache write kernels
(models_py/bindings/common/kernels/kv_cache_kernels.cu).

Pool layout (per layer, per k/v): ``[num_blocks * block_size, Hkv * D]`` —
flat slot-major rows with all kv heads folded into the lane dimension. Chosen
for the TPU memory system:

  * one block's slab is ``[block_size, Hkv*D]`` — fully contiguous in HBM
    (e.g. 32 x 512 x 2B = 32 KiB), so the Pallas decode kernel streams whole
    blocks with large aligned DMAs instead of per-head 8 KiB strided reads;
  * the tiled (sublane, lane) dims are (slots, Hkv*D): block-aligned slices
    on the slot dim satisfy Mosaic's tiling rules, and per-head access inside
    a kernel is a cheap lane slice at multiples of 128 (head_dim);
  * a token's KV write is a plain row scatter ``cache.at[slots]``.

A token at absolute position ``p`` of a request with block table ``bt`` lives
at flat slot ``bt[p // block_size] * block_size + p % block_size``. Block 0 is
the reserved null block: padded / inactive tokens are directed there
(reference analog: garbage blocks for fake streams).
"""

from __future__ import annotations

import jax.numpy as jnp


def token_slots(
    positions: jnp.ndarray, block_table: jnp.ndarray, block_size: int, valid: jnp.ndarray
) -> jnp.ndarray:
    """Flat cache slots for tokens at ``positions`` (int32). Invalid -> OOB (dropped).

    positions: [...]; block_table: [..., max_blocks] aligned with positions' leading
    dims (or 1-D for a single sequence); valid: bool [...].
    """
    block_idx = positions // block_size
    offs = positions % block_size
    if block_table.ndim == 1:
        blocks = block_table[block_idx]
    else:
        blocks = jnp.take_along_axis(block_table, block_idx, axis=-1)
    slots = blocks * block_size + offs
    # invalid -> large positive (out of bounds HIGH, so scatter mode="drop" drops
    # it; -1 would wrap to the last slot under numpy-style negative indexing)
    return jnp.where(valid, slots, jnp.int32(2**30))


def write_kv(
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    slots: jnp.ndarray,
):
    """Scatter new KV rows into the paged cache.

    k_cache/v_cache: [num_slots, Hkv*D] (num_slots = num_blocks * block_size)
    k_new/v_new: [T, Hkv, D] (or [T, Hkv*D]); slots: [T] flat slots
    (out-of-bounds = drop). Under jit with donated caches this is an in-place
    row scatter.
    """
    t = k_new.shape[0]
    kt = k_new.reshape(t, -1).astype(k_cache.dtype)
    vt = v_new.reshape(t, -1).astype(v_cache.dtype)
    k_cache = k_cache.at[slots].set(kt, mode="drop")
    v_cache = v_cache.at[slots].set(vt, mode="drop")
    return k_cache, v_cache


def quantize_kv(k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Symmetric per-(token, kv-head) int8 quantization for KV rows.

    Reference analog: int8 KV cache with per-head scales (KVCacheConfig
    kv_cache_dtype, ConfigModules.h:146-208). k_new/v_new: [T, Hkv, D] ->
    (q rows [T, Hkv*D] int8, scales [T, Hkv] bf16).
    """

    def q(x):
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)  # [T, Hkv]
        scale = jnp.maximum(amax / 127.0, 1e-8)
        qx = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
        return qx.astype(jnp.int8).reshape(x.shape[0], -1), scale.astype(jnp.bfloat16)

    kq, ks = q(k_new)
    vq, vs = q(v_new)
    return kq, ks, vq, vs


def write_kv_quant(
    k_cache, v_cache, k_scale, v_scale, k_new, v_new, slots
):
    """Quantize + scatter KV rows into an int8 pool with per-row scale arrays.

    k_cache/v_cache: [num_slots, Hkv*D] int8; k_scale/v_scale: [num_slots, Hkv];
    k_new/v_new: [T, Hkv, D]; slots: [T] (OOB = drop).
    """
    kq, ks, vq, vs = quantize_kv(k_new, v_new)
    k_cache = k_cache.at[slots].set(kq, mode="drop")
    v_cache = v_cache.at[slots].set(vq, mode="drop")
    k_scale = k_scale.at[slots].set(ks, mode="drop")
    v_scale = v_scale.at[slots].set(vs, mode="drop")
    return k_cache, v_cache, k_scale, v_scale
