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
