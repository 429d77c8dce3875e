"""Paged KV cache device ops: slot computation and scatter writes.

TPU-native equivalent of the reference's KV-cache write kernels
(models_py/bindings/common/kernels/kv_cache_kernels.cu). The cache for one
layer is ``[num_blocks, block_size, kv_heads, head_dim]``; a token at absolute
position ``p`` of a request with block table ``bt`` lives at flat slot
``bt[p // block_size] * block_size + p % block_size``.

Block 0 of the pool is reserved as the *null block*: padded / inactive tokens
are directed there (reference analog: garbage blocks for fake streams).
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

    k_cache/v_cache: [num_blocks, block_size, H, D]
    k_new/v_new: [T, H, D]; slots: [T] flat slots (out-of-bounds = drop).
    Returns updated (k_cache, v_cache). Under jit with donated caches this is an
    in-place scatter.
    """
    nb, bs, h, d = k_cache.shape
    kf = k_cache.reshape(nb * bs, h, d)
    vf = v_cache.reshape(nb * bs, h, d)
    kf = kf.at[slots].set(k_new.astype(kf.dtype), mode="drop")
    vf = vf.at[slots].set(v_new.astype(vf.dtype), mode="drop")
    return kf.reshape(nb, bs, h, d), vf.reshape(nb, bs, h, d)
