"""Paged KV cache device ops: slot computation and scatter writes.

TPU-native equivalent of the reference's KV-cache write kernels
(models_py/bindings/common/kernels/kv_cache_kernels.cu).

Pool layout (per layer, per k/v): ``[Hkv, num_blocks * block_size, D]`` —
head-major with a flat slot axis. This ordering is chosen for the TPU memory
system: the tiled (sublane, lane) dims are (slots, D), so the Pallas decode
kernel can DMA one block's slab ``[block_size, D]`` for one head with aligned
slices (head axis is untiled), and a block's tokens are contiguous in HBM.

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

    k_cache/v_cache: [Hkv, num_slots, D] (num_slots = num_blocks * block_size)
    k_new/v_new: [T, Hkv, D]; slots: [T] flat slots (out-of-bounds = drop).
    Returns updated (k_cache, v_cache). Under jit with donated caches this is an
    in-place scatter.
    """
    kt = jnp.swapaxes(k_new, 0, 1).astype(k_cache.dtype)  # [Hkv, T, D]
    vt = jnp.swapaxes(v_new, 0, 1).astype(v_cache.dtype)
    k_cache = k_cache.at[:, slots].set(kt, mode="drop")
    v_cache = v_cache.at[:, slots].set(vt, mode="drop")
    return k_cache, v_cache
