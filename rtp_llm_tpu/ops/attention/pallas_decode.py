"""Pallas TPU paged decode attention (GQA/MHA, T=1).

The hot serving kernel — TPU-native replacement for the reference's decode
FMHA backends (flashinfer decode / XQA, rtp_llm/models_py/modules/factory/
attention/attn_factory.py:200). One grid program per (batch row, kv head):
KV blocks stream HBM->VMEM with double-buffered DMA driven by the
scalar-prefetched block table, so HBM traffic is proportional to each row's
*actual* kv length — unlike a gather over the padded block table. Online
(flash) softmax in fp32.

Layouts:
  q          [B, Hq, D]                 (T = 1)
  k/v cache  [Hkv, NB*BS, D]            (head-major flat-slot pool, in HBM;
                                         head axis untiled => aligned DMA)
  block_tables [B, MB] i32 (scalar-prefetch)
  kv_lens      [B] i32     (scalar-prefetch; counts tokens already written,
                            including this step's token)
  out        [B, Hq, D]
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, MB] i32 (SMEM)
    kv_lens_ref,  # [B] i32 (SMEM)
    # inputs
    q_ref,  # [1, 1, G, D] VMEM block
    k_hbm,  # [Hkv, NB*BS, D] ANY/HBM
    v_hbm,  # [Hkv, NB*BS, D] ANY/HBM
    # output
    o_ref,  # [1, 1, G, D] VMEM block
    # scratch
    k_buf,  # [2, BS, D] VMEM
    v_buf,  # [2, BS, D] VMEM
    sem,  # DMA sems [2, 2]
    *,
    bs: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    g, d = q_ref.shape[2], q_ref.shape[3]

    kv_len = kv_lens_ref[b]
    num_blocks = jax.lax.div(kv_len + bs - 1, bs)

    def slab(hbm, i):
        start = pl.multiple_of(block_tables_ref[b, i] * bs, bs)
        return hbm.at[h, pl.ds(start, bs), :]

    def start_dma(slot, i):
        pltpu.make_async_copy(slab(k_hbm, i), k_buf.at[slot], sem.at[slot, 0]).start()
        pltpu.make_async_copy(slab(v_hbm, i), v_buf.at[slot], sem.at[slot, 1]).start()

    def wait_dma(slot, i):
        pltpu.make_async_copy(slab(k_hbm, i), k_buf.at[slot], sem.at[slot, 0]).wait()
        pltpu.make_async_copy(slab(v_hbm, i), v_buf.at[slot], sem.at[slot, 1]).wait()

    @pl.when(num_blocks > 0)
    def _():
        start_dma(0, 0)

    q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # [G, D]

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_blocks)
        def _():
            start_dma(jax.lax.rem(i + 1, 2), i + 1)

        wait_dma(slot, i)
        k = k_buf[slot].astype(jnp.float32)  # [BS, D]
        v = v_buf[slot].astype(jnp.float32)  # [BS, D]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, BS]
        pos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        s = jnp.where(pos < kv_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))  # [G,1]
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # [G, BS]
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-20)
    # inactive rows (kv_len == 0): return zeros
    out = jnp.where(kv_len > 0, out, 0.0)
    o_ref[0, 0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_size", "interpret")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hq, D]
    k_cache: jnp.ndarray,  # [Hkv, NB*BS, D]
    v_cache: jnp.ndarray,  # [Hkv, NB*BS, D]
    block_tables: jnp.ndarray,  # [B, MB] i32
    kv_lens: jnp.ndarray,  # [B] i32
    sm_scale: float,
    block_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, d = q.shape
    hkv = k_cache.shape[0]
    bs = block_size
    g = hq // hkv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(
                (1, 1, g, d), lambda i, j, *_: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, g, d), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bs, d), k_cache.dtype),
            pltpu.VMEM((2, bs, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    q4 = q.reshape(b, hkv, g, d)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, bs=bs, sm_scale=sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        interpret=interpret,
    )(block_tables, kv_lens, q4, k_cache, v_cache)
    return out.reshape(b, hq, d)
