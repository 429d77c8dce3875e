"""Pallas TPU paged prefill attention (causal, GQA, single row).

TPU-native replacement for the reference's prefill FMHA backends (flashinfer
prefill / TRT-v2 fused MHA): flash attention over the paged pool with a block
table, supporting reused prefixes (q_offset > 0) and chunked prefill.

Design mirrors the decode kernel (pallas_decode.py):
  * pool layout [num_slots, Hkv*D]; contiguous block slabs, chunked DMA with
    double buffering;
  * one grid step = one tile of query tokens; the zero-expanded query trick
    turns GQA into a single MXU matmul: rows are (token-major x head) and
    the causal mask broadcasts per token over its heads;
  * fp32 online softmax across KV chunks.

Layouts:
  q            [T, Hq, D]      (one request, bucket length T)
  k/v cache    [NS, Hkv*D]     (current chunk's KV already written)
  block_table  [MB] i32        (scalar-prefetch)
  q_offset     scalar i32      (absolute position of q[0] = reused prefix len)
  kv_len       scalar i32      (total tokens incl. this chunk)
  out          [T, Hq, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 2
CHUNK_BLOCKS = 4
# 64 query tokens per grid step: rows = TILE*Hq with the zero-expanded
# query, and the kernel's fp32 accumulator [rows, Hkv*D] must fit the ~16 MB
# scoped VMEM alongside the double-buffered in/out blocks (TILE=128 with 28
# heads OOMs the stack allocator)
Q_TILE = 64


def _prefill_kernel(
    # scalar prefetch
    block_table_ref,  # [MB] i32 (SMEM)
    scalars_ref,  # [2] i32 (SMEM): [q_offset, kv_len]
    # inputs
    qe_ref,  # [TILE, Hq, Hkv*D] VMEM block (zero-expanded)
    k_hbm,  # [NS, Hkv*D] ANY
    v_hbm,  # [NS, Hkv*D] ANY
    # output
    o_ref,  # [TILE, Hq, Hkv*D] VMEM block
    # scratch
    k_buf,  # [NBUF, C*BS, Hkv*D]
    v_buf,
    sem,  # [NBUF, C, 2]
    *,
    bs: int,
    c: int,
    nbuf: int,
    tile: int,
    hq: int,
    sm_scale: float,
):
    ti = pl.program_id(0)
    q_offset = scalars_ref[0]
    kv_len = scalars_ref[1]
    hd = qe_ref.shape[2]

    # query rows of this tile attend to kv positions <= q_offset + token index;
    # the furthest token in the tile bounds the kv span
    tile_start = ti * tile
    span = jnp.minimum(q_offset + tile_start + tile, kv_len)
    num_blocks = jax.lax.div(span + bs - 1, bs)
    num_chunks = jax.lax.max(jax.lax.div(num_blocks + c - 1, c), 1)

    def slab(hbm, blk_idx):
        safe = jax.lax.min(blk_idx, jax.lax.max(num_blocks - 1, 0))
        start = pl.multiple_of(block_table_ref[safe] * bs, bs)
        return hbm.at[pl.ds(start, bs), :]

    def start_chunk(slot, ci):
        for j in range(c):
            blk = ci * c + j
            pltpu.make_async_copy(
                slab(k_hbm, blk), k_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 0]).start()
            pltpu.make_async_copy(
                slab(v_hbm, blk), v_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 1]).start()

    def wait_chunk(slot, ci):
        for j in range(c):
            blk = ci * c + j
            pltpu.make_async_copy(
                slab(k_hbm, blk), k_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 0]).wait()
            pltpu.make_async_copy(
                slab(v_hbm, blk), v_buf.at[slot, pl.ds(j * bs, bs), :],
                sem.at[slot, j, 1]).wait()

    for j in range(nbuf):
        @pl.when(j < num_chunks)
        def _(j=j):
            start_chunk(j, j)

    rows = tile * hq
    # bf16 operands straight into the MXU (f32 copies of [rows, HD] arrays
    # are what used to OOM the VMEM stack); sm_scale folds into the scores
    cdt = jnp.float32 if k_buf.dtype == jnp.float32 else jnp.bfloat16
    qe = qe_ref[...].reshape(rows, hd).astype(cdt)
    # absolute position of each row's query token (row = t * Hq + h)
    row_t = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // hq
    q_pos = q_offset + tile_start + row_t  # [rows, 1]

    def body(ci, carry):
        m, l, acc = carry
        slot = jax.lax.rem(ci, nbuf)
        wait_chunk(slot, ci)
        k = k_buf[slot]
        v = v_buf[slot]
        s = sm_scale * jax.lax.dot_general(
            qe, k.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, C*BS]
        kv_pos = ci * (c * bs) + jax.lax.broadcasted_iota(
            jnp.int32, (1, c * bs), 1
        )
        mask = (kv_pos > q_pos) | (kv_pos >= kv_len)
        s = jnp.where(mask, NEG_INF, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(cdt), v.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * alpha + pv

        @pl.when(ci + nbuf < num_chunks)
        def _():
            start_chunk(slot, ci + nbuf)

        return m_new, l_new, acc_new

    m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_chunks, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-20)
    valid = q_pos < kv_len  # padded tail of the bucket
    out = jnp.where(valid, out, 0.0)
    o_ref[...] = out.reshape(tile, hq, hd).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_size", "interpret")
)
def paged_prefill_attention(
    q: jnp.ndarray,  # [T, Hq, D]
    k_cache: jnp.ndarray,  # [NS, Hkv*D]
    v_cache: jnp.ndarray,
    block_table: jnp.ndarray,  # [MB] i32
    q_offset: jnp.ndarray,  # scalar i32
    kv_len: jnp.ndarray,  # scalar i32
    sm_scale: float,
    block_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    t, hq, d = q.shape
    hd = k_cache.shape[1]
    hkv = hd // d
    g = hq // hkv
    tile = min(Q_TILE, t)
    assert t % tile == 0, (t, tile)

    q4 = q.reshape(t, hkv, g, d)
    eye = jnp.eye(hkv, dtype=q.dtype)
    q_exp = jnp.einsum("tkgd,kh->tkghd", q4, eye).reshape(t, hq, hd)
    scalars = jnp.stack([q_offset.astype(jnp.int32), kv_len.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t // tile,),
        in_specs=[
            pl.BlockSpec((tile, hq, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, hq, hd), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, CHUNK_BLOCKS * block_size, hd), k_cache.dtype),
            pltpu.VMEM((NBUF, CHUNK_BLOCKS * block_size, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF, CHUNK_BLOCKS, 2)),
        ],
    )
    # the fp32 accumulator + double-buffered q/o tiles total ~18 MB at
    # TILE=64/Hq=28 — just over Mosaic's 16 MB scoped-vmem default (v5e has
    # 128 MiB physical VMEM); raise the per-kernel limit instead of
    # shrinking the tile (TILE=32 halves MXU row utilization)
    kw = {}
    try:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20)
    except TypeError:  # older pallas: no vmem_limit knob
        pass
    out_full = pl.pallas_call(
        functools.partial(
            _prefill_kernel, bs=block_size, c=CHUNK_BLOCKS, nbuf=NBUF,
            tile=tile, hq=hq, sm_scale=sm_scale,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, hq, hd), q.dtype),
        interpret=interpret,
        **kw,
    )(block_table, scalars, q_exp, k_cache, v_cache)

    of = out_full.reshape(t, hkv, g, hkv, d)
    out = jnp.einsum("tkghd,kh->tkgd", of, eye.astype(out_full.dtype))
    return out.reshape(t, hq, d)
