"""Pallas TPU paged decode attention (GQA/MHA, T=1).

The hot serving kernel — TPU-native replacement for the reference's decode
FMHA backends (flashinfer decode / XQA, rtp_llm/models_py/modules/factory/
attention/attn_factory.py:200).

Design notes (v2):
  * pallas grid steps execute SERIALLY on a TensorCore, so the unit of work
    must be large enough to hide DMA latency: one grid step = one batch row,
    ALL kv heads;
  * the pool layout [num_slots, Hkv*D] (ops/kv_cache.py) makes one block's
    slab a contiguous [block_size, Hkv*D] region (e.g. 32 KiB) — large
    aligned DMAs instead of per-head strided 8 KiB reads;
  * a 4-deep DMA pipeline (k and v issued together) keeps the HBM streams
    busy while the VPU/MXU does the online-softmax math of earlier blocks;
  * scores/softmax in fp32; per-head state is a small pytree carried through
    the block loop.

Layouts:
  q            [B, Hq, D]           (T = 1)
  k/v cache    [NS, Hkv*D]          (paged pool, stays in HBM)
  block_tables [B, MB] i32          (scalar-prefetch)
  kv_lens      [B] i32              (scalar-prefetch; includes current token)
  out          [B, Hq, D]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 4  # DMA pipeline depth (blocks in flight per stream)


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, MB] i32 (SMEM)
    kv_lens_ref,  # [B] i32 (SMEM)
    # inputs
    q_ref,  # [1, Hq, D] VMEM block
    k_hbm,  # [NS, Hkv*D] ANY/HBM
    v_hbm,  # [NS, Hkv*D] ANY/HBM
    # output
    o_ref,  # [1, Hq, D] VMEM block
    # scratch
    k_buf,  # [NBUF, BS, Hkv*D] VMEM
    v_buf,  # [NBUF, BS, Hkv*D] VMEM
    sem,  # DMA sems [NBUF, 2]
    *,
    bs: int,
    hkv: int,
    d: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    hq = q_ref.shape[1]
    g = hq // hkv

    kv_len = kv_lens_ref[b]
    num_blocks = jax.lax.div(kv_len + bs - 1, bs)

    def slab(hbm, i):
        start = pl.multiple_of(block_tables_ref[b, i] * bs, bs)
        return hbm.at[pl.ds(start, bs), :]

    def start_dma(slot, i):
        pltpu.make_async_copy(slab(k_hbm, i), k_buf.at[slot], sem.at[slot, 0]).start()
        pltpu.make_async_copy(slab(v_hbm, i), v_buf.at[slot], sem.at[slot, 1]).start()

    def wait_dma(slot, i):
        pltpu.make_async_copy(slab(k_hbm, i), k_buf.at[slot], sem.at[slot, 0]).wait()
        pltpu.make_async_copy(slab(v_hbm, i), v_buf.at[slot], sem.at[slot, 1]).wait()

    # warm the pipeline
    for j in range(NBUF):
        @pl.when(j < num_blocks)
        def _(j=j):
            start_dma(j, j)

    q = q_ref[0].astype(jnp.float32) * sm_scale  # [Hq, D]

    def body(i, carry):
        m, l, acc = carry  # [Hq,1], [Hq,1], [Hq,D]
        slot = jax.lax.rem(i, NBUF)
        wait_dma(slot, i)
        k = k_buf[slot]  # [BS, Hkv*D]
        v = v_buf[slot]

        pos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
        invalid = pos >= kv_len  # [1, BS]

        # per-kv-head scores; q rows h*g:(h+1)*g share kv head h
        s_parts = []
        for h in range(hkv):
            kh = k[:, h * d : (h + 1) * d].astype(jnp.float32)  # [BS, D]
            qh = q[h * g : (h + 1) * g]  # [G, D]
            s_h = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, BS]
            s_parts.append(s_h)
        s = jnp.concatenate(s_parts, axis=0) if hkv > 1 else s_parts[0]  # [Hq, BS]
        s = jnp.where(invalid, NEG_INF, s)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)  # [Hq, BS]
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)

        o_parts = []
        for h in range(hkv):
            vh = v[:, h * d : (h + 1) * d].astype(jnp.float32)  # [BS, D]
            ph = p[h * g : (h + 1) * g]  # [G, BS]
            o_h = jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [G, D]
            o_parts.append(o_h)
        pv = jnp.concatenate(o_parts, axis=0) if hkv > 1 else o_parts[0]  # [Hq, D]
        acc_new = acc * alpha + pv

        @pl.when(i + NBUF < num_blocks)
        def _():
            start_dma(slot, i + NBUF)

        return m_new, l_new, acc_new

    m0 = jnp.full((hq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hq, 1), jnp.float32)
    acc0 = jnp.zeros((hq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-20)
    out = jnp.where(kv_len > 0, out, 0.0)  # inactive rows -> zeros
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_size", "interpret")
)
def paged_decode_attention(
    q: jnp.ndarray,  # [B, Hq, D]
    k_cache: jnp.ndarray,  # [NS, Hkv*D]
    v_cache: jnp.ndarray,  # [NS, Hkv*D]
    block_tables: jnp.ndarray,  # [B, MB] i32
    kv_lens: jnp.ndarray,  # [B] i32
    sm_scale: float,
    block_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, d = q.shape
    hkv = k_cache.shape[1] // d
    bs = block_size

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, bs, hkv * d), k_cache.dtype),
            pltpu.VMEM((NBUF, bs, hkv * d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, bs=bs, hkv=hkv, d=d, sm_scale=sm_scale
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(block_tables, kv_lens, q, k_cache, v_cache)
    return out
