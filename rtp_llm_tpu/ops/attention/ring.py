"""Ring attention over the cp mesh axis (long-context prefill).

Reference analog: PCPAll2AllAttnOp — ring KV rotation with partial-softmax
merging (cuda_cp_impl/prefill_cp_flashinfer.py:55-125, CPRotateMethod
ALLTOALL). TPU-native: shard_map over the "cp" axis, KV chunks rotate with
``lax.ppermute`` (ICI neighbor exchange) while each shard keeps its local Q,
partials merged with the online-softmax recurrence (the flashinfer
merge_state analog).

Causality over chunks follows absolute positions, so sequence chunks can be
assigned to ranks contiguously (this implementation) or zig-zag (the
reference's load-balancing layout) — the math is identical, only the
position offsets change.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def ring_prefill_attention(
    q: jnp.ndarray,  # [T, Hq, D] full sequence (sharded over cp inside)
    k: jnp.ndarray,  # [T, Hkv, D]
    v: jnp.ndarray,  # [T, Hkv, D]
    mesh,
    sm_scale: float,
    axis: str = "cp",
) -> jnp.ndarray:
    """Causal self-attention computed ring-wise over ``axis``. T must divide
    by the axis size."""
    n = mesh.shape[axis]
    t, hq, d = q.shape
    assert t % n == 0, (t, n)
    tc = t // n
    hkv = k.shape[1]
    g = hq // hkv

    def local(q_l, k_l, v_l):
        # q_l/k_l/v_l: [Tc, H*, D] local chunk; rank r owns positions
        # [r*Tc, (r+1)*Tc)
        r = jax.lax.axis_index(axis)
        q_pos = r * tc + jnp.arange(tc, dtype=jnp.int32)  # [Tc]
        qf = q_l.reshape(tc, hkv, g, d).astype(jnp.float32) * sm_scale

        m = jnp.full((tc, hkv, g, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((tc, hkv, g, 1), jnp.float32)
        acc = jnp.zeros((tc, hkv, g, d), jnp.float32)
        k_cur, v_cur = k_l, v_l
        src = r  # which rank's chunk we currently hold

        perm = [(i, (i + 1) % n) for i in range(n)]  # rotate right
        for step in range(n):
            # COMM/COMPUTE OVERLAP (reference: the allgather_cp overlap
            # variant, cuda_cp_impl/prefill_mha/allgather_cp_impl.py:34):
            # issue next chunk's ppermute BEFORE this chunk's attention —
            # the collective and the einsums are then independent dataflow
            # nodes, so XLA's latency-hiding scheduler runs the ICI
            # transfer under the whole chunk's compute instead of after it.
            k_next = v_next = None
            if step + 1 < n:
                k_next = jax.lax.ppermute(k_cur, axis, perm)
                v_next = jax.lax.ppermute(v_cur, axis, perm)
            kv_pos = src * tc + jnp.arange(tc, dtype=jnp.int32)  # [Tc]
            s = jnp.einsum(
                "thgd,shd->thgs", qf, k_cur.astype(jnp.float32)
            )  # [Tc,hkv,g,Tc]
            mask = kv_pos[None, :] <= q_pos[:, None]  # [Tc,Tc]
            s = jnp.where(mask[:, None, None, :], s, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            # fully-masked rows against this chunk: p rows are exp(NEG_INF - m)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "thgs,shd->thgd", p, v_cur.astype(jnp.float32)
            )
            m = m_new

            if step + 1 < n:
                k_cur, v_cur = k_next, v_next
                src = (src - 1) % n

        out = acc / jnp.maximum(l, 1e-20)
        return out.reshape(tc, hq, d).astype(q_l.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(q, k, v)


def zigzag_perm(t: int, n: int) -> "jnp.ndarray":
    """Token-column permutation for the zig-zag CP layout (reference:
    ZigzagProcessor.h:18): the sequence splits into 2n chunks and rank r
    owns chunks r and 2n-1-r, balancing causal-attention work (early ranks
    otherwise see mostly-masked KV). Returns perm such that
    permuted[i] = original[perm[i]]; columns [r*tc .. (r+1)*tc) of the
    permuted layout land on rank r under a plain "cp" sharding."""
    import numpy as np

    assert t % (2 * n) == 0, (t, n)
    c = t // (2 * n)
    order = []
    for r in range(n):
        order.extend(range(r * c, (r + 1) * c))
        order.extend(range((2 * n - 1 - r) * c, (2 * n - r) * c))
    return jnp.asarray(np.asarray(order, np.int32))


def ring_prefill_attention_pos(
    q: jnp.ndarray,  # [B, T, Hq, D] (any token order; causality via positions)
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,  # [B, T, Hkv, D]
    positions: jnp.ndarray,  # [B, T] i32 absolute position per column
    mesh,
    sm_scale: float,
    axis: str = "cp",
) -> jnp.ndarray:
    """Batched ring attention with EXPLICIT positions: the causal mask
    compares absolute positions instead of assuming rank-contiguous chunks,
    so one kernel serves both the contiguous and zig-zag layouts (the engine
    permutes columns; KV-cache writes key on positions and are layout-safe).
    Padded columns carry a huge sentinel position: as keys they are masked
    for every real query, as queries they produce ignored rows."""
    n = mesh.shape[axis]
    b, t, hq, d = q.shape
    assert t % n == 0, (t, n)
    tc = t // n
    hkv = k.shape[1 + 1]
    g = hq // hkv

    def local(q_l, k_l, v_l, pos_l):
        # [B, Tc, H*, D] local columns; absolute positions drive the mask
        q_pos = pos_l  # [B, Tc]
        qf = q_l.reshape(b, tc, hkv, g, d).astype(jnp.float32) * sm_scale
        m = jnp.full((b, tc, hkv, g, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((b, tc, hkv, g, 1), jnp.float32)
        acc = jnp.zeros((b, tc, hkv, g, d), jnp.float32)
        k_cur, v_cur, p_cur = k_l, v_l, pos_l

        perm = [(i, (i + 1) % n) for i in range(n)]
        for step in range(n):
            # prefetch next chunk BEFORE compute — see the overlap note in
            # ring_prefill_attention (allgather_cp_impl.py:34 analog)
            nxt = None
            if step + 1 < n:
                nxt = (jax.lax.ppermute(k_cur, axis, perm),
                       jax.lax.ppermute(v_cur, axis, perm),
                       jax.lax.ppermute(p_cur, axis, perm))
            s = jnp.einsum(
                "bthgd,bshd->bthgs", qf, k_cur.astype(jnp.float32))
            mask = p_cur[:, None, :] <= q_pos[:, :, None]  # [B, Tc, Tc]
            s = jnp.where(mask[:, :, None, None, :], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum(
                "bthgs,bshd->bthgd", p, v_cur.astype(jnp.float32))
            m = m_new
            if step + 1 < n:
                k_cur, v_cur, p_cur = nxt

        out = acc / jnp.maximum(l, 1e-20)
        return out.reshape(b, tc, hq, d).astype(q_l.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=P(None, axis),
    )
    return fn(q, k, v, positions)
