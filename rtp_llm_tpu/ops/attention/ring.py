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
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
                src = (src - 1) % n

        out = acc / jnp.maximum(l, 1e-20)
        return out.reshape(tc, hq, d).astype(q_l.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(q, k, v)
