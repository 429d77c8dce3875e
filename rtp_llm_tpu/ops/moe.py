"""Fused MoE: sort-based ragged dispatch + grouped GEMM.

TPU-native replacement for the reference's fused-MoE strategy stack
(models_py/modules/factory/fused_moe/ — cutlass group GEMM, DeepEP
dispatch/combine): token->expert assignments are sorted by expert and the
expert FFNs run as grouped matmuls via ``jax.lax.ragged_dot`` (the MXU-native
grouped GEMM; on TPU this is megablox-style, no capacity padding and no
dropped tokens). Dense-compute fallback retained for tiny models/tests.

Under expert sharding (EP folded into tp), the stacked expert weights are
sharded on the expert axis and GSPMD turns the ragged dispatch into the
all-to-all equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fused_moe(
    x: jnp.ndarray,  # [N, H]
    top_idx: jnp.ndarray,  # [N, K] expert ids
    top_weights: jnp.ndarray,  # [N, K] combine weights (already normalized/scaled)
    w_gate: jnp.ndarray,  # [E, H, I]
    w_up: jnp.ndarray,  # [E, H, I]
    w_down: jnp.ndarray,  # [E, I, H]
) -> jnp.ndarray:
    """Returns [N, H] float32 combined expert outputs."""
    n, h = x.shape
    k = top_idx.shape[1]
    e = w_gate.shape[0]

    flat_expert = top_idx.reshape(-1)  # [N*K]
    order = jnp.argsort(flat_expert)  # stable sort by expert
    token_of = order // k  # source token per sorted assignment
    xs = jnp.take(x, token_of, axis=0)  # [N*K, H]
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)
    up = jax.lax.ragged_dot(xs, w_up, group_sizes)
    act = jax.nn.silu(gate) * up
    down = jax.lax.ragged_dot(act.astype(x.dtype), w_down, group_sizes)  # [N*K, H]

    w_flat = jnp.take(top_weights.reshape(-1), order)  # weight per sorted row
    contrib = down.astype(jnp.float32) * w_flat[:, None].astype(jnp.float32)
    out = jnp.zeros((n, h), jnp.float32).at[token_of].add(contrib)
    return out


def dense_moe(
    x: jnp.ndarray, comb: jnp.ndarray, w_gate, w_up, w_down
) -> jnp.ndarray:
    """All-experts dense compute (every expert sees every token), combined by
    a dense [N, E] weight matrix — O(E) flops blowup; correctness baseline."""
    gate = jnp.einsum("nh,ehi->eni", x, w_gate)
    up = jnp.einsum("nh,ehi->eni", x, w_up)
    down = jnp.einsum("eni,eih->enh", jax.nn.silu(gate) * up, w_down)
    return jnp.einsum("enh,ne->nh", down.astype(jnp.float32), comb)
