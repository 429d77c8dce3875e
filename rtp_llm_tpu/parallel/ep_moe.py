"""Expert-parallel MoE: capacity-based dispatch/combine + shard_map EP.

TPU-native analog of the reference's DeepEP dispatch/combine wrappers
(rtp_llm/models_py/distributed/deepep_wrapper.py:90-236) and the fused-MoE
strategy registry (models_py/modules/factory/fused_moe/factory.py:16).

Design (TPU-first, not a DeepEP translation):
  * Fixed expert *capacity* turns the ragged token->expert assignment into a
    static-shape [E, C, H] gather, so every expert FFN is one batched GEMM
    with STATIC shapes — exactly what the MXU + XLA want. This is the
    GShard/Switch dispatch scheme; capacity_factor controls the
    overflow-drop probability (DeepEP is drop-free but pays dynamic-shape
    RDMA a2a, which XLA cannot compile).
  * Works with quantized experts directly: the per-expert GEMM calls
    quantized_matmul (int8/int4 weights stay int8/int4 in HBM) — this kills
    the round-1 dense fallback that computed EVERY expert on EVERY token
    (O(E) flops, llama_family.py:343).
  * Under a mesh, experts shard over the ``tp`` axis (the reference's
    DP=EP=#ranks deployment folds EP into the device axis the same way):
    each shard gathers only its local experts' tokens from the (replicated)
    activations — the all-to-all "dispatch" — computes local expert FFNs,
    and the combine is a psum over the axis. XLA lowers the psum to an ICI
    all-reduce; no host-side comm code.
  * Gating counts [E] are returned for the EPLB feedback loop (reference:
    need_moe_gating / ExpertBalancer::stepForward, NormalExecutor.cc:190).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def expert_capacity(n_assign: int, num_experts: int,
                    capacity_factor: float = 2.0, cap_min: int = 8) -> int:
    """Static per-expert token capacity (rounded up to a multiple of 8 for
    TPU sublane alignment)."""
    c = int(n_assign / max(num_experts, 1) * capacity_factor)
    c = max(c, cap_min)
    return (c + 7) // 8 * 8


def build_dispatch(top_idx: jnp.ndarray,  # [N, K] global expert ids
                   capacity: int,
                   expert_offset: int = 0,
                   num_local: int = 0):
    """Assignment bookkeeping for a (shard-local) expert range.

    Returns (slot [N,K] position within expert buffer, local_idx [N,K]
    expert id relative to the shard, keep [N,K] bool). Overflowing
    assignments beyond ``capacity`` are dropped (capacity_factor sizes this
    to be rare; exactness tests use generous capacity)."""
    n, k = top_idx.shape
    local = top_idx - expert_offset  # [N,K]
    mine = (local >= 0) & (local < num_local)
    flat = jnp.where(mine, local, num_local).reshape(-1)  # [N*K]
    # rank of each assignment within its expert, in (token, k) order
    onehot = flat[:, None] == jnp.arange(num_local)[None, :]  # [N*K, E_l]
    rank = (jnp.cumsum(onehot, axis=0) - 1)  # [N*K, E_l]
    slot = jnp.where(onehot, rank, 0).sum(-1).reshape(n, k)
    keep = mine & (slot < capacity)
    return slot, jnp.where(mine, local, 0), keep


def capacity_moe_local(
    x: jnp.ndarray,  # [N, H]
    top_idx: jnp.ndarray,  # [N, K] global expert ids
    top_weights: jnp.ndarray,  # [N, K] combine weights
    w_gate, w_up, w_down,  # [E_l, H, I] / [E_l, I, H] (quant dict via scales)
    scales: Optional[dict] = None,  # {"gate": [E_l,I], "up":..., "down": [E_l,H]}
    zeros: Optional[dict] = None,   # asymmetric (GPTQ) zero points
    capacity: int = 0,
    expert_offset: int = 0,
    act=jax.nn.silu,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Capacity-dispatch MoE over one shard's experts.

    Returns ([N, H] f32 combined output for assignments landing on these
    experts, [E_l] i32 gating counts). Pure function — usable standalone
    (single device, expert_offset=0) or per-shard inside shard_map."""
    from rtp_llm_tpu.quant.weight_only import quantized_matmul

    n, h = x.shape
    k = top_idx.shape[1]
    e_l = w_gate.shape[0]
    if capacity <= 0:
        capacity = expert_capacity(n * k, e_l)

    slot, local_idx, keep = build_dispatch(
        top_idx, capacity=capacity,
        expert_offset=expert_offset, num_local=e_l,
    )
    counts = jnp.sum(
        (top_idx - expert_offset).reshape(-1)[:, None]
        == jnp.arange(e_l)[None, :], axis=0,
    ).astype(jnp.int32)

    # dispatch: scatter tokens into the [E_l, C, H] buffer ((e, slot) pairs
    # are unique among kept assignments; dropped ones land OOB)
    buf = jnp.zeros((e_l, capacity, h), x.dtype)
    tok = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    e_idx = jnp.where(keep, local_idx, e_l)  # OOB row -> dropped
    buf = buf.at[e_idx, slot].set(x[tok], mode="drop")

    # expert FFN: batched per-expert GEMMs (int8/int4 weights stay quantized)
    s = scales or {}
    z = zeros or {}
    if s.get("gate") is None:
        def ffn(xb, wg, wu, wd):
            g = quantized_matmul(xb, wg, None)
            u = quantized_matmul(xb, wu, None)
            return quantized_matmul((act(g) * u).astype(xb.dtype), wd, None)

        out_buf = jax.vmap(ffn)(buf, w_gate, w_up, w_down)
    elif z.get("gate") is None:
        def ffn(xb, wg, wu, wd, sg, su, sd):
            g = quantized_matmul(xb, wg, sg)
            u = quantized_matmul(xb, wu, su)
            return quantized_matmul((act(g) * u).astype(xb.dtype), wd, sd)

        out_buf = jax.vmap(ffn)(buf, w_gate, w_up, w_down,
                                s["gate"], s["up"], s["down"])
    else:
        def ffn(xb, wg, wu, wd, sg, su, sd, zg, zu, zd):
            g = quantized_matmul(xb, wg, sg, zg)
            u = quantized_matmul(xb, wu, su, zu)
            return quantized_matmul((act(g) * u).astype(xb.dtype), wd, sd, zd)

        out_buf = jax.vmap(ffn)(buf, w_gate, w_up, w_down,
                                s["gate"], s["up"], s["down"],
                                z["gate"], z["up"], z["down"])
    # [E_l, C, H]

    # combine: gather each kept assignment's output row, weight, sum over K
    got = out_buf[e_idx, slot]  # [N, K, H] (dropped rows read garbage)
    got = jnp.where(keep[..., None], got, 0).astype(jnp.float32)
    out = jnp.sum(got * top_weights[..., None].astype(jnp.float32), axis=1)
    return out, counts


def ep_moe(
    x: jnp.ndarray,  # [N, H]
    top_idx: jnp.ndarray,  # [N, K]
    top_weights: jnp.ndarray,  # [N, K]
    w_gate, w_up, w_down,  # [E, H, I] etc — expert dim sharded over axis
    mesh=None,
    axis: str = "tp",
    scales: Optional[dict] = None,
    zeros: Optional[dict] = None,
    capacity_factor: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expert-parallel MoE. Returns ([N, H] f32, [E] i32 gating counts).

    With a mesh: shard_map over ``axis`` — dispatch is a local gather of the
    replicated activations (the a2a "send"), combine is one psum (the a2a
    "receive" + reduction). Without a mesh: single-shard capacity MoE."""
    n, k = top_idx.shape
    e = w_gate.shape[0]

    if mesh is None or mesh.shape.get(axis, 1) == 1 or e % mesh.shape[axis]:
        cap = expert_capacity(n * k, e, capacity_factor)
        return capacity_moe_local(
            x, top_idx, top_weights, w_gate, w_up, w_down,
            scales=scales, zeros=zeros, capacity=cap,
        )

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    n_shards = mesh.shape[axis]
    e_local = e // n_shards
    cap = expert_capacity(n * k, e, capacity_factor)

    sc_names = tuple((scales or {}).keys())
    zr_names = tuple((zeros or {}).keys())

    def local_fn(x, top_idx, top_weights, wg, wu, wd, sc_vals, zr_vals):
        shard = jax.lax.axis_index(axis)
        off = shard * e_local
        sc = dict(zip(sc_names, sc_vals)) if sc_names else None
        zr = dict(zip(zr_names, zr_vals)) if zr_names else None
        out, counts = capacity_moe_local(
            x, top_idx, top_weights, wg, wu, wd,
            scales=sc, zeros=zr, capacity=cap, expert_offset=off,
        )
        out = jax.lax.psum(out, axis)
        counts = jax.lax.all_gather(counts, axis, tiled=True)  # [E]
        return out, counts

    rep = P()
    espec = P(axis)  # expert-dim sharded
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(rep, rep, rep, espec, espec, espec,
                  tuple(espec for _ in sc_names),
                  tuple(espec for _ in zr_names)),
        out_specs=(rep, rep),
        check_vma=False,
    )
    return fn(
        x, top_idx, top_weights, w_gate, w_up, w_down,
        tuple((scales or {})[nm] for nm in sc_names),
        tuple((zeros or {})[nm] for nm in zr_names),
    )


def ep_moe_a2a(
    x: jnp.ndarray,  # [N, H] tokens, SHARDED over ``axis``
    top_idx: jnp.ndarray,  # [N, K]
    top_weights: jnp.ndarray,  # [N, K]
    w_gate, w_up, w_down,  # [E, H, I] etc — expert dim sharded over ``axis``
    mesh,
    axis: str = "dp",
    scales: Optional[dict] = None,
    zeros: Optional[dict] = None,
    capacity_factor: float = 2.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ragged all-to-all expert parallelism — the DeepEP dispatch/combine
    analog (reference: models_py/distributed/deepep_wrapper.py:90-236) for
    the DP=EP deployment: tokens AND experts shard over the same mesh axis.

    Per shard (inside shard_map):
      1. pack each local assignment into a per-DESTINATION-shard capacity
         buffer ([S, C, H] activations + [S, C] local-expert ids) — the
         ragged "dispatch" with a static capacity bound;
      2. ``jax.lax.all_to_all`` swaps buffers so each shard holds exactly
         the tokens routed to ITS experts (comm = 2*C*H per peer instead of
         a full activation all-gather + psum);
      3. run the local expert FFNs via the capacity path (k=1, unit
         weights -> per-assignment outputs);
      4. all_to_all back; the source shard combines outputs into its own
         token rows with the routing weights.

    Returns ([N, H] f32 sharded like x, [E] i32 global gating counts).
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    n, k = top_idx.shape
    e = w_gate.shape[0]
    s_shards = mesh.shape[axis]
    if s_shards == 1 or e % s_shards:
        return ep_moe(x, top_idx, top_weights, w_gate, w_up, w_down,
                      mesh=None, scales=scales, zeros=zeros,
                      capacity_factor=capacity_factor)
    e_local = e // s_shards
    n_local = n // s_shards
    # per-(source, destination) capacity: local assignments spread over
    # destinations; factor covers routing skew
    cap = expert_capacity(n_local * k, s_shards, capacity_factor)

    sc_names = tuple((scales or {}).keys())
    zr_names = tuple((zeros or {}).keys())

    def local_fn(x, top_idx, top_weights, wg, wu, wd, sc_vals, zr_vals):
        nl = x.shape[0]
        # gating counts for EPLB = routing DEMAND, histogrammed from
        # top_idx before the capacity dispatch (drops must still count —
        # a hot expert whose overflow is dropped is exactly what the
        # balancer needs to see); psum over the axis gives global [E]
        demand = jnp.sum(
            top_idx.reshape(-1)[:, None] == jnp.arange(e)[None, :], axis=0,
        ).astype(jnp.int32)
        demand = jax.lax.psum(demand, axis)
        # ---- 1. pack per-destination buffers ----
        dest = top_idx // e_local  # [nl, K] destination shard
        slot, _, keep = build_dispatch(dest, capacity=cap, expert_offset=0,
                                       num_local=s_shards)
        d_idx = jnp.where(keep, dest, s_shards)  # OOB -> dropped
        tok = jnp.broadcast_to(jnp.arange(nl)[:, None], (nl, k))
        buf_x = jnp.zeros((s_shards, cap, x.shape[1]), x.dtype)
        buf_x = buf_x.at[d_idx, slot].set(x[tok], mode="drop")
        buf_eid = jnp.full((s_shards, cap), -1, jnp.int32)
        buf_eid = buf_eid.at[d_idx, slot].set(
            (top_idx % e_local).astype(jnp.int32), mode="drop")

        # ---- 2. dispatch a2a ----
        recv_x = jax.lax.all_to_all(buf_x, axis, 0, 0, tiled=False)
        recv_eid = jax.lax.all_to_all(buf_eid, axis, 0, 0, tiled=False)

        # ---- 3. local expert FFNs (per-assignment outputs) ----
        rx = recv_x.reshape(s_shards * cap, -1)
        rid = recv_eid.reshape(-1, 1)  # [-1 = dropped -> OOB in dispatch]
        rid = jnp.where(rid < 0, e_local + 1, rid)
        sc = dict(zip(sc_names, sc_vals)) if sc_names else None
        zr = dict(zip(zr_names, zr_vals)) if zr_names else None
        y, _ = capacity_moe_local(
            rx, rid, jnp.ones_like(rid, jnp.float32),
            wg, wu, wd, scales=sc, zeros=zr,
            capacity=expert_capacity(s_shards * cap, e_local,
                                     capacity_factor),
        )
        y = y.reshape(s_shards, cap, -1)

        # ---- 4. combine a2a + weighted scatter back to token rows ----
        back = jax.lax.all_to_all(y.astype(x.dtype), axis, 0, 0, tiled=False)
        got = back[d_idx, slot]  # [nl, K, H] (dropped -> garbage)
        got = jnp.where(keep[..., None], got, 0).astype(jnp.float32)
        out = jnp.sum(got * top_weights[..., None].astype(jnp.float32),
                      axis=1)
        return out, demand

    rep = P()
    tspec = P(axis)
    espec = P(axis)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(tspec, tspec, tspec, espec, espec, espec,
                  tuple(espec for _ in sc_names),
                  tuple(espec for _ in zr_names)),
        out_specs=(tspec, rep),
        check_vma=False,
    )
    return fn(
        x, top_idx, top_weights, w_gate, w_up, w_down,
        tuple((scales or {})[nm] for nm in sc_names),
        tuple((zeros or {})[nm] for nm in zr_names),
    )
