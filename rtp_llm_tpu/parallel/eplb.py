"""EPLB — expert-parallel load balancing for MoE layers.

Reference analog: ExpertBalancer (cpp/models/eplb/ExpertBalancer.h:90) +
rtp_llm/eplb/eplb.py (rebalance_experts :193, hierarchical placement :97):
collect per-expert token loads, pick the most unbalanced layer, compute a new
expert→device placement — REPLICATING hot experts onto redundant physical
slots — and swap weights live.

TPU-native design, two tiers:

1. **Permutation** (R == 0): experts live as one stacked axis ``[E, ...]``
   sharded contiguously over the mesh's tp/ep axis by GSPMD. Rebalancing
   permutes the expert axis (greedy LPT) together with the router columns —
   a pure relabeling, bit-identical logits. The weight swap retraces the
   step programs (same mechanism as dynamic-LoRA refresh).

2. **Redundant experts** (R > 0, reference rebalance_experts parity): the
   physical stacks carry ``E + R`` rows; small int32 mapping arrays
   (``eplb_log2phy`` [E, max_rep], ``eplb_rep_count`` [E]) live in the
   WEIGHTS PYTREE, so the forward remaps each routed logical expert to one
   of its replicas (token-index round-robin) and a rebalance only rewrites
   weight rows + mappings — same shapes, NO retrace. The router stays
   logical (scores over E columns), so routing math is untouched. This is
   the tier that can fix a single-expert hotspot, which no permutation can.

``rebalance_experts(load, ...)`` computes the placement hierarchically when
group/node structure is given (groups pack to nodes first — preserving
group-limited routing locality — then replicas spread within each node),
mirroring the reference's hierarchical policy (eplb.py:97).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

EXPERT_STACKS = ("moe_gate", "moe_up", "moe_down")


def balance_plan(load: np.ndarray, num_shards: int) -> np.ndarray:
    """Greedy LPT: returns ``perm`` [E] such that expert ``perm[j]`` moves to
    stacked position ``j``; contiguous chunks of E/num_shards positions (one
    GSPMD shard each) get near-equal total load."""
    load = np.asarray(load, np.float64)
    e = load.shape[0]
    assert e % num_shards == 0, (e, num_shards)
    cap = e // num_shards
    order = np.argsort(-load, kind="stable")
    shard_load = np.zeros(num_shards)
    shard_members: list[list[int]] = [[] for _ in range(num_shards)]
    for expert in order:
        open_shards = [s for s in range(num_shards) if len(shard_members[s]) < cap]
        s = min(open_shards, key=lambda i: shard_load[i])
        shard_members[s].append(int(expert))
        shard_load[s] += load[expert]
    return np.asarray([x for m in shard_members for x in m], np.int64)


def imbalance(load: np.ndarray, num_shards: int,
              perm: np.ndarray | None = None) -> float:
    """max-shard-load / mean-shard-load under a placement (1.0 = perfect)."""
    load = np.asarray(load, np.float64)
    if perm is not None:
        load = load[perm]
    shard = load.reshape(num_shards, -1).sum(axis=1)
    return float(shard.max() / max(shard.mean(), 1e-12))


def pick_layer(loads_by_layer: Dict[int, np.ndarray], num_shards: int) -> int:
    """Most-unbalanced MoE layer (reference: ExpertBalancer::stepForward
    choosing the worst layer each cycle)."""
    return max(loads_by_layer,
               key=lambda i: imbalance(loads_by_layer[i], num_shards))


def _replicate_counts(load: np.ndarray, extra: int) -> np.ndarray:
    """Distribute ``extra`` replica slots over experts: repeatedly give a
    replica to the expert with the highest per-replica load (greedy optimal
    for minimizing the max per-replica load)."""
    load = np.asarray(load, np.float64)
    counts = np.ones(load.shape[0], np.int64)
    for _ in range(extra):
        counts[np.argmax(load / counts)] += 1
    return counts


def _pack_lpt(item_loads: np.ndarray, num_bins: int, cap: int) -> list:
    """LPT-pack items into bins of exactly ``cap`` slots; returns bin member
    lists (item indices)."""
    order = np.argsort(-np.asarray(item_loads, np.float64), kind="stable")
    bin_load = np.zeros(num_bins)
    members: list[list[int]] = [[] for _ in range(num_bins)]
    for it in order:
        open_bins = [b for b in range(num_bins) if len(members[b]) < cap]
        b = min(open_bins, key=lambda i: bin_load[i])
        members[b].append(int(it))
        bin_load[b] += item_loads[it]
    return members


def rebalance_experts(
    load: np.ndarray,
    num_phys: int,
    num_shards: int,
    num_groups: int = 1,
    num_nodes: int = 1,
):
    """Compute a replicated placement (reference: eplb.rebalance_experts,
    /root/reference/rtp_llm/eplb/eplb.py:193; hierarchical policy :97).

    load: [E] per-logical-expert token counts. num_phys: physical slots
    (E + redundant). Physical slot j holds a full copy of logical expert
    phy2log[j]; contiguous chunks of num_phys/num_shards slots map to one
    GSPMD shard.

    Hierarchical when num_groups % num_nodes == 0 and num_nodes > 1:
    expert groups pack to nodes first (keeping group-limited routing local
    to a node), each node's share of redundant slots replicates its own
    hottest experts, then each node LPT-packs its replicas onto its shards.
    Otherwise: global replicate + LPT (the reference's fallback for
    non-divisible topologies).

    Returns (phy2log [num_phys] int64,
             log2phy [E, max_rep] int64 (padded with first replica),
             rep_count [E] int64)."""
    load = np.asarray(load, np.float64)
    e = load.shape[0]
    assert num_phys >= e and num_phys % num_shards == 0, (num_phys, e)
    slot_cap = num_phys // num_shards

    hierarchical = (
        num_nodes > 1 and num_groups > 1
        and num_groups % num_nodes == 0 and e % num_groups == 0
        and num_shards % num_nodes == 0 and (num_phys - e) % num_nodes == 0
    )
    phy2log = np.empty(num_phys, np.int64)
    pos = 0
    if hierarchical:
        gsz = e // num_groups
        gload = load.reshape(num_groups, gsz).sum(axis=1)
        nodes = _pack_lpt(gload, num_nodes, num_groups // num_nodes)
        extra_per_node = (num_phys - e) // num_nodes
        shards_per_node = num_shards // num_nodes
        for node_groups in nodes:
            experts = np.concatenate(
                [np.arange(g * gsz, (g + 1) * gsz) for g in node_groups])
            nload = load[experts]
            counts = _replicate_counts(nload, extra_per_node)
            reps = np.repeat(experts, counts)  # local physical replicas
            rload = np.repeat(nload / counts, counts)
            shard_members = _pack_lpt(
                rload, shards_per_node, len(reps) // shards_per_node)
            for m in shard_members:
                phy2log[pos:pos + len(m)] = reps[m]
                pos += len(m)
    else:
        counts = _replicate_counts(load, num_phys - e)
        reps = np.repeat(np.arange(e), counts)
        rload = np.repeat(load / counts, counts)
        shard_members = _pack_lpt(rload, num_shards, slot_cap)
        for m in shard_members:
            phy2log[pos:pos + len(m)] = reps[m]
            pos += len(m)
    assert pos == num_phys

    rep_count = np.bincount(phy2log, minlength=e).astype(np.int64)
    max_rep = int(rep_count.max())
    log2phy = np.zeros((e, max_rep), np.int64)
    seen = np.zeros(e, np.int64)
    for j, le in enumerate(phy2log):
        log2phy[le, seen[le]] = j
        seen[le] += 1
    # pad unused replica columns with the first replica (safe to index)
    for le in range(e):
        log2phy[le, seen[le]:] = log2phy[le, 0]
    return phy2log, log2phy, rep_count


def phy2log_from_mapping(log2phy: np.ndarray, rep_count: np.ndarray,
                         num_phys: int) -> np.ndarray:
    """Invert the (log2phy, rep_count) mapping back to phy2log [num_phys]."""
    out = np.zeros(num_phys, np.int64)
    for e_ in range(log2phy.shape[0]):
        out[log2phy[e_, : rep_count[e_]]] = e_
    return out


def replicated_imbalance(load: np.ndarray, phy2log: np.ndarray,
                         rep_count: np.ndarray, num_shards: int) -> float:
    """max/mean shard load when each expert's load spreads evenly over its
    replicas (token-index round-robin makes this exact up to rounding)."""
    load = np.asarray(load, np.float64)
    per_replica = load[phy2log] / rep_count[phy2log]
    shard = per_replica.reshape(num_shards, -1).sum(axis=1)
    return float(shard.max() / max(shard.mean(), 1e-12))


def expand_expert_stacks(weights: dict, redundant: int,
                         num_shards: int = 1) -> dict:
    """Grow every expert stack [L, E, ...] to [L, E + R, ...] physical slots
    and install the mapping arrays (``eplb_log2phy`` [L, E, R+1] i32,
    ``eplb_rep_count`` [L, E] i32) into the weight dict. Initial placement
    balances uniform load. Returns a new dict; stacks stay host/device as
    they were (gather produces new arrays).

    max_rep is fixed at R+1 (one expert can hold at most all R extras), so
    every later rebalance keeps identical shapes — no retrace."""
    import jax.numpy as jnp

    stacks = [n for n in EXPERT_STACKS if n in weights]
    if redundant <= 0 or not stacks:
        return weights
    w = dict(weights)
    nl, e = w[stacks[0]].shape[:2]
    num_phys = e + redundant
    phy2log, log2phy, rep_count = rebalance_experts(
        np.ones(e), num_phys, max(num_shards, 1))
    idx = jnp.asarray(phy2log, jnp.int32)
    for name in stacks:
        for full in (name,) + tuple(
                name + s for s in (".scale", ".zero") if name + s in w):
            w[full] = jnp.take(w[full], idx, axis=1)
    pad = _pad_log2phy(log2phy, redundant + 1)
    w["eplb_log2phy"] = jnp.tile(
        jnp.asarray(pad, jnp.int32)[None], (nl, 1, 1))
    w["eplb_rep_count"] = jnp.tile(
        jnp.asarray(rep_count, jnp.int32)[None], (nl, 1))
    return w


def _pad_log2phy(log2phy: np.ndarray, max_rep: int) -> np.ndarray:
    out = np.tile(log2phy[:, :1], (1, max_rep))
    out[:, : log2phy.shape[1]] = log2phy
    return out


def apply_replicated_balance(weights: dict, layer_pos: int,
                             phy2log: np.ndarray, log2phy: np.ndarray,
                             rep_count: np.ndarray) -> dict:
    """Install a new replicated placement for ONE layer: physical rows are
    regathered from the current logical rows (logical e's canonical copy =
    old first replica) and the mapping arrays are rewritten. All shapes are
    unchanged — compiled programs (which take weights as arguments) keep
    running without retrace."""
    import jax.numpy as jnp

    w = dict(weights)
    old_first = np.asarray(w["eplb_log2phy"])[layer_pos, :, 0]  # [E]
    gather = jnp.asarray(old_first[np.asarray(phy2log)], jnp.int32)
    for name in EXPERT_STACKS:
        if name not in w:
            continue
        for full in (name,) + tuple(
                name + s for s in (".scale", ".zero") if name + s in w):
            t = w[full]
            w[full] = t.at[layer_pos].set(jnp.take(t[layer_pos], gather,
                                                   axis=0))
    max_rep = w["eplb_log2phy"].shape[2]
    pad = _pad_log2phy(np.asarray(log2phy), max_rep)
    w["eplb_log2phy"] = w["eplb_log2phy"].at[layer_pos].set(
        jnp.asarray(pad, jnp.int32))
    w["eplb_rep_count"] = w["eplb_rep_count"].at[layer_pos].set(
        jnp.asarray(rep_count, jnp.int32))
    return w


def apply_layer_permutation(weights: dict, layer_pos: int,
                            perm: Sequence[int]):
    """Permute one MoE layer's expert stacks + router columns in a canonical
    weight dict. Returns a NEW dict (arrays replaced per-layer via .at[] so
    sharding layouts are preserved). Pure relabeling — forward outputs are
    unchanged."""
    import jax.numpy as jnp

    perm = jnp.asarray(np.asarray(perm), jnp.int32)
    w = dict(weights)
    for name in EXPERT_STACKS:
        if name not in w:
            continue
        w[name] = w[name].at[layer_pos].set(w[name][layer_pos][perm])
        for suffix in (".scale", ".zero"):
            if name + suffix in w:
                t = w[name + suffix]
                w[name + suffix] = t.at[layer_pos].set(t[layer_pos][perm])
    # router [L, H, E]: column j must now score the expert at stack pos j
    w["router"] = w["router"].at[layer_pos].set(
        w["router"][layer_pos][:, perm]
    )
    if "router_bias" in w:
        w["router_bias"] = w["router_bias"].at[layer_pos].set(
            w["router_bias"][layer_pos][perm]
        )
    return w
