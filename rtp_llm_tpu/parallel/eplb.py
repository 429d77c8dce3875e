"""EPLB — expert-parallel load balancing for MoE layers.

Reference analog: ExpertBalancer (cpp/models/eplb/ExpertBalancer.h:90) +
rtp_llm/eplb/ep_balancer.py:53 (create_balance_plan :175,
rebalance_experts :193): collect per-expert token loads, pick the most
unbalanced layer, compute a new expert→device placement, and swap weights
live.

TPU-native design: experts live as one stacked axis ``[E, ...]`` sharded
contiguously over the mesh's tp/ep axis by GSPMD. Rebalancing is therefore a
PERMUTATION of the expert axis — hot experts are spread across shards by a
greedy longest-processing-time assignment — applied to the expert weight
stacks together with the router's output columns (a pure relabeling: logits
are bit-identical, only the shard-to-expert mapping changes). The engine
applies a plan with ``LlmEngine.apply_expert_balance``; the weight swap
retraces the step programs (same mechanism as dynamic-LoRA refresh /
update_weights).
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
