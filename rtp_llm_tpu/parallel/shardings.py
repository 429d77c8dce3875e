"""Sharding rules: canonical weight names -> PartitionSpecs over the mesh.

The TP layout mirrors the reference's row/col-parallel linear scheme
(rtp_llm/model_loader weight splitters + Group.TP all-reduce,
collective_torch.py:189), re-expressed declaratively: GSPMD derives the
all-reduces from these specs instead of explicit NCCL calls.

  q/k/v/gate/up (col-parallel)  -> shard last (out) dim on "tp"
  o/down        (row-parallel)  -> shard in dim on "tp"  (=> psum after)
  experts                       -> shard expert axis on "tp" (EP folded in)
  embeddings / norms / router   -> replicated
  KV cache                      -> shard kv-head axis on "tp" (falls back to
                                   replicated when tp > num_kv_heads)
  decode state ([B,...] arrays) -> batch on "dp"
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader.weight_maps import WeightSpec


def _spec_for(spec: WeightSpec, shape: tuple, afd: bool = False) -> P:
    nd = len(shape)
    if nd < 2:
        # 0-d quant markers (.int4p/.fp4/.w8a8) and 1-d per-in vectors
        # (.smoother/.shift) replicate; GSPMD reshards where needed.
        return P()
    if spec.shard_axis == "out":
        return P(*([None] * (nd - 1) + ["tp"]))
    if spec.shard_axis == "in":
        return P(*([None] * (nd - 2) + ["tp", None]))
    if spec.shard_axis == "expert":
        # [L, E, ...]: expert axis is dim 1. AFD mode spreads experts over
        # the whole slice (dp x tp acts as the FFN role; attention stays
        # dp-batch-parallel x tp) — XLA inserts the attention<->FFN boundary
        # collectives the reference's AFD instances exchange explicitly.
        return P(*([None, ("dp", "tp") if afd else "tp"]
                   + [None] * (nd - 2)))
    return P()


def make_weight_shard_fn(mesh: Mesh, model_config: ModelConfig,
                         afd: bool = False):
    """Returns the loader's shard_fn: (WeightSpec, shape) -> NamedSharding.

    Validates divisibility (reference: weight splitter asserts) and degrades
    to replication when a tensor cannot shard (e.g. kv heads < tp for k/v)."""
    tp = mesh.shape["tp"]
    sizes = {"tp": tp, ("dp", "tp"): mesh.shape["dp"] * tp}

    def shard_fn(spec: WeightSpec, shape: tuple) -> Optional[NamedSharding]:
        pspec = _spec_for(spec, shape, afd=afd)
        # divisibility check on the sharded dim; replicate if it cannot split
        for dim, name in enumerate(pspec):
            if name is not None and shape[dim] % sizes.get(name, 1) != 0:
                pspec = P()
                break
        return NamedSharding(mesh, pspec)

    return shard_fn


def cache_sharding(mesh: Mesh, model_config: ModelConfig) -> NamedSharding:
    """KV cache [L, 2, slots, Hkv*D]: kv heads (lane dim) over tp — the same
    split as the k/v projections so attention is fully local per shard."""
    tp = mesh.shape["tp"]
    if model_config.num_kv_heads % tp == 0:
        return NamedSharding(mesh, P(None, None, None, "tp"))
    return NamedSharding(mesh, P())


def state_sharding(mesh: Mesh, batched_dims: int = 1) -> NamedSharding:
    """Decode-state arrays [B, ...]: batch over dp, replicated over tp."""
    return NamedSharding(mesh, P(*(["dp"] + [None] * (batched_dims - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
