"""The continuous-batching engine: host loop + jitted device programs.

Analog of the reference NormalEngine/NormalExecutor
(cpp/normal_engine/NormalEngine.cc:398-503 loop/step, NormalExecutor.cc:132
process): each step schedules streams, runs bucketed prefill programs for new
streams, then one fused decode+sample program over the fixed decode batch, and
dispatches sampled tokens back onto streams.

TPU-first design decisions (vs the reference):
  * prefill and decode are separate fixed-shape jit programs (compiled once per
    bucket — the CUDA-graph analog);
  * the decode batch state lives on device (device_state.py); per-step host
    work is only scheduling + the [B]-token readback;
  * long prompts run as chunked prefill over the largest bucket (reference:
    prefill chunking in RuntimeConfig).
"""

from __future__ import annotations

import logging
import math
import os
import re
import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.cache.kv_cache_manager import KVCacheManager
from rtp_llm_tpu.config import runtime_flags
from rtp_llm_tpu.config.engine_config import EngineConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import device_state as ds
from rtp_llm_tpu.engine.scheduler import FIFOScheduler
from rtp_llm_tpu.engine.speculative import greedy_verify, propose_prompt_lookup
from rtp_llm_tpu.engine.stream import FinishReason, GenerateStream, StreamState
from rtp_llm_tpu.models.batch import ModelInputs
from rtp_llm_tpu.ops.sampling import SamplingParams, sample_tokens

logger = logging.getLogger(__name__)


class LlmEngine:
    def __init__(self, model, weights: dict, config: EngineConfig, mesh=None,
                 draft=None, eagle=None):
        """mesh: optional jax.sharding.Mesh ("dp","tp"); when given, the KV
        cache shards kv-heads over tp and the decode batch shards over dp
        (weights should be loaded with parallel.make_weight_shard_fn).
        draft: optional (draft_model, draft_weights) for vanilla draft-model
        speculative decoding (engine/draft.py).
        eagle: optional EAGLE head weight dict (loader.load_eagle_weights)
        for feature-level speculative decoding (engine/eagle.py)."""
        self.model = model
        self.weights = weights
        self.config = config
        self.mesh = mesh
        # push kernel/runtime knobs into the process-wide flag registry so
        # ops-level code (Pallas gates, loaders, caches) observes them
        runtime_flags.apply_engine_config(config)
        if config.kernel.attn_backend != "auto":
            model.attn_backend = config.kernel.attn_backend
        # load-time QKV / gate|up fusion (models/llama_family.fuse_weights):
        # single-device only (under TP the per-tensor shardings stay clean
        # for GSPMD) and off when LoRA targets the unfused names
        self.fuse_eligible = (
            (mesh is None or mesh.devices.size == 1)
            and not config.server.lora_adapters
            and hasattr(model, "fuse_weights")
            and not runtime_flags.get("disable_weight_fusion")
        )
        if self.fuse_eligible:
            fused = model.fuse_weights(self.weights)
            if fused is not self.weights and isinstance(weights, dict):
                # sync the CALLER's dict in place: fuse_weights returns a
                # new dict, and a caller still holding the original would
                # pin the unfused q/k/v + gate/up device buffers alive —
                # ~4.3 GB of duplicated HBM for a 7B int8 model (measured:
                # the difference between the serving engine fitting a 16 GB
                # chip and OOMing at warmup)
                weights.clear()
                weights.update(fused)
                fused = weights
            self.weights = fused
        self.weights = self._inject_aux_weights(self.weights)
        if config.parallel.eplb_redundant > 0:
            from rtp_llm_tpu.parallel import eplb as _eplb

            shards = (mesh.shape.get("tp", 1) if mesh is not None else 1)
            expanded = _eplb.expand_expert_stacks(
                self.weights, config.parallel.eplb_redundant, shards)
            if expanded is not self.weights and isinstance(weights, dict):
                # same caller-dict sync as fuse_weights: don't pin the
                # unexpanded expert stacks alive in the caller's reference
                weights.clear()
                weights.update(expanded)
                expanded = weights
            self.weights = expanded
        mc = model.cfg
        sc = config.scheduler
        cc = config.cache

        num_blocks = cc.test_num_blocks or cc.num_blocks
        if num_blocks <= 0:
            num_blocks = self._auto_size_blocks()
        self.num_blocks = num_blocks
        self.block_size = cc.block_size
        self.max_blocks_per_seq = math.ceil(sc.max_seq_len / cc.block_size)

        # hybrid (linear-attention) models: per-slot state => no prefix
        # reuse, no host tier, no beams/spec (state is not block-composable)
        self.is_hybrid = bool(getattr(model, "is_hybrid", False))
        # sliding-window block recycling (uniform-SWA models, mistral-style;
        # reference analog: hybrid SWA cache pools): bounds each stream's KV
        # at ~window tokens by reusing its own out-of-window blocks. Opt-in
        # via cache.swa_recycle, or automatic when the prefix cache is off
        # (recycled contents can't be prefix-shared).
        uniform_swa = (mc.sliding_window and not mc.sliding_window_pattern
                       and not self.is_hybrid)
        swa_recycle = (mc.sliding_window if uniform_swa and (
            cc.swa_recycle or not cc.enable_prefix_cache) else 0)
        # mixed global/SWA pool split (gemma2-style; model builds a per-slot
        # ring pool for sliding layers — the hybrid SWA cache pool analog).
        # Ring contents diverge from logical positions, so no prefix reuse /
        # host tier / PD row transfer for these models.
        self.swa_split = bool(getattr(model, "swa_split", False))
        prefix_ok = (cc.enable_prefix_cache and not self.is_hybrid
                     and not swa_recycle and not self.swa_split)
        self.cache_mgr = KVCacheManager(
            num_blocks, cc.block_size,
            enable_prefix_cache=prefix_ok,
            sliding_window_tokens=swa_recycle,
        )
        if (cc.host_cache_mb > 0 and not self.is_hybrid
                and not self.swa_split):
            from rtp_llm_tpu.cache.host_tier import HostKVTier

            tier = HostKVTier(cc.host_cache_mb << 20)
            if ((cc.disk_cache_path and cc.disk_cache_mb > 0)
                    or cc.remote_cache_url):
                # mem -> disk -> remote tier chain (reference: connector
                # coordinator; remote = cache-store service analog)
                from rtp_llm_tpu.cache.host_tier import (
                    DiskKVTier, TieredKVStore,
                )

                disk = (DiskKVTier(cc.disk_cache_path, cc.disk_cache_mb << 20)
                        if cc.disk_cache_path and cc.disk_cache_mb > 0
                        else None)
                remote = None
                if cc.remote_cache_url:
                    from rtp_llm_tpu.cache.remote_tier import RemoteKVTier

                    remote = RemoteKVTier(cc.remote_cache_url)
                tier = TieredKVStore(tier, disk, remote)
            self.cache_mgr.host_tier = tier
            self.cache_mgr.evict_hook = self._block_rows_to_host
        self.scheduler = FIFOScheduler(sc, self.cache_mgr)

        # KV cache storage dtype (reference: fp8 KV, KVCacheConfig
        # ConfigModules.h:146-208). fp8 e4m3 is storage-only: written values
        # are downcast, attention upcasts to fp32 — no scales needed.
        kv_dtype = {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "fp8": jnp.float8_e4m3fn,
            "float8_e4m3": jnp.float8_e4m3fn,
        }.get(config.quant.kv_cache_dtype) or jnp.dtype(config.quant.kv_cache_dtype)
        if self.swa_split:
            # SWA ring sizing needs the largest prefill chunk (forward
            # queries reach back `window` past the chunk start)
            model.swa_prefill_span = max(sc.prefill_buckets)
            if config.speculative.method not in ("none", ""):
                raise ValueError(
                    "speculative decoding is not wired for mixed global/SWA "
                    "pool models yet (draft prefill bypasses the per-slot "
                    "ring assignment)")
            if config.server.role not in ("", "fusion"):
                raise ValueError(
                    "PD disaggregation is not wired for mixed global/SWA "
                    "pool models yet (KV row transfer assumes one paged "
                    "pool)")
        # DSA (V3.2) caches are a {latent, idx_k} pytree: the PD row
        # transfer tree-maps the per-slot gather/scatter over both planes,
        # so disaggregated roles work the same as the single latent pool
        # (round-4 carve-out lift; see test_pd_disagg deepseek_v32 case)
        self.kv = model.init_cache(num_blocks, cc.block_size, kv_dtype,
                                   max_slots=sc.max_batch_size)
        # EPLB closed loop (reference: ExpertBalancer::stepForward,
        # NormalExecutor.cc:190-193): decode programs accumulate per-expert
        # gating counts into device state; every eplb_interval steps the host
        # reads them and permutes the hottest layer's experts
        if hasattr(model, "moe_capacity_factor"):
            model.moe_capacity_factor = config.parallel.moe_capacity_factor
        if hasattr(model, "moe_micro_batches"):
            model.moe_micro_batches = config.parallel.moe_micro_batches
        # zig-zag ring CP prefill (parallel.cp_ring)
        self._cp_ring = bool(
            mesh is not None and mesh.shape.get("cp", 1) > 1
            and config.parallel.cp_ring
            and hasattr(model, "use_ring_prefill")
        )
        if self._cp_ring:
            if getattr(model, "alibi_slopes", None) is not None or getattr(
                    mc, "sliding_window", 0):
                raise NotImplementedError(
                    "cp_ring supports plain causal attention only")
            model.use_ring_prefill = True
            # ring attention covers whole fresh prompts: no prefix reuse
            self.cache_mgr.prefix_cache = None
        self._moe_layer_ids = [
            i for i in range(mc.num_layers)
            if getattr(mc, "num_experts", 0) and mc.is_moe_layer(i)
        ] if hasattr(mc, "is_moe_layer") else []
        self._collect_gating = bool(
            config.parallel.eplb_interval and self._moe_layer_ids
        )
        gating_shape = (
            (len(self._moe_layer_ids), mc.num_experts)
            if self._collect_gating else (0, 0)
        )
        self.state = ds.DecodeState.init(
            sc.max_batch_size, self.max_blocks_per_seq, mc.vocab_size,
            config.seed, gating_shape=gating_shape,
        )
        if mesh is not None:
            from rtp_llm_tpu.parallel.shardings import (
                cache_sharding, replicated, state_sharding,
            )

            if hasattr(model, "mesh"):
                # multi-device: the attention dispatch wraps the Pallas
                # decode kernel in shard_map over (dp, tp) — kv heads are
                # tp-sharded so the kernel is per-shard local (models whose
                # layout can't shard fall back to the XLA ref path inside
                # paged_attention)
                model.mesh = mesh if mesh.devices.size > 1 else None
            elif mesh.devices.size > 1 and getattr(model, "attn_backend", None):
                # models without shard_map support (MLA latent cache, hybrid
                # linear state): XLA ref attention under GSPMD
                model.attn_backend = "ref"

            kv_shard = cache_sharding(mesh, mc)
            tp_n = mesh.shape["tp"]

            def _place_kv(a):
                # dict caches mix leaf ranks: rank>=4 leaves (pools,
                # split-SWA, int8 scales [L,2,NS,Hkv], rank-5 linear "rec"
                # state) take the dim-3 lane split when divisible (for rec
                # that's the key head dim — trailing dims replicate); only
                # sub-rank leaves (DSA idx_k [L,NS,di]) replicate
                if a.ndim >= 4 and a.shape[3] % tp_n == 0:
                    return jax.device_put(a, kv_shard)
                return jax.device_put(a, replicated(mesh))

            self.kv = jax.tree.map(_place_kv, self.kv)
            dp_b = state_sharding(mesh)
            rep = replicated(mesh)

            def place(path_leaf):
                arr = path_leaf
                if hasattr(arr, "ndim") and arr.ndim >= 1 and arr.shape[0] == sc.max_batch_size:
                    return jax.device_put(arr, state_sharding(mesh, arr.ndim))
                return jax.device_put(arr, rep)

            self.state = jax.tree.map(place, self.state)
            # the PRNG key is [2] and must never be batch-sharded
            self.state = self.state._replace(
                rng=jax.device_put(self.state.rng, rep)
            )
        self.eos_ids = tuple(mc.eos_token_ids)

        # slot bookkeeping
        self.slots: List[Optional[GenerateStream]] = [None] * sc.max_batch_size
        self._free_slots = list(range(sc.max_batch_size - 1, -1, -1))
        self._slot_nblocks = [0] * sc.max_batch_size  # detect alloc growth
        self._slot_ban = [False] * sc.max_batch_size
        self._slot_forced = [-1] * sc.max_batch_size

        # jitted programs
        self._decode_jit = jax.jit(
            self._decode_impl, donate_argnums=(1, 2),
            static_argnames=("need_sampling", "need_stats", "kv_blocks"),
        )
        # kv-length buckets for the decode block tables: the fullrow pallas
        # kernel loads whole (bucketed) rows, so the table width passed into
        # the program tracks the batch's max context instead of max_seq_len
        mbs = self.max_blocks_per_seq
        buckets = []
        b_ = 8
        while b_ < mbs:
            buckets.append(b_)
            b_ *= 2
        buckets.append(mbs)
        self._kv_buckets = buckets
        self._prefill_jits = {}  # bucket_t -> fn
        self._prefill_hidden_jits = {}  # bucket_t -> fn (MTP prefill)
        self._prefill_mm_jits = {}  # bucket_t -> fn (multimodal prefill)
        self._insert_jit = jax.jit(ds.insert_slot, donate_argnums=(0,))
        self._clear_jit = jax.jit(ds.clear_slot, donate_argnums=(0,))
        self._set_blocks_jit = jax.jit(ds.set_block_row, donate_argnums=(0,))
        self._set_ban_jit = jax.jit(ds.set_ban_eos, donate_argnums=(0,))
        self._set_counts_jit = jax.jit(ds.set_counts_row, donate_argnums=(0,))
        self._set_forced_jit = jax.jit(ds.set_forced, donate_argnums=(0,))
        self._first_sample_jit = jax.jit(
            self._first_sample_impl, static_argnums=(4,)
        )
        # deferred decode KV writes: one batched scatter per step instead of
        # 2 per layer (4 per layer for int8-KV pytree caches, which quantize
        # at the batched scatter)
        self._defer_decode = bool(
            sc.defer_kv_writes
            and getattr(model, "supports_deferred_kv", False)
            and not self.swa_split  # split pools write in-layer
        )
        self.spec = config.speculative
        self.tree_config = None
        if config.tree_decode_config_path:
            from rtp_llm_tpu.engine.logits_processors import TreeDecodeConfig

            self.tree_config = TreeDecodeConfig.from_file(
                config.tree_decode_config_path)
        self._verify_jit = jax.jit(self._verify_impl, donate_argnums=(1, 2),
                                   static_argnums=(4,))
        self._decode_multi_jit = jax.jit(
            self._decode_multi_impl, donate_argnums=(1, 2),
            static_argnames=("need_sampling", "need_stats", "n_steps", "kv_blocks"),
        )
        # feature-level proposer (consumes the target's pre-norm hidden):
        # MtpRunner (deepseek MTP) or EagleRunner — both share the same
        # prefill/propose/update_hidden contract, so the engine plumbing
        # treats them uniformly through self.mtp
        self.mtp = None
        if self.spec.method == "mtp" and "mtp_eh_proj" in weights:
            # deepseek MTP module shipped in the target checkpoint
            from rtp_llm_tpu.engine.mtp import MtpRunner

            self.mtp = MtpRunner(
                model, weights, num_blocks, cc.block_size,
                sc.prefill_buckets, self.max_blocks_per_seq,
                sc.max_batch_size,
            )
        elif self.spec.method == "eagle" and eagle is not None:
            from rtp_llm_tpu.engine.eagle import EagleRunner

            self.mtp = EagleRunner(
                model, weights, eagle, num_blocks, cc.block_size,
                sc.max_batch_size,
            )
            if self.mtp.is_eagle3:
                # the hidden-returning programs concat these layers' outputs
                # (reference: merged_eagle3_hidden, PyWrappedModel.cc:746)
                model.spec_capture_layers = self.mtp.capture_layers
        self.draft = None
        if draft is not None:
            from rtp_llm_tpu.engine.draft import DraftRunner

            dmodel, dweights = draft
            self.draft = DraftRunner(
                dmodel, dweights, num_blocks, cc.block_size,
                sc.prefill_buckets, self.max_blocks_per_seq,
            )

        # async decode pipelining: device step N+1 is dispatched before step
        # N's tokens are read back (reference analog: C++ engine async exec)
        self.async_decode = sc.async_decode
        self._pending = None  # (tokens_dev, logprobs_dev, streams)
        # prefill groups dispatched but not yet finished (first-token fetch +
        # slot insertion deferred one engine step so the ~60 ms relay round
        # trip overlaps the NEXT group's device execution — round-5 serving
        # throughput fix)
        self._prefill_pending = []
        self._timeline = None  # active gen_timeline window (dict) or None
        self._warmup_bg_thread = None  # stats-tail background compile
        self._inputs_logger = None
        if config.model_inputs_log_dir:
            from rtp_llm_tpu.utils.inputs_logger import ModelInputsLogger

            self._inputs_logger = ModelInputsLogger(
                config.model_inputs_log_dir)

        # beam search groups (engine/beam.py); processed synchronously per step
        self._beam_groups = []
        self._beam_jits = {}  # num_beams -> logits fn
        self._copy_blocks_jit = jax.jit(
            self._copy_blocks_impl, donate_argnums=(0,), static_argnums=(3,)
        )
        self._logsoftmax_jit = jax.jit(
            lambda logits: jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        )

        # dynamic multi-LoRA (reference: LoraManager, lora_manager.py:12)
        self.lora_manager = None

        # metrics
        self.step_count = 0
        self.tokens_generated = 0
        # serializes device-state mutation between the engine loop thread and
        # auxiliary executors (embedding) — reference analog: single engine
        # loop thread owning the executor (NormalEngine.cc:398)
        import threading

        self.device_lock = threading.Lock()

    # ---- EPLB (parallel/eplb.py) ----

    def apply_expert_balance(self, loads_by_layer, num_shards=None):
        """Rebalance the most-loaded MoE layer's expert placement (reference:
        ExpertBalancer::stepForward, cpp/models/eplb/ExpertBalancer.h:90).
        loads_by_layer: {stack_layer_pos: np[E] token counts}. The permutation
        relabels experts (outputs unchanged); the weight swap retraces the
        step programs on next use."""
        with self.device_lock:
            return self._apply_expert_balance_locked(loads_by_layer, num_shards)

    def _apply_expert_balance_locked(self, loads_by_layer, num_shards=None):
        from rtp_llm_tpu.parallel import eplb

        if num_shards is None:
            num_shards = (self.mesh.shape.get("tp", 1)
                          if self.mesh is not None else 1)
        if num_shards <= 1 and len(loads_by_layer or {}) == 0:
            return None
        layer = eplb.pick_layer(loads_by_layer, max(num_shards, 1))
        load = loads_by_layer[layer]
        replicated = "eplb_log2phy" in self.weights
        if replicated:
            # "before" against the CURRENT replicated placement
            cur_l2p = np.asarray(self.weights["eplb_log2phy"])[layer]
            cur_cnt = np.asarray(self.weights["eplb_rep_count"])[layer]
            np_phys = self.weights["moe_gate"].shape[1]
            before = eplb.replicated_imbalance(
                load, eplb.phy2log_from_mapping(cur_l2p, cur_cnt, np_phys),
                cur_cnt, max(num_shards, 1))
        else:
            before = eplb.imbalance(load, max(num_shards, 1))
        threshold = self.config.parallel.eplb_threshold
        if threshold > 0 and before <= threshold:
            return None
        if replicated:
            # replicated tier: hot experts get extra physical copies
            # (reference: rebalance_experts, eplb/eplb.py:193) — weight-row
            # rewrite only, no retrace
            num_phys = self.weights["moe_gate"].shape[1]
            mc = self.model.cfg
            phy2log, log2phy, rep_count = eplb.rebalance_experts(
                load, num_phys, max(num_shards, 1),
                num_groups=getattr(mc, "moe_n_group", 1) or 1,
                num_nodes=self.config.parallel.num_hosts,
            )
            after = eplb.replicated_imbalance(
                load, phy2log, rep_count, max(num_shards, 1))
            self.weights = eplb.apply_replicated_balance(
                self.weights, layer, phy2log, log2phy, rep_count)
            plan = phy2log.tolist()
        else:
            perm = eplb.balance_plan(load, max(num_shards, 1))
            after = eplb.imbalance(load, max(num_shards, 1), perm)
            self.weights = eplb.apply_layer_permutation(
                self.weights, layer, perm
            )
            plan = perm.tolist()
        from rtp_llm_tpu.utils.metrics import METRICS

        METRICS.inc("engine.eplb_rebalances")
        return {"layer": layer, "imbalance_before": before,
                "imbalance_after": after, "perm": plan}

    def _eplb_tick(self):
        """Closed-loop EPLB: every eplb_interval steps read the device-side
        gating accumulator, rebalance the hottest layer, reset the counts.
        Runs under device_lock from the step loop."""
        interval = self.config.parallel.eplb_interval
        if (not self._collect_gating or interval <= 0
                or self.step_count == 0
                or self.step_count % interval != 0):
            return
        loads = np.asarray(self.state.moe_gating)  # syncs; amortized by interval
        if loads.sum() == 0:
            return
        result = self._apply_expert_balance_locked({
            lid: loads[j] for j, lid in enumerate(self._moe_layer_ids)
        })
        if result is not None:
            self.state = self.state._replace(
                moe_gating=jnp.zeros_like(self.state.moe_gating)
            )
            logger.info("EPLB rebalanced layer %s (imbalance %.3f -> %.3f)",
                        result["layer"], result["imbalance_before"],
                        result["imbalance_after"])

    # ---- dynamic LoRA ----

    def set_lora_manager(self, manager):
        self.lora_manager = manager
        self.refresh_lora_weights()

    def refresh_lora_weights(self):
        """Re-pack adapter stacks into the weight pytree (triggers a re-trace
        of the device programs on the next call — the CUDA-graph-recapture
        analog for adapter set changes)."""
        pack = self.lora_manager.device_pack() if self.lora_manager else {}
        with self.device_lock:
            w = {k: v for k, v in self.weights.items() if ".lora_" not in k}
            if pack and ("qkv_proj" in w or "gate_up_proj" in w):
                # dynamic adapters target the per-tensor names: undo the
                # load-time fusion (exact last-axis splits)
                w = self.model.unfuse_weights(w)
            w.update(pack)
            self.weights = w

    def _inject_aux_weights(self, w: dict) -> dict:
        """Merge the model's host-resident auxiliary tables (rope cos/sin,
        alibi slopes — model.aux_weights()) into the weights pytree as device
        arrays, replicated under a mesh. Compiled programs then receive them
        as ARGUMENTS: one HBM copy shared by every program variant instead of
        a constant re-embedded into each program's HLO at lowering (which for
        a 7B model is ~16 MB of f32 per variant, and on a degraded device
        link blocks lowering entirely — the round-3 bench hang)."""
        aux_fn = getattr(self.model, "aux_weights", None)
        if aux_fn is None:
            return w
        aux = aux_fn()
        if not aux or all(k in w for k in aux):
            return w
        if not isinstance(w, dict):
            return w
        if self.mesh is not None and self.mesh.devices.size > 1:
            from rtp_llm_tpu.parallel.shardings import replicated

            rep = replicated(self.mesh)
            put = lambda a: jax.device_put(jnp.asarray(a), rep)
        else:
            put = jnp.asarray
        for k, v in aux.items():
            w.setdefault(k, put(v))
        return w

    def _adapter_id_for(self, stream) -> int:
        if self.lora_manager is None:
            return 0
        return self.lora_manager.adapter_id(stream.config.adapter_name)

    # ---- sizing ----

    def _auto_size_blocks(self) -> int:
        """Size the KV pool from free device memory after weights
        (reference: CacheConfigCreator, cpp/cache/CacheConfigCreator.cc)."""
        cc = self.config.cache
        mc = self.model.cfg
        dev = jax.devices()[0]
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats and stats.get("bytes_limit"):
            free = stats["bytes_limit"] * cc.memory_utilization - stats.get(
                "bytes_in_use", 0
            ) - cc.reserve_runtime_mem_mb * (1 << 20)
        elif dev.platform == "cpu":
            # CPU backend: keep the pool SMALL — XLA:CPU does not
            # reliably alias huge donated buffers across scan steps, so an
            # oversized pool turns every decode step into whole-pool memcpys
            # (measured: 14 s/step on a tiny model with a 2 GiB pool)
            free = 256 << 20
        else:
            # TPU without memory_stats (tunneled/remote PJRT): budget from
            # the device kind's known HBM minus the RESIDENT weight bytes.
            # Falling into the CPU fallback here starved serving to a
            # 139-block pool on a 16 GB chip (measured: decode batch avg 7
            # of 64, TTFT p50 33.7 s under 8 req/s load).
            hbm_gb = float(runtime_flags.get("hbm_gb")) or {
                "TPU v4": 32.0, "TPU v5 lite": 16.0, "TPU v5e": 16.0,
                "TPU v5": 95.0, "TPU v5p": 95.0, "TPU v6 lite": 32.0,
                "TPU v6e": 32.0,
            }.get(dev.device_kind, 16.0)
            wbytes = sum(
                getattr(w, "nbytes", 0)
                for w in jax.tree.leaves(self.weights))
            # 0.8 of physical, not memory_utilization: bytes_limit on a
            # visible device already excludes the runtime's own reservation,
            # but here we only know the PHYSICAL size — a 0.9 budget OOM'd
            # on v5e (16 GB phys, ~14.5 usable, plus program workspace)
            util = min(cc.memory_utilization, 0.8)
            free = (hbm_gb * (1 << 30) * util - wbytes
                    - cc.reserve_runtime_mem_mb * (1 << 20))
        kv_dtype_bytes = 1 if self.config.quant.kv_cache_dtype in ("int8", "fp8") else 2
        n_pool_layers = mc.num_layers
        if getattr(self.model, "swa_split", False):
            # SWA layers live in a fixed per-slot ring pool: subtract its
            # bytes from the budget; only full layers scale with the pool
            n_pool_layers = len(self.model._full_pos)
            span = max(self.config.scheduler.prefill_buckets)
            nring = -(-(mc.sliding_window + span) // cc.block_size) + 1
            free -= (len(self.model._swa_pos) * 2
                     * self.config.scheduler.max_batch_size * nring
                     * cc.block_size * mc.num_kv_heads * mc.head_dim
                     * kv_dtype_bytes)
        per_block = (
            2 * n_pool_layers * cc.block_size * mc.num_kv_heads * mc.head_dim
            * kv_dtype_bytes
        )
        n = max(16, int(free // per_block))
        logger.info("auto-sized KV pool: %d blocks (%.1f MiB)", n, n * per_block / 1e6)
        return n

    # ---- device programs ----

    MAX_NGRAM_BANS = 16  # per-row cap on no-repeat-ngram banned tokens

    def _decode_impl(self, weights, kv, state: ds.DecodeState, need_sampling=True,
                     ban_tokens=None, allow_tokens=None, kv_blocks=None,
                     need_stats=True):
        active = state.kv_lens > 0
        kv_lens_new = jnp.where(active, state.kv_lens + 1, 0)
        bt = (state.block_tables if kv_blocks is None
              else state.block_tables[:, :kv_blocks])
        inputs = ModelInputs(
            tokens=state.last_tokens[:, None],
            positions=jnp.where(active, state.kv_lens, 0)[:, None],
            block_tables=bt,
            kv_lens=kv_lens_new,
            q_offsets=state.kv_lens,
            adapter_ids=state.adapter_ids,
            pos_deltas=state.pos_deltas,
        )
        fwd_kw = {}
        if self._collect_gating:
            fwd_kw["need_moe_gating"] = True
        if self._defer_decode:
            out, kv = self.model.forward(weights, kv, inputs,
                                         defer_kv_writes=True, **fwd_kw)
            kv = self._apply_kv_writes(kv, out.kv_writes, state, active)
        else:
            out, kv = self.model.forward(weights, kv, inputs, **fwd_kw)
        if self._collect_gating and out.moe_gating is not None:
            state = state._replace(
                moe_gating=state.moe_gating + out.moe_gating
            )
        rng, key = jax.random.split(state.rng)
        tokens, logprobs, new_counts = sample_tokens(
            out.logits, state.params, state.prompt_mask, state.output_counts,
            self.eos_ids, key, need_sampling=need_sampling,
            forced_tokens=state.forced_tokens, ban_tokens=ban_tokens,
            bias_ids=state.bias_ids, bias_vals=state.bias_vals,
            allow_tokens=allow_tokens, active=active,
            need_stats=need_stats,
        )
        tokens = jnp.where(active, tokens, state.last_tokens)
        state = state._replace(
            last_tokens=tokens, kv_lens=kv_lens_new,
            output_counts=new_counts, rng=rng,
            # one-shot forcing: device clears after applying so an in-flight
            # pipelined step can't re-fire it; the host re-arms if needed
            forced_tokens=jnp.full_like(state.forced_tokens, -1),
        )
        return kv, state, tokens, logprobs

    def _apply_kv_writes(self, kv, kv_writes, state, active):
        """Scatter every layer's deferred K/V rows in one shot (reduces the
        decode step from 2L scatters to 1; int8-KV: quantize all layers'
        rows together, then one data scatter + one scale scatter)."""
        from rtp_llm_tpu.ops.kv_cache import quantize_kv, token_slots

        kw, vw = kv_writes  # [L, B, HD]
        l, b, hd = kw.shape
        if isinstance(kv, dict):
            hkv = kv["scale"].shape[-1]
            kq, ks, vq, vs = quantize_kv(
                kw.reshape(l * b, hkv, hd // hkv),
                vw.reshape(l * b, hkv, hd // hkv),
            )
            data = self._scatter_flat(
                kv["data"], kq.reshape(l, b, hd), vq.reshape(l, b, hd),
                state, active)
            scale = self._scatter_flat(
                kv["scale"], ks.reshape(l, b, hkv), vs.reshape(l, b, hkv),
                state, active)
            return {"data": data, "scale": scale}
        return self._scatter_flat(kv, kw, vw, state, active)

    def _scatter_flat(self, kv, kw, vw, state, active):
        """One batched scatter of per-layer K and V rows into a
        [L, 2, NS, C] pool."""
        from rtp_llm_tpu.ops.kv_cache import token_slots

        l, b, hd = kw.shape
        ns = kv.shape[2]
        # int32 index math: the OOB sentinel from token_slots is 2**30, so the
        # largest index is (2l-1)*ns + 2**30 — must stay below int32 max for
        # mode="drop" to see a positive out-of-range index (not a wrapped
        # negative one that silently corrupts row 0's neighborhood)
        assert l * 2 * ns + (1 << 30) < (1 << 31), (
            f"KV pool too large for int32 deferred-write indices "
            f"(layers={l}, slots={ns})")
        slots = token_slots(
            jnp.where(active, state.kv_lens, 0)[:, None],
            state.block_tables, self.block_size, active[:, None],
        ).reshape(-1)  # [B] (invalid -> OOB drop)
        base = (jnp.arange(l, dtype=jnp.int32) * 2)[:, None] * ns  # [L,1]
        idx_k = (base + slots[None, :].astype(jnp.int32)).reshape(-1)
        idx_v = (base + ns + slots[None, :].astype(jnp.int32)).reshape(-1)
        flat = kv.reshape(l * 2 * ns, hd)
        flat = flat.at[jnp.concatenate([idx_k, idx_v])].set(
            jnp.concatenate([kw.reshape(-1, hd), vw.reshape(-1, hd)]
                            ).astype(flat.dtype),
            mode="drop",
        )
        return flat.reshape(kv.shape)

    def _decode_multi_impl(self, weights, kv, state: ds.DecodeState,
                           need_sampling=True, n_steps=8, kv_blocks=None,
                           need_stats=True):
        """n_steps fused decode iterations in one program: scan over the
        decode body, stacking the sampled tokens. One dispatch + one readback
        per n_steps tokens (reference analog: CUDA-graph replay loops)."""

        def body(carry, _):
            kv, st = carry
            kv, st, tokens, logprobs = self._decode_impl(
                weights, kv, st, need_sampling, kv_blocks=kv_blocks,
                need_stats=need_stats,
            )
            return (kv, st), (tokens, logprobs)

        (kv, state), (toks, lps) = jax.lax.scan(
            body, (kv, state), None, length=n_steps
        )
        return kv, state, toks, lps  # [n_steps, B]

    def _verify_impl(self, weights, kv, state: ds.DecodeState, drafts,
                     return_hidden=False):
        """Speculative verify step: T = K+1 forward over [last_token, drafts],
        greedy acceptance of the matching draft prefix. Penalties/eos-ban use
        pre-step statistics broadcast over the window (one-step approximation,
        matching the reference's per-step penalty application)."""
        b, k = drafts.shape
        t = k + 1
        active = state.kv_lens > 0
        tokens = jnp.concatenate([state.last_tokens[:, None], drafts], axis=1)
        offs = jnp.arange(t, dtype=jnp.int32)[None, :]
        positions = jnp.where(active[:, None], state.kv_lens[:, None] + offs, 0)
        inputs = ModelInputs(
            tokens=tokens,
            positions=positions,
            block_tables=state.block_tables,
            kv_lens=jnp.where(active, state.kv_lens + t, 0),
            q_offsets=state.kv_lens,
            adapter_ids=state.adapter_ids,
            pos_deltas=state.pos_deltas,
        )
        out, kv = self.model.forward(weights, kv, inputs,
                                     need_all_logits=True,
                                     need_all_hidden=return_hidden)
        logits = out.all_logits  # [B, T, V] f32

        from rtp_llm_tpu.ops.sampling import NEG_INF, apply_penalties

        logits = jax.vmap(
            lambda l: apply_penalties(
                l, state.prompt_mask, state.output_counts, state.params
            ),
            in_axes=1, out_axes=1,
        )(logits)
        if self.eos_ids:
            eos = jnp.array(list(self.eos_ids), dtype=jnp.int32)
            ban_row = jnp.zeros((logits.shape[-1],), bool).at[eos].set(True)
            ban = state.params.ban_eos[:, None, None] & ban_row[None, None, :]
            logits = jnp.where(ban, NEG_INF, logits)

        g, n_new = greedy_verify(logits, drafts)  # [B,T], [B]
        n_new = jnp.where(active, n_new, 0)

        rows = jnp.arange(b)
        upd = (offs < n_new[:, None]).astype(jnp.int32)  # [B,T]
        new_counts = state.output_counts.at[rows[:, None], g].add(
            upd.astype(state.output_counts.dtype), mode="drop")
        last = g[rows, jnp.clip(n_new - 1, 0, t - 1)]
        state = state._replace(
            last_tokens=jnp.where(active, last, state.last_tokens),
            kv_lens=jnp.where(active, state.kv_lens + n_new, 0),
            output_counts=new_counts,
        )
        if return_hidden:
            # pre-final-norm hidden at each row's accepted position — the MTP
            # proposer chains from it (engine/mtp.py)
            hid = out.all_hidden[rows, jnp.clip(n_new - 1, 0, t - 1)]
            return kv, state, g, n_new, hid
        return kv, state, g, n_new

    def _prefill_impl(self, weights, kv, tokens, positions, block_tables,
                      kv_lens, q_offsets, adapter_ids=None, state_slots=None):
        if self.mesh is not None and self.mesh.shape.get("cp", 1) > 1:
            # prefill context parallelism: shard the prompt's token dim over
            # cp — GSPMD partitions the per-token compute and attention rows
            # (reference: PCPAllGatherAttnOp scheme, allgather_cp_impl.py:34)
            from jax.sharding import NamedSharding, PartitionSpec as P

            if self._cp_ring:
                # zig-zag column layout: rank r holds sequence chunks r and
                # 2n-1-r, balancing causal work (ZigzagProcessor.h:18);
                # attention runs ring-wise (model.use_ring_prefill)
                from rtp_llm_tpu.ops.attention.ring import zigzag_perm

                perm = zigzag_perm(tokens.shape[1],
                                   self.mesh.shape["cp"])
                tokens = tokens[:, perm]
                positions = positions[:, perm]
            cons = NamedSharding(self.mesh, P(None, "cp"))
            tokens = jax.lax.with_sharding_constraint(tokens, cons)
            positions = jax.lax.with_sharding_constraint(positions, cons)
        inputs = ModelInputs(
            tokens=tokens, positions=positions, block_tables=block_tables,
            kv_lens=kv_lens, q_offsets=q_offsets, adapter_ids=adapter_ids,
            state_slots=state_slots,
        )
        out, kv = self.model.forward(weights, kv, inputs)
        return kv, out.logits

    def _first_sample_impl(self, logits, params: SamplingParams, prompt_mask, rng,
                           need_sampling=True, ban_tokens=None,
                           bias_ids=None, bias_vals=None, allow_tokens=None):
        counts = jnp.zeros(logits.shape, jnp.int16)
        rng, key = jax.random.split(rng)
        tokens, logprobs, _ = sample_tokens(
            logits, params, prompt_mask, counts, self.eos_ids, key,
            need_sampling=need_sampling, ban_tokens=ban_tokens,
            bias_ids=bias_ids, bias_vals=bias_vals, allow_tokens=allow_tokens,
        )
        return tokens, logprobs, rng

    def _prefill_mm_impl(self, weights, kv, tokens, positions, block_tables,
                         kv_lens, q_offsets, mrope_positions, mm_embeds,
                         mm_mask):
        inputs = ModelInputs(
            tokens=tokens, positions=positions, block_tables=block_tables,
            kv_lens=kv_lens, q_offsets=q_offsets,
            mrope_positions=mrope_positions, mm_embeds=mm_embeds,
            mm_mask=mm_mask,
        )
        out, kv = self.model.forward(weights, kv, inputs)
        return kv, out.logits

    def _get_prefill_mm_fn(self, bucket: int):
        fn = self._prefill_mm_jits.get(bucket)
        if fn is None:
            fn = jax.jit(self._prefill_mm_impl, donate_argnums=(1,))
            self._prefill_mm_jits[bucket] = fn
        return fn

    def _prefill_hidden_impl(self, weights, kv, tokens, positions,
                             block_tables, kv_lens, q_offsets,
                             adapter_ids=None):
        inputs = ModelInputs(
            tokens=tokens, positions=positions, block_tables=block_tables,
            kv_lens=kv_lens, q_offsets=q_offsets, adapter_ids=adapter_ids,
        )
        out, kv = self.model.forward(weights, kv, inputs, need_all_hidden=True)
        return kv, out.logits, out.all_hidden

    def _get_prefill_hidden_fn(self, bucket: int):
        fn = self._prefill_hidden_jits.get(bucket)
        if fn is None:
            fn = jax.jit(self._prefill_hidden_impl, donate_argnums=(1,))
            self._prefill_hidden_jits[bucket] = fn
        return fn

    def generate_with_hidden(self, prompt_token_ids, config=None):
        """Synchronous generate that also returns the final-layer hidden
        state that produced each output token (reference: GenerateConfig
        return_hidden_states, consumed by RL reward/scoring clients).

        Teacher-forced loop over the hidden-returning prefill program — not
        the fused decode path (hidden plumbing through the decode scan would
        retrace every hot program for a cold feature). Returns
        (GenerateStream, hidden [n_out, H] float32)."""
        from rtp_llm_tpu.config.generate_config import GenerateConfig
        from rtp_llm_tpu.engine.stream import StreamState

        config = config or GenerateConfig()
        # private allocation — NOT scheduler-admitted (the engine loop could
        # otherwise pick the stream up concurrently from another thread)
        stream = GenerateStream(list(prompt_token_ids), config)
        with self.device_lock:
            alloc = self.cache_mgr.allocate(list(prompt_token_ids),
                                            allow_reuse=False)
        if alloc is None:
            raise RuntimeError("KV pool exhausted")
        stream.alloc = alloc
        stream.state = StreamState.RUNNING
        hiddens = []
        with self.device_lock:
            block_row = np.zeros((self.max_blocks_per_seq,), np.int32)
            block_row[: len(stream.alloc.blocks)] = stream.alloc.blocks
            rng = jax.random.PRNGKey(config.seed or 0)
            toks = list(prompt_token_ids)
            pos = 0
            while True:
                t_real = len(toks) - pos
                bucket = self._pick_bucket(t_real)
                tk = np.zeros((1, bucket), np.int32)
                tk[0, :t_real] = toks[pos : pos + bucket][: t_real]
                ps = np.zeros((1, bucket), np.int32)
                ps[0, :t_real] = np.arange(pos, pos + t_real)
                self.kv, logits, hid = self._get_prefill_hidden_fn(bucket)(
                    self.weights, self.kv, jnp.asarray(tk), jnp.asarray(ps),
                    jnp.asarray(block_row)[None, :],
                    jnp.asarray([pos + t_real], np.int32),
                    jnp.asarray([pos], np.int32),
                    jnp.zeros((1,), np.int32),
                )
                last_hid = np.asarray(hid[0, t_real - 1], np.float32)
                if pos + t_real < len(toks):
                    pos += t_real
                    continue
                # sample the next token from the last position's logits
                lg = np.asarray(logits[0], np.float32)
                if config.do_sample and config.temperature > 0:
                    rng, key = jax.random.split(rng)
                    p_ = jax.nn.softmax(
                        jnp.asarray(lg) / max(config.temperature, 1e-5))
                    tok = int(jax.random.choice(key, lg.shape[0], p=p_))
                else:
                    tok = int(np.argmax(lg))
                hiddens.append(last_hid)
                finished = stream.append_token(
                    tok, self.eos_ids,
                    max_seq_len=self.config.scheduler.max_seq_len)
                if finished or len(stream.output_token_ids) >=                         config.max_new_tokens:
                    if not stream.is_finished():
                        from rtp_llm_tpu.engine.stream import FinishReason

                        stream.finish(FinishReason.LENGTH)
                    break
                if not self.cache_mgr.extend(stream.alloc, len(toks) + 2):
                    from rtp_llm_tpu.engine.stream import FinishReason

                    stream.finish(FinishReason.LENGTH)
                    break
                block_row[: len(stream.alloc.blocks)] = stream.alloc.blocks
                toks.append(tok)
                pos = len(toks) - 1
            self.cache_mgr.free(stream.alloc)
            stream.alloc = None
        return stream, np.stack(hiddens) if hiddens else np.zeros(
            (0, self.model.cfg.hidden_size), np.float32)

    def _prefill_loss_impl(self, weights, kv, tokens, positions, block_tables,
                           kv_lens, q_offsets, next_tokens):
        """Chunked teacher-forced NLL: loss[t] = -log p(next_tokens[t] |
        prefix) from the full-position logits — model-agnostic (works for
        post-norm and MLA hidden conventions alike)."""
        inputs = ModelInputs(
            tokens=tokens, positions=positions, block_tables=block_tables,
            kv_lens=kv_lens, q_offsets=q_offsets,
        )
        out, kv = self.model.forward(weights, kv, inputs,
                                     need_all_logits=True)
        lg = out.all_logits  # [1, T, V] f32
        lse = jax.nn.logsumexp(lg, axis=-1)
        lp = jnp.take_along_axis(lg, next_tokens[..., None], axis=-1)[..., 0]
        return kv, lse - lp  # [1, T] NLL

    def compute_prompt_loss(self, prompt_token_ids) -> np.ndarray:
        """Per-token negative log-likelihood of the prompt, teacher-forced
        (reference: GenerateConfig.calculate_loss, GenerateConfig.h:56 —
        the RL/scoring clients' loss return). Returns [len(prompt)-1]
        float32: loss[i] = -log p(t_{i+1} | t_{<=i})."""
        prompt = list(prompt_token_ids)
        if len(prompt) < 2:
            return np.zeros((0,), np.float32)
        if len(prompt) > self.config.scheduler.max_seq_len:
            raise ValueError(
                f"prompt length {len(prompt)} exceeds max_seq_len "
                f"{self.config.scheduler.max_seq_len}")
        # transient pool pressure waits (like scheduler admission) instead
        # of failing the request
        alloc = None
        for _ in range(200):
            with self.device_lock:
                alloc = self.cache_mgr.allocate(prompt, allow_reuse=False)
            if alloc is not None:
                break
            time.sleep(0.05)
        if alloc is None:
            raise RuntimeError("KV pool exhausted")
        try:
            block_row = np.zeros((self.max_blocks_per_seq,), np.int32)
            block_row[: len(alloc.blocks)] = alloc.blocks
            losses = []
            pos = 0
            if not hasattr(self, "_prefill_loss_jits"):
                self._prefill_loss_jits = {}
            fn_cache = self._prefill_loss_jits  # per-bucket, engine-wide
            while pos < len(prompt):
                t_real = min(len(prompt) - pos,
                             self.config.scheduler.prefill_buckets[-1])
                bucket = self._pick_bucket(t_real)
                tk = np.zeros((1, bucket), np.int32)
                tk[0, :t_real] = prompt[pos: pos + t_real]
                ps = np.zeros((1, bucket), np.int32)
                ps[0, :t_real] = np.arange(pos, pos + t_real)
                nxt = np.zeros((1, bucket), np.int32)
                n_next = min(t_real, len(prompt) - pos - 1)
                if n_next > 0:
                    nxt[0, :n_next] = prompt[pos + 1: pos + 1 + n_next]
                fn = fn_cache.get(bucket)
                if fn is None:
                    fn = fn_cache[bucket] = jax.jit(
                        self._prefill_loss_impl, donate_argnums=(1,))
                # lock per chunk: concurrent decode steps interleave
                # instead of stalling for the whole prompt
                with self.device_lock:
                    self.kv, nll = fn(
                        self.weights, self.kv, jnp.asarray(tk),
                        jnp.asarray(ps), jnp.asarray(block_row)[None, :],
                        jnp.asarray([pos + t_real], np.int32),
                        jnp.asarray([pos], np.int32),
                        jnp.asarray(nxt),
                    )
                losses.append(np.asarray(nll[0, :n_next], np.float32))
                pos += t_real
        finally:
            with self.device_lock:
                self.cache_mgr.free(alloc)
        return (np.concatenate(losses) if losses
                else np.zeros((0,), np.float32))

    def _get_prefill_fn(self, bucket: int):
        fn = self._prefill_jits.get(bucket)
        if fn is None:
            fn = jax.jit(self._prefill_impl, donate_argnums=(1,))
            self._prefill_jits[bucket] = fn
        return fn

    def _pick_bucket(self, n: int) -> int:
        for b in self.config.scheduler.prefill_buckets:
            if n <= b:
                return b
        return self.config.scheduler.prefill_buckets[-1]

    # ---- host KV tier (cache/host_tier.py) ----

    def _block_rows_to_host(self, block: int):
        """Device rows of one block -> host np pytree (eviction spill)."""
        bs = self.block_size
        return jax.tree.map(
            lambda a: np.asarray(a[..., block * bs : (block + 1) * bs, :]),
            self.kv,
        )

    def _apply_restores(self, alloc):
        """Scatter host-tier rows into freshly allocated device blocks
        (restore side of the memory-tier connector)."""
        if not getattr(alloc, "restore", None):
            return
        from rtp_llm_tpu.utils.metrics import METRICS

        bs = self.block_size
        for block, rows in alloc.restore:
            idx = jnp.arange(block * bs, (block + 1) * bs, dtype=jnp.int32)
            self.kv = jax.tree.map(
                lambda a, r: a.at[..., idx, :].set(jnp.asarray(r, a.dtype)),
                self.kv, rows,
            )
        METRICS.inc("cache.host_tier_restored_blocks", len(alloc.restore))
        alloc.restore = []

    # ---- beam search (engine/beam.py) ----

    @staticmethod
    def _copy_blocks_impl(kv, src_blocks, dst_blocks, block_size):
        """Copy whole KV blocks (all layers): paged copy-on-fork for beams
        (reference analog: kv_cache_update_mapping block copies,
        NormalExecutor.cc:166). src/dst: [m] block ids; -1 = no-op."""
        bs = block_size
        offs = jnp.arange(bs, dtype=jnp.int32)[None, :]
        src_rows = (src_blocks[:, None] * bs + offs).reshape(-1)
        dst = jnp.where(dst_blocks < 0, jnp.int32(2**30 // bs), dst_blocks)
        dst_rows = (dst[:, None] * bs + offs).reshape(-1)
        def copy(a):
            return a.at[..., dst_rows, :].set(a[..., src_rows, :], mode="drop")

        return jax.tree.map(copy, kv)

    def copy_blocks(self, src: list, dst: list):
        if not src:
            return
        self.kv = self._copy_blocks_jit(
            self.kv, jnp.asarray(src, jnp.int32), jnp.asarray(dst, jnp.int32),
            self.block_size,
        )

    def _beam_logits_fn(self, k: int):
        fn = self._beam_jits.get(k)
        if fn is None:
            def impl(weights, kv, tokens, positions, bt, kv_lens, q_offsets):
                inputs = ModelInputs(tokens, positions, bt, kv_lens, q_offsets)
                out, kv = self.model.forward(weights, kv, inputs)
                return kv, jax.nn.log_softmax(
                    out.logits.astype(jnp.float32), axis=-1
                )
            fn = jax.jit(impl, donate_argnums=(1,))
            self._beam_jits[k] = fn
        return fn

    def _run_beam_prefill(self, stream):
        """Prefill + branch into num_beams beams (no decode slot used)."""
        from rtp_llm_tpu.engine.beam import BeamGroup

        logits = self._prefill_forward(stream)  # [1, V]
        logprobs = np.asarray(self._logsoftmax_jit(logits))[0]
        k = stream.config.max_num_beams
        group = BeamGroup(stream, k, self.cache_mgr, self.block_size)
        # effective budget: never let a beam outgrow max_seq_len (its block
        # table row is fixed at max_blocks_per_seq)
        group.max_new = max(1, min(
            stream.config.max_new_tokens,
            self.config.scheduler.max_seq_len - stream.prompt_len,
        ))
        group.init_from_prefill(
            stream.alloc.blocks, logprobs, self.eos_ids, group.max_new,
        )
        # block ownership: beam 0 inherits the stream allocation; others share
        # full blocks and fork the partial tail
        parent_blocks = stream.alloc.blocks
        stream.alloc.blocks = []  # ownership moves to the beams
        p = stream.prompt_len
        self._beam_groups.append(group)
        if not self._beam_fix_blocks(group, parent_blocks, seq_len=p):
            # pool exhausted before the fork: finish with the best first token
            group.beams[0].blocks = list(parent_blocks)
            for b in group.beams[1:]:
                b.blocks = []
            self._finish_beam_group(group)

    def _beam_fix_blocks(self, group, parent_blocks, seq_len) -> bool:
        """Give each beam writable KV coverage for its pending token at
        ``seq_len``. Beam 0 inherits parent_blocks; the rest share full blocks
        (ref) and copy the partial tail when one exists. All fresh blocks are
        claimed in one malloc so OOM leaves no partial refcounts; returns
        False on OOM (caller finishes the group)."""
        bs = self.block_size
        pool = self.cache_mgr.pool
        k = len(group.beams)
        need_fresh_tail = seq_len % bs == 0  # pending token opens a new block
        n_fresh = (k - 1) + (1 if need_fresh_tail else 0)
        fresh = self.cache_mgr._malloc(n_fresh) if n_fresh else []
        if fresh is None:
            return False
        copies_src, copies_dst = [], []
        fi = 0
        for i, beam in enumerate(group.beams):
            if i == 0:
                blocks = list(parent_blocks)
                if need_fresh_tail:
                    blocks.append(fresh[fi]); fi += 1
            elif need_fresh_tail:
                shared = list(parent_blocks)
                pool.ref(shared)
                blocks = shared + [fresh[fi]]; fi += 1
            else:
                shared = list(parent_blocks[:-1])
                pool.ref(shared)
                blocks = shared + [fresh[fi]]
                copies_src.append(parent_blocks[-1])
                copies_dst.append(fresh[fi]); fi += 1
            beam.blocks = blocks
        self.copy_blocks(copies_src, copies_dst)
        return True

    def _beam_step(self, group):
        """One decode+rerank step for a beam group."""
        from rtp_llm_tpu.engine.stream import FinishReason

        k = len(group.beams)
        stream = group.stream
        n = group.seq_len(group.beams[0]) - 1  # position of pending tokens
        mb = self.max_blocks_per_seq
        bt = np.zeros((k, mb), np.int32)
        toks = np.zeros((k, 1), np.int32)
        for i, beam in enumerate(group.beams):
            bt[i, : len(beam.blocks)] = beam.blocks
            toks[i, 0] = beam.tokens[-1]
        fn = self._beam_logits_fn(k)
        self.kv, logprobs = fn(
            self.weights, self.kv,
            jnp.asarray(toks),
            jnp.full((k, 1), n, jnp.int32),
            jnp.asarray(bt),
            jnp.full((k,), n + 1, jnp.int32),
            jnp.full((k,), n, jnp.int32),
        )
        lp = np.asarray(logprobs)
        children = group.advance(
            lp, self.eos_ids if not stream.config.ignore_eos else (),
            group.max_new,
        )
        self.tokens_generated += len(children)

        if group.done or not children or stream.is_finished():
            self._finish_beam_group(group)
            return

        # rebuild beams: per-parent forking of KV tails at position n+1.
        # All fresh blocks are claimed in one malloc; on OOM the old beams are
        # intact, so the group finishes with its best hypothesis instead of
        # raising out of step() (one bad request must not kill the batch).
        old_beams = group.beams
        bs = self.block_size
        pool = self.cache_mgr.pool
        new_pos = n + 1
        need_fresh_tail = new_pos % bs == 0
        from rtp_llm_tpu.engine.beam import Beam

        used_parents = {p for (p, _t, _s) in children}
        n_fresh = (len(children) - len(used_parents)
                   + (len(used_parents) if need_fresh_tail else 0))
        fresh_all = self.cache_mgr._malloc(n_fresh) if n_fresh else []
        if fresh_all is None:
            self._finish_beam_group(group)
            return
        fi = 0
        new_beams = [None] * len(children)
        copies_src, copies_dst = [], []
        inherited = set()  # parents whose block list one child took over
        for ci, (parent, tok, score) in enumerate(children):
            pbeam = old_beams[parent]
            if parent not in inherited:
                inherited.add(parent)
                blocks = list(pbeam.blocks)
                if need_fresh_tail:
                    blocks.append(fresh_all[fi]); fi += 1
            elif need_fresh_tail:
                shared = list(pbeam.blocks)
                pool.ref(shared)
                blocks = shared + [fresh_all[fi]]; fi += 1
            else:
                shared = list(pbeam.blocks[:-1])
                pool.ref(shared)
                blocks = shared + [fresh_all[fi]]
                copies_src.append(pbeam.blocks[-1])
                copies_dst.append(fresh_all[fi]); fi += 1
            new_beams[ci] = Beam(
                tokens=pbeam.tokens + [tok], cum_logprob=score, blocks=blocks
            )
        # release parents that produced no inheriting child
        for pi, pbeam in enumerate(old_beams):
            if pi not in used_parents:
                pool.free(pbeam.blocks)
        self.copy_blocks(copies_src, copies_dst)
        group.beams = new_beams

    def _finish_beam_group(self, group):
        from rtp_llm_tpu.engine.stream import FinishReason, StreamOutput

        stream = group.stream
        best = group.best()
        for beam in group.beams:
            self.cache_mgr.pool.free(beam.blocks)
        group.beams = []
        self._beam_groups.remove(group)
        if not stream.is_finished():
            stream.output_token_ids = list(best.tokens)
            stream.finish(
                FinishReason.STOP if group.finished else FinishReason.LENGTH,
                emit_all=True,
            )
        self.scheduler.release(stream)

    # ---- prefill path ----

    def _prefill_forward(self, stream: GenerateStream, state_slot=None):
        """Chunked prefill of stream's non-reused context; returns last-chunk
        logits [1, V] (the distribution for the first generated token). For
        preemption recompute the context includes previously generated tokens
        (stream.context_token_ids)."""
        prompt = stream.context_token_ids
        p = len(prompt)
        self._apply_restores(stream.alloc)
        r = stream.reuse_len
        block_row = np.zeros((self.max_blocks_per_seq,), np.int32)
        blocks = stream.alloc.blocks
        block_row[: len(blocks)] = blocks
        block_row_j = jnp.asarray(block_row)

        max_bucket = self.config.scheduler.prefill_buckets[-1]
        logits = None
        mtp_chunks = [] if self.mtp is not None else None
        pos = r
        while pos < p:
            chunk = prompt[pos : pos + max_bucket]
            t_real = len(chunk)
            bucket = self._pick_bucket(t_real)
            toks = np.zeros((1, bucket), np.int32)
            toks[0, :t_real] = chunk
            positions = np.zeros((1, bucket), np.int32)
            positions[0, :t_real] = np.arange(pos, pos + t_real)
            if self._cp_ring:
                # ring CP keys validity on POSITION VALUES (columns get
                # zig-zag permuted); padded columns carry a huge sentinel
                positions[0, t_real:] = 1 << 30
            aid = self._adapter_id_for(stream)
            extra = ()
            if state_slot is not None:
                extra = (jnp.asarray([state_slot], np.int32),)
            if stream.mm is not None:
                mm = stream.mm
                h = mm.embeds.shape[-1]  # may pack deepstack channels
                mm_len = mm.positions3.shape[1]
                if p > mm_len:
                    # recompute covers generated tokens past the prompt: text
                    # continuation positions (pos + delta), no vision embeds
                    tail = np.arange(mm_len, p, dtype=np.int32) + int(mm.delta)
                    pos3 = np.concatenate(
                        [mm.positions3, np.tile(tail, (3, 1))], axis=1)
                    embs = np.concatenate(
                        [mm.embeds, np.zeros((p - mm_len, h), mm.embeds.dtype)])
                    mask = np.concatenate(
                        [mm.mask, np.zeros((p - mm_len,), bool)])
                else:
                    pos3, embs, mask = mm.positions3, mm.embeds, mm.mask
                m3 = np.zeros((1, 3, bucket), np.int32)
                m3[0, :, :t_real] = pos3[:, pos : pos + t_real]
                emb = np.zeros((1, bucket, h), np.float32)
                emb[0, :t_real] = embs[pos : pos + t_real]
                msk = np.zeros((1, bucket), bool)
                msk[0, :t_real] = mask[pos : pos + t_real]
                self.kv, logits = self._get_prefill_mm_fn(bucket)(
                    self.weights, self.kv,
                    jnp.asarray(toks), jnp.asarray(positions),
                    block_row_j[None, :],
                    jnp.asarray([pos + t_real], np.int32),
                    jnp.asarray([pos], np.int32),
                    jnp.asarray(m3), jnp.asarray(emb), jnp.asarray(msk),
                )
                pos += t_real
                continue
            args = (
                self.weights, self.kv,
                jnp.asarray(toks), jnp.asarray(positions),
                block_row_j[None, :],
                jnp.asarray([pos + t_real], np.int32),
                jnp.asarray([pos], np.int32),
                jnp.asarray([aid], np.int32),
            )
            if self._inputs_logger is not None:
                self._inputs_logger.log_prefill(
                    self.step_count, toks, positions, block_row[None, :],
                    [pos + t_real], [pos], [aid])
            if mtp_chunks is not None:
                self.kv, logits, hid = self._get_prefill_hidden_fn(bucket)(*args)
                mtp_chunks.append((pos, hid))
            else:
                self.kv, logits = self._get_prefill_fn(bucket)(*args, *extra)
            pos += t_real
        if mtp_chunks is not None:
            self.mtp.prefill(prompt, mtp_chunks, block_row)
            # pre-norm hidden of the final prompt position seeds the rollout
            lpos, lhid = mtp_chunks[-1]
            self._mtp_seed_hidden = lhid[0, (p - 1) - lpos]
        return logits

    PREFILL_PACK = 4  # padded batch size for packed prefill calls

    def _run_prefills_packed(self, streams):
        """Pack short new streams into one batched prefill program call
        (reference analog: the executor's combined context batch,
        cpp/normal_engine/NormalExecutor.cc:132-221). Streams whose
        non-reused prompt exceeds the largest bucket fall back to the
        chunked single-stream path.

        Groups are PIPELINED: every group's prefill + first-token-sample
        programs are dispatched back-to-back (JAX dispatch is async; the
        device executes them in order), and token fetch + decode-slot
        insertion happen in a second pass. Host-side prep of group N+1 then
        overlaps with the device running group N, and the per-group
        device round trip is paid once at the drain instead of serializing
        every group (round-4 serving bottleneck: ~227 ms host overhead per
        68-202 ms prefill program)."""
        max_bucket = self.config.scheduler.prefill_buckets[-1]
        if self.is_hybrid or self.swa_split or self.mtp is not None:
            # per-slot state (hybrid/SWA rings) / per-stream hidden seeding
            # (MTP): single-stream prefill path only
            for s in streams:
                self._run_prefill(s)
            return
        packable, chunked = [], []
        for s in streams:
            (packable if len(s.context_token_ids) - s.reuse_len <= max_bucket
             and s.mm is None and not s.is_recompute
             and s.tree_state is None else chunked).append(s)
        for s in chunked:
            self._run_prefill(s)
        prev, self._prefill_pending = self._prefill_pending, []
        i = 0
        if len(packable) == 1 and not prev:
            self._run_prefill(packable[0])
            return
        while i < len(packable):
            group = packable[i : i + self.PREFILL_PACK]
            i += self.PREFILL_PACK
            self._prefill_pending.append(self._dispatch_prefill_group(group))
        # finish LAST step's groups now — their first-token fetch round trip
        # overlaps the device executing the groups just dispatched. This
        # step's groups stay pending until the next step (or flush).
        for ctx in prev:
            self._finish_prefill_group(ctx)

    def _flush_prefill_pending(self):
        """Finish every dispatched-but-unfinished prefill group (decode-slot
        insertion + first-token delivery). Called each engine step after the
        prefill section, and anywhere that needs fully-inserted streams."""
        pending, self._prefill_pending = self._prefill_pending, []
        for ctx in pending:
            self._finish_prefill_group(ctx)

    def _run_prefill_group(self, group):
        self._finish_prefill_group(self._dispatch_prefill_group(group))

    def _dispatch_prefill_group(self, group):
        # pad to the smallest compiled pack width: a pair runs the [2,T]
        # program at ~half the [4,T] cost (the matmuls are token-count
        # bound at T>=512) — matters under max_prefill_tokens_per_step,
        # which admits small groups while decodes run
        n_pad = 2 if len(group) <= 2 else self.PREFILL_PACK
        bucket = max(
            self._pick_bucket(s.prompt_len - s.reuse_len) for s in group
        )
        mb = self.max_blocks_per_seq
        toks = np.zeros((n_pad, bucket), np.int32)
        positions = np.zeros((n_pad, bucket), np.int32)
        bt = np.zeros((n_pad, mb), np.int32)
        kv_lens = np.zeros((n_pad,), np.int32)
        q_offsets = np.zeros((n_pad,), np.int32)
        aids = np.zeros((n_pad,), np.int32)
        block_rows = []
        for r, s in enumerate(group):
            self._apply_restores(s.alloc)
            prompt = s.prompt_token_ids
            rlen = s.reuse_len
            t_real = len(prompt) - rlen
            toks[r, :t_real] = prompt[rlen:]
            positions[r, :t_real] = np.arange(rlen, len(prompt))
            if self._cp_ring:
                positions[r, t_real:] = 1 << 30
            bt[r, : len(s.alloc.blocks)] = s.alloc.blocks
            kv_lens[r] = len(prompt)
            q_offsets[r] = rlen
            aids[r] = self._adapter_id_for(s)
            block_rows.append(jnp.asarray(bt[r]))
        fn = self._get_prefill_fn(bucket)
        if self._inputs_logger is not None:
            self._inputs_logger.log_prefill(
                self.step_count, toks, positions, bt, kv_lens, q_offsets,
                aids)
        from rtp_llm_tpu.utils.metrics import timed as _timed

        with _timed("engine.prefill_group_ms"):
            self.kv, logits = fn(
                self.weights, self.kv,
                jnp.asarray(toks), jnp.asarray(positions), jnp.asarray(bt),
                jnp.asarray(kv_lens), jnp.asarray(q_offsets),
                jnp.asarray(aids),
            )
        # batched first-token sampling with per-row params
        rows = [ds.params_row_from_config(s.config, s.needs_eos_ban())
                for s in group]
        pad = ds.params_row_from_config(group[0].config, True)
        rows += [pad] * (n_pad - len(group))
        params = SamplingParams(
            temperature=jnp.asarray([r["temperature"] for r in rows]),
            top_k=jnp.asarray([r["top_k"] for r in rows]),
            top_p=jnp.asarray([r["top_p"] for r in rows]),
            do_sample=jnp.asarray([r["do_sample"] for r in rows]),
            repetition_penalty=jnp.asarray([r["repetition_penalty"] for r in rows]),
            presence_penalty=jnp.asarray([r["presence_penalty"] for r in rows]),
            frequency_penalty=jnp.asarray([r["frequency_penalty"] for r in rows]),
            ban_eos=jnp.asarray([r["ban_eos"] for r in rows]),
        )
        pmask = np.zeros((n_pad, self.model.cfg.vocab_size), bool)
        for r, s in enumerate(group):
            pmask[r, np.asarray(s.prompt_token_ids, np.int64)] = True
        pmask_j = jnp.asarray(pmask)
        need_sampling = any(s.config.do_sample for s in group)
        ban_kw = {}
        gb = [self._bias_rows(s.config) for s in group]
        bias_rows = None
        if any(i is not None for i, _ in gb):
            bi = np.full((n_pad, ds.MAX_LOGIT_BIAS), -1, np.int32)
            bv = np.zeros((n_pad, ds.MAX_LOGIT_BIAS), np.float32)
            for r, (i_, v_) in enumerate(gb):
                if i_ is not None:
                    bi[r], bv[r] = i_, v_
            ban_kw["bias_ids"] = jnp.asarray(bi)
            ban_kw["bias_vals"] = jnp.asarray(bv)
            bias_rows = (bi, bv)
        if any(s.config.no_repeat_ngram_size for s in group):
            bans = np.full((n_pad, self.MAX_NGRAM_BANS), -1, np.int32)
            for r, s in enumerate(group):
                for j, t in enumerate(self._ngram_bans(
                        s.prompt_token_ids, s.config.no_repeat_ngram_size,
                        self.MAX_NGRAM_BANS)):
                    bans[r, j] = t
            ban_kw["ban_tokens"] = jnp.asarray(bans)
        tokens, logprobs, rng = self._first_sample_jit(
            logits, params, pmask_j, self.state.rng, need_sampling, **ban_kw,
        )
        self.state = self.state._replace(rng=rng)
        return dict(group=group, tokens=tokens, logprobs=logprobs, rows=rows,
                    n_pad=n_pad, pmask_j=pmask_j, bias_rows=bias_rows, bt=bt,
                    block_rows=block_rows, aids=aids)

    def _finish_prefill_group(self, ctx):
        group, rows = ctx["group"], ctx["rows"]
        bt, block_rows, aids = ctx["bt"], ctx["block_rows"], ctx["aids"]
        pmask_j, bias_rows = ctx["pmask_j"], ctx["bias_rows"]
        tokens_h = np.asarray(ctx["tokens"])
        logprobs_h = np.asarray(ctx["logprobs"])

        def _still_live(s):
            # a stream can be preempted (alloc freed, requeued) or aborted
            # between dispatch and deferred finish: skip insertion — a
            # preempted stream recomputes from scratch, an aborted one is
            # released by the step-top sweep
            return (s.alloc is not None and not s.is_finished()
                    and s.state != StreamState.WAITING)

        if self.draft is not None:
            for r, s in enumerate(group):
                if _still_live(s):
                    self.draft.prefill(s.prompt_token_ids, np.asarray(bt[r]))
        for r, s in enumerate(group):
            if not _still_live(s):
                continue
            token = int(tokens_h[r])
            ban = rows[r]["ban_eos"]
            # sliding recycling: drop prefill blocks below the window before
            # the table row lands in decode state
            if self.cache_mgr.shrink_sliding(s.alloc, s.prompt_len + 1):
                bt[r, : len(s.alloc.blocks)] = s.alloc.blocks
                block_rows[r] = jnp.asarray(bt[r])
            slot = self._free_slots.pop()
            s.slot = slot
            self.slots[slot] = s
            self._slot_nblocks[slot] = len(s.alloc.blocks)
            self._slot_ban[slot] = ban
            self._slot_forced[slot] = -1
            self.state = self._insert_jit(
                self.state, jnp.int32(slot), jnp.int32(token),
                jnp.int32(s.prompt_len), block_rows[r], pmask_j[r],
                rows[r]["temperature"], rows[r]["top_k"], rows[r]["top_p"],
                rows[r]["do_sample"], rows[r]["repetition_penalty"],
                rows[r]["presence_penalty"], rows[r]["frequency_penalty"],
                rows[r]["ban_eos"], np.int32(aids[r]), np.int32(0),
                jnp.asarray(bias_rows[0][r]) if bias_rows is not None else None,
                jnp.asarray(bias_rows[1][r]) if bias_rows is not None else None,
            )
            finished = s.append_token(
                token, self.eos_ids, float(logprobs_h[r]),
                max_seq_len=self.config.scheduler.max_seq_len,
            )
            if finished:
                self._release_stream(s)

    def _run_prefill(self, stream: GenerateStream):
        """Chunked prefill, then first-token sample + decode-slot insertion.
        Preemption recompute (stream.is_recompute) prefills the generated
        context too and re-enters decode with the pending last token — no new
        sample is drawn and no duplicate token is appended."""
        prompt = stream.context_token_ids
        p = len(prompt)
        blocks = stream.alloc.blocks
        block_row = np.zeros((self.max_blocks_per_seq,), np.int32)
        block_row[: len(blocks)] = blocks
        block_row_j = jnp.asarray(block_row)
        # hybrid models address per-slot linear state (and SWA-split models
        # their per-slot KV rings) during prefill: the decode slot is
        # assigned before the forward
        pre_slot = (self._free_slots.pop()
                    if (self.is_hybrid or self.swa_split) else None)
        logits = self._prefill_forward(stream, state_slot=pre_slot)

        if stream.is_recompute:
            self._reinsert_recomputed(stream, block_row, block_row_j, pre_slot)
            return

        # sample the first generated token from the last-chunk logits
        ban = stream.needs_eos_ban()
        prow = ds.params_row_from_config(stream.config, ban)
        params = SamplingParams(
            temperature=jnp.asarray([prow["temperature"]]),
            top_k=jnp.asarray([prow["top_k"]]),
            top_p=jnp.asarray([prow["top_p"]]),
            do_sample=jnp.asarray([prow["do_sample"]]),
            repetition_penalty=jnp.asarray([prow["repetition_penalty"]]),
            presence_penalty=jnp.asarray([prow["presence_penalty"]]),
            frequency_penalty=jnp.asarray([prow["frequency_penalty"]]),
            ban_eos=jnp.asarray([prow["ban_eos"]]),
        )
        pmask = np.zeros((1, self.model.cfg.vocab_size), bool)
        pmask[0, np.asarray(prompt, np.int64)] = True
        pmask_j = jnp.asarray(pmask)
        ban_kw = {}
        b_ids, b_vals = self._bias_rows(stream.config)
        if b_ids is not None:
            ban_kw["bias_ids"] = jnp.asarray(b_ids[None])
            ban_kw["bias_vals"] = jnp.asarray(b_vals[None])
        if stream.config.no_repeat_ngram_size:
            bans = np.full((1, self.MAX_NGRAM_BANS), -1, np.int32)
            for j, t in enumerate(self._ngram_bans(
                    prompt, stream.config.no_repeat_ngram_size,
                    self.MAX_NGRAM_BANS)):
                bans[0, j] = t
            ban_kw["ban_tokens"] = jnp.asarray(bans)
        if stream.tree_state is not None:
            cands = stream.tree_state.allowed()
            if cands:
                from rtp_llm_tpu.engine.logits_processors import MAX_ALLOW

                allows = np.full((1, MAX_ALLOW), -1, np.int32)
                allows[0, : len(cands)] = cands[:MAX_ALLOW]
                ban_kw["allow_tokens"] = jnp.asarray(allows)
        tokens, logprobs, rng = self._first_sample_jit(
            logits, params, pmask_j, self.state.rng,
            bool(stream.config.do_sample), **ban_kw,
        )
        self.state = self.state._replace(rng=rng)
        token = int(tokens[0])
        logprob = float(logprobs[0])

        # sliding recycling: drop prefill blocks below the window before the
        # table row lands in decode state
        if self.cache_mgr.shrink_sliding(stream.alloc, p + 1):
            block_row[: len(stream.alloc.blocks)] = stream.alloc.blocks
            block_row_j = jnp.asarray(block_row)
        # insert into a decode slot
        slot = pre_slot if pre_slot is not None else self._free_slots.pop()
        stream.slot = slot
        self.slots[slot] = stream
        self._slot_nblocks[slot] = len(blocks)
        self._slot_ban[slot] = ban
        self._slot_forced[slot] = -1
        self.state = self._insert_jit(
            self.state, jnp.int32(slot), jnp.int32(token), jnp.int32(p),
            block_row_j, pmask_j[0],
            prow["temperature"], prow["top_k"], prow["top_p"], prow["do_sample"],
            prow["repetition_penalty"], prow["presence_penalty"],
            prow["frequency_penalty"], prow["ban_eos"],
            np.int32(self._adapter_id_for(stream)),
            np.int32(stream.mm.delta if stream.mm is not None else 0),
            jnp.asarray(b_ids) if b_ids is not None else None,
            jnp.asarray(b_vals) if b_vals is not None else None,
        )

        if self.draft is not None:
            self.draft.prefill(prompt, block_row)
        if self.mtp is not None:
            self.mtp.set_slot_hidden(slot, self._mtp_seed_hidden)
        finished = stream.append_token(
            token, self.eos_ids, logprob,
            max_seq_len=self.config.scheduler.max_seq_len,
        )
        if finished:
            self._release_stream(stream)

    def _reinsert_recomputed(self, stream, block_row, block_row_j, pre_slot):
        """Decode-slot insertion for a preemption-recompute stream: the last
        generated token is pending (its KV row is written by the next decode
        step), no new token is sampled or appended, and the device penalty
        statistics are restored from the generation history."""
        pending = int(stream.output_token_ids[-1])
        ctx_len = stream.total_len - 1
        ban = stream.needs_eos_ban()
        prow = ds.params_row_from_config(stream.config, ban)
        pmask = np.zeros((self.model.cfg.vocab_size,), bool)
        pmask[np.asarray(stream.prompt_token_ids, np.int64)] = True
        b_ids, b_vals = self._bias_rows(stream.config)
        slot = pre_slot if pre_slot is not None else self._free_slots.pop()
        stream.slot = slot
        self.slots[slot] = stream
        self._slot_nblocks[slot] = len(stream.alloc.blocks)
        self._slot_ban[slot] = ban
        self._slot_forced[slot] = -1
        self.state = self._insert_jit(
            self.state, jnp.int32(slot), jnp.int32(pending),
            jnp.int32(ctx_len), block_row_j, jnp.asarray(pmask),
            prow["temperature"], prow["top_k"], prow["top_p"],
            prow["do_sample"], prow["repetition_penalty"],
            prow["presence_penalty"], prow["frequency_penalty"],
            prow["ban_eos"],
            np.int32(self._adapter_id_for(stream)),
            np.int32(stream.mm.delta if stream.mm is not None else 0),
            jnp.asarray(b_ids) if b_ids is not None else None,
            jnp.asarray(b_vals) if b_vals is not None else None,
        )
        counts = np.zeros((self.model.cfg.vocab_size,), np.int16)
        np.add.at(counts, np.asarray(stream.output_token_ids, np.int64), 1)
        self.state = self._set_counts_jit(
            self.state, jnp.int32(slot), jnp.asarray(counts)
        )
        if self.draft is not None:
            self.draft.prefill(stream.context_token_ids, block_row)
        if self.mtp is not None:
            self.mtp.set_slot_hidden(slot, self._mtp_seed_hidden)

    @staticmethod
    def _bias_rows(config):
        """Fixed-shape logit_bias rows from a GenerateConfig (None if unset)."""
        lb = config.logit_bias
        if not lb:
            return None, None
        ids = np.full((ds.MAX_LOGIT_BIAS,), -1, np.int32)
        vals = np.zeros((ds.MAX_LOGIT_BIAS,), np.float32)
        for j, (t, v) in enumerate(list(lb.items())[: ds.MAX_LOGIT_BIAS]):
            ids[j] = int(t)
            vals[j] = float(v)
        return ids, vals

    @staticmethod
    def _ngram_bans(token_ids, n: int, cap: int):
        """Tokens that would complete an already-seen n-gram (HF
        no_repeat_ngram_size semantics; reference: banRepeatNgram.cu)."""
        if n <= 0 or len(token_ids) < n:
            return []
        tail = tuple(token_ids[-(n - 1):]) if n > 1 else ()
        seen, out = set(), []
        for i in range(len(token_ids) - n + 1):
            if tuple(token_ids[i : i + n - 1]) == tail:
                t = token_ids[i + n - 1]
                if t not in seen:
                    seen.add(t)
                    out.append(t)
        return out[:cap]

    def _kv_bucket(self, active, extra: int) -> int:
        """Static block-table width covering this window's deepest row
        (+extra pending positions), rounded up to a bucket so the decode
        program retraces only per bucket."""
        need_tokens = max(s.total_len for s in active) + extra + 1
        need_blocks = -(-need_tokens // self.block_size)
        for b_ in self._kv_buckets:
            if need_blocks <= b_:
                return b_
        return self._kv_buckets[-1]

    # ---- dispatch / release ----

    def _release_stream(self, stream: GenerateStream):
        if stream.slot >= 0:
            slot = stream.slot
            self.state = self._clear_jit(self.state, jnp.int32(slot))
            self.slots[slot] = None
            self._free_slots.append(slot)
            stream.slot = -1
        self.scheduler.release(stream)

    # ---- the step ----

    def step(self) -> bool:
        """One engine iteration. Returns True if any work was done.

        Per-phase timings land in METRICS histograms (reference analog:
        RtpLLMExecutorMetrics per-phase µs, NormalExecutor.cc:226-250)."""
        with self.device_lock:
            return self._step_locked()

    def _timeline_tick(self, active):
        """Per-request profiling (reference: gen_timeline flag,
        NormalEngine.cc:477-487 + TorchProfiler.h:20-117): when a running
        stream asked for ``gen_timeline=N``, capture a jax.profiler trace of
        the next N engine steps into its timeline dir. One window at a time
        engine-wide; each stream triggers at most once."""
        t = self._timeline
        if t is not None:
            t["remaining"] -= 1
            if t["remaining"] <= 0:
                try:
                    jax.profiler.stop_trace()
                except RuntimeError:
                    pass
                logger.info("gen_timeline trace for request %s -> %s",
                            t["rid"], t["dir"])
                self._timeline = None
            return
        if not runtime_flags.get("allow_client_timeline"):
            # operator opt-in only: an unauthenticated client must not be
            # able to open engine-wide trace windows (ADVICE r4)
            return
        root = os.path.realpath(runtime_flags.get("timeline_root")
                                or "/tmp/rtp_llm_timeline")
        for s in active:
            g = int(getattr(s.config, "gen_timeline", 0) or 0)
            if g > 0 and not getattr(s, "_timeline_done", False):
                s._timeline_done = True
                # confine trace output to the server-configured root; a
                # client dir outside it is ignored
                d = s.config.timeline_dir
                if d and not (os.path.realpath(d) + os.sep
                              ).startswith(root + os.sep):
                    d = ""
                if not d:
                    rid = re.sub(r"[^A-Za-z0-9._-]", "_", str(s.request_id))
                    d = os.path.join(root, rid)
                try:
                    jax.profiler.start_trace(d)
                except RuntimeError:
                    return  # a global /start_profile window is already open
                self._timeline = {"remaining": g, "dir": d,
                                  "rid": s.request_id}
                return

    def _resolve_pending(self):
        """Read back the last dispatched decode step and run stream dispatch
        (stop checks, releases). Overlaps with the device executing the step
        dispatched after it."""
        if self._pending is None:
            return
        pending, self._pending = self._pending, None
        self._resolve_tuple(*pending)

    def _resolve_tuple(self, tokens_dev, logprobs_dev, streams):
        tokens_h = np.asarray(tokens_dev)
        logprobs_h = np.asarray(logprobs_dev)
        if tokens_h.ndim == 2:  # multi-step decode: [n_steps, B]
            self._resolve_multi(tokens_h, logprobs_h, streams)
            return
        from rtp_llm_tpu.utils.metrics import METRICS

        n = 0
        for s in streams:
            if s.is_finished() or s.slot < 0:
                continue  # released after dispatch: its extra token is garbage
            tok = int(tokens_h[s.slot])
            self.tokens_generated += 1
            n += 1
            finished = s.append_token(
                tok, self.eos_ids, float(logprobs_h[s.slot]),
                max_seq_len=self.config.scheduler.max_seq_len,
            )
            if finished:
                self._release_stream(s)
        METRICS.inc("engine.tokens_generated", n)

    def _resolve_multi(self, tokens_h, logprobs_h, streams):
        """Dispatch n_steps stacked token vectors: append per stream until a
        stop fires; the remaining (overshoot) tokens are discarded and their
        KV rows lie past the accepted length."""
        from rtp_llm_tpu.utils.metrics import METRICS

        n = 0
        k = tokens_h.shape[0]
        for s in streams:
            if s.is_finished() or s.slot < 0:
                continue
            for j in range(k):
                tok = int(tokens_h[j, s.slot])
                self.tokens_generated += 1
                n += 1
                finished = s.append_token(
                    tok, self.eos_ids, float(logprobs_h[j, s.slot]),
                    max_seq_len=self.config.scheduler.max_seq_len,
                )
                if finished:
                    self._release_stream(s)
                    break
        METRICS.inc("engine.tokens_generated", n)

    def _step_locked(self) -> bool:
        from rtp_llm_tpu.utils.metrics import METRICS, timed

        # release streams finished outside the engine loop (client abort,
        # frontend stop-string hit): without this their KV blocks and decode
        # slot leak, and the device keeps decoding garbage rows for them
        for s in self.scheduler.running:
            if s.is_finished() and (s.slot >= 0 or s.alloc is not None):
                self._release_stream(s)

        # prefill admission needs resolved slot/block state; idle steps flush
        if self.scheduler.waiting or not self.scheduler.running:
            self._resolve_pending()
        with timed("engine.schedule_ms"):
            sr = self.scheduler.schedule()
        beam_new = [s for s in sr.new_streams if s.config.max_num_beams > 1]
        normal_new = [s for s in sr.new_streams if s.config.max_num_beams <= 1]
        for s in beam_new:
            with timed("engine.prefill_ms"):
                self._run_beam_prefill(s)
        if normal_new:
            with timed("engine.prefill_ms"):
                self._run_prefills_packed(normal_new)
        elif self._prefill_pending:
            # no new prefills this step: drain last step's deferred groups
            with timed("engine.prefill_ms"):
                self._flush_prefill_pending()

        for group in list(self._beam_groups):
            with timed("engine.beam_step_ms"):
                self._beam_step(group)

        active = [s for s in self.scheduler.running if s.slot >= 0]
        self._timeline_tick(active)
        if not active:
            self._resolve_pending()
            self.step_count += 1
            return bool(sr.new_streams) or bool(self._beam_groups)

        # speculative mode: greedy-only batches with room for the draft window
        use_spec = (
            self.spec.enabled
            and not self.is_hybrid
            and not any(s.config.do_sample for s in active)
            and self.tree_config is None
            and not any(s.config.max_thinking_tokens for s in active)
            and not any(s.config.no_repeat_ngram_size for s in active)
            and all(
                s.total_len + self.spec.draft_tokens + 1
                <= self.config.scheduler.max_seq_len
                for s in active
            )
        )
        if use_spec:
            # spec proposals depend on the latest tokens: stay synchronous
            self._resolve_pending()
            active = [s for s in self.scheduler.running if s.slot >= 0]
            if not active:
                self.step_count += 1
                return True
        n_multi = self.config.scheduler.decode_steps
        use_multi = (
            n_multi > 1
            and not use_spec
            and self.tree_config is None
            and not any(s.config.max_thinking_tokens for s in active)
            and not any(s.config.no_repeat_ngram_size for s in active)
            and all(
                s.total_len + n_multi + 1 <= self.config.scheduler.max_seq_len
                for s in active
            )
        )
        pending = self.async_decode and self._pending is not None
        if use_spec:
            extra = self.spec.draft_tokens
        elif use_multi:
            # this window writes positions total_len-1 .. total_len+K-2; with
            # an unresolved window in flight the host total_len is K stale
            extra = n_multi - 1 + (n_multi if pending else 0)
        else:
            extra = 1 if pending else 0

        # grow block allocations for the token(s) this step writes
        for s in list(active):
            if s.alloc is None or s.slot < 0:
                continue  # evicted as a victim earlier in this loop
            preempted_self = not self.scheduler.grow_for_decode(s, extra)
            # running-memory eviction can preempt OTHER (newer) streams to
            # make room (reference: evaluateRunningMemory); clear every
            # victim's slot
            for v in self.scheduler.preempted_this_step:
                slot = v.slot
                if slot >= 0:
                    self.state = self._clear_jit(self.state, jnp.int32(slot))
                    self.slots[slot] = None
                    self._free_slots.append(slot)
                    v.slot = -1
                if v in active:
                    active.remove(v)
            self.scheduler.preempted_this_step.clear()
            if preempted_self:
                continue
            if len(s.alloc.blocks) != self._slot_nblocks[s.slot]:
                row = np.zeros((self.max_blocks_per_seq,), np.int32)
                row[: len(s.alloc.blocks)] = s.alloc.blocks
                self.state = self._set_blocks_jit(
                    self.state, jnp.int32(s.slot), jnp.asarray(row)
                )
                self._slot_nblocks[s.slot] = len(s.alloc.blocks)
            ban = s.needs_eos_ban()
            if ban != self._slot_ban[s.slot]:
                self._slot_ban[s.slot] = ban
                bans = np.zeros((len(self.slots),), bool)
                for st in self.slots:
                    if st is not None and st.slot >= 0:
                        bans[st.slot] = self._slot_ban[st.slot]
                self.state = self._set_ban_jit(self.state, jnp.asarray(bans))
            forced = s.forced_next_token()
            if forced != self._slot_forced[s.slot]:
                self._slot_forced[s.slot] = forced
                fv = np.full((len(self.slots),), -1, np.int32)
                for st in self.slots:
                    if st is not None and st.slot >= 0:
                        fv[st.slot] = self._slot_forced[st.slot]
                self.state = self._set_forced_jit(self.state, jnp.asarray(fv))
        if not active:
            self.step_count += 1
            return True

        if use_spec:
            self._spec_decode_step(active)
        else:
            need_sampling = any(s.config.do_sample for s in active)
            need_stats = any(
                c.repetition_penalty != 1.0 or c.presence_penalty != 0.0
                or c.frequency_penalty != 0.0 or c.return_logprobs
                or c.top_logprobs
                for c in (s.config for s in active)
            )
            use_ban = any(s.config.no_repeat_ngram_size for s in active)
            use_tree = self.tree_config is not None and any(
                s.tree_state is not None for s in active)
            if use_ban or use_tree:
                # bans / trie allow-lists depend on the full token history:
                # resolve any pending step first and stay synchronous
                self._resolve_pending()
                active = [s for s in self.scheduler.running if s.slot >= 0]
                if not active:
                    self.step_count += 1
                    return True
                kw = {}
                if use_ban:
                    bans = np.full((len(self.slots), self.MAX_NGRAM_BANS), -1,
                                   np.int32)
                    for s in active:
                        n = s.config.no_repeat_ngram_size
                        for j, t in enumerate(self._ngram_bans(
                                s.all_token_ids, n, self.MAX_NGRAM_BANS)):
                            bans[s.slot, j] = t
                    kw["ban_tokens"] = jnp.asarray(bans)
                if use_tree:
                    from rtp_llm_tpu.engine.logits_processors import MAX_ALLOW

                    allows = np.full((len(self.slots), MAX_ALLOW), -1,
                                     np.int32)
                    for s in active:
                        cands = (s.tree_state.allowed()
                                 if s.tree_state is not None else None)
                        if cands:
                            allows[s.slot, : len(cands)] = cands[:MAX_ALLOW]
                    kw["allow_tokens"] = jnp.asarray(allows)
                with timed("engine.decode_ms"):
                    self.kv, self.state, tokens, logprobs = self._decode_jit(
                        self.weights, self.kv, self.state, need_sampling,
                        kv_blocks=self._kv_bucket(active, 1),
                        need_stats=need_stats, **kw,
                    )
                self._resolve_tuple(tokens, logprobs, active)
                METRICS.set_gauge("engine.running_streams", len(active))
                self.step_count += 1
                return True
            if self._inputs_logger is not None:
                self._inputs_logger.log_decode(
                    self.step_count, self.state,
                    kv_blocks=self._kv_bucket(active, extra),
                    need_sampling=need_sampling, need_stats=need_stats)
            with timed("engine.decode_ms"):
                if use_multi:
                    self.kv, self.state, tokens, logprobs = (
                        self._decode_multi_jit(
                            self.weights, self.kv, self.state, need_sampling,
                            n_steps=n_multi,
                            kv_blocks=self._kv_bucket(active, extra),
                            need_stats=need_stats,
                        )
                    )
                else:
                    self.kv, self.state, tokens, logprobs = self._decode_jit(
                        self.weights, self.kv, self.state, need_sampling,
                        kv_blocks=self._kv_bucket(active, extra),
                        need_stats=need_stats,
                    )
            if self.async_decode:
                prev = self._pending
                self._pending = (tokens, logprobs, active)
                if prev is not None:
                    # resolve the PREVIOUS step while the device runs this one
                    self._resolve_tuple(*prev)
            else:
                self._resolve_tuple(tokens, logprobs, active)
        METRICS.set_gauge("engine.running_streams", len(active))
        METRICS.set_gauge("engine.waiting_streams", self.scheduler.pending)
        METRICS.set_gauge("engine.kv_free_blocks", self.cache_mgr.pool.free_blocks)
        pool = self.cache_mgr.pool
        METRICS.set_gauge(
            "engine.kv_utilization",
            1.0 - pool.free_blocks / max(pool.num_blocks, 1))
        METRICS.set_gauge(
            "engine.batch_occupancy",
            len(active) / max(self.config.scheduler.max_batch_size, 1))
        self.step_count += 1
        self._eplb_tick()
        return True

    def _spec_decode_step(self, active):
        """One speculative step over the whole decode batch: propose K drafts
        (prompt-lookup on host, or a draft-model rollout on device), then
        verify with the target model's T=K+1 program."""
        from rtp_llm_tpu.utils.metrics import METRICS, timed

        k = self.spec.draft_tokens
        if self.mtp is not None:
            with timed("engine.spec_propose_ms"):
                drafts_dev = self.mtp.propose(self.state, k)
        elif self.draft is not None:
            with timed("engine.spec_propose_ms"):
                drafts_dev = self.draft.propose(self.state, k)
        else:
            drafts = np.zeros((len(self.slots), k), np.int32)
            for s in active:
                # all_token_ids already includes the pending (not-yet-written)
                # last token, so drafts continue directly after it
                drafts[s.slot] = propose_prompt_lookup(
                    s.all_token_ids, k, self.spec.ngram_min, self.spec.ngram_max
                )
            drafts_dev = jnp.asarray(drafts)
        with timed("engine.spec_verify_ms"):
            if self.mtp is not None:
                (self.kv, self.state, g, n_new, hid) = self._verify_jit(
                    self.weights, self.kv, self.state, drafts_dev, True
                )
                self.mtp.update_hidden(hid, self.state.kv_lens > 0)
            else:
                self.kv, self.state, g, n_new = self._verify_jit(
                    self.weights, self.kv, self.state, drafts_dev, False
                )
            g_h = np.asarray(g)
            n_h = np.asarray(n_new)
        total = int(n_h.sum())
        METRICS.inc("engine.tokens_generated", total)
        METRICS.observe("engine.spec_accepted", float(total) / max(len(active), 1) - 1)

        for s in active:
            n = int(n_h[s.slot])
            self.tokens_generated += n
            for j in range(n):
                finished = s.append_token(
                    int(g_h[s.slot, j]), self.eos_ids, None,
                    max_seq_len=self.config.scheduler.max_seq_len,
                )
                if finished:
                    self._release_stream(s)
                    break

    # ---- PD disaggregation: KV export / preloaded enqueue ----
    # (reference: PrefillRpcServer/DecodeRpcServer + cache store transfer,
    # cpp/model_rpc/ + cpp/disaggregate/cache_store/ — the RDMA data plane
    # becomes a row gather/scatter + host transfer on TPU)

    def _gather_rows_impl(self, kv, slot_ids):
        return jax.tree.map(lambda a: a[..., slot_ids, :], kv)

    def prefill_only(self, prompt_token_ids, config=None):
        """Prefill-instance path: run prefill, sample the first token, export
        the prompt's KV rows, release local blocks. Returns
        (first_token, logprob, kv_rows ndarray [..., n_tokens, lanes])."""
        from rtp_llm_tpu.config.generate_config import GenerateConfig

        config = config or GenerateConfig()
        if self.is_hybrid:
            raise NotImplementedError("PD disaggregation does not support "
                                      "hybrid linear-attention models yet")
        with self.device_lock:
            alloc = self.cache_mgr.allocate(prompt_token_ids)
            if alloc is None:
                raise RuntimeError("KV pool exhausted for prefill")
            stream = GenerateStream(prompt_token_ids, config)
            stream.alloc = alloc
            stream.reuse_len = min(alloc.reuse_len, stream.prompt_len - 1)
            logits = self._prefill_forward(stream)
            ban = stream.needs_eos_ban()
            prow = ds.params_row_from_config(config, ban)
            params = SamplingParams(
                temperature=jnp.asarray([prow["temperature"]]),
                top_k=jnp.asarray([prow["top_k"]]),
                top_p=jnp.asarray([prow["top_p"]]),
                do_sample=jnp.asarray([prow["do_sample"]]),
                repetition_penalty=jnp.asarray([prow["repetition_penalty"]]),
                presence_penalty=jnp.asarray([prow["presence_penalty"]]),
                frequency_penalty=jnp.asarray([prow["frequency_penalty"]]),
                ban_eos=jnp.asarray([prow["ban_eos"]]),
            )
            pmask = np.zeros((1, self.model.cfg.vocab_size), bool)
            pmask[0, np.asarray(prompt_token_ids, np.int64)] = True
            tokens, logprobs, rng = self._first_sample_jit(
                logits, params, jnp.asarray(pmask), self.state.rng,
                bool(config.do_sample),
            )
            self.state = self.state._replace(rng=rng)

            p = len(prompt_token_ids)
            bs = self.block_size
            slot_ids = (
                np.asarray(alloc.blocks[: (p + bs - 1) // bs])[:, None] * bs
                + np.arange(bs)[None, :]
            ).reshape(-1)[:p]
            kv_rows = jax.tree.map(
                np.asarray,
                self._gather_rows_impl(self.kv, jnp.asarray(slot_ids, jnp.int32)),
            )
            self.cache_mgr.free(alloc, token_ids=prompt_token_ids)
            return int(tokens[0]), float(logprobs[0]), kv_rows

    def enqueue_preloaded(
        self, prompt_token_ids, first_token: int, kv_rows: np.ndarray,
        config=None, first_logprob: float = 0.0, stop_token_sequences=None,
    ) -> GenerateStream:
        """Decode-instance path: allocate blocks, import the transferred KV,
        and enter decode directly (no prefill) with ``first_token`` pending.
        Reference: DecodeRpcServer::RemoteGenerate + loadCacheFromPrefill."""
        from rtp_llm_tpu.config.generate_config import GenerateConfig

        config = config or GenerateConfig()
        with self.device_lock:
            self._resolve_pending()
            alloc = self.cache_mgr.allocate(prompt_token_ids)
            if alloc is None:
                raise RuntimeError("decode KV pool exhausted")
            stream = GenerateStream(
                prompt_token_ids, config,
                stop_token_sequences=stop_token_sequences,
            )
            stream.alloc = alloc
            alloc.restore = []  # transferred KV overwrites any host-tier hit
            stream.state = StreamState.RUNNING

            p = len(prompt_token_ids)
            bs = self.block_size
            # rows already on device for reused prefix blocks are identical
            # (same tokens); overwrite is harmless and keeps this simple
            slot_ids = (
                np.asarray(alloc.blocks[: (p + bs - 1) // bs])[:, None] * bs
                + np.arange(bs)[None, :]
            ).reshape(-1)[:p]
            sid = jnp.asarray(slot_ids, jnp.int32)

            def put(cache_leaf, rows_leaf):
                rows = jnp.asarray(rows_leaf[..., :p, :], cache_leaf.dtype)
                return cache_leaf.at[..., sid, :].set(rows, mode="drop")

            self.kv = jax.tree.map(put, self.kv, kv_rows)
            if self.draft is not None:
                row = np.zeros((self.max_blocks_per_seq,), np.int32)
                row[: len(alloc.blocks)] = alloc.blocks
                self.draft.prefill(prompt_token_ids, row)

            # decode-slot insertion (mirrors _run_prefill's tail)
            block_row = np.zeros((self.max_blocks_per_seq,), np.int32)
            block_row[: len(alloc.blocks)] = alloc.blocks
            ban = stream.needs_eos_ban()
            prow = ds.params_row_from_config(config, ban)
            pmask = np.zeros((self.model.cfg.vocab_size,), bool)
            pmask[np.asarray(prompt_token_ids, np.int64)] = True
            slot = self._free_slots.pop()
            stream.slot = slot
            self.slots[slot] = stream
            self._slot_nblocks[slot] = len(alloc.blocks)
            self._slot_ban[slot] = ban
            self.state = self._insert_jit(
                self.state, jnp.int32(slot), jnp.int32(first_token),
                jnp.int32(p), jnp.asarray(block_row), jnp.asarray(pmask),
                prow["temperature"], prow["top_k"], prow["top_p"],
                prow["do_sample"], prow["repetition_penalty"],
                prow["presence_penalty"], prow["frequency_penalty"],
                prow["ban_eos"],
            )
            self.scheduler.running.append(stream)
            stream.append_token(
                first_token, self.eos_ids, first_logprob,
                max_seq_len=self.config.scheduler.max_seq_len,
            )
            if stream.is_finished():
                self._release_stream(stream)
            return stream

    # ---- warmup ----

    def _decode_warmup_combos(self, stats_tail: bool):
        """(need_sampling, need_stats) pairs for the eager pass vs the lazy
        background tail. Serving's common pairs are need_stats=False (default
        sampling configs carry no penalties/logprobs); the stats variants are
        compiled in the background while serving starts (VERDICT r4 #2)."""
        if stats_tail:
            return [(ns, True) for ns in (False, True)]
        return [(ns, False) for ns in (False, True)]

    def _warmup_thunks(self, stats_tail: bool):
        mb = self.max_blocks_per_seq
        thunks = []
        if not stats_tail:
            for bucket in self.config.scheduler.prefill_buckets:
                fn = self._get_prefill_fn(bucket)
                for rows in (1, 2, self.PREFILL_PACK):
                    # must match serving's call signature exactly (incl.
                    # adapter_ids) — see the eager warmup pass
                    thunks.append((fn, (
                        self.weights, self.kv,
                        jnp.zeros((rows, bucket), jnp.int32),
                        jnp.zeros((rows, bucket), jnp.int32),
                        jnp.zeros((rows, mb), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                    ), {}))
        n_multi = self.config.scheduler.decode_steps
        for need_sampling, need_stats in self._decode_warmup_combos(stats_tail):
            for kvb in self._kv_buckets:
                thunks.append((self._decode_jit,
                               (self.weights, self.kv, self.state,
                                need_sampling),
                               dict(kv_blocks=kvb,
                                    need_stats=need_stats)))
                if n_multi > 1:
                    thunks.append((self._decode_multi_jit,
                                   (self.weights, self.kv, self.state,
                                    need_sampling),
                                   dict(n_steps=n_multi, kv_blocks=kvb,
                                        need_stats=need_stats)))
        return thunks

    def _warmup_parallel_compile(self, thunks=None, tag="warmup"):
        """Lower + AOT-compile the serving programs in a thread pool. The
        compiled executables are discarded — the value is filling the
        persistent compile cache in parallel so the sequential warmup pass
        hits it. Failures are non-fatal (that program just compiles
        sequentially)."""
        from concurrent.futures import ThreadPoolExecutor

        if thunks is None:
            thunks = self._warmup_thunks(stats_tail=False)

        def compile_one(job):
            fn, args, kw = job
            try:
                fn.lower(*args, **kw).compile()
            except Exception as e:  # noqa: BLE001 — fall back to sequential
                logger.debug("parallel warmup compile skipped: %s", e)

        workers = int(runtime_flags.get("parallel_warmup_workers"))
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=max(2, workers)) as ex:
            list(ex.map(compile_one, thunks))
        logger.info("parallel %s: %d programs compiled in %.1fs",
                    tag, len(thunks), time.time() - t0)

    def _start_background_warmup(self):
        """Compile the need_stats=True decode variants off the critical path:
        AOT lower+compile fills the persistent cache WITHOUT touching engine
        state or the device lock, so serving proceeds on the common variants
        while the stats tail (penalties / logprobs requests) warms behind it.
        A request needing stats before this finishes pays one compile —
        bounded and rare. Reference contrast: NormalEngine::warmUp warms
        exactly one shape and eats every other compile at serve time."""
        import threading

        thunks = self._warmup_thunks(stats_tail=True)
        if not thunks:
            return
        self._warmup_bg_thread = threading.Thread(
            target=self._warmup_parallel_compile,
            kwargs=dict(thunks=thunks, tag="background warmup (stats tail)"),
            daemon=True, name="rtp-warmup-bg",
        )
        self._warmup_bg_thread.start()

    def wait_warmup_complete(self, timeout: Optional[float] = None):
        """Join the background stats-tail compile thread. Benchmarks call
        this before timing: the bg thread's tracing/lowering competes for
        the single host core (and the remote compile service) and was
        measured perturbing early timed windows by ~1.45x (round-5)."""
        t = self._warmup_bg_thread
        if t is not None and t.is_alive():
            t.join(timeout)

    def warmup(self):
        """Compile every device program ahead of serving (reference:
        NormalEngine::warmUp, NormalEngine.cc:208): all prefill buckets, the
        decode program (both sampling variants), slot ops, and the verify
        program. Dummy rows target the null block with kv_len=0 so no real
        state is touched."""
        t0 = time.time()
        b = self.config.scheduler.max_batch_size
        mb = self.max_blocks_per_seq
        if runtime_flags.get("parallel_warmup"):
            # phase 1: AOT-compile every program CONCURRENTLY (the XLA /
            # remote-compile layer releases the GIL and compiles requests
            # in parallel), populating the persistent compile cache; the
            # sequential execution pass below then deserializes instead of
            # compiling. Measured on v5e (cold cache, 7B bench geometry):
            # 452 s -> 206 s. Tracing happens twice — a warm cache skips
            # the win but only pays the (cheap, scan-sized) retrace.
            # RTP_PARALLEL_WARMUP=0 disables; =N sets the pool width.
            self._warmup_parallel_compile()
        with self.device_lock:
            for bucket in self.config.scheduler.prefill_buckets:
                fn = self._get_prefill_fn(bucket)
                for rows in (1, 2, self.PREFILL_PACK):
                    # rows=PACK: the packed continuous-batching prefill
                    # program (serving admits several streams per cycle).
                    # The adapter_ids arg MUST be passed exactly as serving
                    # does (an array, not the None default): an arg-signature
                    # mismatch makes the first serving prefill RECOMPILE the
                    # program it thought was warm (~10 s mid-serving stall,
                    # found by the round-5 packed-prefill bench).
                    self.kv, _ = fn(
                        self.weights, self.kv,
                        jnp.zeros((rows, bucket), jnp.int32),
                        jnp.zeros((rows, bucket), jnp.int32),
                        jnp.zeros((rows, mb), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                        jnp.zeros((rows,), jnp.int32),
                    )
            # EVERY kv bucket must be compiled before serving: a miss at
            # serving time is a multi-second (remote) compile holding the
            # device lock — measured as a ~90 s TTFT cliff under load.
            # Only the COMMON (need_stats=False) variants compile eagerly;
            # the stats tail compiles in a background thread below.
            n_multi = self.config.scheduler.decode_steps
            for need_sampling, need_stats in self._decode_warmup_combos(False):
                for kvb in self._kv_buckets:
                    self.kv, self.state, _, _ = self._decode_jit(
                        self.weights, self.kv, self.state, need_sampling,
                        kv_blocks=kvb, need_stats=need_stats,
                    )
                    if n_multi > 1:
                        self.kv, self.state, _, _ = self._decode_multi_jit(
                            self.weights, self.kv, self.state,
                            need_sampling, n_steps=n_multi, kv_blocks=kvb,
                            need_stats=need_stats,
                        )
            if self.spec.enabled:
                self.kv, self.state, _, _ = self._verify_jit(
                    self.weights, self.kv, self.state,
                    jnp.zeros((b, self.spec.draft_tokens), jnp.int32), False,
                )
                if self.draft is not None:
                    for bucket in self.config.scheduler.prefill_buckets:
                        self.draft.kv = self.draft._prefill_jit(
                            self.draft.weights, self.draft.kv,
                            jnp.zeros((1, bucket), jnp.int32),
                            jnp.zeros((1, bucket), jnp.int32),
                            jnp.zeros((1, mb), jnp.int32),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), jnp.int32),
                        )
                    self.draft.propose(self.state, self.spec.draft_tokens)
            # slot ops + first-token sampler
            v = self.model.cfg.vocab_size
            for rows in (1, 2, self.PREFILL_PACK):
                params_r = SamplingParams.zeros(rows)
                for need in (False, True):
                    self._first_sample_jit(
                        jnp.zeros((rows, v), jnp.float32), params_r,
                        jnp.zeros((rows, v), bool), self.state.rng, need,
                    )
            # serving always passes adapter_id/pos_delta (and None biases):
            # warm the exact signature so the first insert doesn't retrace
            self.state = self._insert_jit(
                self.state, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros((mb,), jnp.int32), jnp.zeros((v,), bool),
                np.float32(1.0), np.int32(0), np.float32(1.0), False,
                np.float32(1.0), np.float32(0.0), np.float32(0.0), False,
                np.int32(0), np.int32(0), None, None,
            )
            self.state = self._clear_jit(self.state, jnp.int32(0))
            self.state = self._set_blocks_jit(
                self.state, jnp.int32(0), jnp.zeros((mb,), jnp.int32)
            )
            self.state = self._set_ban_jit(self.state, jnp.zeros((b,), bool))
            # EXECUTION RAMP, deliberately LAST (round-5 hardware findings):
            # (1) the first ~dozen executions of a program run ~2.3x slower
            # than steady state on this runtime (461 -> 188 ms/group for the
            # packed [4,512] prefill across ~25 executions), and (2) the
            # first execution of a program AFTER many other programs ran
            # pays a ~500 ms residency reload regardless of prior execution
            # count or operand provenance (measured with input bisects).
            # Re-executing the hot serving prefill programs at the very end
            # of warmup retires the count-ramp AND leaves them resident, so
            # neither cost lands on the first requests' TTFT.
            ramp = int(os.environ.get("RTP_WARMUP_RAMP", "8"))
            if ramp > 0 and self.config.scheduler.prefill_buckets:
                bucket = self.config.scheduler.prefill_buckets[-1]
                fn = self._get_prefill_fn(bucket)
                _ramp_tok = None
                for rows, n_ramp in ((2, max(2, ramp // 2)),
                                     (self.PREFILL_PACK, ramp), (1, ramp)):
                    for _ in range(n_ramp):
                        rargs = (
                            jnp.asarray(np.zeros((rows, bucket), np.int32)),
                            jnp.asarray(np.zeros((rows, bucket), np.int32)),
                            jnp.asarray(np.zeros((rows, mb), np.int32)),
                            jnp.asarray(np.zeros((rows,), np.int32)),
                            jnp.asarray(np.zeros((rows,), np.int32)),
                            jnp.asarray(np.zeros((rows,), np.int32)),
                        )
                        self.kv, _ramp_logits = fn(self.weights, self.kv,
                                                   *rargs)
                        # the first-token sampler needs the SAME ramp (its
                        # first real execution measured 454 ms vs 73 steady
                        # despite the one warmup call above); interleave it
                        # exactly as serving does
                        _ramp_tok, _, rng_ = self._first_sample_jit(
                            _ramp_logits, SamplingParams.zeros(rows),
                            jnp.asarray(np.zeros((rows, v), bool)),
                            self.state.rng, False)
                        self.state = self.state._replace(rng=rng_)
                # concrete scalar fetch: the ramp executions must COMPLETE
                # (block_until_ready does not sync on the relay)
                int(_ramp_tok[0])
            jax.block_until_ready(self.state)
        self._start_background_warmup()
        logger.info("engine warmup done in %.1fs", time.time() - t0)

    # ---- public API ----

    def enqueue(
        self,
        prompt_token_ids: List[int],
        config: Optional[GenerateConfig] = None,
        stop_token_sequences: Optional[List[List[int]]] = None,
        mm=None,
    ) -> GenerateStream:
        """Reference: EngineBase::enqueue (engine_base/EngineBase.h:36).
        mm: optional MMInputs (multimodal/processor.py) with vision
        embeddings + MRoPE positions."""
        if self._cp_ring and len(prompt_token_ids) > \
                self.config.scheduler.prefill_buckets[-1]:
            raise ValueError(
                "cp_ring prefill requires the prompt to fit the largest "
                f"prefill bucket ({self.config.scheduler.prefill_buckets[-1]})")
        if self.is_hybrid and config is not None and config.max_num_beams > 1:
            raise ValueError("beam search is not supported for hybrid "
                             "linear-attention models")
        if self.swa_split and config is not None and config.max_num_beams > 1:
            raise ValueError("beam search is not supported for mixed "
                             "global/SWA pool models (per-slot SWA rings "
                             "are not fork-shareable)")
        if mm is not None and config is not None and config.max_num_beams > 1:
            raise ValueError("beam search with multimodal inputs is not "
                             "supported")
        if mm is not None and self.swa_split:
            raise ValueError("multimodal prefill is not wired for mixed "
                             "global/SWA pool models yet")
        stream = GenerateStream(
            prompt_token_ids, config, stop_token_sequences=stop_token_sequences
        )
        stream.mm = mm
        if self.tree_config is not None:
            from rtp_llm_tpu.engine.logits_processors import TreeDecodeState

            st = TreeDecodeState(self.tree_config)
            for t in prompt_token_ids:
                st.update(int(t))
            stream.tree_state = st
        self.scheduler.enqueue(stream)
        return stream

    def has_work(self) -> bool:
        return (self.scheduler.has_work() or self._pending is not None
                or bool(self._prefill_pending))

    def generate(
        self,
        prompt_token_ids: List[int],
        config: Optional[GenerateConfig] = None,
        max_steps: int = 100_000,
        mm=None,
    ) -> GenerateStream:
        """Synchronous convenience: enqueue + step to completion."""
        stream = self.enqueue(prompt_token_ids, config, mm=mm)
        steps = 0
        while not stream.is_finished() and steps < max_steps:
            self.step()
            steps += 1
        return stream
