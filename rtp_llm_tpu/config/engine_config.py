"""Engine / runtime configuration groups.

TPU-native analog of the reference's grouped config system
(rtp_llm/cpp/config/ConfigModules.h + rtp_llm/server/server_args/*.py,
rtp_llm/config/py_config_modules.py): each domain is a dataclass, every field is
settable from an env var (``RTP_<GROUP>_<FIELD>``) or a CLI flag
(``--<group>-<field>``); see server_args.py for the dual parser.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class QuantMethod(str, enum.Enum):
    """Mirror of the reference QuantMethod enum (cpp/model_utils/QuantInfo.h:6-19),
    restricted to schemes meaningful on TPU."""

    NONE = "none"
    WEIGHT_ONLY_INT8 = "int8"  # per-channel weight-only, applied at load
    WEIGHT_ONLY_INT4 = "int4"  # groupwise weight-only (GPTQ/AWQ layouts)
    FP8 = "fp8"  # fp8 (e4m3) weights, per-tensor or per-block scales
    FP4 = "fp4"  # e2m1 groupwise weights, packed 2/byte (ModelOptFP4 /
    #              QuarkMXFP4 analogs, QuantInfo.h:6-19)
    W8A8 = "w8a8"  # int8 weights x per-token int8 activations (SmoothQuant/
    #                PerTensorQuant analog via dynamic per-token scales —
    #                integer MXU contraction doubles compute-bound prefill)
    W4A8 = "w4a8"  # int4 weights x per-token int8 activations (integer MXU
    #                contraction; W4A8INT4PTPC analog)


@dataclasses.dataclass
class QuantConfig:
    method: QuantMethod = QuantMethod.NONE
    group_size: int = 128  # for int4 groupwise
    # per-channel int8 for the LM head (normally excluded): the 152k-vocab
    # head is ~11% of a 7B decode step's HBM bytes; ppl cost is measured in
    # docs/PPL_TABLE.md ("int8 + int8 lm_head" row). llama-family models
    # consume the scale; other families ignore the flag.
    quantize_lm_head: bool = False
    fp8_block_size: int = 128  # fp8 scales: >0 per-block, 0 per-tensor, -1 per-out-channel (fast decode layout)
    kv_cache_dtype: str = "bfloat16"  # bfloat16 | int8 | fp8

    def __post_init__(self):
        if isinstance(self.method, str):
            self.method = QuantMethod(self.method)

    @property
    def is_quantized(self) -> bool:
        return self.method != QuantMethod.NONE


@dataclasses.dataclass
class ParallelConfig:
    """Mesh layout. Analog of reference ParallelismConfig (ConfigModules.h:56-95)
    but expressed as jax mesh axis sizes instead of rank bookkeeping."""

    tp_size: int = 1
    dp_size: int = 1
    ep_size: int = 1  # expert parallel; folded into tp axis of the mesh for MoE
    pp_size: int = 1  # reserved (reference defines but does not implement PP)
    cp_size: int = 1  # prefill context parallel (long context)
    # zig-zag ring CP (reference: ZigzagProcessor.h:18 + CP ring rotation):
    # prefill attention runs ring-wise over the cp axis with the zig-zag
    # column layout instead of GSPMD token sharding. Prompts must fit the
    # largest prefill bucket; prefix-cache reuse is disabled.
    cp_ring: bool = False

    # MoE dispatch (reference: fused-MoE strategies + DeepEP wrapper config)
    moe_capacity_factor: float = 2.0  # expert capacity = N*K/E * this
    # layer micro-batching (reference: PyWrappedModel.cc:347-433 dual-batch
    # overlap of MoE comm with compute). TPU-native form: the MoE token batch
    # splits into N independent halves inside one program so XLA's
    # latency-hiding scheduler can overlap one half's dispatch/combine
    # collectives with the other half's expert GEMMs. 1 = off.
    moe_micro_batches: int = 1
    # AFD — attention-FFN disaggregation (reference: ConfigModules.h:43-55,
    # model_desc/disaggregate_qwen3.py + docs/backend/af_disaggregation.md).
    # TPU-native form: one SPMD program where attention runs dp-batch-
    # parallel x tp while EXPERT weights shard over the combined (dp, tp)
    # device set — the whole slice acts as the FFN role and XLA inserts the
    # boundary all-to-alls that the reference issues explicitly between
    # attention and FFN instances.
    afd_mode: bool = False
    # EPLB closed loop (reference: ExpertBalancer, eplb/ep_balancer.py:53):
    # collect per-expert gating counts each step and rebalance the most
    # unbalanced MoE layer every eplb_interval steps; 0 = off
    eplb_interval: int = 0
    # redundant physical expert slots per MoE layer (reference:
    # rebalance_experts num_replicas - num_logical, eplb/eplb.py:193). R > 0
    # enables the replicated tier: hot experts get extra copies and
    # rebalances swap weight rows without retracing. Must keep
    # (E + R) % tp_size == 0.
    eplb_redundant: int = 0
    # only rebalance when the measured imbalance (max/mean shard load)
    # exceeds this; 0 = rebalance every interval (reference:
    # ExpertBalancer imbalance trigger)
    eplb_threshold: float = 0.0

    # multi-host
    num_hosts: int = 1
    host_index: int = 0
    coordinator_address: Optional[str] = None

    @property
    def world_size(self) -> int:
        return self.tp_size * self.dp_size * self.cp_size


@dataclasses.dataclass
class CacheConfig:
    """Paged KV cache sizing. Analog of reference KVCacheConfig
    (ConfigModules.h:146-208) + CacheConfigCreator."""

    block_size: int = 64  # tokens per KV block: the fullrow decode kernel
    # is DMA-issue-rate bound, and 64-token blocks halve the issues/row
    # (measured 3.60 -> 2.89 ms/step attention at b=64, PERF_NOTES)
    num_blocks: int = 0  # 0 = auto-size from free HBM after weights
    reserve_runtime_mem_mb: int = 1024  # HBM headroom for activations
    memory_utilization: float = 0.9
    enable_prefix_cache: bool = True
    # test hook (reference kv_cache_config.test_block_num)
    test_num_blocks: int = 0
    # host-RAM KV tier for evicted prefix blocks, 0 = off (reference:
    # memory-tier cache connector, cache/connector/memory/)
    host_cache_mb: int = 0
    # disk tier under the host tier (reference: disk connector + 3FS
    # backend, docs/backend/3fs.md): host evictions demote to files here;
    # survives restarts. Requires host_cache_mb > 0.
    disk_cache_path: str = ""
    disk_cache_mb: int = 0
    # shared remote cache-store URL (reference: remote connector /
    # cache-store service); "" = off. Chains after the disk tier (or after
    # host RAM if no disk tier). Requires host_cache_mb > 0.
    remote_cache_url: str = ""
    # sliding-window block recycling for uniform-SWA models (reference:
    # hybrid SWA cache pools): bounds per-stream KV at ~window tokens by
    # reusing the stream's own out-of-window blocks. Disables prefix reuse
    # (recycled contents diverge from their logical positions). Also engages
    # automatically when enable_prefix_cache is False.
    swa_recycle: bool = False


@dataclasses.dataclass
class SchedulerConfig:
    """FIFO continuous-batching scheduler knobs. Analog of FIFOSchedulerConfig
    (ConfigModules.h:358) + RuntimeConfig (:374)."""

    max_batch_size: int = 64  # decode slots (fixed shape => single decode program)
    max_prefill_tokens: int = 8192  # largest prefill bucket
    prefill_buckets: tuple = (128, 512, 2048, 8192)
    max_seq_len: int = 8192
    max_queue_size: int = 1024
    # admission: require this fraction of peak blocks free before scheduling
    watermark_frac: float = 0.01
    # chunked prefill chunk size (0 = disabled, whole-prompt prefill)
    prefill_chunk_size: int = 0
    # PD-fusion ratio control (reference: PDFusionRatioScheduler): in the
    # fused role, admit at most max_prefills_per_step new streams per engine
    # step and run >= decode_steps_per_prefill decode-only steps between
    # prefill rounds. 0 = unlimited / no spacing.
    max_prefills_per_step: int = 0
    decode_steps_per_prefill: int = 0
    # prefill/decode fusion: while decode streams are RUNNING, cap the
    # prompt tokens admitted per step so one prefill dispatch cannot hold
    # the device long enough to starve decode TPOT (a packed 4x512 int8-7B
    # prefill occupies the chip ~200 ms vs a 12.5 ms decode step). Applies
    # only under mixed load — an idle engine admits freely, so batch
    # benchmarks and pure-prefill roles are unaffected. At least one
    # stream is always admitted. 0 = unlimited. (reference:
    # RuntimeConfig max_context_batch_size / PDFusionRatioScheduler.)
    # Default 2048 = one full PREFILL_PACK group per dispatch: the packed
    # [4,512] program is the execution-ramped fast path (~190 ms steady),
    # and admission throughput roughly doubles vs 1024 for ~13% TPOT p50
    # cost (round-5 serve_bench A/B).
    max_prefill_tokens_per_step: int = 2048
    # SLA admission guard (reference: FlexLB QueueManager shedding):
    # reject (HTTP 429) instead of queueing when the projected queue wait
    # exceeds this bound — at saturation an unbounded FIFO just converts
    # overload into multi-second TTFT for everyone. 0 = off.
    ttft_slo_ms: int = 0
    # ---
    # multi-step decode: run N decode iterations inside ONE jitted dispatch
    # (lax.scan over the fused decode+sample body) and read back N token
    # vectors at once. Amortizes host->device dispatch N-fold — the TPU
    # analog of replaying a captured CUDA graph N times between syncs.
    # Stop conditions are evaluated every N tokens (overshoot tokens are
    # discarded; their KV rows lie past the accepted length and are never
    # hashed into the prefix cache).
    decode_steps: int = 1
    # defer per-layer decode KV writes into one batched scatter after the
    # forward (attention folds the current token from registers). Measured
    # perf-neutral on v5e (the XLA per-layer scatters overlap well); kept as
    # an option for kernels/configs where scatter count dominates.
    defer_kv_writes: bool = False
    # pipeline decode steps: dispatch step N+1 before reading back step N's
    # tokens (reference analog: the C++ engine's async execution; hides host
    # scheduling + readback latency under device compute). Streams observe
    # results one step later; stop conditions are evaluated on resolve.
    async_decode: bool = True


@dataclasses.dataclass
class SpeculativeConfig:
    """Speculative decoding (analog of reference SpeculativeExecutionConfig,
    ConfigModules.h:291 + docs/backend/speculative_decoding.md).

    method: none | prompt_lookup (deterministic n-gram proposer; the
    reference's 'deterministic' sp_type) | vanilla (a small draft model
    proposes K greedy tokens, engine/draft.py) | mtp (deepseek MTP module,
    engine/mtp.py) | eagle (feature-level single-layer head, engine/eagle.py).
    All share the engine's T=K+1 verify program."""

    method: str = "none"  # none | prompt_lookup | vanilla | mtp | eagle
    draft_tokens: int = 4  # K: proposals verified per step
    ngram_min: int = 2
    ngram_max: int = 4
    sp_model_path: str = ""  # draft / EAGLE checkpoint dir

    @property
    def enabled(self) -> bool:
        return self.method != "none" and self.draft_tokens > 0


def _rf(name):
    from rtp_llm_tpu.config import runtime_flags

    return lambda: runtime_flags.env_default(name)


@dataclasses.dataclass
class KernelConfig:
    """Kernel / runtime tuning knobs (reference analog: HWKernelConfig +
    FMHAConfig + MiscellaneousConfig groups, server_args/hw_kernel_group.py).

    Defaults initialize from the legacy env vars (RTP_ATTN_BACKEND etc.) via
    config.runtime_flags, so both the grouped surface
    (``--kernel-attn-backend`` / ``RTP_KERNEL_ATTN_BACKEND``) and the legacy
    bare env vars work; the grouped surface wins when set."""

    # attention backend: auto | pallas | ref (XLA reference path)
    attn_backend: str = dataclasses.field(default_factory=_rf("attn_backend"))
    enable_pallas_prefill: bool = dataclasses.field(
        default_factory=_rf("enable_pallas_prefill"))
    # fullrow decode kernel tuning (ops/attention/pallas_decode.py)
    disable_fullrow: bool = dataclasses.field(
        default_factory=_rf("disable_fullrow"))
    fullrow_vmem_mb: int = dataclasses.field(
        default_factory=_rf("fullrow_vmem_mb"))
    fullrow_nb: int = dataclasses.field(default_factory=_rf("fullrow_nb"))
    # int4 weight layout: packed 2/byte (Pallas dequant GEMM) vs unpacked s8
    int4_packed: bool = dataclasses.field(default_factory=_rf("int4_packed"))
    # skewed VPU-decode / MXU-dot pipeline in the dequant-GEMM kernel
    int4_pipeline: bool = dataclasses.field(
        default_factory=_rf("int4_pipeline"))
    # disable the scan-over-layers compile-time optimization
    no_scan_layers: bool = dataclasses.field(
        default_factory=_rf("no_scan_layers"))
    # disable load-time QKV / gate-up fusion
    disable_weight_fusion: bool = dataclasses.field(
        default_factory=_rf("disable_weight_fusion"))
    # warmup compile parallelism (engine.warmup)
    parallel_warmup: bool = dataclasses.field(
        default_factory=_rf("parallel_warmup"))
    parallel_warmup_workers: int = dataclasses.field(
        default_factory=_rf("parallel_warmup_workers"))
    # HBM size override for KV auto-sizing (0 = per-device-kind table)
    hbm_gb: float = dataclasses.field(default_factory=_rf("hbm_gb"))
    # persistent XLA compile cache dir ("" = platform default)
    compile_cache_dir: str = dataclasses.field(
        default_factory=_rf("compile_cache_dir"))
    # converted-weights cache dir ("" = off)
    weights_cache_dir: str = dataclasses.field(
        default_factory=_rf("weights_cache_dir"))
    # multimodal embedding cache budget
    mm_cache_mb: int = dataclasses.field(default_factory=_rf("mm_cache_mb"))
    # operator opt-in for client-requested gen_timeline traces; trace output
    # is always confined under timeline_root (client timeline_dir outside the
    # root is ignored)
    allow_client_timeline: bool = dataclasses.field(
        default_factory=_rf("allow_client_timeline"))
    timeline_root: str = dataclasses.field(default_factory=_rf("timeline_root"))


@dataclasses.dataclass
class ServerConfig:
    host: str = "0.0.0.0"
    port: int = 8088
    grpc_port: int = 0  # 0 = gRPC plane off (reference: model_rpc service)
    model_path: str = ""
    model_type: Optional[str] = None
    tokenizer_path: Optional[str] = None
    served_model_name: Optional[str] = None
    log_level: str = "INFO"
    access_log: bool = True
    # static LoRA adapters merged at load: "name=path[,name2=path2...]"
    # (reference: static lora merge, rtp_llm/lora/; dynamic adapters are
    # registered at runtime through the LoraManager)
    lora_adapters: str = ""
    # PD disaggregation role (reference RoleType, RoleTypes.h:7-11):
    # fusion (default) | prefill | decode. A prefill instance forwards KV to
    # its decode peer and relays the token stream.
    role: str = "fusion"
    decode_peer: str = ""  # host:port of the decode instance (prefill role)
    # decode-entrance inversion (reference: DECODE_ENTRANCE=1,
    # docs/backend/pd_entrance_transpose.md): the DECODE instance is the
    # request entry — it asks prefill_peer to prefill, pulls the KV
    # asynchronously and streams tokens straight to the client (no prefill
    # relay hop). Legacy env DECODE_ENTRANCE honored as the default.
    decode_entrance: bool = dataclasses.field(
        default_factory=lambda: __import__("os").environ.get(
            "DECODE_ENTRANCE", "") not in ("", "0"))
    prefill_peer: str = ""  # host:port of the prefill instance (decode role)
    # host:port of the decode instance's gRPC plane; when set, PD KV ships
    # as binary protobuf over HTTP/2 instead of the NDJSON HTTP fallback
    decode_grpc_peer: str = ""
    # remote VIT worker endpoint (reference: VIT role, vit_start_server.py);
    # empty = encode in-process on this chip
    vit_endpoint: str = ""
    # VIT pool size for `vit-serve` (reference: vit_proxy_start_server.py):
    # >1 spawns N worker processes on port+1..port+N fronted by a
    # least-inflight proxy on `port`
    vit_workers: int = 1
    # multi-worker launch (server/launcher.py): number of backend workers
    # and the router port fronting them (0 = no router). Legacy env:
    # RTP_LAUNCH_WORKERS / RTP_LAUNCH_ROUTER_PORT.
    launch_workers: int = dataclasses.field(
        default_factory=lambda: int(
            __import__("os").environ.get("RTP_LAUNCH_WORKERS", "1")))
    launch_router_port: int = dataclasses.field(
        default_factory=lambda: int(
            __import__("os").environ.get("RTP_LAUNCH_ROUTER_PORT", "0")))


@dataclasses.dataclass
class EngineConfig:
    """Aggregated engine view (analog of reference EngineConfig.create,
    config/engine_config.py:41,186)."""

    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    quant: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    speculative: SpeculativeConfig = dataclasses.field(default_factory=SpeculativeConfig)
    server: ServerConfig = dataclasses.field(default_factory=ServerConfig)
    kernel: KernelConfig = dataclasses.field(default_factory=KernelConfig)
    # runtime
    enable_profiling: bool = False
    warmup: bool = True
    seed: int = 0
    # trie-constrained decode config JSON (reference: TreeDecodeConfig,
    # PrefixToCandidateTokens.h:24); "" = off
    tree_decode_config_path: str = ""
    # dump every dispatched batch's model inputs for offline replay
    # (reference: ModelInputsLogger, NormalExecutor.cc:44-49); "" = off
    model_inputs_log_dir: str = ""

    GROUPS = ("parallel", "cache", "scheduler", "quant", "speculative",
              "server", "kernel")
