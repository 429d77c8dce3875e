"""Process-wide runtime flags bridging the config system and low-level ops.

Kernel- and loader-level knobs (Pallas attention tuning, int4 packing, weight
caching...) are consulted deep inside ops code where no EngineConfig is in
scope. This registry gives them ONE home: each flag defaults from its legacy
env var (so bare scripts keep working), and `apply_engine_config` overrides
them from the parsed config tree so every knob is reachable through the
``--<group>-<field>`` / ``RTP_<GROUP>_<FIELD>`` dual surface
(reference analog: py_env_configs.py reading the 36 server_args groups into
StaticConfig consulted by kernels/loaders).
"""

from __future__ import annotations

import os
from typing import Any, Dict

_OVERRIDES: Dict[str, Any] = {}

# flag -> (env var, type, default)
_DEFS = {
    "attn_backend": ("RTP_ATTN_BACKEND", str, "auto"),
    "enable_pallas_prefill": ("RTP_ENABLE_PALLAS_PREFILL", bool, False),
    "disable_fullrow": ("RTP_DISABLE_FULLROW", bool, False),
    "fullrow_vmem_mb": ("RTP_FULLROW_VMEM_MB", int, 12),
    "fullrow_nb": ("RTP_FULLROW_NB", int, 0),  # 0 = auto
    "int4_packed": ("RTP_INT4_UNPACKED", "inv_bool", True),
    # skewed decode/dot pipeline in the int4/fp4 dequant-GEMM kernel
    "int4_pipeline": ("RTP_INT4_PIPELINE", bool, False),
    "no_scan_layers": ("RTP_NO_SCAN_LAYERS", bool, False),
    "disable_weight_fusion": ("RTP_DISABLE_WEIGHT_FUSION", bool, False),
    "parallel_warmup": ("RTP_PARALLEL_WARMUP", "warmup_bool", True),
    "parallel_warmup_workers": ("RTP_PARALLEL_WARMUP", "warmup_int", 8),
    "hbm_gb": ("RTP_HBM_GB", float, 0.0),
    "compile_cache_dir": ("RTP_COMPILE_CACHE_DIR", str, ""),
    "weights_cache_dir": ("RTP_WEIGHTS_CACHE_DIR", str, ""),
    "mm_cache_mb": ("RTP_MM_CACHE_MB", int, 256),
    # per-request gen_timeline profiling: operator opt-in (an unauthenticated
    # client could otherwise start engine-wide trace windows and write to
    # arbitrary server paths — ADVICE r4 medium)
    "allow_client_timeline": ("RTP_ALLOW_CLIENT_TIMELINE", bool, False),
    "timeline_root": ("RTP_TIMELINE_ROOT", str, "/tmp/rtp_llm_timeline"),
}


def _from_env(name: str):
    env, typ, default = _DEFS[name]
    raw = os.environ.get(env)
    if typ == "inv_bool":  # flag is the NEGATION of the env var
        return not raw if raw is not None else default
    if raw is None or raw == "":
        return default
    if typ is bool:
        return str(raw).lower() not in ("0", "false", "no", "off", "")
    if typ == "warmup_bool":
        return raw not in ("0", "")
    if typ == "warmup_int":
        try:
            return int(raw)
        except ValueError:
            return default
    try:
        return typ(raw)
    except (TypeError, ValueError):
        return default


def get(name: str):
    """Current value: explicit override (config) > env var > default."""
    if name in _OVERRIDES:
        return _OVERRIDES[name]
    return _from_env(name)


def env_default(name: str):
    """Env var / built-in default, IGNORING overrides. Used by the config
    dataclass default_factories: a freshly constructed KernelConfig must
    reflect the CURRENT environment, not whatever a previously constructed
    engine pushed into the override registry."""
    return _from_env(name)


def set_flag(name: str, value) -> None:
    if name not in _DEFS:
        raise KeyError(name)
    _OVERRIDES[name] = value


def reset() -> None:
    _OVERRIDES.clear()


def apply_engine_config(cfg) -> None:
    """Push the kernel/runtime fields of an EngineConfig into this registry
    (called by LlmEngine and the CLI so ops-level code observes them).

    Only values that DIFFER from the current env-derived default become
    overrides: KernelConfig defaults initialize from env, so an unchanged
    field means the operator never touched it — and a later env change (or
    another engine in the same process) must still be able to take effect
    instead of being shadowed by a stale default."""
    k = getattr(cfg, "kernel", None)
    if k is None:
        return
    for name, value in (
        ("attn_backend", k.attn_backend),
        ("enable_pallas_prefill", k.enable_pallas_prefill),
        ("disable_fullrow", k.disable_fullrow),
        ("fullrow_vmem_mb", k.fullrow_vmem_mb),
        ("fullrow_nb", k.fullrow_nb),
        ("int4_packed", k.int4_packed),
        ("int4_pipeline", k.int4_pipeline),
        ("no_scan_layers", k.no_scan_layers),
        ("disable_weight_fusion", k.disable_weight_fusion),
        ("parallel_warmup", k.parallel_warmup),
        ("parallel_warmup_workers", k.parallel_warmup_workers),
        ("hbm_gb", k.hbm_gb),
        ("compile_cache_dir", k.compile_cache_dir),
        ("weights_cache_dir", k.weights_cache_dir),
        ("mm_cache_mb", k.mm_cache_mb),
        ("allow_client_timeline", k.allow_client_timeline),
        ("timeline_root", k.timeline_root),
    ):
        if value != _from_env(name):
            set_flag(name, value)
        else:
            _OVERRIDES.pop(name, None)
