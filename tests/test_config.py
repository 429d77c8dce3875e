import os

import pytest

from rtp_llm_tpu.config import EngineConfig, GenerateConfig, ModelConfig, QuantMethod
from rtp_llm_tpu.config.server_args import apply_env_and_args, parse_engine_config


def test_model_config_from_hf_qwen2():
    hf = {
        "model_type": "qwen2",
        "vocab_size": 151936,
        "hidden_size": 3584,
        "intermediate_size": 18944,
        "num_hidden_layers": 28,
        "num_attention_heads": 28,
        "num_key_value_heads": 4,
        "rope_theta": 1000000.0,
        "rms_norm_eps": 1e-06,
        "eos_token_id": 151645,
        "tie_word_embeddings": False,
    }
    cfg = ModelConfig.from_hf_config(hf)
    assert cfg.num_kv_heads == 4
    assert cfg.head_dim == 128
    assert cfg.attention_bias  # qwen2 has qkv bias
    assert cfg.eos_token_ids == [151645]
    assert not cfg.use_qk_norm


def test_model_config_qwen3():
    hf = {
        "model_type": "qwen3",
        "hidden_size": 1024,
        "num_attention_heads": 16,
        "num_hidden_layers": 28,
        "head_dim": 128,
        "num_key_value_heads": 8,
    }
    cfg = ModelConfig.from_hf_config(hf)
    assert cfg.use_qk_norm
    assert cfg.head_dim == 128


def test_model_config_moe():
    hf = {
        "model_type": "qwen3_moe",
        "hidden_size": 2048,
        "num_attention_heads": 32,
        "num_hidden_layers": 48,
        "num_experts": 128,
        "num_experts_per_tok": 8,
        "moe_intermediate_size": 768,
        "norm_topk_prob": True,
    }
    cfg = ModelConfig.from_hf_config(hf)
    assert cfg.num_experts == 128
    assert cfg.is_moe_layer(0)


def test_generate_config_validation():
    with pytest.raises(ValueError):
        GenerateConfig(max_new_tokens=0)
    with pytest.raises(ValueError):
        GenerateConfig(top_p=0.0)
    g = GenerateConfig(temperature=0.0)
    assert not g.do_sample  # temp 0 => greedy


def test_generate_config_openai_aliases():
    g = GenerateConfig.from_dict(
        {"max_tokens": 7, "stop": "###", "temperature": 0.5, "n": 2, "unknown_key": 1}
    )
    assert g.max_new_tokens == 7
    assert g.stop_words == ["###"]
    assert g.num_return_sequences == 2


def test_env_and_cli_parsing(monkeypatch):
    monkeypatch.setenv("RTP_SCHEDULER_MAX_BATCH_SIZE", "16")
    monkeypatch.setenv("RTP_QUANT_METHOD", "int8")
    cfg = parse_engine_config([])
    assert cfg.scheduler.max_batch_size == 16
    assert cfg.quant.method == QuantMethod.WEIGHT_ONLY_INT8
    # CLI overrides env
    cfg2 = apply_env_and_args(EngineConfig(), ["--scheduler-max-batch-size", "8"])
    assert cfg2.scheduler.max_batch_size == 8


def test_cli_model_tag():
    cfg = parse_engine_config(["/path/to/model", "--server-port", "9000"])
    assert cfg.server.model_path == "/path/to/model"
    assert cfg.server.port == 9000


def test_reference_type_aliases_resolve():
    """Reference-exact MODEL_TYPE spellings (rtp_llm/model_factory_register.py)
    normalize to our canonical families across config, weight map, and
    factory registries."""
    from rtp_llm_tpu.config.model_config import (
        ModelConfig, REFERENCE_TYPE_ALIASES,
    )
    from rtp_llm_tpu.loader.weight_maps import _FAMILY_BUILDERS
    from rtp_llm_tpu.models.model_factory import _REGISTRY

    cfg = ModelConfig.from_hf_config(
        {"model_type": "qwen_2", "vocab_size": 64, "hidden_size": 32,
         "num_hidden_layers": 2, "num_attention_heads": 4,
         "intermediate_size": 64}, None)
    assert cfg.model_type == "qwen2" and cfg.attention_bias
    for alias, target in REFERENCE_TYPE_ALIASES.items():
        # every alias whose target family exists must be serveable end-to-end
        if target in _FAMILY_BUILDERS:
            assert alias in _FAMILY_BUILDERS, alias
        if target in _REGISTRY:
            assert alias in _REGISTRY, alias


def _synthetic_value(ftype, current):
    """A value of the field's type that differs from `current`."""
    import enum
    import typing

    origin = typing.get_origin(ftype)
    if origin is typing.Union:
        args = [a for a in typing.get_args(ftype) if a is not type(None)]
        ftype = args[0] if args else str
        origin = typing.get_origin(ftype)
    if ftype is bool:
        return (not current), ("0" if current else "1")
    if ftype is int:
        v = (current or 0) + 7
        return v, str(v)
    if ftype is float:
        v = (current or 0.0) + 0.5
        return v, str(v)
    if origin is tuple or ftype is tuple:
        v = (3, 9)
        return v, "3,9"
    if isinstance(ftype, type) and issubclass(ftype, enum.Enum):
        opts = list(ftype)
        v = opts[1] if len(opts) > 1 and opts[0] == current else opts[0]
        return v, v.value
    v = "synthval" if current != "synthval" else "synthval2"
    return v, v


def test_full_flag_surface_parity(monkeypatch):
    """EVERY field of EVERY config group is settable both via env var
    (RTP_<GROUP>_<FIELD>) and via CLI flag (--<group>-<field>), with CLI
    winning over env (reference parity: server_args.py 36 groups expose each
    engine option both ways). Walks the dataclass tree — a new field that is
    not parseable both ways fails this test."""
    import dataclasses
    import typing

    from rtp_llm_tpu.config.server_args import (
        _iter_fields, env_name, flag_name,
    )

    n_checked = 0
    for group_name, group, f in _iter_fields(EngineConfig()):
        hints = typing.get_type_hints(type(group))
        ftype = hints.get(f.name, str)
        current = getattr(group, f.name)
        want, raw = _synthetic_value(ftype, current)

        # env path
        ev = env_name(group_name, f.name)
        monkeypatch.setenv(ev, raw)
        cfg = parse_engine_config([])
        got = getattr(getattr(cfg, group_name) if group_name else cfg, f.name)
        assert got == want, f"env {ev}={raw!r}: got {got!r} want {want!r}"
        monkeypatch.delenv(ev)

        # CLI path
        fl = flag_name(group_name, f.name)
        cfg2 = apply_env_and_args(EngineConfig(), [fl, raw])
        got2 = getattr(getattr(cfg2, group_name) if group_name else cfg2,
                       f.name)
        assert got2 == want, f"flag {fl} {raw!r}: got {got2!r} want {want!r}"

        # CLI wins over env
        monkeypatch.setenv(ev, raw)
        other_want, other_raw = _synthetic_value(ftype, want)
        cfg3 = apply_env_and_args(EngineConfig(), [fl, other_raw])
        got3 = getattr(getattr(cfg3, group_name) if group_name else cfg3,
                       f.name)
        assert got3 == other_want, f"{fl} should beat {ev}"
        monkeypatch.delenv(ev)
        n_checked += 1

    # every group + the flat EngineConfig fields are covered
    total = sum(len(dataclasses.fields(getattr(EngineConfig(), g)))
                for g in EngineConfig.GROUPS)
    total += sum(1 for f in dataclasses.fields(EngineConfig)
                 if f.name not in EngineConfig.GROUPS)
    assert n_checked == total and n_checked >= 80, n_checked


def test_kernel_flags_reach_ops(monkeypatch):
    """KernelConfig fields propagate into the runtime_flags registry that
    ops-level code consults (and legacy bare env vars still work)."""
    from rtp_llm_tpu.config import runtime_flags

    runtime_flags.reset()
    try:
        # legacy env honored as default
        monkeypatch.setenv("RTP_ATTN_BACKEND", "ref")
        assert runtime_flags.get("attn_backend") == "ref"
        cfg = parse_engine_config([])
        assert cfg.kernel.attn_backend == "ref"
        # grouped surface wins
        cfg2 = parse_engine_config(["--kernel-attn-backend", "pallas"])
        runtime_flags.apply_engine_config(cfg2)
        assert runtime_flags.get("attn_backend") == "pallas"
        # negated legacy env (RTP_INT4_UNPACKED)
        runtime_flags.reset()
        monkeypatch.setenv("RTP_INT4_UNPACKED", "1")
        assert runtime_flags.get("int4_packed") is False
        # legacy warmup env: "0" disables, N sets workers
        monkeypatch.setenv("RTP_PARALLEL_WARMUP", "0")
        assert runtime_flags.get("parallel_warmup") is False
        monkeypatch.setenv("RTP_PARALLEL_WARMUP", "4")
        assert runtime_flags.get("parallel_warmup") is True
        assert runtime_flags.get("parallel_warmup_workers") == 4
    finally:
        runtime_flags.reset()


def test_extra_configs_merge():
    """extra_configs nests generate-config fields (reference:
    ChatCompletionRequest.extra_configs, api_datatype.py:150); explicit
    top-level nulls must not clobber nested values."""
    from rtp_llm_tpu.config.generate_config import GenerateConfig

    g = GenerateConfig.from_dict({
        "temperature": None, "top_p": None, "max_tokens": 7,
        "extra_configs": {"temperature": 0.2, "top_p": 0.5,
                          "calculate_loss": 1},
    })
    assert g.temperature == 0.2 and g.top_p == 0.5
    assert g.calculate_loss == 1 and g.max_new_tokens == 7
    # top-level non-null wins over nested
    g2 = GenerateConfig.from_dict(
        {"top_k": 3, "extra_configs": {"top_k": 9}})
    assert g2.top_k == 3
