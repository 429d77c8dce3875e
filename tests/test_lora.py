"""LoRA tests: PEFT adapter loading, static merge, dynamic application."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.lora import LoraManager, load_peft_adapter, merge_lora
from rtp_llm_tpu.lora.lora import apply_dynamic_lora


def write_fake_adapter(path, num_layers=2, rank=4, alpha=8, hidden=64,
                       out_dim=64, targets=("q_proj",), out_dims=None):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": rank, "lora_alpha": alpha,
                   "target_modules": list(targets)}, f)
    rng = np.random.default_rng(0)
    tensors = {}
    attn = {"q_proj", "k_proj", "v_proj", "o_proj"}
    for l in range(num_layers):
        for t in targets:
            mod = "self_attn" if t in attn else "mlp"
            base = f"base_model.model.model.layers.{l}.{mod}.{t}"
            od = (out_dims or {}).get(t, out_dim)
            tensors[f"{base}.lora_A.weight"] = rng.standard_normal(
                (rank, hidden)).astype(np.float32) * 0.1
            tensors[f"{base}.lora_B.weight"] = rng.standard_normal(
                (od, rank)).astype(np.float32) * 0.1
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))
    return path


def test_load_peft_adapter(tmp_path):
    p = write_fake_adapter(str(tmp_path / "ad"), num_layers=2, rank=4, alpha=8)
    ad = load_peft_adapter(p, num_layers=2)
    assert ad.rank == 4 and ad.scale == 2.0
    assert ad.a["q_proj"].shape == (2, 64, 4)
    assert ad.b["q_proj"].shape == (2, 4, 64)


def test_static_merge_changes_forward(tmp_path):
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    ad = load_peft_adapter(
        write_fake_adapter(str(tmp_path / "ad"), num_layers=cfg.num_layers),
        cfg.num_layers,
    )
    merged = merge_lora(weights, ad)
    # merged W == W + A@B*scale
    want = np.asarray(weights["q_proj"][0]) + (
        ad.a["q_proj"][0] @ ad.b["q_proj"][0]
    ) * ad.scale
    np.testing.assert_allclose(np.asarray(merged["q_proj"][0]), want, rtol=1e-5)
    # untouched weights identical
    np.testing.assert_allclose(
        np.asarray(merged["k_proj"][0]), np.asarray(weights["k_proj"][0])
    )


def test_dynamic_equals_merged(tmp_path):
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    ad = load_peft_adapter(
        write_fake_adapter(str(tmp_path / "ad"), num_layers=cfg.num_layers),
        cfg.num_layers,
    )
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 64)), jnp.float32)
    merged = merge_lora(weights, ad)
    y_merged = x @ merged["q_proj"][0]
    y_dyn = x @ weights["q_proj"][0] + apply_dynamic_lora(x, "q_proj", 0, ad)
    np.testing.assert_allclose(np.asarray(y_merged), np.asarray(y_dyn), rtol=1e-4,
                               atol=1e-5)


def test_manager_add_remove(tmp_path):
    p = write_fake_adapter(str(tmp_path / "ad"))
    mgr = LoraManager(num_layers=2)
    name = mgr.add_adapter(p, name="style-a")
    assert name == "style-a"
    assert mgr.names() == ["style-a"]
    assert mgr.get("style-a").rank == 4
    with pytest.raises(KeyError):
        mgr.get("missing")
    assert mgr.remove_adapter("style-a")
    assert mgr.names() == []


def test_merge_rejects_quantized(tmp_path):
    from rtp_llm_tpu.config.engine_config import QuantConfig
    from rtp_llm_tpu.quant import make_quant_transform

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    weights = CheckpointLoader(
        cfg, transform=make_quant_transform(QuantConfig(method="int8"))
    ).load(ckpt)
    ad = load_peft_adapter(
        write_fake_adapter(str(tmp_path / "ad"), num_layers=cfg.num_layers),
        cfg.num_layers,
    )
    with pytest.raises(ValueError):
        merge_lora(weights, ad)


def _build_dyn_engine(ckpt):
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.models import create_model

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(model, weights, econf)


def test_dynamic_lora_matches_merged_engine(tmp_path):
    """Per-request dynamic adapter must generate the same tokens as an engine
    whose base weights have the adapter statically merged; requests WITHOUT
    the adapter must be unaffected."""
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.lora import LoraManager

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    ad_path = write_fake_adapter(
        str(tmp_path / "ad"), num_layers=cfg.num_layers,
        targets=("q_proj", "v_proj", "up_proj"),
        out_dims={"v_proj": 32, "up_proj": 128},
    )
    gc = lambda **kw: GenerateConfig(max_new_tokens=6, do_sample=False,
                                     ignore_eos=True, **kw)
    prompt = [1, 5, 9, 42]

    base_out = _build_dyn_engine(ckpt).generate(prompt, gc()).output_token_ids

    # statically merged reference
    cfg2 = tiny_config("qwen2"); cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    from rtp_llm_tpu.lora import load_peft_adapter, merge_lora
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.engine import LlmEngine

    merged = merge_lora(weights, load_peft_adapter(ad_path, cfg2.num_layers))
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    merged_out = LlmEngine(create_model(cfg2), merged, econf).generate(
        prompt, gc()).output_token_ids

    # dynamic engine: one request with the adapter, one without, concurrently
    eng = _build_dyn_engine(ckpt)
    mgr = LoraManager(cfg.num_layers)
    mgr.add_adapter(ad_path, name="style")
    eng.set_lora_manager(mgr)
    with_lora = eng.enqueue(prompt, gc(adapter_name="style"))
    without = eng.enqueue(prompt, gc())
    for _ in range(60):
        if with_lora.is_finished() and without.is_finished():
            break
        eng.step()
    assert without.output_token_ids == base_out
    assert with_lora.output_token_ids == merged_out
    assert merged_out != base_out  # the adapter actually does something
