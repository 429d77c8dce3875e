"""Megatron-LM checkpoint format loading (reference parity: the Megatron
branch of model_loader; SURVEY.md §2.2). A rank-0 Megatron dump with
group-interleaved QKV must load to the SAME canonical weights as the
equivalent HF checkpoint — and generate identically."""

import os

import numpy as np
import pytest

from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import (
    _write_hf_config, tiny_config, write_fake_checkpoint,
)
from rtp_llm_tpu.models import create_model


def _hf_to_megatron(hf_dir: str, mg_dir: str, cfg):
    """Re-emit an HF llama-family checkpoint as a Megatron-core dump."""
    import torch
    from safetensors.numpy import load_file

    t = load_file(os.path.join(hf_dir, "model.safetensors"))
    hq, hkv, d = cfg.num_attention_heads, cfg.num_kv_heads, cfg.head_dim
    qpg = hq // hkv
    model = {
        "embedding.word_embeddings.weight":
            torch.from_numpy(t["model.embed_tokens.weight"]),
        "encoder.final_layernorm.weight":
            torch.from_numpy(t["model.norm.weight"]),
        "output_layer.weight": torch.from_numpy(t["lm_head.weight"]),
    }
    for li in range(cfg.num_layers):
        p = f"model.layers.{li}."
        mp = f"encoder.layers.{li}."
        model[mp + "input_layernorm.weight"] = torch.from_numpy(
            t[p + "input_layernorm.weight"])
        model[mp + "post_attention_layernorm.weight"] = torch.from_numpy(
            t[p + "post_attention_layernorm.weight"])
        model[mp + "self_attention.dense.weight"] = torch.from_numpy(
            t[p + "self_attn.o_proj.weight"])
        model[mp + "mlp.dense_4h_to_h.weight"] = torch.from_numpy(
            t[p + "mlp.down_proj.weight"])
        model[mp + "mlp.dense_h_to_4h.weight"] = torch.from_numpy(
            np.concatenate([t[p + "mlp.gate_proj.weight"],
                            t[p + "mlp.up_proj.weight"]]))
        # group-interleaved qkv: per kv group [q_1..q_qpg, k, v]
        q = t[p + "self_attn.q_proj.weight"].reshape(hkv, qpg * d, -1)
        k = t[p + "self_attn.k_proj.weight"].reshape(hkv, d, -1)
        v = t[p + "self_attn.v_proj.weight"].reshape(hkv, d, -1)
        model[mp + "self_attention.query_key_value.weight"] = (
            torch.from_numpy(np.concatenate([q, k, v], axis=1).reshape(
                (hq + 2 * hkv) * d, -1)))
        qb = t[p + "self_attn.q_proj.bias"].reshape(hkv, qpg * d)
        kb = t[p + "self_attn.k_proj.bias"].reshape(hkv, d)
        vb = t[p + "self_attn.v_proj.bias"].reshape(hkv, d)
        model[mp + "self_attention.query_key_value.bias"] = (
            torch.from_numpy(np.concatenate([qb, kb, vb], axis=1).reshape(
                (hq + 2 * hkv) * d)))
    rank_dir = os.path.join(mg_dir, "iter_0001000", "mp_rank_00")
    os.makedirs(rank_dir, exist_ok=True)
    with open(os.path.join(mg_dir,
                           "latest_checkpointed_iteration.txt"), "w") as f:
        f.write("1000")
    torch.save({"model": model},
               os.path.join(rank_dir, "model_optim_rng.pt"))
    _write_hf_config(mg_dir, cfg)
    return mg_dir


def test_megatron_loads_identical_to_hf(tmp_path):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    cfg.tie_word_embeddings = False
    hf = write_fake_checkpoint(str(tmp_path / "hf"), cfg)
    mg = _hf_to_megatron(hf, str(tmp_path / "mg"), cfg)

    w_hf = CheckpointLoader(cfg).load(hf)
    w_mg = CheckpointLoader(cfg).load(mg)
    assert set(w_hf) == set(w_mg)
    for k in w_hf:
        np.testing.assert_allclose(
            np.asarray(w_hf[k], np.float32), np.asarray(w_mg[k], np.float32),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_megatron_generate_parity(tmp_path):
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.engine import LlmEngine

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    cfg.tie_word_embeddings = False
    hf = write_fake_checkpoint(str(tmp_path / "hf"), cfg)
    mg = _hf_to_megatron(hf, str(tmp_path / "mg"), cfg)

    def gen(path):
        c = tiny_config("qwen2")
        c.dtype = "float32"
        c.tie_word_embeddings = False
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        eng = LlmEngine(create_model(c), CheckpointLoader(c).load(path),
                        econf)
        return eng.generate([1, 5, 9, 42], GenerateConfig(
            max_new_tokens=6, do_sample=False,
            ignore_eos=True)).output_token_ids

    assert gen(mg) == gen(hf)
