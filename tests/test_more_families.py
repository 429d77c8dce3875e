"""Gemma + Phi3 parity vs HF transformers (tiny random models)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import ModelInputs, create_model


def _prefill(prompt, mb=4):
    t = len(prompt)
    return ModelInputs(
        tokens=jnp.asarray([prompt], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None, :],
        block_tables=jnp.asarray([[j + 1 for j in range(mb)]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )


def _ours_vs_hf(path, hf_model, prompt):
    import torch

    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    cache = model.init_cache(8, 16, jnp.float32)
    out, _ = model.forward(weights, cache, _prefill(prompt), need_all_logits=True)
    ours = np.asarray(out.all_logits[0])
    with torch.no_grad():
        theirs = hf_model(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=4e-4, atol=4e-4)


def test_gemma_matches_hf(tmp_path):
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(0)
    cfg = GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        hidden_act="gelu_pytorch_tanh", hidden_activation="gelu_pytorch_tanh",
    )
    m = GemmaForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "gemma")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_phi3_matches_hf(tmp_path):
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
    )
    m = Phi3ForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "phi3")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_gemma2_matches_hf(tmp_path):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    m = Gemma2ForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "gemma2")
    m.save_pretrained(path, safe_serialization=True)
    # long enough to exercise the sliding window (8) on SWA layers
    _ours_vs_hf(path, m, list(range(1, 17)))


def test_glm4_matches_hf(tmp_path):
    import torch
    from transformers import Glm4Config, Glm4ForCausalLM

    torch.manual_seed(0)
    cfg = Glm4Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, pad_token_id=0,
        attention_bias=True, partial_rotary_factor=0.5,
    )
    m = Glm4ForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "glm4")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7, 100])


def test_cohere_matches_hf(tmp_path):
    import torch
    from transformers import CohereConfig, CohereForCausalLM

    torch.manual_seed(0)
    cfg = CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0, logit_scale=0.25,
    )
    m = CohereForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "cohere")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_mixtral_matches_hf(tmp_path):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(0)
    cfg = MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
        num_local_experts=4, num_experts_per_tok=2,
    )
    m = MixtralForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "mixtral")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


@pytest.mark.parametrize("mt", ["internlm", "yi", "baichuan", "starcoder2",
                                "bloom", "falcon"])
def test_new_family_generates(tmp_path, mt):
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    """Round-2 zoo breadth (reference registers 58 types): each new family
    loads its HF layout (fused qkv splits, biased layernorms, ALiBi) and
    decodes deterministically — greedy full-run must equal the incremental
    engine run."""
    cfg = tiny_config(mt)
    ckpt = write_fake_checkpoint(str(tmp_path / mt), cfg)
    cfg = tiny_config(mt)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf)
    gc = GenerateConfig(max_new_tokens=6, do_sample=False, ignore_eos=True)
    out1 = eng.generate([1, 5, 9, 2], gc).output_token_ids
    assert len(out1) == 6
    # decode path consistency: a second engine run with prefix reuse off
    econf2 = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf2.quant.kv_cache_dtype = "float32"
    eng2 = LlmEngine(create_model(cfg), weights, econf2)
    assert eng2.generate([1, 5, 9, 2], gc).output_token_ids == out1


def test_alibi_changes_attention(tmp_path):
    from rtp_llm_tpu.loader.fake_checkpoint import tiny_config  # noqa: F401
    """ALiBi slopes must actually alter attention (vs no-position-bias) and
    decay with distance."""
    import jax.numpy as jnp
    import numpy as np

    from rtp_llm_tpu.models.llama_family import alibi_slopes

    s8 = alibi_slopes(8)
    assert len(s8) == 8 and all(a > b for a, b in zip(s8, s8[1:]))
    s6 = alibi_slopes(6)  # non-power-of-two interpolation
    assert len(s6) == 6 and all(x > 0 for x in s6)

    from rtp_llm_tpu.ops.attention import paged_attention_ref

    b, t, hq, d, bs = 1, 4, 2, 8, 4
    k_cache = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, hq * d)), jnp.float32)
    v_cache = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, hq * d)), jnp.float32)
    q = jnp.asarray(
        np.random.default_rng(2).standard_normal((b, t, hq, d)), jnp.float32)
    bt_ = jnp.asarray([[1, 0]], jnp.int32)
    kv_lens = jnp.asarray([t], jnp.int32)
    q_off = jnp.asarray([0], jnp.int32)
    base = paged_attention_ref(q, k_cache, v_cache, bt_, kv_lens, q_off,
                               0.35, bs)
    alibi = paged_attention_ref(
        q, k_cache, v_cache, bt_, kv_lens, q_off, 0.35, bs,
        alibi_slopes=jnp.asarray(alibi_slopes(hq), jnp.float32))
    assert not np.allclose(np.asarray(base), np.asarray(alibi))
    # first token (no history) is unaffected by the position bias
    np.testing.assert_allclose(np.asarray(base[0, 0]),
                               np.asarray(alibi[0, 0]), rtol=1e-5)


# ---- round-2 families (reference model_factory_register.py types) ----


def test_gpt_neox_matches_hf(tmp_path):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(0)
    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.25,
        use_parallel_residual=True,
    )
    m = GPTNeoXForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "neox")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_gpt_neox_nonparallel_matches_hf(tmp_path):
    import torch
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    torch.manual_seed(1)
    cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, rotary_pct=0.5,
        use_parallel_residual=False,
    )
    m = GPTNeoXForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "neoxs")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [3, 2, 1, 60])


def test_gpt_bigcode_matches_hf(tmp_path):
    """starcoder/wizardcoder architecture: MQA + learned positions."""
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    torch.manual_seed(0)
    cfg = GPTBigCodeConfig(
        vocab_size=128, n_embd=64, n_inner=256, n_layer=2, n_head=4,
        n_positions=128, multi_query=True,
        activation_function="gelu_pytorch_tanh",
    )
    m = GPTBigCodeForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "bigcode")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_mpt_matches_hf(tmp_path):
    import torch
    from transformers import MptConfig, MptForCausalLM

    torch.manual_seed(0)
    cfg = MptConfig(
        vocab_size=128, d_model=64, n_heads=4, n_layers=2,
        expansion_ratio=4, max_seq_len=128,
    )
    m = MptForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "mpt")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_phi_matches_hf(tmp_path):
    """phi-2 architecture: shared-norm parallel residual, partial neox
    rotary, biased lm_head."""
    import torch
    from transformers import PhiConfig, PhiForCausalLM

    torch.manual_seed(0)
    cfg = PhiConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=128, partial_rotary_factor=0.5,
    )
    m = PhiForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "phi")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def test_glm4_moe_matches_hf(tmp_path):
    """GLM-4.5 family: deepseek-style sigmoid+group routing with correction
    bias and shared expert, first-K-dense, partial rotary, qk-norm."""
    import torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    torch.manual_seed(0)
    cfg = Glm4MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=256,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        n_routed_experts=8, n_shared_experts=1, n_group=2, topk_group=1,
        num_experts_per_tok=2, first_k_dense_replace=1,
        routed_scaling_factor=1.5, norm_topk_prob=True, use_qk_norm=True,
        max_position_embeddings=128, partial_rotary_factor=0.5,
    )
    m = Glm4MoeForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "glm4moe")
    m.save_pretrained(path, safe_serialization=True)
    _ours_vs_hf(path, m, [1, 5, 9, 42, 7])


def _save_manual_ckpt(path, tensors, hf_cfg):
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file({k: v.astype(np.float32) for k, v in tensors.items()},
              os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)


def test_qwen_v1_weight_map_and_generate(tmp_path):
    """qwen v1 (no transformers class): the fused c_attn must split into
    q/k/v, HF QWenMLP's w2 is the swiglu gate and w1 the up projection
    (reference: rtp_llm/models/qwen.py weight map)."""
    rng = np.random.default_rng(0)
    H, I, V, L = 32, 48, 64, 2
    t = {
        "transformer.wte.weight": rng.standard_normal((V, H)) * 0.05,
        "transformer.ln_f.weight": np.ones(H),
        "lm_head.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"transformer.h.{l}."
        t[p + "ln_1.weight"] = np.ones(H)
        t[p + "ln_2.weight"] = np.ones(H)
        t[p + "attn.c_attn.weight"] = rng.standard_normal((3 * H, H)) * 0.05
        t[p + "attn.c_attn.bias"] = rng.standard_normal(3 * H) * 0.01
        t[p + "attn.c_proj.weight"] = rng.standard_normal((H, H)) * 0.05
        t[p + "mlp.w1.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "mlp.w2.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "mlp.c_proj.weight"] = rng.standard_normal((H, I)) * 0.05
    path = str(tmp_path / "qwen1")
    _save_manual_ckpt(path, t, {
        "model_type": "qwen", "vocab_size": V, "hidden_size": H,
        "num_hidden_layers": L, "num_attention_heads": 4, "kv_channels": 8,
        "intermediate_size": 2 * I, "seq_length": 128,
    })
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.intermediate_size == I and cfg.head_dim == 8
    cfg.dtype = "float32"
    w = CheckpointLoader(cfg).load(path)
    np.testing.assert_allclose(
        np.asarray(w["q_proj"][0]),
        t["transformer.h.0.attn.c_attn.weight"][:H].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w["v_bias"][1]),
        t["transformer.h.1.attn.c_attn.bias"][2 * H:], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w["gate_proj"][0]),
        t["transformer.h.0.mlp.w2.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w["up_proj"][0]),
        t["transformer.h.0.mlp.w1.weight"].T, rtol=1e-6)

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=32),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), w, econf)
    out = eng.generate([1, 5, 9], GenerateConfig(
        max_new_tokens=4, do_sample=False, ignore_eos=True))
    assert len(out.output_token_ids) == 4


def test_chatglm_weight_map_and_generate(tmp_path):
    """chatglm2/3 (no transformers class): fused GQA query_key_value splits
    q/k/v, dense_h_to_4h splits [gate | up] (reference: chat_glm_v2.py)."""
    rng = np.random.default_rng(1)
    H, I, V, L, heads, kvh, d = 32, 40, 64, 2, 4, 2, 8
    qd, kvd = heads * d, kvh * d
    t = {
        "transformer.embedding.word_embeddings.weight":
            rng.standard_normal((V, H)) * 0.05,
        "transformer.encoder.final_layernorm.weight": np.ones(H),
        "transformer.output_layer.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"transformer.encoder.layers.{l}."
        t[p + "input_layernorm.weight"] = np.ones(H)
        t[p + "post_attention_layernorm.weight"] = np.ones(H)
        t[p + "self_attention.query_key_value.weight"] = (
            rng.standard_normal((qd + 2 * kvd, H)) * 0.05)
        t[p + "self_attention.query_key_value.bias"] = (
            rng.standard_normal(qd + 2 * kvd) * 0.01)
        t[p + "self_attention.dense.weight"] = (
            rng.standard_normal((H, qd)) * 0.05)
        t[p + "mlp.dense_h_to_4h.weight"] = (
            rng.standard_normal((2 * I, H)) * 0.05)
        t[p + "mlp.dense_4h_to_h.weight"] = rng.standard_normal((H, I)) * 0.05
    path = str(tmp_path / "cglm")
    _save_manual_ckpt(path, t, {
        "model_type": "chatglm", "hidden_size": H, "num_layers": L,
        "num_attention_heads": heads, "multi_query_attention": True,
        "multi_query_group_num": kvh, "kv_channels": d,
        "ffn_hidden_size": I, "padded_vocab_size": V, "seq_length": 128,
        "add_qkv_bias": True, "layernorm_epsilon": 1e-5,
    })
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.num_kv_heads == kvh and cfg.intermediate_size == I
    assert cfg.vocab_size == V
    cfg.dtype = "float32"
    w = CheckpointLoader(cfg).load(path)
    fused = t["transformer.encoder.layers.0.self_attention.query_key_value.weight"]
    np.testing.assert_allclose(np.asarray(w["q_proj"][0]), fused[:qd].T,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w["k_proj"][0]),
                               fused[qd:qd + kvd].T, rtol=1e-6)
    h4h = t["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"]
    np.testing.assert_allclose(np.asarray(w["gate_proj"][0]), h4h[:I].T,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w["up_proj"][0]), h4h[I:].T,
                               rtol=1e-6)

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=32),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), w, econf)
    out = eng.generate([1, 5, 9], GenerateConfig(
        max_new_tokens=4, do_sample=False, ignore_eos=True))
    assert len(out.output_token_ids) == 4


def test_arch_aliases_resolve():
    """Alias model types must resolve to their base architecture's config
    derivation, weight map, and model class (reference registers these as
    distinct types in model_factory_register.py)."""
    from rtp_llm_tpu.loader.weight_maps import get_weight_specs
    from rtp_llm_tpu.models.model_factory import registered_model_types

    for mt in ("aquila", "xverse", "kimi_k2", "deepseek_v31", "wizardcoder",
               "starcoder", "qwen3_coder_moe", "qwen35_moe", "chat_glm_2",
               "qwen_7b"):
        assert mt in registered_model_types(), mt

    kimi = ModelConfig.from_hf_config({
        "hidden_size": 64, "num_attention_heads": 4, "num_hidden_layers": 2,
        "vocab_size": 128, "kv_lora_rank": 32, "qk_nope_head_dim": 16,
        "qk_rope_head_dim": 8, "v_head_dim": 16, "n_routed_experts": 4,
        "num_experts_per_tok": 2, "moe_intermediate_size": 32,
        "first_k_dense_replace": 1,
    }, "kimi_k2")
    assert kimi.kv_lora_rank == 32  # MLA derivation fired
    assert kimi.moe_router_bias  # deepseek_v3 routing semantics
    m = create_model(kimi)
    assert type(m).__name__ == "DeepseekModel"
    assert len(get_weight_specs(kimi)) > 10


def test_internlm2_weight_map_and_generate(tmp_path):
    """internlm2 (no transformers class): the grouped fused wqkv must split
    into q/k/v per kv-head group (reference: internlm2 weight map)."""
    rng = np.random.default_rng(2)
    H, I, V, L, heads, kvh, d = 32, 48, 64, 2, 4, 2, 8
    g = heads // kvh
    t = {
        "model.tok_embeddings.weight": rng.standard_normal((V, H)) * 0.05,
        "model.norm.weight": np.ones(H),
        "output.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"model.layers.{l}."
        t[p + "attention_norm.weight"] = np.ones(H)
        t[p + "ffn_norm.weight"] = np.ones(H)
        t[p + "attention.wqkv.weight"] = (
            rng.standard_normal((kvh * (g + 2) * d, H)) * 0.05)
        t[p + "attention.wo.weight"] = rng.standard_normal((H, heads * d)) * 0.05
        t[p + "feed_forward.w1.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "feed_forward.w3.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "feed_forward.w2.weight"] = rng.standard_normal((H, I)) * 0.05
    path = str(tmp_path / "il2")
    _save_manual_ckpt(path, t, {
        "model_type": "internlm2", "vocab_size": V, "hidden_size": H,
        "intermediate_size": I, "num_hidden_layers": L,
        "num_attention_heads": heads, "num_key_value_heads": kvh,
        "head_dim": d,
    })
    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    w = CheckpointLoader(cfg).load(path)
    fused = t["model.layers.0.attention.wqkv.weight"].reshape(kvh, g + 2, d, H)
    np.testing.assert_allclose(
        np.asarray(w["q_proj"][0]),
        fused[:, :g].reshape(heads * d, H).T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w["k_proj"][0]),
        fused[:, g:g + 1].reshape(kvh * d, H).T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(w["v_proj"][0]),
        fused[:, g + 1:].reshape(kvh * d, H).T, rtol=1e-6)

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=32),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), w, econf)
    out = eng.generate([1, 5, 9], GenerateConfig(
        max_new_tokens=4, do_sample=False, ignore_eos=True))
    assert len(out.output_token_ids) == 4
