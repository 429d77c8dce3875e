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
