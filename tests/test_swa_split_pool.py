"""Mixed global/SWA split KV pool (gemma2-style sliding_window_pattern).

Reference analog: hybrid SWA cache pools (cpp/cache/) — sliding layers keep
KV in a per-slot ring pool sized by the window instead of the full paged
pool, so SWA layers' KV memory does not scale with context length.
"""

import numpy as np

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import (
    CacheConfig, EngineConfig, SchedulerConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.config.model_config import ModelConfig


def _gemma2_ckpt(tmp_path):
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256,
        sliding_window=8, query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
    )
    m = Gemma2ForCausalLM(cfg)
    m.eval()
    path = str(tmp_path / "g2")
    m.save_pretrained(path, safe_serialization=True)
    return path, m


def _engine(path, batch=2):
    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=128),
        scheduler=SchedulerConfig(max_batch_size=batch, max_seq_len=128,
                                  prefill_buckets=(16, 32)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(model, weights, econf), model


def test_split_pool_shapes(tmp_path):
    path, _ = _gemma2_ckpt(tmp_path)
    eng, model = _engine(path)
    assert model.swa_split and eng.swa_split
    assert set(eng.kv) == {"full", "swa"}
    # gemma2 pattern=2: layers 1,3 global; layers 0,2 slide
    assert eng.kv["full"].shape[0] == 2 and eng.kv["swa"].shape[0] == 2
    nring = model.swa_nring
    # ring holds window (8) + largest prefill bucket (32) live tokens + 1
    assert nring == (8 + 32) // 4 + 1
    assert eng.kv["swa"].shape[2] == eng.config.scheduler.max_batch_size * nring * 4
    # the SWA pool does NOT scale with the paged pool
    assert eng.kv["swa"].shape[2] < eng.kv["full"].shape[2]


def test_engine_matches_hf_greedy_with_window(tmp_path):
    """Serving through the engine (split pools, ring writes, window masks)
    must reproduce HF greedy token-for-token well past the window."""
    import torch

    path, m = _gemma2_ckpt(tmp_path)
    eng, _ = _engine(path)
    prompt = list(range(1, 15))
    n = 16
    with torch.no_grad():
        want = m.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0].tolist()[len(prompt):]
    got = eng.generate(prompt, GenerateConfig(
        max_new_tokens=n, do_sample=False, ignore_eos=True)).output_token_ids
    assert got == want


def test_concurrent_slots_isolated(tmp_path):
    """Two streams in different decode slots use disjoint SWA rings: their
    outputs must match the same prompts run alone."""
    path, _ = _gemma2_ckpt(tmp_path)
    gc = lambda: GenerateConfig(max_new_tokens=10, do_sample=False,
                                ignore_eos=True)
    p1 = [1, 5, 9, 42, 7, 3, 11, 2, 8, 4]
    p2 = [100, 90, 80, 70, 60, 50, 40, 30]

    solo, _ = _engine(path)
    want1 = solo.generate(p1, gc()).output_token_ids
    want2 = solo.generate(p2, gc()).output_token_ids

    eng, _ = _engine(path)
    s1 = eng.enqueue(p1, gc())
    s2 = eng.enqueue(p2, gc())
    while not (s1.is_finished() and s2.is_finished()):
        eng.step()
    eng._resolve_pending()
    assert s1.output_token_ids == want1
    assert s2.output_token_ids == want2
