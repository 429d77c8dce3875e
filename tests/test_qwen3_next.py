"""Qwen3-Next hybrid linear-attention family: HF parity through the real
loader + engine (reference: models_py/model_desc/qwen3_next.py)."""

import numpy as np
import pytest
import torch

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = tiny_config("qwen3_next")
    return write_fake_checkpoint(
        str(tmp_path_factory.mktemp("qn") / "m"), cfg
    )


def _engine(ckpt, prefill_buckets=(8, 16, 64)):
    cfg = tiny_config("qwen3_next")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=prefill_buckets),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def _hf_generate(ckpt, prompt, n):
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(ckpt, dtype=torch.float32)
    with torch.no_grad():
        out = hf.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )
    return out[0, len(prompt):].tolist()


def test_greedy_matches_hf(ckpt):
    prompt = [1, 5, 9, 42, 7, 3]
    expect = _hf_generate(ckpt, prompt, 10)
    out = _engine(ckpt).generate(prompt, GenerateConfig(
        max_new_tokens=10, do_sample=False, ignore_eos=True,
    )).output_token_ids
    assert out == expect


def test_chunked_prefill_state_carry(ckpt):
    """A prompt longer than the biggest bucket forces multi-chunk prefill:
    conv tail + recurrent state must carry across chunk boundaries."""
    rng = np.random.default_rng(3)
    prompt = [int(t) for t in rng.integers(1, 120, size=30)]
    eng = _engine(ckpt, prefill_buckets=(16,))
    expect = _hf_generate(ckpt, prompt, 6)
    out = eng.generate(prompt, GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
    )).output_token_ids
    assert out == expect


def test_batched_streams_isolated_state(ckpt):
    """Concurrent streams in different decode slots keep independent linear
    state; each must match its own single-stream output."""
    eng = _engine(ckpt)
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False,
                                ignore_eos=True)
    p1, p2, p3 = [1, 5, 9, 42], [7, 3, 11, 2, 8], [100, 101, 102]
    solo = [_engine(ckpt).generate(p, gc()).output_token_ids
            for p in (p1, p2, p3)]
    streams = [eng.enqueue(p, gc()) for p in (p1, p2, p3)]
    for _ in range(60):
        if all(s.is_finished() for s in streams):
            break
        eng.step()
    assert [s.output_token_ids for s in streams] == solo


def test_slot_reuse_resets_state(ckpt):
    """A new stream taking over a released slot must start from fresh state."""
    eng = _engine(ckpt)
    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]
    first = eng.generate(prompt, gc()).output_token_ids
    # same prompt again (slot + state rows reused) must reproduce exactly
    again = eng.generate(prompt, gc()).output_token_ids
    assert again == first


def test_hybrid_guards(ckpt):
    eng = _engine(ckpt)
    with pytest.raises(ValueError):
        eng.enqueue([1, 2, 3], GenerateConfig(num_beams=2))
    with pytest.raises(NotImplementedError):
        eng.prefill_only([1, 2, 3])
    assert eng.cache_mgr.prefix_cache is None  # prefix reuse disabled
