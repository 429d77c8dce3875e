"""Beam search tests (reference analog: beam fanout in GenerateStream +
trt_beam_search sampler path)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _engine(ckpt, num_blocks=128):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=num_blocks,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(model, weights, econf)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("beam"))
    return write_fake_checkpoint(path, tiny_config("qwen2"))


def _hf_beam(ckpt, prompt, n, num_beams):
    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(ckpt, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        out = m.generate(
            torch.tensor([prompt]), max_new_tokens=n, num_beams=num_beams,
            do_sample=False, eos_token_id=None, pad_token_id=0,
            length_penalty=1.0, early_stopping=False,
        )
    return out[0].tolist()[len(prompt):]


def test_beam_matches_hf(ckpt):
    prompt = [1, 5, 9, 42]
    n = 8
    eng = _engine(ckpt)
    s = eng.generate(prompt, GenerateConfig(
        max_new_tokens=n, num_beams=3, do_sample=False, ignore_eos=True))
    expect = _hf_beam(ckpt, prompt, n, 3)
    assert s.output_token_ids == expect


def test_beam_no_block_leak(ckpt):
    eng = _engine(ckpt)
    before = eng.cache_mgr.pool.free_blocks
    s = eng.generate([7, 3, 3, 9], GenerateConfig(
        max_new_tokens=6, num_beams=4, do_sample=False, ignore_eos=True))
    assert s.is_finished()
    assert len(s.output_token_ids) == 6
    assert eng.cache_mgr.pool.free_blocks == before


def test_beam_and_normal_interleave(ckpt):
    """A beam group and normal greedy streams share one engine."""
    eng = _engine(ckpt)
    normal_ref = _engine(ckpt).generate(
        [2, 4, 6], GenerateConfig(max_new_tokens=5, do_sample=False,
                                  ignore_eos=True)
    ).output_token_ids

    beam = eng.enqueue([1, 5, 9, 42], GenerateConfig(
        max_new_tokens=6, num_beams=2, do_sample=False, ignore_eos=True))
    normal = eng.enqueue([2, 4, 6], GenerateConfig(
        max_new_tokens=5, do_sample=False, ignore_eos=True))
    for _ in range(60):
        if beam.is_finished() and normal.is_finished():
            break
        eng.step()
    assert normal.output_token_ids == normal_ref
    assert len(beam.output_token_ids) == 6


def test_variable_num_beams_schedule(tmp_path):
    """variable_num_beams (reference GenerateStream::numBeams,
    GenerateStream.cc:217-230): per-step beam widths; schedule [1] must
    reproduce greedy, and a widening schedule must run with the width
    clamped to the per-step plan."""
    ckpt = write_fake_checkpoint(str(tmp_path / "vb"), tiny_config("qwen2"))

    greedy = _engine(ckpt).generate([1, 5, 9, 42], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
    )).output_token_ids

    # constant width-1 schedule == greedy
    eng = _engine(ckpt)
    s = eng.enqueue([1, 5, 9, 42], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
        variable_num_beams=[1],
    ))
    for _ in range(40):
        if s.is_finished():
            break
        eng.step()
    assert s.output_token_ids == greedy

    # widening schedule 1 -> 4: runs to completion, output length respected
    eng2 = _engine(ckpt)
    s2 = eng2.enqueue([1, 5, 9, 42], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
        variable_num_beams=[1, 2, 4],
    ))
    for _ in range(40):
        if s2.is_finished():
            break
        eng2.step()
    assert len(s2.output_token_ids) == 6
    # a width-4 run should score at least as well as greedy under the
    # beam objective (it contains the greedy path in its search space)
