"""Speculative decoding tests.

Key invariant: speculative output must be IDENTICAL to normal greedy decode
(speculation changes speed, never results)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import (
    CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.engine.speculative import propose_prompt_lookup
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


class TestPromptLookup:
    def test_finds_repeated_ngram(self):
        toks = [1, 2, 3, 4, 9, 9, 1, 2, 3]
        # trailing 3-gram [1,2,3] occurred at 0; continuation 4, 9, 9
        assert propose_prompt_lookup(toks, 3) == [4, 9, 9]

    def test_prefers_longest_ngram(self):
        toks = [5, 1, 2, 7, 0, 1, 2, 7, 8, 1, 2, 7]
        # 3-gram [1,2,7] most recent earlier occurrence at index 5 -> next is 8
        assert propose_prompt_lookup(toks, 2)[0] == 8

    def test_no_match_pads_with_last(self):
        assert propose_prompt_lookup([1, 2, 3], 3) == [3, 3, 3]

    def test_short_continuation_padded(self):
        toks = [1, 2, 1, 2]
        # 2-gram [1,2] at 0, continuation [1,2] (2 tokens) then pad
        assert propose_prompt_lookup(toks, 4) == [1, 2, 2, 2]


def _build_engine(ckpt, cfg, spec: bool):
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=256),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
        speculative=SpeculativeConfig(
            method="prompt_lookup" if spec else "none", draft_tokens=3
        ),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(model, weights, econf)


def test_spec_matches_normal_greedy(tmp_path):
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "s"), cfg)
    # repetitive prompt so prompt-lookup actually accepts drafts
    prompt = [7, 8, 9, 7, 8, 9, 7, 8]
    gc = lambda: GenerateConfig(max_new_tokens=16, do_sample=False, ignore_eos=True)

    normal = _build_engine(ckpt, tiny_config("qwen2"), spec=False)
    expect = normal.generate(prompt, gc()).output_token_ids

    spec = _build_engine(ckpt, tiny_config("qwen2"), spec=True)
    s = spec.generate(prompt, gc())
    assert s.output_token_ids == expect
    # speculation must actually compress steps (fewer engine steps than tokens)
    assert spec.step_count < len(expect) + 2


def test_spec_batch_matches(tmp_path):
    cfg = tiny_config("qwen3")
    ckpt = write_fake_checkpoint(str(tmp_path / "s3"), cfg)
    prompts = [[1, 2, 3, 1, 2, 3], [9, 9, 9, 9], [4, 5, 4, 5, 4]]
    gc = lambda: GenerateConfig(max_new_tokens=10, do_sample=False, ignore_eos=True)

    normal = _build_engine(ckpt, tiny_config("qwen3"), spec=False)
    expect = [normal.generate(p, gc()).output_token_ids for p in prompts]

    spec = _build_engine(ckpt, tiny_config("qwen3"), spec=True)
    streams = [spec.enqueue(p, gc()) for p in prompts]
    for _ in range(100):
        if all(s.is_finished() for s in streams):
            break
        spec.step()
    for s, e in zip(streams, expect):
        assert s.output_token_ids == e


def test_spec_with_eos_stops_correctly(tmp_path):
    """A stream hitting eos mid-window must stop exactly at eos."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "se"), cfg)
    base = _build_engine(ckpt, tiny_config("qwen2"), spec=False)
    prompt = [3, 1, 4, 3, 1, 4]
    full = base.generate(
        prompt, GenerateConfig(max_new_tokens=12, do_sample=False, ignore_eos=True)
    ).output_token_ids
    # pick the 5th generated token as a stop token
    stop_tok = full[4]
    gc = lambda: GenerateConfig(max_new_tokens=12, do_sample=False,
                                ignore_eos=True, stop_token_ids=[stop_tok])
    normal_out = _build_engine(ckpt, tiny_config("qwen2"), spec=False).generate(
        prompt, gc()).output_token_ids
    spec_out = _build_engine(ckpt, tiny_config("qwen2"), spec=True).generate(
        prompt, gc()).output_token_ids
    assert spec_out == normal_out
    assert spec_out[-1] == stop_tok


def test_sampling_streams_fall_back(tmp_path):
    """do_sample streams must not go through greedy verify."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "sf"), cfg)
    eng = _build_engine(ckpt, tiny_config("qwen2"), spec=True)
    s = eng.generate([1, 2, 3, 1, 2], GenerateConfig(
        max_new_tokens=6, do_sample=True, top_k=1, ignore_eos=True))
    assert len(s.output_token_ids) == 6
    # no step compression: prefill step emits 1 token + decodes 1/step after
    assert eng.step_count >= len(s.output_token_ids) - 1


def test_draft_model_spec_matches_normal(tmp_path):
    """Vanilla draft-model speculative decoding must produce exactly the
    greedy outputs of normal decode (reference: sp_type 'vanilla')."""
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "tgt"), cfg)
    # draft = a smaller model (fewer layers) with the same vocab
    dcfg = tiny_config("qwen2", num_layers=1)
    dcfg.dtype = "float32"
    dckpt = write_fake_checkpoint(str(tmp_path / "draft"), dcfg)

    def build(spec_method):
        weights = CheckpointLoader(cfg).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                      prefill_buckets=(16, 64)),
            speculative=SpeculativeConfig(method=spec_method, draft_tokens=3),
        )
        econf.quant.kv_cache_dtype = "float32"
        draft = None
        if spec_method == "vanilla":
            dw = CheckpointLoader(dcfg).load(dckpt)
            draft = (create_model(dcfg), dw)
        return LlmEngine(create_model(cfg), weights, econf, draft=draft)

    gc = lambda: GenerateConfig(max_new_tokens=10, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]
    normal = build("none").generate(prompt, gc()).output_token_ids
    spec = build("vanilla").generate(prompt, gc()).output_token_ids
    assert spec == normal

    # batched: two streams through the draft path at once
    eng = build("vanilla")
    s1 = eng.enqueue(prompt, gc())
    s2 = eng.enqueue([2, 4, 6, 8], gc())
    for _ in range(40):
        if s1.is_finished() and s2.is_finished():
            break
        eng.step()
    assert s1.output_token_ids == normal
    assert len(s2.output_token_ids) == 10


def test_eagle_spec_matches_normal(tmp_path):
    """EAGLE proposer (engine/eagle.py): output must exactly match normal
    greedy decode regardless of proposal quality, the HF-format head must
    load (loader.load_eagle_weights), and the acceptance metric must fire.
    Reference: EAGLE propose-model plan, RtpLLMOp.cc:26-98."""
    from rtp_llm_tpu.loader import load_eagle_weights
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_eagle_checkpoint

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "t"), cfg)
    eagle_dir = write_fake_eagle_checkpoint(str(tmp_path / "e"), cfg)
    ew = load_eagle_weights(eagle_dir, dtype=jnp.float32)
    assert ew["fc"].shape == (2 * cfg.hidden_size, cfg.hidden_size)
    assert "embed_tokens" not in ew  # shares the target's

    base = _build_engine(ckpt, tiny_config("qwen2"), spec=False)

    cfg2 = tiny_config("qwen2")
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=256),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
        speculative=SpeculativeConfig(method="eagle", draft_tokens=3),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf, eagle=ew)
    assert eng.mtp is not None, "EagleRunner must be active"

    gc = lambda: GenerateConfig(max_new_tokens=12, do_sample=False,
                                ignore_eos=True)
    prompts = [[1, 5, 9, 2, 5, 9, 2], [7, 3, 3, 7, 3, 3]]
    for p in prompts:
        want = base.generate(p, gc()).output_token_ids
        got = eng.generate(p, gc()).output_token_ids
        assert got == want


def test_eagle3_spec_matches_normal(tmp_path):
    """EAGLE3 proposer: midlayer consumes cat(input_norm(embed),
    hidden_norm(feature)) with H-dim residual, the target captures 3 layers'
    hidden states (model.spec_capture_layers), the head is the draft's own
    norm+lm_head, and outputs still exactly match normal greedy decode.
    Reference: eagle3_* weight names W.h:27-30, merged_eagle3_hidden
    PyWrappedModel.cc:746."""
    from rtp_llm_tpu.loader import load_eagle_weights
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_eagle3_checkpoint

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "t"), cfg)
    eagle_dir = write_fake_eagle3_checkpoint(
        str(tmp_path / "e3"), cfg, n_capture=3,
        draft_vocab=cfg.vocab_size // 2)
    ew = load_eagle_weights(eagle_dir, dtype=jnp.float32)
    assert ew["fc"].shape == (3 * cfg.hidden_size, cfg.hidden_size)
    assert "hidden_norm" in ew and "input_norm" in ew
    assert ew["q_proj"].shape[0] == 2 * cfg.hidden_size
    assert ew["lm_head"].shape == (cfg.hidden_size, cfg.vocab_size // 2)
    assert ew["d2t"].shape == (cfg.vocab_size // 2,)

    base = _build_engine(ckpt, tiny_config("qwen2"), spec=False)

    cfg2 = tiny_config("qwen2")
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=256),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
        speculative=SpeculativeConfig(method="eagle", draft_tokens=3),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf, eagle=ew)
    assert eng.mtp is not None and eng.mtp.is_eagle3
    assert len(eng.mtp.capture_layers) == 3
    assert model.spec_capture_layers == eng.mtp.capture_layers

    gc = lambda: GenerateConfig(max_new_tokens=12, do_sample=False,
                                ignore_eos=True)
    prompts = [[1, 5, 9, 2, 5, 9, 2], [7, 3, 3, 7, 3, 3]]
    for p in prompts:
        want = base.generate(p, gc()).output_token_ids
        got = eng.generate(p, gc()).output_token_ids
        assert got == want
    # d2t mapping keeps drafts inside the target vocab
    drafts = eng.mtp.propose(eng.state, 3)
    import numpy as np
    d = np.asarray(drafts)
    assert (d >= 0).all() and (d < cfg.vocab_size).all()
