"""End-to-end: fake checkpoint -> loader -> engine.generate vs HF generate.

The full serving slice (real weights, paged KV, continuous batching, on-device
sampling) must reproduce HuggingFace greedy decoding token-for-token.
"""

import numpy as np

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _build_engine(cfg, ckpt, **sched):
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(
            max_batch_size=4, max_seq_len=256, prefill_buckets=(16, 64),
            **sched,
        ),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(model, weights, econf)


def _hf_greedy(ckpt, prompt, n):
    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(ckpt, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        out = m.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )
    return out[0].tolist()[len(prompt):]


def test_engine_matches_hf_greedy(tmp_path):
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(
        str(tmp_path / "m"), cfg,
        extra_config={"architectures": ["Qwen2ForCausalLM"]},
    )
    eng = _build_engine(cfg, ckpt)
    prompt = [1, 5, 9, 42, 7]
    n = 12
    expect = _hf_greedy(ckpt, prompt, n)
    s = eng.generate(prompt, GenerateConfig(
        max_new_tokens=n, do_sample=False, ignore_eos=True))
    assert s.output_token_ids == expect

    # prefix-cache path: same prompt again must also match (reused KV blocks)
    s2 = eng.generate(prompt + [100, 3], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True))
    expect2 = _hf_greedy(ckpt, prompt + [100, 3], 6)
    assert s2.output_token_ids == expect2
    assert s2.reuse_len > 0  # blocks from s actually reused


def test_engine_batched_matches_sequential(tmp_path):
    cfg = tiny_config("qwen3")
    ckpt = write_fake_checkpoint(str(tmp_path / "m3"), cfg)
    eng = _build_engine(cfg, ckpt)
    prompts = [[1, 5, 9], [42, 7], [100, 3, 55, 8]]
    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False, ignore_eos=True)

    seq_outputs = []
    for p in prompts:
        eng2 = _build_engine(tiny_config("qwen3"), ckpt)
        seq_outputs.append(eng2.generate(p, gc()).output_token_ids)

    streams = [eng.enqueue(p, gc()) for p in prompts]
    for _ in range(100):
        if all(s.is_finished() for s in streams):
            break
        eng.step()
    for s, expect in zip(streams, seq_outputs):
        assert s.output_token_ids == expect

    # 2-stream admission exercises the n_pad=2 pair-pack prefill program
    # ([2,T] rows + rows=2 first-sample path), which 3 streams skip by
    # padding straight to PREFILL_PACK=4 (ADVICE r3)
    eng4 = _build_engine(tiny_config("qwen3"), ckpt)
    streams2 = [eng4.enqueue(p, gc()) for p in prompts[:2]]
    for _ in range(100):
        if all(s.is_finished() for s in streams2):
            break
        eng4.step()
    for s, expect in zip(streams2, seq_outputs[:2]):
        assert s.output_token_ids == expect


def test_fp8_kv_cache_quality(tmp_path):
    """fp8 KV cache must generate nearly the same tokens as fp32 KV
    (reference: fp8 kv cache option, KVCacheConfig)."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "f8"), cfg)

    def build(kv_dtype):
        c = tiny_config("qwen2")
        c.dtype = "float32"
        weights = CheckpointLoader(c).load(ckpt)
        model = create_model(c)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=256,
                                      prefill_buckets=(16, 64)),
        )
        econf.quant.kv_cache_dtype = kv_dtype
        return LlmEngine(model, weights, econf)

    prompt = [1, 5, 9, 42, 7]
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False, ignore_eos=True)
    ref = build("float32").generate(prompt, gc()).output_token_ids
    fp8 = build("fp8").generate(prompt, gc()).output_token_ids
    # tiny random model: tolerate small divergence tail after many steps
    agree = sum(a == b for a, b in zip(ref, fp8))
    assert agree >= len(ref) - 2, (ref, fp8)


def test_int8_kv_cache_quality(tmp_path):
    """int8 KV cache (per-slot, per-head scales) must generate nearly the same
    tokens as fp32 KV (reference: int8 KV cache, KVCacheConfig)."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "i8"), cfg)

    def build(kv_dtype):
        c = tiny_config("qwen2")
        c.dtype = "float32"
        weights = CheckpointLoader(c).load(ckpt)
        model = create_model(c)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=256,
                                      prefill_buckets=(16, 64)),
        )
        econf.quant.kv_cache_dtype = kv_dtype
        return LlmEngine(model, weights, econf)

    prompt = [1, 5, 9, 42, 7]
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False, ignore_eos=True)
    ref = build("float32").generate(prompt, gc()).output_token_ids
    i8 = build("int8").generate(prompt, gc()).output_token_ids
    agree = sum(a == b for a, b in zip(ref, i8))
    assert agree >= len(ref) - 2, (ref, i8)


def test_int8_kv_deferred_writes_quality(tmp_path):
    """int8 KV + deferred decode writes (one batched quantize+scatter per
    step, bf16 current token folded in attention) must track the in-layer
    int8 path closely (outputs may differ by the current token's quant error
    only, so compare both against the fp32 baseline)."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "i8d"), cfg)

    def build(kv_dtype, defer):
        c = tiny_config("qwen2")
        c.dtype = "float32"
        weights = CheckpointLoader(c).load(ckpt)
        model = create_model(c)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=256,
                                      prefill_buckets=(16, 64),
                                      defer_kv_writes=defer),
        )
        econf.quant.kv_cache_dtype = kv_dtype
        return LlmEngine(model, weights, econf)

    prompt = [1, 5, 9, 42, 7]
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False,
                                ignore_eos=True)
    ref = build("float32", False).generate(prompt, gc()).output_token_ids
    eng = build("int8", True)
    assert eng._defer_decode
    i8d = eng.generate(prompt, gc()).output_token_ids
    agree = sum(a == b for a, b in zip(ref, i8d))
    assert agree >= len(ref) - 2, (ref, i8d)


def test_int8_kv_attention_accuracy():
    """Dequantized int8 paged attention stays close to the fp32 reference."""
    import numpy as np
    from rtp_llm_tpu.ops.attention.ref import paged_attention_ref
    from rtp_llm_tpu.ops.kv_cache import quantize_kv

    rng = np.random.default_rng(0)
    b, hkv, hq, d, bs, nb = 2, 2, 4, 16, 4, 8
    ns = nb * bs
    kv_lens = jnp.asarray([9, 14], jnp.int32)
    bt = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 2]], jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
    k_rows = jnp.asarray(rng.standard_normal((ns, hkv, d)), jnp.float32)
    v_rows = jnp.asarray(rng.standard_normal((ns, hkv, d)), jnp.float32)

    expect = paged_attention_ref(
        q, k_rows.reshape(ns, -1), v_rows.reshape(ns, -1), bt, kv_lens,
        kv_lens - 1, 0.25, block_size=bs)
    kq, ks, vq, vs = quantize_kv(k_rows, v_rows)
    got = paged_attention_ref(
        q, kq, vq, bt, kv_lens, kv_lens - 1, 0.25, block_size=bs,
        k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=0.1, atol=0.05)


def test_no_repeat_ngram_matches_hf(tmp_path):
    """Greedy generation with no_repeat_ngram_size must match HF transformers
    token-for-token (reference: banRepeatNgram.cu sampler stage)."""
    import torch
    from transformers import AutoModelForCausalLM

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "nrn"), cfg)

    prompt = [1, 5, 9, 5, 9, 7]
    hf = AutoModelForCausalLM.from_pretrained(ckpt, torch_dtype=torch.float32)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]), max_new_tokens=12, do_sample=False,
            no_repeat_ngram_size=2, pad_token_id=0, eos_token_id=None,
        )[0, len(prompt):].tolist()

    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=256,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)
    out = eng.generate(prompt, GenerateConfig(
        max_new_tokens=12, do_sample=False, ignore_eos=True,
        no_repeat_ngram_size=2,
    )).output_token_ids
    assert out == hf_out


def test_logit_bias(tmp_path):
    """OpenAI logit_bias: +100 forces a token everywhere, -100 bans one
    (applied on-device at the first sample and every decode step)."""
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "lb"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)
    prompt = [1, 5, 9, 42, 7]

    out = eng.generate(prompt, GenerateConfig(
        max_new_tokens=5, do_sample=False, ignore_eos=True,
        logit_bias={"77": 100.0},
    )).output_token_ids
    assert out == [77] * 5  # +100 dominates every step

    base = eng.generate(prompt, GenerateConfig(
        max_new_tokens=5, do_sample=False, ignore_eos=True,
    )).output_token_ids
    banned = eng.generate(prompt, GenerateConfig(
        max_new_tokens=5, do_sample=False, ignore_eos=True,
        logit_bias={str(base[0]): -100.0},
    )).output_token_ids
    assert banned[0] != base[0]


def test_scan_layers_matches_unrolled(tmp_path, monkeypatch):
    """Scan-over-layers (compile-time optimization, llama_family.forward)
    must be token-exact vs the unrolled layer loop, dense and MoE."""
    import os

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model

    for kind in ("qwen2", "qwen2_moe"):
        cfg = tiny_config(kind)
        cfg.dtype = "float32"
        ckpt = write_fake_checkpoint(str(tmp_path / kind), cfg)
        outs = {}
        for mode in ("scan", "unrolled"):
            if mode == "unrolled":
                monkeypatch.setenv("RTP_NO_SCAN_LAYERS", "1")
            else:
                monkeypatch.delenv("RTP_NO_SCAN_LAYERS", raising=False)
            cfg2 = tiny_config(kind)
            cfg2.dtype = "float32"
            econf = EngineConfig(
                cache=CacheConfig(block_size=4, test_num_blocks=64),
                scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                          prefill_buckets=(16,)))
            econf.quant.kv_cache_dtype = "float32"
            eng = LlmEngine(create_model(cfg2),
                            CheckpointLoader(cfg2).load(ckpt), econf)
            outs[mode] = eng.generate(
                [1, 5, 9, 42],
                GenerateConfig(max_new_tokens=8, do_sample=False,
                               ignore_eos=True)).output_token_ids
        assert outs["scan"] == outs["unrolled"], kind
