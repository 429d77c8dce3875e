"""PD disaggregation tests: prefill-instance KV export -> decode-instance
preloaded enqueue must reproduce the fused engine's output exactly
(reference: PrefillRpcServer/DecodeRpcServer + cache store, SURVEY.md §3.4)."""

import numpy as np
import pytest

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _engine(ckpt, model_type="qwen2", kv_dtype="float32"):
    cfg = tiny_config(model_type)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = kv_dtype
    return LlmEngine(model, weights, econf)


@pytest.mark.parametrize("model_type", ["qwen2", "deepseek_v3"])
def test_pd_split_matches_fused(tmp_path, model_type):
    ckpt = write_fake_checkpoint(str(tmp_path / model_type),
                                 tiny_config(model_type))
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]

    fused = _engine(ckpt, model_type).generate(prompt, gc()).output_token_ids

    prefill_eng = _engine(ckpt, model_type)   # prefill instance
    decode_eng = _engine(ckpt, model_type)    # decode instance
    tok, lp, kv_rows = prefill_eng.prefill_only(prompt, gc())
    assert kv_rows.shape[-2] == len(prompt)
    stream = decode_eng.enqueue_preloaded(prompt, tok, kv_rows, gc(),
                                          first_logprob=lp)
    for _ in range(40):
        if stream.is_finished():
            break
        decode_eng.step()
    assert stream.output_token_ids == fused


def test_pd_blocks_released(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "pdrel"), tiny_config("qwen2"))
    eng = _engine(ckpt)
    eng.cache_mgr.prefix_cache = None  # isolate refcounting
    free0 = eng.cache_mgr.pool.free_blocks
    tok, lp, kv = eng.prefill_only([1, 2, 3, 4, 5])
    assert eng.cache_mgr.pool.free_blocks == free0

    dec = _engine(ckpt)
    dec.cache_mgr.prefix_cache = None
    free1 = dec.cache_mgr.pool.free_blocks
    s = dec.enqueue_preloaded([1, 2, 3, 4, 5], tok, kv,
                              GenerateConfig(max_new_tokens=3, do_sample=False,
                                             ignore_eos=True),)
    for _ in range(20):
        if s.is_finished():
            break
        dec.step()
    assert s.is_finished()
    assert dec.cache_mgr.pool.free_blocks == free1


@pytest.mark.parametrize("kv_dtype", ["float32", "int8"])
def test_pd_http_roundtrip(tmp_path, kv_dtype):
    """Full HTTP plane: prefill app (with forwarder) -> decode app
    (/remote_generate), both over live engines. int8 exercises the
    multi-segment (data + scale) wire framing."""
    import asyncio

    asyncio.run(_pd_http(tmp_path, kv_dtype))


async def _pd_http(tmp_path, kv_dtype="float32"):
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.frontend.openai_api import OpenAIApp
    from rtp_llm_tpu.frontend.pd_routes import DecodeRole, PrefillForwarder
    from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_tokenizer
    from rtp_llm_tpu.server.engine_runner import EngineRunner

    ckpt = write_fake_checkpoint(str(tmp_path / "pd"), tiny_config("qwen2"))
    write_fake_tokenizer(ckpt, 128)
    tok = TokenizerFactory.create(ckpt)

    fused_out = _engine(ckpt, kv_dtype=kv_dtype).generate(
        [1, 5, 9, 42], GenerateConfig(max_new_tokens=6, do_sample=False,
                                      ignore_eos=True)
    ).output_token_ids

    decode_eng = _engine(ckpt, kv_dtype=kv_dtype)
    decode_runner = EngineRunner(decode_eng).start()
    decode_api = OpenAIApp(decode_runner, tok, model_name="decode")
    decode_app = decode_api.build_app()
    DecodeRole(decode_runner).add_routes(decode_app)
    decode_server = TestServer(decode_app)
    await decode_server.start_server()

    prefill_eng = _engine(ckpt, kv_dtype=kv_dtype)
    prefill_runner = EngineRunner(prefill_eng).start()
    fwd = PrefillForwarder(
        prefill_eng, f"{decode_server.host}:{decode_server.port}"
    )
    prefill_api = OpenAIApp(prefill_runner, tok, model_name="prefill",
                            pd_forwarder=fwd)
    client = TestClient(TestServer(prefill_api.build_app()))
    await client.start_server()
    try:
        r = await client.post("/v1/completions", json={
            "prompt": [1, 5, 9, 42], "max_tokens": 6, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200
        body = await r.json()
        text = body["choices"][0]["text"]
        expect_text = tok.decode(fused_out, skip_special_tokens=True)
        assert text == expect_text
        assert body["usage"]["completion_tokens"] == len(fused_out)
    finally:
        await client.close()
        await decode_server.close()
        if fwd._session:
            await fwd._session.close()
        prefill_runner.stop()
        decode_runner.stop()


def test_pd_int8_kv_roundtrip(tmp_path):
    """PD transfer with an int8 KV cache: the exported rows are a pytree
    (data + scales) and must reproduce the fused int8 engine's output."""
    ckpt = write_fake_checkpoint(str(tmp_path / "pdint8"), tiny_config("qwen2"))
    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]

    fused = _engine(ckpt, kv_dtype="int8").generate(
        prompt, gc()).output_token_ids

    tok, lp, kv_rows = _engine(ckpt, kv_dtype="int8").prefill_only(prompt, gc())
    assert isinstance(kv_rows, dict)
    assert kv_rows["data"].dtype == np.int8
    assert kv_rows["data"].shape[-2] == len(prompt)

    dec = _engine(ckpt, kv_dtype="int8")
    stream = dec.enqueue_preloaded(prompt, tok, kv_rows, gc(),
                                   first_logprob=lp)
    for _ in range(40):
        if stream.is_finished():
            break
        dec.step()
    assert stream.output_token_ids == fused


def test_pd_split_matches_fused_dsa(tmp_path):
    """PD over a DeepSeek-V3.2 DSA model: the {latent, idx_k} cache pytree
    transfers per-slot rows across the split (VERDICT r3 missing #4
    carve-out lift)."""
    cfg = tiny_config("deepseek_v3")
    cfg.dtype = "float32"
    cfg.indexer_topk = 24
    cfg.indexer_head_dim = 16
    cfg.indexer_n_heads = 4
    ckpt = write_fake_checkpoint(str(tmp_path / "dsa"), cfg)

    def eng():
        c = tiny_config("deepseek_v3")
        c.dtype = "float32"
        c.indexer_topk = 24
        c.indexer_head_dim = 16
        c.indexer_n_heads = 4
        weights = CheckpointLoader(c).load(ckpt)
        model = create_model(c)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                      prefill_buckets=(16, 64)),
        )
        econf.quant.kv_cache_dtype = "float32"
        return LlmEngine(model, weights, econf)

    gc = lambda: GenerateConfig(max_new_tokens=8, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]
    fused_eng = eng()
    assert fused_eng.model.use_dsa and isinstance(fused_eng.kv, dict)
    fused = fused_eng.generate(prompt, gc()).output_token_ids

    tok, lp, kv_rows = eng().prefill_only(prompt, gc())
    assert isinstance(kv_rows, dict) and set(kv_rows) == {"latent", "idx_k"}
    decode_eng = eng()
    stream = decode_eng.enqueue_preloaded(prompt, tok, kv_rows, gc(),
                                          first_logprob=lp)
    for _ in range(40):
        if stream.is_finished():
            break
        decode_eng.step()
    assert stream.output_token_ids == fused


def test_pd_decode_entrance_http(tmp_path):
    """Decode-entrance inversion over the HTTP plane (reference:
    DECODE_ENTRANCE=1, docs/backend/pd_entrance_transpose.md): the DECODE
    instance is the request entry — it pulls prefill KV from the passive
    /prefill_kv endpoint and streams tokens straight to the client, no
    prefill relay."""
    import asyncio

    asyncio.run(_pd_decode_entrance(tmp_path))


async def _pd_decode_entrance(tmp_path):
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.frontend.openai_api import OpenAIApp
    from rtp_llm_tpu.frontend.pd_routes import (
        DecodeEntranceBackend, PrefillRole,
    )
    from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_tokenizer
    from rtp_llm_tpu.server.engine_runner import EngineRunner

    ckpt = write_fake_checkpoint(str(tmp_path / "pdt"), tiny_config("qwen2"))
    write_fake_tokenizer(ckpt, 128)
    tok = TokenizerFactory.create(ckpt)

    fused_out = _engine(ckpt).generate(
        [1, 5, 9, 42], GenerateConfig(max_new_tokens=6, do_sample=False,
                                      ignore_eos=True)
    ).output_token_ids

    # passive prefill instance: only /prefill_kv
    prefill_eng = _engine(ckpt)
    prefill_runner = EngineRunner(prefill_eng).start()
    prefill_app = OpenAIApp(prefill_runner, tok,
                            model_name="prefill").build_app()
    PrefillRole(prefill_runner).add_routes(prefill_app)
    prefill_server = TestServer(prefill_app)
    await prefill_server.start_server()

    # decode instance IS the entry
    decode_eng = _engine(ckpt)
    decode_runner = EngineRunner(decode_eng).start()
    backend = DecodeEntranceBackend(
        decode_eng, decode_runner,
        f"{prefill_server.host}:{prefill_server.port}")
    decode_api = OpenAIApp(decode_runner, tok, model_name="decode",
                           pd_forwarder=backend)
    client = TestClient(TestServer(decode_api.build_app()))
    await client.start_server()
    try:
        # non-streaming + streaming both ride the inverted path
        r = await client.post("/v1/completions", json={
            "prompt": [1, 5, 9, 42], "max_tokens": 6, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert r.status == 200
        body = await r.json()
        assert body["choices"][0]["text"] == tok.decode(
            fused_out, skip_special_tokens=True)
        assert body["usage"]["completion_tokens"] == len(fused_out)

        r = await client.post("/v1/completions", json={
            "prompt": [1, 5, 9, 42], "max_tokens": 6, "temperature": 0.0,
            "ignore_eos": True, "stream": True,
        })
        assert r.status == 200
        text = ""
        async for line in r.content:
            line = line.decode().strip()
            if line.startswith("data:") and "[DONE]" not in line:
                import json as _json

                text += _json.loads(line[5:])["choices"][0]["text"]
        assert text == tok.decode(fused_out, skip_special_tokens=True)
    finally:
        await client.close()
        await prefill_server.close()
        if backend._session:
            await backend._session.close()
        prefill_runner.stop()
        decode_runner.stop()
