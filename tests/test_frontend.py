"""Frontend tests: incremental detokenizer, chat renderer, and a full HTTP
smoke test of the OpenAI app over a real engine on a fake checkpoint
(reference analog: rtp_llm/test/frontend_test/ + smoke/entry.py)."""

import asyncio
import json
import os

import pytest

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.engine.engine import LlmEngine
from rtp_llm_tpu.frontend.chat_renderer import create_renderer
from rtp_llm_tpu.frontend.openai_api import OpenAIApp
from rtp_llm_tpu.frontend.token_processor import IncrementalDetokenizer
from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import (
    tiny_config,
    write_fake_checkpoint,
    write_fake_tokenizer,
)
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.server.engine_runner import EngineRunner


@pytest.fixture(scope="module")
def fake_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("fakemodel"))
    cfg = tiny_config("qwen2")
    write_fake_checkpoint(path, cfg)
    write_fake_tokenizer(path, cfg.vocab_size)
    return path


@pytest.fixture(scope="module")
def tokenizer(fake_dir):
    return TokenizerFactory.create(fake_dir)


class TestDetokenizer:
    def test_incremental_equals_full(self, tokenizer):
        ids = tokenizer.encode("w1 w2 w3 w4 w5", add_special_tokens=False)
        d = IncrementalDetokenizer(tokenizer)
        text = ""
        for t in ids:
            out, _ = d.push([t])
            text += out
        text += d.finalize()
        assert text == tokenizer.decode(ids, skip_special_tokens=True)

    def test_stop_string_never_leaks(self, tokenizer):
        ids = tokenizer.encode("w1 w2 w3 w4", add_special_tokens=False)
        d = IncrementalDetokenizer(tokenizer, stop_strings=["w3"])
        text, hit = "", False
        for t in ids:
            out, h = d.push([t])
            text += out
            if h:
                hit = True
                break
        assert hit
        assert "w3" not in text
        assert "w2" in text

    def test_special_tokens_skipped(self, tokenizer):
        eos = tokenizer.eos_token_id
        ids = tokenizer.encode("w1 w2", add_special_tokens=False) + [eos]
        d = IncrementalDetokenizer(tokenizer)
        text = ""
        for t in ids:
            out, _ = d.push([t])
            text += out
        text += d.finalize()
        assert "<|im_end|>" not in text


class TestRenderer:
    def test_chat_template_applied(self, tokenizer):
        r = create_renderer(tokenizer, "qwen2")
        out = r.render([
            {"role": "user", "content": "w1 w2"},
        ])
        im_start = tokenizer.convert_tokens_to_ids("<|im_start|>")
        im_end = tokenizer.convert_tokens_to_ids("<|im_end|>")
        assert out.token_ids[0] == im_start
        assert im_end in out.token_ids
        assert out.token_ids[-1] == im_start  # generation prompt
        assert im_end in out.stop_token_ids


def _build_app(fake_dir):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    # use the tokenizer's im_end as eos so generation can stop naturally
    cfg.eos_token_id = [cfg.vocab_size - 1]
    weights = CheckpointLoader(cfg).load(fake_dir)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=128),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    engine = LlmEngine(model, weights, econf)
    runner = EngineRunner(engine).start()
    tok = TokenizerFactory.create(fake_dir)
    api = OpenAIApp(runner, tok, model_name="tiny-qwen2", model_type="qwen2")
    return api, runner


def test_http_roundtrip(fake_dir):
    asyncio.run(_http_roundtrip(fake_dir))


async def _http_roundtrip(fake_dir):
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            # health + models + worker_status
            r = await client.get("/health")
            assert r.status == 200
            r = await client.get("/v1/models")
            assert (await r.json())["data"][0]["id"] == "tiny-qwen2"
            r = await client.get("/worker_status")
            ws = await r.json()
            assert ws["alive"] and ws["kv_total_blocks"] == 128

            # tokenize
            r = await client.post("/tokenizer/encode", json={"prompt": "w1 w2"})
            assert (await r.json())["token_ids"] == [1, 2]

            # non-streaming chat
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w1 w2 w3"}],
                "max_tokens": 8, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "chat.completion"
            assert body["usage"]["completion_tokens"] >= 1
            assert isinstance(body["choices"][0]["message"]["content"], str)

            # streaming chat
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w5 w6"}],
                "max_tokens": 6, "temperature": 0.0, "stream": True,
            })
            assert r.status == 200
            raw = (await r.read()).decode()
            events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            assert events[-1] == "[DONE]"
            chunks = [json.loads(e) for e in events[:-1]]
            assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")

            # completions endpoint with token-id prompt
            r = await client.post("/v1/completions", json={
                "prompt": [1, 2, 3], "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "text_completion"
        finally:
            await client.close()
    finally:
        runner.stop()


def test_embeddings_endpoint(fake_dir):
    asyncio.run(_embeddings_roundtrip(fake_dir))


async def _embeddings_roundtrip(fake_dir):
    import numpy as np
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings", json={
                "input": ["w1 w2 w3", "w4 w5"],
            })
            assert r.status == 200
            body = await r.json()
            assert len(body["data"]) == 2
            v0 = np.asarray(body["data"][0]["embedding"])
            v1 = np.asarray(body["data"][1]["embedding"])
            assert v0.shape == (64,)
            np.testing.assert_allclose(np.linalg.norm(v0), 1.0, rtol=1e-5)
            # same input embeds identically, different inputs differ
            r2 = await client.post("/v1/embeddings", json={"input": "w1 w2 w3"})
            v0b = np.asarray((await r2.json())["data"][0]["embedding"])
            np.testing.assert_allclose(v0, v0b, rtol=1e-5)
            assert np.abs(v0 - v1).max() > 1e-3
            # mean pooling differs from last pooling
            r3 = await client.post("/v1/embeddings", json={
                "input": "w1 w2 w3", "pooling": "mean"})
            vm = np.asarray((await r3.json())["data"][0]["embedding"])
            assert np.abs(vm - v0).max() > 1e-4
            # KV pool not leaked
            eng = runner.engine
            assert eng.cache_mgr.pool.used_blocks == 0
        finally:
            await client.close()
    finally:
        runner.stop()


def test_n_return_sequences(fake_dir):
    asyncio.run(_n_roundtrip(fake_dir))


async def _n_roundtrip(fake_dir):
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w1 w2"}],
                "max_tokens": 5, "n": 3, "temperature": 0.9, "seed": 1,
            })
            assert r.status == 200
            body = await r.json()
            assert len(body["choices"]) == 3
            assert [c["index"] for c in body["choices"]] == [0, 1, 2]
            assert body["usage"]["completion_tokens"] >= 3
        finally:
            await client.close()
    finally:
        runner.stop()


def test_pause_update_weights_restart(fake_dir, tmp_path):
    asyncio.run(_rl_roundtrip(fake_dir, tmp_path))


async def _rl_roundtrip(fake_dir, tmp_path):
    import numpy as np
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w1 w2"}],
                "max_tokens": 4, "temperature": 0.0,
            })
            before = (await r.json())["choices"][0]["message"]["content"]

            assert (await client.post("/pause")).status == 200
            assert runner.paused

            # different weights (new seed), same architecture
            ckpt2 = write_fake_checkpoint(
                str(tmp_path / "new"), tiny_config("qwen2"), seed=99
            )
            r = await client.post("/update_weights", json={"model_path": ckpt2})
            assert r.status == 200

            assert (await client.post("/restart")).status == 200
            assert not runner.paused
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w1 w2"}],
                "max_tokens": 4, "temperature": 0.0,
            })
            after = (await r.json())["choices"][0]["message"]["content"]
            assert after != before  # new weights actually serving
        finally:
            await client.close()
    finally:
        runner.stop()


def test_logprobs_and_cache_status(fake_dir):
    asyncio.run(_logprobs_roundtrip(fake_dir))


async def _logprobs_roundtrip(fake_dir):
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w1 w2"}],
                "max_tokens": 4, "temperature": 0.0, "logprobs": True,
            })
            body = await r.json()
            lp = body["choices"][0]["logprobs"]
            assert lp and len(lp["content"]) >= 1
            assert all(e["logprob"] <= 0 for e in lp["content"])

            r = await client.post("/v1/completions", json={
                "prompt": [1, 2], "max_tokens": 3, "temperature": 0.0,
                "logprobs": True, "ignore_eos": True,
            })
            body = await r.json()
            lp = body["choices"][0]["logprobs"]
            assert len(lp["tokens"]) == 3 and len(lp["token_logprobs"]) == 3

            r = await client.get("/cache_status")
            cs = await r.json()
            assert cs["total_blocks"] == 128 and cs["block_size"] == 4
            assert cs["backend"] in ("python", "native")
        finally:
            await client.close()
    finally:
        runner.stop()


def test_streaming_stop_string_finishes_stream(fake_dir):
    asyncio.run(_streaming_stop_string(fake_dir))


async def _streaming_stop_string(fake_dir):
    """A stop word hit must (a) deliver the content BEFORE the stop word,
    (b) close with finish_reason 'stop', and (c) finish the engine stream so
    decode capacity is freed (advisor round-1 finding)."""
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            # discover the deterministic output first
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w5 w6"}],
                "max_tokens": 8, "temperature": 0.0,
            })
            full = (await r.json())["choices"][0]["message"]["content"]
            words = full.split()
            assert len(words) >= 3, full
            stop_word = words[2]
            prefix = full[: full.find(stop_word)]

            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "w5 w6"}],
                "max_tokens": 8, "temperature": 0.0, "stream": True,
                "stop": [stop_word],
            })
            raw = (await r.read()).decode()
            events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            assert events[-1] == "[DONE]"
            chunks = [json.loads(e) for e in events[:-1]]
            text = "".join(
                c["choices"][0]["delta"].get("content", "") for c in chunks
            )
            assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
            assert text == prefix, (text, prefix, full)
        finally:
            await client.close()
    finally:
        runner.stop()


def test_downstream_heads_sparse_colbert_rerank(fake_dir, tmp_path):
    """Sparse/colbert embeddings + rerank/classifier heads over HTTP
    (reference: models/downstream_modules/ — BGE-M3 sparse/colbert,
    cross-encoder reranker, sequence classifier)."""
    asyncio.run(_downstream_heads(fake_dir, tmp_path))


async def _downstream_heads(fake_dir, tmp_path):
    import numpy as np
    import torch
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    h = runner.engine.model.cfg.hidden_size
    # fake aux heads in the reference's on-disk formats
    heads_dir = str(tmp_path / "heads")
    import os as _os
    _os.makedirs(heads_dir, exist_ok=True)
    torch.save({"weight": torch.randn(1, h) * 0.1,
                "bias": torch.zeros(1)},
               _os.path.join(heads_dir, "sparse_linear.pt"))
    torch.save({"weight": torch.randn(8, h) * 0.1,
                "bias": torch.zeros(8)},
               _os.path.join(heads_dir, "colbert_linear.pt"))
    from rtp_llm_tpu.engine.embedding import load_downstream_heads

    api.model_path = heads_dir
    heads = load_downstream_heads(heads_dir)
    assert heads["sparse_linear"].shape == (h, 1)
    assert heads["colbert_linear"].shape == (h, 8)
    heads["classifier"] = np.random.default_rng(0).standard_normal(
        (h, 2)).astype(np.float32) * 0.1
    api._downstream_heads = heads  # classifier head injected for the test

    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/embeddings", json={
                "input": "w1 w2 w3", "embedding_type": "sparse"})
            assert r.status == 200
            d = (await r.json())["data"][0]
            assert d["embedding_type"] == "sparse"
            assert all(float(v) > 0 for v in d["embedding"].values())

            r = await client.post("/v1/embeddings/colbert",
                                  json={"input": "w1 w2 w3"})
            assert r.status == 200
            mat = (await r.json())["data"][0]["embedding"]
            assert len(mat) == 3 and len(mat[0]) == 8
            import math as _m
            n0 = _m.sqrt(sum(x * x for x in mat[0]))
            assert abs(n0 - 1.0) < 1e-3  # normalized per token

            r = await client.post("/v1/rerank", json={
                "query": "w1 w2", "documents": ["w3 w4", "w5"]})
            assert r.status == 200
            res = (await r.json())["results"]
            assert len(res) == 2
            assert res[0]["relevance_score"] >= res[1]["relevance_score"]
            assert all(0.0 <= x["relevance_score"] <= 1.0 for x in res)

            r = await client.post("/v1/classifier", json={"input": ["w1 w2"]})
            assert r.status == 200
            logits = (await r.json())["data"][0]["logits"]
            assert len(logits) == 2
        finally:
            await client.close()
    finally:
        runner.stop()


def test_streaming_num_return_sequences(fake_dir):
    asyncio.run(_streaming_fanout(fake_dir))


async def _streaming_fanout(fake_dir):
    """n>1 with stream=true: SSE chunks carry per-choice indices and every
    choice gets a finish_reason (reference: num_return_sequences streaming
    fanout)."""
    import json as _json

    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/completions", json={
                "prompt": "w1 w2 w3", "max_tokens": 4, "n": 3,
                "stream": True, "temperature": 0.0, "ignore_eos": True,
            })
            assert r.status == 200
            texts = {0: "", 1: "", 2: ""}
            finishes = {}
            done = False
            async for raw in r.content:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                if line[6:] == "[DONE]":
                    done = True
                    break
                d = _json.loads(line[6:])
                ch = d["choices"][0]
                texts[ch["index"]] += ch.get("text", "")
                if ch.get("finish_reason"):
                    finishes[ch["index"]] = ch["finish_reason"]
            assert done
            assert set(finishes) == {0, 1, 2}
            # greedy (temperature 0): all three choices agree and are nonempty
            assert texts[0] and texts[0] == texts[1] == texts[2]
        finally:
            await client.close()
    finally:
        runner.stop()


def test_calculate_loss_route(fake_dir):
    asyncio.run(_loss_roundtrip(fake_dir))


async def _loss_roundtrip(fake_dir):
    """completions with calculate_loss (reference: GenerateConfig.h:56):
    the non-streaming response carries the prompt NLL (1 = mean scalar,
    2 = per-token list)."""
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            r = await client.post("/v1/completions", json={
                "prompt": [1, 5, 9, 42, 7], "max_tokens": 2,
                "calculate_loss": 1, "ignore_eos": True,
            })
            assert r.status == 200
            body = await r.json()
            assert isinstance(body["loss"], float)
            r2 = await client.post("/v1/completions", json={
                "prompt": [1, 5, 9, 42, 7], "max_tokens": 2,
                "calculate_loss": 2, "ignore_eos": True,
            })
            body2 = await r2.json()
            assert isinstance(body2["loss"], list) and len(body2["loss"]) == 4
            import numpy as np

            assert abs(float(np.mean(body2["loss"])) - body["loss"]) < 1e-4
        finally:
            await client.close()
    finally:
        runner.stop()


def test_metrics_prometheus_and_gen_timeline(fake_dir, tmp_path):
    asyncio.run(_metrics_and_timeline(fake_dir, tmp_path))


async def _metrics_and_timeline(fake_dir, tmp_path):
    """GET /metrics serves Prometheus text (phase summaries, queue/cache
    gauges — VERDICT r3 missing #3) and ?format=json keeps the raw snapshot;
    a request with gen_timeline=N captures a per-request jax.profiler trace
    (missing #5)."""
    from aiohttp.test_utils import TestClient, TestServer

    api, runner = _build_app(fake_dir)
    try:
        client = TestClient(TestServer(api.build_app()))
        await client.start_server()
        try:
            from rtp_llm_tpu.config import runtime_flags

            # gen_timeline is operator-gated (ADVICE r4): without the opt-in
            # flag the request succeeds but no trace window opens
            tdir = str(tmp_path / "timeline")
            r = await client.post("/v1/completions", json={
                "prompt": "w0 w1", "max_tokens": 4,
                "extra_configs": {"gen_timeline": 2, "timeline_dir": tdir},
            })
            assert r.status == 200
            assert not os.path.isdir(tdir), "trace ran without operator opt-in"

            runtime_flags.set_flag("allow_client_timeline", True)
            runtime_flags.set_flag("timeline_root", str(tmp_path))
            try:
                r = await client.post("/v1/completions", json={
                    "prompt": "w1 w2 w3", "max_tokens": 6,
                    "extra_configs": {"gen_timeline": 2, "timeline_dir": tdir},
                })
                assert r.status == 200
            finally:
                runtime_flags.set_flag("allow_client_timeline", False)

            r = await client.get("/metrics")
            assert r.status == 200
            assert "text/plain" in r.headers["Content-Type"]
            text = await r.text()
            assert "rtp_engine_decode_ms" in text  # phase summary
            assert 'quantile="0.5"' in text
            assert "rtp_engine_kv_utilization" in text
            assert "rtp_engine_batch_occupancy" in text
            assert "rtp_engine_tokens_generated_total" in text
            assert "rtp_cache_prefill_context_tokens_total" in text

            r = await client.get("/metrics?format=json")
            snap = await r.json()
            assert "histograms" in snap and "counters" in snap

            # the per-request trace window must have produced a profile
            found = []
            for root, _dirs, files in os.walk(tdir):
                found += [f for f in files if f.endswith((".pb", ".json.gz",
                                                         ".trace.json.gz"))]
            assert found, f"no trace artifacts under {tdir}"
        finally:
            await client.close()
    finally:
        runner.stop()
