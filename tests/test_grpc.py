"""gRPC plane: streaming generation parity with the library engine
(reference: model_rpc gRPC servers, cpp/model_rpc/LocalRpcServer.cc)."""

import socket

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.server.engine_runner import EngineRunner
from rtp_llm_tpu.server.grpc_server import GrpcGenerateClient, start_grpc_server


def _engine(ckpt):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_grpc_pd_remote_generate(tmp_path):
    """Binary PD handoff over gRPC must match the fused engine exactly
    (reference: PrefillRpcServer -> DecodeRpcServer cache-store transfer)."""
    from rtp_llm_tpu.config.generate_config import GenerateConfig as GC

    ckpt = write_fake_checkpoint(str(tmp_path / "pd"), tiny_config("qwen2"))
    prompt = [1, 5, 9, 42, 7, 3]
    gc = lambda: GC(max_new_tokens=8, do_sample=False, ignore_eos=True)
    fused = _engine(ckpt).generate(prompt, gc()).output_token_ids

    prefill_eng = _engine(ckpt)
    tok, lp, kv_rows = prefill_eng.prefill_only(prompt, gc())

    runner = EngineRunner(_engine(ckpt)).start()
    port = _free_port()
    server = start_grpc_server(runner, port)
    client = GrpcGenerateClient(f"127.0.0.1:{port}")
    try:
        got = []
        for upd in client.remote_generate(
                prompt, tok, kv_rows,
                {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
                first_logprob=lp):
            got.extend(upd.tokens)
        assert got == fused
    finally:
        client.close()
        server.stop(grace=1)
        runner.stop()


def test_grpc_update_weights_and_cache_status(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "uw"), tiny_config("qwen2"))
    runner = EngineRunner(_engine(ckpt)).start()
    port = _free_port()
    server = start_grpc_server(runner, port)
    client = GrpcGenerateClient(f"127.0.0.1:{port}")
    try:
        st = client.cache_status()
        assert st["total_blocks"] == 64 and "version" in st
        diff = client.cache_status(from_version=0)
        assert "version" in diff

        client.update_weights(ckpt)  # same checkpoint: must succeed
        out = []
        for upd in client.generate([1, 5, 9], {"max_new_tokens": 4,
                                               "temperature": 0.0,
                                               "ignore_eos": True}):
            out.extend(upd.tokens)
        assert len(out) == 4

        try:
            client.update_weights(str(tmp_path / "missing"))
            raise AssertionError("expected failure for bad path")
        except RuntimeError as e:
            assert "update_weights failed" in str(e)
    finally:
        client.close()
        server.stop(grace=1)
        runner.stop()


def test_grpc_stream_roundtrip(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "g"), tiny_config("qwen2"))
    prompt = [1, 5, 9, 42]
    expect = _engine(ckpt).generate(prompt, GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
    )).output_token_ids

    runner = EngineRunner(_engine(ckpt)).start()
    port = _free_port()
    server = start_grpc_server(runner, port)
    client = GrpcGenerateClient(f"127.0.0.1:{port}")
    try:
        assert client.health()
        got, reasons = [], []
        for upd in client.generate(prompt, {"max_new_tokens": 6,
                                            "temperature": 0.0,
                                            "ignore_eos": True}):
            got.extend(upd.tokens)
            if upd.finished:
                reasons.append(upd.finish_reason)
        assert got == expect
        assert reasons == ["length"]
        ws = client.worker_status()
        assert ws["alive"] and ws["tokens_generated"] >= 5
    finally:
        client.close()
        server.stop(grace=1)
        runner.stop()
