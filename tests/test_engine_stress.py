"""Engine stress: many concurrent streams, tiny KV pool, random aborts.

The properties serving depends on (reference: FIFOScheduler eviction +
NormalEngine loop invariants):
  * batching is DETERMINISTIC — every non-aborted stream produces exactly
    the tokens it would produce running alone, no matter how it was
    batched, preempted, or re-admitted;
  * preemption/eviction under KV pressure never deadlocks or corrupts;
  * aborted streams release their slots/blocks and never block the rest.
"""

import numpy as np

from rtp_llm_tpu.config.engine_config import (
    CacheConfig, EngineConfig, SchedulerConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _engine(ckpt, num_blocks, batch):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=num_blocks,
                          enable_prefix_cache=False),
        scheduler=SchedulerConfig(max_batch_size=batch, max_seq_len=96,
                                  prefill_buckets=(16, 32)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_stress_determinism_under_pressure(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    rng = np.random.default_rng(0)
    n_req = 24
    prompts = [list(rng.integers(1, 120, size=int(rng.integers(3, 20))))
               for _ in range(n_req)]
    new_tokens = [int(rng.integers(2, 24)) for _ in range(n_req)]
    gc = lambda i: GenerateConfig(max_new_tokens=new_tokens[i],
                                  do_sample=False, ignore_eos=True)

    # ground truth: each request alone in a roomy engine
    solo = _engine(ckpt, num_blocks=256, batch=2)
    want = [solo.generate(prompts[i], gc(i)).output_token_ids
            for i in range(n_req)]

    # tiny pool (forces admission waits + running-memory eviction), small
    # batch, random mid-flight aborts
    eng = _engine(ckpt, num_blocks=40, batch=4)
    streams = [eng.enqueue([int(t) for t in prompts[i]], gc(i))
               for i in range(n_req)]
    abort_at = {3: 2, 11: 1, 17: 4}  # stream idx -> abort after N steps
    steps = 0
    while any(not s.is_finished() for s in streams):
        eng.step()
        steps += 1
        for idx, when in abort_at.items():
            if steps == when and not streams[idx].is_finished():
                streams[idx].abort("client gone")
        assert steps < 2000, "engine stalled"
    eng._resolve_pending()

    ok = 0
    for i, s in enumerate(streams):
        if i in abort_at:
            continue  # aborted mid-flight: no output contract
        assert s.output_token_ids == want[i], f"stream {i} diverged"
        ok += 1
    assert ok == n_req - len(abort_at)
    # every slot and block released at the end
    assert all(sl is None for sl in eng.slots)
    used = eng.cache_mgr.pool.used_blocks
    assert used == 0, f"{used} blocks leaked"


def test_queue_overflow_aborts_cleanly(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    eng = _engine(ckpt, num_blocks=64, batch=2)
    eng.scheduler.config.max_queue_size = 4
    gc = GenerateConfig(max_new_tokens=4, do_sample=False, ignore_eos=True)
    streams = [eng.enqueue([1, 2, 3], gc) for _ in range(8)]
    overflowed = [s for s in streams if s.is_finished()]
    assert len(overflowed) == 4  # queue cap 4: the rest aborted on arrival
    while any(not s.is_finished() for s in streams):
        eng.step()
    eng._resolve_pending()
    survivors = [s for s in streams if s not in overflowed]
    assert all(len(s.output_token_ids) == 4 for s in survivors)


def test_sla_admission_guard_sheds_overload(tmp_path):
    """SchedulerConfig.ttft_slo_ms: with the queue projected past the bound,
    enqueue sheds with an 'overloaded' abort (counted in metrics) instead of
    queueing into multi-second TTFT (VERDICT r3 weak #7)."""
    import numpy as np

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
    from rtp_llm_tpu.utils.metrics import METRICS

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=256),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,), ttft_slo_ms=500),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)

    gc = lambda: GenerateConfig(max_new_tokens=32, do_sample=False,
                                ignore_eos=True)
    n0 = METRICS.snapshot()["counters"].get("scheduler.sla_rejections", 0)
    # flood: batch=2, so the queue backs up beyond a full batch with no
    # drain history -> projected wait = inf -> shed
    streams = [eng.enqueue([1, 5, 9], gc()) for _ in range(12)]
    shed = [s for s in streams if s.error
            and s.error.startswith("overloaded")]
    live = [s for s in streams if not s.error]
    assert shed, "overload must shed some requests"
    assert len(live) >= 2, "an admissible head of the queue must survive"
    assert METRICS.snapshot()["counters"][
        "scheduler.sla_rejections"] >= n0 + len(shed)
    # the live ones still complete
    for _ in range(300):
        if all(s.is_finished() for s in live):
            break
        eng.step()
    assert all(len(s.output_token_ids) == 32 for s in live)


def test_sla_guard_maps_to_http_429(tmp_path):
    import asyncio

    asyncio.run(_sla_http(tmp_path))


async def _sla_http(tmp_path):
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.frontend.openai_api import OpenAIApp
    from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint, write_fake_tokenizer,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.server.engine_runner import EngineRunner

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    write_fake_tokenizer(ckpt, 128)
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=256),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,), ttft_slo_ms=500),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)
    runner = EngineRunner(eng).start()
    # hold the engine loop so the queue cannot drain while we flood
    runner.pause()
    api = OpenAIApp(runner, TokenizerFactory.create(ckpt), model_name="sla")
    client = TestClient(TestServer(api.build_app()))
    await client.start_server()
    try:
        import asyncio as aio

        async def one():
            r = await client.post("/v1/completions", json={
                "prompt": "w1 w2", "max_tokens": 8, "temperature": 0.0,
                "ignore_eos": True})
            return r.status

        tasks = [aio.ensure_future(one()) for _ in range(12)]
        await aio.sleep(0.5)
        runner.resume()
        statuses = await aio.gather(*tasks)
        assert 429 in statuses, statuses
        assert 200 in statuses, statuses
    finally:
        await client.close()
        runner.stop()
