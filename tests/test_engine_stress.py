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
