"""Sliding-window KV block recycling (uniform-SWA models, mistral-style).

Reference analog: the hybrid SWA cache pools (cpp/cache/) — KV memory for
sliding-window layers is bounded by the window, not the sequence length.
Here the pool stays unified; a stream reuses its OWN physical blocks once
they fall wholly below the attention window (kernels only ever read masked
rows from them), so steady-state footprint is ~window tokens per stream.
"""

import numpy as np

from rtp_llm_tpu.cache.kv_cache_manager import KVCacheManager
from rtp_llm_tpu.config.engine_config import (
    CacheConfig, EngineConfig, SchedulerConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def test_extend_recycles_own_blocks():
    mgr = KVCacheManager(num_blocks=32, block_size=4, backend="python",
                         enable_prefix_cache=False, sliding_window_tokens=8)
    assert mgr.swa_keep == 4  # ceil(8/4) + 2
    initial_free = mgr.pool.free_blocks
    a = mgr.allocate(list(range(8)))  # 2 blocks
    used0 = mgr.pool.used_blocks
    # grow far past the window: physical footprint must stop at swa_keep
    for total in range(9, 60):
        assert mgr.extend(a, total)
    assert len(set(a.blocks)) <= mgr.swa_keep
    assert mgr.pool.used_blocks <= used0 + mgr.swa_keep
    assert a.recycled
    # the logical list is a ring with period swa_keep past the start
    for j in range(mgr.swa_keep, len(a.blocks)):
        assert a.blocks[j] == a.blocks[j - mgr.swa_keep]
    free_before = mgr.pool.free_blocks
    mgr.free(a)
    # dedup: every phys block freed exactly once
    assert mgr.pool.free_blocks == initial_free
    assert free_before < initial_free


def test_shrink_sliding_releases_prefill_tail():
    mgr = KVCacheManager(num_blocks=64, block_size=4, backend="python",
                         enable_prefix_cache=False, sliding_window_tokens=8)
    initial_free = mgr.pool.free_blocks
    a = mgr.allocate(list(range(40)))  # 10 blocks for a long prompt
    assert mgr.pool.used_blocks == 10
    changed = mgr.shrink_sliding(a, 41)
    assert changed
    # keep the last swa_keep blocks; earlier entries repoint at a live block
    assert mgr.pool.used_blocks == mgr.swa_keep
    assert len(a.blocks) == 10
    live = set(a.blocks[10 - mgr.swa_keep:])
    assert all(b in live for b in a.blocks[:10 - mgr.swa_keep])
    mgr.free(a)
    assert mgr.pool.free_blocks == initial_free


def _build(ckpt, recycle: bool, num_blocks=256):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    cfg.sliding_window = 8
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=num_blocks,
                          enable_prefix_cache=not recycle,
                          swa_recycle=recycle),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=256,
                                  prefill_buckets=(16, 32)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_recycled_generation_matches_unrecycled(tmp_path):
    """The window masks exactly the positions whose blocks get recycled, so
    generations must be IDENTICAL with and without recycling."""
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    gc = lambda: GenerateConfig(max_new_tokens=24, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3, 11, 2, 8, 4, 6, 10, 12, 14]

    plain = _build(ckpt, recycle=False)
    assert plain.cache_mgr.swa_tokens == 0
    want = plain.generate(prompt, gc()).output_token_ids

    rec = _build(ckpt, recycle=True)
    assert rec.cache_mgr.swa_tokens == 8
    got = rec.generate(prompt, gc()).output_token_ids
    assert got == want


def test_recycled_footprint_bounded(tmp_path):
    """A long generation in a small pool only fits WITH recycling."""
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    # pool of 8 blocks = 32 tokens; generate 60 tokens total
    eng = _build(ckpt, recycle=True, num_blocks=8)
    gc = GenerateConfig(max_new_tokens=52, do_sample=False, ignore_eos=True)
    s = eng.generate([1, 5, 9, 42, 7, 3, 11, 2], gc)
    assert len(s.output_token_ids) == 52
    assert eng.cache_mgr.pool.used_blocks <= eng.cache_mgr.swa_keep
    # and the same workload WITHOUT recycling preempts forever / cannot
    # finish in-pool: its peak estimate alone exceeds the pool
    plain = _build(ckpt, recycle=False, num_blocks=8)
    need = plain.cache_mgr.estimate_peak_blocks(8, 52)
    assert need > 8
