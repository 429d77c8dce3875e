"""Host-memory KV tier: evicted prefix blocks spill to host RAM and restore
on later allocations (reference: memory-tier cache connector,
cache/connector/memory/ + KVCacheConnectorCoordinator)."""

import numpy as np

from rtp_llm_tpu.cache.host_tier import HostKVTier
from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.utils.metrics import METRICS


def test_host_tier_lru_bytes():
    tier = HostKVTier(capacity_bytes=100)
    a = np.zeros(40, np.int8)
    tier.put(1, a)
    tier.put(2, a)
    assert tier.used_bytes == 80 and len(tier) == 2
    tier.get(1)  # touch: 2 becomes LRU
    tier.put(3, a)  # evicts 2
    assert 2 not in tier and 1 in tier and 3 in tier
    tier.put(4, np.zeros(200, np.int8))  # larger than capacity: rejected
    assert 4 not in tier
    # pytree entries count all leaves
    tier2 = HostKVTier(100)
    tier2.put(9, {"data": a, "scale": a})
    assert tier2.used_bytes == 80


def _engine(ckpt, num_blocks, host_mb=0):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=num_blocks,
                          host_cache_mb=host_mb),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16, 32)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_evict_spill_and_restore(tmp_path):
    ckpt = write_fake_checkpoint(str(tmp_path / "ht"), tiny_config("qwen2"))
    gc = lambda n=6: GenerateConfig(max_new_tokens=n, do_sample=False,
                                    ignore_eos=True)
    prefix = [1, 5, 9, 42, 7, 3, 11, 2, 8, 4, 6, 10]  # 3 full blocks of 4

    # ground truth: no caches involved beyond a fresh engine
    fresh = _engine(ckpt, num_blocks=24)
    expect = fresh.generate(prefix + [13, 15], gc()).output_token_ids

    eng = _engine(ckpt, num_blocks=12, host_mb=64)  # small pool, host tier on
    eng.generate(prefix, gc(4))  # populates device prefix cache
    # churn with unrelated prompts until the prefix blocks are evicted
    for base in (20, 30, 40, 50):
        eng.generate([base + i for i in range(10)], gc(4))
    tier = eng.cache_mgr.host_tier
    assert len(tier) >= 3, "evicted prefix blocks should have spilled to host"

    before = METRICS.snapshot()["counters"].get(
        "cache.host_tier_restored_blocks", 0)
    out = eng.generate(prefix + [13, 15], gc()).output_token_ids
    restored = METRICS.snapshot()["counters"].get(
        "cache.host_tier_restored_blocks", 0) - before
    assert restored >= 1, "allocation should have restored host-tier blocks"
    assert out == expect


def test_disk_tier_lru_and_persistence(tmp_path):
    """Disk tier (reference: disk connector / 3FS backend): LRU by bytes,
    pytree round-trip, index survives a restart."""
    from rtp_llm_tpu.cache.host_tier import DiskKVTier

    d = str(tmp_path / "kv")
    tier = DiskKVTier(d, capacity_bytes=4096)
    a = np.arange(100, dtype=np.float32)  # 400B data (+npz overhead)
    tier.put(1, a)
    tier.put(2, {"data": a.astype(np.int8), "scale": a[:4]})
    assert 1 in tier and 2 in tier
    np.testing.assert_array_equal(tier.get(1), a)
    got = tier.get(2)
    assert set(got) == {"data", "scale"}
    np.testing.assert_array_equal(got["data"], a.astype(np.int8))

    # LRU eviction under the byte cap
    tier.get(1)  # touch
    for h in range(3, 12):
        tier.put(h, a)
    assert tier.used_bytes <= 4096
    assert 2 not in tier  # least-recent fell off

    # restart: a new instance re-indexes the directory
    tier2 = DiskKVTier(d, capacity_bytes=4096)
    assert len(tier2) == len(tier)
    assert 11 in tier2  # most recent entry survives the bounce
    np.testing.assert_array_equal(tier2.get(11), a)


def test_host_evictions_demote_to_disk(tmp_path):
    """TieredKVStore: host-LRU evictions land on disk and promote back on
    get (reference: KVCacheConnectorCoordinator chaining)."""
    from rtp_llm_tpu.cache.host_tier import DiskKVTier, TieredKVStore

    host = HostKVTier(capacity_bytes=100)
    disk = DiskKVTier(str(tmp_path / "d"), capacity_bytes=1 << 20)
    store = TieredKVStore(host, disk)
    a = np.zeros(40, np.int8)
    store.put(1, a)
    store.put(2, a)
    store.put(3, a)  # host holds 2: oldest (1) demotes to disk
    assert 1 not in host and 1 in disk and 1 in store
    np.testing.assert_array_equal(store.get(1), a)  # disk hit promotes
    assert 1 in host


def test_disk_tier_end_to_end_restore(tmp_path):
    """Engine with a tiny host tier + disk tier: prefix blocks evicted past
    host RAM still restore from disk with identical generations."""
    ckpt = write_fake_checkpoint(str(tmp_path / "dt"), tiny_config("qwen2"))
    gc = lambda n=6: GenerateConfig(max_new_tokens=n, do_sample=False,
                                    ignore_eos=True)
    prefix = [1, 5, 9, 42, 7, 3, 11, 2, 8, 4, 6, 10]

    fresh = _engine(ckpt, num_blocks=24)
    expect = fresh.generate(prefix + [13, 15], gc()).output_token_ids

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=12, host_cache_mb=1,
                          disk_cache_path=str(tmp_path / "kvdisk"),
                          disk_cache_mb=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16, 32)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)
    from rtp_llm_tpu.cache.host_tier import TieredKVStore

    assert isinstance(eng.cache_mgr.host_tier, TieredKVStore)
    # tiny 1 MB host tier: fill it so demotions reach disk
    eng.generate(prefix, gc(4))
    for base in (20, 30, 40, 50, 60, 70):
        eng.generate([base + i for i in range(10)], gc(4))
    out = eng.generate(prefix + [13, 15], gc()).output_token_ids
    assert out == expect
