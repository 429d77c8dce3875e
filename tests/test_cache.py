"""Unit tests for the host-side KV-cache layer (reference analogs:
cpp/cache/test/BlockPoolTest, BlockCacheTest, KVCacheManagerTest).

The KVCacheManager suite runs against BOTH the Python and the native C++
(csrc/block_cache.cc) backends — same contract, one test body.
"""

import functools

import pytest

from rtp_llm_tpu.cache import BlockPool, KVCacheManager, PrefixBlockCache
from rtp_llm_tpu.cache.native import available as native_available
from rtp_llm_tpu.cache.prefix_cache import chain_hashes

BACKENDS = ["python"] + (["native"] if native_available() else [])


@pytest.fixture(params=BACKENDS)
def make_manager(request):
    return functools.partial(KVCacheManager, backend=request.param)


class TestBlockPool:
    def test_malloc_free(self):
        p = BlockPool(8)  # blocks 1..7 usable
        assert p.free_blocks == 7
        a = p.malloc(3)
        assert a == [1, 2, 3]
        assert p.free_blocks == 4
        p.free(a)
        assert p.free_blocks == 7

    def test_oom_returns_none(self):
        p = BlockPool(4)
        assert p.malloc(4) is None
        a = p.malloc(3)
        assert a is not None and p.malloc(1) is None
        p.free(a)

    def test_refcounting(self):
        p = BlockPool(4)
        a = p.malloc(2)
        p.ref(a)
        p.free(a)
        assert p.free_blocks == 1  # still held
        p.free(a)
        assert p.free_blocks == 3

    def test_null_block_never_allocated(self):
        p = BlockPool(4)
        a = p.malloc(3)
        assert 0 not in a
        p.ref([0])
        p.free([0])  # no-ops


class TestPrefixCache:
    def test_chain_hash_full_blocks_only(self):
        assert len(chain_hashes(list(range(10)), 4)) == 2
        assert len(chain_hashes(list(range(8)), 4)) == 2
        assert len(chain_hashes([1, 2, 3], 4)) == 0

    def test_match_and_insert(self):
        c = PrefixBlockCache()
        toks = list(range(12))
        c.insert(toks, [5, 6, 7], block_size=4)
        # exact full prefix (match uses len-1 tokens => 12 tokens usable 11 -> 2 blocks)
        assert c.match(toks, 4) == [5, 6]
        # 13 tokens: usable 12 -> all 3 blocks
        assert c.match(toks + [99], 4) == [5, 6, 7]
        # diverging second block
        assert c.match([0, 1, 2, 3, 9, 9, 9, 9, 9], 4) == [5]
        # no match
        assert c.match([7, 7, 7, 7, 7], 4) == []

    def test_lru_eviction_order(self):
        c = PrefixBlockCache()
        c.insert([1] * 4, [1], 4)
        c.insert([2] * 4, [2], 4)
        c.match([1] * 4 + [0], 4)  # touch 1
        assert c.pop_lru() == 2
        assert c.pop_lru() == 1
        assert c.pop_lru() is None


class TestKVCacheManager:
    def test_allocate_and_free(self, make_manager):
        m = make_manager(num_blocks=9, block_size=4)
        a = m.allocate(list(range(10)))  # 3 blocks
        assert a is not None and len(a.blocks) == 3 and a.reuse_len == 0
        m.free(a)
        assert m.pool.free_blocks == 8  # cache retains refs but pool frees to rc>0

    def test_prefix_reuse_roundtrip(self, make_manager):
        m = make_manager(num_blocks=9, block_size=4)
        toks = list(range(8))
        a = m.allocate(toks)
        blocks = list(a.blocks)
        m.free(a, token_ids=toks)  # inserts 2 full blocks into prefix cache
        b = m.allocate(toks + [50, 51])
        assert b.blocks[:2] == blocks[:2]
        assert b.reuse_len == 8

    def test_extend(self, make_manager):
        m = make_manager(num_blocks=6, block_size=4, enable_prefix_cache=False)
        a = m.allocate([1, 2, 3])
        assert len(a.blocks) == 1
        assert m.extend(a, 5)
        assert len(a.blocks) == 2
        assert m.extend(a, 8)  # still 2 blocks
        assert len(a.blocks) == 2
        # exhaust: needs ceil(21/4)=6 blocks > 5 usable -> False
        assert m.extend(a, 21) is False

    def test_eviction_on_pressure(self, make_manager):
        m = make_manager(num_blocks=5, block_size=4)  # 4 usable
        toks = list(range(8))
        a = m.allocate(toks)
        m.free(a, token_ids=toks)  # 2 blocks cached
        assert m.pool.free_blocks == 2
        # allocating 4 blocks must evict the cached ones
        b = m.allocate(list(range(100, 116)))
        assert b is not None and len(b.blocks) == 4
        m.free(b)

    def test_allocate_oom_returns_none(self, make_manager):
        m = make_manager(num_blocks=3, block_size=4)
        a = m.allocate(list(range(8)))
        assert a is not None
        assert m.allocate(list(range(100, 108))) is None
        m.free(a)

    def test_reused_blocks_survive_owner_free(self, make_manager):
        """A reused block freed by the original owner must stay valid for the
        second stream (refcount semantics)."""
        m = make_manager(num_blocks=9, block_size=4)
        toks = list(range(8))
        a = m.allocate(toks)
        m.free(a, token_ids=toks)
        b = m.allocate(toks + [9])
        assert b.reuse_len == 8
        # cached blocks are still referenced by b: a 6-block allocation can
        # evict the cache entries but must NOT reclaim b's blocks -> OOM
        held = list(b.blocks)
        big = m.allocate(list(range(200, 224)))  # 6 blocks
        assert big is None
        assert b.blocks == held
        # after b frees, the blocks are truly reclaimable
        m.free(b)
        big = m.allocate(list(range(200, 224)))
        assert big is not None and len(big.blocks) == 6
        m.free(big)

    def test_estimate(self, make_manager):
        m = make_manager(num_blocks=9, block_size=4)
        assert m.estimate_peak_blocks(5, 10) == 4
