"""KV-cache manager: block allocation + prefix reuse for request streams.

Analog of the reference KVCacheManager / KVCacheAllocator
(rtp_llm/cpp/cache/KVCacheManager.h:28, KVCacheAllocator.h:37): ref-counted
block pool with a prefix-reuse cache; when the pool is exhausted, LRU
cache-held blocks are evicted to satisfy new allocations. Admission estimates
(estimatePeakNeedBlocks analog) let the scheduler avoid mid-flight OOM.

Device-side cache sizing from free HBM (CacheConfigCreator analog) lives in
the engine, which owns the device arrays; this class never touches device
memory.
"""

from __future__ import annotations

import dataclasses
import math
from collections import deque

from rtp_llm_tpu.cache.block_pool import BlockPool
from rtp_llm_tpu.cache.prefix_cache import PrefixBlockCache


@dataclasses.dataclass
class BlockAllocation:
    """Blocks held by one stream. ``reuse_len`` = tokens covered by reused
    prefix blocks (their KV is already on device, or arrives via
    ``restore``). ``restore`` = (block_id, host rows) pairs the engine must
    scatter to the device before prefill (host-tier hits)."""

    blocks: list[int]
    reuse_len: int
    restore: list = dataclasses.field(default_factory=list)
    # sliding-window recycling produced duplicate physical ids in ``blocks``
    # (logical index -> same physical block); free() must dedup
    recycled: bool = False


class KVCacheManager:
    def __init__(self, num_blocks: int, block_size: int,
                 enable_prefix_cache: bool = True, backend: str = "auto",
                 sliding_window_tokens: int = 0):
        """backend: auto | native | python — 'native' uses the C++ block pool
        + prefix cache (csrc/block_cache.cc) via ctypes; 'auto' picks native
        when the library is available.

        sliding_window_tokens > 0 enables SLIDING-WINDOW BLOCK RECYCLING for
        uniform-SWA models (mistral-style; reference analog: the hybrid SWA
        cache pools, cpp/cache/): decode growth reuses the stream's own
        physical blocks once they fall wholly out of the attention window
        (the block table keeps pointing at them for masked, DMA-safe reads),
        and post-prefill out-of-window blocks are released. Requires the
        prefix cache OFF (recycled block contents no longer match their
        logical token positions)."""
        self.block_size = block_size
        self.swa_tokens = sliding_window_tokens
        if sliding_window_tokens:
            assert not enable_prefix_cache, (
                "sliding-window recycling is incompatible with prefix reuse")
            # live span: ceil(window/bs) blocks + the write block + 1 guard
            self.swa_keep = -(-sliding_window_tokens // block_size) + 2
        else:
            self.swa_keep = 0
        use_native = False
        if backend in ("auto", "native"):
            from rtp_llm_tpu.cache import native as _native

            use_native = _native.available()
            if backend == "native" and not use_native:
                raise RuntimeError("native cache library unavailable")
        self.backend = "native" if use_native else "python"
        # host-memory tier (cache/host_tier.py): spill evicted prefix blocks
        # to host RAM; keyed by python chain hashes so it works with either
        # pool backend. evict_hook(block_id, rows_saver) is set by the engine.
        self.host_tier = None
        self.evict_hook = None  # callable(block_id) -> np rows pytree
        self._block_pyhash: dict[int, int] = {}  # block -> python chain hash
        # versioned membership journal for cache-aware routing (reference:
        # GetCacheStatus version diffs consumed by FlexLB, proto :683)
        self.hash_version = 0
        self._journal: deque = deque(maxlen=8192)  # (version, op, hash)
        if use_native:
            from rtp_llm_tpu.cache.native import (
                NativeBlockPool, NativePrefixBlockCache,
            )

            self.pool = NativeBlockPool(num_blocks)
            self.prefix_cache = NativePrefixBlockCache() if enable_prefix_cache else None
        else:
            self.pool = BlockPool(num_blocks)
            self.prefix_cache = PrefixBlockCache() if enable_prefix_cache else None

    # ---- sizing / admission ----

    def blocks_for_tokens(self, num_tokens: int) -> int:
        return max(1, math.ceil(num_tokens / self.block_size))

    @property
    def free_blocks(self) -> int:
        """Free now + reclaimable from the prefix cache."""
        n = self.pool.free_blocks
        if self.prefix_cache is not None:
            n += self._reclaimable()
        return n

    def _reclaimable(self) -> int:
        # cache-held blocks with refcount 1 (only the cache holds them)
        return self.prefix_cache.reclaimable(self.pool)

    # ---- allocation ----

    def _malloc(self, n: int) -> list[int] | None:
        """malloc with LRU eviction from the prefix cache as fallback
        (reference: BlockCache::pop + maybeFreeBlockFromCache)."""
        got = self.pool.malloc(n)
        if got is not None:
            return got
        if self.prefix_cache is None:
            return None
        while self.pool.free_blocks < n:
            b = self.prefix_cache.pop_lru()
            if b is None:
                return None
            h = self._block_pyhash.pop(b, None)
            if h is not None:
                self.hash_version += 1
                self._journal.append((self.hash_version, "-", h))
            self._spill_to_host(b, h)
            self.pool.free([b])  # drop the cache's reference
        return self.pool.malloc(n)

    def _spill_to_host(self, block: int, h: int | None):
        """Save an evicted prefix block's device rows into the host tier
        (reference: memory-tier connector async write; synchronous here)."""
        if self.host_tier is None or self.evict_hook is None or h is None:
            return
        if h in self.host_tier:
            return
        self.host_tier.put(h, self.evict_hook(block))

    def allocate(self, token_ids: list[int],
                 allow_reuse: bool = True) -> BlockAllocation | None:
        """Allocate blocks for a new request of len(token_ids) prompt tokens,
        reusing cached prefix blocks where possible. Returns None if the pool
        (after eviction) cannot cover it; caller keeps the request WAITING.
        allow_reuse=False bypasses prefix matching (multimodal streams: token
        ids alone don't identify the KV content)."""
        need_total = self.blocks_for_tokens(len(token_ids))
        reused: list[int] = []
        if allow_reuse and self.prefix_cache is not None:
            reused = self.prefix_cache.match(token_ids, self.block_size)
            reused = reused[:need_total]
        fresh = self._malloc(need_total - len(reused))
        if fresh is None:
            return None
        self.pool.ref(reused)
        alloc = BlockAllocation(
            blocks=reused + fresh, reuse_len=len(reused) * self.block_size
        )
        if allow_reuse and self.host_tier is not None and fresh:
            # extend the device prefix hit with host-tier hits: consecutive
            # chain hashes past the device match restore into fresh blocks
            from rtp_llm_tpu.cache.prefix_cache import chain_hashes

            usable = len(token_ids) - 1
            hashes = chain_hashes(token_ids[:usable], self.block_size)
            fi = 0
            for h in hashes[len(reused):]:
                if fi >= len(fresh):
                    break
                rows = self.host_tier.get(h)
                if rows is None:
                    break
                alloc.restore.append((fresh[fi], rows))
                fi += 1
            alloc.reuse_len += len(alloc.restore) * self.block_size
        return alloc

    def extend(self, alloc: BlockAllocation, new_total_tokens: int) -> bool:
        """Grow a stream's allocation to cover new_total_tokens (decode).
        Returns False on OOM (caller must pause/evict the stream).

        Sliding-window mode: before taking a fresh block for logical index
        j, reuse the stream's own physical block at j - swa_keep — by then
        all its token positions are below the attention window, so the
        kernels never read live data from it (only masked rows)."""
        need = self.blocks_for_tokens(new_total_tokens)
        if need <= len(alloc.blocks):
            return True
        while self.swa_tokens and len(alloc.blocks) < need:
            j_old = len(alloc.blocks) - self.swa_keep
            # exclusively-owned blocks only (beam forks / restores hold refs)
            if j_old < 0 or self.pool.refcount(alloc.blocks[j_old]) != 1:
                break
            alloc.blocks.append(alloc.blocks[j_old])
            alloc.recycled = True
        if need <= len(alloc.blocks):
            return True
        fresh = self._malloc(need - len(alloc.blocks))
        if fresh is None:
            return False
        alloc.blocks.extend(fresh)
        return True

    def shrink_sliding(self, alloc: BlockAllocation,
                       total_tokens: int) -> bool:
        """Post-prefill: release physical blocks wholly below the sliding
        window, repointing their logical table entries at the first live
        block (reads stay DMA-safe; all their positions are masked).
        Returns True if the block list changed (caller resyncs the device
        table row). No-op unless sliding-window mode is on."""
        if not self.swa_tokens or alloc.recycled:
            return False
        dead = len(alloc.blocks) - self.swa_keep
        if dead <= 0:
            return False
        live = alloc.blocks[dead]
        victims = []
        for i in range(dead):
            b = alloc.blocks[i]
            if self.pool.refcount(b) != 1 or b == live:
                continue
            victims.append(b)
            alloc.blocks[i] = live
        if victims:
            self.pool.free(victims)
            alloc.recycled = True  # duplicate ids now present
            return True
        return False

    def free(self, alloc: BlockAllocation, token_ids: list[int] | None = None):
        """Release a stream's blocks. If token_ids given (prompt+generated),
        full blocks are offered to the prefix cache first; retained blocks keep
        one reference owned by the cache (reference: insertIntoCache,
        KVCacheManager.h:28 / freeWithCache)."""
        if self.prefix_cache is not None and token_ids:
            n_full = len(token_ids) // self.block_size
            retained = self.prefix_cache.insert(
                token_ids[: n_full * self.block_size],
                alloc.blocks[:n_full],
                self.block_size,
            )
            self.pool.ref(retained)  # cache's reference
            if retained:
                from rtp_llm_tpu.cache.prefix_cache import chain_hashes

                hashes = chain_hashes(
                    token_ids[: n_full * self.block_size], self.block_size
                )
                bset = set(retained)
                for h, b in zip(hashes, alloc.blocks[:n_full]):
                    if b in bset:
                        self._block_pyhash[b] = h
                        self.hash_version += 1
                        self._journal.append((self.hash_version, "+", h))
        if alloc.recycled:
            # sliding-window recycling aliases logical entries onto the same
            # physical blocks: free each physical id once
            self.pool.free(list(dict.fromkeys(alloc.blocks)))
        else:
            self.pool.free(alloc.blocks)
        alloc.blocks = []

    def estimate_peak_blocks(self, prompt_len: int, max_new_tokens: int) -> int:
        """Admission estimate (reference: estimatePeakNeedBlocks). Sliding
        recycling bounds the steady-state footprint at swa_keep blocks; the
        prefill transient still needs the whole prompt."""
        total = self.blocks_for_tokens(prompt_len + max_new_tokens)
        if self.swa_tokens:
            return min(total,
                       max(self.blocks_for_tokens(prompt_len + 1),
                           self.swa_keep))
        return total

    # ---- cache-aware routing feed (reference: GetCacheStatus diffs) ----

    def cache_hash_diff(self, from_version: int = 0) -> dict:
        """Versioned prefix-cache membership for the cluster router. Returns
        {"version", "base", "added", "removed"}: base=True means ``added`` is
        the FULL current hash set (caller's version too old for the journal
        window, or 0)."""
        cur = self.hash_version
        if from_version >= cur:
            return {"version": cur, "base": False, "added": [], "removed": []}
        oldest = self._journal[0][0] if self._journal else cur + 1
        if from_version + 1 < oldest:
            return {
                "version": cur, "base": True,
                "added": list(self._block_pyhash.values()), "removed": [],
            }
        added, removed = [], []
        for ver, op, h in self._journal:
            if ver <= from_version:
                continue
            (added if op == "+" else removed).append(h)
        return {"version": cur, "base": False,
                "added": added, "removed": removed}
