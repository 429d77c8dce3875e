"""Prefix-hash block reuse cache with LRU eviction.

Analog of the reference BlockCache (rtp_llm/cpp/cache/BlockCache.h:20): after a
request finishes, its full blocks are inserted keyed by a chained per-block
hash of the token prefix; new requests match their longest cached prefix and
re-reference those blocks instead of recomputing the KV (system-prompt /
multi-turn reuse). Cached-but-unreferenced blocks are evicted LRU when the
pool runs dry.
"""

from __future__ import annotations

from collections import OrderedDict


def chain_hashes(token_ids: list[int], block_size: int, parent: int = 0) -> list[int]:
    """Chained hash per *full* block of token_ids."""
    out = []
    h = parent
    for i in range(0, len(token_ids) - block_size + 1, block_size):
        h = hash((h, tuple(token_ids[i : i + block_size])))
        out.append(h)
    return out


class PrefixBlockCache:
    def __init__(self):
        # block_hash -> block_id, LRU order (oldest first)
        self._entries: OrderedDict[int, int] = OrderedDict()
        # block_id -> block_hash (reverse map for eviction bookkeeping)
        self._by_block: dict[int, int] = {}

    def __len__(self) -> int:
        return len(self._entries)

    def match(self, token_ids: list[int], block_size: int) -> list[int]:
        """Longest cached block-prefix for token_ids. Touches matched entries.

        Matches at most the first len(token_ids)-1 tokens' worth of full blocks
        (the caller always needs >= 1 token of real prefill so there is a last
        hidden state to sample from — same rule as the reference scheduler).
        """
        usable = len(token_ids) - 1
        hashes = chain_hashes(token_ids[:usable], block_size)
        blocks = []
        for h in hashes:
            b = self._entries.get(h)
            if b is None:
                break
            self._entries.move_to_end(h)
            blocks.append(b)
        return blocks

    def insert(self, token_ids: list[int], blocks: list[int], block_size: int) -> list[int]:
        """Insert full blocks of a finished request. Returns the block ids newly
        retained by the cache (caller transfers one reference for each)."""
        hashes = chain_hashes(token_ids, block_size)
        retained = []
        for h, b in zip(hashes, blocks):
            if h in self._entries:
                self._entries.move_to_end(h)
                continue  # already cached (possibly as a different block id)
            self._entries[h] = b
            self._by_block[b] = h
            retained.append(b)
        return retained

    def pop_lru(self) -> int | None:
        """Evict the least-recently-used entry, returning its block id."""
        if not self._entries:
            return None
        h, b = self._entries.popitem(last=False)
        self._by_block.pop(b, None)
        return b

    def holds(self, block: int) -> bool:
        return block in self._by_block

    def reclaimable(self, pool) -> int:
        """Cache-held blocks whose only reference is the cache's own."""
        return sum(1 for b in self._by_block if pool.refcount(b) == 1)
