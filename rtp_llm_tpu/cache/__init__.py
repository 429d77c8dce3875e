"""Host-side paged KV-cache management.

TPU-native analog of the reference's C++ cache layer (rtp_llm/cpp/cache/):
the device side is a preallocated paged cache array; everything here — block
pool, ref counting, prefix-hash reuse with LRU eviction, admission estimates —
is host bookkeeping that only manipulates integer block ids. Pure Python,
thoroughly unit-testable, no JAX dependency.
"""

from rtp_llm_tpu.cache.block_pool import BlockPool
from rtp_llm_tpu.cache.prefix_cache import PrefixBlockCache
from rtp_llm_tpu.cache.kv_cache_manager import BlockAllocation, KVCacheManager

__all__ = ["BlockPool", "PrefixBlockCache", "KVCacheManager", "BlockAllocation"]
