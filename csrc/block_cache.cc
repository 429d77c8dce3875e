// Native host-side KV-cache bookkeeping: ref-counted block pool + prefix-hash
// reuse cache with LRU eviction.
//
// TPU-native counterpart of the reference's C++ cache layer
// (rtp_llm/cpp/cache/BlockPool.h:24, BlockCache.h:20): the device side is a
// paged jax array; this library owns the integer block-id bookkeeping on the
// host so the scheduler's per-step admission work stays well under the
// ~2 ms/step host budget even with hundreds of streams. Exposed as a plain C
// ABI consumed via ctypes (rtp_llm_tpu/cache/native.py); the Python
// implementation remains as the reference/fallback.
//
// Build: make -C csrc   (produces build/librtp_cache.so)

#include <cstdint>
#include <mutex>
#include <cstring>
#include <list>
#include <unordered_map>
#include <vector>

namespace {

struct BlockPool {
  int num_blocks;
  std::vector<int> free_list;                 // LIFO
  std::unordered_map<int, int> refs;

  explicit BlockPool(int n) : num_blocks(n) {
    free_list.reserve(n - 1);
    for (int b = n - 1; b >= 1; --b) free_list.push_back(b);  // pop -> 1 first
  }
};

// chained per-block prefix hash (FNV-1a over parent hash + token ids)
static uint64_t chain_hash(uint64_t parent, const int32_t* toks, int n) {
  uint64_t h = 1469598103934665603ULL ^ parent;
  auto mix = [&h](uint64_t v) {
    h ^= v;
    h *= 1099511628211ULL;
  };
  mix(parent);
  for (int i = 0; i < n; ++i) mix(static_cast<uint64_t>(toks[i]) + 0x9e3779b9ULL);
  return h;
}

struct PrefixCache {
  // LRU list front = oldest; map hash -> (block, list iterator)
  std::list<uint64_t> lru;
  struct Entry {
    int block;
    std::list<uint64_t>::iterator it;
  };
  std::unordered_map<uint64_t, Entry> entries;
  std::unordered_map<int, uint64_t> by_block;

  void touch(uint64_t h) {
    auto& e = entries[h];
    lru.erase(e.it);
    lru.push_back(h);
    e.it = std::prev(lru.end());
  }
};

// One process-wide mutex guarding every entry point: ctypes CDLL calls
// release the GIL, so the engine loop and HTTP/executor threads can enter
// concurrently (enqueue_preloaded, generate_with_hidden). Contention is
// negligible next to the device step; correctness is not optional.
static std::mutex g_mu;

}  // namespace

extern "C" {

// ---- pool ----

void* rtp_pool_create(int num_blocks) {
  std::lock_guard<std::mutex> g(g_mu);
  if (num_blocks < 2) return nullptr;
  return new BlockPool(num_blocks);
}

void rtp_pool_destroy(void* p) {
  std::lock_guard<std::mutex> g(g_mu); delete static_cast<BlockPool*>(p); }

int rtp_pool_free_count(void* p) {
  std::lock_guard<std::mutex> g(g_mu);
  return static_cast<int>(static_cast<BlockPool*>(p)->free_list.size());
}

// returns 0 on success (out filled with n block ids), -1 if insufficient
int rtp_pool_malloc(void* p, int n, int32_t* out) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* pool = static_cast<BlockPool*>(p);
  if (n > static_cast<int>(pool->free_list.size())) return -1;
  for (int i = 0; i < n; ++i) {
    int b = pool->free_list.back();
    pool->free_list.pop_back();
    pool->refs[b] = 1;
    out[i] = b;
  }
  return 0;
}

void rtp_pool_ref(void* p, const int32_t* blocks, int n) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* pool = static_cast<BlockPool*>(p);
  for (int i = 0; i < n; ++i) {
    if (blocks[i] == 0) continue;
    ++pool->refs[blocks[i]];
  }
}

void rtp_pool_release(void* p, const int32_t* blocks, int n) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* pool = static_cast<BlockPool*>(p);
  for (int i = 0; i < n; ++i) {
    int b = blocks[i];
    if (b == 0) continue;
    auto it = pool->refs.find(b);
    if (it == pool->refs.end()) continue;
    if (--it->second == 0) {
      pool->refs.erase(it);
      pool->free_list.push_back(b);
    }
  }
}

int rtp_pool_refcount(void* p, int block) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* pool = static_cast<BlockPool*>(p);
  auto it = pool->refs.find(block);
  return it == pool->refs.end() ? 0 : it->second;
}

// ---- prefix cache ----

void* rtp_cache_create() {
  std::lock_guard<std::mutex> g(g_mu); return new PrefixCache(); }
void rtp_cache_destroy(void* c) {
  std::lock_guard<std::mutex> g(g_mu); delete static_cast<PrefixCache*>(c); }
int rtp_cache_size(void* c) {
  std::lock_guard<std::mutex> g(g_mu);
  return static_cast<int>(static_cast<PrefixCache*>(c)->entries.size());
}

// longest cached block-prefix of token_ids[0..n_tokens) using at most the
// first n_tokens-1 tokens; returns number of matched blocks written to out.
int rtp_cache_match(void* c, const int32_t* token_ids, int n_tokens,
                    int block_size, int32_t* out, int out_cap) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* cache = static_cast<PrefixCache*>(c);
  int usable = n_tokens - 1;
  int n_blocks = usable / block_size;
  uint64_t h = 0;
  int matched = 0;
  for (int i = 0; i < n_blocks && matched < out_cap; ++i) {
    h = chain_hash(h, token_ids + i * block_size, block_size);
    auto it = cache->entries.find(h);
    if (it == cache->entries.end()) break;
    cache->touch(h);
    out[matched++] = it->second.block;
  }
  return matched;
}

// insert full blocks of a finished request; returns number of block ids newly
// retained (written to out) — caller transfers one pool reference for each.
int rtp_cache_insert(void* c, const int32_t* token_ids, int n_tokens,
                     const int32_t* blocks, int n_blocks_in, int block_size,
                     int32_t* out, int out_cap) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* cache = static_cast<PrefixCache*>(c);
  int n_blocks = n_tokens / block_size;
  if (n_blocks > n_blocks_in) n_blocks = n_blocks_in;
  uint64_t h = 0;
  int retained = 0;
  for (int i = 0; i < n_blocks; ++i) {
    h = chain_hash(h, token_ids + i * block_size, block_size);
    auto it = cache->entries.find(h);
    if (it != cache->entries.end()) {
      cache->touch(h);
      continue;
    }
    cache->lru.push_back(h);
    PrefixCache::Entry e{blocks[i], std::prev(cache->lru.end())};
    cache->entries.emplace(h, e);
    cache->by_block[blocks[i]] = h;
    if (retained < out_cap) out[retained] = blocks[i];
    ++retained;
  }
  return retained;
}

// evict LRU entry; returns its block id or -1 if empty
int rtp_cache_pop_lru(void* c) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* cache = static_cast<PrefixCache*>(c);
  if (cache->lru.empty()) return -1;
  uint64_t h = cache->lru.front();
  cache->lru.pop_front();
  auto it = cache->entries.find(h);
  int b = it->second.block;
  cache->by_block.erase(b);
  cache->entries.erase(it);
  return b;
}

int rtp_cache_holds(void* c, int block) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* cache = static_cast<PrefixCache*>(c);
  return cache->by_block.count(block) ? 1 : 0;
}

// blocks held only by the cache (refcount==1 in the pool): count for the
// scheduler's reclaimable estimate
int rtp_cache_reclaimable(void* c, void* p) {
  std::lock_guard<std::mutex> g(g_mu);
  auto* cache = static_cast<PrefixCache*>(c);
  auto* pool = static_cast<BlockPool*>(p);
  int n = 0;
  for (auto& kv : cache->by_block) {
    auto it = pool->refs.find(kv.first);
    if (it != pool->refs.end() && it->second == 1) ++n;
  }
  return n;
}

}  // extern "C"
