// ThreadSanitizer stress for the native cache library (SURVEY §5 race
// detection lane; reference analog: the C++ cache unit tests run under
// sanitizers in CI). Hammers the pool + prefix cache from several threads
// through the same extern "C" surface ctypes uses — any data race inside
// the library trips TSAN and fails the build lane.
//
// Build/run: make tsan && ./build/tsan_test
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {
void* rtp_pool_create(int);
void rtp_pool_destroy(void*);
int rtp_pool_free_count(void*);
int rtp_pool_malloc(void*, int, int32_t*);
void rtp_pool_ref(void*, const int32_t*, int);
void rtp_pool_release(void*, const int32_t*, int);
void* rtp_cache_create();
void rtp_cache_destroy(void*);
int rtp_cache_size(void*);
int rtp_cache_match(void*, const int32_t*, int, int, int32_t*, int);
int rtp_cache_insert(void*, const int32_t*, int, const int32_t*, int, int,
                     int32_t*, int);
int rtp_cache_pop_lru(void*);
int rtp_cache_reclaimable(void*, void*);
}

int main() {
  void* pool = rtp_pool_create(512);
  void* cache = rtp_cache_create();
  std::atomic<int> failures{0};

  auto worker = [&](int seed) {
    int32_t blocks[16];
    int32_t toks[64];
    for (int it = 0; it < 2000; ++it) {
      int n = 1 + (seed + it) % 8;
      if (rtp_pool_malloc(pool, n, blocks) == 0) {
        for (int j = 0; j < 64; ++j) toks[j] = (seed * 131 + it + j) % 97;
        int32_t kept[16];
        int retained = rtp_cache_insert(cache, toks, n * 4, blocks, n, 4,
                                        kept, 16);
        // the cache retains one pool ref per newly kept block
        if (retained > 0) rtp_pool_ref(pool, kept, retained);
        int32_t got[16];
        rtp_cache_match(cache, toks, n * 4, 4, got, 16);
        rtp_pool_release(pool, blocks, n);
      }
      if (it % 64 == 0) {
        while (rtp_pool_free_count(pool) < 64) {
          int b = rtp_cache_pop_lru(cache);
          if (b < 0) break;
          int32_t bb = b;
          rtp_pool_release(pool, &bb, 1);
        }
        rtp_cache_reclaimable(cache, pool);
      }
    }
  };

  std::vector<std::thread> ts;
  for (int i = 0; i < 4; ++i) ts.emplace_back(worker, i + 1);
  for (auto& t : ts) t.join();

  rtp_cache_destroy(cache);
  rtp_pool_destroy(pool);
  if (failures.load()) {
    std::printf("FAIL\n");
    return 1;
  }
  std::printf("OK\n");
  return 0;
}
