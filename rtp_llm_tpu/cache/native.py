"""ctypes bindings for the native cache library (csrc/block_cache.cc).

Native BlockPool/PrefixBlockCache with the same interface as the Python
implementations (block_pool.py / prefix_cache.py) — the KVCacheManager picks
the native classes when the library is available (built on demand from csrc/
if a toolchain exists), keeping host-side admission work off the step budget.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO, "csrc", "build", "librtp_cache.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        csrc = os.path.join(_REPO, "csrc")
        if os.path.exists(os.path.join(csrc, "Makefile")):
            try:
                subprocess.run(
                    ["make", "-C", csrc], check=True, capture_output=True, timeout=120
                )
            except Exception as e:  # no toolchain / build failure -> fallback
                logger.info("native cache build unavailable: %s", e)
                return None
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.rtp_pool_create.restype = ctypes.c_void_p
    lib.rtp_pool_create.argtypes = [ctypes.c_int]
    lib.rtp_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.rtp_pool_free_count.argtypes = [ctypes.c_void_p]
    lib.rtp_pool_free_count.restype = ctypes.c_int
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.rtp_pool_malloc.argtypes = [ctypes.c_void_p, ctypes.c_int, i32p]
    lib.rtp_pool_malloc.restype = ctypes.c_int
    lib.rtp_pool_ref.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int]
    lib.rtp_pool_release.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int]
    lib.rtp_pool_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rtp_pool_refcount.restype = ctypes.c_int
    lib.rtp_cache_create.restype = ctypes.c_void_p
    lib.rtp_cache_destroy.argtypes = [ctypes.c_void_p]
    lib.rtp_cache_size.argtypes = [ctypes.c_void_p]
    lib.rtp_cache_size.restype = ctypes.c_int
    lib.rtp_cache_match.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int,
    ]
    lib.rtp_cache_match.restype = ctypes.c_int
    lib.rtp_cache_insert.argtypes = [
        ctypes.c_void_p, i32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int,
        i32p, ctypes.c_int,
    ]
    lib.rtp_cache_insert.restype = ctypes.c_int
    lib.rtp_cache_pop_lru.argtypes = [ctypes.c_void_p]
    lib.rtp_cache_pop_lru.restype = ctypes.c_int
    lib.rtp_cache_holds.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.rtp_cache_holds.restype = ctypes.c_int
    lib.rtp_cache_reclaimable.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.rtp_cache_reclaimable.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


class NativeBlockPool:
    """Drop-in for cache.block_pool.BlockPool backed by librtp_cache."""

    def __init__(self, num_blocks: int):
        if num_blocks < 2:
            raise ValueError("need >= 2 blocks (block 0 is reserved)")
        self._lib = _load()
        assert self._lib is not None
        self.num_blocks = num_blocks
        self._h = ctypes.c_void_p(self._lib.rtp_pool_create(num_blocks))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.rtp_pool_destroy(self._h)
            self._h = None

    @property
    def free_blocks(self) -> int:
        return self._lib.rtp_pool_free_count(self._h)

    @property
    def used_blocks(self) -> int:
        return (self.num_blocks - 1) - self.free_blocks

    def malloc(self, n: int):
        out = np.empty(max(n, 1), np.int32)
        if self._lib.rtp_pool_malloc(self._h, n, out) != 0:
            return None
        return out[:n].tolist()

    def ref(self, blocks):
        arr = np.asarray(blocks, np.int32)
        if arr.size:
            self._lib.rtp_pool_ref(self._h, np.ascontiguousarray(arr), arr.size)

    def free(self, blocks):
        arr = np.asarray(blocks, np.int32)
        if arr.size:
            self._lib.rtp_pool_release(self._h, np.ascontiguousarray(arr), arr.size)

    def refcount(self, block: int) -> int:
        return self._lib.rtp_pool_refcount(self._h, block)


class NativePrefixBlockCache:
    """Drop-in for cache.prefix_cache.PrefixBlockCache backed by librtp_cache.

    Exposes `reclaimable(pool)` so the manager avoids the per-block Python
    loop when estimating evictable blocks."""

    def __init__(self):
        self._lib = _load()
        assert self._lib is not None
        self._h = ctypes.c_void_p(self._lib.rtp_cache_create())

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.rtp_cache_destroy(self._h)
            self._h = None

    def __len__(self):
        return self._lib.rtp_cache_size(self._h)

    def match(self, token_ids, block_size: int):
        toks = np.ascontiguousarray(token_ids, np.int32)
        cap = max(len(token_ids) // block_size + 1, 1)
        out = np.empty(cap, np.int32)
        n = self._lib.rtp_cache_match(self._h, toks, toks.size, block_size, out, cap)
        return out[:n].tolist()

    def insert(self, token_ids, blocks, block_size: int):
        toks = np.ascontiguousarray(token_ids, np.int32)
        blks = np.ascontiguousarray(blocks, np.int32)
        cap = max(blks.size, 1)
        out = np.empty(cap, np.int32)
        n = self._lib.rtp_cache_insert(
            self._h, toks, toks.size, blks, blks.size, block_size, out, cap
        )
        return out[:n].tolist()

    def pop_lru(self):
        b = self._lib.rtp_cache_pop_lru(self._h)
        return None if b < 0 else b

    def holds(self, block: int) -> bool:
        return bool(self._lib.rtp_cache_holds(self._h, block))

    def reclaimable(self, pool: NativeBlockPool) -> int:
        return self._lib.rtp_cache_reclaimable(self._h, pool._h)
