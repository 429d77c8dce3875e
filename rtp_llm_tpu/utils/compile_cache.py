"""Persistent XLA compilation cache setup.

Round-1 measured 366 s of per-process warmup compiling the bucketed step
programs (BENCH_r01 detail). The reference's CUDA-graph capture is seconds
because kernels are precompiled; the TPU analog is jax's persistent
compilation cache — every serving restart (and every worker in a fleet
sharing the cache dir) reuses the compiled executables instead of
recompiling.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax at a persistent compilation cache (idempotent)."""
    import jax

    from rtp_llm_tpu.config import runtime_flags

    cache_dir = (cache_dir
                 or runtime_flags.get("compile_cache_dir")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "rtp_llm_tpu", "jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    logger.info("persistent compile cache at %s", cache_dir)
    return cache_dir
