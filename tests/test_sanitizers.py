"""Sanitizer / debug-check lanes (SURVEY §5 race detection).

The native cache library is entered without the GIL (ctypes CDLL releases
it), so its extern "C" surface must be race-free: csrc/tsan_test.cc hammers
it from 4 threads under ThreadSanitizer (+ an ASan/UBSan lane). The JAX lane
runs a generate under jax_debug_nans to keep the compute path NaN-clean.
"""

import os
import shutil
import subprocess

import pytest

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "csrc")


def _run_lane(target, binary):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    build = subprocess.run(["make", "-C", CSRC, target],
                           capture_output=True, text=True, timeout=180)
    if build.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: {build.stderr[-200:]}")
    run = subprocess.run([os.path.join(CSRC, "build", binary)],
                         capture_output=True, text=True, timeout=180)
    out = run.stdout + run.stderr
    assert run.returncode == 0, out[-2000:]
    assert "WARNING: ThreadSanitizer" not in out, out[-2000:]
    assert "ERROR: AddressSanitizer" not in out, out[-2000:]
    assert "runtime error" not in out, out[-2000:]


def test_native_cache_tsan():
    _run_lane("tsan", "tsan_test")


def test_native_cache_asan():
    _run_lane("asan", "asan_test")


def test_generate_under_debug_nans(tmp_path):
    """jax_debug_nans lane: a full prefill+decode generate must not produce
    NaNs anywhere in the compute path (debug_nans re-runs op-by-op and
    raises at the first NaN producer)."""
    import jax

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "nan"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    with jax.debug_nans(True):
        eng = LlmEngine(create_model(cfg), weights, econf)
        out = eng.generate([1, 5, 9, 42], GenerateConfig(
            max_new_tokens=4, do_sample=False, ignore_eos=True))
    assert len(out.output_token_ids) == 4
