"""Fused (ragged grouped-GEMM) MoE vs dense-compute baseline."""

import numpy as np

import jax.numpy as jnp

from rtp_llm_tpu.ops.moe import dense_moe, fused_moe


def test_fused_matches_dense():
    rng = np.random.default_rng(0)
    n, h, i, e, k = 12, 16, 24, 6, 2
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, i, h)) * 0.1, jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (n, k)), jnp.int32)
    wts = jnp.asarray(rng.random((n, k)), jnp.float32)

    comb = jnp.zeros((n, e), jnp.float32).at[
        jnp.arange(n)[:, None], idx
    ].add(wts)
    want = dense_moe(x, comb, wg, wu, wd)
    got = fused_moe(x, idx, wts, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_empty_expert_and_hot_expert():
    rng = np.random.default_rng(1)
    n, h, i, e, k = 8, 8, 8, 4, 2
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, i, h)) * 0.1, jnp.float32)
    # everyone picks experts 1 and 3: experts 0/2 empty
    idx = jnp.tile(jnp.asarray([[1, 3]], jnp.int32), (n, 1))
    wts = jnp.full((n, k), 0.5, jnp.float32)
    comb = jnp.zeros((n, e), jnp.float32).at[
        jnp.arange(n)[:, None], idx
    ].add(wts)
    np.testing.assert_allclose(
        np.asarray(fused_moe(x, idx, wts, wg, wu, wd)),
        np.asarray(dense_moe(x, comb, wg, wu, wd)),
        rtol=1e-4, atol=1e-5,
    )


def test_duplicate_expert_per_token():
    """A token picking the same expert twice must count it twice."""
    rng = np.random.default_rng(2)
    n, h, i, e = 3, 8, 8, 4
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((e, i, h)) * 0.1, jnp.float32)
    idx = jnp.asarray([[2, 2], [0, 1], [3, 0]], jnp.int32)
    wts = jnp.asarray([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]], jnp.float32)
    comb = jnp.zeros((n, e), jnp.float32).at[
        jnp.arange(n)[:, None], idx
    ].add(wts)
    np.testing.assert_allclose(
        np.asarray(fused_moe(x, idx, wts, wg, wu, wd)),
        np.asarray(dense_moe(x, comb, wg, wu, wd)),
        rtol=1e-4, atol=1e-5,
    )


def test_moe_micro_batching_exact(tmp_path):
    """parallel.moe_micro_batches=2 (layer micro-batching analog of
    PyWrappedModel.cc:347-433) splits the MoE token batch into independent
    halves — outputs must be bit-identical to the unsplit path (routing is
    per-token)."""
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, ParallelConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model

    cfg = tiny_config("qwen2_moe")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "mb"), cfg)

    def run(mb):
        weights = CheckpointLoader(cfg).load(ckpt)
        econf = EngineConfig(
            parallel=ParallelConfig(moe_micro_batches=mb),
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        eng = LlmEngine(create_model(cfg), weights, econf)
        assert eng.model.moe_micro_batches == mb
        return eng.generate([1, 5, 9, 42, 7], GenerateConfig(
            max_new_tokens=8, do_sample=False, ignore_eos=True,
        )).output_token_ids

    assert run(1) == run(2)
