"""Ring attention (cp mesh axis) vs dense causal reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import ParallelConfig
from rtp_llm_tpu.ops.attention.ring import ring_prefill_attention
from rtp_llm_tpu.parallel import make_mesh


def dense_causal(q, k, v, sm):
    t, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qf = q.reshape(t, hkv, g, d).astype(np.float64) * sm
    s = np.einsum("thgd,shd->thgs", qf, k.astype(np.float64))
    mask = np.tril(np.ones((t, t), bool))
    s = np.where(mask[:, None, None, :], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("thgs,shd->thgd", p, v.astype(np.float64)).reshape(t, hq, d)


@pytest.mark.parametrize("cp,t,hq,hkv", [(2, 32, 4, 2), (4, 64, 8, 2), (4, 32, 4, 4)])
def test_ring_matches_dense(cp, t, hq, hkv):
    mesh = make_mesh(ParallelConfig(cp_size=cp))
    rng = np.random.default_rng(0)
    d = 16
    q = jnp.asarray(rng.standard_normal((t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, hkv, d)), jnp.float32)
    sm = d ** -0.5
    got = ring_prefill_attention(q, k, v, mesh, sm)
    want = dense_causal(np.asarray(q), np.asarray(k), np.asarray(v), sm)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_cp_ring_engine_matches_unsharded(tmp_path):
    """parallel.cp_ring: zig-zag column layout + ring attention over the cp
    axis through the REAL engine must reproduce the unsharded engine's
    tokens exactly (reference: ZigzagProcessor + CP ring rotation)."""
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
    from rtp_llm_tpu.parallel import make_mesh

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "zz"), cfg)

    def build(pc=None, mesh=None):
        weights = CheckpointLoader(cfg).load(ckpt)
        econf = EngineConfig(
            parallel=pc or ParallelConfig(),
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=128,
                                      prefill_buckets=(16, 32)),
        )
        econf.quant.kv_cache_dtype = "float32"
        return LlmEngine(create_model(cfg), weights, econf, mesh=mesh)

    prompts = [[1, 5, 9, 42, 7, 3, 11, 2, 8, 4, 6, 10],
               [7, 100, 3, 55, 8]]
    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False,
                                ignore_eos=True)
    base = build()
    expected = [base.generate(p, gc()).output_token_ids for p in prompts]

    pc = ParallelConfig(cp_size=2, cp_ring=True)
    eng = build(pc, make_mesh(pc))
    assert eng.model.use_ring_prefill
    for p, exp in zip(prompts, expected):
        assert eng.generate(p, gc()).output_token_ids == exp

    # over-long prompts are rejected up front (ring covers one fresh chunk)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.enqueue(list(range(1, 40)), gc())


def test_zigzag_perm_layout():
    """zigzag_perm: rank r's contiguous slice of the permuted order must be
    sequence chunks r and 2n-1-r."""
    import numpy as np

    from rtp_llm_tpu.ops.attention.ring import zigzag_perm

    perm = np.asarray(zigzag_perm(16, 2))  # 4 chunks of 4
    assert perm.tolist() == (
        list(range(0, 4)) + list(range(12, 16))     # rank 0: chunks 0, 3
        + list(range(4, 8)) + list(range(8, 12))    # rank 1: chunks 1, 2
    )
