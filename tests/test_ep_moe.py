"""Expert-parallel capacity-dispatch MoE (parallel/ep_moe.py).

Reference analog: DeepEP dispatch/combine (deepep_wrapper.py:90-236) + the
fused-MoE strategy registry; here expressed as a capacity gather + per-expert
quantized GEMMs with a shard_map psum combine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtp_llm_tpu.ops.moe import dense_moe
from rtp_llm_tpu.parallel.ep_moe import (
    capacity_moe_local, ep_moe, expert_capacity,
)


def _mk(rng, n=16, h=16, i=24, e=4, k=2, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((n, h)), dtype)
    wg = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, dtype)
    wu = jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, dtype)
    wd = jnp.asarray(rng.standard_normal((e, i, h)) * 0.1, dtype)
    idx = jnp.asarray(rng.integers(0, e, (n, k)), jnp.int32)
    wts = jnp.asarray(rng.random((n, k)), jnp.float32)
    comb = jnp.zeros((n, e), jnp.float32).at[
        jnp.arange(n)[:, None], idx
    ].add(wts)
    return x, wg, wu, wd, idx, wts, comb


def test_capacity_moe_matches_dense():
    rng = np.random.default_rng(0)
    x, wg, wu, wd, idx, wts, comb = _mk(rng)
    want = dense_moe(x, comb, wg, wu, wd)
    # generous capacity => no drops => exact
    got, counts = capacity_moe_local(x, idx, wts, wg, wu, wd,
                                     capacity=x.shape[0] * 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # gating counts = actual assignment histogram
    want_counts = np.bincount(np.asarray(idx).ravel(), minlength=4)
    np.testing.assert_array_equal(np.asarray(counts), want_counts)


def test_capacity_moe_duplicate_expert_per_token():
    rng = np.random.default_rng(1)
    x, wg, wu, wd, _, _, _ = _mk(rng, n=3)
    idx = jnp.asarray([[2, 2], [0, 1], [3, 0]], jnp.int32)
    wts = jnp.asarray([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]], jnp.float32)
    comb = jnp.zeros((3, 4), jnp.float32).at[
        jnp.arange(3)[:, None], idx
    ].add(wts)
    got, _ = capacity_moe_local(x, idx, wts, wg, wu, wd, capacity=8)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(dense_moe(x, comb, wg, wu, wd)),
        rtol=1e-4, atol=1e-5,
    )


def test_capacity_overflow_drops_tokens():
    """With capacity 1, later assignments to a hot expert are dropped (their
    contribution is zero) — GShard semantics; capacity_factor makes this rare
    in serving."""
    rng = np.random.default_rng(2)
    x, wg, wu, wd, _, _, _ = _mk(rng, n=4, k=1)
    idx = jnp.zeros((4, 1), jnp.int32)  # everyone -> expert 0
    wts = jnp.ones((4, 1), jnp.float32)
    got, counts = capacity_moe_local(x, idx, wts, wg, wu, wd, capacity=8)
    got_c1, _ = capacity_moe_local(x, idx, wts, wg, wu, wd, capacity=1)
    g, g1 = np.asarray(got), np.asarray(got_c1)
    np.testing.assert_allclose(g1[0], g[0], rtol=1e-4, atol=1e-5)
    assert np.abs(g1[1:]).max() == 0  # dropped rows contribute nothing
    assert int(np.asarray(counts)[0]) == 4  # demand counted pre-drop


def test_quantized_experts_match_dequantized_dense():
    """int8 per-channel experts through the capacity path must match the
    dense compute on the dequantized weights."""
    from rtp_llm_tpu.quant.weight_only import int8_quantize

    rng = np.random.default_rng(3)
    x, wg, wu, wd, idx, wts, comb = _mk(rng)
    qs = {}
    deq = {}
    for nm, w in (("gate", wg), ("up", wu), ("down", wd)):
        q, s = int8_quantize(np.asarray(w, np.float32))
        qs[nm] = (jnp.asarray(q), jnp.asarray(s))
        deq[nm] = jnp.asarray(q.astype(np.float32) * s[:, None, :])
    want = dense_moe(x, comb, deq["gate"], deq["up"], deq["down"])
    got, _ = capacity_moe_local(
        x, idx, wts, qs["gate"][0], qs["up"][0], qs["down"][0],
        scales={"gate": qs["gate"][1], "up": qs["up"][1],
                "down": qs["down"][1]},
        capacity=x.shape[0] * 2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-3)


def test_ep_moe_shard_map_matches_local():
    """Experts sharded over tp: shard_map dispatch + psum combine must equal
    the single-shard result."""
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    x, wg, wu, wd, idx, wts, comb = _mk(rng, e=4)
    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=1))
    want, want_counts = ep_moe(x, idx, wts, wg, wu, wd, mesh=None,
                               capacity_factor=8.0)
    got, counts = jax.jit(
        lambda *a: ep_moe(*a, mesh=mesh, capacity_factor=8.0)
    )(x, idx, wts, wg, wu, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(want_counts))


def test_expert_capacity_rounding():
    assert expert_capacity(64, 4, 2.0) == 32
    assert expert_capacity(10, 4, 2.0) % 8 == 0
    assert expert_capacity(0, 4, 2.0) >= 8


def test_moe_model_quantized_no_dense_fallback(tmp_path):
    """End-to-end: an int8-quantized MoE model generates the same tokens as
    bf16 (greedy, small weights) through the capacity path."""
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, QuantConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.quant import make_quant_transform

    cfg = tiny_config("qwen3_moe")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)

    def eng(quant):
        cfg = tiny_config("qwen3_moe")
        cfg.dtype = "float32"
        transform = make_quant_transform(QuantConfig(method=quant)) \
            if quant else None
        weights = CheckpointLoader(cfg, transform=transform).load(ckpt)
        model = create_model(cfg)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        return LlmEngine(model, weights, econf)

    gc = GenerateConfig(max_new_tokens=5, do_sample=False, ignore_eos=True)
    base = eng(None).generate([1, 5, 9], gc).output_token_ids
    got = eng("int8").generate([1, 5, 9], gc).output_token_ids
    assert len(got) == 5
    # int8 quantization of tiny random weights may flip a late token; the
    # first tokens must agree if the capacity path computes correctly
    assert got[:2] == base[:2]


def test_ep_moe_a2a_matches_local():
    """Ragged all-to-all EP (DeepEP dispatch/combine analog): tokens and
    experts sharded over the same 8-way axis must exactly reproduce the
    single-shard capacity MoE (generous capacity => no drops)."""
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel import make_mesh
    from rtp_llm_tpu.parallel.ep_moe import ep_moe_a2a

    rng = np.random.default_rng(3)
    x, wg, wu, wd, idx, wts, comb = _mk(rng, n=32, h=16, i=24, e=16, k=2)
    want, want_counts = capacity_moe_local(x, idx, wts, wg, wu, wd,
                                           capacity=x.shape[0] * 2)

    mesh = make_mesh(ParallelConfig(dp_size=8, tp_size=1))
    got, counts = ep_moe_a2a(x, idx, wts, wg, wu, wd, mesh=mesh, axis="dp",
                             capacity_factor=16.0)  # generous: no drops
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.asarray(want_counts))


def test_ep_moe_a2a_quantized():
    """a2a EP with int8 experts: matches the dequantized dense reference."""
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel import make_mesh
    from rtp_llm_tpu.parallel.ep_moe import ep_moe_a2a
    from rtp_llm_tpu.quant.weight_only import int8_quantize

    rng = np.random.default_rng(4)
    x, wg, wu, wd, idx, wts, comb = _mk(rng, n=16, h=16, i=24, e=8, k=2)

    def q(w):
        qs = [int8_quantize(np.asarray(w[i])) for i in range(w.shape[0])]
        return (jnp.asarray(np.stack([a for a, _ in qs])),
                jnp.asarray(np.stack([b for _, b in qs])))

    qg, sg = q(wg)
    qu, su = q(wu)
    qd, sd = q(wd)
    deq = lambda qw, s: jnp.asarray(qw, jnp.float32) * s[:, None, :]
    want, _ = capacity_moe_local(
        x, idx, wts, deq(qg, sg), deq(qu, su), deq(qd, sd),
        capacity=x.shape[0] * 2)

    mesh = make_mesh(ParallelConfig(dp_size=8, tp_size=1))
    got, _ = ep_moe_a2a(x, idx, wts, qg, qu, qd, mesh=mesh, axis="dp",
                        scales={"gate": sg, "up": su, "down": sd},
                        capacity_factor=16.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_ep_moe_a2a_skewed_routing_drops_gracefully():
    """All tokens routed to ONE expert with a tight capacity: overflow
    assignments drop (partial output, zeros) without crashing, and the
    surviving assignments still match the local capacity path."""
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel import make_mesh
    from rtp_llm_tpu.parallel.ep_moe import ep_moe_a2a

    rng = np.random.default_rng(5)
    x, wg, wu, wd, _, _, _ = _mk(rng, n=32, h=16, i=24, e=16, k=1)
    idx = jnp.full((32, 1), 5, jnp.int32)  # everyone wants expert 5
    wts = jnp.ones((32, 1), jnp.float32)

    mesh = make_mesh(ParallelConfig(dp_size=8, tp_size=1))
    got, counts = ep_moe_a2a(x, idx, wts, wg, wu, wd, mesh=mesh, axis="dp",
                             capacity_factor=1.0)  # tight
    g = np.asarray(got)
    assert np.isfinite(g).all()
    assert int(counts[5]) == 32  # counts reflect demand, not capacity
    # generous capacity recovers the exact result
    want, _ = capacity_moe_local(x, idx, wts, wg, wu, wd, capacity=64)
    got2, _ = ep_moe_a2a(x, idx, wts, wg, wu, wd, mesh=mesh, axis="dp",
                         capacity_factor=64.0)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
