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
