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
