"""Pallas paged prefill attention vs jnp reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.ops.attention import paged_attention_ref
from rtp_llm_tpu.ops.attention.pallas_prefill import paged_prefill_attention

BS = 16


def _setup(t, hq=8, hkv=2, d=128, nb=64, mb=None, q_offset=0, kv_len=None, seed=0):
    rng = np.random.default_rng(seed)
    kv_len = kv_len if kv_len is not None else q_offset + t
    if mb is None:
        mb = -(-kv_len // BS) + 1
    q = rng.standard_normal((t, hq, d)).astype(np.float32)
    k_cache = rng.standard_normal((nb * BS, hkv * d)).astype(np.float32)
    v_cache = rng.standard_normal((nb * BS, hkv * d)).astype(np.float32)
    bt = rng.permutation(np.arange(1, nb))[:mb].astype(np.int32)
    return (jnp.asarray(q), jnp.asarray(k_cache), jnp.asarray(v_cache),
            jnp.asarray(bt), jnp.int32(q_offset), jnp.int32(kv_len))


def _ref(q, k, v, bt, q_offset, kv_len, sm):
    return paged_attention_ref(
        q[None], k, v, bt[None], jnp.asarray([kv_len]), jnp.asarray([q_offset]),
        sm, block_size=BS,
    )[0]


@pytest.mark.parametrize("t,q_offset", [(64, 0), (128, 0), (128, 37), (256, 100)])
def test_matches_reference(t, q_offset):
    q, k, v, bt, qo, kl = _setup(t, q_offset=q_offset)
    sm = 1.0 / np.sqrt(q.shape[-1])
    got = paged_prefill_attention(q, k, v, bt, qo, kl, sm, BS, interpret=True)
    want = _ref(q, k, v, bt, qo, kl, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_padded_bucket_tail():
    """kv_len < q_offset + T: bucket padding rows produce zeros."""
    t, q_offset, real = 128, 10, 50  # only 50 real query tokens
    q, k, v, bt, qo, _ = _setup(t, q_offset=q_offset)
    kl = jnp.int32(q_offset + real)
    sm = 0.1
    got = paged_prefill_attention(q, k, v, bt, qo, kl, sm, BS, interpret=True)
    want = _ref(q, k, v, bt, qo, kl, sm)
    # padding rows (query pos >= kv_len) are don't-care: kernel zeroes them,
    # the reference computes values — compare only the real rows
    np.testing.assert_allclose(np.asarray(got[:real]), np.asarray(want[:real]),
                               rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(got[real:]) == 0)


def test_mha_no_gqa():
    q, k, v, bt, qo, kl = _setup(128, hq=4, hkv=4)
    sm = 0.09
    got = paged_prefill_attention(q, k, v, bt, qo, kl, sm, BS, interpret=True)
    want = _ref(q, k, v, bt, qo, kl, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
