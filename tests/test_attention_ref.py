import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.ops.attention import paged_attention_ref
from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv


def dense_attention(q, k, v, causal_offset, kv_len, sliding_window=0):
    """Naive dense reference: q [T,Hq,D], k/v [S,H,D]."""
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    g = hq // hkv
    qf = q.reshape(t, hkv, g, d).astype(np.float64)
    scores = np.einsum("thgd,shd->hgts", qf, k.astype(np.float64)) / np.sqrt(d)
    kv_pos = np.arange(s)
    q_pos = causal_offset + np.arange(t)
    mask = (kv_pos[None, :] <= q_pos[:, None]) & (kv_pos[None, :] < kv_len)
    if sliding_window:
        mask &= kv_pos[None, :] > q_pos[:, None] - sliding_window
    scores = np.where(mask[None, None], scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("hgts,shd->thgd", p, v.astype(np.float64))
    return out.reshape(t, hq, d)


def build_cache(k_tokens, v_tokens, block_table, block_size, num_blocks, hkv, d):
    k_cache = jnp.zeros((num_blocks * block_size, hkv * d), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    t = k_tokens.shape[0]
    pos = jnp.arange(t, dtype=jnp.int32)
    slots = token_slots(pos, jnp.asarray(block_table, jnp.int32), block_size, jnp.ones(t, bool))
    return write_kv(k_cache, v_cache, jnp.asarray(k_tokens), jnp.asarray(v_tokens), slots)


def test_paged_prefill_matches_dense():
    rng = np.random.default_rng(0)
    t, hq, hkv, d, bsz = 10, 4, 2, 16, 4
    k = rng.normal(size=(t, hkv, d)).astype(np.float32)
    v = rng.normal(size=(t, hkv, d)).astype(np.float32)
    q = rng.normal(size=(t, hq, d)).astype(np.float32)
    block_table = [3, 1, 5]  # 3 blocks cover 12 >= 10
    k_cache, v_cache = build_cache(k, v, block_table, bsz, 8, hkv, d)

    got = paged_attention_ref(
        jnp.asarray(q)[None],
        k_cache,
        v_cache,
        jnp.asarray([block_table], jnp.int32),
        kv_lens=jnp.array([t], jnp.int32),
        q_offsets=jnp.array([0], jnp.int32),
        sm_scale=1.0 / np.sqrt(d),
        block_size=bsz,
    )[0]
    want = dense_attention(q, k, v, 0, t)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_paged_decode_matches_dense_batch():
    rng = np.random.default_rng(1)
    hq, hkv, d, bsz = 8, 4, 16, 4
    num_blocks, max_blocks = 16, 4
    lens = [7, 13]  # two sequences mid-decode
    k_cache = jnp.zeros((num_blocks * bsz, hkv * d), jnp.float32)
    v_cache = jnp.zeros_like(k_cache)
    tables, ks, vs = [], [], []
    next_block = 1  # 0 = null block
    for L in lens:
        nb = (L + bsz - 1) // bsz
        bt = list(range(next_block, next_block + nb)) + [0] * (max_blocks - nb)
        next_block += nb
        kk = rng.normal(size=(L, hkv, d)).astype(np.float32)
        vv = rng.normal(size=(L, hkv, d)).astype(np.float32)
        pos = jnp.arange(L, dtype=jnp.int32)
        slots = token_slots(pos, jnp.asarray(bt, jnp.int32), bsz, jnp.ones(L, bool))
        k_cache, v_cache = write_kv(k_cache, v_cache, jnp.asarray(kk), jnp.asarray(vv), slots)
        tables.append(bt)
        ks.append(kk)
        vs.append(vv)

    q = rng.normal(size=(2, 1, hq, d)).astype(np.float32)
    got = paged_attention_ref(
        jnp.asarray(q),
        k_cache,
        v_cache,
        jnp.asarray(tables, jnp.int32),
        kv_lens=jnp.asarray(lens, jnp.int32),
        q_offsets=jnp.asarray([L - 1 for L in lens], jnp.int32),
        sm_scale=1.0 / np.sqrt(d),
        block_size=bsz,
    )
    for i, L in enumerate(lens):
        want = dense_attention(q[i], ks[i], vs[i], L - 1, L)
        np.testing.assert_allclose(np.asarray(got[i]), want, rtol=1e-4, atol=1e-5)


def test_inactive_row_produces_zeros_not_nan():
    k_cache = jnp.zeros((16, 2 * 8), jnp.float32)
    q = jnp.ones((1, 1, 4, 8), jnp.float32)
    out = paged_attention_ref(
        q,
        k_cache,
        k_cache,
        jnp.zeros((1, 2), jnp.int32),
        kv_lens=jnp.array([0], jnp.int32),
        q_offsets=jnp.array([0], jnp.int32),
        sm_scale=0.35,
        block_size=4,
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_sliding_window():
    rng = np.random.default_rng(2)
    t, hq, hkv, d, bsz, w = 12, 2, 2, 8, 4, 4
    k = rng.normal(size=(t, hkv, d)).astype(np.float32)
    v = rng.normal(size=(t, hkv, d)).astype(np.float32)
    q = rng.normal(size=(t, hq, d)).astype(np.float32)
    k_cache, v_cache = build_cache(k, v, [1, 2, 3], bsz, 8, hkv, d)
    got = paged_attention_ref(
        jnp.asarray(q)[None], k_cache, v_cache,
        jnp.asarray([[1, 2, 3]], jnp.int32),
        kv_lens=jnp.array([t], jnp.int32),
        q_offsets=jnp.array([0], jnp.int32),
        sm_scale=1.0 / np.sqrt(d),
        block_size=bsz,
        sliding_window=w,
    )[0]
    want = dense_attention(q, k, v, 0, t, sliding_window=w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
