import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtp_llm_tpu.ops import (
    apply_rope,
    compute_rope_freqs,
    fused_add_rms_norm,
    rms_norm,
    silu_and_mul,
)
from rtp_llm_tpu.ops.kv_cache import token_slots, write_kv
from rtp_llm_tpu.ops.sampling import SamplingParams, sample_tokens


def test_rms_norm_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64)).astype(np.float32)
    w = rng.normal(size=(64,)).astype(np.float32)
    got = rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_fused_add_rms_norm():
    x = jnp.ones((2, 8))
    r = jnp.full((2, 8), 2.0)
    w = jnp.ones((8,))
    y, new_r = fused_add_rms_norm(x, r, w)
    np.testing.assert_allclose(np.asarray(new_r), 3.0)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-5)  # constant rows -> 1


def test_silu_and_mul():
    g = jnp.array([1.0, -1.0])
    u = jnp.array([2.0, 3.0])
    got = silu_and_mul(g, u)
    want = (np.array([1.0, -1.0]) / (1 + np.exp(np.array([-1.0, 1.0])))) * np.array([2.0, 3.0])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_rope_matches_hf_reference():
    """Check against the standard HF rotate-half formulation."""
    d, t = 8, 5
    cos, sin = compute_rope_freqs(d, 16, theta=10000.0)
    x = np.random.default_rng(1).normal(size=(t, 2, d)).astype(np.float32)
    pos = jnp.arange(t)
    got = np.asarray(apply_rope(jnp.asarray(x), pos, cos, sin))

    # HF: q*cos + rotate_half(q)*sin with cos/sin duplicated over halves
    cos_np, sin_np = np.asarray(cos), np.asarray(sin)
    cos_full = np.concatenate([cos_np, cos_np], -1)[:t][:, None, :]
    sin_full = np.concatenate([sin_np, sin_np], -1)[:t][:, None, :]
    rot = np.concatenate([-x[..., d // 2 :], x[..., : d // 2]], -1)
    want = x * cos_full + rot * sin_full
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rope_scaling_variants_run():
    for scaling in (
        {"rope_type": "linear", "factor": 2.0},
        {"rope_type": "dynamic", "factor": 2.0, "original_max_position_embeddings": 8},
        {"rope_type": "yarn", "factor": 4.0, "original_max_position_embeddings": 8},
        {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
         "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
    ):
        cos, sin = compute_rope_freqs(16, 32, rope_scaling=scaling)
        assert cos.shape == (32, 8)
        assert np.isfinite(np.asarray(cos)).all()


def test_token_slots_and_write_kv():
    bs = 4
    k_cache = jnp.zeros((3 * bs, 2 * 8))
    v_cache = jnp.zeros((3 * bs, 2 * 8))
    block_table = jnp.array([2, 1, 0], dtype=jnp.int32)
    positions = jnp.array([0, 1, 4, 5], dtype=jnp.int32)  # block 2 offs 0,1; block 1 offs 0,1
    valid = jnp.array([True, True, True, False])
    slots = token_slots(positions, block_table, bs, valid)
    np.testing.assert_array_equal(np.asarray(slots)[:3], [8, 9, 4])
    assert int(slots[3]) >= 3 * bs  # invalid -> out of bounds (dropped on scatter)

    k_new = jnp.arange(4 * 2 * 8, dtype=jnp.float32).reshape(4, 2, 8)
    k2, v2 = write_kv(k_cache, v_cache, k_new, k_new, slots)
    # cache layout [slots, Hkv*D]: token i occupies row slot_i
    np.testing.assert_allclose(np.asarray(k2[8]), np.asarray(k_new[0]).reshape(-1))
    np.testing.assert_allclose(np.asarray(k2[9]), np.asarray(k_new[1]).reshape(-1))
    np.testing.assert_allclose(np.asarray(k2[4]), np.asarray(k_new[2]).reshape(-1))
    # invalid token dropped: nothing else written
    assert float(jnp.sum(k2)) == pytest.approx(
        float(jnp.sum(k_new[0]) + jnp.sum(k_new[1]) + jnp.sum(k_new[2]))
    )


def _mk_params(b, **over):
    p = SamplingParams.zeros(b)._asdict()
    p.update(over)
    return SamplingParams(**p)


def test_sample_greedy():
    logits = jnp.array([[0.1, 5.0, 0.2, 0.0], [9.0, 0.0, 0.0, 0.0]])
    params = _mk_params(2)
    toks, lp, counts = sample_tokens(
        logits, params, jnp.zeros((2, 4), bool), jnp.zeros((2, 4), jnp.int32), [], jax.random.key(0)
    )
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])
    assert np.asarray(counts)[0, 1] == 1 and np.asarray(counts)[1, 0] == 1
    assert (np.asarray(lp) <= 0).all()


def test_sample_topk_restricts_support():
    logits = jnp.tile(jnp.array([[10.0, 9.0, -1.0, -2.0]]), (1, 1))
    params = _mk_params(
        1,
        do_sample=jnp.array([True]),
        top_k=jnp.array([2], jnp.int32),
        temperature=jnp.array([10.0]),  # flat -> would sample tails without top-k
    )
    for i in range(20):
        toks, _, _ = sample_tokens(
            logits, params, jnp.zeros((1, 4), bool), jnp.zeros((1, 4), jnp.int32),
            [], jax.random.key(i),
        )
        assert int(toks[0]) in (0, 1)


def test_sample_topp_keeps_head():
    logits = jnp.array([[5.0, 4.9, -10.0, -10.0]])
    params = _mk_params(
        1, do_sample=jnp.array([True]), top_p=jnp.array([0.5]), temperature=jnp.array([1.0])
    )
    for i in range(10):
        toks, _, _ = sample_tokens(
            logits, params, jnp.zeros((1, 4), bool), jnp.zeros((1, 4), jnp.int32),
            [], jax.random.key(i),
        )
        assert int(toks[0]) == 0  # p(0) ~ 0.52 >= top_p alone


def test_repetition_penalty_and_eos_ban():
    logits = jnp.array([[2.0, 1.9, 0.0, 1.95]])
    prompt_mask = jnp.zeros((1, 4), bool).at[0, 0].set(True)
    params = _mk_params(1, repetition_penalty=jnp.array([100.0]), ban_eos=jnp.array([True]))
    toks, _, _ = sample_tokens(
        logits, params, prompt_mask, jnp.zeros((1, 4), jnp.int32), [3], jax.random.key(0)
    )
    # 0 penalized away, 3 (eos) banned -> 1 wins
    assert int(toks[0]) == 1


def test_sample_unrestricted_keeps_full_distribution():
    """top_k=0 + top_p=1.0 (the OpenAI default) must sample the FULL
    distribution, not a silently truncated top-64 (advisor round-1 finding):
    with uniform logits over V >> 64 every token is reachable."""
    from rtp_llm_tpu.ops.sampling import TOPK_CAP, _topk_topp_mask

    v = 4 * TOPK_CAP
    logits = jnp.zeros((1, v), jnp.float32)
    params = _mk_params(1, do_sample=jnp.array([True]),
                        temperature=jnp.array([1.0]))
    masked = _topk_topp_mask(logits, params)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(logits))
    # and end-to-end: tokens outside the top-cap must appear
    seen_past_cap = False
    for i in range(50):
        toks, _, _ = sample_tokens(
            logits, params, jnp.zeros((1, v), bool),
            jnp.zeros((1, v), jnp.int32), [], jax.random.key(i),
        )
        if int(toks[0]) >= TOPK_CAP:
            seen_past_cap = True
            break
    assert seen_past_cap


def test_sample_topk_above_cap_degrades_to_unrestricted():
    """Requested top_k > TOPK_CAP cannot be honored exactly; it must degrade
    to the full distribution (less restrictive) rather than silently
    truncating at the cap."""
    from rtp_llm_tpu.ops.sampling import TOPK_CAP, _topk_topp_mask

    v = 4 * TOPK_CAP
    logits = jnp.zeros((1, v), jnp.float32)
    params = _mk_params(1, do_sample=jnp.array([True]),
                        top_k=jnp.array([TOPK_CAP + 10], jnp.int32))
    masked = _topk_topp_mask(logits, params)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(logits))


def test_sample_mixed_rows_restricted_and_not():
    """Per-row semantics: a restricted row keeps its nucleus while an
    unrestricted row in the same batch keeps everything."""
    from rtp_llm_tpu.ops.sampling import NEG_INF, _topk_topp_mask

    v = 256
    base = jnp.arange(v, dtype=jnp.float32) / v  # increasing
    logits = jnp.stack([base, base])
    params = _mk_params(
        2, do_sample=jnp.array([True, True]),
        top_k=jnp.array([2, 0], jnp.int32),
    )
    masked = np.asarray(_topk_topp_mask(logits, params))
    assert (masked[0] == NEG_INF).sum() == v - 2  # top-2 only
    np.testing.assert_allclose(masked[1], np.asarray(base))
