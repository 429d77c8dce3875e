"""Kimi-Linear hybrid KDA + MLA model (reference: models/kimi_linear/,
models_py/model_desc/kimi_linear.py, triton_kernels/kimi_kda/).

No transformers class exists for kimi_linear, so correctness rests on:
  * kda_rule vs an independent per-token numpy recurrence,
  * decode self-consistency: every generated token must equal the argmax of
    the teacher-forced full-sequence forward at the previous position
    (validates conv/recurrent state carry between prefill and decode),
  * chunked prefill state carry.
"""

import numpy as np

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import ModelInputs, create_model


def test_kda_rule_matches_naive():
    import jax.numpy as jnp

    from rtp_llm_tpu.ops.linear_attention import kda_rule

    rng = np.random.default_rng(0)
    b, t, h, dk, dv = 2, 5, 3, 4, 6
    q = rng.standard_normal((b, t, h, dk))
    k = rng.standard_normal((b, t, h, dk))
    v = rng.standard_normal((b, t, h, dv))
    g = -np.abs(rng.standard_normal((b, t, h, dk)))  # log decay <= 0
    beta = rng.uniform(0.1, 0.9, (b, t, h))
    S0 = rng.standard_normal((b, h, dk, dv)) * 0.1
    valid = np.ones((b, t), bool)
    valid[1, 3:] = False  # padded tail must leave state untouched

    out, S_fin = kda_rule(
        jnp.asarray(q, jnp.float32), jnp.asarray(k, jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(g, jnp.float32),
        jnp.asarray(beta, jnp.float32), jnp.asarray(S0, jnp.float32),
        jnp.asarray(valid),
    )

    # independent scalar-loop recurrence
    scale = dk ** -0.5
    S = S0.copy()
    expect = np.zeros((b, t, h, dv))
    for bi in range(b):
        for ti in range(t):
            for hi in range(h):
                Sd = S[bi, hi] * np.exp(g[bi, ti, hi])[:, None]
                d = (v[bi, ti, hi] - Sd.T @ k[bi, ti, hi]) * beta[bi, ti, hi]
                Sn = Sd + np.outer(k[bi, ti, hi], d)
                expect[bi, ti, hi] = Sn.T @ (q[bi, ti, hi] * scale)
                if valid[bi, ti]:
                    S[bi, hi] = Sn
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(S_fin), S, rtol=2e-5, atol=2e-5)


def _engine(ckpt, prefill_buckets=(16, 64)):
    cfg = tiny_config("kimi_linear")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=prefill_buckets),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_decode_matches_teacher_forced(tmp_path):
    """Greedy decode through the engine (paged MLA cache + per-slot KDA
    state) must reproduce the argmax chain of a teacher-forced full-sequence
    forward — catches any state-carry bug between prefill and decode."""
    import jax.numpy as jnp

    cfg = tiny_config("kimi_linear")
    ckpt = write_fake_checkpoint(str(tmp_path / "kl"), cfg)
    prompt = [1, 5, 9, 42, 7]
    n = 8
    out = _engine(ckpt).generate(prompt, GenerateConfig(
        max_new_tokens=n, do_sample=False, ignore_eos=True,
    )).output_token_ids
    assert len(out) == n

    cfg2 = tiny_config("kimi_linear")
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)
    cache = model.init_cache(16, 4, jnp.float32, max_slots=4)
    seq = prompt + out
    t = len(seq)
    mb = 8
    inputs = ModelInputs(
        tokens=jnp.asarray([seq], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None, :],
        block_tables=jnp.asarray([[j + 1 for j in range(mb)]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )
    o, _ = model.forward(weights, cache, inputs, need_all_logits=True)
    chain = np.argmax(np.asarray(o.all_logits[0]), axis=-1)
    for j, tok in enumerate(out):
        assert int(chain[len(prompt) - 1 + j]) == tok, (j, out, chain)


def test_chunked_prefill_state_carry(tmp_path):
    """A prompt longer than the largest bucket splits into chunks; KDA conv
    tail + recurrent state and the MLA latent rows must carry across."""
    cfg = tiny_config("kimi_linear")
    ckpt = write_fake_checkpoint(str(tmp_path / "klc"), cfg)
    prompt = list(np.random.default_rng(3).integers(3, 120, size=40))
    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False,
                                ignore_eos=True)
    one = _engine(ckpt, prefill_buckets=(64,)).generate(
        [int(x) for x in prompt], gc()).output_token_ids
    chunked = _engine(ckpt, prefill_buckets=(16,)).generate(
        [int(x) for x in prompt], gc()).output_token_ids
    assert one == chunked


def test_hybrid_cache_sharded_under_mesh(tmp_path):
    """Under a tp mesh the rank-5 KDA recurrent state must keep its lane
    split (dim 3, the key head dim) — replicating it multiplies hybrid-model
    state memory by tp (regression from the rank-aware device_put)."""
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel import make_mesh

    cfg = tiny_config("kimi_linear")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "klm"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=1))
    eng = LlmEngine(create_model(cfg), weights, econf, mesh=mesh)

    def _dim3_spec(a):
        spec = a.sharding.spec
        return spec[3] if len(spec) > 3 else None

    assert _dim3_spec(eng.kv["kv"]) == "tp"
    assert _dim3_spec(eng.kv["rec"]) == "tp", "rec state must stay sharded"
    assert _dim3_spec(eng.kv["conv"]) == "tp"

    prompt = [1, 5, 9, 42, 7]
    gc = GenerateConfig(max_new_tokens=6, do_sample=False, ignore_eos=True)
    got = eng.generate(prompt, gc).output_token_ids
    ckpt2 = write_fake_checkpoint(str(tmp_path / "kls"), cfg)
    assert got == _engine(ckpt2).generate(prompt, gc).output_token_ids
