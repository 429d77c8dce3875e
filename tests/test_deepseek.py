"""DeepSeek V3 (MLA + group-routed MoE) parity tests vs HF transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.models import ModelInputs, create_model


def _prefill_inputs(prompt, max_blocks=4, bs=16):
    t = len(prompt)
    return ModelInputs(
        tokens=jnp.asarray([prompt], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None, :],
        block_tables=jnp.asarray([[j + 1 for j in range(max_blocks)]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )


def test_config_roundtrip(tmp_path):
    cfg = tiny_config("deepseek_v3")
    ckpt = write_fake_checkpoint(str(tmp_path / "d"), cfg)
    back = ModelConfig.from_pretrained(ckpt)
    assert back.kv_lora_rank == cfg.kv_lora_rank
    assert back.q_lora_rank == cfg.q_lora_rank
    assert back.first_moe_layer == 1
    assert back.moe_router_score_fn == "sigmoid"
    assert back.moe_router_bias
    assert back.head_dim == cfg.qk_nope_head_dim + cfg.qk_rope_head_dim


def test_forward_matches_hf(tmp_path):
    cfg = tiny_config("deepseek_v3")
    ckpt = write_fake_checkpoint(
        str(tmp_path / "d3"), cfg,
        extra_config={"architectures": ["DeepseekV3ForCausalLM"]},
    )
    cfg2 = ModelConfig.from_pretrained(ckpt)
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)
    cache = model.init_cache(8, 16, jnp.float32)

    prompt = [1, 5, 9, 42, 7, 100, 3]
    out, _ = model.forward(weights, cache, _prefill_inputs(prompt),
                           need_all_logits=True)
    ours = np.asarray(out.all_logits[0])

    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(ckpt, torch_dtype=torch.float32)
    m.eval()
    with torch.no_grad():
        theirs = m(torch.tensor([prompt])).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_decode_matches_prefill(tmp_path):
    cfg = tiny_config("deepseek_v3")
    ckpt = write_fake_checkpoint(str(tmp_path / "dd"), cfg)
    cfg2 = ModelConfig.from_pretrained(ckpt)
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)

    prompt = [1, 5, 9, 42, 7, 100, 3, 55]
    cache = model.init_cache(8, 16, jnp.float32)
    out_full, _ = model.forward(
        weights, cache, _prefill_inputs(prompt), need_all_logits=True
    )
    full = np.asarray(out_full.all_logits[0])

    cache = model.init_cache(8, 16, jnp.float32)
    out, cache = model.forward(weights, cache, _prefill_inputs(prompt[:4]))
    np.testing.assert_allclose(np.asarray(out.logits[0]), full[3],
                               rtol=1e-5, atol=1e-5)
    for i in range(4, len(prompt)):
        inp = ModelInputs(
            tokens=jnp.asarray([[prompt[i]]], jnp.int32),
            positions=jnp.asarray([[i]], jnp.int32),
            block_tables=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
            kv_lens=jnp.asarray([i + 1], jnp.int32),
            q_offsets=jnp.asarray([i], jnp.int32),
        )
        out, cache = model.forward(weights, cache, inp)
        np.testing.assert_allclose(np.asarray(out.logits[0]), full[i],
                                   rtol=1e-5, atol=1e-5)


def test_engine_e2e_deepseek(tmp_path):
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine

    cfg = tiny_config("deepseek_v3")
    ckpt = write_fake_checkpoint(str(tmp_path / "de"), cfg)
    cfg2 = ModelConfig.from_pretrained(ckpt)
    cfg2.dtype = "float32"
    weights = CheckpointLoader(cfg2).load(ckpt)
    model = create_model(cfg2)
    econf = EngineConfig(
        cache=CacheConfig(block_size=16, test_num_blocks=32),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=128,
                                  prefill_buckets=(16, 64)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf)
    s = eng.generate([1, 5, 9], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True))
    assert len(s.output_token_ids) == 6
    # greedy continuation consistent with a fresh engine
    eng2 = LlmEngine(model, weights, econf)
    s2 = eng2.generate([1, 5, 9], GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True))
    assert s.output_token_ids == s2.output_token_ids


class TestDSA:
    """DeepSeek-V3.2 DSA sparse attention (reference:
    models_py/modules/hybrid/indexer.py + fast_topk; config keys
    index_topk/index_head_dim/index_n_heads, deepseek_v2.py:710-714)."""

    def _cfg(self, topk):
        cfg = tiny_config("deepseek_v3")
        cfg.dtype = "float32"
        cfg.indexer_topk = topk
        cfg.indexer_head_dim = 16  # rope slice = 16 - dr(8) = 8 = dr
        cfg.indexer_n_heads = 4
        return cfg

    def _engine(self, ckpt, topk, blocks=64, max_seq=96):
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, SchedulerConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine

        cfg = self._cfg(topk)
        weights = CheckpointLoader(cfg).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=blocks),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=max_seq,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        return LlmEngine(create_model(cfg), weights, econf)

    def test_sparse_matches_dense_when_topk_covers_context(self, tmp_path):
        """With kv_len <= topk the indexer selects every live row, so the
        sparse decode path must reproduce dense decoding EXACTLY (the
        sparse program is engaged: bucket 96 tokens > topk 16)."""
        cfg = self._cfg(16)
        ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)

        dense_cfg = tiny_config("deepseek_v3")
        dense_cfg.dtype = "float32"
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, SchedulerConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine

        dweights = CheckpointLoader(dense_cfg).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        dense = LlmEngine(create_model(dense_cfg), dweights, econf)

        sparse = self._engine(ckpt, topk=16)
        assert sparse.model.use_dsa and isinstance(sparse.kv, dict)

        gc = GenerateConfig(max_new_tokens=8, do_sample=False,
                            ignore_eos=True)
        prompt = [1, 5, 9, 42, 7, 3]  # total 14 <= topk 16 throughout
        want = dense.generate(prompt, gc).output_token_ids
        got = sparse.generate(prompt, gc).output_token_ids
        assert got == want

    def test_sparse_restricts_beyond_topk(self, tmp_path):
        """With kv_len > topk the sparse path attends to a strict subset:
        it must stay finite/deterministic and (generically) diverge from
        dense attention."""
        cfg = self._cfg(8)
        ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
        sparse = self._engine(ckpt, topk=8)
        gc = GenerateConfig(max_new_tokens=16, do_sample=False,
                            ignore_eos=True)
        prompt = [1, 5, 9, 42, 7, 3, 11, 2, 8, 4, 6, 10]
        out = sparse.generate(prompt, gc).output_token_ids
        assert len(out) == 16

        dense_cfg = tiny_config("deepseek_v3")
        dense_cfg.dtype = "float32"
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, SchedulerConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine

        dweights = CheckpointLoader(dense_cfg).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        dense = LlmEngine(create_model(dense_cfg), dweights, econf)
        dense_out = dense.generate(prompt, gc).output_token_ids
        assert out != dense_out, "topk restriction should alter generations"

    def test_config_parses_index_fields(self):
        from rtp_llm_tpu.config.model_config import ModelConfig

        cfg = ModelConfig.from_hf_config({
            "model_type": "deepseek_v32", "vocab_size": 64,
            "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "kv_lora_rank": 32, "q_lora_rank": 24,
            "qk_nope_head_dim": 16, "qk_rope_head_dim": 8, "v_head_dim": 16,
            "index_topk": 2048, "index_head_dim": 128, "index_n_heads": 64,
        }, None)
        assert cfg.indexer_topk == 2048 and cfg.indexer_n_heads == 64
        assert cfg.indexer_head_dim == 128

    def test_sparse_verify_window_matches_dense(self, tmp_path):
        """Speculative verify (T=K+1 window) runs the sparse path too: with
        topk covering the context, prompt-lookup spec decoding on a DSA
        engine must match the dense engine exactly."""
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine

        cfg = self._cfg(24)
        ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)

        def build(with_dsa, spec):
            c = self._cfg(24) if with_dsa else tiny_config("deepseek_v3")
            c.dtype = "float32"
            weights = CheckpointLoader(c).load(ckpt)
            econf = EngineConfig(
                cache=CacheConfig(block_size=4, test_num_blocks=64),
                scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                          prefill_buckets=(16,)),
                speculative=(SpeculativeConfig(method="prompt_lookup",
                                               draft_tokens=3)
                             if spec else SpeculativeConfig()),
            )
            econf.quant.kv_cache_dtype = "float32"
            return LlmEngine(create_model(c), weights, econf)

        gc = GenerateConfig(max_new_tokens=10, do_sample=False,
                            ignore_eos=True)
        prompt = [1, 5, 9, 2, 5, 9, 2]  # repetition feeds prompt-lookup
        want = build(False, False).generate(prompt, gc).output_token_ids
        got = build(True, True).generate(prompt, gc).output_token_ids
        assert got == want

    def test_dsa_engine_under_mesh(self, tmp_path):
        """DSA's dict cache (rank-3 idx_k beside rank-4 latent) must place
        under a tp mesh (rank-aware sharding) and still decode correctly."""
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, ParallelConfig, SchedulerConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine
        from rtp_llm_tpu.parallel import make_mesh

        cfg = self._cfg(16)
        ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
        weights = CheckpointLoader(cfg).load(ckpt)
        mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=1))
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        eng = LlmEngine(create_model(cfg), weights, econf, mesh=mesh)
        gc = GenerateConfig(max_new_tokens=6, do_sample=False,
                            ignore_eos=True)
        out = eng.generate([1, 5, 9, 42], gc).output_token_ids
        assert len(out) == 6

        solo = self._engine(ckpt, topk=16)
        assert out == solo.generate([1, 5, 9, 42], gc).output_token_ids

    def test_chunked_sparse_prefill_matches_dense(self, tmp_path):
        """Prefill windows longer than _DSA_CHUNK run the scanned sparse
        path; with topk covering the whole context it must match dense
        EXACTLY (prompt 20 tokens > chunk 8 engages the scan; topk 32 >=
        every kv_len reached)."""
        from rtp_llm_tpu.config.engine_config import (
            CacheConfig, EngineConfig, SchedulerConfig,
        )
        from rtp_llm_tpu.engine import LlmEngine
        from rtp_llm_tpu.models.deepseek import DeepseekModel

        assert DeepseekModel._DSA_CHUNK < 20
        cfg = self._cfg(32)
        ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
        prompt = list(range(1, 21))  # 20-token prompt
        gc = GenerateConfig(max_new_tokens=6, do_sample=False,
                            ignore_eos=True)
        # prefill bucket 32 so the whole prompt is one >chunk window
        cfgs = self._cfg(32)
        weights = CheckpointLoader(cfgs).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                      prefill_buckets=(32,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        sparse = LlmEngine(create_model(cfgs), weights, econf)
        assert sparse.model.use_dsa
        got = sparse.generate(prompt, gc).output_token_ids

        dense_cfg = tiny_config("deepseek_v3")
        dense_cfg.dtype = "float32"
        dweights = CheckpointLoader(dense_cfg).load(ckpt)
        econf2 = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=96,
                                      prefill_buckets=(32,)),
        )
        econf2.quant.kv_cache_dtype = "float32"
        dense = LlmEngine(create_model(dense_cfg), dweights, econf2)
        want = dense.generate(prompt, gc).output_token_ids
        assert got == want
