"""DeepSeek MTP speculative decoding: outputs must be identical to normal
greedy decode; the MTP module only affects speed via acceptance
(reference: MtpExecutor, cpp/normal_engine/speculative/MtpExecutor.h)."""

import numpy as np

from rtp_llm_tpu.config.engine_config import (
    CacheConfig, EngineConfig, SchedulerConfig, SpeculativeConfig,
)
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _engine(ckpt, cfg, method="none"):
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=4, max_seq_len=128,
                                  prefill_buckets=(8, 16, 64)),
        speculative=SpeculativeConfig(method=method, draft_tokens=3),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_mtp_weights_load(tmp_path):
    cfg = tiny_config("deepseek_v3", num_nextn_predict_layers=1)
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    w = CheckpointLoader(cfg).load(ckpt)
    for name in ("mtp_enorm", "mtp_hnorm", "mtp_eh_proj", "mtp_head",
                 "mtp_head_norm", "mtp_kv_a_proj", "mtp_moe_gate"):
        assert name in w, name
    assert w["mtp_eh_proj"].shape == (1, 2 * cfg.hidden_size, cfg.hidden_size)


def test_mtp_spec_matches_normal(tmp_path):
    cfg = tiny_config("deepseek_v3", num_nextn_predict_layers=1)
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    gc = lambda: GenerateConfig(max_new_tokens=10, do_sample=False,
                                ignore_eos=True)
    prompt = [1, 5, 9, 42, 7, 3]
    normal = _engine(ckpt, cfg).generate(prompt, gc()).output_token_ids
    mtp = _engine(ckpt, cfg, method="mtp")
    assert mtp.mtp is not None
    out = mtp.generate(prompt, gc()).output_token_ids
    assert out == normal

    # batched + multi-chunk prefill through the MTP path
    eng = _engine(ckpt, cfg, method="mtp")
    rng = np.random.default_rng(0)
    long_prompt = [int(t) for t in rng.integers(1, 120, size=20)]
    solo = _engine(ckpt, cfg).generate(long_prompt, gc()).output_token_ids
    s1 = eng.enqueue(long_prompt, gc())
    s2 = eng.enqueue(prompt, gc())
    for _ in range(60):
        if s1.is_finished() and s2.is_finished():
            break
        eng.step()
    assert s1.output_token_ids == solo
    assert s2.output_token_ids == normal
