"""Load-time QKV / gate|up weight fusion (models/llama_family.fuse_weights).

Fusion cuts the per-layer GEMM count for single-device serving; it must be
numerically exact (pure concatenation), invertible (dynamic LoRA unfuses),
and skipped when a member carries GPTQ act-order perms or LoRA stacks.
"""

import numpy as np

import jax.numpy as jnp

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.loader.fake_checkpoint import tiny_config, write_fake_checkpoint
from rtp_llm_tpu.models import create_model


def _engine(cfg, ckpt, fuse=True, monkeypatch=None):
    if not fuse:
        monkeypatch.setenv("RTP_DISABLE_WEIGHT_FUSION", "1")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=128,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    return LlmEngine(create_model(cfg), weights, econf)


def test_fused_matches_unfused(tmp_path, monkeypatch):
    """qwen2 carries q/k/v biases -> exercises the qkv_bias concat too."""
    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    prompt = [1, 5, 9, 42, 7, 3, 11]
    gc = lambda: GenerateConfig(max_new_tokens=10, do_sample=False,
                                ignore_eos=True)

    fused = _engine(tiny_config("qwen2"), ckpt)
    assert "qkv_proj" in fused.weights and "q_proj" not in fused.weights
    assert "gate_up_proj" in fused.weights and "gate_proj" not in fused.weights
    assert "qkv_bias" in fused.weights
    out_fused = fused.generate(prompt, gc()).output_token_ids

    unfused = _engine(tiny_config("qwen2"), ckpt, fuse=False,
                      monkeypatch=monkeypatch)
    assert "q_proj" in unfused.weights
    assert out_fused == unfused.generate(prompt, gc()).output_token_ids


def test_unfuse_roundtrip(tmp_path):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)
    fused = model.fuse_weights(weights)
    back = model.unfuse_weights(fused)
    assert set(back) == set(weights)
    for k in weights:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(weights[k]))


def test_unfuse_preserves_quant_markers():
    """Regression: gate_up_proj.int4p must propagate to gate/up on unfuse —
    without the marker the packed uint8 halves would route through
    quantized_matmul and silently compute garbage (advisor r2, high)."""
    cfg = tiny_config("qwen2")
    model = create_model(cfg)
    L = cfg.num_layers
    K, d = cfg.hidden_size, cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_kv_heads
    I = cfg.intermediate_size
    G = 2  # scale groups
    from rtp_llm_tpu.quant.weight_only import MARKER
    mark = MARKER

    w = {}
    outs = {"q_proj": hq * d, "k_proj": hkv * d, "v_proj": hkv * d,
            "gate_proj": I, "up_proj": I}
    for name, n in outs.items():
        w[name] = jnp.zeros((L, K // 2, n), jnp.uint8)  # split-half packed
        w[name + ".scale"] = jnp.ones((L, G, n), jnp.float32)
        w[name + ".zero"] = jnp.zeros((L, G, n), jnp.float32)
        w[name + ".int4p"] = mark
    # remaining per-layer tensors so fuse_weights' group scan sees a model
    fused = model.fuse_weights(dict(w))
    assert "qkv_proj.int4p" in fused and "gate_up_proj.int4p" in fused

    back = model.unfuse_weights(fused)
    for name in outs:
        assert name + ".int4p" in back, name
        assert back[name].shape == w[name].shape
    assert "gate_up_proj.int4p" not in back and "qkv_proj.int4p" not in back


def test_fusion_skips_act_order_and_lora(tmp_path):
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt)
    model = create_model(cfg)

    w = dict(weights)
    w["q_proj.act_perm"] = jnp.zeros(
        (cfg.num_layers, cfg.hidden_size), jnp.int32)
    out = model.fuse_weights(w)
    assert "qkv_proj" not in out and "q_proj" in out
    assert "gate_up_proj" in out  # mlp group unaffected

    w2 = dict(weights)
    w2["v_proj.lora_a"] = jnp.zeros((1, cfg.num_layers, cfg.hidden_size, 2))
    out2 = model.fuse_weights(w2)
    assert "qkv_proj" not in out2


def test_dynamic_lora_unfuses_live_engine(tmp_path):
    """POSTing an adapter to a fused engine must take effect: the refresh
    path unfuses so the per-tensor LoRA stacks apply."""
    from rtp_llm_tpu.lora import LoraManager

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    eng = _engine(tiny_config("qwen2"), ckpt)
    assert "qkv_proj" in eng.weights

    mgr = LoraManager(cfg.num_layers)
    eng.set_lora_manager(mgr)
    # no adapters yet: fusion stays
    assert "qkv_proj" in eng.weights

    rng = np.random.default_rng(0)
    a = {}
    for l in range(cfg.num_layers):
        a[f"base_model.model.model.layers.{l}.self_attn.q_proj.lora_A.weight"] = \
            rng.standard_normal((2, cfg.hidden_size)).astype(np.float32)
        a[f"base_model.model.model.layers.{l}.self_attn.q_proj.lora_B.weight"] = \
            rng.standard_normal(
                (cfg.num_attention_heads * cfg.head_dim, 2)
            ).astype(np.float32) * 0.5
    import safetensors.numpy

    adir = tmp_path / "adapter"
    adir.mkdir()
    safetensors.numpy.save_file(a, str(adir / "adapter_model.safetensors"))
    import json

    (adir / "adapter_config.json").write_text(
        json.dumps({"r": 2, "lora_alpha": 2}))
    mgr.add_adapter(str(adir), "t")
    eng.refresh_lora_weights()
    assert "qkv_proj" not in eng.weights and "q_proj" in eng.weights

    prompt = [1, 5, 9, 42]
    gc = lambda adapter=None: GenerateConfig(
        max_new_tokens=8, do_sample=False, ignore_eos=True,
        adapter_name=adapter)
    base = eng.generate(prompt, gc()).output_token_ids
    with_lora = eng.generate(prompt, gc("t")).output_token_ids
    assert base != with_lora, "adapter must change generations"
