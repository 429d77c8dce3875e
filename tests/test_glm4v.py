"""chatglm4v (GLM-4V): EVA2-CLIP tower + chatglm trunk.

Reference: models/chat_glm_v4_vision.py + chatglm4v/eva2clip_vit.py.
Structural checks (no transformers class): per-image token count =
(grid/2)^2 + 2 (boi/eoi), the norm-on-sublayer-output residual wiring, the
2x2 conv downsample, and the engine splice path.
"""

import json

import numpy as np
import pytest

from rtp_llm_tpu.config.model_config import ModelConfig


def _write_glm4v_ckpt(path, H=32, V=64, L=2, vw=16, vlayers=2,
                      image=28, patch=7, inter=24):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    g = image // patch  # 4 -> downsampled 2x2 = 4 tokens + boi/eoi
    t = {
        "transformer.embedding.word_embeddings.weight":
            rng.standard_normal((V, H)) * 0.05,
        "transformer.encoder.final_layernorm.weight": np.ones(H),
        "transformer.output_layer.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"transformer.encoder.layers.{l}."
        t[p + "input_layernorm.weight"] = np.ones(H)
        t[p + "post_attention_layernorm.weight"] = np.ones(H)
        # GQA fused qkv: q (H) + k/v (2 groups * head_dim 8 each)
        t[p + "self_attention.query_key_value.weight"] = (
            rng.standard_normal((H + 2 * 16, H)) * 0.05)
        t[p + "self_attention.query_key_value.bias"] = (
            rng.standard_normal(H + 2 * 16) * 0.01)
        t[p + "self_attention.dense.weight"] = rng.standard_normal((H, H)) * 0.05
        t[p + "mlp.dense_h_to_4h.weight"] = rng.standard_normal(
            (2 * inter, H)) * 0.05
        t[p + "mlp.dense_4h_to_h.weight"] = rng.standard_normal(
            (H, inter)) * 0.05
    vp = "transformer.vision."
    t[vp + "patch_embedding.proj.weight"] = rng.standard_normal(
        (vw, 3, patch, patch)) * 0.05
    t[vp + "patch_embedding.proj.bias"] = np.zeros(vw)
    t[vp + "patch_embedding.cls_embedding"] = rng.standard_normal((1, vw)) * 0.02
    t[vp + "patch_embedding.position_embedding.weight"] = (
        rng.standard_normal((g * g + 1, vw)) * 0.02)
    for l in range(vlayers):
        b = vp + f"transformer.layers.{l}."
        t[b + "input_layernorm.weight"] = np.ones(vw)
        t[b + "input_layernorm.bias"] = np.zeros(vw)
        t[b + "attention.query_key_value.weight"] = (
            rng.standard_normal((3 * vw, vw)) * 0.05)
        t[b + "attention.query_key_value.bias"] = np.zeros(3 * vw)
        t[b + "attention.dense.weight"] = rng.standard_normal((vw, vw)) * 0.05
        t[b + "attention.dense.bias"] = np.zeros(vw)
        t[b + "post_attention_layernorm.weight"] = np.ones(vw)
        t[b + "post_attention_layernorm.bias"] = np.zeros(vw)
        t[b + "mlp.fc1.weight"] = rng.standard_normal((2 * vw, vw)) * 0.05
        t[b + "mlp.fc1.bias"] = np.zeros(2 * vw)
        t[b + "mlp.fc2.weight"] = rng.standard_normal((vw, 2 * vw)) * 0.05
        t[b + "mlp.fc2.bias"] = np.zeros(vw)
    t[vp + "conv.weight"] = rng.standard_normal((H, vw, 2, 2)) * 0.05
    t[vp + "conv.bias"] = np.zeros(H)
    t[vp + "linear_proj.linear_proj.weight"] = rng.standard_normal((H, H)) * 0.05
    t[vp + "linear_proj.norm1.weight"] = np.ones(H)
    t[vp + "linear_proj.norm1.bias"] = np.zeros(H)
    t[vp + "linear_proj.dense_h_to_4h.weight"] = rng.standard_normal(
        (inter, H)) * 0.05
    t[vp + "linear_proj.gate_proj.weight"] = rng.standard_normal(
        (inter, H)) * 0.05
    t[vp + "linear_proj.dense_4h_to_h.weight"] = rng.standard_normal(
        (H, inter)) * 0.05
    t[vp + "boi"] = rng.standard_normal((1, 1, H)) * 0.02
    t[vp + "eoi"] = rng.standard_normal((1, 1, H)) * 0.02

    save_file({k: np.asarray(v, np.float32) for k, v in t.items()},
              path + "/model.safetensors")
    with open(path + "/config.json", "w") as f:
        json.dump({
            "model_type": "chatglm", "padded_vocab_size": V, "hidden_size": H,
            "num_layers": L, "num_attention_heads": 4, "kv_channels": 8,
            "multi_query_attention": True, "multi_query_group_num": 2,
            "ffn_hidden_size": inter, "seq_length": 128, "add_qkv_bias": True,
            "boi_token_id": 50, "eoi_token_id": 51,
            "vision_config": {
                "image_size": image, "patch_size": patch, "hidden_size": vw,
                "num_hidden_layers": vlayers, "num_heads": 4,
                "intermediate_size": 2 * vw, "layer_norm_eps": 1e-6,
                "scaling_factor": 8.0,
            },
        }, f)
    return path


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return _write_glm4v_ckpt(str(tmp_path_factory.mktemp("glm4v")))


def test_config_and_trunk(ckpt):
    cfg = ModelConfig.from_pretrained(ckpt, model_type="chatglm4v")
    assert cfg.model_type == "chatglm4v"
    assert cfg.image_token_id == 50 and cfg.num_kv_heads == 2
    cfg.dtype = "float32"
    from rtp_llm_tpu.loader import CheckpointLoader

    w = CheckpointLoader(cfg).load(ckpt)
    assert "q_proj" in w and "gate_proj" in w


def test_tower_shape_and_boi_eoi(ckpt):
    from PIL import Image

    from rtp_llm_tpu.multimodal.glm4v_jax import Glm4vVisionTower

    tower = Glm4vVisionTower(ckpt)
    img = Image.new("RGB", (50, 50), (120, 30, 200))
    out = tower.encode_images([img])
    # grid 4 -> conv downsample 2x2 -> 4 patch tokens + boi + eoi
    assert out.shape == (1, 6, 32)
    assert tower.tokens_per_image == 6
    assert np.isfinite(out).all()
    # boi/eoi rows are input-independent (learned params / scaling)
    img2 = Image.new("RGB", (50, 50), (10, 250, 60))
    out2 = tower.encode_images([img2])
    np.testing.assert_allclose(out2[0, 0], out[0, 0], rtol=1e-6)
    np.testing.assert_allclose(out2[0, -1], out[0, -1], rtol=1e-6)
    assert not np.allclose(out2[0, 1:-1], out[0, 1:-1])


def test_serving_splice_through_engine(ckpt):
    import base64
    import io

    from PIL import Image

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.frontend.vision_chat import VisionChatHandler
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.models import create_model

    cfg = ModelConfig.from_pretrained(ckpt, model_type="chatglm4v")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)

    img = Image.new("RGB", (28, 28), (10, 200, 50))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    handler = VisionChatHandler(ckpt, cfg, None)
    prompt = [1, 50, 9]  # boi placeholder expands to the 6-token run
    ids, mm = handler.process(prompt, [uri])
    assert ids.count(50) == 6 and len(ids) == 8
    assert mm.embeds.shape[0] == len(ids)

    s = eng.enqueue(ids, GenerateConfig(max_new_tokens=4, do_sample=False,
                                        ignore_eos=True), mm=mm)
    for _ in range(20):
        if s.is_finished():
            break
        eng.step()
    assert len(s.output_token_ids) == 4
