"""qwen_vl (v1): OpenCLIP ViT-bigG tower + perceiver resampler + qwen trunk.

Reference: rtp_llm/models/qwen_vl.py (registration, image token wiring) and
multimodal_mixins/qwen_vl/qwen_vl_vit.py (VisionTransformer + Resampler).
No transformers class exists, so the tower checks are structural: every
image becomes exactly n_queries tokens of output_dim, the resampler's
sincos positions make the output depend on patch ARRANGEMENT (not just
content), and the serving path splices embeddings through the engine.
"""

import json

import numpy as np
import pytest

from rtp_llm_tpu.config.model_config import ModelConfig


def _write_qwen_vl_ckpt(path, H=32, I=48, V=64, L=2, vw=24, vlayers=2,
                        out_dim=32, image=28, patch=14, n_queries=4):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    t = {
        "transformer.wte.weight": rng.standard_normal((V, H)) * 0.05,
        "transformer.ln_f.weight": np.ones(H),
        "lm_head.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"transformer.h.{l}."
        t[p + "ln_1.weight"] = np.ones(H)
        t[p + "ln_2.weight"] = np.ones(H)
        t[p + "attn.c_attn.weight"] = rng.standard_normal((3 * H, H)) * 0.05
        t[p + "attn.c_attn.bias"] = rng.standard_normal(3 * H) * 0.01
        t[p + "attn.c_proj.weight"] = rng.standard_normal((H, H)) * 0.05
        t[p + "mlp.w1.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "mlp.w2.weight"] = rng.standard_normal((I, H)) * 0.05
        t[p + "mlp.c_proj.weight"] = rng.standard_normal((H, I)) * 0.05
    # visual tower (transformer.visual.*)
    vp = "transformer.visual."
    t[vp + "conv1.weight"] = rng.standard_normal((vw, 3, patch, patch)) * 0.05
    t[vp + "positional_embedding"] = rng.standard_normal(
        (n_queries, vw)) * 0.02  # 2x2 table, interpolated to the grid
    t[vp + "ln_pre.weight"] = np.ones(vw)
    t[vp + "ln_pre.bias"] = np.zeros(vw)
    for l in range(vlayers):
        b = vp + f"transformer.resblocks.{l}."
        t[b + "ln_1.weight"] = np.ones(vw)
        t[b + "ln_1.bias"] = np.zeros(vw)
        t[b + "attn.in_proj.weight"] = rng.standard_normal((3 * vw, vw)) * 0.05
        t[b + "attn.in_proj.bias"] = np.zeros(3 * vw)
        t[b + "attn.out_proj.weight"] = rng.standard_normal((vw, vw)) * 0.05
        t[b + "attn.out_proj.bias"] = np.zeros(vw)
        t[b + "ln_2.weight"] = np.ones(vw)
        t[b + "ln_2.bias"] = np.zeros(vw)
        t[b + "mlp.c_fc.weight"] = rng.standard_normal((2 * vw, vw)) * 0.05
        t[b + "mlp.c_fc.bias"] = np.zeros(2 * vw)
        t[b + "mlp.c_proj.weight"] = rng.standard_normal((vw, 2 * vw)) * 0.05
        t[b + "mlp.c_proj.bias"] = np.zeros(vw)
    t[vp + "attn_pool.query"] = rng.standard_normal((n_queries, out_dim)) * 0.02
    t[vp + "attn_pool.kv_proj.weight"] = rng.standard_normal((out_dim, vw)) * 0.05
    t[vp + "attn_pool.attn.in_proj_weight"] = rng.standard_normal(
        (3 * out_dim, out_dim)) * 0.05
    t[vp + "attn_pool.attn.in_proj_bias"] = np.zeros(3 * out_dim)
    t[vp + "attn_pool.attn.out_proj.weight"] = rng.standard_normal(
        (out_dim, out_dim)) * 0.05
    t[vp + "attn_pool.attn.out_proj.bias"] = np.zeros(out_dim)
    for nm in ("attn_pool.ln_q", "attn_pool.ln_kv", "ln_post"):
        t[vp + nm + ".weight"] = np.ones(out_dim)
        t[vp + nm + ".bias"] = np.zeros(out_dim)
    t[vp + "proj"] = rng.standard_normal((out_dim, out_dim)) * 0.05

    save_file({k: np.asarray(v, np.float32) for k, v in t.items()},
              path + "/model.safetensors")
    with open(path + "/config.json", "w") as f:
        json.dump({
            "model_type": "qwen", "vocab_size": V, "hidden_size": H,
            "num_hidden_layers": L, "num_attention_heads": 4,
            "kv_channels": 8, "intermediate_size": 2 * I, "seq_length": 128,
            "visual": {
                "image_size": image, "patch_size": patch, "width": vw,
                "layers": vlayers, "heads": 4, "mlp_ratio": 2.0,
                "output_dim": out_dim, "n_queries": n_queries,
                "image_start_id": 50,
            },
        }, f)
    return path


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qwenvl"))
    return _write_qwen_vl_ckpt(path)


def test_config_and_trunk_load(ckpt):
    cfg = ModelConfig.from_pretrained(ckpt, model_type="qwen_vl")
    assert cfg.model_type == "qwen_vl"
    assert cfg.vision_start_token_id == 50 and cfg.image_token_id == 52
    assert cfg.intermediate_size == 48  # qwen v1 halved HF intermediate
    cfg.dtype = "float32"
    from rtp_llm_tpu.loader import CheckpointLoader

    w = CheckpointLoader(cfg).load(ckpt)
    assert "q_proj" in w and w["q_proj"].shape[0] == 2


def test_tower_structure_and_positions(ckpt):
    from PIL import Image

    from rtp_llm_tpu.multimodal.qwen_vl_jax import QwenVLVisionTower

    tower = QwenVLVisionTower(ckpt)
    img = Image.new("RGB", (100, 60), (200, 40, 80))
    out = tower.encode_images([img, img])
    assert out.shape == (2, 4, 32)  # n_queries x output_dim per image
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[0], out[1])
    assert tower.tokens_per_image == 4

    # position sensitivity: a half/half image vs its left-right mirror have
    # identical patch CONTENT multisets; sincos positions must distinguish
    a = np.zeros((28, 28, 3), np.uint8)
    a[:, :14] = 255
    left = Image.fromarray(a)
    right = Image.fromarray(a[:, ::-1])
    o1 = tower.encode_images([left])
    o2 = tower.encode_images([right])
    assert not np.allclose(o1, o2), "resampler positions must matter"


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

    cfg = ModelConfig.from_pretrained(ckpt, model_type="qwen_vl")
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
    # prompt: [text, image_start, pad, image_end, text]
    prompt = [1, 50, 52, 51, 9]
    ids, mm = handler.process(prompt, [uri])
    assert ids.count(52) == 4  # placeholder expanded to n_queries tokens
    assert mm.embeds.shape[0] == len(ids)

    s = eng.enqueue(ids, GenerateConfig(max_new_tokens=4, do_sample=False,
                                        ignore_eos=True), mm=mm)
    for _ in range(20):
        if s.is_finished():
            break
        eng.step()
    assert len(s.output_token_ids) == 4
