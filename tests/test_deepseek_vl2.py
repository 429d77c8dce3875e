"""deepseek_vl_v2: SigLIP tower + tile layout + deepseek-MoE trunk.

Reference: models/deepseek_vl2/ + multimodal_mixins/deepseek_vl2/.
Structural checks (no transformers class): per-image token count follows
the tile grid formula (global rows + newlines + separator + local grid +
newlines), the best-fit resolution picker matches the reference rule, the
``language.``-prefixed trunk loads, and the engine splices end-to-end.
"""

import json

import numpy as np
import pytest

from rtp_llm_tpu.config.model_config import ModelConfig


def _write_ckpt(path, H=32, V=64, L=2, E=4, vw=16, vlayers=2,
                image=32, patch=8, n_embed=32):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    g = image // patch  # 4 -> downsampled (2) -> 2x2 tokens per tile
    t = {
        "language.model.embed_tokens.weight": rng.standard_normal((V, H)) * 0.05,
        "language.model.norm.weight": np.ones(H),
        "language.lm_head.weight": rng.standard_normal((V, H)) * 0.05,
    }
    for l in range(L):
        p = f"language.model.layers.{l}."
        t[p + "input_layernorm.weight"] = np.ones(H)
        t[p + "post_attention_layernorm.weight"] = np.ones(H)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            t[p + f"self_attn.{nm}.weight"] = rng.standard_normal((H, H)) * 0.05
        if l == 0:  # first_k_dense_replace=1: dense layer 0
            t[p + "mlp.gate_proj.weight"] = rng.standard_normal((2 * H, H)) * 0.05
            t[p + "mlp.up_proj.weight"] = rng.standard_normal((2 * H, H)) * 0.05
            t[p + "mlp.down_proj.weight"] = rng.standard_normal((H, 2 * H)) * 0.05
        else:
            t[p + "mlp.gate.weight"] = rng.standard_normal((E, H)) * 0.05
            for e in range(E):
                q = p + f"mlp.experts.{e}."
                t[q + "gate_proj.weight"] = rng.standard_normal((16, H)) * 0.05
                t[q + "up_proj.weight"] = rng.standard_normal((16, H)) * 0.05
                t[q + "down_proj.weight"] = rng.standard_normal((H, 16)) * 0.05
            sh = p + "mlp.shared_experts."
            t[sh + "gate_proj.weight"] = rng.standard_normal((16, H)) * 0.05
            t[sh + "up_proj.weight"] = rng.standard_normal((16, H)) * 0.05
            t[sh + "down_proj.weight"] = rng.standard_normal((H, 16)) * 0.05
    # vision (timm siglip names) + projector + layout params
    t["vision.patch_embed.proj.weight"] = rng.standard_normal(
        (vw, 3, patch, patch)) * 0.05
    t["vision.patch_embed.proj.bias"] = np.zeros(vw)
    t["vision.pos_embed"] = rng.standard_normal((1, g * g, vw)) * 0.02
    for l in range(vlayers):
        b = f"vision.blocks.{l}."
        for nm in ("norm1", "norm2"):
            t[b + nm + ".weight"] = np.ones(vw)
            t[b + nm + ".bias"] = np.zeros(vw)
        t[b + "attn.qkv.weight"] = rng.standard_normal((3 * vw, vw)) * 0.05
        t[b + "attn.qkv.bias"] = np.zeros(3 * vw)
        t[b + "attn.proj.weight"] = rng.standard_normal((vw, vw)) * 0.05
        t[b + "attn.proj.bias"] = np.zeros(vw)
        t[b + "mlp.fc1.weight"] = rng.standard_normal((2 * vw, vw)) * 0.05
        t[b + "mlp.fc1.bias"] = np.zeros(2 * vw)
        t[b + "mlp.fc2.weight"] = rng.standard_normal((vw, 2 * vw)) * 0.05
        t[b + "mlp.fc2.bias"] = np.zeros(vw)
    t["vision.norm.weight"] = np.ones(vw)
    t["vision.norm.bias"] = np.zeros(vw)
    t["projector.layers.0.weight"] = rng.standard_normal(
        (n_embed, vw * 4)) * 0.05
    t["projector.layers.0.bias"] = np.zeros(n_embed)
    t["projector.layers.2.weight"] = rng.standard_normal(
        (n_embed, n_embed)) * 0.05
    t["projector.layers.2.bias"] = np.zeros(n_embed)
    t["image_newline"] = rng.standard_normal(n_embed) * 0.02
    t["view_seperator"] = rng.standard_normal(n_embed) * 0.02

    save_file({k: np.asarray(v, np.float32) for k, v in t.items()},
              path + "/model.safetensors")
    with open(path + "/config.json", "w") as f:
        json.dump({
            "model_type": "deepseek_vl_v2",
            "language_config": {
                "vocab_size": V, "hidden_size": H, "num_hidden_layers": L,
                "num_attention_heads": 4, "num_key_value_heads": 4,
                "intermediate_size": 2 * H, "n_routed_experts": E,
                "num_experts_per_tok": 2, "moe_intermediate_size": 16,
                "n_shared_experts": 1, "first_k_dense_replace": 1,
                "scoring_func": "softmax", "norm_topk_prob": False,
                "rms_norm_eps": 1e-6,
            },
            "vision_config": {"image_size": image, "patch_size": patch,
                              "width": vw, "layers": vlayers, "heads": 4},
            "projector_config": {"n_embed": n_embed, "downsample_ratio": 2},
            "candidate_resolutions": [[32, 32], [32, 64], [64, 32]],
            "image_token_id": 60,
        }, f)
    return path


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return _write_ckpt(str(tmp_path_factory.mktemp("dsvl2")))


def test_best_resolution_rule():
    from rtp_llm_tpu.multimodal.deepseek_vl2_jax import select_best_resolution

    cands = [(384, 384), (384, 768), (768, 384), (768, 768)]
    assert select_best_resolution((100, 100), cands) == (384, 384)
    assert select_best_resolution((300, 700), cands) == (384, 768)
    assert select_best_resolution((1400, 700), cands) == (768, 384)


def test_config_and_trunk(ckpt):
    cfg = ModelConfig.from_pretrained(ckpt)
    assert cfg.model_type == "deepseek_vl_v2"
    assert cfg.num_experts == 4 and cfg.num_shared_experts == 1
    assert cfg.first_moe_layer == 1 and cfg.image_token_id == 60
    cfg.dtype = "float32"
    from rtp_llm_tpu.loader import CheckpointLoader

    w = CheckpointLoader(cfg).load(ckpt)
    assert "q_proj" in w and "moe_gate" in w and "shared_gate" in w


def test_tower_tile_layout(ckpt):
    from PIL import Image

    from rtp_llm_tpu.multimodal.deepseek_vl2_jax import DeepseekVL2VisionTower

    tower = DeepseekVL2VisionTower(ckpt)
    # square image -> 1x1 local tiling; grid 4 -> downsample 2 -> h=2
    # tokens = global 2*(2+1) + sep 1 + local 2*(2+1) = 13
    img = Image.new("RGB", (40, 40), (120, 30, 200))
    out = tower.encode_image(img)
    assert out.shape == (13, 32)
    # wide image -> best fit (64, 32): 2x1 tiles ->
    # global 6 + 1 + local rows 2 x (2*2+1) = 17
    wide = Image.new("RGB", (120, 50), (90, 90, 10))
    out2 = tower.encode_image(wide)
    assert out2.shape == (2 * 3 + 1 + 2 * (2 * 2 + 1), 32)
    assert np.isfinite(out2).all()


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

    cfg = ModelConfig.from_pretrained(ckpt)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(32,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(create_model(cfg), weights, econf)

    img = Image.new("RGB", (40, 40), (10, 200, 50))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    handler = VisionChatHandler(ckpt, cfg, None)
    prompt = [1, 60, 9]
    ids, mm = handler.process(prompt, [uri])
    assert ids.count(60) == 13 and len(ids) == 15
    assert mm.embeds.shape[0] == len(ids)
    # second request with the same image: pure cache hit
    handler.process(prompt, [uri])
    assert handler.mm_cache_hits == 1

    s = eng.enqueue(ids, GenerateConfig(max_new_tokens=4, do_sample=False,
                                        ignore_eos=True), mm=mm)
    for _ in range(20):
        if s.is_finished():
            break
        eng.step()
    assert len(s.output_token_ids) == 4


def test_mla_trunk_route(tmp_path):
    """deepseek-vl2 small/base carry MLA in language_config: the factory
    must route to the MLA model and the weight map must emit language.-
    prefixed MLA specs (deepseek_vl2_weight.py:38)."""
    import jax.numpy as jnp

    from rtp_llm_tpu.loader.weight_maps import get_weight_specs
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.deepseek import DeepseekModel

    cfg = ModelConfig.from_hf_config({
        "model_type": "deepseek_vl_v2",
        "language_config": {
            "vocab_size": 64, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 128,
            "kv_lora_rank": 32, "q_lora_rank": 24,
            "qk_nope_head_dim": 16, "qk_rope_head_dim": 8, "v_head_dim": 16,
        },
        "vision_config": {"image_size": 32, "patch_size": 8, "width": 16,
                          "layers": 1, "heads": 4},
    }, None)
    assert cfg.kv_lora_rank == 32 and cfg.head_dim == 24
    model = create_model(cfg)
    assert isinstance(model, DeepseekModel)
    pats = {sp.name: sp.hf_pattern for sp in get_weight_specs(cfg)}
    assert pats["kv_a_proj"].startswith(
        "language.model.layers.{l}.self_attn.kv_a_proj_with_mqa")
    assert pats["embed_tokens"] == "language.model.embed_tokens.weight"


def test_mla_trunk_splices_mm_embeds(tmp_path):
    """The MLA trunk must honor ModelInputs.mm_embeds like the MHA trunk —
    vision features spliced over placeholder tokens must change the
    logits there (regression: DeepseekModel ignored mm_embeds)."""
    import jax.numpy as jnp
    import numpy as np

    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.models.batch import ModelInputs

    cfg = tiny_config("deepseek_v2")
    ckpt2 = write_fake_checkpoint(str(tmp_path / "mla"), cfg)
    weights = CheckpointLoader(cfg).load(ckpt2)
    model = create_model(cfg)
    cache = model.init_cache(16, 4)
    t = 4
    base = ModelInputs(
        tokens=jnp.asarray([[1, 2, 3, 4]], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None, :],
        block_tables=jnp.asarray([[1, 2]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
    )
    o_plain, _ = model.forward(weights, cache, base, need_all_logits=True)
    cache = model.init_cache(16, 4)
    mm = base._replace(
        mm_embeds=jnp.ones((1, t, cfg.hidden_size), jnp.float32),
        mm_mask=jnp.asarray([[False, True, True, False]]),
    )
    o_mm, _ = model.forward(weights, cache, mm, need_all_logits=True)
    a = np.asarray(o_plain.all_logits[0])
    b = np.asarray(o_mm.all_logits[0])
    assert not np.allclose(a[1], b[1]), "mm splice must affect logits"
    assert np.allclose(a[0], b[0], atol=1e-5), "unmasked prefix unchanged"
