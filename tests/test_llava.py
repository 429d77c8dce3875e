"""llava VL parity vs HF transformers (tiny random model): CLIP tower +
projector + embedding splice + llama LM must match token-for-token logits
(reference: rtp_llm/models/llava.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import ModelInputs, create_model


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    import torch
    from transformers import (
        CLIPVisionConfig, LlamaConfig, LlavaConfig,
        LlavaForConditionalGeneration,
    )

    torch.manual_seed(0)
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=28, patch_size=14)
    tc = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2)
    cfg = LlavaConfig(vision_config=vc, text_config=tc, image_token_index=120,
                      vision_feature_layer=-2,
                      vision_feature_select_strategy="default")
    m = LlavaForConditionalGeneration(cfg)
    m.eval()
    path = str(tmp_path_factory.mktemp("llava") / "m")
    m.save_pretrained(path, safe_serialization=True)
    return path, m


def test_llava_matches_hf(tiny_llava):
    import torch

    path, hf = tiny_llava
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "llava" and cfg.image_token_id == 120

    rng = np.random.default_rng(0)
    pixel_values = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # 28/14 = 2x2 = 4 patch tokens per image
    prompt = [1, 5, 120, 120, 120, 120, 9, 42]

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.tensor([prompt]),
            pixel_values=torch.tensor(pixel_values),
        ).logits[0].numpy()

    # ours: tower -> splice -> LM
    from rtp_llm_tpu.multimodal.clip_jax import ClipVisionTower
    from rtp_llm_tpu.multimodal.processor import MultimodalProcessor

    tower = ClipVisionTower(path)
    assert tower.tokens_per_image == 4
    embeds = tower.encode_images(pixel_values)  # [1, 4, 64]
    mm = MultimodalProcessor(cfg).prepare_flat(prompt, list(embeds))

    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    cache = model.init_cache(8, 16, jnp.float32)
    t = len(prompt)
    inputs = ModelInputs(
        tokens=jnp.asarray([prompt], jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32)[None, :],
        block_tables=jnp.asarray([[j + 1 for j in range(4)]], jnp.int32),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_offsets=jnp.asarray([0], jnp.int32),
        mm_embeds=jnp.asarray(mm.embeds)[None],
        mm_mask=jnp.asarray(mm.mask)[None],
    )
    out, _ = model.forward(weights, cache, inputs, need_all_logits=True)
    ours = np.asarray(out.all_logits[0])
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)
