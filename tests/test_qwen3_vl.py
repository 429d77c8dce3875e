"""Qwen3-VL: deepstack vision tower + interleaved MRoPE vs HF (tiny random
model). Reference: qwen3_vl/qwen3_vl_moe registration."""

import numpy as np
import pytest
import torch

from rtp_llm_tpu.config.engine_config import CacheConfig, EngineConfig, SchedulerConfig
from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.engine import LlmEngine
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import create_model
from rtp_llm_tpu.multimodal import MultimodalProcessor

IMG, VSTART = 150, 151


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen3VLConfig(
        text_config=dict(
            vocab_size=160, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, tie_word_embeddings=False,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 3, 3],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=48, num_heads=2,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=64, num_position_embeddings=16,
            deepstack_visual_indexes=[0, 1],
        ),
        image_token_id=IMG, video_token_id=153, vision_start_token_id=VSTART,
    )
    path = str(tmp_path_factory.mktemp("q3vl") / "m")
    Qwen3VLForConditionalGeneration(cfg).float().eval().save_pretrained(
        path, safe_serialization=True)
    return path


def test_deepstack_tower_matches_hf(ckpt):
    from transformers import Qwen3VLForConditionalGeneration

    from rtp_llm_tpu.multimodal.vit_jax import Qwen3VisionTower

    hf = Qwen3VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32).eval()
    grid = (1, 4, 4)
    torch.manual_seed(1)
    pix = torch.randn(int(np.prod(grid)), 3 * 2 * 4 * 4)
    with torch.no_grad():
        main, ds = hf.model.visual(pix, torch.tensor([grid]))

    tower = Qwen3VisionTower(ckpt)
    embeds, grids = tower.encode_images(pix.numpy(), np.asarray([grid]))
    assert grids == [(1, 2, 2)]
    packed = embeds[0]  # [4, 64*(1+2)]
    np.testing.assert_allclose(packed[:, :64], main.numpy(),
                               rtol=2e-4, atol=2e-4)
    for k in range(2):
        np.testing.assert_allclose(
            packed[:, 64 * (1 + k): 64 * (2 + k)], ds[k].numpy(),
            rtol=2e-4, atol=2e-4)


def test_mm_generation_matches_hf(ckpt):
    from transformers import Qwen3VLForConditionalGeneration

    from rtp_llm_tpu.multimodal.vit_jax import Qwen3VisionTower

    mc = ModelConfig.from_pretrained(ckpt)
    assert mc.model_type == "qwen3_vl" and mc.use_qk_norm
    mc.dtype = "float32"
    eng = LlmEngine(
        create_model(mc), CheckpointLoader(mc).load(ckpt),
        EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                      prefill_buckets=(16, 32)),
        ),
    )
    grid = (1, 4, 4)  # 4 llm tokens after merge
    prompt = [1, 5, VSTART] + [IMG] * 4 + [9, 7]
    torch.manual_seed(2)
    pix = torch.randn(int(np.prod(grid)), 3 * 2 * 4 * 4)

    hf = Qwen3VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32).eval()
    with torch.no_grad():
        expect = hf.generate(
            input_ids=torch.tensor([prompt]), pixel_values=pix,
            image_grid_thw=torch.tensor([grid]), max_new_tokens=8,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, len(prompt):].tolist()

    tower = Qwen3VisionTower(ckpt)
    embeds, grids = tower.encode_images(pix.numpy(), np.asarray([grid]))
    mm = MultimodalProcessor(mc).prepare(prompt, embeds, grids)
    assert mm.embeds.shape[-1] == 64 * 3  # deepstack packed channels

    s = eng.enqueue(prompt, GenerateConfig(max_new_tokens=8, do_sample=False,
                                           ignore_eos=True), mm=mm)
    for _ in range(30):
        if s.is_finished():
            break
        eng.step()
    assert s.output_token_ids == expect
