"""Qwen2.5-VL: windowed JAX vision tower parity + engine generation vs HF
(reference: qwen2_5_vl registration; HF Qwen2_5_VisionTransformer)."""

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

IMG, VSTART, VEND = 150, 151, 152


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen2_5_VLConfig, Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=160, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, tie_word_embeddings=False,
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        ),
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
            patch_size=4, spatial_merge_size=2, temporal_patch_size=2,
            in_channels=3, out_hidden_size=64, window_size=16,
            fullatt_block_indexes=[1],
        ),
        image_token_id=IMG, video_token_id=153, vision_start_token_id=VSTART,
        vision_end_token_id=VEND,
    )
    path = str(tmp_path_factory.mktemp("q25vl") / "m")
    Qwen2_5_VLForConditionalGeneration(cfg).float().eval().save_pretrained(
        path, safe_serialization=True)
    return path


def test_windowed_tower_matches_hf(ckpt):
    """The windowed tower (host window plan + jitted blocks) must reproduce
    HF's visual() output, including the window reorder round-trip."""
    from transformers import Qwen2_5_VLForConditionalGeneration

    from rtp_llm_tpu.multimodal.vit_jax import Qwen25VisionTower

    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32).eval()
    grid = (1, 8, 8)  # -> 4x4 merge groups, 2x2 windows: nontrivial reorder
    torch.manual_seed(1)
    pix = torch.randn(int(np.prod(grid)), 3 * 2 * 4 * 4)
    with torch.no_grad():
        theirs = hf.model.visual(pix, torch.tensor([grid])).numpy()

    tower = Qwen25VisionTower(ckpt)
    embeds, grids = tower.encode_images(pix.numpy(), np.asarray([grid]))
    assert grids == [(1, 4, 4)]
    np.testing.assert_allclose(embeds[0], theirs, rtol=2e-4, atol=2e-4)


def test_mm_generation_matches_hf(ckpt):
    from transformers import Qwen2_5_VLForConditionalGeneration

    from rtp_llm_tpu.multimodal.vit_jax import Qwen25VisionTower

    mc = ModelConfig.from_pretrained(ckpt)
    assert mc.model_type == "qwen2_5_vl" and mc.mrope_section == (2, 3, 3)
    mc.dtype = "float32"
    eng = LlmEngine(
        create_model(mc), CheckpointLoader(mc).load(ckpt),
        EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                      prefill_buckets=(16, 32)),
        ),
    )
    grid = (1, 8, 8)  # 16 llm tokens after merge
    prompt = [1, 5, VSTART] + [IMG] * 16 + [VEND, 9, 7]
    torch.manual_seed(2)
    pix = torch.randn(int(np.prod(grid)), 3 * 2 * 4 * 4)

    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32).eval()
    with torch.no_grad():
        expect = hf.generate(
            input_ids=torch.tensor([prompt]), pixel_values=pix,
            image_grid_thw=torch.tensor([grid]), max_new_tokens=8,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, len(prompt):].tolist()

    tower = Qwen25VisionTower(ckpt)
    embeds, grids = tower.encode_images(pix.numpy(), np.asarray([grid]))
    mm = MultimodalProcessor(mc).prepare(prompt, embeds, grids)

    s = eng.enqueue(prompt, GenerateConfig(max_new_tokens=8, do_sample=False,
                                           ignore_eos=True), mm=mm)
    for _ in range(30):
        if s.is_finished():
            break
        eng.step()
    assert s.output_token_ids == expect
