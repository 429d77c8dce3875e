"""Qwen2-VL multimodal: MRoPE + vision-embedding splice, HF-exact through
the real engine (reference: multimodal_mixins + MultimodalProcessor +
PositionIdsGenerator MRoPE)."""

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
from rtp_llm_tpu.multimodal.vit import HfVisionTower

IMG, VSTART, VEND = 150, 151, 152


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vocab_size=160, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=IMG, vision_start_token_id=VSTART,
        vision_end_token_id=VEND, tie_word_embeddings=False,
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64, num_heads=2,
                           patch_size=4, spatial_merge_size=2,
                           temporal_patch_size=2, in_channels=3),
    )
    path = str(tmp_path_factory.mktemp("qvl") / "m")
    Qwen2VLForConditionalGeneration(cfg).float().eval().save_pretrained(
        path, safe_serialization=True
    )
    return path


def _engine(ckpt):
    mc = ModelConfig.from_pretrained(ckpt)
    mc.dtype = "float32"
    eng = LlmEngine(
        create_model(mc), CheckpointLoader(mc).load(ckpt),
        EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                      prefill_buckets=(8, 16)),
        ),
    )
    return mc, eng


def _mm_case(ckpt, mc, prompt, grid, seed=0):
    torch.manual_seed(seed)
    npatch = int(np.prod(grid))
    pix = torch.randn(npatch, 3 * 2 * 4 * 4)
    tower = HfVisionTower(ckpt)
    embeds, grids = tower.encode_images(
        pix.numpy(), np.asarray([grid])
    )
    mm = MultimodalProcessor(mc).prepare(prompt, embeds, grids)
    return pix, mm


def test_mm_generation_matches_hf(ckpt):
    from transformers import Qwen2VLForConditionalGeneration

    mc, eng = _engine(ckpt)
    grid = (1, 4, 4)  # pre-merge -> 4 llm tokens
    prompt = [1, 5, VSTART] + [IMG] * 4 + [VEND, 9, 7]
    pix, mm = _mm_case(ckpt, mc, prompt, grid)

    hf = Qwen2VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32
    ).eval()
    with torch.no_grad():
        expect = hf.generate(
            input_ids=torch.tensor([prompt]), pixel_values=pix,
            image_grid_thw=torch.tensor([grid]), max_new_tokens=8,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, len(prompt):].tolist()

    # mrope positions must equal HF get_rope_index
    pos_hf, delta_hf = hf.model.get_rope_index(
        torch.tensor([prompt]), torch.tensor([grid]), None
    )
    assert np.array_equal(pos_hf[:, 0].numpy(), mm.positions3)
    assert int(delta_hf[0, 0]) == mm.delta

    s = eng.enqueue(prompt, GenerateConfig(max_new_tokens=8, do_sample=False,
                                           ignore_eos=True), mm=mm)
    for _ in range(30):
        if s.is_finished():
            break
        eng.step()
    assert s.output_token_ids == expect


def test_text_only_still_matches_hf(ckpt):
    """The VL model without images must behave as plain qwen2 (+ bias)."""
    from transformers import Qwen2VLForConditionalGeneration

    mc, eng = _engine(ckpt)
    prompt = [1, 5, 9, 42, 7]
    hf = Qwen2VLForConditionalGeneration.from_pretrained(
        ckpt, dtype=torch.float32
    ).eval()
    with torch.no_grad():
        expect = hf.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=6,
            do_sample=False, pad_token_id=0, eos_token_id=None,
        )[0, len(prompt):].tolist()
    out = eng.generate(prompt, GenerateConfig(
        max_new_tokens=6, do_sample=False, ignore_eos=True,
    )).output_token_ids
    assert out == expect


def test_mm_streams_no_prefix_pollution(ckpt):
    """Two prompts with identical token ids but different images must not
    share KV via the prefix cache."""
    mc, eng = _engine(ckpt)
    grid = (1, 4, 4)
    prompt = [1, VSTART] + [IMG] * 4 + [VEND, 9]
    _, mm_a = _mm_case(ckpt, mc, prompt, grid, seed=1)
    _, mm_b = _mm_case(ckpt, mc, prompt, grid, seed=2)
    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False,
                                ignore_eos=True)
    out_a = eng.generate(prompt, gc(), mm=mm_a).output_token_ids
    out_b = eng.generate(prompt, gc(), mm=mm_b).output_token_ids
    # fresh engines as ground truth
    _, e2 = _engine(ckpt)
    assert out_b == e2.generate(prompt, gc(), mm=mm_b).output_token_ids
    assert out_a != out_b  # different images -> different continuations


def test_jax_vision_tower_matches_torch(ckpt):
    """The JAX/TPU vision tower (multimodal/vit_jax.py) must reproduce the
    HF torch tower's embeddings — single image and a multi-image batch
    (segment-masked attention == HF's per-image chunks)."""
    from rtp_llm_tpu.multimodal.vit_jax import JaxVisionTower

    torch.manual_seed(3)
    grids = np.asarray([(1, 4, 4), (1, 2, 4)])
    npatch = int(sum(np.prod(g) for g in grids))
    pix = torch.randn(npatch, 3 * 2 * 4 * 4).numpy()

    t_embeds, t_grids = HfVisionTower(ckpt).encode_images(pix, grids)
    j_embeds, j_grids = JaxVisionTower(ckpt).encode_images(pix, grids)
    assert t_grids == j_grids
    for te, je in zip(t_embeds, j_embeds):
        assert te.shape == je.shape
        np.testing.assert_allclose(je, te, rtol=2e-4, atol=2e-4)


def test_vision_chat_handler_end_to_end(ckpt):
    """frontend/vision_chat.py: data-URI image -> HF image processor -> JAX
    tower -> placeholder expansion -> MMInputs -> engine generation."""
    import base64
    import io
    import json as _json
    import os

    from PIL import Image

    from rtp_llm_tpu.frontend.vision_chat import VisionChatHandler

    # the fixture checkpoint ships no preprocessor config; write one matching
    # its tiny vision geometry (patch 4, temporal 2, merge 2)
    with open(os.path.join(ckpt, "preprocessor_config.json"), "w") as f:
        _json.dump({
            "image_processor_type": "Qwen2VLImageProcessor",
            "patch_size": 4, "temporal_patch_size": 2, "merge_size": 2,
            "min_pixels": 4 * 4 * 4, "max_pixels": 16 * 16 * 4,
            "do_normalize": True,
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)

    img = Image.new("RGB", (16, 16), (120, 30, 200))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    uri = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    # message splitting
    msgs, images = VisionChatHandler.extract_images([
        {"role": "user", "content": [
            {"type": "text", "text": "look"},
            {"type": "image_url", "image_url": {"url": uri}},
        ]},
    ])
    assert images == [uri]
    assert msgs[0]["content"][1] == {"type": "image"}

    mc, eng = _engine(ckpt)
    handler = VisionChatHandler(ckpt, mc, None)
    prompt = [1, 5, VSTART, IMG, VEND, 9]  # single placeholder pre-expansion
    ids, mm = handler.process(prompt, [uri])
    n_img = sum(1 for t in ids if t == IMG)
    assert n_img >= 1 and len(ids) == len(prompt) - 1 + n_img
    assert mm.embeds.shape[0] == len(ids)

    s = eng.enqueue(ids, GenerateConfig(max_new_tokens=4, do_sample=False,
                                        ignore_eos=True), mm=mm)
    for _ in range(20):
        if s.is_finished():
            break
        eng.step()
    assert len(s.output_token_ids) == 4


def test_vit_worker_remote_matches_local(ckpt):
    """VIT role (reference: vit_start_server.py): a standalone encode worker
    over HTTP must return exactly the local tower's embeddings."""
    import asyncio

    import numpy as np

    from rtp_llm_tpu.multimodal.vit_jax import JaxVisionTower
    from rtp_llm_tpu.server.vit_server import RemoteTower, VitServer

    grid = (1, 4, 4)
    torch.manual_seed(5)
    pix = torch.randn(int(np.prod(grid)), 3 * 2 * 4 * 4).numpy()

    local = JaxVisionTower(ckpt)
    l_embeds, l_grids = local.encode_images(pix, np.asarray([grid]))

    async def run():
        from aiohttp.test_utils import TestServer

        srv = TestServer(VitServer(ckpt, "qwen2_vl").build_app())
        await srv.start_server()
        try:
            ep = f"http://127.0.0.1:{srv.port}"
            loop = asyncio.get_running_loop()
            remote = RemoteTower(ep, "qwen2_vl")
            return await loop.run_in_executor(
                None, remote.encode_images, pix, np.asarray([grid]))
        finally:
            await srv.close()

    r_embeds, r_grids = asyncio.run(run())
    assert r_grids == l_grids
    np.testing.assert_allclose(r_embeds[0], l_embeds[0], rtol=1e-6)


def test_mm_embedding_cache(ckpt):
    """MM embedding cache (reference: MM embedding cache keyed by content
    hashes): a repeated image skips the vision tower and yields identical
    MMInputs; distinct images miss."""
    import base64
    import io
    import json as _json
    import os

    import numpy as np
    from PIL import Image

    from rtp_llm_tpu.frontend.vision_chat import VisionChatHandler

    with open(os.path.join(ckpt, "preprocessor_config.json"), "w") as f:
        _json.dump({
            "image_processor_type": "Qwen2VLImageProcessor",
            "patch_size": 4, "temporal_patch_size": 2, "merge_size": 2,
            "min_pixels": 4 * 4 * 4, "max_pixels": 16 * 16 * 4,
            "do_normalize": True,
            "image_mean": [0.5, 0.5, 0.5], "image_std": [0.5, 0.5, 0.5],
        }, f)

    def uri(color):
        img = Image.new("RGB", (16, 16), color)
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    mc = ModelConfig.from_pretrained(ckpt)
    mc.dtype = "float32"
    handler = VisionChatHandler(ckpt, mc, None)
    prompt = [1, 5, VSTART, IMG, VEND, 9]
    u1 = uri((120, 30, 200))

    ids1, mm1 = handler.process(prompt, [u1])
    assert handler.mm_cache_misses == 1 and handler.mm_cache_hits == 0

    calls = []
    real = handler._tower.encode_images
    handler._tower.encode_images = lambda *a, **k: (
        calls.append(1) or real(*a, **k))

    ids2, mm2 = handler.process(prompt, [u1])  # same image: pure cache hit
    assert not calls, "tower must not run on a cache hit"
    assert handler.mm_cache_hits == 1
    assert ids2 == ids1
    np.testing.assert_array_equal(np.asarray(mm2.embeds),
                                  np.asarray(mm1.embeds))

    ids3, _ = handler.process(prompt, [uri((10, 250, 60))])  # distinct: miss
    assert calls and handler.mm_cache_misses == 2
    assert len(ids3) == len(ids1)
