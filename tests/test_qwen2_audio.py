"""qwen2_audio parity vs HF transformers (tiny random model): JAX audio
tower + projector + splice + qwen2 LM must match logits token-for-token
(reference: rtp_llm/models/qwen_v2_audio.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import ModelInputs, create_model


@pytest.fixture(scope="module")
def tiny_audio(tmp_path_factory):
    import torch
    from transformers import Qwen2AudioConfig, Qwen2AudioForConditionalGeneration

    torch.manual_seed(0)
    cfg = Qwen2AudioConfig(
        audio_config=dict(d_model=32, encoder_layers=2,
                          encoder_attention_heads=4, encoder_ffn_dim=64,
                          num_mel_bins=16, max_source_positions=8),
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2),
        audio_token_index=120,
    )
    m = Qwen2AudioForConditionalGeneration(cfg)
    m.eval()
    path = str(tmp_path_factory.mktemp("q2a") / "m")
    m.save_pretrained(path, safe_serialization=True)
    return path, m


def test_audio_tower_matches_hf(tiny_audio):
    import torch

    path, hf = tiny_audio
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 16, 16)).astype(np.float32)  # 2*max_src

    with torch.no_grad():
        enc = hf.audio_tower(torch.tensor(feats)).last_hidden_state
        theirs = hf.multi_modal_projector(enc).numpy()

    from rtp_llm_tpu.multimodal.audio_jax import AudioTower

    tower = AudioTower(path)
    ours = tower.encode_audio(feats)
    assert tower.output_frames(16) == ours.shape[1] == theirs.shape[1]
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_audio_generation_matches_hf(tiny_audio):
    import torch

    path, hf = tiny_audio
    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "qwen2_audio" and cfg.image_token_id == 120

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 16, 16)).astype(np.float32)
    from rtp_llm_tpu.multimodal.audio_jax import AudioTower

    tower = AudioTower(path)
    frames = tower.output_frames(16)
    prompt = [1, 5] + [120] * frames + [9, 42]

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.tensor([prompt]),
            input_features=torch.tensor(feats),
            feature_attention_mask=torch.ones((1, 16), dtype=torch.long),
        ).logits[0].numpy()

    from rtp_llm_tpu.multimodal.processor import MultimodalProcessor

    embeds = tower.encode_audio(feats)
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
    np.testing.assert_allclose(np.asarray(out.all_logits[0]), theirs,
                               rtol=2e-3, atol=2e-3)
