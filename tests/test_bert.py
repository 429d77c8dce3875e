"""BERT encoder parity vs HF transformers (reference: bert embedding family)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtp_llm_tpu.config.model_config import ModelConfig
from rtp_llm_tpu.loader import CheckpointLoader
from rtp_llm_tpu.models import create_model


@pytest.fixture(scope="module")
def bert_ckpt(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
    )
    m = BertModel(cfg)
    m.eval()
    path = str(tmp_path_factory.mktemp("bert"))
    m.save_pretrained(path, safe_serialization=True)
    return path, m


def test_encode_matches_hf(bert_ckpt):
    path, hf_model = bert_ckpt
    import torch

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "bert" and cfg.rms_norm_eps == 1e-12
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    assert model.is_encoder_only

    tokens = [[2, 45, 9, 17, 88, 3, 0, 0], [5, 6, 7, 3, 0, 0, 0, 0]]
    mask = [[1, 1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 0, 0, 0, 0]]
    ours = np.asarray(model.encode(
        weights, jnp.asarray(tokens, jnp.int32), jnp.asarray(mask, jnp.int32)
    ))
    with torch.no_grad():
        theirs = hf_model(
            torch.tensor(tokens), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    # compare only unmasked positions (HF computes padded rows too, ours also
    # computes them but attention normalization is mask-consistent)
    m = np.asarray(mask, bool)
    np.testing.assert_allclose(ours[m], theirs[m], rtol=3e-4, atol=3e-4)


def test_embed_pooling(bert_ckpt):
    path, _ = bert_ckpt
    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    toks = jnp.asarray([[2, 45, 9, 3]], jnp.int32)
    mask = jnp.ones_like(toks)
    for pooling in ("cls", "mean"):
        e = np.asarray(model.embed(weights, toks, mask, pooling))
        assert e.shape == (1, 64)
        np.testing.assert_allclose(np.linalg.norm(e), 1.0, rtol=1e-5)


def test_embedding_app_http(bert_ckpt):
    import asyncio

    asyncio.run(_http(bert_ckpt))


async def _http(bert_ckpt):
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.frontend.embedding_app import (
        EncoderEmbedder, build_embedding_app,
    )
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_tokenizer
    from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory

    path, _ = bert_ckpt
    write_fake_tokenizer(path, 128)
    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)
    tok = TokenizerFactory.create(path)
    app = build_embedding_app(EncoderEmbedder(model, weights), tok, "tiny-bert")
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        r = await client.post("/v1/embeddings", json={"input": ["w1 w2", "w3"]})
        assert r.status == 200
        body = await r.json()
        assert len(body["data"]) == 2
        v = np.asarray(body["data"][0]["embedding"])
        assert v.shape == (64,)
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)
    finally:
        await client.close()
