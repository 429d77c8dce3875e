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


def test_megatron_bert_matches_hf(tmp_path):
    """Pre-LN variant (reference: models/megatron_bert.py) vs HF
    MegatronBertModel token-for-token."""
    import torch
    from transformers import MegatronBertConfig, MegatronBertModel

    torch.manual_seed(1)
    hf_cfg = MegatronBertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
    )
    m = MegatronBertModel(hf_cfg)
    m.eval()
    path = str(tmp_path)
    m.save_pretrained(path, safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "megatron_bert" and cfg.bert_variant == "megatron"
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    assert "embed_norm" not in weights and "final_norm" in weights
    model = create_model(cfg)

    tokens = [[2, 45, 9, 17, 88, 3], [5, 6, 7, 3, 0, 0]]
    mask = [[1, 1, 1, 1, 1, 1], [1, 1, 1, 1, 0, 0]]
    ours = np.asarray(model.encode(
        weights, jnp.asarray(tokens, jnp.int32), jnp.asarray(mask, jnp.int32)))
    with torch.no_grad():
        theirs = m(torch.tensor(tokens),
                   attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(ours[valid], theirs[valid], rtol=3e-4, atol=3e-4)


def test_jina_bert_variant(tmp_path):
    """jina-bert-v2 qk-post-norm structure (reference:
    models/jina_bert/jina_bert_weight.py): ALiBi (no positional embeddings),
    q/k LayerNorms, fused up_gated gelu MLP. No HF class exists in
    transformers, so this checks load + forward structure: translation
    sensitivity must come only from ALiBi (shifting the window changes
    nothing), and the gated split ordering is exercised."""
    import json
    import numpy as _np
    from safetensors.numpy import save_file

    rng = _np.random.default_rng(0)
    H, I, L, V = 32, 64, 2, 64

    def lin(i, o):
        return rng.standard_normal((o, i), dtype=_np.float32) * 0.05

    tensors = {
        "embeddings.word_embeddings.weight": rng.standard_normal((V, H)).astype(_np.float32) * 0.05,
        "embeddings.token_type_embeddings.weight": _np.zeros((2, H), _np.float32),
        "embeddings.LayerNorm.weight": _np.ones((H,), _np.float32),
        "embeddings.LayerNorm.bias": _np.zeros((H,), _np.float32),
    }
    for l in range(L):
        p = f"encoder.layer.{l}."
        for nm, shp in [("attention.self.query", (H, H)),
                        ("attention.self.key", (H, H)),
                        ("attention.self.value", (H, H)),
                        ("attention.output.dense", (H, H))]:
            tensors[p + nm + ".weight"] = lin(*shp)
            tensors[p + nm + ".bias"] = _np.zeros((shp[1],), _np.float32)
        for nm in ["attention.self.layer_norm_q", "attention.self.layer_norm_k",
                   "attention.output.LayerNorm", "layer_norm_1", "layer_norm_2"]:
            tensors[p + nm + ".weight"] = _np.ones((H,), _np.float32)
            tensors[p + nm + ".bias"] = _np.zeros((H,), _np.float32)
        tensors[p + "mlp.up_gated_layer.weight"] = lin(H, 2 * I)
        tensors[p + "mlp.down_layer.weight"] = lin(I, H)
        tensors[p + "mlp.down_layer.bias"] = _np.zeros((H,), _np.float32)
    path = str(tmp_path)
    save_file(tensors, path + "/model.safetensors")
    with open(path + "/config.json", "w") as f:
        json.dump({"model_type": "bert", "vocab_size": V, "hidden_size": H,
                   "num_hidden_layers": L, "num_attention_heads": 4,
                   "intermediate_size": I, "layer_norm_eps": 1e-12}, f)

    cfg = ModelConfig.from_pretrained(path, model_type="jina_bert_code")
    assert cfg.bert_variant == "jina" and cfg.use_alibi
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    assert "pos_embed" not in weights and weights["up_gate_proj"].shape == (L, H, 2 * I)
    model = create_model(cfg)

    toks = jnp.asarray([[2, 45, 9, 17]], jnp.int32)
    mask = jnp.ones_like(toks)
    out = np.asarray(model.encode(weights, toks, mask))
    assert out.shape == (1, 4, H) and np.isfinite(out).all()
    # No positional embeddings + symmetric ALiBi (|i-j|) => the encoder is
    # equivariant to sequence reversal: encode(reverse) == reverse(encode).
    rev = np.asarray(model.encode(
        weights, jnp.asarray([[17, 9, 45, 2]], jnp.int32), mask))
    np.testing.assert_allclose(rev[0, ::-1], out[0], rtol=2e-5, atol=2e-5)
    # ...and the ALiBi bias is actually live: disabling slopes changes output
    model._slopes = None
    no_bias = np.asarray(model.encode(weights, toks, mask))
    assert not np.allclose(no_bias, out)


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


def test_embedding_app_cross_request_batching(bert_ckpt):
    """Concurrent /v1/embeddings requests coalesce into ONE encoder call
    (reference: EmbeddingScheduler batching) and results stay identical to
    a solo request."""
    import asyncio

    import numpy as np

    path, _ = bert_ckpt
    cfg = ModelConfig.from_pretrained(path)
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)

    from rtp_llm_tpu.frontend.embedding_app import (
        EncoderEmbedder, build_embedding_app,
    )
    from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory
    from rtp_llm_tpu.loader.fake_checkpoint import write_fake_tokenizer

    write_fake_tokenizer(path, 128)  # fixture ships no tokenizer
    tok = TokenizerFactory.create(path)

    async def run():
        from aiohttp.test_utils import TestClient, TestServer

        app = build_embedding_app(EncoderEmbedder(model, weights), tok,
                                  "tiny-bert")
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # solo request first (also warms the jit)
            solo = await (await client.post(
                "/v1/embeddings",
                json={"input": [[2, 5, 9, 3]]})).json()

            async def one(ids):
                r = await client.post("/v1/embeddings",
                                      json={"input": [ids]})
                return await r.json()

            # retry loop: on a loaded CI host the 2ms gather window can
            # miss stragglers — coalescing must be OBSERVED at least once
            for attempt in range(5):
                h0 = await (await client.get("/health")).json()
                results = await asyncio.gather(
                    one([2, 5, 9, 3]), one([4, 7, 3]),
                    one([5, 6, 7, 8, 3]))
                h1 = await (await client.get("/health")).json()
                assert h1["coalesced"] - h0["coalesced"] == 3
                if h1["batches"] - h0["batches"] < 3:
                    break
            else:
                raise AssertionError("requests never coalesced")
            np.testing.assert_allclose(
                np.asarray(results[0]["data"][0]["embedding"]),
                np.asarray(solo["data"][0]["embedding"]), rtol=1e-5,
                atol=1e-5)
        finally:
            await client.close()

    asyncio.run(run())


def test_roberta_matches_hf(tmp_path):
    """RoBERTa (reference: models/bert.py Roberta — pad-offset position ids,
    roberta.* weight prefix) vs HF RobertaModel token-for-token."""
    import torch
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(2)
    hf_cfg = RobertaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    m = RobertaModel(hf_cfg, add_pooling_layer=False)
    m.eval()
    path = str(tmp_path)
    m.save_pretrained(path, safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "roberta" and cfg.roberta_positions
    assert cfg.pad_token_id == 1
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)

    tokens = [[0, 45, 9, 17, 88, 2, 1, 1], [0, 6, 7, 2, 1, 1, 1, 1]]
    mask = [[1, 1, 1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 0, 0, 0, 0]]
    ours = np.asarray(model.encode(
        weights, jnp.asarray(tokens, jnp.int32), jnp.asarray(mask, jnp.int32)))
    with torch.no_grad():
        theirs = m(torch.tensor(tokens),
                   attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(ours[valid], theirs[valid], rtol=3e-4, atol=3e-4)


def test_roberta_classifier_head(tmp_path):
    """Sequence-classification parity vs HF XLMRobertaForSequenceClassification
    (reference: RobertaClassifierModule — dense+tanh+out_proj on token 0)."""
    import torch
    from transformers import (
        XLMRobertaConfig, XLMRobertaForSequenceClassification,
    )

    torch.manual_seed(3)
    hf_cfg = XLMRobertaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        num_labels=3,
    )
    m = XLMRobertaForSequenceClassification(hf_cfg)
    m.eval()
    path = str(tmp_path)
    m.save_pretrained(path, safe_serialization=True)

    cfg = ModelConfig.from_pretrained(path)
    assert cfg.model_type == "roberta"
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(path)
    model = create_model(cfg)

    from rtp_llm_tpu.engine.embedding import load_downstream_heads

    heads = load_downstream_heads(path)
    assert "classifier_dense" in heads and "classifier" in heads

    tokens = [0, 45, 9, 17, 2]
    h = np.asarray(model.encode(
        weights, jnp.asarray([tokens], jnp.int32),
        jnp.ones((1, len(tokens)), jnp.int32)))[0]
    pooled = np.tanh(h[0] @ heads["classifier_dense"]
                     + heads["classifier_dense_bias"])
    logits = pooled @ heads["classifier"] + heads["classifier_bias"]
    with torch.no_grad():
        expect = m(torch.tensor([tokens])).logits.numpy()[0]
    np.testing.assert_allclose(logits, expect, rtol=3e-4, atol=3e-4)
