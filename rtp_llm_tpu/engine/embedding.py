"""Embedding engine: non-autoregressive dense forward for embeddings.

Analog of the reference EmbeddingEngine + EmbeddingExecutor
(cpp/embedding_engine/EmbeddingEngine.h:21, EmbeddingExecutor.h:36) and the
dense downstream module (rtp_llm/models/downstream_modules/): batches prompts
through the same model forward, pools hidden states (last-token or mean),
L2-normalizes. KV writes land in scratch blocks allocated from the shared pool
and freed immediately — generation state is untouched.
"""

from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rtp_llm_tpu.models.batch import ModelInputs


class EmbeddingEngine:
    def __init__(self, engine, buckets=(32, 128, 512)):
        """engine: the owning LlmEngine (shares weights + KV buffer + pool).
        Must be driven from the same thread as engine.step (the engine loop,
        or via EngineRunner.run_embedding)."""
        self.engine = engine
        self.buckets = tuple(sorted(buckets))
        self._jits = {}

    def _fn(self, bucket: int, pooling: str):
        key = (bucket, pooling)
        if key not in self._jits:
            model = self.engine.model

            def impl(weights, kv, tokens, positions, bt, kv_lens, q_offsets):
                inputs = ModelInputs(tokens, positions, bt, kv_lens, q_offsets)
                out, kv = model.forward(
                    weights, kv, inputs, need_all_hidden=(pooling == "mean")
                )
                if pooling == "mean":
                    t = tokens.shape[1]
                    mask = (jnp.arange(t)[None, :] < kv_lens[:, None]).astype(
                        jnp.float32
                    )[:, :, None]
                    h = jnp.sum(out.all_hidden.astype(jnp.float32) * mask, axis=1)
                    h = h / jnp.maximum(jnp.sum(mask, axis=1), 1.0)
                else:  # last-token pooling
                    h = out.hidden.astype(jnp.float32)
                h = h / jnp.maximum(
                    jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12
                )
                return h, kv

            self._jits[key] = jax.jit(impl, donate_argnums=(1,))
        return self._jits[key]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def embed(self, prompts: List[List[int]], pooling: str = "last") -> np.ndarray:
        """Returns [n, hidden] float32 L2-normalized embeddings."""
        eng = self.engine
        out = np.zeros((len(prompts), eng.model.cfg.hidden_size), np.float32)
        bs = eng.cache_mgr.block_size
        for i, ids in enumerate(prompts):
            self._embed_one(eng, out, i, ids, bs, pooling)
        return out

    def _embed_one(self, eng, out, i, ids, bs, pooling):
        with eng.device_lock:
            ids = list(ids)[: self.buckets[-1]]
            bucket = self._bucket_for(len(ids))
            alloc = eng.cache_mgr.allocate(ids)
            if alloc is None:
                raise RuntimeError("KV pool exhausted for embedding request")
            mb = math.ceil(bucket / bs)
            bt = np.zeros((1, mb), np.int32)
            bt[0, : min(len(alloc.blocks), mb)] = alloc.blocks[:mb]
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(ids)] = ids
            pos = np.zeros((1, bucket), np.int32)
            pos[0, : len(ids)] = np.arange(len(ids))
            fn = self._fn(bucket, pooling)
            h, eng.kv = fn(
                eng.weights, eng.kv,
                jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(bt),
                jnp.asarray([len(ids)], np.int32),
                jnp.asarray([0], np.int32),
            )
            out[i] = np.asarray(h[0])
            eng.cache_mgr.pool.free(alloc.blocks)
            alloc.blocks = []

    # ---- downstream heads (reference: models/downstream_modules/) ----
    #
    # Aux head weights are a separate small dict (engine/embedding heads are
    # independent of the generation weight tree):
    #   sparse_linear  [H, 1] (+ sparse_bias [1])     — BGE-M3 lexical weights
    #   colbert_linear [H, D] (+ colbert_bias [D])    — per-token vectors
    #   classifier     [H, C] (+ classifier_bias [C]) — sequence classifier /
    #                                                    cross-encoder reranker
    # (reference: sparse_emebdding_module.py, colbert_embedding_module.py,
    #  classifier/classifier.py, reranker/reranker_module.py)

    def _all_hidden(self, ids: List[int]):
        """[T, H] float32 hidden states for one prompt (pre-pooling)."""
        eng = self.engine
        with eng.device_lock:
            ids = list(ids)[: self.buckets[-1]]
            bucket = self._bucket_for(len(ids))
            alloc = eng.cache_mgr.allocate(ids)
            if alloc is None:
                raise RuntimeError("KV pool exhausted for embedding request")
            bs = eng.cache_mgr.block_size
            mb = math.ceil(bucket / bs)
            bt = np.zeros((1, mb), np.int32)
            bt[0, : min(len(alloc.blocks), mb)] = alloc.blocks[:mb]
            toks = np.zeros((1, bucket), np.int32)
            toks[0, : len(ids)] = ids
            pos = np.zeros((1, bucket), np.int32)
            pos[0, : len(ids)] = np.arange(len(ids))
            key = (bucket, "_hidden")
            if key not in self._jits:
                model = eng.model

                def impl(weights, kv, tokens, positions, bt, kv_lens, q_offsets):
                    inputs = ModelInputs(tokens, positions, bt, kv_lens,
                                         q_offsets)
                    out, kv = model.forward(weights, kv, inputs,
                                            need_all_hidden=True)
                    return out.all_hidden.astype(jnp.float32), kv

                self._jits[key] = jax.jit(impl, donate_argnums=(1,))
            h, eng.kv = self._jits[key](
                eng.weights, eng.kv,
                jnp.asarray(toks), jnp.asarray(pos), jnp.asarray(bt),
                jnp.asarray([len(ids)], np.int32),
                jnp.asarray([0], np.int32),
            )
            h = np.asarray(h[0][: len(ids)])
            eng.cache_mgr.pool.free(alloc.blocks)
            alloc.blocks = []
            return h

    def embed_sparse(self, prompts: List[List[int]], heads: dict,
                     exclude_token_ids=()) -> List[dict]:
        """BGE-M3 lexical weights: relu(sparse_linear(h_t)) aggregated as max
        per token id (special tokens excluded). Returns [{token_id: w}]."""
        w = np.asarray(heads["sparse_linear"], np.float32)
        b = float(np.asarray(heads.get("sparse_bias", [0.0]))[0])
        excl = set(int(t) for t in exclude_token_ids)
        out = []
        for ids in prompts:
            h = self._all_hidden(ids)  # [T, H]
            scores = np.maximum(h @ w[:, 0] + b, 0.0)  # [T]
            d: dict = {}
            for t, s in zip(ids[: len(scores)], scores):
                t = int(t)
                if t in excl or s <= 0:
                    continue
                if d.get(t, 0.0) < float(s):
                    d[t] = float(s)
            out.append(d)
        return out

    def embed_colbert(self, prompts: List[List[int]], heads: dict) -> list:
        """Per-token ColBERT vectors: normalize(colbert_linear(h_t)).
        Returns a list of [T, D] float32 arrays."""
        w = np.asarray(heads["colbert_linear"], np.float32)
        b = np.asarray(heads.get("colbert_bias",
                                 np.zeros(w.shape[1])), np.float32)
        out = []
        for ids in prompts:
            h = self._all_hidden(ids)
            v = h @ w + b  # [T, D]
            v = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True),
                               1e-12)
            out.append(v)
        return out

    def classify(self, prompts: List[List[int]], heads: dict,
                 pooling: str = "last") -> np.ndarray:
        """Sequence classification: classifier(pooled hidden) -> [n, C].

        Two-layer roberta-style heads (reference: RobertaClassifierHandler,
        downstream_modules/classifier/roberta_classifier.py — dense + tanh +
        out_proj on the FIRST token) apply when ``classifier_dense`` is
        present."""
        w = np.asarray(heads["classifier"], np.float32)
        b = np.asarray(heads.get("classifier_bias",
                                 np.zeros(w.shape[1])), np.float32)
        dense = heads.get("classifier_dense")
        if dense is not None:
            dense = np.asarray(dense, np.float32)
            dense_b = np.asarray(heads.get(
                "classifier_dense_bias", np.zeros(dense.shape[1])), np.float32)
            pooling = "first"
        out = np.zeros((len(prompts), w.shape[1]), np.float32)
        for i, ids in enumerate(prompts):
            h = self._all_hidden(ids)
            pooled = (h.mean(0) if pooling == "mean"
                      else h[0] if pooling == "first" else h[-1])
            if dense is not None:
                pooled = np.tanh(pooled @ dense + dense_b)
            out[i] = pooled @ w + b
        return out

    def rerank(self, pair_token_ids: List[List[int]], heads: dict,
               pooling: str = "last") -> np.ndarray:
        """Cross-encoder reranking: each entry is the tokenized (query, doc)
        pair; score = sigmoid(classifier(pooled)[0]) (reference:
        reranker_module.py:56-91). Returns [n] float32 scores."""
        logits = self.classify(pair_token_ids, heads, pooling)
        return 1.0 / (1.0 + np.exp(-logits[:, 0]))


def load_downstream_heads(model_path: str) -> dict:
    """Load aux head weights from a checkpoint dir (reference: bge-m3 ships
    sparse_linear.pt / colbert_linear.pt next to the model; classifier
    checkpoints carry a 'classifier' / 'score' tensor). Canonical layout:
    [in, out] matrices. Missing heads are simply absent from the dict."""
    import os

    heads = {}

    def put_linear(prefix, state):
        w = state.get("weight")
        if w is None:
            return
        heads[prefix] = np.asarray(w, np.float32).T  # torch [out,in]->[in,out]
        if state.get("bias") is not None:
            heads[prefix.replace("_linear", "") + "_bias"] = np.asarray(
                state["bias"], np.float32)

    for name in ("sparse_linear", "colbert_linear"):
        p = os.path.join(model_path, f"{name}.pt")
        if os.path.exists(p):
            import torch

            state = {k: v.float().numpy()
                     for k, v in torch.load(p, map_location="cpu").items()}
            put_linear(name, state)
    # classifier heads live inside the main checkpoint under these names
    try:
        from rtp_llm_tpu.loader.loader import _TensorSource

        src = _TensorSource(model_path)
        try:
            # roberta-style two-layer head first: dense + tanh + out_proj
            # (reference: RobertaClassifierHandler.custom_weight_info)
            try:
                heads["classifier"] = np.asarray(
                    src.get("classifier.out_proj.weight"), np.float32).T
                heads["classifier_dense"] = np.asarray(
                    src.get("classifier.dense.weight"), np.float32).T
                for nm, key in (("classifier.out_proj.bias",
                                 "classifier_bias"),
                                ("classifier.dense.bias",
                                 "classifier_dense_bias")):
                    try:
                        heads[key] = np.asarray(src.get(nm), np.float32)
                    except KeyError:
                        pass
            except KeyError:
                for cand in ("classifier.weight", "score.weight",
                             "classifier.dense.weight"):
                    try:
                        w = src.get(cand)
                    except KeyError:
                        continue
                    heads["classifier"] = np.asarray(w, np.float32).T
                    try:
                        heads["classifier_bias"] = np.asarray(
                            src.get(cand.replace("weight", "bias")),
                            np.float32)
                    except KeyError:
                        pass
                    break
        finally:
            src.close()
    except Exception:
        pass
    if "sparse_linear" in heads and heads["sparse_linear"].ndim == 1:
        heads["sparse_linear"] = heads["sparse_linear"][:, None]
    return heads
