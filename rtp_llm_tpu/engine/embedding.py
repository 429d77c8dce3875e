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
