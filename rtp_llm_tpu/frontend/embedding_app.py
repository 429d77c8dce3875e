"""Embeddings-only HTTP app for encoder-only models (bert family).

Reference analog: the embedding-engine deployment (EmbeddingEngine + openai
embedding endpoint) for bert/jina models.
"""

from __future__ import annotations

import asyncio
import functools
from typing import List

import numpy as np
from aiohttp import web

import jax
import jax.numpy as jnp


class EncoderEmbedder:
    """Bucketed, jitted encode for an encoder-only model."""

    def __init__(self, model, weights, buckets=(32, 128, 512), max_batch=16):
        self.model = model
        self.weights = weights
        self.buckets = tuple(sorted(buckets))
        self.max_batch = max_batch
        self._jits = {}

    def _fn(self, bucket, pooling):
        key = (bucket, pooling)
        if key not in self._jits:
            self._jits[key] = jax.jit(
                functools.partial(self.model.embed, pooling=pooling)
            )
        return self._jits[key]

    def embed(self, prompts: List[List[int]], pooling: str = "cls") -> np.ndarray:
        out = np.zeros((len(prompts), self.model.cfg.hidden_size), np.float32)
        order = sorted(range(len(prompts)), key=lambda i: len(prompts[i]))
        i = 0
        while i < len(order):
            batch_idx = order[i : i + self.max_batch]
            maxlen = max(len(prompts[j]) for j in batch_idx)
            bucket = next((b for b in self.buckets if maxlen <= b),
                          self.buckets[-1])
            toks = np.zeros((len(batch_idx), bucket), np.int32)
            mask = np.zeros((len(batch_idx), bucket), np.int32)
            for r, j in enumerate(batch_idx):
                ids = prompts[j][:bucket]
                toks[r, : len(ids)] = ids
                mask[r, : len(ids)] = 1
            vecs = self._fn(bucket, pooling)(
                self.weights, jnp.asarray(toks), jnp.asarray(mask)
            )
            out[batch_idx] = np.asarray(vecs, np.float32)
            i += self.max_batch
        return out


class _Batcher:
    """Cross-request micro-batching (reference: EmbeddingScheduler,
    cpp/embedding_engine/EmbeddingScheduler.h — concurrent requests
    coalesce into one encoder forward). Requests queue per pooling mode; a
    drainer gathers up to max_batch prompts (waiting window_ms for
    stragglers) and runs ONE embed call."""

    def __init__(self, embedder: EncoderEmbedder, window_ms: float = 2.0):
        self.embedder = embedder
        self.window = window_ms / 1e3
        self._queues: dict = {}
        self._tasks: dict = {}
        self.batches = 0
        self.coalesced_requests = 0

    async def embed(self, prompts, pooling: str):
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        q = self._queues.setdefault(pooling, [])
        q.append((prompts, fut))
        if pooling not in self._tasks or self._tasks[pooling].done():
            self._tasks[pooling] = asyncio.ensure_future(
                self._drain(pooling))
        return await fut

    async def _drain(self, pooling: str):
        await asyncio.sleep(self.window)  # gather stragglers
        loop = asyncio.get_running_loop()
        q = self._queues.get(pooling) or []
        while q:
            take, total = [], 0
            while q and total + len(q[0][0]) <= max(
                    self.embedder.max_batch, len(q[0][0])):
                prompts, fut = q.pop(0)
                take.append((prompts, fut))
                total += len(prompts)
            flat = [p for prompts, _ in take for p in prompts]
            self.batches += 1
            self.coalesced_requests += len(take)
            try:
                vecs = await loop.run_in_executor(
                    None, self.embedder.embed, flat, pooling)
            except Exception as e:  # noqa: BLE001
                for _, fut in take:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            off = 0
            for prompts, fut in take:
                if not fut.done():
                    fut.set_result(vecs[off: off + len(prompts)])
                off += len(prompts)


def build_embedding_app(embedder: EncoderEmbedder, tokenizer,
                        model_name: str) -> web.Application:
    batcher = _Batcher(embedder)

    async def embeddings(request: web.Request):
        body = await request.json()
        inputs = body.get("input")
        if inputs is None:
            raise web.HTTPBadRequest(text='"input" required')
        if isinstance(inputs, str):
            inputs = [inputs]
        if inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        prompts = [i if isinstance(i, list) else tokenizer.encode(i)
                   for i in inputs]
        vecs = await batcher.embed(prompts, body.get("pooling", "cls"))
        return web.json_response({
            "object": "list", "model": model_name,
            "data": [{"object": "embedding", "index": i,
                      "embedding": v.tolist()} for i, v in enumerate(vecs)],
            "usage": {"prompt_tokens": sum(len(p) for p in prompts),
                      "total_tokens": sum(len(p) for p in prompts)},
        })

    async def health(request):
        return web.json_response({"status": "ok",
                                  "batches": batcher.batches,
                                  "coalesced": batcher.coalesced_requests})

    async def models(request):
        return web.json_response({
            "object": "list",
            "data": [{"id": model_name, "object": "model",
                      "owned_by": "rtp-llm-tpu"}],
        })

    app = web.Application()
    app.add_routes([
        web.post("/v1/embeddings", embeddings),
        web.get("/health", health),
        web.get("/status", health),
        web.get("/v1/models", models),
    ])
    return app
