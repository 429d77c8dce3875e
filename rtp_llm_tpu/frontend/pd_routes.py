"""PD-disaggregation HTTP plane.

Reference analog: PrefillRpcServer / DecodeRpcServer gRPC pair
(cpp/model_rpc/PrefillRpcServer.h:10, DecodeRpcServer.h:11) + the cache-store
transfer (SURVEY.md §3.4). TPU/DCN version: the prefill instance POSTs the
prompt's KV rows (raw bytes) + first token to the decode instance's
``/remote_generate``, which enqueues a preloaded stream and streams tokens
back as NDJSON; the prefill instance relays them to its client.
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Optional

import aiohttp
import numpy as np
from aiohttp import web

from rtp_llm_tpu.config.generate_config import GenerateConfig

logger = logging.getLogger(__name__)


class DecodeRole:
    """Routes served by the decode instance."""

    def __init__(self, runner):
        self.runner = runner

    async def remote_generate(self, request: web.Request) -> web.StreamResponse:
        """Body: multipart-free framing — JSON header line + raw KV bytes.
        Header: {token_ids, first_token, first_logprob, dtype, shape, config}.
        """
        meta, kv_rows = await _read_kv_payload(request.content)
        cfg = GenerateConfig.from_dict(meta.get("config") or {})
        engine = self.runner.engine
        stream = engine.enqueue_preloaded(
            list(meta["token_ids"]), int(meta["first_token"]), kv_rows, cfg,
            first_logprob=float(meta.get("first_logprob", 0.0)),
        )
        self.runner.kick()

        resp = web.StreamResponse(
            status=200, headers={"Content-Type": "application/x-ndjson"}
        )
        await resp.prepare(request)
        # the first (prefill-produced) token is already in the stream's queue
        aq = stream.register_async(asyncio.get_running_loop())
        while True:
            out = await aq.get()
            payload = {
                "tokens": [int(t) for t in out.new_tokens],
                "finished": out.finished,
                "finish_reason": out.finish_reason.value
                if out.finish_reason else None,
            }
            await resp.write((json.dumps(payload) + "\n").encode())
            if out.finished:
                break
        await resp.write_eof()
        return resp

    def add_routes(self, app: web.Application):
        app.router.add_post("/remote_generate", self.remote_generate)


def _pack_kv_payload(head: dict, kv_rows) -> bytes:
    """JSON header line + raw KV bytes (shared framing for both PD
    directions)."""
    if isinstance(kv_rows, dict):  # pytree KV (int8 cache: data + scales)
        segs, body = [], b""
        for name in sorted(kv_rows):
            a = np.ascontiguousarray(kv_rows[name])
            segs.append({"name": name, "dtype": str(a.dtype),
                         "shape": list(a.shape), "nbytes": a.nbytes})
            body += a.tobytes()
        head["segments"] = segs
    else:
        kv = np.ascontiguousarray(kv_rows)
        head.update(dtype=str(kv.dtype), shape=list(kv.shape),
                    nbytes=kv.nbytes)
        body = kv.tobytes()
    return json.dumps(head).encode() + b"\n" + body


async def _read_kv_payload(reader):
    """Inverse of _pack_kv_payload over an aiohttp StreamReader."""
    header_line = await reader.readline()
    meta = json.loads(header_line)
    if "segments" in meta:
        kv_rows = {}
        for seg in meta["segments"]:
            raw = await reader.readexactly(int(seg["nbytes"]))
            kv_rows[seg["name"]] = np.frombuffer(
                raw, dtype=np.dtype(seg["dtype"])).reshape(seg["shape"])
    else:
        raw = await reader.readexactly(int(meta["nbytes"]))
        kv_rows = np.frombuffer(
            raw, dtype=np.dtype(meta["dtype"])).reshape(meta["shape"])
    return meta, kv_rows


class PrefillRole:
    """Passive routes served by a prefill instance under DECODE-ENTRANCE
    inversion (reference: docs/backend/pd_entrance_transpose.md + the
    loadCache RPC on PrefillRpcServer): the decode instance is the request
    entry; it asks this instance to prefill and streams the KV back in the
    response body, so the token stream never relays through the prefill
    node."""

    def __init__(self, runner):
        self.runner = runner

    async def prefill_kv(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        cfg = GenerateConfig.from_dict(body.get("config") or {})
        token_ids = list(body["token_ids"])
        engine = self.runner.engine
        loop = asyncio.get_running_loop()
        tok, lp, kv_rows = await loop.run_in_executor(
            None, engine.prefill_only, token_ids, cfg)
        payload = _pack_kv_payload(
            {"first_token": int(tok), "first_logprob": float(lp)}, kv_rows)
        resp = web.StreamResponse(
            status=200,
            headers={"Content-Type": "application/octet-stream"})
        await resp.prepare(request)
        # chunked write: the decode side starts consuming KV bytes while the
        # tail is still in flight (the async-pull of the reference design)
        for off in range(0, len(payload), 1 << 20):
            await resp.write(payload[off: off + (1 << 20)])
        await resp.write_eof()
        return resp

    def add_routes(self, app: web.Application):
        app.router.add_post("/prefill_kv", self.prefill_kv)


class DecodeEntranceBackend:
    """Decode-instance generation backend under entrance inversion
    (reference: DECODE_ENTRANCE=1, DecodeRpcServer.h:11): request enters
    HERE; the prefill peer computes the first token + KV, which this side
    pulls asynchronously; decode then proceeds locally and streams straight
    to the client — removing the prefill relay hop from every token."""

    def __init__(self, engine, runner, prefill_peer: str):
        self.engine = engine
        self.runner = runner
        self.peer = prefill_peer
        self._session: Optional[aiohttp.ClientSession] = None

    async def _sess(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession()
        return self._session

    async def generate(self, token_ids, config: GenerateConfig, peer=None):
        """Async generator of (new_tokens, finished, finish_reason) — the
        same contract as PrefillForwarder.generate, so the OpenAI frontend
        works unchanged in either entrance. ``peer`` overrides the prefill
        peer for this request (router PD pair selection)."""
        import dataclasses

        peer = peer or self.peer
        sess = await self._sess()
        async with sess.post(
            f"http://{peer}/prefill_kv",
            json={"token_ids": list(map(int, token_ids)),
                  "config": dataclasses.asdict(config)},
            timeout=aiohttp.ClientTimeout(total=600),
        ) as resp:
            if resp.status != 200:
                raise RuntimeError(
                    f"prefill peer error {resp.status}: {await resp.text()}")
            meta, kv_rows = await _read_kv_payload(resp.content)
        stream = self.engine.enqueue_preloaded(
            list(map(int, token_ids)), int(meta["first_token"]), kv_rows,
            config, first_logprob=float(meta.get("first_logprob", 0.0)),
        )
        self.runner.kick()
        aq = stream.register_async(asyncio.get_running_loop())
        while True:
            out = await aq.get()
            yield ([int(t) for t in out.new_tokens], out.finished,
                   out.finish_reason.value if out.finish_reason else None)
            if out.finished:
                return


class PrefillForwarder:
    """The prefill instance's generation backend: local prefill + KV push to
    the decode peer, then token relay."""

    def __init__(self, engine, decode_peer: str,
                 decode_grpc_peer: Optional[str] = None):
        self.engine = engine
        self.peer = decode_peer
        self.grpc_peer = decode_grpc_peer  # "host:port" — preferred plane
        self._session: Optional[aiohttp.ClientSession] = None
        self._grpc_client = None

    async def _sess(self) -> aiohttp.ClientSession:
        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession()
        return self._session

    async def generate(self, token_ids, config: GenerateConfig, peer=None):
        """Async generator of (new_tokens, finished, finish_reason).

        ``peer`` overrides the configured decode peer for THIS request —
        the cluster router's PD pair selection rides in on a header
        (reference: FlexLB RequestScheduler picks the prefill/decode pair
        per request, flexlb/.../scheduler/RequestScheduler.java:28)."""
        peer = peer or self.peer
        loop = asyncio.get_running_loop()
        tok, lp, kv_rows = await loop.run_in_executor(
            None, self.engine.prefill_only, token_ids, config,
        )
        import dataclasses

        if self.grpc_peer and peer == self.peer:
            # binary KV over the gRPC plane (reference: cache-store transfer
            # between PrefillRpcServer and DecodeRpcServer); the blocking
            # stream is pumped from an executor thread into this event loop
            if self._grpc_client is None:
                from rtp_llm_tpu.server.grpc_server import GrpcGenerateClient

                self._grpc_client = GrpcGenerateClient(self.grpc_peer)
            q: asyncio.Queue = asyncio.Queue()
            cfg_dict = dataclasses.asdict(config)

            def pump():
                try:
                    for upd in self._grpc_client.remote_generate(
                            token_ids, tok, kv_rows, cfg_dict,
                            first_logprob=lp):
                        loop.call_soon_threadsafe(q.put_nowait, (
                            list(upd.tokens), upd.finished,
                            upd.finish_reason or None))
                        if upd.finished:
                            return
                    loop.call_soon_threadsafe(q.put_nowait, ([], True, "stop"))
                except Exception as e:  # surface transport errors to caller
                    loop.call_soon_threadsafe(q.put_nowait, e)

            fut = loop.run_in_executor(None, pump)
            while True:
                item = await q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
                if item[1]:
                    await fut
                    return

        payload = _pack_kv_payload({
            "token_ids": list(map(int, token_ids)),
            "first_token": tok,
            "first_logprob": lp,
            "config": dataclasses.asdict(config),
        }, kv_rows)
        sess = await self._sess()
        async with sess.post(
            f"http://{peer}/remote_generate",
            data=payload,
            timeout=aiohttp.ClientTimeout(total=600),
        ) as resp:
            if resp.status != 200:
                raise RuntimeError(
                    f"decode peer error {resp.status}: {await resp.text()}"
                )
            async for line in resp.content:
                line = line.strip()
                if not line:
                    continue
                msg = json.loads(line)
                yield msg["tokens"], msg["finished"], msg.get("finish_reason")
                if msg["finished"]:
                    return
