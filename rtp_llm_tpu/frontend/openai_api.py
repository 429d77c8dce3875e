"""OpenAI-compatible HTTP API over aiohttp.

Analog of the reference's FastAPI frontend + OpenaiEndpoint
(rtp_llm/frontend/frontend_app.py:177-385, rtp_llm/openai/openai_endpoint.py:50)
and the C++ HttpApiServer route set (cpp/api_server/HttpApiServer.cc:150-315):
  POST /v1/chat/completions   (stream + non-stream)
  POST /v1/completions
  POST /chat/completions, /   (legacy aliases)
  POST /tokenizer/encode
  GET  /v1/models, /health, /status, /worker_status
"""

from __future__ import annotations

import asyncio
import json
import logging
import time
import uuid
from typing import Optional

from aiohttp import web

from rtp_llm_tpu.config.generate_config import GenerateConfig
from rtp_llm_tpu.frontend.chat_renderer import create_renderer
from rtp_llm_tpu.frontend.token_processor import IncrementalDetokenizer
from rtp_llm_tpu.server.engine_runner import EngineRunner
from rtp_llm_tpu.utils.access_logger import AccessLogger
from rtp_llm_tpu.utils.metrics import METRICS

logger = logging.getLogger(__name__)


class OpenAIApp:
    def __init__(
        self,
        runner: EngineRunner,
        tokenizer,
        model_name: str = "rtp-llm-tpu",
        model_type: str = "",
        max_concurrency: int = 256,
        access_log_path: Optional[str] = None,
        enable_access_log: bool = True,
        pd_forwarder=None,  # PrefillForwarder when this app is a prefill role
        model_path: str = "",  # for downstream head discovery (_heads)
        vit_endpoint: str = "",  # remote VIT worker (VIT role)
        role: str = "fusion",  # PD role, reported via /worker_status
        decode_entrance: bool = False,
    ):
        self.role = role
        self.decode_entrance = decode_entrance
        self.vit_endpoint = vit_endpoint
        self.model_path = model_path
        self.pd_forwarder = pd_forwarder
        self.runner = runner
        self.tok = tokenizer
        self.model_name = model_name
        self.renderer = create_renderer(tokenizer, model_type)
        from rtp_llm_tpu.frontend.tool_detectors import get_tool_detector

        self.tool_detector = get_tool_detector(model_type)
        self.sem = asyncio.Semaphore(max_concurrency)
        self.start_time = time.time()
        self.request_count = 0
        self.access = AccessLogger(access_log_path) if enable_access_log else None

    # ---- helpers ----

    def _build_config(self, body: dict) -> GenerateConfig:
        cfg = GenerateConfig.from_dict(body)
        return cfg

    def _stop_sequences(self, cfg: GenerateConfig, extra_ids) -> list:
        seqs = []
        for s in cfg.stop_words:
            ids = self.tok.encode(s, add_special_tokens=False)
            if ids:
                seqs.append(ids)
        return seqs

    async def _collect(self, stream, detok: IncrementalDetokenizer):
        """Drain a stream to completion (non-streaming response). A stop
        string that only materializes in decoded text (tokenizing differently
        from the encoded stop sequences) finishes the stream immediately so
        the engine stops spending decode capacity on it."""
        from rtp_llm_tpu.engine.stream import FinishReason

        aq = stream.register_async(asyncio.get_running_loop())
        while True:
            out = await aq.get()
            if out.error:
                if out.error.startswith("overloaded"):
                    # SLA shed / queue full (reference: FlexLB backpressure)
                    raise web.HTTPTooManyRequests(text=out.error)
                raise web.HTTPInternalServerError(text=out.error)
            _, hit = detok.push(out.new_tokens)
            if hit and not out.finished:
                stream.finish(FinishReason.STOP)
                return out
            if out.finished:
                return out

    async def _stream_fanout(self, request, token_ids, cfg, stop_seqs, n,
                             rid, created, chat, route, t_start):
        """SSE with n choices: each sampled stream's chunks carry its choice
        index; [DONE] once all finish."""
        resp = web.StreamResponse(
            status=200,
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache", "Connection": "keep-alive"},
        )
        await resp.prepare(request)
        loop = asyncio.get_running_loop()

        def chunk_i(i, delta, finish=None):
            if chat:
                d = {"id": rid, "object": "chat.completion.chunk",
                     "created": created, "model": self.model_name,
                     "choices": [{"index": i, "delta": delta,
                                  "finish_reason": finish}]}
            else:
                d = {"id": rid, "object": "text_completion",
                     "created": created, "model": self.model_name,
                     "choices": [{"index": i,
                                  "text": delta.get("content", ""),
                                  "finish_reason": finish}]}
            return f"data: {json.dumps(d, ensure_ascii=False)}\n\n".encode()

        async with self.sem:
            merged: asyncio.Queue = asyncio.Queue()
            streams, detoks = [], []
            for i in range(n):
                s = self.runner.enqueue(token_ids, cfg,
                                        stop_token_sequences=stop_seqs)
                try:
                    self._check_admitted(s)
                except web.HTTPTooManyRequests:
                    for prev in streams:
                        prev.abort("overloaded: sibling stream shed")
                    raise
                streams.append(s)
                detoks.append(IncrementalDetokenizer(self.tok, cfg.stop_words))

                async def pump(i=i, s=s):
                    aq = s.register_async(loop)
                    while True:
                        out = await aq.get()
                        merged.put_nowait((i, out))
                        if out.finished:
                            return

                asyncio.ensure_future(pump())

            if chat:
                for i in range(n):
                    await resp.write(chunk_i(i, {"role": "assistant",
                                                 "content": ""}))
            live = n
            try:
                while live:
                    i, out = await merged.get()
                    if out.error:
                        await resp.write(chunk_i(i, {}, finish="error"))
                        live -= 1
                        continue
                    text, hit = detoks[i].push(out.new_tokens)
                    if hit and not out.finished:
                        from rtp_llm_tpu.engine.stream import FinishReason

                        streams[i].finish(FinishReason.STOP)
                    if text:
                        await resp.write(chunk_i(i, {"content": text}))
                    if out.finished:
                        fin = (out.finish_reason.value if out.finish_reason
                               else "stop")
                        await resp.write(chunk_i(i, {}, finish=fin))
                        live -= 1
                await resp.write(b"data: [DONE]\n\n")
            finally:
                for s in streams:
                    if not s.is_finished():
                        s.abort()
            self._log_done(rid, route, streams[0], token_ids, t_start)
        await resp.write_eof()
        return resp

    # ---- routes ----

    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        messages = body.get("messages") or []
        if not messages:
            raise web.HTTPBadRequest(text='"messages" required')
        mm = None
        has_images = any(
            isinstance(m.get("content"), list)
            and any(p.get("type") in ("image_url", "image")
                    for p in m["content"])
            for m in messages
        )
        has_audio = any(
            isinstance(m.get("content"), list)
            and any(p.get("type") == "input_audio" for p in m["content"])
            for m in messages
        )
        if has_audio:
            # qwen2_audio: decode + mel-extract audio parts on host, encode
            # through the JAX audio tower, splice like vision
            from rtp_llm_tpu.frontend.audio_chat import AudioChatHandler

            cfg = self.runner.engine.model.cfg
            if cfg.model_type != "qwen2_audio":
                raise web.HTTPBadRequest(
                    text="served model has no audio tower")
            if not hasattr(self, "_audio"):
                self._audio = AudioChatHandler(self.model_path, cfg)
            messages, audios = AudioChatHandler.extract_audio(messages)
            rendered = self.renderer.render(
                messages, tools=body.get("tools"),
                chat_template_kwargs=body.get("chat_template_kwargs"),
            )
            loop = asyncio.get_running_loop()
            token_ids, mm = await loop.run_in_executor(
                None, self._audio.process, rendered.token_ids, audios)
            return await self._generate_http(
                request, body, token_ids,
                extra_stop_words=rendered.stop_words,
                extra_stop_ids=rendered.stop_token_ids,
                chat=True, mm=mm,
            )
        if has_images:
            from rtp_llm_tpu.frontend.vision_chat import VisionChatHandler

            cfg = self.runner.engine.model.cfg
            if not getattr(cfg, "image_token_id", None):
                raise web.HTTPBadRequest(
                    text="served model has no vision tower")
            if not hasattr(self, "_vision"):
                self._vision = VisionChatHandler(
                    self.model_path, cfg, self.tok,
                    vit_endpoint=self.vit_endpoint)
            messages, images = VisionChatHandler.extract_images(messages)
            rendered = self.renderer.render(
                messages, tools=body.get("tools"),
                chat_template_kwargs=body.get("chat_template_kwargs"),
            )
            loop = asyncio.get_running_loop()
            token_ids, mm = await loop.run_in_executor(
                None, self._vision.process, rendered.token_ids, images)
            return await self._generate_http(
                request, body, token_ids,
                extra_stop_words=rendered.stop_words,
                extra_stop_ids=rendered.stop_token_ids,
                chat=True, mm=mm,
            )
        rendered = self.renderer.render(
            messages,
            tools=body.get("tools"),
            chat_template_kwargs=body.get("chat_template_kwargs"),
        )
        return await self._generate_http(
            request, body, rendered.token_ids,
            extra_stop_words=rendered.stop_words,
            extra_stop_ids=rendered.stop_token_ids,
            chat=True,
        )

    async def completions(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        prompt = body.get("prompt")
        if prompt is None:
            raise web.HTTPBadRequest(text='"prompt" required')
        if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            ids = [int(t) for t in prompt]
        else:
            if isinstance(prompt, list):
                prompt = prompt[0]
            ids = self.tok.encode(prompt)
        return await self._generate_http(request, body, ids, chat=False)

    async def _generate_http(
        self, request, body, token_ids, extra_stop_words=(), extra_stop_ids=(),
        chat=True, mm=None,
    ):
        cfg = self._build_config(body)
        cfg.stop_words = list(cfg.stop_words) + [
            w for w in extra_stop_words if w not in cfg.stop_words
        ]
        cfg.stop_token_ids = list(cfg.stop_token_ids) + [
            t for t in extra_stop_ids if t not in cfg.stop_token_ids
        ]
        stop_seqs = self._stop_sequences(cfg, extra_stop_ids)
        stream_mode = bool(body.get("stream", False))
        rid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
        created = int(time.time())
        self.request_count += 1
        t_start = time.time()
        route = "/v1/chat/completions" if chat else "/v1/completions"
        if self.access:
            self.access.log_query(rid, route, {
                "prompt_tokens": len(token_ids), "stream": stream_mode,
                "max_new_tokens": cfg.max_new_tokens,
            })
        METRICS.inc("frontend.requests")

        if self.pd_forwarder is not None:
            return await self._generate_pd(
                request, body, token_ids, cfg, stop_seqs, stream_mode, rid,
                created, chat, route, t_start,
            )

        if cfg.calculate_loss and not stream_mode:
            # reference: GenerateConfig.calculate_loss (GenerateConfig.h:56)
            # — teacher-forced prompt NLL for RL/scoring clients; attached
            # to the non-streaming response alongside normal generation
            loop = asyncio.get_running_loop()
            async with self.sem:
                nll = await loop.run_in_executor(
                    None, self.runner.engine.compute_prompt_loss, token_ids)
            body_loss = (float(nll.mean()) if cfg.calculate_loss == 1
                         else nll.tolist())
        else:
            body_loss = None

        # num_return_sequences fan-out (reference: beam/num-return fanout in
        # GenerateStream; independent sampled streams, one choice each)
        if cfg.return_hidden_states and not stream_mode:
            # reference: GenerateConfig return_hidden_states (RL scoring
            # clients); teacher-forced loop outside the fused decode path
            loop = asyncio.get_running_loop()
            async with self.sem:
                stream, hid = await loop.run_in_executor(
                    None, self.runner.engine.generate_with_hidden,
                    token_ids, cfg)
            detok = IncrementalDetokenizer(self.tok, cfg.stop_words)
            text, _ = detok.push(stream.output_token_ids)
            fin = stream.finish_reason.value if stream.finish_reason else "stop"
            self._log_done(rid, route, stream, token_ids, t_start)
            choice = ({"index": 0, "message": {"role": "assistant",
                                               "content": text},
                       "finish_reason": fin} if chat
                      else {"index": 0, "text": text, "finish_reason": fin,
                            "logprobs": None})
            choice["hidden_states"] = hid.tolist()
            payload_h = {
                "id": rid,
                "object": "chat.completion" if chat else "text_completion",
                "created": created, "model": self.model_name,
                "choices": [choice],
                "usage": {
                    "prompt_tokens": len(token_ids),
                    "completion_tokens": len(stream.output_token_ids),
                    "total_tokens": len(token_ids)
                    + len(stream.output_token_ids),
                },
            }
            if body_loss is not None:
                payload_h["loss"] = body_loss
            return web.json_response(payload_h)

        n = max(1, cfg.num_return_sequences)
        if n > 1 and stream_mode:
            # streaming fan-out: n independent streams, chunks interleaved
            # with per-choice indices (reference: num_return_sequences
            # streaming in GenerateStream)
            cfg.num_return_sequences = 1
            return await self._stream_fanout(
                request, token_ids, cfg, stop_seqs, n, rid, created, chat,
                route, t_start,
            )
        if n > 1 and not stream_mode:
            cfg.num_return_sequences = 1
            async with self.sem:
                streams, detoks = [], []
                for _ in range(n):
                    s = self.runner.enqueue(
                        token_ids, cfg, stop_token_sequences=stop_seqs
                    )
                    try:
                        self._check_admitted(s)
                    except web.HTTPTooManyRequests:
                        # shed mid-loop: release already-enqueued siblings so
                        # they stop consuming capacity exactly when the
                        # server is overloaded (ADVICE r4)
                        for prev in streams:
                            prev.abort("overloaded: sibling stream shed")
                        raise
                    streams.append(s)
                    detoks.append(IncrementalDetokenizer(self.tok, cfg.stop_words))
                for s, d in zip(streams, detoks):
                    await self._collect(s, d)
                self._log_done(rid, route, streams[0], token_ids, t_start)
                choices = []
                for i, (s, d) in enumerate(zip(streams, detoks)):
                    fin = s.finish_reason.value if s.finish_reason else "stop"
                    if chat:
                        choices.append({
                            "index": i,
                            "message": {"role": "assistant", "content": d.full_text},
                            "finish_reason": fin,
                        })
                    else:
                        choices.append({"index": i, "text": d.full_text,
                                        "finish_reason": fin, "logprobs": None})
                comp = sum(len(s.output_token_ids) for s in streams)
                payload = {
                    "id": rid,
                    "object": "chat.completion" if chat else "text_completion",
                    "created": created, "model": self.model_name,
                    "choices": choices,
                    "usage": {
                        "prompt_tokens": len(token_ids),
                        "completion_tokens": comp,
                        "total_tokens": len(token_ids) + comp,
                    },
                }
                if body_loss is not None:
                    payload["loss"] = body_loss
                return web.json_response(payload)

        async with self.sem:
            stream = self.runner.enqueue(token_ids, cfg,
                                         stop_token_sequences=stop_seqs,
                                         mm=mm)
            self._check_admitted(stream)
            detok = IncrementalDetokenizer(self.tok, cfg.stop_words)
            if not stream_mode:
                out = await self._collect(stream, detok)
                text = detok.full_text
                self._log_done(rid, route, stream, token_ids, t_start)
                usage = {
                    "prompt_tokens": len(token_ids),
                    "completion_tokens": len(stream.output_token_ids),
                    "total_tokens": len(token_ids) + len(stream.output_token_ids),
                }
                finish = stream.finish_reason.value if stream.finish_reason else "stop"
                logprobs_obj = None
                if cfg.return_logprobs and stream.output_logprobs:
                    logprobs_obj = {
                        "content": [
                            {
                                "token": self.tok.decode([t]),
                                "logprob": lp,
                                "top_logprobs": [],
                            }
                            for t, lp in zip(stream.output_token_ids,
                                             stream.output_logprobs)
                        ]
                    }
                if chat:
                    from rtp_llm_tpu.frontend.output_parsers import parse_output

                    parsed = parse_output(text, detector=self.tool_detector)
                    message = {"role": "assistant", "content": parsed.content}
                    if parsed.reasoning_content:
                        message["reasoning_content"] = parsed.reasoning_content
                    if parsed.tool_calls:
                        message["tool_calls"] = parsed.tool_calls
                        message["content"] = parsed.content or None
                        finish = "tool_calls"
                    payload = {
                        "id": rid, "object": "chat.completion", "created": created,
                        "model": self.model_name,
                        "choices": [{
                            "index": 0,
                            "message": message,
                            "finish_reason": finish,
                            "logprobs": logprobs_obj,
                        }],
                        "usage": usage,
                    }
                else:
                    lp_completions = None
                    if cfg.return_logprobs and stream.output_logprobs:
                        lp_completions = {
                            "tokens": [self.tok.decode([t])
                                       for t in stream.output_token_ids],
                            "token_logprobs": list(stream.output_logprobs),
                            "top_logprobs": None,
                            "text_offset": None,
                        }
                    payload = {
                        "id": rid, "object": "text_completion", "created": created,
                        "model": self.model_name,
                        "choices": [{
                            "index": 0, "text": text, "finish_reason": finish,
                            "logprobs": lp_completions,
                        }],
                        "usage": usage,
                    }
                if body_loss is not None:
                    payload["loss"] = body_loss
                return web.json_response(payload)

            # SSE streaming
            resp = web.StreamResponse(
                status=200,
                headers={
                    "Content-Type": "text/event-stream",
                    "Cache-Control": "no-cache",
                    "Connection": "keep-alive",
                },
            )
            await resp.prepare(request)
            loop = asyncio.get_running_loop()

            def chunk(delta: dict, finish: Optional[str] = None):
                if chat:
                    d = {
                        "id": rid, "object": "chat.completion.chunk",
                        "created": created, "model": self.model_name,
                        "choices": [{"index": 0, "delta": delta,
                                     "finish_reason": finish}],
                    }
                else:
                    d = {
                        "id": rid, "object": "text_completion",
                        "created": created, "model": self.model_name,
                        "choices": [{"index": 0,
                                     "text": delta.get("content", ""),
                                     "finish_reason": finish}],
                    }
                return f"data: {json.dumps(d, ensure_ascii=False)}\n\n".encode()

            # incremental think/tool parsing for chat streams (reference:
            # streaming reasoning/tool renderers, rtp_llm/openai/renderers/)
            from rtp_llm_tpu.frontend.output_parsers import StreamingOutputParser

            parser = (StreamingOutputParser(detector=self.tool_detector)
                      if chat else None)

            async def emit_text(text):
                if parser is None:
                    if text:
                        await resp.write(chunk({"content": text}))
                    return
                r, c = parser.push(text)
                if r:
                    await resp.write(chunk({"reasoning_content": r}))
                if c:
                    await resp.write(chunk({"content": c}))

            try:
                if chat:
                    await resp.write(chunk({"role": "assistant", "content": ""}))
                aq = stream.register_async(loop)
                while True:
                    out = await aq.get()
                    if out.error:
                        break
                    text, hit = detok.push(out.new_tokens)
                    if hit and not out.finished:
                        # stop string seen only in decoded text: finish the
                        # stream (frees its decode slot next engine step) and
                        # close this response with finish_reason "stop"
                        from rtp_llm_tpu.engine.stream import FinishReason

                        stream.finish(FinishReason.STOP)
                    if out.finished or hit:
                        text += detok.finalize()
                        await emit_text(text)
                        finish = ("stop" if hit else
                                  (stream.finish_reason.value
                                   if stream.finish_reason else "stop"))
                        if parser is not None:
                            r, c, tool_calls = parser.finalize()
                            if r:
                                await resp.write(chunk({"reasoning_content": r}))
                            if c:
                                await resp.write(chunk({"content": c}))
                            if tool_calls:
                                await resp.write(chunk({
                                    "tool_calls": [
                                        {**tc, "index": i}
                                        for i, tc in enumerate(tool_calls)
                                    ]
                                }))
                                finish = "tool_calls"
                        await resp.write(chunk({}, finish=finish))
                        await resp.write(b"data: [DONE]\n\n")
                        self._log_done(rid, route, stream, token_ids, t_start)
                        break
                    await emit_text(text)
            except (ConnectionResetError, asyncio.CancelledError):
                stream.abort()  # client went away
                raise
            await resp.write_eof()
            return resp

    async def _generate_pd(self, request, body, token_ids, cfg, stop_seqs,
                           stream_mode, rid, created, chat, route, t_start):
        """Prefill-role generation: local prefill, KV push to the decode
        peer, token relay (reference: PrefillRpcServer flow, SURVEY.md §3.4)."""
        detok = IncrementalDetokenizer(self.tok, cfg.stop_words)
        n_tokens = 0
        finish = "stop"
        # router-selected PD pair: the peer for THIS request (decode peer on
        # a prefill entrance; prefill peer on a decode entrance)
        pd_peer = request.headers.get("X-RTP-PD-Peer")
        if not stream_mode:
            text = ""
            async with self.sem:
                async for toks, finished, reason in self.pd_forwarder.generate(
                    token_ids, cfg, peer=pd_peer
                ):
                    out, _hit = detok.push(toks)
                    text += out
                    n_tokens += len(toks)
                    if finished:
                        finish = reason or "stop"
            text += detok.finalize()
            payload = {
                "id": rid,
                "object": "chat.completion" if chat else "text_completion",
                "created": created, "model": self.model_name,
                "choices": [
                    {"index": 0,
                     "message": {"role": "assistant", "content": detok.full_text}}
                    if chat else
                    {"index": 0, "text": detok.full_text, "logprobs": None}
                ],
                "usage": {
                    "prompt_tokens": len(token_ids),
                    "completion_tokens": n_tokens,
                    "total_tokens": len(token_ids) + n_tokens,
                },
            }
            payload["choices"][0]["finish_reason"] = finish
            return web.json_response(payload)

        resp = web.StreamResponse(
            status=200,
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"},
        )
        await resp.prepare(request)

        def chunk(delta, fin=None):
            d = {
                "id": rid,
                "object": "chat.completion.chunk" if chat else "text_completion",
                "created": created, "model": self.model_name,
                "choices": [
                    {"index": 0, "delta": delta, "finish_reason": fin}
                    if chat else
                    {"index": 0, "text": delta.get("content", ""),
                     "finish_reason": fin}
                ],
            }
            return f"data: {json.dumps(d, ensure_ascii=False)}\n\n".encode()

        if chat:
            await resp.write(chunk({"role": "assistant", "content": ""}))
        async with self.sem:
            async for toks, finished, reason in self.pd_forwarder.generate(
                token_ids, cfg, peer=pd_peer
            ):
                text, _hit = detok.push(toks)
                if finished:
                    text += detok.finalize()
                if text:
                    await resp.write(chunk({"content": text}))
                if finished:
                    await resp.write(chunk({}, fin=reason or "stop"))
                    await resp.write(b"data: [DONE]\n\n")
                    break
        await resp.write_eof()
        return resp

    async def embeddings(self, request: web.Request):
        """OpenAI /v1/embeddings (reference: EmbeddingService,
        embedding/embedding_endpoint.py). embedding_type selects the
        downstream head: dense (default) | sparse | colbert."""
        return await self._embeddings_impl(await request.json())

    def _embeddings_typed(self, etype: str):
        async def handler(request: web.Request):
            body = await request.json()
            body["embedding_type"] = etype
            return await self._embeddings_impl(body)
        return handler

    async def _embeddings_impl(self, body: dict):
        inputs = body.get("input")
        if inputs is None:
            raise web.HTTPBadRequest(text='"input" required')
        if isinstance(inputs, str):
            inputs = [inputs]
        if inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        prompts = [
            i if isinstance(i, list) else self.tok.encode(i) for i in inputs
        ]
        loop = asyncio.get_running_loop()
        emb = self._get_embed_engine()
        etype = body.get("embedding_type", body.get("type", "dense"))
        if etype == "sparse":
            excl = [t for t in (
                getattr(self.tok, "cls_token_id", None),
                getattr(self.tok, "eos_token_id", None),
                getattr(self.tok, "pad_token_id", None),
                getattr(self.tok, "unk_token_id", None),
            ) if t is not None]
            maps = await loop.run_in_executor(
                None, emb.embed_sparse, prompts, self._heads(), excl)
            if body.get("return_decoded"):
                maps = [{self.tok.decode([k]): v for k, v in m.items()}
                        for m in maps]
            else:
                maps = [{str(k): v for k, v in m.items()} for m in maps]
            data = [{"object": "embedding", "index": i, "embedding": m,
                     "embedding_type": "sparse"} for i, m in enumerate(maps)]
        elif etype == "colbert":
            mats = await loop.run_in_executor(
                None, emb.embed_colbert, prompts, self._heads())
            data = [{"object": "embedding", "index": i,
                     "embedding": m.tolist(), "embedding_type": "colbert"}
                    for i, m in enumerate(mats)]
        else:
            vecs = await loop.run_in_executor(
                None, emb.embed, prompts, body.get("pooling", "last"),
            )
            data = [{"object": "embedding", "index": i, "embedding": v.tolist()}
                    for i, v in enumerate(vecs)]
        return web.json_response({
            "object": "list",
            "model": self.model_name,
            "data": data,
            "usage": {
                "prompt_tokens": sum(len(p) for p in prompts),
                "total_tokens": sum(len(p) for p in prompts),
            },
        })

    def _get_embed_engine(self):
        from rtp_llm_tpu.engine.embedding import EmbeddingEngine

        if not hasattr(self, "_embed_engine"):
            self._embed_engine = EmbeddingEngine(self.runner.engine)
        return self._embed_engine

    def _heads(self) -> dict:
        """Downstream head weights (sparse/colbert/classifier), lazily loaded
        from the model dir (reference: models/downstream_modules/)."""
        if not hasattr(self, "_downstream_heads"):
            from rtp_llm_tpu.engine.embedding import load_downstream_heads

            path = getattr(self, "model_path", "") or ""
            self._downstream_heads = load_downstream_heads(path) if path else {}
        return self._downstream_heads

    async def rerank(self, request: web.Request):
        """Cross-encoder reranking (reference: reranker_module.py): body
        {"query": str, "documents": [str]} -> relevance-sorted results."""
        body = await request.json()
        query = body.get("query")
        docs = body.get("documents") or body.get("docs")
        if query is None or not docs:
            raise web.HTTPBadRequest(text='"query" and "documents" required')
        heads = self._heads()
        if "classifier" not in heads:
            raise web.HTTPBadRequest(
                text="model has no classifier head (rerank unsupported)")
        sep = getattr(self.tok, "sep_token", None) or "\n"
        pairs = [self.tok.encode(f"{query}{sep}{d}") for d in docs]
        loop = asyncio.get_running_loop()
        scores = await loop.run_in_executor(
            None, self._get_embed_engine().rerank, pairs, heads)
        items = sorted(
            ({"index": i, "document": d, "relevance_score": float(s)}
             for i, (d, s) in enumerate(zip(docs, scores))),
            key=lambda x: x["relevance_score"], reverse=True,
        )
        return web.json_response({"model": self.model_name, "results": items})

    async def classify(self, request: web.Request):
        """Sequence classification head (reference: classifier/classifier.py):
        body {"input": str|[str]} -> per-class logits."""
        body = await request.json()
        inputs = body.get("input")
        if inputs is None:
            raise web.HTTPBadRequest(text='"input" required')
        if isinstance(inputs, str):
            inputs = [inputs]
        heads = self._heads()
        if "classifier" not in heads:
            raise web.HTTPBadRequest(text="model has no classifier head")
        prompts = [i if isinstance(i, list) else self.tok.encode(i)
                   for i in inputs]
        loop = asyncio.get_running_loop()
        logits = await loop.run_in_executor(
            None, self._get_embed_engine().classify, prompts, heads)
        return web.json_response({
            "model": self.model_name,
            "data": [{"index": i, "logits": row.tolist()}
                     for i, row in enumerate(logits)],
        })

    def _log_done(self, rid, route, stream, token_ids, t_start):
        latency = (time.time() - t_start) * 1e3
        ttft = None
        if stream.first_token_time:
            ttft = (stream.first_token_time - stream.enqueue_time) * 1e3
            METRICS.observe("frontend.ttft_ms", ttft)
        METRICS.observe("frontend.latency_ms", latency)
        if self.access:
            self.access.log_success(
                rid, route, latency, len(token_ids),
                len(stream.output_token_ids), first_token_ms=ttft,
            )

    @staticmethod
    def _check_admitted(stream):
        """Admission-time shed (scheduler SLA guard / queue full) surfaces
        as HTTP 429 BEFORE any response bytes are written."""
        err = getattr(stream, "error", None)
        if err and str(err).startswith("overloaded"):
            raise web.HTTPTooManyRequests(text=str(err))

    async def metrics(self, request: web.Request):
        """Prometheus text exposition by default (reference parity:
        kmonitor-reported RtpLLMMetrics become scrapeable);
        ``?format=json`` (or Accept: application/json) returns the raw
        snapshot for tooling."""
        accept = request.headers.get("Accept", "")
        if (request.query.get("format") == "json"
                or "application/json" in accept):
            return web.json_response(METRICS.snapshot())
        return web.Response(
            text=METRICS.prometheus_text(),
            content_type="text/plain", charset="utf-8")

    async def start_profile(self, request: web.Request):
        """Start a jax.profiler trace window (reference: StartProfile RPC,
        proto :696 + /start_profile route, frontend_app.py:291)."""
        import jax

        body = await request.json() if request.can_read_body else {}
        trace_dir = body.get("dir", "/tmp/rtp_llm_trace")
        try:
            jax.profiler.start_trace(trace_dir)
        except RuntimeError as e:
            raise web.HTTPConflict(text=str(e))
        return web.json_response({"status": "started", "dir": trace_dir})

    async def stop_profile(self, request: web.Request):
        import jax

        try:
            jax.profiler.stop_trace()
        except RuntimeError as e:
            raise web.HTTPConflict(text=str(e))
        return web.json_response({"status": "stopped"})

    async def loras(self, request: web.Request):
        """GET list / POST add {name, path} / DELETE remove {name} — dynamic
        multi-LoRA registry (reference: LoraManager add/remove)."""
        engine = self.runner.engine
        if engine.lora_manager is None:
            from rtp_llm_tpu.lora import LoraManager

            engine.lora_manager = LoraManager(engine.model.cfg.num_layers)
        mgr = engine.lora_manager
        if request.method == "GET":
            return web.json_response({"adapters": mgr.names()})
        body = await request.json()
        loop = asyncio.get_running_loop()
        if request.method == "POST":
            path = body.get("path")
            if not path:
                raise web.HTTPBadRequest(text='"path" required')
            try:
                name = await loop.run_in_executor(
                    None, mgr.add_adapter, path, body.get("name")
                )
                await loop.run_in_executor(None, engine.refresh_lora_weights)
            except Exception as e:
                raise web.HTTPBadRequest(text=str(e))
            return web.json_response({"status": "added", "name": name})
        # DELETE
        name = body.get("name")
        if not mgr.remove_adapter(name):
            raise web.HTTPNotFound(text=f"unknown adapter {name!r}")
        await loop.run_in_executor(None, engine.refresh_lora_weights)
        return web.json_response({"status": "removed", "name": name})

    async def pause(self, request: web.Request):
        """Reference: pause RPC for RL weight swap (RtpLLMOp.cc:384-392)."""
        self.runner.pause()
        return web.json_response({"status": "paused"})

    async def restart(self, request: web.Request):
        self.runner.resume()
        return web.json_response({"status": "running"})

    async def update_weights(self, request: web.Request):
        """Reference: UpdateWeights RPC (model_rpc_service.proto:700)."""
        body = await request.json()
        path = body.get("model_path")
        if not path:
            raise web.HTTPBadRequest(text='"model_path" required')
        loop = asyncio.get_running_loop()
        try:
            await loop.run_in_executor(None, self.runner.update_weights, path)
        except Exception as e:
            raise web.HTTPInternalServerError(text=str(e))
        return web.json_response({"status": "updated", "model_path": path})

    async def set_log_level(self, request: web.Request):
        """Reference: /set_log_level (HttpApiServer.cc:150-315)."""
        body = await request.json()
        level = str(body.get("level", "INFO")).upper()
        logging.getLogger().setLevel(getattr(logging, level, logging.INFO))
        return web.json_response({"status": "ok", "level": level})

    async def tokenizer_encode(self, request: web.Request):
        body = await request.json()
        text = body.get("prompt", body.get("text", ""))
        ids = self.tok.encode(text)
        return web.json_response({
            "token_ids": ids,
            "tokens": self.tok.convert_ids_to_tokens(ids),
        })

    async def models(self, request: web.Request):
        return web.json_response({
            "object": "list",
            "data": [{"id": self.model_name, "object": "model",
                      "created": int(self.start_time), "owned_by": "rtp-llm-tpu"}],
        })

    async def health(self, request: web.Request):
        return web.json_response({"status": "ok"})

    async def cache_status(self, request: web.Request):
        """Reference: GetCacheStatus RPC / cache-aware routing feed
        (proto :683, consumed by FlexLB). ``?from_version=N`` returns the
        versioned prefix-hash diff since N (base=true => full set)."""
        eng = self.runner.engine
        mgr = eng.cache_mgr
        out = {
            "block_size": mgr.block_size,
            "total_blocks": mgr.pool.num_blocks,
            "free_blocks": mgr.pool.free_blocks,
            "used_blocks": mgr.pool.used_blocks,
            "available_blocks": mgr.free_blocks,
            "prefix_cache_entries": len(mgr.prefix_cache)
            if mgr.prefix_cache is not None else 0,
            "backend": mgr.backend,
        }
        fv = request.query.get("from_version")
        if fv is not None:
            out.update(mgr.cache_hash_diff(int(fv)))
        else:
            out["version"] = mgr.hash_version
        return web.json_response(out)

    async def worker_status(self, request: web.Request):
        eng = self.runner.engine
        return web.json_response({
            "available_concurrency": max(
                0, eng.config.scheduler.max_batch_size - len(eng.scheduler.running)
            ),
            "running_query_len": len(eng.scheduler.running),
            "waiting_query_len": eng.scheduler.pending,
            "step_count": eng.step_count,
            "tokens_generated": eng.tokens_generated,
            "kv_free_blocks": eng.cache_mgr.pool.free_blocks,
            "kv_total_blocks": eng.cache_mgr.pool.num_blocks,
            "kv_cache_available": eng.cache_mgr.free_blocks,
            # PD-aware routing inputs (reference: FlexLB WorkerStatus +
            # ShortestTTFTStrategy queue-time term)
            "role": self.role,
            "decode_entrance": self.decode_entrance,
            "waiting_tokens": sum(
                s.prompt_len for s in eng.scheduler.waiting),
            "alive": True,
        })

    # ---- app ----

    def build_app(self) -> web.Application:
        app = web.Application()
        app.add_routes([
            web.post("/v1/chat/completions", self.chat_completions),
            web.post("/chat/completions", self.chat_completions),
            web.post("/v1/completions", self.completions),
            web.post("/", self.completions),
            web.post("/v1/embeddings", self.embeddings),
            web.post("/v1/embeddings/dense", self.embeddings),
            web.post("/v1/embeddings/sparse", self._embeddings_typed("sparse")),
            web.post("/v1/embeddings/colbert", self._embeddings_typed("colbert")),
            web.post("/v1/rerank", self.rerank),
            web.post("/v1/classifier", self.classify),
            web.post("/tokenizer/encode", self.tokenizer_encode),
            web.get("/v1/models", self.models),
            web.get("/health", self.health),
            web.get("/status", self.health),
            web.get("/worker_status", self.worker_status),
            web.get("/cache_status", self.cache_status),
            web.get("/metrics", self.metrics),
            web.post("/start_profile", self.start_profile),
            web.post("/stop_profile", self.stop_profile),
            web.post("/set_log_level", self.set_log_level),
            web.get("/v1/loras", self.loras),
            web.post("/v1/loras", self.loras),
            web.delete("/v1/loras", self.loras),
            web.post("/pause", self.pause),
            web.post("/restart", self.restart),
            web.post("/update_weights", self.update_weights),
        ])
        return app
