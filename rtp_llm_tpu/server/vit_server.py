"""Standalone VIT worker: vision/audio encoding as its own service.

Reference analog: the VIT role deployment (vit_start_server.py,
start_server.py:121-258) — encoder workers scale out independently of the
decoder fleet. Here one worker owns the checkpoint's JAX tower (its own
chip/host) and serves raw-array encode requests over HTTP; the serving
frontend points VisionChatHandler at it via --server-vit-endpoint.

Wire format (POST /encode_images): npz body with ``pixel_values`` (+
``grid_thw`` for qwen-vl towers) -> npz response with ``embeds`` (and
``grids`` for grid towers). Arrays travel raw — no base64/json overhead.
"""

from __future__ import annotations

import io
import logging

import numpy as np
from aiohttp import web

logger = logging.getLogger(__name__)


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class VitServer:
    def __init__(self, model_path: str, model_type: str):
        self.model_path = model_path
        self.model_type = model_type
        if model_type == "llava":
            from rtp_llm_tpu.multimodal.clip_jax import ClipVisionTower

            self.tower = ClipVisionTower(model_path)
        elif model_type == "qwen2_5_vl":
            from rtp_llm_tpu.multimodal.vit_jax import Qwen25VisionTower

            self.tower = Qwen25VisionTower(model_path)
        elif model_type == "qwen2_audio":
            from rtp_llm_tpu.multimodal.audio_jax import AudioTower

            self.tower = AudioTower(model_path)
        else:
            from rtp_llm_tpu.multimodal.vit_jax import JaxVisionTower

            self.tower = JaxVisionTower(model_path)

    async def encode_images(self, request: web.Request) -> web.Response:
        body = await request.read()
        with np.load(io.BytesIO(body)) as z:
            pixel_values = z["pixel_values"]
            grid_thw = z["grid_thw"] if "grid_thw" in z.files else None
        if self.model_type == "qwen2_audio":
            embeds = self.tower.encode_audio(pixel_values)
            payload = _npz_bytes(embeds=np.asarray(embeds, np.float32))
        elif grid_thw is not None:
            embeds, grids = self.tower.encode_images(pixel_values, grid_thw)
            payload = _npz_bytes(
                embeds=np.concatenate(
                    [np.asarray(e, np.float32) for e in embeds]),
                lens=np.asarray([len(e) for e in embeds], np.int32),
                grids=np.asarray(grids, np.int32),
            )
        else:
            embeds = self.tower.encode_images(pixel_values)
            payload = _npz_bytes(embeds=np.asarray(embeds, np.float32))
        return web.Response(body=payload,
                            content_type="application/octet-stream")

    async def health(self, request):
        meta = {"status": "ok", "role": "vit",
                "model_type": self.model_type}
        tpi = getattr(self.tower, "tokens_per_image", None)
        if tpi is not None:
            meta["tokens_per_image"] = int(tpi)
        return web.json_response(meta)

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=1 << 30)
        app.router.add_post("/encode_images", self.encode_images)
        app.router.add_get("/health", self.health)
        return app


class RemoteTower:
    """VisionChatHandler-compatible tower that calls a VIT worker.

    Blocking (the handler runs in an executor thread)."""

    def __init__(self, endpoint: str, model_type: str):
        self.endpoint = endpoint.rstrip("/")
        self.model_type = model_type

    def _post(self, **arrays):
        import urllib.request

        req = urllib.request.Request(
            f"{self.endpoint}/encode_images", data=_npz_bytes(**arrays),
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            return np.load(io.BytesIO(resp.read()))

    def encode_images(self, pixel_values, grid_thw=None):
        if grid_thw is not None:
            z = self._post(pixel_values=np.asarray(pixel_values),
                           grid_thw=np.asarray(grid_thw))
            lens = z["lens"]
            flat = z["embeds"]
            embeds, off = [], 0
            for n in lens:
                embeds.append(flat[off: off + int(n)])
                off += int(n)
            return embeds, [tuple(int(v) for v in g) for g in z["grids"]]
        z = self._post(pixel_values=np.asarray(pixel_values))
        return z["embeds"]

    def encode_audio(self, input_features):
        return self._post(pixel_values=np.asarray(input_features))["embeds"]

    @property
    def tokens_per_image(self) -> int:
        import json
        import urllib.request

        with urllib.request.urlopen(f"{self.endpoint}/health",
                                    timeout=30) as resp:
            return int(json.loads(resp.read())["tokens_per_image"])


class VitProxy:
    """Least-inflight proxy over a pool of VIT workers (reference analog:
    vit_proxy_start_server.py + the N-worker VIT deployment wired by
    start_server.py:121-258). Serves the SAME route surface as one worker
    (/encode_images, /health), so RemoteTower / --server-vit-endpoint point
    here unchanged. Dead workers are skipped and retried on the next
    request; an encode that fails on one worker fails over to another."""

    def __init__(self, worker_endpoints):
        self.workers = [w.rstrip("/") for w in worker_endpoints]
        self.inflight = {w: 0 for w in self.workers}
        self.alive = {w: True for w in self.workers}
        self._session = None

    async def _sess(self):
        import aiohttp

        if self._session is None or self._session.closed:
            self._session = aiohttp.ClientSession()
        return self._session

    def _ranked(self):
        up = [w for w in self.workers if self.alive[w]]
        pool = up or self.workers  # all marked dead: try everyone again
        return sorted(pool, key=lambda w: self.inflight[w])

    async def encode_images(self, request: web.Request) -> web.Response:
        import aiohttp

        body = await request.read()
        sess = await self._sess()
        last_err = None
        for w in self._ranked():
            self.inflight[w] += 1
            try:
                async with sess.post(
                    f"{w}/encode_images", data=body,
                    headers={"Content-Type": "application/octet-stream"},
                    timeout=aiohttp.ClientTimeout(total=300),
                ) as resp:
                    payload = await resp.read()
                    if resp.status == 200:
                        self.alive[w] = True
                        return web.Response(
                            body=payload,
                            content_type="application/octet-stream")
                    last_err = f"{w}: HTTP {resp.status}"
                    if resp.status >= 500:
                        # worker-side failure: demote until it passes a
                        # health probe again (4xx = bad request, keep alive)
                        self.alive[w] = False
            except Exception as e:  # noqa: BLE001 — fail over
                self.alive[w] = False
                last_err = f"{w}: {e!r}"
            finally:
                self.inflight[w] -= 1
        raise web.HTTPBadGateway(text=f"all VIT workers failed ({last_err})")

    async def health(self, request):
        import aiohttp

        sess = await self._sess()
        for w in self._ranked():
            try:
                async with sess.get(
                        f"{w}/health",
                        timeout=aiohttp.ClientTimeout(total=10)) as resp:
                    if resp.status == 200:
                        meta = await resp.json()
                        meta.update(role="vit-proxy",
                                    workers=len(self.workers),
                                    alive=[x for x in self.workers
                                           if self.alive[x]])
                        self.alive[w] = True
                        return web.json_response(meta)
            except Exception:
                self.alive[w] = False
        raise web.HTTPServiceUnavailable(text="no alive VIT workers")

    def build_app(self) -> web.Application:
        app = web.Application(client_max_size=1 << 30)
        app.router.add_post("/encode_images", self.encode_images)
        app.router.add_get("/health", self.health)
        return app


def serve_vit(model_path: str, model_type: str, host: str = "0.0.0.0",
              port: int = 8188):
    srv = VitServer(model_path, model_type)
    logger.info("VIT worker (%s) serving on %s:%d", model_type, host, port)
    web.run_app(srv.build_app(), host=host, port=port, print=None,
                access_log=None)


def serve_vit_pool(model_path: str, model_type: str, n_workers: int,
                   host: str = "0.0.0.0", port: int = 8188):
    """Spawn N VIT worker processes on port+1..port+N and front them with a
    VitProxy on ``port`` (reference: vit_proxy_start_server.py). Workers are
    monitored and restarted by the ProcessManager."""
    import sys

    from rtp_llm_tpu.server.launcher import ProcessManager, WorkerSpec

    mgr = ProcessManager()
    endpoints = []
    for i in range(n_workers):
        wport = port + 1 + i
        mgr.spawn(WorkerSpec(
            name=f"vit-worker-{i}",
            cmd=[sys.executable, "-m", "rtp_llm_tpu.cli", "vit-serve",
                 model_path, "--server-port", str(wport),
                 "--server-host", "127.0.0.1",
                 "--server-vit-workers", "1"],
            health_url=f"http://127.0.0.1:{wport}/health",
        ))
        endpoints.append(f"http://127.0.0.1:{wport}")
    proxy = VitProxy(endpoints)
    logger.info("VIT proxy fronting %d workers on %s:%d",
                n_workers, host, port)
    try:
        web.run_app(proxy.build_app(), host=host, port=port, print=None,
                    access_log=None)
    finally:
        mgr.shutdown()
