"""Cluster router: least-loaded request routing across backend workers.

Analog of the reference's FlexLB (rtp_llm/flexlb Java LB: RequestScheduler /
DefaultRouter / worker-status polling) collapsed to an asyncio proxy: polls
each backend's /worker_status, routes each request to the worker with the
most available concurrency (dead workers are excluded until they pass a
health check again), and streams responses through unchanged.

Run: python -m rtp_llm_tpu.server.router --port 8080 \
         --workers host1:8088,host2:8088
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import time
from typing import Dict, List, Optional

import aiohttp
from aiohttp import web

logger = logging.getLogger(__name__)


class WorkerState:
    def __init__(self, address: str):
        self.address = address
        self.alive = False
        self.available_concurrency = 0
        self.running = 0
        self.waiting = 0
        self.inflight = 0  # router-side in-flight counter
        self.last_seen = 0.0


class Router:
    def __init__(self, workers: List[str], poll_interval: float = 1.0):
        self.workers: Dict[str, WorkerState] = {
            w: WorkerState(w) for w in workers
        }
        self.poll_interval = poll_interval
        self._session: Optional[aiohttp.ClientSession] = None

    async def start(self):
        self._session = aiohttp.ClientSession()
        asyncio.create_task(self._poll_loop())

    async def _poll_loop(self):
        while True:
            await asyncio.gather(*(self._poll(w) for w in self.workers.values()))
            await asyncio.sleep(self.poll_interval)

    async def _poll(self, w: WorkerState):
        try:
            async with self._session.get(
                f"http://{w.address}/worker_status",
                timeout=aiohttp.ClientTimeout(total=2),
            ) as resp:
                st = await resp.json()
                w.alive = bool(st.get("alive"))
                w.available_concurrency = int(st.get("available_concurrency", 0))
                w.running = int(st.get("running_query_len", 0))
                w.waiting = int(st.get("waiting_query_len", 0))
                w.last_seen = time.time()
        except Exception:
            w.alive = False

    def pick(self) -> Optional[WorkerState]:
        """Least-loaded alive worker (reference: DefaultRouter)."""
        alive = [w for w in self.workers.values() if w.alive]
        if not alive:
            return None
        return max(
            alive,
            key=lambda w: (w.available_concurrency - w.inflight, -w.waiting),
        )

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        w = self.pick()
        if w is None:
            raise web.HTTPServiceUnavailable(text="no alive workers")
        w.inflight += 1
        try:
            body = await request.read()
            async with self._session.request(
                request.method,
                f"http://{w.address}{request.path_qs}",
                data=body,
                headers={"Content-Type": request.content_type or "application/json"},
                timeout=aiohttp.ClientTimeout(total=600),
            ) as upstream:
                resp = web.StreamResponse(
                    status=upstream.status, headers=upstream.headers.copy()
                )
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp
        finally:
            w.inflight -= 1

    async def status(self, request: web.Request):
        return web.json_response({
            "workers": {
                a: {
                    "alive": w.alive,
                    "available_concurrency": w.available_concurrency,
                    "running": w.running,
                    "waiting": w.waiting,
                    "inflight": w.inflight,
                }
                for a, w in self.workers.items()
            }
        })

    def build_app(self) -> web.Application:
        app = web.Application()
        app.router.add_get("/router_status", self.status)
        app.router.add_route("*", "/{tail:.*}", self.proxy)
        app.on_startup.append(lambda _app: self.start())
        return app


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--workers", required=True,
                   help="comma-separated host:port backend list")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    router = Router(args.workers.split(","))
    web.run_app(router.build_app(), host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
