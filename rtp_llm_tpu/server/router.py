"""Cluster router: cache-aware + least-loaded routing across workers.

Analog of the reference's FlexLB (rtp_llm/flexlb Java LB: RequestScheduler /
DefaultRouter / worker-status polling + cache-aware scheduling fed by
GetCacheStatus version diffs) collapsed to an asyncio proxy: polls each
backend's /worker_status and versioned /cache_status prefix-hash diffs,
scores each request by prefix-cache overlap (token-id prompts are hashed
with the same chain function the KV manager uses; text prompts are hashed
when --tokenizer-path is given) plus available concurrency, and streams
responses through unchanged. Dead workers are excluded until they pass a
health check again.

Run: python -m rtp_llm_tpu.server.router --port 8080 \
         --workers host1:8088,host2:8088 [--tokenizer-path DIR]
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
        # cache-aware routing state (reference: FlexLB cache table)
        self.cache_hashes: set = set()
        self.cache_version = 0
        self.block_size = 0
        # PD role awareness (reference: FlexLB RoleType-aware worker sets)
        self.role = "fusion"  # fusion | prefill | decode
        self.decode_entrance = False
        self.waiting_tokens = 0

    @property
    def is_entrance(self) -> bool:
        """Can this worker be the request's entry point? Fusion and prefill
        instances always; a decode instance only under entrance inversion."""
        return (self.role in ("fusion", "prefill")
                or (self.role == "decode" and self.decode_entrance))


class Router:
    def __init__(self, workers: List[str], poll_interval: float = 1.0,
                 tokenizer_path: str = "", cache_weight: float = 4.0,
                 self_address: str = "", peers: Optional[List[str]] = None,
                 max_queue: int = 256, queue_timeout: float = 120.0,
                 prefill_ms_per_token: float = 0.2):
        # per-token prefill cost for the TTFT model (v5e 7B int8 measures
        # 0.09 ms/tok packed .. 0.37 single-row; 0.2 is a serving-mix mean)
        self.prefill_ms_per_token = prefill_ms_per_token
        self.workers: Dict[str, WorkerState] = {
            w: WorkerState(w) for w in workers
        }
        self.poll_interval = poll_interval
        self.cache_weight = cache_weight  # score per matched prefix block
        # request queue (reference: FlexLB QueueManager — requests wait at
        # the LB while every worker is saturated, instead of piling onto
        # worker-side semaphores). 0 disables queueing (route regardless).
        self.max_queue = max_queue
        self.queue_timeout = queue_timeout
        self.queued = 0
        self._capacity = asyncio.Condition()
        self._session: Optional[aiohttp.ClientSession] = None
        # ---- master election (reference: FlexLB master election; the Java
        # LB elects one scheduler owner so load accounting has one brain).
        # Leaderless rule: of all ALIVE routers, the lexicographically
        # smallest address is master; every replica derives this locally
        # from peer health polls, so failover is automatic and split-brain
        # resolves as soon as both see the same peer set. Non-masters
        # forward requests to the master (one hop, loop-guarded).
        self.self_address = self_address
        self.peers: Dict[str, bool] = {
            p: False for p in (peers or []) if p and p != self_address
        }
        # fencing epoch (reference: the ZK-elected FlexLB master holds a
        # session; we carry a logical clock instead): bumps on every locally
        # observed mastership transition and propagates as max() through
        # peer polls and forward headers. A partitioned stale master that
        # receives a forward carrying a newer epoch stands down (409), and a
        # forward landing on a router that does not believe it is master is
        # refused (421) — so two masters can never both account the same
        # request, and the dual-master window is bounded by one poll.
        self.epoch = 0
        self._last_master: Optional[str] = None
        self._tok = None
        if tokenizer_path:
            from rtp_llm_tpu.frontend.tokenizer_factory import TokenizerFactory

            self._tok = TokenizerFactory.create(tokenizer_path)

    @property
    def master_address(self) -> str:
        """Lowest alive router address (self is always alive)."""
        cands = [p for p, ok in self.peers.items() if ok]
        if self.self_address:
            cands.append(self.self_address)
        return min(cands) if cands else ""

    @property
    def is_master(self) -> bool:
        return (not self.peers
                or not self.self_address
                or self.master_address == self.self_address)

    async def start(self):
        self._session = aiohttp.ClientSession()
        asyncio.create_task(self._poll_loop())

    async def _poll_loop(self):
        while True:
            await asyncio.gather(
                *(self._poll(w) for w in self.workers.values()),
                *(self._poll_peer(p) for p in self.peers),
            )
            cur = self.master_address
            if cur != self._last_master:
                self.epoch += 1
                if self._last_master is not None:
                    logger.info("mastership change %s -> %s (epoch %d)",
                                self._last_master, cur, self.epoch)
                self._last_master = cur
            # worker capacity may have risen: wake queued requests
            async with self._capacity:
                self._capacity.notify_all()
            await asyncio.sleep(self.poll_interval)

    async def _poll_peer(self, addr: str):
        try:
            async with self._session.get(
                f"http://{addr}/router_status",
                timeout=aiohttp.ClientTimeout(total=2),
            ) as resp:
                self.peers[addr] = resp.status == 200
                if resp.status == 200:
                    st = await resp.json()
                    # logical-clock merge: adopt the highest epoch seen
                    self.epoch = max(self.epoch, int(st.get("epoch", 0)))
                    # state sync (reference: flexlb-sync consistency
                    # service): a NON-master replica shadows the master's
                    # router-side in-flight accounting, so a failover
                    # promotes a replica whose load view matches the
                    # master's last published state instead of starting
                    # every worker at zero
                    if (not self.is_master
                            and addr == self.master_address
                            and st.get("is_master")):
                        for a, ws in (st.get("workers") or {}).items():
                            if a in self.workers:
                                self.workers[a].inflight = int(
                                    ws.get("inflight", 0))
        except Exception:
            self.peers[addr] = False

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
                w.role = str(st.get("role", "fusion"))
                w.decode_entrance = bool(st.get("decode_entrance", False))
                w.waiting_tokens = int(st.get("waiting_tokens", 0))
                w.last_seen = time.time()
        except Exception:
            w.alive = False
            return
        try:
            async with self._session.get(
                f"http://{w.address}/cache_status",
                params={"from_version": str(w.cache_version)},
                timeout=aiohttp.ClientTimeout(total=2),
            ) as resp:
                st = await resp.json()
                w.block_size = int(st.get("block_size", 0))
                if st.get("base"):
                    w.cache_hashes = set(st.get("added", []))
                else:
                    w.cache_hashes |= set(st.get("added", []))
                    w.cache_hashes -= set(st.get("removed", []))
                w.cache_version = int(st.get("version", w.cache_version))
        except Exception:
            pass  # cache-status optional: plain least-loaded routing

    def _prompt_info(self, body: bytes, path: str):
        """(chain hashes, token count) of the request prompt (same hash
        function the KV manager uses), or ([], 0) when the prompt cannot be
        tokenized router-side."""
        try:
            import json as _json

            from rtp_llm_tpu.cache.prefix_cache import chain_hashes

            d = _json.loads(body)
            bs = max((w.block_size for w in self.workers.values()
                      if w.block_size), default=0)
            ids = None
            prompt = d.get("prompt")
            if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                ids = [int(t) for t in prompt]
            elif self._tok is not None:
                if "messages" in d:
                    from rtp_llm_tpu.frontend.chat_renderer import create_renderer

                    if not hasattr(self, "_renderer"):
                        self._renderer = create_renderer(self._tok)
                    ids = self._renderer.render(d["messages"]).token_ids
                elif isinstance(prompt, str):
                    ids = self._tok.encode(prompt)
            if not ids:
                return [], 0
            if not bs:
                return [], len(ids)
            return chain_hashes(ids[: 64 * bs], bs), len(ids)
        except Exception:
            return [], 0

    def _prompt_hashes(self, body: bytes, path: str) -> list:
        return self._prompt_info(body, path)[0]

    def _cache_score(self, w: WorkerState, hashes: list) -> int:
        """Consecutive prefix blocks this worker already holds."""
        n = 0
        for h in hashes:
            if h in w.cache_hashes:
                n += 1
            else:
                break
        return n

    def projected_ttft_ms(self, w: WorkerState, n_tokens: int,
                          hashes: list) -> float:
        """FlexLB ShortestTTFTStrategy's estimate (flexlb/.../balance/
        strategy/ShortestTTFTStrategy.java:92,192-194): TTFT = prefill time
        of the UNCACHED prompt tokens + projected queue wait, both from a
        per-token prefill cost. Router-side inflight requests (status not
        yet refreshed) are charged at this request's size."""
        cached = self._cache_score(w, hashes) * max(w.block_size, 1)
        uncached = max(0, (n_tokens or 1) - cached)
        queued = w.waiting_tokens + w.inflight * max(n_tokens, 1)
        return (uncached + queued) * self.prefill_ms_per_token

    def pick(self, prompt_hashes: Optional[list] = None,
             require_capacity: bool = False,
             n_tokens: int = 0) -> Optional[WorkerState]:
        """Entrance-role-aware pick. A homogeneous fusion fleet keeps the
        cache-aware least-loaded score; a PD fleet (any non-fusion role
        visible) selects the entrance worker with the LOWEST projected TTFT
        (reference: FlexLB ShortestTTFTStrategy). With ``require_capacity``
        only workers with spare concurrency qualify (None => queue)."""
        alive = [w for w in self.workers.values() if w.alive]
        pd_fleet = any(w.role != "fusion" for w in alive)
        if pd_fleet:
            # requests enter only through entrance-capable workers
            alive = [w for w in alive if w.is_entrance]
        if require_capacity:
            alive = [w for w in alive
                     if w.available_concurrency - w.inflight > 0]
        if not alive:
            return None
        hashes = prompt_hashes or []
        if pd_fleet:
            return min(
                alive,
                key=lambda w: (self.projected_ttft_ms(w, n_tokens, hashes),
                               -self._cache_score(w, hashes)),
            )
        return max(
            alive,
            key=lambda w: (
                self._cache_score(w, hashes) * self.cache_weight
                + (w.available_concurrency - w.inflight)
                - w.waiting,
            ),
        )

    def pick_pd_peer(self, entrance: WorkerState) -> Optional[WorkerState]:
        """Per-request PD pair selection (reference: FlexLB
        RequestScheduler.java:28 pairs roles per request): a prefill
        entrance is paired with the least-loaded plain decode worker; a
        decode entrance (entrance inversion) with the least-loaded prefill
        worker."""
        if entrance.role == "prefill":
            pool = [w for w in self.workers.values()
                    if w.alive and w.role == "decode" and not w.decode_entrance]
        elif entrance.role == "decode":
            pool = [w for w in self.workers.values()
                    if w.alive and w.role == "prefill" and w is not entrance]
        else:
            return None
        if not pool:
            return None
        return min(pool, key=lambda w: (w.inflight + w.running + w.waiting))

    async def _acquire_worker(self, hashes: list,
                              n_tokens: int = 0) -> Optional[WorkerState]:
        """Pick a worker, waiting in the LB queue while all are saturated
        (reference: FlexLB QueueManager). Returns None when no worker is
        alive; raises 503 when the queue is full or the wait times out."""
        if self.max_queue <= 0:
            return self.pick(hashes, n_tokens=n_tokens)
        w = self.pick(hashes, require_capacity=True, n_tokens=n_tokens)
        if w is not None:
            return w
        if not any(x.alive for x in self.workers.values()):
            return None
        if self.queued >= self.max_queue:
            raise web.HTTPServiceUnavailable(text="router queue full")
        deadline = asyncio.get_event_loop().time() + self.queue_timeout
        self.queued += 1
        try:
            async with self._capacity:
                while True:
                    w = self.pick(hashes, require_capacity=True,
                                  n_tokens=n_tokens)
                    if w is not None:
                        return w
                    if not any(x.alive for x in self.workers.values()):
                        return None
                    left = deadline - asyncio.get_event_loop().time()
                    if left <= 0:
                        raise web.HTTPServiceUnavailable(
                            text="queued request timed out")
                    try:
                        await asyncio.wait_for(self._capacity.wait(), left)
                    except asyncio.TimeoutError:
                        raise web.HTTPServiceUnavailable(
                            text="queued request timed out") from None
        finally:
            self.queued -= 1

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        hop = "X-RTP-Router-Hop" in request.headers
        if hop:
            # fencing: a forward carrying a NEWER epoch means our election
            # view is stale — catch up and re-evaluate before accepting
            peer_epoch = int(request.headers.get("X-RTP-Router-Epoch", "0"))
            if peer_epoch > self.epoch:
                self.epoch = peer_epoch
            if not self.is_master:
                # refuse to account a request we are not master for — the
                # sender falls back to local routing (no dual-master)
                raise web.HTTPMisdirectedRequest(
                    text=f"not master (master={self.master_address}, "
                         f"epoch={self.epoch})")
        # non-master replicas forward to the elected master so one brain
        # does the load accounting; the hop header guards against ping-pong
        # while two replicas transiently disagree on the election
        if (not self.is_master and not hop and self.master_address):
            try:
                return await self._forward_to_master(request, body)
            except Exception:
                self.peers[self.master_address] = False  # failover now
        hashes, n_tokens = (
            self._prompt_info(body, request.path)
            if request.path.endswith("completions") else ([], 0)
        )
        w = await self._acquire_worker(hashes, n_tokens)
        if w is None:
            raise web.HTTPServiceUnavailable(text="no alive workers")
        headers = {"Content-Type": request.content_type or "application/json"}
        pair = self.pick_pd_peer(w)
        if pair is not None:
            # per-request PD pair: the entrance worker forwards KV to / pulls
            # KV from this peer (honored by PrefillForwarder /
            # DecodeEntranceBackend via the X-RTP-PD-Peer header)
            headers["X-RTP-PD-Peer"] = pair.address
            pair.inflight += 1
        w.inflight += 1
        try:
            async with self._session.request(
                request.method,
                f"http://{w.address}{request.path_qs}",
                data=body,
                headers=headers,
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
            if pair is not None:
                pair.inflight -= 1
            async with self._capacity:
                self._capacity.notify(1)  # a slot freed: admit one queued

    async def _forward_to_master(self, request: web.Request,
                                 body: bytes) -> web.StreamResponse:
        headers = {"Content-Type": request.content_type or "application/json",
                   "X-RTP-Router-Hop": "1",
                   "X-RTP-Router-Epoch": str(self.epoch)}
        async with self._session.request(
            request.method,
            f"http://{self.master_address}{request.path_qs}",
            data=body, headers=headers,
            timeout=aiohttp.ClientTimeout(total=600),
        ) as upstream:
            if upstream.status == 421:
                # target no longer believes it is master — treat as a failed
                # forward so the caller re-elects / routes locally
                raise RuntimeError("forward refused: target not master")
            resp = web.StreamResponse(
                status=upstream.status, headers=upstream.headers.copy()
            )
            await resp.prepare(request)
            async for chunk in upstream.content.iter_any():
                await resp.write(chunk)
            await resp.write_eof()
            return resp

    async def status(self, request: web.Request):
        return web.json_response({
            "self": self.self_address,
            "master": self.master_address or self.self_address,
            "is_master": self.is_master,
            "epoch": self.epoch,
            "queued": self.queued,
            "peers": dict(self.peers),
            "workers": {
                a: {
                    "alive": w.alive,
                    "available_concurrency": w.available_concurrency,
                    "running": w.running,
                    "waiting": w.waiting,
                    "inflight": w.inflight,
                    "cache_version": w.cache_version,
                    "cache_entries": len(w.cache_hashes),
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
    p.add_argument("--tokenizer-path", default="",
                   help="tokenizer dir for cache-aware routing of text prompts")
    p.add_argument("--cache-weight", type=float, default=4.0)
    p.add_argument("--self-address", default="",
                   help="this router's host:port (enables master election)")
    p.add_argument("--peers", default="",
                   help="comma-separated peer router host:port list")
    p.add_argument("--max-queue", type=int, default=256,
                   help="LB-side queued requests while workers saturated "
                        "(0 disables queueing)")
    p.add_argument("--queue-timeout", type=float, default=120.0)
    p.add_argument("--prefill-ms-per-token", type=float, default=0.2,
                   help="per-token prefill cost for the PD TTFT model")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    router = Router(args.workers.split(","), tokenizer_path=args.tokenizer_path,
                    cache_weight=args.cache_weight,
                    self_address=args.self_address,
                    peers=[p for p in args.peers.split(",") if p],
                    max_queue=args.max_queue,
                    queue_timeout=args.queue_timeout,
                    prefill_ms_per_token=args.prefill_ms_per_token)
    web.run_app(router.build_app(), host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
