"""Remote KV-cache tier: a shared cache-store service + HTTP client.

Reference analog: the remote cache connectors under
rtp_llm/cpp/cache/connector/ (memory/disk/remote chain coordinated by
KVCacheConnectorCoordinator.h) and the 3FS distributed-FS backend
(docs/backend/3fs.md). On TPU the device side is identical to the host tier
(device->host readback on eviction, host->device scatter on restore); the
remote tier just moves the host-side block bytes to a shared store so
multiple serving workers reuse each other's prefix KV.

Wire format: one POST/GET per block hash, body = npz of the block's rows
(the same np pytree the host tier holds: [L, 2, block_size, lanes] — or
{"data","scale"} for int8 KV). The store is a byte-capped LRU, optionally
spilling to disk, reusing the in-process tier classes server-side.

Deployment: ``python -m rtp_llm_tpu.cache.remote_tier --port 8765`` starts a
store; workers point ``cache.remote_cache_url`` at it.
"""

from __future__ import annotations

import io
import logging
import urllib.error
import urllib.request

import numpy as np

logger = logging.getLogger(__name__)


def _pack(rows) -> bytes:
    flat = rows if isinstance(rows, dict) else {"kv": rows}
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in flat.items()})
    return buf.getvalue()


def _unpack(data: bytes):
    with np.load(io.BytesIO(data)) as z:
        flat = {k: z[k] for k in z.files}
    return flat["kv"] if set(flat) == {"kv"} else flat


class RemoteKVTier:
    """Client for the cache-store service. Failure-transparent: network or
    store errors degrade to a miss (and disable the tier after repeated
    failures) — a dead cache store must never take down serving."""

    def __init__(self, base_url: str, timeout_s: float = 2.0,
                 max_failures: int = 8):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout_s
        self._failures = 0
        self._max_failures = max_failures

    @property
    def alive(self) -> bool:
        return self._failures < self._max_failures

    def _fail(self, exc: Exception):
        self._failures += 1
        if self._failures == self._max_failures:
            logger.warning("remote KV tier disabled after %d failures: %s",
                           self._failures, exc)

    def __contains__(self, h: int) -> bool:
        if not self.alive:
            return False
        req = urllib.request.Request(
            f"{self.base_url}/kv/{h}", method="HEAD")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                self._failures = 0
                return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                self._failures = 0
                return False
            self._fail(e)
        except Exception as e:  # noqa: BLE001 — any transport error = miss
            self._fail(e)
        return False

    def put(self, h: int, rows) -> None:
        if not self.alive:
            return
        req = urllib.request.Request(
            f"{self.base_url}/kv/{h}", data=_pack(rows), method="PUT",
            headers={"Content-Type": "application/octet-stream"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                self._failures = 0
        except Exception as e:  # noqa: BLE001
            self._fail(e)

    def get(self, h: int):
        if not self.alive:
            return None
        try:
            with urllib.request.urlopen(
                f"{self.base_url}/kv/{h}", timeout=self.timeout
            ) as resp:
                self._failures = 0
                return _unpack(resp.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                self._failures = 0
                return None
            self._fail(e)
        except Exception as e:  # noqa: BLE001
            self._fail(e)
        return None


def build_cache_store_app(capacity_mb: int = 4096, disk_path: str = "",
                          disk_mb: int = 0):
    """aiohttp app for the shared KV store (reference: the cache-store
    service the remote connector talks to). LRU in RAM, optionally chained
    to a disk tier; GET promotes, PUT at RAM head."""
    from aiohttp import web

    from rtp_llm_tpu.cache.host_tier import (
        DiskKVTier, HostKVTier, TieredKVStore,
    )

    ram = HostKVTier(capacity_mb << 20)
    store = ram
    if disk_path and disk_mb > 0:
        store = TieredKVStore(ram, DiskKVTier(disk_path, disk_mb << 20))
    hits = misses = puts = 0

    async def head_kv(request):
        h = int(request.match_info["hash"])
        if h in store:
            return web.Response(status=200)
        return web.Response(status=404)

    async def get_kv(request):
        nonlocal hits, misses
        h = int(request.match_info["hash"])
        # stored values are the raw npz bytes as a u8 array (opaque to the
        # store; survives the disk tier's savez round-trip unchanged)
        data = store.get(h)
        if data is None:
            misses += 1
            return web.Response(status=404)
        hits += 1
        return web.Response(body=np.asarray(data).tobytes(),
                            content_type="application/octet-stream")

    async def put_kv(request):
        nonlocal puts
        h = int(request.match_info["hash"])
        body = await request.read()
        puts += 1
        store.put(h, np.frombuffer(body, dtype=np.uint8))
        return web.json_response({"stored": True})

    async def status(request):
        return web.json_response({
            "blocks": len(store), "used_bytes": store.used_bytes,
            "hits": hits, "misses": misses, "puts": puts,
        })

    app = web.Application(client_max_size=1 << 28)
    app.add_routes([
        web.head("/kv/{hash}", head_kv),
        web.get("/kv/{hash}", get_kv, allow_head=False),
        web.put("/kv/{hash}", put_kv),
        web.get("/status", status),
        web.get("/health", lambda r: web.json_response({"status": "ok"})),
    ])
    return app


def main():
    import argparse

    from aiohttp import web

    p = argparse.ArgumentParser(description="shared KV cache store")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--capacity-mb", type=int, default=4096)
    p.add_argument("--disk-path", default="")
    p.add_argument("--disk-mb", type=int, default=0)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO)
    app = build_cache_store_app(args.capacity_mb, args.disk_path,
                                args.disk_mb)
    web.run_app(app, host=args.host, port=args.port, print=None)


if __name__ == "__main__":
    main()
