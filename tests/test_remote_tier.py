"""Remote KV tier: shared cache-store service + client chaining
(reference: remote cache connector under cpp/cache/connector/ + the
cache-store service; docs/backend/3fs.md for the shared-store deployment)."""

import asyncio
import socket
import threading
import time

import numpy as np
import pytest

from rtp_llm_tpu.cache.host_tier import DiskKVTier, HostKVTier, TieredKVStore
from rtp_llm_tpu.cache.remote_tier import RemoteKVTier, build_cache_store_app


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture()
def cache_store():
    """Run the cache-store aiohttp app in a daemon thread; yield its URL."""
    from aiohttp import web

    port = _free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    async def _run():
        runner = web.AppRunner(build_cache_store_app(capacity_mb=4))
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", port)
        await site.start()
        started.set()

    def _thread():
        asyncio.set_event_loop(loop)
        loop.create_task(_run())
        loop.run_forever()

    t = threading.Thread(target=_thread, daemon=True)
    t.start()
    assert started.wait(10)
    yield f"http://127.0.0.1:{port}"
    loop.call_soon_threadsafe(loop.stop)
    t.join(5)


def test_remote_put_get_roundtrip(cache_store):
    tier = RemoteKVTier(cache_store)
    a = np.arange(64, dtype=np.float32).reshape(2, 32)
    tier.put(12345, a)
    assert 12345 in tier
    np.testing.assert_array_equal(tier.get(12345), a)
    # pytree (int8 KV) values round-trip
    tier.put(7, {"data": a.astype(np.int8), "scale": a[:1]})
    got = tier.get(7)
    assert set(got) == {"data", "scale"}
    np.testing.assert_array_equal(got["data"], a.astype(np.int8))
    # miss
    assert tier.get(999) is None and 999 not in tier


def test_remote_failure_transparency():
    """A dead store degrades to misses and disables itself after repeated
    failures — it must never raise into the engine loop."""
    tier = RemoteKVTier("http://127.0.0.1:1", timeout_s=0.2, max_failures=3)
    a = np.zeros(8, np.int8)
    for _ in range(4):
        tier.put(1, a)
        assert tier.get(1) is None
    assert not tier.alive
    # disabled tier short-circuits without touching the network
    t0 = time.time()
    assert tier.get(2) is None and 2 not in tier
    assert time.time() - t0 < 0.05


def test_chain_demotes_to_remote(tmp_path, cache_store):
    """host -> disk -> remote chain: disk evictions land on the shared store
    and a later get promotes all the way back to host RAM."""
    host = HostKVTier(capacity_bytes=100)
    disk = DiskKVTier(str(tmp_path / "d"), capacity_bytes=2048)
    remote = RemoteKVTier(cache_store)
    store = TieredKVStore(host, disk, remote)

    a = np.zeros(40, np.int8)
    store.put(1, a)
    store.put(2, a)
    store.put(3, a)  # host holds 2 -> block 1 demotes to disk
    assert 1 not in host and 1 in disk
    # flood the disk tier so block 1 falls off its LRU onto the remote store
    big = np.zeros(400, np.int8)
    for h in range(10, 30):
        disk.put(h, big)
    assert 1 not in disk
    assert 1 in remote
    got = store.get(1)
    np.testing.assert_array_equal(got, a)
    assert 1 in host  # promoted back


def test_host_to_remote_without_disk(cache_store):
    host = HostKVTier(capacity_bytes=100)
    store = TieredKVStore(host, None, RemoteKVTier(cache_store))
    a = np.arange(40, dtype=np.int8)
    store.put(5, a)
    store.put(6, a)
    store.put(8, a)  # evicts 5 straight to remote
    assert 5 not in host and 5 in store
    np.testing.assert_array_equal(store.get(5), a)


def test_cache_store_status(cache_store):
    import json
    import urllib.request

    tier = RemoteKVTier(cache_store)
    tier.put(42, np.zeros(16, np.int8))
    tier.get(42)
    tier.get(43)
    with urllib.request.urlopen(cache_store + "/status", timeout=5) as r:
        st = json.loads(r.read())
    assert st["blocks"] >= 1 and st["hits"] >= 1 and st["misses"] >= 1
