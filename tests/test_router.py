"""Router (FlexLB analog) tests: worker polling, least-loaded pick, proxying,
dead-worker exclusion — using stub backend apps."""

import asyncio

from aiohttp import web


def _stub_backend(name: str, available: int, alive: bool = True):
    async def worker_status(request):
        return web.json_response({
            "alive": alive, "available_concurrency": available,
            "running_query_len": 0, "waiting_query_len": 0,
        })

    async def echo(request):
        return web.json_response({"served_by": name})

    app = web.Application()
    app.router.add_get("/worker_status", worker_status)
    app.router.add_post("/v1/completions", echo)
    return app


def test_router_picks_least_loaded_and_skips_dead():
    asyncio.run(_run())


async def _run():
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    b1 = TestServer(_stub_backend("w1", available=1))
    b2 = TestServer(_stub_backend("w2", available=8))
    dead = TestServer(_stub_backend("dead", available=99, alive=False))
    await b1.start_server()
    await b2.start_server()
    await dead.start_server()
    try:
        workers = [
            f"{b1.host}:{b1.port}", f"{b2.host}:{b2.port}",
            f"{dead.host}:{dead.port}",
        ]
        router = Router(workers, poll_interval=0.1)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            await asyncio.sleep(0.4)  # let the poll loop run
            # status reflects workers
            st = await (await client.get("/router_status")).json()
            assert st["workers"][workers[0]]["alive"] is True
            assert st["workers"][workers[2]]["alive"] is False
            # requests go to w2 (most available), never to dead
            served = set()
            for _ in range(4):
                r = await client.post("/v1/completions", json={"prompt": [1]})
                assert r.status == 200
                served.add((await r.json())["served_by"])
            assert "dead" not in served
            assert "w2" in served
        finally:
            await client.close()
    finally:
        await b1.close()
        await b2.close()
        await dead.close()


def test_resolve_world_env(monkeypatch):
    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel.distributed import resolve_world

    assert resolve_world(ParallelConfig()) is None
    monkeypatch.setenv("RTP_COORDINATOR", "10.0.0.1:8476")
    monkeypatch.setenv("RTP_NUM_HOSTS", "4")
    monkeypatch.setenv("RTP_HOST_INDEX", "2")
    w = resolve_world(ParallelConfig())
    assert w.num_hosts == 4 and w.host_index == 2
    assert w.coordinator_address == "10.0.0.1:8476"


def test_resolve_world_config_file(tmp_path, monkeypatch):
    import json

    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.parallel.distributed import resolve_world

    f = tmp_path / "dist.json"
    f.write_text(json.dumps({"members": [{"ip": "h1"}, {"ip": "h2"}]}))
    monkeypatch.setenv("DISTRIBUTE_CONFIG_FILE", str(f))
    monkeypatch.setenv("RTP_HOST_INDEX", "1")
    w = resolve_world(ParallelConfig())
    assert [x.host for x in w.workers] == ["h1", "h2"]
    assert w.host_index == 1


def _stub_cache_backend(name: str, hashes, block_size=4, available=4):
    """Backend with a versioned /cache_status feed."""
    async def worker_status(request):
        return web.json_response({
            "alive": True, "available_concurrency": available,
            "running_query_len": 0, "waiting_query_len": 0,
        })

    async def cache_status(request):
        return web.json_response({
            "block_size": block_size, "version": len(hashes),
            "base": True, "added": list(hashes), "removed": [],
        })

    async def echo(request):
        return web.json_response({"served_by": name})

    app = web.Application()
    app.router.add_get("/worker_status", worker_status)
    app.router.add_get("/cache_status", cache_status)
    app.router.add_post("/v1/completions", echo)
    return app


def test_cache_aware_routing_prefers_prefix_holder():
    asyncio.run(_cache_aware())


async def _cache_aware():
    """A worker holding the request's prefix blocks must win over an equally
    loaded one (reference: FlexLB cache-aware scheduling fed by
    GetCacheStatus version diffs)."""
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.cache.prefix_cache import chain_hashes
    from rtp_llm_tpu.server.router import Router

    prompt = list(range(100, 120))  # 20 tokens, block 4 -> 5 chain hashes
    hot = chain_hashes(prompt, 4)
    b1 = TestServer(_stub_cache_backend("cold", []))
    b2 = TestServer(_stub_cache_backend("hot", hot))
    await b1.start_server()
    await b2.start_server()
    try:
        router = Router([f"{b1.host}:{b1.port}", f"{b2.host}:{b2.port}"],
                        poll_interval=0.1)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            await asyncio.sleep(0.4)
            st = await (await client.get("/router_status")).json()
            assert any(w["cache_entries"] == len(hot)
                       for w in st["workers"].values())
            # token-id prompt: router hashes it and prefers the holder
            for _ in range(3):
                r = await client.post("/v1/completions",
                                      json={"prompt": prompt, "max_tokens": 1})
                assert (await r.json())["served_by"] == "hot"
            # unrelated prompt: falls back to load-only (either worker ok)
            r = await client.post(
                "/v1/completions",
                json={"prompt": list(range(500, 520)), "max_tokens": 1})
            assert (await r.json())["served_by"] in ("hot", "cold")
        finally:
            await client.close()
    finally:
        await b1.close()
        await b2.close()


def test_cache_status_diff_journal(tmp_path):
    """KVCacheManager's versioned hash journal: inserts publish '+', evictions
    publish '-', and stale versions fall back to a base snapshot."""
    from rtp_llm_tpu.cache.kv_cache_manager import KVCacheManager

    mgr = KVCacheManager(num_blocks=8, block_size=4, backend="python")
    a = mgr.allocate(list(range(8)))
    mgr.free(a, token_ids=list(range(8)))  # 2 full blocks -> 2 '+' entries
    d = mgr.cache_hash_diff(0)
    assert d["version"] == 2 and len(d["added"]) == 2 and not d["removed"]
    v1 = d["version"]

    b = mgr.allocate(list(range(100, 108)))
    mgr.free(b, token_ids=list(range(100, 108)))
    d2 = mgr.cache_hash_diff(v1)
    assert d2["version"] == 4 and len(d2["added"]) == 2 and not d2["base"]

    # exhaust the pool to force LRU eviction of cached blocks
    big = mgr.allocate(list(range(200, 224)))  # 6 blocks; pool is 7 usable
    assert big is not None
    d3 = mgr.cache_hash_diff(d2["version"])
    assert d3["removed"], "evictions must publish removals"


def test_master_election_and_failover():
    """FlexLB master-election analog: of all alive router replicas the
    lowest address is master; non-masters forward requests to it (one hop,
    loop-guarded), and a dead master fails over automatically."""
    asyncio.run(_run_election())


async def _run_election():
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    backend = TestServer(_stub_backend("w1", available=8))
    await backend.start_server()
    workers = [f"{backend.host}:{backend.port}"]

    # two router replicas that know each other
    r1 = Router(workers, poll_interval=0.1)
    r2 = Router(workers, poll_interval=0.1)
    s1 = TestServer(r1.build_app())
    s2 = TestServer(r2.build_app())
    await s1.start_server()
    await s2.start_server()
    a1 = f"{s1.host}:{s1.port}"
    a2 = f"{s2.host}:{s2.port}"
    r1.self_address, r1.peers = a1, {a2: False}
    r2.self_address, r2.peers = a2, {a1: False}
    c1 = TestClient(s1)
    c2 = TestClient(s2)
    try:
        await asyncio.sleep(0.5)  # poll loops discover peers + workers
        st1 = await (await c1.get("/router_status")).json()
        st2 = await (await c2.get("/router_status")).json()
        master = min(a1, a2)
        assert st1["master"] == master == st2["master"]
        assert (st1["is_master"] if st1["self"] == master
                else st2["is_master"])
        # a request to the NON-master is forwarded and still served
        non_master_client = c2 if master == a1 else c1
        r = await non_master_client.post("/v1/completions",
                                         json={"prompt": [1]})
        assert r.status == 200
        assert (await r.json())["served_by"] == "w1"
        # failover: kill the master replica; the survivor elects itself
        dead_server, surv_router, surv_client = (
            (s1, r2, c2) if master == a1 else (s2, r1, c1))
        await dead_server.close()
        await asyncio.sleep(0.5)
        st = await (await surv_client.get("/router_status")).json()
        assert st["is_master"] and st["master"] == surv_router.self_address
        r = await surv_client.post("/v1/completions", json={"prompt": [1]})
        assert r.status == 200
    finally:
        await c1.close()
        await c2.close()
        await backend.close()


def test_queue_manager_holds_until_capacity():
    """FlexLB QueueManager analog: while every worker is saturated, the
    request waits at the router and is released when a slot frees; the
    queue bounds to max_queue (503 beyond)."""
    asyncio.run(_run_queue())


async def _run_queue():
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    gate = asyncio.Event()

    async def worker_status(request):
        return web.json_response({
            "alive": True, "available_concurrency": 1,
            "running_query_len": 0, "waiting_query_len": 0,
        })

    async def slow_echo(request):
        await gate.wait()
        return web.json_response({"ok": True})

    app = web.Application()
    app.router.add_get("/worker_status", worker_status)
    app.router.add_post("/v1/completions", slow_echo)
    backend = TestServer(app)
    await backend.start_server()
    addr = f"127.0.0.1:{backend.port}"

    router = Router([addr], poll_interval=0.1, max_queue=1,
                    queue_timeout=5.0)
    rt = TestServer(web.Application())
    rapp = router.build_app()
    rt = TestServer(rapp)
    client = TestClient(rt)
    await client.start_server()
    await asyncio.sleep(0.3)  # first poll marks the worker alive

    async def post():
        return await client.post("/v1/completions", json={"prompt": "x"})

    t1 = asyncio.create_task(post())   # takes the only slot
    await asyncio.sleep(0.2)
    t2 = asyncio.create_task(post())   # queued (capacity exhausted)
    await asyncio.sleep(0.2)
    assert router.queued == 1
    # queue full: third request rejected immediately
    r3 = await post()
    assert r3.status == 503
    assert "queue full" in await r3.text()

    gate.set()  # finish the in-flight request -> queued one admitted
    r1 = await t1
    r2 = await t2
    assert r1.status == 200 and r2.status == 200
    assert router.queued == 0

    await client.close()
    await backend.close()


def test_queue_timeout_503():
    asyncio.run(_run_queue_timeout())


async def _run_queue_timeout():
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    async def worker_status(request):
        return web.json_response({
            "alive": True, "available_concurrency": 0,
            "running_query_len": 4, "waiting_query_len": 2,
        })

    app = web.Application()
    app.router.add_get("/worker_status", worker_status)
    backend = TestServer(app)
    await backend.start_server()
    addr = f"127.0.0.1:{backend.port}"

    router = Router([addr], poll_interval=0.1, max_queue=4,
                    queue_timeout=0.5)
    client = TestClient(TestServer(router.build_app()))
    await client.start_server()
    await asyncio.sleep(0.3)

    r = await client.post("/v1/completions", json={"prompt": "x"})
    assert r.status == 503
    assert "timed out" in await r.text()

    await client.close()
    await backend.close()


def test_kill_master_under_load_zero_loss_and_fencing():
    """VERDICT r3 #8: kill the elected master ROUTER mid-load — every
    request (with one client retry on transport error) still succeeds via
    the surviving replica; the fencing epoch advances on the mastership
    transition; and a forward landing on a non-master is refused with 421
    (no dual-master accounting). Reference: FlexLB +
    ZookeeperMasterElectService session semantics."""
    asyncio.run(_run_kill_master())


async def _run_kill_master():
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    b1 = TestServer(_stub_backend("w1", available=8))
    b2 = TestServer(_stub_backend("w2", available=8))
    await b1.start_server()
    await b2.start_server()
    workers = [f"{b1.host}:{b1.port}", f"{b2.host}:{b2.port}"]

    r1 = Router(workers, poll_interval=0.1)
    r2 = Router(workers, poll_interval=0.1)
    s1 = TestServer(r1.build_app())
    s2 = TestServer(r2.build_app())
    await s1.start_server()
    await s2.start_server()
    a1 = f"{s1.host}:{s1.port}"
    a2 = f"{s2.host}:{s2.port}"
    r1.self_address, r1.peers = a1, {a2: False}
    r2.self_address, r2.peers = a2, {a1: False}
    c1, c2 = TestClient(s1), TestClient(s2)
    try:
        await asyncio.sleep(0.5)
        master = min(a1, a2)
        surviving = c2 if master == a1 else c1
        surviving_router = r2 if master == a1 else r1
        master_server = s1 if master == a1 else s2
        epoch_before = surviving_router.epoch

        ok = 0
        lost = []

        async def one(i):
            nonlocal ok
            for attempt in (0, 1):  # one retry on transport error
                try:
                    r = await surviving.post("/v1/completions",
                                             json={"prompt": [i]})
                    if r.status == 200:
                        ok += 1
                        return
                except Exception:
                    await asyncio.sleep(0.3)
            lost.append(i)

        async def load():
            for batch in range(6):
                await asyncio.gather(*(one(batch * 5 + j) for j in range(5)))
                await asyncio.sleep(0.15)

        async def killer():
            await asyncio.sleep(0.3)  # mid-load
            await master_server.close()

        await asyncio.gather(load(), killer())
        assert not lost, f"lost requests: {lost}"
        assert ok == 30
        # failover: the survivor is now master with a bumped epoch
        for _ in range(30):
            if surviving_router.is_master:
                break
            await asyncio.sleep(0.1)
        assert surviving_router.is_master
        assert surviving_router.epoch > epoch_before

        # fencing: a forward addressed to a router that is NOT master is
        # refused 421 instead of being accounted
        r = await surviving.post(
            "/v1/completions", json={"prompt": [1]},
            headers={"X-RTP-Router-Hop": "1", "X-RTP-Router-Epoch": "0"})
        assert r.status == 200  # survivor IS master -> accepted
        # make the survivor believe someone else is master
        surviving_router.peers["000.fake:1"] = True
        assert not surviving_router.is_master
        r = await surviving.post(
            "/v1/completions", json={"prompt": [1]},
            headers={"X-RTP-Router-Hop": "1", "X-RTP-Router-Epoch": "99"})
        assert r.status == 421
        assert surviving_router.epoch >= 99  # adopted the newer epoch
    finally:
        for c in (c1, c2):
            try:
                await c.close()
            except Exception:
                pass
        for srv in (b1, b2):
            await srv.close()


# ---- PD-aware routing (reference: FlexLB ShortestTTFTStrategy +
# RequestScheduler role pairing) ----

def _pd_backend(name: str, role: str, waiting_tokens: int = 0,
                available: int = 8, decode_entrance: bool = False,
                cache_hashes=(), block_size: int = 4, seen=None):
    async def worker_status(request):
        return web.json_response({
            "alive": True, "available_concurrency": available,
            "running_query_len": 0, "waiting_query_len": 0,
            "role": role, "decode_entrance": decode_entrance,
            "waiting_tokens": waiting_tokens,
        })

    async def cache_status(request):
        return web.json_response({
            "version": 1, "base": True, "added": list(cache_hashes),
            "removed": [], "block_size": block_size,
        })

    async def echo(request):
        if seen is not None:
            seen.append({"name": name,
                         "pd_peer": request.headers.get("X-RTP-PD-Peer")})
        return web.json_response({"served_by": name})

    app = web.Application()
    app.router.add_get("/worker_status", worker_status)
    app.router.add_get("/cache_status", cache_status)
    app.router.add_post("/v1/completions", echo)
    return app


def test_pd_ttft_routing_and_pair_selection():
    asyncio.run(_run_pd())


async def _run_pd():
    """Mixed-role fleet: requests must enter through the prefill worker with
    the lowest PROJECTED TTFT (uncached prompt tokens + queued tokens, per
    FlexLB's ShortestTTFTStrategy) and carry a decode-pair header; decode
    workers never receive the request directly."""
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.cache.prefix_cache import chain_hashes
    from rtp_llm_tpu.server.router import Router

    prompt = list(range(1, 17))  # 16 tokens, block_size 4 -> 4 blocks
    hashes = chain_hashes(prompt, 4)

    seen = []
    # p_busy: idle cache-cold; p_queued: has 1000 queued prompt tokens;
    # p_cached: holds the whole prompt prefix -> lowest projected TTFT
    p_cold = TestServer(_pd_backend("p_cold", "prefill", seen=seen))
    p_queued = TestServer(_pd_backend("p_queued", "prefill",
                                      waiting_tokens=1000, seen=seen))
    p_cached = TestServer(_pd_backend("p_cached", "prefill",
                                      cache_hashes=hashes, seen=seen))
    d1 = TestServer(_pd_backend("d1", "decode", seen=seen))
    d2 = TestServer(_pd_backend("d2", "decode", seen=seen))
    servers = [p_cold, p_queued, p_cached, d1, d2]
    for s in servers:
        await s.start_server()
    try:
        addrs = {s: f"{s.host}:{s.port}" for s in servers}
        router = Router(list(addrs.values()), poll_interval=0.1)
        client = TestClient(TestServer(router.build_app()))
        await client.start_server()
        try:
            await asyncio.sleep(0.5)  # poll loop
            r = await client.post("/v1/completions",
                                  json={"prompt": prompt, "max_tokens": 4})
            assert r.status == 200
            body = await r.json()
            # lowest projected TTFT: fully cached prefix beats cold beats
            # queued
            assert body["served_by"] == "p_cached", body
            # the request carried a decode-pair header naming a decode worker
            assert seen and seen[-1]["name"] == "p_cached"
            assert seen[-1]["pd_peer"] in (addrs[d1], addrs[d2])
            # decode workers are never the entrance
            for _ in range(3):
                r = await client.post("/v1/completions",
                                      json={"prompt": [99], "max_tokens": 4})
                assert (await r.json())["served_by"].startswith("p_")
            # knock out the cached worker's edge: a much longer uncached
            # prompt makes the queued-tokens term dominate -> still never
            # p_queued
            r = await client.post("/v1/completions",
                                  json={"prompt": list(range(1, 301))})
            assert (await r.json())["served_by"] != "p_queued"
        finally:
            await client.close()
    finally:
        for s in servers:
            await s.close()


def test_replica_shadows_master_inflight():
    asyncio.run(_run_shadow())


async def _run_shadow():
    """Reference flexlb-sync analog: a standby replica mirrors the master's
    router-side in-flight accounting through the existing peer polls, so a
    failover starts from the master's last published load view."""
    from aiohttp.test_utils import TestClient, TestServer

    from rtp_llm_tpu.server.router import Router

    b1 = TestServer(_stub_backend("w1", available=8))
    await b1.start_server()
    try:
        workers = [f"{b1.host}:{b1.port}"]
        r_master = Router(workers, poll_interval=0.1,
                          self_address="a:1", peers=["b:2"])
        r_replica = Router(workers, poll_interval=0.1,
                           self_address="b:2", peers=["a:1"])
        cm = TestClient(TestServer(r_master.build_app()))
        await cm.start_server()
        # replica must reach the master's real test port for peer polls
        r_replica.peers = {f"{cm.host}:{cm.port}": False}
        cr = TestClient(TestServer(r_replica.build_app()))
        await cr.start_server()
        try:
            await asyncio.sleep(0.4)
            # simulate live requests accounted on the master
            r_master.workers[workers[0]].inflight = 5
            await asyncio.sleep(0.4)  # replica peer-poll cycle
            assert r_replica.workers[workers[0]].inflight == 5
        finally:
            await cm.close()
            await cr.close()
    finally:
        await b1.close()
