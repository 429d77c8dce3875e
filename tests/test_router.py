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
