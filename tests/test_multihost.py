"""Multi-host logic on the CPU backend with real jax.distributed processes.

SURVEY §4 test strategy: "multi-host logic tested with multiple local
processes against the real rendezvous code". Two subprocesses initialize
jax.distributed against a local coordinator (the reference's TCPStore gang
analog), build a tp=2 mesh spanning both processes, replay a lockstep
enqueue stream from host 0 (parallel/multihost.py), and must emit exactly
the single-host engine's tokens.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    idx = int(sys.argv[1]); coord = sys.argv[2]; ckpt = sys.argv[3]

    # sitecustomize pre-imports jax with the ambient axon platform; force CPU
    # through the config API (same reasoning as tests/conftest.py)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, ParallelConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import tiny_config
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.parallel import make_mesh, make_weight_shard_fn
    from rtp_llm_tpu.parallel.distributed import init_distributed
    from rtp_llm_tpu.parallel.multihost import (
        LockstepBroadcaster, apply_to_engine,
    )

    par = ParallelConfig(tp_size=2, num_hosts=2, host_index=idx,
                         coordinator_address=coord)
    world = init_distributed(par)
    assert world is not None and world.num_hosts == 2
    import jax
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2  # one CPU device per process

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=1))
    weights = CheckpointLoader(
        cfg, shard_fn=make_weight_shard_fn(mesh, cfg)).load(ckpt)
    model = create_model(cfg)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    eng = LlmEngine(model, weights, econf, mesh=mesh)

    bc = LockstepBroadcaster()
    if idx == 0:
        for p in ([1, 5, 9, 42], [7, 3, 3]):
            bc.publish(p, {"max_new_tokens": 5, "do_sample": False,
                           "ignore_eos": True})

    streams = []
    for req in bc.drain(timeout_ms=10000):
        streams.append(apply_to_engine(eng, req))
    assert len(streams) == 2

    for _ in range(40):
        if all(s.is_finished() for s in streams):
            break
        eng.step()
    out = [s.output_token_ids for s in streams]
    print("RESULT" + str(idx) + ":" + json.dumps(out), flush=True)
""")


def test_two_process_gang_and_lockstep(tmp_path):
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)

    # single-host expectation
    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    weights = CheckpointLoader(cfg).load(ckpt)
    econf = EngineConfig(
        cache=CacheConfig(block_size=4, test_num_blocks=64),
        scheduler=SchedulerConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_buckets=(16,)),
    )
    econf.quant.kv_cache_dtype = "float32"
    base = LlmEngine(create_model(cfg), weights, econf)
    gc = lambda: GenerateConfig(max_new_tokens=5, do_sample=False,
                                ignore_eos=True)
    expected = [
        base.generate([1, 5, 9, 42], gc()).output_token_ids,
        base.generate([7, 3, 3], gc()).output_token_ids,
    ]

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    # `python /tmp/.../worker.py` puts the script's dir (not cwd) on
    # sys.path, so the repo package must come in via PYTHONPATH
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(i), coord, ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    # both hosts must produce exactly the single-host tokens
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith(f"RESULT{i}:")]
        assert line, out[-2000:]
        got = json.loads(line[0].split(":", 1)[1])
        assert got == expected, (got, expected)


def test_dp_lockstep_with_idle_groups(tmp_path):
    """Reference hard-part: NormalEngine::mayAddFakeStream keeps dp ranks in
    lockstep when some have no work (NormalEngine.cc:530-575). In this design
    inactive decode slots ARE the fake streams — they decode against the null
    block with kv_len=0 inside the same fixed-shape program — so a dp-sharded
    engine with most groups idle must still step every collective and produce
    exact tokens for the one busy group."""
    from rtp_llm_tpu.config.engine_config import (
        CacheConfig, EngineConfig, ParallelConfig, SchedulerConfig,
    )
    from rtp_llm_tpu.config.generate_config import GenerateConfig
    from rtp_llm_tpu.engine import LlmEngine
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )
    from rtp_llm_tpu.models import create_model
    from rtp_llm_tpu.parallel import make_mesh, make_weight_shard_fn

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)

    def eng(mesh):
        cfg = tiny_config("qwen2")
        cfg.dtype = "float32"
        shard_fn = make_weight_shard_fn(mesh, cfg) if mesh is not None else None
        weights = CheckpointLoader(cfg, shard_fn=shard_fn).load(ckpt)
        econf = EngineConfig(
            cache=CacheConfig(block_size=4, test_num_blocks=64),
            scheduler=SchedulerConfig(max_batch_size=8, max_seq_len=64,
                                      prefill_buckets=(16,)),
        )
        econf.quant.kv_cache_dtype = "float32"
        return LlmEngine(create_model(cfg), weights, econf, mesh=mesh)

    gc = lambda: GenerateConfig(max_new_tokens=6, do_sample=False,
                                ignore_eos=True)
    want = eng(None).generate([1, 5, 9], gc()).output_token_ids

    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=4))
    e = eng(mesh)
    # ONE stream: 3 of 4 dp groups have zero active slots the whole run
    s = e.enqueue([1, 5, 9], gc())
    for _ in range(30):
        if s.is_finished():
            break
        e.step()
    assert s.output_token_ids == want


_HOST_LOCAL_WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
    idx = int(sys.argv[1]); coord = sys.argv[2]; ckpt = sys.argv[3]

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import numpy as np

    from rtp_llm_tpu.config.engine_config import ParallelConfig
    from rtp_llm_tpu.loader import CheckpointLoader
    from rtp_llm_tpu.loader.fake_checkpoint import tiny_config
    from rtp_llm_tpu.parallel import make_mesh, make_weight_shard_fn
    from rtp_llm_tpu.parallel.distributed import init_distributed

    par = ParallelConfig(tp_size=2, num_hosts=2, host_index=idx,
                         coordinator_address=coord)
    init_distributed(par)
    assert jax.process_count() == 2

    cfg = tiny_config("qwen2")
    cfg.dtype = "float32"
    mesh = make_mesh(ParallelConfig(tp_size=2, dp_size=1))
    ldr = CheckpointLoader(cfg, shard_fn=make_weight_shard_fn(mesh, cfg),
                           host_local=True)
    w = ldr.load(ckpt)

    full_bytes = sum(
        os.path.getsize(os.path.join(ckpt, f)) for f in os.listdir(ckpt)
        if f.endswith(".safetensors"))

    # value check: q_proj is out-sharded + transposed — this host's shard
    # must equal the corresponding rows of the HF tensor
    from safetensors import safe_open
    with safe_open(os.path.join(ckpt, "model.safetensors"),
                   framework="np") as f:
        hf_q0 = f.get_tensor("model.layers.0.self_attn.q_proj.weight")
        hf_down0 = f.get_tensor("model.layers.0.mlp.down_proj.weight")
    shard = w["q_proj"].addressable_shards[0]
    out_sl = shard.index[-1]
    want = np.swapaxes(hf_q0, 0, 1)[:, out_sl]  # canonical [in, out] slice
    got = np.asarray(shard.data)[0]
    ok_vals = bool(np.allclose(got, want, atol=1e-6))

    # down_proj is IN-sharded: host-local slicing must NOT have engaged
    # (full canonical tensor behind the sharded array)
    dshard = w["down_proj"].addressable_shards[0]
    din_sl = dshard.index[-2]
    dwant = np.swapaxes(hf_down0, 0, 1)[din_sl, :]
    dgot = np.asarray(dshard.data)[0]
    ok_down = bool(np.allclose(dgot, dwant, atol=1e-6))

    print("HLRESULT" + str(idx) + ":" + json.dumps({
        "bytes_read": ldr.last_bytes_read, "full_bytes": full_bytes,
        "ok_vals": ok_vals, "ok_down": ok_down,
    }), flush=True)
""")


def test_host_local_sharded_loading(tmp_path):
    """VERDICT r4 missing #2: each host reads only its shard slices of
    out-/expert-sharded tensors (safetensors range reads) — per-host disk
    bytes land well under the full checkpoint, and the assembled global
    arrays carry the right per-shard values."""
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint,
    )

    cfg = tiny_config("qwen2")
    ckpt = write_fake_checkpoint(str(tmp_path / "m"), cfg)
    script = str(tmp_path / "worker_hl.py")
    with open(script, "w") as f:
        f.write(_HOST_LOCAL_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(i), coord, ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    for i, out in enumerate(outs):
        line = [l for l in out.splitlines() if l.startswith(f"HLRESULT{i}:")]
        assert line, out[-2000:]
        r = json.loads(line[0].split(":", 1)[1])
        assert r["ok_vals"], r
        assert r["ok_down"], r
        # out-sharded tensors (q/k/v, gate/up, lm_head ~ most of the bytes)
        # are read half per host; in-sharded (o_proj, down) read full:
        # per-host traffic must be well below the checkpoint size. The f32
        # on-disk tensors load as f32 (1x); assert a hard 85% ceiling.
        assert r["bytes_read"] < 0.85 * r["full_bytes"], r
