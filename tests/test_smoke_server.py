"""Full-process smoke test: launch the real server via the CLI in a
subprocess (CPU backend) and drive it over HTTP — the reference's
smoke/entry.py pattern."""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _post(url, body, timeout=60):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.mark.slow
def test_server_subprocess_roundtrip(tmp_path):
    from rtp_llm_tpu.loader.fake_checkpoint import (
        tiny_config, write_fake_checkpoint, write_fake_tokenizer,
    )

    ckpt = write_fake_checkpoint(str(tmp_path / "m"), tiny_config("qwen2"))
    write_fake_tokenizer(ckpt, 128)
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        RTP_CACHE_BLOCK_SIZE="4",
        RTP_CACHE_TEST_NUM_BLOCKS="64",
        RTP_SCHEDULER_MAX_BATCH_SIZE="4",
        RTP_SCHEDULER_MAX_SEQ_LEN="128",
        RTP_SCHEDULER_PREFILL_BUCKETS="16,64",
    )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; from rtp_llm_tpu.cli import main;"
        f"sys.exit(main(['serve', {ckpt!r}, '--server-port', '{port}']))"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        up = False
        while time.time() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode()
                raise AssertionError(f"server died:\n{out[-2000:]}")
            try:
                with urllib.request.urlopen(base + "/health", timeout=2) as r:
                    if r.status == 200:
                        up = True
                        break
            except Exception:
                time.sleep(1.0)
        assert up, "server did not become healthy"

        body = _post(base + "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "w1 w2 w3"}],
            "max_tokens": 6, "temperature": 0.0,
        })
        assert body["object"] == "chat.completion"
        assert body["usage"]["completion_tokens"] >= 1

        body = _post(base + "/v1/completions", {
            "prompt": [1, 2, 3], "max_tokens": 4, "temperature": 0.0,
            "ignore_eos": True,
        })
        assert body["usage"]["completion_tokens"] == 4

        with urllib.request.urlopen(base + "/worker_status", timeout=5) as r:
            ws = json.loads(r.read())
        assert ws["alive"]
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
