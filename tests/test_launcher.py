"""ProcessManager tests with stub worker processes (reference analog:
start_server health-check + monitor loop behavior)."""

import socket
import sys
import threading
import time

from rtp_llm_tpu.server.launcher import ProcessManager, WorkerSpec

STUB = """
import sys, time
from http.server import BaseHTTPRequestHandler, HTTPServer
class H(BaseHTTPRequestHandler):
    def do_GET(self):
        self.send_response(200); self.end_headers(); self.wfile.write(b'ok')
    def log_message(self, *a): pass
port = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else 'serve'
if mode == 'crash-once':
    import os, pathlib
    marker = pathlib.Path(sys.argv[3])
    if not marker.exists():
        marker.write_text('x'); sys.exit(3)
HTTPServer(('127.0.0.1', port), H).serve_forever()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _spec(name, port, *extra, max_restarts=2):
    return WorkerSpec(
        name=name,
        cmd=[sys.executable, "-c", STUB, str(port), *extra],
        health_url=f"http://127.0.0.1:{port}/health",
        max_restarts=max_restarts,
    )


def test_spawn_and_health():
    mgr = ProcessManager(health_timeout=20, poll_interval=0.1)
    port = _free_port()
    mgr.spawn(_spec("w0", port))
    try:
        assert mgr.wait_healthy()
        assert mgr.alive()["w0"]
    finally:
        mgr.shutdown(grace=3)
    assert not mgr.alive()["w0"]


def test_crash_restart(tmp_path):
    mgr = ProcessManager(health_timeout=20, poll_interval=0.1)
    port = _free_port()
    marker = tmp_path / "crashed"
    mgr.spawn(_spec("w0", port, "crash-once", str(marker)))
    t = threading.Thread(target=mgr.monitor, daemon=True)
    t.start()
    try:
        # first run exits rc=3; monitor restarts; second run serves
        deadline = time.time() + 20
        ok = False
        while time.time() < deadline:
            if mgr._restarts["w0"] >= 1 and mgr.wait_healthy():
                ok = True
                break
            time.sleep(0.2)
        assert ok, "worker was not restarted to health"
    finally:
        mgr.shutdown(grace=3)


def test_restart_budget_exhausted():
    mgr = ProcessManager(health_timeout=5, poll_interval=0.05)
    fatal = []
    # command that always exits immediately
    mgr.spawn(WorkerSpec(
        name="dies", cmd=[sys.executable, "-c", "import sys; sys.exit(7)"],
        health_url=None, max_restarts=1,
    ))
    t = threading.Thread(
        target=mgr.monitor, kwargs={"on_fatal": fatal.append}, daemon=True
    )
    t.start()
    t.join(timeout=15)
    assert not t.is_alive()
    assert fatal == ["dies"]
