"""Process launcher: worker process supervision with health checks.

Analog of the reference's launcher/process manager (rtp_llm/start_server.py:333
spawn + run_health_checks + monitor_and_release_processes, utils/
process_manager.py): spawns worker server processes (and optionally the
router), waits for /health readiness, restarts crashed children up to a retry
budget, and tears everything down on shutdown.

Usage:
  rtp-llm-tpu launch <model_path> --launch-workers 2 --launch-router-port 8080
spawns worker serve processes on consecutive ports behind a router.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import signal
import subprocess
import sys
import time
import urllib.request
from typing import Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class WorkerSpec:
    name: str
    cmd: List[str]
    health_url: Optional[str] = None
    env: Optional[Dict[str, str]] = None
    max_restarts: int = 2


class ProcessManager:
    def __init__(self, health_timeout: float = 300.0, poll_interval: float = 1.0):
        self.health_timeout = health_timeout
        self.poll_interval = poll_interval
        self._procs: Dict[str, subprocess.Popen] = {}
        self._specs: Dict[str, WorkerSpec] = {}
        self._restarts: Dict[str, int] = {}
        self._stopping = False

    def spawn(self, spec: WorkerSpec):
        env = dict(os.environ)
        env.update(spec.env or {})
        logger.info("spawning %s: %s", spec.name, " ".join(spec.cmd))
        proc = subprocess.Popen(spec.cmd, env=env, start_new_session=True)
        self._procs[spec.name] = proc
        self._specs[spec.name] = spec
        self._restarts.setdefault(spec.name, 0)
        return proc

    def _healthy(self, url: str) -> bool:
        try:
            with urllib.request.urlopen(url, timeout=2) as r:
                return r.status == 200
        except Exception:
            return False

    def wait_healthy(self, names: Optional[List[str]] = None) -> bool:
        """Block until every named worker passes its health check (reference:
        run_health_checks). Returns False on timeout or child death."""
        names = names or list(self._procs)
        deadline = time.time() + self.health_timeout
        pending = [n for n in names if self._specs[n].health_url]
        while pending and time.time() < deadline:
            for n in list(pending):
                proc = self._procs[n]
                if proc.poll() is not None:
                    logger.error("%s died during startup (rc=%s)", n, proc.returncode)
                    return False
                if self._healthy(self._specs[n].health_url):
                    logger.info("%s healthy", n)
                    pending.remove(n)
            if pending:
                time.sleep(self.poll_interval)
        return not pending

    def monitor(self, on_fatal: Optional[Callable[[str], None]] = None):
        """Supervision loop (reference: monitor_and_release_processes):
        restart crashed children within budget; give up past it."""
        while not self._stopping:
            for name, proc in list(self._procs.items()):
                rc = proc.poll()
                if rc is None or self._stopping:
                    continue
                spec = self._specs[name]
                if self._restarts[name] >= spec.max_restarts:
                    logger.error("%s exited (rc=%s); restart budget exhausted",
                                 name, rc)
                    if on_fatal:
                        on_fatal(name)
                    self.shutdown()
                    return
                self._restarts[name] += 1
                logger.warning("%s exited (rc=%s); restarting (%d/%d)",
                               name, rc, self._restarts[name], spec.max_restarts)
                self.spawn(spec)
            time.sleep(self.poll_interval)

    def shutdown(self, grace: float = 10.0):
        """SIGTERM children (their process groups), SIGKILL stragglers."""
        self._stopping = True
        for name, proc in self._procs.items():
            if proc.poll() is None:
                try:
                    os.killpg(proc.pid, signal.SIGTERM)
                except (ProcessLookupError, PermissionError):
                    proc.terminate()
        deadline = time.time() + grace
        for name, proc in self._procs.items():
            remaining = max(deadline - time.time(), 0.1)
            try:
                proc.wait(timeout=remaining)
            except subprocess.TimeoutExpired:
                logger.warning("killing %s", name)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    proc.kill()

    def alive(self) -> Dict[str, bool]:
        return {n: p.poll() is None for n, p in self._procs.items()}


def launch(config) -> int:
    """Spawn N worker serve processes (+ router when requested) and supervise.

    config: EngineConfig; worker i serves on server.port + i. The router (if
    launch_router_port set via env RTP_LAUNCH_ROUTER_PORT or --launch-* flags)
    fronts them with least-loaded routing."""
    n_workers = int(getattr(config.server, "launch_workers", 0)
                    or os.environ.get("RTP_LAUNCH_WORKERS", "1"))
    router_port = int(getattr(config.server, "launch_router_port", 0)
                      or os.environ.get("RTP_LAUNCH_ROUTER_PORT", "0"))
    base_port = config.server.port
    mgr = ProcessManager()

    for i in range(n_workers):
        port = base_port + i
        cmd = [
            sys.executable, "-m", "rtp_llm_tpu.cli", "serve",
            config.server.model_path,
            "--server-port", str(port),
        ]
        mgr.spawn(WorkerSpec(
            name=f"worker-{i}", cmd=cmd,
            health_url=f"http://127.0.0.1:{port}/health",
        ))
    if router_port:
        workers = ",".join(f"127.0.0.1:{base_port + i}" for i in range(n_workers))
        mgr.spawn(WorkerSpec(
            name="router",
            cmd=[sys.executable, "-m", "rtp_llm_tpu.server.router",
                 "--port", str(router_port), "--workers", workers],
            health_url=f"http://127.0.0.1:{router_port}/router_status",
        ))

    if not mgr.wait_healthy():
        logger.error("startup health checks failed")
        mgr.shutdown()
        return 1

    def _sig(_s, _f):
        mgr.shutdown()
        sys.exit(0)

    signal.signal(signal.SIGTERM, _sig)
    signal.signal(signal.SIGINT, _sig)
    logger.info("all workers healthy; supervising")
    mgr.monitor()
    return 0
