"""Multi-host bootstrap.

Analog of the reference's distributed "gang" layer (rtp_llm/distribute/
distributed_server.py:141 — TCPStore rendezvous + WorldInfo): on TPU,
jax.distributed.initialize IS the rendezvous (the coordinator service replaces
the TCPStore), so this module is thin: resolve coordinator/world from config
or env (supporting the same DISTRIBUTE_CONFIG_FILE JSON shape), initialize,
and expose world/host info for the engine and router.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import List, Optional

from rtp_llm_tpu.config.engine_config import ParallelConfig

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class WorkerInfo:
    """Reference analog: distribute/worker_info.py."""

    host: str
    port: int = 8088
    host_index: int = 0

    @property
    def address(self) -> str:
        return f"{self.host}:{self.port}"


@dataclasses.dataclass
class WorldInfo:
    workers: List[WorkerInfo]
    coordinator_address: str
    host_index: int

    @property
    def num_hosts(self) -> int:
        return len(self.workers)


def resolve_world(parallel: ParallelConfig) -> Optional[WorldInfo]:
    """Build WorldInfo from (in priority order): an explicit coordinator in
    ParallelConfig, a DISTRIBUTE_CONFIG_FILE JSON ({"members": [{"ip":..,
    "name":..}, ...]} — same shape the reference consumes), or env vars
    (RTP_COORDINATOR / RTP_NUM_HOSTS / RTP_HOST_INDEX). None = single host."""
    cfg_file = os.environ.get("DISTRIBUTE_CONFIG_FILE")
    if parallel.coordinator_address:
        n = parallel.num_hosts
        host = parallel.coordinator_address.split(":")[0]
        workers = [WorkerInfo(host=host, host_index=i) for i in range(n)]
        return WorldInfo(workers, parallel.coordinator_address, parallel.host_index)
    if cfg_file and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            members = json.load(f).get("members", [])
        workers = [
            WorkerInfo(host=m.get("ip", m.get("name", "localhost")), host_index=i)
            for i, m in enumerate(members)
        ]
        if not workers:
            return None
        idx = int(os.environ.get("RTP_HOST_INDEX", "0"))
        return WorldInfo(workers, f"{workers[0].host}:8476", idx)
    coord = os.environ.get("RTP_COORDINATOR")
    if coord:
        n = int(os.environ.get("RTP_NUM_HOSTS", "1"))
        idx = int(os.environ.get("RTP_HOST_INDEX", "0"))
        host = coord.split(":")[0]
        return WorldInfo(
            [WorkerInfo(host=host, host_index=i) for i in range(n)], coord, idx
        )
    return None


def init_distributed(parallel: ParallelConfig) -> Optional[WorldInfo]:
    """Initialize jax.distributed when a multi-host world is configured.
    Safe no-op on a single host. Returns the resolved WorldInfo (or None)."""
    world = resolve_world(parallel)
    if world is None or world.num_hosts <= 1:
        return world
    import jax

    logger.info(
        "jax.distributed.initialize coordinator=%s process=%d/%d",
        world.coordinator_address, world.host_index, world.num_hosts,
    )
    jax.distributed.initialize(
        coordinator_address=world.coordinator_address,
        num_processes=world.num_hosts,
        process_id=world.host_index,
    )
    return world
