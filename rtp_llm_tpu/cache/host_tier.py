"""Host-memory KV tier: spill evicted prefix blocks to host RAM.

Analog of the reference's tiered KV-cache connectors (memory tier,
rtp_llm/cpp/cache/connector/memory/ + KVCacheConnectorCoordinator.h): device
HBM holds the working set, host DRAM holds a much larger LRU store of evicted
prefix blocks. On TPU the "transfer engine" is simply device→host array
readback on eviction and a host→device row scatter on restore — no RDMA
plane needed for the single-host tier.

Keys are the same chained prefix hashes the device prefix cache uses, so a
host hit extends prefix reuse past the point where HBM ran out.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


def _tree_bytes(rows) -> int:
    if isinstance(rows, dict):
        return sum(_tree_bytes(v) for v in rows.values())
    return rows.nbytes


class HostKVTier:
    """Byte-capped LRU store: block_hash -> one block's KV rows (np pytree,
    shape [L, 2, block_size, lanes] — or {"data","scale"} for int8 KV)."""

    def __init__(self, capacity_bytes: int):
        self.capacity = capacity_bytes
        self._store: OrderedDict[int, object] = OrderedDict()
        self._bytes = 0

    def __len__(self) -> int:
        return len(self._store)

    def __contains__(self, h: int) -> bool:
        return h in self._store

    @property
    def used_bytes(self) -> int:
        return self._bytes

    def put(self, h: int, rows) -> None:
        if h in self._store:
            self._store.move_to_end(h)
            return
        nb = _tree_bytes(rows)
        if nb > self.capacity:
            return
        while self._bytes + nb > self.capacity and self._store:
            _, old = self._store.popitem(last=False)
            self._bytes -= _tree_bytes(old)
        self._store[h] = rows
        self._bytes += nb

    def get(self, h: int):
        rows = self._store.get(h)
        if rows is not None:
            self._store.move_to_end(h)
        return rows
