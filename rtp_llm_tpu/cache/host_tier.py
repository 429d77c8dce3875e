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
        # next-tier demotion hook (TieredKVStore wires the disk tier here)
        self.evict_sink = None

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
            old_h, old = self._store.popitem(last=False)
            self._bytes -= _tree_bytes(old)
            if self.evict_sink is not None:
                self.evict_sink(old_h, old)
        self._store[h] = rows
        self._bytes += nb

    def get(self, h: int):
        rows = self._store.get(h)
        if rows is not None:
            self._store.move_to_end(h)
        return rows


class DiskKVTier:
    """Byte-capped LRU of KV blocks on local disk, one file per block hash
    (reference analog: the disk cache connector under
    rtp_llm/cpp/cache/connector/ and the 3FS backend, docs/backend/3fs.md —
    single-host file store instead of a distributed FS client).

    Files survive restarts: the constructor re-indexes the directory, so a
    warm disk cache keeps serving prefix hits after a process bounce."""

    def __init__(self, path: str, capacity_bytes: int):
        import os

        self.path = path
        self.capacity = capacity_bytes
        os.makedirs(path, exist_ok=True)
        self._index: OrderedDict[int, int] = OrderedDict()  # hash -> nbytes
        self._bytes = 0
        # next-tier demotion hook (TieredKVStore wires the remote tier here)
        self.evict_sink = None
        for fname in sorted(
            os.listdir(path),
            key=lambda f: os.path.getmtime(os.path.join(path, f)),
        ):
            if not fname.endswith(".npz"):
                continue
            try:
                h = int(fname[:-4])
            except ValueError:
                continue
            nb = os.path.getsize(os.path.join(path, fname))
            self._index[h] = nb
            self._bytes += nb

    def __len__(self) -> int:
        return len(self._index)

    def __contains__(self, h: int) -> bool:
        return h in self._index

    @property
    def used_bytes(self) -> int:
        return self._bytes

    def _file(self, h: int) -> str:
        import os

        return os.path.join(self.path, f"{h}.npz")

    def put(self, h: int, rows) -> None:
        import os

        if h in self._index:
            self._index.move_to_end(h)
            return
        flat = rows if isinstance(rows, dict) else {"kv": rows}
        np.savez(self._file(h), **{k: np.asarray(v) for k, v in flat.items()})
        nb = os.path.getsize(self._file(h))
        if nb > self.capacity:
            os.remove(self._file(h))
            return
        while self._bytes + nb > self.capacity and self._index:
            old, old_nb = self._index.popitem(last=False)
            self._bytes -= old_nb
            if self.evict_sink is not None:
                try:
                    with np.load(self._file(old)) as z:
                        flat = {k: z[k] for k in z.files}
                    self.evict_sink(
                        old, flat["kv"] if set(flat) == {"kv"} else flat)
                except (OSError, ValueError):
                    pass
            try:
                os.remove(self._file(old))
            except OSError:
                pass
        self._index[h] = nb
        self._bytes += nb

    def get(self, h: int):
        if h not in self._index:
            return None
        self._index.move_to_end(h)
        try:
            with np.load(self._file(h)) as z:
                flat = {k: z[k] for k in z.files}
        except (OSError, ValueError):
            nb = self._index.pop(h, 0)
            self._bytes -= nb
            return None
        return flat["kv"] if set(flat) == {"kv"} else flat


class TieredKVStore:
    """host-RAM LRU in front of a disk LRU, optionally backed by a shared
    remote store (reference: KVCacheConnectorCoordinator chaining
    memory -> disk -> remote connectors). Evictions demote down the chain;
    hits promote back to RAM. Any level may be None (skipped)."""

    def __init__(self, host: HostKVTier, disk: DiskKVTier | None,
                 remote=None):
        self.host = host
        self.disk = disk
        self.remote = remote  # RemoteKVTier (cache/remote_tier.py)
        if disk is not None:
            host.evict_sink = disk.put
            if remote is not None:
                disk.evict_sink = remote.put
        elif remote is not None:
            host.evict_sink = remote.put

    @property
    def _levels(self):
        return [t for t in (self.host, self.disk, self.remote)
                if t is not None]

    def __len__(self) -> int:
        # remote length is not enumerable client-side; count local levels
        return sum(len(t) for t in (self.host, self.disk) if t is not None)

    def __contains__(self, h: int) -> bool:
        return any(h in t for t in self._levels)

    @property
    def used_bytes(self) -> int:
        return sum(t.used_bytes for t in (self.host, self.disk)
                   if t is not None)

    def put(self, h: int, rows) -> None:
        self.host.put(h, rows)

    def get(self, h: int):
        rows = self.host.get(h)
        if rows is not None:
            return rows
        for t in (self.disk, self.remote):
            if t is None:
                continue
            rows = t.get(h)
            if rows is not None:
                self.host.put(h, rows)  # promote
                return rows
        return None
