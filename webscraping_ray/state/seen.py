"""Sharded URL-seen set: Ray actors over hash-partitioned filters.

The crawl-global dedup index (reference: ``CrawlerCallback.found``
HashDict, download.py:969,1041; ``adt.HashDict`` adt.py:30-74) as a
pool of shard actors.  Shard = ``uhash % num_shards`` — the same key
the fetch-join and dedup groupby use, so one partitioning scheme rules
the whole engine.

Probes and inserts are batch RPCs (one per shard per wave), so actor
overhead is O(shards) per wave, not O(urls).  Snapshots stream to the
per-wave lineage checkpoint (FIXTURES.md §5).
"""

from __future__ import annotations

import numpy as np

from .cuckoo import make_filter


class SeenShard:
    """One shard: a membership filter over 64-bit url hashes.

    Runs as a Ray actor (``ray.remote(SeenShard)``) in the crawl;
    usable in-process for tests/oracle.
    """

    def __init__(self, kind: str = 'exact', capacity: int = 1 << 20,
                 journal: bool = False):
        self.kind = kind
        self.filter = make_filter(kind, capacity)
        # delta journal: keys added since the last drain (checkpoint
        # lineage rides per-wave DELTAS, not per-wave full snapshots —
        # a full filter snapshot per wave is O(seen) x waves, i.e.
        # quadratic over a crawl and ~80 GB/wave at 10^10 urls).
        # Off unless the crawl checkpoints (it is drained only by
        # checkpoints; journaling without them would grow unboundedly).
        self.journal = journal
        self._delta: list = []

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        return self.filter.contains_batch(keys)

    def add_batch(self, keys: np.ndarray) -> int:
        self.filter.add_batch(keys)
        if self.journal:
            self._delta.append(np.asarray(keys, dtype=np.uint64))
        return int(self.filter.count)

    def count(self) -> int:
        return int(self.filter.count)

    def drain_delta(self) -> bytes:
        """Keys added since the last drain/snapshot, as raw uint64
        little-endian bytes; clears the journal."""
        if not self._delta:
            return b''
        out = np.concatenate(self._delta)
        self._delta = []
        return out.tobytes()

    def replay_delta(self, blob: bytes) -> None:
        """Re-insert a drained delta (resume replays base-snapshot +
        per-wave deltas).  The crawl adds each url's hash exactly once
        (first-seen registration behind the seen probe), so replay
        never double-inserts into an approximate filter."""
        if blob:
            self.filter.add_batch(np.frombuffer(blob, dtype=np.uint64))

    def snapshot(self) -> bytes:
        self._delta = []        # full snapshot supersedes the journal
        return self.filter.snapshot()

    def restore(self, blob: bytes, kind: str | None = None) -> None:
        kindcls = type(self.filter)
        if kind is not None and kind != self.kind:
            from .cuckoo import FILTER_KINDS
            kindcls = FILTER_KINDS[kind]
            self.kind = kind
        self.filter = kindcls.restore(blob)


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool.

    ``use_ray=False`` runs shards in-process (unit tests, the oracle);
    otherwise each shard is a Ray actor and batch calls fan out
    concurrently.
    """

    def __init__(self, num_shards: int = 4, kind: str = 'exact',
                 capacity_per_shard: int = 1 << 20, use_ray: bool = True,
                 journal: bool = False):
        self.num_shards = num_shards
        self.kind = kind
        self.use_ray = use_ray
        if use_ray:
            import ray

            shard_cls = ray.remote(num_cpus=0)(SeenShard)  # idle RPC server; must never block pool scheduling
            self.shards = [shard_cls.remote(kind, capacity_per_shard,
                                            journal)
                           for _ in range(num_shards)]
        else:
            self.shards = [SeenShard(kind, capacity_per_shard, journal)
                           for _ in range(num_shards)]

    def _split(self, keys: np.ndarray):
        shard_ids = (keys % np.uint64(self.num_shards)).astype(np.int64)
        return shard_ids

    def contains_batch(self, keys) -> np.ndarray:
        """Membership for each key (order preserved)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        shard_ids = self._split(keys)
        out = np.zeros(len(keys), dtype=bool)
        if self.use_ray:
            import ray

            futs, spans = [], []
            for s in range(self.num_shards):
                idx = np.flatnonzero(shard_ids == s)
                if idx.size:
                    futs.append(self.shards[s].contains_batch.remote(keys[idx]))
                    spans.append(idx)
            for idx, res in zip(spans, ray.get(futs)):
                out[idx] = res
        else:
            for s in range(self.num_shards):
                idx = np.flatnonzero(shard_ids == s)
                if idx.size:
                    out[idx] = self.shards[s].contains_batch(keys[idx])
        return out

    def add_batch(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        shard_ids = self._split(keys)
        futs = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_ids == s)
            if idx.size:
                if self.use_ray:
                    futs.append(self.shards[s].add_batch.remote(keys[idx]))
                else:
                    self.shards[s].add_batch(keys[idx])
        if futs:
            import ray
            ray.get(futs)

    def counts(self) -> list:
        if self.use_ray:
            import ray
            return ray.get([s.count.remote() for s in self.shards])
        return [s.count() for s in self.shards]

    def snapshots(self) -> list:
        """[(shard_id, kind, blob)] for the lineage checkpoint."""
        if self.use_ray:
            import ray
            blobs = ray.get([s.snapshot.remote() for s in self.shards])
        else:
            blobs = [s.snapshot() for s in self.shards]
        return [(i, self.kind, b) for i, b in enumerate(blobs)]

    def restore(self, snapshots) -> None:
        """Restore from [(shard_id, kind, blob)]."""
        futs = []
        for shard_id, kind, blob in snapshots:
            if self.use_ray:
                futs.append(self.shards[shard_id].restore.remote(blob, kind))
            else:
                self.shards[shard_id].restore(blob, kind)
        if futs:
            import ray
            ray.get(futs)

    def drain_deltas(self) -> list:
        """[(shard_id, delta_bytes)] of keys added since the last
        drain or full snapshot — the per-wave lineage record."""
        if self.use_ray:
            import ray
            blobs = ray.get([s.drain_delta.remote() for s in self.shards])
        else:
            blobs = [s.drain_delta() for s in self.shards]
        return list(enumerate(blobs))

    def replay_deltas(self, deltas) -> None:
        """Re-insert drained deltas ([(shard_id, blob)]) on resume."""
        futs = []
        for shard_id, blob in deltas:
            if self.use_ray:
                futs.append(self.shards[shard_id].replay_delta.remote(blob))
            else:
                self.shards[shard_id].replay_delta(blob)
        if futs:
            import ray
            ray.get(futs)
