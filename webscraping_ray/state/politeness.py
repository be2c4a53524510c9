"""Politeness scheduler: the reference throttle on a virtual clock.

The reference blocks each thread until ``now >= _domains[key]`` and
then sets ``_domains[key] = now + delay * (1 + variance*(rand-0.5))``
(reference download.py:454-473, SLEEP_TIME poll download.py:46).

For a corpus crawl the budget is simulated on a deterministic virtual
clock (variance=0, the reference's deterministic mode): each host's
k-th fetch in queue order is scheduled at
``max(host_next_ok, wave_start)`` and advances ``host_next_ok`` by
``delay``.  The schedule is a recorded column (``scheduled_ts``).

Clock model: under ``Crawler(politeness_clock='frozen')`` (the
default the vendored oracle pins) the crawler passes
``wave_start=0.0`` every wave, so each host's timeline runs
independently from t=0 and consecutive fetches of one host are
exactly ``delay`` apart regardless of wave boundaries — a per-host
pacing contract, not a global wall-clock simulation.  Under
``politeness_clock='continuous'`` the crawler threads the previous
wave's max scheduled slot in as ``wave_start``, reproducing the
reference's single continuous clock (download.py:454-473): no fetch
is ever scheduled before a fetch of an earlier wave.

Sharding: hosts hash-partition across ``PolitenessShard`` actors; each
shard sees its hosts' rows in wave order (order within a host is
preserved by the split), so the assignment is deterministic at any
shard count.
"""

from __future__ import annotations

import numpy as np

from ..kernels.urls import url_hash64


class PolitenessShard:
    """Per-host next-allowed virtual timestamps for one shard of hosts."""

    def __init__(self, delay: float = 5.0, journal: bool = False):
        self.delay = float(delay)
        self.next_ok = {}  # host -> virtual ts
        # delta journal (checkpoint lineage): hosts whose clock moved
        # since the last drain/full snapshot — per-wave politeness
        # records are O(hosts touched this wave), not O(hosts ever)
        self.journal = journal
        self._touched: set = set()

    def schedule_batch(self, hosts, wave_start: float):
        """Assign a virtual fetch ts to each row (hosts in wave order).

        Vectorized per host: within one batch a host's slots are the
        repeated-addition sequence ``t0=base, t_k=t_{k-1}+delay`` with
        ``base = max(next_ok, wave_start)``, reproduced bit-exactly by
        ``np.add.accumulate`` (strictly sequential, unlike
        ``base + k*delay`` which rounds differently for non-dyadic
        delays).  A skewed host whose rows flood one shard costs one
        C-speed accumulate instead of len(rows) Python dict
        round-trips — no scheduling straggler on mega waves.
        """
        n = len(hosts)
        out = np.empty(n, dtype=np.float64)
        if not n:
            return out
        if self.delay < 0:  # undefined regime: keep the exact loop
            for i, h in enumerate(hosts):
                t = max(self.next_ok.get(h, wave_start), wave_start)
                out[i] = t
                self.next_ok[h] = t + self.delay
            if self.journal:
                self._touched.update(hosts)
            return out
        import pandas as pd

        codes, uniq = pd.factorize(np.asarray(hosts, dtype=object))
        order = np.argsort(codes, kind='stable')
        bounds = np.flatnonzero(np.diff(codes[order])) + 1
        for idx in np.split(order, bounds):
            h = uniq[codes[idx[0]]]
            base = max(self.next_ok.get(h, wave_start), wave_start)
            seq = np.full(idx.size, self.delay, dtype=np.float64)
            seq[0] = base
            slots = np.add.accumulate(seq)
            out[idx] = slots
            self.next_ok[h] = slots[-1] + self.delay
            if self.journal:
                self._touched.add(h)
        return out

    def snapshot(self) -> dict:
        self._touched = set()   # full snapshot supersedes the journal
        return dict(self.next_ok)

    def restore(self, state: dict) -> None:
        self.next_ok = dict(state)

    def drain_delta(self) -> dict:
        """{host: next_ok} for hosts touched since the last drain or
        full snapshot; clears the journal."""
        d = {h: self.next_ok[h] for h in self._touched
             if h in self.next_ok}
        self._touched = set()
        return d

    def replay_delta(self, delta: dict) -> None:
        self.next_ok.update(delta)


class PolitenessPool:
    """Driver handle over politeness shard actors (or in-process)."""

    def __init__(self, num_shards: int = 2, delay: float = 5.0,
                 use_ray: bool = True, additional_key: str | None = None,
                 journal: bool = False):
        """``additional_key`` mirrors the reference's
        ``throttle_additional_key`` (download.py:122,169,468): it joins
        the per-host clock key so independent sessions pace separately."""
        self.num_shards = num_shards
        self.delay = delay
        self.use_ray = use_ray
        self.additional_key = additional_key or ''
        if use_ray:
            import ray

            cls = ray.remote(num_cpus=0)(PolitenessShard)  # idle RPC server
            self.shards = [cls.remote(delay, journal)
                           for _ in range(num_shards)]
        else:
            self.shards = [PolitenessShard(delay, journal)
                           for _ in range(num_shards)]

    def schedule(self, hosts, wave_start: float) -> np.ndarray:
        """scheduled_ts per row, preserving wave order within each host."""
        n = len(hosts)
        out = np.zeros(n, dtype=np.float64)
        if n == 0:
            return out
        if self.additional_key:
            hosts = ['%s:%s' % (self.additional_key, h) for h in hosts]
        # hash unique hosts only (same blake2b shard assignment, O(uniq)
        # not O(rows) driver work on a mega wave)
        import pandas as pd

        codes, uniq = pd.factorize(np.asarray(hosts, dtype=object))
        shard_of = np.array([url_hash64(h) % self.num_shards for h in uniq],
                            dtype=np.int64)
        shard_ids = shard_of[codes]
        futs, spans = [], []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_ids == s)
            if not idx.size:
                continue
            sub = [hosts[i] for i in idx]
            if self.use_ray:
                futs.append(self.shards[s].schedule_batch.remote(sub, wave_start))
                spans.append(idx)
            else:
                out[idx] = self.shards[s].schedule_batch(sub, wave_start)
        if futs:
            import ray
            for idx, res in zip(spans, ray.get(futs)):
                out[idx] = res
        return out

    def snapshots(self) -> list:
        if self.use_ray:
            import ray
            return ray.get([s.snapshot.remote() for s in self.shards])
        return [s.snapshot() for s in self.shards]

    def restore(self, states) -> None:
        futs = []
        for shard, state in zip(self.shards, states):
            if self.use_ray:
                futs.append(shard.restore.remote(state))
            else:
                shard.restore(state)
        if futs:
            import ray
            ray.get(futs)

    def drain_deltas(self) -> list:
        """Per-shard {host: next_ok} of clocks moved since the last
        drain or full snapshot — the per-wave lineage record."""
        if self.use_ray:
            import ray
            return ray.get([s.drain_delta.remote() for s in self.shards])
        return [s.drain_delta() for s in self.shards]

    def replay_deltas(self, deltas) -> None:
        futs = []
        for shard, delta in zip(self.shards, deltas):
            if self.use_ray:
                futs.append(shard.replay_delta.remote(delta))
            else:
                shard.replay_delta(delta)
        if futs:
            import ray
            ray.get(futs)
