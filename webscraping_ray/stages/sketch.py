"""Mergeable cardinality sketch: HyperLogLog over a Dataset column.

Classic public algorithm (Flajolet, Fusy, Gandouet, Meunier,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm", AofA 2007) with the standard small-range linear-counting
correction.  The distributed shape is the point: every block folds to
ONE fixed-size register row (2^p bytes) inside ``map_batches`` — the
shuffle carries sketches, never values — and register-wise ``max`` is
associative/commutative/idempotent, so merge order (and therefore
block order, retries, and partitioning) cannot change the estimate.

Exact distinct counting at 100 TB is a full shuffle of every key
(``distinct_event_types`` does it for small key spaces); this sketch
answers the same question in one streaming pass with ~0.8 % error at
p=14 and 16 KB of state per worker.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import content_hash64

#: default precision: 2^14 registers = 16 KB, ~0.81% standard error
DEFAULT_P = 14


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    """Register array + vectorized add/merge/estimate."""

    def __init__(self, p: int = DEFAULT_P):
        if not 4 <= p <= 18:
            raise ValueError(f'p must be in [4, 18], got {p}')
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        """Fold a batch of uint64 hashes into the registers."""
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, top-aligned
        # rank = position of the leftmost 1-bit in the remaining bits
        # (1-based), i.e. 64-p+1 when they are all zero
        nbits = 64 - self.p
        rank = np.full(len(h), nbits + 1, dtype=np.uint8)
        nz = rest != 0
        if nz.any():
            # leading zero count via float64 exponent is unsafe past
            # 2^53; use a 4-way binary reduction on uint64 instead
            v = rest[nz]
            lz = np.zeros(v.shape, dtype=np.uint8)
            for shift in (32, 16, 8, 4, 2, 1):
                mask = v < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += np.uint8(shift)
                v[mask] <<= np.uint64(shift)
            rank[nz] = lz + 1
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        # per-string blake2b (the repo's content hash); digests are the
        # irreducible per-item cost — everything downstream is numpy
        self.add_hashes(np.array([content_hash64(v) for v in values],
                                 dtype=np.int64).astype(np.uint64))

    def merge(self, other: 'HyperLogLog') -> 'HyperLogLog':
        if other.p != self.p:
            raise ValueError('precision mismatch')
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        est = _alpha(m) * m * m / np.sum(
            np.ldexp(1.0, -self.registers.astype(np.int64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * float(np.log(m / zeros))
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = DEFAULT_P) -> 'HyperLogLog':
        h = cls(p)
        regs = np.frombuffer(data, dtype=np.uint8)
        if len(regs) != h.m:
            raise ValueError('register blob does not match precision')
        h.registers = regs.copy()
        return h


def approx_distinct(ds, col: str, p: int = DEFAULT_P) -> float:
    """Approximate COUNT(DISTINCT col) in one streaming pass.

    Each block folds to a single (p, registers) row; the driver merges
    the block sketches (register-wise max — order-independent).  State
    shipped per block is 2^p bytes regardless of block size.
    """
    def fold(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        # any column type: hash the canonical string form (nulls -> '')
        h.add_strings(['' if v is None else str(v)
                       for v in t.column(col).to_pylist()])
        return pa.table({'regs': pa.array([h.to_bytes()], pa.binary())})

    acc = HyperLogLog(p)
    for b in ds.select_columns([col]).map_batches(
            fold, batch_format='pyarrow').iter_batches(
                batch_format='pyarrow'):
        for blob in b.column('regs').to_pylist():
            acc.merge(HyperLogLog.from_bytes(blob, p))
    return acc.estimate()


class MisraGries:
    """Heavy-hitters summary (Misra & Gries 1982 / SpaceSaving family).

    Holds at most ``capacity`` counters.  After ingesting N items the
    stored count of any key undercounts its true frequency by at most
    ``self.err`` <= N / (capacity + 1), and every key with true
    frequency > N / (capacity + 1) is guaranteed present.  With
    ``capacity`` >= the number of distinct keys the summary is exact.
    Summaries merge by counter addition + re-shrink (Agarwal et al.,
    "Mergeable Summaries", PODS 2012): error bounds add, so a tree of
    block merges keeps the same N / (capacity + 1) corpus-wide bound.
    """

    def __init__(self, capacity: int = 4096):
        if capacity < 1:
            raise ValueError('capacity must be >= 1')
        self.capacity = capacity
        self.counts: dict = {}
        self.err = 0  # max undercount of any stored counter

    def _shrink(self) -> None:
        over = len(self.counts) - self.capacity
        if over <= 0:
            return
        # subtract the (over)-th smallest count from everyone — the
        # batched form of the classic decrement-all step
        vals = sorted(self.counts.values())
        d = vals[over - 1]
        self.counts = {k: c - d for k, c in self.counts.items() if c > d}
        self.err += d

    def add_counter(self, cnt: dict) -> None:
        for key, c in cnt.items():
            self.counts[key] = self.counts.get(key, 0) + c
        self._shrink()

    def add(self, values) -> None:
        import collections
        self.add_counter(collections.Counter(values))

    def merge(self, other: 'MisraGries') -> 'MisraGries':
        if other.capacity != self.capacity:
            raise ValueError('capacity mismatch')
        self.err += other.err
        self.add_counter(other.counts)
        return self

    def top(self, k: int):
        """[(key, lower-bound count)] — count desc, key asc."""
        return sorted(self.counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:k]


def approx_top_ngrams(ds, n: int = 3, k: int = 100,
                      capacity: int = 4096, text_col: str = 'text'):
    """Approximate corpus top-k word n-grams in one streaming pass.

    The exact :func:`~webscraping_ray.pipelines.relational.top_ngrams`
    shuffles one (ngram, count) partial per distinct ngram per batch —
    at 100 TB the distinct-trigram space is billions of keys and the
    groupby becomes the bottleneck.  This sketch folds each block to a
    ``capacity``-bounded Misra-Gries summary row and merges summaries
    on the driver: shuffled state is O(blocks x capacity) regardless
    of vocabulary, counts undercount by <= N/(capacity+1) corpus-wide,
    and any ngram above that frequency is guaranteed in the summary.
    Returns a pyarrow Table (ngram, cnt) — count desc, ngram asc.
    """
    import re

    import pyarrow as pa

    tok = re.compile(r'\w+', re.UNICODE)

    def fold(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for txt in t.column(text_col).to_pylist():
            toks = tok.findall((txt or '').lower())
            for i in range(len(toks) - n + 1):
                c[' '.join(toks[i:i + n])] += 1
        mg = MisraGries(capacity)
        mg.add_counter(c)
        return pa.table({
            'ngram': pa.array(list(mg.counts.keys()), pa.string()),
            'cnt': pa.array(list(mg.counts.values()), pa.int64()),
            'err': pa.array([mg.err] * len(mg.counts), pa.int64())})

    acc = MisraGries(capacity)
    for b in ds.select_columns([text_col]).map_batches(
            fold, batch_format='pyarrow').iter_batches(
                batch_format='pyarrow'):
        part = MisraGries(capacity)
        part.counts = dict(zip(b.column('ngram').to_pylist(),
                               b.column('cnt').to_pylist()))
        part.err = b.column('err')[0].as_py() if b.num_rows else 0
        acc.merge(part)
    top = acc.top(k)
    return pa.table({'ngram': pa.array([t_ for t_, _ in top], pa.string()),
                     'cnt': pa.array([c for _, c in top], pa.int64())})


class KLLQuantiles:
    """Mergeable quantile sketch (the KLL compactor scheme — Karnin,
    Lang, Liberty, "Optimal Quantile Approximation in Streams",
    FOCS 2016 — in its simple all-levels-capacity-k form).

    Level ``l`` holds items of weight ``2^l``; a full level sorts and
    keeps alternating items (seeded coin per compaction), promoting
    them one level up.  Rank queries sum weights below a value; rank
    error is O(n / k) with small constants in practice (pinned
    empirically in tests, not promised analytically).  Estimates
    depend (within the error bound) on arrival/merge order, like any
    randomized sketch — bounds hold for every order.

    The distributed shape matches the other sketches here: one
    bounded summary row per block, associative merge on the driver.
    """

    def __init__(self, k: int = 200, seed: int = 42):
        if k < 8:
            raise ValueError('k must be >= 8')
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._coin = np.random.RandomState(seed)

    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact()

    def _compact(self) -> None:
        lvl = 0
        while lvl < len(self.levels):
            buf = self.levels[lvl]
            if len(buf) <= self.k:
                lvl += 1
                continue
            buf = np.sort(buf, kind='stable')
            off = int(self._coin.randint(2))
            keep = buf[off::2]
            self.levels[lvl] = np.empty(0, np.float64)
            if lvl + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[lvl + 1] = np.concatenate(
                [self.levels[lvl + 1], keep])
            lvl += 1

    def merge(self, other: 'KLLQuantiles') -> 'KLLQuantiles':
        if other.k != self.k:
            raise ValueError('k mismatch')
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for lvl, buf in enumerate(other.levels):
            self.levels[lvl] = np.concatenate([self.levels[lvl], buf])
        self.n += other.n
        self._compact()
        return self

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError('q must be in [0, 1]')
        if self.n == 0:
            raise ValueError('empty sketch')
        items = np.concatenate(self.levels)
        weights = np.concatenate(
            [np.full(len(buf), 1 << lvl, np.int64)
             for lvl, buf in enumerate(self.levels)])
        order = np.argsort(items, kind='stable')
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        target = q * cum[-1]
        return float(items[np.searchsorted(cum, target, side='left')
                           .clip(0, len(items) - 1)])

    def to_table(self) -> pa.Table:
        # sid makes the serialized summary SELF-DESCRIBING: Ray Data
        # coalesces consecutive map-task outputs into one block, so a
        # block can carry several summaries — parsing by position
        # (n = first row's n) would silently drop the others' weight
        import uuid

        sid = uuid.uuid4().hex
        n_rows = sum(len(b) for b in self.levels)
        return pa.table({
            'sid': pa.array([sid] * n_rows, pa.string()),
            'lvl': pa.array(
                [l for l, buf in enumerate(self.levels)
                 for _ in range(len(buf))], pa.int32()),
            'item': pa.array(
                np.concatenate(self.levels) if n_rows
                else np.empty(0, np.float64), pa.float64()),
            'n': pa.array([self.n] * n_rows, pa.int64())})

    @classmethod
    def from_table(cls, t: pa.Table, k: int = 200,
                   seed: int = 42) -> 'KLLQuantiles':
        """Parse ONE summary (table must not mix sids — use
        :meth:`all_from_table` on raw blocks)."""
        h = cls(k, seed)
        if not t.num_rows:
            return h
        lvls = t.column('lvl').to_numpy(zero_copy_only=False)
        items = t.column('item').to_numpy(zero_copy_only=False)
        for lvl in range(int(lvls.max()) + 1):
            while len(h.levels) <= lvl:
                h.levels.append(np.empty(0, np.float64))
            h.levels[lvl] = items[lvls == lvl].astype(np.float64)
        h.n = int(t.column('n')[0].as_py())
        return h

    @classmethod
    def all_from_table(cls, t: pa.Table, k: int = 200,
                       seed: int = 42) -> 'list[KLLQuantiles]':
        """Every summary in a block: one sketch per distinct sid (a
        sid-less legacy table parses as a single summary).  Summaries
        are KBs, far below the block-split threshold, so a block holds
        only WHOLE summaries."""
        if not t.num_rows:
            return []
        if 'sid' not in t.column_names:
            return [cls.from_table(t, k, seed)]
        sids = t.column('sid').to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(sids, return_inverse=True)
        return [cls.from_table(t.filter(pa.array(inv == i)), k, seed)
                for i in range(len(uniq))]


def approx_quantiles(ds, col: str, qs, k: int = 200) -> list[float]:
    """Approximate quantiles of a numeric column in one streaming
    pass: each block folds to a bounded KLL summary (seeded per block
    for determinism given the same blocks), merged on the driver.

    The exact counterpart is ``token_quantiles``' full value-histogram
    fold — exact but O(distinct values) of shuffled state; this is
    O(blocks x k x log(n/k)) regardless of the value domain."""
    def fold(t: pa.Table) -> pa.Table:
        h = KLLQuantiles(k)
        h.add(t.column(col).to_numpy(zero_copy_only=False))
        return h.to_table()

    import ray

    acc = KLLQuantiles(k)
    # block refs, not iter_batches: re-batching could SPLIT one
    # summary across two batches, which no parser can reassemble
    for ref in ds.select_columns([col]).map_batches(
            fold, batch_format='pyarrow').to_arrow_refs():
        for part in KLLQuantiles.all_from_table(ray.get(ref), k):
            acc.merge(part)
    return [acc.quantile(q) for q in qs]
