"""Cuckoo and bloom filters over 64-bit keys (numpy-backed).

The reference acknowledges approximate membership as its scale path
(``adt.Bloom`` over pybloom, reference adt.py:77-88; ``adt.HashDict``
stores only 64-bit hashes, adt.py:71-74).  Here the cuckoo filter is
the primary structure (supports deletion-free insert + snapshot, ~1
byte-per-key-per-1% fpp better than bloom at low fpp), with a classic
bloom filter as the fallback for spill shards (north rule).

Both are deterministic (no RNG in the hot path; cuckoo eviction uses a
deterministic alternating walk), snapshot-able to bytes, and mergeable
from snapshots — which is what the per-wave lineage checkpoint needs.
"""

from __future__ import annotations

import numpy as np

_FP_MIX = np.uint64(0x9E3779B97F4A7C15)


class CuckooFilter:
    """Partial-key cuckoo filter: 4-slot buckets, 16-bit fingerprints.

    Keys are int64/uint64 (already-hashed canonical URLs).  False
    positive rate ≈ 4 * 2 / 2^16 ≈ 0.012% at full load; no false
    negatives for inserted keys (overflow spills to an exact set, so
    membership answers stay no-false-negative even past load limits).
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        # buckets power of two, 4 slots, target load <= 0.95
        n_buckets = 1
        while n_buckets * 4 * 0.95 < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        # exact spill for failed inserts: stores the FULL 64-bit key
        # (storing only the evicted fingerprint would make every key
        # sharing that fingerprint — 1/65536 of the keyspace — a
        # filter-wide false positive once any insert overflows)
        self.overflow = set()
        self.count = 0            # distinct keys inserted (approx.)

    # --- key -> (fingerprint, i1, i2) ------------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # fingerprint must be nonzero
        return fp

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.uint64)

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over='ignore'):  # uint64 wrap is the hash mix
            return (i ^ (fp.astype(np.uint64) * _FP_MIX & self.mask)) & self.mask

    def add_batch(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        keys = np.unique(keys)                 # idempotent insert
        present = self.contains_batch(keys)    # skip already-present
        keys = keys[~present]
        if keys.size == 0:
            return
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._alt(i1s, fps)
        # vectorized fast path: rounds of one-key-per-bucket scatter
        # alternating primary/secondary buckets; within-batch bucket
        # conflicts defer to the next round.  Only keys whose both
        # buckets fill up reach the Python kick walk (<0.1% at the
        # design load).
        pending = np.arange(len(keys))
        for _ in range(8):
            if pending.size == 0:
                break
            placed = self._scatter_round(fps, i1s, pending)
            pending = pending[~placed]
            if pending.size == 0:
                break
            placed = self._scatter_round(fps, i2s, pending)
            pending = pending[~placed]
        for j in pending:
            self._add_one(int(keys[j]), np.uint16(fps[j]), np.uint64(i1s[j]))
        self.count += len(keys)               # distinct new keys only

    def _scatter_round(self, fps, buckets, pending) -> np.ndarray:
        """One vectorized placement round: for the first key targeting
        each distinct bucket, fill that bucket's first free slot.
        Returns a placed-mask aligned with ``pending``."""
        b = buckets[pending].astype(np.int64)
        first_for_bucket = np.zeros(len(pending), dtype=bool)
        _, first = np.unique(b, return_index=True)
        first_for_bucket[first] = True
        rows = self.table[b]
        is_empty = rows == 0
        ok = first_for_bucket & is_empty.any(axis=1)
        slot = is_empty.argmax(axis=1)
        self.table[b[ok], slot[ok]] = fps[pending[ok]]
        return ok

    def _add_one(self, key, fp, i1):
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[int(i)]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return
        # evict: deterministic walk (slot j = kick % 4), recording the
        # displacements so a failed walk can be rolled back
        i = i1
        cur = fp
        trail = []
        for kick in range(self.MAX_KICKS):
            j = kick % 4
            row = self.table[int(i)]
            trail.append((int(i), j, row[j]))
            cur, row[j] = row[j], cur
            i = self._alt(i, cur)
            row = self.table[int(i)]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                return
        # walk failed: restore the table and spill the FULL key to the
        # exact overflow set — no false negatives, and no filter-wide
        # fingerprint aliasing
        for bi, j, old in reversed(trail):
            self.table[bi][j] = old
        self.overflow.add(int(key))

    def contains_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fp(keys)
        i1s = self._i1(keys)
        i2s = self._alt(i1s, fps)
        r1 = self.table[i1s.astype(np.int64)]
        r2 = self.table[i2s.astype(np.int64)]
        hit = (r1 == fps[:, None]).any(axis=1) | (r2 == fps[:, None]).any(axis=1)
        if self.overflow:
            ov = np.fromiter(self.overflow, dtype=np.uint64,
                             count=len(self.overflow))
            hit |= np.isin(keys, ov)   # exact: full keys, not fingerprints
        return hit

    def __contains__(self, key) -> bool:
        return bool(self.contains_batch(np.array([key], dtype=np.uint64))[0])

    # --- snapshot / restore ----------------------------------------------
    def snapshot(self) -> bytes:
        ov = np.fromiter(sorted(self.overflow), dtype=np.uint64,
                         count=len(self.overflow))
        head = np.array([self.n_buckets, self.count, len(self.overflow)],
                        dtype=np.int64)
        return head.tobytes() + self.table.tobytes() + ov.tobytes()

    @classmethod
    def restore(cls, blob: bytes) -> 'CuckooFilter':
        head = np.frombuffer(blob[:24], dtype=np.int64)
        n_buckets, count, n_ov = map(int, head)
        self = cls.__new__(cls)
        self.n_buckets = n_buckets
        self.mask = np.uint64(n_buckets - 1)
        tbl_bytes = n_buckets * 4 * 2
        self.table = np.frombuffer(blob[24:24 + tbl_bytes],
                                   dtype=np.uint16).reshape(n_buckets, 4).copy()
        self.overflow = set(np.frombuffer(blob[24 + tbl_bytes:],
                                          dtype=np.uint64).tolist())
        self.count = count
        return self


class BloomFilter:
    """Classic bloom filter over 64-bit keys (spill-shard fallback).

    k hash functions derived from the key by multiply-shift; bit array
    sized for the requested fpp.
    """

    def __init__(self, capacity: int, fpp: float = 1e-4):
        import math

        m = max(64, int(-capacity * math.log(fpp) / (math.log(2) ** 2)))
        m = 1 << (m - 1).bit_length()  # power of two for cheap modulo
        self.m = m
        self.k = max(1, int(round(m / capacity * math.log(2)))) if capacity else 8
        self.bits = np.zeros(m // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch-Mitzenmacher)
        h1 = keys * np.uint64(0xFF51AFD7ED558CCD)
        h2 = (keys >> np.uint64(33)) * np.uint64(0xC4CEB9FE1A85EC53) | np.uint64(1)
        idx = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + idx * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_batch(self, keys) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.count += len(keys)

    def contains_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        got = (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return got.all(axis=1)

    def __contains__(self, key) -> bool:
        return bool(self.contains_batch(np.array([key], dtype=np.uint64))[0])

    def snapshot(self) -> bytes:
        head = np.array([self.m, self.k, self.count], dtype=np.int64)
        return head.tobytes() + self.bits.tobytes()

    @classmethod
    def restore(cls, blob: bytes) -> 'BloomFilter':
        head = np.frombuffer(blob[:24], dtype=np.int64)
        m, k, count = map(int, head)
        self = cls.__new__(cls)
        self.m = m
        self.k = k
        self.count = count
        self.bits = np.frombuffer(blob[24:], dtype=np.uint8).copy()
        return self

    @classmethod
    def view(cls, blob: bytes) -> 'BloomFilter':
        """Zero-copy read-only restore: ``bits`` aliases ``blob``
        (e.g. a ``ray.get`` of a broadcast snapshot — shared object
        store memory, no per-task copy).  ``contains_batch`` only;
        ``add_batch`` would raise on the read-only buffer."""
        head = np.frombuffer(blob[:24], dtype=np.int64)
        m, k, count = map(int, head)
        self = cls.__new__(cls)
        self.m = m
        self.k = k
        self.count = count
        self.bits = np.frombuffer(blob[24:], dtype=np.uint8)
        return self


class ExactSet:
    """Exact 64-bit membership (the authority for byte-matched crawls).

    Matches the reference's ``adt.HashDict`` semantics (hash-only
    membership, adt.py:30-74) with a process-stable hash.  ~8-16 bytes
    per key; at 10^10 urls this shards to ~300 MB per node on a
    256-node cluster, which is why exact is a viable default even at
    full scale.
    """

    def __init__(self, capacity: int = 0):
        self.s = set()

    def add_batch(self, keys) -> None:
        self.s.update(int(k) for k in np.asarray(keys, dtype=np.uint64))

    def contains_batch(self, keys) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        return np.fromiter((int(k) in self.s for k in keys), dtype=bool,
                           count=len(keys))

    def __contains__(self, key) -> bool:
        return int(np.uint64(key)) in self.s

    @property
    def count(self):
        return len(self.s)

    def snapshot(self) -> bytes:
        return np.fromiter(self.s, dtype=np.uint64, count=len(self.s)).tobytes()

    @classmethod
    def restore(cls, blob: bytes) -> 'ExactSet':
        self = cls()
        self.s = set(np.frombuffer(blob, dtype=np.uint64).tolist())
        return self


FILTER_KINDS = {'cuckoo': CuckooFilter, 'bloom': BloomFilter, 'exact': ExactSet}


def make_filter(kind: str, capacity: int):
    return FILTER_KINDS[kind](capacity)
