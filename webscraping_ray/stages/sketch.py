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
