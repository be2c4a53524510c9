"""Membership-filter properties: no false negatives ever; bounded fpp;
snapshot round-trips."""

import numpy as np
import pytest

from webscraping_ray.state.cuckoo import BloomFilter, CuckooFilter, ExactSet


rng = np.random.default_rng(42)
KEYS = rng.integers(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
OTHERS = rng.integers(0, 2**63, size=20000, dtype=np.int64).astype(np.uint64)
OTHERS = OTHERS[~np.isin(OTHERS, KEYS)]


@pytest.mark.parametrize("cls,kw", [
    (CuckooFilter, {'capacity': 20000}),
    (BloomFilter, {'capacity': 20000, 'fpp': 1e-4}),
    (ExactSet, {'capacity': 20000}),
])
def test_no_false_negatives(cls, kw):
    f = cls(**kw)
    f.add_batch(KEYS)
    assert f.contains_batch(KEYS).all(), 'false negative!'


@pytest.mark.parametrize("cls,kw,max_fpp", [
    (CuckooFilter, {'capacity': 20000}, 0.01),
    (BloomFilter, {'capacity': 20000, 'fpp': 1e-4}, 0.005),
    (ExactSet, {'capacity': 20000}, 0.0),
])
def test_false_positive_rate(cls, kw, max_fpp):
    f = cls(**kw)
    f.add_batch(KEYS)
    fp = f.contains_batch(OTHERS).mean()
    assert fp <= max_fpp, f'fpp {fp} too high'


@pytest.mark.parametrize("cls,kw", [
    (CuckooFilter, {'capacity': 20000}),
    (BloomFilter, {'capacity': 20000, 'fpp': 1e-4}),
    (ExactSet, {'capacity': 20000}),
])
def test_snapshot_roundtrip(cls, kw):
    f = cls(**kw)
    f.add_batch(KEYS[:5000])
    blob = f.snapshot()
    g = cls.restore(blob)
    assert g.contains_batch(KEYS[:5000]).all()
    np.testing.assert_array_equal(g.contains_batch(OTHERS[:2000]),
                                  f.contains_batch(OTHERS[:2000]))


def test_cuckoo_overflow_spill():
    # overfill: load factor forced > capacity, still no false negatives
    f = CuckooFilter(capacity=256)
    keys = rng.integers(0, 2**63, size=1200, dtype=np.int64).astype(np.uint64)
    f.add_batch(keys)
    assert f.contains_batch(keys).all()


def test_cuckoo_overflow_exact_no_fp_aliasing():
    """Overflow stores FULL keys: a non-member that merely shares a
    16-bit fingerprint with a spilled key must NOT become a false
    positive (the round-1 version aliased 1/65536 of the keyspace per
    spilled fingerprint)."""
    f = CuckooFilter(capacity=64)
    keys = rng.integers(0, 2**63, size=600, dtype=np.int64).astype(np.uint64)
    f.add_batch(keys)
    assert f.overflow, 'test needs the overflow path exercised'
    assert f.contains_batch(keys).all()
    # craft non-members sharing fingerprints (bits 48..63) with spilled
    # keys but differing low bits → different buckets, same fp
    spilled = np.fromiter(f.overflow, dtype=np.uint64,
                          count=len(f.overflow))
    aliases = (spilled & np.uint64(0xFFFF) << np.uint64(48)) | \
        np.uint64(0x123456789AB)
    aliases = aliases[~np.isin(aliases, keys)]
    hits = f.contains_batch(aliases)
    # aliases may still hit the table by chance, but must not ALL hit:
    # with the old fingerprint-only overflow check every alias hit
    assert not hits.all()


def test_cuckoo_count_and_idempotence():
    f = CuckooFilter(capacity=4096)
    keys = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    f.add_batch(keys)
    c1 = f.count
    assert c1 == len(np.unique(keys))
    f.add_batch(keys)          # re-insert: count unchanged, no bloat
    assert f.count == c1
    f.add_batch(np.concatenate([keys[:10], keys[:10]]))  # dup batch
    assert f.count == c1
    assert f.contains_batch(keys).all()


def test_cuckoo_overflow_snapshot_roundtrip():
    f = CuckooFilter(capacity=64)
    keys = rng.integers(0, 2**63, size=600, dtype=np.int64).astype(np.uint64)
    f.add_batch(keys)
    assert f.overflow
    g = CuckooFilter.restore(f.snapshot())
    assert g.overflow == f.overflow
    np.testing.assert_array_equal(g.contains_batch(keys),
                                  f.contains_batch(keys))


def test_sharded_seen_inprocess():
    from webscraping_ray.state.seen import ShardedSeenSet
    s = ShardedSeenSet(num_shards=4, kind='exact', use_ray=False)
    s.add_batch(KEYS[:1000])
    got = s.contains_batch(np.concatenate([KEYS[:1000], OTHERS[:1000]]))
    assert got[:1000].all() and not got[1000:].any()
    snaps = s.snapshots()
    s2 = ShardedSeenSet(num_shards=4, kind='exact', use_ray=False)
    s2.restore(snaps)
    assert s2.contains_batch(KEYS[:1000]).all()
