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
