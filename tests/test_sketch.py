"""HyperLogLog sketch: error bounds, merge algebra, and the
one-row-per-block Dataset fold."""

import numpy as np
import pytest

from webscraping_ray.stages.sketch import (DEFAULT_P, HyperLogLog,
                                           approx_distinct)


def test_rank_computation_exact():
    h = HyperLogLog(p=4)
    # hash with all remaining bits zero -> max rank (64-4+1)
    h.add_hashes(np.array([0], dtype=np.uint64))
    assert h.registers[0] == 61
    # top bit of the remainder set -> rank 1 in register 15
    h2 = HyperLogLog(p=4)
    h2.add_hashes(np.array([(0xF << 60) | (1 << 59)], dtype=np.uint64))
    assert h2.registers[15] == 1
    # remainder 1 (lowest bit) -> rank 60
    h3 = HyperLogLog(p=4)
    h3.add_hashes(np.array([1], dtype=np.uint64))
    assert h3.registers[0] == 60


@pytest.mark.parametrize('n', [10, 1000, 100_000])
def test_error_within_bound(n):
    h = HyperLogLog(DEFAULT_P)
    h.add_strings([f'user-{i}' for i in range(n)])
    est = h.estimate()
    # 0.81% standard error at p=14; allow 5 sigma
    assert abs(est - n) / n < 0.05


def test_duplicates_do_not_inflate():
    h = HyperLogLog(DEFAULT_P)
    for _ in range(5):
        h.add_strings([f'k{i}' for i in range(500)])
    assert abs(h.estimate() - 500) / 500 < 0.05


def test_merge_is_union_and_order_independent():
    a, b, c = (HyperLogLog(10) for _ in range(3))
    a.add_strings([f'a{i}' for i in range(300)])
    b.add_strings([f'b{i}' for i in range(300)])
    c.add_strings([f'a{i}' for i in range(300)])  # overlaps a

    ab = HyperLogLog.from_bytes(a.to_bytes(), 10).merge(b)
    ba = HyperLogLog.from_bytes(b.to_bytes(), 10).merge(a)
    assert ab.estimate() == ba.estimate()
    assert abs(ab.estimate() - 600) / 600 < 0.10  # p=10: ~3.3% sigma

    ac = HyperLogLog.from_bytes(a.to_bytes(), 10).merge(c)
    assert ac.estimate() == a.estimate()  # idempotent union


def test_roundtrip_and_precision_guards():
    h = HyperLogLog(8)
    h.add_strings(['x', 'y'])
    assert HyperLogLog.from_bytes(h.to_bytes(), 8).estimate() \
        == h.estimate()
    with pytest.raises(ValueError):
        HyperLogLog.from_bytes(h.to_bytes(), 9)
    with pytest.raises(ValueError):
        HyperLogLog(3)
    with pytest.raises(ValueError):
        HyperLogLog(10).merge(HyperLogLog(11))


def test_approx_distinct_dataset_matches_single_sketch(ray_session):
    """The distributed block fold must equal one driver-side sketch
    over the same values (merge = max is exact, not approximate)."""
    import ray.data
    import pyarrow as pa

    vals = [f'u{i % 700}' for i in range(5000)]
    ds = ray.data.from_arrow(
        pa.table({'user': pa.array(vals)})).repartition(8)
    est = approx_distinct(ds, 'user', p=12)

    one = HyperLogLog(12)
    one.add_strings(vals)
    assert est == one.estimate()
    assert abs(est - 700) / 700 < 0.07


def test_approx_distinct_on_testdata(ray_session):
    from webscraping_ray.pipelines.relational import _read

    ds = _read('/root/testdata/sf0.001', 'events', ['user_id'])
    exact = len({r['user_id'] for r in ds.take_all()})
    est = approx_distinct(ds, 'user_id')
    assert abs(est - exact) / exact < 0.05
