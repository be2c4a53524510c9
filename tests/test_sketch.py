"""HyperLogLog sketch: error bounds, merge algebra, and the
one-row-per-block Dataset fold."""

import numpy as np
import pyarrow as pa
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


def test_misra_gries_exact_when_capacity_sufficient():
    from webscraping_ray.stages.sketch import MisraGries
    import collections

    vals = [f'k{i % 37}' for i in range(2000)]
    mg = MisraGries(capacity=64)
    mg.add(vals)
    assert mg.err == 0
    assert mg.counts == dict(collections.Counter(vals))


def test_misra_gries_error_bound_and_guarantee():
    from webscraping_ray.stages.sketch import MisraGries
    import collections

    rng = np.random.default_rng(5)
    # zipf-ish stream: few heavy keys + long tail
    vals = ([f'hot{i}' for i in range(5) for _ in range(500)]
            + [f'tail{int(x)}' for x in rng.integers(0, 5000, 8000)])
    rng.shuffle(vals)
    n = len(vals)
    cap = 256
    mg = MisraGries(capacity=cap)
    for i in range(0, n, 997):     # streamed in uneven chunks
        mg.add(vals[i:i + 997])
    true = collections.Counter(vals)
    assert mg.err <= n // (cap + 1) + 1
    for key, c in mg.counts.items():
        assert c <= true[key]                  # never overcounts
        assert true[key] - c <= mg.err         # bounded undercount
    # every key above the threshold is guaranteed present
    thresh = n / (cap + 1)
    for key, c in true.items():
        if c > thresh + mg.err:
            assert key in mg.counts


def test_misra_gries_merge_bounds_add():
    from webscraping_ray.stages.sketch import MisraGries
    import collections

    a_vals = [f'x{i % 300}' for i in range(3000)]
    b_vals = [f'x{i % 50}' for i in range(3000)]
    a, b = MisraGries(64), MisraGries(64)
    a.add(a_vals)
    b.add(b_vals)
    err_budget = a.err + b.err
    a.merge(b)
    true = collections.Counter(a_vals + b_vals)
    assert a.err >= err_budget
    assert a.err <= len(a_vals + b_vals) // 65 + 2
    for key, c in a.counts.items():
        assert c <= true[key] and true[key] - c <= a.err


def test_approx_top_ngrams_matches_exact(ray_session):
    """With capacity >= distinct n-grams per block the sketch is exact
    — must equal the exact shuffle-based top_ngrams."""
    from webscraping_ray.pipelines import relational as R
    from webscraping_ray.pipelines.relational import _read
    from webscraping_ray.stages.sketch import approx_top_ngrams

    sf = '/root/testdata/sf0.001'
    exact = R.top_ngrams(sf, n=3, k=50).take_all()
    got = approx_top_ngrams(_read(sf, 'documents', ['text']),
                            n=3, k=50, capacity=200_000)
    got_rows = list(zip(got.column('ngram').to_pylist(),
                        got.column('cnt').to_pylist()))
    assert got_rows == [(r['ngram'], r['cnt']) for r in exact]


def test_approx_top_ngrams_small_capacity_keeps_heavy_head(ray_session):
    """MG only guarantees keys above N/(capacity+1) — the testdata
    vocabulary is near-uniform, so build a skewed corpus where the
    head truly dominates and assert it survives a tight capacity."""
    import ray.data
    from webscraping_ray.stages.sketch import approx_top_ngrams

    rng = np.random.default_rng(9)
    tail_words = [f'w{i}' for i in range(2000)]
    texts = []
    for i in range(400):
        words = list(rng.choice(tail_words, size=30))
        if i % 2 == 0:
            words += ['hot', 'hot', 'hot']     # heavy unigram
        texts.append(' '.join(words))
    ds = ray.data.from_arrow(pa.table({'text': pa.array(texts)}))
    got = approx_top_ngrams(ds, n=1, k=5, capacity=256)
    assert got.column('ngram').to_pylist()[0] == 'hot'


def _rank_error(sketch, data, qs):
    data = np.sort(np.asarray(data, dtype=np.float64))
    n = len(data)
    worst = 0.0
    for q in qs:
        est = sketch.quantile(q)
        # with ties an estimate's true rank is an interval — error is
        # the distance from q to [rank_left, rank_right]
        lo = np.searchsorted(data, est, side='left') / n
        hi = np.searchsorted(data, est, side='right') / n
        worst = max(worst, lo - q, q - hi, 0.0)
    return worst


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.parametrize('dist', ['uniform', 'zipf', 'normal'])
def test_kll_rank_error_bound(dist):
    from webscraping_ray.stages.sketch import KLLQuantiles

    rng = np.random.default_rng(13)
    n = 100_000
    data = {'uniform': rng.uniform(0, 1, n),
            'zipf': rng.zipf(1.5, n).astype(float),
            'normal': rng.normal(0, 1, n)}[dist]
    h = KLLQuantiles(k=200)
    for i in range(0, n, 4096):
        h.add(data[i:i + 4096])
    assert h.n == n
    assert sum(len(b) for b in h.levels) <= 200 * len(h.levels)
    assert _rank_error(h, data, QS) < 0.02


def test_kll_merge_within_bound():
    from webscraping_ray.stages.sketch import KLLQuantiles

    rng = np.random.default_rng(17)
    shards = [rng.normal(s, 1, 20_000) for s in range(5)]
    acc = KLLQuantiles(k=200)
    for i, s in enumerate(shards):
        part = KLLQuantiles(k=200, seed=100 + i)
        part.add(s)
        acc.merge(part)
    data = np.concatenate(shards)
    assert acc.n == len(data)
    assert _rank_error(acc, data, QS) < 0.025


def test_kll_constant_and_tiny_streams():
    from webscraping_ray.stages.sketch import KLLQuantiles

    h = KLLQuantiles(k=8)
    h.add([7.0] * 5000)
    assert h.quantile(0.01) == h.quantile(0.99) == 7.0
    t = KLLQuantiles()
    t.add([3.0, 1.0, 2.0])
    assert t.quantile(0.5) == 2.0
    with pytest.raises(ValueError):
        KLLQuantiles().quantile(0.5)
    with pytest.raises(ValueError):
        t.quantile(1.5)


def test_kll_roundtrip_table():
    from webscraping_ray.stages.sketch import KLLQuantiles

    rng = np.random.default_rng(23)
    h = KLLQuantiles(k=64)
    h.add(rng.uniform(0, 10, 50_000))
    t = h.to_table()
    h2 = KLLQuantiles.from_table(t, k=64)
    assert h2.n == h.n
    for q in QS:
        assert h2.quantile(q) == h.quantile(q)


def test_approx_quantiles_dataset_vs_exact(ray_session):
    """Sketch quantiles of the events value column vs exact numpy
    quantiles — rank error under 2.5%."""
    from webscraping_ray.pipelines.relational import _read
    from webscraping_ray.stages.sketch import approx_quantiles
    import pyarrow.parquet as pq

    sf = '/root/testdata/sf0.001'
    vals = np.sort(pq.read_table(f'{sf}/events.parquet',
                                 columns=['value'])
                   .column('value').to_numpy(zero_copy_only=False))
    got = approx_quantiles(_read(sf, 'events', ['value']), 'value', QS)
    n = len(vals)
    for q, est in zip(QS, got):
        r = np.searchsorted(vals, est, side='right') / n
        assert abs(r - q) < 0.025


def test_kll_all_from_table_parses_coalesced_blocks():
    """Ray coalesces consecutive map outputs into one block; a block
    holding TWO serialized summaries must parse as two sketches (the
    positional parser took n from the first row only)."""
    import numpy as np
    import pyarrow as pa

    from webscraping_ray.stages.sketch import KLLQuantiles

    h1 = KLLQuantiles(50)
    h1.add(np.arange(100, dtype=np.float64))
    h2 = KLLQuantiles(50)
    h2.add(np.arange(100, 200, dtype=np.float64))
    spliced = pa.concat_tables([h1.to_table(), h2.to_table()])
    parts = KLLQuantiles.all_from_table(spliced, 50)
    assert len(parts) == 2
    assert sorted(p.n for p in parts) == [100, 100]
    acc = KLLQuantiles(50)
    for p in parts:
        acc.merge(p)
    assert acc.n == 200
    assert 80 <= acc.quantile(0.5) <= 120


def test_heavy_hitters_count_empty_summary_blocks(ray_session, tmp_path):
    """A block with more than `capacity` distinct equal-count tokens
    flushes its Misra-Gries summary EMPTY — its token total must still
    count, or the HAVING cutoff drops and borderline tokens become
    false heavy hitters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import heavy_hitter_tokens

    # 200x 'hot', 7x 'warm', 301 unique singletons; one token per doc.
    # capacity=4, batch_size=100: the three all-singleton batches
    # flush empty.  Exact: total=508 -> only hot (200*50 > 508);
    # dropping the empty batches' 208 tokens gave total=300 and
    # 'warm' (7*50=350 > 300) leaked in.
    texts = ['hot'] * 200 + ['warm'] * 7 + ['u%d' % i for i in range(301)]
    pq.write_table(pa.table({
        'doc_id': pa.array(range(len(texts)), pa.int64()),
        'text': pa.array(texts, pa.string())}),
        str(tmp_path / 'documents.parquet'))
    out = heavy_hitter_tokens(str(tmp_path), denom=50, capacity=4,
                              batch_size=100)
    assert out.column('token').to_pylist() == ['hot']
    assert out.column('n').to_pylist() == [200]
