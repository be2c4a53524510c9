"""Round-4 additions: Dataset-returning graph-ranker surface pinned
equal to the table surface, IVF training-sample order determinism,
and the ADVICE r3 regression fixes (null group keys, exact Int64
as-of ffill, bigram tier threshold counting only bigram rows)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscraping_ray.pipelines import relational as R

SF = '/root/testdata/sf0.001'


def _canon(obj) -> pd.DataFrame:
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        obj = obj.to_pandas()
    elif isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    df = obj[sorted(obj.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Dataset-returning ranker surface == table surface

def test_pagerank_ds_matches_table(ray_session):
    table = _canon(R.pagerank(SF))
    ds = _canon(R.pagerank(SF, as_dataset=True))
    pd.testing.assert_frame_equal(ds, table, check_dtype=False)


def test_hits_ds_matches_table(ray_session):
    table = _canon(R.hits(SF))
    ds = _canon(R.hits(SF, as_dataset=True))
    pd.testing.assert_frame_equal(ds, table, check_dtype=False)


def test_graph_bsp_shard_count_invariant(ray_session):
    """The BSP engine's output is identical at any shard count (and at
    P=1, where the num_returns plumbing degenerates) — the two-level
    fold association order is pinned by crc buckets, not by P."""
    from webscraping_ray.stages.graph_bsp import hits_bsp, pagerank_bsp

    eds = R._pagerank_edges(SF)
    want_pr = _canon(pagerank_bsp(eds, 3, 0.85, num_shards=8))
    want_hits = _canon(hits_bsp(eds, 3, num_shards=8))
    for p in (1, 3):
        pd.testing.assert_frame_equal(
            _canon(pagerank_bsp(eds, 3, 0.85, num_shards=p)), want_pr,
            check_dtype=False)
        pd.testing.assert_frame_equal(
            _canon(hits_bsp(eds, 3, num_shards=p)), want_hits,
            check_dtype=False)


def test_inlink_anchors_ds_round_trip(ray_session, tmp_path):
    direct = _canon(R.inlink_anchors(SF))
    via_parquet = _canon(R.inlink_anchors_ds(SF, str(tmp_path / 'out')))
    pd.testing.assert_frame_equal(via_parquet, direct, check_dtype=False)


# ---------------------------------------------------------------------------
# IVF: training sample (and therefore centroids) independent of block
# layout — the k-means means sum floats in sample-row order, so the
# sample must arrive sorted by reservoir key, not by block arrival

def test_ivf_centroids_layout_independent(ray_session):
    from webscraping_ray.pipelines.relational import _read
    from webscraping_ray.stages.similarity import ivf_build

    ds = _read(SF, 'embeddings', ['vec_id', 'embedding'])
    c1, _ = ivf_build(ds, n_clusters=8)
    c2, _ = ivf_build(ds.repartition(7), n_clusters=8)
    c3, _ = ivf_build(ds.repartition(3), n_clusters=8)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(c1, c3)


def test_knn_ivf_recall_gate_passes(ray_session):
    t = R.knn_ivf_recall(SF)
    assert t.column('recall_ok').to_pylist() == [1] * 8


# ---------------------------------------------------------------------------
# sketch quality gates (the oracle-parametrized test also covers these
# at sf0.001; assert the semantic core here explicitly)

def test_heavy_hitter_tokens_equal_exact(ray_session):
    import collections
    import re

    got = {(tok, n) for tok, n in
           zip(R.heavy_hitter_tokens(SF).column('token').to_pylist(),
               R.heavy_hitter_tokens(SF).column('n').to_pylist())}
    tokre = re.compile(r'\w+', re.UNICODE)
    c: collections.Counter = collections.Counter()
    for txt in pq.read_table(f'{SF}/documents.parquet',
                             columns=['text']).column('text').to_pylist():
        c.update(tokre.findall((txt or '').lower()))
    total = sum(c.values())
    want = {(t_, n) for t_, n in c.items() if n * 50 > total}
    assert got == want and got


def test_hll_user_counts_within_bound(ray_session):
    t = R.hll_user_counts(SF)
    assert t.num_rows > 0
    assert set(t.column('within_bound').to_pylist()) == {1}


def test_kll_token_quantiles_within_bound(ray_session):
    t = R.kll_token_quantiles(SF)
    assert t.column('within_bound').to_pylist() == [1] * 5


# ---------------------------------------------------------------------------
# ADVICE r3 regression fixes

def test_per_key_groups_keeps_null_keys(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({
        'k': pa.array(['a', None, 'a', None], pa.string()),
        'v': pa.array([1, 2, 3, 4], pa.int64())}))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({'n': [len(g)], 's': [int(g['v'].sum())]})

    out = R._per_key_groups(ds, 'k', agg).to_pandas()
    # both the 'a' group AND the null-key group must appear
    assert sorted(zip(out['n'], out['s'])) == [(2, 4), (2, 6)]


def test_write_csv_unique_keeps_null_keys(ray_session, tmp_path):
    import ray

    from webscraping_ray.pipelines.frontier import write_csv_unique

    ds = ray.data.from_arrow(pa.table({
        'k': pa.array(['a', None, 'a', None], pa.string()),
        'v': pa.array([1, 2, 3, 4], pa.int64())}))
    out_dir = write_csv_unique(ds, str(tmp_path / 'csv'),
                               unique_by=['k'], order_col='v')
    import glob

    rows = pd.concat([pd.read_csv(f, keep_default_na=False,
                                  na_values=[])
                      for f in glob.glob(out_dir + '/*.csv')])
    # one row per key VALUE including the null key (first by v)
    assert len(rows) == 2
    assert sorted(rows['v'].tolist()) == [1, 2]


def test_events_asof_ffill_exact_above_2_53(ray_session, tmp_path):
    """Purchase ids above 2^53 must survive the as-of forward-fill
    exactly (a float64 ffill would round them)."""
    big = (1 << 53) + 1
    sf = tmp_path / 'sf'
    sf.mkdir()
    t = pa.table({
        'event_id': pa.array([big, big + 2], pa.int64()),
        'ts': pa.array(
            pd.to_datetime(['2024-01-01 00:00:00',
                            '2024-01-01 01:00:00']).astype('datetime64[us]')),
        'user_id': pa.array([7, 7], pa.int64()),
        'event_type': pa.array(['purchase', 'click'], pa.string()),
        'value': pa.array([5.0, 1.0], pa.float64())})
    pq.write_table(t, f'{sf}/events.parquet')
    out = R.events_asof_match(str(sf)).to_pandas()
    assert out['matched_purchase_id'].tolist() == [big]


def test_bigram_tier_counts_only_bigram_rows(ray_session, monkeypatch):
    """The broadcast/join auto-switch is documented as a limit on
    BIGRAM entries: with the limit set between the bigram count and
    the combined uni+bigram count, the broadcast tier must be chosen
    (the old code compared the combined count and flipped early)."""
    import duckdb

    n_b, n_u = duckdb.sql(f"""
        WITH toks AS (
          SELECT regexp_extract_all(lower(text), '\\w+') AS ts
          FROM '{SF}/documents.parquet'),
        bi AS (SELECT DISTINCT unnest(list_transform(
                 range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS g
               FROM toks WHERE len(ts) >= 2),
        uni AS (SELECT DISTINCT unnest(ts) AS g FROM toks)
        SELECT (SELECT count(*) FROM bi), (SELECT count(*) FROM uni)
    """).fetchone()
    assert n_b > 0 and n_u > 0
    monkeypatch.setattr(R, 'BIGRAM_BROADCAST_LIMIT', n_b + n_u // 2)

    def boom(*a, **k):
        raise AssertionError('join tier chosen below the bigram limit')

    monkeypatch.setattr(R, '_bigram_logprob_join', boom)
    out = R.bigram_logprob(SF).to_pandas()
    assert len(out) > 0


# ---------------------------------------------------------------------------
# cluster-aware resolve tier + mega-wave link-pull split

def test_resolve_limit_auto_and_override(ray_session):
    from webscraping_ray.pipelines import crawl as C

    c = C.Crawler({})
    auto = c._resolve_limit()
    import ray

    ncpus = int(ray.cluster_resources().get('CPU', 8))
    assert auto == min(C.RESOLVE_METADATA_MEM_CAP,
                       C.RESOLVE_METADATA_WORK // ncpus)
    c.resolve_metadata_limit = 0
    assert c._resolve_limit() == 0
    c.resolve_metadata_limit = 123
    assert c._resolve_limit() == 123


def test_metadata_fold_link_split_identical(ray_session, tmp_path,
                                            monkeypatch):
    """Forcing the mega-wave path (winner links fetched by broadcast-
    hash filter instead of riding the serial pull) must keep visits,
    frontier and edges byte-identical to the inline-link pull."""
    from webscraping_ray.pipelines import crawl as C
    from webscraping_ray.pipelines.crawl import Crawler
    from webscraping_ray.sources import corpus, store

    root = str(tmp_path / 'corpus')
    ds = corpus.pages_dataset(1500, n_hosts=8, seed=11, weight=1,
                              override_num_blocks=4)
    store.write_corpus(ds, root, num_buckets=4)
    cs = store.CorpusStore(root)
    cumw = corpus.host_cumweights(8)
    seeds, seen_h = [], set()
    for i in range(1500):
        h = corpus.page_host_id(i, 11, cumw)
        if h not in seen_h:
            seen_h.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=3, max_links=100, num_seen_shards=4,
              resolve_distributed_threshold=20)
    cols = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']
    v_inline = Crawler(cs, **kw).run(seeds)
    monkeypatch.setattr(C, 'RESOLVE_LINK_PULL_INLINE', 0)
    v_split = Crawler(cs, **kw).run(seeds)
    assert (v_split.select(cols).to_pylist()
            == v_inline.select(cols).to_pylist())


# ---------------------------------------------------------------------------
# round-4 continuation: CCNet perplexity bucketing + domain-level filter

def test_perplexity_buckets_tiers_equal(ray_session):
    base = _canon(R.perplexity_buckets(SF))
    join = _canon(R.perplexity_buckets(SF, force_join=True))
    pd.testing.assert_frame_equal(join, base, check_dtype=False)


def test_perplexity_buckets_tile_sizes(ray_session):
    """NTILE semantics: per lang the first n%3 tiles hold ceil(n/3)
    docs, the rest floor(n/3); head ce <= middle ce <= tail ce."""
    df = R.perplexity_buckets(SF).to_pandas()
    for lang, g in df.groupby('lang'):
        n = len(g)
        q, r = divmod(n, 3)
        sizes = g['tile'].value_counts().sort_index().tolist()
        want = [q + 1] * r + [q] * (3 - r)
        assert sizes == [s for s in want if s], (lang, sizes, want)
        assert g[g.bucket == 'head'].ce.max() <= \
            g[g.bucket == 'middle'].ce.min() + 1e-12
        assert g[g.bucket == 'middle'].ce.max() <= \
            g[g.bucket == 'tail'].ce.min() + 1e-12


def test_ntile_small_groups(ray_session):
    """n < tiles: every doc lands in its own (fat) tile, no div-zero."""
    import ray

    from webscraping_ray.pipelines.relational import _ntile_by_lang

    scored = ray.data.from_arrow(pa.table({
        'doc_id': pa.array([1, 2], pa.int64()),
        'lang': pa.array(['xx', 'xx'], pa.string()),
        'ce': pa.array([1.5, 0.5], pa.float64())}))
    out = _ntile_by_lang(scored, 3).to_pandas().sort_values('doc_id')
    assert out['tile'].tolist() == [2, 1]
    assert out['bucket'].tolist() == ['middle', 'head']


def test_source_quality_filter_tiers_equal(ray_session):
    base = _canon(R.source_quality_filter(SF))
    join = _canon(R.source_quality_filter(SF, force_join=True))
    pd.testing.assert_frame_equal(join, base, check_dtype=False)
    assert len(base) > 0


def test_host_pagerank_tiers_equal(ray_session, monkeypatch):
    """Driver fold vs _pagerank_dataset tier on the same host graph —
    both use ascending-sorted contribution folds, so the 6dp-rounded
    ranks must agree exactly."""
    want = _canon(R.host_pagerank(SF))
    monkeypatch.setattr(R, 'PAGERANK_DRIVER_EDGE_LIMIT', 0)
    got = _canon(R.host_pagerank(SF))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) >= 8  # all 8 synthetic hosts present


def test_winnow_matches_naive(ray_session, tmp_path):
    """Vectorized winnowing == the textbook per-window loop, including
    the <k and <window edge tiers."""
    texts = ['', 'ab', 'abcdefg',              # < k: whole-string hash
             'abcdefghij',                     # grams but <= window
             'the quick brown fox jumps over the lazy dog ' * 8,
             'aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa']  # constant grams
    pq.write_table(pa.table({
        'doc_id': pa.array(range(len(texts)), pa.int64()),
        'text': pa.array(texts, pa.string())}),
        str(tmp_path / 'documents.parquet'))
    got = (R.winnow_fingerprints(str(tmp_path)).to_pandas()
           .sort_values(['doc_id', 'fp']).reset_index(drop=True))

    B, M, k, w = 1_000_003, (1 << 31) - 1, 8, 16

    def naive(s):
        if len(s) < k:
            h = 0
            for ch in s:
                h = (h * B + ord(ch)) % M
            return {h}
        hs = []
        for i in range(len(s) - k + 1):
            h = 0
            for ch in s[i:i + k]:
                h = (h * B + ord(ch)) % M
            hs.append(h)
        if len(hs) <= w:
            return {min(hs)}
        return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    want = []
    for did, s in enumerate(texts):
        want.extend((did, f) for f in sorted(naive(s)))
    assert list(map(tuple, got[['doc_id', 'fp']].itertuples(
        index=False))) == want


def test_rfm_quintiles_balanced(ray_session):
    t = R.rfm_scores(SF).to_pandas()
    assert len(t) > 0 and t['user_id'].is_unique
    for c in ('r_score', 'f_score', 'm_score'):
        vc = t[c].value_counts()
        assert set(vc.index) <= {1, 2, 3, 4, 5}
        assert vc.max() - vc.min() <= 1  # exact rank arithmetic
    assert (t['rfm'] == 100 * t['r_score'] + 10 * t['f_score']
            + t['m_score']).all()


def test_top_volume_orders_matches_naive(ray_session):
    li = pq.read_table(f'{SF}/lineitem.parquet').to_pandas()
    orders = pq.read_table(f'{SF}/orders.parquet').to_pandas()
    cust = pq.read_table(f'{SF}/customer.parquet').to_pandas()
    qty = (li.assign(q=np.floor(li['l_quantity'] + 0.5).astype('int64'))
           .groupby('l_orderkey', as_index=False)['q'].sum())
    heavy = qty[qty['q'] > 300]
    j = (heavy.merge(orders, left_on='l_orderkey', right_on='o_orderkey')
         .merge(cust, left_on='o_custkey', right_on='c_custkey')
         .sort_values(['o_totalprice', 'o_orderkey'],
                      ascending=[False, True]).head(100))
    got = R.top_volume_orders(SF).to_pandas()
    assert got['o_orderkey'].tolist() == j['o_orderkey'].tolist()
    assert got['sum_qty'].tolist() == j['q'].tolist()
    assert got['c_name'].tolist() == j['c_name'].tolist()


def test_events_anomaly_window_contract(ray_session):
    t = R.events_anomaly(SF).to_pandas()
    # 30 days of synthetic events, 7-day trailing window → ≤ 23 rows,
    # every row needs a full window
    assert 0 < len(t) <= 23
    assert t['day'].is_monotonic_increasing
    assert np.isfinite(t['z']).all()
