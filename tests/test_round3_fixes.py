"""Regression tests for the round-3 correctness fixes (ADVICE round 2):

1. big-wave fetch tier applies max_age freshness (crawl.py merge loop)
2. distributed wave tier resolves latest-snapshot-per-url
3. max_links trim fires for exactly-at-cap parents (post-break
   candidates must not be seen-registered)
4. combo packing is wave-local (no int64 overflow past 2^31 visits)
5. ParquetQueue reopen derives next_seg/next_seq from disk (a restored
   older claims manifest must never overwrite live segments)
"""

import json
import os
import shutil

import pyarrow as pa
import pytest

from webscraping_ray.oracle.refcrawl import crawl_oracle
from webscraping_ray.pipelines.crawl import Crawler
from webscraping_ray.pipelines.frontier import ParquetQueue
from webscraping_ray.sources import corpus, store


def _store_from_table(tbl: pa.Table, root: str, num_buckets: int = 4):
    import ray.data

    store.write_corpus(ray.data.from_arrow(tbl), root,
                       num_buckets=num_buckets)
    return store.CorpusStore(root)


def _seeds(as_dict, k=3):
    urls = sorted(as_dict)
    seen_hosts, seeds = set(), []
    for u in urls:
        h = u.split('/')[2]
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(u)
        if len(seeds) == k:
            break
    return seeds


META_COLS = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']


def test_big_wave_applies_max_age(ray_session, tmp_path):
    """A stale-only url must be a cache miss (404) on the big-wave
    lookup_ds tier exactly as on the inline tier — same crawl config,
    same results at any wave size."""
    tbl = corpus.pages_table(200, n_hosts=4, seed=13)
    ts = tbl.column('warc_ts').to_pylist()
    cut = sorted(ts)[len(ts) // 2]
    cut_us = int(cut.timestamp() * 1_000_000)
    now_us = max(int(t.timestamp() * 1_000_000) for t in ts) + 1
    fresh_dict = {u: h for u, h, t in zip(tbl.column('url').to_pylist(),
                                          tbl.column('html').to_pylist(), ts)
                  if int(t.timestamp() * 1_000_000) > cut_us}
    assert 0 < len(fresh_dict) < tbl.num_rows
    seeds = _seeds({u: None for u in tbl.column('url').to_pylist()})
    oracle_visits, _ = crawl_oracle(fresh_dict, seeds, max_depth=3,
                                    max_links=10)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    kw = dict(max_depth=3, max_links=10, now_ts=now_us,
              max_age_us=now_us - cut_us)
    # inline_threshold=table_threshold=0 forces every wave through the
    # big-wave (lookup_ds + driver merge) tier
    visits = Crawler(cs, inline_threshold=0, table_threshold=0, **kw).run(seeds)
    got = visits.to_pylist()
    assert len(got) == len(oracle_visits)
    for g, o in zip(got, oracle_visits):
        assert (g['url'], g['depth'], g['status']) == \
            (o['url'], o['depth'], o['status'])
        assert g['text'] == o['text']


def test_distributed_wave_latest_snapshot(ray_session, tmp_path):
    """Multi-snapshot corpus through the distributed resolve tier: one
    row per url (the latest snapshot), identical visit metadata to the
    driver fold, and the pages parquet must not contain duplicates."""
    import glob

    import pyarrow.parquet as pq

    tbl = corpus.pages_table(400, n_hosts=4, seed=9, snapshot_frac=0.3)
    urls = tbl.column('url').to_pylist()
    assert len(urls) > len(set(urls)), 'fixture has no duplicate snapshots'
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    assert cs.multi_snapshot, 'build-time snapshot detection failed'
    as_dict = dict(zip(urls, tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict, k=2)
    kw = dict(max_depth=3, max_links=100)
    v_driver = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    out = str(tmp_path / 'out')
    c_dist = Crawler(cs, resolve_distributed_threshold=2,
                     output_dir=out, **kw)
    c_dist.resolve_metadata_limit = 0     # force the full distributed tier
    v_dist = c_dist.run(seeds)
    assert v_dist.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()
    files = glob.glob(out + '/wave_*_pages/*.parquet')
    assert files
    written = pa.concat_tables([pq.read_table(f, columns=['url', 'text'])
                                for f in files])
    w_urls = written.column('url').to_pylist()
    assert len(w_urls) == len(set(w_urls)), \
        'distributed pages output contains duplicate snapshots'
    # and the surviving snapshot is the LATEST one (its text carries
    # the updated-snapshot marker for re-snapshotted urls)
    expect = {r['url']: r['text'] for r in
              v_driver.select(['url', 'text']).to_pylist()}
    for u, txt in zip(w_urls, written.column('text').to_pylist()):
        assert expect[u] == txt, u


def test_single_snapshot_store_skips_resolution(ray_session, tmp_path):
    tbl = corpus.pages_table(50, n_hosts=2, seed=5)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    assert cs.multi_snapshot is False


def _handcrafted_capbreak_corpus():
    """Link graph reproducing the exactly-at-cap divergence:

    P0 (host a) links A1, A2 (valid, = cap) then X on host b (invalid
    from a).  P1 (host b) links X (valid from b).  The driver fold
    breaks at A2 and never registers X, so P1 emits it; a distributed
    tier that only trims parents OVER the cap registers X under P0 and
    suppresses it forever.
    """
    def page(links, title):
        body = ''.join('<a href="%s">l</a>' % l for l in links)
        return ('<html><head><title>%s</title></head><body>%s</body></html>'
                % (title, body)).encode()

    A = 'http://a.example.com'
    B = 'http://b.example.com'
    pages = {
        A + '/seed': page([A + '/p0'], 'seedA'),
        B + '/seed': page([B + '/p1'], 'seedB'),
        A + '/p0': page([A + '/a1', A + '/a2', B + '/x'], 'p0'),
        B + '/p1': page([B + '/x'], 'p1'),
        A + '/a1': page([], 'a1'),
        A + '/a2': page([], 'a2'),
        B + '/x': page([], 'x'),
    }
    return pages, [A + '/seed', B + '/seed']


def test_distributed_max_links_exact_cap(ray_session, tmp_path):
    pages, seeds = _handcrafted_capbreak_corpus()
    base = corpus.BASE_TS_US
    tbl = pa.table({
        'url': pa.array(sorted(pages), pa.string()),
        'warc_ts': pa.array([base + i for i in range(len(pages))],
                            pa.timestamp('us')),
        'html': pa.array([pages[u] for u in sorted(pages)], pa.binary()),
    })
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'), num_buckets=2)
    kw = dict(max_depth=4, max_links=2)
    oracle_visits, _ = crawl_oracle(pages, seeds, **kw)
    v_driver = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    c_dist = Crawler(cs, resolve_distributed_threshold=1, **kw)
    c_dist.resolve_metadata_limit = 0     # the trim lives in the full tier
    v_dist = c_dist.run(seeds)
    # and the metadata-fold tier must agree as well
    v_meta = Crawler(cs, resolve_distributed_threshold=1, **kw).run(seeds)
    assert v_meta.select(META_COLS).to_pylist() == \
        v_dist.select(META_COLS).to_pylist()
    # the oracle must actually visit X (sanity: the scenario bites)
    assert any(v['url'].endswith('/x') for v in oracle_visits)
    assert [v['url'] for v in oracle_visits] == \
        v_driver.column('url').to_pylist()
    assert v_dist.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()


def test_distributed_combo_no_overflow_past_2_31(ray_session, tmp_path):
    """visit_counter past 2^31 (the 10^10-visit regime): the wave-local
    combo rebase keeps first-seen resolution exact where the old global
    packing would overflow int64."""
    ds = corpus.pages_dataset(600, n_hosts=4, seed=11, weight=1,
                              override_num_blocks=2)
    root = str(tmp_path / 'corpus')
    store.write_corpus(ds, root, num_buckets=2)
    cs = store.CorpusStore(root)
    cumw = corpus.host_cumweights(4)
    seeds, seen_h = [], set()
    for i in range(600):
        h = corpus.page_host_id(i, 11, cumw)
        if h not in seen_h:
            seen_h.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=3, max_links=100)
    big = 2**31 + 17
    c1 = Crawler(cs, table_threshold=10**9, **kw)
    c1.visit_counter = big
    v_driver = c1.run(seeds)
    c2 = Crawler(cs, resolve_distributed_threshold=4, **kw)
    c2.resolve_metadata_limit = 0         # combo packing is full-tier code
    c2.visit_counter = big
    v_dist = c2.run(seeds)
    assert v_dist.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()
    assert v_driver.column('visit_order').to_pylist()[0] == big


def test_mega_wave_chunked_identical(ray_session, tmp_path):
    """Spilled waves processed in tiny sub-chunks (driver memory
    O(chunk)) must replay byte-identical BFS order, depths, schedule
    and visit counters: the queue is a global seq-FIFO, so a chunk's
    discovered links pull after the wave's remaining keys."""
    from webscraping_ray.pipelines.crawl import crawl_bfs

    tbl = corpus.pages_table(300, n_hosts=6, seed=7)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict)
    plain = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)
    chunked = crawl_bfs(tbl, seeds, max_depth=3, max_links=10,
                        frontier_queue_dir=str(tmp_path / 'fq'),
                        frontier_spill_threshold=0, mega_wave_chunk=7)
    assert chunked.to_pylist() == plain.to_pylist()


def test_mega_wave_budget_no_stranded_keys(ray_session, tmp_path):
    """max_urls cutting into a spilled wave: the visited prefix equals
    the unchunked budgeted crawl, and the unvisited tail stays
    unclaimed in the queue (pullable later) instead of being claimed
    and dropped."""
    from webscraping_ray.pipelines.crawl import Crawler, crawl_bfs

    tbl = corpus.pages_table(300, n_hosts=6, seed=7)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)
    budget = full.num_rows // 2
    plain = crawl_bfs(tbl, seeds, max_depth=3, max_links=10,
                      max_urls=budget)
    qdir = str(tmp_path / 'fq')
    spilled = crawl_bfs(tbl, seeds, max_depth=3, max_links=10,
                        max_urls=budget, frontier_queue_dir=qdir,
                        frontier_spill_threshold=0, mega_wave_chunk=5)
    assert spilled.to_pylist() == plain.to_pylist()
    assert spilled.num_rows == budget
    # the tail of the wave the budget cut into is still unclaimed
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(qdir)
    leftover = q.pull(limit=10**6)
    assert leftover, 'budget-cut keys must stay pullable, not stranded'
    visited = set(spilled.column('url').to_pylist())
    for key in leftover:
        assert key.split('|', 1)[1] not in visited


def test_minhash_join_tier_equals_broadcast_tier(ray_session, monkeypatch):
    """Forcing the >limit Dataset-join tier (the 100-TB path) must give
    byte-identical pairs to the broadcast tier."""
    import ray.data

    from webscraping_ray.stages import dedup

    base = ('the quick brown fox jumps over the lazy dog while the '
            'crawler fetches pages and extracts text tokens for the '
            'training corpus pipeline at web scale')
    texts = [base, base, base.replace('lazy', 'sleepy'),
             'completely different tiny text',
             base.replace('quick', 'rapid'),
             'another unrelated document about databases']
    ds = ray.data.from_arrow(pa.table({
        'doc_id': pa.array(range(len(texts)), pa.int64()),
        'text': pa.array(texts, pa.string()),
    }))
    small = dedup.minhash_dup_pairs(ds, threshold=0.5)
    monkeypatch.setattr(dedup, 'BROADCAST_KEY_LIMIT', 0)
    monkeypatch.setattr(dedup, 'BROADCAST_DOC_LIMIT', 0)
    big = dedup.minhash_dup_pairs(ds, threshold=0.5)
    assert big.to_pylist() == small.to_pylist()
    assert small.num_rows > 0, 'fixture must contain near-dup pages'


def test_continuous_politeness_clock_matches_oracle(ray_session, tmp_path):
    """politeness_clock='continuous' (reference download.py:454-473
    single wall clock) must byte-match the continuous-clock vendored
    oracle, survive checkpoint/resume, and differ from frozen."""
    tbl = corpus.pages_table(300, n_hosts=6, seed=7)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict)
    kw = dict(max_depth=3, max_links=10)
    oracle_visits, _ = crawl_oracle(as_dict, seeds, clock='continuous', **kw)
    visits = Crawler(tbl, politeness_clock='continuous', **kw).run(seeds)
    got = visits.to_pylist()
    assert len(got) == len(oracle_visits)
    for g, o in zip(got, oracle_visits):
        assert g['url'] == o['url']
        assert g['scheduled_ts'] == o['scheduled_ts'], \
            (g['url'], g['scheduled_ts'], o['scheduled_ts'])
    # sanity: the two clock models actually diverge on this corpus
    frozen = Crawler(tbl, **kw).run(seeds)
    assert frozen.column('scheduled_ts').to_pylist() != \
        visits.column('scheduled_ts').to_pylist()
    # wave_start survives checkpoint/resume
    ckpt = str(tmp_path / 'ckpt')
    c1 = Crawler(tbl, politeness_clock='continuous', checkpoint_dir=ckpt,
                 **kw)
    part1 = c1.run(seeds, stop_after_wave=1)
    c2 = Crawler(tbl, politeness_clock='continuous', checkpoint_dir=ckpt,
                 **kw)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == visits.to_pylist()


def test_distributed_wave_asof_snapshot(ray_session, tmp_path):
    """as_of_ts + multi-snapshot corpus through the distributed tier:
    the as-of filter and latest-per-url resolution compose identically
    to the driver fold."""
    tbl = corpus.pages_table(400, n_hosts=4, seed=9, snapshot_frac=0.3)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict, k=2)
    cutoff = corpus.BASE_TS_US + 300 * 1_000_000   # before re-snapshots
    kw = dict(max_depth=3, max_links=100, as_of_ts=cutoff)
    v_driver = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    c_dist = Crawler(cs, resolve_distributed_threshold=2, **kw)
    c_dist.resolve_metadata_limit = 0
    v_dist = c_dist.run(seeds)
    assert v_dist.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()
    v_meta = Crawler(cs, resolve_distributed_threshold=2, **kw).run(seeds)
    assert v_meta.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()


def test_chunked_checkpoint_resume(ray_session, tmp_path):
    """Kill/resume mid-crawl with mega-wave chunking active: the queue
    claims watermark rewinds per chunk and the resumed crawl is
    byte-identical."""
    from webscraping_ray.pipelines.crawl import crawl_bfs

    tbl = corpus.pages_table(300, n_hosts=6, seed=7)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)
    kw = dict(max_depth=3, max_links=10,
              checkpoint_dir=str(tmp_path / 'ckpt'),
              frontier_queue_dir=str(tmp_path / 'fq'),
              frontier_spill_threshold=0, mega_wave_chunk=9)
    c1 = Crawler(tbl, **kw)
    part1 = c1.run(seeds, stop_after_wave=2)   # 3 chunk-waves, "killed"
    c2 = Crawler(tbl, **kw)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_chunked_distributed_resolve(ray_session, tmp_path):
    """Chunks of a spilled wave taking the DISTRIBUTED resolve tier
    (chunk > resolve threshold, all chunk rows preseen): identical
    visit metadata to the plain driver fold."""
    ds = corpus.pages_dataset(1000, n_hosts=6, seed=11, weight=1,
                              override_num_blocks=4)
    root = str(tmp_path / 'corpus')
    store.write_corpus(ds, root, num_buckets=4)
    cs = store.CorpusStore(root)
    cumw = corpus.host_cumweights(6)
    seeds, seen_h = [], set()
    for i in range(1000):
        h = corpus.page_host_id(i, 11, cumw)
        if h not in seen_h:
            seen_h.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=3, max_links=100)
    v_plain = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    c_chunk = Crawler(cs, resolve_distributed_threshold=10,
                      frontier_queue_dir=str(tmp_path / 'fq'),
                      frontier_spill_threshold=0, mega_wave_chunk=40,
                      **kw)
    c_chunk.resolve_metadata_limit = 0
    v_chunk = c_chunk.run(seeds)
    assert v_chunk.select(META_COLS).to_pylist() == \
        v_plain.select(META_COLS).to_pylist()


def test_queue_reopen_derives_counters_from_disk(tmp_path):
    """Restoring an older claims.json (crawl resume does this to rewind
    the claim watermark) must not rewind next_seg/next_seq: segments
    pushed after the snapshot stay intact and later pushes never
    overwrite them."""
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('k1', 0), ('k2', 0)])
    snap = str(tmp_path / 'claims_snapshot.json')
    shutil.copy(os.path.join(root, 'claims.json'), snap)
    q.push([('k3', 0), ('k4', 0)])          # post-snapshot segment
    segs_before = sorted(f for f in os.listdir(root) if f.startswith('seg_'))
    # simulate crawl resume: rewind the manifest to the snapshot
    shutil.copy(snap, os.path.join(root, 'claims.json'))
    q2 = ParquetQueue(root)
    with open(os.path.join(root, 'claims.json')) as f:
        st = json.load(f)
    assert q2._next_seg > max(int(s[4:-8]) for s in segs_before), \
        'next_seg must start past every segment on disk'
    q2.push([('k5', 0)])                    # must NOT overwrite seg_00001
    got = set(q2.pull(limit=10))
    assert got == {'k1', 'k2', 'k3', 'k4', 'k5'}, got


def test_snap_round_matches_duckdb_round_exactly():
    """Oracle float parity: ``pc.round`` preserves summation-order ulp
    drift (pc.round(199.42000000000002, 2) returns the input unchanged),
    so two sums differing only in reduction order hash differently in
    the driver's exact-value compare.  ``_snap_round`` must snap to the
    nearest representable double of the decimal, bit-identical to
    DuckDB's ``round(x, 2)`` on the values that actually occur: sums of
    2-decimal inputs, i.e. an exact 2-decimal value perturbed by a few
    ulps.  (True 3rd-decimal midpoints — where numpy's half-even and
    DuckDB's half-away diverge — cannot arise from such sums.)"""
    import duckdb
    import pyarrow as pa

    from webscraping_ray.pipelines.relational import _snap_round

    drifted = [199.42000000000002, 0.1 + 0.2, sum([7.11] * 3),
               -sum([0.07] * 5), 199.41999999999999, 0.0,
               sum([1234.56] * 7)]
    t = pa.table({'v': pa.array(drifted, pa.float64())})
    got = _snap_round(t, 'v')['v'].to_pylist()
    con = duckdb.connect()
    want = [con.sql(f'SELECT round(CAST({v!r} AS DOUBLE), 2)').fetchone()[0]
            for v in drifted]
    assert got == want, list(zip(drifted, got, want))
    # and the headline drift case actually snaps (pc.round would not)
    assert got[0] == 199.42


def test_per_key_groups_equals_naive_groupby(ray_session):
    """_per_key_groups (coarse-bucket shuffle + in-bucket pandas
    groupby) must emit exactly the rows of the naive per-key
    ds.groupby(key).map_groups for both int and string keys."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from webscraping_ray.pipelines.relational import _per_key_groups

    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        'k_int': pa.array(rng.integers(0, 137, n), pa.int64()),
        'k_str': pa.array(['u%d' % v for v in rng.integers(0, 91, n)],
                          pa.string()),
        'v': pa.array(rng.normal(size=n), pa.float64())})
    ds = ray.data.from_arrow(t).repartition(8)

    for key in ('k_int', 'k_str'):
        def per_key(g, key=key):
            return pd.DataFrame({
                key: [g[key].iloc[0]],
                'n': [len(g)],
                's': [round(float(np.sort(g['v'].to_numpy()).sum()), 9)]})

        a = (_per_key_groups(ds, key, per_key).to_pandas()
             .sort_values(key).reset_index(drop=True))
        b = (ds.groupby(key).map_groups(per_key, batch_format='pandas')
             .to_pandas().sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
