"""Crawl engine vs the sequential oracle: identical visit order, depths,
byte-identical text, identical outstanding links and politeness
schedule — at any parallelism; plus checkpoint/resume equality."""

import pyarrow as pa
import pytest

from webscraping_ray.oracle.refcrawl import crawl_oracle
from webscraping_ray.pipelines.crawl import Crawler, crawl_bfs
from webscraping_ray.sources import corpus


N_PAGES = 300
N_HOSTS = 6


@pytest.fixture(scope="module")
def small_corpus():
    tbl = corpus.pages_table(N_PAGES, n_hosts=N_HOSTS, seed=7)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    return tbl, as_dict


def seeds_for(as_dict, k=3):
    urls = sorted(as_dict)
    # one seed per distinct host, first k hosts
    seen_hosts, seeds = set(), []
    for u in urls:
        h = u.split('/')[2]
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(u)
        if len(seeds) == k:
            break
    return seeds


def assert_matches_oracle(visits: pa.Table, oracle_visits):
    got = visits.to_pylist()
    assert len(got) == len(oracle_visits), (
        f'visit count {len(got)} != oracle {len(oracle_visits)}')
    for g, o in zip(got, oracle_visits):
        assert g['url'] == o['url'], (g['visit_order'], g['url'], o['url'])
        assert g['depth'] == o['depth'], (g['url'], g['depth'], o['depth'])
        assert g['visit_order'] == o['visit_order']
        assert g['status'] == o['status']
        assert g['text'] == o['text'], f'text mismatch at {g["url"]}'
        assert g['links'] == o['links'], f'links mismatch at {g["url"]}'
        assert g['scheduled_ts'] == o['scheduled_ts'], (
            g['url'], g['scheduled_ts'], o['scheduled_ts'])


@pytest.mark.parametrize("max_depth,max_links", [(1, 100), (2, 100), (2, 3), (3, 5)])
def test_crawl_matches_oracle(ray_session, small_corpus, max_depth, max_links):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    oracle_visits, oracle_found = crawl_oracle(
        as_dict, seeds, max_depth=max_depth, max_links=max_links)
    visits = crawl_bfs(tbl, seeds, max_depth=max_depth, max_links=max_links,
                       use_ray=True)
    assert_matches_oracle(visits, oracle_visits)


def test_crawl_deterministic_across_batch_sizes(ray_session, small_corpus):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    v1 = crawl_bfs(tbl, seeds, max_depth=2, batch_size=16, num_seen_shards=2)
    v2 = crawl_bfs(tbl, seeds, max_depth=2, batch_size=512, num_seen_shards=8)
    assert v1.to_pylist() == v2.to_pylist()


def test_crawl_seen_set_matches_oracle(ray_session, small_corpus):
    import numpy as np
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    oracle_visits, oracle_found = crawl_oracle(as_dict, seeds, max_depth=2)
    c = Crawler(tbl, max_depth=2)
    c.run(seeds)
    engine_keys = set()
    for _, _, blob in c.seen.snapshots():
        engine_keys |= set(np.frombuffer(blob, dtype=np.uint64).tolist())
    oracle_keys = {np.uint64(k).item() if k >= 0 else np.uint64(k + (1 << 64)).item()
                   for k in oracle_found}
    oracle_keys = {int(np.uint64(k)) for k in
                   (np.array(list(oracle_found), dtype=np.int64).astype(np.uint64))}
    assert engine_keys == oracle_keys


def test_crawl_banned_allowed_regex(ray_session, small_corpus):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    kw = dict(max_depth=2, banned_urls=r'.*/p/1\d$')
    oracle_visits, _ = crawl_oracle(as_dict, seeds, **kw)
    visits = crawl_bfs(tbl, seeds, use_ray=True, **kw)
    assert_matches_oracle(visits, oracle_visits)


def test_crawl_robots(ray_session, small_corpus):
    class BlockOdd:
        def can_fetch(self, agent, url):
            return not url.rstrip('/').endswith(('1', '3', '5', '7', '9'))
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    oracle_visits, _ = crawl_oracle(as_dict, seeds, max_depth=2, robots=BlockOdd())
    visits = crawl_bfs(tbl, seeds, max_depth=2, robots=BlockOdd())
    assert_matches_oracle(visits, oracle_visits)


def test_checkpoint_resume_identical(ray_session, small_corpus, tmp_path):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)

    ckpt = str(tmp_path / 'ckpt')
    c1 = Crawler(tbl, max_depth=3, max_links=10, checkpoint_dir=ckpt)
    part1 = c1.run(seeds, stop_after_wave=1)  # waves 0..1, then "killed"
    c2 = Crawler(tbl, max_depth=3, max_links=10, checkpoint_dir=ckpt)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_spill_frontier_identical(ray_session, small_corpus, tmp_path):
    """Frontier spilled through the durable ParquetQueue every wave
    (threshold 0) must replay exact BFS order — byte-identical visits
    to the in-memory frontier path."""
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    plain = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)
    spilled = crawl_bfs(tbl, seeds, max_depth=3, max_links=10,
                        frontier_queue_dir=str(tmp_path / 'fq'),
                        frontier_spill_threshold=0)
    assert spilled.to_pylist() == plain.to_pylist()


def test_spill_frontier_checkpoint_resume(ray_session, small_corpus, tmp_path):
    """Kill/resume with the frontier living in the spill queue: the
    claims watermark rewinds so the in-flight wave replays exactly."""
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)

    ckpt = str(tmp_path / 'ckpt')
    qdir = str(tmp_path / 'fq')
    kw = dict(max_depth=3, max_links=10, checkpoint_dir=ckpt,
              frontier_queue_dir=qdir, frontier_spill_threshold=0)
    c1 = Crawler(tbl, **kw)
    part1 = c1.run(seeds, stop_after_wave=1)
    c2 = Crawler(tbl, **kw)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_distributed_wave_resolve_identical(ray_session, tmp_path):
    """Waves above table_threshold take the fully distributed resolve
    (no driver-side text/candidate materialization).  Visit metadata
    must be identical to the driver fold, and the per-wave pages
    parquet must hold the byte-identical text."""
    import glob

    import pyarrow.parquet as pq
    from webscraping_ray.sources import store

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
    kw = dict(max_depth=3, max_links=100, num_seen_shards=4)
    v_driver = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    out = str(tmp_path / 'out')
    c_dist = Crawler(cs, resolve_distributed_threshold=20,
                     output_dir=out, **kw)
    c_dist.resolve_metadata_limit = 0      # force the FULL distributed tier
    v_dist = c_dist.run(seeds)
    cols = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']
    assert v_dist.select(cols).to_pylist() == v_driver.select(cols).to_pylist()
    # the middle (metadata-fold) tier must be identical too
    c_meta = Crawler(cs, resolve_distributed_threshold=20, **kw)
    assert c_meta._resolve_limit() > 0
    v_meta = c_meta.run(seeds)
    assert v_meta.select(cols).to_pylist() == v_driver.select(cols).to_pylist()
    # distributed waves write text to parquet instead of returning it
    files = glob.glob(out + '/wave_*_pages/*.parquet')
    assert files, 'distributed waves must write page output'
    written = pa.concat_tables([pq.read_table(f) for f in files])
    expect = {r['url']: r['text'] for r in
              v_driver.select(['url', 'text']).to_pylist()}
    for r in written.select(['url', 'text']).to_pylist():
        assert expect[r['url']] == r['text'], r['url']
    # edges written per wave; visits metadata parquet matches return
    assert glob.glob(out + '/wave_*_edges')
    vfiles = sorted(glob.glob(out + '/wave_*_visits.parquet'))
    assert vfiles


def test_crawl_politeness_budget(ray_session, small_corpus):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    visits = crawl_bfs(tbl, seeds, max_depth=2, delay=5.0)
    by_host = {}
    for r in visits.to_pylist():
        by_host.setdefault(r['url'].split('/')[2], []).append(r['scheduled_ts'])
    for host, ts in by_host.items():
        ts = sorted(ts)
        for a, b in zip(ts, ts[1:]):
            assert b - a >= 5.0 - 1e-9, f'politeness violated on {host}'


def test_crawl_meta_redirects(ray_session):
    """Meta-refresh chase (reference download.py:254-268): engine vs
    oracle with num_redirects=2 over a corpus with redirect pages."""
    tbl = corpus.pages_table(400, n_hosts=5, seed=3)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    # ensure the fixture actually contains meta-refresh pages
    n_redir = sum(1 for h in as_dict.values() if b'http-equiv="refresh"' in h)
    assert n_redir > 0, 'fixture has no redirect pages; adjust seed'
    seeds = seeds_for(as_dict, k=3)
    kw = dict(max_depth=3, max_links=50, num_redirects=2)
    oracle_visits, _ = crawl_oracle(as_dict, seeds, **kw)
    visits = crawl_bfs(tbl, seeds, **kw)
    got = visits.to_pylist()
    assert len(got) == len(oracle_visits)
    for g, o in zip(got, oracle_visits):
        assert g['url'] == o['url']
        assert g['final_url'] == o['final_url'], (g['url'], g['final_url'], o['final_url'])
        assert g['text'] == o['text'], f'text mismatch at {g["url"]}'
        assert g['links'] == o['links'], f'links mismatch at {g["url"]}'
    # some visit actually followed a redirect
    assert any(g['final_url'] != g['url'] for g in got)


def test_crawl_asof_snapshots(ray_session):
    """Multi-snapshot corpus: the fetch resolves the latest snapshot per
    url (and as_of_ts selects the older one) — SURVEY §2.4 as-of."""
    tbl = corpus.pages_table(200, n_hosts=4, seed=9, snapshot_frac=0.3)
    # compare timestamps in int microseconds (arrow gives naive datetimes)
    import datetime as _dt

    def us(ts):
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
    urls = tbl.column('url').to_pylist()
    assert len(urls) > len(set(urls)), 'fixture has no duplicate snapshots'
    # oracle dict: latest snapshot per url
    latest = {}
    for u, ts, h in zip(urls, tbl.column('warc_ts').to_pylist(),
                        tbl.column('html').to_pylist()):
        if u not in latest or us(ts) >= latest[u][0]:
            latest[u] = (us(ts), h)
    as_dict = {u: h for u, (ts, h) in latest.items()}
    seeds = seeds_for(as_dict, k=2)
    oracle_visits, _ = crawl_oracle(as_dict, seeds, max_depth=2)
    visits = crawl_bfs(tbl, seeds, max_depth=2)
    assert_matches_oracle(visits, oracle_visits)
    # at least one visited page should carry the updated-snapshot marker
    assert any('updated snapshot' in r['text'] for r in visits.to_pylist())

    # as_of_ts before the second snapshots -> original texts only
    cutoff = corpus.BASE_TS_US + 300 * 1_000_000  # after all originals
    old_dict = {}
    for u, ts, h in zip(urls, tbl.column('warc_ts').to_pylist(),
                        tbl.column('html').to_pylist()):
        if us(ts) <= cutoff and (u not in old_dict or us(ts) >= old_dict[u][0]):
            old_dict[u] = (us(ts), h)
    old_as_dict = {u: h for u, (ts, h) in old_dict.items()}
    oracle_old, _ = crawl_oracle(old_as_dict, seeds, max_depth=2)
    visits_old = crawl_bfs(tbl, seeds, max_depth=2, as_of_ts=cutoff)
    assert_matches_oracle(visits_old, oracle_old)
    assert not any('updated snapshot' in r['text'] for r in visits_old.to_pylist())


def test_resume_rejects_shard_mismatch(ray_session, small_corpus, tmp_path):
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    ckpt = str(tmp_path / 'ckpt2')
    c1 = Crawler(tbl, max_depth=3, checkpoint_dir=ckpt, num_seen_shards=4)
    c1.run(seeds, stop_after_wave=0)
    c2 = Crawler(tbl, max_depth=3, checkpoint_dir=ckpt, num_seen_shards=8)
    with pytest.raises(ValueError, match='seen shards'):
        c2.run_resumed()


def test_delta_seen_lineage_resume(ray_session, small_corpus, tmp_path):
    """Round-4 delta lineage: non-full waves checkpoint only the
    added-key delta (seen_delta.parquet), full snapshots appear every
    SEEN_FULL_SNAPSHOT_EVERY waves, and resume-from-a-delta-wave
    reproduces the uninterrupted crawl exactly."""
    import os

    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=4, max_links=10)

    ckpt = str(tmp_path / 'ckpt')
    c1 = Crawler(tbl, max_depth=4, max_links=10, checkpoint_dir=ckpt)
    part1 = c1.run(seeds, stop_after_wave=2)   # waves 0..2, then "killed"
    # wave 0 is the full base; waves 1..2 are delta records
    assert os.path.exists(os.path.join(ckpt, 'wave_00000', 'seen.parquet'))
    assert os.path.exists(
        os.path.join(ckpt, 'wave_00000', 'politeness.json'))
    for w in (1, 2):
        d = os.path.join(ckpt, 'wave_%05d' % w)
        assert os.path.exists(os.path.join(d, 'seen_delta.parquet'))
        assert not os.path.exists(os.path.join(d, 'seen.parquet'))
        assert os.path.exists(os.path.join(d, 'politeness_delta.json'))
        assert not os.path.exists(os.path.join(d, 'politeness.json'))
    c2 = Crawler(tbl, max_depth=4, max_links=10, checkpoint_dir=ckpt)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_delta_seen_lineage_second_full_snapshot(ray_session, small_corpus,
                                                 tmp_path, monkeypatch):
    """After SEEN_FULL_SNAPSHOT_EVERY waves a new FULL snapshot rolls
    the delta chain over; resume from past the rollover restores the
    NEW base and replays only the deltas after it."""
    import os

    monkeypatch.setattr(Crawler, 'SEEN_FULL_SNAPSHOT_EVERY', 2)
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=4, max_links=10)

    ckpt = str(tmp_path / 'ckpt')
    c1 = Crawler(tbl, max_depth=4, max_links=10, checkpoint_dir=ckpt)
    part1 = c1.run(seeds, stop_after_wave=3)   # waves 0..3
    # wave 0 full (base), wave 1 delta, wave 2 full (rollover), 3 delta
    assert os.path.exists(os.path.join(ckpt, 'wave_00000', 'seen.parquet'))
    assert os.path.exists(
        os.path.join(ckpt, 'wave_00001', 'seen_delta.parquet'))
    assert os.path.exists(os.path.join(ckpt, 'wave_00002', 'seen.parquet'))
    assert os.path.exists(
        os.path.join(ckpt, 'wave_00003', 'seen_delta.parquet'))
    c2 = Crawler(tbl, max_depth=4, max_links=10, checkpoint_dir=ckpt)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_collect_visits_false_streams_to_sink(ray_session, small_corpus,
                                              tmp_path):
    """collect_visits=False (the corpus-scale contract): run() returns
    None, the driver retains no visits table, and the output_dir
    parquet holds exactly the rows a collecting run returns."""
    import glob
    import os

    import pyarrow.parquet as pqm

    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)

    out = str(tmp_path / 'visits')
    got = Crawler(tbl, max_depth=3, max_links=10, output_dir=out,
                  collect_visits=False).run(seeds)
    assert got is None
    files = sorted(glob.glob(os.path.join(out, 'wave_[0-9]*.parquet')))
    written = pa.concat_tables([pqm.read_table(f) for f in files],
                               promote_options='default')
    assert written.num_rows == full.num_rows
    assert sorted(written.column('url').to_pylist()) == \
        sorted(full.column('url').to_pylist())

    import pytest
    with pytest.raises(ValueError):
        Crawler(tbl, collect_visits=False)   # sink required


def test_resume_after_crash_mid_wave_push(ray_session, small_corpus, tmp_path):
    """Crash AFTER a wave pushed its discovered links but BEFORE that
    wave's checkpoint committed: resume rewinds the seen set, so the
    re-run wave re-discovers and re-pushes the same links — the
    orphaned pre-crash segment must not double-visit every one of
    them (fifo queue has no dedup index to absorb the re-push)."""
    tbl, as_dict = small_corpus
    seeds = seeds_for(as_dict)
    full = crawl_bfs(tbl, seeds, max_depth=3, max_links=10)

    ckpt = str(tmp_path / 'ckpt')
    qdir = str(tmp_path / 'fq')
    kw = dict(max_depth=3, max_links=10, checkpoint_dir=ckpt,
              frontier_queue_dir=qdir, frontier_spill_threshold=0)
    c1 = Crawler(tbl, **kw)
    part1 = c1.run(seeds, stop_after_wave=1)
    # simulate the in-flight wave 2: its discovered (depth-3) links
    # were pushed to the queue, then the process died pre-checkpoint
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(qdir)
    depth3 = [r['url'] for r in full.to_pylist() if r['depth'] == 3]
    assert depth3, 'fixture must reach depth 3'
    q.push([('3|%s' % u, 0) for u in depth3])
    del q
    c2 = Crawler(tbl, **kw)
    part2 = c2.run_resumed()
    resumed = pa.concat_tables([part1, part2])
    assert resumed.to_pylist() == full.to_pylist()


def test_crawl_depth_hist_matches_visits(ray_session):
    """The depth histogram is exactly the flagship crawl's visits
    grouped by depth (seeds at depth 0 = one per host)."""
    from webscraping_ray.pipelines.relational import (crawl_depth_hist,
                                                      crawl_documents)

    sf = '/root/testdata/sf0.001'
    hist = crawl_depth_hist(sf).to_pandas().set_index('depth')['n_visits']
    visits = crawl_documents(sf).to_pandas()
    expect = visits.groupby('depth').size()
    assert hist.to_dict() == expect.to_dict()
    assert hist[0] == 8          # one seed per host
    assert hist.sum() == len(visits)
