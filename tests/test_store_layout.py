"""Host-clustered store layout (round 4): same lookup/crawl results as
the url-hash layout, with row-group pruning that makes big-wave fetch
decode wave-proportional instead of bucket-proportional."""

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscraping_ray.sources import corpus, store

N_PAGES = 600
N_HOSTS = 10


@pytest.fixture(scope='module')
def two_layouts(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp('layouts')
    roots = {}
    for layout in ('url', 'host'):
        root = str(base / layout)
        ds = corpus.pages_dataset(N_PAGES, n_hosts=N_HOSTS, seed=7,
                                  override_num_blocks=4)
        store.write_corpus(ds, root, num_buckets=4, layout=layout)
        roots[layout] = root
    return roots


def _wave_urls():
    """A mixed wave: every page of hosts 0-2 that exists, by id."""
    cumw = corpus.host_cumweights(N_HOSTS)
    urls = []
    for i in range(N_PAGES):
        h = corpus.page_host_id(i, 7, cumw)
        if h in (0, 1, 2):
            urls.append(corpus.page_url(h, i))
    return urls


def test_layout_metadata(two_layouts):
    assert store.CorpusStore(two_layouts['url']).layout == 'url'
    cs = store.CorpusStore(two_layouts['host'])
    assert cs.layout == 'host'
    # one host's pages all live in one bucket under the host layout
    t = cs.lookup_table([u for u in _wave_urls()
                         if u.startswith('http://site1.com')])
    assert t.num_rows > 0


def test_lookup_table_parity(two_layouts):
    urls = _wave_urls()
    a = store.CorpusStore(two_layouts['url']).lookup_table(urls)
    b = store.CorpusStore(two_layouts['host']).lookup_table(urls)
    key = lambda t: sorted(zip(t.column('url').to_pylist(),
                               t.column('text').to_pylist()))
    assert key(a) == key(b)
    assert a.num_rows == len(urls)


def test_lookup_ds_pruned_path_parity(two_layouts):
    """Force the big-wave (pruned distributed point read) tier on both
    layouts and check it equals the small-wave scan-filter tier."""
    urls = _wave_urls()
    rows = {}
    for layout, root in two_layouts.items():
        cs = store.CorpusStore(root)
        small = cs.lookup_ds(urls, columns=['url', 'text'])
        cs2 = store.CorpusStore(root)
        cs2.BROADCAST_FILTER_THRESHOLD = 0     # force the pruned tier
        big = cs2.lookup_ds(urls, columns=['url', 'text'])
        k = lambda ds: sorted((r['url'], r['text'])
                              for r in ds.take_all())
        assert k(small) == k(big), layout
        rows[layout] = k(small)
    assert rows['url'] == rows['host']


def test_host_layout_prunes_decode(two_layouts):
    """The amplification metric: for a wave touching 3 of 10 hosts,
    the host layout must decode close to only the rows it keeps,
    while the url layout decodes every touched bucket."""
    urls = _wave_urls()
    kept = len(urls)
    dec_host = store.CorpusStore(
        two_layouts['host']).pruned_decode_rows(urls)
    dec_url = store.CorpusStore(
        two_layouts['url']).pruned_decode_rows(urls)
    # url-hash layout: wave spread over all buckets/groups -> decodes
    # (nearly) the whole corpus
    assert dec_url > 0.8 * N_PAGES
    # host layout: bounded by the wave's hosts' total pages plus one
    # boundary row group per host/bucket edge
    assert dec_host < 2 * kept, (dec_host, kept)


def test_crawl_identical_across_layouts(ray_session, two_layouts):
    from webscraping_ray.pipelines.crawl import Crawler

    cumw = corpus.host_cumweights(N_HOSTS)
    seeds, seen = [], set()
    for i in range(N_PAGES):
        h = corpus.page_host_id(i, 7, cumw)
        if h not in seen:
            seen.add(h)
            seeds.append(corpus.page_url(h, i))
    outs = {}
    cols = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']
    for layout, root in two_layouts.items():
        cs = store.CorpusStore(root)
        v = Crawler(cs, max_depth=3, max_links=50,
                    num_seen_shards=4).run(seeds)
        outs[layout] = v.select(cols).to_pylist()
    assert outs['url'] == outs['host']


def test_crawl_big_wave_tier_identical_on_host_layout(ray_session,
                                                      two_layouts):
    """The distributed (lookup_ds) fetch tier over a host-layout store
    must produce the same visits as the driver tier."""
    from webscraping_ray.pipelines.crawl import Crawler

    cs = store.CorpusStore(two_layouts['host'])
    cumw = corpus.host_cumweights(N_HOSTS)
    seeds, seen = [], set()
    for i in range(N_PAGES):
        h = corpus.page_host_id(i, 7, cumw)
        if h not in seen:
            seen.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=3, max_links=50, num_seen_shards=4)
    cols = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']
    v_driver = Crawler(cs, table_threshold=10**9, **kw).run(seeds)
    c = Crawler(cs, resolve_distributed_threshold=20, **kw)
    v_dist = c.run(seeds)
    assert (v_dist.select(cols).to_pylist()
            == v_driver.select(cols).to_pylist())


def test_skewed_host_point_read_fans_out(ray_session, tmp_path):
    """Zipf-extreme skew: one host holds 50% of the corpus.  Under
    layout='host' that host is one bucket — the build-time file
    manifest must split its point read into bounded row-group chunks
    so no single task decodes the whole hot bucket (straggler)."""
    import ray

    n, hot = 2000, 1000
    urls = (['http://hot.com/p/%d' % i for i in range(hot)]
            + ['http://site%d.com/p/%d' % (i % 9, i)
               for i in range(n - hot)])
    t = pa.table({'url': pa.array(urls, pa.string()),
                  'payload': pa.array(['x' * 50] * n, pa.string())})
    root = str(tmp_path / 'skew')
    store.write_corpus(ray.data.from_arrow(t), root, num_buckets=4,
                       layout='host', row_group_size=64)
    cs = store.CorpusStore(root)
    assert cs.file_groups, 'build-time file manifest missing'
    cs.BROADCAST_FILTER_THRESHOLD = 0      # force the point-read tier
    cs.POINT_READ_GROUPS_PER_TASK = 4      # 4 x 64 = 256 rows/task cap
    wave = urls[::2]                       # half of every host
    ds = cs.lookup_ds(wave, columns=['url'])
    sizes = [ray.get(r).num_rows for r in ds.to_arrow_refs()]
    assert sum(sizes) == len(wave)
    # the hot host fans out: no task decodes more than the chunk cap
    # (4 groups x 64 rows), so no straggler holds the wave hostage
    assert max(sizes) <= 4 * 64, sizes
    assert len([s for s in sizes if s]) >= 6


def test_resident_fleet_not_stale_after_store_rewrite(ray_session,
                                                      tmp_path):
    """A store REWRITTEN at the same root must not attach to the old
    resident fleet: the content token keys the registry, so the crawl
    over the new content matches the parquet path, not the old pages."""
    import shutil

    from webscraping_ray.pipelines.crawl import Crawler, warm_corpus_cache

    root = str(tmp_path / 's')
    ds = corpus.pages_dataset(200, n_hosts=4, seed=1, override_num_blocks=2)
    store.write_corpus(ds, root, num_buckets=2)
    cs1 = store.CorpusStore(root)
    assert warm_corpus_cache(cs1)
    tok1 = cs1.content_token()

    shutil.rmtree(root)
    ds2 = corpus.pages_dataset(300, n_hosts=4, seed=2,
                               override_num_blocks=2)
    store.write_corpus(ds2, root, num_buckets=2)
    cs2 = store.CorpusStore(root)
    assert cs2.content_token() != tok1

    cumw = corpus.host_cumweights(4)
    seeds, seen = [], set()
    for i in range(300):
        h = corpus.page_host_id(i, 2, cumw)
        if h not in seen:
            seen.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=2, max_links=20, num_seen_shards=2)
    cols = ['url', 'depth', 'visit_order', 'status', 'text']
    v_parquet = Crawler(cs2, resident_corpus=False, **kw).run(seeds)
    v_resident = Crawler(cs2, resident_corpus=True, **kw).run(seeds)
    assert (v_resident.select(cols).to_pylist()
            == v_parquet.select(cols).to_pylist())


def test_slice_bounded_by_rows_and_bytes():
    """Point-read output slicing must bound every block by row count
    AND html bytes, preserve order/content, and still make progress
    when a single page alone exceeds the byte budget."""
    import random

    rng = random.Random(11)
    sizes = [rng.choice([10, 100, 5000]) for _ in range(300)]
    sizes[40] = 50_000                     # one page over the budget
    t = pa.table({'url': ['u%d' % i for i in range(300)],
                  'html': ['x' * s for s in sizes]})
    out = store._slice_bounded(t, max_rows=64, max_bytes=20_000)
    assert pa.concat_tables(out).equals(t)  # order + content preserved
    for s in out:
        assert s.num_rows <= 64
        nbytes = sum(len(v) for v in s.column('html').to_pylist())
        assert nbytes <= 20_000 or s.num_rows == 1, (s.num_rows, nbytes)
    # row-count-only fallback when there is no html column
    t2 = pa.table({'url': ['u%d' % i for i in range(300)]})
    out2 = store._slice_bounded(t2, max_rows=64)
    assert [s.num_rows for s in out2] == [64, 64, 64, 64, 44]
    assert pa.concat_tables(out2).equals(t2)
    # small tables pass through as a single slice
    assert store._slice_bounded(t.slice(0, 5), max_rows=64,
                                max_bytes=10**9) == [t.slice(0, 5)]
    # zero-row tables (range-matched row group, exact filter kept
    # nothing — common at mega-wave scale) pass through untouched
    empty = t.slice(0, 0)
    assert store._slice_bounded(empty) == [empty]


def test_unique_hosts_matches_urlsplit():
    """The vectorized netloc extraction must equal urllib.urlsplit's
    netloc on edge cases (userinfo, port, scheme-relative, malformed,
    empty) — it decides bucket pruning, so a divergence loses rows."""
    cases = ['http://a.com/p', 'https://u:p@h.com:8080/x?q#f',
             'ftp://x.y/', '//scheme-relative.com/p', 'not a url',
             'http//broken.com/p', 'a+b-c.d://weird.scheme/p',
             'http://UPPER.com/P', 'http://h.com', 'http://h.com?q',
             'http://h.com#f', '']
    assert store._unique_hosts(cases) == {store.host_of(u) for u in cases}


def test_add_bucket_vectorized_parity():
    """The write path's vectorized host-dedup bucket assignment must
    equal per-url bucket_of, including regex-fallback urls."""
    urls = ['http://site%d.com/p/%d' % (i % 37, i) for i in range(2000)]
    urls[7] = '//rel.com/x'
    urls[13] = 'garbage'
    t = pa.table({'url': pa.array(urls, pa.string())})
    for layout in ('host', 'url'):
        got = store.AddBucket(32, layout)(t).column('bucket').to_pylist()
        assert got == [store.bucket_of(u, 32, layout) for u in urls], layout


def test_touched_buckets_parity_both_layouts():
    """The vectorized/early-exit bucket resolution must equal per-url
    bucket_of for both layouts (1024 buckets: no early-exit masking)."""
    urls = ['http://site%d.com/p/%d' % (i % 97, i) for i in range(5000)]
    for layout in ('url', 'host'):
        cs = store.CorpusStore.__new__(store.CorpusStore)
        cs.num_buckets = 1024
        cs.layout = layout
        assert cs._touched_buckets(urls) == {
            store.bucket_of(u, 1024, layout) for u in urls}, layout


def test_resident_tier_matches_parquet_tiers(ray_session, two_layouts):
    """The resident corpus-cache fetch tier (round 4) must produce
    byte-identical visits to the parquet tiers, and the shared fleet
    must be reused across crawlers with the same config."""
    from webscraping_ray.pipelines import crawl as C
    from webscraping_ray.pipelines.crawl import Crawler, warm_corpus_cache

    cs = store.CorpusStore(two_layouts['url'])
    cumw = corpus.host_cumweights(N_HOSTS)
    seeds, seen = [], set()
    for i in range(N_PAGES):
        h = corpus.page_host_id(i, 7, cumw)
        if h not in seen:
            seen.add(h)
            seeds.append(corpus.page_url(h, i))
    kw = dict(max_depth=3, max_links=50, num_seen_shards=4)
    cols = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts',
            'text', 'links']
    v_off = Crawler(cs, resident_corpus=False, **kw).run(seeds)
    assert warm_corpus_cache(cs)
    c_on = Crawler(cs, resident_corpus=True, **kw)
    v_on = c_on.run(seeds)
    assert v_on.select(cols).to_pylist() == v_off.select(cols).to_pylist()
    # fleet is shared: a second crawler attaches to the same actors
    sig = (cs.root, cs.content_token(), False, False, '', '^$', False)
    assert sig in C._CACHE_FLEETS
    fleet_actors = C._CACHE_FLEETS[sig]['actors']
    c2 = Crawler(cs, resident_corpus=True, **kw)
    c2._cache_pool()
    assert c2._resident[0] is fleet_actors


def test_resident_empty_shard_blocks_are_store_typed(ray_session,
                                                     tmp_path):
    """A shard whose buckets are all EMPTY (host layout with fewer
    hosts than buckets) must emit blocks in the store's types: an
    all-string empty block would fail the as-of/max-age warc_ts cast
    and schema unification when a wave url routes to it (a seed for a
    host absent from the corpus)."""
    from webscraping_ray.pipelines.crawl import (CorpusCacheShard,
                                                 Crawler,
                                                 warm_corpus_cache)

    root = str(tmp_path / 'tiny_host')
    ds = corpus.pages_dataset(80, n_hosts=2, seed=3,
                              override_num_blocks=2)
    store.write_corpus(ds, root, num_buckets=8, layout='host')
    cs = store.CorpusStore(root)

    # unit level: empty shard built with the store schema serves
    # typed empty blocks
    import pyarrow.parquet as pq
    first = next(fs[0] for b in range(cs.num_buckets)
                 for fs in [cs._bucket_files([b])] if fs)
    schema = pq.read_schema(first)
    cols = cs._available_columns(first, ['url', 'html', 'warc_ts'])
    shard = CorpusCacheShard([], cols, False, False, '', '^$',
                             schema=pa.schema([schema.field(c)
                                               for c in cols]))
    blk = shard.take(['http://nowhere.com/'])
    assert blk.schema.field('html').type == schema.field('html').type
    assert blk.schema.field('warc_ts').type == schema.field('warc_ts').type

    # end to end: a crawl with max_age set and a seed on an absent
    # host (routes to an empty shard) matches the parquet tier
    cumw = corpus.host_cumweights(2)
    seeds = []
    seen = set()
    for i in range(80):
        h = corpus.page_host_id(i, 3, cumw)
        if h not in seen:
            seen.add(h)
            seeds.append(corpus.page_url(h, i))
    seeds.append('http://absent-host.com/')
    kw = dict(max_depth=2, max_links=20, num_seen_shards=2,
              max_age_us=10**18, now_ts=10**18)
    cols_out = ['url', 'depth', 'visit_order', 'status']
    v_off = Crawler(cs, resident_corpus=False, **kw).run(seeds)
    assert warm_corpus_cache(cs)
    v_on = Crawler(cs, resident_corpus=True, **kw).run(seeds)
    assert (v_on.select(cols_out).to_pylist()
            == v_off.select(cols_out).to_pylist())


def test_fleet_eviction_skips_pinned_entries(ray_session, tmp_path):
    """LRU eviction must not ray.kill a fleet a live crawler holds:
    pinned entries survive registration pressure; once released they
    evict normally."""
    from webscraping_ray.pipelines import crawl as C

    saved = dict(C._CACHE_FLEETS)
    C._CACHE_FLEETS.clear()
    try:
        def entry(pins):
            return {'actors': [], 'assign': {}, 'cols': ['url'],
                    'ready': [], 'pins': pins}

        C._register_fleet('live', entry(pins=1))
        for i in range(C._CACHE_FLEETS_MAX + 2):
            C._register_fleet('idle%d' % i, entry(pins=0))
        assert 'live' in C._CACHE_FLEETS          # pinned: never evicted
        assert len(C._CACHE_FLEETS) == C._CACHE_FLEETS_MAX
        # release the pin: the next registration may evict it
        C._CACHE_FLEETS['live']['pins'] = 0
        # make it LRU again (oldest insertion order)
        C._CACHE_FLEETS['live'] = C._CACHE_FLEETS.pop('live')
        for s in [s for s in C._CACHE_FLEETS if s != 'live']:
            C._CACHE_FLEETS[s] = C._CACHE_FLEETS.pop(s)
        C._register_fleet('new', entry(pins=0))
        assert 'live' not in C._CACHE_FLEETS
    finally:
        C._CACHE_FLEETS.clear()
        C._CACHE_FLEETS.update(saved)


def test_crawler_pins_and_releases_fleet(ray_session, tmp_path):
    """A crawler attach increments the registry pin; end of crawl
    releases it."""
    from webscraping_ray.pipelines import crawl as C
    from webscraping_ray.pipelines.crawl import Crawler

    root = str(tmp_path / 'pincorpus')
    ds = corpus.pages_dataset(60, n_hosts=2, seed=5,
                              override_num_blocks=2)
    store.write_corpus(ds, root, num_buckets=2, layout='url')
    cs = store.CorpusStore(root)
    c = Crawler(cs, resident_corpus=True, max_depth=1, max_links=5,
                num_seen_shards=2)
    assert c._cache_pool() is not None
    sig = next(s for s in C._CACHE_FLEETS
               if s[0] == cs.root)
    assert C._CACHE_FLEETS[sig]['pins'] == 1
    c._close_cache()
    assert C._CACHE_FLEETS[sig]['pins'] == 0
