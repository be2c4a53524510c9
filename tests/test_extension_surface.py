"""Reference user-extension surface: per-page ``cb`` with StopCrawl
(threaded_get, download.py:775-841), crawl budgets (max_urls
download.py:1102, max_errors async.py:264-269), and the DFS order
(reference default depth=True, download.py:811) — engine vs the
vendored sequential oracles."""

import pyarrow as pa
import pytest

from webscraping_ray.oracle.refcrawl import (crawl_cb_oracle,
                                             crawl_dfs_oracle)
from webscraping_ray.oracle import refcrawl
from webscraping_ray.pipelines.crawl import Crawler, StopCrawl
from webscraping_ray.sources import corpus


@pytest.fixture(scope="module")
def cb_corpus():
    tbl = corpus.pages_table(250, n_hosts=5, seed=9)
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    return tbl, as_dict


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


def _assert_same(visits: pa.Table, oracle_visits):
    got = visits.to_pylist()
    assert len(got) == len(oracle_visits)
    for g, o in zip(got, oracle_visits):
        for k in ('url', 'depth', 'visit_order', 'status', 'text', 'links',
                  'scheduled_ts'):
            assert g[k] == o[k], (k, g['url'])


def make_title_cb():
    """A user cb: follow only links to even page numbers.  Built as a
    closure so cloudpickle ships it by value to Ray workers (a test
    module is not importable there — real cbs live in user modules)."""
    import re

    href_re = re.compile(r'href=["\'](.*?)["\']')
    num_re = re.compile(r'(\d+)$')

    def title_cb(url, page):
        out = []
        for m in href_re.finditer(page):
            link = m.group(1)
            if link.startswith('/'):
                link = 'http://' + url.split('/')[2] + link
            d = num_re.search(link)
            if d and int(d.group(1)) % 2 == 0:
                out.append(link)
        return out

    return title_cb


def test_cb_crawl_matches_oracle(ray_session, cb_corpus):
    tbl, as_dict = cb_corpus
    seeds = _seeds(as_dict)
    cb = make_title_cb()
    oracle_visits, _ = crawl_cb_oracle(as_dict, seeds, cb)
    visits = Crawler(tbl, cb=cb).run(seeds)
    _assert_same(visits, oracle_visits)


def test_cb_stop_crawl_matches_oracle(ray_session, cb_corpus):
    tbl, as_dict = cb_corpus

    title_cb = make_title_cb()

    def stopping_cb(url, page):
        if url.endswith('/p/12'):
            raise StopCrawl()
        return title_cb(url, page)

    def oracle_cb(url, page):
        if url.endswith('/p/12'):
            raise refcrawl.StopCrawl()
        return title_cb(url, page)

    seeds = _seeds(as_dict)
    oracle_visits, _ = crawl_cb_oracle(as_dict, seeds, oracle_cb)
    visits = Crawler(tbl, cb=stopping_cb).run(seeds)
    assert any(v['url'].endswith('/p/12') for v in oracle_visits)
    assert len(oracle_visits) < len(crawl_cb_oracle(as_dict, seeds,
                                                    title_cb)[0])
    _assert_same(visits, oracle_visits)


def test_cb_exception_swallowed(ray_session, cb_corpus):
    """A cb error on one page must not kill the crawl (reference
    download.py:829-831): that page contributes no links."""
    tbl, as_dict = cb_corpus

    title_cb = make_title_cb()

    def flaky_cb(url, page):
        if url.endswith('/p/12'):
            raise ValueError('boom')
        return title_cb(url, page)

    seeds = _seeds(as_dict)
    oracle_visits, _ = crawl_cb_oracle(as_dict, seeds, flaky_cb)
    visits = Crawler(tbl, cb=flaky_cb).run(seeds)
    _assert_same(visits, oracle_visits)


def test_max_urls_budget(ray_session, cb_corpus):
    tbl, as_dict = cb_corpus
    seeds = _seeds(as_dict)
    full = Crawler(tbl, max_depth=3).run(seeds)
    assert full.num_rows > 17
    capped = Crawler(tbl, max_depth=3, max_urls=17).run(seeds)
    assert capped.num_rows == 17
    # the capped crawl is a prefix of the full crawl
    assert capped.to_pylist() == full.slice(0, 17).to_pylist()


def test_max_errors_budget(ray_session, cb_corpus):
    tbl, as_dict = cb_corpus
    seeds = _seeds(as_dict)

    title_cb = make_title_cb()

    def miss_cb(url, page):
        # fabricate links that miss the corpus → 404 visits
        return ['http://%s/missing/%s' % (url.split('/')[2],
                                          url.rsplit('/', 1)[1])] \
            + title_cb(url, page)

    oracle_visits, _ = crawl_cb_oracle(as_dict, seeds, miss_cb,
                                       max_errors=3)
    visits = Crawler(tbl, cb=miss_cb, max_errors=3).run(seeds)
    assert sum(1 for v in oracle_visits if v['status'] != 200) == 4
    _assert_same(visits, oracle_visits)


def test_max_age_expiry(ray_session):
    """Cache expiry (PersistentDict ``expires``, reference
    pdict.py:50-51/is_fresh): snapshots older than max_age are cache
    misses — the crawl must equal an oracle run over the corpus with
    the stale pages deleted."""
    from webscraping_ray.oracle.refcrawl import crawl_oracle

    tbl = corpus.pages_table(200, n_hosts=4, seed=13)
    ts = tbl.column('warc_ts').to_pylist()
    cut = sorted(ts)[len(ts) // 2]          # half the corpus is stale
    cut_us = int(cut.timestamp() * 1_000_000)
    now_us = max(int(t.timestamp() * 1_000_000) for t in ts) + 1
    fresh_dict = {u: h for u, h, t in zip(tbl.column('url').to_pylist(),
                                          tbl.column('html').to_pylist(),
                                          ts)
                  if int(t.timestamp() * 1_000_000) > cut_us}
    assert 0 < len(fresh_dict) < tbl.num_rows
    seeds = _seeds({u: None for u in tbl.column('url').to_pylist()})
    oracle_visits, _ = crawl_oracle(fresh_dict, seeds, max_depth=3,
                                    max_links=10)
    visits = Crawler(tbl, max_depth=3, max_links=10, now_ts=now_us,
                     max_age_us=now_us - cut_us).run(seeds)
    _assert_same(visits, oracle_visits)
    # stale pages appear as 404 visits when linked
    stale_hit = [v for v in visits.to_pylist() if v['status'] == 404]
    no_expiry = Crawler(tbl, max_depth=3, max_links=10).run(seeds)
    assert no_expiry.num_rows != visits.num_rows or stale_hit


def test_dfs_matches_oracle(ray_session, cb_corpus):
    """The reference DEFAULT order (depth=True → LIFO pop)."""
    tbl, as_dict = cb_corpus
    seeds = _seeds(as_dict)
    for kw in ({'max_depth': 2, 'max_links': 10},
               {'max_depth': 3, 'max_links': 4}):
        oracle_visits, _ = crawl_dfs_oracle(as_dict, seeds, **kw)
        visits = Crawler(tbl, **kw).run_dfs(seeds)
        _assert_same(visits, oracle_visits)
        # DFS differs from BFS on this corpus (the flag is meaningful)
        bfs = Crawler(tbl, **kw).run(seeds)
        assert bfs.column('url').to_pylist() != \
            visits.column('url').to_pylist()
