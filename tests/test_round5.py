"""Round-5 additions (VERDICT r4 next-round items):

- politeness continuous clock × distributed-resolve tier interaction:
  a crawl that CROSSES resolve_distributed_threshold mid-crawl (early
  waves driver-folded, later waves distributed) must byte-match the
  all-driver tier and the vendored continuous-clock oracle — the tier
  boundary is where ordering bugs hide (item 8)
- fused point-read postprocess (item 5): lookup_ds(postprocess=...)
  equals lookup_ds().map_batches(...) on both the small-wave
  read_parquet path and the big-wave point-read path
"""

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscraping_ray.oracle.refcrawl import crawl_oracle
from webscraping_ray.pipelines.crawl import Crawler
from webscraping_ray.sources import corpus, store

META_COLS = ['url', 'depth', 'visit_order', 'status', 'scheduled_ts']


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
        if len(seeds) >= k:
            break
    return seeds


def test_continuous_clock_across_resolve_tiers(ray_session, tmp_path):
    """VERDICT r4 item 8: _run_wave_distributed bypasses the driver
    fold; with politeness_clock='continuous' the per-host virtual
    clock carries across the tier boundary.  A crawl whose waves cross
    resolve_distributed_threshold MID-CRAWL (seed wave below, later
    waves above) must emit identical visit metadata — including
    scheduled_ts — to the all-driver tier and to the vendored
    continuous-clock oracle."""
    tbl = corpus.pages_table(400, n_hosts=6, seed=11)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    as_dict = dict(zip(tbl.column('url').to_pylist(),
                       tbl.column('html').to_pylist()))
    seeds = _seeds(as_dict, k=3)
    kw = dict(max_depth=3, max_links=12, politeness_clock='continuous')

    v_driver = Crawler(cs, **kw).run(seeds)   # default: all driver fold

    c_mid = Crawler(cs, resolve_distributed_threshold=8, **kw)
    v_mid = c_mid.run(seeds)

    # the fixture must actually cross the boundary mid-crawl: the seed
    # wave is under the threshold, at least one later wave is over it
    wave_sizes = {}
    for d in v_mid.column('depth').to_pylist():
        wave_sizes[d] = wave_sizes.get(d, 0) + 1
    assert wave_sizes.get(0, 0) <= 8
    assert max(wave_sizes.values()) > 8, wave_sizes

    assert v_mid.select(META_COLS).to_pylist() == \
        v_driver.select(META_COLS).to_pylist()

    # and both match the vendored single-threaded reference oracle
    oracle_visits, _ = crawl_oracle(as_dict, seeds, clock='continuous',
                                    max_depth=3, max_links=12)
    got = v_mid.to_pylist()
    assert len(got) == len(oracle_visits)
    for g, o in zip(got, oracle_visits):
        assert g['url'] == o['url']
        assert g['scheduled_ts'] == o['scheduled_ts'], \
            (g['url'], g['scheduled_ts'], o['scheduled_ts'])


def test_lookup_ds_fused_postprocess_equivalence(ray_session, tmp_path):
    """lookup_ds(postprocess=fn) must equal
    lookup_ds().map_batches(fn) on BOTH tiers: the small-wave
    read_parquet path and the big-wave distributed point read (forced
    via BROADCAST_FILTER_THRESHOLD=0)."""
    import pyarrow.compute as pc

    from webscraping_ray.pipelines.crawl import PrepCandidates
    from webscraping_ray.stages.extract_stage import ExtractPages

    tbl = corpus.pages_table(300, n_hosts=4, seed=13)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    urls = tbl.column('url').to_pylist()[::2]

    extract = ExtractPages(with_links=True, with_contacts=True,
                           with_excerpt=True)
    prep = PrepCandidates('', '^$', None)

    def post(t):
        return prep(extract(t))

    def canon(ds):
        df = ds.to_pandas()
        list_cols = [c for c in df.columns
                     if df[c].map(lambda v: isinstance(v, (list, tuple))
                                  or getattr(v, 'ndim', 0) > 0).any()]
        for c in list_cols:
            df[c] = df[c].map(
                lambda v: None if v is None else tuple(v))
        return (df.sort_values('url').reset_index(drop=True)
                .fillna(''))

    for forced_pointread in (False, True):
        if forced_pointread:
            cs.BROADCAST_FILTER_THRESHOLD = 0
        want = canon(cs.lookup_ds(urls, columns=['url', 'html', 'warc_ts'])
                     .map_batches(post, batch_format='pyarrow'))
        got = canon(cs.lookup_ds(urls, columns=['url', 'html', 'warc_ts'],
                                 postprocess=post))
        assert list(got.columns) == list(want.columns)
        assert got.equals(want), f'pointread={forced_pointread}'
        assert len(got) == len(urls)


# ---------------------------------------------------------------------------
# VERDICT r4 item 7: WARC streaming decode + skew


def _big_warc(path, n_records, body_bytes, gz=True, seed=0):
    from webscraping_ray.sources import warc as W

    recs = [{'url': f'http://w{seed}.com/p/{i}',
             'warc_ts_us': 1_600_000_000_000_000 + i,
             'status': 200,
             'html': (b'<html><body>%d ' % i) + b'x' * body_bytes
                     + b'</body></html>'}
            for i in range(n_records)]
    W.write_warc(str(path), recs, gzip_members=gz)
    return recs


def test_warc_streaming_memory_bound(tmp_path):
    """Decoding a multi-member .warc.gz holds at most ONE record (+ a
    1 MB inflate chunk) in the parser buffer — never the whole
    decompressed file (which is ~50x the bound here)."""
    from webscraping_ray.sources import warc as W

    body = 64 * 1024                       # 64 KB per record
    recs = _big_warc(tmp_path / 'big.warc.gz', 200, body)
    data = (tmp_path / 'big.warc.gz').read_bytes()
    stream = W._RecordStream()
    got = list(W.parse_warc(data, stream=stream))
    assert len(got) == 200
    assert [r['html'] for r in got] == [r['html'] for r in recs]
    total_decoded = sum(len(r['html']) for r in recs)
    # bound: one record's bytes + headers + one inflate chunk of slack
    assert stream.peak_buf < body + (1 << 20) + 4096, stream.peak_buf
    assert stream.peak_buf < total_decoded / 5


def test_warc_streaming_equals_oneshot(tmp_path):
    """The streamed generator kernel and the one-shot table kernel
    produce identical rows, on gz and plain files, including tiny
    members next to large ones and non-response records."""
    from webscraping_ray.sources import warc as W

    for gz in (True, False):
        p = tmp_path / ('f.warc.gz' if gz else 'f.warc')
        _big_warc(p, 37, 2048, gz=gz)
        batch = pa.table({'bytes': pa.array([p.read_bytes()],
                                            pa.binary())})
        oneshot = W.warc_batch_to_pages(batch)
        streamed = pa.concat_tables(list(W.warc_pages_stream(batch)))
        assert streamed.equals(oneshot)
        assert oneshot.num_rows == 37


def test_warc_skewed_file_streams_blocks(ray_session, tmp_path):
    """One giant WARC among small ones: the giant file's decode task
    yields MULTIPLE bounded blocks (streaming generator), so the
    pipeline never receives its rows as one monolithic block, and all
    rows survive with correct values."""
    from webscraping_ray.sources import warc as W

    # giant: 900 records (> 3 stream batches at 256 rows/yield)
    _big_warc(tmp_path / 'giant.warc.gz', 900, 1024, seed=1)
    for i in range(3):
        _big_warc(tmp_path / f'small{i}.warc.gz', 5, 256, seed=10 + i)

    ds = W.read_warc([str(tmp_path / 'giant.warc.gz')]
                     + [str(tmp_path / f'small{i}.warc.gz')
                        for i in range(3)]).materialize()
    assert ds.count() == 900 + 15
    # the giant file alone must produce > 1 block
    giant_only = W.read_warc([str(tmp_path / 'giant.warc.gz')]
                             ).materialize()
    assert giant_only.num_blocks() >= 900 // 256
    urls = set(r['url'] for r in ds.select_columns(['url']).take_all())
    assert 'http://w1.com/p/899' in urls
    assert 'http://w12.com/p/4' in urls


# ---------------------------------------------------------------------------
# round-5 self-review regression pins


def test_warc_inflate_bounded_on_compressible_member():
    """A zip-bomb-ish member (1000:1 compressible) must still yield in
    ≤ chunk_size pieces — max_length-limited inflation, not one giant
    buffer (review finding)."""
    import gzip

    from webscraping_ray.sources import warc as W

    members = [b'A' * (5 << 20), b'tiny', b'B' * 1234567]
    data = b''.join(gzip.compress(m) for m in members)
    for cs in (1024, 65536, 1 << 20):
        chunks = list(W._iter_inflate(data, cs))
        assert b''.join(chunks) == b''.join(members)
        assert max(len(c) for c in chunks) <= cs


def test_warc_truncated_record_short_slice_parity(tmp_path):
    """A file truncated mid-payload yields its final record with the
    short payload (the pre-streaming parser's slice behavior); an
    unterminated header raises ValueError (its bytes.index
    behavior)."""
    from webscraping_ray.sources import warc as W

    recs = _big_warc(tmp_path / 't.warc', 3, 4096, gz=False)
    full = (tmp_path / 't.warc').read_bytes()
    got = list(W.parse_warc(full[:-2000]))
    assert len(got) == 3
    assert got[0]['html'] == recs[0]['html']
    assert len(got[2]['html']) < len(recs[2]['html'])
    with pytest.raises(ValueError):
        list(W.parse_warc(b'WARC/1.0\r\nWARC-Type: response\r\nConte'))


def test_group_block_refs_unknown_rowcount_not_dropped():
    """BlockMetadata.num_rows=None means UNKNOWN, not empty — the
    chunk grouping must include such blocks (review finding: dropping
    them silently excluded vectors from broadcast corpora)."""
    from types import SimpleNamespace

    from webscraping_ray.stages.similarity import _group_block_refs

    def bundle(*metas):
        return SimpleNamespace(blocks=[('ref%d' % i,
                                        SimpleNamespace(num_rows=m))
                                       for i, m in enumerate(metas)])

    groups = _group_block_refs([bundle(10, None, 0, 5)], chunk_rows=100)
    flat = [r for g in groups for r in g]
    assert 'ref0' in flat and 'ref1' in flat and 'ref3' in flat
    assert 'ref2' not in flat          # known-empty dropped
    # the unknown-count block closes its chunk (counted as chunk_rows)
    assert any('ref1' in g for g in groups)


def test_read_warc_zero_response_records_keeps_schema(ray_session,
                                                      tmp_path):
    """A WARC with only non-response records still yields a TYPED
    (empty) pages dataset — a schema-less zero-block dataset breaks
    downstream writes/unions (review finding)."""
    from webscraping_ray.sources import warc as W

    body = b'{"Envelope": {}}'
    head = ('WARC/1.0\r\nWARC-Type: metadata\r\n'
            'WARC-Target-URI: http://m.com/\r\n'
            'WARC-Date: 2020-01-01T00:00:00Z\r\n'
            'Content-Length: %d\r\n' % len(body)).encode()
    (tmp_path / 'meta.warc').write_bytes(head + b'\r\n' + body
                                         + b'\r\n\r\n')
    ds = W.read_warc([str(tmp_path / 'meta.warc')]).materialize()
    assert ds.count() == 0
    assert ds.schema() is not None
    assert set(ds.schema().names) == {'url', 'warc_ts', 'status', 'html'}


def test_warc_huge_header_chunk_straddle():
    """A >64 KB header (long WARC-Target-URI) parses even when the
    inflate chunking splits it mid-header — the header bound only
    rejects genuinely unterminated headers (review finding)."""
    from webscraping_ray.sources import warc as W

    uri = 'http://long.com/' + 'x' * 80_000
    body = b'HTTP/1.1 200 OK\r\n\r\nhi'
    head = ('WARC/1.0\r\nWARC-Type: response\r\n'
            'WARC-Target-URI: %s\r\n'
            'WARC-Date: 2020-01-01T00:00:00Z\r\n'
            'Content-Length: %d\r\n' % (uri, len(body))).encode()
    data = head + b'\r\n' + body + b'\r\n\r\n'
    got = list(W.parse_warc(data, stream=W._RecordStream()))
    # force tiny chunks so the header straddles many boundaries
    rs = W._RecordStream()
    got2 = []
    for i in range(0, len(data), 4096):
        got2.extend(rs.feed(data[i:i + 4096]))
    got2.extend(rs.finish())
    assert len(got) == 1 and len(got2) == 1
    assert got[0]['url'] == uri
    assert got2[0][0].get('warc-target-uri') == uri


def test_graph_bsp_add_edges_idempotent(ray_session):
    """Re-delivering a block (a retried loader task) must not
    double-count edges (review finding)."""
    import ray

    from webscraping_ray.stages.graph_bsp import _make_shard_class

    cls = _make_shard_class()
    s = cls.remote(0, 1)
    for _replay in range(2):                          # retry replay
        ray.get(s.add_edges.remote('fwd', (0, 'fwd'),
                                   ['http://a.com/x'],
                                   ['http://a.com/y']))
        ray.get(s.add_edges.remote('bwd', (0, 'bwd'),
                                   ['http://a.com/x'],
                                   ['http://a.com/y']))
    ray.get(s.add_edges.remote('fwd', (1, 'fwd'),     # distinct block
                               ['http://a.com/x'], ['http://a.com/y']))
    ray.get(s.add_edges.remote('bwd', (1, 'bwd'),
                               ['http://a.com/x'], ['http://a.com/y']))
    n = ray.get(s.finalize.remote())
    assert n == 2                                     # x and y
    ray.get(s.set_vec.remote('r', 1.0))
    msgs = ray.get(s.pr_messages.options(num_returns=1).remote())
    # exactly TWO edge messages (block 0 once + block 1), not three
    assert sum(len(v) for v in msgs) == 2


def test_read_all_fused_postprocess_equivalence(ray_session, tmp_path):
    """read_all(postprocess=fn) must equal read_all().map_batches(fn)
    — the whole-corpus fused-sweep path (round 5)."""
    from webscraping_ray.stages.extract_stage import ExtractPages

    tbl = corpus.pages_table(200, n_hosts=4, seed=21)
    cs = _store_from_table(tbl, str(tmp_path / 'corpus'))
    ex = ExtractPages(with_links=True, with_contacts=True,
                      with_excerpt=True)

    def proj(t):
        out = ex(t)
        return out.select(['url', 'text', 'status'])

    want = (cs.read_all(columns=['url', 'html'])
            .map_batches(proj, batch_format='pyarrow').to_pandas()
            .sort_values('url').reset_index(drop=True))
    got = (cs.read_all(columns=['url', 'html'], postprocess=proj)
           .to_pandas().sort_values('url').reset_index(drop=True))
    assert got.equals(want)
    assert len(got) == 200


def test_segment_folds_vectorized_bitwise_equal():
    """The stepped-vectorized fold performs the exact left-associated
    additions of the scalar loop (bitwise), including the heavy-
    in-degree fallback path (segments > _FOLD_VEC_STEPS)."""
    import numpy as np

    from webscraping_ray.stages.graph_bsp import _segment_folds

    def scalar_ref(idx, vals, n):
        out = np.zeros(n)
        order = np.lexsort((vals, idx))
        si, sv = idx[order], vals[order]
        if not len(si):
            return out
        acc, cur = sv[0], si[0]
        for k in range(1, len(si)):
            if si[k] != cur:
                out[cur] = acc
                cur, acc = si[k], sv[k]
            else:
                acc = acc + sv[k]
        out[cur] = acc
        return out

    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(1, 300))
        m = int(rng.integers(0, 4000))
        idx = (rng.choice(n, size=m) if m
               else np.array([], dtype=np.int64)).astype(np.int64)
        if trial % 4 == 0 and m > 200:
            idx[:m // 2] = 0      # mega segment -> fallback path
        vals = (rng.random(m) * rng.choice([1e-9, 1.0, 1e9], size=m)
                if m else np.array([]))
        a = _segment_folds(idx, vals, n)
        b = scalar_ref(idx, vals, n)
        assert a.tobytes() == b.tobytes(), trial


def test_semdedup_param_conflict_raises(ray_session):
    import ray.data

    from webscraping_ray.stages.dedup import semdedup_removed_ds

    t = pa.table({'vec_id': pa.array([0, 1], pa.int64()),
                  'embedding': pa.array([[1.0, 0.0], [0.0, 1.0]],
                                        pa.list_(pa.float32()))})
    with pytest.raises(ValueError):
        semdedup_removed_ds(ray.data.from_arrow(t), n_clusters=4,
                            max_bucket_rows=100)
