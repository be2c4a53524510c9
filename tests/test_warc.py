"""WARC source: parse/round-trip + Ray ingestion into the pages
schema, composed with the extraction kernels."""

import os

import pytest


RECORDS = [
    {'url': 'http://a.com/1', 'warc_ts_us': 1700000000_000000,
     'status': 200,
     'html': b'<html><head><title>One</title></head>'
             b'<body><h1>One</h1><a href="/2">next</a></body></html>'},
    {'url': 'http://a.com/2', 'warc_ts_us': 1700000060_000000,
     'status': 404, 'html': b'<html><body>gone</body></html>'},
    {'url': 'http://b.com/x', 'warc_ts_us': 1700000120_000000,
     'status': 200, 'html': b'<html><body>\xc3\xa9</body></html>'},
]


@pytest.mark.parametrize('gz', [False, True])
def test_warc_round_trip(tmp_path, gz):
    from webscraping_ray.sources.warc import parse_warc, write_warc

    p = str(tmp_path / ('t.warc.gz' if gz else 't.warc'))
    write_warc(p, RECORDS, gzip_members=gz)
    got = list(parse_warc(open(p, 'rb').read()))
    assert [(r['url'], r['warc_ts_us'], r['status'], r['html'])
            for r in got] == \
           [(r['url'], r['warc_ts_us'], r['status'], r['html'])
            for r in RECORDS]


def test_warc_skips_non_response_records(tmp_path):
    from webscraping_ray.sources.warc import parse_warc

    req = (b'WARC/1.0\r\nWARC-Type: request\r\n'
           b'WARC-Target-URI: http://a.com/1\r\n'
           b'WARC-Date: 2023-11-14T22:13:20Z\r\n'
           b'Content-Length: 5\r\n\r\nhello\r\n\r\n')
    resp = (b'WARC/1.0\r\nWARC-Type: response\r\n'
            b'WARC-Target-URI: http://a.com/2\r\n'
            b'WARC-Date: 2023-11-14T22:13:20Z\r\n'
            b'Content-Length: 4\r\n\r\nbody\r\n\r\n')
    got = list(parse_warc(req + resp))
    assert len(got) == 1 and got[0]['url'] == 'http://a.com/2'
    # a payload without an HTTP head is the html itself, status 0
    assert got[0]['status'] == 0 and got[0]['html'] == b'body'


def test_read_warc_dataset_and_extract(ray_session, tmp_path):
    """Two WARC files → pages Dataset → xpath/title extraction:
    the Common-Crawl ingestion path end to end."""
    import pyarrow as pa

    from webscraping_ray.kernels import xpath as X
    from webscraping_ray.kernels.text import html_to_unicode
    from webscraping_ray.sources.warc import read_warc, write_warc

    p1 = str(tmp_path / 'a.warc.gz')
    p2 = str(tmp_path / 'b.warc')
    write_warc(p1, RECORDS[:2], gzip_members=True)
    write_warc(p2, RECORDS[2:])
    ds = read_warc([p1, p2])
    assert set(ds.schema().names) == {'url', 'warc_ts', 'status', 'html'}

    def titles(t: pa.Table) -> pa.Table:
        return pa.table({
            'url': t.column('url'),
            'title': pa.array(
                [X.get(html_to_unicode(h), '//title')
                 for h in t.column('html').to_pylist()], pa.string())})

    rows = sorted((r['url'], r['title'])
                  for r in ds.map_batches(
                      titles, batch_format='pyarrow').take_all())
    assert rows == [('http://a.com/1', 'One'), ('http://a.com/2', ''),
                    ('http://b.com/x', '')]
    ts = sorted(r['warc_ts'] for r in
                ds.select_columns(['warc_ts']).take_all())
    assert [t.timestamp() for t in ts] == [1700000000.0, 1700000060.0,
                                           1700000120.0]


def test_wet_export_and_read_roundtrip(ray_session, tmp_path):
    """documents → WET conversion shards → read back equal (Common
    Crawl's extracted-text format); re-export is idempotent."""
    from webscraping_ray.pipelines.relational import _read
    from webscraping_ray.sources.warc import export_wet, read_wet

    docs = _read('/root/testdata/sf0.001', 'documents',
                 ['doc_id', 'text'])

    import pyarrow as pa

    def to_pages(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_pylist()
        return pa.table({
            'url': pa.array(['http://ex.com/%d' % i for i in ids]),
            'warc_ts': pa.array([1700000000_000000 + i for i in ids],
                                pa.timestamp('us')),
            'text': t.column('text')})

    pages = docs.map_batches(to_pages, batch_format='pyarrow')
    out = str(tmp_path / 'wet')
    n = export_wet(pages, out)
    assert n == docs.count()
    files = sorted(os.listdir(out))
    assert files and all(f.endswith('.warc.wet.gz') for f in files)

    back = read_wet([os.path.join(out, f) for f in files]).to_pandas()
    orig = pages.to_pandas()
    for df in (back, orig):
        df.sort_values('url', inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert back[['url', 'text']].equals(orig[['url', 'text']])
    assert (back['warc_ts'].astype('int64') // 10**6).equals(
        orig['warc_ts'].astype('int64') // 10**6)  # WET dates: 1s grain

    n2 = export_wet(pages, out)
    assert n2 == n and sorted(os.listdir(out)) == files


def test_parse_wet_skips_warcinfo():
    from webscraping_ray.sources.warc import parse_wet, wet_record_bytes

    info = (b'WARC/1.0\r\nWARC-Type: warcinfo\r\n'
            b'WARC-Date: 2023-11-14T22:13:20Z\r\n'
            b'Content-Length: 3\r\n\r\nabc\r\n\r\n')
    conv = wet_record_bytes('http://a.com/1', 1700000000_000000,
                            'plain text é')
    got = list(parse_wet(info + conv))
    assert len(got) == 1
    assert got[0]['url'] == 'http://a.com/1'
    assert got[0]['text'] == 'plain text é'


def test_wat_export_and_read_roundtrip(ray_session, tmp_path):
    """WAT metadata records round-trip: urls, second-grain dates, and
    link lists (incl. empty) survive export → gz shards → read; the
    re-export is idempotent (same content-addressed files)."""
    import os

    import pyarrow as pa
    import ray.data

    from webscraping_ray.sources.warc import export_wat, read_wat

    rows = pa.table({
        'url': pa.array(['http://a.com/1', 'http://b.com/2',
                         'http://c.com/3'], pa.string()),
        'warc_ts': pa.array([1_700_000_000_000_000] * 3,
                            pa.timestamp('us')),
        'links': pa.array([['http://x.com/', 'http://y.com/?q=1'],
                           [], ['http://z.com/#f']],
                          pa.list_(pa.string()))})
    ds = ray.data.from_arrow(rows)
    out = str(tmp_path / 'wat')

    n = export_wat(ds, out)
    assert n == 3
    files = sorted(os.listdir(out))
    assert files and all(f.endswith('.warc.wat.gz') for f in files)

    back = (read_wat([os.path.join(out, f) for f in files])
            .to_pandas().sort_values('url').reset_index(drop=True))
    assert list(back['url']) == ['http://a.com/1', 'http://b.com/2',
                                 'http://c.com/3']
    assert [list(x) for x in back['links']] == [
        ['http://x.com/', 'http://y.com/?q=1'], [], ['http://z.com/#f']]
    assert (back['warc_ts'].astype('int64') // 10**6
            == 1_700_000_000).all()

    n2 = export_wat(ds, out)
    assert n2 == n and sorted(os.listdir(out)) == files


def test_parse_wat_skips_non_metadata_and_malformed():
    from webscraping_ray.sources.warc import parse_wat, wat_record_bytes

    good = wat_record_bytes('http://a.com/1', 1_700_000_000_000_000,
                            ['http://x.com/'])
    resp = (b'WARC/1.0\r\nWARC-Type: response\r\n'
            b'WARC-Date: 2023-11-14T22:13:20Z\r\n'
            b'Content-Length: 3\r\n\r\nabc\r\n\r\n')
    bad_json = (b'WARC/1.0\r\nWARC-Type: metadata\r\n'
                b'WARC-Target-URI: http://bad.com/\r\n'
                b'WARC-Date: 2023-11-14T22:13:20Z\r\n'
                b'Content-Length: 5\r\n\r\n{oops\r\n\r\n')
    got = list(parse_wat(resp + bad_json + good))
    assert len(got) == 1
    assert got[0]['url'] == 'http://a.com/1'
    assert got[0]['links'] == ['http://x.com/']
