"""WARC (Web ARChive, ISO 28500) source: Common-Crawl-style ingestion.

Parses WARC/1.0 files — the format Common Crawl publishes — into the
engine's pages schema ``(url, warc_ts, html)`` so real crawl dumps can
feed the extraction/crawl pipelines exactly like the parquet corpus
(SURVEY.md §1 data model; reference ``Download.get`` consumes the same
logical record, download.py:173-284).

Pure-stdlib parser (no warcio in this environment):

- record grammar: ``WARC/1.0\\r\\n`` header block, ``\\r\\n``,
  exactly ``Content-Length`` payload bytes, ``\\r\\n\\r\\n`` trailer.
- only ``WARC-Type: response`` records become rows; the HTTP response
  head (status line + headers) is split off the payload and the body
  becomes ``html``.
- ``.warc.gz`` inputs are MULTI-MEMBER gzip (Common Crawl compresses
  each record as its own member so records are independently
  seekable); the reader gunzips member-by-member with a zlib
  decompressobj loop.

Scale shape: one WARC file per read task (``read_binary_files`` →
``flat_map``-style batch parser) — Common Crawl segments are ~1 GB,
which is the intended per-task work unit; no cross-file state.
"""
from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone

import pyarrow as pa

_CRLF = b'\r\n'


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC .gz layout)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b''.join(out)


def _parse_headers(block: bytes) -> dict:
    """Header block → lowercase-keyed dict (folded lines unsupported —
    WARC writers do not emit them)."""
    headers = {}
    for line in block.split(_CRLF):
        if b':' in line:
            k, v = line.split(b':', 1)
            headers[k.strip().lower().decode('latin-1')] = \
                v.strip().decode('latin-1')
    return headers


def _warc_ts_us(warc_date: str) -> int:
    """WARC-Date (ISO 8601 Zulu) → epoch microseconds."""
    dt = datetime.strptime(warc_date, '%Y-%m-%dT%H:%M:%SZ')
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def parse_warc(data: bytes):
    """Yield dicts (url, warc_ts_us, status, html) for every response
    record in one WARC file's bytes (gzipped or plain)."""
    if data[:2] == b'\x1f\x8b':
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        hdr_end = data.index(_CRLF + _CRLF, pos)
        headers = _parse_headers(data[pos:hdr_end])
        if not data[pos:pos + 5] == b'WARC/':
            raise ValueError('not a WARC record at offset %d' % pos)
        length = int(headers['content-length'])
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get('warc-type') != 'response':
            continue
        url = headers.get('warc-target-uri', '')
        ts = _warc_ts_us(headers.get('warc-date', '1970-01-01T00:00:00Z'))
        # split the HTTP response head off the payload
        status = 0
        html = payload
        if payload[:5] in (b'HTTP/',):
            head_end = payload.find(_CRLF + _CRLF)
            if head_end >= 0:
                head = payload[:head_end]
                html = payload[head_end + 4:]
                first = head.split(_CRLF, 1)[0].split()
                if len(first) >= 2 and first[1].isdigit():
                    status = int(first[1])
        yield {'url': url, 'warc_ts_us': ts, 'status': status,
               'html': html}


def warc_batch_to_pages(batch: pa.Table) -> pa.Table:
    """map_batches kernel over ``read_binary_files`` output
    (``bytes`` column): one input row = one WARC file → pages rows."""
    urls, tss, sts, htmls = [], [], [], []
    for data in batch.column('bytes').to_pylist():
        for rec in parse_warc(data):
            urls.append(rec['url'])
            tss.append(rec['warc_ts_us'])
            sts.append(rec['status'])
            htmls.append(rec['html'])
    return pa.table({
        'url': pa.array(urls, pa.string()),
        'warc_ts': pa.array(tss, pa.timestamp('us')),
        'status': pa.array(sts, pa.int32()),
        'html': pa.array(htmls, pa.binary()),
    })


def read_warc(paths):
    """WARC file(s) → pages Dataset (url, warc_ts, status, html).

    One file per read task; record parsing is inside the task, so the
    driver never sees payload bytes."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(warc_batch_to_pages, batch_format='pyarrow')


def write_warc(path: str, records, gzip_members: bool = False) -> None:
    """Write (url, warc_ts_us, html) dicts as a WARC/1.0 file (test /
    round-trip utility; one gzip member per record when requested —
    the Common Crawl layout)."""
    chunks = []
    for r in records:
        dt = datetime.fromtimestamp(r['warc_ts_us'] / 1e6, timezone.utc)
        http = (b'HTTP/1.1 %d OK\r\nContent-Type: text/html\r\n\r\n'
                % r.get('status', 200)) + r['html']
        head = (
            'WARC/1.0\r\n'
            'WARC-Type: response\r\n'
            'WARC-Target-URI: %s\r\n'
            'WARC-Date: %s\r\n'
            'Content-Type: application/http;msgtype=response\r\n'
            'Content-Length: %d\r\n'
            % (r['url'], dt.strftime('%Y-%m-%dT%H:%M:%SZ'), len(http))
        ).encode('latin-1')
        rec = head + _CRLF + http + _CRLF + _CRLF
        chunks.append(gzip.compress(rec) if gzip_members else rec)
    with open(path, 'wb') as f:
        f.write(b''.join(chunks))
