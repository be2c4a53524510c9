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
    """Decompress concatenated gzip members (the WARC .gz layout) in
    one buffer — small-file utility; the scale path streams via
    :func:`_iter_inflate` instead."""
    return b''.join(_iter_inflate(data))


def _iter_inflate(data: bytes, chunk_size: int = 1 << 20):
    """Stream-decompress concatenated gzip members: yields decoded
    chunks without ever materializing the whole decompressed file —
    the multi-member .warc.gz layout restarts a ``decompressobj`` at
    every member boundary (``unused_data`` hand-off).  Decompression
    uses ``max_length`` so a highly COMPRESSIBLE member (a zip-bomb
    page with 1000:1 markup runs) still yields in ≤ chunk_size pieces:
    memory stays O(chunk) on both the compressed and decoded side."""
    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    pos, n = 0, len(data)
    while pos < n or d.unconsumed_tail:
        if d.unconsumed_tail:
            # max_length limited the previous call: drain its
            # unconsumed input before reading further
            piece = d.unconsumed_tail
        else:
            piece = data[pos:pos + chunk_size]
            pos += len(piece)
        out = d.decompress(piece, chunk_size)
        if out:
            yield out
        # member boundary inside the consumed input: hand unused_data
        # to a fresh decompressor (repeatedly — several tiny members
        # can complete inside one piece)
        while d.eof and d.unused_data:
            tail = d.unused_data
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
            out = d.decompress(tail, chunk_size)
            if out:
                yield out
            if d.unconsumed_tail:
                break  # drain via the outer loop before the next hop
        if d.eof and not d.unused_data and not d.unconsumed_tail:
            d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)


def _iter_chunks(data: bytes, chunk_size: int = 1 << 20):
    for pos in range(0, len(data), chunk_size):
        yield data[pos:pos + chunk_size]


#: sanity bound on a WARC header block.  Real headers are < 1 KB; the
#: spec imposes no limit (arbitrarily long WARC-Target-URIs), so the
#: bound is generous — it exists only so a file with NO header
#: terminator anywhere cannot grow the buffer to the whole file.  A
#: partial header merely straddling a chunk boundary stays below it.
_MAX_HEADER_BYTES = 1 << 20


class _RecordStream:
    """Incremental WARC record splitter: ``feed()`` decoded chunks,
    collect (headers, payload) records.  Holds at most ONE pending
    record's payload plus one chunk in its buffer (``peak_buf`` tracks
    the high-water mark — pinned in tests), and parses each header
    exactly once (no re-scan of partial payloads across feeds)."""

    def __init__(self):
        self.buf = bytearray()
        self.peak_buf = 0
        self._pending = None      # (headers, content_length)

    def feed(self, chunk: bytes):
        self.buf += chunk
        self.peak_buf = max(self.peak_buf, len(self.buf))
        out = []
        while True:
            if self._pending is None:
                while self.buf[:2] == _CRLF:
                    del self.buf[:2]
                if not self.buf:
                    break
                he = self.buf.find(_CRLF + _CRLF)
                if he < 0:
                    if len(self.buf) > _MAX_HEADER_BYTES:
                        raise ValueError('unterminated WARC header')
                    break
                if self.buf[:5] != b'WARC/':
                    raise ValueError('not a WARC record')
                headers = _parse_headers(bytes(self.buf[:he]))
                del self.buf[:he + 4]
                self._pending = (headers, int(headers['content-length']))
            headers, length = self._pending
            if len(self.buf) < length:
                break
            payload = bytes(self.buf[:length])
            del self.buf[:length]
            self._pending = None
            out.append((headers, payload))
        self.peak_buf = max(self.peak_buf, len(self.buf))
        return out

    def finish(self):
        """End-of-input: emit a TRUNCATED final record with whatever
        payload bytes exist (the pre-streaming parser's short-slice
        behavior — an interrupted download must not silently lose its
        last record), and raise on an unterminated header block (the
        pre-streaming parser's ``bytes.index`` ValueError)."""
        if self._pending is not None:
            headers = self._pending[0]
            payload = bytes(self.buf)
            self.buf.clear()
            self._pending = None
            return [(headers, payload)]
        while self.buf[:2] == _CRLF:
            del self.buf[:2]
        if self.buf:
            raise ValueError('unterminated WARC header at end of input')
        return []


def iter_warc_records(data: bytes, chunk_size: int = 1 << 20,
                      stream: _RecordStream | None = None):
    """Yield (headers, payload) for every record in one WARC file's
    bytes, streaming: gzip members inflate chunk-by-chunk and the
    splitter holds at most one record — whole-file inflation never
    happens (VERDICT r4 item 7).  Pass a ``_RecordStream`` to observe
    ``peak_buf``."""
    rs = stream if stream is not None else _RecordStream()
    chunks = (_iter_inflate(data, chunk_size)
              if data[:2] == b'\x1f\x8b' else _iter_chunks(data, chunk_size))
    for ch in chunks:
        yield from rs.feed(ch)
    yield from rs.finish()


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


def _response_record(headers: dict, payload: bytes):
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
    return {'url': url, 'warc_ts_us': ts, 'status': status,
            'html': html}


def parse_warc(data: bytes, stream: _RecordStream | None = None):
    """Yield dicts (url, warc_ts_us, status, html) for every response
    record in one WARC file's bytes (gzipped or plain) — streaming
    (:func:`iter_warc_records`): decode memory is O(record), never
    O(file)."""
    for headers, payload in iter_warc_records(data, stream=stream):
        if headers.get('warc-type') != 'response':
            continue
        yield _response_record(headers, payload)


#: records per streamed output batch of :func:`warc_pages_stream`
WARC_STREAM_BATCH_ROWS = 256
#: html bytes per streamed output batch (whichever cap hits first)
WARC_STREAM_BATCH_BYTES = 32 << 20


def _pages_table(rows) -> pa.Table:
    return pa.table({
        'url': pa.array([r['url'] for r in rows], pa.string()),
        'warc_ts': pa.array([r['warc_ts_us'] for r in rows],
                            pa.timestamp('us')),
        'status': pa.array([r['status'] for r in rows], pa.int32()),
        'html': pa.array([r['html'] for r in rows], pa.binary()),
    })


def warc_pages_stream(batch: pa.Table):
    """GENERATOR map_batches kernel over ``read_binary_files`` output:
    yields pages tables incrementally while the WARC file decodes, so

    - task memory stays bounded by one output batch (+ one compressed
      file buffer — the ``read_binary_files`` unit), never the whole
      decompressed file; and
    - one GIANT .warc.gz among small ones does not stall the pipeline:
      its records flow downstream (extract, write) while the decode
      task is still running, instead of landing as one monolithic
      block at the end (the skew shape of VERDICT r4 item 7)."""
    rows, html_bytes = [], 0
    produced = False
    for data in batch.column('bytes').to_pylist():
        for rec in parse_warc(data):
            rows.append(rec)
            html_bytes += len(rec['html'])
            if (len(rows) >= WARC_STREAM_BATCH_ROWS
                    or html_bytes >= WARC_STREAM_BATCH_BYTES):
                yield _pages_table(rows)
                rows, html_bytes = [], 0
                produced = True
    if rows or not produced:
        # always emit at least one (typed, possibly empty) table so a
        # WARC with zero response records still yields the pages
        # schema — a schema-less zero-block dataset breaks downstream
        # writes/unions (review finding, round 5)
        yield _pages_table(rows)


def warc_batch_to_pages(batch: pa.Table) -> pa.Table:
    """One-shot variant of :func:`warc_pages_stream` (single output
    table — small-file utility and the streamed path's oracle)."""
    parts = list(warc_pages_stream(batch))
    if not parts:
        return _pages_table([])
    return pa.concat_tables(parts)


def read_warc(paths):
    """WARC file(s) → pages Dataset (url, warc_ts, status, html).

    One file per read task; record parsing is inside the task (the
    driver never sees payload bytes) and STREAMS: the decode yields
    bounded output batches as it goes (see :func:`warc_pages_stream`)."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(warc_pages_stream, batch_format='pyarrow')


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


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — Common Crawl's sibling
# format: same WARC/1.0 container, ``WARC-Type: conversion`` records
# whose payload is the page's plain text (no HTTP head).

def parse_wet(data: bytes):
    """Yield dicts (url, warc_ts_us, text) for every conversion record
    in one WET file's bytes (gzipped or plain) — streaming, like
    :func:`parse_warc`."""
    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'conversion':
            continue
        yield {'url': headers.get('warc-target-uri', ''),
               'warc_ts_us': _warc_ts_us(
                   headers.get('warc-date', '1970-01-01T00:00:00Z')),
               'text': payload.decode('utf-8', 'replace')}


def wet_batch_to_rows(batch: pa.Table) -> pa.Table:
    """map_batches kernel over ``read_binary_files`` output: one input
    row = one WET file → (url, warc_ts, text) rows."""
    urls, tss, texts = [], [], []
    for data in batch.column('bytes').to_pylist():
        for rec in parse_wet(data):
            urls.append(rec['url'])
            tss.append(rec['warc_ts_us'])
            texts.append(rec['text'])
    return pa.table({
        'url': pa.array(urls, pa.string()),
        'warc_ts': pa.array(tss, pa.timestamp('us')),
        'text': pa.array(texts, pa.string()),
    })


def read_wet(paths):
    """WET file(s) → text Dataset (url, warc_ts, text); one file per
    read task, like :func:`read_warc`."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(wet_batch_to_rows, batch_format='pyarrow')


def wet_record_bytes(url: str, ts_us: int, text: str) -> bytes:
    """One WARC/1.0 conversion record (deterministic bytes)."""
    body = text.encode('utf-8')
    dt = datetime.fromtimestamp(ts_us / 1e6, timezone.utc)
    head = (
        'WARC/1.0\r\n'
        'WARC-Type: conversion\r\n'
        'WARC-Target-URI: %s\r\n'
        'WARC-Date: %s\r\n'
        'Content-Type: text/plain\r\n'
        'Content-Length: %d\r\n'
        % (url, dt.strftime('%Y-%m-%dT%H:%M:%SZ'), len(body))
    ).encode('latin-1')
    return head + _CRLF + body + _CRLF + _CRLF


def export_wet(ds, out_dir: str, url_col: str = 'url',
               ts_col: str = 'warc_ts', text_col: str = 'text',
               gz: bool = True) -> int:
    """Distributed WET export: one shard per block, written inside the
    map task (driver never sees text), gzip one member per record (the
    Common Crawl layout, records stay independently seekable),
    content-addressed names + atomic rename → idempotent re-runs.
    Returns rows written."""
    import gzip as _gzip
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = '.warc.wet.gz' if gz else '.warc.wet'

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({'rows': pa.array([], pa.int64())})
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())     # already microseconds
        chunks = []
        for url, ts_us, text in zip(t.column(url_col).to_pylist(),
                                    ts.to_pylist(),
                                    t.column(text_col).to_pylist()):
            rec = wet_record_bytes(url, int(ts_us or 0), text or '')
            chunks.append(_gzip.compress(rec, mtime=0) if gz else rec)
        blob = b''.join(chunks)
        tag = hashlib.md5(blob).hexdigest()[:16]
        tmp = os.path.join(out_dir, '.%s%s.tmp' % (tag, ext))
        final = os.path.join(out_dir, 'part-%s%s' % (tag, ext))
        if not os.path.exists(final):
            with open(tmp, 'wb') as f:
                f.write(blob)
            os.replace(tmp, final)
        return pa.table({'rows': pa.array([t.num_rows], pa.int64())})

    counts = ds.map_batches(write_shard, batch_format='pyarrow')
    return sum(r['rows'] for r in counts.take_all())


# ---------------------------------------------------------------------------
# WAT (link/metadata records) — the third Common Crawl sibling format:
# WARC-Type: metadata records whose JSON payload carries per-page
# metadata, most importantly the extracted links
# (Envelope → Payload-Metadata → HTTP-Response-Metadata →
#  HTML-Metadata → Links: [{"path": "A@/href", "url": ...}]).

def wat_record_bytes(url: str, ts_us: int, links: list) -> bytes:
    """One WARC/1.0 metadata record with the Common Crawl WAT JSON
    envelope as payload.  Deterministic bytes: compact separators +
    sorted keys, so identical inputs give identical shards."""
    import json

    payload = json.dumps(
        {'Envelope': {
            'WARC-Header-Metadata': {'WARC-Target-URI': url},
            'Payload-Metadata': {'HTTP-Response-Metadata': {
                'HTML-Metadata': {
                    'Links': [{'path': 'A@/href', 'url': u}
                              for u in links]}}}}},
        separators=(',', ':'), sort_keys=True).encode('utf-8')
    dt = datetime.fromtimestamp(ts_us / 1e6, timezone.utc)
    head = (
        'WARC/1.0\r\n'
        'WARC-Type: metadata\r\n'
        'WARC-Target-URI: %s\r\n'
        'WARC-Date: %s\r\n'
        'Content-Type: application/json\r\n'
        'Content-Length: %d\r\n'
        % (url, dt.strftime('%Y-%m-%dT%H:%M:%SZ'), len(payload))
    ).encode('latin-1')
    return head + _CRLF + payload + _CRLF + _CRLF


def parse_wat(data: bytes):
    """Yield dicts (url, warc_ts_us, links) for every metadata record
    in one WAT file's bytes (gzipped or plain) — streaming, like
    :func:`parse_warc`."""
    import json

    for headers, payload in iter_warc_records(data):
        if headers.get('warc-type') != 'metadata':
            continue
        url = headers.get('warc-target-uri', '')
        ts = _warc_ts_us(headers.get('warc-date', '1970-01-01T00:00:00Z'))
        try:
            env = json.loads(payload.decode('utf-8'))
            links = [l.get('url', '') for l in
                     env['Envelope']['Payload-Metadata']
                        ['HTTP-Response-Metadata']
                        .get('HTML-Metadata', {}).get('Links', [])]
        except (ValueError, KeyError):
            continue        # malformed payload: skip, like parse_wet
        yield {'url': url, 'warc_ts_us': ts, 'links': links}


def wat_batch_to_rows(batch: pa.Table) -> pa.Table:
    """map_batches kernel over ``read_binary_files`` output: one input
    row = one WAT file → (url, warc_ts, links) rows."""
    urls, tss, links = [], [], []
    for data in batch.column('bytes').to_pylist():
        for rec in parse_wat(data):
            urls.append(rec['url'])
            tss.append(rec['warc_ts_us'])
            links.append(rec['links'])
    return pa.table({
        'url': pa.array(urls, pa.string()),
        'warc_ts': pa.array(tss, pa.timestamp('us')),
        'links': pa.array(links, pa.list_(pa.string())),
    })


def read_wat(paths):
    """WAT file(s) → links Dataset (url, warc_ts, links); one file per
    read task, parsing inside the task."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(wat_batch_to_rows, batch_format='pyarrow')


def export_wat(ds, out_dir: str, url_col: str = 'url',
               ts_col: str = 'warc_ts', links_col: str = 'links',
               gz: bool = True) -> int:
    """Distributed WAT export: one shard per block written inside the
    map task (driver never sees link lists), one gzip member per
    record, content-addressed names + atomic rename → idempotent
    re-runs.  Returns rows written."""
    import gzip as _gzip
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = '.warc.wat.gz' if gz else '.warc.wat'

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({'rows': pa.array([], pa.int64())})
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        chunks = []
        for url, ts_us, links in zip(t.column(url_col).to_pylist(),
                                     ts.to_pylist(),
                                     t.column(links_col).to_pylist()):
            rec = wat_record_bytes(url, int(ts_us or 0), links or [])
            chunks.append(_gzip.compress(rec, mtime=0) if gz else rec)
        blob = b''.join(chunks)
        tag = hashlib.md5(blob).hexdigest()[:16]
        tmp = os.path.join(out_dir, '.%s%s.tmp' % (tag, ext))
        final = os.path.join(out_dir, 'part-%s%s' % (tag, ext))
        if not os.path.exists(final):
            with open(tmp, 'wb') as f:
                f.write(blob)
            os.replace(tmp, final)
        return pa.table({'rows': pa.array([t.num_rows], pa.int64())})

    counts = ds.map_batches(write_shard, batch_format='pyarrow')
    return sum(r['rows'] for r in counts.take_all())
