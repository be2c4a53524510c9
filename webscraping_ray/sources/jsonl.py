"""JSONL source/sink: the webtext interchange format (C4 / Dolma /
RefinedWeb publish line-delimited JSON, usually gzipped per shard).

Ray's native ``read_json`` cannot inflate ``.jsonl.gz`` shards (it
feeds raw gzip bytes to the JSON parser — verified on Ray 2.49), and
real dumps carry occasional malformed lines a strict parser dies on.
This reader follows the WARC source's shape (sources/warc.py): one
file per ``read_binary_files`` task, gzip detected by magic bytes
(multi-member streams inflate member-by-member like Common Crawl's
layout), and a per-line ``errors='skip'|'strict'`` policy.

Scale shape: shards are the unit of parallelism (Dolma shards are
~1 GB) — no cross-file state, the driver never sees payload bytes.
Column projection happens inside the parse task (only requested
fields leave the task), so a 2-field read of a 20-field dump ships 2
fields.
"""
from __future__ import annotations

import json
import zlib

import pyarrow as pa

#: documents-table column -> Dolma JSONL field (Soldaini et al. 2024,
#: the "id/text/source + metadata" document envelope)
DOLMA_FIELDS = {'doc_id': 'id', 'text': 'text', 'source': 'source'}


def _inflate_if_gzip(data: bytes) -> bytes:
    """Gunzip (multi-member) when the shard starts with the gzip magic;
    pass plain bytes through."""
    if data[:2] != b'\x1f\x8b':
        return data
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b''.join(out)


def parse_jsonl(data: bytes, columns=None, errors: str = 'strict'):
    """JSONL shard bytes → list of dicts (projected to ``columns``).

    ``errors='skip'`` drops undecodable / non-object lines (the webtext
    reality); ``'strict'`` raises with the line number.  Blank lines
    are always skipped (trailing newline convention).
    """
    rows = []
    for n, line in enumerate(_inflate_if_gzip(data).split(b'\n')):
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
            if not isinstance(obj, dict):
                raise ValueError('JSONL line is not an object')
        except (ValueError, UnicodeDecodeError) as e:
            if errors == 'skip':
                continue
            raise ValueError('bad JSONL line %d: %s' % (n + 1, e)) from e
        if columns is not None:
            obj = {c: obj.get(c) for c in columns}
        rows.append(obj)
    return rows


def _rows_to_table(rows, columns=None, schema: pa.Schema | None = None):
    """Rows → Arrow table with a stable column order (requested order,
    else union of keys in first-seen order)."""
    if schema is not None:
        cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
        return pa.table(
            {n: pa.array(v, schema.field(n).type) for n, v in cols.items()})
    if columns is None:
        columns = []
        for r in rows:
            for k in r:
                if k not in columns:
                    columns.append(k)
    return pa.table({c: pa.array([r.get(c) for r in rows]) for c in columns})


def jsonl_batch_to_table(batch: pa.Table, columns=None,
                         errors: str = 'strict',
                         schema: pa.Schema | None = None) -> pa.Table:
    """map_batches kernel over ``read_binary_files`` output: one input
    row = one JSONL(.gz) shard → parsed rows."""
    rows = []
    for data in batch.column('bytes').to_pylist():
        rows.extend(parse_jsonl(data, columns, errors))
    if not rows and (columns or schema):
        # typed empty block (schemaless empties break downstream joins)
        if schema is None:
            schema = pa.schema([(c, pa.string()) for c in columns])
        return _rows_to_table([], schema=schema)
    return _rows_to_table(rows, columns, schema)


def read_jsonl(paths, columns=None, errors: str = 'strict',
               schema: pa.Schema | None = None):
    """JSONL / JSONL.gz shard(s) → Dataset.

    ``columns`` projects inside the parse task; ``schema`` pins arrow
    types (otherwise inferred per block — pass one when shards may be
    empty or a field is all-null in some shard).
    """
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(
        lambda t: jsonl_batch_to_table(t, columns, errors, schema),
        batch_format='pyarrow')


def table_to_jsonl_bytes(t: pa.Table, field_map=None, gz: bool = False,
                         metadata_cols=()) -> bytes:
    """Arrow table → JSONL shard bytes (Dolma envelope when
    ``field_map`` maps column→field; ``metadata_cols`` nest under
    ``metadata``).  Keys are emitted in map order — deterministic."""
    import gzip as _gzip

    out = []
    for row in t.to_pylist():
        if field_map:
            obj = {f: row[c] for c, f in field_map.items() if c in row}
            md = {c: row[c] for c in metadata_cols if c in row}
            if md:
                obj['metadata'] = md
        else:
            obj = row
        out.append(json.dumps(obj, ensure_ascii=False,
                              separators=(',', ':')))
    blob = ('\n'.join(out) + '\n').encode('utf-8') if out else b''
    return _gzip.compress(blob, mtime=0) if gz else blob  # mtime=0: bit-reproducible


def export_jsonl(ds, out_dir: str, field_map=None, gz: bool = True,
                 metadata_cols=(), shard_col: str | None = None) -> int:
    """Distributed JSONL export: one shard file per block, written
    inside the map task (the driver never sees text).  Shard names are
    content-addressed (md5 of the shard bytes), so re-running an
    identical export is idempotent — same files, no dups.  Returns the
    number of rows written.  ``shard_col``'s min/max goes into the
    file name for human-legible ranges when given.
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = '.jsonl.gz' if gz else '.jsonl'

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({'rows': pa.array([], pa.int64())})
        blob = table_to_jsonl_bytes(t, field_map, gz, metadata_cols)
        tag = hashlib.md5(blob).hexdigest()[:16]
        if shard_col is not None:
            import pyarrow.compute as pc
            tag = '%s-%s-%s' % (pc.min(t[shard_col]).as_py(),
                                pc.max(t[shard_col]).as_py(), tag)
        tmp = os.path.join(out_dir, '.%s%s.tmp' % (tag, ext))
        final = os.path.join(out_dir, 'part-%s%s' % (tag, ext))
        if not os.path.exists(final):      # idempotent re-run
            with open(tmp, 'wb') as f:
                f.write(blob)
            os.replace(tmp, final)         # atomic commit
        return pa.table({'rows': pa.array([t.num_rows], pa.int64())})

    counts = ds.map_batches(write_shard, batch_format='pyarrow')
    return sum(r['rows'] for r in counts.take_all())
