"""JSONL source/sink: gz shard round-trip, malformed-line policy,
Dolma envelope mapping, idempotent re-export."""

import gzip
import json
import os

import pyarrow as pa
import pytest

from webscraping_ray.sources.jsonl import (
    DOLMA_FIELDS, export_jsonl, parse_jsonl, read_jsonl,
    table_to_jsonl_bytes)


def test_parse_jsonl_gz_multimember_and_skip():
    good = json.dumps({'id': 1, 'text': 'a'}).encode()
    bad = b'{not json'
    member1 = gzip.compress(good + b'\n' + bad + b'\n')
    member2 = gzip.compress(json.dumps({'id': 2, 'text': 'b'}).encode())
    data = member1 + member2  # multi-member stream (Common Crawl layout)

    rows = parse_jsonl(data, errors='skip')
    assert [r['id'] for r in rows] == [1, 2]
    with pytest.raises(ValueError, match='line 2'):
        parse_jsonl(data, errors='strict')
    # non-object lines are malformed too
    assert parse_jsonl(b'[1,2]\n{"id":3}\n', errors='skip') == [{'id': 3}]


def test_jsonl_roundtrip_documents(ray_session, tmp_path):
    """documents parquet -> Dolma jsonl.gz shards -> read back equal."""
    import ray.data

    from webscraping_ray.pipelines.relational import _read

    docs = _read('/root/testdata/sf0.001', 'documents',
                 ['doc_id', 'text', 'source'])
    out = str(tmp_path / 'dump')
    n = export_jsonl(docs, out, field_map=DOLMA_FIELDS, gz=True)
    assert n == docs.count()
    files = sorted(os.listdir(out))
    assert files and all(f.endswith('.jsonl.gz') for f in files)

    back = read_jsonl([os.path.join(out, f) for f in files],
                      columns=['id', 'text', 'source']).to_pandas()
    orig = docs.to_pandas()
    back = back.rename(columns={'id': 'doc_id'})
    for df in (back, orig):
        df.sort_values('doc_id', inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert back[['doc_id', 'text', 'source']].equals(
        orig[['doc_id', 'text', 'source']])

    # idempotent re-run: same content-addressed names, no new files
    n2 = export_jsonl(docs, out, field_map=DOLMA_FIELDS, gz=True)
    assert n2 == n
    assert sorted(os.listdir(out)) == files


def test_export_metadata_and_plain(tmp_path):
    t = pa.table({'doc_id': pa.array([7], pa.int64()),
                  'text': pa.array(['hi'], pa.string()),
                  'lang': pa.array(['en'], pa.string())})
    blob = table_to_jsonl_bytes(t, field_map={'doc_id': 'id',
                                              'text': 'text'},
                                metadata_cols=('lang',))
    obj = json.loads(blob)
    assert obj == {'id': 7, 'text': 'hi', 'metadata': {'lang': 'en'}}
    # no field_map: raw row passthrough, deterministic bytes
    assert table_to_jsonl_bytes(t) == table_to_jsonl_bytes(t)


def test_read_jsonl_schema_pins_types(ray_session, tmp_path):
    """An all-null field in one shard must not flip the dtype when a
    schema is pinned; empty shards yield typed empty blocks."""
    p1 = tmp_path / 'a.jsonl'
    p1.write_text(json.dumps({'id': 1, 'text': None}) + '\n')
    p2 = tmp_path / 'b.jsonl'
    p2.write_text('\n')  # blank-only shard
    schema = pa.schema([('id', pa.int64()), ('text', pa.string())])
    ds = read_jsonl([str(p1), str(p2)], columns=['id', 'text'],
                    schema=schema)
    tbl = pa.concat_tables(ds.iter_batches(batch_format='pyarrow'))
    assert tbl.schema.field('text').type == pa.string()
    assert tbl.num_rows == 1
