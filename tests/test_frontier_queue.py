"""ParquetQueue: the reference pdict.Queue doctest ported
(pdict.py:405-420) + durability; write_csv_unique; CrawlState export."""

import json
import os

import pyarrow as pa


def test_queue_doctest_semantics(tmp_path):
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(str(tmp_path / 'q'))
    keys = [('a', 1), ('b', 2), ('c', 1)]
    q.push(keys)
    assert len(q) == 3
    q.push(keys)            # duplicate push ignored
    assert len(q) == 3
    assert q.clear(keys=['a']) == 1
    assert q.pull(limit=1) == ['b']      # highest priority first
    assert q.clear() == 1                # one unclaimed key left
    assert len(q) == 0


def test_queue_priority_and_tie_order(tmp_path):
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(str(tmp_path / 'q'))
    q.push([('low', 1), ('hi1', 9), ('hi2', 9), ('mid', 5)])
    assert q.pull(limit=3) == ['hi1', 'hi2', 'mid']  # prio desc, seq ties
    assert q.pull(limit=10) == ['low']
    assert q.pull() == []


def test_queue_survives_restart(tmp_path):
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('a', 1), ('b', 2)])
    assert q.pull(limit=1) == ['b']
    # "crash" and reopen: claim state and contents persist
    q2 = ParquetQueue(root)
    assert len(q2) == 1
    assert q2.pull(limit=5) == ['a']
    q3 = ParquetQueue(root)
    assert q3.pull() == []


def test_write_csv_unique(ray_session, tmp_path):
    import glob

    import ray.data
    from webscraping_ray.pipelines.frontier import write_csv_unique
    tbl = pa.table({'k': ['x', 'y', 'x', 'z'],
                    'v': [1, 2, 3, 4],
                    'ord': [10, 20, 5, 30]})
    out = str(tmp_path / 'csv')
    write_csv_unique(ray.data.from_arrow(tbl), out, unique_by=['k'],
                     order_col='ord')
    rows = []
    for f in glob.glob(out + '/*.csv'):
        with open(f) as fh:
            lines = [l.strip() for l in fh if l.strip()]
        rows.extend(l for l in lines if not l.startswith('k,') and not l.startswith('"k"'))
    got = sorted(r.replace('"', '') for r in rows)
    # x keeps the ord=5 row (first by order_col)
    assert any(r.startswith('x,3') for r in got), got
    assert len(got) == 3


def test_crawl_state_file(ray_session, tmp_path):
    from webscraping_ray.pipelines.crawl import Crawler
    from webscraping_ray.sources import corpus
    tbl = corpus.pages_table(100, n_hosts=4, seed=5)
    seeds = [tbl.column('url').to_pylist()[0]]
    sf = str(tmp_path / 'status.json')
    c = Crawler(tbl, max_depth=2, state_file=sf)
    c.run(seeds)
    with open(sf) as f:
        st = json.load(f)
    assert st['num_downloads'] > 0
    assert st['waves'][0]['rows'] == 1
    assert 'fetch_extract' in st['waves'][0]['stage_secs']
    assert st['waves'][0]['top_hosts']


def test_crawl_output_dir(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq
    from webscraping_ray.pipelines.crawl import Crawler
    from webscraping_ray.sources import corpus
    tbl = corpus.pages_table(150, n_hosts=4, seed=6)
    seeds = [tbl.column('url').to_pylist()[0]]
    out = str(tmp_path / 'visits')
    v = Crawler(tbl, max_depth=2, output_dir=out).run(seeds)
    files = sorted(glob.glob(out + '/wave_*.parquet'))
    assert len(files) >= 2            # one per wave
    import pyarrow as pa
    written = pa.concat_tables([pq.read_table(f) for f in files])
    assert written.num_rows == v.num_rows
    assert written.column('visit_order').to_pylist() == \
        v.column('visit_order').to_pylist()
