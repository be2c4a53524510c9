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


def test_queue_clear_allows_repush(tmp_path):
    """Reference pdict.Queue DELETEs cleared rows, so a cleared key can
    be re-pushed and re-pulled (pdict.py:481-497)."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(str(tmp_path / 'q'))
    q.push([('a', 1), ('b', 2)])
    assert q.pull(limit=1) == ['b']      # b claimed
    assert q.clear(keys=['b']) == 0      # deleting a claimed key: size unchanged
    q.push([('b', 9)])                   # re-push after clear works
    assert q.pull(limit=1) == ['b']
    # clearing an unclaimed key then re-pushing also works
    assert q.clear(keys=['a']) == 1
    q.push([('a', 5)])
    assert q.pull(limit=1) == ['a']


def test_queue_clear_empty_list_clears_all(tmp_path):
    """Reference 'if keys:' truthiness — clear([]) behaves like
    clear(None) and removes everything (pdict.py:488)."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    q = ParquetQueue(str(tmp_path / 'q'))
    q.push([('a', 1), ('b', 2)])
    assert q.clear(keys=[]) == 2
    assert len(q) == 0
    assert q.pull() == []


def test_queue_push_does_not_reread_segments(tmp_path, monkeypatch):
    """Scale contract: push dedupes against the in-memory hash index —
    no segment file is read after open (the round-1 version re-read
    every segment per push, O(n²) over pushes)."""
    import pyarrow.parquet as pq_mod
    from webscraping_ray.pipelines import frontier as F

    q = F.ParquetQueue(str(tmp_path / 'q'))
    reads = []
    real_read = pq_mod.read_table

    def counting_read(*a, **kw):
        reads.append(a)
        return real_read(*a, **kw)

    monkeypatch.setattr(F.pq, 'read_table', counting_read)
    for i in range(50):
        q.push([('k%d_%d' % (i, j), j % 7) for j in range(2000)])
    assert reads == []               # pushes never re-read segments
    assert len(q) == 100_000
    # duplicate push across segments still ignored
    q.push([('k0_0', 5), ('k49_1999', 5)])
    assert len(q) == 100_000
    # pull still returns global (priority desc, seq) order across all
    # 50 segments via the heap merge
    got = q.pull(limit=3)
    assert got == ['k0_6', 'k0_13', 'k0_20']


def test_queue_compaction_preserves_order(tmp_path):
    from webscraping_ray.pipelines.frontier import ParquetQueue

    class SmallCompact(ParquetQueue):
        COMPACT_SEGMENTS = 3
        COMPACT_TOMBSTONES = 5

    q = SmallCompact(str(tmp_path / 'q'))
    for i in range(6):
        q.push([('s%d_%d' % (i, j), (i + j) % 4) for j in range(10)])
    assert len(q._segments()) <= 3 + 1   # compacted
    assert len(q) == 60
    q.clear(keys=['s0_0', 's0_1', 's1_0', 's1_1', 's2_0', 's2_1'])
    assert len(q) == 54
    # reopen: index rebuilt from compacted segments
    q2 = SmallCompact(str(tmp_path / 'q'))
    assert len(q2) == 54
    pulled = q2.pull(limit=54)
    assert len(pulled) == 54
    assert 's0_0' not in pulled


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


def test_read_list_and_seed_iter(tmp_path):
    from webscraping_ray.pipelines.frontier import (read_list,
                                                    seed_iter_from_file)
    p = str(tmp_path / 'seeds.txt')
    with open(p, 'w') as f:
        f.write('http://a.com/\nhttp://b.com/\n\nhttp://c.com/\n')
    assert read_list(p) == ['http://a.com/', 'http://b.com/', '',
                            'http://c.com/']
    assert read_list(str(tmp_path / 'missing.txt')) == []
    assert list(seed_iter_from_file(p)) == ['http://a.com/',
                                            'http://b.com/', 'http://c.com/']


def test_unicode_writer_reference_semantics(tmp_path):
    """Reference common.UnicodeWriter surface (common.py:535-649):
    cell coercion, unique_by preload across reopen, BOM, auto-repair of
    a truncated file."""
    import csv

    from webscraping_ray.pipelines.frontier import UnicodeWriter

    p = str(tmp_path / 'out.csv')
    w = UnicodeWriter(p, unique=True, unique_by=[0], utf8_bom=True)
    w.writerow(['a', 1])
    w.writerow(['a', 2])          # dup by column 0 → dropped
    w.writerow(['b', None])       # None → ''
    w.writerow([b'c', 3.5])       # bytes → decoded, float → str
    w.close()
    raw = open(p, 'rb').read()
    assert raw.startswith(b'\xef\xbb\xbf')
    rows = list(csv.reader(open(p, encoding='utf-8-sig')))
    assert rows == [['a', '1'], ['b', ''], ['c', '3.5']]

    # reopen in append mode: unique cache preloads from the file
    w2 = UnicodeWriter(p, mode='a', unique=True, unique_by=[0])
    w2.writerow(['a', 99])        # still dup across runs
    w2.writerow(['d', 4])
    w2.close()
    rows = list(csv.reader(open(p, encoding='utf-8-sig')))
    assert [r[0] for r in rows] == ['a', 'b', 'c', 'd']

    # auto-repair: truncated trailing row (open quote) is dropped
    with open(p, 'a', newline='') as f:
        f.write('"broken,unterminated\n')
    w3 = UnicodeWriter(p, mode='a', auto_repair=True, unique=True)
    w3.writerow(['e', 5])
    w3.close()
    rows = list(csv.reader(open(p, encoding='utf-8-sig')))
    assert [r[0] for r in rows][-1] == 'e'


def test_seed_iter_crawl(ray_session):
    """url_iter parity: streamed seeds refill the frontier one at a
    time when it drains (reference add_iter_urls, download.py:795-801)."""
    from webscraping_ray.pipelines.crawl import Crawler
    from webscraping_ray.sources import corpus

    tbl = corpus.pages_table(120, n_hosts=3, seed=21)
    urls = sorted(set(tbl.column('url').to_pylist()))
    s1, s2 = urls[0], urls[1]
    pulled = []

    def gen():
        for u in (s1, s2):
            pulled.append(u)
            yield u

    v = Crawler(tbl, max_depth=1, max_links=5).run(seed_iter=gen())
    assert pulled == [s1, s2]
    # equivalent to seeding s1, crawling it out, then s2
    c2 = Crawler(tbl, max_depth=1, max_links=5)
    a = c2.run([s1])
    b = c2.run([s2])
    import pyarrow as pa
    want = pa.concat_tables([a, b])
    assert v.column('url').to_pylist() == want.column('url').to_pylist()
    assert v.column('depth').to_pylist() == want.column('depth').to_pylist()


def test_queue_claims_journal_replay_and_torn_tail(tmp_path):
    """Pulls commit via claims.log appends; reopen replays committed
    batches, and a torn final line (crash mid-append) means that pull
    never committed — its batch is re-offered."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('a', 3), ('b', 2), ('c', 1)])
    assert q.pull(limit=1) == ['a']
    assert q.pull(limit=1) == ['b']
    assert os.path.exists(os.path.join(root, 'claims.log'))
    # reopen: journaled claims hold, only 'c' remains
    q2 = ParquetQueue(root)
    assert q2.pull(limit=10) == ['c']
    # torn tail: corrupt the LAST line -> that pull is uncommitted
    with open(os.path.join(root, 'claims.log')) as f:
        lines = f.read().splitlines()
    with open(os.path.join(root, 'claims.log'), 'w') as f:
        f.write('\n'.join(lines[:-1] + [lines[-1][:len(lines[-1]) // 2]]))
    q3 = ParquetQueue(root)
    assert q3.pull(limit=10) == ['c']    # c's claim was the torn line


def test_queue_checkpoint_claims_rewind(tmp_path):
    """checkpoint_claims consolidates base+journal; restore_claims
    rewinds post-checkpoint pulls to unclaimed even if a stale
    claims.log survives (gen mismatch orphans it)."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('a', 3), ('b', 2), ('c', 1)])
    assert q.pull(limit=1) == ['a']          # journaled pre-checkpoint
    snap = str(tmp_path / 'ckpt.json')
    q.checkpoint_claims(snap)
    assert q.pull(limit=1) == ['b']          # post-checkpoint (in-flight)
    # crash + resume: rewind claims to the checkpoint
    ParquetQueue.restore_claims(snap, root)
    q2 = ParquetQueue(root)
    assert q2.pull(limit=10) == ['b', 'c']   # b re-offered, a stays claimed
    # the stale-log defence alone must also hold: restore WITHOUT
    # deleting claims.log (gen mismatch orphans the stale lines)
    q2.push([('d', 9)])
    assert q2.pull(limit=1) == ['d']
    import shutil
    shutil.copy(snap, os.path.join(root, 'claims.json'))
    q3 = ParquetQueue(root)
    assert q3.pull(limit=10) == ['d', 'b', 'c']   # priority desc


def test_queue_cursor_merges_late_high_priority_push(tmp_path):
    """The persistent merge cursor must yield later-pushed
    higher-priority keys before already-buffered lower ones — parity
    with a fresh-reopen merge (the sqlite ORDER BY semantics)."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('low1', 1), ('low2', 1), ('low3', 1)])
    assert q.pull(limit=1) == ['low1']       # cursor now mid-merge
    q.push([('hi', 9), ('mid', 5)])
    assert q.pull(limit=3) == ['hi', 'mid', 'low2']
    # cross-check: a fresh handle (restart merge) agrees on the rest
    q2 = ParquetQueue(root)
    assert q2.pull(limit=10) == ['low3']


def test_queue_pull_reads_each_row_once(tmp_path, monkeypatch):
    """The scale contract of the round-4 cursor: N queued rows cost
    O(N) iterator steps across ALL pulls of one handle, not
    O(N^2 / chunk) from per-pull merge restarts."""
    from webscraping_ray.pipelines import frontier as F
    root = str(tmp_path / 'q')
    q = F.ParquetQueue(root)
    n = 5000
    q.push([('k%05d' % i, i % 7) for i in range(n)])
    steps = 0
    orig = F.ParquetQueue._iter_segment

    def counting(self, seg, **kw):
        nonlocal steps
        for row in orig(self, seg, **kw):
            steps += 1
            yield row
    monkeypatch.setattr(F.ParquetQueue, '_iter_segment', counting)
    pulled = 0
    while True:
        batch = q.pull(97)
        if not batch:
            break
        pulled += len(batch)
    assert pulled == n
    assert steps <= n + 10, steps


def test_queue_fifo_mode_semantics(tmp_path):
    """fifo mode (the crawl's spill frontier): no per-key driver
    state — pulls in insertion order, one watermark claim, reopen
    fast-forwards via seq statistics, len survives restarts."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root, mode='fifo')
    q.push([('a', 0), ('b', 0)])
    q.push([('c', 0)])
    assert len(q) == 3
    assert q._hashes == set() and q._claimed == set()   # no key state
    assert q.pull(limit=2) == ['a', 'b']
    assert len(q) == 1
    # reopen: watermark holds, fast-forward offers only 'c'
    q2 = ParquetQueue(root)            # mode comes from the manifest
    assert q2.mode == 'fifo'
    assert len(q2) == 1
    q2.push([('d', 0)])
    assert q2.pull(limit=10) == ['c', 'd']
    assert len(q2) == 0
    # mixed priority and keyed clear are dedup-mode features
    import pytest
    with pytest.raises(ValueError):
        q2.push([('e', 5)])
    with pytest.raises(ValueError):
        q2.clear(keys=['c'])
    assert q2.clear() == 0             # clear-all allowed
    # mode mismatch guard
    with pytest.raises(ValueError):
        ParquetQueue(root, mode='dedup')


def test_queue_fifo_checkpoint_rewind(tmp_path):
    """fifo watermark checkpoint/restore: post-checkpoint pulls are
    re-offered after restore, pre-checkpoint ones stay claimed."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root, mode='fifo')
    q.push([('a', 0), ('b', 0), ('c', 0)])
    assert q.pull(limit=1) == ['a']
    snap = str(tmp_path / 'ckpt.json')
    q.checkpoint_claims(snap)
    assert q.pull(limit=1) == ['b']          # in-flight at the "crash"
    ParquetQueue.restore_claims(snap, root)
    q2 = ParquetQueue(root)
    assert len(q2) == 2
    assert q2.pull(limit=10) == ['b', 'c']


def _drain(q, limits):
    """Pull to exhaustion with a fixed limit schedule; returns the full
    [(key, priority)] sequence."""
    out = []
    i = 0
    while True:
        got = q.pull_entries(limits[i % len(limits)])
        i += 1
        if not got:
            return out
        out.extend(got)


def test_queue_crash_copy_equivalence_randomized(tmp_path):
    """The commit contract, differentially: after ANY committed op, a
    byte-copy of the queue directory reopened in a fresh handle must
    drain exactly like the live queue (same keys, priorities, order,
    len).  Randomized push/pull/clear interleavings, both modes, with
    the crash point chosen at every step."""
    import random
    import shutil

    from webscraping_ray.pipelines.frontier import ParquetQueue

    for mode in ('dedup', 'fifo'):
        for seed in range(6):
            rng = random.Random(1000 * (mode == 'fifo') + seed)
            root = str(tmp_path / ('q_%s_%d' % (mode, seed)))
            q = ParquetQueue(root, mode=mode)
            keyno = 0
            ever = []                       # keys ever pushed
            n_steps = rng.randint(4, 14)
            for _ in range(n_steps):
                r = rng.random()
                if r < 0.5:
                    km = {}
                    for _ in range(rng.randint(1, 30)):
                        if (mode == 'dedup' and ever
                                and rng.random() < 0.3):
                            k = rng.choice(ever)    # duplicate push
                        else:
                            k = 'k%06d' % keyno
                            keyno += 1
                            ever.append(k)
                        km[k] = 5 if mode == 'fifo' else rng.randint(0, 9)
                    q.push(list(km.items()))
                elif r < 0.8:
                    q.pull(rng.randint(1, 20))
                elif r < 0.9 and mode == 'dedup' and ever:
                    q.clear(rng.sample(ever,
                                       min(len(ever), rng.randint(1, 4))))
                else:
                    q.clear()               # clear-all (both modes)
            # crash: copy the committed on-disk state, reopen fresh
            snap = root + '_snap'
            shutil.copytree(root, snap)
            q2 = ParquetQueue(snap)
            assert len(q2) == len(q), (mode, seed)
            limits = [rng.randint(1, 17) for _ in range(3)]
            live = _drain(q, limits)
            reopened = _drain(q2, limits)
            assert reopened == live, (mode, seed)


def test_restore_claims_truncates_post_snapshot_pushes(tmp_path):
    """restore_claims rewinds PUSHES as well as pulls: rows with
    seq >= the snapshot's next_seq are physically truncated, so a
    crash between a wave's push and its checkpoint can't double keys
    when the resumed run re-discovers and re-pushes them (fifo mode
    has no hash index to absorb the re-push)."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root, mode='fifo')
    q.push([('a', 0), ('b', 0)])
    snap = str(tmp_path / 'ckpt.json')
    q.checkpoint_claims(snap)
    q.push([('c', 0), ('d', 0)])       # in-flight wave's push, then crash
    ParquetQueue.restore_claims(snap, root)
    q2 = ParquetQueue(root)
    assert len(q2) == 2
    # the resumed wave re-pushes the same keys; no duplicates pull
    q2.push([('c', 0), ('d', 0)])
    assert q2.pull(limit=10) == ['a', 'b', 'c', 'd']
    q2.close() if hasattr(q2, 'close') else None


def test_restore_claims_trims_compacted_straddle(tmp_path):
    """A post-checkpoint compaction merges pre- and post-snapshot rows
    into ONE segment; restore must trim it row-level (drop seq >=
    next_seq, keep the rest) rather than delete or keep whole files."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root, mode='fifo')
    q.push([('a', 0), ('b', 0)])
    snap = str(tmp_path / 'ckpt.json')
    q.checkpoint_claims(snap)
    q.push([('c', 0)])
    q._compact()                        # one straddling segment
    ParquetQueue.restore_claims(snap, root)
    q2 = ParquetQueue(root)
    assert q2.pull(limit=10) == ['a', 'b']
    # disk-wins counters resume at the snapshot point: the re-push of
    # 'c' reuses the crashed run's seq, keeping replay order identical
    q2.push([('c', 0)])
    assert q2.pull(limit=10) == ['c']


def test_restore_claims_truncates_dedup_mode_too(tmp_path):
    """Same rewind semantics in dedup mode: post-snapshot pushes are
    truncated (true snapshot-rewind), and the rebuilt hash index
    forgets them so they can be re-pushed."""
    from webscraping_ray.pipelines.frontier import ParquetQueue
    root = str(tmp_path / 'q')
    q = ParquetQueue(root)
    q.push([('a', 3)])
    snap = str(tmp_path / 'ckpt.json')
    q.checkpoint_claims(snap)
    q.push([('z', 9)])
    ParquetQueue.restore_claims(snap, root)
    q2 = ParquetQueue(root)
    assert len(q2) == 1
    q2.push([('z', 9)])                 # re-push is NOT absorbed: row truncated
    assert q2.pull(limit=10) == ['z', 'a']
