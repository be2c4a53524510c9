"""extract_corpus: resumable per-bucket whole-corpus extraction."""

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webscraping_ray.pipelines import sweep
from webscraping_ray.sources import corpus, store


def _rows(d):
    import pyarrow.dataset as pads

    t = pads.dataset(d, format='parquet').to_table(
        columns=['url', 'text'])
    return sorted(zip(t.column('url').to_pylist(),
                      t.column('text').to_pylist()))


def test_extract_corpus_resume_skips_finished(ray_session, tmp_path):
    ds = corpus.pages_dataset(400, n_hosts=6, seed=3,
                              override_num_blocks=4)
    root = str(tmp_path / 'store')
    store.write_corpus(ds, root, num_buckets=4)
    cs = store.CorpusStore(root)

    # ground truth: the one-job (non-resumable) sweep
    plain = str(tmp_path / 'plain')
    st0 = sweep.extract_corpus(cs, plain, with_contacts=True,
                               resume=False)
    assert st0['rows'] == 400

    out = str(tmp_path / 'out')
    st1 = sweep.extract_corpus(cs, out, with_contacts=True)
    assert st1 == {'buckets': 4, 'skipped': 0, 'rows': 400}
    assert _rows(out) == _rows(plain)

    # simulate a kill: un-commit one bucket (drop its marker) and
    # corrupt its parquet into a partial file
    victim = os.path.join(out, 'bucket=2')
    os.remove(os.path.join(victim, sweep.DONE_MARKER))
    part = [x for x in os.listdir(victim) if x.endswith('.parquet')]
    with open(os.path.join(victim, part[0]), 'w') as f:
        f.write('partial garbage')
    mtimes = {b: os.path.getmtime(os.path.join(out, b, sweep.DONE_MARKER))
              for b in os.listdir(out) if b != 'bucket=2'}

    st2 = sweep.extract_corpus(cs, out, with_contacts=True)
    assert st2['skipped'] == 3 and st2['buckets'] == 4
    assert st2['rows'] == 400
    assert _rows(out) == _rows(plain)           # partials fully redone
    for b, m in mtimes.items():                 # finished: untouched
        assert os.path.getmtime(
            os.path.join(out, b, sweep.DONE_MARKER)) == m
    with open(os.path.join(victim, sweep.DONE_MARKER)) as f:
        man = json.load(f)
    assert man['rows'] == sum(
        pq.ParquetFile(os.path.join(victim, x)).metadata.num_rows
        for x in man['files'])

    # a third run is a complete no-op
    st3 = sweep.extract_corpus(cs, out, with_contacts=True)
    assert st3 == {'buckets': 4, 'skipped': 4, 'rows': 400}


def test_mode_switch_clears_stale_generations(ray_session, tmp_path):
    """resume=False over a killed resumable run's out_dir must not
    count (or leave) the stale bucket=K generation; resume=True over a
    previous one-shot run must clear the untracked flat files."""
    ds = corpus.pages_dataset(200, n_hosts=4, seed=9,
                              override_num_blocks=2)
    root = str(tmp_path / 'store')
    store.write_corpus(ds, root, num_buckets=2)
    cs = store.CorpusStore(root)
    n_pages = cs.read_all(columns=['url']).count()

    out = str(tmp_path / 'out')
    # killed resumable run: bucket 0 finished, bucket 1 absent
    r1 = sweep.extract_corpus(cs, out, resume=True)
    assert r1['rows'] == n_pages
    # switch to one-shot mode over the same dir
    r2 = sweep.extract_corpus(cs, out, resume=False)
    assert r2['rows'] == n_pages                  # was ~2x pre-fix
    assert not [d for d in os.listdir(out) if d.startswith('bucket=')]
    assert len(_rows(out)) == n_pages
    # and back: resumable over the one-shot output clears flat files
    r3 = sweep.extract_corpus(cs, out, resume=True)
    assert r3['rows'] == n_pages
    assert len(_rows(out)) == n_pages
