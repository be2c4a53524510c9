"""Whole-corpus extraction sweep with resumable partitioned output.

The reference's batch mode is "iterate the whole page cache and run the
extractors" (reference pdict.py:168-183 ``PersistentDict.__iter__`` +
user loops over it); at 100 TB that loop must be a distributed job that
a failed run can pick up where it left off.  ``extract_corpus`` runs
one Ray Data job per STORE BUCKET (the store's native input shard):

* output is partitioned parquet — ``out_dir/bucket=K/*.parquet`` —
  one directory per input shard, never one giant file;
* each finished bucket commits a ``_DONE.json`` marker AFTER its
  parquet lands; a rerun skips marked buckets and clears the partial
  files of unmarked ones, so a killed sweep resumes at bucket
  granularity with exactly-once output;
* within a bucket the work is a plain streaming pipeline
  (``read_parquet -> map_batches(ExtractPages) -> write_parquet``),
  so parallelism inside each job is row-group-wide and the driver
  holds O(1) state per bucket.

Granularity: a 100-TB store has hundreds of buckets, so per-bucket
jobs give natural checkpoint spacing; at toy sizes the per-job fixed
latency dominates — ``resume=False`` collapses the sweep into ONE job
over the whole store (fastest, not resumable).
"""

from __future__ import annotations

import json
import os

from ..stages.extract_stage import ExtractPages

#: marker committed per finished bucket; presence = bucket complete
DONE_MARKER = '_DONE.json'


def extract_corpus(cs, out_dir: str, with_links: bool = True,
                   with_contacts: bool = False, with_excerpt: bool = False,
                   batch_size: int = 1024, resume: bool = True) -> dict:
    """Sweep every page of ``cs`` through :class:`ExtractPages` into
    ``out_dir/bucket=K/`` parquet; returns
    ``{'buckets', 'skipped', 'rows'}``.

    ``resume=True`` (default): per-bucket jobs + ``_DONE.json``
    markers; a rerun over the same ``out_dir`` skips finished buckets
    and redoes partial ones.  ``resume=False``: one streaming job over
    the whole store (no markers, no skip).
    """
    import ray.data

    stage = ExtractPages(with_links=with_links,
                         with_contacts=with_contacts,
                         with_excerpt=with_excerpt)
    os.makedirs(out_dir, exist_ok=True)

    if not resume:
        # a previous run's output is NOT marker-tracked in this mode:
        # stale bucket=K dirs (killed resumable run) or flat files
        # would be double-counted by _parquet_rows and double-read by
        # any consumer of out_dir
        _clear_output(out_dir)
        (cs.read_all(columns=['url', 'html'])
         .map_batches(stage, batch_format='pyarrow',
                      batch_size=batch_size)
         .write_parquet(out_dir))
        return {'buckets': cs.num_buckets, 'skipped': 0,
                'rows': _parquet_rows(out_dir)}

    # flat files from a previous resume=False run are outside the
    # marker protocol — clear them (bucket dirs are handled per bucket)
    for x in os.listdir(out_dir):
        p = os.path.join(out_dir, x)
        if os.path.isfile(p) and x.endswith('.parquet'):
            os.remove(p)

    done = skipped = rows = 0
    for b in range(cs.num_buckets):
        files = cs._bucket_files([b])
        if not files:
            continue
        bdir = os.path.join(out_dir, 'bucket=%d' % b)
        marker = os.path.join(bdir, DONE_MARKER)
        if os.path.exists(marker):
            with open(marker) as f:
                rows += json.load(f)['rows']
            skipped += 1
            continue
        if os.path.isdir(bdir):
            # partial output of a killed run: clear before redoing
            for f in os.listdir(bdir):
                os.remove(os.path.join(bdir, f))
        (ray.data.read_parquet(files, columns=['url', 'html'])
         .map_batches(stage, batch_format='pyarrow',
                      batch_size=batch_size)
         .write_parquet(bdir))
        n = _parquet_rows(bdir)
        tmp = marker + '.tmp'
        with open(tmp, 'w') as f:
            json.dump({'bucket': b, 'rows': n, 'files':
                       sorted(x for x in os.listdir(bdir)
                              if x.endswith('.parquet'))}, f)
        os.replace(tmp, marker)          # the commit point
        rows += n
        done += 1
    return {'buckets': done + skipped, 'skipped': skipped, 'rows': rows}


def _clear_output(d: str) -> None:
    """Remove every prior sweep artifact under ``d`` (flat parquet
    files and bucket=K partitions), leaving unrelated files alone."""
    import shutil

    for x in os.listdir(d):
        p = os.path.join(d, x)
        if os.path.isdir(p) and x.startswith('bucket='):
            shutil.rmtree(p)
        elif os.path.isfile(p) and x.endswith('.parquet'):
            os.remove(p)


def _parquet_rows(d: str) -> int:
    """Row count of a parquet dir from footer metadata only (no data
    pages decoded — the count must not re-execute the sweep)."""
    import pyarrow.parquet as pq

    total = 0
    for base, _dirs, names in os.walk(d):
        for x in names:
            if x.endswith('.parquet'):
                total += pq.ParquetFile(
                    os.path.join(base, x)).metadata.num_rows
    return total
