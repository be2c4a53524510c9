"""CorpusStore — "the web" as hash-bucketed Parquet.

The reference's page cache is a sqlite key→blob store
(``pdict.PersistentDict``, reference pdict.py:42-259); at corpus scale
the equivalent is an immutable Parquet dataset bucketed by
``url_hash64(url) % num_buckets``.  A frontier "fetch" then becomes a
partition-pruned read: only the buckets containing frontier URLs are
opened, with an ``isin`` row filter pushed into the Parquet scanner —
never a full-corpus scan per wave.

Layout::

    root/
      bucket=0/ *.parquet
      bucket=1/ *.parquet
      ...
      _corpus_meta.json        (num_buckets, schema fingerprint)

At 10^10-URL scale ``num_buckets`` would be O(10^4-10^5) so each bucket
is a few GB; lookups touch |distinct buckets of the wave| directories.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


from ..kernels.urls import url_hash64

META_NAME = '_corpus_meta.json'


def bucket_of(url: str, num_buckets: int) -> int:
    return url_hash64(url) % num_buckets


class AddBucket:
    """map_batches stage: append the store's bucket column."""

    def __init__(self, num_buckets: int):
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets = [url_hash64(u) % self.num_buckets
                   for u in batch.column('url').to_pylist()]
        return batch.append_column('bucket', pa.array(buckets, pa.int32()))


def write_corpus(pages_ds, root: str, num_buckets: int = 16,
                 row_group_size: int | None = None):
    """Write a pages Dataset as a hash-bucketed corpus store.

    ``pages_ds`` is a ``ray.data.Dataset`` with at least a ``url``
    column.  Output is partitioned by bucket so later fetch-joins prune
    at the directory level (resumable too: finished buckets can be
    skipped on re-run).
    """
    os.makedirs(root, exist_ok=True)
    ds = pages_ds.map_batches(AddBucket(num_buckets), batch_format='pyarrow')
    # sort by (bucket, url): each output block lands in 1-2 partition
    # dirs (O(blocks) files, not O(blocks x buckets)), and within-file
    # row groups get tight url min/max stats so frontier isin lookups
    # prune at the row-group level, not just the directory level
    ds = ds.sort(['bucket', 'url'])
    # optional small row groups: a frontier wave's urls are sparse
    # within a bucket's sorted url range, so row-group min/max stats
    # let lookup_table read only the touched groups — pays off when
    # rows-per-bucket >> wave-urls-per-bucket x group size (big
    # buckets, small waves); measured NEGATIVE on small buckets
    # (whole-bucket reads split into many groups cost more), hence
    # default None = pyarrow's large default
    kw = {'row_group_size': row_group_size} if row_group_size else {}
    ds.write_parquet(root, partition_cols=['bucket'], **kw)
    with open(os.path.join(root, META_NAME), 'w') as f:
        json.dump({'num_buckets': num_buckets,
                   'multi_snapshot': _detect_multi_snapshot(root, num_buckets)},
                  f)
    return root


def _detect_multi_snapshot(root: str, num_buckets: int) -> bool:
    """True iff any url appears more than once (a multi-snapshot WARC
    corpus).  Recorded in the store metadata at build time so the
    crawler's distributed wave tier only pays for latest-snapshot
    resolution when snapshots actually exist.

    Same-url snapshots always share a bucket (bucketing is by url
    hash), so the check is an embarrassingly parallel per-bucket
    unique-count over the url column only — one column-pruned linear
    pass at build time, one Ray task per bucket.
    """
    import glob

    import ray

    @ray.remote(num_cpus=1)
    def bucket_has_dup(files) -> bool:
        t = pads.dataset(files, format='parquet').to_table(columns=['url'])
        return len(pc.unique(t.column('url'))) < t.num_rows

    futs = []
    for b in range(num_buckets):
        files = sorted(glob.glob(os.path.join(root, 'bucket=%d' % b,
                                              '*.parquet')))
        if files:
            futs.append(bucket_has_dup.remote(files))
    return any(ray.get(futs)) if futs else False


class CorpusStore:
    """Read side of the bucketed corpus."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, META_NAME)) as f:
            meta = json.load(f)
        self.num_buckets = meta['num_buckets']
        # stores written before multi_snapshot detection existed default
        # to True — the safe direction (resolution runs, costing one
        # extra pruned (url, warc_ts) lookup per distributed wave)
        self.multi_snapshot = bool(meta.get('multi_snapshot', True))

    def _available_columns(self, sample_file, columns):
        """Intersect requested columns with the store schema (callers may
        ask for optional columns like warc_ts)."""
        if not columns:
            return columns
        import pyarrow.parquet as pq

        have = set(pq.ParquetFile(sample_file).schema_arrow.names)
        kept = [c for c in columns if c in have]
        return kept or None

    def _bucket_files(self, buckets):
        import glob

        files = []
        for b in sorted(buckets):
            files.extend(sorted(glob.glob(
                os.path.join(self.root, 'bucket=%d' % b, '*.parquet'))))
        return files

    #: above this many lookup urls the isin filter moves out of the
    #: parquet scan expression (which is serialized into EVERY read
    #: task — ~10 MB per task at 250k urls) into one ray.put broadcast
    #: read zero-copy by a post-read filter map.  Mega waves touch
    #: every row group anyway, so scan-level pushdown prunes nothing.
    BROADCAST_FILTER_THRESHOLD = 20_000

    def lookup_ds(self, urls, columns=None):
        """Ray Dataset of corpus rows whose url is in ``urls``.

        Partition-pruned (only the buckets of the given urls are read);
        the isin row filter is pushed to the Parquet scanner for small
        waves and applied as a broadcast post-read filter for big ones
        (see BROADCAST_FILTER_THRESHOLD).
        """
        import ray
        import ray.data

        by_bucket = {}
        for u in urls:
            by_bucket.setdefault(bucket_of(u, self.num_buckets), []).append(u)
        if not by_bucket:
            return None
        files = self._bucket_files(by_bucket)
        if not files:
            return None
        columns = self._available_columns(files[0], columns)
        want = pa.array(sorted(set(urls)), pa.string())
        if len(want) <= self.BROADCAST_FILTER_THRESHOLD:
            flt = pc.field('url').isin(want)
            return ray.data.read_parquet(files, columns=columns, filter=flt)
        want_ref = ray.put(want)

        def filter_urls(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t['url'], value_set=ray.get(want_ref)))

        return (ray.data.read_parquet(files, columns=columns)
                .map_batches(filter_urls, batch_format='pyarrow'))

    def _rg_spans(self, path):
        """Cached per-row-group (min_url, max_url) stats of one file.

        Built once per file per store handle from Parquet footer
        metadata (no data pages read); None if any group lacks url
        statistics (falls back to a full-file scan).
        """
        if not hasattr(self, '_rg_cache'):
            self._rg_cache = {}
        if path not in self._rg_cache:
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(path)
            md = pf.metadata
            try:
                col_idx = next(
                    i for i in range(md.num_columns)
                    if md.schema.column(i).name == 'url')
            except StopIteration:
                self._rg_cache[path] = (pf, None)
                return self._rg_cache[path]
            spans = []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                if st is None or not st.has_min_max:
                    spans = None
                    break
                spans.append((st.min, st.max))
            self._rg_cache[path] = (pf, spans)
        return self._rg_cache[path]

    def lookup_table(self, urls, columns=None) -> pa.Table:
        """Driver-side Arrow table lookup (small waves / tests).

        Reads ONLY the row groups whose url min/max range intersects
        the wanted urls (files are url-sorted per bucket with small row
        groups, so a 10-url wave reads ~10 groups, not the bucket) —
        pure pyarrow, no Ray tasks, which beats spinning Dataset read
        tasks for small frontier waves.
        """
        by_bucket = {}
        for u in urls:
            by_bucket.setdefault(bucket_of(u, self.num_buckets), []).append(u)
        if not by_bucket:
            return None
        tables = []
        full_scan = []          # files where pruning skips nothing
        import bisect
        import glob as _glob

        want_all = pa.array(sorted(set(urls)), pa.string())
        for b, us in sorted(by_bucket.items()):
            d = os.path.join(self.root, 'bucket=%d' % b)
            if not os.path.isdir(d):
                continue
            want_sorted = sorted(set(us))
            want_arr = pa.array(want_sorted, pa.string())
            for f in sorted(_glob.glob(os.path.join(d, '*.parquet'))):
                pf, spans = self._rg_spans(f)
                if spans is None:
                    full_scan.append(f)
                    continue
                groups = []
                for rg, (lo, hi) in enumerate(spans):
                    # any wanted url within [lo, hi]?
                    i = bisect.bisect_left(want_sorted, lo)
                    if i < len(want_sorted) and want_sorted[i] <= hi:
                        groups.append(rg)
                if not groups:
                    continue
                if len(groups) == len(spans):
                    # nothing skipped: the scan-pushed isin filter is
                    # faster than decode-then-filter
                    full_scan.append(f)
                    continue
                have = set(pf.schema_arrow.names)
                cols = ([c for c in columns if c in have] if columns
                        else None)
                tbl = pf.read_row_groups(groups, columns=cols)
                tbl = tbl.filter(pc.is_in(tbl['url'], value_set=want_arr))
                if tbl.num_rows:
                    tables.append(tbl)
        if full_scan:
            dset = pads.dataset(full_scan, format='parquet')
            have = set(dset.schema.names)
            cols = ([c for c in columns if c in have] if columns
                    else list(dset.schema.names)) or None
            tbl = dset.to_table(columns=cols,
                                filter=pc.field('url').isin(want_all))
            if tbl.num_rows:
                tables.append(tbl)
        if not tables:
            return None
        return pa.concat_tables(tables)

    def read_all(self, columns=None):
        """Full-corpus Dataset (for whole-corpus extraction pipelines)."""
        import ray.data

        return ray.data.read_parquet(self.root, columns=columns,
                                     file_extensions=['parquet'])
