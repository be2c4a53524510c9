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


def host_of(url: str) -> str:
    """Host (netloc) of a canonical url — the clustering key of the
    ``layout='host'`` store and the politeness frontier's shard key."""
    import urllib.parse

    return urllib.parse.urlsplit(url).netloc


def _hash_host(host: str) -> int:
    """blake2b-64 of a host string (same family as
    :func:`~webscraping_ray.kernels.urls.url_hash64`)."""
    import hashlib

    h = int.from_bytes(
        hashlib.blake2b(host.encode('utf-8', 'surrogatepass'),
                        digest_size=8).digest(), 'little')
    return h - (1 << 64) if h >= (1 << 63) else h


def host_hash64(url: str) -> int:
    """Stable 64-bit hash of the url's host."""
    return _hash_host(host_of(url))


#: urlsplit's netloc for absolute ``scheme://netloc...`` urls: a valid
#: scheme then everything up to the first ``/ ? #``.  Urls this regex
#: misses (scheme-relative, malformed) fall back to per-url urlsplit.
_NETLOC_PATTERN = r'^[A-Za-z][A-Za-z0-9+.\-]*://(?P<host>[^/?#]*)'


def _unique_hosts(urls) -> set:
    """Distinct hosts of ``urls`` in one vectorized regex pass (the
    match is definitionally equal to urlsplit's netloc for absolute
    urls; non-matching urls — rare in a canonicalized frontier — take
    the per-url urlsplit fallback)."""
    arr = (urls if isinstance(urls, (pa.Array, pa.ChunkedArray))
           else pa.array(urls, pa.string()))
    m = pc.extract_regex(arr, pattern=_NETLOC_PATTERN)
    out = set(pc.unique(
        pc.drop_null(pc.struct_field(m, 'host'))).to_pylist())
    miss = pc.is_null(m)
    if pc.any(miss).as_py():
        for u in pc.filter(arr, miss).to_pylist():
            out.add(host_of(u))
    return out


def bucket_of(url: str, num_buckets: int, layout: str = 'url') -> int:
    if layout == 'host':
        return host_hash64(url) % num_buckets
    return url_hash64(url) % num_buckets


def bucket_ids(urls, num_buckets: int, layout: str = 'url'):
    """Per-url store bucket as an int32 numpy array, vectorized:
    under ``layout='host'`` one arrow netloc pass + one blake2b per
    DISTINCT host (the ``AddBucket`` shape — per-url urlsplit+hash
    loops cost ~2.5 us/url, a measured driver serialization at
    mega-wave sizes); the url layout hashes per url by definition."""
    import numpy as np

    arr = (urls if isinstance(urls, (pa.Array, pa.ChunkedArray))
           else pa.array(urls, pa.string()))
    if layout == 'host':
        m = pc.extract_regex(pc.cast(arr, pa.string()),
                             pattern=_NETLOC_PATTERN)
        hosts = pc.struct_field(m, 'host').to_numpy(zero_copy_only=False)
        miss = pc.is_null(m).to_numpy(zero_copy_only=False)
        if miss.any():
            hosts = hosts.copy()
            raw = arr.to_pylist()
            for i in np.nonzero(miss)[0]:
                hosts[i] = host_of(raw[i])
        import pandas as pd

        inv, uniq = pd.factorize(hosts)          # hash-based, O(n)
        per_host = np.array([_hash_host(h) % num_buckets
                             for h in uniq], dtype=np.int32)
        return per_host[inv]
    return np.array([url_hash64(u) % num_buckets
                     for u in arr.to_pylist()], dtype=np.int32)


class AddBucket:
    """map_batches stage: append the store's bucket column."""

    def __init__(self, num_buckets: int, layout: str = 'url'):
        self.num_buckets = num_buckets
        self.layout = layout

    def __call__(self, batch: pa.Table) -> pa.Table:
        buckets = bucket_ids(batch.column('url'), self.num_buckets,
                             self.layout)
        return batch.append_column('bucket', pa.array(buckets, pa.int32()))


def write_corpus(pages_ds, root: str, num_buckets: int = 16,
                 row_group_size: int | None = None,
                 layout: str = 'url'):
    """Write a pages Dataset as a hash-bucketed corpus store.

    ``pages_ds`` is a ``ray.data.Dataset`` with at least a ``url``
    column.  Output is partitioned by bucket so later fetch-joins prune
    at the directory level (resumable too: finished buckets can be
    skipped on re-run).

    layout:
        ``'url'`` (default) buckets by url hash — bucket sizes are
        bounded by the hash regardless of host skew, the safe default
        for arbitrary corpora.  ``'host'`` buckets by HOST hash with
        urls sorted within the bucket, so one host's pages sit in one
        bucket in one contiguous url range: a frontier wave's per-host
        locality becomes row-group pruning (``lookup_ds`` /
        ``lookup_table`` read only the groups covering the wave's
        hosts) instead of a full scan of every touched bucket — the
        fix for mega-wave fetch amplification (BASELINE.md "Known
        scale bound").  A single pathological host can make its bucket
        large, but reads stay wave-proportional because of the
        row-group pruning; politeness-frontier shards (host-keyed)
        align 1:1 with store buckets in this layout.
    """
    if layout not in ('url', 'host'):
        raise ValueError(f'unknown layout {layout!r}')
    if layout == 'host' and row_group_size is None:
        # host pruning is only as granular as the row groups: pyarrow's
        # default (~1M rows) would make a whole bucket one group and
        # the min/max pruning a no-op.  8k rows/group keeps footer
        # metadata tiny (a few hundred spans per GB-scale bucket) while
        # letting a wave skip every host it doesn't touch.
        row_group_size = 8192
    # a bucket tree without the meta file is a KILLED PARTIAL BUILD —
    # writing again on top would duplicate rows (the meta file is the
    # build's commit marker; it is written last).  Clear the partial.
    if (not os.path.exists(os.path.join(root, META_NAME))
            and os.path.isdir(root)):
        import glob
        import shutil

        for d in glob.glob(os.path.join(root, 'bucket=*')):
            shutil.rmtree(d, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    ds = pages_ds.map_batches(AddBucket(num_buckets, layout),
                              batch_format='pyarrow')
    # sort by (bucket, url): each output block lands in 1-2 partition
    # dirs (O(blocks) files, not O(blocks x buckets)), and within-file
    # row groups get tight url min/max stats so frontier isin lookups
    # prune at the row-group level, not just the directory level.
    # Under layout='host' the url sort also clusters each host's pages
    # contiguously (urls of one host share the scheme://host prefix).
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
                   'layout': layout,
                   'file_groups': _collect_file_groups(root, num_buckets),
                   'multi_snapshot': _detect_multi_snapshot(root, num_buckets)},
                  f)
    return root


def _collect_file_groups(root: str, num_buckets: int) -> dict:
    """{relative path: [num_row_groups, num_rows]} for every store
    file — the build-time manifest that lets big-wave point reads
    split a file into bounded row-group chunks WITHOUT any driver-side
    footer reads at query time.  A skewed host (one bucket holding
    half the corpus under layout='host') then fans out over
    rows/chunk tasks instead of becoming one straggler read task.
    Collected with one Ray task per bucket at build time."""
    import glob

    import ray

    @ray.remote(num_cpus=1)
    def bucket_file_groups(files):
        import pyarrow.parquet as pq

        out = {}
        for f in files:
            md = pq.ParquetFile(f).metadata
            out[f] = [md.num_row_groups, md.num_rows]
        return out

    futs = []
    for b in range(num_buckets):
        files = sorted(glob.glob(os.path.join(root, 'bucket=%d' % b,
                                              '*.parquet')))
        if files:
            futs.append(bucket_file_groups.remote(files))
    merged = {}
    for d in ray.get(futs):
        for f, v in d.items():
            merged[os.path.relpath(f, root)] = v
    return merged


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


_POINT_READ_DS_CLS = None

#: point-read tasks slice their output into blocks of at most this
#: many rows, so a one-row-group file holding a dense wave's biggest
#: slab doesn't become one straggler extract task downstream
#: (measured on the 333k-url mega wave: the 8.7k-row block cost 3.8 s
#: in extract vs a 1.5 s task mean).  512 (not 2048) packs a 32-cpu
#: extract stage: the 120k-page full-kernel wave ran as 86 tasks of
#: 0.96-8.78 s at 2048 rows (2.7 task rounds, tail-bound, 70%
#: utilization) vs best-of-2 walls 18.8->16.0 s at 32 cpus and
#: 55.2->52.6 s at 8 cpus with 512-row blocks (8->32 efficiency
#: 0.63->0.82); 256 regresses (20.8 s) on per-task overhead.
POINT_READ_OUT_ROWS = 512

#: byte bound on the same slices: extract cost tracks html bytes, so
#: blocks also split when their html payload passes this budget —
#: keeps the downstream task-cost spread tight under Zipf page sizes
POINT_READ_OUT_BYTES = 4 << 20

def _slice_bounded(t, max_rows=None, max_bytes=None):
    """Zero-copy slices of table ``t`` bounded by BOTH row count and
    html-payload bytes.  The extract stage's per-task cost tracks page
    bytes, so a row-count-only bound leaves a task-cost spread when
    page sizes skew (Zipf hosts); every slice holds at most
    ``max_rows`` rows AND (unless a single page exceeds it) at most
    ``max_bytes`` of html."""
    import numpy as np

    max_rows = POINT_READ_OUT_ROWS if max_rows is None else max_rows
    max_bytes = POINT_READ_OUT_BYTES if max_bytes is None else max_bytes
    if t.num_rows == 0 or (t.num_rows <= max_rows
                           and 'html' not in t.column_names):
        return [t]
    cuts = [0]
    if 'html' in t.column_names:
        sizes = pc.fill_null(pc.binary_length(
            t['html'].cast(pa.binary())), 0).to_numpy(zero_copy_only=False)
        csum = np.cumsum(sizes, dtype=np.int64)
        if t.num_rows <= max_rows and int(csum[-1]) <= max_bytes:
            return [t]
        a = 0
        while a < t.num_rows:
            base = csum[a - 1] if a else 0
            b = int(np.searchsorted(
                csum, base + max_bytes, side='right'))
            b = min(max(b, a + 1), a + max_rows, t.num_rows)
            cuts.append(b)
            a = b
    else:
        cuts.extend(range(max_rows, t.num_rows, max_rows))
        cuts.append(t.num_rows)
    return [t.slice(a, b - a) for a, b in zip(cuts, cuts[1:]) if b > a]


#: per-worker-process cache of the materialized wanted-url array
#: (sorted numpy object array for the row-group min/max probes):
#: workers are reused across a wave's read tasks, so the O(wave)
#: arrow->python conversion happens once per worker, not once per task
_WANT_CACHE: dict = {}


def _wanted_arrays(want_ref):
    import ray

    hit = _WANT_CACHE.get(want_ref)
    if hit is None:
        wanted = ray.get(want_ref)          # zero-copy shared memory
        hit = (wanted, wanted.to_numpy(zero_copy_only=False))
        _WANT_CACHE.clear()                 # one live wave per worker
        _WANT_CACHE[want_ref] = hit
    return hit


def _point_read_datasource_cls():
    """The ``_PointReadDatasourceImpl`` subclass of
    ``ray.data.Datasource``, created lazily (this module must import
    ray-free for the kernel layer) and cached."""
    global _POINT_READ_DS_CLS
    if _POINT_READ_DS_CLS is None:
        from ray.data.datasource import Datasource

        _POINT_READ_DS_CLS = type('_PointReadDatasourceImpl',
                                  (_PointReadDatasource, Datasource), {})
    return _POINT_READ_DS_CLS


class _PointReadDatasource:
    """Datasource for :meth:`CorpusStore._pruned_point_read`: one
    ReadTask per row-group chunk with a real decoded-size estimate, so
    the streaming executor schedules chunks as parallel tasks instead
    of bundling the tiny descriptors into one (see the measurement in
    ``_pruned_point_read``'s docstring)."""

    def __init__(self, items, want_ref, cols, schema, postprocess=None,
                 out_schema=None):
        self.items = items          # [(path, lo, hi, est_bytes)]
        self.want_ref = want_ref
        self.cols = cols
        self.schema = schema
        # optional fused per-slice transform (e.g. the crawl's
        # extract+prep): runs INSIDE the read task so the html bytes
        # never cross the object store between read and extract —
        # Ray 2.49 does not fuse a Datasource read with downstream
        # map_batches, and a mega wave's html traffic through plasma
        # is the single-host memory-bus term in the wave-chain
        # scaling decomposition (BASELINE round-4)
        self.postprocess = postprocess
        self.out_schema = out_schema or schema

    def get_name(self) -> str:
        return 'CorpusPointRead'

    def estimate_inmemory_data_size(self):
        return sum(it[3] for it in self.items)

    def get_read_tasks(self, parallelism: int):
        import ray
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        import pyarrow.parquet as pq

        want_ref, cols, schema = self.want_ref, self.cols, self.schema
        postprocess, out_schema = self.postprocess, self.out_schema

        def make_read(path, lo, hi):
            def _read():
                import numpy as np

                pf = pq.ParquetFile(path)
                md = pf.metadata
                span = range(lo, md.num_row_groups if hi < 0
                             else min(hi, md.num_row_groups))
                if want_ref is None:
                    # full-scan mode (read_all fused path): every
                    # in-range group, no url filter
                    groups = list(span)
                else:
                    wanted, wnp = _wanted_arrays(want_ref)
                    try:
                        ci = next(i for i in range(md.num_columns)
                                  if md.schema.column(i).name == 'url')
                        groups = []
                        for rg in span:
                            st = md.row_group(rg).column(ci).statistics
                            if st is None or not st.has_min_max:
                                groups = list(span)
                                break
                            i = int(np.searchsorted(wnp, st.min))
                            if i < len(wnp) and wnp[i] <= st.max:
                                groups.append(rg)
                    except StopIteration:
                        groups = list(span)
                if not groups:
                    return [out_schema.empty_table()]
                t = pf.read_row_groups(groups, columns=cols)
                if want_ref is not None:
                    t = t.filter(pc.is_in(t['url'], value_set=wanted))
                t = t.select(schema.names)
                # zero-copy slices bounded by rows AND html bytes;
                # the fused postprocess runs per slice, so peak task
                # memory is one byte-bounded slice's html plus its
                # extracted columns — the html never leaves the task
                slices = _slice_bounded(t)
                if postprocess is not None:
                    slices = [postprocess(s) for s in slices]
                return slices
            return _read

        return [ReadTask(make_read(path, lo, hi),
                         BlockMetadata(num_rows=None, size_bytes=est,
                                       exec_stats=None,
                                       input_files=[path]),
                         schema=out_schema)
                for path, lo, hi, est in self.items]


class CorpusStore:
    """Read side of the bucketed corpus."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, META_NAME)) as f:
            meta = json.load(f)
        self.num_buckets = meta['num_buckets']
        # stores written before the layout option existed are url-hash
        # bucketed
        self.layout = meta.get('layout', 'url')
        # build-time file manifest {relpath: [n_row_groups, n_rows]}
        # (absent on stores written before round 4: point reads fall
        # back to one task per file)
        self.file_groups = meta.get('file_groups', {})
        # stores written before multi_snapshot detection existed default
        # to True — the safe direction (resolution runs, costing one
        # extra pruned (url, warc_ts) lookup per distributed wave)
        self.multi_snapshot = bool(meta.get('multi_snapshot', True))

    def _bucket_of(self, url: str) -> int:
        return bucket_of(url, self.num_buckets, self.layout)

    def _touched_buckets(self, urls) -> set:
        """Distinct store buckets touched by ``urls`` — the partition
        pruning set for the big-wave paths.  Early-exits once every
        bucket is seen (coupon collector: a uniform mega wave resolves
        after ~B ln B hashes instead of O(wave) — measured 2.5 us/url
        on the 333k-url mega-wave manifest build before this); under
        ``layout='host'`` the urls' hosts are deduped with one
        vectorized netloc pass first, so blake2b runs once per
        distinct host, not once per url."""
        nb = self.num_buckets
        buckets: set = set()
        if self.layout == 'host':
            for h in _unique_hosts(urls):
                buckets.add(_hash_host(h) % nb)
                if len(buckets) == nb:
                    break
        else:
            for u in urls:
                buckets.add(url_hash64(u) % nb)
                if len(buckets) == nb:
                    break
        return buckets

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

    def lookup_ds(self, urls, columns=None, postprocess=None):
        """Ray Dataset of corpus rows whose url is in ``urls``.

        Partition-pruned (only the buckets of the given urls are read);
        the isin row filter is pushed to the Parquet scanner for small
        waves and applied after a ROW-GROUP-PRUNED distributed point
        read for big ones (each read task opens only its file's footer,
        keeps the row groups whose url min/max range intersects the
        wanted urls, and filters the decoded batch against the
        broadcast url set).  Under ``layout='host'`` a wave's per-host
        url locality makes that pruning sharp — big-wave fetches decode
        close to only the rows they keep instead of the whole bucket.

        ``postprocess``: optional (pa.Table) -> pa.Table transform
        FUSED into the read.  On the point-read path it runs inside
        each read task per byte-bounded slice, so e.g. the crawl's
        extract stage consumes html in-task and the raw page bytes
        never cross the object store; on the small-wave read_parquet
        path it is applied as a map stage (same dataset semantics,
        Ray fuses read→map for plain parquet reads).
        """
        import ray
        import ray.data

        buckets = self._touched_buckets(urls)
        if not buckets:
            return None
        files = self._bucket_files(buckets)
        if not files:
            return None
        columns = self._available_columns(files[0], columns)
        want = pa.array(sorted(set(urls)), pa.string())
        if len(want) <= self.BROADCAST_FILTER_THRESHOLD:
            flt = pc.field('url').isin(want)
            ds = ray.data.read_parquet(files, columns=columns, filter=flt)
            if postprocess is not None:
                ds = ds.map_batches(postprocess, batch_format='pyarrow')
            return ds
        return self._pruned_point_read(files, want, columns,
                                       postprocess=postprocess)

    #: target row-group count per point-read task: with the default
    #: 8192-row host-layout groups this is ~128k rows/task, so a
    #: skewed host (one huge bucket file) fans out instead of becoming
    #: one straggler read+decode task.
    POINT_READ_GROUPS_PER_TASK = 16

    def _pruned_point_read(self, files, want: pa.Array, columns,
                           postprocess=None):
        """Distributed row-group-pruned point read: one ReadTask per
        row-group CHUNK (the build-time ``file_groups`` manifest splits
        each file into POINT_READ_GROUPS_PER_TASK-group ranges with no
        driver-side footer reads); each task reads its file's footer,
        selects only the in-range groups whose url min/max intersects
        the (broadcast, zero-copy) sorted wanted-url array, decodes
        those groups, and isin-filters.  Driver state is O(tasks)
        paths+ranges.

        Implemented as a ``ray.data.Datasource`` so every chunk carries
        a real ``size_bytes`` estimate: ``from_items`` descriptor blocks
        are ~100 B each, and Ray Data's map operator bundles input
        blocks up to ``target_max_block_size`` — which packed EVERY
        chunk of a mega wave into 1-2 tasks and serialized the whole
        fetch+extract chain (measured: 292k-row wave, 329 chunks → 2
        tasks, 168 s; with ReadTask size metadata the executor
        schedules chunks individually → 12 s at 32 cpus)."""
        import ray
        import ray.data

        import pyarrow.parquet as pq

        want_ref = ray.put(want) if want is not None else None
        schema = pq.read_schema(files[0])
        if columns:
            schema = pa.schema([schema.field(c) for c in columns
                                if c in schema.names])
        cols = list(schema.names) if columns else None

        step = self.POINT_READ_GROUPS_PER_TASK
        items = []
        for f in files:
            ng = self.file_groups.get(os.path.relpath(f, self.root),
                                      [None])[0]
            fsize = None
            if ng is None:
                # pre-manifest store: one task reads the whole file
                items.append((f, 0, -1, self._file_size(f)))
            else:
                fsize = self._file_size(f)
                for lo in range(0, ng, step):
                    hi = min(lo + step, ng)
                    # decoded-bytes estimate: compressed span bytes x3
                    items.append((f, lo, hi,
                                  int(fsize * (hi - lo) / max(1, ng)) * 3))
        out_schema = schema
        if postprocess is not None:
            # resolve the fused output schema once on the driver (the
            # transform on an empty table is cheap and pure)
            out_schema = postprocess(schema.empty_table()).schema
        src = _point_read_datasource_cls()(items, want_ref, cols, schema,
                                           postprocess=postprocess,
                                           out_schema=out_schema)
        return ray.data.read_datasource(src,
                                        override_num_blocks=len(items))

    def _file_size(self, path: str) -> int:
        if not hasattr(self, '_fsize_cache'):
            self._fsize_cache = {}
        if path not in self._fsize_cache:
            self._fsize_cache[path] = os.path.getsize(path)
        return self._fsize_cache[path]

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
            by_bucket.setdefault(self._bucket_of(u), []).append(u)
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

    def total_bytes(self) -> int:
        """Total store file bytes (cheap: one os.stat per file, cached)
        — the input to the crawler's resident-corpus memory gate."""
        if not hasattr(self, '_total_bytes'):
            import glob

            self._total_bytes = sum(
                os.path.getsize(f) for f in glob.glob(
                    os.path.join(self.root, 'bucket=*', '*.parquet')))
        return self._total_bytes

    def content_token(self) -> tuple:
        """Cheap content fingerprint of the store's files (count, total
        bytes, newest mtime) — keys caches of store CONTENT (the
        resident fleet registry), so a store rewritten at the same
        root reads as a different store instead of serving stale
        pages.  One os.stat per file, cached on the handle; only paid
        on the resident path, which the memory gate turns off at
        corpus sizes where per-file stats would matter."""
        if not hasattr(self, '_content_token'):
            import glob

            n = b = m = 0
            for f in glob.glob(os.path.join(self.root, 'bucket=*',
                                            '*.parquet')):
                st = os.stat(f)
                n += 1
                b += st.st_size
                m = max(m, st.st_mtime_ns)
            self._content_token = (n, b, m)
        return self._content_token

    def pruned_decode_rows(self, urls) -> int:
        """Rows the pruned point read decodes for this url set — the
        fetch-amplification numerator (BASELINE.md "Known scale
        bound"; decoded/kept ~9x on url-hash mega waves, the host
        layout's row-group pruning is the fix).  Footer metadata only
        (no data pages read); same group selection as
        ``_pruned_point_read`` / ``lookup_table``."""
        import bisect

        wl = sorted(set(urls))
        decoded = 0
        for f in self._bucket_files(self._touched_buckets(urls)):
            pf, spans = self._rg_spans(f)
            md = pf.metadata
            if spans is None:
                decoded += md.num_rows
                continue
            for rg, (lo, hi) in enumerate(spans):
                i = bisect.bisect_left(wl, lo)
                if i < len(wl) and wl[i] <= hi:
                    decoded += md.row_group(rg).num_rows
        return decoded

    def read_all(self, columns=None, postprocess=None):
        """Full-corpus Dataset (for whole-corpus extraction pipelines).

        ``postprocess``: optional (pa.Table) -> pa.Table transform
        FUSED into the read tasks (the same mechanism as
        :meth:`lookup_ds`): the corpus store's row-group-chunked
        datasource runs it per byte-bounded slice inside each read
        task, so e.g. a whole-corpus extraction sweep consumes html
        in-task and the raw page bytes never cross the object store —
        at 32 cpus the sweep is memory-bandwidth-bound, and this hop
        is the largest removable traffic."""
        import glob as _glob

        import ray.data

        if postprocess is None:
            return ray.data.read_parquet(self.root, columns=columns,
                                         file_extensions=['parquet'])
        files = sorted(_glob.glob(os.path.join(
            self.root, '**', '*.parquet'), recursive=True))
        columns = self._available_columns(files[0], columns)
        return self._pruned_point_read(files, None, columns,
                                       postprocess=postprocess)
