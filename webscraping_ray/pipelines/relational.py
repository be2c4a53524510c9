"""Relational/dataflow operator suite over the driver testdata tables.

Each function maps a reference operator (SURVEY.md §2) onto the
idiomatic Ray Data shape and takes ``sf_dir`` → Dataset / pyarrow
Table.  Oracle SQL lives in ``__ray_entry__.oracle_sql``; column names
match the SQL aliases exactly.

Patterns used (and why):
- **broadcast join** for small dimension sides (``ray.put`` once, dict
  lookup per batch) — no shuffle (reference lookup ≙ cache hash join).
- **partial aggregation** inside map_batches before the groupby — the
  shuffle carries one row per key per batch, not per input row.
- **vectorized batch kernels** — pyarrow.compute / numpy / pandas; the
  per-row python kernels (normalize, xpath, emails) run inside
  map_batches bodies over whole columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ASOF_CUTOFF = '2024-01-15 00:00:00'


def _snap_round(t: pa.Table, col: str, nd: int = 2) -> pa.Table:
    """Round ``col`` to ``nd`` decimals, snapping to the nearest
    representable double of the decimal (numpy scaled-rint semantics,
    matching DuckDB ``round``).  ``pc.round`` must NOT be used for
    oracle-compared floats: Arrow's algorithm preserves summation-order
    ulp drift (pc.round(199.42000000000002, 2) == 199.42000000000002),
    so two sums that differ only in reduction order hash differently."""
    arr = t[col].to_numpy(zero_copy_only=False)
    scale = 10.0 ** nd
    # + 0.0 normalizes -0.0 (a prefix-sum difference that rounds to
    # zero keeps the sign bit, which breaks byte-level hash compares)
    snapped = np.rint(arr * scale) / scale + 0.0
    return t.set_column(t.schema.get_field_index(col), col,
                        pa.array(snapped, pa.float64()))


def _strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (the pandas blob parquet writers
    attach): Ray's shuffle/join schema-dedup tries to hash it and logs
    'Failed to hash the schemas ... unhashable type' on every join.
    Zero-copy (metadata-only) and fused into the read stage."""
    return t.replace_schema_metadata(None)


def _read(sf_dir: str, name: str, columns=None):
    """Pruned parquet read with metadata-free schema: passing the
    footer schema stripped of the pandas metadata blob stops Ray's
    shuffle/join schema-dedup from trying to hash an unhashable dict
    (warning spam) at the source; ``_strip_meta`` still covers blocks
    whose batches re-attach metadata."""
    import pyarrow.parquet as pq
    import ray.data

    path = f'{sf_dir}/{name}.parquet'
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return (ray.data.read_parquet(path, columns=columns, schema=schema)
            .map_batches(_strip_meta, batch_format='pyarrow'))


def _per_key_groups(ds, key: str, fn, buckets: int = 64):
    """``ds.groupby(key).map_groups(fn)`` without per-key Ray groups.

    Ray's group-apply costs ~10 ms per group (measured; see
    tfidf_top_terms history), so grouping a corpus-cardinality key
    (user_id, custkey, url) pays O(keys) fixed overhead.  This shuffles
    by a COARSE bucket of the key (Ray sees ``buckets`` groups) and
    runs ``fn`` per key inside a pandas groupby within the bucket —
    identical per-key inputs, identical rows out, 64 group-applies
    total.  Integer keys bucket by Fibonacci hashing, strings by
    crc32, so skewless key spaces spread evenly."""
    import zlib

    if buckets & (buckets - 1):
        raise ValueError('buckets must be a power of two')
    shift = 64 - buckets.bit_length() + 1

    def bucketed(t: pa.Table) -> pa.Table:
        col = t.column(key)
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            bkt = ((v * np.uint64(0x9E3779B97F4A7C15))
                   >> np.uint64(shift)).astype(np.int64)
        else:
            bkt = np.array([zlib.crc32(str(x).encode()) & (buckets - 1)
                            for x in col.to_pylist()], np.int64)
        return t.append_column('_bkt', pa.array(bkt, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=['_bkt'])
        # dropna=False: null keys form a group like ds.groupby did,
        # instead of pandas' default silent row drop
        outs = [fn(sub)
                for _, sub in g.groupby(key, sort=False, dropna=False)]
        return pd.concat(outs, ignore_index=True)

    return (ds.map_batches(bucketed, batch_format='pyarrow')
            .groupby('_bkt').map_groups(per_bucket,
                                        batch_format='pandas'))


# ---------------------------------------------------------------------------
# aggregations (reference State counters, download.py:898-917)

def agg_counters(sf_dir: str):
    """events by event_type → n, sum_value (crawl-counter analog)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, 'events', ['event_type', 'value'])
    out = ds.groupby('event_type').aggregate(
        Count(alias_name='n'), Sum('value', alias_name='sum_value'))
    return out.map_batches(lambda t: _snap_round(t, 'sum_value'),
                           batch_format='pyarrow')


def count_by_lang(sf_dir: str):
    """documents by lang → n_docs, sum_chars."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, 'documents', ['lang', 'n_chars'])
    return ds.groupby('lang').aggregate(
        Count(alias_name='n_docs'), Sum('n_chars', alias_name='sum_chars'))


#: pivot_user_events closed column domain (events.event_type values);
#: anything outside it counts into n_other.
PIVOT_EVENT_TYPES = ('click', 'error', 'purchase', 'signup', 'view')


def pivot_user_events(sf_dir: str):
    """Wide pivot / crosstab — the classic PIVOT relational op: one
    row per user with a count column per event type
    (:data:`PIVOT_EVENT_TYPES`), plus ``n_other`` for values outside
    the closed domain so nothing is silently dropped.

    Combiner shape: every batch emits a per-user partial crosstab
    (≤ users-in-batch rows × 6 int columns), then ONE groupby-sum —
    event-type strings never enter the shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['user_id', 'event_type'])
    cols = ['n_' + t for t in PIVOT_EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df['user_id'], df['event_type'])
        known = ct.reindex(columns=list(PIVOT_EVENT_TYPES), fill_value=0)
        extra = [c for c in ct.columns if c not in PIVOT_EVENT_TYPES]
        out = known.astype('int64')
        out.columns = cols
        out['n_other'] = (ct[extra].sum(axis=1).astype('int64')
                          if extra else 0)
        return out.reset_index()

    partials = ds.map_batches(partial, batch_format='pandas')
    return partials.groupby('user_id').aggregate(
        *[Sum(c, alias_name=c) for c in cols + ['n_other']])


def events_user_running(sf_dir: str):
    """Per-user ORDERED window functions over the event stream — the
    running value total (``SUM OVER``) and the inter-arrival gap
    (``LAG``), the per-entity signals session and recrawl models
    consume.  Events order by (ts, event_id) within user; the first
    event's ``gap_us`` is 0 by contract.

    Returns (event_id, cum_value, gap_us).  The per-user ordering
    runs in :func:`_per_key_groups` coarse buckets (64 group-applies,
    not O(users)); only (event_id, user_id, ts, value) rows shuffle."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        gap = g['ts'].astype('int64').diff().fillna(0).astype('int64')
        return pd.DataFrame({'event_id': g['event_id'],
                             'cum_value': g['value'].cumsum(),
                             'gap_us': gap})

    return _per_key_groups(ds, 'user_id', run)


def events_window(sf_dir: str):
    """Tumbling 1-hour windows per event_type (streaming-window analog).

    Partial aggregation per batch (event_type, hour) → small groupby.
    """
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['event_type', 'ts', 'value'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df['ts'].dt.floor('h'))
        g = df.groupby(['event_type', 'window_start'], as_index=False).agg(
            n=('value', 'size'), sum_value=('value', 'sum'))
        return g

    partials = ds.map_batches(partial, batch_format='pandas')
    out = partials.groupby(['event_type', 'window_start']).aggregate(
        Sum('n', alias_name='n'), Sum('sum_value', alias_name='sum_value'))

    def finish(t: pa.Table) -> pa.Table:
        t = _snap_round(t, 'sum_value')
        # normalize to timestamp[us] (pandas floor gives ns; DuckDB
        # date_trunc gives us — align so the driver's value hash agrees)
        idx = t.schema.get_field_index('window_start')
        return t.set_column(idx, 'window_start',
                            t['window_start'].cast(pa.timestamp('us')))

    return out.map_batches(finish, batch_format='pyarrow')


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user event sessions split at >gap idle
    (the streaming-window pattern — ordered log partitioned by key,
    windowed inside ``map_groups`` over the ts-sorted group)."""
    ds = _read(sf_dir, 'events', ['user_id', 'event_id', 'ts', 'value'])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        new_session = (g['ts'].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            user_id=('user_id', 'first'),
            session_start=('ts', 'min'),
            n_events=('event_id', 'size'),
            sum_value=('value', 'sum'))
        out['sum_value'] = out['sum_value'].round(2)
        out['session_start'] = out['session_start'].astype('datetime64[us]')
        return out.reset_index(drop=True)

    return _per_key_groups(ds, 'user_id', sessionize)


def recrawl_schedule(sf_dir: str, base_interval_s: int = 86400):
    """Freshness-driven recrawl scheduling (Cho & Garcia-Molina 2003's
    change-frequency estimator, applied the way an incremental crawler
    plans its frontier): the events log is the fetch history — each
    row one observation of a page (``user_id``), ``event_type`` the
    observed content class.  Per page: number of observations, number
    of CHANGES (consecutive observations, ts-then-event_id order, with
    a different event_type), last-observation ts, and
    ``next_fetch_ts = last_ts + base_interval / (n_changes + 1)``
    (integer-microsecond floor division — hot pages refetch sooner).

    100-TB shape: one coarse-bucketed group-apply over (user_id, ts,
    event_type) — the same `_per_key_groups` pattern as
    sessionization; no driver state, output one row per page.
    """
    ds = _read(sf_dir, 'events',
               ['user_id', 'event_id', 'ts', 'event_type'])
    base_us = base_interval_s * 1_000_000

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        changed = g['event_type'].ne(g['event_type'].shift())
        n_changes = int(changed.iloc[1:].sum())
        last_us = int(g['ts'].iloc[-1].value // 1000)  # ns -> us
        return pd.DataFrame({
            'user_id': [g['user_id'].iloc[0]],
            'n_fetches': np.array([len(g)], np.int64),
            'n_changes': np.array([n_changes], np.int64),
            'last_ts': pd.Series(
                [g['ts'].iloc[-1]]).astype('datetime64[us]'),
            'next_fetch_ts': pd.Series(
                [pd.Timestamp(
                    (last_us + base_us // (n_changes + 1)) * 1000)]
            ).astype('datetime64[us]')})

    return _per_key_groups(ds, 'user_id', schedule)


def distinct_event_types(sf_dir: str):
    """Distinct values (ds.unique — a shuffle-backed set op)."""
    ds = _read(sf_dir, 'events', ['event_type'])
    vals = sorted(ds.unique('event_type'))
    return pa.table({'event_type': pa.array(vals, pa.string())})


def events_sliding_window(sf_dir: str, window_s: int = 3600,
                          slide_s: int = 1800):
    """SLIDING windows (1 h window, 30 min slide): each event explodes
    into window_s/slide_s window keys inside ``map_batches`` (the
    streaming hop-window pattern), partial-aggregated per batch, then
    one small groupby — shuffle rows are per (window, type) partials,
    never per event."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['event_type', 'ts', 'value'])
    hops = window_s // slide_s

    def explode_partial(df: pd.DataFrame) -> pd.DataFrame:
        epoch = df['ts'].astype('int64') // 1_000_000   # seconds
        frames = []
        for k in range(hops):
            ws = (epoch - k * slide_s) // slide_s * slide_s
            frames.append(pd.DataFrame({
                'event_type': df['event_type'],
                'window_start': pd.to_datetime(ws * 1_000_000_000),
                'value': df['value'],
            }))
        allf = pd.concat(frames, ignore_index=True)
        return allf.groupby(['event_type', 'window_start'],
                            as_index=False).agg(
            n=('value', 'size'), sum_value=('value', 'sum'))

    out = (ds.map_batches(explode_partial, batch_format='pandas')
           .groupby(['event_type', 'window_start'])
           .aggregate(Sum('n', alias_name='n'),
                      Sum('sum_value', alias_name='sum_value')))

    def finish(t: pa.Table) -> pa.Table:
        t = _snap_round(t, 'sum_value')
        idx = t.schema.get_field_index('window_start')
        return t.set_column(idx, 'window_start',
                            t['window_start'].cast(pa.timestamp('us')))

    return out.map_batches(finish, batch_format='pyarrow')


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Per-group top-k (top-3 orders by price per customer): per-batch
    partial top-k per key inside ``map_batches`` (the combiner
    pattern — shuffle carries ≤ k rows per (key, batch)), then the
    exact per-key merge in ``map_groups`` over the reduced rows."""
    ds = _read(sf_dir, 'orders', ['o_custkey', 'o_orderkey', 'o_totalprice'])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(['o_totalprice', 'o_orderkey'],
                            ascending=[False, True])
        return df.groupby('o_custkey', as_index=False).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['o_totalprice', 'o_orderkey'],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g['rank'] = (g.index + 1).astype('int64')
        return g

    return _per_key_groups(
        ds.map_batches(partial_topk, batch_format='pandas'),
        'o_custkey', final_topk)


def top_ngrams(sf_dir: str, n: int = 3, k: int = 100):
    """Corpus-wide top-k word n-grams (dataset-statistics op for
    training corpora): per-batch Counter partials (the combiner —
    shuffle rows are distinct (ngram, count) partials, never token
    streams), groupby-sum, global sort + limit.  Deterministic
    ordering: count desc, ngram asc."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((txt or '').lower())
            for i in range(len(toks) - n + 1):
                c[' '.join(toks[i:i + n])] += 1
        return pa.table({
            'ngram': pa.array(list(c.keys()), pa.string()),
            'cnt': pa.array(list(c.values()), pa.int64()),
        })

    out = (ds.map_batches(partial, batch_format='pyarrow')
           .groupby('ngram').aggregate(Sum('cnt', alias_name='cnt'))
           .sort(['cnt', 'ngram'], descending=[True, False])
           .limit(k))
    return out


# ---------------------------------------------------------------------------
# sorts / top-k (reference Queue.pull, pdict.py:468-478)

def topk_priority(sf_dir: str):
    """Top-100 orders by totalprice (priority-queue pull semantics)."""
    ds = _read(sf_dir, 'orders', ['o_orderkey', 'o_totalprice'])
    return ds.sort(['o_totalprice', 'o_orderkey'],
                   descending=[True, False]).limit(100)


def priority_scores(sf_dir: str):
    """DataCrawler.link_score over derived doc urls
    (reference download.py:1062-1078)."""
    from ..kernels.urls import link_score
    from ..sources.docs_pages import doc_url

    ds = _read(sf_dir, 'documents', ['doc_id'])

    def score(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_pylist()
        return pa.table({'doc_id': t.column('doc_id'),
                         'score': pa.array([link_score(doc_url(i)) for i in ids],
                                           pa.int64())})

    return ds.map_batches(score, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# dedup (reference UnicodeWriter unique_by, common.py:564-589; content dedup)

def dedup_first(sf_dir: str):
    """First event per (user_id, event_type) — keep min event_id."""
    from ray.data.aggregate import Min

    ds = _read(sf_dir, 'events', ['user_id', 'event_type', 'event_id'])
    return ds.groupby(['user_id', 'event_type']).aggregate(
        Min('event_id', alias_name='first_event_id'))


def dedup_exact_text(sf_dir: str):
    """Exact content dedup over documents (min doc_id per md5)."""
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return exact_dedup(ds, 'text', 'doc_id')


#: skip the bloom prefilter in :func:`dedup_incremental` when the
#: prior-snapshot filter would exceed this many BITS (128 MiB of bit
#: array at 2^30).  Below it the filter is built distributed (one
#: partial per block, OR-fold) and broadcast once via ray.put; above
#: it (≳7×10^7 prior keys at fpp 1e-3) the plain hash anti-join runs
#: alone — still exact, just without the shuffle-shrinking prefilter.
#: At 10^10 prior docs the right scale path is a coarser fpp or a
#: tree-OR of partials instead of the driver fold; the constant keeps
#: the driver fold honest on one node.
INCR_BLOOM_MAX_BITS = 1 << 30


def dedup_incremental(sf_dir: str, force_join: bool = False,
                      num_partitions: int = 8):
    """Cross-snapshot incremental exact dedup — the "don't re-keep what
    an earlier crawl already kept" step every periodically-refreshed
    corpus needs (CCNet / Dolma dedup against prior dumps).  The prior
    snapshot is the even-``doc_id`` half of documents, the new batch is
    the odd half (a deterministic stand-in for two crawl dumps over the
    driver's fixed input shape).  Survivors = new docs whose exact text
    (md5) appears nowhere in the prior snapshot, keeping the min
    ``doc_id`` per identical text within the new batch.  Returns
    (doc_id, content_md5).

    100-TB shape: only (doc_id, md5) pairs ever shuffle — text stays in
    the pruned read.  Within-new dedup is one groupby-min over those
    40-byte rows.  The prior-membership probe tiers: (a) distinct prior
    md5s broadcast once via ``ray.put`` under ``BROADCAST_KEY_LIMIT``;
    (b) above it (or under ``force_join``) a bloom filter over the
    prior's 64-bit hashes — built distributed as one partial bit-array
    per block and OR-folded — prefilters the new side per batch, so
    only bloom-positive candidates (true dups + ~fpp·new false
    positives) enter the md5-keyed anti-join; bloom-negative rows are
    exact keeps by the filter's no-false-negative guarantee, and the
    join verifies candidates on the FULL md5 string, so 64-bit
    collisions cannot flip an answer.  Tiers are test-pinned equal
    (tests/test_training_ops.py).
    """
    import hashlib

    import ray
    from ray.data.aggregate import Count, Min

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe
    from ..state.cuckoo import BloomFilter

    docs = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def hashed(want_prior: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column('doc_id')
            keep = pc.equal(pc.bit_wise_and(ids, 1),
                            0 if want_prior else 1)
            t = t.filter(keep)
            md5s, hs = [], []
            for x in t.column('text').to_pylist():
                d = hashlib.md5(
                    (x or '').encode('utf-8', 'surrogatepass')).digest()
                md5s.append(d.hex())
                h = int.from_bytes(d[8:], 'little')  # md5_hash64 layout
                hs.append(h - (1 << 64) if h >= (1 << 63) else h)
            out = {'content_md5': pa.array(md5s, pa.string()),
                   'h': pa.array(hs, pa.int64())}
            if not want_prior:
                out = {'doc_id': t.column('doc_id'), **out}
            return pa.table(out)
        return fn

    # materialized: consumed 2-3 times below (count + membership probe
    # [+ bloom build]); O(prior)×40-byte pairs in the object store
    prior = docs.map_batches(hashed(True),
                             batch_format='pyarrow').materialize()
    survivors = (docs.map_batches(hashed(False), batch_format='pyarrow')
                 .groupby('content_md5')
                 .aggregate(Min('doc_id', alias_name='doc_id'),
                            Min('h', alias_name='h')))

    n_prior = prior.count()
    # empty prior: nothing to probe — the broadcast filter with an
    # empty set keeps everything (join tier would feed Acero an empty,
    # schemaless right side)
    if n_prior == 0 or (not force_join and n_prior <= BROADCAST_KEY_LIMIT):
        ref = ray.put(pa.array(prior.unique('content_md5'), pa.string()))

        def flt(t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t['content_md5'],
                                      value_set=ray.get(ref)))
            return t.filter(mask).select(['doc_id', 'content_md5'])

        return survivors.map_batches(flt, batch_format='pyarrow')

    # join tier: bloom prefilter (when it fits) + md5-keyed anti-join
    proto = BloomFilter(max(n_prior, 1), fpp=1e-3)
    bloom_ref = None
    if proto.m <= INCR_BLOOM_MAX_BITS:
        cap = max(n_prior, 1)

        def bloom_partial(t: pa.Table) -> pa.Table:
            bf = BloomFilter(cap, fpp=1e-3)  # same (m, k) every block
            bf.add_batch(t.column('h').to_numpy().astype(np.uint64))
            return pa.table({'bits': pa.array([bf.snapshot()],
                                              pa.binary())})

        folded = None
        for b in prior.map_batches(
                bloom_partial, batch_format='pyarrow').iter_batches(
                    batch_format='pyarrow'):
            for blob in b.column('bits').to_pylist():
                part = np.frombuffer(blob[24:], dtype=np.uint8)
                folded = part.copy() if folded is None else folded | part
        if folded is not None:
            bloom_ref = ray.put(proto.snapshot()[:24] + folded.tobytes())

    # materialized: the bloom split consumes it twice (keep + candidate
    # branches); also breaks the plan so the aggregate never shares an
    # executed DAG with the JoinOperator below
    survivors = _join_safe(survivors, num_partitions).materialize()
    if bloom_ref is not None:
        def bloom_split(flag: bool):
            def fn(t: pa.Table) -> pa.Table:
                bf = BloomFilter.view(ray.get(bloom_ref))
                got = bf.contains_batch(
                    t.column('h').to_numpy().astype(np.uint64))
                return t.filter(pa.array(got if flag else ~got))
            return fn

        keeps = survivors.map_batches(
            bloom_split(False),
            batch_format='pyarrow').select_columns(
                ['doc_id', 'content_md5'])
        candidates = survivors.map_batches(bloom_split(True),
                                           batch_format='pyarrow')
    else:
        keeps = None
        candidates = survivors

    # materialize + count guard: when the bloom flags NOTHING (no
    # cross-snapshot dups at all), candidates is all schemaless empty
    # blocks and Acero would die on the join; the candidate set is
    # bounded (true dups + fpp·new), so the extra materialize is cheap
    # relative to the join it feeds
    cand = _join_safe(candidates, num_partitions).materialize()
    if cand.count() == 0:
        if keeps is not None:
            return keeps
        import ray.data
        return ray.data.from_arrow(pa.table(
            {'doc_id': pa.array([], pa.int64()),
             'content_md5': pa.array([], pa.string())}))

    prior_keys = _join_safe(
        prior.groupby('content_md5').aggregate(Count(alias_name='_n')),
        num_partitions)
    joined = cand.join(
        prior_keys, 'left_outer', num_partitions=num_partitions,
        on=('content_md5',), right_on=('content_md5',))
    anti = joined.map_batches(
        lambda t: t.filter(pc.is_null(t['_n'])),
        batch_format='pyarrow').select_columns(['doc_id', 'content_md5'])
    return anti if keeps is None else keeps.union(anti)


# ---------------------------------------------------------------------------
# joins / lookups (reference cache lookup / exists, download.py:194-310)

def join_orders_customers(sf_dir: str):
    """orders ⋈ customer (broadcast small side) → per-nation rollup."""
    import ray
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, 'customer', ['c_custkey', 'c_nationkey']).to_pandas()
    lookup_ref = ray.put(dict(zip(cust['c_custkey'], cust['c_nationkey'])))

    def join_agg(df: pd.DataFrame) -> pd.DataFrame:
        # plain task: the broadcast lookup dict is fetched per task
        # (cached per worker process) — no actor pool spin-up
        lookup = ray.get(lookup_ref)
        nk = df['o_custkey'].map(lookup)
        g = pd.DataFrame({'nationkey': nk, 'price': df['o_totalprice']})
        return g.groupby('nationkey', as_index=False).agg(
            n_orders=('price', 'size'), sum_price=('price', 'sum'))

    ds = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'])
    partials = ds.map_batches(join_agg, batch_format='pandas')
    out = partials.groupby('nationkey').aggregate(
        Sum('n_orders', alias_name='n_orders'),
        Sum('sum_price', alias_name='sum_price'))
    return out.map_batches(lambda t: _snap_round(t, 'sum_price'),
                           batch_format='pyarrow')


BIG_ORDER_PRICE = 300_000.0


def join_lineitem_orders(sf_dir: str):
    """Both-sides-large hash join (lineitem ⋈ orders on orderkey) via
    Ray Data's partitioned ``Dataset.join`` — the shuffle-join path for
    when neither side fits a broadcast (contrast
    ``join_orders_customers``'s broadcast pattern)."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, 'lineitem', ['l_orderkey', 'l_extendedprice'])
    orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_orderpriority'])
    joined = li.join(orders, 'inner', num_partitions=8,
                     on=('l_orderkey',), right_on=('o_orderkey',))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby('o_orderpriority', as_index=False).agg(
            n_items=('l_extendedprice', 'size'),
            sum_price=('l_extendedprice', 'sum'))

    out = joined.map_batches(partial, batch_format='pandas')
    out = out.groupby('o_orderpriority').aggregate(
        Sum('n_items', alias_name='n_items'),
        Sum('sum_price', alias_name='sum_price'))
    return out.map_batches(lambda t: _snap_round(t, 'sum_price'),
                           batch_format='pyarrow')


def _customers_with_order_flag(sf_dir: str, want_exists: bool,
                               min_price: float | None = None):
    """Semi/anti join of customer against (optionally filtered) orders.

    The order-key set is broadcast once (ray.put); each customer batch
    filters with a vectorized is_in — no shuffle (reference
    Download.exists / seen-set probe, download.py:287-310, 1041).
    """
    import ray

    orders = _read(sf_dir, 'orders', ['o_custkey', 'o_totalprice'])
    if min_price is not None:
        orders = orders.map_batches(
            lambda t: t.filter(pc.greater(t['o_totalprice'], min_price)),
            batch_format='pyarrow')
    keys = orders.unique('o_custkey')
    key_ref = ray.put(pa.array(sorted(keys), pa.int64()))

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t['c_custkey'], value_set=ray.get(key_ref))
        if not want_exists:
            mask = pc.invert(mask)
        return t.filter(mask)

    ds = _read(sf_dir, 'customer', ['c_custkey'])
    return ds.map_batches(flt, batch_format='pyarrow')


def semi_join_customers(sf_dir: str):
    """Customers that have orders (Download.exists semi-join)."""
    return _customers_with_order_flag(sf_dir, True)


def anti_join_customers(sf_dir: str):
    """Customers with no big order (seen-set anti-join over a
    filtered right side — kept non-degenerate on the testdata)."""
    return _customers_with_order_flag(sf_dir, False,
                                      min_price=BIG_ORDER_PRICE)


def asof_latest_event(sf_dir: str):
    """Per-user latest event at/before the cutoff (archive.org as-of
    lookup, reference download.py:530-546)."""
    ds = _read(sf_dir, 'events', ['user_id', 'event_id', 'ts', 'value'])
    cutoff = pa.scalar(np.datetime64(ASOF_CUTOFF.replace(' ', 'T'), 'us'))
    filt = ds.map_batches(lambda t: t.filter(pc.less_equal(t['ts'], cutoff)),
                          batch_format='pyarrow')

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        last = g.iloc[-1]
        return pd.DataFrame({'user_id': [last['user_id']],
                             'last_event_id': [last['event_id']],
                             'last_value': [round(last['value'], 2)]})

    return _per_key_groups(filt, 'user_id', latest)


# ---------------------------------------------------------------------------
# per-document kernel ops (documents table / derived pages)

def normalize_text(sf_dir: str):
    """common.normalize over documents.text (reference common.py:317-334)."""
    from ..kernels.text import normalize

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def norm(t: pa.Table) -> pa.Table:
        return pa.table({'doc_id': t.column('doc_id'),
                         'text_norm': pa.array(
                             [normalize(s) for s in t.column('text').to_pylist()],
                             pa.string())})

    return ds.map_batches(norm, batch_format='pyarrow')


def token_count(sf_dir: str):
    """Whitespace token counts per document."""
    from ..stages.textstats import whitespace_token_count

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def cnt(t: pa.Table) -> pa.Table:
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_tokens': pa.array(
                             [whitespace_token_count(s)
                              for s in t.column('text').to_pylist()], pa.int64())})

    return ds.map_batches(cnt, batch_format='pyarrow')


def quality(sf_dir: str):
    """Quality features (SQL-checkable integer subset)."""
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def q(t: pa.Table) -> pa.Table:
        texts = t.column('text').to_pylist()
        n_chars, n_tok, n_uniq = [], [], []
        for s in texts:
            toks = _TOKEN_RE.findall((s or '').lower())
            n_chars.append(len(s or ''))
            n_tok.append(len(toks))
            n_uniq.append(len(set(toks)))
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_chars': pa.array(n_chars, pa.int64()),
                         'n_tokens': pa.array(n_tok, pa.int64()),
                         'n_unique_tokens': pa.array(n_uniq, pa.int64())})

    return ds.map_batches(q, batch_format='pyarrow')


def url_parse(sf_dir: str):
    """get_domain / get_extension over constructed urls
    (reference common.py:397-429)."""
    from ..kernels.text import get_domain, get_extension

    ds = _read(sf_dir, 'documents', ['doc_id', 'source'])

    def parse(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_pylist()
        srcs = t.column('source').to_pylist()
        urls = ['http://www.%s.com/files/report_%d.PDF' % (s, i)
                for i, s in zip(ids, srcs)]
        return pa.table({'doc_id': t.column('doc_id'),
                         'domain': pa.array([get_domain(u) for u in urls],
                                            pa.string()),
                         'extension': pa.array([get_extension(u) for u in urls],
                                               pa.string())})

    return ds.map_batches(parse, batch_format='pyarrow')


def cdx_index(sf_dir: str):
    """CDX-style url index rows: the SURT key (``kernels.urls.surt``,
    the public web-archive Sort-friendly URI Reordering Transform) per
    page url.  Urls are constructed with deterministic per-doc
    variations — mixed case, a ``www.`` label, default and non-default
    ports, unsorted/duplicate query params, a fragment — so every surt
    rule is exercised and the oracle can state the expected key by
    construction.  Pure map_batches, shuffle-free; a real CDX build
    would feed this into ``sort('surt_key')`` + a partitioned sink."""
    from ..kernels.urls import surt

    ds = _read(sf_dir, 'documents', ['doc_id'])

    def idx(t: pa.Table) -> pa.Table:
        urls = []
        for i in t.column('doc_id').to_pylist():
            h, m = i % 8, i % 4
            if m == 0:
                urls.append('HTTP://WWW.Src%d.COM:80/D/%d?b=2&a=1#frag' % (h, i))
            elif m == 1:
                urls.append('https://src%d.com:8443/d/%d' % (h, i))
            elif m == 2:
                urls.append('http://src%d.com/d/%d?b=2&a=1&a=0' % (h, i))
            else:
                urls.append('http://src%d.com/d/%d' % (h, i))
        return pa.table({'doc_id': t.column('doc_id'),
                         'url': pa.array(urls, pa.string()),
                         'surt_key': pa.array([surt(u) for u in urls],
                                              pa.string())})

    return ds.map_batches(idx, batch_format='pyarrow')


def _derived_pages(sf_dir: str):
    from ..sources.docs_pages import pages_ds_from_documents

    return pages_ds_from_documents(sf_dir)


def xpath_titles(sf_dir: str):
    """xpath.get('//title') + h1 over derived pages (reference xpath.py:77-81)."""
    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def titles(t: pa.Table) -> pa.Table:
        htmls = t.column('html').to_pylist()
        title, h1 = [], []
        for h in htmls:
            page = html_to_unicode(h)
            doc = X.Doc(page)
            title.append(doc.get('//title'))
            h1.append(doc.get('/html/body/h1'))
        return pa.table({'doc_id': t.column('doc_id'),
                         'title': pa.array(title, pa.string()),
                         'h1': pa.array(h1, pa.string())})

    return pages.map_batches(titles, batch_format='pyarrow')


def extract_contacts(sf_dir: str):
    """Email/phone extraction over derived pages (reference alg.py:29-82)."""
    from ..kernels.extract import extract_emails, extract_phones
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def contacts(t: pa.Table) -> pa.Table:
        htmls = t.column('html').to_pylist()
        emails, phones = [], []
        for h in htmls:
            page = html_to_unicode(h)
            es = extract_emails(page)
            ps = extract_phones(page)
            emails.append(es[0] if es else '')
            phones.append(ps[0] if ps else '')
        return pa.table({'doc_id': t.column('doc_id'),
                         'email': pa.array(emails, pa.string()),
                         'phone': pa.array(phones, pa.string())})

    return pages.map_batches(contacts, batch_format='pyarrow')


def excerpts(sf_dir: str):
    """alg.get_excerpt over derived pages (reference alg.py:7-25)."""
    from ..kernels.extract import get_excerpt
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def ex(t: pa.Table) -> pa.Table:
        htmls = t.column('html').to_pylist()
        return pa.table({'doc_id': t.column('doc_id'),
                         'excerpt': pa.array(
                             [get_excerpt(html_to_unicode(h), try_meta=True)
                              for h in htmls], pa.string())})

    return pages.map_batches(ex, batch_format='pyarrow')


def media_meta(sf_dir: str):
    """Opaque-binary payload stage (multimodal plumbing): utf-8 payload
    per doc → byte length via the actor-pool stage."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def payload_meta(t: pa.Table) -> pa.Table:
        texts = t.column('text').to_pylist()
        payloads = [(s or '').encode('utf-8') for s in texts]
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_bytes': pa.array([len(p) for p in payloads],
                                             pa.int64())})

    return ds.map_batches(payload_meta, batch_format='pyarrow')


def user_event_counts(sf_dir: str):
    """Events per user via the salted two-phase aggregation
    (skew-bounded groupby, SURVEY §4 hot-key handling)."""
    from ..stages.partition import salted_agg

    ds = _read(sf_dir, 'events', ['user_id', 'value'])
    out = salted_agg(ds, 'user_id', value_col='value', num_salts=8)
    return out.map_batches(lambda t: _snap_round(t, 'sum_value'),
                           batch_format='pyarrow')


def page_links(sf_dir: str):
    """xpath.get_links over derived pages (reference xpath.py:515-555):
    link count per doc is known by construction, so SQL can oracle the
    full link-extraction engine."""
    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def links(t: pa.Table) -> pa.Table:
        urls = t.column('url').to_pylist()
        htmls = t.column('html').to_pylist()
        n = [len(X.get_links(html_to_unicode(h), u))
             for u, h in zip(urls, htmls)]
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_links': pa.array(n, pa.int64())})

    return pages.map_batches(links, batch_format='pyarrow')


def wat_links(sf_dir: str):
    """Common Crawl WAT round-trip: extract every derived page's links
    (``xpath.get_links`` — the :func:`page_links` kernel), export them
    as REAL WAT metadata records (WARC/1.0 + JSON envelope, one gzip
    member per record, content-addressed shards) to /tmp scratch via
    :func:`~webscraping_ray.sources.warc.export_wat`, read the shards
    BACK with :func:`~webscraping_ray.sources.warc.read_wat`, and
    report (doc_id, n_links) — so the construction oracle checks the
    whole byte-level format loop, not just the extraction.

    Scratch dir is keyed by the input path and cleared up front
    (stale shards from a different fixture would double-count);
    within one input it is content-addressed and idempotent.  Both
    the export and the re-read are one-file-per-task distributed —
    the driver never sees link lists."""
    import hashlib
    import os
    import shutil

    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode
    from ..sources.warc import export_wat, read_wat

    pages, _ = _derived_pages(sf_dir)

    def links(t: pa.Table) -> pa.Table:
        urls = t.column('url').to_pylist()
        htmls = t.column('html').to_pylist()
        ls = [X.get_links(html_to_unicode(h), u)
              for u, h in zip(urls, htmls)]
        return pa.table({
            'url': pa.array(urls, pa.string()),
            'warc_ts': pa.array([0] * len(urls), pa.timestamp('us')),
            'links': pa.array(ls, pa.list_(pa.string()))})

    out_dir = '/tmp/webscraping_ray_wat/%s' % hashlib.md5(
        os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    shutil.rmtree(out_dir, ignore_errors=True)
    export_wat(pages.map_batches(links, batch_format='pyarrow'), out_dir)
    paths = [os.path.join(out_dir, f) for f in sorted(os.listdir(out_dir))
             if f.endswith('.warc.wat.gz')]
    back = read_wat(paths)

    def counts(t: pa.Table) -> pa.Table:
        ids = [int(u.rsplit('/', 1)[1])
               for u in t.column('url').to_pylist()]
        n = [len(l) for l in t.column('links').to_pylist()]
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'n_links': pa.array(n, pa.int64())})

    return back.map_batches(counts, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# similarity / dedup pipelines (training-data ops)

def knn_query0(sf_dir: str):
    """Exact cosine top-10 around vec_id=0 (brute-force baseline)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_brute

    q = pq.read_table(f'{sf_dir}/embeddings.parquet',
                      filters=[('vec_id', '=', 0)]).column('embedding').to_pylist()
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    out = knn_brute(ds, np.array(q, dtype=np.float64), k=10, query_ids=[0])
    return pa.table({'vec_id': out.column('vec_id'),
                     'rank': out.column('rank').cast(pa.int64())})


def knn_ivf_query0(sf_dir: str):
    """IVF-bucketed ANN variant of knn_query0 (scale path).

    Shares the exact brute-force SQL oracle: IVF recall@10 is 1.0 on
    the testdata (asserted in ``test_embedding_ivf_matches_brute`` /
    BASELINE.md), so the approximate result must equal the exact one —
    the oracle check proves it stays that way."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_ivf

    q = pq.read_table(f'{sf_dir}/embeddings.parquet',
                      filters=[('vec_id', '=', 0)]).column('embedding').to_pylist()
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    # nprobe == n_clusters: exhaustive probing, so the correctness gate
    # exercises the whole IVF machinery (build, bucketing, probe,
    # per-bucket top-k merge) against the exact oracle.  Sub-exhaustive
    # nprobe is the recall/latency trade, measured in pytest and
    # BASELINE.md (recall@10 at nprobe 2/4/6), not a correctness claim.
    out = knn_ivf(ds, np.array(q, dtype=np.float64), k=10, n_clusters=8,
                  nprobe=8, query_ids=[0])
    return pa.table({'vec_id': out.column('vec_id'),
                     'rank': out.column('rank').cast(pa.int64())})


def knn_join(sf_dir: str, k: int = 5):
    """Exact cosine k-NN self-join over embeddings — the ANN-graph
    construction primitive (semantic-dedup / RETRO-style neighbor
    tables).  Returns (vec_id, rank, neighbor_id) — rank-only by
    design (stages/similarity._topk_rows documents why cosine values
    can't cross the engine/oracle hash compare), ties by neighbor_id.
    Broadcast tier:
    the corpus matrix ships once via ``ray.put`` (gated at the stage
    by ``KNN_JOIN_BROADCAST_LIMIT``); see :func:`knn_join_ivf` for the
    100-TB bucketed path."""
    import pyarrow.parquet as pq

    from ..stages.similarity import KNN_JOIN_BROADCAST_LIMIT, knn_join_brute

    # footer-metadata row count (free): above the broadcast gate the
    # matrix can't ship whole — fall through to the bucketed tier with
    # the k-scaling rule and BOUNDED probes (exhaustive probing at
    # derived k would replicate every query k times; the result above
    # the gate is therefore the IVF-APPROXIMATE neighbor join, the
    # only tractable semantics at that scale — recall gated by the
    # knn_ivf_recall driver query)
    n = pq.ParquetFile(f'{sf_dir}/embeddings.parquet').metadata.num_rows
    if n > KNN_JOIN_BROADCAST_LIMIT:
        from ..stages.similarity import (IVF_MAX_FLAT_CLUSTERS,
                                         derive_n_clusters)

        # derived k CAPPED at the flat-clustering limit — the driver
        # k-means cost is sample·k·d, the same bound ivf_bucketize
        # applies (review finding, round 5)
        kc = min(derive_n_clusters(n), IVF_MAX_FLAT_CLUSTERS)
        return knn_join_ivf(sf_dir, k=k, n_clusters=kc, nprobe=8)
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return knn_join_brute(ds, k=k)


def knn_join_ivf(sf_dir: str, k: int = 5, n_clusters=8, nprobe=None):
    """IVF-bucketed k-NN self-join (the scale path: per-bucket
    matmuls, probe-replicated queries, no broadcast matrix).  The
    registered QUERY runs the defaults — 8 buckets, exhaustive probe
    (nprobe = n_clusters) — so it shares the exact SQL oracle, the
    same argument as knn_ivf_query0; sub-exhaustive recall is measured
    in pytest, and :func:`knn_join`'s above-gate fallthrough passes
    ``n_clusters=None`` (k-rule) with bounded probes instead."""
    from ..stages.similarity import knn_join_ivf as _kji

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return _kji(ds, k=k, n_clusters=n_clusters, nprobe=nprobe)


def minhash_dups(sf_dir: str):
    from ..stages.dedup import minhash_dup_pairs

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return minhash_dup_pairs(ds, threshold=0.8)


def simhash_fingerprints(sf_dir: str):
    from ..stages.dedup import SimHash

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ds.map_batches(SimHash(), batch_format='pyarrow')


def embedding_dups(sf_dir: str):
    """Exact cosine near-dup pairs (brute path — the oracle-checkable
    baseline; see :func:`embedding_dups_ivf` for the scale path)."""
    from ..stages.dedup import embedding_dup_pairs

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    out = embedding_dup_pairs(ds, threshold=0.95, method='brute')
    return _snap_round(out, 'cosine', 6)


def embedding_dups_ivf(sf_dir: str):
    """IVF-bucketed cosine near-dup pairs (the 100-TB path: per-bucket
    matmuls, no full matrix anywhere).  Rows-only; recall vs the brute
    oracle is asserted in tests and recorded in BASELINE.md."""
    from ..stages.dedup import embedding_dup_pairs

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    out = embedding_dup_pairs(ds, threshold=0.95, method='ivf')
    return _snap_round(out, 'cosine', 6)


def langid(sf_dir: str):
    from ..stages.textstats import LangId

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ds.map_batches(LangId(), batch_format='pyarrow')


def fingerprints(sf_dir: str):
    from ..stages.textstats import Fingerprint

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ds.map_batches(Fingerprint(), batch_format='pyarrow')


def clean_corpus(sf_dir: str, min_tokens: int = 20):
    """Training-data cleaning composition (oracled subset): quality
    filter (>= min_tokens word tokens) → exact content dedup (min
    doc_id per identical text).  Returns surviving doc_id."""
    from ray.data.aggregate import Min

    from ..stages.dedup import AddContentHash
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def quality_filter(t: pa.Table) -> pa.Table:
        texts = t.column('text').to_pylist()
        keep = [len(_TOKEN_RE.findall((s or '').lower())) >= min_tokens
                for s in texts]
        return t.filter(pa.array(keep, pa.bool_()))

    hashed = (ds.map_batches(quality_filter, batch_format='pyarrow')
              .map_batches(AddContentHash('text'), batch_format='pyarrow')
              .select_columns(['content_hash', 'doc_id']))
    return (hashed.groupby('content_hash')
            .aggregate(Min('doc_id', alias_name='doc_id'))
            .select_columns(['doc_id']))


def crawl_clean_corpus(sf_dir: str, min_tokens: int = 20):
    """Crawl-to-training-corpus, end to end in one query: BFS-crawl
    the derived web (politeness, seen-set, budgets — the full
    flagship), keep the fetched status-200 document pages, then run
    the curation pass (quality floor + exact content dedup) over the
    crawled set.  This is the pipeline a user of the reference
    (crawl → scrape → clean → CSV) would run against 100 TB.

    The crawl's visit table is answer-sized (one row per visit); the
    fetched doc-id set broadcasts once and the cleaning operators run
    distributed exactly as :func:`clean_corpus`."""
    import ray
    from ray.data.aggregate import Min

    from ..stages.dedup import AddContentHash
    from ..stages.textstats import _TOKEN_RE

    visits = crawl_documents(sf_dir)
    fetched = {int(u.rsplit('/', 1)[1])
               for u, s in zip(visits.column('url').to_pylist(),
                               visits.column('status').to_pylist())
               if s == 200}
    fref = ray.put(fetched)

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def crawled_and_quality(t: pa.Table) -> pa.Table:
        ids = ray.get(fref)
        keep = [i in ids
                and len(_TOKEN_RE.findall((s or '').lower())) >= min_tokens
                for i, s in zip(t.column('doc_id').to_pylist(),
                                t.column('text').to_pylist())]
        return t.filter(pa.array(keep, pa.bool_()))

    hashed = (ds.map_batches(crawled_and_quality, batch_format='pyarrow')
              .map_batches(AddContentHash('text'), batch_format='pyarrow')
              .select_columns(['content_hash', 'doc_id']))
    return (hashed.groupby('content_hash')
            .aggregate(Min('doc_id', alias_name='doc_id'))
            .select_columns(['doc_id']))


def clean_corpus_neardup(sf_dir: str, min_tokens: int = 20,
                         jaccard_threshold: float = 0.8):
    """Full cleaning pipeline: quality filter → exact dedup →
    MinHash-LSH near-dup removal (keep the lower doc_id of each
    verified near-dup pair).  Rows-only (LSH is not SQL-expressible);
    deterministic given the seeded MinHash.

    Dataset-native end to end: survivors stay distributed (semi-join of
    documents against the survivor ids via ``Dataset.join``), and the
    drop set — the verified pair list, small by construction — is the
    only broadcast (``ray.put`` once, anti-join filter per batch)."""
    import ray

    from ..stages.dedup import minhash_dup_pairs

    survivors_ds = clean_corpus(sf_dir, min_tokens)
    docs = (_read(sf_dir, 'documents', ['doc_id', 'text'])
            .join(survivors_ds.map_batches(
                lambda t: pa.table({'keep_id': t['doc_id']}),
                batch_format='pyarrow'),
                'inner', num_partitions=8,
                on=('doc_id',), right_on=('keep_id',))
            .select_columns(['doc_id', 'text']))
    pairs = minhash_dup_pairs(docs, threshold=jaccard_threshold)
    drop = sorted({max(a, b)
                   for a, b in zip(pairs.column('id_a').to_pylist(),
                                   pairs.column('id_b').to_pylist())})
    drop_ref = ray.put(pa.array(drop, pa.int64()))

    def anti(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(
            pc.is_in(t['doc_id'], value_set=ray.get(drop_ref))))

    return docs.select_columns(['doc_id']).map_batches(
        anti, batch_format='pyarrow')


def clean_corpus_decontaminated(sf_dir: str, min_tokens: int = 20,
                                ngram: int = 8, holdout_mod: int = 100):
    """Full curation composition: quality filter → exact dedup
    (:func:`clean_corpus`) → benchmark decontamination
    (:func:`decontaminate`).  Survivors stay a Dataset; the flagged-id
    list (small by construction) is the only broadcast.  The held-out
    docs themselves (doc_id % holdout_mod == 0) are also excluded —
    eval text must never reach the training corpus."""
    import ray

    survivors = clean_corpus(sf_dir, min_tokens)
    flagged = decontaminate(sf_dir, ngram, holdout_mod)
    drop_ref = ray.put(flagged.column('doc_id').combine_chunks())

    def keep(t: pa.Table) -> pa.Table:
        ids = t['doc_id'].to_numpy(zero_copy_only=False)
        mask = ids % holdout_mod != 0
        t = t.filter(pa.array(mask))
        return t.filter(pc.invert(
            pc.is_in(t['doc_id'], value_set=ray.get(drop_ref))))

    return survivors.map_batches(keep, batch_format='pyarrow')


#: row-count ceiling for the quadratic exact-Jaccard baseline — it is
#: the small-scale oracle for the LSH family, never the scale path
NGRAM_BASELINE_MAX_DOCS = 50_000


def ngram_jaccard_dups(sf_dir: str, threshold: float = 0.8, k: int = 3):
    """Exact all-pairs word-k-gram Jaccard near-dup pairs.

    The non-LSH baseline the brief lists beside MinHash: shingle sets
    are computed distributed and broadcast as a compact reference
    (id → hashed-shingle array), then every batch compares its rows
    against the full set with vectorized set intersections — the
    knn_brute pattern (broadcast small side, per-batch compute).
    Quadratic by construction: the exact oracle for LSH at small
    corpus sizes, superseded by ``minhash_dups`` at scale.
    """
    import ray

    from ..stages.dedup import content_hash64, shingles

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    n_docs = ds.count()
    if n_docs > NGRAM_BASELINE_MAX_DOCS:
        # quadratic-by-design oracle baseline: refuse corpus-scale
        # inputs (broadcasting every shingle set + O(n²) compares
        # would OOM) — use minhash_dups, whose recall this baseline
        # certifies at small scale
        raise ValueError(
            'ngram_jaccard_dups is the exact quadratic baseline, capped '
            f'at {NGRAM_BASELINE_MAX_DOCS} docs (got {n_docs}); use '
            'minhash_dups at scale')

    def to_sets(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_pylist()
        texts = t.column('text').to_pylist()
        sets = [np.unique(np.array(
            [content_hash64(s) for s in shingles(x, k)] or [0],
            dtype=np.int64)) for x in texts]
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'sh': pa.array([s.tolist() for s in sets],
                                        pa.list_(pa.int64()))})

    all_sets = ds.map_batches(to_sets, batch_format='pyarrow').take_all()
    ref_ids = np.array([r['doc_id'] for r in all_sets], dtype=np.int64)
    ref_sets = [np.array(r['sh'], dtype=np.int64) for r in all_sets]
    ref = ray.put((ref_ids, ref_sets))

    def pairs(t: pa.Table) -> pa.Table:
        rids, rsets = ray.get(ref)
        out_a, out_b, out_j = [], [], []
        for i, sh in zip(t.column('doc_id').to_pylist(),
                         t.column('sh').to_pylist()):
            a = np.array(sh, dtype=np.int64)
            for rid, b in zip(rids, rsets):
                if rid <= i:
                    continue
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    out_a.append(i)
                    out_b.append(int(rid))
                    out_j.append(j)
        return pa.table({'id_a': pa.array(out_a, pa.int64()),
                         'id_b': pa.array(out_b, pa.int64()),
                         'jaccard': pa.array(out_j, pa.float64())})

    rows = (ds.map_batches(to_sets, batch_format='pyarrow')
            .map_batches(pairs, batch_format='pyarrow')).take_all()
    rows.sort(key=lambda r: (r['id_a'], r['id_b']))
    return pa.table({'id_a': pa.array([r['id_a'] for r in rows], pa.int64()),
                     'id_b': pa.array([r['id_b'] for r in rows], pa.int64()),
                     'jaccard': pa.array([r['jaccard'] for r in rows],
                                         pa.float64())})


def simhash_dups(sf_dir: str, max_hamming: int = 3):
    from ..stages.dedup import simhash_dup_pairs

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return simhash_dup_pairs(ds, max_hamming=max_hamming)


def decontaminate(sf_dir: str, ngram: int = 8, holdout_mod: int = 100):
    """Benchmark decontamination: flag training documents sharing any
    word ``ngram``-gram with a held-out eval set.

    The eval set here is ``doc_id % holdout_mod == 0`` (a deterministic
    stand-in for a benchmark suite); in the real setting the eval side
    is a fixed, small corpus (MBs of benchmark text vs TBs of training
    data), so its distinct-shingle set is the canonical broadcast small
    side: shingled distributed, unioned once on the driver, ``ray.put``
    once, membership-tested inside every train batch — no shuffle
    touches the 100-TB side.  Docs with < ngram tokens contribute their
    whole token string (the :func:`~..stages.dedup.shingles`
    convention); returns (doc_id, n_overlap) for contaminated docs.
    """
    import ray

    from ..stages.dedup import shingles

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def eval_shingles(t: pa.Table) -> pa.Table:
        mask = t['doc_id'].to_numpy(zero_copy_only=False) % holdout_mod == 0
        out = set()
        for txt in t.filter(pa.array(mask)).column('text').to_pylist():
            out |= shingles(txt, ngram)
        return pa.table({'s': pa.array(sorted(out), pa.string())})

    ev = set()
    for batch in ds.map_batches(eval_shingles,
                                batch_format='pyarrow').iter_batches(
                                    batch_format='pyarrow'):
        ev.update(batch.column('s').to_pylist())
    ev_ref = ray.put(frozenset(ev))

    def overlap(t: pa.Table) -> pa.Table:
        ev_ = ray.get(ev_ref)
        mask = t['doc_id'].to_numpy(zero_copy_only=False) % holdout_mod != 0
        t = t.filter(pa.array(mask))
        ids, counts = [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            n = len(shingles(txt, ngram) & ev_)
            if n:
                ids.append(i)
                counts.append(n)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'n_overlap': pa.array(counts, pa.int64())})

    out = ds.map_batches(overlap, batch_format='pyarrow')
    # the flagged list IS the answer and is small by construction
    # (contaminated docs only); concatenate so an all-clean corpus
    # still reports the (doc_id, n_overlap) schema instead of Ray's
    # schemaless empty blocks
    schema = pa.schema([('doc_id', pa.int64()), ('n_overlap', pa.int64())])
    batches = [b for b in out.iter_batches(batch_format='pyarrow')
               if b.num_rows]
    return (pa.concat_tables(batches) if batches
            else schema.empty_table())


def sample_hash(sf_dir: str, rate_pct: int = 10):
    """Deterministic hash sampling: keep documents whose
    ``md5_number_lower(str(doc_id)) % 100 < rate_pct``.

    The canonical reproducible-subset op for training corpora: the
    sample is a pure per-row predicate (no RNG state, no shuffle, no
    coordination), so it is stable across cluster sizes, restarts and
    repartitioning, and composable (a 10 % sample of a 10 % sample is
    the same 1 % everywhere).  Hash layout matches DuckDB
    ``md5_number_lower`` (last 8 digest bytes little-endian) so the
    oracle recomputes it exactly.
    """
    import hashlib

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'n_chars'])

    def keep(t: pa.Table) -> pa.Table:
        mask = [int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[8:],
                    'little') % 100 < rate_pct
                for i in t.column('doc_id').to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format='pyarrow')


def reservoir_sample(sf_dir: str, k: int = 100):
    """Deterministic exact-k corpus sample: the ``k`` documents with
    the smallest ``md5_number_lower(doc_id)`` (ties by doc_id) —
    uniform under the hash, but reproducible across cluster sizes,
    restarts and repartitioning, unlike an RNG reservoir.

    Scale shape: the distributed-reservoir pattern — every block
    emits AT MOST ``k`` candidate rows (per-block partial top-k, a
    numpy lexsort), so the global ``sort().limit(k)`` runs over
    ``#blocks × k`` candidates, never the corpus; no corpus-wide
    sort or shuffle.  Returns (doc_id, source)."""
    import hashlib

    ds = _read(sf_dir, 'documents', ['doc_id', 'source'])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_numpy(zero_copy_only=False)
        ks = np.array([int.from_bytes(
                           hashlib.md5(str(i).encode()).digest()[8:],
                           'little') for i in ids], np.uint64)
        top = np.lexsort((ids, ks))[:k]
        return pa.table({'doc_id': pa.array(ids[top], pa.int64()),
                         'source': t.column('source').take(
                             pa.array(top, pa.int64())),
                         'hkey': pa.array(ks[top], pa.uint64())})

    cand = ds.map_batches(partial, batch_format='pyarrow')
    return (cand.sort(['hkey', 'doc_id']).limit(k)
            .select_columns(['doc_id', 'source']))


def train_test_split(sf_dir: str, test_denom: int = 10):
    """Deterministic stratified train/test split: within every source,
    documents ordered by (md5 hash, doc_id) — the :func:`sample_hash`
    ``md5_number_lower`` layout, so the oracle recomputes it exactly —
    take the first ``n_source // test_denom`` as 'test', the rest as
    'train'.  EXACT per-stratum test counts (unlike rate-predicate
    sampling, which is only exact in expectation), stable across
    cluster sizes, restarts and repartitioning.

    Returns (doc_id, split).  The per-source ranking runs in
    :func:`_per_key_groups` coarse buckets (only (doc_id, source,
    hash) rows shuffle — never text)."""
    import hashlib

    ds = _read(sf_dir, 'documents', ['doc_id', 'source'])

    def add_key(t: pa.Table) -> pa.Table:
        ks = np.array([int.from_bytes(
                           hashlib.md5(str(i).encode()).digest()[8:],
                           'little')
                       for i in t.column('doc_id').to_pylist()],
                      np.uint64)
        return t.append_column('hkey', pa.array(ks, pa.uint64()))

    keyed = ds.map_batches(add_key, batch_format='pyarrow')

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['hkey', 'doc_id']).reset_index(drop=True)
        n_test = len(g) // test_denom
        return pd.DataFrame({
            'doc_id': g['doc_id'],
            'split': np.where(np.arange(len(g)) < n_test,
                              'test', 'train')})

    return _per_key_groups(keyed, 'source', assign)


def repetition(sf_dir: str):
    """Within-document repetition score (Gopher-style quality signal):
    the fraction of a document's word bigrams taken by its single most
    frequent bigram.  High values flag boilerplate / template spam for
    the cleaning pipeline.  Embarrassingly parallel per-doc kernel —
    no shuffle; docs with < 2 tokens score 0.
    """
    from collections import Counter

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def score(t: pa.Table) -> pa.Table:
        top_cnt, frac = [], []
        for s in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((s or '').lower())
            if len(toks) < 2:
                top_cnt.append(0)
                frac.append(0.0)
                continue
            c = Counter(zip(toks, toks[1:]))
            mc = max(c.values())
            top_cnt.append(mc)
            frac.append(mc / (len(toks) - 1))
        return pa.table({'doc_id': t.column('doc_id'),
                         'top_bigram_count': pa.array(top_cnt, pa.int64()),
                         'top_bigram_frac': pa.array(frac, pa.float64())})

    return ds.map_batches(score, batch_format='pyarrow')


def gopher_filter(sf_dir: str):
    """Gopher-rules composite quality filter (Rae et al. 2021, the
    published repetition-free subset): per document, the integer
    signals each rule reads plus the final keep verdict.  Rules —
    50 <= words <= 100k; mean word length in [3, 10]; symbol-to-word
    ratio ('#' + '...') <= 0.1; >= 80% of words contain an ASCII
    letter; <= 90% of non-empty lines start with a bullet
    ('- ', '* ', '• '); <= 30% end with an ellipsis.

    Every threshold is evaluated in INTEGER arithmetic (e.g.
    ``10*(n_hash+n_dots) <= n_words``), so the verdict is exact and
    bit-stable across the Ray side and the SQL oracle — no float
    boundary cases.  Returns (doc_id, n_words, sum_word_len,
    n_alpha_words, n_hash, n_dots, n_lines, n_bullet, n_ellipsis,
    keep).  Embarrassingly parallel per-doc kernel — no shuffle."""
    import re

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    alpha = re.compile(r'[a-z]')

    def signals(t: pa.Table) -> pa.Table:
        cols = {k: [] for k in ('n_words', 'sum_word_len',
                                'n_alpha_words', 'n_hash', 'n_dots',
                                'n_lines', 'n_bullet', 'n_ellipsis',
                                'keep')}
        for s in t.column('text').to_pylist():
            tx = s or ''
            ws = _TOKEN_RE.findall(tx.lower())
            nw = len(ws)
            swl = sum(len(w) for w in ws)
            nalpha = sum(1 for w in ws if alpha.search(w))
            nhash = tx.count('#')
            ndots = tx.count('...')
            lines = [l for l in tx.split('\n') if l.strip(' \t')]
            nl = len(lines)
            nbul = sum(1 for l in lines
                       if l.lstrip(' \t').startswith(('- ', '* ', '• ')))
            nell = sum(1 for l in lines
                       if l.rstrip(' \t').endswith('...'))
            keep = (50 <= nw <= 100_000
                    and 3 * nw <= swl <= 10 * nw
                    and 10 * (nhash + ndots) <= nw
                    and 5 * nalpha >= 4 * nw
                    and 10 * nbul <= 9 * nl
                    and 10 * nell <= 3 * nl)
            for k, v in zip(cols, (nw, swl, nalpha, nhash, ndots,
                                   nl, nbul, nell, int(keep))):
                cols[k].append(v)
        out = {'doc_id': t.column('doc_id')}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        return pa.table(out)

    return ds.map_batches(signals, batch_format='pyarrow')


def token_quantiles(sf_dir: str):
    """Exact per-language quantiles (p25/p50/p75) of word-token counts
    — the corpus-statistics op behind length-filter thresholds.

    Scale shape: the continuous column is integer-valued and bounded
    (tokens per document), so exact quantiles come from a distributed
    value histogram — ``map_batches`` emits (lang, n_tokens) rows,
    ``groupby(lang, n_tokens).count()`` reduces 100 TB of text to
    O(#langs x #distinct lengths) rows (thousands), and the driver
    interpolates ``q*(n-1)`` positions over the cumulative counts
    (DuckDB ``quantile_cont`` semantics, exact in double since the
    fractions are dyadic).  No sort of the full data anywhere.
    """
    from ray.data.aggregate import Count

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['lang', 'text'])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({
            'lang': t.column('lang'),
            'n_tokens': pa.array(
                [len(_TOKEN_RE.findall((s or '').lower()))
                 for s in t.column('text').to_pylist()], pa.int64())})

    hist = (ds.map_batches(tok, batch_format='pyarrow')
            .groupby(['lang', 'n_tokens'])
            .aggregate(Count(alias_name='cnt'))).take_all()

    by_lang: dict = {}
    for r in hist:
        by_lang.setdefault(r['lang'], []).append((r['n_tokens'], r['cnt']))
    langs, p25, p50, p75 = [], [], [], []
    for lang in sorted(by_lang):
        vals = sorted(by_lang[lang])
        xs = np.array([v for v, _ in vals], dtype=np.float64)
        cum = np.cumsum([c for _, c in vals])
        n = int(cum[-1])
        qs = []
        for q in (0.25, 0.5, 0.75):
            h = q * (n - 1)
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            # value at 0-based rank r = first xs index with cum > r
            a = xs[np.searchsorted(cum, lo, side='right')]
            b = xs[np.searchsorted(cum, hi, side='right')]
            qs.append(a + (h - lo) * (b - a))
        langs.append(lang)
        p25.append(qs[0])
        p50.append(qs[1])
        p75.append(qs[2])
    return pa.table({'lang': pa.array(langs, pa.string()),
                     'p25': pa.array(p25, pa.float64()),
                     'p50': pa.array(p50, pa.float64()),
                     'p75': pa.array(p75, pa.float64())})


def clean_corpus_quantile(sf_dir: str, q: float = 0.25):
    """Quantile-thresholded length filter: keep documents whose token
    count is at least their language's p25 (the data-driven variant of
    the fixed ``min_tokens`` floor in :func:`clean_corpus` — corpus
    statistics set the threshold, CCNet-style).

    Composition: :func:`token_quantiles` reduces the corpus to a
    per-(lang, length) histogram (O(thousands) rows) and interpolates
    the thresholds on the driver; the 5-row (lang → p25) map is
    broadcast and the filter is a pure vectorized second pass — no
    shuffle touches document text."""
    import ray

    from ..stages.textstats import _TOKEN_RE

    qt = token_quantiles(sf_dir)
    thr = dict(zip(qt.column('lang').to_pylist(),
                   qt.column('p25').to_pylist()))
    thr_ref = ray.put(thr)

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'text'])

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(thr_ref)
        n = [len(_TOKEN_RE.findall((s or '').lower()))
             for s in t.column('text').to_pylist()]
        mask = [c >= th[lg] for c, lg in
                zip(n, t.column('lang').to_pylist())]
        out = pa.table({'doc_id': t.column('doc_id'),
                        'lang': t.column('lang'),
                        'n_tokens': pa.array(n, pa.int64())})
        return out.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# the flagship crawl over derived pages

def crawl_depth_hist(sf_dir: str, max_depth: int = 6):
    """Visits per BFS depth over the flagship crawl — the wave-size
    report a crawl operator watches (and a second driver-gated oracle
    over the full crawl path).  Runs :func:`crawl_documents` end to
    end, then groups the answer-sized visits table by depth."""
    v = crawl_documents(sf_dir, max_depth=max_depth).to_pandas()
    g = (v.groupby('depth', as_index=False).size()
         .rename(columns={'size': 'n_visits'}))
    return pa.table({'depth': pa.array(g['depth'], pa.int64()),
                     'n_visits': pa.array(g['n_visits'], pa.int64())})


def crawl_documents(sf_dir: str, max_depth: int = 6):
    """BFS crawl of the documents-derived web (flagship pipeline).

    Seeds: one per host (docs 0..7).  Returns visits (url, depth,
    visit_order, status, n_links).
    """
    from ..pipelines.crawl import Crawler
    from ..sources.docs_pages import N_HOSTS, doc_url, pages_table_from_documents

    pages, n_docs = pages_table_from_documents(sf_dir)
    seeds = [doc_url(i) for i in range(min(N_HOSTS, n_docs))]
    c = Crawler(pages, max_depth=max_depth, max_links=100)
    visits = c.run(seeds)
    n_links = pa.array([len(x) for x in visits.column('links').to_pylist()],
                       pa.int64())
    return pa.table({'url': visits.column('url'),
                     'depth': visits.column('depth'),
                     'visit_order': visits.column('visit_order'),
                     'status': visits.column('status'),
                     'n_links': n_links})


def crawl_contacts(sf_dir: str, max_depth: int = 6):
    """Flagship crawl composed with contact extraction: the per-visit
    email (de-obfuscated 'user{id} AT example DOT com' →
    user{id}@example.com by construction) rides the extract stage
    through the BFS waves — SQL-oracled via the same recursive CTE as
    ``crawl_bfs``."""
    from ..pipelines.crawl import Crawler
    from ..sources.docs_pages import N_HOSTS, doc_url, pages_table_from_documents

    pages, n_docs = pages_table_from_documents(sf_dir)
    seeds = [doc_url(i) for i in range(min(N_HOSTS, n_docs))]
    c = Crawler(pages, max_depth=max_depth, max_links=100,
                with_contacts=True)
    visits = c.run(seeds)
    emails = [(e[0] if e else '')
              for e in visits.column('emails').to_pylist()]
    return pa.table({'url': visits.column('url'),
                     'depth': visits.column('depth'),
                     'visit_order': visits.column('visit_order'),
                     'email': pa.array(emails, pa.string())})


def dup_clusters(sf_dir: str, threshold: float = 0.8):
    """Near-dup clusters: the MinHash-LSH verified pair list (exact
    Jaccard >= threshold; recall 1.0 vs the all-pairs oracle at
    testdata scale) as a similarity graph, every member labeled with
    min(doc_id) of its connected component — the RefinedWeb/FineWeb
    dedup convention (keep one doc per COMPONENT, not per pair:
    pairwise drops can chain a-b-c into deleting every copy).

    Returns (doc_id, cluster_id), sorted, one row per doc that appears
    in at least one near-dup pair (singletons are implicitly their own
    cluster).  Components via :func:`~webscraping_ray.stages.clusters.
    connected_components` (tiered: driver numpy fold at answer size,
    hash-to-min Dataset joins above it)."""
    from ..stages.clusters import connected_components
    from ..stages.dedup import minhash_dup_pairs

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    pairs = minhash_dup_pairs(ds, threshold=threshold)
    return connected_components(pairs)


def clean_corpus_clustered(sf_dir: str, min_tokens: int = 20,
                           jaccard_threshold: float = 0.8):
    """Cluster-canonical cleaning composition: quality filter → exact
    dedup (:func:`clean_corpus`) → near-dup removal keeping ONE doc
    (the min doc_id) per connected component of the verified-pair
    graph.  Contrast :func:`clean_corpus_neardup`, which drops
    max(id) per PAIR: on a chain a-b-c that keeps only a, while the
    pairwise rule also re-drops b from (a,b) and c from (b,c) — same
    here — but on a-b, b-c WITHOUT a-c the pairwise rule keeps {a}
    only if a-b and b-c both verify; component semantics always keep
    exactly one per component regardless of which pairs verified.

    Survivors stay a Dataset; the drop list (non-canonical cluster
    members — answer-sized) is the only broadcast."""
    import ray

    from ..stages.clusters import connected_components
    from ..stages.dedup import minhash_dup_pairs

    survivors_ds = clean_corpus(sf_dir, min_tokens)
    docs = (_read(sf_dir, 'documents', ['doc_id', 'text'])
            .join(survivors_ds.map_batches(
                lambda t: pa.table({'keep_id': t['doc_id']}),
                batch_format='pyarrow'),
                'inner', num_partitions=8,
                on=('doc_id',), right_on=('keep_id',))
            .select_columns(['doc_id', 'text']))
    pairs = minhash_dup_pairs(docs, threshold=jaccard_threshold)
    cc = connected_components(pairs)
    drop = cc.filter(pc.not_equal(cc['doc_id'], cc['cluster_id']))
    drop_ref = ray.put(drop.column('doc_id').combine_chunks())

    def anti(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(
            pc.is_in(t['doc_id'], value_set=ray.get(drop_ref))))

    return docs.select_columns(['doc_id']).map_batches(
        anti, batch_format='pyarrow')


def dup_keep_best(sf_dir: str, threshold: float = 0.8):
    """Quality-aware near-dup survivorship — the FineWeb/Dolma
    refinement of :func:`dup_clusters`' min-id convention: for every
    connected component of the verified MinHash-LSH pair graph, keep
    the member with the MOST distinct word tokens (the :func:`quality`
    op's ``n_unique_tokens``), ties broken by lowest doc_id.

    Returns (cluster_id, keep_id, n_members), one row per component.

    Shape at scale: the component labeling is answer-sized by the
    :func:`dup_clusters` contract, so member ids broadcast ONCE
    (``ray.put``) and scoring is a corpus-side filter + pure
    ``map_batches`` — document text never enters a shuffle; the
    per-cluster argmax runs in :func:`_per_key_groups` coarse buckets
    (64 group-applies total, not O(clusters))."""
    import ray

    from ..stages.clusters import connected_components
    from ..stages.dedup import minhash_dup_pairs
    from ..stages.textstats import _TOKEN_RE

    docs = _read(sf_dir, 'documents', ['doc_id', 'text'])
    cc = connected_components(
        minhash_dup_pairs(docs, threshold=threshold))
    member_ids = cc.column('doc_id').combine_chunks()
    memb_ref = ray.put((
        member_ids,
        member_ids.to_numpy(zero_copy_only=False),   # sorted by contract
        cc.column('cluster_id').to_numpy(zero_copy_only=False)))

    def score(t: pa.Table) -> pa.Table:
        ids_arr, labels, clusters = ray.get(memb_ref)
        t = t.filter(pc.is_in(t['doc_id'], value_set=ids_arr))
        ids = t.column('doc_id').to_numpy(zero_copy_only=False)
        cl = clusters[np.searchsorted(labels, ids)] if len(ids) else \
            np.empty(0, np.int64)
        uniq = [len(set(_TOKEN_RE.findall((s or '').lower())))
                for s in t.column('text').to_pylist()]
        return pa.table({'cluster_id': pa.array(cl, pa.int64()),
                         'doc_id': t['doc_id'],
                         'score': pa.array(uniq, pa.int64())})

    scored = docs.map_batches(score, batch_format='pyarrow')

    def best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['score', 'doc_id'], ascending=[False, True])
        return pd.DataFrame({'cluster_id': [g['cluster_id'].iloc[0]],
                             'keep_id': [g['doc_id'].iloc[0]],
                             'n_members': [np.int64(len(g))]})

    return _per_key_groups(scored, 'cluster_id', best)


def chunk_documents(sf_dir: str, window: int = 256, stride: int = 192):
    """Fixed-token-window chunking with overlap (RAG / long-context
    training prep): each document's whitespace tokens (the
    :func:`token_count` ``\\S+`` contract) are cut into windows of
    ``window`` tokens starting every ``stride`` tokens — the final
    window is short, empty/null docs emit no chunks.

    Returns (doc_id, chunk_id, chunk_tokens).  Pure vectorized
    ``map_batches`` — per-doc counts, then ``np.repeat``/``arange``
    expansion; no shuffle, no text in the output, scale-safe by
    construction."""
    from ..stages.textstats import whitespace_token_count

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def chunks(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_numpy(zero_copy_only=False)
        n = np.array([whitespace_token_count(s)
                      for s in t.column('text').to_pylist()], np.int64)
        row, chunk_id, chunk_tokens = _chunk_spans(n, window, stride)
        return pa.table({'doc_id': pa.array(ids[row], pa.int64()),
                         'chunk_id': pa.array(chunk_id, pa.int64()),
                         'chunk_tokens': pa.array(chunk_tokens, pa.int64())})

    return ds.map_batches(chunks, batch_format='pyarrow')


def _chunk_spans(n: np.ndarray, window: int, stride: int):
    """Vectorized window/stride chunk expansion for
    :func:`chunk_documents`: given per-doc token counts ``n``, return
    (row_index, chunk_id, chunk_tokens) arrays — one entry per chunk,
    ``row_index`` pointing back into ``n``.  Property-tested against a
    naive per-doc loop (tests/test_properties.py)."""
    n = np.asarray(n, np.int64)
    n_chunks = np.where(n == 0, 0, (np.maximum(n, 1) - 1) // stride + 1)
    row = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
    rep_n = np.repeat(n, n_chunks)
    base = np.repeat(np.concatenate(
        ([0], np.cumsum(n_chunks)[:-1])) if len(n_chunks) else
        np.empty(0, np.int64), n_chunks)
    chunk_id = np.arange(int(n_chunks.sum()), dtype=np.int64) - base
    chunk_tokens = np.minimum(window, rep_n - chunk_id * stride)
    return row, chunk_id, chunk_tokens


#: pack_sequences prefix-sum bucket width: bucket = doc_id // this.
#: Bucket count is n_docs/4096, so the driver-side exclusive scan
#: holds ~2.4M int64s even at 10^10 docs.
PACK_BUCKET_DOCS = 4096


def pack_sequences(sf_dir: str, ctx: int = 2048):
    """Greedy concat-and-chunk sequence packing (GPT-style training
    prep): documents in doc_id order are laid end to end in token
    space and cut every ``ctx`` tokens; each doc is assigned the
    sequence index its first token lands in plus its offset within
    that sequence.  Tokens are whitespace tokens (same contract as
    :func:`token_count`).

    A distributed prefix sum: pass 1 is a per-bucket token-sum
    aggregate (bucket = doc_id // PACK_BUCKET_DOCS) whose output is
    bucket-count-sized — the driver exclusive-scans it and broadcasts
    the base offsets once (``ray.put``); pass 2 ``map_groups`` each
    bucket, sorting by doc_id inside the group and running a
    vectorized in-bucket cumsum on top of the broadcast base.  No
    global sort, no O(corpus) driver state."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.textstats import whitespace_token_count

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def counts(t: pa.Table) -> pa.Table:
        ids = t.column('doc_id').to_numpy(zero_copy_only=False)
        n = pa.array([whitespace_token_count(s)
                      for s in t.column('text').to_pylist()], pa.int64())
        return pa.table({'doc_id': t.column('doc_id'), 'n_tokens': n,
                         'bucket': pa.array(ids // PACK_BUCKET_DOCS,
                                            pa.int64())})

    cnt = ds.map_batches(counts, batch_format='pyarrow').materialize()

    bsums = (cnt.groupby('bucket')
             .aggregate(Sum('n_tokens', alias_name='bt')).take_all())
    bsums.sort(key=lambda r: r['bucket'])
    bids = np.array([r['bucket'] for r in bsums], np.int64)
    btok = np.array([r['bt'] for r in bsums], np.int64)
    bases = np.concatenate([[0], np.cumsum(btok)[:-1]])
    base_ref = ray.put((bids, bases))

    def pack(g: pa.Table) -> pa.Table:
        ids_b, base_b = ray.get(base_ref)
        g = g.sort_by('doc_id')
        n = g.column('n_tokens').to_numpy(zero_copy_only=False)
        b = g.column('bucket')[0].as_py()
        base = base_b[np.searchsorted(ids_b, b)]
        pre = base + np.cumsum(n) - n
        return pa.table({'doc_id': g.column('doc_id'),
                         'n_tokens': g.column('n_tokens'),
                         'seq_id': pa.array(pre // ctx, pa.int64()),
                         'seq_offset': pa.array(pre % ctx, pa.int64())})

    return cnt.groupby('bucket').map_groups(pack, batch_format='pyarrow')


def mixture_weights(sf_dir: str, alpha: float = 0.5):
    """Temperature-scaled language-mixing weights (the multilingual
    sampling rule of XLM-R / mT5: p_l ∝ share_l^alpha): per-language
    doc and whitespace-token totals, token share, and the normalized
    alpha-scaled sampling weight.

    Partial aggregation inside ``map_batches`` (one (lang, docs,
    tokens) row per lang per batch) feeds a lang-count-sized groupby;
    the finalize (shares, powers, normalization) runs on the driver
    over the answer itself."""
    from ray.data.aggregate import Sum

    from ..stages.textstats import whitespace_token_count

    ds = _read(sf_dir, 'documents', ['lang', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        import collections
        docs = collections.Counter()
        toks = collections.Counter()
        for lang, s in zip(t.column('lang').to_pylist(),
                           t.column('text').to_pylist()):
            docs[lang] += 1
            toks[lang] += whitespace_token_count(s)
        langs = sorted(docs)
        return pa.table({'lang': pa.array(langs, pa.string()),
                         'd': pa.array([docs[x] for x in langs],
                                       pa.int64()),
                         'tk': pa.array([toks[x] for x in langs],
                                        pa.int64())})

    rows = (ds.map_batches(partial, batch_format='pyarrow')
            .groupby('lang')
            .aggregate(Sum('d', alias_name='n_docs'),
                       Sum('tk', alias_name='n_tokens'))
            # rebuild blocks: hash aggregates emit schemaless empty
            # blocks for empty partitions (see stages/dedup._join_safe)
            .repartition(1)
            .take_all())
    rows.sort(key=lambda r: r['lang'])
    tok = np.array([r['n_tokens'] for r in rows], np.float64)
    share = tok / tok.sum()
    w = share ** alpha
    w = w / w.sum()
    out = pa.table({
        'lang': pa.array([r['lang'] for r in rows], pa.string()),
        'n_docs': pa.array([r['n_docs'] for r in rows], pa.int64()),
        'n_tokens': pa.array([r['n_tokens'] for r in rows], pa.int64()),
        'token_share': pa.array(share, pa.float64()),
        'weight': pa.array(w, pa.float64())})
    out = _snap_round(out, 'token_share', 6)
    return _snap_round(out, 'weight', 6)


def sample_mixture(sf_dir: str, alpha: float = 0.5, boost: int = 2):
    """Mixture-rate subsampling — the data-mixing step that applies
    :func:`mixture_weights` to the corpus: language ``l`` keeps
    documents at rate ``min(1, boost · weight_l)`` via the
    deterministic md5 predicate of :func:`sample_hash` (stable across
    cluster sizes, restarts, repartitioning).

    Float-exactness discipline: the per-lang keep threshold is derived
    from the ROUNDED (6-dp) weight — already proven bit-equal to the
    SQL oracle by the ``mixture_weights`` hash check — converted to
    integer parts-per-million, then scaled in pure integer arithmetic;
    the keep decision is an integer compare, so no float ever crosses
    the engine boundary.  Thresholds broadcast once (one row per
    lang); the sample itself is a single vectorized filter pass."""
    import hashlib

    import ray

    w = mixture_weights(sf_dir, alpha)
    thr = {lang: min(1_000_000, int(round(wt * 1e6)) * boost)
           for lang, wt in zip(w.column('lang').to_pylist(),
                               w.column('weight').to_pylist())}
    tref = ray.put(thr)

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang'])

    def keep(t: pa.Table) -> pa.Table:
        th = ray.get(tref)
        mask = [int.from_bytes(
                    hashlib.md5(str(i).encode()).digest()[8:],
                    'little') % 1_000_000 < th.get(lang, 0)
                for i, lang in zip(t.column('doc_id').to_pylist(),
                                   t.column('lang').to_pylist())]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format='pyarrow')


def embedding_dup_clusters(sf_dir: str, threshold: float = 0.95):
    """Connected components of the embedding-cosine near-dup graph
    (IVF-bucketed pair discovery — the scale path; recall vs the brute
    oracle is pytest-pinned), labeled min(vec_id) per component.
    Returns (doc_id, cluster_id) — the column names follow
    :func:`dup_clusters` so both cluster ops share one schema."""
    from ..stages.clusters import connected_components
    from ..stages.dedup import embedding_dup_pairs

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    pairs = embedding_dup_pairs(ds, threshold=threshold, method='ivf')
    return connected_components(pairs)


def events_band_join(sf_dir: str, band_s: int = 600,
                     method: str = 'per_key'):
    """Band (interval) self-join: for every event, the count and value
    sum of OTHER events by the same user within ±band_s seconds.

    Ray Data has no range-join operator; the scale shape here is
    shuffle-by-equality-key (user) + a vectorized two-sided
    ``searchsorted`` over the ts-sorted group with prefix-sum window
    sums — O(n log n) per key instead of the O(n²) nested-loop a naive
    cross join would do.  For equality keys too hot to fit one group,
    ``method='time_bucket'`` splits every user by band-width time
    buckets, replicating each row into its 3 adjacent (user, bucket)
    groups so every ±band window is complete within one group — the
    same searchsorted kernel, emitting only each row's home copy
    (:func:`_events_band_join_time_bucket`; tiers test-pinned equal).
    Timestamps compare in integer microseconds — no float time math."""
    ds = _read(sf_dir, 'events', ['event_id', 'user_id', 'ts', 'value'])
    band_us = band_s * 1_000_000
    if method == 'time_bucket':
        return _events_band_join_time_bucket(ds, band_us)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values('ts')
        ts = g['ts'].astype('int64').to_numpy()
        v = g['value'].to_numpy()
        lo = np.searchsorted(ts, ts - band_us, side='left')
        hi = np.searchsorted(ts, ts + band_us, side='right')
        cum = np.concatenate([[0.0], np.cumsum(v)])
        return pd.DataFrame({
            'event_id': g['event_id'].to_numpy(),
            'n_nearby': (hi - lo - 1).astype('int64'),
            'sum_nearby_value': cum[hi] - cum[lo] - v})

    out = _per_key_groups(ds, 'user_id', per_user)
    return out.map_batches(lambda t: _snap_round(t, 'sum_nearby_value'),
                           batch_format='pyarrow')


def _events_band_join_time_bucket(ds, band_us: int):
    """Hot-key tier of :func:`events_band_join`: each row replicates
    into its own and both adjacent band-width time buckets keyed
    (user, bucket), so a hot user's groups are bounded by per-band
    row counts instead of total row count; each group runs the same
    searchsorted kernel and emits only its home rows (every original
    row is home in exactly one group)."""

    def replicate(t: pa.Table) -> pa.Table:
        ts = t.column('ts').cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = t.column('user_id').to_numpy(zero_copy_only=False)
        eid = t.column('event_id').to_numpy(zero_copy_only=False)
        val = t.column('value').to_numpy(zero_copy_only=False)
        bkt = ts // band_us
        out = {'gkey': [], 'event_id': [], 'ts': [], 'value': [],
               'home': []}
        for delta in (-1, 0, 1):
            out['gkey'].append(np.char.add(
                np.char.add(uid.astype('U'), ':'),
                (bkt + delta).astype('U')))
            out['event_id'].append(eid)
            out['ts'].append(ts)
            out['value'].append(val)
            out['home'].append(np.full(len(eid), delta == 0, bool))
        return pa.table({
            'gkey': pa.array(np.concatenate(out['gkey']), pa.string()),
            'event_id': pa.array(np.concatenate(out['event_id']),
                                 pa.int64()),
            'ts': pa.array(np.concatenate(out['ts']), pa.int64()),
            'value': pa.array(np.concatenate(out['value']),
                              pa.float64()),
            'home': pa.array(np.concatenate(out['home']), pa.bool_())})

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values('ts')
        ts = g['ts'].to_numpy()
        v = g['value'].to_numpy()
        home = g['home'].to_numpy()
        lo = np.searchsorted(ts, ts - band_us, side='left')
        hi = np.searchsorted(ts, ts + band_us, side='right')
        cum = np.concatenate([[0.0], np.cumsum(v)])
        n = (hi - lo - 1).astype('int64')
        s = cum[hi] - cum[lo] - v
        return pd.DataFrame({
            'event_id': g['event_id'].to_numpy()[home],
            'n_nearby': n[home],
            'sum_nearby_value': s[home]})

    out = _per_key_groups(ds.map_batches(replicate,
                                         batch_format='pyarrow'),
                          'gkey', per_group)
    return out.map_batches(lambda t: _snap_round(t, 'sum_nearby_value'),
                           batch_format='pyarrow')


def repeated_spans(sf_dir: str, k: int = 16, as_dataset: bool = False):
    """Exact-substring repeated-span detection — the ExactSubstr pass
    of Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022), re-expressed as hashed positional word
    ``k``-grams instead of a monolithic suffix array (which needs the
    whole corpus in one address space).  Flags every (doc_id, pos)
    whose k-token span text occurs >= 2 times corpus-wide; tokens are
    lowercased ``\\w+`` (the shingle convention, positional variant:
    docs under k tokens emit no spans).

    Two corpus passes; positions themselves never shuffle in the
    default tier: pass 1 folds per-batch span counts (16-byte blake2b
    span hashes) into a groupby-sum whose >=2 survivors are
    answer-scale for realistic dup rates — broadcast once via
    ``ray.put`` under ``BROADCAST_KEY_LIMIT``, else hash-joined (two
    int64 key columns) against the re-exploded spans; pass 2 keeps
    flagged positions.  Returns (doc_id, pos, n_occurrences) — as a
    Dataset when ``as_dataset`` (for distributed compositions like
    the remove_repeated_spans join tier), else collected (the query
    answer).
    """
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe, _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def span_digests(doc: str):
        toks = _TOKEN_RE.findall((doc or '').lower())
        for i in range(len(toks) - k + 1):
            yield i, hashlib.blake2b(
                ' '.join(toks[i:i + k]).encode('utf-8', 'surrogatepass'),
                digest_size=16).digest()

    def count_partial(t: pa.Table) -> pa.Table:
        import collections
        cnt = collections.Counter()
        for txt in t.column('text').to_pylist():
            for _, d in span_digests(txt):
                cnt[d] += 1
        ks = list(cnt)
        return pa.table({
            'h1': pa.array([int.from_bytes(d[:8], 'little', signed=False)
                            - (1 << 63) for d in ks], pa.int64()),
            'h2': pa.array([int.from_bytes(d[8:], 'little', signed=False)
                            - (1 << 63) for d in ks], pa.int64()),
            'c': pa.array([cnt[d] for d in ks], pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format='pyarrow')
              .groupby(['h1', 'h2'])
              .aggregate(Sum('c', alias_name='n_occurrences')))
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t['n_occurrences'], 2)),
        batch_format='pyarrow').materialize()
    n_dup = dup.count()
    schema = pa.schema([('doc_id', pa.int64()), ('pos', pa.int64()),
                        ('n_occurrences', pa.int64())])
    if n_dup == 0:
        if as_dataset:
            return ray.data.from_arrow(schema.empty_table())
        return schema.empty_table()

    def explode(t: pa.Table) -> pa.Table:
        ids, poss, hs1, hs2 = [], [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            for pos, d in span_digests(txt):
                ids.append(i)
                poss.append(pos)
                hs1.append(int.from_bytes(d[:8], 'little') - (1 << 63))
                hs2.append(int.from_bytes(d[8:], 'little') - (1 << 63))
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'pos': pa.array(poss, pa.int64()),
                         'h1': pa.array(hs1, pa.int64()),
                         'h2': pa.array(hs2, pa.int64())})

    if n_dup <= BROADCAST_KEY_LIMIT:
        dmap = {}
        for b in dup.iter_batches(batch_format='pyarrow'):
            dmap.update(zip(zip(b.column('h1').to_pylist(),
                                b.column('h2').to_pylist()),
                            b.column('n_occurrences').to_pylist()))
        dref = ray.put(dmap)

        def flag(t: pa.Table) -> pa.Table:
            dm = ray.get(dref)
            sp = explode(t)
            keep, occ = [], []
            for j, key in enumerate(zip(sp.column('h1').to_pylist(),
                                        sp.column('h2').to_pylist())):
                c = dm.get(key)
                if c is not None:
                    keep.append(j)
                    occ.append(c)
            sp = sp.take(pa.array(keep, pa.int64()))
            return pa.table({'doc_id': sp.column('doc_id'),
                             'pos': sp.column('pos'),
                             'n_occurrences': pa.array(occ, pa.int64())})

        out = ds.map_batches(flag, batch_format='pyarrow')
        if as_dataset:
            return out
        batches = [b for b in out.iter_batches(batch_format='pyarrow')
                   if b.num_rows]
        return (pa.concat_tables(batches) if batches
                else schema.empty_table())

    # join tier: dup-key set too big to broadcast — shuffle the
    # exploded positions against the dup keys (both sides hash-
    # partition on (h1, h2))
    joined = (ds.map_batches(explode, batch_format='pyarrow')
              .join(_join_safe(dup), 'inner', num_partitions=8,
                    on=('h1', 'h2'), right_on=('h1', 'h2'))
              .select_columns(['doc_id', 'pos', 'n_occurrences']))
    if as_dataset:
        return joined
    batches = [b for b in joined.iter_batches(batch_format='pyarrow')
               if b.num_rows]
    return (pa.concat_tables(batches) if batches
            else schema.empty_table())


def write_training_shards(sf_dir: str, out_dir: str, ctx: int = 2048,
                          seqs_per_shard: int = 64):
    """Resumable partitioned training-shard sink: pack documents into
    fixed-``ctx`` token sequences (:func:`pack_sequences`) and write
    one parquet file per shard of ``seqs_per_shard`` consecutive
    sequences — ``out_dir/shard=NNNNNN/part.parquet``.

    Each shard writes through a tmp-file + atomic ``os.replace`` and is
    SKIPPED if its file already exists, so a failed run resumes by
    rerunning the same command — finished shards are never rewritten
    or re-read (the brief's "resumable output" contract; the
    deterministic pack means a rewrite would be byte-identical
    anyway).  Shard assignment is a pure function of seq_id, so the
    partitioning is stable under any input repartitioning.  Returns a
    pyarrow Table (shard, n_rows, skipped) sorted by shard.
    """
    import os
    import uuid

    packed = pack_sequences(sf_dir, ctx=ctx)

    def add_shard(t: pa.Table) -> pa.Table:
        sid = t.column('seq_id').to_numpy(zero_copy_only=False)
        return t.append_column(
            'shard', pa.array(sid // seqs_per_shard, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        shard = int(g.column('shard')[0].as_py())
        d = os.path.join(out_dir, f'shard={shard:06d}')
        final = os.path.join(d, 'part.parquet')
        if os.path.exists(final):
            return pa.table({'shard': pa.array([shard], pa.int64()),
                             'n_rows': pa.array([g.num_rows], pa.int64()),
                             'skipped': pa.array([True])})
        os.makedirs(d, exist_ok=True)
        body = g.sort_by([('seq_id', 'ascending'),
                          ('seq_offset', 'ascending')]).drop(['shard'])
        tmp = os.path.join(d, f'.tmp-{uuid.uuid4().hex}')
        pq.write_table(body, tmp)
        os.replace(tmp, final)
        return pa.table({'shard': pa.array([shard], pa.int64()),
                         'n_rows': pa.array([g.num_rows], pa.int64()),
                         'skipped': pa.array([False])})

    stats = (packed.map_batches(add_shard, batch_format='pyarrow')
             .groupby('shard').map_groups(write_shard,
                                          batch_format='pyarrow')
             .take_all())
    stats.sort(key=lambda r: r['shard'])
    return pa.table({
        'shard': pa.array([r['shard'] for r in stats], pa.int64()),
        'n_rows': pa.array([r['n_rows'] for r in stats], pa.int64()),
        'skipped': pa.array([r['skipped'] for r in stats], pa.bool_())})


def bpe_pair_counts(sf_dir: str, top_k: int = 100):
    """The first merge step of BPE tokenizer training (Sennrich et al.
    2016): corpus-wide counts of adjacent CHARACTER pairs within word
    tokens (lowercased ``\\w+``), returning the ``top_k`` most frequent
    pairs — the candidates the first merge would pick from.

    Returns (pair, n) ordered by (n desc, pair asc) — a deterministic
    total order, so the top-k cut is tie-stable.

    Scale shape: the pair vocabulary is tiny (O(alphabet²)), so each
    batch emits ONE partially-aggregated count table (a Counter over
    the batch, not a row per occurrence) and the global
    ``groupby('pair').sum`` reduces 100 TB of text to a few thousand
    rows before the driver-side top-k — the canonical
    combiner-before-shuffle pattern."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column('text').to_pylist():
            for w in _TOKEN_RE.findall((s or '').lower()):
                for i in range(len(w) - 1):
                    c[w[i:i + 2]] += 1
        return pa.table({'pair': pa.array(list(c.keys()), pa.string()),
                         'n': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby('pair').aggregate(Sum('n', alias_name='n')))
    top = counts.sort(['n', 'pair'], descending=[True, False]).limit(top_k)
    return top.map_batches(
        lambda t: t.select(['pair', 'n']), batch_format='pyarrow')


def oov_rate(sf_dir: str, vocab_size: int = 1000):
    """Vocabulary-coverage diagnostic (tokenizer-prep): per document,
    how many word tokens fall outside the corpus's own top
    ``vocab_size`` unigram vocabulary (count desc, token asc — a total
    order, so the vocab cut is tie-stable).  Returns (doc_id,
    n_tokens, n_oov) for EVERY document (token-less docs score 0/0);
    integer outputs so the oracle compare has no float boundaries.

    Scale shape: per-batch Counter partials shrink the token stream to
    one (token, count) table per block before the vocab groupby-sum;
    the vocab itself is ``vocab_size`` rows — broadcast once via
    ``ray.put`` — and the scoring pass is pure ``map_batches``."""
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((s or '').lower()))
        return pa.table({'tok': pa.array(list(c.keys()), pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    top = (ds.map_batches(partial, batch_format='pyarrow')
           .groupby('tok').aggregate(Sum('c', alias_name='n'))
           .sort(['n', 'tok'], descending=[True, False])
           .limit(vocab_size))
    vocab_ref = ray.put(frozenset(
        t for b in top.iter_batches(batch_format='pyarrow')
        for t in b.column('tok').to_pylist()))

    def score(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        n_tok, n_oov = [], []
        for s in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((s or '').lower())
            n_tok.append(len(toks))
            n_oov.append(sum(1 for w in toks if w not in vocab))
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_tokens': pa.array(n_tok, pa.int64()),
                         'n_oov': pa.array(n_oov, pa.int64())})

    return ds.map_batches(score, batch_format='pyarrow')


def unigram_logprob(sf_dir: str, force_join: bool = False):
    """Unigram-LM document scoring (the KenLM-perplexity proxy used by
    CCNet-style quality filtering, reduced to its order-0 core): mean
    per-token log-probability of each doc under the corpus unigram
    distribution.  Low scores = improbable token soup.

    Pass 1 builds the vocabulary counts (per-batch Counter partials →
    groupby-sum — the shuffle carries (token, count) partials); the
    log-prob table broadcasts once via ``ray.put`` (web-corpus
    vocabularies are ~1e7-1e8 keys — GBs, still broadcastable).
    Beyond that, ``force_join`` (or the same auto switch as
    bigram_logprob at BIGRAM_BROADCAST_LIMIT vocab entries) routes
    through :func:`_unigram_logprob_join` — exploded token rows
    hash-join the count Dataset, per-doc hash-aggregate reduce, no
    O(vocab) structure anywhere; tiers test-pinned equal.  Pass 2
    scores each doc vectorized against the broadcast map.  Returns
    (doc_id, n_tokens, logprob_per_token rounded to 4) — token-less
    docs score 0.0."""
    import collections
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _TOKEN_RE

    if force_join:
        return _unigram_logprob_join(sf_dir)

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def vocab_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        return pa.table({'w': pa.array(list(c.keys()), pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(vocab_partial, batch_format='pyarrow')
              .groupby('w').aggregate(Sum('c', alias_name='c'))
              .materialize())
    if counts.count() > BIGRAM_BROADCAST_LIMIT:
        return _unigram_logprob_join(sf_dir)
    vocab = {}
    for b in counts.iter_batches(batch_format='pyarrow'):
        vocab.update(zip(b.column('w').to_pylist(),
                         b.column('c').to_pylist()))
    total = sum(vocab.values())
    logp = {w: math.log(c / total) for w, c in vocab.items()}
    lref = ray.put(logp)

    def score(t: pa.Table) -> pa.Table:
        lp = ray.get(lref)
        ids = t.column('doc_id')
        ns, scores = [], []
        for txt in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((txt or '').lower())
            ns.append(len(toks))
            scores.append(sum(lp[w] for w in toks) / len(toks)
                          if toks else 0.0)
        return pa.table({'doc_id': ids,
                         'n_tokens': pa.array(ns, pa.int64()),
                         'logprob_per_token': pa.array(scores,
                                                       pa.float64())})

    out = ds.map_batches(score, batch_format='pyarrow')
    return out.map_batches(
        lambda t: _snap_round(t, 'logprob_per_token', 4),
        batch_format='pyarrow')


#: bigram vocabularies at or below this many entries broadcast via
#: ray.put; above it the scorer switches to the hash-join tier
BIGRAM_BROADCAST_LIMIT = 2_000_000


def bigram_logprob(sf_dir: str, alpha: float = 0.1,
                   force_join: bool = False):
    """Bigram-LM document scoring with add-α smoothing — one model
    order past :func:`unigram_logprob` toward the KenLM 5-gram filter
    of CCNet: mean ln P(w2|w1) over each doc's adjacent token pairs,
    P(w2|w1) = (c(w1 w2) + α) / (c(w1) + α·V) with c() corpus counts
    and V the unigram vocabulary size.  Repetitive template text
    scores high, token soup scores low — and unlike the unigram score
    it penalizes *implausible orderings*, not just rare words.

    Tiered like tfidf_top_terms: at or below
    ``BIGRAM_BROADCAST_LIMIT`` bigram entries the two count tables
    broadcast once via ``ray.put`` and scoring is a single map pass;
    above it (web-corpus bigram tables run ~10× unigram vocabularies)
    the scorer explodes (doc_id, w1, w2) rows to parquet and
    hash-joins the count tables back on the gram keys, reducing per
    doc with a vectorized hash aggregate — no O(vocab) structure
    anywhere (:func:`_bigram_logprob_join`; tiers test-pinned equal).
    Docs with < 2 tokens score 0.0 with n_bigrams = 0.  Float parity
    with the SQL oracle rides on round(4) absorbing summation-order
    ulp drift, the proven unigram pattern."""
    import collections
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _TOKEN_RE

    if force_join:
        return _bigram_logprob_join(sf_dir, alpha)

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def gram_partials(t: pa.Table) -> pa.Table:
        uni: collections.Counter = collections.Counter()
        bi: collections.Counter = collections.Counter()
        for txt in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((txt or '').lower())
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        # one keyed stream: unigrams as ('u', w), bigrams as ('b', w1 w2)
        ks = [('u', w) for w in uni] + [('b', '%s %s' % g) for g in bi]
        cs = list(uni.values()) + list(bi.values())
        return pa.table({
            'kind': pa.array([k for k, _ in ks], pa.string()),
            'g': pa.array([g for _, g in ks], pa.string()),
            'c': pa.array(cs, pa.int64())})

    counts = (ds.map_batches(gram_partials, batch_format='pyarrow')
              .groupby(['kind', 'g']).aggregate(Sum('c', alias_name='c'))
              .materialize())
    # the documented limit is on BIGRAM entries — count only kind='b'
    # rows toward it, not the unigram vocabulary riding in the same
    # keyed stream
    n_bigram_entries = counts.map_batches(
        lambda t: pa.table({'n': pa.array(
            [t.filter(pc.equal(t.column('kind'), 'b')).num_rows],
            pa.int64())}),
        batch_format='pyarrow').sum('n') or 0
    if n_bigram_entries > BIGRAM_BROADCAST_LIMIT:
        return _bigram_logprob_join(sf_dir, alpha)

    uni_c: dict = {}
    bi_c: dict = {}
    for b in counts.iter_batches(batch_format='pyarrow'):
        for kind, g, c in zip(b.column('kind').to_pylist(),
                              b.column('g').to_pylist(),
                              b.column('c').to_pylist()):
            (uni_c if kind == 'u' else bi_c)[g] = c
    v = float(len(uni_c))
    uref = ray.put(uni_c)
    bref = ray.put(bi_c)

    def score(t: pa.Table) -> pa.Table:
        uc = ray.get(uref)
        bc = ray.get(bref)
        ns, scores = [], []
        for txt in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((txt or '').lower())
            n = max(0, len(toks) - 1)
            ns.append(n)
            if not n:
                scores.append(0.0)
                continue
            s = sum(math.log((bc.get('%s %s' % (w1, w2), 0) + alpha)
                             / (uc[w1] + alpha * v))
                    for w1, w2 in zip(toks, toks[1:]))
            scores.append(s / n)
        return pa.table({'doc_id': t.column('doc_id'),
                         'n_bigrams': pa.array(ns, pa.int64()),
                         'bigram_logprob': pa.array(scores, pa.float64())})

    out = ds.map_batches(score, batch_format='pyarrow')
    return out.map_batches(
        lambda t: _snap_round(t, 'bigram_logprob', 4),
        batch_format='pyarrow')


def _unigram_logprob_join(sf_dir: str, num_partitions: int = 8):
    """Hash-join tier of :func:`unigram_logprob`: counts stay a
    Dataset (Counter partials → groupby-sum), exploded (doc_id, w)
    token rows join it on the token, and the per-doc mean is a
    vectorized hash aggregate — no O(vocab) structure on any node."""
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _TOKEN_RE, _join_safe

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def uni_partials(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        return pa.table({'w': pa.array(list(c.keys()), pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    uni = _join_safe(ds.map_batches(uni_partials, batch_format='pyarrow')
                     .groupby('w').aggregate(Sum('c', alias_name='c')),
                     num_partitions).materialize()
    total = float(uni.aggregate(Sum('c'))['sum(c)'])

    def tok_rows(t: pa.Table) -> pa.Table:
        ids, ws = [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            for w in _TOKEN_RE.findall((txt or '').lower()):
                ids.append(i)
                ws.append(w)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'w': pa.array(ws, pa.string())})

    joined = (ds.map_batches(tok_rows, batch_format='pyarrow')
              .join(uni, 'inner', num_partitions=num_partitions,
                    on=('w',), right_on=('w',)))

    def term(t: pa.Table) -> pa.Table:
        c = t.column('c').to_numpy(zero_copy_only=False)
        return pa.table({
            'doc_id': t['doc_id'],
            'term': pa.array(np.log(c / total), pa.float64())})

    per_doc = _join_safe(
        joined.map_batches(term, batch_format='pyarrow')
        .groupby('doc_id').aggregate(Sum('term', alias_name='s'),
                                     Count(alias_name='n')),
        num_partitions)

    docs = _read(sf_dir, 'documents', ['doc_id'])
    out = docs.join(per_doc, 'left_outer', num_partitions=num_partitions,
                    on=('doc_id',), right_on=('doc_id',))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column('s').to_pylist()
        n = t.column('n').to_pylist()
        ns = [int(x) if x is not None else 0 for x in n]
        lp = [(a / b) if b else 0.0
              for a, b in zip((x or 0.0 for x in s), ns)]
        return pa.table({'doc_id': t['doc_id'],
                         'n_tokens': pa.array(ns, pa.int64()),
                         'logprob_per_token': pa.array(lp, pa.float64())})

    return out.map_batches(finish, batch_format='pyarrow').map_batches(
        lambda t: _snap_round(t, 'logprob_per_token', 4),
        batch_format='pyarrow')


def _bigram_logprob_join(sf_dir: str, alpha: float,
                         num_partitions: int = 8):
    """Hash-join tier of :func:`bigram_logprob` — no O(vocab)
    structure on any single node: (doc_id, w1, w2) rows persist to
    parquet once (read twice: count pass + scoring join), count
    tables stay Datasets and join back on the gram keys, and the
    per-doc reduction is a vectorized hash aggregate (Sum/Count — not
    a group-apply)."""
    import math
    import tempfile

    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _TOKEN_RE, _join_safe

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def bg_rows(t: pa.Table) -> pa.Table:
        ids, w1s, w2s = [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            toks = _TOKEN_RE.findall((txt or '').lower())
            for a, b in zip(toks, toks[1:]):
                ids.append(i)
                w1s.append(a)
                w2s.append(b)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'w1': pa.array(w1s, pa.string()),
                         'w2': pa.array(w2s, pa.string())})

    bg_path = tempfile.mkdtemp(prefix='wsray_bigram_') + '/bg'
    ds.map_batches(bg_rows, batch_format='pyarrow').write_parquet(bg_path)
    bg = ray.data.read_parquet(bg_path).map_batches(
        _strip_meta, batch_format='pyarrow')

    def uni_partials(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        return pa.table({'w': pa.array(list(c.keys()), pa.string()),
                         'c1': pa.array(list(c.values()), pa.int64())})

    uni = _join_safe(ds.map_batches(uni_partials, batch_format='pyarrow')
                     .groupby('w').aggregate(Sum('c1', alias_name='c1')),
                     num_partitions).materialize()
    v = float(uni.count())
    bc = _join_safe(bg.groupby(['w1', 'w2'])
                    .aggregate(Count(alias_name='c2')), num_partitions)

    # _join_safe between the chained joins (schemaless empty blocks
    # from the first join break the second intermittently — see
    # clusters._cc_dataset)
    joined = _join_safe(
        bg.join(bc, 'inner', num_partitions=num_partitions,
                on=('w1', 'w2'), right_on=('w1', 'w2')),
        num_partitions).join(uni, 'inner',
                             num_partitions=num_partitions,
                             on=('w1',), right_on=('w',))

    def term(t: pa.Table) -> pa.Table:
        c2 = t.column('c2').to_numpy(zero_copy_only=False)
        c1 = t.column('c1').to_numpy(zero_copy_only=False)
        return pa.table({
            'doc_id': t['doc_id'],
            'term': pa.array(np.log((c2 + alpha) / (c1 + alpha * v)),
                             pa.float64())})

    per_doc = _join_safe(
        joined.map_batches(term, batch_format='pyarrow')
        .groupby('doc_id').aggregate(Sum('term', alias_name='s'),
                                     Count(alias_name='n')),
        num_partitions)

    docs = _read(sf_dir, 'documents', ['doc_id'])
    out = docs.join(per_doc, 'left_outer', num_partitions=num_partitions,
                    on=('doc_id',), right_on=('doc_id',))

    def finish(t: pa.Table) -> pa.Table:
        s = t.column('s').to_pylist()
        n = t.column('n').to_pylist()
        ns = [int(x) if x is not None else 0 for x in n]
        lp = [(a / b) if b else 0.0
              for a, b in zip((x or 0.0 for x in s), ns)]
        return pa.table({'doc_id': t['doc_id'],
                         'n_bigrams': pa.array(ns, pa.int64()),
                         'bigram_logprob': pa.array(lp, pa.float64())})

    return out.map_batches(finish, batch_format='pyarrow').map_batches(
        lambda t: _snap_round(t, 'bigram_logprob', 4),
        batch_format='pyarrow')


def remove_repeated_spans(sf_dir: str, k: int = 16,
                          force_join: bool = False):
    """Full ExactSubstr cleaning (the second half of Lee et al. 2022):
    drop every token covered by any corpus-repeated ``k``-token span
    (all copies — the conservative variant) and re-emit the cleaned
    token stream.  Returns (doc_id, n_tokens_kept, n_tokens_removed,
    text_clean) for every document; ``text_clean`` is the surviving
    lowercased token stream joined by single spaces (the span
    inventory is defined over tokens, so the rewrite is too).

    Composition: :func:`repeated_spans` supplies the flagged
    positions (answer-scale for realistic dup rates — same argument
    as the dedup dup-key broadcast); positions merge into covering
    intervals per doc on the driver (O(flags)) and broadcast once;
    each batch then drops covered tokens vectorized.  At extreme dup
    rates — O(flags) ~ O(corpus) — ``force_join`` routes through
    :func:`_remove_repeated_spans_join`: flags stay a Dataset,
    compact to one interval-list row per flagged doc, and hash-join
    the documents; tiers test-pinned equal."""
    import ray

    from ..stages.dedup import _TOKEN_RE

    if force_join:
        return _remove_repeated_spans_join(sf_dir, k)

    flags = repeated_spans(sf_dir, k)
    by_doc: dict = {}
    for i, p in zip(flags.column('doc_id').to_pylist(),
                    flags.column('pos').to_pylist()):
        by_doc.setdefault(i, []).append(p)
    intervals = {}
    for i, ps in by_doc.items():
        ps.sort()
        merged = []
        for p in ps:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], p + k)
            else:
                merged.append([p, p + k])
        intervals[i] = merged
    iref = ray.put(intervals)

    def rewrite(t: pa.Table) -> pa.Table:
        iv = ray.get(iref)
        kept_n, rem_n, clean = [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            toks = _TOKEN_RE.findall((txt or '').lower())
            spans = iv.get(i)
            if not spans:
                kept_n.append(len(toks))
                rem_n.append(0)
                clean.append(' '.join(toks))
                continue
            mask = np.ones(len(toks), dtype=bool)
            for s, e in spans:
                mask[s:e] = False
            kept = [w for w, m in zip(toks, mask) if m]
            kept_n.append(len(kept))
            rem_n.append(len(toks) - len(kept))
            clean.append(' '.join(kept))
        return pa.table({
            'doc_id': t.column('doc_id'),
            'n_tokens_kept': pa.array(kept_n, pa.int64()),
            'n_tokens_removed': pa.array(rem_n, pa.int64()),
            'text_clean': pa.array(clean, pa.string())})

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ds.map_batches(rewrite, batch_format='pyarrow')


def _remove_repeated_spans_join(sf_dir: str, k: int = 16,
                                num_partitions: int = 8):
    """Distributed tier of :func:`remove_repeated_spans` — no O(flags)
    structure on the driver: the flagged positions stay a Dataset,
    compact to ONE row per flagged doc (sorted merged intervals as
    list columns, built per coarse doc bucket), and left-join the
    documents on doc_id; the rewrite then runs per batch exactly as
    the broadcast tier."""
    from ..stages.dedup import _TOKEN_RE

    flags = repeated_spans(sf_dir, k, as_dataset=True)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        merged = []
        for p in np.sort(g['pos'].to_numpy()):
            if merged and p <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], int(p) + k)
            else:
                merged.append([int(p), int(p) + k])
        # Acero joins reject list payload columns — carry the merged
        # intervals as a compact "lo:hi,lo:hi" string instead
        iv = ','.join('%d:%d' % (a, b) for a, b in merged)
        return pd.DataFrame({'doc_id': [g['doc_id'].iloc[0]],
                             'iv': [iv]})

    from ..stages.dedup import _join_safe

    # _join_safe: the group-apply output carries schemaless empty
    # blocks (Ray 2.49 defect) that make the Acero join below fail
    # intermittently — rebuild blocks first
    per = _join_safe(_per_key_groups(flags.select_columns(['doc_id',
                                                           'pos']),
                                     'doc_id', per_doc),
                     num_partitions)

    docs = _read(sf_dir, 'documents', ['doc_id', 'text'])
    joined = docs.join(per, 'left_outer', num_partitions=num_partitions,
                       on=('doc_id',), right_on=('doc_id',))

    def rewrite(t: pa.Table) -> pa.Table:
        kept_n, rem_n, clean = [], [], []
        for txt, iv in zip(t.column('text').to_pylist(),
                           t.column('iv').to_pylist()):
            toks = _TOKEN_RE.findall((txt or '').lower())
            if not iv:
                kept_n.append(len(toks))
                rem_n.append(0)
                clean.append(' '.join(toks))
                continue
            mask = np.ones(len(toks), dtype=bool)
            for pair in iv.split(','):
                s, e = pair.split(':')
                mask[int(s):int(e)] = False
            kept = [w for w, m in zip(toks, mask) if m]
            kept_n.append(len(kept))
            rem_n.append(len(toks) - len(kept))
            clean.append(' '.join(kept))
        return pa.table({
            'doc_id': t.column('doc_id'),
            'n_tokens_kept': pa.array(kept_n, pa.int64()),
            'n_tokens_removed': pa.array(rem_n, pa.int64()),
            'text_clean': pa.array(clean, pa.string())})

    return joined.map_batches(rewrite, batch_format='pyarrow')


def _doc_lines(txt: str, words_per_line: int | None) -> list:
    """Deterministic line segmentation for :func:`line_dedup` on the
    newline-free synthetic corpus: consecutive ``words_per_line``-word
    windows of ``text.split(' ')`` (the oracle recomputes the same
    windows with DuckDB list slicing).  On real webtext pass
    ``words_per_line=None`` to split on newlines instead."""
    if words_per_line is None:
        return (txt or '').split('\n')
    words = (txt or '').split(' ')
    return [' '.join(words[i:i + words_per_line])
            for i in range(0, len(words), words_per_line)]


def line_dedup(sf_dir: str, words_per_line: int | None = 10,
               force_join: bool = False, num_partitions: int = 8):
    """Corpus-wide line-level exact dedup — C4 / RefinedWeb / Dolma's
    "drop every repeated line, keep only its first occurrence" (Raffel
    et al. 2020 §2.2 dedup unit; Penedo et al. 2023 line-wise
    corrections), first-occurrence order = (doc_id, line_no).  Returns
    (doc_id, n_lines_kept, n_lines_removed, text_clean) for every
    document, ``text_clean`` = surviving lines joined by newline.
    Empty lines are exempt (always kept) — on real webtext deduping
    blank separator lines would strip paragraph structure corpus-wide.

    100-TB shape: pass 1 ships only 16-byte blake2b line digests,
    pre-counted per block (Counter fold inside map_batches), into a
    groupby-sum; the >=2 survivors with their min (doc_id, line_no)
    key are answer-scale for realistic dup rates — broadcast once via
    ``ray.put`` under ``BROADCAST_KEY_LIMIT``, else (or under
    ``force_join``) the exploded (doc_id, line_no, digest) rows
    hash-join the dup table and the removed line_nos fold to one
    compact row per affected doc (coarse-bucket
    :func:`_per_key_groups`, no per-key Ray group-apply) that
    left-joins the documents.  Line TEXT never enters a shuffle in
    either tier; pass 2 rewrites docs in place per batch.  Tiers are
    test-pinned equal (tests/test_training_ops.py).
    """
    import hashlib

    import ray
    from ray.data.aggregate import Min, Sum

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    w = words_per_line

    def digest16(line: str) -> bytes:
        return hashlib.blake2b(line.encode('utf-8', 'surrogatepass'),
                               digest_size=16).digest()

    def count_partial(t: pa.Table) -> pa.Table:
        import collections
        cnt = collections.Counter()
        mk = {}
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            for ln, line in enumerate(_doc_lines(txt, w)):
                if not line:
                    continue
                d = digest16(line)
                cnt[d] += 1
                key = '%015d.%09d' % (i, ln)
                if d not in mk or key < mk[d]:
                    mk[d] = key
        ks = list(cnt)
        return pa.table({
            'h1': pa.array([int.from_bytes(d[:8], 'little') - (1 << 63)
                            for d in ks], pa.int64()),
            'h2': pa.array([int.from_bytes(d[8:], 'little') - (1 << 63)
                            for d in ks], pa.int64()),
            'c': pa.array([cnt[d] for d in ks], pa.int64()),
            'mk': pa.array([mk[d] for d in ks], pa.string())})

    counts = (ds.map_batches(count_partial, batch_format='pyarrow')
              .groupby(['h1', 'h2'])
              .aggregate(Sum('c', alias_name='n'),
                         Min('mk', alias_name='fk')))
    dup = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t['n'], 2)),
        batch_format='pyarrow').select_columns(['h1', 'h2', 'fk'])
    dup = dup.materialize()
    n_dup = dup.count()

    def rewrite_broadcast(dref):
        def rewrite(t: pa.Table) -> pa.Table:
            dm = ray.get(dref) if dref is not None else {}
            kept_n, rem_n, clean = [], [], []
            for i, txt in zip(t.column('doc_id').to_pylist(),
                              t.column('text').to_pylist()):
                kept, nrem = [], 0
                for ln, line in enumerate(_doc_lines(txt, w)):
                    if line and dm:
                        d = digest16(line)
                        fk = dm.get((int.from_bytes(d[:8], 'little')
                                     - (1 << 63),
                                     int.from_bytes(d[8:], 'little')
                                     - (1 << 63)))
                        if (fk is not None
                                and '%015d.%09d' % (i, ln) != fk):
                            nrem += 1
                            continue
                    kept.append(line)
                kept_n.append(len(kept))
                rem_n.append(nrem)
                clean.append('\n'.join(kept))
            return pa.table({
                'doc_id': t.column('doc_id'),
                'n_lines_kept': pa.array(kept_n, pa.int64()),
                'n_lines_removed': pa.array(rem_n, pa.int64()),
                'text_clean': pa.array(clean, pa.string())})
        return rewrite

    if n_dup == 0:
        return ds.map_batches(rewrite_broadcast(None),
                              batch_format='pyarrow')

    if not force_join and n_dup <= BROADCAST_KEY_LIMIT:
        dmap = {}
        for b in dup.iter_batches(batch_format='pyarrow'):
            dmap.update(zip(zip(b.column('h1').to_pylist(),
                                b.column('h2').to_pylist()),
                            b.column('fk').to_pylist()))
        return ds.map_batches(rewrite_broadcast(ray.put(dmap)),
                              batch_format='pyarrow')

    # join tier: explode (doc_id, line_no, digest, key) for non-empty
    # lines (no text), inner-join the dup digests, keep the non-first
    # occurrences, fold removed line_nos to one row per doc
    def explode(t: pa.Table) -> pa.Table:
        ids, lns, hs1, hs2, mks = [], [], [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            for ln, line in enumerate(_doc_lines(txt, w)):
                if not line:
                    continue
                d = digest16(line)
                ids.append(i)
                lns.append(ln)
                hs1.append(int.from_bytes(d[:8], 'little') - (1 << 63))
                hs2.append(int.from_bytes(d[8:], 'little') - (1 << 63))
                mks.append('%015d.%09d' % (i, ln))
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'line_no': pa.array(lns, pa.int64()),
                         'h1': pa.array(hs1, pa.int64()),
                         'h2': pa.array(hs2, pa.int64()),
                         'mk': pa.array(mks, pa.string())})

    removed = (ds.map_batches(explode, batch_format='pyarrow')
               .join(_join_safe(dup), 'inner',
                     num_partitions=num_partitions,
                     on=('h1', 'h2'), right_on=('h1', 'h2'))
               .map_batches(
                   lambda t: t.filter(pc.not_equal(t['mk'], t['fk'])),
                   batch_format='pyarrow')
               .select_columns(['doc_id', 'line_no']))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        rem = ','.join(str(int(x))
                       for x in np.sort(g['line_no'].to_numpy()))
        return pd.DataFrame({'doc_id': [g['doc_id'].iloc[0]],
                             'rem': [rem]})

    # _join_safe on the group-apply output: shuffle outputs carry
    # schemaless empty blocks (Ray 2.49 defect) that break Acero joins.
    # materialize() so the executed plan never holds two JoinOperators
    # at once — two concurrent joins' aggregator actors deadlock on
    # narrow clusters (reproduced at num_cpus=4); `per` is one compact
    # row per affected doc, bounded by the dup rate.
    per = _join_safe(_per_key_groups(removed, 'doc_id', per_doc),
                     num_partitions).materialize()
    joined = ds.join(per, 'left_outer', num_partitions=num_partitions,
                     on=('doc_id',), right_on=('doc_id',))

    def rewrite_join(t: pa.Table) -> pa.Table:
        kept_n, rem_n, clean = [], [], []
        for txt, rem in zip(t.column('text').to_pylist(),
                            t.column('rem').to_pylist()):
            lines = _doc_lines(txt, w)
            if not rem:
                kept, nrem = lines, 0
            else:
                rs = {int(x) for x in rem.split(',')}
                kept = [l for j, l in enumerate(lines) if j not in rs]
                nrem = len(rs)
            kept_n.append(len(kept))
            rem_n.append(nrem)
            clean.append('\n'.join(kept))
        return pa.table({
            'doc_id': t.column('doc_id'),
            'n_lines_kept': pa.array(kept_n, pa.int64()),
            'n_lines_removed': pa.array(rem_n, pa.int64()),
            'text_clean': pa.array(clean, pa.string())})

    return joined.map_batches(rewrite_join, batch_format='pyarrow')


def redact_pii(sf_dir: str):
    """PII redaction over the derived web pages (stages/redact.py):
    every email (plain or 'AT/DOT'-obfuscated — the corpus convention
    the reference de-obfuscates, alg.py:29-65) and US-style phone is
    rewritten to a placeholder token, with per-page counts for audit.

    Embarrassingly parallel regex rewrite — no shuffle.  The oracle
    reconstructs the page html by construction (docs_pages.py is a
    pure function of doc_id) and applies the SAME RE2 patterns via
    ``regexp_replace``, so the redaction semantics are checked by a
    true dual implementation, not a replayed constant."""
    from ..stages.redact import RedactPII

    pages, _ = _derived_pages(sf_dir)

    def decode(t: pa.Table) -> pa.Table:
        return pa.table({
            'doc_id': t.column('doc_id'),
            'text': pa.array([h.decode('utf-8') if isinstance(h, bytes)
                              else h for h in
                              t.column('html').to_pylist()], pa.string())})

    return pages.map_batches(decode, batch_format='pyarrow').map_batches(
        RedactPII(out_col='html_redacted'), batch_format='pyarrow')


def sample_stratified(sf_dir: str, k: int = 50):
    """Stratified deterministic sampling: the ``k`` documents with the
    smallest md5 hash per language — a fixed-size per-stratum sample
    that is stable across cluster sizes, restarts and repartitioning
    (same hash contract as :func:`sample_hash`; the per-group-top-k
    combiner shape of :func:`top_orders_per_customer`: each batch
    ships at most k rows per language into the groupby)."""
    import hashlib

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang'])

    def hashed(t: pa.Table) -> pa.Table:
        hk = [int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                             'little')
              for i in t.column('doc_id').to_pylist()]
        # decimal-string sort key: DuckDB md5_number_lower is UBIGINT
        # and Arrow sorts uint64 natively — carried as uint64
        return t.append_column('hkey', pa.array(hk, pa.uint64()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(['hkey', 'doc_id'])
        return df.groupby('lang', as_index=False).head(k)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['hkey', 'doc_id']).head(k)
        g = g.reset_index(drop=True)
        g['rank'] = (g.index + 1).astype('int64')
        return g[['doc_id', 'lang', 'rank']]

    return (ds.map_batches(hashed, batch_format='pyarrow')
            .map_batches(partial, batch_format='pandas')
            .groupby('lang')
            .map_groups(final, batch_format='pandas'))


def tfidf_top_terms(sf_dir: str, k: int = 3, force_join: bool = False):
    """Per-document top-k TF-IDF terms (keyword extraction for corpus
    analysis / clustering features).  Ranking is integer-deterministic
    — tf desc, then rarer term (df asc), then term asc — so the oracle
    compare never rides on float ties; the reported ``score`` is the
    classic tf·ln(N/df), computed with libm ``math.log`` to match
    DuckDB's ``ln`` bit-for-bit before the round(6) snap.

    Tiered on vocabulary size (the repo's broadcast convention,
    stages/dedup.py BROADCAST_KEY_LIMIT):

    - **broadcast tier** (vocab ≤ limit): the (term → df) map is
      ``ray.put`` once; since every document is ONE input row, its
      whole term profile lives in one batch and the per-doc top-k is
      computed inside a single ``map_batches`` pass — zero shuffles
      beyond the small df aggregate.
    - **join tier** (natural-language corpora with unbounded vocab,
      or ``force_join``): (doc, term, tf) rows persist once to parquet
      (the minhash-bands pattern — never pinned in the object store),
      hash-join df on term, then per-doc top-k via a coarse 64-bucket
      group fold (a per-doc map_groups costs ~10 ms per group in
      Ray's group-apply — 94 s at sf0.1).

    Both tiers are test-pinned equal."""
    import math

    from collections import Counter

    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE
    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe

    n_docs = pq.ParquetFile(
        f'{sf_dir}/documents.parquet').metadata.num_rows
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def df_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t.column('text').to_pylist():
            c.update(set(_TOKEN_RE.findall((txt or '').lower())))
        return pa.table({'term': pa.array(list(c.keys()), pa.string()),
                         'dfp': pa.array(list(c.values()), pa.int64())})

    dfds = _join_safe(
        ds.map_batches(df_partial, batch_format='pyarrow')
        .groupby('term').aggregate(Sum('dfp', alias_name='df'))
    ).materialize()

    if not force_join and dfds.count() <= BROADCAST_KEY_LIMIT:
        df_ref = ray.put({r['term']: r['df'] for r in dfds.take_all()})

        def topk_batch(t: pa.Table) -> pa.Table:
            dfm = ray.get(df_ref)
            ids, terms, tfs, dfs, rks, scs = [], [], [], [], [], []
            for i, txt in zip(t.column('doc_id').to_pylist(),
                              t.column('text').to_pylist()):
                c = Counter(_TOKEN_RE.findall((txt or '').lower()))
                top = sorted(c.items(),
                             key=lambda kv: (-kv[1], dfm[kv[0]], kv[0]))[:k]
                for r, (w, tf) in enumerate(top, 1):
                    ids.append(i)
                    terms.append(w)
                    tfs.append(tf)
                    dfs.append(dfm[w])
                    rks.append(r)
                    scs.append(round(tf * math.log(n_docs / dfm[w]), 6))
            return pa.table({
                'doc_id': pa.array(ids, pa.int64()),
                'term': pa.array(terms, pa.string()),
                'tf': pa.array(tfs, pa.int64()),
                'df': pa.array(dfs, pa.int64()),
                'rank': pa.array(rks, pa.int64()),
                'score': pa.array(scs, pa.float64())})

        return ds.map_batches(topk_batch, batch_format='pyarrow')

    # join tier — unbounded vocabulary
    import tempfile

    import ray.data

    def tf_rows(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            for w, c in Counter(
                    _TOKEN_RE.findall((txt or '').lower())).items():
                ids.append(i)
                terms.append(w)
                tfs.append(c)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'term': pa.array(terms, pa.string()),
                         'tf': pa.array(tfs, pa.int64())})

    tf_path = tempfile.mkdtemp(prefix='wsray_tfidf_') + '/tf'
    ds.map_batches(tf_rows, batch_format='pyarrow').write_parquet(tf_path)
    tf = ray.data.read_parquet(tf_path)

    joined = tf.join(dfds, 'inner', num_partitions=8,
                     on=('term',), right_on=('term',))

    def partial_topk(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(['tf', 'df', 'term'],
                          ascending=[False, True, True])
        d = d.groupby('doc_id', as_index=False).head(k)
        d['bkt'] = (d['doc_id'] % 64).astype('int64')
        return d

    def final_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['doc_id', 'tf', 'df', 'term'],
                          ascending=[True, False, True, True],
                          kind='mergesort')
        g['rank'] = (g.groupby('doc_id').cumcount() + 1).astype('int64')
        g = g[g['rank'] <= k].copy()
        g['score'] = [round(t * math.log(n_docs / d), 6)
                      for t, d in zip(g['tf'], g['df'])]
        return g[['doc_id', 'term', 'tf', 'df', 'rank', 'score']]

    return (joined.map_batches(partial_topk, batch_format='pandas')
            .groupby('bkt').map_groups(final_bucket, batch_format='pandas'))


def shuffle_assign(sf_dir: str, shard_size: int = 256):
    """Deterministic global training shuffle: every document gets a
    position in the md5-keyed permutation of the corpus and the
    training shard that position falls in.  Reproducible at any
    parallelism (pure hash order, no RNG state) — the canonical
    "shuffle once, stream shards forever" prep step.

    Distributed rank WITHOUT a global sort: the hash key's top 8 bits
    bucket the permutation into 256 contiguous ranges; pass 1 counts
    per bucket (256-row driver state), the exclusive scan is broadcast,
    and pass 2 ranks inside each bucket independently — the same
    two-pass prefix-sum shape as :func:`pack_sequences`."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, 'documents', ['doc_id'])

    def keyed(t: pa.Table) -> pa.Table:
        hk = [int.from_bytes(
                  hashlib.md5((str(i) + ':shuffle').encode()).digest()[8:],
                  'little')
              for i in t.column('doc_id').to_pylist()]
        hk = np.array(hk, np.uint64)
        return pa.table({'doc_id': t.column('doc_id'),
                         'hkey': pa.array(hk, pa.uint64()),
                         'bucket': pa.array(hk >> np.uint64(56), pa.int64())})

    kd = ds.map_batches(keyed, batch_format='pyarrow').materialize()
    counts = kd.groupby('bucket').aggregate(Count(alias_name='n')).take_all()
    counts.sort(key=lambda r: r['bucket'])
    bids = np.array([r['bucket'] for r in counts], np.int64)
    bn = np.array([r['n'] for r in counts], np.int64)
    bases = np.concatenate([[0], np.cumsum(bn)[:-1]])
    base_ref = ray.put((bids, bases))

    def rank(g: pa.Table) -> pa.Table:
        ids_b, base_b = ray.get(base_ref)
        g = g.sort_by([('hkey', 'ascending'), ('doc_id', 'ascending')])
        b = g.column('bucket')[0].as_py()
        base = base_b[np.searchsorted(ids_b, b)]
        pos = base + np.arange(g.num_rows, dtype=np.int64)
        return pa.table({'doc_id': g.column('doc_id'),
                         'pos': pa.array(pos, pa.int64()),
                         'shard': pa.array(pos // shard_size, pa.int64())})

    return kd.groupby('bucket').map_groups(rank, batch_format='pyarrow')


def inlink_anchors(sf_dir: str):
    """Web-graph inversion: aggregate the anchor texts of every link
    pointing AT each url (the op behind anchor-text corpora and
    link-based ranking features).  Each page's ``<a>`` pairs
    (href → anchor text) come from the real xpath engine
    (reference xpath.py:515-555 link semantics; targets canonicalized
    with the crawl's normalize, download.py:987-1004); the inversion
    is one groupby over (target, anchor) link rows — the shuffle
    carries only the link list, never page html.

    Returns (url, n_inlinks, anchors) with anchors the
    comma-joined sorted distinct anchor texts."""
    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode
    from ..kernels.urls import normalize_url

    pages, _ = _derived_pages(sf_dir)

    def links(t: pa.Table) -> pa.Table:
        tgt, anc = [], []
        for u, h in zip(t.column('url').to_pylist(),
                        t.column('html').to_pylist()):
            page = html_to_unicode(h)
            hrefs = X.search(page, '//a/@href')
            texts = X.search(page, '//a')
            for href, txt in zip(hrefs, texts):
                tgt.append(normalize_url(u, href))
                anc.append(txt)
        return pa.table({'url': pa.array(tgt, pa.string()),
                         'anchor': pa.array(anc, pa.string())})

    # fold per COARSE url-hash bucket (64 groups), not per url — Ray's
    # group-apply costs ~10 ms per group, and target urls are
    # corpus-scale.  Inside a bucket the per-url aggregation is a
    # pandas groupby (vectorized count + a cheap python join for the
    # small distinct-anchor sets).
    def bucketed(t: pa.Table) -> pa.Table:
        import zlib
        bkt = pa.array(
            [zlib.crc32(u.encode()) & 63
             for u in t.column('url').to_pylist()], pa.int64())
        return t.append_column('bkt', bkt)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby('url')['anchor']
               .agg(n_inlinks='size',
                    anchors=lambda s: ','.join(sorted(set(s))))
               .reset_index())
        out['n_inlinks'] = out['n_inlinks'].astype('int64')
        return out[['url', 'n_inlinks', 'anchors']]

    return (pages.map_batches(links, batch_format='pyarrow')
            .map_batches(bucketed, batch_format='pyarrow')
            .groupby('bkt').map_groups(fold_bucket, batch_format='pandas'))


def host_graph(sf_dir: str):
    """Host-level link graph: (src_host, dst_host, n_links) over every
    link the corpus emits — the aggregation behind crawl-frontier host
    budgeting and domain-level graph analysis.  Per-batch Counter
    partials (one row per distinct host pair per batch — the combiner
    pattern), then a groupby-sum; host derivation is the reference's
    registrable-domain kernel (common.py:408-429)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..kernels import xpath as X
    from ..kernels.text import get_domain, html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        c = Counter()
        for u, h in zip(t.column('url').to_pylist(),
                        t.column('html').to_pylist()):
            page = html_to_unicode(h)
            src = get_domain(u)
            for link in X.get_links(page, u):
                c[(src, get_domain(link))] += 1
        ks = list(c.keys())
        return pa.table({
            'src_host': pa.array([a for a, _ in ks], pa.string()),
            'dst_host': pa.array([b for _, b in ks], pa.string()),
            'n': pa.array([c[k] for k in ks], pa.int64())})

    from ..stages.dedup import _join_safe

    # _join_safe: rebuild blocks so the aggregate's schemaless empty
    # partitions (Ray 2.49 defect, stages/dedup.py) don't leak into
    # consumers as schema-mismatch warnings
    return _join_safe(pages.map_batches(pairs, batch_format='pyarrow')
                      .groupby(['src_host', 'dst_host'])
                      .aggregate(Sum('n', alias_name='n_links')))


#: edge lists at or below this size run the PageRank power iteration
#: as a driver fold (python dicts over answer-sized edge rows); above
#: it the Dataset-join tier iterates with per-round O(nodes) state
PAGERANK_DRIVER_EDGE_LIMIT = 4_000_000


def _pagerank_edges(sf_dir: str):
    """(src, dst) url edge list of the derived web, extracted with the
    real link kernels (xpath get_links + crawl canonicalization)."""
    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode
    from ..kernels.urls import normalize_url

    pages, _ = _derived_pages(sf_dir)

    def edges(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u, h in zip(t.column('url').to_pylist(),
                        t.column('html').to_pylist()):
            page = html_to_unicode(h)
            for href in X.search(page, '//a/@href'):
                src.append(u)
                dst.append(normalize_url(u, href))
        return pa.table({'src': pa.array(src, pa.string()),
                         'dst': pa.array(dst, pa.string())})

    return pages.map_batches(edges, batch_format='pyarrow')


def events_asof_match(sf_dir: str):
    """Stream-to-stream as-of join (the attribution shape): for every
    ``click`` event, the latest same-user ``purchase`` at or before
    its timestamp — ties at equal ts count as "before", equal-ts
    purchases resolve to the largest event_id.

    The scale shape is the classic MERGE as-of, not a lateral scan:
    both streams filter at the pruned read, union with a probe tag,
    shuffle once by user through the coarse-bucket group helper, and
    inside each key a single (ts, tag, event_id) sort + forward-fill
    matches every probe in O(n log n).  Unmatched probes emit
    (-1, 0.0) rather than NULLs so the value-hash compare is
    null-free.  The id forward-fill rides pandas' nullable Int64, so
    matched ids stay exact at any magnitude (a float64 ffill would
    silently corrupt ids above 2^53)."""
    ds = _read(sf_dir, 'events',
               ['event_id', 'ts', 'user_id', 'event_type', 'value'])

    def tag(t: pa.Table) -> pa.Table:
        et = t.column('event_type')
        t = t.filter(pc.or_(pc.equal(et, 'click'),
                            pc.equal(et, 'purchase')))
        return pa.table({
            'event_id': t['event_id'], 'ts': t['ts'],
            'user_id': t['user_id'], 'value': t['value'],
            'probe': pc.equal(t['event_type'], 'click')})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'probe', 'event_id'])
        # nullable Int64 keeps the carried id exact at any magnitude
        # (a float64 ffill would corrupt ids above 2^53)
        pid = g['event_id'].astype('Int64').where(~g['probe']).ffill()
        pval = g['value'].where(~g['probe']).ffill()
        m = g['probe'].to_numpy()
        return pd.DataFrame({
            'event_id': g['event_id'].to_numpy()[m],
            'matched_purchase_id':
                pid.fillna(-1).astype('int64').to_numpy()[m],
            'matched_value': pval.fillna(0.0).to_numpy()[m]})

    return _per_key_groups(ds.map_batches(tag, batch_format='pyarrow'),
                           'user_id', merge)


def robots_filter(sf_dir: str):
    """Robots-compliance filter over the crawl's candidate link set
    (reference ``download.py:1022``: ``robots.can_fetch`` per link,
    here vectorized over the distinct extracted links).

    Rules are by-construction so the oracle can reconstruct them in
    SQL: even-numbered hosts disallow ``/q/`` and ``/img/`` for all
    agents, odd hosts allow everything.  The CHECK itself is the real
    stdlib ``urllib.robotparser`` — 8 parsed rule sets broadcast once
    via ``ray.put`` (robots tables are per-host and tiny; at corpus
    scale ship a host→rules dict the same way), evaluated per batch.
    Returns (url, allowed 0/1) for every distinct extracted link."""
    from urllib.parse import urlparse
    from urllib.robotparser import RobotFileParser

    import ray

    eds = _pagerank_edges(sf_dir)
    links = _graph_nodes(
        eds.map_batches(lambda t: pa.table({'src': t['dst'],
                                            'dst': t['dst']}),
                        batch_format='pyarrow'), 8)

    parsers = {}
    for h in range(8):
        rp = RobotFileParser()
        if h % 2 == 0:
            rp.parse(['User-agent: *', 'Disallow: /q/',
                      'Disallow: /img/'])
        else:
            rp.parse(['User-agent: *', 'Disallow:'])
        parsers['src%d.com' % h] = rp
    pref = ray.put(parsers)

    def check(t: pa.Table) -> pa.Table:
        ps = ray.get(pref)
        urls = t.column('url').to_pylist()
        allowed = [int(ps[urlparse(u).netloc].can_fetch('*', u))
                   if urlparse(u).netloc in ps else 1 for u in urls]
        return pa.table({'url': pa.array(urls, pa.string()),
                         'allowed': pa.array(allowed, pa.int64())})

    return links.map_batches(check, batch_format='pyarrow')


def _fold_sorted(vals) -> float:
    """Ascending-sorted LEFT fold — the one float-sum order both
    engines can reproduce bit-for-bit (DuckDB:
    ``list_reduce(list_sort(list(x)), (a,b) -> a+b)``)."""
    s = None
    for v in sorted(vals):
        s = v if s is None else s + v
    return 0.0 if s is None else s


def pagerank(sf_dir: str, iters: int = 3, damping: float = 0.85,
             force_distributed: bool = False, as_dataset: bool = False):
    """Damped PageRank power iteration over the url link graph (the
    crawl-graph ranking signal; dangling mass is not redistributed —
    sinks leak, the documented simple variant).  Deterministic at any
    parallelism AND bit-identical to the SQL oracle: every per-node
    contribution sum is an ascending-sorted left fold
    (:func:`_fold_sorted`), so no float result rides on reduction
    order.

    Tiered like stages/clusters.py: at or below
    ``PAGERANK_DRIVER_EDGE_LIMIT`` edges the iteration folds on the
    driver (edge lists are answer-sized); above it each round is an
    edges ⋈ ranks hash join + a coarse-64-bucket groupby fold
    (:func:`_bucketed_sorted_fold` — never per-url Ray groups) + a
    left join back onto the node list — per-round state is one double
    per node, never the corpus."""
    import pyarrow.parquet as pq

    # tier on page count from the parquet footer (free) instead of an
    # edge count() — counting would execute the whole extraction twice.
    # Out-degree is bounded (≤ 6 links/page by construction; web pages
    # are bounded by max_links in the crawl), so pages bound edges.
    n_pages = pq.ParquetFile(
        f'{sf_dir}/documents.parquet').metadata.num_rows
    eds = _pagerank_edges(sf_dir)
    if as_dataset:
        # corpus-scale surface: always the distributed tier, returned
        # as a Dataset — no O(nodes) list ever forms on the driver;
        # consume with write_parquet/iter_batches
        return _pagerank_dataset(eds, iters, damping)
    if (n_pages * 6 <= PAGERANK_DRIVER_EDGE_LIMIT
            and not force_distributed):
        rows = eds.take_all()
        src = [r['src'] for r in rows]
        dst = [r['dst'] for r in rows]
        return _pagerank_fold(src, dst, iters, damping)
    return _pagerank_dataset(eds, iters, damping)


def _pagerank_fold(src, dst, iters: int, damping: float) -> pa.Table:
    nodes = sorted(set(src) | set(dst))
    n = float(len(nodes))
    outdeg: dict = {}
    for u in src:
        outdeg[u] = outdeg.get(u, 0) + 1
    inlinks: dict = {}
    for u, v in zip(src, dst):
        inlinks.setdefault(v, []).append(u)
    base = (1.0 - damping) / n
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        r = {u: base + damping * _fold_sorted(
                 [r[p] / outdeg[p] for p in inlinks.get(u, ())])
             for u in nodes}
    vals = np.array([r[u] for u in nodes], np.float64)
    return pa.table({
        'url': pa.array(nodes, pa.string()),
        'pagerank': pa.array(np.rint(vals * 1e6) / 1e6 + 0.0,
                             pa.float64())})


def _graph_nodes(eds, num_partitions: int):
    """Distinct node list of an (src, dst) edge Dataset — a hash
    aggregate (vectorized per block + combine), NOT a per-url
    group-apply (Ray group-apply costs ~10 ms/group; nodes are
    corpus-scale)."""
    from ray.data.aggregate import Count

    from ..stages.dedup import _join_safe

    def node_rows(t: pa.Table) -> pa.Table:
        return pa.table({'url': pa.chunked_array(
            t.column('src').cast(pa.string()).chunks
            + t.column('dst').cast(pa.string()).chunks)})

    return _join_safe(
        eds.map_batches(node_rows, batch_format='pyarrow')
        .groupby('url').aggregate(Count(alias_name='_n'))
        .map_batches(lambda t: t.select(['url']),
                     batch_format='pyarrow'),
        num_partitions).materialize()


def _bucketed_sorted_fold(contribs, num_partitions: int):
    """Per-url ascending-sorted left fold of a (url, c) Dataset via a
    COARSE 64-bucket group-apply (the tfidf/inlink_anchors pattern —
    per-url Ray groups are banned in hot paths): inside each bucket a
    pandas groupby runs the exact :func:`_fold_sorted` per url, so
    bit-exactness is preserved while Ray sees only 64 groups."""
    import zlib

    from ..stages.dedup import _join_safe

    def bucketed(t: pa.Table) -> pa.Table:
        bkt = pa.array([zlib.crc32(u.encode()) & 63
                        for u in t.column('url').to_pylist()],
                       pa.int64())
        return t.append_column('bkt', bkt)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        urls, sums = [], []
        for u, vals in g.groupby('url')['c']:
            urls.append(u)
            sums.append(_fold_sorted(vals.tolist()))
        return pd.DataFrame({'url': urls, 's': sums})

    return _join_safe(contribs.map_batches(bucketed,
                                           batch_format='pyarrow')
                      .groupby('bkt').map_groups(fold_bucket,
                                                 batch_format='pandas'),
                      num_partitions)


def _pagerank_dataset(eds, iters: int, damping: float,
                      num_partitions: int = 8):
    """Distributed tier — BSP shard actors (``stages.graph_bsp``):
    edges load once into P crc-bucket-aligned shards, each round is
    two actor RPC waves exchanging only float arrays (replaces the
    round-4 per-round edges ⋈ ranks / nodes ⋈ folded Dataset joins,
    which paid ~1 s of fixed join latency per launch — VERDICT r4
    item 4).  Identical per-node contribution values, folded in the
    identical ascending order, so the fold-tier/oracle pin holds."""
    from ..stages.graph_bsp import pagerank_bsp

    return pagerank_bsp(eds, iters, damping, num_shards=num_partitions)


def hits(sf_dir: str, iters: int = 3, force_distributed: bool = False,
         as_dataset: bool = False):
    """HITS hubs-and-authorities over the url link graph (Kleinberg's
    companion signal to :func:`pagerank`; public algorithm, no
    reference counterpart — the crawl-graph ranking family's second
    member).

    Runs ``iters`` *unnormalized* power rounds (auth = sum of inlink
    hub scores, hub = sum of outlink auth scores) and sum-normalizes
    each vector ONCE at output time.  Per-round normalization would
    cost a global O(nodes) reduction per iteration; deferring it is
    algebraically identical (each round is linear in the previous
    vector, so a single final scale factor absorbs every per-round
    one) and keeps the distributed tier's per-round work to two hash
    joins + one grouped fold.  Bit-exact vs the SQL oracle at any
    parallelism: per-node sums and both final normalizers are
    ascending-sorted left folds (:func:`_fold_sorted`).

    Tiered exactly like :func:`pagerank` (page count from the parquet
    footer picks the tier; the final normalizers and the returned
    table are O(nodes) — answer-sized for this op in both tiers)."""
    import pyarrow.parquet as pq

    n_pages = pq.ParquetFile(
        f'{sf_dir}/documents.parquet').metadata.num_rows
    eds = _pagerank_edges(sf_dir)
    if as_dataset:
        # corpus-scale surface: distributed tier returning a Dataset —
        # the two normalizers reduce through a 64-bucket two-level
        # sorted fold (64 partial doubles to the driver, never the
        # O(nodes) vector); see _hits_dataset
        return _hits_dataset(eds, iters, as_dataset=True)
    if (n_pages * 6 <= PAGERANK_DRIVER_EDGE_LIMIT
            and not force_distributed):
        rows = eds.take_all()
        return _hits_fold([r['src'] for r in rows],
                          [r['dst'] for r in rows], iters)
    return _hits_dataset(eds, iters)


def _hits_snap(nodes_list, hub, auth) -> pa.Table:
    nh = _fold_sorted(hub.values())
    na = _fold_sorted(auth.values())
    hv = np.array([(hub[u] / nh) if nh else 0.0 for u in nodes_list],
                  np.float64)
    av = np.array([(auth[u] / na) if na else 0.0 for u in nodes_list],
                  np.float64)
    return pa.table({
        'url': pa.array(nodes_list, pa.string()),
        'hub': pa.array(np.rint(hv * 1e6) / 1e6 + 0.0, pa.float64()),
        'auth': pa.array(np.rint(av * 1e6) / 1e6 + 0.0, pa.float64())})


def _hits_fold(src, dst, iters: int) -> pa.Table:
    nodes = sorted(set(src) | set(dst))
    inl: dict = {}
    outl: dict = {}
    for u, v in zip(src, dst):
        inl.setdefault(v, []).append(u)
        outl.setdefault(u, []).append(v)
    hub = {u: 1.0 for u in nodes}
    auth = {u: 0.0 for u in nodes}
    for _ in range(iters):
        auth = {v: _fold_sorted([hub[u] for u in inl.get(v, ())])
                for v in nodes}
        hub = {u: _fold_sorted([auth[v] for v in outl.get(u, ())])
               for u in nodes}
    return _hits_snap(nodes, hub, auth)


def _bucket_fold_scalar(scores, num_partitions: int = 8) -> float:
    """Global sum of a (url, v) Dataset's ``v`` as a two-level
    deterministic fold: per coarse url-crc32 bucket an ascending
    sorted left fold (:func:`_fold_sorted`), then a sorted fold of
    the <= 64 bucket partials on the driver.  Layout-independent
    (buckets key on the url hash, never block boundaries) and O(64)
    driver state — the Dataset-surface replacement for pulling the
    O(nodes) vector to fold flat.  Differs from the flat fold only in
    sub-ulp association order; outputs rounded at 1e-6 are pinned
    equal in tests."""
    import zlib

    def bucketed(t: pa.Table) -> pa.Table:
        bkt = pa.array([zlib.crc32(u.encode()) & 63
                        for u in t.column('url').to_pylist()],
                       pa.int64())
        return pa.table({'bkt': bkt, 'v': t['v']})

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({'s': [_fold_sorted(g['v'].tolist())]})

    partials = (scores.map_batches(bucketed, batch_format='pyarrow')
                .groupby('bkt').map_groups(fold_bucket,
                                           batch_format='pandas')
                .take_all())
    return _fold_sorted([r['s'] for r in partials])


def _hits_dataset(eds, iters: int, num_partitions: int = 8,
                  as_dataset: bool = False):
    """Distributed tier — BSP shard actors (``stages.graph_bsp``):
    edges load once, each half-round (auth pass, hub pass) is one
    actor RPC wave exchanging float arrays (replaces the round-4
    4-joins-per-round Dataset pipeline — VERDICT r4 item 4).  The
    normalizers reproduce ``_bucket_fold_scalar``'s association order
    exactly (crc-bucket-whole sharding), so outputs stay pinned to
    the fold tier and the SQL oracle."""
    from ..stages.graph_bsp import hits_bsp

    if as_dataset:
        return hits_bsp(eds, iters, num_shards=num_partitions)
    # table tier: pull RAW scores (answer-sized) and normalize with
    # the flat _hits_snap sorted fold — the exact association order of
    # the driver fold tier and the SQL oracle (the bucketed normalizer
    # is reserved for the Dataset surface, where it was the pinned
    # round-4 shape)
    raw = hits_bsp(eds, iters, num_shards=num_partitions,
                   normalized=False)
    rows = raw.take_all()
    nodes_list = sorted(r['url'] for r in rows)
    return _hits_snap(nodes_list,
                      {r['url']: r['hub'] for r in rows},
                      {r['url']: r['auth'] for r in rows})


# ---------------------------------------------------------------------------
# round-4: Dataset-returning graph-ranker surface + driver-visible
# quality gates for the approximate family.
#
# The *_ds queries exercise the corpus-scale return path (distributed
# tier, result stays a Dataset / partitioned parquet — no O(nodes)
# driver list); their values are pinned equal to the table-returning
# counterparts, so they share those oracles.
#
# The quality-gate queries MEASURE an approximate structure (IVF
# index, HLL / Misra-Gries / KLL sketch) against the exact computation
# — both sides computed distributed — and emit integer pass-evidence
# the SQL oracle states exactly, so a quality regression flips the
# driver's hash compare to red instead of hiding in repo-only tests.

def pagerank_ds(sf_dir: str):
    """:func:`pagerank` through the Dataset-returning corpus-scale
    surface (``as_dataset=True`` → always the distributed tier; the
    per-url rank table never forms a driver list)."""
    return pagerank(sf_dir, as_dataset=True)


def hits_ds(sf_dir: str):
    """:func:`hits` through the Dataset-returning corpus-scale surface
    (distributed tier + two-level-fold normalizers; see
    :func:`_bucket_fold_scalar`)."""
    return hits(sf_dir, as_dataset=True)


def inlink_anchors_ds(sf_dir: str, out_dir: str | None = None):
    """:func:`inlink_anchors` consumed the corpus-scale way: the
    result Dataset writes PARTITIONED parquet (one directory of files,
    resumable/skippable per shard — never one giant file or a driver
    table) and the return value is the read-back Dataset.  Pinned
    equal to the direct Dataset in tests; shares its oracle."""
    import tempfile

    import ray

    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix='inlink_anchors_',
                                   dir='/tmp')
    inlink_anchors(sf_dir).write_parquet(out_dir)
    return ray.data.read_parquet(out_dir)


def knn_ivf_recall(sf_dir: str, k: int = 10, n_queries: int = 8,
                   n_clusters: int = 16, nprobe: int = 6):
    """Driver-visible ANN quality gate: recall@k of the IVF index at
    its DEFAULT sub-exhaustive ``nprobe`` (the BASELINE.md scale
    setting) against the exact brute-force top-k, per query.  Emits
    (query_id, recall_ok) with recall_ok = 1 iff recall@k >= 0.9 (the
    measured band at default nprobe is 0.9-1.0 per query — BASELINE
    documents 1.00 averaged at sf0.1); the oracle states recall_ok =
    1 for every query, so an index regression (centroid training,
    bucketing, probe merge) goes driver-red."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_brute, knn_ivf

    qids = list(range(n_queries))
    q = pq.read_table(f'{sf_dir}/embeddings.parquet',
                      filters=[('vec_id', '<', n_queries)],
                      columns=['vec_id', 'embedding'])
    order = pc.sort_indices(q.column('vec_id'))
    Q = np.array(q.take(order).column('embedding').to_pylist(),
                 dtype=np.float64)

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    exact = knn_brute(ds, Q, k=k, query_ids=qids)
    approx = knn_ivf(ds, Q, k=k, n_clusters=n_clusters, nprobe=nprobe,
                     query_ids=qids)

    def ids_by_q(t: pa.Table) -> dict:
        out: dict = {}
        for qi, vid in zip(t.column('query_id').to_pylist(),
                           t.column('vec_id').to_pylist()):
            out.setdefault(qi, set()).add(vid)
        return out

    ex, ap = ids_by_q(exact), ids_by_q(approx)
    hits_n = [len(ex.get(qi, set()) & ap.get(qi, set())) for qi in qids]
    return pa.table({
        'query_id': pa.array(qids, pa.int64()),
        'recall_ok': pa.array([int(h >= 0.9 * k) for h in hits_n],
                              pa.int64())})


def hll_user_counts(sf_dir: str, p: int = 14, rel_bound: float = 0.03):
    """Driver-visible HLL quality gate: per event_type, the
    HyperLogLog distinct-user estimate vs the exact COUNT(DISTINCT
    user_id) — the estimate must land within ``rel_bound`` (3% =
    3.7 standard errors at p=14).  Both sides run distributed: the
    sketch side folds each block to one 16 KB register row per
    event_type (shuffle carries sketches, never user ids); the exact
    side is the two-phase distinct aggregate.  Emits
    (event_type, n_exact, within_bound=1)."""
    from ray.data.aggregate import Count

    from ..stages.sketch import HyperLogLog

    ds = _read(sf_dir, 'events', ['event_type', 'user_id'])

    def fold(t: pa.Table) -> pa.Table:
        by_type: dict = {}
        for et, uid in zip(t.column('event_type').to_pylist(),
                           t.column('user_id').to_pylist()):
            by_type.setdefault(et, []).append(str(uid))
        hs = {et: HyperLogLog(p) for et in by_type}
        for et, uids in by_type.items():
            hs[et].add_strings(uids)
        return pa.table({
            'event_type': pa.array(list(hs), pa.string()),
            'regs': pa.array([h.to_bytes() for h in hs.values()],
                             pa.binary())})

    acc: dict = {}
    for b in ds.map_batches(fold, batch_format='pyarrow').iter_batches(
            batch_format='pyarrow'):
        for et, blob in zip(b.column('event_type').to_pylist(),
                            b.column('regs').to_pylist()):
            h = HyperLogLog.from_bytes(blob, p)
            acc[et] = h if et not in acc else acc[et].merge(h)

    # exact distinct: per-block distinct pairs → pair aggregate →
    # per-type count (the standard two-phase COUNT DISTINCT shape)
    def pairs(t: pa.Table) -> pa.Table:
        seen = {(et, u) for et, u in
                zip(t.column('event_type').to_pylist(),
                    t.column('user_id').to_pylist())}
        return pa.table({
            'event_type': pa.array([a for a, _ in seen], pa.string()),
            'user_id': pa.array([b_ for _, b_ in seen], pa.int64())})

    exact_rows = (ds.map_batches(pairs, batch_format='pyarrow')
                  .groupby(['event_type', 'user_id'])
                  .aggregate(Count(alias_name='_n'))
                  .map_batches(lambda t: t.select(['event_type']),
                               batch_format='pyarrow')
                  .groupby('event_type')
                  .aggregate(Count(alias_name='n_exact'))).take_all()
    exact = {r['event_type']: r['n_exact'] for r in exact_rows}

    ets = sorted(exact)
    ok = [int(abs(acc[et].estimate() - exact[et])
              <= rel_bound * exact[et]) for et in ets]
    return pa.table({
        'event_type': pa.array(ets, pa.string()),
        'n_exact': pa.array([exact[et] for et in ets], pa.int64()),
        'within_bound': pa.array(ok, pa.int64())})


def heavy_hitter_tokens(sf_dir: str, denom: int = 50,
                        capacity: int = 2048,
                        batch_size: int | None = None):
    """Driver-visible Misra-Gries quality gate: exact corpus heavy
    hitters (word tokens with count*denom > total tokens) recovered
    through the sketch's candidate-then-verify shape.  Pass 1 folds
    each block to a ``capacity``-bounded MG summary (shuffled state is
    O(blocks x capacity) — never the vocabulary); the merged summary
    is GUARANTEED to contain every token above total/(capacity+1), a
    superset of the total/denom hitters.  Pass 2 exact-counts only the
    broadcast candidate set and keeps the true hitters — so the
    result equals the exact SQL HAVING clause, and a sketch bug that
    drops a guaranteed candidate goes driver-red.  Emits (token, n)."""
    import collections

    import ray

    from ..stages.sketch import MisraGries
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def fold(t: pa.Table) -> pa.Table:
        import uuid

        c: collections.Counter = collections.Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        n_toks = sum(c.values())
        mg = MisraGries(capacity)
        mg.add_counter(c)
        toks = list(mg.counts)
        # self-describing summary: a sid groups this summary's rows
        # (Ray coalesces map outputs, so one block can carry several
        # summaries) and a tok=None header row ALWAYS rides along —
        # a summary whose counts all decremented away (> capacity
        # distinct equal-count tokens) must still contribute its
        # n_block to the corpus total or the HAVING cutoff drops
        sid = uuid.uuid4().hex
        n = len(toks) + 1
        return pa.table({
            'sid': pa.array([sid] * n, pa.string()),
            'tok': pa.array(toks + [None], pa.string()),
            'c': pa.array([mg.counts[k] for k in toks] + [0], pa.int64()),
            'err': pa.array([mg.err] * n, pa.int64()),
            'n_block': pa.array([n_toks] * n, pa.int64())})

    fold_kw = {} if batch_size is None else {'batch_size': batch_size}
    acc = MisraGries(capacity)
    total = 0
    for ref in ds.map_batches(fold, batch_format='pyarrow',
                              **fold_kw).to_arrow_refs():
        b = ray.get(ref)
        summaries: dict = {}
        for sid, tok, cc, err, nb in zip(
                b.column('sid').to_pylist(), b.column('tok').to_pylist(),
                b.column('c').to_pylist(), b.column('err').to_pylist(),
                b.column('n_block').to_pylist()):
            e = summaries.setdefault(sid, {'counts': {}, 'err': err,
                                           'n_block': nb})
            if tok is not None:
                e['counts'][tok] = cc
        for e in summaries.values():
            part = MisraGries(capacity)
            part.counts = e['counts']
            part.err = e['err']
            total += e['n_block']
            acc.merge(part)

    cands = sorted(acc.counts)
    cref = ray.put(set(cands))

    def exact_count(t: pa.Table) -> pa.Table:
        cs = ray.get(cref)
        c: collections.Counter = collections.Counter()
        for txt in t.column('text').to_pylist():
            c.update(w for w in _TOKEN_RE.findall((txt or '').lower())
                     if w in cs)
        ks = list(c)
        return pa.table({'tok': pa.array(ks, pa.string()),
                         'c': pa.array([c[k] for k in ks], pa.int64())})

    from ray.data.aggregate import Sum
    counted = (ds.map_batches(exact_count, batch_format='pyarrow')
               .groupby('tok').aggregate(Sum('c', alias_name='n'))
               ).take_all()
    out = sorted((r['tok'], r['n']) for r in counted
                 if r['n'] * denom > total)
    return pa.table({
        'token': pa.array([t_ for t_, _ in out], pa.string()),
        'n': pa.array([n for _, n in out], pa.int64())})


def kll_token_quantiles(sf_dir: str, k: int = 200,
                        eps: float = 0.05):
    """Driver-visible KLL quality gate: the sketch's quantile
    estimates of per-document token counts, rank-checked against the
    exact distribution.  The sketch side folds each block to a bounded
    KLL summary; the exact side is the same distributed value
    histogram :func:`token_quantiles` uses (O(distinct lengths) rows).
    For each q the estimate's TRUE rank interval
    [count(<est)/n, count(<=est)/n] must overlap [q-eps, q+eps];
    emits (q_label, within_bound=1) per quantile."""
    from ray.data.aggregate import Count

    from ..stages.sketch import KLLQuantiles
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({'n_tokens': pa.array(
            [len(_TOKEN_RE.findall((s or '').lower()))
             for s in t.column('text').to_pylist()], pa.int64())})

    toks = ds.map_batches(tok, batch_format='pyarrow').materialize()

    def fold(t: pa.Table) -> pa.Table:
        h = KLLQuantiles(k)
        h.add(t.column('n_tokens').to_numpy(zero_copy_only=False))
        return h.to_table()

    import ray

    acc = KLLQuantiles(k)
    # block refs (no re-batch splits) + sid grouping (a block may
    # hold several coalesced summaries): every summary merges whole
    for ref in toks.map_batches(
            fold, batch_format='pyarrow').to_arrow_refs():
        for part in KLLQuantiles.all_from_table(ray.get(ref), k):
            acc.merge(part)

    hist = (toks.groupby('n_tokens')
            .aggregate(Count(alias_name='cnt'))).take_all()
    vals = np.array(sorted(r['n_tokens'] for r in hist), np.float64)
    cnts = {r['n_tokens']: r['cnt'] for r in hist}
    cum = np.cumsum([cnts[int(v)] for v in vals])
    n = int(cum[-1])

    qs = [(0.1, 'p10'), (0.25, 'p25'), (0.5, 'p50'),
          (0.75, 'p75'), (0.9, 'p90')]
    labels, ok = [], []
    for q, label in qs:
        est = acc.quantile(q)
        below = int(cum[np.searchsorted(vals, est, side='left') - 1]
                    ) if est > vals[0] else 0
        at_or_below = int(cum[np.searchsorted(vals, est, side='right')
                              - 1]) if est >= vals[0] else 0
        lo, hi = below / n, at_or_below / n
        labels.append(label)
        ok.append(int(lo - eps <= q <= hi + eps))
    return pa.table({'q_label': pa.array(labels, pa.string()),
                     'within_bound': pa.array(ok, pa.int64())})


def perplexity_buckets(sf_dir: str, tiles: int = 3,
                       force_join: bool = False,
                       num_partitions: int = 8):
    """CCNet-style perplexity bucketing (Wenzek et al., 2019,
    arXiv:1911.00359 §4.3): score every document's cross-entropy under
    its LANGUAGE's unigram LM, then split each language into
    equal-count head / middle / tail tiers (head = lowest perplexity)
    — the canonical corpus-curation step between langid and the
    quality filters.  Returns (doc_id, lang, ce, tile, bucket) with
    tile matching SQL ``NTILE(tiles) OVER (PARTITION BY lang ORDER BY
    ce, doc_id)`` exactly (ties broken by doc_id, so no float
    threshold can flip a boundary document).

    Scale shape: pass 1 builds per-(lang, token) counts (Counter
    partials → groupby-sum) and broadcasts the log-prob table at or
    below ``BIGRAM_BROADCAST_LIMIT`` entries; above it (or under
    ``force_join``) the hash-join tier explodes (doc_id, lang, w)
    rows through a Dataset join on (lang, w) — the
    :func:`_unigram_logprob_join` shape, tiers test-pinned equal.
    The NTILE rank is the two-pass prefix-sum shape of
    :func:`shuffle_assign`: quantized-ce coarse buckets (64/nat,
    ≤4096 per lang) are counted — bounded driver state — per-bucket
    bases broadcast, and each coarse bucket ranks independently, so
    exact tile ids need no global sort.  A pathologically dense ce
    window concentrates one coarse bucket; the quantization bounds
    that group to the docs inside one 1/64-nat band per language."""
    import collections
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'text'])

    def vocab_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for lang, txt in zip(t.column('lang').to_pylist(),
                             t.column('text').to_pylist()):
            for w in _TOKEN_RE.findall((txt or '').lower()):
                c[(lang, w)] += 1
        keys = list(c.keys())
        return pa.table({'lang': pa.array([k[0] for k in keys], pa.string()),
                         'w': pa.array([k[1] for k in keys], pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(vocab_partial, batch_format='pyarrow')
              .groupby(['lang', 'w']).aggregate(Sum('c', alias_name='c'))
              .materialize())

    if force_join or counts.count() > BIGRAM_BROADCAST_LIMIT:
        scored = _perplexity_ce_join(sf_dir, counts, num_partitions)
    else:
        vocab: dict = {}
        lang_tot: collections.Counter = collections.Counter()
        for b in counts.iter_batches(batch_format='pyarrow'):
            for lang, w, c in zip(b.column('lang').to_pylist(),
                                  b.column('w').to_pylist(),
                                  b.column('c').to_pylist()):
                vocab[(lang, w)] = c
                lang_tot[lang] += c
        logp = {k: math.log(c / lang_tot[k[0]]) for k, c in vocab.items()}
        lref = ray.put(logp)

        def score(t: pa.Table) -> pa.Table:
            lp = ray.get(lref)
            ces = []
            for lang, txt in zip(t.column('lang').to_pylist(),
                                 t.column('text').to_pylist()):
                toks = _TOKEN_RE.findall((txt or '').lower())
                ces.append(-sum(lp[(lang, w)] for w in toks) / len(toks)
                           if toks else 0.0)
            return pa.table({'doc_id': t['doc_id'], 'lang': t['lang'],
                             'ce': pa.array(ces, pa.float64())})

        scored = ds.map_batches(score, batch_format='pyarrow')

    scored = scored.map_batches(lambda t: _snap_round(t, 'ce', 6),
                                batch_format='pyarrow')
    return _ntile_by_lang(scored, tiles)


def _perplexity_ce_join(sf_dir: str, counts, num_partitions: int = 8):
    """Hash-join tier of :func:`perplexity_buckets`'s scoring pass:
    per-(lang, token) counts stay a Dataset; exploded (doc_id, lang, w)
    rows join on (lang, w); the per-doc mean is a hash aggregate.
    Language TOTALS are O(#languages) — bounded — and broadcast."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _TOKEN_RE, _join_safe

    counts = _join_safe(counts, num_partitions).materialize()
    ltot = {r['lang']: int(r['sum(c)'])
            for r in counts.groupby('lang').aggregate(Sum('c')).take_all()}
    tot_ref = ray.put(ltot)

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'text'])

    def tok_rows(t: pa.Table) -> pa.Table:
        ids, ls, ws = [], [], []
        for i, lang, txt in zip(t.column('doc_id').to_pylist(),
                                t.column('lang').to_pylist(),
                                t.column('text').to_pylist()):
            for w in _TOKEN_RE.findall((txt or '').lower()):
                ids.append(i)
                ls.append(lang)
                ws.append(w)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'lang': pa.array(ls, pa.string()),
                         'w': pa.array(ws, pa.string())})

    joined = (ds.map_batches(tok_rows, batch_format='pyarrow')
              .join(counts, 'inner', num_partitions=num_partitions,
                    on=('lang', 'w'), right_on=('lang', 'w')))

    def term(t: pa.Table) -> pa.Table:
        tot = ray.get(tot_ref)
        c = t.column('c').to_numpy(zero_copy_only=False).astype(np.float64)
        tots = np.array([tot[lang] for lang in t.column('lang').to_pylist()],
                        np.float64)
        return pa.table({'doc_id': t['doc_id'],
                         'term': pa.array(np.log(c / tots), pa.float64())})

    per_doc = _join_safe(
        joined.map_batches(term, batch_format='pyarrow')
        .groupby('doc_id').aggregate(Sum('term', alias_name='s'),
                                     Count(alias_name='n')),
        num_partitions)

    docs = _read(sf_dir, 'documents', ['doc_id', 'lang'])
    out = docs.join(per_doc, 'left_outer', num_partitions=num_partitions,
                    on=('doc_id',), right_on=('doc_id',))

    def finish(t: pa.Table) -> pa.Table:
        s = [x or 0.0 for x in t.column('s').to_pylist()]
        n = [int(x) if x is not None else 0
             for x in t.column('n').to_pylist()]
        ce = [(-a / b) if b else 0.0 for a, b in zip(s, n)]
        return pa.table({'doc_id': t['doc_id'], 'lang': t['lang'],
                         'ce': pa.array(ce, pa.float64())})

    return out.map_batches(finish, batch_format='pyarrow')


def _ntile_by_lang(scored, tiles: int):
    """Exact per-language NTILE over (ce, doc_id) without a global
    sort: quantized-ce coarse buckets → per-(lang, bucket) counts →
    driver prefix sums (bounded: #langs × ≤4096 rows) → each bucket
    ranks its own rows (the :func:`shuffle_assign` two-pass shape).
    Tile sizes follow SQL NTILE: the first n%tiles tiles get
    ceil(n/tiles) rows."""
    import ray
    from ray.data.aggregate import Count

    def qb(t: pa.Table) -> pa.Table:
        ce = t.column('ce').to_numpy(zero_copy_only=False)
        b = np.minimum((ce * 64.0).astype(np.int64), 4095)
        return t.append_column('qb', pa.array(b, pa.int64()))

    kd = scored.map_batches(qb, batch_format='pyarrow').materialize()
    counts = (kd.groupby(['lang', 'qb'])
              .aggregate(Count(alias_name='n'))).take_all()
    by_lang: dict = {}
    for r in counts:
        by_lang.setdefault(r['lang'], []).append((r['qb'], r['n']))
    bases, totals = {}, {}
    for lang, rows in by_lang.items():
        rows.sort()
        run = 0
        for b, n in rows:
            bases[(lang, b)] = run
            run += n
        totals[lang] = run
    info_ref = ray.put((bases, totals, tiles))

    def rank(g: pa.Table) -> pa.Table:
        bases_b, totals_b, t_ = ray.get(info_ref)
        g = g.sort_by([('ce', 'ascending'), ('doc_id', 'ascending')])
        lang = g.column('lang')[0].as_py()
        base = bases_b[(lang, g.column('qb')[0].as_py())]
        n = totals_b[lang]
        k = base + np.arange(g.num_rows, dtype=np.int64)
        q, r = divmod(n, t_)
        # NTILE: ranks below r*(q+1) fall in the first r (fat) tiles
        tile = np.where(k < r * (q + 1), k // (q + 1),
                        r + (k - r * (q + 1)) // max(q, 1)) + 1
        labels = (['head', 'middle', 'tail'] if t_ == 3
                  else ['q%d' % (i + 1) for i in range(t_)])
        return pa.table({
            'doc_id': g.column('doc_id'),
            'lang': g.column('lang'),
            'ce': g.column('ce'),
            'tile': pa.array(tile, pa.int64()),
            'bucket': pa.array([labels[int(x) - 1] for x in tile],
                               pa.string())})

    return kd.groupby(['lang', 'qb']).map_groups(rank,
                                                 batch_format='pyarrow')


def source_quality_filter(sf_dir: str, force_join: bool = False,
                          num_partitions: int = 8):
    """Domain-level quality filter (the RefinedWeb / C4 pattern of
    dropping whole hosts rather than single pages): keep every
    document whose SOURCE's mean token count is strictly above the
    corpus mean — low-mean sources (template farms, stub pages) drop
    wholesale.  The threshold compare is exact integer
    cross-multiplication (sum_s·n_total > sum_total·n_s), so no float
    rounding can flip a boundary source.

    Scale shape: one tokenizing pass reduces the corpus to per-source
    (sum, count) aggregates — O(#sources) rows.  At or below
    ``BROADCAST_KEY_LIMIT`` sources the keep-map folds on the driver
    and broadcasts via ``ray.put``; above it (web scale: 1e8+ hosts)
    the aggregate stays a Dataset, the exact compare maps per
    aggregate row (Python-int products — no int64 overflow at
    1e14·1e10), and membership is a hash join (tiers test-pinned
    equal).  Document text never enters a shuffle."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import _TOKEN_RE, BROADCAST_KEY_LIMIT

    ds = _read(sf_dir, 'documents', ['doc_id', 'source', 'text'])

    def tok(t: pa.Table) -> pa.Table:
        return pa.table({
            'doc_id': t['doc_id'], 'source': t['source'],
            'n': pa.array([len(_TOKEN_RE.findall((s or '').lower()))
                           for s in t.column('text').to_pylist()],
                          pa.int64())})

    toks = ds.map_batches(tok, batch_format='pyarrow').materialize()
    agg = (toks.groupby('source')
           .aggregate(Sum('n', alias_name='sn'), Count(alias_name='cnt'))
           .materialize())

    if force_join or agg.count() > BROADCAST_KEY_LIMIT:
        out = _source_quality_filter_join(toks, agg, num_partitions)
    else:
        rows = agg.take_all()
        tsn = sum(int(r['sn']) for r in rows)
        tcnt = sum(int(r['cnt']) for r in rows)
        keep = {r['source']: int(r['sn']) / int(r['cnt'])
                for r in rows
                if int(r['sn']) * tcnt > tsn * int(r['cnt'])}
        kref = ray.put(keep)

        def filt(t: pa.Table) -> pa.Table:
            k = ray.get(kref)
            mask = [s in k for s in t.column('source').to_pylist()]
            t = t.filter(pa.array(mask, pa.bool_()))
            return pa.table({
                'doc_id': t['doc_id'], 'source': t['source'],
                'src_mean_tokens': pa.array(
                    [k[s] for s in t.column('source').to_pylist()],
                    pa.float64())})

        out = toks.map_batches(filt, batch_format='pyarrow')

    return out.map_batches(lambda t: _snap_round(t, 'src_mean_tokens', 6),
                           batch_format='pyarrow')


def _source_quality_filter_join(toks, agg, num_partitions: int = 8):
    """Join tier of :func:`source_quality_filter`: the per-source
    aggregate stays a Dataset; the exact integer compare runs inside
    ``map_batches`` over aggregate rows (two broadcast scalars), and
    kept sources hash-join back onto the (doc_id, source) rows."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _join_safe

    tot = agg.aggregate(Sum('sn'), Sum('cnt'))
    tsn, tcnt = int(tot['sum(sn)']), int(tot['sum(cnt)'])

    def keep_rows(t: pa.Table) -> pa.Table:
        sn = [int(x) for x in t.column('sn').to_pylist()]
        cnt = [int(x) for x in t.column('cnt').to_pylist()]
        mask = [a * tcnt > tsn * b for a, b in zip(sn, cnt)]
        t = t.filter(pa.array(mask, pa.bool_()))
        mean = [int(a) / int(b) for a, b in
                zip(t.column('sn').to_pylist(),
                    t.column('cnt').to_pylist())]
        return pa.table({'source': t['source'],
                         'src_mean_tokens': pa.array(mean, pa.float64())})

    kept = _join_safe(agg.map_batches(keep_rows, batch_format='pyarrow'),
                      num_partitions)
    out = toks.select_columns(['doc_id', 'source']).join(
        kept, 'inner', num_partitions=num_partitions,
        on=('source',), right_on=('source',))
    return out.map_batches(
        lambda t: t.select(['doc_id', 'source', 'src_mean_tokens']),
        batch_format='pyarrow')


#: DSIR feature-hash width.  The hashed generative models are EXACTLY
#: this many buckets no matter the corpus size — feature hashing is the
#: paper's device for a fixed-size model — so the broadcast path IS the
#: 100-TB path; no join tier is needed by construction.
DSIR_BUCKETS = 4096


def dsir_weights(sf_dir: str, target_lang: str = 'en',
                 n_buckets: int = DSIR_BUCKETS):
    """DSIR importance log-weights (Xie et al. 2023, *Data Selection
    for Language Models via Importance Resampling*): score each
    document ln p_target(x) − ln p_raw(x) under two hashed-unigram
    bag-of-words models, the target model fit on docs whose ``lang``
    equals ``target_lang`` and the raw model on the whole corpus,
    add-1 smoothing over the fixed ``n_buckets`` feature space.  High
    weights mark docs that look like the target domain; selection
    resamples by these weights (the deterministic keep-rule analogue
    here is thresholding, cf. :func:`clean_corpus_quantile`).

    Scale shape: ONE corpus pass builds both models' bucket counts
    (per-batch ``np.bincount`` partials → groupby-sum; each block
    ships at most ``n_buckets`` partial rows), the fitted models are
    O(n_buckets) floats broadcast once via ``ray.put``, and pass 2
    scores every doc vectorized (per-doc bincount · log-ratio dot).
    The feature hash is ``md5_number_lower(token) % n_buckets`` — the
    repo's DuckDB-reproducible hash (see :func:`sample_hash`) — so the
    oracle recomputes identical buckets.  Token-less docs weigh 0.0.
    """
    import hashlib

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang'])

    def _buckets(txt: str, memo: dict) -> np.ndarray:
        toks = _TOKEN_RE.findall((txt or '').lower())
        out = np.empty(len(toks), np.int64)
        for j, w in enumerate(toks):
            b = memo.get(w)
            if b is None:
                b = memo[w] = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[8:],
                    'little') % n_buckets
            out[j] = b
        return out

    def count_partial(t: pa.Table) -> pa.Table:
        memo: dict = {}
        raw = np.zeros(n_buckets, np.int64)
        tgt = np.zeros(n_buckets, np.int64)
        for txt, lang in zip(t.column('text').to_pylist(),
                             t.column('lang').to_pylist()):
            bs = _buckets(txt, memo)
            cnt = np.bincount(bs, minlength=n_buckets)
            raw += cnt
            if lang == target_lang:
                tgt += cnt
        nz = np.flatnonzero(raw)
        return pa.table({'b': pa.array(nz, pa.int64()),
                         'raw_c': pa.array(raw[nz], pa.int64()),
                         'tgt_c': pa.array(tgt[nz], pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format='pyarrow')
              .groupby('b')
              .aggregate(Sum('raw_c', alias_name='raw_c'),
                         Sum('tgt_c', alias_name='tgt_c')))

    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    for blk in counts.iter_batches(batch_format='pyarrow'):
        idx = blk.column('b').to_numpy(zero_copy_only=False)
        raw[idx] = blk.column('raw_c').to_numpy(zero_copy_only=False)
        tgt[idx] = blk.column('tgt_c').to_numpy(zero_copy_only=False)
    n_raw, n_tgt = float(raw.sum()), float(tgt.sum())
    logratio = (np.log((tgt + 1.0) / (n_tgt + n_buckets))
                - np.log((raw + 1.0) / (n_raw + n_buckets)))
    lref = ray.put(logratio)

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(lref)
        memo: dict = {}
        ns, ws = [], []
        for txt in t.column('text').to_pylist():
            bs = _buckets(txt, memo)
            ns.append(len(bs))
            ws.append(float(np.bincount(bs, minlength=n_buckets)
                            .dot(lr)) if len(bs) else 0.0)
        return pa.table({'doc_id': t['doc_id'],
                         'n_tokens': pa.array(ns, pa.int64()),
                         'dsir_logweight': pa.array(ws, pa.float64())})

    return (ds.map_batches(score, batch_format='pyarrow')
            .map_batches(lambda t: _snap_round(t, 'dsir_logweight', 4),
                         batch_format='pyarrow'))


def nb_classify(sf_dir: str, force_join: bool = False):
    """Multinomial Naive-Bayes token classifier — the supervised
    classifier-filter shape of GPT-3/LLaMA-style curation (a linear
    model over token counts scoring every document), with a
    deterministic train/predict split: fit on even ``doc_id`` docs
    predicting ``lang``, classify EVERY doc.  Add-1 smoothing over the
    training vocabulary V; OOV tokens are ignored (standard NB);
    per-class score = ln prior + Σ_w c_w·ln((c(class,w)+1)/(n_class+V));
    ties break to the lexicographically smallest class.

    Scale shape: the model is per-(class, token) counts — ONE pass of
    Counter partials → groupby-sum (only (class, token, count) rows
    shuffle, never text).  At or below ``BIGRAM_BROADCAST_LIMIT``
    entries the model broadcasts once via ``ray.put`` and scoring is a
    pure map; above it (or under ``force_join``) the model stays a
    Dataset and :func:`_nb_classify_join` scores through hash joins
    with no O(vocab) structure on any node — tiers test-pinned equal.
    Returns (doc_id, lang, pred_lang).
    """
    import collections
    import math

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import _TOKEN_RE

    if force_join:
        return _nb_classify_join(sf_dir)

    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang'])

    def train_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for i, txt, lang in zip(t.column('doc_id').to_pylist(),
                                t.column('text').to_pylist(),
                                t.column('lang').to_pylist()):
            if i % 2 == 0:
                for w in _TOKEN_RE.findall((txt or '').lower()):
                    c[(lang, w)] += 1
        langs = pa.array([k[0] for k in c], pa.string())
        ws = pa.array([k[1] for k in c], pa.string())
        return pa.table({'lang': langs, 'w': ws,
                         'c': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(train_partial, batch_format='pyarrow')
              .groupby(['lang', 'w']).aggregate(Sum('c', alias_name='c'))
              .materialize())
    if counts.count() > BIGRAM_BROADCAST_LIMIT:
        return _nb_classify_join(sf_dir)

    model: dict = {}
    vocab: set = set()
    n_class: dict = {}
    for b in counts.iter_batches(batch_format='pyarrow'):
        for lang, w, c in zip(b.column('lang').to_pylist(),
                              b.column('w').to_pylist(),
                              b.column('c').to_pylist()):
            model[(lang, w)] = c
            vocab.add(w)
            n_class[lang] = n_class.get(lang, 0) + c
    # priors from the training-doc class counts (answer-sized pull)
    pri = (ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t['doc_id'], 1), 0))
                   .select(['lang']),
        batch_format='pyarrow')
        .groupby('lang').count().to_pandas())
    n_train = float(pri['count()'].sum())
    lnprior = {l: math.log(c / n_train)
               for l, c in zip(pri['lang'], pri['count()'])}
    V = float(len(vocab))
    labels = sorted(lnprior)
    # per-class OOV/normalizer term ln(n_class + V) (missing class
    # counts only arise if a class has train docs but zero tokens)
    lnden = {l: math.log(n_class.get(l, 0) + V) for l in labels}
    mref = ray.put((model, vocab, lnprior, lnden, labels))

    def classify(t: pa.Table) -> pa.Table:
        model, vocab, lnprior, lnden, labels = ray.get(mref)
        preds = []
        for txt in t.column('text').to_pylist():
            cnt = collections.Counter(
                w for w in _TOKEN_RE.findall((txt or '').lower())
                if w in vocab)
            tt = sum(cnt.values())
            best, best_s = None, -math.inf
            for l in labels:
                s = lnprior[l] - tt * lnden[l]
                s += sum(c * math.log(model.get((l, w), 0) + 1)
                         for w, c in cnt.items())
                if s > best_s:
                    best, best_s = l, s
            preds.append(best)
        return pa.table({'doc_id': t['doc_id'], 'lang': t['lang'],
                         'pred_lang': pa.array(preds, pa.string())})

    return ds.map_batches(classify, batch_format='pyarrow')




def _nb_classify_join(sf_dir: str, num_partitions: int = 8):
    """Hash-join tier of :func:`nb_classify` — no O(vocab) structure
    on any node.  Per-doc token counts persist to parquet scratch once
    (read twice: the in-vocab totals and the score join); the
    (class, token) model stays a Dataset.  The per-class score
    decomposes as  ln prior + Σ c·ln(c_lw+1) − T_doc·ln(n_class+V)
    with T_doc the doc's in-vocab token total, so the corpus-side work
    is token-keyed hash joins plus per-(doc, class) hash aggregates,
    and the argmax is a per-doc Max aggregate (exact compare of
    identical doubles) with min-class tie-break."""
    import math
    import tempfile

    import ray
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..stages.dedup import _TOKEN_RE, _join_safe

    ds = _read(sf_dir, 'documents', ['doc_id', 'text', 'lang'])

    def tok_rows(t: pa.Table) -> pa.Table:
        import collections
        ids, ws, cs = [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            cnt = collections.Counter(
                _TOKEN_RE.findall((txt or '').lower()))
            for w, c in cnt.items():
                ids.append(i)
                ws.append(w)
                cs.append(c)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'w': pa.array(ws, pa.string()),
                         'c': pa.array(cs, pa.int64())})

    tk_path = tempfile.mkdtemp(prefix='wsray_nb_') + '/toks'
    ds.map_batches(tok_rows, batch_format='pyarrow').write_parquet(tk_path)
    toks = ray.data.read_parquet(tk_path).map_batches(
        _strip_meta, batch_format='pyarrow')

    # training counts need the class label: doc-keyed join against the
    # (doc_id, lang) projection (token rows never carry text)
    doc_lang = _join_safe(
        ds.map_batches(lambda t: t.select(['doc_id', 'lang']),
                       batch_format='pyarrow'), num_partitions)
    tr = _join_safe(
        toks.map_batches(
            lambda t: t.filter(
                pc.equal(pc.bit_wise_and(t['doc_id'], 1), 0)),
            batch_format='pyarrow')
            .join(doc_lang, 'inner', num_partitions=num_partitions,
                  on=('doc_id',), right_on=('doc_id',))
            .groupby(['lang', 'w']).aggregate(Sum('c', alias_name='cw')),
        num_partitions).materialize()

    # class totals, priors, vocab size: all answer-sized (≤ #classes
    # rows; V is a count, the vocab itself stays a Dataset)
    nc = {r['lang']: float(r['sum(cw)'])
          for r in tr.groupby('lang').aggregate(Sum('cw')).take_all()}
    vocab_ds = _join_safe(
        tr.groupby('w').aggregate(Count()).select_columns(['w']),
        num_partitions).materialize()
    V = float(vocab_ds.count())
    pri_rows = (ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t['doc_id'], 1), 0))
                   .select(['lang']),
        batch_format='pyarrow').groupby('lang').count().take_all())
    n_train = float(sum(r['count()'] for r in pri_rows))
    lnprior = {r['lang']: math.log(r['count()'] / n_train)
               for r in pri_rows}
    labels = sorted(lnprior)
    lnden = {l: math.log(nc.get(l, 0.0) + V) for l in labels}

    # T_doc: in-vocab token total per doc (token-keyed semi-join).
    # Each join-bearing intermediate is materialized so no single
    # execution plan carries more than one JoinOperator — chained
    # join actor pools deadlock when the CPU budget is small (same
    # reason dedup.py materializes between its verify joins).
    tdoc = _join_safe(
        toks.join(vocab_ds, 'inner', num_partitions=num_partitions,
                  on=('w',), right_on=('w',))
            .groupby('doc_id').aggregate(Sum('c', alias_name='tt')),
        num_partitions).materialize()

    # s1(doc, class) = Σ c·ln(c_lw + 1) over the doc's in-vocab tokens
    def term(t: pa.Table) -> pa.Table:
        c = t.column('c').to_numpy(zero_copy_only=False)
        cw = t.column('cw').to_numpy(zero_copy_only=False)
        return pa.table({'doc_id': t['doc_id'],
                         'cls': t['lang'],
                         'term': pa.array(c * np.log(cw + 1.0),
                                          pa.float64())})

    s1 = _join_safe(
        toks.join(tr, 'inner', num_partitions=num_partitions,
                  on=('w',), right_on=('w',))
            .map_batches(term, batch_format='pyarrow')
            .groupby(['doc_id', 'cls']).aggregate(Sum('term',
                                                      alias_name='s1')),
        num_partitions).materialize()

    # base(doc, class) = ln prior − T_doc·ln(n_class + V); expand each
    # doc into one row per class (classes are answer-sized constants)
    base = _join_safe(
        ds.map_batches(lambda t: t.select(['doc_id', 'lang']),
                       batch_format='pyarrow')
          .join(tdoc, 'left_outer', num_partitions=num_partitions,
                on=('doc_id',), right_on=('doc_id',)),
        num_partitions).materialize()

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tt = t.column('tt').to_numpy(zero_copy_only=False)
        tt = np.where(np.isnan(tt), 0.0, tt)
        ids, langs, clss, bases = [], [], [], []
        for l in labels:
            ids.append(t.column('doc_id'))
            langs.append(t.column('lang'))
            clss.extend([l] * n)
            bases.append(lnprior[l] - tt * lnden[l])
        return pa.table({
            'doc_id': pa.concat_arrays(
                [a.combine_chunks() for a in ids]),
            'lang': pa.concat_arrays(
                [a.combine_chunks() for a in langs]),
            'cls': pa.array(clss, pa.string()),
            'base': pa.array(np.concatenate(bases), pa.float64())})

    scored = _join_safe(
        base.map_batches(expand, batch_format='pyarrow')
            .join(s1, 'left_outer', num_partitions=num_partitions,
                  on=('doc_id', 'cls'), right_on=('doc_id', 'cls')),
        num_partitions)

    def total(t: pa.Table) -> pa.Table:
        s = t.column('s1').to_numpy(zero_copy_only=False)
        s = np.where(np.isnan(s), 0.0, s)
        b = t.column('base').to_numpy(zero_copy_only=False)
        return pa.table({'doc_id': t['doc_id'], 'lang': t['lang'],
                         'cls': t['cls'],
                         'score': pa.array(b + s, pa.float64())})

    scores = _join_safe(
        scored.map_batches(total, batch_format='pyarrow'),
        num_partitions).materialize()
    best = _join_safe(
        scores.groupby('doc_id').aggregate(Max('score',
                                               alias_name='best')),
        num_partitions)
    out = (scores.join(best, 'inner', num_partitions=num_partitions,
                       on=('doc_id',), right_on=('doc_id',))
           .map_batches(
               lambda t: t.filter(pc.equal(t['score'], t['best'])),
               batch_format='pyarrow')
           .groupby(['doc_id', 'lang'])
           .aggregate(Min('cls', alias_name='pred_lang')))
    return out.map_batches(
        lambda t: t.select(['doc_id', 'lang', 'pred_lang']),
        batch_format='pyarrow')


BUDGET_GRID = 4096
#: boundary fold guard: the exact fold only ever sees the docs of ONE
#: fine histogram cell (expected corpus/GRID² plus exact-score ties)
BUDGET_BOUNDARY_LIMIT = 2_000_000


def budget_select(sf_dir: str, budget_frac: float = 0.25):
    """Token-budget data selection (the data-curation step after
    scoring: keep the best documents until the training-token budget
    is spent).  Documents are ordered by type-token ratio
    (n_unique_tokens / n_tokens, the :func:`quality` contract)
    descending, ties by doc_id, and selected while the inclusive
    running token total stays within ``budget_frac`` of the corpus
    token count.  Returns (doc_id, n_tokens) of the selected set.

    100-TB shape — NO global sort: the cut point is found with a
    two-level distributed score histogram (the :func:`token_quantiles`
    trick applied to selection).  Pass 1 folds each block to
    (score-bucket, tokens, docs) partials → a BUDGET_GRID-sized
    groupby; the driver scans the ≤4k buckets descending to find the
    boundary bucket.  Pass 2 re-histograms ONLY that bucket's docs on
    a GRID²-fine key; the single boundary CELL (expected
    corpus/GRID² docs) is folded exactly on the driver.  Pass 3
    streams the corpus once more, keeping docs above the cut plus the
    broadcast boundary winners.  Driver state: two histograms + one
    cell; scores never shuffle with text."""
    import ray
    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    G = BUDGET_GRID

    def score_of(texts):
        ns, us, sc = [], [], []
        for s in texts:
            toks = _TOKEN_RE.findall((s or '').lower())
            n, u = len(toks), len(set(toks))
            ns.append(n)
            us.append(u)
            sc.append(0.0 if n == 0 else u / n)
        return (np.asarray(ns, np.int64), np.asarray(us, np.int64),
                np.asarray(sc, np.float64))

    def hist_partial(t: pa.Table) -> pa.Table:
        n, _, sc = score_of(t.column('text').to_pylist())
        b = np.floor(sc * G).astype(np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        return pa.table({
            'bucket': pa.array(uniq, pa.int64()),
            'tk': pa.array(np.bincount(inv, weights=n).astype(np.int64),
                           pa.int64()),
            'd': pa.array(np.bincount(inv), pa.int64())})

    rows = (ds.map_batches(hist_partial, batch_format='pyarrow')
            .groupby('bucket')
            .aggregate(Sum('tk', alias_name='tokens'),
                       Sum('d', alias_name='docs'))
            .take_all())
    rows.sort(key=lambda r: -r['bucket'])
    total = sum(r['tokens'] for r in rows)
    budget = total * budget_frac

    cum_hi = 0
    b_star = None
    for r in rows:
        if cum_hi + r['tokens'] <= budget:
            cum_hi += r['tokens']
        else:
            b_star = r['bucket']
            break

    def out_cols(t: pa.Table, keep: np.ndarray, n: np.ndarray) -> pa.Table:
        return pa.table({
            'doc_id': t.column('doc_id').filter(pa.array(keep)),
            'n_tokens': pa.array(n[keep], pa.int64())})

    if b_star is None:
        # whole corpus fits the budget
        def all_docs(t: pa.Table) -> pa.Table:
            n, _, _ = score_of(t.column('text').to_pylist())
            return out_cols(t, np.ones(len(n), bool), n)
        return ds.map_batches(all_docs, batch_format='pyarrow')

    # ---- refine within the boundary bucket on a GRID²-fine key ----
    def fine_partial(t: pa.Table) -> pa.Table:
        n, _, sc = score_of(t.column('text').to_pylist())
        m = np.floor(sc * G).astype(np.int64) == b_star
        f = np.floor(sc[m] * G * G).astype(np.int64)
        uniq, inv = np.unique(f, return_inverse=True)
        return pa.table({
            'fine': pa.array(uniq, pa.int64()),
            'tk': pa.array(
                np.bincount(inv, weights=n[m]).astype(np.int64),
                pa.int64())})

    frows = (ds.map_batches(fine_partial, batch_format='pyarrow')
             .groupby('fine')
             .aggregate(Sum('tk', alias_name='tokens'))
             .take_all())
    frows = [r for r in frows if r['fine'] is not None]
    frows.sort(key=lambda r: -r['fine'])
    f_star = None
    for r in frows:
        if cum_hi + r['tokens'] <= budget:
            cum_hi += r['tokens']
        else:
            f_star = r['fine']
            break

    sel_ids: set = set()
    if f_star is not None:
        # exact fold of the one boundary cell
        def cell(t: pa.Table) -> pa.Table:
            n, _, sc = score_of(t.column('text').to_pylist())
            m = np.floor(sc * G * G).astype(np.int64) == f_star
            return pa.table({
                'doc_id': t.column('doc_id').filter(pa.array(m)),
                'n_tokens': pa.array(n[m], pa.int64()),
                'score': pa.array(sc[m], pa.float64())})

        cell_rows = (ds.map_batches(cell, batch_format='pyarrow')
                     .take_all())
        if len(cell_rows) > BUDGET_BOUNDARY_LIMIT:
            raise RuntimeError(
                'budget_select boundary cell exceeds %d docs — raise '
                'BUDGET_GRID' % BUDGET_BOUNDARY_LIMIT)
        cell_rows.sort(key=lambda r: (-r['score'], r['doc_id']))
        for r in cell_rows:
            if cum_hi + r['n_tokens'] <= budget:
                cum_hi += r['n_tokens']
                sel_ids.add(r['doc_id'])
            else:
                break

    sel_ref = ray.put(sel_ids)
    fine_cut = f_star

    def pick(t: pa.Table) -> pa.Table:
        sel = ray.get(sel_ref)
        n, _, sc = score_of(t.column('text').to_pylist())
        b = np.floor(sc * G).astype(np.int64)
        keep = b > b_star
        mb = b == b_star
        if mb.any():
            f = np.floor(sc * G * G).astype(np.int64)
            if fine_cut is not None:
                keep |= mb & (f > fine_cut)
            if sel:
                ids = t.column('doc_id').to_numpy(zero_copy_only=False)
                in_sel = np.array([i in sel for i in ids], bool)
                keep |= mb & in_sel
        return out_cols(t, keep, n)

    return ds.map_batches(pick, batch_format='pyarrow')


def host_boilerplate(sf_dir: str, frac: float = 0.05, min_docs: int = 2,
                     words_per_line: int | None = 10,
                     force_join: bool = False, num_partitions: int = 8):
    """Per-host boilerplate line detection (CCNet / Dolma's "strip the
    nav bars": a line appearing across many pages of one host is
    template, not content).  A non-empty line (10-word window, the
    :func:`line_dedup` contract — the synthetic corpus has no
    newlines) is boilerplate for ``source`` s iff it occurs in at
    least ``max(min_docs, ceil(frac · docs(s)))`` DISTINCT documents
    of s.  Returns (source, line, n_docs) — the detected template
    lines with their document frequency.

    100-TB shape: pass 1 folds each block to per-(source, digest)
    distinct-doc partial counts — 16-byte blake2b digests, line TEXT
    never shuffles — into a groupby-sum; per-source doc totals are a
    20-entry (domain-cardinality) aggregate, broadcast under
    ``BROADCAST_KEY_LIMIT`` or hash-joined above it (``force_join``
    tier, test-pinned equal).  The qualifying (source, digest) set is
    answer-scale; pass 2 re-reads only matching lines' text and
    groupby-min picks one canonical text per digest."""
    import hashlib

    import ray
    from ray.data.aggregate import Min, Sum

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe

    ds = _read(sf_dir, 'documents', ['doc_id', 'source', 'text'])
    w = words_per_line

    def digest2(line: str):
        d = hashlib.blake2b(line.encode('utf-8', 'surrogatepass'),
                            digest_size=16).digest()
        return (int.from_bytes(d[:8], 'little') - (1 << 63),
                int.from_bytes(d[8:], 'little') - (1 << 63))

    def count_partial(t: pa.Table) -> pa.Table:
        import collections
        cnt = collections.Counter()
        for src, txt in zip(t.column('source').to_pylist(),
                            t.column('text').to_pylist()):
            seen = set()
            for line in _doc_lines(txt, w):
                if line:
                    seen.add(digest2(line))
            for h in seen:
                cnt[(src, h)] += 1
        ks = list(cnt)
        return pa.table({
            'source': pa.array([k[0] for k in ks], pa.string()),
            'h1': pa.array([k[1][0] for k in ks], pa.int64()),
            'h2': pa.array([k[1][1] for k in ks], pa.int64()),
            'c': pa.array([cnt[k] for k in ks], pa.int64())})

    counts = (ds.map_batches(count_partial, batch_format='pyarrow')
              .groupby(['source', 'h1', 'h2'])
              .aggregate(Sum('c', alias_name='n_docs')))

    sdocs = (ds.map_batches(
        lambda t: pa.table({
            'source': t.column('source'),
            'one': pa.array(np.ones(t.num_rows, np.int64), pa.int64())}),
        batch_format='pyarrow')
        .groupby('source').aggregate(Sum('one', alias_name='src_docs'))
        .materialize())

    n_src = sdocs.count()
    if not force_join and n_src <= BROADCAST_KEY_LIMIT:
        smap = {r['source']: r['src_docs']
                for b in sdocs.iter_batches(batch_format='pyarrow')
                for r in b.to_pylist()}
        sref = ray.put(smap)

        def qualify(t: pa.Table) -> pa.Table:
            sm = ray.get(sref)
            srcs = t.column('source').to_pylist()
            nd = t.column('n_docs').to_numpy(zero_copy_only=False)
            import math
            keep = np.array(
                [n >= max(min_docs, math.ceil(frac * sm[s]))
                 for s, n in zip(srcs, nd)], bool)
            return t.filter(pa.array(keep))
    else:
        counts = _join_safe(counts, num_partitions).join(
            _join_safe(sdocs, num_partitions), 'inner',
            num_partitions=num_partitions,
            on=('source',), right_on=('source',))

        def qualify(t: pa.Table) -> pa.Table:
            nd = t.column('n_docs').to_numpy(zero_copy_only=False)
            sd = t.column('src_docs').to_numpy(zero_copy_only=False)
            th = np.maximum(min_docs,
                            np.ceil(frac * sd).astype(np.int64))
            return (t.filter(pa.array(nd >= th))
                    .select(['source', 'h1', 'h2', 'n_docs']))

    qual = counts.map_batches(qualify, batch_format='pyarrow')
    qrows = qual.take_all()
    if not qrows:
        return pa.table({'source': pa.array([], pa.string()),
                         'line': pa.array([], pa.string()),
                         'n_docs': pa.array([], pa.int64())})
    qset = {(r['source'], r['h1'], r['h2']): r['n_docs'] for r in qrows}
    qref = ray.put(qset)

    def recover(t: pa.Table) -> pa.Table:
        qs = ray.get(qref)
        out = {}
        for src, txt in zip(t.column('source').to_pylist(),
                            t.column('text').to_pylist()):
            for line in _doc_lines(txt, w):
                if not line:
                    continue
                h1, h2 = digest2(line)
                key = (src, h1, h2)
                nd = qs.get(key)
                if nd is not None and key not in out:
                    out[key] = (line, nd)
        ks = sorted(out)
        return pa.table({
            'source': pa.array([k[0] for k in ks], pa.string()),
            'h1': pa.array([k[1] for k in ks], pa.int64()),
            'h2': pa.array([k[2] for k in ks], pa.int64()),
            'line': pa.array([out[k][0] for k in ks], pa.string()),
            'n_docs': pa.array([out[k][1] for k in ks], pa.int64())})

    out = (ds.map_batches(recover, batch_format='pyarrow')
           .groupby(['source', 'h1', 'h2'])
           .aggregate(Min('line', alias_name='line'),
                      Min('n_docs', alias_name='n_docs')))
    return out.map_batches(
        lambda t: t.select(['source', 'line', 'n_docs']),
        batch_format='pyarrow')


def semdedup_recall(sf_dir: str, threshold: float = 0.95,
                    n_clusters: int = 16, min_recall: float = 0.95):
    """Driver-visible SemDeDup quality gate (the same contract as
    :func:`knn_ivf_recall`): the cluster-pruned removal set
    (:func:`stages.dedup.semdedup_removed`) vs the EXACT cosine dup
    graph — every exact dup component's non-representative members.
    Emits one row (n_exact_removed, recall_ok): ``n_exact_removed``
    is SQL-recomputable (recursive-CTE components over all-pairs
    cosine), ``recall_ok`` = 1 iff (a) every SemDeDup removal is a
    true dup (precision 1.0 — guaranteed by construction, verified
    anyway) and (b) recall >= ``min_recall``; the oracle states 1, so
    a clustering regression goes driver-red."""
    from ..stages.clusters import connected_components
    from ..stages.dedup import embedding_dup_pairs, semdedup_removed

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])

    exact_pairs = embedding_dup_pairs(ds, threshold=threshold,
                                      method='brute')
    cc = connected_components(exact_pairs)
    exact_removed = {d for d, c in zip(cc.column('doc_id').to_pylist(),
                                       cc.column('cluster_id').to_pylist())
                     if d != c}

    sem = semdedup_removed(ds, threshold=threshold,
                           n_clusters=n_clusters)
    sem_removed = set(sem.column('vec_id').to_pylist())

    # precision: every semdedup removal must have a >=threshold
    # neighbor, i.e. appear somewhere in the exact dup graph
    in_graph = set(cc.column('doc_id').to_pylist())
    precision_ok = sem_removed <= in_graph
    recall = (1.0 if not exact_removed
              else len(sem_removed & exact_removed) / len(exact_removed))
    return pa.table({
        'n_exact_removed': pa.array([len(exact_removed)], pa.int64()),
        'recall_ok': pa.array(
            [int(precision_ok and recall >= min_recall)], pa.int64())})


def inverted_index(sf_dir: str, min_df: int = 2):
    """Inverted-index build (the search-engine primitive over crawled
    text): for every term with document frequency >= ``min_df``, the
    sorted distinct posting list.  Returns (term, df, postings) with
    postings comma-joined for compare stability.

    100-TB shape: the classic two-phase index build — each block folds
    to PARTIAL posting lists (one row per distinct term per block,
    docs pre-sorted and pre-deduped, so a term string ships once per
    block, not once per occurrence), then one shuffle by term merges
    partials per key inside :func:`_per_key_groups` coarse buckets (64
    group-applies, no per-term Ray group).  The output IS
    corpus-scale for stopword terms — inherent to an inverted index —
    but the shuffle never carries raw text, only term + docid runs."""
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        post: dict = {}
        for i, s in zip(t.column('doc_id').to_pylist(),
                        t.column('text').to_pylist()):
            for w in set(_TOKEN_RE.findall((s or '').lower())):
                post.setdefault(w, []).append(i)
        terms = sorted(post)
        return pa.table({
            'term': pa.array(terms, pa.string()),
            'c': pa.array([len(post[w]) for w in terms], pa.int64()),
            'docs': pa.array(
                [','.join(str(d) for d in sorted(post[w]))
                 for w in terms], pa.string())})

    parts = ds.map_batches(partial, batch_format='pyarrow')

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        df = int(g['c'].sum())
        if df < min_df:
            return pd.DataFrame({'term': [], 'df': [], 'postings': []})
        docs = sorted(int(x) for s in g['docs'] for x in s.split(','))
        return pd.DataFrame({'term': [g['term'].iloc[0]],
                             'df': [df],
                             'postings': [','.join(map(str, docs))]})

    out = _per_key_groups(parts, 'term', merge)
    return out.map_batches(
        lambda t: pa.table({'term': t.column('term'),
                            'df': pc.cast(t.column('df'), pa.int64()),
                            'postings': t.column('postings')}),
        batch_format='pyarrow')


def crawl_budget_alloc(sf_dir: str, budget: int = 1000):
    """Crawl-budget apportionment across hosts (the planning step a
    recrawl scheduler feeds): ``budget`` page slots split across
    sources proportional to their whitespace-token mass, integerized
    by Hamilton's largest-remainder method (floor every quota, hand
    the leftover slots to the largest fractional remainders, ties by
    source).  Returns (source, n_tokens, alloc).

    Distributed part is the per-source token-mass groupby (per-block
    partials, host-cardinality result); the apportionment itself runs
    on the driver over the answer-sized table — exactly the shape of
    :func:`mixture_weights`."""
    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['source', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        import collections
        toks = collections.Counter()
        for src, s in zip(t.column('source').to_pylist(),
                          t.column('text').to_pylist()):
            toks[src] += len(_TOKEN_RE.findall((s or '').lower()))
        ks = sorted(toks)
        return pa.table({'source': pa.array(ks, pa.string()),
                         'tk': pa.array([toks[k] for k in ks],
                                        pa.int64())})

    rows = (ds.map_batches(partial, batch_format='pyarrow')
            .groupby('source')
            .aggregate(Sum('tk', alias_name='n_tokens'))
            .take_all())
    rows.sort(key=lambda r: r['source'])
    tok = np.array([r['n_tokens'] for r in rows], np.float64)
    W = tok.sum()
    quota = budget * tok / W
    fl = np.floor(quota).astype(np.int64)
    rem = int(budget - fl.sum())
    # largest remainder, ties by source order (rows sorted by source)
    order = sorted(range(len(rows)),
                   key=lambda i: (-(quota[i] - fl[i]), rows[i]['source']))
    alloc = fl.copy()
    for i in order[:rem]:
        alloc[i] += 1
    return pa.table({
        'source': pa.array([r['source'] for r in rows], pa.string()),
        'n_tokens': pa.array([r['n_tokens'] for r in rows], pa.int64()),
        'alloc': pa.array(alloc, pa.int64())})


def centroid_classify(sf_dir: str):
    """Nearest-centroid (prototype) classification over the embedding
    column — the embedding-space counterpart of :func:`nb_classify`
    and the primitive behind cluster-then-filter curation (assign
    every vector to the closest class prototype by cosine).  Returns
    (vec_id, label, pred_label); ties break to the smaller label.

    100-TB shape: pass 1 folds each block to per-label (count,
    sum-vector) partials — one 64-float row per label per block, so
    the driver fold is O(blocks × labels), never O(vectors); the
    label-cardinality centroid matrix broadcasts once via ``ray.put``
    and pass 2 classifies each block with one matmul.  Argmax
    stability vs the SQL oracle is measured: min top1−top2 cosine gap
    1.1e-4 on the fixture vs ~1e-15 f64 summation-order noise."""
    import ray

    from ..stages.similarity import _emb_matrix

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'label', 'embedding'])

    def partial(t: pa.Table) -> pa.Table:
        M = _emb_matrix(t.column('embedding')).astype(np.float64)
        lab = t.column('label').to_numpy(zero_copy_only=False)
        uniq = np.unique(lab)
        return pa.table({
            'label': pa.array(uniq.astype(np.int64), pa.int64()),
            'n': pa.array([int((lab == u).sum()) for u in uniq],
                          pa.int64()),
            's': pa.array([M[lab == u].sum(axis=0).tolist()
                           for u in uniq],
                          pa.list_(pa.float64()))})

    sums: dict = {}
    cnts: dict = {}
    for b in (ds.map_batches(partial, batch_format='pyarrow')
              .iter_batches(batch_format='pyarrow')):
        for lb, n, s in zip(b.column('label').to_pylist(),
                            b.column('n').to_pylist(),
                            b.column('s').to_pylist()):
            cnts[lb] = cnts.get(lb, 0) + n
            sums[lb] = sums.get(lb, 0) + np.asarray(s)
    labels = np.array(sorted(sums), np.int64)
    C = np.stack([sums[l] / cnts[l] for l in labels])
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    ref = ray.put((labels, Cn))

    def classify(t: pa.Table) -> pa.Table:
        labs, Cn_ = ray.get(ref)
        M = _emb_matrix(t.column('embedding')).astype(np.float64)
        S = M @ Cn_.T
        # argmax with ties to the SMALLER label: labels ascend, and
        # np.argmax returns the first max
        pred = labs[np.argmax(S, axis=1)]
        return pa.table({
            'vec_id': t.column('vec_id'),
            'label': pc.cast(t.column('label'), pa.int64()),
            'pred_label': pa.array(pred, pa.int64())})

    return ds.map_batches(classify, batch_format='pyarrow')


def snapshot_diff(sf_dir: str, num_partitions: int = 8):
    """Cross-snapshot change classification (the web-archive diff a
    recrawl scheduler consumes): every page key is labeled ``gone``
    (only in the old crawl), ``added`` (only in the new), ``changed``
    (both, different content hash) or ``unchanged``.  Snapshots are
    derived deterministically from the documents table (the
    :func:`cdx_index` convention of constructed fixtures): old = docs
    0..449, new = docs 50..499 with every doc_id % 5 == 0 page
    re-rendered (content suffixed 'v2'), so all four classes are
    non-empty at every sf.  Returns (page_key, status).

    100-TB shape: only (key, md5) pairs enter the one FULL OUTER
    ``Dataset.join`` — content hashes computed block-local, never
    text; classification is a vectorized per-batch map over the join
    output.  This is the engine's full-outer exemplar (inner /
    left_outer / semi / anti / as-of / band live elsewhere)."""
    from ..stages.dedup import _join_safe, content_md5

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def side(old: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column('doc_id').to_numpy(zero_copy_only=False)
            texts = t.column('text').to_pylist()
            keys, h = [], []
            for i, s in zip(ids, texts):
                if old and i < 450:
                    keys.append(int(i))
                    h.append(content_md5(s or ''))
                elif not old and i >= 50:
                    keys.append(int(i))
                    h.append(content_md5((s or '')
                                         + ('v2' if i % 5 == 0 else '')))
            col = 'old_md5' if old else 'new_md5'
            return pa.table({'page_key': pa.array(keys, pa.int64()),
                             col: pa.array(h, pa.string())})
        return f

    old = _join_safe(ds.map_batches(side(True), batch_format='pyarrow'),
                     num_partitions)
    new = _join_safe(ds.map_batches(side(False), batch_format='pyarrow'),
                     num_partitions)
    joined = old.join(new, 'full_outer', num_partitions=num_partitions,
                      on=('page_key',), right_on=('page_key',))

    def classify(t: pa.Table) -> pa.Table:
        o = t.column('old_md5').to_pylist()
        n = t.column('new_md5').to_pylist()
        st = ['gone' if b is None else
              'added' if a is None else
              'unchanged' if a == b else 'changed'
              for a, b in zip(o, n)]
        return pa.table({'page_key': pc.cast(t.column('page_key'),
                                             pa.int64()),
                         'status': pa.array(st, pa.string())})

    return joined.map_batches(classify, batch_format='pyarrow')


# ---------------------------------------------------------------------------
# round-4 session-4 additions: collocations, lexical diversity, Zipf fit,
# mirror detection, outdegree histogram

def pmi_collocations(sf_dir: str, k: int = 100, min_count: int = 5,
                     num_partitions: int = 8, force_join: bool = False):
    """Top-``k`` bigram collocations by pointwise mutual information —
    the classic phrase-mining signal (Church & Hanks 1990) a tokenizer
    / phrase-vocabulary builder consumes.  PMI = ln(p(w1,w2) /
    (p(w1)·p(w2))) with bigram probability over the bigram-token total
    and unigram probabilities over the unigram-token total; bigrams
    below ``min_count`` are dropped (the standard low-count PMI
    pathology guard).

    100-TB shape: one corpus pass emits per-batch (kind, w1, w2, c)
    count partials (the combiner — token streams never shuffle) and
    ONE groupby-sum.  Tiered like :func:`bigram_logprob`: a unigram
    vocabulary at or below ``BIGRAM_BROADCAST_LIMIT`` entries ships
    once via ``ray.put`` and the bigram rows score in place (two
    Acero joins cost ~5 s fixed each — pure overhead at answer-scale
    vocabularies); above the limit (or under ``force_join``) the
    surviving bigrams hash-join the unigram count table twice (w1,
    w2) — no broadcast, no driver-side count table.  Tiers are
    test-pinned equal.  The two scalars (unigram / bigram token
    totals) reduce via Dataset.sum.  Output ordering is (pmi_r6 desc,
    w1, w2) on the 1e-6-snapped PMI so ties resolve identically in
    the engine and the SQL oracle."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _join_safe
    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for txt in t.column('text').to_pylist():
            toks = _TOKEN_RE.findall((txt or '').lower())
            for w in toks:
                c[('u', w, '')] += 1
            for i in range(len(toks) - 1):
                c[('b', toks[i], toks[i + 1])] += 1
        ks = list(c.keys())
        return pa.table({
            'kind': pa.array([x[0] for x in ks], pa.string()),
            'w1': pa.array([x[1] for x in ks], pa.string()),
            'w2': pa.array([x[2] for x in ks], pa.string()),
            'c': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby(['kind', 'w1', 'w2'])
              .aggregate(Sum('c', alias_name='c'))
              .materialize())

    def just(kind):
        return lambda t: t.filter(pc.equal(t.column('kind'), kind))

    uni = counts.map_batches(just('u'), batch_format='pyarrow')
    big = counts.map_batches(just('b'), batch_format='pyarrow')

    n_uni = float(uni.sum('c') or 0)
    n_big = float(big.sum('c') or 0)

    n_vocab = counts.map_batches(
        lambda t: pa.table({'n': pa.array(
            [t.filter(pc.equal(t.column('kind'), 'u')).num_rows],
            pa.int64())}),
        batch_format='pyarrow').sum('n') or 0

    if not force_join and n_vocab <= BIGRAM_BROADCAST_LIMIT:
        import ray

        uc: dict = {}
        for b in uni.iter_batches(batch_format='pyarrow'):
            for w, c in zip(b.column('w1').to_pylist(),
                            b.column('c').to_pylist()):
                uc[w] = c
        uref = ray.put(uc)

        def score_bc(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t['c'], min_count))
            lk = ray.get(uref)
            cb = t.column('c').to_numpy(zero_copy_only=False).astype(
                np.float64)
            c1 = np.array([lk[w] for w in t.column('w1').to_pylist()],
                          np.float64)
            c2 = np.array([lk[w] for w in t.column('w2').to_pylist()],
                          np.float64)
            pmi = np.log((cb / n_big) / ((c1 / n_uni) * (c2 / n_uni)))
            out = pa.table({'w1': t['w1'], 'w2': t['w2'],
                            'cnt': pc.cast(t['c'], pa.int64()),
                            'pmi': pa.array(pmi, pa.float64())})
            return _snap_round(out, 'pmi', 6)

        return (big.map_batches(score_bc, batch_format='pyarrow')
                .sort(['pmi', 'w1', 'w2'],
                      descending=[True, False, False])
                .limit(k))

    big = big.map_batches(
        lambda t: pa.table({'w1': t['w1'], 'w2': t['w2'], 'cnt': t['c']})
        .filter(pc.greater_equal(t['c'], min_count)),
        batch_format='pyarrow')
    u1 = uni.map_batches(
        lambda t: pa.table({'w1': t['w1'], 'c1': t['c']}),
        batch_format='pyarrow')
    u2 = uni.map_batches(
        lambda t: pa.table({'w2': t['w1'], 'c2': t['c']}),
        batch_format='pyarrow')

    joined = (_join_safe(big, num_partitions)
              .join(_join_safe(u1, num_partitions), 'inner',
                    num_partitions=num_partitions,
                    on=('w1',), right_on=('w1',))
              .join(_join_safe(u2, num_partitions), 'inner',
                    num_partitions=num_partitions,
                    on=('w2',), right_on=('w2',)))

    def score(t: pa.Table) -> pa.Table:
        cb = t.column('cnt').to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column('c1').to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column('c2').to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((cb / n_big) / ((c1 / n_uni) * (c2 / n_uni)))
        out = pa.table({'w1': t['w1'], 'w2': t['w2'],
                        'cnt': pc.cast(t['cnt'], pa.int64()),
                        'pmi': pa.array(pmi, pa.float64())})
        return _snap_round(out, 'pmi', 6)

    return (joined.map_batches(score, batch_format='pyarrow')
            .sort(['pmi', 'w1', 'w2'], descending=[True, False, False])
            .limit(k))


def lexical_diversity(sf_dir: str):
    """Per-document lexical-diversity quality signals: token count,
    distinct-type count, type-token ratio, and hapax-legomena ratio
    (fraction of types occurring exactly once) — the vocabulary-health
    columns a corpus quality dashboard reads next to the Gopher rules.
    Empty documents emit (0, 0, 0.0, 0.0) by contract.

    100-TB shape: pure shuffle-free map_batches (per-doc Counter in
    the batch loop — tokenization is inherently per-row); no state, no
    shuffle, linear scan."""
    from collections import Counter

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def stats(t: pa.Table) -> pa.Table:
        n_tok, n_typ, ttr, hapax = [], [], [], []
        for txt in t.column('text').to_pylist():
            c = Counter(_TOKEN_RE.findall((txt or '').lower()))
            nt = sum(c.values())
            ty = len(c)
            h1 = sum(1 for v in c.values() if v == 1)
            n_tok.append(nt)
            n_typ.append(ty)
            ttr.append(ty / nt if nt else 0.0)
            hapax.append(h1 / ty if ty else 0.0)
        out = pa.table({
            'doc_id': pc.cast(t['doc_id'], pa.int64()),
            'n_tokens': pa.array(n_tok, pa.int64()),
            'n_types': pa.array(n_typ, pa.int64()),
            'ttr': pa.array(ttr, pa.float64()),
            'hapax_ratio': pa.array(hapax, pa.float64())})
        out = _snap_round(out, 'ttr', 6)
        return _snap_round(out, 'hapax_ratio', 6)

    return ds.map_batches(stats, batch_format='pyarrow')


def zipf_slope(sf_dir: str, top: int = 1000):
    """Corpus Zipf-law fit: OLS slope of ln(count) on ln(rank) over
    the ``top`` most frequent tokens (rank 1 = most frequent; ties
    broken by token asc).  A healthy natural-language corpus sits
    near -1; scraped boilerplate / spam shifts it — the single-scalar
    corpus-health check next to :func:`token_quantiles`.

    Returns one row (slope, n_terms).  100-TB shape: per-batch token
    count partials → ONE groupby-sum (vocab-sized, ≪ corpus), sort +
    limit(top) — Ray's distributed top-k — and the O(top) remainder
    (default 1000 rows) folds on the driver with a closed-form OLS.
    The slope is computed from exact integer counts so both engines
    see identical inputs; only the final scalar rounds (1e-6)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        return pa.table({'w': pa.array(list(c.keys()), pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    ranked = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby('w').aggregate(Sum('c', alias_name='c'))
              .sort(['c', 'w'], descending=[True, False])
              .limit(top)
              .take_all())  # O(top) rows — answer-sized by contract

    n = len(ranked)
    if n < 2:
        return pa.table({'slope': pa.array([0.0], pa.float64()),
                         'n_terms': pa.array([n], pa.int64())})
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(np.array([r['c'] for r in ranked], dtype=np.float64))
    slope = (np.mean(x * y) - np.mean(x) * np.mean(y)) / (
        np.mean(x * x) - np.mean(x) ** 2)
    return _snap_round(
        pa.table({'slope': pa.array([slope], pa.float64()),
                  'n_terms': pa.array([n], pa.int64())}), 'slope', 6)


def mirror_sources(sf_dir: str, min_shared: int = 2,
                   max_group: int = 64,
                   words_per_line: int | None = 10):
    """Mirror / template-sharing detection: pairs of sources (hosts,
    at web scale) that publish ≥ ``min_shared`` identical content
    LINES (the :func:`line_dedup` segmentation — 10-word windows on
    the newline-free synthetic corpus, real newlines on webtext) —
    the signal a crawler uses to collapse mirrored or
    template-sharing sites before wasting fetch budget.  Returns
    (source_a, source_b, n_shared) with source_a < source_b, counting
    DISTINCT shared lines (empty lines exempt).

    100-TB shape: only (md5(line), source) pairs shuffle (never line
    text), pre-deduplicated per batch; ONE groupby collapses to
    distinct (hash, source); the pair expansion runs per line-hash
    group inside :func:`_per_key_groups` coarse buckets and is
    quadratic only in the DISTINCT sources sharing one line — groups
    larger than ``max_group`` sources (ubiquitous boilerplate:
    cookie banners, error pages) are dropped by the standard
    mirror-detection guard, keeping per-group work O(max_group²).
    The synthetic corpus has 20 sources, so the guard never fires at
    test scale and the SQL oracle matches exactly."""
    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import content_md5

    ds = _read(sf_dir, 'documents', ['text', 'source'])

    def hashed(t: pa.Table) -> pa.Table:
        seen = set()
        for src, txt in zip(t.column('source').to_pylist(),
                            t.column('text').to_pylist()):
            for line in _doc_lines(txt, words_per_line):
                if line:
                    seen.add((content_md5(line), src))
        return pa.table({
            'h': pa.array([p[0] for p in seen], pa.string()),
            'source': pa.array([p[1] for p in seen], pa.string())})

    distinct = (ds.map_batches(hashed, batch_format='pyarrow')
                .groupby(['h', 'source'])
                .aggregate(Count(alias_name='_n'))
                .select_columns(['h', 'source']))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        srcs = sorted(g['source'].unique())
        if len(srcs) < 2 or len(srcs) > max_group:
            return pd.DataFrame({'source_a': pd.Series([], dtype=str),
                                 'source_b': pd.Series([], dtype=str),
                                 'one': pd.Series([], dtype='int64')})
        a, b = zip(*[(srcs[i], srcs[j])
                     for i in range(len(srcs))
                     for j in range(i + 1, len(srcs))])
        return pd.DataFrame({'source_a': a, 'source_b': b,
                             'one': np.ones(len(a), dtype='int64')})

    pair_counts = (_per_key_groups(distinct, 'h', pairs)
                   .groupby(['source_a', 'source_b'])
                   .aggregate(Sum('one', alias_name='n_shared')))

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t['n_shared'], min_shared))
        return t.set_column(t.schema.get_field_index('n_shared'),
                            'n_shared', pc.cast(t['n_shared'], pa.int64()))

    return pair_counts.map_batches(fin, batch_format='pyarrow')


def outdeg_hist(sf_dir: str):
    """Outdegree histogram of the url link graph (the degree-
    distribution companion to :func:`crawl_depth_hist` and the inlink
    family): (outdeg, n_pages).  Degree is counted over the real link
    kernels (xpath get_links + canonicalization), so the histogram
    reflects exactly what the crawler would follow-or-register.

    100-TB shape: a page's outlinks are computed block-local from its
    own html row, so the degree is exact per batch — per-batch
    (outdeg → n_pages) Counter partials, ONE groupby-sum over the
    tiny degree domain.  Zero all-to-all on page or edge
    cardinality."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for h in t.column('html').to_pylist():
            page = html_to_unicode(h)
            c[len(X.search(page, '//a/@href'))] += 1
        return pa.table({'outdeg': pa.array(list(c.keys()), pa.int64()),
                         'n': pa.array(list(c.values()), pa.int64())})

    return (pages.map_batches(partial, batch_format='pyarrow')
            .groupby('outdeg').aggregate(Sum('n', alias_name='n_pages')))


def doc_containment(sf_dir: str, threshold: float = 0.8, k: int = 3,
                    max_group: int = 64):
    """Asymmetric containment near-dup pairs — the signal Jaccard
    misses: a short document wholly quoted inside a long one has low
    Jaccard but containment ~1.  For every doc pair sharing at least
    one word-``k``-shingle, containment(a in b) = |Sa ∩ Sb| / |Sa|
    over DISTINCT shingle sets; pairs where either direction reaches
    ``threshold`` are reported as (doc_a, doc_b, n_common,
    cont_a_in_b, cont_b_in_a), doc_a < doc_b.

    100-TB shape: an inverted shingle index, never all-pairs — each
    doc emits (shingle_hash64, doc_id, n_shingles) rows block-local
    (the per-doc distinct count rides WITH the row, so no join is
    ever needed); pair expansion runs per shingle group inside
    :func:`_per_key_groups` coarse buckets, quadratic only in the
    docs sharing ONE shingle, with groups above ``max_group`` docs
    (stop-word-only shingles, boilerplate) dropped by the standard
    hot-shingle guard; ONE groupby-sum then yields n_common per pair.
    Thresholding is on the exact double ratio in both engines; only
    output columns round (1e-6)."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import content_hash64, shingles

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def index_rows(t: pa.Table) -> pa.Table:
        hs, ids, ns = [], [], []
        for i, txt in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            s = shingles(txt, k)
            for sh in s:
                hs.append(content_hash64(sh))
                ids.append(i)
                ns.append(len(s))
        return pa.table({'h': pa.array(hs, pa.int64()),
                         'doc_id': pa.array(ids, pa.int64()),
                         'n_sh': pa.array(ns, pa.int64())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values('doc_id')
        ids = g['doc_id'].to_numpy()
        ns = g['n_sh'].to_numpy()
        m = len(ids)
        if m < 2 or m > max_group:
            return pd.DataFrame({'doc_a': pd.Series([], dtype='int64'),
                                 'doc_b': pd.Series([], dtype='int64'),
                                 'na': pd.Series([], dtype='int64'),
                                 'nb': pd.Series([], dtype='int64'),
                                 'one': pd.Series([], dtype='int64')})
        ii, jj = np.triu_indices(m, 1)
        return pd.DataFrame({'doc_a': ids[ii], 'doc_b': ids[jj],
                             'na': ns[ii], 'nb': ns[jj],
                             'one': np.ones(len(ii), dtype='int64')})

    pair_counts = (_per_key_groups(
        ds.map_batches(index_rows, batch_format='pyarrow'), 'h', pairs)
        .groupby(['doc_a', 'doc_b', 'na', 'nb'])
        .aggregate(Sum('one', alias_name='n_common')))

    def fin(t: pa.Table) -> pa.Table:
        nc = t.column('n_common').to_numpy(
            zero_copy_only=False).astype(np.float64)
        na = t.column('na').to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t.column('nb').to_numpy(zero_copy_only=False).astype(np.float64)
        ca, cb = nc / na, nc / nb
        keep = np.maximum(ca, cb) >= threshold
        out = pa.table({
            'doc_a': pc.cast(t['doc_a'], pa.int64()),
            'doc_b': pc.cast(t['doc_b'], pa.int64()),
            'n_common': pc.cast(t['n_common'], pa.int64()),
            'cont_a_in_b': pa.array(ca, pa.float64()),
            'cont_b_in_a': pa.array(cb, pa.float64())}).filter(
                pa.array(keep))
        out = _snap_round(out, 'cont_a_in_b', 6)
        return _snap_round(out, 'cont_b_in_a', 6)

    return pair_counts.map_batches(fin, batch_format='pyarrow')


def source_lang_mix(sf_dir: str):
    """Per-source language mix — the curation dashboard's "is this
    host multilingual / mislabeled" signal: one row per (source,
    lang) with the doc count and its fraction of the source's docs.

    100-TB shape: per-batch (source, lang) count partials (combiner),
    ONE groupby-sum over the tiny source×lang domain, then per-source
    totals fold inside the same answer-sized table — no second
    shuffle (the group count is answer-scale by construction)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'documents', ['source', 'lang'])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter(zip(t.column('source').to_pylist(),
                                 t.column('lang').to_pylist()))
        ks = list(c.keys())
        return pa.table({
            'source': pa.array([x[0] for x in ks], pa.string()),
            'lang': pa.array([x[1] for x in ks], pa.string()),
            'n': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby(['source', 'lang'])
              .aggregate(Sum('n', alias_name='n_docs'))
              .take_all())  # source×lang domain — answer-sized

    tot: dict = {}
    for r in counts:
        tot[r['source']] = tot.get(r['source'], 0) + r['n_docs']
    out = pa.table({
        'source': pa.array([r['source'] for r in counts], pa.string()),
        'lang': pa.array([r['lang'] for r in counts], pa.string()),
        'n_docs': pa.array([int(r['n_docs']) for r in counts], pa.int64()),
        'frac': pa.array([r['n_docs'] / tot[r['source']]
                          for r in counts], pa.float64())})
    return _snap_round(out, 'frac', 6)


def url_template_mining(sf_dir: str):
    """URL template mining over the extracted link graph — the
    crawler-trap / site-structure signal: collapse every digit run in
    a url to ``N`` and count DISTINCT urls per template.  A template
    whose distinct-url count explodes (calendar pages, session ids,
    infinite pagination) is a trap to cap in the frontier; the
    companion signal to :func:`crawl_budget_alloc`.

    100-TB shape: links extract block-local with the real kernels
    (xpath + canonicalization); only (template, url_hash64) pairs
    shuffle — ONE groupby makes them distinct, then per-batch
    template Counter partials → ONE groupby-sum over the tiny
    template domain.  Url strings never enter a shuffle."""
    import re

    from ray.data.aggregate import Count, Sum

    from ..stages.dedup import md5_hash64

    digit_re = re.compile(r'\d+')
    eds = _pagerank_edges(sf_dir)

    def tpl_rows(t: pa.Table) -> pa.Table:
        seen = set()
        for u in t.column('dst').to_pylist():
            seen.add((digit_re.sub('N', u), md5_hash64(u)))
        return pa.table({
            'template': pa.array([p[0] for p in seen], pa.string()),
            'uh': pa.array([p[1] for p in seen], pa.int64())})

    distinct = (eds.map_batches(tpl_rows, batch_format='pyarrow')
                .groupby(['template', 'uh'])
                .aggregate(Count(alias_name='_n'))
                .select_columns(['template']))

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter(t.column('template').to_pylist())
        return pa.table({
            'template': pa.array(list(c.keys()), pa.string()),
            'n': pa.array(list(c.values()), pa.int64())})

    return (distinct.map_batches(partial, batch_format='pyarrow')
            .groupby('template').aggregate(Sum('n', alias_name='n_urls')))


def reading_ease(sf_dir: str):
    """Per-document Flesch reading-ease score (vowel-group syllable
    heuristic — the deterministic approximation every readability
    library uses without a pronunciation dictionary): FRE = 206.835 −
    1.015·(words/sentences) − 84.6·(syllables/word).  Sentences are
    ``[.!?]+`` runs (min 1); syllables per word are ``[aeiouy]+``
    runs in the lowercased word (min 1).  Empty documents emit
    (0, 0, 0.0) by contract.

    100-TB shape: pure shuffle-free map_batches; regexes compile once
    per process."""
    import re

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    word_re = re.compile(r'\w+', re.UNICODE)
    vowel_re = re.compile(r'[aeiouy]+')
    sent_re = re.compile(r'[.!?]+')

    def score(t: pa.Table) -> pa.Table:
        nw, ns, fre = [], [], []
        for txt in t.column('text').to_pylist():
            words = word_re.findall((txt or '').lower())
            w = len(words)
            if not w:
                nw.append(0)
                ns.append(0)
                fre.append(0.0)
                continue
            s = max(len(sent_re.findall(txt or '')), 1)
            syl = sum(max(len(vowel_re.findall(x)), 1) for x in words)
            nw.append(w)
            ns.append(s)
            fre.append(206.835 - 1.015 * (w / float(s))
                       - 84.6 * (syl / float(w)))
        out = pa.table({'doc_id': pc.cast(t['doc_id'], pa.int64()),
                        'n_words': pa.array(nw, pa.int64()),
                        'n_sentences': pa.array(ns, pa.int64()),
                        'fre': pa.array(fre, pa.float64())})
        return _snap_round(out, 'fre', 6)

    return ds.map_batches(score, batch_format='pyarrow')


def events_funnel(sf_dir: str):
    """Ordered funnel analysis — the sequential-pattern op the window
    family lacks: per user, how far through view → click → purchase
    the event stream progresses, each stage requiring a STRICTLY
    later timestamp than the previous stage's first completion.
    Returns (user_id, funnel_stage) with stage ∈ 0..3 (0 = no view).

    100-TB shape: per-user ordered scan inside
    :func:`_per_key_groups` coarse buckets (64 group-applies, not
    O(users)); only (user_id, ts, event_type, event_id) rows shuffle.
    The SQL oracle mirrors the strict-inequality chain with nested
    min-after-min subqueries."""
    ds = _read(sf_dir, 'events',
               ['user_id', 'ts', 'event_type', 'event_id'])

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        stage = 0
        last_ts = None
        for want in ('view', 'click', 'purchase'):
            sub = g[g['event_type'] == want]
            if last_ts is not None:
                sub = sub[sub['ts'] > last_ts]
            if sub.empty:
                break
            last_ts = sub['ts'].iloc[0]
            stage += 1
        return pd.DataFrame({'user_id': [g['user_id'].iloc[0]],
                             'funnel_stage': pd.array([stage],
                                                      dtype='int64')})

    return _per_key_groups(ds, 'user_id', run)


def hard_negatives(sf_dir: str):
    """Contrastive-pair mining over the embeddings table: for every
    vector the most-similar same-label neighbor (positive) and
    most-similar different-label neighbor (hard negative) — the
    triplet-mining step of contrastive training.  (vec_id, pos_id,
    neg_id); -1 for a memberless class.

    100-TB shape: ALWAYS the blocked-exact tier
    (:func:`~webscraping_ray.stages.similarity.hard_negatives_blocked`)
    — corpus chunked into object-store refs built by Ray tasks (never
    driver-concatenated), query side streams once folding a running
    argmax across chunks.  No broadcast gate: below one chunk the
    blocked tier degenerates to the brute broadcast shape; above it,
    memory stays bounded at (batch × chunk).  Exact (not IVF-
    approximate), so the DuckDB oracle holds at every scale."""
    from ..stages.similarity import hard_negatives_blocked

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding', 'label'])
    return hard_negatives_blocked(ds)


def rollup_source_lang(sf_dir: str):
    """ROLLUP / grouping-sets aggregate — the multi-level curation
    report (per source+lang, per source, grand total) emitted in one
    pass: doc count and total chars at each rollup level, with the
    standard GROUPING() bitmask (0 = detail, 1 = per-source subtotal,
    3 = grand total) and ``'ALL'`` filling the rolled-up key.

    100-TB shape: per-batch finest-level (source, lang) partials
    (combiner — counts and char sums, no text), ONE groupby-sum over
    the tiny source×lang domain; every coarser level folds from that
    answer-sized table on the driver.  One shuffle total, identical
    to the plain grouped aggregate — the rollup itself is free."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'documents', ['source', 'lang', 'n_chars'])

    def partial(t: pa.Table) -> pa.Table:
        src = t.column('source').to_pylist()
        lng = t.column('lang').to_pylist()
        ch = t.column('n_chars').to_pylist()
        n: Counter = Counter()
        s: Counter = Counter()
        for a, b, c in zip(src, lng, ch):
            n[(a, b)] += 1
            s[(a, b)] += c
        ks = list(n.keys())
        return pa.table({
            'source': pa.array([k[0] for k in ks], pa.string()),
            'lang': pa.array([k[1] for k in ks], pa.string()),
            'n': pa.array([n[k] for k in ks], pa.int64()),
            'ch': pa.array([s[k] for k in ks], pa.int64())})

    detail = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby(['source', 'lang'])
              .aggregate(Sum('n', alias_name='n'),
                         Sum('ch', alias_name='ch'))
              .take_all())  # source×lang domain — answer-sized

    rows = []
    per_src: dict = {}
    tot_n = tot_ch = 0
    for r in detail:
        rows.append((r['source'], r['lang'], 0, int(r['n']), int(r['ch'])))
        pn, pc = per_src.get(r['source'], (0, 0))
        per_src[r['source']] = (pn + int(r['n']), pc + int(r['ch']))
        tot_n += int(r['n'])
        tot_ch += int(r['ch'])
    for src, (pn, pc) in per_src.items():
        rows.append((src, 'ALL', 1, pn, pc))
    rows.append(('ALL', 'ALL', 3, tot_n, tot_ch))
    return pa.table({
        'source': pa.array([r[0] for r in rows], pa.string()),
        'lang': pa.array([r[1] for r in rows], pa.string()),
        'lvl': pa.array([r[2] for r in rows], pa.int64()),
        'n_docs': pa.array([r[3] for r in rows], pa.int64()),
        'n_chars': pa.array([r[4] for r in rows], pa.int64())})


def unigram_entropy(sf_dir: str):
    """Corpus unigram Shannon entropy (bits/token), vocab size and
    total token count — the single-row language-health scalar next to
    :func:`zipf_slope` (a template-flooded or deduplicated-to-death
    corpus shows as an entropy shift long before eyeballing samples).

    100-TB shape: per-batch token-count partials → ONE groupby-sum to
    merge per-token counts (vocab-sized shuffle, same as
    :func:`unigram_logprob`), then a second (tiny) groupby collapses
    the vocab to its COUNT HISTOGRAM (count value → #types, O(√N)
    distinct frequencies under Zipf) which lands on the driver at
    answer size.  The Σc·ln c fold is summation-ORDER-INSENSITIVE by
    construction: each histogram term m·c·ln c is quantized to exact
    integer micro-units (floor(x·1e6 + 0.5) — identical doubles on
    both engines, libm ln verified bitwise-equal to DuckDB ln) and
    the micros are summed as exact integers, so block order can never
    flip a rounding boundary.  H = (ln N − Σc·ln c / N) / ln 2."""
    import math
    from collections import Counter

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text'])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t.column('text').to_pylist():
            c.update(_TOKEN_RE.findall((txt or '').lower()))
        return pa.table({'w': pa.array(list(c.keys()), pa.string()),
                         'c': pa.array(list(c.values()), pa.int64())})

    vocab = (ds.map_batches(partial, batch_format='pyarrow')
             .groupby('w').aggregate(Sum('c', alias_name='c')))

    def hist_partial(t: pa.Table) -> pa.Table:
        # groupby outputs can carry schemaless empty blocks (Ray 2.49)
        if t.num_rows == 0 or 'c' not in t.schema.names:
            return pa.table({'c': pa.array([], pa.int64()),
                             'm': pa.array([], pa.int64())})
        c = t.column('c').to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(c, return_counts=True)
        return pa.table({'c': pa.array(vals.astype(np.int64)),
                         'm': pa.array(cnts.astype(np.int64))})

    # distinct-frequency histogram: answer-sized (O(√N) rows by Zipf)
    hist = (vocab.map_batches(hist_partial, batch_format='pyarrow')
            .groupby('c').aggregate(Sum('m', alias_name='m'))
            .take_all())
    n = 0
    n_types = 0
    clnc_u = 0  # exact integer micro-units; Python int — no overflow
    for r in hist:
        c, m = int(r['c']), int(r['m'])
        n += m * c
        n_types += m
        if c > 1:
            # identical op order to the SQL oracle:
            # floor(m*c*ln(c) * 1e6 + 0.5)
            clnc_u += int(math.floor(
                float(m) * float(c) * math.log(float(c)) * 1e6 + 0.5))
    if n == 0:
        ent = 0.0
    else:
        ent = ((math.log(float(n)) - (float(clnc_u) / 1e6) / float(n))
               / math.log(2.0))
    out = pa.table({'n_tokens': pa.array([n], pa.int64()),
                    'vocab_size': pa.array([n_types], pa.int64()),
                    'entropy_bits': pa.array([ent], pa.float64())})
    return _snap_round(out, 'entropy_bits', 6)


def events_daily_change(sf_dir: str):
    """Daily event volume with day-over-day percent change (LAG) —
    the traffic-anomaly time series a crawl/ingest operator watches.
    Returns (day, n_events, pct_change); the first day's change is
    NULL by the standard LAG contract.

    100-TB shape: per-batch (day, count) partials → ONE groupby-sum
    over the answer-sized day domain; the LAG fold runs on the driver
    over that table.  pct_change divides exact integer counts, so
    both engines round the same double (1e-6 snap)."""
    from collections import Counter

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['ts'])

    def partial(t: pa.Table) -> pa.Table:
        days = pc.strftime(t.column('ts'), format='%Y-%m-%d').to_pylist()
        c: Counter = Counter(days)
        return pa.table({'day': pa.array(list(c.keys()), pa.string()),
                         'n': pa.array(list(c.values()), pa.int64())})

    per_day = (ds.map_batches(partial, batch_format='pyarrow')
               .groupby('day').aggregate(Sum('n', alias_name='n'))
               .take_all())  # day domain — answer-sized
    per_day.sort(key=lambda r: r['day'])
    days = [r['day'] for r in per_day]
    ns = [int(r['n']) for r in per_day]
    chg = [None] + [(ns[i] - ns[i - 1]) / ns[i - 1]
                    for i in range(1, len(ns))]
    out = pa.table({'day': pa.array(days, pa.string()),
                    'n_events': pa.array(ns, pa.int64()),
                    'pct_change': pa.array(chg, pa.float64())})
    return _snap_round(out, 'pct_change', 6)


def feature_correlations(sf_dir: str):
    """Pearson correlation matrix between per-doc quality features
    (n_chars, n_tokens, n_types) — the feature-redundancy check run
    before fitting any quality classifier on corpus statistics.
    Returns one row per unordered feature pair (feat_a < feat_b).

    100-TB shape: features compute block-local; each batch emits ONE
    moment row (n, Σx, Σx², Σxy as int64 — exact) and a Dataset
    aggregate folds them; nothing but 10 integers per block ever
    moves.  Both engines evaluate the identical closed form on
    identical exact integer moments, so the rounded doubles match
    bit-for-bit."""
    import math

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    ds = _read(sf_dir, 'documents', ['text', 'n_chars'])

    def moments(t: pa.Table) -> pa.Table:
        c = t.column('n_chars').to_numpy(zero_copy_only=False).astype(object)
        toks = [_TOKEN_RE.findall((txt or '').lower())
                for txt in t.column('text').to_pylist()]
        tn = np.array([len(ts) for ts in toks], dtype=object)
        ty = np.array([len(set(ts)) for ts in toks], dtype=object)
        cols = {'n': len(toks),
                'sc': int((c).sum()), 'st': int(tn.sum()), 'sy': int(ty.sum()),
                'scc': int((c * c).sum()), 'stt': int((tn * tn).sum()),
                'syy': int((ty * ty).sum()), 'sct': int((c * tn).sum()),
                'scy': int((c * ty).sum()), 'sty': int((tn * ty).sum())}
        return pa.table({k: pa.array([v], pa.int64())
                         for k, v in cols.items()})

    m = (ds.map_batches(moments, batch_format='pyarrow')
         .aggregate(*[Sum(k) for k in
                      ('n', 'sc', 'st', 'sy', 'scc', 'stt', 'syy',
                       'sct', 'scy', 'sty')]))
    v = {k: int(m[f'sum({k})']) for k in
         ('n', 'sc', 'st', 'sy', 'scc', 'stt', 'syy', 'sct', 'scy', 'sty')}

    def corr(sxy, sx, sy, sxx, syy):
        # exact int arithmetic, ONE int→double conversion per term —
        # mirrors DuckDB's hugeint→double cast in the oracle
        num = float(v['n'] * sxy - sx * sy)
        den = math.sqrt(float((v['n'] * sxx - sx * sx)
                              * (v['n'] * syy - sy * sy)))
        return num / den if den else 0.0

    rows = [('chars', 'tokens',
             corr(v['sct'], v['sc'], v['st'], v['scc'], v['stt'])),
            ('chars', 'types',
             corr(v['scy'], v['sc'], v['sy'], v['scc'], v['syy'])),
            ('tokens', 'types',
             corr(v['sty'], v['st'], v['sy'], v['stt'], v['syy']))]
    out = pa.table({'feat_a': pa.array([r[0] for r in rows], pa.string()),
                    'feat_b': pa.array([r[1] for r in rows], pa.string()),
                    'corr': pa.array([r[2] for r in rows], pa.float64())})
    return _snap_round(out, 'corr', 6)


def anchor_texts(sf_dir: str):
    """Anchor-text collection over the derived link graph — the
    aggregation behind anchor-text training sets and link-context
    retrieval: for every link TARGET url, the sorted distinct anchor
    texts pointing at it ('|'-joined) and the total reference count.
    Runs the real xpath kernels (``get_anchor_pairs`` — the
    zip-of-searches pairing the reference uses for forms), with each
    target canonicalized by the crawl's ``normalize_url`` (urldefrag →
    unescape → urljoin — reference download.py:987-1004), exactly like
    links on the crawl path.

    100-TB shape: (dst, anchor) extract block-local; only those two
    short strings shuffle (never html); the per-target fold runs per
    key inside :func:`_per_key_groups` coarse buckets (64 group
    applies, not O(urls))."""
    from ..kernels import urls as U
    from ..kernels import xpath as X
    from ..kernels.text import html_to_unicode

    pages, _ = _derived_pages(sf_dir)

    def pairs(t: pa.Table) -> pa.Table:
        dst, anc = [], []
        for u, h in zip(t.column('url').to_pylist(),
                        t.column('html').to_pylist()):
            for link, txt in X.get_anchor_pairs(html_to_unicode(h), u):
                dst.append(U.normalize_url(u, link))
                anc.append(txt)
        return pa.table({'url': pa.array(dst, pa.string()),
                         'anchor': pa.array(anc, pa.string())})

    ds = pages.map_batches(pairs, batch_format='pyarrow')

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            'url': [g['url'].iloc[0]],
            'anchors': ['|'.join(sorted(set(g['anchor'])))],
            'n_refs': pd.array([len(g)], dtype='int64')})

    return _per_key_groups(ds, 'url', fold)


def crawl_status_by_host(sf_dir: str, max_depth: int = 6):
    """Per-host HTTP status report over the flagship crawl — the
    health dashboard a crawl operator reads first (which hosts 404,
    which deliver).  Runs :func:`crawl_documents` end to end, then
    groups the answer-sized visits table by (host, status)."""
    v = crawl_documents(sf_dir, max_depth=max_depth).to_pandas()
    host = v['url'].str.extract(r'https?://([^/]+)', expand=False)
    g = (pd.DataFrame({'host': host, 'status': v['status']})
         .groupby(['host', 'status'], as_index=False).size())
    return pa.table({'host': pa.array(g['host'], pa.string()),
                     'status': pa.array(g['status'].astype('int64')),
                     'n_visits': pa.array(g['size'].astype('int64'))})


def weekly_top_events(sf_dir: str, k: int = 3):
    """Top-k event types per ISO week (Monday-truncated) — the
    trending report over the event stream, with the deterministic
    (count desc, type asc) tie order.  Returns (week, event_type,
    n_events, rk).

    100-TB shape: per-batch (week, type) count partials → ONE
    groupby-sum over the answer-sized week×type domain; the per-week
    top-k folds from that table on the driver."""
    from collections import Counter

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['ts', 'event_type'])

    def partial(t: pa.Table) -> pa.Table:
        wk = pc.strftime(
            pc.floor_temporal(t.column('ts'), unit='week',
                              week_starts_monday=True),
            format='%Y-%m-%d').to_pylist()
        c: Counter = Counter(zip(wk, t.column('event_type').to_pylist()))
        ks = list(c.keys())
        return pa.table({
            'week': pa.array([x[0] for x in ks], pa.string()),
            'event_type': pa.array([x[1] for x in ks], pa.string()),
            'n': pa.array(list(c.values()), pa.int64())})

    counts = (ds.map_batches(partial, batch_format='pyarrow')
              .groupby(['week', 'event_type'])
              .aggregate(Sum('n', alias_name='n'))
              .take_all())  # week×type domain — answer-sized

    by_week: dict = {}
    for r in counts:
        by_week.setdefault(r['week'], []).append(
            (int(r['n']), r['event_type']))
    rows = []
    for wk in sorted(by_week):
        ranked = sorted(by_week[wk], key=lambda x: (-x[0], x[1]))[:k]
        for i, (n, et) in enumerate(ranked):
            rows.append((wk, et, n, i + 1))
    return pa.table({
        'week': pa.array([r[0] for r in rows], pa.string()),
        'event_type': pa.array([r[1] for r in rows], pa.string()),
        'n_events': pa.array([r[2] for r in rows], pa.int64()),
        'rk': pa.array([r[3] for r in rows], pa.int64())})


def pricing_summary(sf_dir: str, cutoff: str = '1998-09-02'):
    """Grouped pricing summary in the classic TPC-H Q1 shape over
    lineitem (ship-date predicate → grouped sums / averages / count)
    — the canonical scan-heavy reporting aggregate.

    Money columns are fixed-decimal (price 2dp, discount/tax 2dp,
    integral quantity), so everything folds in EXACT integer cents /
    basis points — summation-order fp drift (which flips a 2dp
    rounding boundary on ~1-in-1e7 sums) cannot occur, and both
    engines divide identical integers at the end.  (At ≳10^9 rows the
    1e-6-unit charge sum approaches int64 range; the scale path is
    the same partials with a 128-bit or split fold.)

    100-TB shape: the predicate and the derived expressions evaluate
    block-local; each batch emits ONE partial row per (returnflag,
    linestatus) — a closed 6-ish domain — and ONE groupby-sum folds
    them; averages derive from the folded sums.  No row-level data
    ever shuffles."""
    from ray.data.aggregate import Sum

    cut = np.datetime64(cutoff)
    ds = _read(sf_dir, 'lineitem',
               ['l_returnflag', 'l_linestatus', 'l_quantity',
                'l_extendedprice', 'l_discount', 'l_tax', 'l_shipdate'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df['l_shipdate'] <= cut]
        q = np.floor(df['l_quantity'].to_numpy() + 0.5).astype(np.int64)
        pc = np.floor(df['l_extendedprice'].to_numpy() * 100
                      + 0.5).astype(np.int64)
        db = np.floor(df['l_discount'].to_numpy() * 100
                      + 0.5).astype(np.int64)
        tb = np.floor(df['l_tax'].to_numpy() * 100 + 0.5).astype(np.int64)
        g = (pd.DataFrame({'l_returnflag': df['l_returnflag'].to_numpy(),
                           'l_linestatus': df['l_linestatus'].to_numpy(),
                           'q': q, 'pc': pc,
                           'dp': pc * (100 - db),
                           'ch': pc * (100 - db) * (100 + tb),
                           'db': db, 'n': 1})
             .groupby(['l_returnflag', 'l_linestatus'], as_index=False)
             .sum())
        return g

    agg = (ds.map_batches(partial, batch_format='pandas')
           .groupby(['l_returnflag', 'l_linestatus'])
           .aggregate(*[Sum(c, alias_name=c) for c in
                        ('q', 'pc', 'dp', 'ch', 'db', 'n')])
           .take_all())  # flag×status domain — answer-sized

    cols: dict = {k: [] for k in
                  ('l_returnflag', 'l_linestatus', 'sum_qty',
                   'sum_base_price', 'sum_disc_price', 'sum_charge',
                   'avg_qty', 'avg_price', 'avg_disc', 'cnt_order')}
    for r in agg:
        n = int(r['n'])
        cols['l_returnflag'].append(r['l_returnflag'])
        cols['l_linestatus'].append(r['l_linestatus'])
        cols['sum_qty'].append(float(int(r['q'])))
        cols['sum_base_price'].append(float(int(r['pc'])) / 100)
        cols['sum_disc_price'].append(float(int(r['dp'])) / 10000)
        cols['sum_charge'].append(float(int(r['ch'])) / 1000000)
        cols['avg_qty'].append(float(int(r['q'])) / n)
        cols['avg_price'].append(float(int(r['pc'])) / (100 * n))
        cols['avg_disc'].append(float(int(r['db'])) / (100 * n))
        cols['cnt_order'].append(n)
    out = pa.table({
        'l_returnflag': pa.array(cols['l_returnflag'], pa.string()),
        'l_linestatus': pa.array(cols['l_linestatus'], pa.string()),
        'sum_qty': pa.array(cols['sum_qty'], pa.float64()),
        'sum_base_price': pa.array(cols['sum_base_price'], pa.float64()),
        'sum_disc_price': pa.array(cols['sum_disc_price'], pa.float64()),
        'sum_charge': pa.array(cols['sum_charge'], pa.float64()),
        'avg_qty': pa.array(cols['avg_qty'], pa.float64()),
        'avg_price': pa.array(cols['avg_price'], pa.float64()),
        'avg_disc': pa.array(cols['avg_disc'], pa.float64()),
        'cnt_order': pa.array(cols['cnt_order'], pa.int64())})
    # sums round at their unit's EXACT decimal width (qty 0dp-int,
    # base 2dp, disc_price 4dp, charge 6dp): rounding just recovers
    # the exact integer, so a half-tie can never occur
    for c, nd in (('sum_qty', 2), ('sum_base_price', 2),
                  ('sum_disc_price', 4), ('sum_charge', 6),
                  ('avg_qty', 6), ('avg_price', 6), ('avg_disc', 6)):
        out = _snap_round(out, c, nd)
    return out


def _quantize_embedding(arr: np.ndarray) -> np.ndarray:
    """floor(x·1000 + 0.5) per element — the explicit half-up rule both
    engines evaluate identically (no round-half-even ambiguity)."""
    return np.floor(arr.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)


def kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 2):
    """Distributed Lloyd k-means over the embeddings table with
    QUANTIZED-EXACT arithmetic: vectors quantize to int64 (floor(x·1000
    + 0.5)), centroids stay int64 (half-up of the exact mean), so every
    distance comparison is exact integer math and both engines assign
    identically — the k-means that can be SQL-oracled without float
    hand-waving.  Init = the ``k`` lowest vec_ids; ``iters`` full
    assign+update rounds, then a final assignment pass.  Ties go to
    the lowest cluster id; an emptied cluster keeps its centroid.

    100-TB shape: centroids (k×d int64, a few KB) broadcast via
    ray.put each round; each batch emits per-cluster partial sums
    (≤ k rows × d cols) folded by ONE groupby-sum; driver state is the
    k×d centroid table — answer-sized.  The classic scalable k-means
    layout (combiner partials, never a row-level shuffle)."""
    from ray.data.aggregate import Sum

    import ray

    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    init = ds.sort('vec_id').limit(k).take_all()
    dim = len(init[0]['embedding'])
    cent = np.stack([_quantize_embedding(np.asarray(r['embedding']))
                     for r in init])  # k×d int64

    scols = [f's{i:02d}' for i in range(dim)]

    def assign(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # exact int64 squared distances; argmin takes the first
        # (lowest cluster id) on ties
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d, axis=1)

    for _ in range(iters):
        cref = ray.put(cent)

        def partials(t: pa.Table) -> pa.Table:
            c = ray.get(cref)
            q = np.stack([_quantize_embedding(np.asarray(v)) for v in
                          t.column('embedding').to_pylist()])
            a = assign(q, c)
            out = {'cluster': [], 'n': []}
            out.update({s: [] for s in scols})
            for j in np.unique(a):
                sel = q[a == j]
                out['cluster'].append(int(j))
                out['n'].append(int(sel.shape[0]))
                s = sel.sum(axis=0)
                for i, sc in enumerate(scols):
                    out[sc].append(int(s[i]))
            return pa.table({kk: pa.array(vv, pa.int64())
                             for kk, vv in out.items()})

        folded = (ds.map_batches(partials, batch_format='pyarrow')
                  .groupby('cluster')
                  .aggregate(Sum('n', alias_name='n'),
                             *[Sum(s, alias_name=s) for s in scols])
                  .take_all())  # k rows — answer-sized
        new = cent.copy()
        for r in folded:
            j = int(r['cluster'])
            n = int(r['n'])
            new[j] = np.floor(
                np.array([int(r[s]) for s in scols], dtype=np.float64)
                / n + 0.5).astype(np.int64)
        cent = new

    cref = ray.put(cent)

    def final(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        q = np.stack([_quantize_embedding(np.asarray(v)) for v in
                      t.column('embedding').to_pylist()])
        return pa.table({'vec_id': t.column('vec_id'),
                         'cluster': pa.array(assign(q, c), pa.int64())})

    return ds.map_batches(final, batch_format='pyarrow')


def neardup_rate_by_source(sf_dir: str, threshold: float = 0.8):
    """Per-source NEAR-duplication report: for every source, the
    fraction of its docs that appear in at least one MinHash-verified
    Jaccard ≥ ``threshold`` pair — the "which hosts are pumping
    templated copies" dashboard a curation run reads before allocating
    crawl budget.  Returns (source, n_docs, n_dup, dup_frac).

    100-TB shape: the pair list comes from the banded-LSH
    :func:`minhash_dups` path (parquet-scratch bands, tiered verify)
    and is answer-sized by the dup-pair contract; the flattened id set
    broadcasts once (ray.put) into a per-batch membership partial, and
    per-source (n_docs, n_dup) counts fold combiner-style over the
    answer-sized source domain — ONE groupby-sum, no row-level
    shuffle.  (If the pair list itself outgrew broadcast, the
    :func:`dup_keep_best` Dataset-join tier is the documented scale
    path.)"""
    from collections import Counter

    import ray
    from ray.data.aggregate import Sum

    from ..stages.dedup import minhash_dup_pairs

    pairs = minhash_dup_pairs(_read(sf_dir, 'documents',
                                    ['doc_id', 'text']),
                              threshold=threshold)
    dup_ids = set(pairs.column('id_a').to_pylist()) | set(
        pairs.column('id_b').to_pylist())
    dref = ray.put(dup_ids)

    docs = _read(sf_dir, 'documents', ['doc_id', 'source'])

    def src_partial(t: pa.Table) -> pa.Table:
        dup = ray.get(dref)
        n: Counter = Counter()
        d: Counter = Counter()
        for i, s in zip(t.column('doc_id').to_pylist(),
                        t.column('source').to_pylist()):
            n[s] += 1
            if i in dup:
                d[s] += 1
        ks = list(n.keys())
        return pa.table({'source': pa.array(ks, pa.string()),
                         'n': pa.array([n[s] for s in ks], pa.int64()),
                         'nd': pa.array([d[s] for s in ks], pa.int64())})

    folded = (docs.map_batches(src_partial, batch_format='pyarrow')
              .groupby('source')
              .aggregate(Sum('n', alias_name='n'),
                         Sum('nd', alias_name='nd'))
              .take_all())  # source domain — answer-sized
    totals = {r['source']: int(r['n']) for r in folded}
    dups = {r['source']: int(r['nd']) for r in folded}

    srcs = sorted(totals)
    out = pa.table({
        'source': pa.array(srcs, pa.string()),
        'n_docs': pa.array([totals[s] for s in srcs], pa.int64()),
        'n_dup': pa.array([dups.get(s, 0) for s in srcs], pa.int64()),
        'dup_frac': pa.array([dups.get(s, 0) / totals[s] for s in srcs],
                             pa.float64())})
    return _snap_round(out, 'dup_frac', 6)


def _money_cents(df: pd.DataFrame) -> np.ndarray:
    """Exact int64 revenue in 1e-4 dollars: cents(price)·(100−bp(disc))
    — the drift-proof money fold shared by the star-join reports (see
    :func:`pricing_summary` for the fixed-decimal rationale)."""
    pc_ = np.floor(df['l_extendedprice'].to_numpy() * 100
                   + 0.5).astype(np.int64)
    db = np.floor(df['l_discount'].to_numpy() * 100 + 0.5).astype(np.int64)
    return pc_ * (100 - db)


def revenue_by_nation(sf_dir: str):
    """TPC-H Q5-flavor star join: revenue per (region, nation) —
    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.  Returns
    (r_name, n_name, revenue, n_items) with revenue folded in exact
    int64 1e-4-dollar units (no summation drift; see
    :func:`pricing_summary`).

    100-TB shape: the two BIG⋈BIG edges (orders⋈customer,
    lineitem⋈orders) run as partitioned ``Dataset.join``s — both
    sides corpus-scale, one hash shuffle each on the shared orderkey;
    the join chain is ``_join_safe``-guarded (Ray 2.49 schemaless
    empty blocks).  nation/region (25/5 rows) never shuffle: they
    apply as a driver-side map on the 25-row folded answer.  Each
    joined batch emits per-nationkey partials (combiner), ONE
    groupby-sum folds them."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _join_safe

    li = _read(sf_dir, 'lineitem',
               ['l_orderkey', 'l_extendedprice', 'l_discount'])
    orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_custkey'])
    cust = _read(sf_dir, 'customer', ['c_custkey', 'c_nationkey'])
    oc = orders.join(_join_safe(cust, 8), 'inner', num_partitions=8,
                     on=('o_custkey',), right_on=('c_custkey',))
    j = li.join(_join_safe(oc.select_columns(['o_orderkey',
                                              'c_nationkey']), 8),
                'inner', num_partitions=8,
                on=('l_orderkey',), right_on=('o_orderkey',))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({'nk': df['c_nationkey'].to_numpy(),
                              'rev': _money_cents(df), 'n': 1})
                .groupby('nk', as_index=False).sum())

    folded = (j.map_batches(partial, batch_format='pandas')
              .groupby('nk')
              .aggregate(Sum('rev', alias_name='rev'),
                         Sum('n', alias_name='n'))
              .take_all())  # nation domain — answer-sized (≤25)

    import pyarrow.parquet as pq

    nat = pq.read_table(f'{sf_dir}/nation.parquet').to_pandas()
    reg = pq.read_table(f'{sf_dir}/region.parquet').to_pandas()
    nmap = nat.set_index('n_nationkey')['n_name'].to_dict()
    rmap = (nat.set_index('n_nationkey')['n_regionkey']
            .map(reg.set_index('r_regionkey')['r_name']).to_dict())
    out = pa.table({
        'r_name': pa.array([rmap[int(r['nk'])] for r in folded],
                           pa.string()),
        'n_name': pa.array([nmap[int(r['nk'])] for r in folded],
                           pa.string()),
        'revenue': pa.array([float(int(r['rev'])) / 10000
                             for r in folded], pa.float64()),
        'n_items': pa.array([int(r['n']) for r in folded], pa.int64())})
    return _snap_round(out, 'revenue', 4)


def brand_volume(sf_dir: str):
    """Sales volume per part brand — lineitem ⋈ part with the
    BROADCAST-dim pattern (contrast :func:`revenue_by_nation`'s
    partitioned joins): the partkey→brand map ships once via ray.put
    and applies inside every batch; only per-brand partials shuffle.
    Returns (p_brand, n_items, sum_qty, revenue) — qty/revenue exact
    int64 folds.

    100-TB shape: part is the classic mid-size dim — broadcast below
    ~10^8 keys, partitioned join above (the :func:`revenue_by_nation`
    machinery); the broadcast tier shown here is the default for the
    2-3 GB dictionary a real part table compresses to."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(f'{sf_dir}/part.parquet',
                         columns=['p_partkey', 'p_brand'])
    bmap = dict(zip(part.column('p_partkey').to_pylist(),
                    part.column('p_brand').to_pylist()))
    bref = ray.put(bmap)

    li = _read(sf_dir, 'lineitem',
               ['l_partkey', 'l_quantity', 'l_extendedprice',
                'l_discount'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(bref)
        q = np.floor(df['l_quantity'].to_numpy() + 0.5).astype(np.int64)
        return (pd.DataFrame({
            'p_brand': [m[k] for k in df['l_partkey'].to_numpy()],
            'q': q, 'rev': _money_cents(df), 'n': 1})
            .groupby('p_brand', as_index=False).sum())

    folded = (li.map_batches(partial, batch_format='pandas')
              .groupby('p_brand')
              .aggregate(Sum('n', alias_name='n'),
                         Sum('q', alias_name='q'),
                         Sum('rev', alias_name='rev'))
              .take_all())  # brand domain — answer-sized
    out = pa.table({
        'p_brand': pa.array([r['p_brand'] for r in folded], pa.string()),
        'n_items': pa.array([int(r['n']) for r in folded], pa.int64()),
        'sum_qty': pa.array([int(r['q']) for r in folded], pa.int64()),
        'revenue': pa.array([float(int(r['rev'])) / 10000
                             for r in folded], pa.float64())})
    return _snap_round(out, 'revenue', 4)


def supplier_nation_revenue(sf_dir: str):
    """Revenue attributed to each SUPPLIER nation — lineitem ⋈
    supplier ⋈ nation with both dims broadcast (supplier is the small
    side of the TPC-H star).  Returns (n_name, n_suppliers, revenue);
    revenue exact int64 fold.

    100-TB shape: the suppkey→nationkey and nationkey→name maps ship
    once via ray.put; only ≤|nation| partial rows per batch shuffle
    into ONE groupby-sum.  n_suppliers counts DISTINCT suppliers with
    ≥1 lineitem via a per-batch set partial folded the same way —
    sets stay bounded by |supplier| (broadcast-tier contract)."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    sup = pq.read_table(f'{sf_dir}/supplier.parquet',
                        columns=['s_suppkey', 's_nationkey'])
    nat = pq.read_table(f'{sf_dir}/nation.parquet',
                        columns=['n_nationkey', 'n_name'])
    smap = dict(zip(sup.column('s_suppkey').to_pylist(),
                    sup.column('s_nationkey').to_pylist()))
    sref = ray.put(smap)

    li = _read(sf_dir, 'lineitem',
               ['l_suppkey', 'l_extendedprice', 'l_discount'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(sref)
        nk = np.array([m[k] for k in df['l_suppkey'].to_numpy()],
                      dtype=np.int64)
        g = (pd.DataFrame({'nk': nk, 'rev': _money_cents(df),
                           'sk': df['l_suppkey'].to_numpy()})
             .groupby('nk', as_index=False)
             .agg(rev=('rev', 'sum'),
                  sks=('sk', lambda s: '|'.join(
                      str(x) for x in sorted(set(s))))))
        return g

    def merge_partial(g: pd.DataFrame) -> pd.DataFrame:
        sks = set()
        for s in g['sks']:
            sks.update(s.split('|'))
        return pd.DataFrame({'nk': [g['nk'].iloc[0]],
                             'rev': pd.array([int(g['rev'].sum())],
                                             dtype='int64'),
                             'n_sup': pd.array([len(sks)],
                                               dtype='int64')})

    folded = (_per_key_groups(
        li.map_batches(partial, batch_format='pandas'), 'nk',
        merge_partial).take_all())  # nation domain — answer-sized

    nmap = dict(zip(nat.column('n_nationkey').to_pylist(),
                    nat.column('n_name').to_pylist()))
    out = pa.table({
        'n_name': pa.array([nmap[int(r['nk'])] for r in folded],
                           pa.string()),
        'n_suppliers': pa.array([int(r['n_sup']) for r in folded],
                                pa.int64()),
        'revenue': pa.array([float(int(r['rev'])) / 10000
                             for r in folded], pa.float64())})
    return _snap_round(out, 'revenue', 4)


def forecast_revenue(sf_dir: str, date_from: str = '1997-01-01',
                     date_to: str = '1998-01-01'):
    """TPC-H Q6-flavor forecast: revenue delta from dropping small
    discounts — ``sum(extendedprice * discount)`` over a one-year
    shipdate window, discount 4–6 bp, quantity < 24.  Returns ONE row
    (revenue, n_items); revenue folds in exact int64 1e-4-dollar units
    (cents × basis points — see :func:`pricing_summary`).

    100-TB shape: the cheapest possible plan — pruned 4-column read,
    per-batch mask + int fold (combiner), ONE global ``aggregate``
    (no shuffle, no join, no driver loop).  The discount band tests
    rounded basis points, not float equality."""
    from ray.data.aggregate import Sum

    lo = np.datetime64(date_from)
    hi = np.datetime64(date_to)
    li = _read(sf_dir, 'lineitem',
               ['l_shipdate', 'l_extendedprice', 'l_discount',
                'l_quantity'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df['l_shipdate'].to_numpy()
        db = np.floor(df['l_discount'].to_numpy() * 100
                      + 0.5).astype(np.int64)
        mask = ((sd >= lo) & (sd < hi) & (db >= 4) & (db <= 6)
                & (df['l_quantity'].to_numpy() < 24))
        pc_ = np.floor(df['l_extendedprice'].to_numpy()[mask] * 100
                       + 0.5).astype(np.int64)
        return pd.DataFrame({'rev': [int((pc_ * db[mask]).sum())],
                             'n': [int(mask.sum())]})

    agg = (li.map_batches(partial, batch_format='pandas')
           .aggregate(Sum('rev', alias_name='rev'),
                      Sum('n', alias_name='n')))
    out = pa.table({
        'revenue': pa.array([float(int(agg['rev'])) / 10000],
                            pa.float64()),
        'n_items': pa.array([int(agg['n'])], pa.int64())})
    return _snap_round(out, 'revenue', 4)


def promo_revenue_share(sf_dir: str, date_from: str = '1997-01-01',
                        date_to: str = '1998-01-01'):
    """TPC-H Q14-flavor promotion effect: share of revenue from PROMO
    parts in a shipdate window.  Returns ONE row (promo_revenue,
    total_revenue, promo_pct); both revenues fold as exact int64
    1e-4-dollar units, and promo_pct is the single division
    ``100·promo/total`` of those two identical integers, so the double
    is bit-identical across engines (plus a 6dp round).

    100-TB shape: the partkey→is-promo bitmap broadcasts once via
    ``ray.put`` (the classic mid-size dim — below ~10^8 keys; the
    partitioned-join tier is :func:`revenue_by_nation`'s machinery);
    each batch folds TWO ints, ONE global aggregate, no shuffle."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(f'{sf_dir}/part.parquet',
                         columns=['p_partkey', 'p_type'])
    promo = {k for k, t in zip(part.column('p_partkey').to_pylist(),
                               part.column('p_type').to_pylist())
             if t.startswith('PROMO')}
    pref = ray.put(promo)
    lo = np.datetime64(date_from)
    hi = np.datetime64(date_to)

    li = _read(sf_dir, 'lineitem',
               ['l_partkey', 'l_shipdate', 'l_extendedprice',
                'l_discount'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pset = ray.get(pref)
        sd = df['l_shipdate'].to_numpy()
        sub = df[(sd >= lo) & (sd < hi)]
        rev = _money_cents(sub)
        isp = np.fromiter((k in pset for k in sub['l_partkey']
                           .to_numpy()), dtype=bool, count=len(sub))
        return pd.DataFrame({'promo': [int(rev[isp].sum())],
                             'total': [int(rev.sum())]})

    agg = (li.map_batches(partial, batch_format='pandas')
           .aggregate(Sum('promo', alias_name='promo'),
                      Sum('total', alias_name='total')))
    p, t = int(agg['promo']), int(agg['total'])
    out = pa.table({
        'promo_revenue': pa.array([float(p) / 10000], pa.float64()),
        'total_revenue': pa.array([float(t) / 10000], pa.float64()),
        'promo_pct': pa.array([100.0 * p / t if t else 0.0],
                              pa.float64())})
    out = _snap_round(out, 'promo_revenue', 4)
    out = _snap_round(out, 'total_revenue', 4)
    return _snap_round(out, 'promo_pct', 6)


def top_volume_orders(sf_dir: str, min_qty: int = 300, k: int = 100):
    """TPC-H Q18-flavor large-volume customers: orders whose total
    quantity exceeds ``min_qty``, top-``k`` by (o_totalprice desc,
    o_orderkey asc), with the customer name attached.  Returns
    (c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    sum_qty).

    100-TB shape: per-order quantities fold in ONE coarse 64-bucket
    shuffle — a vectorized groupby-sum inside each bucket (every order
    lives wholly in its bucket; a per-orderkey Ray groupby measured
    ~40 s on 600k keys) — and the heavy filter applies in-bucket.
    Below ``BROADCAST_KEY_LIMIT`` heavy orders, the orderkey→qty map
    ships once via ray.put and orders filter with a vectorized isin
    (no join); above it, the partitioned ``Dataset.join`` tier.  The
    top-k folds per block and the driver merges ≤ k·blocks rows via
    ``to_pandas`` (vectorized — never row-wise ``take_all``)."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe

    li = _read(sf_dir, 'lineitem', ['l_orderkey', 'l_quantity'])
    buckets = 64
    shift = 64 - buckets.bit_length() + 1

    def bucketed(t: pa.Table) -> pa.Table:
        v = (t.column('l_orderkey').to_numpy(zero_copy_only=False)
             .astype(np.uint64))
        bkt = ((v * np.uint64(0x9E3779B97F4A7C15))
               >> np.uint64(shift)).astype(np.int64)
        return t.append_column('_bkt', pa.array(bkt, pa.int64()))

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(g['l_quantity'].to_numpy() + 0.5).astype(np.int64)
        c = (pd.DataFrame({'l_orderkey': g['l_orderkey'].to_numpy(),
                           'q': q})
             .groupby('l_orderkey', as_index=False)['q'].sum())
        c = c[c['q'] > int(min_qty)]
        return c.rename(columns={'q': 'sum_qty'})

    heavy = (li.map_batches(bucketed, batch_format='pyarrow')
             .groupby('_bkt').map_groups(fold_bucket,
                                         batch_format='pandas')
             .materialize())

    orders = _read(sf_dir, 'orders',
                   ['o_orderkey', 'o_custkey', 'o_orderdate',
                    'o_totalprice'])

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(['o_totalprice', 'o_orderkey'],
                              ascending=[False, True]).head(k)

    if heavy.count() <= BROADCAST_KEY_LIMIT:
        hp = heavy.to_pandas()
        hmap = dict(zip(hp['l_orderkey'].astype('int64'),
                        hp['sum_qty'].astype('int64')))
        href = ray.put(hmap)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(href)
            sub = df[df['o_orderkey'].isin(m)].copy()
            sub['sum_qty'] = sub['o_orderkey'].map(m).astype('int64')
            return block_topk(sub)

        cand = orders.map_batches(attach,
                                  batch_format='pandas').to_pandas()
    else:
        j = orders.join(_join_safe(heavy, 8), 'inner',
                        num_partitions=8,
                        on=('o_orderkey',), right_on=('l_orderkey',))
        cand = j.map_batches(block_topk,
                             batch_format='pandas').to_pandas()
    top = cand.sort_values(['o_totalprice', 'o_orderkey'],
                           ascending=[False, True]).head(k)

    need = set(int(x) for x in top['o_custkey'])
    ct = pq.read_table(f'{sf_dir}/customer.parquet',
                       columns=['c_custkey', 'c_name'])
    nmap = {k_: n for k_, n in zip(ct.column('c_custkey').to_pylist(),
                                   ct.column('c_name').to_pylist())
            if k_ in need}
    return pa.table({
        'c_name': pa.array([nmap[int(x)] for x in top['o_custkey']],
                           pa.string()),
        'c_custkey': pa.array(top['o_custkey'].astype('int64'),
                              pa.int64()),
        'o_orderkey': pa.array(top['o_orderkey'].astype('int64'),
                               pa.int64()),
        'o_orderdate': pa.array(top['o_orderdate']
                                .astype('datetime64[us]')),
        'o_totalprice': pa.array(top['o_totalprice'].astype('float64'),
                                 pa.float64()),
        'sum_qty': pa.array(top['sum_qty'].astype('int64'), pa.int64())})


def customer_order_dist(sf_dir: str):
    """TPC-H Q13-flavor customer distribution: how many customers
    placed exactly N orders, INCLUDING the zero-order customers.
    Returns (c_count, custdist).

    100-TB shape: orders fold per-batch ``value_counts`` partials into
    ONE custkey groupby-sum (the only corpus-scale shuffle); the
    distribution is a second groupby over the per-customer counts —
    answer-sized (≤ max orders per customer).  Zero-order customers
    come from arithmetic (|customer| − |custkeys with ≥1 order|, the
    left-join-null trick without the join): the customer row count is
    a metadata-only ``count()`` on a single-column pruned read.
    Per-customer counts fold in ONE coarse 64-bucket shuffle with a
    vectorized in-bucket value_counts (every custkey wholly in its
    bucket — never a per-custkey Ray groupby), emitting the bucket's
    (c_count, d) partial distribution directly."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, 'orders', ['o_custkey'])
    buckets = 64
    shift = 64 - buckets.bit_length() + 1

    def bucketed(t: pa.Table) -> pa.Table:
        v = (t.column('o_custkey').to_numpy(zero_copy_only=False)
             .astype(np.uint64))
        bkt = ((v * np.uint64(0x9E3779B97F4A7C15))
               >> np.uint64(shift)).astype(np.int64)
        return t.append_column('_bkt', pa.array(bkt, pa.int64()))

    def dist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        per_cust = g['o_custkey'].value_counts()     # complete per key
        vc = per_cust.value_counts()                 # count-of-counts
        return pd.DataFrame({'c_count': vc.index.to_numpy()
                             .astype(np.int64),
                             'd': vc.to_numpy().astype(np.int64)})

    folded = (orders.map_batches(bucketed, batch_format='pyarrow')
              .groupby('_bkt').map_groups(dist_bucket,
                                          batch_format='pandas')
              .groupby('c_count')
              .aggregate(Sum('d', alias_name='custdist'))
              .take_all())  # ≤ max orders/customer — answer-sized

    n_customers = _read(sf_dir, 'customer', ['c_custkey']).count()
    with_orders = sum(int(r['custdist']) for r in folded)
    rows = [(int(r['c_count']), int(r['custdist'])) for r in folded]
    if n_customers > with_orders:
        rows.append((0, n_customers - with_orders))
    rows.sort()
    return pa.table({
        'c_count': pa.array([r[0] for r in rows], pa.int64()),
        'custdist': pa.array([r[1] for r in rows], pa.int64())})


def monthly_revenue(sf_dir: str):
    """Monthly revenue trend with month-over-month growth: per
    shipdate month, exact int64 1e-4-dollar revenue fold, item count,
    and ``mom = (rev − prev_rev) / prev_rev`` (one division of two
    exact integers; first month reports 0.0 so the hash compare is
    null-free).  Returns (month, revenue, n_items, mom).

    100-TB shape: per-batch (month, cents, n) partials — the month
    domain is answer-sized (~decades·12) — ONE groupby-sum, trend
    arithmetic on the driver over |months| rows."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, 'lineitem',
               ['l_shipdate', 'l_extendedprice', 'l_discount'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            'month': df['l_shipdate'].values.astype('datetime64[M]'),
            'rev': _money_cents(df), 'n': 1})
            .groupby('month', as_index=False).sum())

    folded = (li.map_batches(partial, batch_format='pandas')
              .groupby('month')
              .aggregate(Sum('rev', alias_name='rev'),
                         Sum('n', alias_name='n'))
              .take_all())  # |months| — answer-sized
    rows = sorted((r['month'], int(r['rev']), int(r['n']))
                  for r in folded)
    revs = [r[1] for r in rows]
    moms = [0.0] + [float(revs[i] - revs[i - 1]) / revs[i - 1]
                    for i in range(1, len(revs))]
    out = pa.table({
        'month': pa.array(pd.Series([r[0] for r in rows])
                          .astype('datetime64[us]')),
        'revenue': pa.array([float(r[1]) / 10000 for r in rows],
                            pa.float64()),
        'n_items': pa.array([r[2] for r in rows], pa.int64()),
        'mom': pa.array(moms, pa.float64())})
    out = _snap_round(out, 'revenue', 4)
    return _snap_round(out, 'mom', 6)


def part_pairs(sf_dir: str, k: int = 100):
    """Market-basket co-occurrence: the ``k`` part pairs most often
    bought together in one order, ties broken on (p1, p2).  Returns
    (p1, p2, n) — the association-mining primitive.

    100-TB shape: TWO coarse 64-bucket shuffles, zero fine-key Ray
    groups (a pair-key groupby measured 18 s on 116k keys — the
    per-fine-key anti-pattern the round-3 folds eliminated): rows
    shuffle by orderkey hash, each bucket expands pairs with one
    VECTORIZED self-merge and emits partial counts; partials shuffle
    by PAIR hash, each pair-bucket folds its complete counts and
    keeps its own top-k; the driver merges ≤ 64·k rows."""
    li = _read(sf_dir, 'lineitem', ['l_orderkey', 'l_partkey'])
    buckets = 64
    shift = 64 - buckets.bit_length() + 1
    FIB = np.uint64(0x9E3779B97F4A7C15)

    def _fib_bucket(v: np.ndarray) -> np.ndarray:
        return ((v.astype(np.uint64) * FIB)
                >> np.uint64(shift)).astype(np.int64)

    def bucketed(t: pa.Table) -> pa.Table:
        bkt = _fib_bucket(
            t.column('l_orderkey').to_numpy(zero_copy_only=False))
        return t.append_column('_bkt', pa.array(bkt, pa.int64()))

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pp = g[['l_orderkey', 'l_partkey']].drop_duplicates()
        m = pp.merge(pp, on='l_orderkey')
        m = m[m['l_partkey_x'] < m['l_partkey_y']]
        out = (m.groupby(['l_partkey_x', 'l_partkey_y'], as_index=False)
               .size().rename(columns={'l_partkey_x': 'p1',
                                       'l_partkey_y': 'p2',
                                       'size': 'n'}))
        out['n'] = out['n'].astype('int64')
        # pair-hash bucket for the second (combining) shuffle
        out['_pb'] = _fib_bucket(out['p1'].to_numpy()
                                 * np.int64(1_000_003)
                                 + out['p2'].to_numpy())
        return out

    def fold_pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = (g.groupby(['p1', 'p2'], as_index=False)['n'].sum())
        return (c.sort_values(['n', 'p1', 'p2'],
                              ascending=[False, True, True]).head(k))

    cand = (li.map_batches(bucketed, batch_format='pyarrow')
            .groupby('_bkt').map_groups(pairs_bucket,
                                        batch_format='pandas')
            .groupby('_pb').map_groups(fold_pair_bucket,
                                       batch_format='pandas')
            .to_pandas())  # ≤ 64·k rows — vectorized pull
    top = cand.sort_values(['n', 'p1', 'p2'],
                           ascending=[False, True, True]).head(k)
    return pa.table({
        'p1': pa.array(top['p1'].astype('int64'), pa.int64()),
        'p2': pa.array(top['p2'].astype('int64'), pa.int64()),
        'n': pa.array(top['n'].astype('int64'), pa.int64())})


def session_durations(sf_dir: str, gap_minutes: int = 30):
    """Session-length distribution: histogram of session durations in
    whole minutes (sessions = :func:`events_sessions` 30-min-gap
    splits; duration = exact integer-µs max−min, floor-divided).
    Returns (dur_min, n).

    Duration is boundary-order-robust (min/max per session don't
    depend on tie order), so the histogram is deterministic at any
    parallelism.  100-TB shape: the sessionize group fold emits
    per-user partial histograms; ONE answer-sized dur_min
    groupby-sum."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['user_id', 'event_id', 'ts'])
    gap = pd.Timedelta(minutes=gap_minutes)

    def durs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(['ts', 'event_id'])
        sid = (g['ts'].diff() > gap).cumsum()
        us = pd.Series(g['ts'].values.astype('datetime64[us]')
                       .astype(np.int64), index=g.index)
        agg = us.groupby(sid).agg(['min', 'max'])
        m = ((agg['max'] - agg['min']) // 60_000_000).astype('int64')
        vc = m.value_counts()
        return pd.DataFrame({'dur_min': vc.index.to_numpy(),
                             'n': vc.to_numpy().astype(np.int64)})

    folded = (_per_key_groups(ds, 'user_id', durs)
              .groupby('dur_min')
              .aggregate(Sum('n', alias_name='n'))
              .take_all())  # ≤ |distinct durations| — answer-sized
    rows = sorted((int(r['dur_min']), int(r['n'])) for r in folded)
    return pa.table({
        'dur_min': pa.array([r[0] for r in rows], pa.int64()),
        'n': pa.array([r[1] for r in rows], pa.int64())})


def dup_jaccard_hist(sf_dir: str, bins: int = 20):
    """Similarity histogram of the verified near-dup pairs: exact
    Jaccard of every MinHash-LSH pair (≥ 0.8, recall 1.0 pinned)
    bucketed into ``1/bins``-wide bins — the dedup-quality diagnostic
    ("how near are the near-dups?").  Returns (bin, n) with
    ``bin = min(floor(jaccard·bins), bins−1)``.

    Float parity: jaccard is the same exact-integer division on both
    engines (i / (na+nb−i)), so the floor buckets bit-match.
    100-TB shape: rides :func:`minhash_dups`' banded-LSH pipeline —
    the pair table it returns is answer-sized by that op's contract,
    so the ≤ ``bins``-row histogram folds where the pairs landed."""
    pairs = minhash_dups(sf_dir)
    j = pairs.column('jaccard').to_numpy(zero_copy_only=False)
    b = np.minimum(np.floor(j * bins).astype(np.int64), bins - 1)
    vals, cnts = np.unique(b, return_counts=True)
    return pa.table({'bin': pa.array(vals.astype(np.int64), pa.int64()),
                     'n': pa.array(cnts.astype(np.int64), pa.int64())})


def dau_stickiness(sf_dir: str):
    """DAU / WAU engagement: per-day distinct users, the ISO-week
    distinct users of that day's week, and the stickiness ratio
    dau/wau — the standard product-engagement report.  Returns
    (day, dau, wau, stickiness).

    100-TB shape: two distinct-fold shuffles, both key-bounded —
    (day, user) and (week, user) pairs dedup per batch BEFORE the
    groupby (combiner), day/week counts are answer-sized; the
    day⋈week attach happens on the driver over |days| rows."""
    ev = _read(sf_dir, 'events', ['ts', 'user_id'])

    def day_user(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({'day': df['ts'].dt.floor('D'),
                              'user_id': df['user_id']})
                .drop_duplicates())

    def week_user(df: pd.DataFrame) -> pd.DataFrame:
        iso = df['ts'].dt.isocalendar()
        return (pd.DataFrame({'wk': (iso['year'] * 100
                                     + iso['week']).astype('int64'),
                              'user_id': df['user_id']})
                .drop_duplicates())

    # per-batch dedup shrinks the stream to distinct pairs; the day /
    # week key domains are answer-sized, so ONE map_groups per key
    # (vectorized nunique) replaces a composite-key groupby (a
    # (day,user) Ray groupby measured ~8 s on 45k composite keys)
    dau_rows = (ev.map_batches(day_user, batch_format='pandas')
                .groupby('day')
                .map_groups(lambda g: pd.DataFrame(
                    {'day': [g['day'].iloc[0]],
                     'dau': [int(g['user_id'].nunique())]}),
                    batch_format='pandas')
                .take_all())  # |days| — answer-sized
    wau_rows = (ev.map_batches(week_user, batch_format='pandas')
                .groupby('wk')
                .map_groups(lambda g: pd.DataFrame(
                    {'wk': [int(g['wk'].iloc[0])],
                     'wau': [int(g['user_id'].nunique())]}),
                    batch_format='pandas')
                .take_all())  # |weeks|
    wau = {int(r['wk']): int(r['wau']) for r in wau_rows}
    rows = sorted((r['day'], int(r['dau'])) for r in dau_rows)
    days = pd.Series([d for d, _ in rows])
    iso = pd.DatetimeIndex(days).isocalendar()
    wks = (iso['year'] * 100 + iso['week']).astype('int64').to_numpy()
    daus = np.array([n for _, n in rows], np.int64)
    waus = np.array([wau[int(w)] for w in wks], np.int64)
    out = pa.table({
        'day': pa.array(days.astype('datetime64[us]')),
        'dau': pa.array(daus, pa.int64()),
        'wau': pa.array(waus, pa.int64()),
        'stickiness': pa.array(daus.astype(np.float64) / waus,
                               pa.float64())})
    return _snap_round(out, 'stickiness', 6)


def vocab_growth(sf_dir: str, steps: int = 10):
    """Heaps-law vocabulary growth: distinct word-token vocabulary
    after each decile of the corpus (docs ordered by doc_id).
    Returns (pct, n_docs, vocab).

    The scale trick: growth does NOT need an ordered scan — each
    token's FIRST-occurrence doc (groupby-min over the token domain)
    is enough, and vocab(k) = #tokens whose first doc precedes
    checkpoint k.  One corpus-scale token shuffle, then an
    answer-sized (≤ steps) histogram fold; checkpoints are exact
    integer arithmetic on both engines."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Min, Sum

    from ..stages.textstats import _TOKEN_RE

    n_docs = pq.ParquetFile(
        f'{sf_dir}/documents.parquet').metadata.num_rows
    cks = [(n_docs * k + steps - 1) // steps for k in range(1, steps + 1)]

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def tok(t: pa.Table) -> pa.Table:
        dids, ws = [], []
        for did, s in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            seen = set(_TOKEN_RE.findall((s or '').lower()))
            dids.extend([did] * len(seen))
            ws.extend(seen)
        return pa.table({'w': pa.array(ws, pa.string()),
                         'doc_id': pa.array(dids, pa.int64())})

    first = (ds.map_batches(tok, batch_format='pyarrow')
             .groupby('w')
             .aggregate(Min('doc_id', alias_name='fd')))

    cks_arr = np.array(cks, np.int64)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or 'fd' not in df.columns:  # schemaless empty block
            return pd.DataFrame({'k': pd.Series([], dtype=np.int64),
                                 'n': pd.Series([], dtype=np.int64)})
        # first checkpoint k with fd < ck[k]  (ck is nondecreasing)
        idx = np.searchsorted(cks_arr, df['fd'].to_numpy(), side='right')
        vc = pd.Series(idx).value_counts()
        return pd.DataFrame({'k': vc.index.to_numpy(),
                             'n': vc.to_numpy().astype(np.int64)})

    folded = (first.map_batches(bucket, batch_format='pandas')
              .groupby('k')
              .aggregate(Sum('n', alias_name='n'))
              .take_all())  # ≤ steps rows
    per_k = {int(r['k']): int(r['n']) for r in folded}
    cum = np.cumsum([per_k.get(k, 0) for k in range(steps)])
    return pa.table({
        'pct': pa.array([(k + 1) * 100 // steps for k in range(steps)],
                        pa.int64()),
        'n_docs': pa.array(cks, pa.int64()),
        'vocab': pa.array(cum.astype(np.int64), pa.int64())})


def event_trigrams(sf_dir: str):
    """Per-user event-type TRIGRAM counts (second-order Markov over
    the behavior stream) — three consecutive events in (ts, event_id)
    order within each user contribute one (t1, t2, t3) triple.
    Returns (t1, t2, t3, n) — the longer-context companion to
    :func:`event_transitions`.

    100-TB shape: identical to the bigram op — `_per_key_groups`
    coarse buckets emit per-group partials (≤ |types|³ rows each),
    ONE groupby-sum over the answer-sized type³ domain."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['user_id', 'event_id', 'ts',
                                  'event_type'])

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for _, sub in g.groupby('user_id', sort=False, dropna=False):
            et = sub.sort_values(['ts', 'event_id'])['event_type'].tolist()
            c.update(zip(et, et[1:], et[2:]))
        ks = list(c.keys())
        return pd.DataFrame({
            't1': [x[0] for x in ks], 't2': [x[1] for x in ks],
            't3': [x[2] for x in ks],
            'n': pd.array(list(c.values()), dtype='int64')})

    out = (_per_key_groups(ds, 'user_id', triples)
           .groupby(['t1', 't2', 't3'])
           .aggregate(Sum('n', alias_name='n')))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'n' not in t.schema.names:
            return pa.table({'t1': pa.array([], pa.string()),
                             't2': pa.array([], pa.string()),
                             't3': pa.array([], pa.string()),
                             'n': pa.array([], pa.int64())})
        idx = t.schema.get_field_index('n')
        return t.set_column(idx, 'n', t['n'].cast(pa.int64()))

    return out.map_batches(finish, batch_format='pyarrow')


def ship_delay_dist(sf_dir: str):
    """Shipping-delay distribution: histogram of (l_shipdate −
    o_orderdate) in whole days over lineitem ⋈ orders.  Returns
    (delay_days, n) — the fulfilment-latency report.

    100-TB shape: tiered like brand_volume — below
    ``BROADCAST_KEY_LIMIT`` orders (parquet-footer row count, free)
    the orderkey→orderdate map ships once via ray.put and every batch
    folds its delay histogram locally (zero shuffle but the
    answer-sized delay groupby); above it, ONE partitioned BIG⋈BIG
    ``Dataset.join`` on orderkey with the same per-batch
    ``value_counts`` partials."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.dedup import BROADCAST_KEY_LIMIT, _join_safe

    li = _read(sf_dir, 'lineitem', ['l_orderkey', 'l_shipdate'])
    n_orders = pq.ParquetFile(
        f'{sf_dir}/orders.parquet').metadata.num_rows

    def hist(ship_day: np.ndarray, order_day: np.ndarray):
        d = (ship_day - order_day).astype(np.int64)
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({'delay_days': vc.index.to_numpy(),
                             'n': vc.to_numpy().astype(np.int64)})

    if n_orders <= BROADCAST_KEY_LIMIT:
        ot = pq.read_table(f'{sf_dir}/orders.parquet',
                           columns=['o_orderkey', 'o_orderdate'])
        omap = pd.Series(
            ot.column('o_orderdate').to_numpy()
            .astype('datetime64[D]'),
            index=ot.column('o_orderkey').to_numpy())
        oref = ray.put(omap)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(oref)
            return hist(df['l_shipdate'].to_numpy()
                        .astype('datetime64[D]'),
                        df['l_orderkey'].map(m).to_numpy()
                        .astype('datetime64[D]'))

        src = li
    else:
        orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_orderdate'])
        src = li.join(_join_safe(orders, 8), 'inner', num_partitions=8,
                      on=('l_orderkey',), right_on=('o_orderkey',))

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return hist(df['l_shipdate'].to_numpy()
                        .astype('datetime64[D]'),
                        df['o_orderdate'].to_numpy()
                        .astype('datetime64[D]'))

    # 8-way repartition merge + ONE vectorized driver combine over
    # ≤ 8·|delays| rows — cheaper than a Ray sort-aggregate on the
    # (answer-sized but multi-thousand-key) delay domain
    fdf = (src.map_batches(partial, batch_format='pandas')
           .repartition(8)
           .map_batches(lambda df: (df.groupby('delay_days',
                                               as_index=False)['n']
                                    .sum()),
                        batch_format='pandas')
           .to_pandas())
    fdf = fdf.groupby('delay_days', as_index=False)['n'].sum()
    rows = sorted(zip(fdf['delay_days'].astype('int64'),
                      fdf['n'].astype('int64')))
    return pa.table({
        'delay_days': pa.array([r[0] for r in rows], pa.int64()),
        'n': pa.array([r[1] for r in rows], pa.int64())})


def hourly_profile(sf_dir: str):
    """Traffic shape: event counts by (ISO weekday 1–7, hour 0–23) —
    the load-profile matrix behind capacity planning and
    politeness-budget scheduling.  Returns (dow, hour, n).

    100-TB shape: per-batch value_counts partials over the 168-cell
    domain; ONE answer-sized groupby-sum; zero joins."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, 'events', ['ts'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dow = (df['ts'].dt.dayofweek + 1).to_numpy()  # ISO 1=Mon
        hr = df['ts'].dt.hour.to_numpy()
        vc = pd.Series(dow * 100 + hr).value_counts()
        return pd.DataFrame({'cell': vc.index.to_numpy(),
                             'n': vc.to_numpy().astype(np.int64)})

    folded = (ev.map_batches(partial, batch_format='pandas')
              .groupby('cell')
              .aggregate(Sum('n', alias_name='n'))
              .take_all())  # ≤ 168 cells
    rows = sorted((int(r['cell']) // 100, int(r['cell']) % 100,
                   int(r['n'])) for r in folded)
    return pa.table({
        'dow': pa.array([r[0] for r in rows], pa.int64()),
        'hour': pa.array([r[1] for r in rows], pa.int64()),
        'n': pa.array([r[2] for r in rows], pa.int64())})


def percentile_rank_docs(sf_dir: str):
    """Per-document length percentile WITHIN its language —
    ``percent_rank()`` over (lang, n_chars) at corpus scale WITHOUT a
    global sort: n_chars is bounded-integer, so an answer-sized
    (lang, n_chars) histogram folds first, its cumulative counts
    broadcast once via ``ray.put``, and a second stateless pass maps
    every doc to ``count_less / (n_lang − 1)`` (SQL percent_rank tie
    semantics: min rank of the tie group).  Returns (doc_id, lang,
    n_chars, pr) — the windowed-rank pattern for 10^10-row
    partitions.

    Float parity: pr is one division of two exact integers, rounded
    6dp on both sides."""
    import ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, 'documents', ['doc_id', 'lang', 'n_chars'])
    hist = (ds.groupby(['lang', 'n_chars'])
            .aggregate(Count(alias_name='cnt'))
            .take_all())  # ≤ |langs|·|distinct lengths| — bounded

    by_lang: dict = {}
    for r in hist:
        by_lang.setdefault(r['lang'], []).append(
            (int(r['n_chars']), int(r['cnt'])))
    lut = {}
    for lang, vals in by_lang.items():
        vals.sort()
        less = 0
        total = sum(c for _, c in vals)
        m = {}
        for v, c in vals:
            m[v] = less
            less += c
        lut[lang] = (m, total)
    lref = ray.put(lut)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        tbl = ray.get(lref)
        prs = np.empty(len(df), np.float64)
        for i, (lg, nc) in enumerate(zip(df['lang'].to_numpy(),
                                         df['n_chars'].to_numpy())):
            m, total = tbl[lg]
            prs[i] = (m[int(nc)] / (total - 1)) if total > 1 else 0.0
        return pd.DataFrame({
            'doc_id': df['doc_id'].to_numpy(),
            'lang': df['lang'].to_numpy(),
            'n_chars': df['n_chars'].to_numpy().astype(np.int64),
            'pr': np.rint(prs * 1e6) / 1e6 + 0.0})

    return ds.map_batches(rank, batch_format='pandas')


def host_pagerank(sf_dir: str, iters: int = 3, damping: float = 0.85):
    """Domain-level PageRank: the power iteration of :func:`pagerank`
    over the DISTINCT host adjacency (the standard domain-rank
    formulation — host graphs collapse multiplicity).  Returns
    (host, pagerank); bit-identical to the SQL oracle via the same
    ascending-sorted contribution folds.

    100-TB shape: hosts are orders of magnitude fewer than urls, and
    the edge list arrives ALREADY aggregated by :func:`host_graph`
    (per-batch Counter partials → one groupby-sum), so the distinct
    host-pair table is the only thing that leaves the extraction.
    Tiered like :func:`pagerank`: driver fold at answer size,
    `_pagerank_dataset` joins above ``PAGERANK_DRIVER_EDGE_LIMIT``."""
    eds = (host_graph(sf_dir)
           .select_columns(['src_host', 'dst_host'])
           .materialize())  # post-aggregation: |distinct host pairs|
    if eds.count() <= PAGERANK_DRIVER_EDGE_LIMIT:
        rows = eds.take_all()
        t = _pagerank_fold([r['src_host'] for r in rows],
                           [r['dst_host'] for r in rows],
                           iters, damping)
    else:
        ds = _pagerank_dataset(
            eds.map_batches(
                lambda b: pa.table({'src': b['src_host'],
                                    'dst': b['dst_host']}),
                batch_format='pyarrow'), iters, damping)
        t = pa.concat_tables(
            ds.iter_batches(batch_format='pyarrow'))  # host domain
    return t.rename_columns(['host', 'pagerank'])


def winnow_fingerprints(sf_dir: str, k: int = 8, window: int = 16):
    """Winnowing document fingerprints (Schleimer, Wilkerson &
    Aiken 2003): the distinct set of window-minimum k-gram rolling
    hashes per document — the local plagiarism/copy-detection
    fingerprint that, unlike a single min-hash, localizes matches.
    Returns (doc_id, fp) exploded, one row per selected fingerprint.

    Same codepoint Horner hash as :class:`stages.textstats.Fingerprint`
    (31-bit modulus — SQL-recomputable); window minima via numpy
    ``sliding_window_view`` (no per-window Python loop).  Docs shorter
    than ``k`` contribute their whole-string hash; docs with fewer
    than ``window`` grams contribute one global minimum.

    100-TB shape: pure map_batches, no shuffle — each doc emits a
    bounded fingerprint set (~2·len/window expected)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from ..stages.textstats import Fingerprint

    fpr = Fingerprint(k=k)
    B = np.uint64(Fingerprint.B % Fingerprint.GRAM_MOD)
    M = np.uint64(Fingerprint.GRAM_MOD)

    def winnow(t: pa.Table) -> pa.Table:
        ids, fps = [], []
        for did, s in zip(t.column('doc_id').to_pylist(),
                          t.column('text').to_pylist()):
            s = s or ''
            if len(s) < k:
                h = 0
                for ch in s:
                    h = (h * Fingerprint.B + ord(ch)) % \
                        Fingerprint.GRAM_MOD
                sel = np.array([h], np.int64)
            else:
                data = np.frombuffer(s.encode('utf-32-le'),
                                     dtype=np.uint32).astype(np.uint64)
                n_win = len(data) - k + 1
                g = np.zeros(n_win, dtype=np.uint64)
                for j in range(k):
                    g = (g * B + data[j:j + n_win]) % M
                if n_win <= window:
                    sel = np.array([int(g.min())], np.int64)
                else:
                    sel = np.unique(
                        sliding_window_view(g, window).min(axis=1)
                        .astype(np.int64))
            ids.extend([did] * len(sel))
            fps.append(sel)
        return pa.table({
            'doc_id': pa.array(ids, pa.int64()),
            'fp': pa.array(np.concatenate(fps) if fps
                           else np.array([], np.int64), pa.int64())})

    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return ds.map_batches(winnow, batch_format='pyarrow')


def events_anomaly(sf_dir: str, trail: int = 7):
    """Daily event-volume anomaly score: z-score of each day's event
    count against the TRAILING ``trail`` days (previous rows, ordered
    by day).  Returns (day, n, z) for days with a full trailing window
    and non-constant history.

    Float determinism: mean and variance derive from two INTEGER
    window sums (s1=Σn, s2=Σn²; var = (t·s2 − s1²)/t² — exact ints
    into one division each), so both engines divide identical
    integers.  100-TB shape: per-batch (day, n) partials → ONE
    answer-sized day groupby; the trailing window folds on the driver
    over ≤ |days| rows."""
    import math

    from ray.data.aggregate import Sum

    ev = _read(sf_dir, 'events', ['ts'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df['ts'].dt.floor('D')
        vc = day.value_counts()
        return pd.DataFrame({'day': vc.index,
                             'n': vc.to_numpy().astype(np.int64)})

    folded = (ev.map_batches(partial, batch_format='pandas')
              .groupby('day')
              .aggregate(Sum('n', alias_name='n'))
              .take_all())  # ≤ |days| — answer-sized
    rows = sorted((r['day'], int(r['n'])) for r in folded)
    days = [d for d, _ in rows]
    ns = np.array([n for _, n in rows], np.int64)
    out_d, out_n, out_z = [], [], []
    t = int(trail)
    for i in range(t, len(ns)):
        w = ns[i - t:i]
        s1 = int(w.sum())
        s2 = int((w * w).sum())
        var = float(t * s2 - s1 * s1) / (t * t)
        if var <= 0:
            continue
        mean = float(s1) / t
        out_d.append(days[i])
        out_n.append(int(ns[i]))
        out_z.append((float(ns[i]) - mean) / math.sqrt(var))
    out = pa.table({
        'day': pa.array(pd.Series(out_d).astype('datetime64[us]')),
        'n': pa.array(out_n, pa.int64()),
        'z': pa.array(out_z, pa.float64())})
    return _snap_round(out, 'z', 6)


def rfm_scores(sf_dir: str):
    """RFM customer segmentation over the event stream: per-user
    Recency (latest event ts), Frequency (event count) and Monetary
    (exact cent-folded value sum) quintile scores 1–5, plus the
    combined ``rfm = 100·r + 10·f + m``.  Quintiles are EXACT rank
    arithmetic — ``1 + 5·(rank−1)//n`` with ties broken by user_id —
    not an approximate ntile, so the oracle matches bit-for-bit.
    Returns (user_id, r_score, f_score, m_score, rfm).

    100-TB shape: per-batch per-user partials (max-ts / count / int
    cents) combine BEFORE the single user-key groupby; ranking folds
    on the user domain (answer-sized by the same contract as
    ``user_event_counts``)."""
    ev = _read(sf_dir, 'events', ['user_id', 'ts', 'value'])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df['value'].to_numpy() * 100
                         + 0.5).astype(np.int64)
        g = (pd.DataFrame({'user_id': df['user_id'].to_numpy(),
                           'ts_us': df['ts'].astype('int64').to_numpy(),
                           'cents': cents, 'n': 1})
             .groupby('user_id', as_index=False)
             .agg(ts_us=('ts_us', 'max'), cents=('cents', 'sum'),
                  n=('n', 'sum')))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby('user_id', as_index=False)
                .agg(ts_us=('ts_us', 'max'), cents=('cents', 'sum'),
                     n=('n', 'sum')))

    # per-batch partials → 8-way repartition merge → ONE vectorized
    # driver combine over ≤ 8·|users| rows pulled with to_pandas
    # (row-wise take_all costs ~1 ms/row; to_pandas is zero-copy)
    fp = (ev.map_batches(partial, batch_format='pandas')
          .repartition(8)
          .map_batches(merge, batch_format='pandas')
          .to_pandas())
    fdf = merge(fp)
    users = sorted(fdf['user_id'])
    by = {u: (int(t), int(c), int(nn))
          for u, t, c, nn in zip(fdf['user_id'], fdf['ts_us'],
                                 fdf['cents'], fdf['n'])}
    n = len(users)

    def quintile(idx):
        order = sorted(users, key=lambda u: (by[u][idx], u))
        return {u: 1 + (5 * i) // n for i, u in enumerate(order)}

    r_q = quintile(0)
    f_q = quintile(2)
    m_q = quintile(1)
    return pa.table({
        'user_id': pa.array(users, pa.int64()),
        'r_score': pa.array([r_q[u] for u in users], pa.int64()),
        'f_score': pa.array([f_q[u] for u in users], pa.int64()),
        'm_score': pa.array([m_q[u] for u in users], pa.int64()),
        'rfm': pa.array([100 * r_q[u] + 10 * f_q[u] + m_q[u]
                         for u in users], pa.int64())})


def bm25_search(sf_dir: str, query: str = 'hash join order', k: int = 20,
                k1: float = 1.2, b: float = 0.75):
    """BM25 top-``k`` keyword search over the corpus — the retrieval
    primitive behind quality-by-query curation and search-engine-style
    corpus probes (Robertson & Zaragoza 2009's BM25 with the standard
    `ln((N - df + 0.5)/(df + 0.5) + 1)` idf).

    Determinism across engines: dl / tf / df / N are exact integers,
    avgdl is the single division sum_dl/N, and each doc's score sums
    its per-term contributions in SORTED term order — the DuckDB
    mirror pivots per term and adds in the same written order, so the
    doubles are bit-identical (plus a 6dp round on output).  Ties at
    the k boundary break on doc_id asc.

    100-TB shape: ONE tokenize pass emits per-batch corpus-stats rows
    (n_docs, sum_dl) and sparse per-(doc, term) tf candidates into a
    materialized scratch; df folds from an answer-sized (≤ n_terms)
    groupby; scoring is a `_per_key_groups` fold over candidate docs
    with per-block partial top-k, so the driver merges ≤ 64·k rows.
    Returns (rk, doc_id, score)."""
    from collections import Counter

    import math

    from ray.data.aggregate import Sum

    from ..stages.textstats import _TOKEN_RE

    terms = sorted(set(query.lower().split()))
    tset = set(terms)
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def partial(t: pa.Table) -> pa.Table:
        ids, tms, tfs, dls = [], [], [], []
        n_docs, sum_dl = 0, 0
        for did, txt in zip(t.column('doc_id').to_pylist(),
                            t.column('text').to_pylist()):
            toks = _TOKEN_RE.findall((txt or '').lower())
            n_docs += 1
            sum_dl += len(toks)
            c = Counter(tok for tok in toks if tok in tset)
            for tm, tf in c.items():
                ids.append(did)
                tms.append(tm)
                tfs.append(tf)
                dls.append(len(toks))
        # one stats row per batch: term='' marks it (no \w term is '')
        ids.append(None)
        tms.append('')
        tfs.append(n_docs)
        dls.append(sum_dl)
        return pa.table({'doc_id': pa.array(ids, pa.int64()),
                         'term': pa.array(tms, pa.string()),
                         'tf': pa.array(tfs, pa.int64()),
                         'dl': pa.array(dls, pa.int64())})

    # scratch: one row per (candidate doc, matched term) + one per block
    rows = (ds.map_batches(partial, batch_format='pyarrow')
            .materialize())

    import pyarrow.compute as pc

    stats = (rows.map_batches(
        lambda t: t.filter(pc.equal(t['term'], '')),
        batch_format='pyarrow')
        .aggregate(Sum('tf'), Sum('dl')))
    n_total = int(stats['sum(tf)'] or 0)
    sum_dl = int(stats['sum(dl)'] or 0)
    if n_total == 0:
        return pa.table({'rk': pa.array([], pa.int64()),
                         'doc_id': pa.array([], pa.int64()),
                         'score': pa.array([], pa.float64())})
    avgdl = float(sum_dl) / n_total

    cands = rows.map_batches(
        lambda t: t.filter(pc.not_equal(t['term'], '')),
        batch_format='pyarrow')
    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter(t.column('term').to_pylist())
        return pa.table({'term': pa.array(list(c.keys()), pa.string()),
                         'n': pa.array(list(c.values()), pa.int64())})

    dfs = {r['term']: int(r['n'])
           for r in (cands.map_batches(df_partial, batch_format='pyarrow')
                     .groupby('term').aggregate(Sum('n', alias_name='n'))
                     .take_all())}  # ≤ n_terms rows — answer-sized
    idf = {t: math.log((n_total - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
           for t in terms if t in dfs}

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # per-doc score: per-term contributions added in sorted term
        # order (mirrors the SQL pivot's written order exactly)
        out_ids, out_sc = [], []
        for did, sub in g.groupby('doc_id', sort=False, dropna=False):
            per = {t: (int(tf), int(dl)) for t, tf, dl in
                   zip(sub['term'], sub['tf'], sub['dl'])}
            s = 0.0
            for t in terms:
                if t not in per or t not in idf:
                    continue
                tf, dl = per[t]
                s += (idf[t] * (tf * (k1 + 1.0))
                      / (tf + k1 * (1.0 - b + b * dl / avgdl)))
            out_ids.append(did)
            out_sc.append(s)
        return pd.DataFrame({'doc_id': pd.array(out_ids, dtype='int64'),
                             'score': out_sc})

    scored = _per_key_groups(cands, 'doc_id', fold)

    def block_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(['score', 'doc_id'],
                             ascending=[False, True]).head(k)

    top = (scored.map_batches(block_topk, batch_format='pandas')
           .take_all())  # ≤ buckets·k rows — answer-sized
    top.sort(key=lambda r: (-r['score'], r['doc_id']))
    top = top[:k]
    out = pa.table({
        'rk': pa.array(range(1, len(top) + 1), pa.int64()),
        'doc_id': pa.array([int(r['doc_id']) for r in top], pa.int64()),
        'score': pa.array([float(r['score']) for r in top], pa.float64())})
    return _snap_round(out, 'score', 6)


def retention_cohorts(sf_dir: str):
    """Weekly cohort retention matrix over the event stream — users
    cohorted by the Monday-truncated week of their FIRST event; one
    row per (cohort_week, week_offset) counting users active in that
    offset week (offset 0 = the cohort week itself).  The standard
    retention triangle every engagement dashboard draws.

    100-TB shape: one `_per_key_groups` fold per user (first-week +
    distinct active weeks — the per-user state is a handful of week
    stamps) emits (cohort, offset) marks; per-batch count partials →
    ONE groupby-sum over the answer-sized cohort×offset domain."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['user_id', 'ts'])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        wk = g['ts'].dt.to_period('W-SUN').dt.start_time  # Monday trunc
        cohorts, offsets = [], []
        for _, sub in g.assign(wk=wk).groupby('user_id', sort=False,
                                               dropna=False):
            cw = sub['wk'].min()
            for w in sub['wk'].unique():
                cohorts.append(cw)
                offsets.append(int((w - cw).days) // 7)
        return pd.DataFrame({
            'cohort_week': pd.Series(cohorts).dt.strftime('%Y-%m-%d'),
            'week_offset': pd.array(offsets, dtype='int64')})

    marks = _per_key_groups(ds, 'user_id', per_user)

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter(zip(t.column('cohort_week').to_pylist(),
                                 t.column('week_offset').to_pylist()))
        ks = list(c.keys())
        return pa.table({
            'cohort_week': pa.array([x[0] for x in ks], pa.string()),
            'week_offset': pa.array([x[1] for x in ks], pa.int64()),
            'n': pa.array(list(c.values()), pa.int64())})

    out = (marks.map_batches(partial, batch_format='pyarrow')
           .groupby(['cohort_week', 'week_offset'])
           .aggregate(Sum('n', alias_name='n_users')))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'n_users' not in t.schema.names:
            return pa.table({'cohort_week': pa.array([], pa.string()),
                             'week_offset': pa.array([], pa.int64()),
                             'n_users': pa.array([], pa.int64())})
        idx = t.schema.get_field_index('n_users')
        return t.set_column(idx, 'n_users',
                            t['n_users'].cast(pa.int64()))

    return out.map_batches(finish, batch_format='pyarrow')


def event_transitions(sf_dir: str):
    """Per-user event-type transition counts (the first-order Markov
    matrix over the behavior stream) — consecutive events in (ts,
    event_id) order within each user contribute one (from_type,
    to_type) pair; the matrix feeds next-action models and anomaly
    scores.  Returns (from_type, to_type, n).

    100-TB shape: the per-user ordered zip runs in `_per_key_groups`
    coarse buckets emitting per-group partial counts (≤ |types|² rows
    each); ONE groupby-sum over the answer-sized type×type domain."""
    from collections import Counter

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, 'events', ['user_id', 'event_id', 'ts',
                                  'event_type'])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for _, sub in g.groupby('user_id', sort=False, dropna=False):
            et = sub.sort_values(['ts', 'event_id'])['event_type'].tolist()
            c.update(zip(et, et[1:]))
        ks = list(c.keys())
        return pd.DataFrame({
            'from_type': [x[0] for x in ks],
            'to_type': [x[1] for x in ks],
            'n': pd.array(list(c.values()), dtype='int64')})

    out = (_per_key_groups(ds, 'user_id', pairs)
           .groupby(['from_type', 'to_type'])
           .aggregate(Sum('n', alias_name='n')))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or 'n' not in t.schema.names:
            return pa.table({'from_type': pa.array([], pa.string()),
                             'to_type': pa.array([], pa.string()),
                             'n': pa.array([], pa.int64())})
        idx = t.schema.get_field_index('n')
        return t.set_column(idx, 'n', t['n'].cast(pa.int64()))

    return out.map_batches(finish, batch_format='pyarrow')
