"""The BFS wave-loop crawler (SURVEY.md §3.2 re-architecture).

Per wave (all heavy work is Ray Data; the driver holds only frontier
metadata and the sequential bookkeeping fold):

1. **Schedule** — politeness actors assign a deterministic virtual
   fetch ts per frontier row (reference throttle semantics,
   download.py:454-473, variance=0).
2. **Fetch** — partition-pruned corpus lookup of the wave's unique
   urls (the reference's cache-hit path, download.py:195-219, as a
   hash join against the bucketed Parquet corpus).
3. **Extract** — ``map_batches`` actor stage: html → byte-identical
   text + candidate links (crawl regex in document order,
   download.py:1033) canonicalized (download.py:987-1004) with
   validity flags (download.py:1010-1026) and 64-bit hashes.
4. **Dedup probe** — one batched RPC per seen-set shard for all of
   the wave's candidate hashes (sharded cuckoo/bloom/exact actors).
5. **Resolve fold** — the only sequential step: replays the exact
   queue bookkeeping (first-seen registration at depth+1, max_links
   break, max_depth leaf check) over this wave's candidates in
   ``(parent visit order, link idx)`` order.  O(wave) time, O(wave)
   memory; all O(corpus) state stays in the shard actors.
6. **Commit** — new registrations flushed to shards; per-wave output
   + lineage checkpoint written atomically (tmp dir + rename,
   mirroring reference State.save, download.py:924-945).

Determinism: the fold order is a function of the frontier only, so
crawl order, seen-set and outputs are identical at any parallelism —
asserted in tests and the scaling bench.

Two resolve tiers:

- **Driver fold** (small waves, wave 0, redirect crawls): the exact
  sequential bookkeeping above; O(wave) driver memory.
- **Distributed resolve** (waves > ``table_threshold`` whose rows are
  all preseen — every wave after the first): no page text or candidate
  data ever reaches the driver.  Fetch+extract stream through
  ``map_batches``; candidates explode to flat rows, join the wave
  metadata on url, drop preseen via batched shard RPCs, and first-seen
  resolution is ``groupby(cand_hash).min(visit_order << 32 | link_idx)``
  — provably equal to the sequential fold under the preseen
  precondition (no intra-wave self/candidate interplay) with the
  ``max_links`` break enforced by rare iterative trims.  Page text and
  the emitted-edge list are written to parquet from the distributed
  stages; the driver returns visit metadata only (url, depth, order,
  status, scheduled_ts — text/links columns are null in the returned
  table and live in the wave output files).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..kernels import text as T
from ..kernels import urls as U
from ..sources.store import CorpusStore
from ..stages.extract_stage import ExtractPages
from ..state.metrics import CrawlState
from ..state.politeness import PolitenessPool
from ..state.seen import ShardedSeenSet


class PrepCandidates:
    """map_batches stage: raw_links → candidate arrays per page.

    Canonicalizes each href against its page url, hashes it, and
    evaluates the context-free part of the validity chain (media ext /
    http / same-domain / regexes / robots — reference
    download.py:1010-1026).  Emits list columns aligned per page.
    """

    def __init__(self, allowed_urls: str = '', banned_urls: str = '^$',
                 robots=None):
        self.allowed_re = re.compile(allowed_urls)
        self.banned_re = re.compile(banned_urls)
        self.robots = robots

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column('url').to_pylist()
        rawss = batch.column('raw_links').to_pylist()
        links_col, hash_col, valid_col = [], [], []
        for u, raws in zip(urls, rawss):
            domain = T.get_domain(u)
            links, hashes, valids = [], [], []
            for l in (raws or []):
                try:
                    link = U.normalize_url(u, l)
                except UnicodeDecodeError:
                    continue  # reference skips undecodable links (download.py:1036-1039)
                links.append(link)
                hashes.append(U.url_hash64(link))
                valids.append(U.link_valid(link, domain, self.allowed_re,
                                           self.banned_re, self.robots))
            links_col.append(links)
            hash_col.append(hashes)
            valid_col.append(valids)
        out = {name: batch.column(name) for name in batch.column_names
               if name != 'raw_links'}
        out['cand_link'] = pa.array(links_col, pa.list_(pa.string()))
        out['cand_hash'] = pa.array(hash_col, pa.list_(pa.int64()))
        out['cand_valid'] = pa.array(valid_col, pa.list_(pa.bool_()))
        return pa.table(out)


class ExtractWorker:
    """Persistent crawl-extraction actor (one per pool slot).

    A BFS crawl runs one extraction job per wave; spinning a fresh
    ``map_batches`` job each wave costs ~1-2 s of fixed latency.  This
    pool is created once per crawl and fed table chunks directly, so
    per-wave overhead is one RPC round.  Kernels are compiled at import;
    ``__init__`` holds configuration only.
    """

    def __init__(self, with_contacts: bool, with_excerpt: bool,
                 allowed_urls: str, banned_urls: str, robots=None,
                 with_redirect: bool = False):
        self.extract = ExtractPages(with_links=True,
                                    with_contacts=with_contacts,
                                    with_excerpt=with_excerpt,
                                    with_redirect=with_redirect)
        self.prep = PrepCandidates(allowed_urls, banned_urls, robots)

    def process(self, tbl: pa.Table) -> pa.Table:
        return self.prep(self.extract(tbl))


class CorpusCacheShard(ExtractWorker):
    """Resident-corpus shard actor (the "cache what fits" fetch tier).

    Loads its assigned buckets' (url, html[, warc_ts]) columns ONCE at
    construction, url-sorted, and serves each wave's fetch as a
    vectorized searchsorted point lookup — optionally running the
    extraction kernels in place (``take_extract``), so a wave costs one
    RPC per shard and page html never crosses the wire.  The reference
    semantics this implements is ``pdict.PersistentDict`` as the page
    cache (reference pdict.py:42-259): the corpus IS the cache, held in
    worker heaps while it fits the cluster memory gate
    (RESIDENT_OBJECT_STORE_FRACTION).  Multi-snapshot urls keep all
    their rows; the caller's latest-per-url merge resolves them."""

    def __init__(self, files, columns, with_contacts: bool,
                 with_excerpt: bool, allowed_urls: str, banned_urls: str,
                 robots=None, with_redirect: bool = False, schema=None):
        super().__init__(with_contacts, with_excerpt, allowed_urls,
                         banned_urls, robots, with_redirect)
        import pyarrow.dataset as pads

        if files:
            t = pads.dataset(files, format='parquet').to_table(
                columns=columns)
            self.tbl = t.sort_by('url')
        elif schema is not None:
            # a shard whose assigned buckets are all empty (host layout
            # with fewer hosts than buckets) must still emit blocks in
            # the STORE's types — an all-string empty table would fail
            # schema unification / as-of casts downstream
            self.tbl = schema.empty_table()
        else:
            self.tbl = pa.table({c: pa.array([], pa.string())
                                 for c in (columns or ['url'])})
        self._urls = np.asarray(self.tbl.column('url').to_pylist(),
                                dtype=object)

    def ping(self) -> bool:
        """Readiness probe: returns once __init__'s load finished."""
        return True

    def take(self, urls, columns=None) -> pa.Table:
        """All rows (every snapshot) whose url is in ``urls``."""
        want = np.asarray(sorted(set(urls)), dtype=object)
        lo = np.searchsorted(self._urls, want, side='left')
        hi = np.searchsorted(self._urls, want, side='right')
        spans = [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
        idx = (np.concatenate(spans) if spans
               else np.empty(0, dtype=np.int64))
        out = self.tbl.take(pa.array(idx, pa.int64()))
        if columns:
            out = out.select([c for c in columns
                              if c in out.column_names])
        return out

    def take_extract(self, urls) -> pa.Table:
        return self.process(self.take(urls))


def _ts_us(ts) -> int:
    """Normalize a warc_ts value (int us, datetime, or None) to int us."""
    if ts is None:
        return -1
    if isinstance(ts, int):
        return ts
    import datetime

    if isinstance(ts, datetime.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return int(ts.timestamp() * 1_000_000)
    return int(ts)


def _atomic_write_dir(tmp_dir: str, final_dir: str):
    """Commit ``tmp_dir`` as ``final_dir`` crash-safely.

    The old dir (a re-run of an already-checkpointed wave) is renamed
    aside before the new one moves in, so a crash mid-commit never
    leaves the LATEST pointer referencing a deleted directory — resume
    falls back to whichever rename completed.
    """
    old = final_dir + '.old'
    import shutil
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final_dir):
        os.rename(final_dir, old)
    os.rename(tmp_dir, final_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


#: driver-side marker: the next frontier lives in the spill queue
_SPILLED = '__frontier_in_queue__'

#: metadata-fold tier auto budget (resolve_metadata_limit=None).  The
#: fold is the wave loop's only driver-serial fraction, so its budget
#: scales INVERSELY with cluster width: candidates_limit =
#: min(MEM_CAP, WORK // cluster_cpus).  WORK is calibrated from the
#: measured serial cost per candidate (~0.8 µs with the distributed
#: explode pull — numeric columns only, lexsort+probe on the driver;
#: BASELINE.md round 4) against the distributed tier's ~3-5 s of fixed
#: per-wave shuffle latency: at 32 cpus the budget is 4M candidates
#: (~3 s serial ≈ the distributed tier's fixed cost), at 256×32 cpus
#: ~16k (any serial fold would dominate the wave).  MEM_CAP bounds
#: transient driver memory (~25 B/candidate numeric after the
#: link-pull split ⇒ 24M ≈ 600 MB).
RESOLVE_METADATA_WORK = 128_000_000
RESOLVE_METADATA_MEM_CAP = 24_000_000
#: below this many candidates the metadata fold pulls link strings
#: inline with the hashes (one pass, lowest latency); above it links
#: stay distributed and only the WINNERS' strings come back via a
#: broadcast-hash filter — the pull is the fold's serial bandwidth,
#: and link strings are ~10x the numeric columns.
RESOLVE_LINK_PULL_INLINE = 262_144
#: status-marker sentinel in the distributed candidate pull (a page
#: whose status column is null — never a real HTTP status)
_NO_STATUS = -(1 << 31)
#: resident-corpus gate: when the store's total file bytes fit within
#: this fraction of the cluster's object store, the crawler
#: materializes (url, html, warc_ts) ONCE and serves every wave's
#: fetch as an in-memory Arrow isin filter — each BFS wave otherwise
#: pays a full parquet decode of every touched bucket, which at bench
#: scale is the whole corpus per wave.  At 100 TB against a multi-TB
#: object store the gate is off and the pruned point read runs; this
#: is "cache what fits", decided from cluster resources, not a flag.
RESIDENT_OBJECT_STORE_FRACTION = 0.25

#: session-level resident-cache registry: {signature: (actors, assign)}.
#: The corpus cache is the engine's page cache (reference
#: pdict.PersistentDict persists ACROSS crawls — pdict.py:42-259), so
#: the shard fleet outlives one Crawler and is reused by every crawler
#: with the same store + extraction config; spawning 32 actor
#: processes costs seconds (dominated by per-process interpreter +
#: package import) and must not be paid per crawl.
_CACHE_FLEETS: dict = {}
#: at most this many shared fleets stay alive; the least recently used
#: is torn down when a new store's fleet is built (test sessions churn
#: through many small tmp stores)
_CACHE_FLEETS_MAX = 4


def _cache_fits(corpus) -> bool:
    """Memory gate for the resident tier."""
    import ray

    osm = ray.cluster_resources().get('object_store_memory', 0)
    return bool(osm) and corpus.total_bytes() <= \
        RESIDENT_OBJECT_STORE_FRACTION * osm


def _build_cache_fleet(corpus, with_contacts, with_excerpt,
                       allowed_urls, banned_urls, robots, with_redirect):
    """Spawn the shard actors for ``corpus``; returns the registry
    entry {'actors', 'assign', 'cols', 'ready'} or None (empty store).
    """
    import ray

    per_bucket = [corpus._bucket_files([b])
                  for b in range(corpus.num_buckets)]
    first = next((fs[0] for fs in per_bucket if fs), None)
    if first is None:
        return None
    cols = corpus._available_columns(first, ['url', 'html', 'warc_ts'])
    file_schema = pq.read_schema(first)
    shard_schema = pa.schema([file_schema.field(c) for c in cols])
    avail = int(ray.cluster_resources().get('CPU', 8))
    # one shard per bucket when the cluster is at least that wide:
    # balanced extraction load (a k that doesn't divide the bucket
    # count gives some actors 2x the pages — a measured straggler)
    k = max(1, min(avail, corpus.num_buckets))
    groups = [[] for _ in range(k)]
    assign = {}
    for b, fs in enumerate(per_bucket):
        assign[b] = b % k
        groups[b % k].extend(fs)
    cls = ray.remote(num_cpus=0)(CorpusCacheShard)  # see ExtractWorker
    actors = [cls.remote(groups[i], cols, with_contacts, with_excerpt,
                         allowed_urls, banned_urls, robots,
                         with_redirect, schema=shard_schema)
              for i in range(k)]
    return {'actors': actors, 'assign': assign, 'cols': cols,
            'ready': [a.ping.remote() for a in actors], 'pins': 0}


def _register_fleet(sig, entry):
    """Insert into the shared registry, evicting LRU beyond the cap.

    Eviction only considers UNPINNED entries (pins = crawlers currently
    attached via ``_cache_pool``): killing a fleet a live crawler still
    holds would fail its next wave mid-crawl.  When every entry is
    pinned the cap is allowed to overflow — the attached crawlers
    release their pins at ``_close_cache`` and the next registration
    reclaims."""
    import ray

    _CACHE_FLEETS[sig] = entry
    while len(_CACHE_FLEETS) > _CACHE_FLEETS_MAX:
        old_sig = next((s for s, e in _CACHE_FLEETS.items()
                        if s != sig and not e.get('pins', 0)), None)
        if old_sig is None:
            break
        old = _CACHE_FLEETS.pop(old_sig)
        for a in old['actors']:
            try:
                ray.kill(a)
            except Exception:
                pass


def _touch_fleet(sig):
    """Mark ``sig`` most-recently-used (dict order is the LRU order)."""
    _CACHE_FLEETS[sig] = _CACHE_FLEETS.pop(sig)


def warm_corpus_cache(corpus, with_contacts: bool = False,
                      with_excerpt: bool = False, allowed_urls: str = '',
                      banned_urls: str = '^$',
                      with_redirect: bool = False) -> bool:
    """Build (and block until loaded) the shared resident cache fleet
    for ``corpus`` — idempotent; returns False when the memory gate
    keeps the tier off.  Call once per session before latency-sensitive
    crawls; crawlers with a matching config then attach instantly."""
    if not _cache_fits(corpus):
        return False
    sig = (corpus.root, corpus.content_token(), with_contacts,
           with_excerpt, allowed_urls, banned_urls, with_redirect)
    entry = _CACHE_FLEETS.get(sig)
    if entry is None:
        entry = _build_cache_fleet(corpus, with_contacts, with_excerpt,
                                   allowed_urls, banned_urls, None,
                                   with_redirect)
        if entry is None:
            return False
        _register_fleet(sig, entry)
    else:
        _touch_fleet(sig)
    if entry['ready']:
        import ray

        ray.get(entry['ready'])
        entry['ready'] = None
    return True


def close_corpus_caches():
    """Kill every shared cache fleet (tests / session teardown)."""
    import ray

    for entry in _CACHE_FLEETS.values():
        for a in entry['actors']:
            try:
                ray.kill(a)
            except Exception:
                pass
    _CACHE_FLEETS.clear()


class StopCrawl(Exception):
    """Raise from a ``cb`` to halt the crawl (reference
    download.py:769-772).  The raising visit still records (links
    discarded); nothing after it runs."""


class CbCandidates:
    """cb-mode extract stage: page → text/status + callback links.

    The reference's central extension point ``cb(D, url, html) ->
    links`` (download.py:775-841): returned urls enqueue verbatim —
    no normalization, no validity chain, no max_links cap (those are
    the callback's business; ``CrawlerCallback`` is just one cb).
    Engine-side first-seen dedup still applies (the reference leaves
    dedup to the callback's HashDict; the wave engine owns the seen
    set).  ``StopCrawl`` and per-page cb exceptions are caught here
    and surfaced as columns for the fold.
    """

    def __init__(self, cb):
        self.cb = cb

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column('url').to_pylist()
        htmls = batch.column('html').to_pylist()
        texts, statuses, links_col, hash_col, valid_col, stops = \
            [], [], [], [], [], []
        for url, raw in zip(urls, htmls):
            page = T.html_to_unicode(raw) if raw is not None else ''
            statuses.append(200)
            texts.append(T.normalize(page))
            links, stop = run_cb(self.cb, url, page)
            links_col.append(links)
            hash_col.append([U.url_hash64(l) for l in links])
            valid_col.append([True] * len(links))
            stops.append(stop)
        cols = {
            'url': pa.array(urls, pa.string()),
            'text': pa.array(texts, pa.large_string()),
            'status': pa.array(statuses, pa.int32()),
            'cand_link': pa.array(links_col, pa.list_(pa.string())),
            'cand_hash': pa.array(hash_col, pa.list_(pa.int64())),
            'cand_valid': pa.array(valid_col, pa.list_(pa.bool_())),
            'cb_stop': pa.array(stops, pa.bool_()),
        }
        if 'warc_ts' in batch.column_names:
            # ride the snapshot ts through so the big-wave merge loop
            # can resolve latest-per-url / freshness on cb crawls too
            cols['warc_ts'] = batch.column('warc_ts')
        return pa.table(cols)


def run_cb(cb, url: str, page: str):
    """(links, stop) from one callback invocation — reference error
    handling: StopCrawl stops the crawl, any other exception is logged
    and swallowed (download.py:824-831)."""
    try:
        return list(cb(url, page) or []), False
    except StopCrawl:
        return [], True
    except Exception:
        import logging

        logging.getLogger(__name__).exception('in callback for %s', url)
        return [], False


class Crawler:
    """BFS wave-loop crawler over a bucketed Parquet corpus."""

    #: checkpoint lineage writes a FULL seen-set snapshot every this
    #: many waves and O(wave) added-key deltas in between; resume
    #: replays at most this many deltas on top of the last full one
    SEEN_FULL_SNAPSHOT_EVERY = 16

    def __init__(self, corpus, max_depth: int = 1, max_links: int = 100,
                 allowed_urls: str = '', banned_urls: str = '^$', robots=None,
                 delay: float = 5.0, throttle_additional_key: str | None = None,
                 seen_kind: str = 'exact',
                 num_seen_shards: int = 4, num_politeness_shards: int = 2,
                 seen_capacity_per_shard: int = 1 << 20,
                 use_ray: bool = True, extract_concurrency=None,
                 batch_size: int = 256, checkpoint_dir: str | None = None,
                 with_contacts: bool = False, with_excerpt: bool = False,
                 num_redirects: int = 0, state_file: str | None = None,
                 as_of_ts: int | None = None, output_dir: str | None = None,
                 collect_visits: bool = True,
                 inline_threshold: int = 256, table_threshold: int = 2048,
                 resolve_distributed_threshold: int = 50_000,
                 frontier_queue_dir: str | None = None,
                 frontier_spill_threshold: int = 100_000,
                 cb=None, max_urls: int | None = None,
                 max_errors: int | None = None,
                 now_ts: int | None = None, max_age_us: int | None = None,
                 mega_wave_chunk: int | None = 1_000_000,
                 politeness_clock: str = 'frozen',
                 resident_corpus: bool | None = None,
                 resolve_metadata_limit: int | None = None):
        """corpus: CorpusStore, or pyarrow.Table (tests), or dict url->html.

        cb: per-page callback ``cb(url, page) -> iterable of urls``
        replacing the built-in link policy (reference threaded_get's
        ``cb``, download.py:775-841); raise :class:`StopCrawl` inside
        it to halt.  max_urls caps total visits (download.py:1102);
        max_errors stops once non-200 visits exceed it
        (async.py:264-269)."""
        self.corpus = corpus
        self.max_depth = max_depth
        self.max_links = max_links
        self.allowed_urls = allowed_urls
        self.banned_urls = banned_urls
        self.robots = robots
        self.delay = delay
        self.use_ray = use_ray
        self.batch_size = batch_size
        self.extract_concurrency = extract_concurrency
        self.checkpoint_dir = checkpoint_dir
        self.with_contacts = with_contacts
        self.with_excerpt = with_excerpt
        self.num_redirects = num_redirects
        # partitioned, resumable output: one parquet dir per wave,
        # committed atomically; a rerun skips completed waves
        self.output_dir = output_dir
        # collect_visits=False is the corpus-scale contract: every
        # wave streams to output_dir parquet and run() returns None —
        # the driver never retains a visits table (the small-wave path
        # returns text+links columns, so retaining every wave is
        # O(crawl text) driver memory on a long BFS tail)
        if not collect_visits and not output_dir:
            raise ValueError('collect_visits=False requires output_dir '
                             '(the visits live only in the parquet sink)')
        self.collect_visits = collect_visits
        # as-of snapshot selection: fetch the latest snapshot with
        # warc_ts <= as_of_ts (None = latest overall) when the corpus
        # holds multiple snapshots per url (SURVEY §2.4 as-of join)
        self.as_of_ts = as_of_ts
        # wave-size tiers for the fetch (see _fetch_extract): at 10^10
        # scale only the lookup_ds path runs; the lower tiers kill the
        # fixed Ray-job latency that dominates small BFS waves.  The
        # table default (2048) is the measured driver-scan vs
        # distributed-point-read crossover on a KB-page host-layout
        # store (lookup_table 2.9 s vs lookup_ds 3.6 s at 1,372 urls;
        # 7.7 s vs 3.9 s at 7,455 — BASELINE.md round 4); the driver
        # scan also doesn't scale with the cluster, so mid waves
        # belong distributed.
        self.inline_threshold = inline_threshold
        self.table_threshold = table_threshold
        # distributed-RESOLVE threshold (≠ the fetch tiers): above it a
        # wave's text/candidates never touch the driver.  Sized to the
        # driver-memory budget — the fold holds O(wave) text+links, so
        # ~50k rows ≈ a few hundred MB; below that the sequential fold
        # is both exact and faster (no per-wave shuffle-job latency)
        self.resolve_distributed_threshold = resolve_distributed_threshold
        # middle resolve tier (within the distributed wave path): when
        # the wave's TOTAL candidate count fits this budget, the
        # resolution runs as the exact sequential fold over candidate
        # METADATA pulled to the driver (url/hash/valid — never page
        # text or, above RESOLVE_LINK_PULL_INLINE candidates, link
        # strings: winner links come back via a broadcast-hash
        # distributed filter, so the serial pull is ~25 B/candidate).
        # It replaces 4-5 hash-shuffle jobs whose fixed latency
        # dominates resolution up to ~10^6-row waves (measured: 85 s →
        # ~5 s on a 274k-row wave, BASELINE.md round 3).  Waves beyond
        # the budget take the fully distributed groupby-min resolve.
        # None = AUTO, derived from cluster width at first use (see
        # _resolve_limit): the fold is the wave's only serial fraction,
        # so its budget must SHRINK as the cluster widens — a constant
        # tuned on one node silently becomes the scaling ceiling on 256.
        # Set to 0 to force the distributed resolve always, or to a
        # count to pin the tier boundary.
        self.resolve_metadata_limit = resolve_metadata_limit
        # spill frontier (reference pdict.Queue, pdict.py:402-497):
        # waves larger than the threshold live in the durable on-disk
        # queue instead of a driver Python list — depth rides encoded
        # in the key so pull (seq order) replays discovery order
        self.frontier_queue_dir = frontier_queue_dir
        self.frontier_spill_threshold = frontier_spill_threshold
        # mega-wave chunking: a spilled wave is pulled and processed in
        # sub-chunks of at most this many urls, so driver memory is
        # O(chunk) — never O(wave) — at 10^8-row frontier scale.  BFS
        # order is preserved because the queue is a global seq-ordered
        # FIFO: a chunk's discovered links are pushed with higher seq
        # than the wave's remaining keys, so they pull after them.
        # None = unlimited (whole wave per pull).
        self.mega_wave_chunk = mega_wave_chunk
        self._frontier_queue = None
        # journal=checkpointing: shards record per-wave added-key
        # deltas only when checkpoints drain them (delta lineage —
        # full filter snapshots every wave would be O(seen) x waves)
        self.seen = ShardedSeenSet(num_seen_shards, seen_kind,
                                   seen_capacity_per_shard, use_ray=use_ray,
                                   journal=bool(checkpoint_dir))
        self._seen_base_wave = None     # wave of the last FULL snapshot
        self.politeness = PolitenessPool(num_politeness_shards, delay,
                                         use_ray=use_ray,
                                         additional_key=throttle_additional_key,
                                         journal=bool(checkpoint_dir))
        # politeness clock model (state/politeness.py): 'frozen' (the
        # vendored-oracle default: every wave starts at t=0, per-host
        # pacing contract) or 'continuous' (reference
        # download.py:454-473 single wall clock: each wave starts at
        # the previous wave's max scheduled slot).  Under mega-wave
        # chunking the continuous clock's wave granularity is the
        # processed chunk.
        if politeness_clock not in ('frozen', 'continuous'):
            raise ValueError('politeness_clock must be frozen|continuous')
        self.politeness_clock = politeness_clock
        # resident-corpus fetch tier: None = auto (on iff the store
        # fits RESIDENT_OBJECT_STORE_FRACTION of the cluster object
        # store), True/False force.  See _resident_ds.
        self.resident_corpus = resident_corpus
        self._resident = None
        self._resident_cols = None
        self._cache_entry = None
        self._wave_start = 0.0
        self.cb = cb
        self.max_urls = max_urls
        self.max_errors = max_errors
        # cache expiry (PersistentDict expires, reference pdict.py:50-51,
        # is_fresh: now - updated < expires): a snapshot older than
        # max_age counts as a cache miss — with a static corpus (no
        # network) the fetch returns the 404/default path, mirroring
        # D.get with use_network=False on a stale key
        self.min_fresh_ts = (None if max_age_us is None
                             else (now_ts or 0) - max_age_us)
        self.error_count = 0
        self._stopped = False
        self.visit_counter = 0
        self.wave = 0
        self._pool = None
        self.state = CrawlState(state_file)

    # ------------------------------------------------------------------
    def _extract_pool(self):
        """Lazily create the persistent extraction actor pool."""
        if self._pool is None:
            import ray

            avail = int(ray.cluster_resources().get('CPU', 8))
            # leave one CPU for driver-adjacent tasks; state actors are
            # 0-cpu so the pool can never oversubscribe into deadlock
            k = self.extract_concurrency or max(1, min(16, avail - 1))
            cls = ray.remote(num_cpus=1)(ExtractWorker)
            self._pool = [cls.remote(self.with_contacts, self.with_excerpt,
                                     self.allowed_urls, self.banned_urls,
                                     self.robots, self.num_redirects > 0)
                          for _ in range(k)]
        return self._pool

    def _lookup_html_map(self, urls):
        """Bulk html lookup: {url: html_bytes} for existing urls."""
        if not urls:
            return {}
        if isinstance(self.corpus, dict):
            return {u: self.corpus[u] for u in urls if u in self.corpus}
        if isinstance(self.corpus, pa.Table):
            tbl = self.corpus.filter(pc.is_in(
                self.corpus.column('url'),
                value_set=pa.array(list(urls), pa.string())))
        else:
            tbl = self.corpus.lookup_table(list(urls),
                                           columns=['url', 'html', 'warc_ts'])
        if tbl is None:
            return {}
        tbl = self._latest_snapshot(tbl)  # multi-snapshot redirect targets
        return dict(zip(tbl.column('url').to_pylist(),
                        tbl.column('html').to_pylist()))

    def _resolve_redirects(self, records):
        """Chase meta-redirects (reference download.py:254-268).

        Batched per hop level: all pending targets of the wave are one
        corpus lookup; re-extraction of resolved pages runs as one
        inline batch (redirect pages are a small corpus fraction).
        """
        pending = {u: {'parent': u, 'target': rec['redirect'],
                       'n': self.num_redirects}
                   for u, rec in records.items() if rec.get('redirect')}
        finals = {}
        while pending:
            targets = sorted({s['target'] for s in pending.values()})
            fetched = self._lookup_html_map(targets)
            nxt = {}
            for u, s in pending.items():
                raw = fetched.get(s['target'])
                page = T.html_to_unicode(raw) if raw is not None else ''
                n = s['n'] - 1
                r = U.get_redirect(s['target'], page) if (n > 0 and page) else None
                if r:
                    nxt[u] = {'parent': s['target'], 'target': r, 'n': n}
                else:
                    final_page = (U.rewrite_relative_hrefs(page, s['parent'])
                                  if page else '')
                    finals[u] = (final_page, s['target'])
            pending = nxt
        if finals:
            extract = ExtractPages(with_links=True,
                                   with_contacts=self.with_contacts,
                                   with_excerpt=self.with_excerpt,
                                   with_redirect=True)
            prep = PrepCandidates(self.allowed_urls, self.banned_urls,
                                  self.robots)
            urls = sorted(finals)
            tbl = pa.table({
                'url': pa.array(urls, pa.string()),
                'page': pa.array([finals[u][0] for u in urls], pa.string()),
            })
            for rec in prep(extract(tbl)).to_pylist():
                u = rec['url']
                rec['final_url'] = finals[u][1]
                rec['status'] = records[u]['status']
                records[u] = rec

    def _host(self, url: str) -> str:
        # no cache: each url is visited at most once per crawl, so a
        # url-keyed cache would only grow without ever hitting
        return T.get_domain(url)

    def _latest_snapshot(self, tbl: pa.Table) -> pa.Table:
        """Resolve duplicate-url snapshots: keep the latest warc_ts
        (<= as_of_ts when set).  No-op for single-snapshot corpora.

        Assumes snapshots of one url have distinct warc_ts (true of a
        WARC corpus); equal-ts duplicates would resolve arbitrarily in
        the distributed path."""
        if tbl is None or 'warc_ts' not in tbl.column_names:
            return tbl
        if self.min_fresh_ts is not None:
            # expiry: stale snapshots are cache misses (is_fresh:
            # now - updated < expires ⇔ fresh iff warc_ts > now - max_age)
            tbl = tbl.filter(pc.greater(
                tbl['warc_ts'], pa.scalar(self.min_fresh_ts,
                                          tbl.schema.field('warc_ts').type)))
        if self.as_of_ts is not None:
            tbl = tbl.filter(pc.less_equal(
                tbl['warc_ts'], pa.scalar(self.as_of_ts,
                                          tbl.schema.field('warc_ts').type)))
        urls = tbl.column('url').to_pylist()
        if len(set(urls)) == len(urls):
            return tbl
        ts = tbl.column('warc_ts').to_pylist()
        best = {}
        for idx, (u, t) in enumerate(zip(urls, ts)):
            cur = best.get(u)
            if cur is None or t >= ts[cur]:
                best[u] = idx
        return tbl.take(sorted(best.values()))

    def _fetch_extract(self, unique_urls):
        """Distributed fetch + extract for the wave's unique urls.

        Returns {url: record} with text/status/candidates (+contacts).
        """
        extract = ExtractPages(with_links=True,
                               with_contacts=self.with_contacts,
                               with_excerpt=self.with_excerpt,
                               with_redirect=self.num_redirects > 0)
        prep = PrepCandidates(self.allowed_urls, self.banned_urls, self.robots)
        if self.cb is not None:
            cb_stage = CbCandidates(self.cb)

            def _apply(tbl):
                return cb_stage(tbl)

            def _chain(ds, kw):
                return ds.map_batches(cb_stage, batch_format='pyarrow',
                                      batch_size=self.batch_size, **kw)
        else:
            def _apply(tbl):
                return prep(extract(tbl))

            def _chain(ds, kw):
                return (ds.map_batches(extract, batch_format='pyarrow',
                                       batch_size=self.batch_size, **kw)
                        .map_batches(prep, batch_format='pyarrow',
                                     batch_size=self.batch_size))

        if isinstance(self.corpus, dict):
            # in-memory corpus (tests): run kernels inline
            rows = [{'url': u, 'html': self.corpus.get(u)} for u in unique_urls
                    if self.corpus.get(u) is not None]
            tbl = pa.table({
                'url': pa.array([r['url'] for r in rows], pa.string()),
                'html': pa.array([r['html'] for r in rows], pa.binary()),
            })
            batches = [_apply(tbl)]
        elif isinstance(self.corpus, pa.Table):
            mask = pc.is_in(self.corpus.column('url'),
                            value_set=pa.array(unique_urls, pa.string()))
            cols = ['url', 'html'] + (
                ['warc_ts'] if 'warc_ts' in self.corpus.column_names else [])
            tbl = self._latest_snapshot(self.corpus.filter(mask).select(cols))
            tbl = tbl.select(['url', 'html'])
            if self.use_ray:
                import ray.data
                kw = {}
                if self.extract_concurrency:
                    kw['concurrency'] = self.extract_concurrency
                ds = _chain(ray.data.from_arrow(tbl), kw)
                batches = list(ds.iter_batches(batch_size=4096,
                                               batch_format='pyarrow'))
            else:
                batches = [_apply(tbl)]
        else:  # CorpusStore — tiered by wave size
            import ray

            n = len(unique_urls)
            pool = self._cache_pool()
            if (pool is not None and n <= self.inline_threshold
                    and not self._cache_ready()):
                # shards still spawning/loading: serve this tiny wave
                # from the inline parquet tier below (identical output
                # by construction) instead of blocking on the cold
                # start; bigger waves are worth the wait
                pool = None
            if pool is not None:
                # resident tier: ONE RPC round per wave — each cache
                # shard holds its buckets in memory and runs the
                # extraction kernels in place, so no parquet decode and
                # no Ray Data job latency per wave.  cb crawls fetch
                # raw and run the callback stage inline (the cb is a
                # driver-side user object).
                refs = self._cache_refs(unique_urls,
                                        extract=self.cb is None)
                if self.cb is None:
                    batches = ray.get(refs)
                else:
                    batches = [_apply(t) for t in ray.get(refs)]
            elif n <= self.inline_threshold:
                # tiny wave: driver-side pyarrow scan + inline kernels
                # (a Ray job's fixed latency dwarfs the work here)
                tbl = self.corpus.lookup_table(
                    list(unique_urls), columns=['url', 'html', 'warc_ts'])
                if tbl is None:
                    return {}
                tbl = self._latest_snapshot(tbl).select(['url', 'html'])
                batches = [_apply(tbl)]
            elif n <= self.table_threshold and self.cb is None:
                # mid wave: one multithreaded pyarrow scan on the driver,
                # extraction fanned over the persistent actor pool
                import ray

                tbl = self.corpus.lookup_table(
                    list(unique_urls), columns=['url', 'html', 'warc_ts'])
                if tbl is None:
                    return {}
                tbl = self._latest_snapshot(tbl).select(['url', 'html'])
                pool = self._extract_pool()
                k = len(pool)
                chunk = max(1, (tbl.num_rows + k - 1) // k)
                futs = [pool[j].process.remote(tbl.slice(j * chunk, chunk))
                        for j in range(k) if j * chunk < tbl.num_rows]
                batches = ray.get(futs)
            else:
                # big wave: fully distributed partition-pruned read (or
                # the resident in-memory filter when that tier is on);
                # warc_ts rides along so the records merge below keeps
                # the latest snapshot per url
                ds = self._lookup_wave_ds(
                    list(unique_urls), columns=['url', 'html', 'warc_ts'])
                if ds is None:
                    return {}
                kw = {}
                if self.extract_concurrency:
                    kw['concurrency'] = self.extract_concurrency
                ds = _chain(ds, kw)
                batches = ds.iter_batches(batch_size=4096,
                                          batch_format='pyarrow')

        records = {}
        for b in batches:
            # the big-wave (lookup_ds) tier carries warc_ts through so
            # this merge resolves latest-per-url; the inline/mid tiers
            # pre-filter via _latest_snapshot and drop the column.  The
            # freshness/as-of filters here must mirror _latest_snapshot
            # exactly (null ts is dropped by its pyarrow comparisons).
            has_ts = 'warc_ts' in b.column_names
            for r in b.to_pylist():
                ts = r.get('warc_ts')
                if has_ts and self.min_fresh_ts is not None and \
                        (ts is None or _ts_us(ts) <= self.min_fresh_ts):
                    continue  # stale snapshot == cache miss (expiry)
                if has_ts and self.as_of_ts is not None and \
                        (ts is None or _ts_us(ts) > self.as_of_ts):
                    continue
                prev = records.get(r['url'])
                if prev is None or ts is None or \
                        _ts_us(prev.get('warc_ts')) <= _ts_us(ts):
                    records[r['url']] = r
        return records

    # ------------------------------------------------------------------
    # resident-corpus fetch tier (cache-what-fits actor pool)

    def _cache_pool(self):
        """Resident-corpus shard actors, or None when the tier is off.

        Decided ONCE per crawler from cluster resources: on iff the
        store's bytes fit RESIDENT_OBJECT_STORE_FRACTION of the
        object store (or forced via ``resident_corpus``).  Each actor
        loads its assigned buckets' (url, html[, warc_ts]) columns
        once; every wave's fetch is then ONE RPC per shard
        (searchsorted point lookup + in-place extraction) instead of a
        parquet re-decode of every touched bucket — a BFS wave over a
        hash-bucketed store otherwise re-reads near the whole corpus
        per wave, and a Ray Data job carries ~1 s fixed latency that
        dominates small waves.  At 100-TB corpus scale the memory gate
        turns the tier off and the pruned point read runs instead."""
        if self._resident is not None:
            return self._resident or None
        if (self.resident_corpus is False
                or not isinstance(self.corpus, CorpusStore)
                or not self.use_ray):
            self._resident = False
            return None
        if self.resident_corpus is None and not _cache_fits(self.corpus):
            self._resident = False
            return None
        # shared registry: the fleet persists across crawlers with the
        # same store + extraction config (the page cache OUTLIVES one
        # crawl, reference pdict.py:42-259) — spawning 32 actor
        # processes costs seconds and must not be paid per crawl.  A
        # crawler with a robots object gets a private fleet (robots
        # identity can't key the registry).
        # content_token: a store REWRITTEN at the same root must not
        # attach to the old fleet (stale pages)
        sig = (self.corpus.root, self.corpus.content_token(),
               self.with_contacts, self.with_excerpt,
               self.allowed_urls, self.banned_urls,
               self.num_redirects > 0)
        entry = _CACHE_FLEETS.get(sig) if self.robots is None else None
        if entry is None:
            entry = _build_cache_fleet(
                self.corpus, self.with_contacts, self.with_excerpt,
                self.allowed_urls, self.banned_urls, self.robots,
                self.num_redirects > 0)
            if entry is None:
                self._resident = False
                return None
            if self.robots is None:
                _register_fleet(sig, entry)
                self._resident_shared = True
            else:
                self._resident_shared = False
        else:
            _touch_fleet(sig)
            self._resident_shared = True
        self._resident_cols = entry['cols']
        self._resident = (entry['actors'], entry['assign'])
        self._cache_entry = entry
        if getattr(self, '_resident_shared', False):
            # pin against LRU eviction while this crawler is attached
            entry['pins'] = entry.get('pins', 0) + 1
        return self._resident

    def _cache_ready(self) -> bool:
        """Non-blocking: True once every cache shard finished loading.

        Early waves fall back to the parquet tiers while the fleet is
        still spawning/loading (actor cold start is seconds; a 64-url
        wave 0 must not block on it)."""
        entry = getattr(self, '_cache_entry', None)
        if entry is None or not entry['ready']:
            return True
        import ray

        _, pending = ray.wait(entry['ready'],
                              num_returns=len(entry['ready']),
                              timeout=0)
        if pending:
            return False
        entry['ready'] = None
        return True

    def _cache_refs(self, urls, columns=None, extract=False):
        """Route urls to their cache shards; one RPC ref per shard.

        Vectorized (the ``AddBucket``/``_touched_buckets`` shape): one
        netloc pass + one blake2b per DISTINCT host under the host
        layout, numpy argsort grouping — no per-url urlsplit+hash
        driver loop (a measured ~2.5 us/url serialization at mega-wave
        sizes)."""
        from ..sources.store import bucket_ids

        actors, assign = self._cache_pool()
        urls = list(urls)
        bids = bucket_ids(urls, self.corpus.num_buckets,
                          self.corpus.layout)
        actor_of = np.array([assign[b]
                             for b in range(self.corpus.num_buckets)],
                            dtype=np.int32)
        aids = actor_of[bids]
        order = np.argsort(aids, kind='stable')
        urls_arr = np.asarray(urls, dtype=object)[order]
        uniq, starts = np.unique(aids[order], return_index=True)
        return [actors[int(a)].take_extract.remote(list(us)) if extract
                else actors[int(a)].take.remote(list(us), columns)
                for a, us in zip(uniq,
                                 np.split(urls_arr, starts[1:]))]

    def _lookup_wave_ds(self, urls, columns, postprocess=None):
        """Wave fetch as a Dataset: resident cache shards when the
        tier is on (blocks = shard results, zero parquet decode), else
        the store's pruned lookup_ds.  ``postprocess`` (corpus path
        only — callers pass it only when the resident tier is off)
        fuses a transform into the point-read tasks."""
        if self._cache_pool() is None:
            return self.corpus.lookup_ds(list(urls), columns=columns,
                                         postprocess=postprocess)
        import ray.data

        return ray.data.from_arrow_refs(
            self._cache_refs(urls, columns=columns, extract=False))

    # ------------------------------------------------------------------
    # spill frontier (pdict.Queue as the disk-backed deque,
    # reference pdict.py:402-497 + download.py:843)

    def _queue(self):
        if self._frontier_queue is None:
            from .frontier import ParquetQueue

            # fifo mode: the crawl pushes globally-unique keys (seen-set
            # registration precedes every push) at constant priority, so
            # the queue keeps NO per-key driver state — one (priority,
            # seq) claim watermark instead of O(keys) hash/claim sets;
            # at a 10^10-url frontier the driver holds its chunk buffer
            # and nothing else
            self._frontier_queue = ParquetQueue(self.frontier_queue_dir,
                                                mode='fifo')
        return self._frontier_queue

    def _spill_or_keep(self, new_frontier):
        """Frontiers above the threshold go to the durable queue; the
        driver keeps only the marker.  A wave is pushed at constant
        priority so pull order (priority desc, then seq) replays the
        wave's exact discovery order — a wave can mix depths (a seed
        skipped by a max-depth parent keeps depth 0 beside depth-k
        links), so depth must NOT drive the ordering; it rides encoded
        in the key.  A url enters the frontier at most once per crawl
        (seen-set registration), so the depth prefix never splits one
        url into two queue keys in practice.

        When the queue still holds unclaimed keys (a chunked mega-wave
        in progress), the new frontier ALWAYS spills regardless of
        size: its keys must pull after the wave's remaining keys (seq
        order) to preserve BFS order."""
        if self.frontier_queue_dir is None:
            return new_frontier
        queue_busy = (self._frontier_queue is not None
                      and len(self._frontier_queue) > 0)
        if queue_busy or len(new_frontier) > self.frontier_spill_threshold:
            self._queue().push([('%d|%s' % (d, u), 0) for u, d in new_frontier])
            return _SPILLED
        return new_frontier

    def _materialize_frontier(self, frontier):
        """In-memory frontiers pass through; a spilled frontier pulls
        at most ``mega_wave_chunk`` keys (and never more than the
        remaining ``max_urls`` budget, so no pulled key is ever
        silently dropped — unclaimed keys stay pullable/re-pushable)."""
        if frontier == _SPILLED:
            q = self._queue()
            limit = len(q)
            if self.mega_wave_chunk is not None:
                limit = min(limit, self.mega_wave_chunk)
            if self.max_urls is not None:
                limit = min(limit, self.max_urls - self.visit_counter)
            out = []
            for key in q.pull(limit=limit):
                d, u = key.split('|', 1)
                out.append((u, int(d)))
            return out
        return frontier

    def _frontier_drained(self, frontier) -> bool:
        if frontier == _SPILLED:
            return len(self._queue()) == 0
        return not frontier

    # ------------------------------------------------------------------
    def run(self, seeds=(), max_waves: int | None = None,
            stop_after_wave: int | None = None, seed_iter=None):
        """Crawl from ``seeds`` (list of urls, queue order).

        ``seed_iter``: optional lazy seed generator (the reference's
        ``url_iter``, download.py:775-801): when the frontier drains,
        ONE url is pulled from it — mirroring ``add_iter_urls``'s
        one-at-a-time refill — so each streamed seed is crawled to
        completion before the next is read.

        Returns a pyarrow Table of visits in crawl order:
        (url, depth, visit_order, status, scheduled_ts, text, links).
        """
        frontier = [(u, 0) for u in seeds]  # (url, depth_hint)
        if isinstance(self.corpus, CorpusStore) and self.use_ray:
            # prewarm: actors spawn/load during early waves.  The
            # resident cache pool replaces the extract pool wholesale.
            if self._cache_pool() is None:
                self._extract_pool()
        return self._crawl_loop(frontier, max_waves, stop_after_wave,
                                seed_iter)

    def _crawl_loop(self, frontier, max_waves=None, stop_after_wave=None,
                    seed_iter=None):
        it = iter(seed_iter) if seed_iter is not None else None
        all_visits = []
        while True:
            if self._frontier_drained(frontier) and it is not None:
                nxt = next(it, None)
                if nxt is None:
                    it = None
                else:
                    frontier = [(nxt, 0)]
            if self._frontier_drained(frontier):
                break
            if max_waves is not None and self.wave >= max_waves:
                break
            if self._stopped:
                break
            if self.max_urls is not None and \
                    self.visit_counter >= self.max_urls:
                # visit budget exhausted (reference DataCrawler
                # len(scraped) < max_urls, download.py:1102); a spilled
                # frontier's keys stay unclaimed in the queue
                break
            wave_frontier = self._materialize_frontier(frontier)
            if self.max_urls is not None and frontier != _SPILLED:
                # in-memory path: truncate to the budget (the spilled
                # path budget-limits the pull itself)
                wave_frontier = wave_frontier[:self.max_urls
                                              - self.visit_counter]
            if not wave_frontier:
                frontier = []
                continue
            visits = self._run_wave(wave_frontier)
            if self.collect_visits:
                all_visits.append(visits)
            frontier = self._spill_or_keep(self._next_frontier)
            if self.checkpoint_dir:
                self._checkpoint(frontier)
            self.wave += 1
            if stop_after_wave is not None and self.wave > stop_after_wave:
                break
        self.close_pool()
        self._close_cache()
        if not self.collect_visits:
            return None          # visits live in output_dir parquet
        if all_visits:
            return pa.concat_tables(all_visits, promote_options='default')
        return _empty_visits()

    def close_pool(self):
        """Release the persistent extraction actors (recreated lazily).

        Does NOT touch the resident cache shards — close_pool runs
        before distributed waves to free pool CPUs, and those waves
        still fetch through the cache."""
        if self._pool is not None:
            import ray

            for a in self._pool:
                ray.kill(a)
            self._pool = None

    def _close_cache(self):
        """Detach from the resident cache (end of crawl).  Shared
        (registry) fleets stay alive for the next crawler — only a
        private (robots-bearing) fleet is killed here; use
        :func:`close_corpus_caches` to tear the shared ones down."""
        if self._resident and not getattr(self, '_resident_shared', True):
            import ray

            for a in self._resident[0]:
                ray.kill(a)
        entry = getattr(self, '_cache_entry', None)
        if (entry is not None and getattr(self, '_resident_shared', False)
                and entry.get('pins', 0) > 0):
            entry['pins'] -= 1
        self._resident = None
        self._cache_entry = None

    def _run_wave(self, frontier):
        import time as _time

        stage_secs = {}
        urls = [u for u, _ in frontier]
        depth_hints = [d for _, d in frontier]
        n = len(urls)
        visit_orders = list(range(self.visit_counter, self.visit_counter + n))
        self.visit_counter += n

        # resumable-output fast path: if this wave's output is already
        # committed (from a prior killed run), it could be replayed
        # instead of recomputed; kept simple here — recompute, write.

        # 1. politeness schedule (virtual clock, queue order)
        t0 = _time.time()
        hosts = [self._host(u) for u in urls]
        scheduled = self.politeness.schedule(hosts, self._wave_start)
        if self.politeness_clock == 'continuous' and len(scheduled):
            self._wave_start = max(self._wave_start, float(scheduled.max()))
        stage_secs['politeness'] = _time.time() - t0

        # distributed-resolve tier: big waves never materialize page
        # text or candidate links on the driver (see
        # _run_wave_distributed).  Exactness precondition: every
        # frontier row already registered in the seen set (true for
        # every wave after the first — the previous wave's commit
        # registered them) and unique — then depth == depth_hint and
        # first-seen resolution is a pure groupby-min.  Wave 0 (or a
        # redirect-chasing crawl) takes the driver fold.
        if (self.use_ray and isinstance(self.corpus, CorpusStore)
                and n > self.resolve_distributed_threshold
                and self.num_redirects == 0
                and self.cb is None and self.max_errors is None
                and len(set(urls)) == n):
            t0 = _time.time()
            self_h = np.array([U.url_hash64(u) for u in urls], dtype=np.int64)
            preseen_self = self.seen.contains_batch(self_h.astype(np.uint64))
            stage_secs['seen_probe_self'] = _time.time() - t0
            if preseen_self.all():
                # the persistent mid-tier extraction pool reserves
                # CPUs; release it or the Dataset join's shuffle
                # aggregators can never schedule (recreated lazily if a
                # later, smaller wave takes the pool tier again)
                self.close_pool()
                return self._run_wave_distributed(
                    urls, depth_hints, visit_orders, scheduled, hosts,
                    stage_secs)

        # 2+3. fetch + extract + candidate prep (distributed)
        t0 = _time.time()
        unique_urls = list(dict.fromkeys(urls))
        records = self._fetch_extract(unique_urls)
        if self.num_redirects > 0:
            self._resolve_redirects(records)
        stage_secs['fetch_extract'] = _time.time() - t0

        # 4. batched dedup pre-probe: wave's candidate hashes + seed urls
        t0 = _time.time()
        cand_hashes = []
        for u in unique_urls:
            rec = records.get(u)
            if rec:
                cand_hashes.extend(rec['cand_hash'])
        self_hashes = [U.url_hash64(u) for u in urls]
        probe_keys = np.array(self_hashes + cand_hashes, dtype=np.int64)
        preseen_arr = self.seen.contains_batch(probe_keys.astype(np.uint64))
        preseen = dict(zip(probe_keys.tolist(), preseen_arr.tolist()))
        stage_secs['seen_probe'] = _time.time() - t0
        t0 = _time.time()

        # 5. the sequential resolve fold (exact reference bookkeeping)
        local = {}            # hash -> depth registered this wave
        new_frontier = []
        out = {k: [] for k in ('url', 'final_url', 'depth', 'visit_order',
                               'status', 'scheduled_ts', 'text', 'links')}
        extra = {}
        if self.with_contacts:
            extra['emails'] = []
            extra['phones'] = []
        if self.with_excerpt:
            extra['excerpt'] = []

        truncated = False
        for i, (url, depth_hint) in enumerate(frontier):
            h = self_hashes[i]
            if h in local:
                depth = local[h]
            elif preseen[h]:
                depth = depth_hint   # registered at discovery with this depth
            else:
                local[h] = depth_hint
                depth = depth_hint
            rec = records.get(url)
            status = rec['status'] if rec else 404
            text = rec['text'] if rec else ''
            stop_here = False
            if self.cb is not None and rec is None:
                # the reference calls cb even on a failed fetch with the
                # default '' html (download.py:819-822)
                cand_links, stop_here = run_cb(self.cb, url, '')
                rec = {'cand_link': cand_links,
                       'cand_hash': [U.url_hash64(l) for l in cand_links],
                       'cand_valid': [True] * len(cand_links)}
                # re-probe: these hashes were not in the wave pre-probe
                for lh in rec['cand_hash']:
                    if lh not in preseen:
                        preseen[lh] = bool(self.seen.contains_batch(
                            np.array([lh], dtype=np.int64).astype(np.uint64))[0])
            elif rec is not None:
                stop_here = bool(rec.get('cb_stop', False))
            outstanding = []
            if (rec is not None and not stop_here
                    and (self.cb is not None or depth != self.max_depth)):
                cap = None if self.cb is not None else self.max_links
                for link, lh, valid in zip(rec['cand_link'], rec['cand_hash'],
                                           rec['cand_valid']):
                    if lh not in local and not preseen.get(lh, False):
                        local[lh] = depth + 1
                        if valid:
                            outstanding.append(link)
                            new_frontier.append((link, depth + 1))
                            if cap is not None and len(outstanding) == cap:
                                break
            out['url'].append(url)
            out['final_url'].append(rec.get('final_url', url) if rec else url)
            out['depth'].append(depth)
            out['visit_order'].append(visit_orders[i])
            out['status'].append(status)
            out['scheduled_ts'].append(float(scheduled[i]))
            out['text'].append(text)
            out['links'].append(outstanding)
            if self.with_contacts:
                extra['emails'].append(rec.get('emails', []) if rec else [])
                extra['phones'].append(rec.get('phones', []) if rec else [])
            if self.with_excerpt:
                extra['excerpt'].append(rec.get('excerpt', '') if rec else '')
            # crawl-stop conditions: a cb raised StopCrawl (this visit
            # records, links discarded, nothing later runs) or the
            # error budget is exhausted (async.py:264-269)
            if status != 200:
                self.error_count += 1
                if (self.max_errors is not None
                        and self.error_count > self.max_errors):
                    truncated = True
            if stop_here:
                truncated = True
            if truncated:
                self._stopped = True
                break

        if truncated:
            new_frontier = []
            # roll the visit counter back to the visits actually made
            self.visit_counter = visit_orders[0] + len(out['url'])

        stage_secs['fold'] = _time.time() - t0

        # 6. commit registrations to the shard actors
        t0 = _time.time()
        if local:
            self.seen.add_batch(np.array(list(local), dtype=np.int64).astype(np.uint64))
        stage_secs['seen_commit'] = _time.time() - t0

        self._next_frontier = new_frontier
        host_hist = {}
        for h in hosts:
            host_hist[h] = host_hist.get(h, 0) + 1
        self.state.record_wave(
            wave=self.wave, n_rows=n,
            n_ok=sum(1 for s in out['status'] if s == 200),
            n_candidates=len(cand_hashes), n_new=len(local),
            queue_size=len(new_frontier), stage_secs=stage_secs,
            host_histogram=host_hist)
        cols = {
            'url': pa.array(out['url'], pa.string()),
            'final_url': pa.array(out['final_url'], pa.string()),
            'depth': pa.array(out['depth'], pa.int32()),
            'visit_order': pa.array(out['visit_order'], pa.int64()),
            'status': pa.array(out['status'], pa.int32()),
            'scheduled_ts': pa.array(out['scheduled_ts'], pa.float64()),
            'text': pa.array(out['text'], pa.large_string()),
            'links': pa.array(out['links'], pa.list_(pa.string())),
        }
        for k, v in extra.items():
            typ = pa.string() if k == 'excerpt' else pa.list_(pa.string())
            cols[k] = pa.array(v, typ)
        visits_tbl = pa.table(cols)
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            tmp = os.path.join(self.output_dir,
                               '_wave_%05d.parquet.tmp' % self.wave)
            final = os.path.join(self.output_dir,
                                 'wave_%05d.parquet' % self.wave)
            pq.write_table(visits_tbl, tmp)
            os.replace(tmp, final)
        return visits_tbl

    # ------------------------------------------------------------------
    # DFS compatibility mode (the reference DEFAULT: depth=True →
    # deque.pop() LIFO, download.py:811)

    def run_dfs(self, seeds):
        """Depth-first crawl — the reference's default traversal.

        DFS is inherently sequential (each visit depends on the last),
        so this runs a driver loop over single-url fetches through the
        engine's kernels, politeness pool and seen shards.  Use the
        BFS wave loop (:meth:`run`) for scale; this mode exists for
        reference-behavior parity (byte-matched against the vendored
        DFS oracle in tests).
        """
        stack = [(u, 0) for u in seeds]
        seed_hashes = {U.url_hash64(u) for u in seeds}
        seed_depths = {}        # seed hash -> depth registered by a link
        out = {k: [] for k in ('url', 'final_url', 'depth', 'visit_order',
                               'status', 'scheduled_ts', 'text', 'links')}
        while stack:
            if self.max_urls is not None and \
                    len(out['url']) >= self.max_urls:
                break
            url, depth_hint = stack.pop()
            h = U.url_hash64(url)
            host = self._host(url)
            # DFS is sequential, so under the continuous clock every
            # visit is its own "wave" (reference single wall clock)
            scheduled = float(self.politeness.schedule(
                [host], self._wave_start)[0])
            if self.politeness_clock == 'continuous':
                self._wave_start = max(self._wave_start, scheduled)
            if self.seen.contains_batch(
                    np.array([h], dtype=np.int64).astype(np.uint64))[0]:
                depth = seed_depths.get(h, depth_hint)
            else:
                self.seen.add_batch(np.array([h], dtype=np.int64)
                                    .astype(np.uint64))
                depth = depth_hint
            records = self._fetch_extract([url])
            rec = records.get(url)
            status = rec['status'] if rec else 404
            text = rec['text'] if rec else ''
            outstanding = []
            if rec and depth != self.max_depth:
                cands = list(zip(rec['cand_link'], rec['cand_hash'],
                                 rec['cand_valid']))
                if cands:
                    keys = np.array([c[1] for c in cands],
                                    dtype=np.int64).astype(np.uint64)
                    pre = self.seen.contains_batch(keys)
                    new_keys = []
                    new_set = set()
                    for (link, lh, valid), seen_already in zip(cands, pre):
                        if not seen_already and lh not in new_set:
                            new_keys.append(lh)
                            new_set.add(lh)
                            if lh in seed_hashes:
                                seed_depths[lh] = depth + 1
                            if valid:
                                outstanding.append(link)
                                if len(outstanding) == self.max_links:
                                    break
                    if new_keys:
                        self.seen.add_batch(np.array(new_keys, dtype=np.int64)
                                            .astype(np.uint64))
            stack.extend((link, depth + 1) for link in outstanding)
            out['url'].append(url)
            out['final_url'].append(rec.get('final_url', url) if rec else url)
            out['depth'].append(depth)
            out['visit_order'].append(len(out['url']) - 1)
            out['status'].append(status)
            out['scheduled_ts'].append(scheduled)
            out['text'].append(text)
            out['links'].append(outstanding)
            if status != 200:
                self.error_count += 1
                if (self.max_errors is not None
                        and self.error_count > self.max_errors):
                    break
        return pa.table({
            'url': pa.array(out['url'], pa.string()),
            'final_url': pa.array(out['final_url'], pa.string()),
            'depth': pa.array(out['depth'], pa.int32()),
            'visit_order': pa.array(out['visit_order'], pa.int64()),
            'status': pa.array(out['status'], pa.int32()),
            'scheduled_ts': pa.array(out['scheduled_ts'], pa.float64()),
            'text': pa.array(out['text'], pa.large_string()),
            'links': pa.array(out['links'], pa.list_(pa.string())),
        })

    # ------------------------------------------------------------------
    # distributed wave resolve (the 10^10-scale path)

    def _join_partitions(self) -> int:
        import ray

        return max(8, int(ray.cluster_resources().get('CPU', 8)))

    def _resolve_limit(self) -> int:
        """Effective metadata-fold candidate budget.  An explicit
        ``resolve_metadata_limit`` wins; None derives the cluster-aware
        default: the fold is driver-serial, so its share of a wave must
        shrink as the cluster widens — budget = min(driver-memory cap,
        WORK / cluster CPUs).  On one 8-cpu node that is the memory
        cap; on a 256-node x 32-cpu cluster it is ~23k candidates, i.e.
        mega waves go fully distributed exactly where the serial fold
        would have become the scaling ceiling."""
        if self.resolve_metadata_limit is not None:
            return self.resolve_metadata_limit
        import ray

        ncpus = int(ray.cluster_resources().get('CPU', 8)) \
            if ray.is_initialized() else 8
        return min(RESOLVE_METADATA_MEM_CAP,
                   RESOLVE_METADATA_WORK // max(1, ncpus))

    def _visits_from_meta(self, urls, depth_hints, visit_orders, scheduled,
                          status_of):
        """Metadata-only visits table (distributed tier: text/links live
        in the wave's parquet output, not on the driver)."""
        statuses = [status_of.get(u, 404) for u in urls]
        return pa.table({
            'url': pa.array(urls, pa.string()),
            'final_url': pa.array(urls, pa.string()),
            'depth': pa.array(depth_hints, pa.int32()),
            'visit_order': pa.array(visit_orders, pa.int64()),
            'status': pa.array(statuses, pa.int32()),
            'scheduled_ts': pa.array([float(s) for s in scheduled],
                                     pa.float64()),
        })

    def _run_wave_distributed(self, urls, depth_hints, visit_orders,
                              scheduled, hosts, stage_secs):
        """One BFS wave with no driver-side page or candidate data.

        The driver holds only (url, depth) metadata; everything else —
        fetch join, extraction, candidate explode, seen-probe,
        first-seen resolution, registration, output writes — runs as
        Dataset stages.  First-seen resolution is ``groupby(cand_hash)``
        min over ``(parent_visit_order, link_idx)`` (SURVEY §7 hard
        part 2), exact under the caller-checked precondition (all
        frontier rows preseen ⇒ depth == depth_hint, no intra-wave
        self/candidate interplay).  The reference's ``max_links`` break
        (download.py:1046) is enforced by an iterative trim: parents
        whose valid winners exceed the cap deactivate their
        post-break candidates and winners are recomputed — one round
        almost always suffices (no parent over cap ⇒ zero rounds).
        """
        import time as _time

        import ray
        import ray.data
        from ray.data.aggregate import Count, Min

        n = len(urls)
        P = self._join_partitions()
        t0 = _time.time()

        extract = ExtractPages(with_links=True,
                               with_contacts=self.with_contacts,
                               with_excerpt=self.with_excerpt)
        prep = PrepCandidates(self.allowed_urls, self.banned_urls, self.robots)
        # fuse extract+prep into the point-read tasks when nothing has
        # to run between fetch and extract: the wave's html bytes then
        # never cross the object store (the memory-bus term of the
        # wave-chain scaling decomposition). Ineligible when snapshot
        # filtering must see raw rows, when the user pinned an extract
        # actor pool, or on the resident-cache tier.
        fuse = (self._cache_pool() is None
                and self.min_fresh_ts is None
                and self.as_of_ts is None
                and not getattr(self.corpus, 'multi_snapshot', True)
                and not self.extract_concurrency)
        rec = self._lookup_wave_ds(
            urls, columns=['url', 'html', 'warc_ts'],
            postprocess=(lambda t: prep(extract(t))) if fuse else None)
        if rec is None:
            # nothing resolvable: every visit is a 404 leaf
            stage_secs['fetch_extract'] = _time.time() - t0
            self._next_frontier = []
            visits = self._visits_from_meta(urls, depth_hints, visit_orders,
                                            scheduled, {})
            self._record_distributed_wave(visits, hosts, 0, 0, stage_secs)
            return visits
        if not fuse:
            if self.min_fresh_ts is not None:
                fresh_cut = self.min_fresh_ts
                rec = rec.map_batches(
                    lambda t: t.filter(pc.greater(
                        t['warc_ts'],
                        pa.scalar(fresh_cut,
                                  t.schema.field('warc_ts').type))),
                    batch_format='pyarrow')
            if self.as_of_ts is not None:
                cutoff = self.as_of_ts
                rec = rec.map_batches(
                    lambda t: t.filter(pc.less_equal(
                        t['warc_ts'],
                        pa.scalar(cutoff,
                                  t.schema.field('warc_ts').type))),
                    batch_format='pyarrow')
            if getattr(self.corpus, 'multi_snapshot', True):
                rec = self._latest_snapshot_distributed(rec, urls)
            kw = {}
            if self.extract_concurrency:
                kw['concurrency'] = self.extract_concurrency
            rec = (rec.map_batches(extract, batch_format='pyarrow',
                                   batch_size=self.batch_size, **kw)
                   .map_batches(prep, batch_format='pyarrow',
                                batch_size=self.batch_size))
        rec = rec.materialize()
        stage_secs['fetch_extract'] = _time.time() - t0

        # page output: written straight from the distributed blocks,
        # keyed by url — visit metadata (depth/order/schedule) is a
        # separate tiny parquet the driver writes below; a consumer
        # joins on url.  (Ray's hash join rejects list columns, and the
        # page rows never need one anyway.)
        t0 = _time.time()
        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            drop = {'cand_link', 'cand_hash', 'cand_valid', 'warc_ts'}
            rec.map_batches(
                lambda t: t.select([c for c in t.column_names
                                    if c not in drop]),
                batch_format='pyarrow') \
                .write_parquet(os.path.join(self.output_dir,
                                            'wave_%05d_pages' % self.wave))
        stage_secs['pages_output'] = _time.time() - t0

        # candidate explode (flat columns only — joinable), then attach
        # parent visit metadata via a hash join on url.  (A round-4
        # experiment replaced this join with a broadcast parent-hash
        # lookup inside explode; measured 2x SLOWER in the downstream
        # groupby-min loop — the join's hash-partitioned output feeds
        # the winners shuffle better than raw fetch-shaped blocks — so
        # the join stays.)
        t0 = _time.time()

        def explode(t: pa.Table) -> pa.Table:
            us = t.column('url').to_pylist()
            cl = t.column('cand_link').to_pylist()
            ch = t.column('cand_hash').to_pylist()
            cv = t.column('cand_valid').to_pylist()
            o_u, o_j, o_link, o_lh, o_valid = [], [], [], [], []
            for u, links, hashes, valids in zip(us, cl, ch, cv):
                if hashes is None:
                    continue
                for j, (lk, lh, va) in enumerate(zip(links, hashes, valids)):
                    o_u.append(u)
                    o_j.append(j)
                    o_link.append(lk)
                    o_lh.append(lh)
                    o_valid.append(va)
            return pa.table({
                'curl': pa.array(o_u, pa.string()),
                'j': pa.array(o_j, pa.int32()),
                'link': pa.array(o_link, pa.string()),
                'lh': pa.array(o_lh, pa.int64()),
                'valid': pa.array(o_valid, pa.bool_()),
            })

        # parent metadata: only non-leaf parents emit candidates
        # (max_depth leaf check, reference download.py:1029-1031)
        meta = pa.table({
            'purl': pa.array(urls, pa.string()),
            'pdepth': pa.array(depth_hints, pa.int32()),
            'pvisit': pa.array(visit_orders, pa.int64()),
        }).filter(pc.not_equal(
            pa.array(depth_hints, pa.int32()),
            pa.scalar(self.max_depth, pa.int32())))

        def finish_no_candidates(n_candidates=0):
            # nothing to resolve this wave: empty next frontier, visits
            # are pure metadata.  Also guards the joins below — Ray's
            # hash join loses the schema of an empty input side.
            self._next_frontier = []
            status_of = self._pull_statuses(rec)
            visits = self._visits_from_meta(urls, depth_hints, visit_orders,
                                            scheduled, status_of)
            if self.output_dir:
                self._write_visits_meta(visits)
            self._record_distributed_wave(visits, hosts, n_candidates, 0,
                                          stage_secs)
            return visits

        if meta.num_rows == 0:
            # every parent is a max-depth leaf: no candidate processing
            return finish_no_candidates()
        # all-leaf-page wave (every fetched page has zero links): the
        # explode output would be an empty join side — short-circuit
        _t_cand = _time.time()
        n_cand_total = rec.map_batches(
            lambda t: pa.table({'n': pa.array(
                [int(pc.sum(pc.list_value_length(t['cand_hash'])).as_py()
                     or 0)], pa.int64())}),
            batch_format='pyarrow').sum('n') or 0
        stage_secs['cand_count'] = _time.time() - _t_cand
        if n_cand_total == 0:
            return finish_no_candidates()
        if n_cand_total <= self._resolve_limit():
            return self._resolve_wave_metadata(
                rec, urls, depth_hints, visit_orders, scheduled, hosts,
                n_cand_total, stage_secs)
        chunk = 65536
        meta_ds = ray.data.from_arrow(
            [meta.slice(i, chunk) for i in range(0, meta.num_rows, chunk)])

        cand = (rec.map_batches(explode, batch_format='pyarrow')
                .join(meta_ds, 'inner', num_partitions=P,
                      on=('curl',), right_on=('purl',)))

        # combo packs (parent order, link idx) into one int64 for the
        # groupby-min first-seen resolution.  pvisit is rebased to the
        # wave-local index (visit orders are contiguous per wave) so the
        # packing never overflows: the global visit counter can exceed
        # 2^31 at 10^10-URL scale, but a single wave's row count cannot
        # (it is a driver-held list), and j is int32 by schema.  All
        # combos within a wave shift by the same constant, so min-order
        # and the emission sort are unchanged.
        combo_base = min(visit_orders)

        def with_combo(t: pa.Table) -> pa.Table:
            combo = pc.bit_wise_or(
                pc.shift_left(
                    pc.subtract(t['pvisit'], pa.scalar(combo_base, pa.int64())),
                    pa.scalar(32, pa.int64())),
                pc.cast(t['j'], pa.int64()))
            t = t.append_column('combo', combo)
            return t.append_column(
                'ldepth', pc.add(t['pdepth'], pa.scalar(1, pa.int32())))

        seen = self.seen  # actor handles: picklable, shared by tasks

        def drop_preseen(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            keys = np.asarray(t.column('lh'), dtype=np.int64).astype(np.uint64)
            return t.filter(pa.array(~seen.contains_batch(keys)))

        fresh = (cand.map_batches(with_combo, batch_format='pyarrow')
                 .map_batches(drop_preseen, batch_format='pyarrow',
                              batch_size=65536)
                 .materialize())
        n_candidates = fresh.count()
        stage_secs['seen_probe'] = _time.time() - t0
        if n_candidates == 0:
            # every candidate was preseen: nothing to register or emit
            # (and the resolve joins below would see empty sides)
            return finish_no_candidates(0)

        # first-seen resolution + max_links trim rounds
        t0 = _time.time()
        max_links = self.max_links
        trims = {}
        active = fresh
        winners = None
        for _round in range(8):
            wkeys = active.groupby('lh').aggregate(
                Min('combo', alias_name='wcombo'))
            winners = (active.join(wkeys, 'inner', num_partitions=P,
                                   on=('lh',))
                       .map_batches(lambda t: t.filter(
                           pc.equal(t['combo'], t['wcombo'])),
                           batch_format='pyarrow')
                       .materialize())
            # parents AT or over the cap both need a trim: the driver
            # fold breaks at the max_links-th valid candidate, so even
            # an exactly-at-cap parent must not register candidates
            # past its break point (they stay discoverable via later
            # parents — the reference fold would emit them there)
            over = (winners.map_batches(
                lambda t: t.filter(t['valid']).select(['pvisit']),
                batch_format='pyarrow')
                .groupby('pvisit').aggregate(Count(alias_name='cnt'))
                .map_batches(lambda t: t.filter(
                    pc.greater_equal(t['cnt'], max_links)),
                    batch_format='pyarrow').take_all())
            if not over:
                break
            # find each hot parent's break point (the link_idx of its
            # max_links-th valid winner) and deactivate everything
            # after it, then re-resolve.  Trims only ever tighten
            # (min-merge), so the loop terminates; when a pass changes
            # nothing the current winners are already exact.
            hot = pa.array(sorted(r['pvisit'] for r in over), pa.int64())
            hot_rows = winners.map_batches(
                lambda t: t.filter(pc.and_(
                    pc.is_in(t['pvisit'], value_set=hot),
                    t['valid'])).select(['pvisit', 'j']),
                batch_format='pyarrow').take_all()
            by_parent = {}
            for r in hot_rows:
                by_parent.setdefault(r['pvisit'], []).append(r['j'])
            changed = False
            for v, js in by_parent.items():
                jcap = sorted(js)[max_links - 1]
                if trims.get(v, 1 << 62) > jcap:
                    trims[v] = jcap
                    changed = True
            if not changed:
                break
            tref = ray.put(dict(trims))

            def trim(t: pa.Table) -> pa.Table:
                tr = ray.get(tref)
                pv = t.column('pvisit').to_pylist()
                jj = t.column('j').to_pylist()
                keep = [j <= tr.get(v, 1 << 62) for v, j in zip(pv, jj)]
                return t.filter(pa.array(keep, pa.bool_()))

            active = fresh.map_batches(trim, batch_format='pyarrow')
        else:
            import logging
            logging.getLogger(__name__).warning(
                'max_links trim did not converge in 8 rounds; '
                'emission may overcount on pathological link graphs')

        # register every winner (valid or not — the reference registers
        # invalid links too, download.py:1041-1045) into the seen shards
        def register(t: pa.Table) -> pa.Table:
            if t.num_rows:
                keys = np.asarray(t.column('lh'),
                                  dtype=np.int64).astype(np.uint64)
                seen.add_batch(keys)
            return pa.table({'n': pa.array([t.num_rows], pa.int64())})

        n_new = int(winners.map_batches(
            register, batch_format='pyarrow', batch_size=65536).sum('n') or 0)
        stage_secs['resolve'] = _time.time() - t0

        # emission: valid winners in (parent visit order, link idx)
        # order — the next frontier and the wave's edge output
        t0 = _time.time()
        emitted = (winners.map_batches(
            lambda t: t.filter(t['valid'])
            .select(['combo', 'pvisit', 'j', 'link', 'ldepth']),
            batch_format='pyarrow').sort('combo'))
        new_frontier = []
        for b in emitted.iter_batches(batch_size=65536,
                                      batch_format='pyarrow'):
            new_frontier.extend(zip(b.column('link').to_pylist(),
                                    b.column('ldepth').to_pylist()))
        self._next_frontier = new_frontier

        # edge output (parent visit order, link idx, link, depth) —
        # written distributed; together with the url-keyed pages
        # parquet and the visits metadata parquet below this replaces
        # the driver-path list column at scale
        if self.output_dir:
            emitted.write_parquet(os.path.join(self.output_dir,
                                               'wave_%05d_edges' % self.wave))
        stage_secs['emit_output'] = _time.time() - t0

        # driver return: metadata only (url/depth/order/status/ts) —
        # O(wave) strings, no text, no links
        t0 = _time.time()
        status_of = self._pull_statuses(rec)
        visits = self._visits_from_meta(urls, depth_hints, visit_orders,
                                        scheduled, status_of)
        if self.output_dir:
            self._write_visits_meta(visits)
        stage_secs['meta_pull'] = _time.time() - t0
        self._record_distributed_wave(visits, hosts, n_candidates, n_new,
                                      stage_secs)
        return visits

    def _resolve_wave_metadata(self, rec, urls, depth_hints, visit_orders,
                               scheduled, hosts, n_cand_total, stage_secs):
        """Middle resolve tier: the exact sequential fold over candidate
        METADATA (url, status, cand link/hash/valid — no page text; the
        text was already written to the wave's pages parquet from the
        distributed blocks).  Driver memory is O(candidates); the tier
        runs when ``n_cand_total <= resolve_metadata_limit``.  Replaces
        the explode/join/groupby-min machinery — identical output by
        construction (it IS the reference fold), asserted in tests.
        """
        import time as _time

        # --- columnar pull: no per-row Python objects.  Candidate
        # hashes/valids flatten to numpy, links stay arrow string
        # arrays (only emitted winners materialize to Python).
        t0 = _time.time()
        order_of = {u: i for i, u in enumerate(urls)}
        depth_arr = np.asarray(depth_hints, dtype=np.int32)
        parent_chunks, j_chunks, lh_chunks, valid_chunks, link_chunks = \
            [], [], [], [], []
        status_of = {}
        # mega waves: link STRINGS are ~10x the numeric candidate
        # columns and only the winners' strings are ever needed — leave
        # them distributed and fetch winners after the fold (see
        # RESOLVE_LINK_PULL_INLINE); past the same threshold the
        # explode/flatten itself runs distributed and only 4 numeric
        # columns (~25 B/candidate) cross to the driver — the per-batch
        # driver flatten was the fold tier's serial bandwidth ceiling
        # (~10 s per 274k-row wave, BASELINE.md round 4)
        pull_links = n_cand_total <= RESOLVE_LINK_PULL_INLINE
        if not pull_links:
            parent, jj, lh, valid, status_of = \
                self._pull_candidates_distributed(rec, urls, depth_arr)
            links_arr = None
            stage_secs['meta_pull'] = _time.time() - t0
            return self._fold_candidates(
                rec, urls, depth_hints, visit_orders, scheduled, hosts,
                n_cand_total, stage_secs, parent, jj, lh, valid,
                links_arr, status_of)
        pull_cols = ['url', 'status', 'cand_hash', 'cand_valid', 'cand_link']
        for b in rec.select_columns(pull_cols).iter_batches(
                batch_size=65536, batch_format='pyarrow'):
            b_urls = b.column('url').to_pylist()
            for u, s in zip(b_urls, b.column('status').to_pylist()):
                if s is not None:
                    status_of[u] = s
            rows = np.array([order_of[u] for u in b_urls], dtype=np.int64)
            lens = pc.list_value_length(b.column('cand_hash')) \
                .combine_chunks().to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens, nan=0).astype(np.int64)
            # drop max-depth leaf parents before exploding (reference
            # download.py:1029-1031: leaves never register candidates)
            lens = np.where(depth_arr[rows] == self.max_depth, 0, lens)
            total = int(lens.sum())
            if total == 0:
                continue
            parent_chunks.append(np.repeat(rows, lens))
            # j = per-parent candidate index: global arange minus each
            # row's start offset, repeated
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            j_chunks.append(np.arange(total, dtype=np.int64)
                            - np.repeat(starts, lens))
            flat_h = pc.list_flatten(b.column('cand_hash'))
            flat_v = pc.list_flatten(b.column('cand_valid'))
            flat_l = pc.list_flatten(b.column('cand_link')) \
                if pull_links else None
            keep = None
            if len(flat_h) != total:
                # rows were masked (leaf parents): rebuild a take mask
                raw_lens = pc.list_value_length(b.column('cand_hash')) \
                    .combine_chunks().to_numpy(zero_copy_only=False)
                raw_lens = np.nan_to_num(raw_lens, nan=0).astype(np.int64)
                raw_starts = np.concatenate(([0], np.cumsum(raw_lens)[:-1]))
                keep = np.concatenate([
                    np.arange(raw_starts[i], raw_starts[i] + lens[i])
                    for i in range(len(lens)) if lens[i]]) \
                    if total else np.empty(0, dtype=np.int64)
                flat_h = flat_h.take(pa.array(keep))
                flat_v = flat_v.take(pa.array(keep))
                if pull_links:
                    flat_l = flat_l.take(pa.array(keep))
            lh_chunks.append(flat_h.combine_chunks()
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64))
            valid_chunks.append(flat_v.combine_chunks()
                                .to_numpy(zero_copy_only=False)
                                .astype(bool))
            if pull_links:
                link_chunks.append(flat_l.combine_chunks())
        if parent_chunks:
            parent = np.concatenate(parent_chunks)
            jj = np.concatenate(j_chunks)
            lh = np.concatenate(lh_chunks)
            valid = np.concatenate(valid_chunks)
            links_arr = pa.concat_arrays(
                [c.cast(pa.string()) for c in link_chunks])
        else:
            parent = jj = lh = np.empty(0, dtype=np.int64)
            valid = np.empty(0, dtype=bool)
            links_arr = pa.array([], pa.string())
        stage_secs['meta_pull'] = _time.time() - t0
        return self._fold_candidates(
            rec, urls, depth_hints, visit_orders, scheduled, hosts,
            n_cand_total, stage_secs, parent, jj, lh, valid, links_arr,
            status_of)

    def _pull_candidates_distributed(self, rec, urls, depth_arr):
        """Mega-wave candidate pull: the explode/flatten runs as a
        ``map_batches`` stage and only four numeric columns
        (parent wave index, link idx, link hash, validity) plus one
        status marker row per page cross to the driver.  Parent rows
        map to wave indices through a broadcast sorted url-hash triple
        (zero-copy numpy in every task) — the driver never decodes the
        wave's list columns, so the fold tier's serial fraction is the
        numpy sort/probe, not pull bandwidth.

        Returns ``(parent, j, lh, valid, status_of)`` in arbitrary row
        order (the fold lexsorts) with max-depth leaf parents' candidates
        already dropped (reference download.py:1029-1031).
        """
        import ray

        ph = np.fromiter((U.url_hash64(u) for u in urls), dtype=np.int64,
                         count=len(urls))
        order = np.argsort(ph, kind='stable')
        phs_ref = ray.put(ph[order])
        ord_ref = ray.put(order)

        def explode_meta(t: pa.Table) -> pa.Table:
            phs = ray.get(phs_ref)
            orda = ray.get(ord_ref)
            b_urls = t.column('url').to_pylist()
            nb = len(b_urls)
            hh = np.fromiter((U.url_hash64(u) for u in b_urls),
                             dtype=np.int64, count=nb)
            pos = np.searchsorted(phs, hh)
            # every rec url is in the wave by construction (the fetch
            # is a lookup of the wave's urls)
            rows = orda[pos]
            stat = pc.fill_null(
                pc.cast(t.column('status'), pa.int64()),
                _NO_STATUS).combine_chunks().to_numpy(zero_copy_only=False)
            lens = pc.list_value_length(t.column('cand_hash')) \
                .combine_chunks().to_numpy(zero_copy_only=False)
            lens = np.nan_to_num(lens, nan=0).astype(np.int64)
            total = int(lens.sum())
            if total:
                parent = np.repeat(rows, lens)
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                j = np.arange(total, dtype=np.int64) \
                    - np.repeat(starts, lens)
                lh_np = pc.list_flatten(t.column('cand_hash')) \
                    .combine_chunks().to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                v_np = pc.list_flatten(t.column('cand_valid')) \
                    .combine_chunks().to_numpy(zero_copy_only=False) \
                    .astype(bool)
            else:
                parent = j = lh_np = np.empty(0, dtype=np.int64)
                v_np = np.empty(0, dtype=bool)
            return pa.table({
                'parent': pa.array(np.concatenate([parent, rows]),
                                   pa.int64()),
                'j': pa.array(np.concatenate([j, stat.astype(np.int64)]),
                              pa.int64()),
                'lh': pa.array(np.concatenate(
                    [lh_np, np.zeros(nb, np.int64)]), pa.int64()),
                'valid': pa.array(np.concatenate(
                    [v_np, np.zeros(nb, bool)]), pa.bool_()),
                'is_status': pa.array(np.concatenate(
                    [np.zeros(total, bool), np.ones(nb, bool)]),
                    pa.bool_()),
            })

        parts = {k: [] for k in ('parent', 'j', 'lh', 'valid')}
        status_of = {}
        for b in rec.map_batches(explode_meta, batch_format='pyarrow') \
                .iter_batches(batch_size=1 << 20, batch_format='pyarrow'):
            isst = np.asarray(b.column('is_status')).astype(bool)
            p = np.asarray(b.column('parent'), dtype=np.int64)
            j = np.asarray(b.column('j'), dtype=np.int64)
            for pi, sj in zip(p[isst], j[isst]):
                if sj != _NO_STATUS:
                    status_of[urls[pi]] = int(sj)
            cand = ~isst
            # max-depth leaf parents never register candidates
            cand &= depth_arr[p] != self.max_depth
            parts['parent'].append(p[cand])
            parts['j'].append(j[cand])
            parts['lh'].append(
                np.asarray(b.column('lh'), dtype=np.int64)[cand])
            parts['valid'].append(
                np.asarray(b.column('valid')).astype(bool)[cand])
        if parts['parent']:
            return (np.concatenate(parts['parent']),
                    np.concatenate(parts['j']),
                    np.concatenate(parts['lh']),
                    np.concatenate(parts['valid']), status_of)
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), np.empty(0, bool), status_of)

    def _fold_candidates(self, rec, urls, depth_hints, visit_orders,
                         scheduled, hosts, n_cand_total, stage_secs,
                         parent, jj, lh, valid, links_arr, status_of):
        """The metadata fold proper: lexsort to candidate order, probe
        the seen shards once, take vectorized first-seen winners (exact
        sequential fold only when a parent hits the ``max_links``
        break), register, emit.  Shared by the inline and distributed
        pull paths of :meth:`_resolve_wave_metadata`."""
        import time as _time

        depth_arr = np.asarray(depth_hints, dtype=np.int32)
        t0 = _time.time()
        # candidate fold order = (parent visit order, link idx)
        sort_idx = np.lexsort((jj, parent))
        parent, jj, lh, valid = (parent[sort_idx], jj[sort_idx],
                                 lh[sort_idx], valid[sort_idx])
        uniq_h, first_idx = np.unique(lh, return_index=True)
        pre = self.seen.contains_batch(uniq_h.astype(np.uint64)) \
            if len(uniq_h) else np.empty(0, dtype=bool)
        stage_secs['seen_probe'] = _time.time() - t0

        t0 = _time.time()
        # winners = first occurrence (in fold order) of each not-preseen
        # hash — exact under the tier preconditions, PROVIDED no parent
        # hits the max_links break (the break suppresses registration of
        # post-break candidates, which can reassign later winners)
        win_idx = np.sort(first_idx[~pre])
        emit_mask = valid[win_idx]
        emit_counts = np.bincount(parent[win_idx][emit_mask],
                                  minlength=len(urls)) if len(win_idx) \
            else np.zeros(len(urls), dtype=np.int64)
        if emit_counts.size and emit_counts.max() >= self.max_links:
            # rare: some parent is at/over the cap — run the exact
            # sequential fold over the flat arrays (the vectorized
            # winner set would register post-break candidates)
            pre_of = dict(zip(uniq_h.tolist(), pre.tolist()))
            local = set()
            win_list = []
            emit_list = []
            n_out = np.zeros(len(urls), dtype=np.int64)
            skip_parent = -1
            for k in range(len(parent)):
                p = parent[k]
                if p == skip_parent:
                    continue
                h = lh[k]
                if h not in local and not pre_of[h]:
                    local.add(h)
                    win_list.append(k)
                    if valid[k]:
                        emit_list.append(k)
                        n_out[p] += 1
                        if n_out[p] == self.max_links:
                            skip_parent = p
            win_idx = np.array(win_list, dtype=np.int64)
            emit_idx = np.array(emit_list, dtype=np.int64)
        else:
            emit_idx = win_idx[emit_mask]
        stage_secs['resolve'] = _time.time() - t0

        t0 = _time.time()
        if len(win_idx):
            self.seen.add_batch(lh[win_idx].astype(np.uint64))
        stage_secs['seen_commit'] = _time.time() - t0

        # emitted links materialize to Python only here (answer-sized)
        if links_arr is not None:
            take = pa.array(sort_idx[emit_idx], pa.int64())
            e_links = links_arr.take(take).to_pylist()
        else:
            e_links = self._fetch_winner_links(rec, lh[emit_idx])
        e_parents = parent[emit_idx]
        e_depths = (depth_arr[e_parents] + 1).tolist()
        e_pv = [visit_orders[p] for p in e_parents]
        e_j = jj[emit_idx].tolist()
        e_link = e_links
        e_ld = e_depths
        new_frontier = list(zip(e_links, e_depths))
        n_new = int(len(win_idx))

        t0 = _time.time()
        self._next_frontier = new_frontier
        if self.output_dir:
            # same edges layout and directory shape as the fully
            # distributed tier (combo = wave-local (parent order,
            # link idx) packing)
            base = min(visit_orders)
            combo = [((pv - base) << 32) | j for pv, j in zip(e_pv, e_j)]
            edir = os.path.join(self.output_dir,
                                'wave_%05d_edges' % self.wave)
            os.makedirs(edir, exist_ok=True)
            pq.write_table(pa.table({
                'combo': pa.array(combo, pa.int64()),
                'pvisit': pa.array(e_pv, pa.int64()),
                'j': pa.array(e_j, pa.int32()),
                'link': pa.array(e_link, pa.string()),
                'ldepth': pa.array(e_ld, pa.int32()),
            }), os.path.join(edir, 'edges.parquet'))
        stage_secs['emit_output'] = _time.time() - t0
        visits = self._visits_from_meta(urls, depth_hints, visit_orders,
                                        scheduled, status_of)
        if self.output_dir:
            self._write_visits_meta(visits)
        self._record_distributed_wave(visits, hosts, n_cand_total,
                                      n_new, stage_secs)
        return visits

    def _fetch_winner_links(self, rec, emit_hashes: np.ndarray):
        """Winner link STRINGS for the metadata-fold tier's mega-wave
        path: the candidate hash set of the emitted winners broadcasts
        once (8 B/winner, zero-copy in every task), each task flattens
        its pages' candidate lists, keeps rows whose hash is in the
        set (sorted searchsorted — vectorized), dedups per batch, and
        the driver assembles hash→string from the answer-sized pull.
        One url string per distinct hash by construction (url_hash64
        keys the whole engine), so any occurrence serves."""
        import ray

        if not len(emit_hashes):
            return []
        wanted = np.sort(emit_hashes.astype(np.int64))
        wref = ray.put(wanted)

        def winner_rows(t: pa.Table) -> pa.Table:
            w = ray.get(wref)
            flat_h = pc.list_flatten(t.column('cand_hash')) \
                .combine_chunks().to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            flat_l = pc.list_flatten(t.column('cand_link')).combine_chunks()
            idx = np.searchsorted(w, flat_h)
            idx[idx == len(w)] = 0
            mask = w[idx] == flat_h
            sel = np.flatnonzero(mask)
            if not len(sel):
                return pa.table({'lh': pa.array([], pa.int64()),
                                 'link': pa.array([], pa.string())})
            hs = flat_h[sel]
            uniq, first = np.unique(hs, return_index=True)
            keep = sel[first]
            return pa.table({
                'lh': pa.array(uniq, pa.int64()),
                'link': flat_l.take(pa.array(keep, pa.int64()))
                        .cast(pa.string())})

        link_of = {}
        for b in rec.select_columns(['cand_hash', 'cand_link']) \
                .map_batches(winner_rows, batch_format='pyarrow') \
                .iter_batches(batch_format='pyarrow'):
            for h, l in zip(b.column('lh').to_pylist(),
                            b.column('link').to_pylist()):
                link_of.setdefault(h, l)
        return [link_of[int(h)] for h in emit_hashes]

    def _latest_snapshot_distributed(self, rec, urls):
        """Latest-per-url resolution for the distributed wave tier
        (mirrors :meth:`_latest_snapshot` — reference PersistentDict
        holds one latest value per key, pdict.py:190-199).

        A multi-snapshot corpus returns several rows per url from the
        lookup; keeping them all would extract and emit every surviving
        snapshot.  The max warc_ts per url is computed from a
        column-pruned (url, warc_ts) lookup folded on the driver —
        O(wave) memory, the same budget as the ``urls`` list this tier
        already holds — then broadcast once and applied as a per-batch
        filter, so the html-carrying stream is never shuffled.  Skipped
        entirely when the store's build-time metadata says the corpus
        is single-snapshot.  Equal-ts duplicates of one url would both
        survive (documented corpus assumption: snapshots of a url have
        distinct warc_ts)."""
        import ray

        if (self._cache_pool() is not None
                and 'warc_ts' not in (self._resident_cols or ())):
            return rec
        tiny = self._lookup_wave_ds(urls, columns=['url', 'warc_ts'])
        if tiny is None or 'warc_ts' not in tiny.schema().names:
            return rec
        mx = {}
        for b in tiny.iter_batches(batch_size=65536, batch_format='pyarrow'):
            for u, t in zip(b.column('url').to_pylist(),
                            b.column('warc_ts').to_pylist()):
                tus = _ts_us(t)
                # same freshness/as-of semantics as the rec chain
                if self.min_fresh_ts is not None and \
                        (t is None or tus <= self.min_fresh_ts):
                    continue
                if self.as_of_ts is not None and \
                        (t is None or tus > self.as_of_ts):
                    continue
                if tus > mx.get(u, -2):
                    mx[u] = tus
        mxref = ray.put(mx)

        def latest_only(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or 'warc_ts' not in t.column_names:
                return t
            best = ray.get(mxref)
            us = t.column('url').to_pylist()
            ts = t.column('warc_ts').to_pylist()
            keep = [best.get(u, -2) == _ts_us(tt) for u, tt in zip(us, ts)]
            return t.filter(pa.array(keep, pa.bool_()))

        return rec.map_batches(latest_only, batch_format='pyarrow')

    def _pull_statuses(self, rec) -> dict:
        """{url: status} for resolved pages (O(wave) metadata)."""
        status_of = {}
        for b in (rec.select_columns(['url', 'status'])
                  .iter_batches(batch_size=65536, batch_format='pyarrow')):
            for u, s in zip(b.column('url').to_pylist(),
                            b.column('status').to_pylist()):
                if s is not None:
                    status_of[u] = s
        return status_of

    def _write_visits_meta(self, visits: pa.Table):
        tmp = os.path.join(self.output_dir,
                           '_wave_%05d_visits.parquet.tmp' % self.wave)
        pq.write_table(visits, tmp)
        os.replace(tmp, os.path.join(
            self.output_dir, 'wave_%05d_visits.parquet' % self.wave))

    def _record_distributed_wave(self, visits, hosts, n_candidates, n_new,
                                 stage_secs):
        host_hist = {}
        for h in hosts:
            host_hist[h] = host_hist.get(h, 0) + 1
        self.state.record_wave(
            wave=self.wave, n_rows=visits.num_rows,
            n_ok=int(pc.sum(pc.equal(visits['status'],
                                     pa.scalar(200, pa.int32()))).as_py() or 0),
            n_candidates=n_candidates, n_new=n_new,
            queue_size=len(self._next_frontier), stage_secs=stage_secs,
            host_histogram=host_hist)

    # ------------------------------------------------------------------
    # checkpoint / resume (per-wave lineage, FIXTURES.md §5)

    def _checkpoint(self, frontier):
        root = self.checkpoint_dir
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, '_wave_%05d.tmp' % self.wave)
        final = os.path.join(root, 'wave_%05d' % self.wave)
        os.makedirs(tmp, exist_ok=True)
        # frontier (when spilled, the durable queue itself is the
        # checkpoint — its segments + claims manifest live on disk)
        spilled = frontier == _SPILLED
        if not spilled:
            pq.write_table(pa.table({
                'url': pa.array([u for u, _ in frontier], pa.string()),
                'depth': pa.array([d for _, d in frontier], pa.int32()),
            }), os.path.join(tmp, 'frontier.parquet'))
        # seen lineage: a FULL (shard, kind, snapshot) record every
        # SEEN_FULL_SNAPSHOT_EVERY waves, per-wave added-key DELTAS in
        # between — full snapshots every wave are O(seen) x waves
        # (quadratic over the crawl; ~80 GB/wave at 10^10 urls), while
        # a delta is O(that wave's new urls) and resume replays
        # base..latest (bounded by SEEN_FULL_SNAPSHOT_EVERY deltas)
        seen_full = (self._seen_base_wave is None or
                     self.wave - self._seen_base_wave >=
                     self.SEEN_FULL_SNAPSHOT_EVERY)
        counts = self.seen.counts()
        if seen_full:
            snaps = self.seen.snapshots()   # also clears the journal
            pq.write_table(pa.table({
                'shard': pa.array([s for s, _, _ in snaps], pa.int32()),
                'filter_kind': pa.array([k for _, k, _ in snaps],
                                        pa.string()),
                'snapshot': pa.array([b for _, _, b in snaps],
                                     pa.large_binary()),
                'num_urls': pa.array(counts, pa.int64()),
            }), os.path.join(tmp, 'seen.parquet'))
            self._seen_base_wave = self.wave
        else:
            deltas = self.seen.drain_deltas()
            pq.write_table(pa.table({
                'shard': pa.array([s for s, _ in deltas], pa.int32()),
                'delta': pa.array([b for _, b in deltas],
                                  pa.large_binary()),
                'num_urls': pa.array(counts, pa.int64()),
            }), os.path.join(tmp, 'seen_delta.parquet'))
        # politeness lineage rides the same full/delta chain: full
        # host-clock snapshot on seen-full waves, hosts-touched-this-
        # wave deltas in between (O(wave hosts), not O(hosts ever))
        if seen_full:
            with open(os.path.join(tmp, 'politeness.json'), 'w') as f:
                json.dump(self.politeness.snapshots(), f)
        else:
            with open(os.path.join(tmp, 'politeness_delta.json'), 'w') as f:
                json.dump(self.politeness.drain_deltas(), f)
        if spilled:
            # queue watermark lineage: consolidated claims snapshot
            # (base manifest + journaled pulls — the on-disk
            # claims.json alone may be older than the claims.log) so
            # resume rewinds any post-checkpoint pull (the in-flight
            # wave) back to unclaimed
            self._queue().checkpoint_claims(
                os.path.join(tmp, 'queue_claims.json'))
        with open(os.path.join(tmp, 'manifest.json'), 'w') as f:
            json.dump({'wave': self.wave, 'visit_counter': self.visit_counter,
                       'num_seen_shards': self.seen.num_shards,
                       'seen_kind': self.seen.kind,
                       'seen_full': seen_full,
                       'seen_base_wave': self._seen_base_wave,
                       'num_politeness_shards': self.politeness.num_shards,
                       'frontier_spilled': spilled,
                       'frontier_queue_dir': self.frontier_queue_dir,
                       'wave_start': self._wave_start},
                      f)
        _atomic_write_dir(tmp, final)
        # LATEST pointer, atomic (reference State.save pattern,
        # download.py:924-945)
        ptr_tmp = os.path.join(root, '_LATEST.tmp')
        with open(ptr_tmp, 'w') as f:
            f.write('wave_%05d' % self.wave)
        os.replace(ptr_tmp, os.path.join(root, 'LATEST'))

    def resume(self):
        """Restore state from the last committed wave; returns the
        frontier to continue with (or None if no checkpoint)."""
        root = self.checkpoint_dir
        latest = os.path.join(root, 'LATEST')
        if not os.path.exists(latest):
            return None
        wave_dir = os.path.join(root, open(latest).read().strip())
        if not os.path.isdir(wave_dir):
            # LATEST may point at a wave whose commit was interrupted;
            # fall back to the newest wave dir that actually exists
            done = sorted(d for d in os.listdir(root)
                          if d.startswith('wave_') and
                          os.path.isdir(os.path.join(root, d)) and
                          not d.endswith('.old'))
            if not done:
                return None
            wave_dir = os.path.join(root, done[-1])
        with open(os.path.join(wave_dir, 'manifest.json')) as f:
            man = json.load(f)
        if man.get('seen_full', True):
            seen_tbl = pq.read_table(os.path.join(wave_dir, 'seen.parquet'))
            self.seen.restore([(r['shard'], r['filter_kind'], r['snapshot'])
                               for r in seen_tbl.to_pylist()])
        else:
            # delta lineage: restore the base FULL snapshot, then
            # replay each subsequent wave's added-key delta in order
            base = man['seen_base_wave']
            base_dir = os.path.join(root, 'wave_%05d' % base)
            seen_tbl = pq.read_table(os.path.join(base_dir, 'seen.parquet'))
            self.seen.restore([(r['shard'], r['filter_kind'], r['snapshot'])
                               for r in seen_tbl.to_pylist()])
            for w in range(base + 1, man['wave'] + 1):
                dt = pq.read_table(os.path.join(
                    root, 'wave_%05d' % w, 'seen_delta.parquet'))
                self.seen.replay_deltas(
                    [(r['shard'], r['delta']) for r in dt.to_pylist()])
        self._seen_base_wave = man.get('seen_base_wave', man['wave'])
        if man.get('seen_full', True):
            with open(os.path.join(wave_dir, 'politeness.json')) as f:
                self.politeness.restore(json.load(f))
        else:
            base = man['seen_base_wave']
            with open(os.path.join(root, 'wave_%05d' % base,
                                   'politeness.json')) as f:
                self.politeness.restore(json.load(f))
            for w in range(base + 1, man['wave'] + 1):
                with open(os.path.join(root, 'wave_%05d' % w,
                                       'politeness_delta.json')) as f:
                    self.politeness.replay_deltas(json.load(f))
        # shard layout is part of the lineage: membership keys are
        # distributed by hash % num_shards, so resuming with a different
        # shard count would silently corrupt the seen set
        want = man.get('num_seen_shards')
        if want is not None and want != self.seen.num_shards:
            raise ValueError(
                'checkpoint was written with %d seen shards; this crawler '
                'has %d — resume with the same num_seen_shards' %
                (want, self.seen.num_shards))
        wantp = man.get('num_politeness_shards')
        if wantp is not None and wantp != self.politeness.num_shards:
            raise ValueError(
                'checkpoint politeness shards %d != %d' %
                (wantp, self.politeness.num_shards))
        self.visit_counter = man['visit_counter']
        self.wave = man['wave'] + 1
        self._wave_start = float(man.get('wave_start', 0.0))
        if man.get('frontier_spilled'):
            # rewind the queue's claim watermark to checkpoint time and
            # reopen (rebuilds the in-memory hash index); restore also
            # drops any claims.log — its post-checkpoint pulls are the
            # in-flight work being rewound
            from .frontier import ParquetQueue
            qdir = man.get('frontier_queue_dir') or self.frontier_queue_dir
            self.frontier_queue_dir = qdir
            ParquetQueue.restore_claims(
                os.path.join(wave_dir, 'queue_claims.json'), qdir)
            self._frontier_queue = None
            return _SPILLED
        fr = pq.read_table(os.path.join(wave_dir, 'frontier.parquet'))
        return list(zip(fr.column('url').to_pylist(),
                        fr.column('depth').to_pylist()))

    def run_resumed(self, max_waves: int | None = None):
        """Continue a checkpointed crawl to completion."""
        frontier = self.resume()
        if frontier is None:
            raise ValueError('no checkpoint at %s' % self.checkpoint_dir)
        return self._crawl_loop(frontier, max_waves)


def _empty_visits():
    return pa.table({
        'url': pa.array([], pa.string()),
        'final_url': pa.array([], pa.string()),
        'depth': pa.array([], pa.int32()),
        'visit_order': pa.array([], pa.int64()),
        'status': pa.array([], pa.int32()),
        'scheduled_ts': pa.array([], pa.float64()),
        'text': pa.array([], pa.large_string()),
        'links': pa.array([], pa.list_(pa.string())),
    })


def crawl_bfs(corpus, seeds, **kwargs) -> pa.Table:
    """One-shot BFS crawl; see :class:`Crawler` for options."""
    return Crawler(corpus, **kwargs).run(seeds)
