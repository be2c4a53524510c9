"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute` — exact cosine top-k per query: the query matrix is
  broadcast once (``ray.put``), every data batch does one numpy matmul,
  per-batch top-k partials are merged in a tiny final reduce.  The
  baseline and the oracle for the ANN variants.
- :func:`knn_ivf` — IVF-style scale path: coarse centroids (numpy
  k-means on a sample), data bucketed by nearest centroid once, queries
  probe only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _emb_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, dim) float64 matrix.

    Embedding columns are uniform-length lists, so the flat Arrow
    values buffer reshapes directly — no per-row ``to_pylist``
    round-trip through Python objects.  Falls back to the object path
    for ragged lists."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)) and len(arr):
        offsets = np.asarray(arr.offsets)
        widths = np.diff(offsets)
        if (widths == widths[0]).all() and widths[0] > 0:
            flat = np.asarray(arr.values)[offsets[0]:offsets[-1]]
            return flat.astype(np.float64, copy=False).reshape(
                len(widths), widths[0])
    return np.array(arr.to_pylist(), dtype=np.float64)


_SM_C1 = np.uint64(0x9E3779B97F4A7C15)
_SM_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over uint64 (wrapping arithmetic)."""
    z = x + _SM_C1
    z = (z ^ (z >> np.uint64(30))) * _SM_C2
    z = (z ^ (z >> np.uint64(27))) * _SM_C3
    return z ^ (z >> np.uint64(31))


def knn_brute(ds, queries: np.ndarray, k: int = 10,
              emb_col: str = 'embedding', id_col: str = 'vec_id',
              query_ids=None, concurrency=None) -> pa.Table:
    """Exact cosine top-k: returns (query_id, rank, vec_id, cosine).

    Deterministic tie-break: higher cosine first, then smaller vec_id.
    """
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    if query_ids is None:
        query_ids = list(range(len(Q)))
    qref = ray.put(Q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        # plain task (not an actor pool): ray.get of the broadcast
        # query matrix is zero-copy shared memory, so per-task setup is
        # free and the task pool autoscales with no actor spin-up cost
        Q = ray.get(qref)
        ids = np.asarray(batch.column(id_col), dtype=np.int64)
        M = _normalize(_emb_matrix(batch.column(emb_col)))
        S = Q @ M.T                    # (nq, nb)
        kk = min(k, S.shape[1])
        out_q, out_id, out_cos = [], [], []
        for qi in range(S.shape[0]):
            # partial top-k with deterministic tie-break
            order = np.lexsort((ids, -S[qi]))[:kk]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_cos.extend(S[qi][order].tolist())
        return pa.table({'qi': pa.array(out_q, pa.int32()),
                         id_col: pa.array(out_id, pa.int64()),
                         'cosine': pa.array(out_cos, pa.float64())})

    kw = {'concurrency': concurrency} if concurrency else {}
    partials = ds.map_batches(partial_topk, batch_format='pyarrow',
                              batch_size=4096, **kw).take_all()
    # final merge (tiny: nq * k * n_batches rows)
    best = {}
    for r in partials:
        best.setdefault(r['qi'], []).append((r['cosine'], r[id_col]))
    out_q, out_rank, out_id, out_cos = [], [], [], []
    for qi in sorted(best):
        rows = sorted(best[qi], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (cos, vid) in enumerate(rows):
            out_q.append(query_ids[qi])
            out_rank.append(rank + 1)
            out_id.append(vid)
            out_cos.append(cos)
    return pa.table({'query_id': pa.array(out_q, pa.int64()),
                     'rank': pa.array(out_rank, pa.int32()),
                     id_col: pa.array(out_id, pa.int64()),
                     'cosine': pa.array(out_cos, pa.float64())})


# ---------------------------------------------------------------------------
# IVF (bucketed) variant — the scale path

def _kmeans(X: np.ndarray, n_clusters: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)
    C = X[idx].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


IVF_TARGET_BUCKET_ROWS = 8192


def derive_n_clusters(n_rows: int,
                      target_bucket_rows: int = IVF_TARGET_BUCKET_ROWS
                      ) -> int:
    """The IVF k-scaling rule: k = ceil(n / TARGET_BUCKET_ROWS), so
    expected bucket size stays ~constant as the corpus grows — the
    per-bucket O((n/k)²·d) matmul stays O(target²·d) at 100× the data
    instead of growing quadratically with a fixed k."""
    return max(1, -(-int(n_rows) // int(target_bucket_rows)))


def ivf_build(ds, n_clusters=16, sample_size: int = 4096,
              emb_col: str = 'embedding', id_col: str = 'vec_id',
              seed: int = 42,
              target_bucket_rows: int = IVF_TARGET_BUCKET_ROWS):
    """Train coarse centroids on a sample and bucket the dataset.

    ``n_clusters=None`` applies the k-scaling rule
    (:func:`derive_n_clusters`): k = ceil(n / target_bucket_rows)
    from the dataset's row count, and the training sample grows with
    k (≥ 8 rows per centroid) so high-k clusterings aren't trained on
    a sample smaller than the centroid set.

    Returns (centroids, bucketed_ds) where bucketed_ds has an extra
    ``ivf_bucket`` column.  The bucketed dataset can be written
    partitioned by bucket for reuse.

    Training sample: deterministic hash reservoir — each row gets a
    seeded splitmix64 key of its id, every batch emits its
    ``sample_size`` smallest-key rows, and the driver folds the stream
    into the global ``sample_size`` smallest (O(sample) driver memory,
    bounded merge per block).  One data pass, no ``count()``, and —
    unlike ``random_sample`` (per-block RNG) — the sample is identical
    under any repartitioning or parallelism.
    """
    import ray

    if n_clusters is None:
        n_clusters = derive_n_clusters(ds.count(), target_bucket_rows)
        sample_size = max(sample_size, 8 * n_clusters)

    skey_seed = _splitmix64(np.array([seed], dtype=np.uint64))

    def partial_sample(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64).astype(np.uint64)
        keys = _splitmix64(ids ^ skey_seed)
        take = np.argsort(keys, kind='stable')[:sample_size]
        M = _emb_matrix(t.column(emb_col))[take]
        return pa.table({
            'skey': pa.array(keys[take], pa.uint64()),
            'emb': pa.array(M.tolist(), pa.list_(pa.float64()))})

    keys = np.empty(0, dtype=np.uint64)
    X = None
    for b in ds.map_batches(partial_sample,
                            batch_format='pyarrow').iter_batches(
                                batch_format='pyarrow'):
        if not b.num_rows:
            continue
        bk = np.asarray(b.column('skey'), dtype=np.uint64)
        bx = _emb_matrix(b.column('emb'))
        keys = np.concatenate([keys, bk])
        X = bx if X is None else np.vstack([X, bx])
        if len(keys) > sample_size:
            keep = np.argsort(keys, kind='stable')[:sample_size]
            keys, X = keys[keep], X[keep]
    if X is not None:
        # sort by reservoir key: the sample SET is layout-independent,
        # but its arrival order is not — k-means' centroid means sum
        # floats in row order, so an unsorted sample makes the trained
        # centroids (and thus sub-exhaustive-nprobe recall) vary run
        # to run.  Key order is unique (splitmix64 of distinct ids).
        order = np.argsort(keys, kind='stable')
        keys, X = keys[order], X[order]
    X = _normalize(X if X is not None else np.zeros((1, 1)))
    C = _kmeans(X, n_clusters, seed=seed)
    cref = ray.put(C)

    def assign_bucket(batch: pa.Table) -> pa.Table:
        # plain task: the centroid matrix broadcast reads zero-copy
        C_ = ray.get(cref)
        M = _normalize(_emb_matrix(batch.column(emb_col)))
        assign = np.argmax(M @ C_.T, axis=1).astype(np.int32)
        return batch.append_column('ivf_bucket', pa.array(assign, pa.int32()))

    return C, ds.map_batches(assign_bucket, batch_format='pyarrow')


IVF_MAX_FLAT_CLUSTERS = 1024


def ivf_bucketize(ds, target_bucket_rows: int = IVF_TARGET_BUCKET_ROWS,
                  max_bucket_rows=None, emb_col: str = 'embedding',
                  id_col: str = 'vec_id', seed: int = 42,
                  max_depth: int = 3, scratch_dir: str | None = None):
    """k-scaled IVF bucketing with recursive oversize-bucket split.

    Returns a Dataset with an int64 ``ivf_bucket`` column where:

    - the flat cluster count follows the k-rule
      (:func:`derive_n_clusters`), capped at
      ``IVF_MAX_FLAT_CLUSTERS`` so the driver-side k-means on the
      reservoir sample stays cheap (sample·k·d flops);
    - when ``max_bucket_rows`` is set, any bucket larger than the cap
      is RE-clustered: its rows are filtered out, a fresh
      :func:`ivf_build` runs on just that subset (distributed assign
      pass, new seed per round), and its sub-buckets get fresh ids —
      recursion up to ``max_depth`` rounds, so the effective cluster
      count grows multiplicatively with depth (1024^depth) and any n
      is reachable without a mega k-means anywhere.
    - a bucket that refuses to split (all points identical — k-means
      puts them on one centroid) is marked final and kept: no
      infinite loop on degenerate corpora.  Consumers must therefore
      still bound their own per-bucket scratch (the dedup family
      tiles its matmuls — see ``dedup._tiled_bucket_pairs``).

    Each round materializes the bucketed dataset before filtering so
    the recursion never re-executes prior rounds' lineage.

    ``scratch_dir``: root for the per-round oversize-split parquet
    partitions (default: a fresh tempdir under /tmp — fine in local
    mode; on a MULTI-NODE cluster pass a path on shared storage, the
    same requirement as the MinHash band scratch in stages/dedup).
    Scratch is removed on success AND on error (try/finally), after a
    final materialize pins the returned dataset.
    """
    import pyarrow.compute as pc

    n = ds.count()
    k = min(derive_n_clusters(n, target_bucket_rows),
            IVF_MAX_FLAT_CLUSTERS)
    _, bucketed = ivf_build(ds, k, sample_size=max(4096, 8 * k),
                            emb_col=emb_col, id_col=id_col, seed=seed)

    def widen(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index('ivf_bucket')
        return t.set_column(i, 'ivf_bucket',
                            pc.cast(t.column('ivf_bucket'), pa.int64()))

    bucketed = bucketed.map_batches(widen, batch_format='pyarrow')
    if max_bucket_rows is None:
        return bucketed

    scratches: list = []  # per-round split-partition dirs
    try:
        next_id = k
        final: set = set()
        # sub-bucket id range -> parent size, for no-progress detection
        split_ranges: list = []
        for depth in range(max_depth):
            bucketed = bucketed.materialize()
            sizes = {int(r['ivf_bucket']): int(r['count()'])
                     for r in bucketed.groupby('ivf_bucket').count()
                     .take_all()}  # answer-sized: one row per bucket
            for base, end, parent_size in split_ranges:
                for b in range(base, end):
                    if sizes.get(b, 0) == parent_size:
                        # the split reproduced its parent verbatim: all
                        # points identical — don't try again
                        final.add(b)
            split_ranges = []
            oversize = sorted(b for b, s in sizes.items()
                              if s > max_bucket_rows and b not in final)
            if not oversize:
                break
            keep = bucketed.map_batches(
                lambda t, _bad=tuple(oversize): t.filter(
                    pc.invert(pc.is_in(t['ivf_bucket'],
                                       value_set=pa.array(_bad, pa.int64())))),
                batch_format='pyarrow')
            parts = [keep]
            # ONE pass isolates every oversize bucket's rows into
            # bucket-partitioned scratch parquet; each re-cluster below
            # then reads only ITS partition directory.  (The previous
            # shape filtered the full corpus once per oversize bucket —
            # O(|oversize| x corpus) scans per round, quadratic once the
            # flat-k cap makes most buckets oversize; review finding,
            # round 5.)
            import os
            import tempfile

            import ray.data

            scratch = tempfile.mkdtemp(prefix='ivf_split_',
                                       dir=scratch_dir or '/tmp')
            scratches.append(scratch)
            bucketed.map_batches(
                lambda t, _bad=tuple(oversize): t.filter(
                    pc.is_in(t['ivf_bucket'],
                             value_set=pa.array(_bad, pa.int64()))),
                batch_format='pyarrow').write_parquet(
                    scratch, partition_cols=['ivf_bucket'])
            for b in oversize:
                sub = ray.data.read_parquet(
                    os.path.join(scratch, 'ivf_bucket=%d' % b))
                if 'ivf_bucket' in (sub.schema().names or []):
                    sub = sub.drop_columns(['ivf_bucket'])
                k_b = min(derive_n_clusters(sizes[b], target_bucket_rows),
                          IVF_MAX_FLAT_CLUSTERS)
                if k_b <= 1:
                    k_b = 2  # force an attempt to split in half
                _, resub = ivf_build(
                    sub, k_b,
                    sample_size=max(4096, 8 * k_b), emb_col=emb_col,
                    id_col=id_col, seed=seed + 1000 * (depth + 1) + b)
                base = next_id
                next_id += k_b
                split_ranges.append((base, base + k_b, sizes[b]))
                resub = resub.map_batches(
                    lambda t, _base=base: t.set_column(
                        t.schema.get_field_index('ivf_bucket'), 'ivf_bucket',
                        pc.add(pc.cast(t.column('ivf_bucket'), pa.int64()),
                               pa.scalar(_base, pa.int64()))),
                    batch_format='pyarrow')
                parts.append(resub)
            merged = parts[0]
            for p in parts[1:]:
                merged = merged.union(p)
            bucketed = merged
        if scratches:
            # the returned dataset may lazily reference the last
            # round's scratch partitions — pin it before deletion
            bucketed = bucketed.materialize()
        return bucketed
    finally:
        if scratches:
            import shutil

            for s in scratches:
                shutil.rmtree(s, ignore_errors=True)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
            nprobe: int = 4, emb_col: str = 'embedding',
            id_col: str = 'vec_id', query_ids=None, seed: int = 42) -> pa.Table:
    """Approximate top-k: probe only the nprobe nearest IVF buckets."""
    import pyarrow.compute as pc

    C, bucketed = ivf_build(ds, n_clusters, emb_col=emb_col, id_col=id_col,
                            seed=seed)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted = sorted({int(b) for row in probe for b in row})
    sub = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t['ivf_bucket'],
                                    value_set=pa.array(wanted, pa.int32()))),
        batch_format='pyarrow')
    return knn_brute(sub, Q, k, emb_col, id_col, query_ids)


# ---------------------------------------------------------------------------
# k-NN self-join (ANN-graph construction: every row's top-k neighbors)

#: corpora at or below this many rows broadcast their (id, embedding)
#: matrix once via ray.put for the exact self-join; above it the
#: IVF-bucketed tier is the path (at 10^10 x 768-dim the matrix is
#: tens of TB -- nothing to broadcast).
KNN_JOIN_BROADCAST_LIMIT = 2_000_000


def _topk_rows(qids, nids, cosines, k: int):
    """Per-query top-k over partial candidate rows (answer-scale
    arrays): higher cosine first, then smaller neighbor id.  Emits
    ranks WITHOUT the cosine value: DuckDB's list_cosine_similarity
    accumulates in float32 (measured ≤2.4e-7 off the float64 matmul),
    so raw cosines can't survive a value-hash compare at any rounding;
    rank ORDER is compare-stable because adjacent top-k gaps on the
    testdata (≥1.4e-6, measured at every sf) exceed the combined
    engine error — the same contract knn_query0 relies on."""
    out_q, out_r, out_n = [], [], []
    order = np.lexsort((nids, -cosines, qids))
    qids, nids = qids[order], nids[order]
    start = 0
    for qi in range(len(qids)):
        if qi + 1 == len(qids) or qids[qi + 1] != qids[qi]:
            take = min(k, qi + 1 - start)
            out_q.extend(qids[start:start + take].tolist())
            out_r.extend(range(1, take + 1))
            out_n.extend(nids[start:start + take].tolist())
            start = qi + 1
    return pa.table({'vec_id': pa.array(out_q, pa.int64()),
                     'rank': pa.array(out_r, pa.int64()),
                     'neighbor_id': pa.array(out_n, pa.int64())})


def knn_join_brute(ds, k: int = 5, emb_col: str = 'embedding',
                   id_col: str = 'vec_id'):
    """Exact cosine k-NN self-join: (vec_id, rank, neighbor_id) for
    every row, self excluded (see _topk_rows for why no cosine col).

    The corpus matrix is broadcast ONCE (gated by
    ``KNN_JOIN_BROADCAST_LIMIT`` at the caller) and the query side
    streams as a Dataset — one numpy matmul per batch, no shuffle.
    The broadcast object is ASSEMBLED BY RAY TASKS from the dataset's
    block refs (per-chunk repack + one concat task), so the corpus
    never streams through the driver — the driver holds ObjectRefs
    only (same fix as ``hard_negatives_blocked``; output order is
    value-keyed, so block arrival order is irrelevant).
    """
    import ray

    @ray.remote(num_cpus=0)
    def repack(*blocks):
        ids, ms = [], []
        for b in blocks:
            if b.num_rows:
                ids.append(np.asarray(b.column(id_col), dtype=np.int64))
                ms.append(_normalize(_emb_matrix(b.column(emb_col))))
        if not ids:
            return (np.empty(0, dtype=np.int64), np.zeros((0, 1)))
        return (np.concatenate(ids), np.vstack(ms))

    @ray.remote(num_cpus=0)
    def assemble(*chunks):
        chunks = [c for c in chunks if len(c[0])]
        if not chunks:
            return (np.empty(0, dtype=np.int64), np.zeros((0, 1)))
        return (np.concatenate([c[0] for c in chunks]),
                np.vstack([c[1] for c in chunks]))

    groups = _group_block_refs(ds.iter_internal_ref_bundles(),
                               HN_CHUNK_ROWS)
    ref = assemble.remote(*[repack.remote(*g) for g in groups])

    def per_batch(t: pa.Table) -> pa.Table:
        ids_d, M_d = ray.get(ref)          # zero-copy shared memory
        q_ids = np.asarray(t.column(id_col), dtype=np.int64)
        Q = _normalize(_emb_matrix(t.column(emb_col)))
        S = Q @ M_d.T
        S[q_ids[:, None] == ids_d[None, :]] = -np.inf   # exclude self
        kk = min(k, max(S.shape[1] - 1, 0))
        qs, ns, cs = [], [], []
        for qi in range(S.shape[0]):
            order = np.lexsort((ids_d, -S[qi]))[:kk]
            qs.extend([q_ids[qi]] * kk)
            ns.extend(ids_d[order].tolist())
            cs.extend(S[qi][order].tolist())
        return _topk_rows(np.array(qs, np.int64), np.array(ns, np.int64),
                          np.array(cs, np.float64), kk)

    return ds.map_batches(per_batch, batch_format='pyarrow',
                          batch_size=4096)


def knn_join_ivf(ds, k: int = 5, n_clusters: int = 8,
                 nprobe: int | None = None, emb_col: str = 'embedding',
                 id_col: str = 'vec_id', seed: int = 42):
    """IVF-bucketed k-NN self-join — the 100-TB path.

    Every vector homes in its nearest-centroid bucket; as a QUERY it
    replicates into its ``nprobe`` nearest buckets.  Each bucket group
    runs one local matmul (its probe-replicated queries x its home
    rows) and emits per-bucket top-k partials; partials fold to the
    global top-k per query with a coarse-bucketed group-apply — no
    full matrix, no all-pairs, O(nprobe x k) partial rows per vector.
    ``nprobe=None`` probes every bucket (exhaustive: exact result, the
    oracle-shared configuration, like ``knn_ivf_query0``).
    """
    import pandas as pd

    from ..pipelines.relational import _per_key_groups

    C, bucketed = ivf_build(ds, n_clusters, emb_col=emb_col,
                            id_col=id_col, seed=seed)
    nb = len(C)
    # nprobe=None = exhaustive (exact; only sensible at an explicit
    # small n_clusters — with the k-rule deriving n_clusters, callers
    # must bound nprobe or query replication grows with k)
    nprobe = nb if nprobe is None else min(nprobe, nb)

    def emit(t: pa.Table) -> pa.Table:
        ids = np.asarray(t.column(id_col), dtype=np.int64)
        M = _normalize(_emb_matrix(t.column(emb_col)))
        home = np.asarray(t.column('ivf_bucket'), dtype=np.int32)
        probe = np.argsort(-(M @ C.T), axis=1)[:, :nprobe]
        # data rows (home bucket) + query replicas (probe buckets)
        bkt = np.concatenate([home.astype(np.int64),
                              probe.astype(np.int64).ravel()])
        kind = np.concatenate([np.zeros(len(ids), np.int8),
                               np.ones(len(ids) * nprobe, np.int8)])
        rid = np.concatenate([ids, np.repeat(ids, nprobe)])
        emb = np.vstack([M, np.repeat(M, nprobe, axis=0)])
        return pa.table({'bkt': pa.array(bkt, pa.int64()),
                         'kind': pa.array(kind, pa.int8()),
                         'rid': pa.array(rid, pa.int64()),
                         'emb': pa.array(emb.tolist(),
                                         pa.list_(pa.float64()))})

    tagged = bucketed.map_batches(emit, batch_format='pyarrow')

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g['kind'] == 0]
        q = g[g['kind'] == 1]
        if not len(d) or not len(q):
            return pd.DataFrame({'qid': pd.Series([], dtype='int64'),
                                 'nid': pd.Series([], dtype='int64'),
                                 'cos': pd.Series([], dtype='float64')})
        D = np.vstack(d['emb'].to_numpy())
        Q = np.vstack(q['emb'].to_numpy())
        ids_d = d['rid'].to_numpy(dtype=np.int64)
        ids_q = q['rid'].to_numpy(dtype=np.int64)
        S = Q @ D.T
        S[ids_q[:, None] == ids_d[None, :]] = -np.inf
        kk = min(k, S.shape[1])
        qs, ns, cs = [], [], []
        for qi in range(S.shape[0]):
            order = np.lexsort((ids_d, -S[qi]))[:kk]
            keep = S[qi][order] > -np.inf
            qs.extend([ids_q[qi]] * int(keep.sum()))
            ns.extend(ids_d[order][keep].tolist())
            cs.extend(S[qi][order][keep].tolist())
        return pd.DataFrame({'qid': np.array(qs, np.int64),
                             'nid': np.array(ns, np.int64),
                             'cos': np.array(cs, np.float64)})

    partials = _per_key_groups(tagged, 'bkt', per_bucket)

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(subset=['nid'])  # same pair via 2 probes
        gg = gg.sort_values(['cos', 'nid'],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            'vec_id': gg['qid'].to_numpy(dtype=np.int64),
            'rank': np.arange(1, len(gg) + 1, dtype=np.int64),
            'neighbor_id': gg['nid'].to_numpy(dtype=np.int64)})

    return _per_key_groups(partials, 'qid', merge_topk)


HN_CHUNK_ROWS = 65536


def _group_block_refs(bundles, chunk_rows: int):
    """Group (block_ref, metadata) pairs into ~chunk_rows chunks.

    ``BlockMetadata.num_rows`` is Optional: a block with UNKNOWN row
    count must be treated as non-empty (it is included and counted as
    a full chunk so it closes its group), never silently dropped —
    dropping would exclude its vectors from a broadcast corpus with
    no error (review finding, round 5)."""
    groups: list = []
    cur: list = []
    cur_rows = 0
    for bundle in bundles:
        for ref, meta in bundle.blocks:
            nr = meta.num_rows
            if nr == 0:
                continue          # known-empty only
            cur.append(ref)
            cur_rows += nr if nr is not None else chunk_rows
            if cur_rows >= chunk_rows:
                groups.append(cur)
                cur, cur_rows = [], 0
    if cur:
        groups.append(cur)
    return groups


def hard_negatives_blocked(ds, emb_col: str = 'embedding',
                           id_col: str = 'vec_id',
                           label_col: str = 'label',
                           chunk_rows: int = HN_CHUNK_ROWS):
    """Contrastive-pair mining, EXACT at corpus scale — the scale tier
    of :func:`hard_negatives_brute` (same output contract: (vec_id,
    pos_id, neg_id), -1 for a memberless class, ties break max-cos
    then min neighbor id).

    100-TB shape (block-nested-loop argmax, no broadcast gate):

    - The corpus side is never driver-concatenated.  Dataset block
      refs are grouped into ~``chunk_rows`` chunks and a Ray task per
      chunk repacks them into an (ids, labels, L2-normalized matrix)
      tuple that stays IN THE OBJECT STORE (spillable); the driver
      only handles ObjectRefs.
    - The query side streams once through ``map_batches``; each batch
      folds a running (best_cos, best_id) argmax across the chunk
      refs — ``ray.get`` of a chunk is plasma-cached per node, so a
      node fetches each chunk once, not once per task.
    - Per-task memory: one query batch × one chunk matrix.  Exact
      all-pairs mining is inherently O(n²·d) flops; this shape bounds
      memory and avoids any single-node materialization.

    Equality with the brute tier is exact, not approximate: per-pair
    cosines are the same d-length dot products, and the cross-chunk
    merge (greater cos, then smaller id) reproduces the brute
    ``lexsort`` tie-break (pinned at sf0.001/sf0.01 in
    tests/test_training_ops.py)."""
    import ray

    @ray.remote(num_cpus=0)
    def build_chunk(*blocks):
        ids, labs, ms = [], [], []
        for b in blocks:
            if b.num_rows:
                ids.append(np.asarray(b.column(id_col), dtype=np.int64))
                labs.append(np.asarray(b.column(label_col),
                                       dtype=np.int64))
                ms.append(_normalize(_emb_matrix(b.column(emb_col))))
        return (np.concatenate(ids), np.concatenate(labs),
                np.vstack(ms))

    groups = _group_block_refs(ds.iter_internal_ref_bundles(),
                               chunk_rows)
    empty = pa.table({'vec_id': pa.array([], pa.int64()),
                      'pos_id': pa.array([], pa.int64()),
                      'neg_id': pa.array([], pa.int64())})
    if not groups:
        import ray.data
        return ray.data.from_arrow(empty)
    chunk_refs = [build_chunk.remote(*g) for g in groups]

    BIG = np.int64(2 ** 62)

    def per_batch(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        q_ids = np.asarray(t.column(id_col), dtype=np.int64)
        q_lab = np.asarray(t.column(label_col), dtype=np.int64)
        Q = _normalize(_emb_matrix(t.column(emb_col)))
        b = len(q_ids)
        best = {w: (np.full(b, -np.inf), np.full(b, BIG))
                for w in ('pos', 'neg')}
        for cref in chunk_refs:
            ids_d, lab_d, M_d = ray.get(cref)
            S = Q @ M_d.T
            S[q_ids[:, None] == ids_d[None, :]] = -np.inf  # no self
            same = q_lab[:, None] == lab_d[None, :]
            for which, mask in (('pos', same), ('neg', ~same)):
                Sm = np.where(mask, S, -np.inf)
                c_cos = Sm.max(axis=1)
                valid = c_cos > -np.inf
                # min neighbor id among the max-cos columns — the
                # brute lexsort((ids, -S))[0] tie-break, vectorized
                c_id = np.where(
                    valid,
                    np.where(Sm == c_cos[:, None],
                             ids_d[None, :], BIG).min(axis=1),
                    BIG)
                b_cos, b_id = best[which]
                better = (c_cos > b_cos) | ((c_cos == b_cos)
                                            & (c_id < b_id))
                best[which] = (np.where(better, c_cos, b_cos),
                               np.where(better, c_id, b_id))
        pos_cos, pos_id = best['pos']
        neg_cos, neg_id = best['neg']
        return pa.table({
            'vec_id': pa.array(q_ids, pa.int64()),
            'pos_id': pa.array(
                np.where(pos_cos > -np.inf, pos_id, -1).astype(np.int64),
                pa.int64()),
            'neg_id': pa.array(
                np.where(neg_cos > -np.inf, neg_id, -1).astype(np.int64),
                pa.int64())})

    return ds.map_batches(per_batch, batch_format='pyarrow',
                          batch_size=4096)


def hard_negatives_brute(ds, emb_col: str = 'embedding',
                         id_col: str = 'vec_id',
                         label_col: str = 'label'):
    """Contrastive-pair mining: for every vector, the most similar
    SAME-label neighbor (the positive) and the most similar
    DIFFERENT-label neighbor (the hard negative) — the batch-mining
    step of contrastive / triplet training.  Returns (vec_id, pos_id,
    neg_id); -1 when a class has no other member.  Rank-only output
    (no cosine column) for the same float32-oracle reason as
    :func:`knn_join_brute`; ties break by neighbor id.

    Scale shape follows :func:`knn_join_brute`: corpus matrix + label
    vector broadcast once via ``ray.put``, query side streams, one
    masked matmul per batch, no shuffle.  Above the broadcast limit
    mine within IVF buckets instead (the :func:`knn_join_ivf`
    pattern)."""
    import ray

    ids_all = np.empty(0, dtype=np.int64)
    lab_all = np.empty(0, dtype=np.int64)
    M_parts = []
    for b in ds.iter_batches(batch_format='pyarrow'):
        if not b.num_rows:
            continue
        ids_all = np.concatenate(
            [ids_all, np.asarray(b.column(id_col), dtype=np.int64)])
        lab_all = np.concatenate(
            [lab_all, np.asarray(b.column(label_col), dtype=np.int64)])
        M_parts.append(_emb_matrix(b.column(emb_col)))
    M = _normalize(np.vstack(M_parts)) if M_parts else np.zeros((0, 1))
    ref = ray.put((ids_all, lab_all, M))

    def pick(ids_d, s_row):
        if not len(s_row) or np.max(s_row) == -np.inf:
            return -1
        return int(ids_d[np.lexsort((ids_d, -s_row))[0]])

    def per_batch(t: pa.Table) -> pa.Table:
        ids_d, lab_d, M_d = ray.get(ref)
        q_ids = np.asarray(t.column(id_col), dtype=np.int64)
        q_lab = np.asarray(t.column(label_col), dtype=np.int64)
        Q = _normalize(_emb_matrix(t.column(emb_col)))
        S = Q @ M_d.T
        S[q_ids[:, None] == ids_d[None, :]] = -np.inf   # exclude self
        same = q_lab[:, None] == lab_d[None, :]
        pos_ids, neg_ids = [], []
        for qi in range(S.shape[0]):
            pos_ids.append(pick(ids_d, np.where(same[qi], S[qi], -np.inf)))
            neg_ids.append(pick(ids_d, np.where(same[qi], -np.inf, S[qi])))
        return pa.table({
            'vec_id': pa.array(q_ids, pa.int64()),
            'pos_id': pa.array(pos_ids, pa.int64()),
            'neg_id': pa.array(neg_ids, pa.int64())})

    return ds.map_batches(per_batch, batch_format='pyarrow',
                          batch_size=4096)
