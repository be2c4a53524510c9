"""BSP shard-actor engine for iterative graph ranking (PageRank, HITS).

The round-4 distributed tier ran every power-iteration round as Ray
Dataset hash joins (edges ⋈ ranks, then nodes ⋈ folded): correct and
driver-stateless, but each join carries ~1 s of fixed pipeline latency,
so a 3-round HITS paid 12 join launches (VERDICT r4 item 4: 7–13× the
fold tier).  This module replaces the per-round joins with the classic
Pregel/BSP shape — the state that was re-shuffled every round is loaded
ONCE into shard actors, and a round is two actor RPC waves:

- ``P`` shard actors (``num_cpus=0`` — state actors never reserve
  CPUs, per the repo's pool-deadlock rule) each own the nodes whose
  ``crc32(url) & 63`` bucket maps to them (``bucket % P``, ``P ≤ 64``)
  plus two static edge indexes: edges whose src they own (forward
  messages) and edges whose dst they own (backward messages, HITS).
- After a one-time HANDSHAKE, the url routing is fully resolved: each
  (sender, receiver, direction) message slot caches the receiver-local
  node-index array, so iteration rounds exchange only float64 value
  arrays through the object store (driver touches ObjectRefs only —
  O(P²) refs per round, never node data).
- Per-node contribution sums are ascending-sorted sequential left
  folds (the ``_fold_sorted`` contract shared with the driver tier and
  the DuckDB oracle — ``np.add.reduceat`` is pairwise and NOT
  bit-equal, so the fold loop stays sequential; it is the same work
  the fold tier does, spread over P shards).
- HITS normalizers reproduce ``_bucket_fold_scalar`` bit-for-bit:
  because shards are crc-bucket-aligned, every crc bucket lives whole
  in one shard, so the per-bucket sorted folds and the final
  sorted fold of ≤ 64 bucket partials are the exact association order
  the round-4 implementation (and its pinned oracle outputs) used.

100-TB shape: shard state is O((edges + nodes)/P); P scales with the
cluster; a round moves O(edges) floats through the object store with
no driver involvement.  Results leave the actors as per-shard Arrow
tables consumed via ``ray.data.from_arrow_refs`` — no O(nodes) driver
list on the ``*_ds`` surface.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

N_BUCKETS = 64


def _bucket(url: str) -> int:
    return zlib.crc32(url.encode()) & (N_BUCKETS - 1)


def _fold_sorted_arr(vals: np.ndarray) -> float:
    """Ascending-sorted sequential left fold (``relational._fold_sorted``
    over a numpy array)."""
    s = None
    for v in np.sort(vals):
        s = v if s is None else s + v
    return 0.0 if s is None else float(s)


#: degree up to which the fold is computed by vectorized fold-steps;
#: segments longer than this use the scalar loop (rare: only the very
#: highest-in-degree nodes)
_FOLD_VEC_STEPS = 64


def _segment_folds(idx: np.ndarray, vals: np.ndarray, n: int) -> np.ndarray:
    """Per-segment ascending-sorted sequential left folds: for each
    i in [0, n) the fold of ``vals[idx == i]`` (0.0 when empty).
    Sequential-add ORDER is the contract (bit-compatibility with the
    driver fold tier and the SQL oracle's
    ``list_reduce(list_sort(...))``) — but sequential order does not
    require a scalar loop: fold STEP j adds every length->j segment's
    j-th value in one vectorized gather-add, which performs the exact
    same left-associated additions per segment.  Segments longer than
    ``_FOLD_VEC_STEPS`` (the heavy-in-degree tail) fall back to the
    scalar loop; bit-equality of the two paths is pinned in tests."""
    out = np.zeros(n, dtype=np.float64)
    if not len(idx):
        return out
    order = np.lexsort((vals, idx))
    si, sv = idx[order], vals[order]
    # segment starts/lengths over the (idx-sorted) stream
    starts = np.flatnonzero(np.diff(si, prepend=si[0] - 1))
    seg_idx = si[starts]
    lengths = np.diff(np.append(starts, len(si)))
    short = lengths <= _FOLD_VEC_STEPS
    if short.any():
        s_starts = starts[short]
        s_len = lengths[short]
        s_tgt = seg_idx[short]
        # sort by length DESC: step j's live segments are then a
        # PREFIX, so each fold step is two contiguous-prefix gathers
        # instead of boolean-mask fancy indexing
        o2 = np.argsort(-s_len, kind='stable')
        s_starts, s_len, s_tgt = s_starts[o2], s_len[o2], s_tgt[o2]
        acc = sv[s_starts].copy()
        neg_len = -s_len            # ascending, for searchsorted
        for j in range(1, int(s_len[0])):
            c = int(np.searchsorted(neg_len, -j, side='left'))
            acc[:c] = acc[:c] + sv[s_starts[:c] + j]
        out[s_tgt] = acc
    for s, ln, tgt in zip(starts[~short], lengths[~short],
                          seg_idx[~short]):
        a = sv[s]
        for k in range(1, ln):
            a = a + sv[s + k]
        out[tgt] = a
    return out


def _make_shard_class():
    import ray

    @ray.remote(num_cpus=0)
    class GraphShard:
        def __init__(self, shard_id: int, num_shards: int):
            self.p = shard_id
            self.P = num_shards
            self._fs, self._fd = [], []   # forward (src-owned) edges
            self._bs, self._bd = [], []   # backward (dst-owned) edges
            self._in_idx: dict = {}       # (kind, sender) -> local idx
            self._tokens: set = set()     # delivered (block, kind) ids

        def add_edges(self, kind: str, token, src: list, dst: list) -> bool:
            """Idempotent by ``token`` (block index + kind): the loader
            runs as Ray tasks whose retries re-deliver the same block —
            a side-effecting, non-idempotent add would double-count
            edges on a worker death (review finding, round 5)."""
            if token in self._tokens:
                return True
            self._tokens.add(token)
            if kind == 'fwd':
                self._fs.extend(src)
                self._fd.extend(dst)
            else:
                self._bs.extend(src)
                self._bd.extend(dst)
            return True

        def finalize(self) -> int:
            nodes = sorted(set(self._fs) | set(self._bd))
            self.nodes = nodes
            self.idx = {u: i for i, u in enumerate(nodes)}
            self.n = len(nodes)
            self.node_buckets = np.array([_bucket(u) for u in nodes],
                                         dtype=np.int64)
            # forward index: contribution source is a local node, the
            # message routes to dst's owner shard
            self.f_src = np.array([self.idx[u] for u in self._fs],
                                  dtype=np.int64)
            fd_owner = np.array([_bucket(u) % self.P for u in self._fd],
                                dtype=np.int64)
            self.f_masks = [np.flatnonzero(fd_owner == q)
                            for q in range(self.P)]
            self.f_dst_urls = self._fd
            self.outdeg = np.bincount(self.f_src, minlength=self.n
                                      ).astype(np.float64)
            # backward index (HITS hub rounds)
            self.b_dst = np.array([self.idx[u] for u in self._bd],
                                  dtype=np.int64)
            bs_owner = np.array([_bucket(u) % self.P for u in self._bs],
                                dtype=np.int64)
            self.b_masks = [np.flatnonzero(bs_owner == q)
                            for q in range(self.P)]
            self.b_src_urls = self._bs
            self._fs = self._fd = self._bs = self._bd = None
            return self.n

        # -- one-time routing handshake ---------------------------------
        def handshake_out(self, kind: str):
            """The url list each receiver will see, in this sender's
            fixed edge order — P lists."""
            if kind == 'fwd':
                return [[self.f_dst_urls[i] for i in m]
                        for m in self.f_masks]
            return [[self.b_src_urls[i] for i in m]
                    for m in self.b_masks]

        def handshake_in(self, kind: str, sender: int, urls: list) -> bool:
            self._in_idx[(kind, sender)] = np.array(
                [self.idx[u] for u in urls], dtype=np.int64)
            return True

        def drop_urls(self) -> bool:
            # after every shard completed handshake_in, the url-level
            # routing is no longer needed
            self.f_dst_urls = None
            self.b_src_urls = None
            return True

        # -- state ------------------------------------------------------
        def set_vec(self, name: str, value: float) -> bool:
            setattr(self, name, np.full(self.n, value, dtype=np.float64))
            return True

        def _gather(self, kind: str, incoming):
            idx = np.concatenate(
                [self._in_idx[(kind, s)] for s in range(self.P)])
            vals = np.concatenate([
                # P == 1: num_returns degenerates, the whole 1-tuple
                # arrives as one object
                np.asarray(v[0] if isinstance(v, tuple) else v,
                           dtype=np.float64)
                for v in incoming])
            return idx, vals

        # -- pagerank ---------------------------------------------------
        def pr_messages(self):
            c = (getattr(self, 'r') / np.maximum(self.outdeg, 1.0)
                 )[self.f_src]
            return tuple(c[m] for m in self.f_masks)

        def pr_apply(self, base: float, damping: float, *incoming) -> bool:
            idx, vals = self._gather('fwd', incoming)
            folds = _segment_folds(idx, vals, self.n)
            self.r = base + damping * folds
            return True

        def pr_result(self) -> pa.Table:
            v = np.rint(self.r * 1e6) / 1e6 + 0.0
            return pa.table({'url': pa.array(self.nodes, pa.string()),
                             'pagerank': pa.array(v, pa.float64())})

        # -- hits -------------------------------------------------------
        def hits_messages(self, kind: str, vec: str):
            v = getattr(self, vec)
            if kind == 'fwd':
                c = v[self.f_src]
                return tuple(c[m] for m in self.f_masks)
            c = v[self.b_dst]
            return tuple(c[m] for m in self.b_masks)

        def hits_apply(self, kind: str, vec: str, *incoming) -> bool:
            idx, vals = self._gather(kind, incoming)
            setattr(self, vec, _segment_folds(idx, vals, self.n))
            return True

        def bucket_partials(self, vec: str):
            """(bucket, sorted-fold of this bucket's values) pairs —
            buckets are whole within a shard (crc-aligned sharding),
            so these are exactly ``_bucket_fold_scalar``'s bucket
            rows."""
            v = getattr(self, vec)
            out = []
            for b in np.unique(self.node_buckets):
                out.append((int(b),
                            _fold_sorted_arr(v[self.node_buckets == b])))
            return out

        def hits_result(self, nh: float, na: float) -> pa.Table:
            hv = self.hub / nh if nh else np.zeros(self.n)
            av = self.auth / na if na else np.zeros(self.n)
            return pa.table({
                'url': pa.array(self.nodes, pa.string()),
                'hub': pa.array(np.rint(hv * 1e6) / 1e6 + 0.0,
                                pa.float64()),
                'auth': pa.array(np.rint(av * 1e6) / 1e6 + 0.0,
                                 pa.float64())})

        def hits_raw(self) -> pa.Table:
            """Unnormalized, unrounded scores — the table-returning
            tier pulls these (answer-sized) and normalizes with the
            FLAT ``_hits_snap`` sorted fold, bit-identical to the
            driver fold tier and the SQL oracle."""
            return pa.table({
                'url': pa.array(self.nodes, pa.string()),
                'hub': pa.array(self.hub, pa.float64()),
                'auth': pa.array(self.auth, pa.float64())})

    return GraphShard


def _load_shards(eds, num_shards: int):
    """One pass over the (src, dst) edge Dataset routing every edge to
    its src-owner (forward index) and dst-owner (backward index).

    Runs as one raw Ray task PER BLOCK (driver holds block refs only),
    each delivering with a (block_index, kind) token so a task retry
    after a worker death re-delivers idempotently — a map_batches
    side-effect kernel would double-add edges on lineage
    re-execution."""
    import ray

    assert num_shards <= N_BUCKETS
    cls = _make_shard_class()
    shards = [cls.remote(p, num_shards) for p in range(num_shards)]

    @ray.remote(num_cpus=0)
    def route_block(blk_idx: int, t: pa.Table) -> int:
        src = t.column('src').to_pylist()
        dst = t.column('dst').to_pylist()
        sb = np.array([_bucket(u) % num_shards for u in src],
                      dtype=np.int64)
        db = np.array([_bucket(u) % num_shards for u in dst],
                      dtype=np.int64)
        acks = []
        for p in range(num_shards):
            m = np.flatnonzero(sb == p)
            if len(m):
                acks.append(shards[p].add_edges.remote(
                    'fwd', (blk_idx, 'fwd'),
                    [src[i] for i in m], [dst[i] for i in m]))
            m = np.flatnonzero(db == p)
            if len(m):
                acks.append(shards[p].add_edges.remote(
                    'bwd', (blk_idx, 'bwd'),
                    [src[i] for i in m], [dst[i] for i in m]))
        ray.get(acks)
        return t.num_rows

    block_refs = [bref for bundle in eds.iter_internal_ref_bundles()
                  for bref, _meta in bundle.blocks]
    ray.get([route_block.remote(i, bref)
             for i, bref in enumerate(block_refs)])
    n_total = sum(ray.get([s.finalize.remote() for s in shards]))
    return shards, n_total


def _handshake(shards, kinds=('fwd',)):
    import ray

    P = len(shards)
    for kind in kinds:
        outs = ray.get([s.handshake_out.remote(kind) for s in shards])
        acks = []
        for sender in range(P):
            for receiver in range(P):
                acks.append(shards[receiver].handshake_in.remote(
                    kind, sender, outs[sender][receiver]))
        ray.get(acks)
    ray.get([s.drop_urls.remote() for s in shards])


def pagerank_bsp(eds, iters: int, damping: float, num_shards: int = 8):
    """Distributed PageRank over a (src, dst) edge Dataset; returns a
    Dataset of (url, pagerank) assembled from per-shard Arrow tables
    (``from_arrow_refs`` — no driver list).  Bit-compatible with the
    driver fold tier: identical per-node contribution values, folded
    in the identical ascending order."""
    import ray
    import ray.data

    shards, n_total = _load_shards(eds, num_shards)
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            'url': pa.array([], pa.string()),
            'pagerank': pa.array([], pa.float64())}))
    _handshake(shards, kinds=('fwd',))
    P = len(shards)
    base = (1.0 - damping) / float(n_total)
    ray.get([s.set_vec.remote('r', 1.0 / float(n_total))
             for s in shards])
    for _ in range(iters):
        msgs = [shards[p].pr_messages.options(
            num_returns=P).remote() for p in range(P)]
        if P == 1:
            msgs = [[m] for m in msgs]
        ray.get([shards[q].pr_apply.remote(
            base, damping, *[msgs[s][q] for s in range(P)])
            for q in range(P)])
    return ray.data.from_arrow_refs(
        [s.pr_result.remote() for s in shards])


def hits_bsp(eds, iters: int, num_shards: int = 8,
             normalized: bool = True):
    """Distributed HITS (unnormalized rounds, one final sum-normalize
    — the relational.hits contract); returns a Dataset of (url, hub,
    auth).  With ``normalized=True`` (the ``*_ds`` surface) the
    normalizers reproduce ``_bucket_fold_scalar`` exactly:
    per-crc-bucket sorted folds (bucket-whole sharding), then a sorted
    fold of the ≤ 64 bucket partials on the driver.  With
    ``normalized=False`` the RAW unrounded score vectors return so the
    table tier can apply the FLAT ``_hits_snap`` fold — bit-identical
    to the driver fold tier (the two normalizer shapes differ only
    sub-ulp, but the table tier's pin is exact, so it must not change
    association order)."""
    import ray
    import ray.data

    shards, n_total = _load_shards(eds, num_shards)
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            'url': pa.array([], pa.string()),
            'hub': pa.array([], pa.float64()),
            'auth': pa.array([], pa.float64())}))
    _handshake(shards, kinds=('fwd', 'bwd'))
    P = len(shards)
    ray.get([s.set_vec.remote('hub', 1.0) for s in shards])
    for _ in range(iters):
        for kind, src_vec, dst_vec in (('fwd', 'hub', 'auth'),
                                       ('bwd', 'auth', 'hub')):
            msgs = [shards[p].hits_messages.options(
                num_returns=P).remote(kind, src_vec)
                for p in range(P)]
            if P == 1:
                msgs = [[m] for m in msgs]
            ray.get([shards[q].hits_apply.remote(
                kind, dst_vec, *[msgs[s][q] for s in range(P)])
                for q in range(P)])
    if not normalized:
        return ray.data.from_arrow_refs(
            [s.hits_raw.remote() for s in shards])
    nh = _fold_of_bucket_partials(shards, 'hub')
    na = _fold_of_bucket_partials(shards, 'auth')
    return ray.data.from_arrow_refs(
        [s.hits_result.remote(nh, na) for s in shards])


def _fold_of_bucket_partials(shards, vec: str) -> float:
    import ray

    partials = []
    for rows in ray.get([s.bucket_partials.remote(vec)
                         for s in shards]):
        partials.extend(s for _b, s in rows)
    s = None
    for v in sorted(partials):
        s = v if s is None else s + v
    return 0.0 if s is None else s
