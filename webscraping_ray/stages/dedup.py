"""Deduplication stages for large-scale text corpora.

The reference's dedup is URL-level (``adt.HashDict`` membership /
``UnicodeWriter`` row dedup, reference adt.py:30-74, common.py:564-589);
a training-data engine also needs content-level dedup.  All stages are
Ray-Data-shaped:

- exact:   vectorized content hash per batch → ``groupby(hash)`` keep
           first (min key) — one shuffle over (hash, id) pairs only.
- minhash: shingle → k minhashes → b bands → explode (band, band_hash,
           id) rows → ``groupby`` band buckets → candidate pairs →
           verified Jaccard.  The shuffle carries fixed-size signatures,
           never documents.
- simhash: 64-bit weighted token fingerprint; near-dup = small hamming
           distance (bucket by 4 × 16-bit sub-bands for candidates).
- embedding: cosine near-dup via blocked matmul against a broadcast
           (ray.put) matrix — no shuffle for the small-side pattern.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r'\w+', re.UNICODE)

_MERSENNE = (1 << 61) - 1


def content_hash64(s: str) -> int:
    h = int.from_bytes(hashlib.blake2b(s.encode('utf-8', 'surrogatepass'),
                                       digest_size=8).digest(), 'little')
    return h - (1 << 64) if h >= (1 << 63) else h


def content_md5(s: str) -> str:
    return hashlib.md5(s.encode('utf-8', 'surrogatepass')).hexdigest()


class AddContentHash:
    """map_batches: append a stable content hash of ``col``."""

    def __init__(self, col: str = 'text', out: str = 'content_hash',
                 hex_md5: bool = False):
        self.col = col
        self.out = out
        self.hex_md5 = hex_md5

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.col).to_pylist()
        if self.hex_md5:
            arr = pa.array([content_md5(v or '') for v in vals], pa.string())
        else:
            arr = pa.array([content_hash64(v or '') for v in vals], pa.int64())
        return batch.append_column(self.out, arr)


def exact_dedup(ds, text_col: str = 'text', id_col: str = 'doc_id'):
    """Exact content dedup: keep the min-id row per identical text.

    Shuffle carries only (hash, id): the groupby runs on a projected
    two-column dataset, then survivors semi-join back by id broadcast.
    Returns the Dataset of surviving ids (one column ``id_col``).
    """
    hashed = ds.map_batches(AddContentHash(text_col), batch_format='pyarrow')
    pairs = hashed.select_columns(['content_hash', id_col])
    from ray.data.aggregate import Min
    survivors = pairs.groupby('content_hash').aggregate(
        Min(id_col, alias_name=id_col))
    return survivors.select_columns([id_col])


# ---------------------------------------------------------------------------
# MinHash + LSH

def shingles(text: str, k: int = 3):
    """Word k-shingles (lowercased \\w+ tokens)."""
    toks = _TOKEN_RE.findall((text or '').lower())
    if len(toks) < k:
        return {' '.join(toks)} if toks else set()
    return {' '.join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class MinHasher:
    """k-permutation MinHash over shingle hashes (vectorized numpy)."""

    def __init__(self, num_hashes: int = 128, k_shingle: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
        self.num_hashes = num_hashes
        self.k_shingle = k_shingle

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k_shingle)
        if not sh:
            return np.full(self.num_hashes, np.uint64(_MERSENNE), dtype=np.uint64)
        base = np.array([content_hash64(s) for s in sh],
                        dtype=np.int64).astype(np.uint64)
        # (a*x + b) mod p for each hash fn — vectorized (n_shingles x k)
        prod = (base[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return prod.min(axis=0)


class MinHashBands:
    """map_batches: text → exploded (band_id, band_hash, id) rows."""

    def __init__(self, num_hashes: int = 128, bands: int = 32,
                 k_shingle: int = 3, text_col: str = 'text',
                 id_col: str = 'doc_id', seed: int = 42):
        assert num_hashes % bands == 0
        self.hasher = MinHasher(num_hashes, k_shingle, seed)
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in zip(ids, texts):
            sig = self.hasher.signature(t)
            for b in range(self.bands):
                seg = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.blake2b(seg.tobytes() + bytes([b]),
                                    digest_size=8).digest(),
                    'little', signed=False)
                out_id.append(i)
                out_band.append(b)
                out_hash.append(bh - (1 << 64) if bh >= (1 << 63) else bh)
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            'band_id': pa.array(out_band, pa.int32()),
            'band_hash': pa.array(out_hash, pa.int64()),
        })


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def minhash_dup_pairs(ds, threshold: float = 0.8, num_hashes: int = 128,
                      bands: int = 32, k_shingle: int = 3,
                      text_col: str = 'text', id_col: str = 'doc_id'):
    """MinHash-LSH near-duplicate pairs with verified Jaccard.

    Returns a pyarrow Table (id_a, id_b, jaccard) with id_a < id_b,
    sorted.  Candidate generation is fully distributed; verification
    re-reads only candidate documents (semi-join by id) and runs
    exact Jaccard per pair.
    """
    import pandas as pd

    bands_ds = ds.map_batches(
        MinHashBands(num_hashes, bands, k_shingle, text_col, id_col),
        batch_format='pyarrow')

    # duplicate buckets via a vectorized count aggregate (NOT map_groups:
    # almost every bucket is a singleton, and per-group python over
    # millions of singleton groups is pathological)
    from ray.data.aggregate import Count

    counts = bands_ds.groupby('band_hash').aggregate(Count(alias_name='cnt'))
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater(t['cnt'], 1)).select(['band_hash']),
        batch_format='pyarrow').take_all()
    if not dup_keys:
        return pa.table({'id_a': pa.array([], pa.int64()),
                         'id_b': pa.array([], pa.int64()),
                         'jaccard': pa.array([], pa.float64())})
    dup_set = pa.array(sorted({r['band_hash'] for r in dup_keys}), pa.int64())
    members = (bands_ds.map_batches(
        lambda t: t.filter(pc.is_in(t['band_hash'], value_set=dup_set)),
        batch_format='pyarrow').take_all())
    by_bucket = {}
    for r in members:
        by_bucket.setdefault(r['band_hash'], set()).add(r[id_col])
    out_a, out_b = [], []
    for ids_set in by_bucket.values():
        ids = sorted(ids_set)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out_a.append(ids[i])
                out_b.append(ids[j])
    cand_tbl = pd.DataFrame({'id_a': out_a, 'id_b': out_b}).drop_duplicates()
    if cand_tbl.empty:
        return pa.table({'id_a': pa.array([], pa.int64()),
                         'id_b': pa.array([], pa.int64()),
                         'jaccard': pa.array([], pa.float64())})
    # verify: fetch candidate docs (broadcast the needed ids), exact jaccard
    need = sorted(set(cand_tbl['id_a']) | set(cand_tbl['id_b']))
    need_set = pa.array(need, pa.int64())
    docs = (ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=need_set)),
        batch_format='pyarrow')
        .select_columns([id_col, text_col]).take_all())
    text_of = {r[id_col]: r[text_col] for r in docs}
    ja = [jaccard(text_of.get(a, ''), text_of.get(b, ''), k_shingle)
          for a, b in zip(cand_tbl['id_a'], cand_tbl['id_b'])]
    cand_tbl = cand_tbl.assign(jaccard=ja)
    keep = cand_tbl[cand_tbl['jaccard'] >= threshold].sort_values(['id_a', 'id_b'])
    return pa.table({'id_a': pa.array(keep['id_a'].tolist(), pa.int64()),
                     'id_b': pa.array(keep['id_b'].tolist(), pa.int64()),
                     'jaccard': pa.array(keep['jaccard'].tolist(), pa.float64())})


# ---------------------------------------------------------------------------
# SimHash

class SimHash:
    """64-bit SimHash over \\w+ tokens (term-frequency weighted)."""

    def __init__(self, text_col: str = 'text', id_col: str = 'doc_id',
                 out: str = 'simhash'):
        self.text_col = text_col
        self.id_col = id_col
        self.out = out

    @staticmethod
    def fingerprint(text: str) -> int:
        toks = _TOKEN_RE.findall((text or '').lower())
        if not toks:
            return 0
        from collections import Counter
        counts = Counter(toks)
        hashes = np.array([content_hash64(t) for t in counts],
                          dtype=np.int64).astype(np.uint64)
        weights = np.array(list(counts.values()), dtype=np.int64)
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
        fp = 0
        for bit in range(64):
            if v[bit] > 0:
                fp |= (1 << bit)
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = [self.fingerprint(t) for t in texts]
        return pa.table({self.id_col: batch.column(self.id_col),
                         self.out: pa.array(fps, pa.int64())})


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count('1')


def simhash_dup_pairs(ds, max_hamming: int = 3, text_col: str = 'text',
                      id_col: str = 'doc_id'):
    """SimHash near-dup pairs: bucket by the four 16-bit sub-bands
    (any pair within hamming ≤ 3 of a 64-bit code shares at least one
    exact 16-bit band — pigeonhole over 4 bands), verify hamming."""
    import pandas as pd

    sims = ds.map_batches(SimHash(text_col, id_col), batch_format='pyarrow')

    def explode_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        fps = t.column('simhash').to_pylist()
        out_id, out_band, out_key, out_fp = [], [], [], []
        for i, fp in zip(ids, fps):
            u = fp & ((1 << 64) - 1)
            for b in range(4):
                out_id.append(i)
                out_band.append(b)
                out_key.append((u >> (16 * b)) & 0xFFFF)
                out_fp.append(fp)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         'band_id': pa.array(out_band, pa.int32()),
                         'band_key': pa.array(out_key, pa.int32()),
                         'simhash': pa.array(out_fp, pa.int64())})

    from ray.data.aggregate import Count

    bands_ds = sims.map_batches(explode_bands, batch_format='pyarrow')

    def bkey(t: pa.Table) -> pa.Table:
        key = pc.add(pc.multiply(pc.cast(t['band_key'], pa.int64()),
                                 pa.scalar(7, pa.int64())),
                     pc.cast(t['band_id'], pa.int64()))
        return t.append_column('bkey', key)

    keyed = bands_ds.map_batches(bkey, batch_format='pyarrow')
    counts = keyed.groupby('bkey').aggregate(Count(alias_name='cnt'))
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater(t['cnt'], 1)).select(['bkey']),
        batch_format='pyarrow').take_all()
    out_a, out_b, out_h = [], [], []
    if dup_keys:
        dup_set = pa.array(sorted({r['bkey'] for r in dup_keys}), pa.int64())
        members = keyed.map_batches(
            lambda t: t.filter(pc.is_in(t['bkey'], value_set=dup_set)),
            batch_format='pyarrow').take_all()
        by_bucket = {}
        for r in members:
            by_bucket.setdefault(r['bkey'], set()).add((r[id_col], r['simhash']))
        seen_pairs = set()
        for rows_set in by_bucket.values():
            rows = sorted(rows_set)
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    key = (rows[i][0], rows[j][0])
                    if key in seen_pairs:
                        continue
                    h = hamming64(rows[i][1], rows[j][1])
                    if h <= max_hamming:
                        seen_pairs.add(key)
                        out_a.append(key[0])
                        out_b.append(key[1])
                        out_h.append(h)
    pairs = (pd.DataFrame({'id_a': out_a, 'id_b': out_b, 'hamming': out_h})
             .sort_values(['id_a', 'id_b']) if out_a else
             pd.DataFrame({'id_a': [], 'id_b': [], 'hamming': []}))
    return pa.table({'id_a': pa.array(pairs['id_a'].tolist(), pa.int64()),
                     'id_b': pa.array(pairs['id_b'].tolist(), pa.int64()),
                     'hamming': pa.array(pairs['hamming'].tolist(), pa.int32())})


# ---------------------------------------------------------------------------
# embedding cosine near-dup

def embedding_dup_pairs(ds, threshold: float = 0.95,
                        emb_col: str = 'embedding', id_col: str = 'vec_id'):
    """Near-dup pairs by cosine ≥ threshold.

    Pattern: normalize per batch, broadcast the (small enough) full
    normalized matrix via ray.put once, then each batch does one
    blocked matmul against it — O(n·d) shipped once, not per batch.
    For corpora whose matrix cannot be broadcast, use
    ``similarity.ivf_build`` buckets first.
    """
    import ray

    mat_rows = ds.select_columns([id_col, emb_col]).take_all()
    ids = np.array([r[id_col] for r in mat_rows], dtype=np.int64)
    M = np.array([r[emb_col] for r in mat_rows], dtype=np.float64)
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, M))

    class BlockCos:
        def __init__(self):
            self.ids, self.M = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.asarray(batch.column(id_col), dtype=np.int64)
            B = np.array(batch.column(emb_col).to_pylist(), dtype=np.float64)
            B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
            S = B @ self.M.T
            out_a, out_b, out_c = [], [], []
            for r in range(S.shape[0]):
                hits = np.flatnonzero(S[r] >= threshold)
                for c in hits:
                    a, b = int(bids[r]), int(self.ids[c])
                    if a < b:
                        out_a.append(a)
                        out_b.append(b)
                        out_c.append(float(S[r, c]))
            return pa.table({'id_a': pa.array(out_a, pa.int64()),
                             'id_b': pa.array(out_b, pa.int64()),
                             'cosine': pa.array(out_c, pa.float64())})

    pairs = ds.map_batches(BlockCos, batch_format='pyarrow',
                           batch_size=1024, concurrency=2, num_cpus=0.5).take_all()
    pairs.sort(key=lambda r: (r['id_a'], r['id_b']))
    return pa.table({'id_a': pa.array([r['id_a'] for r in pairs], pa.int64()),
                     'id_b': pa.array([r['id_b'] for r in pairs], pa.int64()),
                     'cosine': pa.array([r['cosine'] for r in pairs], pa.float64())})
