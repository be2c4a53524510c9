"""Connected components (stages/clusters.py) and the round-3 training
ops built on it (dup_clusters, clean_corpus_clustered, pack_sequences,
mixture_weights)."""

import numpy as np
import pyarrow as pa
import pytest

from webscraping_ray.stages.clusters import (_cc_numpy,
                                             connected_components)


def _edges(pairs):
    a, b = zip(*pairs) if pairs else ((), ())
    return pa.table({'id_a': pa.array(a, pa.int64()),
                     'id_b': pa.array(b, pa.int64())})


def _uf_labels(pairs):
    """Reference union-find (plain python) — min id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


CASES = [
    [],                                            # empty graph
    [(5, 9)],                                      # single edge
    [(1, 2), (2, 3), (3, 4), (10, 11)],            # chain + pair
    [(i, i + 1) for i in range(60)],               # 61-node chain
    [(0, i) for i in range(1, 20)],                # star
    [(7, 3), (3, 7), (7, 7)],                      # dup edges + self-loop
]


@pytest.mark.parametrize('pairs', CASES)
def test_cc_numpy_matches_union_find(pairs):
    out = _cc_numpy(np.array([a for a, _ in pairs], np.int64),
                    np.array([b for _, b in pairs], np.int64))
    want = _uf_labels(pairs)
    got = dict(zip(out.column('doc_id').to_pylist(),
                   out.column('cluster_id').to_pylist()))
    assert got == want
    # output is sorted by doc_id
    ids = out.column('doc_id').to_pylist()
    assert ids == sorted(ids)


def test_cc_random_graph_matches_union_find():
    rng = np.random.default_rng(7)
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, 400, size=(600, 2))]
    out = _cc_numpy(np.array([a for a, _ in pairs], np.int64),
                    np.array([b for _, b in pairs], np.int64))
    got = dict(zip(out.column('doc_id').to_pylist(),
                   out.column('cluster_id').to_pylist()))
    assert got == _uf_labels(pairs)


@pytest.mark.parametrize('pairs', [c for c in CASES if c])
def test_cc_distributed_tier_matches_numpy(ray_session, pairs):
    got = connected_components(_edges(pairs), num_partitions=2,
                               force_distributed=True)
    want = connected_components(_edges(pairs))
    assert got.equals(want)


def test_cc_distributed_long_chain(ray_session):
    # multi-round convergence: a 150-node chain needs pointer jumping
    pairs = [(i, i + 1) for i in range(150)]
    got = connected_components(_edges(pairs), num_partitions=4,
                               force_distributed=True)
    assert set(got.column('cluster_id').to_pylist()) == {0}
    assert got.num_rows == 151


def test_cc_dataset_input_driver_tier(ray_session):
    import ray.data
    ds = ray.data.from_arrow(_edges([(1, 2), (2, 3), (8, 9)]))
    out = connected_components(ds)
    assert dict(zip(out.column('doc_id').to_pylist(),
                    out.column('cluster_id').to_pylist())) == {
        1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_dup_clusters_is_transitive_closure_of_pairs(ray_session):
    """dup_clusters == union-find over the minhash_dups pair list."""
    from webscraping_ray.pipelines import relational as R

    sf = '/root/testdata/sf0.001'
    pairs_t = R.minhash_dups(sf)
    pairs = list(zip(pairs_t.column('id_a').to_pylist(),
                     pairs_t.column('id_b').to_pylist()))
    out = R.dup_clusters(sf)
    got = dict(zip(out.column('doc_id').to_pylist(),
                   out.column('cluster_id').to_pylist()))
    assert got == _uf_labels(pairs)


def test_clean_corpus_clustered_keeps_one_per_component(ray_session):
    from webscraping_ray.pipelines import relational as R

    sf = '/root/testdata/sf0.001'
    survivors = {r['doc_id']
                 for r in R.clean_corpus_clustered(sf).take_all()}
    base = {r['doc_id'] for r in R.clean_corpus(sf).take_all()}
    assert survivors <= base

    import pyarrow.parquet as pq
    texts = dict(zip(
        pq.read_table(f'{sf}/documents.parquet',
                      columns=['doc_id', 'text']).column('doc_id')
        .to_pylist(),
        pq.read_table(f'{sf}/documents.parquet',
                      columns=['doc_id', 'text']).column('text')
        .to_pylist()))
    from webscraping_ray.stages.dedup import minhash_dup_pairs
    import ray.data
    keep_t = pa.table({
        'doc_id': pa.array(sorted(base), pa.int64()),
        'text': pa.array([texts[i] for i in sorted(base)], pa.string())})
    pairs_t = minhash_dup_pairs(ray.data.from_arrow(keep_t),
                                threshold=0.8)
    pairs = list(zip(pairs_t.column('id_a').to_pylist(),
                     pairs_t.column('id_b').to_pylist()))
    labels = _uf_labels(pairs)
    # exactly the component minima survive among paired docs
    paired = set(labels)
    comp_min = {v for v in labels.values()}
    assert survivors & paired == comp_min
    # unpaired survivors pass through untouched
    assert (base - paired) <= survivors


def test_pack_sequences_matches_sequential_fold(ray_session):
    from webscraping_ray.pipelines import relational as R
    from webscraping_ray.stages.textstats import whitespace_token_count
    import pyarrow.parquet as pq

    sf = '/root/testdata/sf0.001'
    ctx = 2048
    out = {r['doc_id']: (r['n_tokens'], r['seq_id'], r['seq_offset'])
           for r in R.pack_sequences(sf, ctx=ctx).take_all()}
    t = pq.read_table(f'{sf}/documents.parquet',
                      columns=['doc_id', 'text'])
    rows = sorted(zip(t.column('doc_id').to_pylist(),
                      t.column('text').to_pylist()))
    pre = 0
    crossed = 0
    for doc_id, text in rows:
        n = whitespace_token_count(text)
        assert out[doc_id] == (n, pre // ctx, pre % ctx)
        if (pre % ctx) + n > ctx:
            crossed += 1
        pre += n
    assert len(out) == len(rows)
    assert crossed > 0  # boundary-crossing docs exercised


def test_pack_sequences_bucket_invariance(ray_session):
    """The distributed prefix sum must not depend on the bucket width
    (driver-scan granularity)."""
    from webscraping_ray.pipelines import relational as R

    sf = '/root/testdata/sf0.001'
    base = R.pack_sequences(sf).take_all()
    import webscraping_ray.pipelines.relational as rel
    old = rel.PACK_BUCKET_DOCS
    try:
        rel.PACK_BUCKET_DOCS = 7  # force many buckets
        alt = R.pack_sequences(sf).take_all()
    finally:
        rel.PACK_BUCKET_DOCS = old
    key = lambda r: r['doc_id']
    assert sorted(base, key=key) == sorted(alt, key=key)


def test_mixture_weights_properties(ray_session):
    from webscraping_ray.pipelines import relational as R

    out = R.mixture_weights('/root/testdata/sf0.001')
    w = np.array(out.column('weight').to_pylist())
    share = np.array(out.column('token_share').to_pylist())
    assert abs(w.sum() - 1.0) < 1e-5
    assert abs(share.sum() - 1.0) < 1e-5
    # alpha=0.5 flattens but preserves order: same ranking, and the
    # boost ratio w/share strictly decreases as share grows
    order = np.argsort(share)
    assert (np.diff(w[order]) >= -1e-12).all()
    ratio = w[order] / share[order]
    assert (np.diff(ratio) <= 1e-12).all()
    # alpha=1 is a no-op (weights == shares)
    flat = R.mixture_weights('/root/testdata/sf0.001', alpha=1.0)
    assert np.allclose(flat.column('weight').to_pylist(),
                       flat.column('token_share').to_pylist(),
                       atol=2e-6)


def test_embedding_dup_clusters_planted(ray_session, tmp_path):
    """Plant two near-identical vector groups; the query must label
    each group with its min vec_id."""
    import pyarrow.parquet as pq
    from webscraping_ray.pipelines import relational as R

    # n >> n_clusters so IVF is non-degenerate (with fewer points than
    # centroids every near-dup gets its own centroid and recall dies —
    # not the regime the operator targets)
    n = 300
    rng = np.random.default_rng(3)
    base = rng.normal(size=(2, 16))
    vecs = []
    for i in range(n):
        if i in (40, 70, 90):      # cluster around vec 40's direction
            v = base[0] + rng.normal(scale=1e-4, size=16)
        elif i in (20, 60):        # second cluster
            v = base[1] + rng.normal(scale=1e-4, size=16)
        else:
            v = rng.normal(size=16)
        vecs.append((v / np.linalg.norm(v)).tolist())
    t = pa.table({'vec_id': pa.array(range(n), pa.int64()),
                  'embedding': pa.array(vecs, pa.list_(pa.float64()))})
    pq.write_table(t, tmp_path / 'embeddings.parquet')

    out = R.embedding_dup_clusters(str(tmp_path))
    got = dict(zip(out.column('doc_id').to_pylist(),
                   out.column('cluster_id').to_pylist()))
    want = {40: 40, 70: 40, 90: 40, 20: 20, 60: 20}
    # random 16-dim vectors can stray above 0.95 cosine; the planted
    # clusters must be present and correctly labeled regardless
    for k, v in want.items():
        assert got.get(k) == v, (k, got.get(k))


def test_embedding_brute_float64_input(ray_session):
    """Regression: float64 embedding columns reach BlockCos as a
    zero-copy READ-ONLY Arrow view; normalization must not mutate it
    in place (crashed with 'output array is read-only')."""
    import ray.data
    from webscraping_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.default_rng(11)
    M = rng.normal(size=(40, 8))
    M[7] = M[3] + 1e-6          # planted near-dup
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    ds = ray.data.from_arrow(pa.table({
        'vec_id': pa.array(range(40), pa.int64()),
        'embedding': pa.array(M.tolist(), pa.list_(pa.float64()))}))
    out = embedding_dup_pairs(ds, threshold=0.999, method='brute')
    pairs = set(zip(out.column('id_a').to_pylist(),
                    out.column('id_b').to_pylist()))
    assert (3, 7) in pairs


def test_events_band_join_edge_inclusive(ray_session, tmp_path, monkeypatch):
    """Band bounds are inclusive (BETWEEN semantics): events exactly
    band_s away count; one microsecond further do not."""
    import pyarrow.parquet as pq
    import webscraping_ray.pipelines.relational as rel

    base = 1_700_000_000_000_000  # us epoch
    band = 600 * 1_000_000
    rows = [
        (0, 10, base, 1.0),
        (1, 10, base + band, 2.0),        # exactly at +band of e0
        (2, 10, base + band + 1, 4.0),    # 1us beyond e0's band
        (3, 99, base, 8.0),               # other user, same instant
    ]
    t = pa.table({
        'event_id': pa.array([r[0] for r in rows], pa.int64()),
        'user_id': pa.array([r[1] for r in rows], pa.int64()),
        'ts': pa.array([r[2] for r in rows], pa.timestamp('us')),
        'value': pa.array([r[3] for r in rows], pa.float64()),
        'event_type': pa.array(['x'] * 4, pa.string()),
        'props': pa.array([''] * 4, pa.string()),
    })
    pq.write_table(t, tmp_path / 'events.parquet')
    out = {r['event_id']: (r['n_nearby'], r['sum_nearby_value'])
           for r in rel.events_band_join(str(tmp_path)).take_all()}
    assert out[0] == (1, 2.0)        # sees e1 only (e2 is 1us out)
    assert out[1] == (2, 5.0)        # sees e0 and e2
    assert out[2] == (1, 2.0)        # sees e1 only
    assert out[3] == (0, 0.0)        # alone on its user


def test_repeated_spans_planted_and_tier_equal(ray_session, tmp_path,
                                               monkeypatch):
    """Planted 16-token span shared by two docs at different positions;
    broadcast and join tiers must agree exactly."""
    import pyarrow.parquet as pq
    import webscraping_ray.pipelines.relational as rel
    import webscraping_ray.stages.dedup as dedup

    span = ' '.join(f'w{i}' for i in range(16))
    texts = [
        'alpha beta ' + span + ' gamma',           # span at pos 2
        span + ' delta epsilon',                   # span at pos 0
        'unrelated words only here nothing repeats at all in this doc',
        'short doc',                               # < 16 tokens
    ]
    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * 4), 'source': pa.array(['s'] * 4),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / 'documents.parquet')

    out = rel.repeated_spans(str(tmp_path))
    rows = sorted(zip(out.column('doc_id').to_pylist(),
                      out.column('pos').to_pylist(),
                      out.column('n_occurrences').to_pylist()))
    assert rows == [(0, 2, 2), (1, 0, 2)]

    monkeypatch.setattr(rel, 'BROADCAST_KEY_LIMIT', 0, raising=False)
    # the function imports the limit from stages.dedup at call time
    monkeypatch.setattr(dedup, 'BROADCAST_KEY_LIMIT', 0)
    out2 = rel.repeated_spans(str(tmp_path))
    rows2 = sorted(zip(out2.column('doc_id').to_pylist(),
                       out2.column('pos').to_pylist(),
                       out2.column('n_occurrences').to_pylist()))
    assert rows2 == rows


def test_write_training_shards_resumable(ray_session, tmp_path):
    """First run writes every shard; delete one; rerun rewrites ONLY
    the missing shard byte-identically and skips the rest."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import webscraping_ray.pipelines.relational as rel

    sf = '/root/testdata/sf0.001'
    out = str(tmp_path / 'shards')
    s1 = rel.write_training_shards(sf, out, seqs_per_shard=4)
    assert not any(s1.column('skipped').to_pylist())
    shards = sorted(os.listdir(out))
    assert len(shards) == s1.num_rows > 1
    # packed rows partition the corpus exactly
    total = sum(s1.column('n_rows').to_pylist())
    assert total == 500

    victim = os.path.join(out, shards[1])
    before = pq.read_table(os.path.join(victim, 'part.parquet'))
    shutil.rmtree(victim)

    s2 = rel.write_training_shards(sf, out, seqs_per_shard=4)
    skipped = dict(zip(s2.column('shard').to_pylist(),
                       s2.column('skipped').to_pylist()))
    rewritten = [k for k, v in skipped.items() if not v]
    assert rewritten == [int(shards[1].split('=')[1])]
    after = pq.read_table(os.path.join(victim, 'part.parquet'))
    assert after.equals(before)


def test_remove_repeated_spans_interval_merge(ray_session, tmp_path):
    """Overlapping flagged spans merge into one covering interval; the
    rewrite drops exactly the covered tokens from every copy."""
    import pyarrow.parquet as pq
    import webscraping_ray.pipelines.relational as rel

    # 18 shared tokens -> spans at pos 0,1,2 in doc0 (overlapping) and
    # pos 1,2,3 in doc1; merged coverage = tokens 0..17 / 1..18
    shared = ' '.join(f's{i}' for i in range(18))
    texts = [shared + ' tail0 tail1',
             'head0 ' + shared + ' tail2',
             'no repeats in this one at all just unique words here']
    t = pa.table({'doc_id': pa.array(range(3), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * 3),
                  'source': pa.array(['s'] * 3),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / 'documents.parquet')

    out = {r['doc_id']: r for r in
           rel.remove_repeated_spans(str(tmp_path)).take_all()}
    assert out[0]['text_clean'] == 'tail0 tail1'
    assert out[0]['n_tokens_removed'] == 18
    assert out[1]['text_clean'] == 'head0 tail2'
    assert out[1]['n_tokens_removed'] == 18
    assert out[2]['n_tokens_removed'] == 0
    assert out[2]['text_clean'] == texts[2]
