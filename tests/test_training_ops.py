"""Training-data ops: dedup family (exact / MinHash-LSH / SimHash /
embedding), similarity search (brute + IVF recall), text stats, and the
multimodal stage plumbing — on crafted corpora with known answers."""

import numpy as np
import pyarrow as pa
import pytest


BASE = ("the quick brown fox jumps over the lazy dog while the crawler "
        "fetches pages and extracts text tokens for the training corpus "
        "pipeline at web scale with politeness and dedup")


def _docs_table():
    texts = [
        BASE,                                  # 0
        BASE,                                  # 1 exact dup of 0
        BASE.replace("lazy", "sleepy"),        # 2 near dup of 0
        "completely different tiny text",      # 3
        BASE.replace("quick", "rapid").replace("dog", "hound"),  # 4 near dup
        "another unrelated document about databases and storage engines",  # 5
    ]
    return pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                     'text': pa.array(texts, pa.string())})


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data
    return ray.data.from_arrow(_docs_table())


def test_exact_dedup(docs_ds):
    from webscraping_ray.stages.dedup import exact_dedup
    survivors = sorted(r['doc_id'] for r in exact_dedup(docs_ds).take_all())
    assert survivors == [0, 2, 3, 4, 5]  # doc 1 removed (dup of 0)


def test_minhash_lsh_finds_near_dups(docs_ds):
    from webscraping_ray.stages.dedup import minhash_dup_pairs
    pairs = minhash_dup_pairs(docs_ds, threshold=0.5).to_pylist()
    got = {(p['id_a'], p['id_b']) for p in pairs}
    assert (0, 1) in got            # exact dup
    assert (0, 2) in got            # near dup
    assert all(p['jaccard'] >= 0.5 for p in pairs)
    assert not any({a, b} == {3, 5} for a, b in got)  # unrelated docs


def test_simhash_near_dups(docs_ds):
    from webscraping_ray.stages.dedup import SimHash, simhash_dup_pairs
    # identical docs → identical fingerprints, hamming 0
    pairs = simhash_dup_pairs(docs_ds, max_hamming=6).to_pylist()
    got = {(p['id_a'], p['id_b']): p['hamming'] for p in pairs}
    assert got.get((0, 1)) == 0
    # deterministic fingerprint
    fp1 = SimHash.fingerprint(BASE)
    fp2 = SimHash.fingerprint(BASE)
    assert fp1 == fp2 != 0


def test_jaccard_kernel():
    from webscraping_ray.stages.dedup import jaccard
    assert jaccard(BASE, BASE) == 1.0
    assert jaccard(BASE, "xyz abc nothing shared qqq www eee") == 0.0
    assert 0.5 < jaccard(BASE, BASE.replace("lazy", "sleepy")) < 1.0


def test_embedding_dups_and_knn(ray_session):
    import ray.data
    from webscraping_ray.stages.dedup import embedding_dup_pairs
    from webscraping_ray.stages.similarity import knn_brute, knn_ivf

    rng = np.random.RandomState(0)
    M = rng.randn(200, 16).astype(np.float64)
    M[7] = M[3] + 0.001 * rng.randn(16)   # planted near-dup pair (3, 7)
    tbl = pa.table({'vec_id': pa.array(range(200), pa.int64()),
                    'embedding': pa.array(M.tolist(),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)

    pairs = embedding_dup_pairs(ds, threshold=0.99).to_pylist()
    assert {(p['id_a'], p['id_b']) for p in pairs} == {(3, 7)}

    # brute-force knn: query = vector 3 → top hits are 3 then 7
    out = knn_brute(ds, M[3:4], k=5).to_pylist()
    assert [r['vec_id'] for r in out[:2]] == [3, 7]
    assert out[0]['rank'] == 1

    # IVF recall vs brute on the same query
    brute_ids = {r['vec_id'] for r in knn_brute(ds, M[3:4], k=10).to_pylist()}
    ivf_ids = {r['vec_id'] for r in
               knn_ivf(ds, M[3:4], k=10, n_clusters=4, nprobe=2).to_pylist()}
    recall = len(brute_ids & ivf_ids) / len(brute_ids)
    assert recall >= 0.5, f'IVF recall too low: {recall}'


def test_embedding_ivf_matches_brute(ray_session):
    """The IVF-bucketed scale path must recall the planted near-dup
    pairs the exact brute path finds (identical-direction vectors land
    in the same IVF bucket)."""
    import ray.data
    from webscraping_ray.stages.dedup import embedding_dup_pairs

    rng = np.random.RandomState(3)
    M = rng.randn(300, 16).astype(np.float64)
    M[7] = M[3] + 0.001 * rng.randn(16)
    M[200] = M[150] * 1.5              # same direction, scaled
    tbl = pa.table({'vec_id': pa.array(range(300), pa.int64()),
                    'embedding': pa.array(M.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    brute = embedding_dup_pairs(ds, threshold=0.99, method='brute')
    ivf = embedding_dup_pairs(ds, threshold=0.99, method='ivf')
    bp = set(zip(brute.column('id_a').to_pylist(),
                 brute.column('id_b').to_pylist()))
    ip = set(zip(ivf.column('id_a').to_pylist(),
                 ivf.column('id_b').to_pylist()))
    assert {(3, 7), (150, 200)} <= bp
    assert ip == bp                    # full recall on planted corpus


def test_embedding_dups_pathological_tiled(ray_session):
    """VERDICT r4 item 3: a near-dup-SATURATED corpus (every vector
    within cosine 0.95 of every other — k-means cannot split it) must
    (a) keep per-task matmul scratch bounded by the tile, not the
    bucket (tile_rows=16 « n=240 forces the multi-tile path), and
    (b) produce the UNCHANGED pair set vs the exact brute path."""
    import ray.data

    from webscraping_ray.stages.dedup import (embedding_dup_pairs,
                                              embedding_dup_pairs_ds)

    rng = np.random.RandomState(11)
    base = rng.randn(16)
    base /= np.linalg.norm(base)
    # tiny angular jitter keeps every pairwise cosine above 0.95
    M = base[None, :] + 0.01 * rng.randn(240, 16)
    tbl = pa.table({'vec_id': pa.array(range(240), pa.int64()),
                    'embedding': pa.array(M.tolist(),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    brute = embedding_dup_pairs(ds, threshold=0.95, method='brute')
    bp = set(zip(brute.column('id_a').to_pylist(),
                 brute.column('id_b').to_pylist()))
    assert len(bp) == 240 * 239 // 2   # saturated: all pairs
    # tiled IVF path, streaming variant, forced tiny tile
    tiled = embedding_dup_pairs_ds(ds, threshold=0.95,
                                   tile_rows=16).take_all()
    tp = set((r['id_a'], r['id_b']) for r in tiled)
    assert tp == bp


def test_ivf_bucketize_k_rule_and_split(ray_session):
    """ivf_bucketize derives k from the target bucket size and
    recursively re-clusters oversize buckets; a degenerate
    all-identical corpus terminates without an infinite loop."""
    import ray.data

    from webscraping_ray.stages.similarity import (derive_n_clusters,
                                                   ivf_bucketize)

    assert derive_n_clusters(0) == 1
    assert derive_n_clusters(8192) == 1
    assert derive_n_clusters(8193) == 2
    assert derive_n_clusters(10 ** 9, 8192) == 122071

    # three well-separated clusters of 200 each; force target=50 so
    # the k-rule wants 12 clusters, cap buckets at 120 so any bucket
    # that swallowed a whole cluster gets re-split
    rng = np.random.RandomState(5)
    centers = np.eye(3, 16) * 10
    M = np.vstack([centers[i] + 0.05 * rng.randn(200, 16)
                   for i in range(3)])
    tbl = pa.table({'vec_id': pa.array(range(600), pa.int64()),
                    'embedding': pa.array(M.tolist(),
                                          pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    b = ivf_bucketize(ds, target_bucket_rows=50, max_bucket_rows=120)
    sizes = {int(r['ivf_bucket']): int(r['count()'])
             for r in b.groupby('ivf_bucket').count().take_all()}
    assert sum(sizes.values()) == 600          # no row lost or duped
    assert max(sizes.values()) <= 120          # every bucket under cap

    # degenerate: all-identical vectors can never split — must
    # terminate (bounded rounds) with the single bucket intact
    one = np.tile(centers[0], (300, 1))
    tbl2 = pa.table({'vec_id': pa.array(range(300), pa.int64()),
                     'embedding': pa.array(one.tolist(),
                                           pa.list_(pa.float32()))})
    b2 = ivf_bucketize(ray.data.from_arrow(tbl2),
                       target_bucket_rows=50, max_bucket_rows=120)
    sizes2 = {int(r['ivf_bucket']): int(r['count()'])
              for r in b2.groupby('ivf_bucket').count().take_all()}
    assert sum(sizes2.values()) == 300
    assert max(sizes2.values()) == 300         # unsplittable, kept


def test_minhash_recall_vs_exact_bruteforce(ray_session):
    """LSH recall against the exact all-pairs Jaccard ground truth on
    the sf0.001 documents table (the VERDICT-requested measurement;
    the number is recorded in BASELINE.md)."""
    import itertools

    import pyarrow.parquet as pq
    import ray.data
    from webscraping_ray.stages.dedup import minhash_dup_pairs, shingles

    sf = '/root/testdata/sf0.001'
    docs = pq.read_table(f'{sf}/documents.parquet',
                         columns=['doc_id', 'text']).to_pylist()
    sh = {r['doc_id']: shingles(r['text'], 3) for r in docs}
    truth = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        u = len(sh[a] | sh[b])
        if u and len(sh[a] & sh[b]) / u >= 0.8:
            truth.add((a, b))
    assert truth, 'testdata should contain planted near-dups'
    ds = ray.data.read_parquet(f'{sf}/documents.parquet',
                               columns=['doc_id', 'text'])
    got = minhash_dup_pairs(ds, threshold=0.8)
    pairs = set(zip(got.column('id_a').to_pylist(),
                    got.column('id_b').to_pylist()))
    recall = len(pairs & truth) / len(truth)
    precision = len(pairs & truth) / len(pairs) if pairs else 1.0
    assert recall >= 0.95, f'LSH recall {recall} below 0.95'
    assert precision == 1.0            # verified Jaccard: no false pairs


def test_clean_corpus_neardup_dataset_native(ray_session):
    """The composed cleaning pipeline stays a Dataset (no driver
    materialization of survivors) and is deterministic."""
    from webscraping_ray.pipelines import relational as R

    out = R.clean_corpus_neardup('/root/testdata/sf0.001')
    assert hasattr(out, 'take_all')    # a Dataset, not a driver table
    ids = sorted(r['doc_id'] for r in out.take_all())
    assert len(ids) == 424             # pinned: quality+exact (446) - neardups
    assert len(set(ids)) == len(ids)


def test_textstats(docs_ds):
    from webscraping_ray.stages.textstats import (LangId, QualityScore,
                                                  TokenCount, Fingerprint)
    toks = {r['doc_id']: r for r in
            docs_ds.map_batches(TokenCount(), batch_format='pyarrow').take_all()}
    assert toks[3]['n_tokens'] == 4
    assert toks[0]['n_bpe_tokens'] >= toks[0]['n_tokens']

    q = {r['doc_id']: r for r in
         docs_ds.map_batches(QualityScore(), batch_format='pyarrow').take_all()}
    assert q[0]['n_chars'] == len(BASE)
    assert 0 < q[0]['stopword_ratio_1k'] <= 1000

    langs = {r['doc_id']: r['pred_lang'] for r in
             docs_ds.map_batches(LangId(), batch_format='pyarrow').take_all()}
    assert langs[0] == 'en'

    fps = {r['doc_id']: r for r in
           docs_ds.map_batches(Fingerprint(), batch_format='pyarrow').take_all()}
    assert fps[0]['doc_hash'] == fps[1]['doc_hash']      # identical docs
    assert fps[0]['doc_hash'] != fps[3]['doc_hash']


def test_multimodal_stages(ray_session):
    import ray.data
    from webscraping_ray.stages.multimodal import (DecodeImage, FrameSample,
                                                   synth_media_table)
    media = synth_media_table(12, kind='image', payload_bytes=2048)
    ds = ray.data.from_arrow(media)
    out = ds.map_batches(DecodeImage(), batch_format='pyarrow',
                         batch_size=4, concurrency=2).take_all()
    assert len(out) == 12
    assert all(r['n_bytes'] == 2048 for r in out)
    assert len({r['thumb_hash'] for r in out}) == 12   # deterministic, distinct

    frames = ds.map_batches(FrameSample(k=3), batch_format='pyarrow',
                            batch_size=4, concurrency=2).take_all()
    assert len(frames) == 36

    # strict mode raises: the decode itself is stubbed in this container
    with pytest.raises((NotImplementedError, Exception)):
        ds.map_batches(DecodeImage(strict=True), batch_format='pyarrow').take_all()


def test_decode_stub_strict_direct():
    from webscraping_ray.stages.multimodal import DecodeImage, synth_media_table
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(synth_media_table(1))


def test_ngram_jaccard_exact_equals_lsh(ray_session):
    """The exact all-pairs n-gram Jaccard baseline and MinHash-LSH must
    agree on the testdata (LSH recall is 1.0 here, so the pair sets and
    Jaccard values coincide)."""
    from webscraping_ray.pipelines import relational as R

    sf = '/root/testdata/sf0.001'
    exact = R.ngram_jaccard_dups(sf, threshold=0.8)
    lsh = R.minhash_dups(sf)
    ep = {(a, b): j for a, b, j in zip(exact.column('id_a').to_pylist(),
                                       exact.column('id_b').to_pylist(),
                                       exact.column('jaccard').to_pylist())}
    lp = {(a, b): j for a, b, j in zip(lsh.column('id_a').to_pylist(),
                                       lsh.column('id_b').to_pylist(),
                                       lsh.column('jaccard').to_pylist())}
    assert ep, 'testdata should contain near-dups'
    assert set(lp) <= set(ep)          # LSH can only miss, never invent
    assert set(lp) == set(ep)          # ...and recall is 1.0 here
    for k in ep:
        assert abs(ep[k] - lp[k]) < 1e-12


def test_decontaminate_planted(ray_session, tmp_path):
    """Planted contamination: an eval doc (doc_id%100==0) shares an
    8-gram with one train doc; a <8-token train doc equals an eval
    doc's whole token string (the short-doc shingle convention); clean
    docs stay unflagged.  Ray output must equal the DuckDB oracle on
    the same corpus."""
    import duckdb
    import __ray_entry__ as entrymod
    from webscraping_ray.pipelines.relational import decontaminate

    gram = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    texts = {
        100: f"benchmark question: {gram} answer follows here",  # eval
        200: "tiny eval snippet",                               # eval
        1: f"training text mentioning {gram} inside a long paragraph "
           "of otherwise unique words never repeated elsewhere",
        2: "Tiny EVAL snippet",      # <8 tokens, matches 200 lowercased
        3: "a completely clean training document with plenty of words "
           "none of which overlap the held out benchmark suite at all",
    }
    ids = sorted(texts)
    t = pa.table({
        'doc_id': pa.array(ids, pa.int64()),
        'text': pa.array([texts[i] for i in ids], pa.string()),
        'lang': pa.array(['en'] * len(ids), pa.string()),
        'source': pa.array(['t'] * len(ids), pa.string()),
        'n_chars': pa.array([len(texts[i]) for i in ids], pa.int64()),
    })
    import pyarrow.parquet as pq
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    got = decontaminate(str(tmp_path)).to_pandas().sort_values(
        'doc_id').reset_index(drop=True)
    assert list(got.doc_id) == [1, 2], got
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'")
    want = con.sql(entrymod.oracle_sql()['decontaminate']).df().sort_values(
        'doc_id').reset_index(drop=True)
    assert got.equals(want), (got, want)


def test_ivf_sample_invariant_under_repartition(ray_session):
    """The hash-reservoir training sample (and therefore the centroids
    and every bucket assignment) must be identical under any block
    layout — the determinism `random_sample`'s per-block RNG cannot
    give."""
    import ray.data
    from webscraping_ray.stages.similarity import ivf_build

    rng = np.random.RandomState(7)
    t = pa.table({
        'vec_id': pa.array(range(512), pa.int64()),
        'embedding': pa.array(rng.randn(512, 16).tolist(),
                              pa.list_(pa.float64()))})
    ds1 = ray.data.from_arrow(t)
    ds2 = ray.data.from_arrow(t).repartition(13)
    C1, b1 = ivf_build(ds1, n_clusters=4, sample_size=64)
    C2, b2 = ivf_build(ds2, n_clusters=4, sample_size=64)
    assert np.array_equal(C1, C2)
    a1 = sorted((r['vec_id'], r['ivf_bucket']) for r in b1.take_all())
    a2 = sorted((r['vec_id'], r['ivf_bucket']) for r in b2.take_all())
    assert a1 == a2


def test_sample_hash_composable_and_layout_invariant(ray_session):
    """The documented claims of deterministic hash sampling: a lower
    rate selects a strict subset of a higher rate (composability), and
    the selection is a pure per-row predicate — identical no matter the
    block layout."""
    from webscraping_ray.pipelines.relational import sample_hash

    ids10 = sorted(r['doc_id'] for r in
                   sample_hash('/root/testdata/sf0.001').take_all())
    ids1 = sorted(r['doc_id'] for r in
                  sample_hash('/root/testdata/sf0.001',
                              rate_pct=1).take_all())
    assert set(ids1) <= set(ids10)
    assert 0 < len(ids10) < 500
    ids10_again = sorted(
        r['doc_id'] for r in
        sample_hash('/root/testdata/sf0.001').take_all())
    assert ids10 == ids10_again


# ---------------------------------------------------------------------------
# PII redaction / stratified sampling / global shuffle / TF-IDF


def test_redact_text_planted_pii():
    """Planted-PII kernel check: the synthetic corpus only carries the
    obfuscated email + phone forms, so the plain-email path is proven
    here (the oracle run proves the other two end to end)."""
    from webscraping_ray.stages.redact import redact_text

    t, ne, np_ = redact_text(
        'mail me at alice.smith+spam@sub.example.co.uk or '
        'bob AT example DOT org, call (555) 123-4567 or 555-123-4567.')
    assert ne == 2 and np_ == 2
    assert t == ('mail me at <EMAIL> or <EMAIL>, call <PHONE> or '
                 '<PHONE>.')
    # no PII → identity
    assert redact_text('nothing here') == ('nothing here', 0, 0)
    assert redact_text(None) == ('', 0, 0)


def test_redact_pii_counts_by_construction(ray_session):
    """docs_pages.py embeds an obfuscated email on doc_id%3==0 and a
    phone on doc_id%5==0 — the stage must find exactly those."""
    from webscraping_ray.pipelines.relational import redact_pii

    out = redact_pii('/root/testdata/sf0.001').to_pandas()
    for _, r in out.iterrows():
        assert r['n_emails'] == (1 if r['doc_id'] % 3 == 0 else 0)
        assert r['n_phones'] == (1 if r['doc_id'] % 5 == 0 else 0)
        assert ('<EMAIL>' in r['html_redacted']) == (r['n_emails'] == 1)
        assert ' AT example DOT com' not in r['html_redacted']


def test_shuffle_assign_is_md5_permutation(ray_session):
    """pos must be the exact md5-keyed permutation 0..n-1 (ties by
    doc_id) regardless of bucketing, and shard = pos // shard_size."""
    import hashlib

    from webscraping_ray.pipelines.relational import shuffle_assign

    out = shuffle_assign('/root/testdata/sf0.001', shard_size=64).to_pandas()
    n = len(out)
    assert sorted(out['pos']) == list(range(n))
    key = {i: int.from_bytes(
               hashlib.md5((str(i) + ':shuffle').encode()).digest()[8:],
               'little')
           for i in out['doc_id']}
    want = sorted(out['doc_id'], key=lambda i: (key[i], i))
    got = out.sort_values('pos')['doc_id'].tolist()
    assert got == want
    assert (out['shard'] == out['pos'] // 64).all()


def test_sample_stratified_is_k_smallest_hashes_per_lang(ray_session):
    import hashlib

    import duckdb

    from webscraping_ray.pipelines.relational import sample_stratified

    sf = '/root/testdata/sf0.001'
    out = sample_stratified(sf, k=7).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM '{sf}/documents.parquet'").df()
    docs['h'] = [int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                                'little') for i in docs['doc_id']]
    for lang, g in docs.groupby('lang'):
        want = g.sort_values(['h', 'doc_id']).head(7)['doc_id'].tolist()
        got = (out[out['lang'] == lang].sort_values('rank')['doc_id']
               .tolist())
        assert got == want, lang


def test_tfidf_top_terms_local_recount(ray_session):
    """Spot-check tf/df/rank against a local pandas recount."""
    import re
    from collections import Counter

    import duckdb

    from webscraping_ray.pipelines.relational import tfidf_top_terms

    sf = '/root/testdata/sf0.001'
    out = tfidf_top_terms(sf, k=3).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'").df()
    tok = re.compile(r'\w+')
    tfs = {r.doc_id: Counter(tok.findall(r.text.lower()))
           for r in docs.itertuples()}
    df = Counter(w for c in tfs.values() for w in c)
    for doc_id in list(tfs)[:25]:
        ranked = sorted(tfs[doc_id].items(),
                        key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:3]
        got = (out[out['doc_id'] == doc_id].sort_values('rank')
               [['term', 'tf', 'df']].values.tolist())
        want = [[w, c, df[w]] for w, c in ranked]
        assert got == want, doc_id


def test_inlink_anchors_by_construction(ray_session):
    """Every non-root /d/ page is linked exactly once by its unique
    tree parent with anchor l{(k-1)%3}; q/x/img targets once each."""
    from webscraping_ray.pipelines.relational import inlink_anchors

    out = inlink_anchors('/root/testdata/sf0.001').to_pandas()
    assert (out['n_inlinks'] == 1).all()
    d = out[out['url'].str.contains('/d/')]
    for _, r in d.head(50).iterrows():
        j = int(r['url'].rsplit('/', 1)[1])
        k = j // 8
        assert k >= 1  # roots have no inlinks
        assert r['anchors'] == 'l%d' % ((k - 1) % 3)
    # 500 docs: 492 non-root /d/ + 500 q + 500 x + 500 img
    assert len(out) == 492 + 3 * 500


def test_host_graph_by_construction(ray_session):
    from webscraping_ray.pipelines.relational import host_graph

    out = host_graph('/root/testdata/sf0.001').to_pandas()
    assert len(out) == 16
    cross = out[out['src_host'] != out['dst_host']]
    assert len(cross) == 8
    for _, r in cross.iterrows():
        h = int(r['src_host'][3])
        assert r['dst_host'] == 'src%d.com' % ((h + 1) % 8)
    # total links == sum of per-page link counts (children + 3)
    assert out['n_links'].sum() == 492 + 3 * 500


def test_pagerank_tiers_bit_equal_and_sane(ray_session):
    """Distributed Dataset-join tier must reproduce the driver fold
    bit-for-bit (both use the sorted-left-fold sum), and ranks must be
    a valid distribution shape: all >= (1-d)/N, roots (no inlinks) at
    exactly the base, total mass <= 1 (sinks leak, no dangling
    redistribution by design)."""
    from webscraping_ray.pipelines.relational import pagerank

    sf = '/root/testdata/sf0.001'
    a = pagerank(sf).to_pandas().sort_values('url').reset_index(drop=True)
    b = (pagerank(sf, force_distributed=True).to_pandas()
         .sort_values('url').reset_index(drop=True))
    assert a.equals(b)
    n = len(a)
    base = round((1.0 - 0.85) / n, 6)
    assert (a['pagerank'] >= base - 1e-9).all()
    # roots doc_id 0..7 have no inlinks -> exactly the base rank
    roots = a[a['url'].str.match(r'http://src\d\.com/d/[0-7]$')]
    assert len(roots) == 8 and (roots['pagerank'] == base).all()
    assert a['pagerank'].sum() <= 1.0 + 1e-6


def test_hits_tiers_bit_equal_and_sane(ray_session):
    """HITS distributed tier must reproduce the driver fold
    bit-for-bit, and the scores must be a sane hubs/authorities
    shape: each vector sum-normalizes to ~1, leaf pages (q/x/img
    targets, no outlinks) have hub exactly 0, root pages (no inlinks)
    have auth exactly 0, and every /d/ page is a hub (links out)."""
    from webscraping_ray.pipelines.relational import hits

    sf = '/root/testdata/sf0.001'
    a = hits(sf).to_pandas().sort_values('url').reset_index(drop=True)
    b = (hits(sf, force_distributed=True).to_pandas()
         .sort_values('url').reset_index(drop=True))
    assert a.equals(b)
    assert abs(a['hub'].sum() - 1.0) < 1e-3
    assert abs(a['auth'].sum() - 1.0) < 1e-3
    leaves = a[a['url'].str.contains('/q/|/x/|/img/')]
    assert len(leaves) and (leaves['hub'] == 0.0).all()
    roots = a[a['url'].str.match(r'http://src\d\.com/d/[0-7]$')]
    assert len(roots) == 8 and (roots['auth'] == 0.0).all()
    dpages = a[a['url'].str.contains('/d/')]
    assert (dpages['hub'] > 0.0).all()


def test_tfidf_join_tier_equals_broadcast_tier(ray_session):
    """The unbounded-vocab join tier must reproduce the broadcast tier
    exactly (same ranking keys, same libm scores)."""
    from webscraping_ray.pipelines.relational import tfidf_top_terms

    sf = '/root/testdata/sf0.001'
    key = ['doc_id', 'rank']
    a = (tfidf_top_terms(sf).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (tfidf_top_terms(sf, force_join=True).to_pandas()
         .sort_values(key).reset_index(drop=True)[a.columns])
    assert a.equals(b)


def test_bigram_logprob_join_tier_equals_broadcast(ray_session):
    """The hash-join tier of bigram_logprob (parquet-persisted gram
    rows + Dataset count joins + hash-aggregate per-doc reduce) must
    equal the broadcast tier after the 4-dp snap."""
    from webscraping_ray.pipelines.relational import bigram_logprob

    sf = '/root/testdata/sf0.001'
    a = (bigram_logprob(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (bigram_logprob(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    assert a.equals(b)
    assert (a.loc[a['n_bigrams'] == 0, 'bigram_logprob'] == 0.0).all()
    assert (a.loc[a['n_bigrams'] > 0, 'bigram_logprob'] < 0).all()


def test_unigram_logprob_join_tier_equals_broadcast(ray_session):
    """The unigram hash-join tier (exploded token rows joined to the
    count Dataset, hash-aggregate per-doc mean) must equal the
    broadcast tier after the 4-dp snap."""
    from webscraping_ray.pipelines.relational import unigram_logprob

    sf = '/root/testdata/sf0.001'
    a = (unigram_logprob(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (unigram_logprob(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    assert a.equals(b)


def test_remove_repeated_spans_join_tier_equals_broadcast(ray_session):
    """The ExactSubstr rewrite's distributed tier (flags stay a
    Dataset, interval lists compact per doc and hash-join the
    documents) must equal the driver-broadcast tier row for row."""
    from webscraping_ray.pipelines.relational import remove_repeated_spans

    sf = '/root/testdata/sf0.001'
    a = (remove_repeated_spans(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (remove_repeated_spans(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    assert a.equals(b)
    assert (a['n_tokens_removed'] > 0).any()


def test_line_dedup_join_tier_equals_broadcast(ray_session):
    """line_dedup's join tier (exploded digest rows inner-join the dup
    table, removed line_nos fold per doc) must equal the broadcast tier
    row for row, and the corpus must actually exercise removals."""
    from webscraping_ray.pipelines.relational import line_dedup

    sf = '/root/testdata/sf0.001'
    a = (line_dedup(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (line_dedup(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    assert a.equals(b)
    assert (a['n_lines_removed'] > 0).any()
    assert (a['n_lines_kept'] > 0).any()


def test_line_dedup_planted_first_occurrence(ray_session, tmp_path):
    """On a crafted corpus with a line repeated across and within docs,
    only the (doc_id, line_no)-first occurrence survives; empty lines
    are exempt (newline mode, words_per_line=None)."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import line_dedup

    docs = pa.table({
        'doc_id': pa.array([0, 1, 2], pa.int64()),
        'text': pa.array([
            "alpha beta\nshared line\n\nunique zero",
            "shared line\ngamma delta\nshared line",
            "\nshared line\nunique two",
        ], pa.string())})
    d = tmp_path / 'corpus'
    d.mkdir()
    pq.write_table(docs, str(d / 'documents.parquet'))

    out = (line_dedup(str(d), words_per_line=None).to_pandas()
           .sort_values('doc_id').reset_index(drop=True))
    # doc 0 holds the first 'shared line' (line_no 1); later copies go
    assert out.loc[0, 'text_clean'] == "alpha beta\nshared line\n\nunique zero"
    assert out.loc[0, 'n_lines_removed'] == 0
    assert out.loc[1, 'text_clean'] == "gamma delta"
    assert out.loc[1, 'n_lines_removed'] == 2
    assert out.loc[2, 'text_clean'] == "\nunique two"  # empty line kept
    assert out.loc[2, 'n_lines_removed'] == 1


def test_dedup_incremental_join_tier_equals_broadcast(ray_session):
    """dedup_incremental's bloom-prefiltered anti-join tier must equal
    the broadcast-set tier row for row (the bloom path runs: prior is
    small, so the filter fits INCR_BLOOM_MAX_BITS)."""
    from webscraping_ray.pipelines.relational import dedup_incremental

    sf = '/root/testdata/sf0.001'
    a = (dedup_incremental(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (dedup_incremental(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    assert a.equals(b)
    assert len(a) > 0


def test_dedup_incremental_planted(ray_session, tmp_path):
    """Planted two-dump corpus: odd (new) docs drop when their text
    exists in the even (prior) dump or repeats an earlier new doc."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import dedup_incremental

    texts = {0: 'in prior', 2: 'also prior',        # prior dump (even)
             1: 'in prior',                         # dup of prior -> drop
             3: 'fresh text',                       # keep
             5: 'fresh text',                       # dup of 3 -> drop
             7: 'another new'}                      # keep
    docs = pa.table({'doc_id': pa.array(sorted(texts), pa.int64()),
                     'text': pa.array([texts[k] for k in sorted(texts)],
                                      pa.string())})
    d = tmp_path / 'corpus'
    d.mkdir()
    pq.write_table(docs, str(d / 'documents.parquet'))

    for force in (False, True):
        out = dedup_incremental(str(d), force_join=force).to_pandas()
        assert sorted(out['doc_id']) == [3, 7], f'force_join={force}'

    # third tier: bloom disabled (filter "too big") -> plain anti-join
    from webscraping_ray.pipelines import relational as RL
    saved = RL.INCR_BLOOM_MAX_BITS
    try:
        RL.INCR_BLOOM_MAX_BITS = 0
        out = dedup_incremental(str(d), force_join=True).to_pandas()
        assert sorted(out['doc_id']) == [3, 7]
    finally:
        RL.INCR_BLOOM_MAX_BITS = saved


def test_bloom_view_matches_restore():
    """BloomFilter.view (zero-copy, read-only) must answer membership
    identically to restore on the same snapshot."""
    from webscraping_ray.state.cuckoo import BloomFilter

    bf = BloomFilter(1000, fpp=1e-3)
    keys = np.arange(1, 500, dtype=np.uint64) * np.uint64(2654435761)
    bf.add_batch(keys)
    blob = bf.snapshot()
    v, r = BloomFilter.view(blob), BloomFilter.restore(blob)
    probe = np.arange(1, 2000, dtype=np.uint64) * np.uint64(2654435761)
    assert (v.contains_batch(probe) == r.contains_batch(probe)).all()
    assert v.contains_batch(keys).all()  # no false negatives


def test_knn_join_ivf_exhaustive_equals_brute(ray_session):
    """knn_join_ivf at nprobe=n_clusters (exhaustive probing) must
    equal the exact broadcast self-join row for row."""
    from webscraping_ray.pipelines.relational import knn_join, knn_join_ivf

    sf = '/root/testdata/sf0.001'
    a = (knn_join(sf).to_pandas()
         .sort_values(['vec_id', 'rank']).reset_index(drop=True))
    b = (knn_join_ivf(sf).to_pandas()
         .sort_values(['vec_id', 'rank']).reset_index(drop=True))
    assert a.equals(b)
    assert set(a['rank']) == {1, 2, 3, 4, 5}
    assert (a['vec_id'] != a['neighbor_id']).all()   # self excluded


def test_knn_join_subexhaustive_recall(ray_session):
    """Sub-exhaustive probing recall curve, pinned at measured values
    minus margin.  The synthetic embeddings are near-uniform (top-5
    cosines ~0.25-0.27 — no cluster structure), which is IVF's WORST
    case for graph construction; measured: nprobe 4/8 -> 0.789,
    6/8 -> 0.925.  Clustered real-embedding spaces do far better; the
    knob trades recall for probing ~nprobe/n_clusters of the data."""
    from webscraping_ray.pipelines.relational import _read, knn_join
    from webscraping_ray.stages.similarity import knn_join_ivf

    sf = '/root/testdata/sf0.001'
    exact = {(r['vec_id'], r['neighbor_id'])
             for r in knn_join(sf).take_all()}
    ds = _read(sf, 'embeddings', ['vec_id', 'embedding'])
    for nprobe, floor in ((4, 0.75), (6, 0.90)):
        approx = {(r['vec_id'], r['neighbor_id'])
                  for r in knn_join_ivf(ds, k=5, n_clusters=8,
                                        nprobe=nprobe).take_all()}
        recall = len(exact & approx) / len(exact)
        assert recall >= floor, (nprobe, recall)


def test_band_join_time_bucket_tier_equals_per_key(ray_session):
    """The hot-key time-bucket tier of events_band_join (3-way row
    replication into adjacent band buckets, same searchsorted kernel,
    home-row emission) must equal the per-key tier row for row."""
    from webscraping_ray.pipelines.relational import events_band_join

    sf = '/root/testdata/sf0.001'
    a = (events_band_join(sf).to_pandas()
         .sort_values('event_id').reset_index(drop=True))
    b = (events_band_join(sf, method='time_bucket').to_pandas()
         .sort_values('event_id').reset_index(drop=True))
    assert a.equals(b)
    assert (a['n_nearby'] > 0).any()


def test_band_join_matches_bruteforce_random(ray_session):
    """Both band-join tiers must match an O(n²) brute force on random
    events with engineered exact-boundary timestamps (ts multiples of
    band/4 land rows exactly at ±band edges, which are inclusive)."""
    import pandas as pd
    import ray.data

    from webscraping_ray.pipelines.relational import (
        _events_band_join_time_bucket, _per_key_groups, _snap_round)

    band_us = 600 * 1_000_000
    rng = np.random.default_rng(11)
    n = 1500
    t = pa.table({
        'event_id': pa.array(range(n), pa.int64()),
        'user_id': pa.array(rng.integers(0, 13, n), pa.int64()),
        'ts': pa.array(rng.integers(0, 40, n) * (band_us // 4),
                       pa.int64()),
        # multiples of 0.25 are binary-exact, so window sums are
        # order-independent and the 2-dp snap can't sit on a boundary
        'value': pa.array(rng.integers(-20, 21, n) * 0.25,
                          pa.float64())})
    df = t.to_pandas()

    # brute force
    rows = []
    for _, g in df.groupby('user_id'):
        for _, r in g.iterrows():
            near = g[(g['ts'] >= r['ts'] - band_us)
                     & (g['ts'] <= r['ts'] + band_us)]
            rows.append((r['event_id'], len(near) - 1,
                         round(near['value'].sum() - r['value'], 2)))
    want = (pd.DataFrame(rows, columns=['event_id', 'n_nearby',
                                        'sum_nearby_value'])
            .sort_values('event_id').reset_index(drop=True))

    ds = ray.data.from_arrow(t).repartition(4)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values('ts')
        ts = g['ts'].to_numpy()
        v = g['value'].to_numpy()
        lo = np.searchsorted(ts, ts - band_us, side='left')
        hi = np.searchsorted(ts, ts + band_us, side='right')
        cum = np.concatenate([[0.0], np.cumsum(v)])
        return pd.DataFrame({'event_id': g['event_id'].to_numpy(),
                             'n_nearby': (hi - lo - 1).astype('int64'),
                             'sum_nearby_value': cum[hi] - cum[lo] - v})

    a = (_per_key_groups(ds, 'user_id', per_user)
         .map_batches(lambda t: _snap_round(t, 'sum_nearby_value'),
                      batch_format='pyarrow')
         .to_pandas().sort_values('event_id').reset_index(drop=True))
    b = (_events_band_join_time_bucket(ds, band_us)
         .to_pandas().sort_values('event_id').reset_index(drop=True))
    pd.testing.assert_frame_equal(a, want, check_dtype=False)
    pd.testing.assert_frame_equal(b, want, check_dtype=False)


def test_asof_match_matches_bruteforce_random(ray_session):
    """The merge as-of kernel must match an O(n²) brute force on
    random click/purchase streams with engineered ts ties (ties count
    as 'before'; equal-ts purchases resolve to max event_id)."""
    import pandas as pd

    rng = np.random.default_rng(5)
    n = 800
    ev = pd.DataFrame({
        'event_id': np.arange(n, dtype=np.int64),
        'user_id': rng.integers(0, 9, n),
        'ts': rng.integers(0, 50, n),   # small range -> many ties
        'event_type': rng.choice(['click', 'purchase'], n),
        'value': np.round(rng.normal(size=n), 3)})

    want_rows = []
    for _, r in ev[ev['event_type'] == 'click'].iterrows():
        cand = ev[(ev['event_type'] == 'purchase')
                  & (ev['user_id'] == r['user_id'])
                  & (ev['ts'] <= r['ts'])]
        if len(cand):
            m = cand.sort_values(['ts', 'event_id']).iloc[-1]
            want_rows.append((r['event_id'], m['event_id'], m['value']))
        else:
            want_rows.append((r['event_id'], -1, 0.0))
    want = (pd.DataFrame(want_rows, columns=[
        'event_id', 'matched_purchase_id', 'matched_value'])
        .sort_values('event_id').reset_index(drop=True))

    # the production kernel, driven directly on the same frame
    g_all = []
    for _, g in ev[ev['event_type'].isin(['click', 'purchase'])]\
            .assign(probe=lambda d: d['event_type'] == 'click')\
            .groupby('user_id'):
        g = g.sort_values(['ts', 'probe', 'event_id'])
        pid = g['event_id'].where(~g['probe']).ffill()
        pval = g['value'].where(~g['probe']).ffill()
        m = g['probe'].to_numpy()
        g_all.append(pd.DataFrame({
            'event_id': g['event_id'].to_numpy()[m],
            'matched_purchase_id':
                pid.fillna(-1).astype('int64').to_numpy()[m],
            'matched_value': pval.fillna(0.0).to_numpy()[m]}))
    got = (pd.concat(g_all).sort_values('event_id')
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# DSIR importance weights + NB classifier (round-4 late additions)

def test_nb_classify_join_tier_equals_broadcast(ray_session):
    """The hash-join tier of nb_classify (parquet-persisted per-doc
    token counts, Dataset model joins, per-doc Max argmax with
    min-class tie-break) must reproduce the broadcast tier's labels
    exactly."""
    from webscraping_ray.pipelines.relational import nb_classify

    sf = '/root/testdata/sf0.001'
    a = (nb_classify(sf).to_pandas()
         .sort_values('doc_id').reset_index(drop=True))
    b = (nb_classify(sf, force_join=True).to_pandas()
         .sort_values('doc_id').reset_index(drop=True)[a.columns])
    assert a.equals(b)


def test_nb_classify_beats_chance(ray_session):
    """The fitted classifier must beat the 1/n_classes chance rate on
    the full corpus (the synthetic langs share a token generator, so
    the bar is chance, not fluency)."""
    from webscraping_ray.pipelines.relational import nb_classify

    df = nb_classify('/root/testdata/sf0.001').to_pandas()
    n_classes = df['pred_lang'].nunique()
    assert n_classes >= 2
    acc = float((df['lang'] == df['pred_lang']).mean())
    assert acc > 1.5 / n_classes, acc


def test_dsir_weights_prefer_target_lang(ray_session):
    """DSIR's defining property: target-domain docs (lang='en') carry
    the highest mean importance log-weight of any lang."""
    import duckdb
    from webscraping_ray.pipelines.relational import dsir_weights

    sf = '/root/testdata/sf0.001'
    d = dsir_weights(sf).to_pandas()
    lang = duckdb.sql(
        f"SELECT doc_id, lang FROM '{sf}/documents.parquet'").df()
    m = d.merge(lang, on='doc_id').groupby('lang')['dsir_logweight'].mean()
    assert m.idxmax() == 'en', m.to_dict()
    # token-less docs (if any) must weigh exactly 0.0
    z = d[d['n_tokens'] == 0]
    assert (z['dsir_logweight'] == 0.0).all()


def test_budget_select_matches_exact_greedy(ray_session):
    """budget_select's two-level histogram cut must reproduce the
    exact greedy prefix (sort all docs by (-score, doc_id), take while
    cum <= budget) — and the cut must land strictly inside the corpus
    so the boundary machinery is exercised."""
    import re

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import budget_select

    sf = '/root/testdata/sf0.001'
    t = pq.read_table(f'{sf}/documents.parquet', columns=['doc_id', 'text'])
    tok = re.compile(r'\w+', re.UNICODE)
    rows = []
    for i, s in zip(t.column('doc_id').to_pylist(),
                    t.column('text').to_pylist()):
        ws = tok.findall((s or '').lower())
        n, u = len(ws), len(set(ws))
        rows.append((i, n, 0.0 if n == 0 else u / n))
    budget = sum(n for _, n, _ in rows) * 0.25
    rows.sort(key=lambda r: (-r[2], r[0]))
    want, cum = set(), 0
    for i, n, _ in rows:
        if cum + n <= budget:
            cum += n
            want.add(i)
        else:
            break

    got = budget_select(sf).to_pandas()
    assert set(got['doc_id']) == want
    assert 0 < len(got) < t.num_rows


def test_budget_select_full_budget_keeps_all(ray_session):
    from webscraping_ray.pipelines.relational import budget_select

    sf = '/root/testdata/sf0.001'
    got = budget_select(sf, budget_frac=1.0).to_pandas()
    assert len(got) == 500


def test_host_boilerplate_join_tier_equals_broadcast(ray_session):
    from webscraping_ray.pipelines.relational import host_boilerplate

    sf = '/root/testdata/sf0.001'
    def canon(t):
        return (t.to_pandas().sort_values(['source', 'line'])
                .reset_index(drop=True))
    a = canon(host_boilerplate(sf))
    b = canon(host_boilerplate(sf, force_join=True))
    assert a.equals(b)
    assert len(a) > 0


def test_host_boilerplate_planted(ray_session, tmp_path):
    """A line shared by >= ceil(frac*docs) docs of ONE source is
    detected for that source only; a single occurrence elsewhere and
    sub-threshold lines stay out."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import host_boilerplate

    tpl = 'nav home about contact terms privacy copyright foo bar baz'
    docs = []
    # source A: 4 docs, 3 carry the template line (plus unique filler)
    for i in range(4):
        body = ' '.join('worda%d_%d' % (i, j) for j in range(10))
        text = (tpl + ' ' + body) if i < 3 else body
        docs.append((i, 'hostA', text))
    # source B: 4 docs, only one carries the template line
    for i in range(4):
        body = ' '.join('wordb%d_%d' % (i, j) for j in range(10))
        text = (tpl + ' ' + body) if i == 0 else body
        docs.append((10 + i, 'hostB', text))
    t = pa.table({'doc_id': pa.array([d[0] for d in docs], pa.int64()),
                  'source': pa.array([d[1] for d in docs]),
                  'text': pa.array([d[2] for d in docs])})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = host_boilerplate(str(tmp_path), frac=0.5).to_pandas()
    assert set(zip(out['source'], out['line'])) == {('hostA', tpl)}
    assert out['n_docs'].tolist() == [3]


def test_semdedup_precision_and_recall(ray_session):
    """On a planted corpus with real near-dup groups (the embeddings
    fixture has no >=0.95 cosine pairs — same as the embedding_dups
    family), every SemDeDup removal must be a true dup (precision
    1.0), recall vs the exact dup graph must hold the gate's 0.95 pin,
    and each group must keep exactly its min-id representative."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from webscraping_ray.stages.clusters import connected_components
    from webscraping_ray.stages.dedup import (embedding_dup_pairs,
                                              semdedup_removed)

    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 16))
    rows = [base[i] for i in range(40)]
    # plant 6 dup groups: tiny perturbations of shared anchors
    for g in range(6):
        for j in range(2 + g % 3):
            rows.append(base[g] + rng.normal(scale=1e-3, size=16))
    M = np.array(rows)
    ds = ray.data.from_items(
        [{'vec_id': i, 'embedding': M[i].tolist()}
         for i in range(len(rows))])

    pairs = embedding_dup_pairs(ds, threshold=0.95, method='brute')
    cc = connected_components(pairs)
    exact_removed = {d for d, c in zip(cc.column('doc_id').to_pylist(),
                                       cc.column('cluster_id').to_pylist())
                     if d != c}
    in_graph = set(cc.column('doc_id').to_pylist())
    assert exact_removed, 'planted corpus must contain exact dups'

    sem = semdedup_removed(ds, n_clusters=8)
    sem_ids = set(sem.column('vec_id').to_pylist())
    assert sem_ids <= in_graph  # precision 1.0
    assert len(sem_ids & exact_removed) / len(exact_removed) >= 0.95
    # kept representative is the component min id whenever the whole
    # component shares one IVF bucket
    for vid, keep in zip(sem.column('vec_id').to_pylist(),
                         sem.column('keep_id').to_pylist()):
        assert keep < vid


def test_semdedup_recall_gate_green(ray_session):
    """The registered quality-gate query must emit recall_ok=1 on the
    driver fixture (trivially: no >=0.95 pairs exist there) — the
    planted-corpus test above pins the non-trivial behavior."""
    from webscraping_ray.pipelines.relational import semdedup_recall

    out = semdedup_recall('/root/testdata/sf0.001').to_pylist()
    assert out == [{'n_exact_removed': 0, 'recall_ok': 1}]


def test_inverted_index_planted(ray_session, tmp_path):
    """Posting lists are sorted distinct doc ids; terms below min_df
    drop; within-doc repeats count once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import inverted_index

    t = pa.table({
        'doc_id': pa.array([3, 1, 7], pa.int64()),
        'text': pa.array(['apple banana apple', 'banana Cherry',
                          'cherry banana apple'])})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (inverted_index(str(tmp_path)).to_pandas()
           .sort_values('term').reset_index(drop=True))
    got = {r['term']: (r['df'], r['postings'])
           for _, r in out.iterrows()}
    assert got == {'apple': (2, '3,7'),
                   'banana': (3, '1,3,7'),
                   'cherry': (2, '1,7')}


def test_crawl_budget_alloc_hamilton(ray_session):
    """Allocations sum exactly to the budget, every floor quota is
    honored, and no source gets more than floor(quota)+1."""
    import numpy as np

    from webscraping_ray.pipelines.relational import crawl_budget_alloc

    out = crawl_budget_alloc('/root/testdata/sf0.001',
                             budget=997).to_pandas()
    assert out['alloc'].sum() == 997
    quota = 997.0 * out['n_tokens'] / out['n_tokens'].sum()
    fl = np.floor(quota)
    assert ((out['alloc'] == fl) | (out['alloc'] == fl + 1)).all()


def test_centroid_classify_planted(ray_session, tmp_path):
    """On well-separated planted clusters the prototype classifier is
    perfect; centroids from per-block partials must equal the global
    per-label mean regardless of block split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import centroid_classify

    rng = np.random.default_rng(11)
    anchors = rng.normal(size=(3, 8)) * 10
    vecs, labs = [], []
    for i in range(90):
        l = i % 3
        vecs.append((anchors[l] + rng.normal(scale=0.01, size=8)).tolist())
        labs.append(l)
    t = pa.table({'vec_id': pa.array(range(90), pa.int64()),
                  'label': pa.array(labs, pa.int32()),
                  'embedding': pa.array(vecs, pa.list_(pa.float32()))})
    pq.write_table(t, str(tmp_path / 'embeddings.parquet'))

    out = centroid_classify(str(tmp_path)).to_pandas()
    assert len(out) == 90
    assert (out['label'] == out['pred_label']).all()


def test_snapshot_diff_classes(ray_session):
    """The full-outer snapshot diff covers every page key exactly once
    and produces all four change classes with the constructed counts
    (old = 0..449, new = 50..499, every doc_id % 5 == 0 re-rendered)."""
    from webscraping_ray.pipelines.relational import snapshot_diff

    out = snapshot_diff('/root/testdata/sf0.001').to_pandas()
    assert len(out) == 500
    assert out['page_key'].is_unique
    counts = out['status'].value_counts().to_dict()
    assert counts == {'unchanged': 320, 'changed': 80,
                      'gone': 50, 'added': 50}
    # boundary spot checks
    st = out.set_index('page_key')['status']
    assert st[0] == 'gone' and st[49] == 'gone'
    assert st[450] == 'added' and st[499] == 'added'
    assert st[50] == 'changed'      # 50 % 5 == 0 → re-rendered
    assert st[51] == 'unchanged'


def test_dup_keep_best_planted(ray_session, tmp_path):
    """Survivorship keeps the highest-unique-token member of each
    near-dup component (NOT min id), ties break to the lowest id."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import dup_keep_best

    texts = [
        BASE,                                     # 0: cluster A
        BASE,                                     # 1: exact dup of 0
        BASE + " extra glossary appendix",        # 2: near dup, +3 uniques
        "completely different tiny text",         # 3: singleton (no row)
        "shared database storage engine notes",   # 4: cluster B
        "shared database storage engine notes",   # 5: exact dup, tie on score
    ]
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (dup_keep_best(str(tmp_path)).to_pandas()
           .sort_values('cluster_id').reset_index(drop=True))
    got = {r['cluster_id']: (r['keep_id'], r['n_members'])
           for _, r in out.iterrows()}
    # cluster 0: doc 2 wins on unique tokens; cluster 4: score tie -> min id
    assert got == {0: (2, 3), 4: (4, 2)}


def test_chunk_documents_boundaries(ray_session, tmp_path):
    """Window/stride arithmetic: last chunk short, exact-boundary doc,
    single-token doc, empty and null docs emit nothing; every chunk
    except a doc's last has exactly `window` tokens."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import chunk_documents

    t = pa.table({
        'doc_id': pa.array([1, 2, 3, 4, 5], pa.int64()),
        'text': pa.array(['t ' * 10,      # 10 toks -> 4,4,4,1 @ w4 s3
                          't ' * 6,       # 6 toks  -> 4,3
                          'solo',         # 1 tok   -> 1
                          '   ',          # 0 toks  -> nothing
                          None])})        # null    -> nothing
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (chunk_documents(str(tmp_path), window=4, stride=3).to_pandas()
           .sort_values(['doc_id', 'chunk_id']).reset_index(drop=True))
    got = [(r['doc_id'], r['chunk_id'], r['chunk_tokens'])
           for _, r in out.iterrows()]
    assert got == [(1, 0, 4), (1, 1, 4), (1, 2, 4), (1, 3, 1),
                   (2, 0, 4), (2, 1, 3),
                   (3, 0, 1)]


def test_gopher_filter_rule_boundaries(ray_session, tmp_path):
    """Each Gopher rule flips keep exactly at its integer boundary."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import gopher_filter

    w50 = ' '.join(['word'] * 50)             # 50 words, len 4 each
    texts = [
        w50,                                   # 0: keep (all boundaries pass)
        ' '.join(['word'] * 49),               # 1: drop (49 < 50 words)
        w50 + ' #####',                        # 2: keep (5 hashes, 10*5<=50)
        w50 + ' ######',                       # 3: drop (6 hashes, 60>50)
        ' '.join(['word'] * 40 + ['123'] * 10),   # 4: keep (alpha 40/50 = 0.8)
        ' '.join(['word'] * 39 + ['123'] * 11),   # 5: drop (alpha 39/50 < 0.8)
        '\n'.join(['- ' + ' '.join(['word'] * 6)] * 9
                  + [' '.join(['word'] * 6)]),    # 6: keep (9/10 bullet lines)
        '\n'.join(['- ' + ' '.join(['word'] * 6)] * 10),  # 7: drop (10/10 bullets)
        '\n'.join([' '.join(['word'] * 6) + ' ...'] * 3
                  + [' '.join(['word'] * 6)] * 7),   # 8: keep (3/10 ellipsis)
        '\n'.join([' '.join(['word'] * 6) + ' ...'] * 4
                  + [' '.join(['word'] * 6)] * 6),   # 9: drop (4/10 > 0.3)
        ' '.join(['ab'] * 50),                 # 10: drop (mean len 2 < 3)
        ' '.join(['abc'] * 50),                # 11: keep (mean len exactly 3)
        ' '.join(['abcdefghijk'] * 50),        # 12: drop (mean len 11 > 10)
    ]
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = gopher_filter(str(tmp_path)).to_pandas().set_index('doc_id')
    expect = {0: 1, 1: 0, 2: 1, 3: 0, 4: 1, 5: 0, 6: 1, 7: 0,
              8: 1, 9: 0, 10: 0, 11: 1, 12: 0}
    assert out['keep'].to_dict() == expect


def test_bpe_pair_counts_planted(ray_session, tmp_path):
    """Overlapping pairs count per occurrence; the top-k cut breaks
    count ties by pair ascending (deterministic total order)."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import bpe_pair_counts

    t = pa.table({'doc_id': pa.array([1, 2], pa.int64()),
                  'text': pa.array(['Abab x', 'bc bd'])})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = bpe_pair_counts(str(tmp_path), top_k=2).to_pandas()
    # 'abab' -> ab:2, ba:1; 'bc','bd' -> bc:1, bd:1; 'x' too short.
    # ties at 1 cut by pair asc -> 'ba' wins the second slot.
    assert list(map(tuple, out.itertuples(index=False))) == [
        ('ab', 2), ('ba', 1)]


def test_oov_rate_planted(ray_session, tmp_path):
    """Vocab cut is (count desc, token asc) tie-stable; OOV counts per
    doc; token-less and null docs still appear scoring 0/0."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import oov_rate

    t = pa.table({'doc_id': pa.array([1, 2, 3, 4], pa.int64()),
                  'text': pa.array(['a a a b b c', 'c d', '', None])})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    # counts: a=3, b=2, c=2, d=1; top-2 tie at 2 -> 'b' beats 'c'
    out = (oov_rate(str(tmp_path), vocab_size=2).to_pandas()
           .set_index('doc_id').sort_index())
    got = {i: (r['n_tokens'], r['n_oov']) for i, r in out.iterrows()}
    assert got == {1: (6, 1), 2: (2, 2), 3: (0, 0), 4: (0, 0)}


def test_train_test_split_exact_counts(ray_session):
    """Every source contributes EXACTLY n_source // 10 test docs, every
    doc appears once, and the assignment is deterministic across runs."""
    import duckdb

    from webscraping_ray.pipelines.relational import train_test_split

    sf = '/root/testdata/sf0.001'
    out = train_test_split(sf).to_pandas()
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{sf}/documents.parquet'").df()
    assert len(out) == len(docs) and out['doc_id'].is_unique

    m = out.merge(docs, on='doc_id')
    per = m.groupby('source').agg(n=('split', 'size'),
                                  n_test=('split', lambda s: (s == 'test').sum()))
    assert (per['n_test'] == per['n'] // 10).all()

    again = train_test_split(sf).to_pandas().sort_values('doc_id')
    assert again.reset_index(drop=True).equals(
        out.sort_values('doc_id').reset_index(drop=True))


def test_reservoir_sample_partial_topk(ray_session):
    """The per-block partial top-k merge returns exactly the k globally
    smallest md5 keys — identical to a full driver-side sort."""
    import hashlib

    import duckdb

    from webscraping_ray.pipelines.relational import reservoir_sample

    sf = '/root/testdata/sf0.001'
    out = (reservoir_sample(sf, k=37).to_pandas()
           .sort_values('doc_id').reset_index(drop=True))
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{sf}/documents.parquet'").df()
    docs['hkey'] = [int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[8:], 'little')
        for i in docs['doc_id']]
    exp = (docs.sort_values(['hkey', 'doc_id']).head(37)
           [['doc_id', 'source']].sort_values('doc_id')
           .reset_index(drop=True))
    assert out.equals(exp)


def test_events_user_running_planted(ray_session, tmp_path):
    """Running sum restarts per user; gap_us is the per-user
    inter-arrival time with 0 on each user's first event; ts ties
    break by event_id."""
    import pandas as pd
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import events_user_running

    base = pd.Timestamp('2024-01-01', tz=None)
    t = pa.table({
        'event_id': pa.array([1, 2, 3, 4, 5], pa.int64()),
        'user_id': pa.array([7, 7, 7, 9, 9], pa.int64()),
        'ts': pa.array([base, base, base + pd.Timedelta(seconds=3),
                        base, base + pd.Timedelta(microseconds=5)],
                       pa.timestamp('us')),
        'value': pa.array([1.5, 2.0, 4.0, 10.0, 0.25], pa.float64())})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (events_user_running(str(tmp_path)).to_pandas()
           .set_index('event_id').sort_index())
    # user 7: ties at ts=base order by event_id (1 then 2), then +3s
    assert out.loc[1].tolist() == [1.5, 0]
    assert out.loc[2].tolist() == [3.5, 0]
    assert out.loc[3].tolist() == [7.5, 3_000_000]
    # user 9 restarts
    assert out.loc[4].tolist() == [10.0, 0]
    assert out.loc[5].tolist() == [10.25, 5]


def test_pivot_user_events_planted(ray_session, tmp_path):
    """Crosstab counts land in the right columns; out-of-domain types
    count into n_other instead of vanishing."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import pivot_user_events

    t = pa.table({
        'event_id': pa.array(range(6), pa.int64()),
        'ts': pa.array([0] * 6, pa.timestamp('us')),
        'user_id': pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        'event_type': pa.array(['click', 'click', 'weird',
                                'view', 'purchase', 'view']),
        'value': pa.array([0.0] * 6, pa.float64()),
        'props': pa.array([''] * 6)})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (pivot_user_events(str(tmp_path)).to_pandas()
           .set_index('user_id').sort_index())
    assert out.loc[1].to_dict() == {'n_click': 2, 'n_error': 0,
                                    'n_purchase': 0, 'n_signup': 0,
                                    'n_view': 0, 'n_other': 1}
    assert out.loc[2].to_dict() == {'n_click': 0, 'n_error': 0,
                                    'n_purchase': 1, 'n_signup': 0,
                                    'n_view': 2, 'n_other': 0}


def test_pmi_collocations_planted(ray_session, tmp_path):
    """A bigram repeated verbatim scores the highest PMI; bigrams under
    min_count are dropped."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import pmi_collocations

    # "zeta omega" appears 5x and its words appear nowhere else →
    # maximal PMI; "the cat" appears 4x (< min_count) → dropped
    texts = ['zeta omega'] * 5 + ['the cat sat'] * 4 + ['the dog ran'] * 6
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * len(texts)),
                  'source': pa.array(['s'] * len(texts)),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = pmi_collocations(str(tmp_path), k=10, min_count=5).to_pandas()
    got = set(zip(out['w1'], out['w2']))
    assert ('zeta', 'omega') in got
    assert ('the', 'cat') not in got            # min_count guard
    top = out.sort_values('pmi', ascending=False).iloc[0]
    assert (top['w1'], top['w2']) == ('zeta', 'omega')


def test_mirror_sources_max_group_guard(ray_session, tmp_path):
    """A line shared by more sources than max_group is dropped
    (boilerplate guard); a 2-source line still pairs."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import mirror_sources

    boiler = ' '.join(['common'] * 10)      # one full 10-word line
    rare = ' '.join(['rare'] * 10)
    texts, srcs = [], []
    for i in range(5):                      # boilerplate on 5 sources
        texts.append(boiler)
        srcs.append(f'h{i}')
    texts += [rare, rare]                   # rare line on exactly 2
    srcs += ['h0', 'h1']
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * len(texts)),
                  'source': pa.array(srcs, pa.string()),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = mirror_sources(str(tmp_path), min_shared=1,
                         max_group=3).to_pandas()
    pairs = set(zip(out['source_a'], out['source_b']))
    assert pairs == {('h0', 'h1')}          # boilerplate group dropped

    out2 = mirror_sources(str(tmp_path), min_shared=1,
                          max_group=64).to_pandas()
    assert len(out2) == 10 + 1 - 1          # C(5,2)=10 pairs + h0-h1
    assert int(out2.set_index(['source_a', 'source_b'])
               .loc[('h0', 'h1'), 'n_shared']) == 2


def test_zipf_slope_exact_powerlaw(ray_session, tmp_path):
    """On an exact power-law corpus (count of rank r = 2^(10-r)) the
    fitted slope is ln(1/2)/ln-rank-regression — verified against a
    closed-form numpy fit on the same counts."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import zipf_slope

    words = [f'w{r}' for r in range(1, 9)]
    texts = []
    for r, w in enumerate(words, start=1):
        texts.extend([w] * (2 ** (9 - r)))
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * len(texts)),
                  'source': pa.array(['s'] * len(texts)),
                  'n_chars': pa.array([2] * len(texts), pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = zipf_slope(str(tmp_path), top=100).to_pandas()
    assert int(out['n_terms'][0]) == 8
    x = np.log(np.arange(1, 9, dtype=np.float64))
    y = np.log(np.array([2.0 ** (9 - r) for r in range(1, 9)]))
    want = (np.mean(x * y) - x.mean() * y.mean()) / (np.mean(x * x)
                                                     - x.mean() ** 2)
    assert abs(out['slope'][0] - round(want, 6)) < 1e-9


def test_lexical_diversity_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import lexical_diversity

    t = pa.table({'doc_id': pa.array([0, 1, 2], pa.int64()),
                  'text': pa.array(['a a b', '', 'x y z'], pa.string()),
                  'lang': pa.array(['en'] * 3),
                  'source': pa.array(['s'] * 3),
                  'n_chars': pa.array([5, 0, 5], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (lexical_diversity(str(tmp_path)).to_pandas()
           .set_index('doc_id').sort_index())
    assert out.loc[0].to_dict() == {'n_tokens': 3, 'n_types': 2,
                                    'ttr': round(2 / 3, 6),
                                    'hapax_ratio': 0.5}
    assert out.loc[1].to_dict() == {'n_tokens': 0, 'n_types': 0,
                                    'ttr': 0.0, 'hapax_ratio': 0.0}
    assert out.loc[2].to_dict() == {'n_tokens': 3, 'n_types': 3,
                                    'ttr': 1.0, 'hapax_ratio': 1.0}


def test_pmi_tiers_equal(ray_session):
    """Broadcast and hash-join PMI tiers produce identical tables."""
    from webscraping_ray.pipelines.relational import pmi_collocations

    sf = '/root/testdata/sf0.001'
    bc = (pmi_collocations(sf, k=50).to_pandas()
          .sort_values(['w1', 'w2']).reset_index(drop=True))
    jn = (pmi_collocations(sf, k=50, force_join=True).to_pandas()
          .sort_values(['w1', 'w2']).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(bc, jn)


def test_doc_containment_asymmetric(ray_session, tmp_path):
    """A short doc quoted inside a long one: containment(short in
    long) = 1.0 while Jaccard is low — the case the op exists for."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import doc_containment

    short = 'alpha beta gamma delta epsilon'
    long_ = short + ' ' + ' '.join(f'filler{i}' for i in range(40))
    other = 'totally unrelated words here now'
    texts = [short, long_, other]
    t = pa.table({'doc_id': pa.array([0, 1, 2], pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * 3),
                  'source': pa.array(['s'] * 3),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = doc_containment(str(tmp_path), threshold=0.8).to_pandas()
    assert set(zip(out['doc_a'], out['doc_b'])) == {(0, 1)}
    row = out.iloc[0]
    assert row['cont_a_in_b'] == 1.0          # short fully inside long
    assert row['cont_b_in_a'] < 0.2           # Jaccard-style would miss


def test_doc_containment_hot_shingle_guard(ray_session, tmp_path):
    """A shingle shared by more docs than max_group contributes no
    pairs (boilerplate guard)."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import doc_containment

    texts = ['common shingle here'] * 5      # one shared shingle, 5 docs
    t = pa.table({'doc_id': pa.array(range(5), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * 5),
                  'source': pa.array(['s'] * 5),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = doc_containment(str(tmp_path), max_group=3).to_pandas()
    assert len(out) == 0                      # group of 5 > max_group=3
    out2 = doc_containment(str(tmp_path), max_group=10).to_pandas()
    assert len(out2) == 10                    # C(5,2) identical pairs
    assert (out2['cont_a_in_b'] == 1.0).all()


def test_reading_ease_known_values(ray_session, tmp_path):
    """Hand-computed FRE for a two-sentence doc and the empty-doc
    contract."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import reading_ease

    txt = 'The cat sat. The dog ran!'
    # words: the cat sat the dog ran (6); sentences: 2;
    # syllables (vowel groups, min 1/word): 1 each = 6
    want = 206.835 - 1.015 * (6 / 2.0) - 84.6 * (6 / 6.0)
    t = pa.table({'doc_id': pa.array([0, 1], pa.int64()),
                  'text': pa.array([txt, ''], pa.string()),
                  'lang': pa.array(['en'] * 2),
                  'source': pa.array(['s'] * 2),
                  'n_chars': pa.array([len(txt), 0], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (reading_ease(str(tmp_path)).to_pandas()
           .set_index('doc_id').sort_index())
    assert out.loc[0].to_dict() == {'n_words': 6, 'n_sentences': 2,
                                    'fre': round(want, 6)}
    assert out.loc[1].to_dict() == {'n_words': 0, 'n_sentences': 0,
                                    'fre': 0.0}


def test_url_template_mining_trap_signal(ray_session):
    """The /d/N template counts exactly the non-root docs; every
    template spans all digit positions (host id collapsed too)."""
    from webscraping_ray.pipelines.relational import url_template_mining

    out = (url_template_mining('/root/testdata/sf0.001').to_pandas()
           .set_index('template')['n_urls'].to_dict())
    assert out['http://srcN.com/d/N'] == 500 - 8
    assert out['http://srcN.com/q/N?a=N&b=N'] == 500
    assert out['http://srcN.com/img/N.png'] == 500


def test_events_funnel_stages_and_strict_ties(ray_session, tmp_path):
    """All four stages reachable; a click at EXACTLY the first view's
    ts does not advance the funnel (strict inequality)."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import events_funnel

    TS = lambda s: np.datetime64('2026-01-01T00:00:00', 'us') + \
        np.timedelta64(s, 's')
    rows = [
        # user 1: full funnel
        (1, TS(0), 'view'), (1, TS(1), 'click'), (1, TS(2), 'purchase'),
        # user 2: view then click AT THE SAME ts -> stuck at stage 1
        (2, TS(0), 'view'), (2, TS(0), 'click'),
        # user 3: click before view only -> stage 1 (view exists later)
        (3, TS(5), 'click'), (3, TS(9), 'view'),
        # user 4: no view at all -> stage 0
        (4, TS(0), 'click'), (4, TS(1), 'purchase'),
        # user 5: view + click, purchase BEFORE the click -> stage 2
        (5, TS(0), 'purchase'), (5, TS(1), 'view'), (5, TS(2), 'click'),
    ]
    t = pa.table({
        'event_id': pa.array(range(len(rows)), pa.int64()),
        'ts': pa.array([r[1] for r in rows], pa.timestamp('us')),
        'user_id': pa.array([r[0] for r in rows], pa.int64()),
        'event_type': pa.array([r[2] for r in rows], pa.string()),
        'value': pa.array([0.0] * len(rows), pa.float64()),
        'props': pa.array([''] * len(rows))})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (events_funnel(str(tmp_path)).to_pandas()
           .set_index('user_id')['funnel_stage'].to_dict())
    assert out == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}


def test_hard_negatives_planted(ray_session, tmp_path):
    """Hand-checkable 2-D vectors: positives and hard negatives picked
    by cosine within/across labels; a singleton class gets pos_id -1."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import hard_negatives

    vecs = [[1.0, 0.0],     # 0 label 0
            [0.9, 0.1],     # 1 label 0  (closest to 0 within label)
            [0.0, 1.0],     # 2 label 0  (far from 0/1)
            [0.8, 0.2],     # 3 label 1  (closest cross-label to 0/1)
            [-1.0, 0.0]]    # 4 label 2  singleton class
    labels = [0, 0, 0, 1, 2]
    t = pa.table({'vec_id': pa.array(range(5), pa.int64()),
                  'embedding': pa.array(vecs, pa.list_(pa.float32())),
                  'label': pa.array(labels, pa.int32())})
    pq.write_table(t, str(tmp_path / 'embeddings.parquet'))

    out = (hard_negatives(str(tmp_path)).to_pandas()
           .set_index('vec_id').sort_index())
    assert out.loc[0].to_dict() == {'pos_id': 1, 'neg_id': 3}
    assert out.loc[1].to_dict() == {'pos_id': 0, 'neg_id': 3}
    assert out.loc[4].to_dict()['pos_id'] == -1   # singleton class
    assert out.loc[3]['pos_id'] == -1             # label 1 singleton too
    assert out.loc[3]['neg_id'] == 1              # cos(3,1) > cos(3,0)


@pytest.mark.parametrize('sf_dir', ['/root/testdata/sf0.001',
                                    '/root/testdata/sf0.01'])
def test_hard_negatives_blocked_equals_brute(ray_session, sf_dir):
    """The scale tier (chunked corpus refs + streamed argmax fold) is
    pinned EXACTLY equal to the broadcast brute tier — including with
    chunk_rows forced tiny so every batch merges across many chunks
    (the cross-chunk tie-break path)."""
    import pandas as pd
    import ray.data

    from webscraping_ray.stages.similarity import (hard_negatives_blocked,
                                                   hard_negatives_brute)

    ds = ray.data.read_parquet(
        f'{sf_dir}/embeddings.parquet',
        columns=['vec_id', 'embedding', 'label'])
    want = (hard_negatives_brute(ds).to_pandas()
            .sort_values('vec_id').reset_index(drop=True))
    for chunk_rows in (64, 10**9):   # multi-chunk and single-chunk
        got = (hard_negatives_blocked(ds, chunk_rows=chunk_rows)
               .to_pandas().sort_values('vec_id').reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)


def test_hard_negatives_blocked_planted_multichunk(ray_session, tmp_path):
    """Planted 2-D case through the blocked tier with chunk_rows=2:
    positives/negatives split across chunks still resolve to the
    global argmax (and singleton classes still get -1)."""
    import pyarrow.parquet as pq
    import ray.data

    from webscraping_ray.stages.similarity import hard_negatives_blocked

    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.8, 0.2], [-1.0, 0.0]]
    labels = [0, 0, 0, 1, 2]
    t = pa.table({'vec_id': pa.array(range(5), pa.int64()),
                  'embedding': pa.array(vecs, pa.list_(pa.float32())),
                  'label': pa.array(labels, pa.int32())})
    pq.write_table(t, str(tmp_path / 'embeddings.parquet'))
    ds = ray.data.read_parquet(str(tmp_path / 'embeddings.parquet'),
                               override_num_blocks=3)
    out = (hard_negatives_blocked(ds, chunk_rows=2).to_pandas()
           .set_index('vec_id').sort_index())
    assert out.loc[0].to_dict() == {'pos_id': 1, 'neg_id': 3}
    assert out.loc[1].to_dict() == {'pos_id': 0, 'neg_id': 3}
    assert out.loc[4].to_dict()['pos_id'] == -1
    assert out.loc[3]['pos_id'] == -1
    assert out.loc[3]['neg_id'] == 1


def test_doc_containment_random_vs_naive(ray_session, tmp_path):
    """Seeded random corpus (tiny vocab forces heavy shingle sharing,
    plus empty / sub-k docs) vs a naive Python set reference."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import doc_containment
    from webscraping_ray.stages.dedup import shingles

    rng = np.random.default_rng(7)
    vocab = ['a', 'b', 'c', 'd', 'e']
    texts = ['', 'a', 'a b']            # edge shapes
    for _ in range(40):
        n = int(rng.integers(3, 14))
        texts.append(' '.join(rng.choice(vocab, n)))
    t = pa.table({'doc_id': pa.array(range(len(texts)), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * len(texts)),
                  'source': pa.array(['s'] * len(texts)),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    thr = 0.7
    sets = [shingles(x, 3) for x in texts]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            common = len(sets[i] & sets[j])
            if not common:
                continue
            ca, cb = common / len(sets[i]), common / len(sets[j])
            if max(ca, cb) >= thr:
                # mirror the engine's 1e-6 snap (np.rint scaled), not
                # Python round — they differ on some representations
                want[(i, j)] = (common,
                                float(np.rint(ca * 1e6) / 1e6),
                                float(np.rint(cb * 1e6) / 1e6))

    out = doc_containment(str(tmp_path), threshold=thr).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)):
           (int(r.n_common), r.cont_a_in_b, r.cont_b_in_a)
           for r in out.itertuples()}
    assert got == want


def test_rollup_source_lang_planted(ray_session, tmp_path):
    """All three rollup levels carry exact counts/char sums; 'ALL'
    fills rolled-up keys; lvl is the GROUPING bitmask."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import rollup_source_lang

    rows = [('a', 'en', 10), ('a', 'en', 20), ('a', 'de', 5),
            ('b', 'en', 7)]
    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(['x'] * 4),
                  'lang': pa.array([r[1] for r in rows]),
                  'source': pa.array([r[0] for r in rows]),
                  'n_chars': pa.array([r[2] for r in rows], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = rollup_source_lang(str(tmp_path)).to_pandas()
    key = out.set_index(['source', 'lang', 'lvl'])
    assert key.loc[('a', 'en', 0)]['n_docs'] == 2
    assert key.loc[('a', 'en', 0)]['n_chars'] == 30
    assert key.loc[('a', 'ALL', 1)]['n_docs'] == 3
    assert key.loc[('a', 'ALL', 1)]['n_chars'] == 35
    assert key.loc[('ALL', 'ALL', 3)]['n_docs'] == 4
    assert key.loc[('ALL', 'ALL', 3)]['n_chars'] == 42
    assert len(out) == 3 + 2 + 1


def test_unigram_entropy_planted(ray_session, tmp_path):
    """Uniform 4-token vocab → exactly 2 bits; single-token corpus →
    0 bits; counts merge across docs/blocks before c·ln c."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import unigram_entropy

    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(['a b', 'c d', 'a b', 'c d'])})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))
    out = unigram_entropy(str(tmp_path)).to_pandas().iloc[0]
    assert out['n_tokens'] == 8
    assert out['vocab_size'] == 4
    assert out['entropy_bits'] == 2.0

    t2 = pa.table({'doc_id': pa.array([0, 1], pa.int64()),
                   'text': pa.array(['z z z', 'z'])})
    d2 = tmp_path / 'single'
    d2.mkdir()
    pq.write_table(t2, str(d2 / 'documents.parquet'))
    out2 = unigram_entropy(str(d2)).to_pandas().iloc[0]
    assert out2['vocab_size'] == 1
    assert out2['entropy_bits'] == 0.0


def test_events_daily_change_planted(ray_session, tmp_path):
    """Day counts aggregate across blocks; pct_change is (n-prev)/prev
    with NULL on the first day."""
    import datetime as dt

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import events_daily_change

    import pandas as pd

    def ts(day, i):
        return dt.datetime(2024, 1, day, 8, i)

    stamps = [ts(1, 0), ts(1, 1), ts(2, 0), ts(2, 1), ts(2, 2), ts(2, 3),
              ts(3, 0), ts(3, 1), ts(3, 2)]
    t = pa.table({'event_id': pa.array(range(len(stamps)), pa.int64()),
                  'ts': pa.array(stamps, pa.timestamp('us')),
                  'user_id': pa.array([1] * len(stamps), pa.int64()),
                  'event_type': pa.array(['view'] * len(stamps)),
                  'value': pa.array([1.0] * len(stamps)),
                  'props': pa.array([''] * len(stamps))})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (events_daily_change(str(tmp_path)).to_pandas()
           .sort_values('day').reset_index(drop=True))
    assert list(out['day']) == ['2024-01-01', '2024-01-02', '2024-01-03']
    assert list(out['n_events']) == [2, 4, 3]
    assert pd.isna(out['pct_change'][0])
    assert out['pct_change'][1] == 1.0
    assert out['pct_change'][2] == -0.25


def test_feature_correlations_planted(ray_session, tmp_path):
    """Perfectly linear features → corr 1.0; the three pairs come out
    ordered and bounded in [-1, 1]."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import feature_correlations

    # n_chars == 2 * n_tokens by construction → corr(chars, tokens) = 1
    texts = ['a', 'a b', 'a b c', 'a b c d']
    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(texts),
                  'n_chars': pa.array([2 * len(x.split()) for x in texts],
                                      pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = feature_correlations(str(tmp_path)).to_pandas()
    assert list(zip(out['feat_a'], out['feat_b'])) == [
        ('chars', 'tokens'), ('chars', 'types'), ('tokens', 'types')]
    m = out.set_index(['feat_a', 'feat_b'])['corr']
    assert m[('chars', 'tokens')] == 1.0
    assert m[('tokens', 'types')] == 1.0   # all tokens distinct here
    assert ((out['corr'] <= 1.0) & (out['corr'] >= -1.0)).all()


def test_get_anchor_pairs_kernel():
    """Pairing survives href-less anchors, skips non-http schemes,
    keeps duplicates (no get_links dedup), strips fragments."""
    from webscraping_ray.kernels.xpath import get_anchor_pairs

    h = ('<html><body><a name="x">bare</a>'
         '<a href="/d/1#top">one</a><a href="mailto:a@b">m</a>'
         '<a href="/d/1">one again</a>'
         '<a href="http://e.com/p">ext</a>'
         '<a href="/d/2"><b>bold</b> text</a></body></html>')
    got = get_anchor_pairs(h, 'http://s.com/base/')
    assert got == [('http://s.com/base/', 'bare'),
                   ('http://s.com/d/1', 'one'),
                   ('http://s.com/d/1', 'one again'),
                   ('http://e.com/p', 'ext'),
                   # nested markup stripped (text() semantics),
                   # not returned as inner HTML
                   ('http://s.com/d/2', 'bold text')]


def test_anchor_texts_merges_referrers(ray_session, tmp_path):
    """Multiple referrers to one target merge: distinct anchors sort
    and join with '|', n_refs counts every instance."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import anchor_texts

    # build a tiny documents table; the derived pages of docs 0..7 are
    # seeds (no parents), doc 8 is child 0 of doc 0 ('l0')
    n = 9
    t = pa.table({'doc_id': pa.array(range(n), pa.int64()),
                  'text': pa.array([f'doc {i}' for i in range(n)]),
                  'lang': pa.array(['en'] * n),
                  'source': pa.array(['s'] * n),
                  'n_chars': pa.array([5] * n, pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = anchor_texts(str(tmp_path)).to_pandas().set_index('url')
    assert out.loc['http://src0.com/d/8', 'anchors'] == 'l0'
    assert out.loc['http://src0.com/d/8', 'n_refs'] == 1
    # every doc emits one query link with unescaped &
    assert out.loc['http://src0.com/q/0?a=1&b=2', 'anchors'] == 'query'
    # every doc emits query + cross + media; at n=9 only doc 0 has a
    # tree child (doc 8) → 9*3 + 1 anchor instances, all targets unique
    assert out['n_refs'].sum() == 9 * 3 + 1
    assert (out['n_refs'] == 1).all()


def test_crawl_status_by_host_planted(ray_session):
    """Host report ties out with the flagship crawl: 8 hosts, 200s =
    corpus visits, 404s = /q/ probes."""
    from webscraping_ray.pipelines.relational import (crawl_documents,
                                                      crawl_status_by_host)

    sf = '/root/testdata/sf0.001'
    v = crawl_documents(sf).to_pandas()
    out = crawl_status_by_host(sf).to_pandas()
    assert set(out['host']) == {f'src{i}.com' for i in range(8)}
    assert out['n_visits'].sum() == len(v)
    assert (out.groupby('status')['n_visits'].sum()[200]
            == (v['status'] == 200).sum())


def test_weekly_top_events_planted(ray_session, tmp_path):
    """Counts merge across blocks; rank order is (n desc, type asc);
    only top-3 survive."""
    import datetime as dt

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import weekly_top_events

    # week of 2024-01-01 (a Monday): a×3, b×3, c×2, d×1, e×1
    types = ['a'] * 3 + ['b'] * 3 + ['c'] * 2 + ['d', 'e']
    stamps = [dt.datetime(2024, 1, 1 + i % 7, 12) for i in range(len(types))]
    t = pa.table({'event_id': pa.array(range(len(types)), pa.int64()),
                  'ts': pa.array(stamps, pa.timestamp('us')),
                  'user_id': pa.array([1] * len(types), pa.int64()),
                  'event_type': pa.array(types),
                  'value': pa.array([1.0] * len(types)),
                  'props': pa.array([''] * len(types))})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = weekly_top_events(str(tmp_path)).to_pandas()
    assert list(out['week']) == ['2024-01-01'] * 3
    assert list(out['event_type']) == ['a', 'b', 'c']   # tie a<b, then c
    assert list(out['n_events']) == [3, 3, 2]
    assert list(out['rk']) == [1, 2, 3]


def test_pricing_summary_planted(ray_session, tmp_path):
    """Predicate filters late shipments; sums/avgs/count exact on a
    hand-computable plant; partials merge across blocks."""
    import datetime as dt

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import pricing_summary

    rows = [
        # flag, status, qty, price, disc, tax, shipdate
        ('A', 'F', 10.0, 100.0, 0.1, 0.2, dt.datetime(1998, 1, 1)),
        ('A', 'F', 20.0, 200.0, 0.0, 0.0, dt.datetime(1998, 2, 1)),
        ('N', 'O', 5.0, 50.0, 0.5, 0.1, dt.datetime(1999, 1, 1)),  # cut
        ('N', 'F', 1.0, 10.0, 0.0, 0.0, dt.datetime(1997, 1, 1)),
    ]
    t = pa.table({
        'l_orderkey': pa.array(range(4), pa.int64()),
        'l_partkey': pa.array([1] * 4, pa.int64()),
        'l_suppkey': pa.array([1] * 4, pa.int64()),
        'l_linenumber': pa.array([1] * 4, pa.int32()),
        'l_quantity': pa.array([r[2] for r in rows]),
        'l_extendedprice': pa.array([r[3] for r in rows]),
        'l_discount': pa.array([r[4] for r in rows]),
        'l_tax': pa.array([r[5] for r in rows]),
        'l_returnflag': pa.array([r[0] for r in rows]),
        'l_linestatus': pa.array([r[1] for r in rows]),
        'l_shipdate': pa.array([r[6] for r in rows], pa.timestamp('us'))})
    pq.write_table(t, str(tmp_path / 'lineitem.parquet'))

    out = (pricing_summary(str(tmp_path)).to_pandas()
           .set_index(['l_returnflag', 'l_linestatus']))
    assert len(out) == 2                       # ('N','O') filtered out
    af = out.loc[('A', 'F')]
    assert af['sum_qty'] == 30.0
    assert af['sum_base_price'] == 300.0
    assert af['sum_disc_price'] == 100.0 * 0.9 + 200.0
    assert af['sum_charge'] == 100.0 * 0.9 * 1.2 + 200.0
    assert af['avg_qty'] == 15.0
    assert af['avg_disc'] == 0.05
    assert af['cnt_order'] == 2
    assert out.loc[('N', 'F')]['cnt_order'] == 1


def test_kmeans_clusters_planted(ray_session, tmp_path):
    """Two well-separated blobs → clean 2-cluster assignment; ties and
    quantization are deterministic; an emptied-cluster corpus still
    returns every vec_id exactly once."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import kmeans_clusters

    rng = np.random.RandomState(7)
    a = rng.normal(0.0, 0.05, (20, 8)).astype(np.float32)
    b = rng.normal(5.0, 0.05, (20, 8)).astype(np.float32)
    vecs = np.vstack([a, b])
    order = rng.permutation(40)
    # vec_id 0 lands in blob a, vec_id 1 in blob b → init covers both
    order[0], order[1] = 0, 20
    t = pa.table({'vec_id': pa.array(range(40), pa.int64()),
                  'embedding': pa.array(
                      [vecs[order[i]].tolist() for i in range(40)],
                      pa.list_(pa.float32())),
                  'label': pa.array([0] * 40, pa.int32())})
    pq.write_table(t, str(tmp_path / 'embeddings.parquet'))

    out = (kmeans_clusters(str(tmp_path), k=2, iters=2).to_pandas()
           .sort_values('vec_id').reset_index(drop=True))
    assert len(out) == 40
    assert sorted(out['vec_id']) == list(range(40))
    # blob membership must match the cluster of its init seed
    blob = np.array([0 if order[i] < 20 else 1 for i in range(40)])
    c0 = out['cluster'][0]
    c1 = out['cluster'][1]
    assert c0 != c1
    want = np.where(blob == blob[0], c0, c1)
    assert (out['cluster'].to_numpy() == want).all()


def test_quantize_embedding_half_up():
    """floor(x*1000 + 0.5): explicit half-up, no banker's rounding."""
    from webscraping_ray.pipelines.relational import _quantize_embedding

    got = _quantize_embedding(np.array([0.0015, 0.0025, -0.0015, 1.0]))
    assert list(got) == [2, 3, -1, 1000]


def test_neardup_rate_by_source_planted(ray_session, tmp_path):
    """A verbatim pair marks both docs dup'd in their sources; unique
    docs don't count; fractions are exact."""
    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import neardup_rate_by_source

    dup = 'the quick brown fox jumps over the lazy dog again and again'
    texts = [dup, dup, 'completely different text one of a kind here',
             'another unique document with its own words entirely']
    src = ['s1', 's2', 's1', 's2']
    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(texts),
                  'lang': pa.array(['en'] * 4),
                  'source': pa.array(src),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = (neardup_rate_by_source(str(tmp_path)).to_pandas()
           .set_index('source'))
    assert out.loc['s1'].to_dict() == {'n_docs': 2, 'n_dup': 1,
                                       'dup_frac': 0.5}
    assert out.loc['s2'].to_dict() == {'n_docs': 2, 'n_dup': 1,
                                       'dup_frac': 0.5}


def _write_star(tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        'r_regionkey': pa.array([0, 1], pa.int64()),
        'r_name': pa.array(['EAST', 'WEST'])}),
        str(tmp_path / 'region.parquet'))
    pq.write_table(pa.table({
        'n_nationkey': pa.array([0, 1], pa.int64()),
        'n_name': pa.array(['AA', 'BB']),
        'n_regionkey': pa.array([0, 1], pa.int64())}),
        str(tmp_path / 'nation.parquet'))
    pq.write_table(pa.table({
        'c_custkey': pa.array([10, 11], pa.int64()),
        'c_name': pa.array(['ca', 'cb']),
        'c_nationkey': pa.array([0, 1], pa.int64()),
        'c_acctbal': pa.array([0.0, 0.0]),
        'c_mktsegment': pa.array(['M', 'M'])}),
        str(tmp_path / 'customer.parquet'))
    pq.write_table(pa.table({
        'o_orderkey': pa.array([100, 101], pa.int64()),
        'o_custkey': pa.array([10, 11], pa.int64()),
        'o_orderstatus': pa.array(['F', 'F']),
        'o_totalprice': pa.array([0.0, 0.0]),
        'o_orderdate': pa.array([dt.datetime(1998, 1, 1)] * 2,
                                pa.timestamp('us')),
        'o_orderpriority': pa.array(['1', '1'])}),
        str(tmp_path / 'orders.parquet'))
    pq.write_table(pa.table({
        's_suppkey': pa.array([7, 8], pa.int64()),
        's_name': pa.array(['sa', 'sb']),
        's_nationkey': pa.array([0, 1], pa.int64()),
        's_acctbal': pa.array([0.0, 0.0])}),
        str(tmp_path / 'supplier.parquet'))
    pq.write_table(pa.table({
        'p_partkey': pa.array([1, 2], pa.int64()),
        'p_name': pa.array(['pa', 'pb']),
        'p_brand': pa.array(['B1', 'B2']),
        'p_type': pa.array(['t', 't']),
        'p_size': pa.array([1, 1], pa.int64()),
        'p_retailprice': pa.array([1.0, 1.0])}),
        str(tmp_path / 'part.parquet'))
    # lineitem: (orderkey, partkey, suppkey, qty, price, disc)
    rows = [(100, 1, 7, 2.0, 100.0, 0.10),
            (100, 2, 8, 3.0, 200.0, 0.00),
            (101, 1, 7, 1.0, 50.0, 0.50)]
    pq.write_table(pa.table({
        'l_orderkey': pa.array([r[0] for r in rows], pa.int64()),
        'l_partkey': pa.array([r[1] for r in rows], pa.int64()),
        'l_suppkey': pa.array([r[2] for r in rows], pa.int64()),
        'l_linenumber': pa.array([1, 2, 1], pa.int32()),
        'l_quantity': pa.array([r[3] for r in rows]),
        'l_extendedprice': pa.array([r[4] for r in rows]),
        'l_discount': pa.array([r[5] for r in rows]),
        'l_tax': pa.array([0.0] * 3),
        'l_returnflag': pa.array(['A'] * 3),
        'l_linestatus': pa.array(['F'] * 3),
        'l_shipdate': pa.array([dt.datetime(1997, 1, 1)] * 3,
                               pa.timestamp('us'))}),
        str(tmp_path / 'lineitem.parquet'))


def test_revenue_by_nation_planted(ray_session, tmp_path):
    """Two-hop star join attributes revenue to the CUSTOMER nation
    with exact integer cents; counts per nation exact."""
    from webscraping_ray.pipelines.relational import revenue_by_nation

    _write_star(tmp_path)
    out = (revenue_by_nation(str(tmp_path)).to_pandas()
           .set_index('n_name'))
    # nation AA (cust 10, order 100): 100*0.9 + 200*1.0 = 290
    assert out.loc['AA'].to_dict() == {'r_name': 'EAST',
                                       'revenue': 290.0, 'n_items': 2}
    # nation BB (cust 11, order 101): 50*0.5 = 25
    assert out.loc['BB'].to_dict() == {'r_name': 'WEST',
                                       'revenue': 25.0, 'n_items': 1}


def test_brand_volume_planted(ray_session, tmp_path):
    """Broadcast partkey→brand map; qty int-exact, revenue cents."""
    from webscraping_ray.pipelines.relational import brand_volume

    _write_star(tmp_path)
    out = brand_volume(str(tmp_path)).to_pandas().set_index('p_brand')
    assert out.loc['B1'].to_dict() == {'n_items': 2, 'sum_qty': 3,
                                       'revenue': 90.0 + 25.0}
    assert out.loc['B2'].to_dict() == {'n_items': 1, 'sum_qty': 3,
                                       'revenue': 200.0}


def test_supplier_nation_revenue_planted(ray_session, tmp_path):
    """Supplier-nation attribution with distinct-supplier counts."""
    from webscraping_ray.pipelines.relational import supplier_nation_revenue

    _write_star(tmp_path)
    out = (supplier_nation_revenue(str(tmp_path)).to_pandas()
           .set_index('n_name'))
    assert out.loc['AA'].to_dict() == {'n_suppliers': 1,
                                       'revenue': 115.0}
    assert out.loc['BB'].to_dict() == {'n_suppliers': 1,
                                       'revenue': 200.0}


def test_bm25_search_planted(ray_session, tmp_path):
    """tf/dl/df/N hand-checkable: doc 0 matches two terms twice, doc 1
    one term once, doc 2 none; scores match an independent in-test
    BM25 computation and order (score desc, doc_id asc)."""
    import math

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import bm25_search

    texts = ['hash join order hash',        # dl 4, tf hash=2 join=1 order=1
             'hash aa bb cc dd',            # dl 5, tf hash=1
             'nothing relevant here at all',
             'join']                        # dl 1, tf join=1
    t = pa.table({'doc_id': pa.array(range(4), pa.int64()),
                  'text': pa.array(texts, pa.string()),
                  'lang': pa.array(['en'] * 4),
                  'source': pa.array(['s'] * 4),
                  'n_chars': pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / 'documents.parquet'))

    out = bm25_search(str(tmp_path)).to_pandas()
    n, avgdl, k1, b = 4, (4 + 5 + 5 + 1) / 4.0, 1.2, 0.75

    def s(tf, dl, df):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return idf * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / avgdl))

    exp0 = s(2, 4, 2) + s(1, 4, 2) + s(1, 4, 1)   # hash + join + order
    exp1 = s(1, 5, 2)
    exp3 = s(1, 1, 2)
    assert list(out['doc_id']) == [0, 3, 1]       # doc 2 never scored
    assert list(out['rk']) == [1, 2, 3]
    assert out['score'].tolist() == pytest.approx(
        [round(exp0, 6), round(exp3, 6), round(exp1, 6)], abs=1e-6)


def test_retention_cohorts_planted(ray_session, tmp_path):
    """Cohort = week of first event; offsets count Monday weeks; user
    counts merge across the per-user folds."""
    import datetime as dt

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import retention_cohorts

    # 2024-01-01 is a Monday.  u1: weeks 0 and 2; u2: week 0 only
    # (two events same week count once); u3 cohorts one week later.
    rows = [(1, dt.datetime(2024, 1, 2)), (1, dt.datetime(2024, 1, 16)),
            (2, dt.datetime(2024, 1, 3)), (2, dt.datetime(2024, 1, 4)),
            (3, dt.datetime(2024, 1, 9))]
    t = pa.table({'event_id': pa.array(range(len(rows)), pa.int64()),
                  'ts': pa.array([r[1] for r in rows], pa.timestamp('us')),
                  'user_id': pa.array([r[0] for r in rows], pa.int64()),
                  'event_type': pa.array(['view'] * len(rows)),
                  'value': pa.array([1.0] * len(rows)),
                  'props': pa.array([''] * len(rows))})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (retention_cohorts(str(tmp_path)).to_pandas()
           .sort_values(['cohort_week', 'week_offset'])
           .reset_index(drop=True))
    got = list(out.itertuples(index=False, name=None))
    assert got == [('2024-01-01', 0, 2),   # u1 + u2 active cohort week
                   ('2024-01-01', 2, 1),   # u1 back in week 2
                   ('2024-01-08', 0, 1)]   # u3's own cohort


def test_event_transitions_planted(ray_session, tmp_path):
    """Pairs follow (ts, event_id) order within user — equal ts breaks
    by event_id; no pairs cross users; counts merge."""
    import datetime as dt

    import pyarrow.parquet as pq

    from webscraping_ray.pipelines.relational import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    # u1: a(t0,id0) b(t0,id1 — ts tie, id orders it) a(t0+1h)
    # u2: b b  -> (b,b)
    rows = [(0, t0, 1, 'a'), (1, t0, 1, 'b'),
            (2, t0 + dt.timedelta(hours=1), 1, 'a'),
            (3, t0, 2, 'b'), (4, t0 + dt.timedelta(hours=1), 2, 'b')]
    t = pa.table({'event_id': pa.array([r[0] for r in rows], pa.int64()),
                  'ts': pa.array([r[1] for r in rows], pa.timestamp('us')),
                  'user_id': pa.array([r[2] for r in rows], pa.int64()),
                  'event_type': pa.array([r[3] for r in rows]),
                  'value': pa.array([1.0] * len(rows)),
                  'props': pa.array([''] * len(rows))})
    pq.write_table(t, str(tmp_path / 'events.parquet'))

    out = (event_transitions(str(tmp_path)).to_pandas()
           .sort_values(['from_type', 'to_type']).reset_index(drop=True))
    got = list(out.itertuples(index=False, name=None))
    assert got == [('a', 'b', 1), ('b', 'a', 1), ('b', 'b', 1)]
