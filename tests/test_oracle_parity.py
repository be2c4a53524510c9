"""Locks the Python↔DuckDB contracts behind the SQL oracles of the
approximate/heuristic family: the token/fingerprint hashes must be
bit-identical between the Ray kernels and the SQL the driver runs."""

import duckdb
import pytest

from webscraping_ray.stages.dedup import SimHash, md5_hash64, shingles
from webscraping_ray.stages.textstats import Fingerprint, LangId

SAMPLES = [
    '',
    'a',
    'the quick brown fox jumps over the lazy dog',
    'the the the und und la la il est',
    'Der Hund ist nicht ein Tier, und die Katze auch nicht.',
    'word ' * 50,
    'x' * 7,          # < k for the gram hash
    'x' * 8,
    'punctuation, everywhere! (and numbers 123)',
]


@pytest.fixture(scope='module')
def con():
    return duckdb.connect()


def test_md5_hash64_matches_duckdb(con):
    for s in ['the', 'und', 'für', 'hello world', '']:
        got = con.sql("SELECT md5_number_lower(?)", params=[s]).fetchone()[0]
        want = md5_hash64(s)
        assert got - (1 << 64 if got >= 1 << 63 else 0) == want, s


def test_simhash_matches_sql(con):
    import __ray_entry__ as E

    con.sql("CREATE OR REPLACE TABLE t AS SELECT unnest(range(%d)) AS doc_id,"
            " unnest(?) AS text" % len(SAMPLES), params=[SAMPLES])
    sql = 'WITH %s SELECT doc_id, simhash FROM fp ORDER BY doc_id' % \
        E._simhash_cte('t')
    got = dict(con.sql(sql).fetchall())
    for i, s in enumerate(SAMPLES):
        assert got[i] == SimHash.fingerprint(s), (i, s)


def test_fingerprint_matches_sql(con):
    import __ray_entry__ as E

    con.sql("CREATE OR REPLACE TABLE documents AS SELECT "
            "unnest(range(%d)) AS doc_id, unnest(?) AS text"
            % len(SAMPLES), params=[SAMPLES])
    got = {r[0]: (r[1], r[2])
           for r in con.sql(E._fingerprints_sql()).fetchall()}
    fp = Fingerprint()
    for i, s in enumerate(SAMPLES):
        assert got[i] == (fp.doc_hash(s), fp.winnow_min(s)), (i, s)
    con.sql('DROP TABLE documents')


def test_langid_matches_sql(con):
    import __ray_entry__ as E

    con.sql("CREATE OR REPLACE TABLE documents AS SELECT "
            "unnest(range(%d)) AS doc_id, unnest(?) AS text"
            % len(SAMPLES), params=[SAMPLES])
    got = dict(con.sql(E._langid_sql()).fetchall())
    lid = LangId()
    for i, s in enumerate(SAMPLES):
        assert got[i] == lid.predict(s), (i, s)
    con.sql('DROP TABLE documents')


def test_shingle_jaccard_sql_matches_kernel(con):
    """The shared exact-Jaccard CTE (minhash_dups / ngram_jaccard_dups /
    clean_corpus_neardup oracles) equals the Python jaccard kernel on
    handcrafted near-dup docs, including the <3-token and empty edges."""
    import __ray_entry__ as E
    from webscraping_ray.stages.dedup import jaccard

    docs = [
        'alpha beta gamma delta epsilon zeta eta theta',
        'alpha beta gamma delta epsilon zeta eta iota',   # near-dup of 0
        'completely different words entirely here now',
        'two tokens',                                     # < 3 tokens
        'two tokens',                                     # dup of 3
        '',                                               # empty
        '',                                               # empty pair
    ]
    con.sql("CREATE OR REPLACE TABLE documents AS SELECT "
            "unnest(range(%d)) AS doc_id, unnest(?) AS text"
            % len(docs), params=[docs])
    sql = ('WITH %s SELECT id_a, id_b, jaccard FROM pairs ORDER BY 1, 2'
           % E._shingle_jaccard_cte('documents', threshold='0.5'))
    got = [(a, b, j) for a, b, j in con.sql(sql).fetchall()]
    want = []
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            j = jaccard(docs[a], docs[b], 3)
            if j >= 0.5:
                want.append((a, b, j))
    assert got == want
    con.sql('DROP TABLE documents')


def test_ngram_guard_trips(ray_session, monkeypatch):
    """The quadratic baseline refuses corpus-scale inputs."""
    from webscraping_ray.pipelines import relational as R

    monkeypatch.setattr(R, 'NGRAM_BASELINE_MAX_DOCS', 10)
    with pytest.raises(ValueError, match='quadratic baseline'):
        R.ngram_jaccard_dups('/root/testdata/sf0.001')
