"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in webscraping_ray) calls ray.init/ray.shutdown.

``queries()`` maps SURVEY.md §2 operators onto the testdata tables;
``oracle_sql()`` provides the DuckDB-checkable equivalents — including
the approximate-algorithm family, whose oracles are the corresponding
EXACT computations (valid because each approximate path verifies its
candidates exactly and its recall is 1.0 by construction/measurement
at testdata scale):

- ``minhash_dups`` / ``ngram_jaccard_dups`` — exact word-3-shingle
  Jaccard pairs in SQL (shared-shingle blocking join, no UDFs).
- ``simhash_fingerprints`` / ``simhash_dups`` — SimHash recomputed in
  SQL (md5_number_lower token hashes + 64 per-bit weighted sums; the
  4×16-bit band bucketing has exact recall for hamming ≤ 3 by
  pigeonhole, so the dup list equals exact all-pairs hamming).
- ``langid`` / ``fingerprints`` — the deterministic heuristics
  recomputed in SQL (stopword argmax; Rabin-Karp polynomial hashes
  via HUGEINT list_reduce).
- ``knn_ivf_query0`` / ``embedding_dups_ivf`` — the exact brute-force
  SQL (IVF recall 1.0 on testdata is asserted in pytest; the oracle
  check enforces it stays exact at driver scale).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = '/root/testdata/sf0.001'

_MERSENNE = 2305843009213693951      # 2^61 - 1 (Fingerprint.MOD)
_GRAM_MOD = 2147483647               # 2^31 - 1 (Fingerprint.GRAM_MOD)
_FP_B = 1000003                      # Fingerprint.B


def _shingle_jaccard_cte(source: str, threshold: str = '0.8') -> str:
    """CTE fragment computing exact word-3-shingle Jaccard pairs
    (``pairs``: id_a < id_b, jaccard >= threshold) over ``source``
    (doc_id, text).  Mirrors stages/dedup.py shingles()+jaccard():
    lowercased \\w+ tokens, 3-gram shingle SET (docs with <3 tokens
    contribute their whole token string; empty docs pair at 1.0)."""
    return f"""
      toks AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '\\w+') AS ts
               FROM {source}),
      sh AS (SELECT doc_id,
               CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
                    WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
                    ELSE list_distinct(list_transform(
                         range(1, len(ts) - 1),
                         i -> array_to_string(ts[i:i+2], ' '))) END AS shs
             FROM toks),
      ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
      sizes AS (SELECT doc_id, len(shs) AS n FROM sh),
      inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(count(*) AS BIGINT) AS i
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b,
               CAST(i AS DOUBLE) / (na.n + nb.n - i) AS jaccard
        FROM inter
        JOIN sizes na ON na.doc_id = id_a
        JOIN sizes nb ON nb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= {threshold}
        UNION ALL
        SELECT a.doc_id, b.doc_id, 1.0
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.shs) = 0 AND len(b.shs) = 0)
    """


def _simhash_cte(source: str = 'documents') -> str:
    """CTE fragment recomputing stages/dedup.py SimHash.fingerprint:
    term-frequency-weighted 64-bit majority over md5-lower-64 token
    hashes (``fp``: doc_id, simhash as signed int64; token-less docs
    fingerprint to 0)."""
    sums = ',\n               '.join(
        f"SUM(CASE WHEN (hw >> {b}) & 1 = 1 THEN c ELSE -c END) AS v{b}"
        for b in range(64))
    fp = '\n                 + '.join(
        f"CASE WHEN v{b} > 0 THEN CAST('{1 << b}' AS HUGEINT) "
        f"ELSE CAST(0 AS HUGEINT) END"
        for b in range(64))
    return f"""
      tk AS (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '\\w+')) AS w
             FROM {source}),
      cnt AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
              FROM tk GROUP BY 1, 2),
      hh AS (SELECT doc_id, md5_number_lower(w) AS hw, c FROM cnt),
      bits AS (SELECT doc_id,
               {sums}
               FROM hh GROUP BY doc_id),
      fp0 AS (SELECT doc_id,
                 ({fp}) AS ufp
              FROM bits),
      fp AS (SELECT d.doc_id,
                    CAST(COALESCE(
                      f.ufp - CASE WHEN f.ufp >=
                            CAST('9223372036854775808' AS HUGEINT)
                          THEN CAST('18446744073709551616' AS HUGEINT)
                          ELSE CAST(0 AS HUGEINT) END,
                      CAST(0 AS HUGEINT)) AS BIGINT) AS simhash
             FROM {source} d LEFT JOIN fp0 f ON d.doc_id = f.doc_id)
    """


def _langid_sql() -> str:
    """Recompute stages/textstats.py LangId: stopword-hit counts per
    language (with token multiplicity), first-alphabetical strict
    argmax, 'unk' when no language scores > 0."""
    from webscraping_ray.stages.textstats import _LANG_PROFILES

    langs = sorted(_LANG_PROFILES)          # de, en, es, fr, it

    def lst(lang):
        return ', '.join("'%s'" % w for w in sorted(_LANG_PROFILES[lang]))

    scores = ',\n             '.join(
        f"len(list_filter(ts, x -> list_contains([{lst(l)}], x))) AS s_{l}"
        for l in langs)
    # LangId.predict keeps the FIRST language (alphabetical iteration)
    # whose score strictly exceeds the running best — i.e. the
    # alphabetically-first argmax
    arms = []
    for i, l in enumerate(langs[:-1]):
        conds = ' AND '.join(f's_{l} >= s_{m}' for m in langs[i + 1:])
        arms.append(f"WHEN {conds} THEN '{l}'")
    arms.append(f"ELSE '{langs[-1]}'")
    case = '\n        '.join(arms)
    best0 = ', '.join(f's_{l}' for l in langs)
    return f"""
      WITH t AS (SELECT doc_id,
                        regexp_extract_all(lower(text), '\\w+') AS ts
                 FROM documents),
      s AS (SELECT doc_id,
             {scores}
            FROM t)
      SELECT doc_id, CASE
        WHEN greatest({best0}) = 0 THEN 'unk'
        {case} END AS pred_lang
      FROM s
    """


def _fingerprints_sql() -> str:
    """Recompute stages/textstats.py Fingerprint: whole-document
    Rabin-Karp polynomial hash over codepoints, plus the min 8-gram
    rolling hash (testdata text is pure ASCII, so codepoints equal the
    implementation's utf-8 bytes)."""
    whole = ("list_reduce(list_prepend(CAST(0 AS HUGEINT), vals), "
             f"(h, v) -> (h * {_FP_B} + v) % {_MERSENNE})")
    gram = ("list_reduce(list_prepend(CAST(0 AS BIGINT), vals[i:i+7]), "
            f"(h, v) -> (h * {_FP_B} + v) % {_GRAM_MOD})")
    return f"""
      WITH chars AS (
        SELECT doc_id,
               list_transform(regexp_extract_all(text, '(?s).'),
                              c -> unicode(c)) AS vals
        FROM documents)
      SELECT doc_id,
             CAST({whole} AS BIGINT) AS doc_hash,
             CAST(CASE WHEN len(vals) < 8 THEN {whole}
                  ELSE list_min(list_transform(range(1, len(vals) - 6),
                       i -> {gram}))
                  END AS BIGINT) AS min_gram_hash
      FROM chars
    """


def _redact_pii_sql() -> str:
    """Reconstruct the derived-page html by construction
    (sources/docs_pages.py doc_html — host h = doc_id % 8, local index
    k = doc_id // 8, children j_m = h + 8*(3k+m) < N for m = 1..3,
    which keeps j_m % 8 == h) and apply the SAME RE2 patterns as
    stages/redact.py via nested ``regexp_replace``."""
    from webscraping_ray.stages.redact import (
        OBF_EMAIL_SQL, PHONE_SQL, PLAIN_EMAIL_SQL)

    return f"""
      WITH nd AS (SELECT count(*) AS n FROM documents),
      pg AS (
        SELECT doc_id,
          '<html><head><meta charset=utf-8><title>Doc ' || doc_id
          || '</title><meta name="description" content="Doc ' || doc_id
          || ' summary"></head><body><h1>Doc ' || doc_id || '</h1>'
          || '<!-- generated --><p>' || text || '</p>'
          || CASE WHEN doc_id % 3 = 0 THEN '<p>contact: user' || doc_id
                  || ' AT example DOT com</p>' ELSE '' END
          || CASE WHEN doc_id % 5 = 0 THEN '<p>call (555) 010-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || '</p>' ELSE '' END
          || CASE WHEN doc_id % 8 + 8 * (3 * (doc_id // 8) + 1)
                       < (SELECT n FROM nd)
                  THEN '<a href="/d/'
                       || (doc_id % 8 + 8 * (3 * (doc_id // 8) + 1))
                       || '#top">l0</a>' ELSE '' END
          || CASE WHEN doc_id % 8 + 8 * (3 * (doc_id // 8) + 2)
                       < (SELECT n FROM nd)
                  THEN '<a href="http://src' || doc_id % 8 || '.com/d/'
                       || (doc_id % 8 + 8 * (3 * (doc_id // 8) + 2))
                       || '">l1</a>' ELSE '' END
          || CASE WHEN doc_id % 8 + 8 * (3 * (doc_id // 8) + 3)
                       < (SELECT n FROM nd)
                  THEN '<a href="/d/'
                       || (doc_id % 8 + 8 * (3 * (doc_id // 8) + 3))
                       || '">l2</a>' ELSE '' END
          || '<a href="/q/' || doc_id || '?a=1&amp;b=2">query</a>'
          || '<a href="http://src' || (doc_id + 1) % 8 || '.com/x/'
          || doc_id || '">cross</a>'
          || '<a href="/img/' || doc_id || '.png">media</a>'
          || '</body></html>' AS html
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(html,
            '{OBF_EMAIL_SQL}', '<EMAIL>', 'g'),
            '{PLAIN_EMAIL_SQL}', '<EMAIL>', 'g'),
            '{PHONE_SQL}', '<PHONE>', 'g') AS html_redacted,
        CAST(len(regexp_extract_all(html, '{OBF_EMAIL_SQL}'))
             + len(regexp_extract_all(html, '{PLAIN_EMAIL_SQL}'))
             AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(html, '{PHONE_SQL}'))
             AS BIGINT) AS n_phones
      FROM pg
    """


def _pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    """Damped PageRank over the by-construction link graph, unrolled
    ``iters`` power-iteration levels.  Bit-exact float parity with the
    Ray side: contribution sums are ascending-sorted LEFT folds
    (``list_reduce(list_sort(list(x)), (a,b) -> a+b)`` mirrors
    relational._fold_sorted), and the damping constants are emitted
    with full repr so ``1.0 - 0.85`` rounds identically."""
    base = repr(1.0 - damping)   # 0.15000000000000002 — match Python
    d = repr(damping)
    levels = []
    for i in range(1, iters + 1):
        p = f'r{i - 1}'
        levels.append(f"""
            f{i} AS (SELECT e.dst AS url,
                       list_reduce(list_sort(list(p.r / e.outdeg)),
                                   (a, b) -> a + b) AS s
                     FROM e JOIN {p} p ON e.src = p.url GROUP BY e.dst),
            r{i} AS (SELECT nodes.url,
                       {base} / (SELECT n FROM nn)
                       + {d} * COALESCE(f{i}.s, 0.0) AS r
                     FROM nodes LEFT JOIN f{i} USING (url))""")
    return f"""
      WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                 FROM documents),
      ed AS (
        SELECT 'http://src' || h || '.com/d/'
                 || (h + 8 * ((k - 1) // 3)) AS src,
               'http://src' || h || '.com/d/' || doc_id AS dst
        FROM d WHERE k >= 1
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || h || '.com/q/' || doc_id || '?a=1&b=2'
        FROM d
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || (h + 1) % 8 || '.com/x/' || doc_id
        FROM d
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || h || '.com/img/' || doc_id || '.png'
        FROM d),
      od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
             FROM ed GROUP BY src),
      e AS (SELECT ed.src, ed.dst, od.outdeg FROM ed JOIN od USING (src)),
      nodes AS (SELECT DISTINCT url FROM
                (SELECT src AS url FROM ed UNION ALL SELECT dst FROM ed)),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      r0 AS (SELECT url, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
      {','.join(levels)}
      SELECT url, round(r, 6) AS pagerank FROM r{iters}
    """


def _host_pagerank_sql(iters: int = 3, damping: float = 0.85) -> str:
    """Domain-level PageRank over the by-construction DISTINCT host
    adjacency (each present host h links to itself — every doc emits
    same-host q/img links — and to host (h+1) % 8).  Same
    ascending-sorted contribution folds as :func:`_pagerank_sql` for
    bit-exact float parity with relational._pagerank_fold."""
    base = repr(1.0 - damping)
    d = repr(damping)
    levels = []
    for i in range(1, iters + 1):
        p = f'r{i - 1}'
        levels.append(f"""
            f{i} AS (SELECT e.dst AS host,
                       list_reduce(list_sort(list(p.r / e.outdeg)),
                                   (a, b) -> a + b) AS s
                     FROM e JOIN {p} p ON e.src = p.host GROUP BY e.dst),
            r{i} AS (SELECT nodes.host,
                       {base} / (SELECT n FROM nn)
                       + {d} * COALESCE(f{i}.s, 0.0) AS r
                     FROM nodes LEFT JOIN f{i} USING (host))""")
    return f"""
      WITH hed AS (
        SELECT DISTINCT 'src' || (doc_id % 8) || '.com' AS src,
               'src' || (doc_id % 8) || '.com' AS dst
        FROM documents
        UNION
        SELECT DISTINCT 'src' || (doc_id % 8) || '.com',
               'src' || ((doc_id % 8) + 1) % 8 || '.com'
        FROM documents),
      od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
             FROM hed GROUP BY src),
      e AS (SELECT hed.src, hed.dst, od.outdeg
            FROM hed JOIN od USING (src)),
      nodes AS (SELECT DISTINCT host FROM
                (SELECT src AS host FROM hed
                 UNION ALL SELECT dst FROM hed)),
      nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
      {','.join(levels)}
      SELECT host, round(r, 6) AS pagerank FROM r{iters}
    """


def _hits_sql(iters: int = 3) -> str:
    """HITS over the same by-construction link graph as
    ``_pagerank_sql``, unrolled ``iters`` unnormalized rounds with one
    final sum-normalization per vector (mirrors relational.hits).
    Bit-exact float parity: every per-node sum and both normalizers
    are ascending-sorted LEFT folds.  Lambda params are (x, y) and the
    score columns hv/av so nothing shadows inside list_reduce."""
    fold = "list_reduce(list_sort(list({v})), (x, y) -> x + y)"
    levels = []
    for i in range(1, iters + 1):
        p = f'h{i - 1}f' if i > 1 else 'h0'
        levels.append(f"""
            a{i} AS (SELECT ed.dst AS url,
                        {fold.format(v='p.hv')} AS s
                     FROM ed JOIN {p} p ON ed.src = p.url
                     GROUP BY ed.dst),
            a{i}f AS (SELECT nodes.url, COALESCE(a{i}.s, 0.0) AS av
                      FROM nodes LEFT JOIN a{i} USING (url)),
            h{i} AS (SELECT ed.src AS url,
                        {fold.format(v='p.av')} AS s
                     FROM ed JOIN a{i}f p ON ed.dst = p.url
                     GROUP BY ed.src),
            h{i}f AS (SELECT nodes.url, COALESCE(h{i}.s, 0.0) AS hv
                      FROM nodes LEFT JOIN h{i} USING (url))""")
    return f"""
      WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                 FROM documents),
      ed AS (
        SELECT 'http://src' || h || '.com/d/'
                 || (h + 8 * ((k - 1) // 3)) AS src,
               'http://src' || h || '.com/d/' || doc_id AS dst
        FROM d WHERE k >= 1
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || h || '.com/q/' || doc_id || '?a=1&b=2'
        FROM d
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || (h + 1) % 8 || '.com/x/' || doc_id
        FROM d
        UNION ALL
        SELECT 'http://src' || h || '.com/d/' || doc_id,
               'http://src' || h || '.com/img/' || doc_id || '.png'
        FROM d),
      nodes AS (SELECT DISTINCT url FROM
                (SELECT src AS url FROM ed UNION ALL SELECT dst FROM ed)),
      h0 AS (SELECT url, CAST(1.0 AS DOUBLE) AS hv FROM nodes),
      {','.join(levels)},
      nrm AS (SELECT {fold.format(v='hv')} AS nh FROM h{iters}f),
      nrma AS (SELECT {fold.format(v='av')} AS na FROM a{iters}f)
      SELECT h.url,
             round(h.hv / (SELECT nh FROM nrm), 6) AS hub,
             round(a.av / (SELECT na FROM nrma), 6) AS auth
      FROM h{iters}f h JOIN a{iters}f a USING (url)
    """


#: the flagship BFS crawl over the docs-derived web: the
#: unique-parent B-ary link graph makes depth, visit order, status and
#: emitted-link counts a recursive CTE (chain visits) plus one
#: deterministic 404 /q/ visit per non-leaf page.  Visit order: wave
#: by wave, parents in wave order, emissions in document order
#: (children m=1..3 then the /q/ link) — (depth, parent host, parent
#: local index, link idx) is exactly that order.  Module-level so the
#: crawl-composition oracles can wrap it as a subquery.
_CRAWL_BFS_SQL = """
            WITH RECURSIVE bfs AS (
              SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k,
                     0 AS depth, doc_id % 8 AS ph,
                     CAST(0 AS BIGINT) AS pk, 0 AS idx
              FROM documents WHERE doc_id < 8
              UNION ALL
              SELECT d.doc_id, d.doc_id % 8, d.doc_id // 8, b.depth + 1,
                     b.h, b.k, m.m - 1
              FROM bfs b
              JOIN (VALUES (1), (2), (3)) AS m(m) ON true
              JOIN documents d ON d.doc_id = b.h + 8 * (3 * b.k + m.m)
              WHERE b.depth < 6
            ), nd AS (SELECT count(*) AS n FROM documents),
            allv AS (
              SELECT 'http://src' || h || '.com/d/' || doc_id AS url,
                     depth, 200 AS status,
                     CASE WHEN depth < 6 THEN
                       LEAST(3, GREATEST(0,
                         CAST(floor(((SELECT n FROM nd) - 1
                              - (3*doc_id - 2*h)) / 8.0) AS BIGINT))) + 1
                     ELSE 0 END AS n_links,
                     ph, pk, idx
              FROM bfs
              UNION ALL
              SELECT 'http://src' || h || '.com/q/' || doc_id
                       || '?a=1&b=2',
                     depth + 1, 404, 0, h, k, 3
              FROM bfs WHERE depth < 6
            )
            SELECT url, CAST(depth AS INT) AS depth,
                   CAST(row_number() OVER (ORDER BY depth, ph, pk, idx)
                        - 1 AS BIGINT) AS visit_order,
                   CAST(status AS INT) AS status,
                   CAST(n_links AS BIGINT) AS n_links
            FROM allv
"""


def _robots_filter_sql() -> str:
    """By-construction robots rules (even hosts disallow /q/ and
    /img/) applied to the distinct extracted-link set — the SQL mirror
    of the real urllib.robotparser evaluation in relational.robots_filter."""
    return """
      WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                 FROM documents),
      ed AS (
        SELECT 'http://src' || h || '.com/d/' || doc_id AS dst
        FROM d WHERE k >= 1
        UNION ALL
        SELECT 'http://src' || h || '.com/q/' || doc_id || '?a=1&b=2'
        FROM d
        UNION ALL
        SELECT 'http://src' || (h + 1) % 8 || '.com/x/' || doc_id
        FROM d
        UNION ALL
        SELECT 'http://src' || h || '.com/img/' || doc_id || '.png'
        FROM d),
      links AS (SELECT DISTINCT dst AS url FROM ed)
      SELECT url,
             CAST(NOT (
               CAST(regexp_extract(url, 'src(\\d)', 1) AS INT) % 2 = 0
               AND (regexp_extract(url, 'https?://[^/]+(/.*)$', 1)
                      LIKE '/q/%'
                    OR regexp_extract(url, 'https?://[^/]+(/.*)$', 1)
                      LIKE '/img/%')) AS BIGINT) AS allowed
      FROM links
    """


def _kmeans_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Chained-CTE mirror of relational.kmeans_clusters: quantized
    int64 vectors (floor(x·1000+0.5)), init = k lowest vec_ids,
    ``iters`` assign+update rounds (half-up integer centroids, empty
    cluster keeps its centroid, ties to lowest cl), final assignment.
    All distance comparisons are exact integer arithmetic, so both
    engines assign identically."""
    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
          SELECT vec_id, cl FROM (
            SELECT q.vec_id, c.cl,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     list_sum(list_transform(list_zip(q.qv, c.cv),
                       p -> (p[1] - p[2]) * (p[1] - p[2]))), c.cl) AS rk
            FROM q CROSS JOIN {cents} c) WHERE rk = 1
        )"""

    def update(name: str, asn: str, prev: str) -> str:
        return f"""{name}_s AS (
          SELECT a.cl, r.i,
                 CAST(floor(sum(q.qv[r.i]) / CAST(count(*) AS DOUBLE)
                      + 0.5) AS BIGINT) AS v
          FROM {asn} a JOIN q USING (vec_id)
          CROSS JOIN range(1, {dim + 1}) r(i)
          GROUP BY a.cl, r.i
        ),
        {name} AS (
          SELECT p.cl, coalesce(n.cv, p.cv) AS cv
          FROM {prev} p LEFT JOIN
            (SELECT cl, list(v ORDER BY i) AS cv
             FROM {name}_s GROUP BY cl) n USING (cl)
        )"""

    parts = [f"""q AS (
      SELECT vec_id, list_transform(embedding,
        x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
             qv AS cv
      FROM q ORDER BY vec_id LIMIT {k})"""]
    prev = 'c0'
    for it in range(1, iters + 1):
        parts.append(assign(f'a{it}', prev))
        parts.append(update(f'c{it}', f'a{it}', prev))
        prev = f'c{it}'
    parts.append(assign('af', prev))
    return ('WITH ' + ',\n'.join(parts)
            + '\nSELECT vec_id, cl AS cluster FROM af')


def entry() -> Any:
    """Flagship: BFS crawl of the documents-derived web at sf0.001."""
    from webscraping_ray.pipelines import relational as R

    return R.crawl_documents(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from webscraping_ray.pipelines import relational as R

    return {
        # ------------------------------------------------------------------
        # Ordering contract: the driver samples a PREFIX of this dict, so
        # entries are ordered flagship-first, then queries with NO green
        # driver CORRECTNESS row in any round (r1-r4), then stale-evidence
        # (r2/r3-green, not re-sampled since), then r4-green last.
        # Refreshed for round 5 against CORRECTNESS_r04.json: the 2+48
        # below are exactly a 50-query driver sample.
        # ------------------------------------------------------------------
        # flagship crawl pair (must never ship unchecked)
        'crawl_bfs': R.crawl_documents,
        'crawl_contacts': R.crawl_contacts,
        # -- never driver-proven (48) --
        'mirror_sources': R.mirror_sources,
        'outdeg_hist': R.outdeg_hist,
        'doc_containment': R.doc_containment,
        'source_lang_mix': R.source_lang_mix,
        'url_template_mining': R.url_template_mining,
        'reading_ease': R.reading_ease,
        'events_funnel': R.events_funnel,
        'hard_negatives': R.hard_negatives,
        'crawl_clean_corpus': R.crawl_clean_corpus,
        'clean_corpus_neardup': R.clean_corpus_neardup,
        'clean_corpus_decontaminated': R.clean_corpus_decontaminated,
        'clean_corpus_clustered': R.clean_corpus_clustered,
        'clean_corpus_quantile': R.clean_corpus_quantile,
        'events_asof_match': R.events_asof_match,
        'sample_stratified': R.sample_stratified,
        'tfidf_top_terms': R.tfidf_top_terms,
        'shuffle_assign': R.shuffle_assign,
        'unigram_logprob': R.unigram_logprob,
        'bigram_logprob': R.bigram_logprob,
        'pack_sequences': R.pack_sequences,
        'mixture_weights': R.mixture_weights,
        'sample_mixture': R.sample_mixture,
        'ngram_jaccard_dups': R.ngram_jaccard_dups,
        'simhash_dups': R.simhash_dups,
        'knn_ivf_recall': R.knn_ivf_recall,
        'hll_user_counts': R.hll_user_counts,
        'heavy_hitter_tokens': R.heavy_hitter_tokens,
        'kll_token_quantiles': R.kll_token_quantiles,
        'pagerank_ds': R.pagerank_ds,
        'hits_ds': R.hits_ds,
        'inlink_anchors_ds': R.inlink_anchors_ds,
        'perplexity_buckets': R.perplexity_buckets,
        'source_quality_filter': R.source_quality_filter,
        'cdx_index': R.cdx_index,
        'line_dedup': R.line_dedup,
        'dedup_incremental': R.dedup_incremental,
        'knn_join': R.knn_join,
        'knn_join_ivf': R.knn_join_ivf,
        'recrawl_schedule': R.recrawl_schedule,
        'dsir_weights': R.dsir_weights,
        'nb_classify': R.nb_classify,
        'budget_select': R.budget_select,
        'host_boilerplate': R.host_boilerplate,
        'semdedup_recall': R.semdedup_recall,
        'inverted_index': R.inverted_index,
        'crawl_budget_alloc': R.crawl_budget_alloc,
        'centroid_classify': R.centroid_classify,
        'snapshot_diff': R.snapshot_diff,
        # -- driver-green in r2/r3 (stale evidence) --
        'clean_corpus': R.clean_corpus,
        'agg_counters': R.agg_counters,
        'count_by_lang': R.count_by_lang,
        'events_window': R.events_window,
        'events_sliding_window': R.events_sliding_window,
        'events_sessions': R.events_sessions,
        'distinct_event_types': R.distinct_event_types,
        'top_orders_per_customer': R.top_orders_per_customer,
        'top_ngrams': R.top_ngrams,
        'topk_priority': R.topk_priority,
        'priority_scores': R.priority_scores,
        'dedup_first': R.dedup_first,
        'dedup_exact_text': R.dedup_exact_text,
        'user_event_counts': R.user_event_counts,
        'page_links': R.page_links,
        'join_orders_customers': R.join_orders_customers,
        'join_lineitem_orders': R.join_lineitem_orders,
        'semi_join_customers': R.semi_join_customers,
        'anti_join_customers': R.anti_join_customers,
        'asof_latest_event': R.asof_latest_event,
        'events_band_join': R.events_band_join,
        'normalize_text': R.normalize_text,
        'token_count': R.token_count,
        'quality': R.quality,
        'url_parse': R.url_parse,
        'xpath_titles': R.xpath_titles,
        'extract_contacts': R.extract_contacts,
        'excerpts': R.excerpts,
        'media_meta': R.media_meta,
        'knn_query0': R.knn_query0,
        'knn_ivf_query0': R.knn_ivf_query0,
        'minhash_dups': R.minhash_dups,
        'simhash_fingerprints': R.simhash_fingerprints,
        'embedding_dups': R.embedding_dups,
        'embedding_dups_ivf': R.embedding_dups_ivf,
        'langid': R.langid,
        'fingerprints': R.fingerprints,
        'decontaminate': R.decontaminate,
        'repetition': R.repetition,
        'sample_hash': R.sample_hash,
        'token_quantiles': R.token_quantiles,
        'dup_clusters': R.dup_clusters,
        'embedding_dup_clusters': R.embedding_dup_clusters,
        'repeated_spans': R.repeated_spans,
        'remove_repeated_spans': R.remove_repeated_spans,
        'redact_pii': R.redact_pii,
        'inlink_anchors': R.inlink_anchors,
        'host_graph': R.host_graph,
        'pagerank': R.pagerank,
        'hits': R.hits,
        'robots_filter': R.robots_filter,
        # -- driver-green in r4 (freshest evidence) --
        'monthly_revenue': R.monthly_revenue,
        'part_pairs': R.part_pairs,
        'session_durations': R.session_durations,
        'dup_jaccard_hist': R.dup_jaccard_hist,
        'dau_stickiness': R.dau_stickiness,
        'vocab_growth': R.vocab_growth,
        'event_trigrams': R.event_trigrams,
        'ship_delay_dist': R.ship_delay_dist,
        'hourly_profile': R.hourly_profile,
        'percentile_rank_docs': R.percentile_rank_docs,
        'host_pagerank': R.host_pagerank,
        'winnow_fingerprints': R.winnow_fingerprints,
        'events_anomaly': R.events_anomaly,
        'rfm_scores': R.rfm_scores,
        'forecast_revenue': R.forecast_revenue,
        'promo_revenue_share': R.promo_revenue_share,
        'top_volume_orders': R.top_volume_orders,
        'customer_order_dist': R.customer_order_dist,
        'bm25_search': R.bm25_search,
        'retention_cohorts': R.retention_cohorts,
        'event_transitions': R.event_transitions,
        'revenue_by_nation': R.revenue_by_nation,
        'brand_volume': R.brand_volume,
        'supplier_nation_revenue': R.supplier_nation_revenue,
        'pricing_summary': R.pricing_summary,
        'kmeans_clusters': R.kmeans_clusters,
        'neardup_rate_by_source': R.neardup_rate_by_source,
        'anchor_texts': R.anchor_texts,
        'crawl_status_by_host': R.crawl_status_by_host,
        'weekly_top_events': R.weekly_top_events,
        'rollup_source_lang': R.rollup_source_lang,
        'unigram_entropy': R.unigram_entropy,
        'events_daily_change': R.events_daily_change,
        'feature_correlations': R.feature_correlations,
        'dup_keep_best': R.dup_keep_best,
        'chunk_documents': R.chunk_documents,
        'gopher_filter': R.gopher_filter,
        'bpe_pair_counts': R.bpe_pair_counts,
        'oov_rate': R.oov_rate,
        'wat_links': R.wat_links,
        'train_test_split': R.train_test_split,
        'reservoir_sample': R.reservoir_sample,
        'crawl_depth_hist': R.crawl_depth_hist,
        'events_user_running': R.events_user_running,
        'pivot_user_events': R.pivot_user_events,
        'pmi_collocations': R.pmi_collocations,
        'lexical_diversity': R.lexical_diversity,
        'zipf_slope': R.zipf_slope,
    }


def oracle_sql() -> dict[str, str]:
    return {
        'agg_counters': """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type
        """,
        'count_by_lang': """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        'pivot_user_events': """
            SELECT user_id,
              CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_click,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_error,
              CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_purchase,
              CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_signup,
              CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_view,
              CAST(SUM(CASE WHEN event_type NOT IN
                   ('click','error','purchase','signup','view')
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_other
            FROM events GROUP BY user_id
        """,
        'pmi_collocations': r"""
            -- top-100 bigram collocations by PMI, min bigram count 5;
            -- ordering on the 1e-6-snapped PMI so ties resolve
            -- identically in both engines
            WITH tk AS (
              SELECT regexp_extract_all(lower(text), '\w+') AS ts
              FROM documents
            ),
            uni AS (SELECT unnest(ts) AS w FROM tk),
            uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                   FROM uni GROUP BY w),
            nu AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM uni),
            bg AS (
              SELECT unnest(list_transform(range(1, len(ts)),
                       i -> {'w1': ts[i], 'w2': ts[i+1]}),
                     recursive := true)
              FROM tk WHERE len(ts) >= 2
            ),
            nb AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bg),
            bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
                   FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
            SELECT b.w1, b.w2, b.cnt,
                   round(ln((b.cnt / (SELECT n FROM nb)) /
                            ((u1.c / (SELECT n FROM nu)) *
                             (u2.c / (SELECT n FROM nu)))), 6) AS pmi
            FROM bc b
            JOIN uc u1 ON b.w1 = u1.w
            JOIN uc u2 ON b.w2 = u2.w
            ORDER BY pmi DESC, b.w1, b.w2 LIMIT 100
        """,
        'lexical_diversity': r"""
            -- per-doc type-token ratio + hapax-legomena ratio; empty
            -- docs emit (0, 0, 0.0, 0.0) by contract
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            per_w AS (SELECT doc_id, w, count(*) AS c
                      FROM tk GROUP BY doc_id, w),
            per AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_types,
                     CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hapax
              FROM per_w GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   coalesce(p.n_types, 0) AS n_types,
                   round(coalesce(CAST(p.n_types AS DOUBLE) / p.n_tokens,
                                  0.0), 6) AS ttr,
                   round(coalesce(CAST(p.n_hapax AS DOUBLE) / p.n_types,
                                  0.0), 6) AS hapax_ratio
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """,
        'zipf_slope': r"""
            -- OLS slope of ln(count) on ln(rank) over the top-1000
            -- tokens (rank ties broken by token asc); slope formula
            -- mirrors the engine's mean-based OLS exactly
            WITH tk AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            uc AS (SELECT w, count(*) AS c FROM tk GROUP BY w),
            ranked AS (
              SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r
              FROM uc ORDER BY c DESC, w LIMIT 1000
            )
            SELECT round((avg(ln(r) * ln(c)) - avg(ln(r)) * avg(ln(c))) /
                         (avg(ln(r) * ln(r)) - avg(ln(r)) ^ 2), 6)
                     AS slope,
                   CAST(count(*) AS BIGINT) AS n_terms
            FROM ranked
        """,
        'mirror_sources': """
            -- source pairs sharing >= 2 distinct content lines (the
            -- line_dedup 10-word-window segmentation, empty exempt)
            WITH toks AS (
              SELECT source, string_split(text, ' ') AS w FROM documents
            ),
            exp AS (
              SELECT source, w,
                     unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)))
                       AS line_no
              FROM toks
            ),
            lns AS (
              SELECT source,
                     array_to_string(w[(line_no*10 + 1):(line_no*10 + 10)],
                                     ' ') AS line
              FROM exp
            ),
            d AS (SELECT DISTINCT md5(line) AS h, source
                  FROM lns WHERE line <> '')
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        'doc_containment': r"""
            -- asymmetric containment near-dup over distinct word-3-
            -- shingle sets; report pairs where either direction >= 0.8
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, unnest(
                CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                     ELSE list_transform(range(1, len(w) - 1),
                            i -> array_to_string(w[i:i+2], ' '))
                END) AS s
              FROM toks WHERE len(w) >= 1
            ),
            ns AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            pcnt AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(count(*) AS BIGINT) AS n_common
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT p.doc_a, p.doc_b, p.n_common,
                   round(CAST(p.n_common AS DOUBLE) / na.n, 6)
                     AS cont_a_in_b,
                   round(CAST(p.n_common AS DOUBLE) / nb.n, 6)
                     AS cont_b_in_a
            FROM pcnt p
            JOIN ns na ON p.doc_a = na.doc_id
            JOIN ns nb ON p.doc_b = nb.doc_id
            WHERE greatest(CAST(p.n_common AS DOUBLE) / na.n,
                           CAST(p.n_common AS DOUBLE) / nb.n) >= 0.8
        """,
        'hard_negatives': """
            -- contrastive-pair mining: most-similar same-label and
            -- different-label neighbors per vector; id-only output
            -- (float32 list_cosine_similarity can't cross the hash
            -- compare — the knn_join contract), ties by neighbor id
            WITH pairs AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS nid,
                     a.label = b.label AS same,
                     list_cosine_similarity(a.embedding, b.embedding)
                       AS cosine
              FROM embeddings a
              JOIN embeddings b ON a.vec_id <> b.vec_id
            ),
            ranked AS (
              SELECT vec_id, nid, same,
                     row_number() OVER (
                       PARTITION BY vec_id, same
                       ORDER BY cosine DESC, nid) AS rk
              FROM pairs
            )
            SELECT e.vec_id,
                   coalesce(p.nid, -1) AS pos_id,
                   coalesce(n.nid, -1) AS neg_id
            FROM embeddings e
            LEFT JOIN ranked p
              ON e.vec_id = p.vec_id AND p.same AND p.rk = 1
            LEFT JOIN ranked n
              ON e.vec_id = n.vec_id AND NOT n.same AND n.rk = 1
        """,
        'events_funnel': """
            -- strict-order funnel: first view, first click strictly
            -- after it, first purchase strictly after that; ties at
            -- equal ts do not advance the funnel
            WITH u AS (SELECT DISTINCT user_id FROM events),
            v AS (SELECT user_id, min(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY user_id),
            c AS (SELECT e.user_id, min(e.ts) AS t2
                  FROM events e JOIN v ON e.user_id = v.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.t1
                  GROUP BY e.user_id),
            p AS (SELECT e.user_id, min(e.ts) AS t3
                  FROM events e JOIN c ON e.user_id = c.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.t2
                  GROUP BY e.user_id)
            SELECT u.user_id,
                   CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                             WHEN c.t2 IS NOT NULL THEN 2
                             WHEN v.t1 IS NOT NULL THEN 1
                             ELSE 0 END AS BIGINT) AS funnel_stage
            FROM u
            LEFT JOIN v ON u.user_id = v.user_id
            LEFT JOIN c ON u.user_id = c.user_id
            LEFT JOIN p ON u.user_id = p.user_id
        """,
        'url_template_mining': """
            -- distinct urls per digit-collapsed template, by
            -- construction: /d/N dst = every non-root doc (doc_id >= 8);
            -- /q/, /x/ and /img/ links exist once per doc
            WITH nd AS (SELECT count(*) AS n FROM documents)
            SELECT 'http://srcN.com/d/N' AS template,
                   CAST((SELECT n FROM nd) - 8 AS BIGINT) AS n_urls
            UNION ALL
            SELECT 'http://srcN.com/q/N?a=N&b=N',
                   CAST((SELECT n FROM nd) AS BIGINT)
            UNION ALL
            SELECT 'http://srcN.com/x/N',
                   CAST((SELECT n FROM nd) AS BIGINT)
            UNION ALL
            SELECT 'http://srcN.com/img/N.png',
                   CAST((SELECT n FROM nd) AS BIGINT)
        """,
        'reading_ease': r"""
            -- Flesch reading ease with the vowel-group syllable
            -- heuristic; sentences = [.!?]+ runs (min 1); empty docs
            -- emit (0, 0, 0.0)
            WITH tk AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            sy AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS nw,
                     sum(greatest(len(regexp_extract_all(w, '[aeiouy]+')),
                                  1)) AS nsyl
              FROM tk GROUP BY doc_id
            ),
            snt AS (
              SELECT doc_id,
                     greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                       AS ns
              FROM documents
            )
            SELECT d.doc_id,
                   coalesce(sy.nw, 0) AS n_words,
                   CAST(CASE WHEN sy.nw IS NULL THEN 0 ELSE snt.ns END
                        AS BIGINT) AS n_sentences,
                   round(CASE WHEN sy.nw IS NULL THEN 0.0
                         ELSE 206.835
                              - 1.015 * (sy.nw / CAST(snt.ns AS DOUBLE))
                              - 84.6 * (sy.nsyl / CAST(sy.nw AS DOUBLE))
                         END, 6) AS fre
            FROM documents d
            LEFT JOIN sy ON d.doc_id = sy.doc_id
            JOIN snt ON d.doc_id = snt.doc_id
        """,
        'bm25_search': r"""
            -- BM25 top-20 for query terms (hash, join, order):
            -- integer tf/df/dl/N, avgdl = one division, per-term
            -- contributions added in sorted term order (the exact
            -- op order of the Ray fold), ties at k break doc_id asc
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            st AS (
              SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n,
                     (SELECT CAST(count(*) AS DOUBLE) FROM tok)
                     / (SELECT count(*) FROM documents) AS avgdl
            ),
            dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                   FROM tok GROUP BY doc_id),
            tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
                   FROM tok WHERE w IN ('hash', 'join', 'order')
                   GROUP BY doc_id, w),
            df AS (SELECT w, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY w),
            s AS (
              SELECT tf.doc_id, tf.w,
                     ln((st.n - df.df + 0.5::DOUBLE)
                        / (df.df + 0.5::DOUBLE) + 1.0::DOUBLE)
                     * (tf.tf * (1.2::DOUBLE + 1.0::DOUBLE))
                     / (tf.tf + 1.2::DOUBLE
                        * (1.0::DOUBLE - 0.75::DOUBLE
                           + 0.75::DOUBLE * dl.dl / st.avgdl)) AS s
              FROM tf
              JOIN dl USING (doc_id)
              JOIN df ON tf.w = df.w
              CROSS JOIN st
            ),
            sc AS (
              SELECT doc_id,
                     coalesce(sum(CASE WHEN w = 'hash' THEN s END),
                              0.0::DOUBLE)
                   + coalesce(sum(CASE WHEN w = 'join' THEN s END),
                              0.0::DOUBLE)
                   + coalesce(sum(CASE WHEN w = 'order' THEN s END),
                              0.0::DOUBLE) AS score
              FROM s GROUP BY doc_id
            )
            SELECT CAST(row_number() OVER (
                       ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
                   doc_id, round(score, 6) AS score
            FROM sc ORDER BY score DESC, doc_id LIMIT 20
        """,
        'retention_cohorts': """
            -- weekly cohort retention triangle: cohort = Monday week
            -- of first event; one row per (cohort, offset) counting
            -- distinct active users
            WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
                       FROM events GROUP BY user_id),
            w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                  FROM events)
            SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', f.cw, w.wk) // 7
                        AS BIGINT) AS week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM w JOIN f ON w.user_id = f.user_id
            GROUP BY 1, 2
        """,
        'event_transitions': """
            -- per-user consecutive event-type pairs in (ts, event_id)
            -- order - the first-order Markov transition matrix
            WITH s AS (
              SELECT user_id, event_type,
                     lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT prev AS from_type, event_type AS to_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM s WHERE prev IS NOT NULL
            GROUP BY 1, 2
        """,
        'monthly_revenue': """
            -- monthly trend, exact int fold + MoM from the same ints
            WITH m AS (
              SELECT date_trunc('month', l_shipdate) AS month,
                     CAST(sum(
                       CAST(floor(l_extendedprice * 100 + 0.5)
                            AS BIGINT)
                       * (100 - CAST(floor(l_discount * 100 + 0.5)
                                     AS BIGINT))) AS BIGINT) AS rev,
                     CAST(count(*) AS BIGINT) AS n_items
              FROM lineitem GROUP BY 1)
            SELECT month,
                   round(CAST(rev AS DOUBLE) / 10000, 4) AS revenue,
                   n_items,
                   round(COALESCE(
                     CAST(rev - lag(rev) OVER (ORDER BY month)
                          AS DOUBLE)
                     / lag(rev) OVER (ORDER BY month), 0.0), 6) AS mom
            FROM m
        """,
        'part_pairs': """
            -- market-basket: top-100 within-order part pairs,
            -- ties on (p1, p2)
            WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey
                        FROM lineitem),
            pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
                   FROM pp a JOIN pp b
                     ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey),
            c AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n
                  FROM pr GROUP BY 1, 2)
            SELECT p1, p2, n FROM c
            ORDER BY n DESC, p1, p2 LIMIT 100
        """,
        'session_durations': """
            -- 30-min-gap sessions; duration = exact integer-µs
            -- max−min floor-divided to whole minutes
            WITH marked AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                     sum(new_s) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            ), d AS (
              SELECT CAST((epoch_us(max(ts)) - epoch_us(min(ts)))
                          // 60000000 AS BIGINT) AS dur_min
              FROM sess GROUP BY user_id, sid)
            SELECT dur_min, CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY dur_min
        """,
        'dup_jaccard_hist': f"""
            -- exact-Jaccard histogram of the >=0.8 near-dup pairs
            -- (LSH recall 1.0 pinned); same integer-division double
            WITH {_shingle_jaccard_cte('documents')}
            SELECT LEAST(CAST(floor(jaccard * 20) AS BIGINT), 19)
                     AS bin,
                   CAST(count(*) AS BIGINT) AS n
            FROM pairs GROUP BY 1
        """,
        'dau_stickiness': """
            WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day,
                               user_id FROM events),
            dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                    FROM du GROUP BY 1),
            wu AS (SELECT DISTINCT isoyear(ts) * 100 + week(ts) AS wk,
                          user_id FROM events),
            wau AS (SELECT wk, CAST(count(*) AS BIGINT) AS wau
                    FROM wu GROUP BY 1)
            SELECT d.day, d.dau, w.wau,
                   round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
            FROM dau d
            JOIN wau w ON isoyear(d.day) * 100 + week(d.day) = w.wk
        """,
        'vocab_growth': """
            -- Heaps-law growth from first-occurrence docs: vocab(k) =
            -- #tokens whose min doc_id precedes checkpoint k (exact
            -- integer ceil checkpoints)
            WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n
                        FROM documents),
            tok AS (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text),
                                                     '\\w+')) AS w
                    FROM documents),
            fst AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
            ck AS (SELECT k,
                          ((SELECT n FROM nd) * k + 9) // 10 AS d
                   FROM range(1, 11) t(k))
            SELECT CAST(k * 10 AS BIGINT) AS pct,
                   CAST(d AS BIGINT) AS n_docs,
                   CAST((SELECT count(*) FROM fst WHERE fst.fd < ck.d)
                        AS BIGINT) AS vocab
            FROM ck
        """,
        'event_trigrams': """
            WITH s AS (
              SELECT event_type AS t1,
                     lead(event_type, 1) OVER w AS t2,
                     lead(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE t3 IS NOT NULL GROUP BY t1, t2, t3
        """,
        'ship_delay_dist': """
            SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                        AS BIGINT) AS delay_days,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
        """,
        'hourly_profile': """
            SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        'percentile_rank_docs': """
            -- percent_rank within lang: one division of exact ints
            SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
                   round(percent_rank() OVER
                         (PARTITION BY lang ORDER BY n_chars), 6) AS pr
            FROM documents
        """,
        'host_pagerank': _host_pagerank_sql(),
        'winnow_fingerprints': """
            -- Winnowing (Schleimer et al. 2003): distinct window-min
            -- 8-gram rolling hashes, window 16; same 31-bit Horner
            -- hash as the fingerprints oracle
            WITH chars AS (
              SELECT doc_id,
                     list_transform(regexp_extract_all(text, '(?s).'),
                                    c -> unicode(c)) AS vals
              FROM documents),
            g AS (SELECT doc_id,
                    CASE WHEN len(vals) < 8 THEN
                      [CAST(list_reduce(
                         list_prepend(CAST(0 AS BIGINT), vals),
                         (h, v) -> (h * 1000003 + v) % 2147483647)
                       AS BIGINT)]
                    ELSE list_transform(range(1, len(vals) - 6),
                      i -> list_reduce(
                        list_prepend(CAST(0 AS BIGINT), vals[i:i+7]),
                        (h, v) -> (h * 1000003 + v) % 2147483647))
                    END AS hs
                  FROM chars),
            w AS (SELECT doc_id,
                    CASE WHEN len(hs) <= 16 THEN [list_min(hs)]
                    ELSE list_transform(range(1, len(hs) - 14),
                                        j -> list_min(hs[j:j+15]))
                    END AS fps
                  FROM g)
            SELECT DISTINCT doc_id, fp FROM
              (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM w)
        """,
        'events_anomaly': """
            -- trailing-7-row z-score from two INTEGER window sums
            WITH dc AS (
              SELECT date_trunc('day', ts) AS day,
                     CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            w AS (SELECT day, n,
                    CAST(count(*) OVER win AS BIGINT) AS cnt,
                    CAST(sum(n) OVER win AS BIGINT) AS s1,
                    CAST(sum(n * n) OVER win AS BIGINT) AS s2
                  FROM dc
                  WINDOW win AS (ORDER BY day
                                 ROWS BETWEEN 7 PRECEDING
                                          AND 1 PRECEDING))
            SELECT day, n,
                   round((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7)
                         / sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 49),
                         6) AS z
            FROM w WHERE cnt = 7 AND 7 * s2 - s1 * s1 > 0
        """,
        'rfm_scores': """
            -- exact rank-arithmetic quintiles (ties break on user_id)
            WITH pu AS (
              SELECT user_id, max(ts) AS mts,
                     CAST(count(*) AS BIGINT) AS freq,
                     CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS cents
              FROM events GROUP BY user_id),
            nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pu),
            r AS (SELECT user_id,
                    1 + (5 * (row_number() OVER (ORDER BY mts, user_id)
                              - 1)) // (SELECT n FROM nn) AS r_score,
                    1 + (5 * (row_number() OVER (ORDER BY freq, user_id)
                              - 1)) // (SELECT n FROM nn) AS f_score,
                    1 + (5 * (row_number() OVER (ORDER BY cents, user_id)
                              - 1)) // (SELECT n FROM nn) AS m_score
                  FROM pu)
            SELECT user_id, CAST(r_score AS BIGINT) AS r_score,
                   CAST(f_score AS BIGINT) AS f_score,
                   CAST(m_score AS BIGINT) AS m_score,
                   CAST(100 * r_score + 10 * f_score + m_score
                        AS BIGINT) AS rfm
            FROM r
        """,
        'forecast_revenue': """
            -- Q6-flavor scan-agg, exact 1e-4-dollar integer fold;
            -- discount band on rounded basis points, not float equality
            SELECT round(CAST(sum(
                     CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                     * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                     AS DOUBLE) / 10000, 4) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
                    BETWEEN 4 AND 6
              AND l_quantity < 24
        """,
        'promo_revenue_share': """
            -- Q14-flavor promotion effect: two exact integer folds,
            -- pct is the single division of those identical integers
            WITH x AS (
              SELECT CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                   AS BIGINT)) AS rev,
                     (p.p_type LIKE 'PROMO%') AS isp
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01')
            SELECT round(CAST(sum(CASE WHEN isp THEN rev ELSE 0 END)
                              AS DOUBLE) / 10000, 4) AS promo_revenue,
                   round(CAST(sum(rev) AS DOUBLE) / 10000, 4)
                     AS total_revenue,
                   round(100.0 * CAST(sum(CASE WHEN isp THEN rev
                                              ELSE 0 END) AS DOUBLE)
                         / CAST(sum(rev) AS DOUBLE), 6) AS promo_pct
            FROM x
        """,
        'top_volume_orders': """
            -- Q18-flavor large-volume customers, top-100 by
            -- (o_totalprice desc, o_orderkey asc)
            WITH h AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                          AS BIGINT) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 300)
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, h.sum_qty
            FROM h
            JOIN orders o ON h.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
            LIMIT 100
        """,
        'customer_order_dist': """
            -- Q13-flavor: customers by order count, incl. zero-order
            WITH pc AS (
              SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c
              LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey)
            SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
            FROM pc GROUP BY c_count
        """,
        'revenue_by_nation': """
            -- Q5-flavor star join, exact 1e-4-dollar integer fold
            WITH j AS (
              SELECT c.c_nationkey AS nk,
                     CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                   AS BIGINT)) AS rev
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey)
            SELECT r.r_name, n.n_name,
                   round(CAST(sum(j.rev) AS DOUBLE) / 10000, 4)
                     AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM j
            JOIN nation n ON j.nk = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, n.n_name
        """,
        'brand_volume': """
            SELECT p.p_brand,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_qty,
                   round(CAST(sum(
                     CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                   AS BIGINT))) AS DOUBLE) / 10000, 4)
                     AS revenue
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        'supplier_nation_revenue': """
            SELECT n.n_name,
                   CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
                     AS n_suppliers,
                   round(CAST(sum(
                     CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                     * (100 - CAST(floor(l.l_discount * 100 + 0.5)
                                   AS BIGINT))) AS DOUBLE) / 10000, 4)
                     AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        'pricing_summary': """
            -- TPC-H Q1 shape in EXACT integer cents / basis points
            -- (price 2dp, disc/tax 2dp, integral qty) so both engines
            -- divide identical integers — no summation-order drift
            WITH x AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
                     CAST(floor(l_extendedprice * 100 + 0.5)
                          AS BIGINT) AS pc,
                     CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS db,
                     CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tb
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02')
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(q) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(pc) AS DOUBLE) / 100, 2)
                     AS sum_base_price,
                   round(CAST(sum(pc * (100 - db)) AS DOUBLE) / 10000, 4)
                     AS sum_disc_price,
                   round(CAST(sum(pc * (100 - db) * (100 + tb))
                              AS DOUBLE) / 1000000, 6) AS sum_charge,
                   round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS avg_qty,
                   round(CAST(sum(pc) AS DOUBLE) / (100 * count(*)), 6)
                     AS avg_price,
                   round(CAST(sum(db) AS DOUBLE) / (100 * count(*)), 6)
                     AS avg_disc,
                   CAST(count(*) AS BIGINT) AS cnt_order
            FROM x GROUP BY l_returnflag, l_linestatus
        """,
        'kmeans_clusters': _kmeans_sql(),
        'neardup_rate_by_source': f"""
            -- per-source fraction of docs in >=1 exact-Jaccard>=0.8
            -- pair (the LSH path's recall is 1.0 — pinned in pytest)
            WITH {_shingle_jaccard_cte('documents')},
            ids AS (SELECT id_a AS doc_id FROM pairs
                    UNION SELECT id_b FROM pairs),
            tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
                    FROM documents GROUP BY source),
            dup AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_dup
                    FROM documents d JOIN ids USING (doc_id)
                    GROUP BY d.source)
            SELECT t.source, t.n_docs,
                   coalesce(dup.n_dup, 0) AS n_dup,
                   round(coalesce(dup.n_dup, 0)
                         / CAST(t.n_docs AS DOUBLE), 6) AS dup_frac
            FROM tot t LEFT JOIN dup USING (source)
        """,
        'anchor_texts': """
            -- anchor texts by construction (docs_pages.py): the
            -- unique tree parent labels child j (local k=j//8 >= 1)
            -- 'l' || (k-1)%3; every page emits one 'query'/'cross'/
            -- 'media' anchor; each target has exactly one referrer
            WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                       FROM documents)
            SELECT 'http://src' || h || '.com/d/' || doc_id AS url,
                   'l' || ((k - 1) % 3) AS anchors,
                   CAST(1 AS BIGINT) AS n_refs
            FROM d WHERE k >= 1
            UNION ALL
            SELECT 'http://src' || h || '.com/q/' || doc_id || '?a=1&b=2',
                   'query', 1 FROM d
            UNION ALL
            SELECT 'http://src' || (h + 1) % 8 || '.com/x/' || doc_id,
                   'cross', 1 FROM d
            UNION ALL
            SELECT 'http://src' || h || '.com/img/' || doc_id || '.png',
                   'media', 1 FROM d
        """,
        'crawl_status_by_host': f"""
            SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host,
                   status, CAST(count(*) AS BIGINT) AS n_visits
            FROM ( {_CRAWL_BFS_SQL} ) v GROUP BY 1, 2
        """,
        'weekly_top_events': """
            -- top-3 event types per Monday-truncated week, ties by
            -- type asc
            WITH c AS (
              SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                     event_type, CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1, 2
            )
            SELECT week, event_type, n_events, rk FROM (
              SELECT *, CAST(row_number() OVER (
                     PARTITION BY week
                     ORDER BY n_events DESC, event_type) AS BIGINT) AS rk
              FROM c)
            WHERE rk <= 3
        """,
        'rollup_source_lang': """
            -- ROLLUP levels with 'ALL' filling rolled-up keys and the
            -- standard GROUPING() bitmask (0 detail / 1 per-source / 3
            -- grand total)
            SELECT coalesce(source, 'ALL') AS source,
                   coalesce(lang, 'ALL') AS lang,
                   CAST(GROUPING(source, lang) AS BIGINT) AS lvl,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS n_chars
            FROM documents
            GROUP BY ROLLUP(source, lang)
        """,
        'unigram_entropy': r"""
            -- corpus unigram Shannon entropy from exact merged counts:
            -- H = (ln N - sum(c ln c)/N) / ln 2.  Summation-order-
            -- insensitive: fold over the count HISTOGRAM, quantizing
            -- each m*c*ln(c) term to integer micro-units (identical
            -- doubles on both engines) and summing exact BIGINTs.
            WITH w AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ),
            c AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                  FROM w GROUP BY w),
            h AS (SELECT c, CAST(count(*) AS BIGINT) AS m
                  FROM c GROUP BY c),
            s AS (SELECT CAST(sum(m * c) AS BIGINT) AS n,
                         CAST(sum(m) AS BIGINT) AS vocab,
                         CAST(sum(CASE WHEN c > 1 THEN
                           CAST(floor(CAST(m AS DOUBLE) * CAST(c AS DOUBLE)
                                      * ln(CAST(c AS DOUBLE))
                                      * 1000000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS clnc_u
                  FROM h)
            SELECT n AS n_tokens, vocab AS vocab_size,
                   round((ln(CAST(n AS DOUBLE))
                          - (CAST(clnc_u AS DOUBLE) / 1000000.0)
                            / CAST(n AS DOUBLE)) / ln(2.0),
                         6) AS entropy_bits
            FROM s
        """,
        'events_daily_change': """
            -- daily counts + LAG percent change (first day NULL)
            WITH d AS (
              SELECT strftime(ts, '%Y-%m-%d') AS day,
                     CAST(count(*) AS BIGINT) AS n_events
              FROM events GROUP BY 1
            )
            SELECT day, n_events,
                   round((n_events - lag(n_events) OVER (ORDER BY day))
                         / CAST(lag(n_events) OVER (ORDER BY day)
                                AS DOUBLE), 6) AS pct_change
            FROM d
        """,
        'feature_correlations': r"""
            -- Pearson corr from exact integer moments — the identical
            -- closed form the engine folds, one int->double cast per
            -- term
            WITH f AS (
              SELECT n_chars AS c,
                     len(regexp_extract_all(lower(text), '\w+')) AS t,
                     len(list_distinct(
                         regexp_extract_all(lower(text), '\w+'))) AS y
              FROM documents
            ),
            s AS (
              SELECT count(*) AS n,
                     sum(c) AS sc, sum(t) AS st, sum(y) AS sy,
                     sum(c*c) AS scc, sum(t*t) AS stt, sum(y*y) AS syy,
                     sum(c*t) AS sct, sum(c*y) AS scy, sum(t*y) AS sty
              FROM f
            )
            SELECT feat_a, feat_b, round(num / den, 6) AS corr
            FROM (
              SELECT 'chars' AS feat_a, 'tokens' AS feat_b,
                     CAST(n*sct - sc*st AS DOUBLE) AS num,
                     sqrt(CAST((n*scc - sc*sc) * (n*stt - st*st)
                               AS DOUBLE)) AS den
              FROM s
              UNION ALL
              SELECT 'chars', 'types',
                     CAST(n*scy - sc*sy AS DOUBLE),
                     sqrt(CAST((n*scc - sc*sc) * (n*syy - sy*sy)
                               AS DOUBLE))
              FROM s
              UNION ALL
              SELECT 'tokens', 'types',
                     CAST(n*sty - st*sy AS DOUBLE),
                     sqrt(CAST((n*stt - st*st) * (n*syy - sy*sy)
                               AS DOUBLE))
              FROM s
            )
        """,
        'source_lang_mix': """
            WITH c AS (
              SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1, 2
            ),
            t AS (SELECT source, sum(n_docs) AS tot FROM c GROUP BY 1)
            SELECT c.source, c.lang, c.n_docs,
                   round(CAST(c.n_docs AS DOUBLE) / t.tot, 6) AS frac
            FROM c JOIN t ON c.source = t.source
        """,
        'outdeg_hist': """
            -- outdegree histogram by construction: each page links its
            -- same-host tree children (0..3) plus the query, cross-host
            -- and media links (= +3)
            WITH nd AS (SELECT count(*) AS n FROM documents),
            d AS (SELECT doc_id, doc_id % 8 AS h FROM documents),
            c AS (SELECT LEAST(3, GREATEST(0, CAST(floor(
                    ((SELECT n FROM nd) - 1 - (3 * doc_id - 2 * h))
                    / 8.0) AS BIGINT))) + 3 AS outdeg
                  FROM d)
            SELECT outdeg, CAST(count(*) AS BIGINT) AS n_pages
            FROM c GROUP BY outdeg
        """,
        'events_user_running': """
            -- per-user running total + inter-arrival gap; first event
            -- gap_us = 0 by contract
            SELECT event_id,
                   SUM(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS cum_value,
                   CAST(coalesce(date_diff('microseconds',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id), ts), 0)
                        AS BIGINT) AS gap_us
            FROM events
        """,
        'events_window': """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        'events_sessions': """
            WITH marked AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked
            )
            SELECT user_id, min(ts) AS session_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM sess GROUP BY user_id, sid
        """,
        'distinct_event_types': """
            SELECT DISTINCT event_type FROM events
        """,
        'events_sliding_window': """
            -- hop windows: 1 h window sliding every 30 min — each
            -- event lands in 2 windows (same floor arithmetic as the
            -- Ray explode: (t_sec - k*1800) // 1800 * 1800)
            SELECT event_type,
                   TIMESTAMP '1970-01-01'
                     + ((epoch_us(ts) // 1000000 - k.k * 1800)
                        // 1800 * 1800) * INTERVAL 1 SECOND
                       AS window_start,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events, (VALUES (0), (1)) AS k(k)
            GROUP BY 1, 2
        """,
        'top_orders_per_customer': """
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(rn AS BIGINT) AS rank
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         row_number() OVER (
                             PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 3
        """,
        'top_ngrams': """
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '\\w+') AS ts
              FROM documents
            ), grams AS (
              SELECT unnest(list_transform(range(1, len(ts) - 1),
                            i -> array_to_string(ts[i:i+2], ' '))) AS ngram
              FROM toks WHERE len(ts) >= 3
            )
            SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
            FROM grams GROUP BY ngram
            ORDER BY cnt DESC, ngram LIMIT 100
        """,
        'topk_priority': """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
        """,
        'priority_scores': """
            SELECT doc_id,
                   CAST(100 + length('http://src' || (doc_id % 8) ||
                        '.com/d/' || doc_id) AS BIGINT) AS score
            FROM documents
        """,
        'user_event_counts': """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY user_id
        """,
        'wat_links': """
            -- same construction oracle as page_links: wat_links runs
            -- the identical link-extraction kernel, round-tripped
            -- through real WAT metadata record bytes
            SELECT doc_id,
                   CAST(LEAST(3, GREATEST(0,
                        CAST(floor(((SELECT count(*) FROM documents) - 1
                             - (3*doc_id - 2*(doc_id % 8))) / 8.0) AS BIGINT)
                   )) + 3 AS BIGINT) AS n_links
            FROM documents
        """,
        'page_links': """
            -- derived-page link count by construction (docs_pages.py):
            -- B-ary tree children m=1..3 at h + 8*(3k+m) < n_docs
            -- (h + 24k == 3*doc_id - 2*h), plus the query, cross-host
            -- and media links (get_links does not filter), all distinct
            SELECT doc_id,
                   CAST(LEAST(3, GREATEST(0,
                        CAST(floor(((SELECT count(*) FROM documents) - 1
                             - (3*doc_id - 2*(doc_id % 8))) / 8.0) AS BIGINT)
                   )) + 3 AS BIGINT) AS n_links
            FROM documents
        """,
        'crawl_bfs': _CRAWL_BFS_SQL,
        'crawl_depth_hist': f"""
            SELECT depth, CAST(count(*) AS BIGINT) AS n_visits
            FROM ( {_CRAWL_BFS_SQL} ) v GROUP BY depth
        """,
        # crawl-to-training-corpus: the crawled (status-200) document
        # set fed through the curation pass — the end-to-end pipeline
        # a user of the reference would run, as one oracled query
        'crawl_clean_corpus': f"""
            WITH crawled AS (
              SELECT CAST(regexp_extract(url, '/d/(\\d+)$', 1)
                          AS BIGINT) AS doc_id
              FROM ( {_CRAWL_BFS_SQL} ) v WHERE v.status = 200
            )
            SELECT min(d.doc_id) AS doc_id
            FROM documents d JOIN crawled c USING (doc_id)
            WHERE len(regexp_extract_all(lower(d.text), '\\w+')) >= 20
            GROUP BY md5(d.text)
        """,
        'crawl_contacts': """
            -- flagship crawl composed with contact extraction: same
            -- recursive CTE; email known by construction
            -- (docs_pages.py embeds 'user{id} AT example DOT com' on
            -- doc_id %% 3 == 0; /q/ 404 visits have none)
            WITH RECURSIVE bfs AS (
              SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k,
                     0 AS depth, doc_id % 8 AS ph,
                     CAST(0 AS BIGINT) AS pk, 0 AS idx
              FROM documents WHERE doc_id < 8
              UNION ALL
              SELECT d.doc_id, d.doc_id % 8, d.doc_id // 8, b.depth + 1,
                     b.h, b.k, m.m - 1
              FROM bfs b
              JOIN (VALUES (1), (2), (3)) AS m(m) ON true
              JOIN documents d ON d.doc_id = b.h + 8 * (3 * b.k + m.m)
              WHERE b.depth < 6
            ), allv AS (
              SELECT 'http://src' || h || '.com/d/' || doc_id AS url,
                     depth,
                     CASE WHEN doc_id % 3 = 0
                          THEN 'user' || doc_id || '@example.com'
                          ELSE '' END AS email,
                     ph, pk, idx
              FROM bfs
              UNION ALL
              SELECT 'http://src' || h || '.com/q/' || doc_id
                       || '?a=1&b=2',
                     depth + 1, '', h, k, 3
              FROM bfs WHERE depth < 6
            )
            SELECT url, CAST(depth AS INT) AS depth,
                   CAST(row_number() OVER (ORDER BY depth, ph, pk, idx)
                        - 1 AS BIGINT) AS visit_order,
                   email
            FROM allv
        """,
        'dedup_first': """
            SELECT user_id, event_type, min(event_id) AS first_event_id
            FROM events GROUP BY user_id, event_type
        """,
        'dedup_exact_text': """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        """,
        'join_orders_customers': """
            SELECT c_nationkey AS nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        'join_lineitem_orders': """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
                   round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        'semi_join_customers': """
            SELECT c_custkey FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
        """,
        'anti_join_customers': """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_totalprice > 300000.0)
        """,
        'events_band_join': """
            SELECT e1.event_id,
                   CAST(count(e2.event_id) AS BIGINT) AS n_nearby,
                   round(COALESCE(sum(e2.value), 0.0), 2)
                       AS sum_nearby_value
            FROM events e1 LEFT JOIN events e2
              ON e1.user_id = e2.user_id
             AND e2.event_id != e1.event_id
             AND e2.ts BETWEEN e1.ts - INTERVAL 10 MINUTE
                           AND e1.ts + INTERVAL 10 MINUTE
            GROUP BY e1.event_id
        """,
        'asof_latest_event': """
            SELECT user_id, event_id AS last_event_id,
                   round(value, 2) AS last_value
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events
                  WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
            WHERE rn = 1
        """,
        'normalize_text': """
            SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_norm
            FROM documents
        """,
        'token_count': """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        # greedy concat-and-chunk packing == exclusive running sum of
        # whitespace-token counts in doc_id order, cut every 2048
        'pack_sequences': """
            WITH n AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)
                         AS n_tokens
              FROM documents
            ), p AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS pre
              FROM n)
            SELECT doc_id, n_tokens,
                   CAST(pre // 2048 AS BIGINT) AS seq_id,
                   CAST(pre % 2048 AS BIGINT) AS seq_offset
            FROM p
        """,
        'mixture_weights': """
            WITH t AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(SUM(len(regexp_extract_all(text, '\\S+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY lang
            ), s AS (
              SELECT lang, n_docs, n_tokens,
                     CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()
                         AS share
              FROM t)
            SELECT lang, n_docs, n_tokens,
                   round(share, 6) AS token_share,
                   round(pow(share, 0.5)
                         / SUM(pow(share, 0.5)) OVER (), 6) AS weight
            FROM s
        """,
        # mixture-rate subsampling: integer ppm thresholds from the
        # 6-dp-rounded weights (bit-equal per the mixture_weights
        # check), md5 keep predicate from sample_hash
        'sample_mixture': """
            WITH t AS (
              SELECT lang,
                     CAST(SUM(len(regexp_extract_all(text, '\\S+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY lang
            ), s AS (
              SELECT lang,
                     CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()
                         AS share
              FROM t
            ), thr AS (
              SELECT lang,
                     LEAST(1000000,
                           CAST(round(round(pow(share, 0.5)
                                / SUM(pow(share, 0.5)) OVER (), 6)
                                * 1e6, 0) AS BIGINT) * 2) AS keep_ppm
              FROM s)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN thr USING (lang)
            WHERE md5_number_lower(CAST(d.doc_id AS VARCHAR)) % 1000000
                    < thr.keep_ppm
        """,
        'quality': """
            SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(regexp_extract_all(lower(text), '\\w+')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(regexp_extract_all(lower(text), '\\w+'))) AS BIGINT) AS n_unique_tokens
            FROM documents
        """,
        'url_parse': """
            SELECT doc_id, source || '.com' AS domain, 'pdf' AS extension
            FROM documents
        """,
        'cdx_index': """
            -- expected url AND surt key stated by construction, per the
            -- public SURT rules (lowercase; drop scheme/fragment/www./
            -- default port; reverse host labels; sort query params)
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'HTTP://WWW.Src' || (doc_id % 8)
                          || '.COM:80/D/' || doc_id || '?b=2&a=1#frag'
                     WHEN 1 THEN 'https://src' || (doc_id % 8)
                          || '.com:8443/d/' || doc_id
                     WHEN 2 THEN 'http://src' || (doc_id % 8)
                          || '.com/d/' || doc_id || '?b=2&a=1&a=0'
                     ELSE 'http://src' || (doc_id % 8) || '.com/d/' || doc_id
                   END AS url,
                   CASE doc_id % 4
                     WHEN 0 THEN 'com,src' || (doc_id % 8) || ')/d/'
                          || doc_id || '?a=1&b=2'
                     WHEN 1 THEN 'com,src' || (doc_id % 8) || ':8443)/d/'
                          || doc_id
                     WHEN 2 THEN 'com,src' || (doc_id % 8) || ')/d/'
                          || doc_id || '?a=0&a=1&b=2'
                     ELSE 'com,src' || (doc_id % 8) || ')/d/' || doc_id
                   END AS surt_key
            FROM documents
        """,
        'line_dedup': """
            -- C4/RefinedWeb line-level exact dedup: lines are the
            -- 10-word windows of text (the synthetic corpus has no
            -- newlines); every repeated line keeps only its first
            -- (doc_id, line_no) occurrence, empty lines exempt
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS w FROM documents
            ),
            exp AS (
              SELECT doc_id, w,
                     unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)))
                       AS line_no
              FROM toks
            ),
            lns AS (
              SELECT doc_id, CAST(line_no AS BIGINT) AS line_no,
                     array_to_string(w[(line_no*10 + 1):(line_no*10 + 10)],
                                     ' ') AS line
              FROM exp
            ),
            firsts AS (
              SELECT line, min(printf('%015d.%09d', doc_id, line_no)) AS fk
              FROM lns WHERE line <> ''
              GROUP BY line HAVING count(*) >= 2
            ),
            kept AS (
              SELECT l.doc_id, l.line_no, l.line,
                     (f.line IS NULL OR
                      printf('%015d.%09d', l.doc_id, l.line_no) = f.fk)
                       AS keep
              FROM lns l LEFT JOIN firsts f ON l.line = f.line
            ),
            per AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_lines_kept,
                     CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
                       AS n_lines_removed,
                     coalesce(string_agg(CASE WHEN keep THEN line END,
                                         chr(10) ORDER BY line_no), '')
                       AS text_clean
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_lines_kept, CAST(0 AS BIGINT))
                     AS n_lines_kept,
                   coalesce(p.n_lines_removed, CAST(0 AS BIGINT))
                     AS n_lines_removed,
                   coalesce(p.text_clean, '') AS text_clean
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        'recrawl_schedule': """
            -- Cho/Garcia-Molina recrawl planning over the fetch log:
            -- changes = consecutive observations (ts, event_id order)
            -- whose event_type differs; next fetch = last + base/(c+1)
            WITH ordered AS (
              SELECT user_id, ts, event_type,
                     lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_type
              FROM events
            ),
            agg AS (
              SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n_fetches,
                     CAST(sum(CASE WHEN prev_type IS NOT NULL
                                    AND event_type <> prev_type
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                     max(ts) AS last_ts
              FROM ordered GROUP BY user_id
            )
            SELECT user_id, n_fetches, n_changes, last_ts,
                   last_ts + to_microseconds(
                       86400000000 // (n_changes + 1)) AS next_fetch_ts
            FROM agg
        """,
        'knn_join': _KNN_JOIN_SQL,
        # exhaustive-probe IVF: exact result, same oracle (the
        # knn_ivf_query0 argument); sub-exhaustive nprobe recall is a
        # pytest-measured trade, not a correctness claim
        'knn_join_ivf': _KNN_JOIN_SQL,
        # DSIR (Xie et al. 2023): hashed-unigram importance log-weights
        # ln p_target/p_raw, target = lang='en', 4096 md5 buckets,
        # add-1 smoothing (ln-sum drift absorbed by round(4))
        'dsir_weights': r"""
            WITH tk AS (SELECT doc_id,
                          unnest(regexp_extract_all(lower(text), '\w+'))
                              AS w
                        FROM documents),
            f AS (SELECT doc_id, md5_number_lower(w) % 4096 AS b FROM tk),
            raw AS (SELECT b, CAST(count(*) AS BIGINT) c FROM f GROUP BY b),
            tgt AS (SELECT b, CAST(count(*) AS BIGINT) c
                    FROM f JOIN documents USING (doc_id)
                    WHERE lang = 'en' GROUP BY b),
            nr AS (SELECT CAST(sum(c) AS DOUBLE) n FROM raw),
            nt AS (SELECT CAST(COALESCE(sum(c), 0) AS DOUBLE) n FROM tgt),
            per AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) n_tokens,
                      SUM(ln((COALESCE(t.c, 0) + 1)
                              / ((SELECT n FROM nt) + 4096))
                        - ln((r.c + 1)
                              / ((SELECT n FROM nr) + 4096))) lw
                    FROM f JOIN raw r USING (b) LEFT JOIN tgt t USING (b)
                    GROUP BY f.doc_id)
            SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
                   round(COALESCE(p.lw, 0.0), 4) AS dsir_logweight
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        # multinomial NB lang classifier, train = even doc_id, add-1
        # smoothing over the train vocab, OOV ignored, ties -> smallest
        # class (ORDER BY score DESC, cls ASC on both sides)
        'nb_classify': r"""
            WITH tk AS (SELECT doc_id,
                          unnest(regexp_extract_all(lower(text), '\w+'))
                              AS w
                        FROM documents),
            dtok AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) c
                     FROM tk GROUP BY doc_id, w),
            tr AS (SELECT d.lang, t.w, CAST(sum(t.c) AS BIGINT) cw
                   FROM dtok t JOIN documents d USING (doc_id)
                   WHERE d.doc_id % 2 = 0 GROUP BY d.lang, t.w),
            vocab AS (SELECT DISTINCT w FROM tr),
            vn AS (SELECT CAST(count(*) AS DOUBLE) v FROM vocab),
            nl AS (SELECT lang, CAST(sum(cw) AS DOUBLE) n
                   FROM tr GROUP BY lang),
            pri AS (SELECT lang, CAST(count(*) AS DOUBLE) nd
                    FROM documents WHERE doc_id % 2 = 0 GROUP BY lang),
            ntr AS (SELECT CAST(count(*) AS DOUBLE) n
                    FROM documents WHERE doc_id % 2 = 0),
            tdoc AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) tt
                     FROM dtok JOIN vocab USING (w) GROUP BY doc_id),
            s1 AS (SELECT t.doc_id, tr.lang AS cls,
                          SUM(t.c * ln(tr.cw + 1)) s
                   FROM dtok t JOIN tr USING (w)
                   GROUP BY t.doc_id, tr.lang),
            scores AS (SELECT d.doc_id, d.lang, p.lang AS cls,
                         ln(p.nd / (SELECT n FROM ntr))
                         - COALESCE(td.tt, 0)
                             * ln(COALESCE(nl.n, 0) + (SELECT v FROM vn))
                         + COALESCE(s1.s, 0) AS score
                       FROM documents d
                       CROSS JOIN pri p
                       LEFT JOIN nl ON nl.lang = p.lang
                       LEFT JOIN tdoc td ON td.doc_id = d.doc_id
                       LEFT JOIN s1 ON s1.doc_id = d.doc_id
                                   AND s1.cls = p.lang)
            SELECT doc_id, lang, cls AS pred_lang
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY score DESC, cls ASC) rn
                  FROM scores)
            WHERE rn = 1
        """,
        'dedup_incremental': """
            -- cross-snapshot incremental dedup: prior dump = even
            -- doc_id half, new batch = odd half; keep new docs whose
            -- exact text never appears in the prior dump, min doc_id
            -- per identical text within the new batch
            WITH hashed AS (
              SELECT doc_id, md5(text) AS content_md5 FROM documents
            ),
            new_batch AS (
              SELECT min(doc_id) AS doc_id, content_md5
              FROM hashed WHERE doc_id % 2 = 1 GROUP BY content_md5
            ),
            prior AS (
              SELECT DISTINCT content_md5 FROM hashed WHERE doc_id % 2 = 0
            )
            SELECT n.doc_id, n.content_md5
            FROM new_batch n ANTI JOIN prior p USING (content_md5)
        """,
        'budget_select': r"""
            -- token-budget data selection: docs ordered by type-token
            -- ratio DESC (ties doc_id), selected while the inclusive
            -- running token total fits 25% of the corpus tokens
            WITH q AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text), '\w+'))
                          AS BIGINT) AS n_tokens,
                     CAST(len(list_distinct(
                          regexp_extract_all(lower(text), '\w+')))
                          AS BIGINT) AS u
              FROM documents
            ),
            s AS (
              SELECT doc_id, n_tokens,
                     CASE WHEN n_tokens = 0 THEN 0.0
                          ELSE CAST(u AS DOUBLE) / n_tokens END AS score
              FROM q
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY score DESC, doc_id)
                       AS cum
              FROM s
            )
            SELECT doc_id, n_tokens FROM c
            WHERE cum <= (SELECT sum(n_tokens) * 0.25 FROM q)
        """,
        'host_boilerplate': """
            -- per-host template lines: a non-empty 10-word-window line
            -- is boilerplate for source s iff it appears in
            -- >= max(2, ceil(0.05 * docs(s))) distinct docs of s
            WITH toks AS (
              SELECT doc_id, source, string_split(text, ' ') AS w
              FROM documents
            ),
            exp AS (
              SELECT doc_id, source, w,
                     unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)))
                       AS line_no
              FROM toks
            ),
            lns AS (
              SELECT doc_id, source,
                     array_to_string(w[(line_no*10 + 1):(line_no*10 + 10)],
                                     ' ') AS line
              FROM exp
            ),
            sd AS (
              SELECT source, CAST(count(*) AS BIGINT) AS src_docs
              FROM documents GROUP BY source
            ),
            cnt AS (
              SELECT source, line,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM lns WHERE line <> '' GROUP BY source, line
            )
            SELECT c.source, c.line, c.n_docs
            FROM cnt c JOIN sd USING (source)
            WHERE c.n_docs >= greatest(
                2, CAST(ceil(0.05 * sd.src_docs) AS BIGINT))
        """,
        'semdedup_recall': """
            -- SemDeDup quality gate: n_exact_removed recomputed from
            -- the exact cosine dup graph (non-min members of each
            -- connected component); recall_ok stated 1 (the query
            -- gates cluster-pruned recall >= 0.95 and precision = 1)
            WITH RECURSIVE pr AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding)
                    >= 0.95
            ), edges AS (
              SELECT id_a AS u, id_b AS v FROM pr
              UNION SELECT id_b, id_a FROM pr
            ), cc(node, lbl) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, c.lbl FROM edges e JOIN cc c ON e.v = c.node
            ), comp AS (
              SELECT node, MIN(lbl) AS lbl FROM cc GROUP BY node
            )
            SELECT CAST(count(*) FILTER (node <> lbl) AS BIGINT)
                     AS n_exact_removed,
                   CAST(1 AS BIGINT) AS recall_ok
            FROM comp
        """,
        'inverted_index': r"""
            -- inverted-index build: sorted distinct posting list per
            -- term with document frequency >= 2
            WITH tk AS (
              SELECT DISTINCT doc_id, w
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\w+'))
                             AS w
                    FROM documents)
            )
            SELECT w AS term, CAST(count(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM tk GROUP BY w HAVING count(*) >= 2
        """,
        'crawl_budget_alloc': r"""
            -- Hamilton largest-remainder apportionment of 1000 crawl
            -- slots across sources, proportional to token mass
            WITH s AS (
              SELECT source,
                     CAST(sum(len(regexp_extract_all(lower(text), '\w+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            ),
            tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS W FROM s),
            base AS (
              SELECT source, n_tokens,
                     1000.0 * n_tokens / (SELECT W FROM tot) AS quota
              FROM s
            ),
            fl AS (
              SELECT source, n_tokens,
                     CAST(floor(quota) AS BIGINT) AS fl,
                     quota - floor(quota) AS frac
              FROM base
            ),
            rem AS (SELECT 1000 - sum(fl) AS r FROM fl),
            rk AS (
              SELECT source, n_tokens, fl,
                     row_number() OVER (ORDER BY frac DESC, source) AS rn
              FROM fl
            )
            SELECT source, n_tokens,
                   fl + CASE WHEN rn <= (SELECT r FROM rem)
                             THEN 1 ELSE 0 END AS alloc
            FROM rk
        """,
        'centroid_classify': """
            -- nearest-centroid classify: cosine argmax against the
            -- per-label mean embedding (dim 64, 1-based list index);
            -- ties break to the smaller label
            WITH e AS (
              SELECT vec_id, label,
                     CAST(i AS BIGINT) AS i,
                     CAST(embedding[CAST(i AS BIGINT) + 1] AS DOUBLE)
                       AS x
              FROM embeddings CROSS JOIN range(64) t(i)
            ),
            cent AS (
              SELECT label, i, avg(x) AS c
              FROM e GROUP BY label, i
            ),
            cn AS (
              SELECT label, sqrt(sum(c * c)) AS nrm
              FROM cent GROUP BY label
            ),
            dots AS (
              SELECT e.vec_id, cent.label AS cls, sum(e.x * cent.c) AS d
              FROM e JOIN cent ON e.i = cent.i
              GROUP BY e.vec_id, cent.label
            ),
            scored AS (
              SELECT d.vec_id, d.cls, d.d / cn.nrm AS score
              FROM dots d JOIN cn ON cn.label = d.cls
            ),
            best AS (
              SELECT vec_id, cls,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY score DESC, cls) AS rn
              FROM scored
            )
            SELECT em.vec_id, CAST(em.label AS BIGINT) AS label,
                   CAST(b.cls AS BIGINT) AS pred_label
            FROM embeddings em JOIN best b
              ON b.vec_id = em.vec_id AND b.rn = 1
        """,
        'snapshot_diff': """
            -- cross-snapshot diff: old = docs 0..449, new = docs
            -- 50..499 with doc_id % 5 = 0 re-rendered (text || 'v2')
            WITH old AS (
              SELECT doc_id AS page_key, md5(text) AS h
              FROM documents WHERE doc_id < 450
            ),
            new AS (
              SELECT doc_id AS page_key,
                     md5(text || CASE WHEN doc_id % 5 = 0
                                      THEN 'v2' ELSE '' END) AS h
              FROM documents WHERE doc_id >= 50
            )
            SELECT COALESCE(o.page_key, n.page_key) AS page_key,
                   CASE WHEN n.page_key IS NULL THEN 'gone'
                        WHEN o.page_key IS NULL THEN 'added'
                        WHEN o.h = n.h THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old o FULL OUTER JOIN new n USING (page_key)
        """,
        'xpath_titles': """
            SELECT doc_id, 'Doc ' || doc_id AS title, 'Doc ' || doc_id AS h1
            FROM documents
        """,
        'extract_contacts': """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'user' || doc_id || '@example.com'
                        ELSE '' END AS email,
                   CASE WHEN doc_id % 5 = 0
                        THEN '(555) 010-' ||
                             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        ELSE '' END AS phone
            FROM documents
        """,
        'excerpts': """
            SELECT doc_id, 'Doc ' || doc_id || ' summary' AS excerpt
            FROM documents
        """,
        'media_meta': """
            SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        'clean_corpus': """
            SELECT min(doc_id) AS doc_id FROM documents
            WHERE len(regexp_extract_all(lower(text), '\\w+')) >= 20
            GROUP BY md5(text)
        """,
        'clean_corpus_decontaminated': """
            -- quality >= 20 tokens, exact dedup (min doc_id per text),
            -- then drop held-out docs and any 8-gram-contaminated doc
            WITH surv AS (
              SELECT min(doc_id) AS doc_id FROM documents
              WHERE len(regexp_extract_all(lower(text), '\\w+')) >= 20
              GROUP BY md5(text)
            ),
            toks AS (SELECT doc_id,
                       regexp_extract_all(lower(text), '\\w+') AS ts
                     FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
                          WHEN len(ts) < 8 THEN [array_to_string(ts, ' ')]
                          ELSE list_distinct(list_transform(
                               range(1, len(ts) - 6),
                               i -> array_to_string(ts[i:i+7], ' '))) END
                       AS shs
                   FROM toks),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % 100 = 0),
            bad AS (SELECT DISTINCT t.doc_id FROM ex t JOIN ev USING (s)
                    WHERE t.doc_id % 100 <> 0)
            SELECT doc_id FROM surv
            WHERE doc_id % 100 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM bad)
        """,
        'embedding_dups': """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 6)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        'knn_query0': _KNN_EXACT_SQL,
        # IVF ANN: recall@10 = 1.0 on testdata (pytest-asserted), so
        # the approximate result must equal the exact brute-force SQL
        'knn_ivf_query0': _KNN_EXACT_SQL,
        # IVF near-dup: same argument — per-bucket matmuls verify
        # exactly; near-identical vectors co-bucket on testdata
        'embedding_dups_ivf': """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding), 6)
                       AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        # components of the IVF cosine pair graph (pair recall vs the
        # brute oracle is pytest-pinned at 1.0 on testdata)
        'embedding_dup_clusters': """
            WITH RECURSIVE pr AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding)
                    >= 0.95
            ), edges AS (
              SELECT id_a AS u, id_b AS v FROM pr
              UNION SELECT id_b, id_a FROM pr
            ), cc(node, lbl) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, c.lbl FROM edges e JOIN cc c ON e.v = c.node)
            SELECT node AS doc_id, MIN(lbl) AS cluster_id
            FROM cc GROUP BY node
        """,
        # MinHash-LSH with exact Jaccard verification: candidates are
        # verified exactly and LSH recall is 1.0 at testdata scale
        # (pytest test_minhash_recall_vs_exact_bruteforce), so the
        # output equals the exact shingle-Jaccard pair list
        'minhash_dups': f"""
            WITH {_shingle_jaccard_cte('documents')}
            SELECT id_a, id_b, jaccard FROM pairs
        """,
        # connected components of the verified near-dup pair graph:
        # the Ray side labels by hash-to-min propagation, the oracle
        # by recursive-CTE transitive closure — both min(id)/component
        'dup_keep_best': f"""
            WITH RECURSIVE {_shingle_jaccard_cte('documents')},
            edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            cc(node, lbl) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, c.lbl FROM edges e JOIN cc c ON e.v = c.node),
            memb AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id
                     FROM cc GROUP BY node),
            scored AS (
              SELECT m.cluster_id, m.doc_id,
                     len(list_distinct(regexp_extract_all(
                         lower(d.text), '\\w+'))) AS score
              FROM memb m JOIN documents d ON m.doc_id = d.doc_id)
            SELECT cluster_id, keep_id, n_members FROM (
              SELECT cluster_id, doc_id AS keep_id,
                     CAST(COUNT(*) OVER (PARTITION BY cluster_id)
                          AS BIGINT) AS n_members,
                     ROW_NUMBER() OVER (PARTITION BY cluster_id
                                        ORDER BY score DESC, doc_id) AS rn
              FROM scored) WHERE rn = 1
        """,
        'oov_rate': """
            -- vocab = top-1000 unigrams by (count DESC, token ASC), a
            -- total order so the cut is tie-stable; every doc appears
            -- (token-less docs score 0/0)
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
              FROM documents),
            vocab AS (
              SELECT tok FROM (
                SELECT tok, count(*) AS n FROM toks GROUP BY tok
                ORDER BY n DESC, tok LIMIT 1000)),
            per AS (
              SELECT t.doc_id,
                     CAST(count(*) AS BIGINT) AS n_tokens,
                     CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_oov
              FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
              GROUP BY t.doc_id)
            SELECT d.doc_id,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   coalesce(p.n_oov, 0) AS n_oov
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """,
        'bpe_pair_counts': """
            -- first BPE merge step: adjacent char pairs inside word
            -- tokens; (n DESC, pair ASC) is a total order (pair is the
            -- group key), so the LIMIT cut is tie-stable
            WITH words AS (
              SELECT unnest(regexp_extract_all(lower(text), '\\w+')) AS w
              FROM documents),
            prs AS (
              SELECT unnest(list_transform(
                  range(1, len(w)),
                  i -> substr(w, CAST(i AS INT), 2))) AS pair
              FROM words WHERE len(w) >= 2),
            counts AS (SELECT pair, CAST(count(*) AS BIGINT) AS n
                       FROM prs GROUP BY pair)
            SELECT pair, n FROM counts ORDER BY n DESC, pair LIMIT 100
        """,
        'gopher_filter': """
            -- Gopher composite quality rules; every threshold is an
            -- INTEGER comparison so the verdict is bit-stable vs the
            -- Ray kernel (no float boundaries).
            WITH f AS (
              SELECT doc_id, coalesce(text, '') AS tx,
                     regexp_extract_all(lower(coalesce(text, '')),
                                        '\\w+') AS ws
              FROM documents),
            m AS (
              SELECT doc_id,
                     CAST(len(ws) AS BIGINT) AS n_words,
                     CAST(coalesce(list_sum(list_transform(
                          ws, w -> len(w))), 0) AS BIGINT) AS sum_word_len,
                     CAST(len(list_filter(ws, w ->
                          regexp_matches(w, '[a-z]'))) AS BIGINT)
                          AS n_alpha_words,
                     CAST(len(tx) - len(replace(tx, '#', ''))
                          AS BIGINT) AS n_hash,
                     CAST((len(tx) - len(replace(tx, '...', ''))) // 3
                          AS BIGINT) AS n_dots,
                     list_filter(str_split(tx, chr(10)),
                                 l -> trim(l, ' ' || chr(9)) != '') AS lines
              FROM f),
            m2 AS (
              SELECT doc_id, n_words, sum_word_len, n_alpha_words,
                     n_hash, n_dots,
                     CAST(len(lines) AS BIGINT) AS n_lines,
                     CAST(len(list_filter(lines, l ->
                          starts_with(ltrim(l, ' ' || chr(9)), '- ') OR
                          starts_with(ltrim(l, ' ' || chr(9)), '* ') OR
                          starts_with(ltrim(l, ' ' || chr(9)), '• ')))
                          AS BIGINT) AS n_bullet,
                     CAST(len(list_filter(lines, l ->
                          ends_with(rtrim(l, ' ' || chr(9)), '...')))
                          AS BIGINT) AS n_ellipsis
              FROM m)
            SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_hash,
                   n_dots, n_lines, n_bullet, n_ellipsis,
                   CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                             AND 3 * n_words <= sum_word_len
                             AND sum_word_len <= 10 * n_words
                             AND 10 * (n_hash + n_dots) <= n_words
                             AND 5 * n_alpha_words >= 4 * n_words
                             AND 10 * n_bullet <= 9 * n_lines
                             AND 10 * n_ellipsis <= 3 * n_lines
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
            FROM m2
        """,
        'chunk_documents': """
            WITH base AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\\S+'))
                          AS BIGINT) AS n
              FROM documents),
            ch AS (
              SELECT doc_id, n,
                     unnest(range(0, CASE WHEN n = 0 THEN 0
                                  ELSE (n - 1) // 192 + 1 END)) AS chunk_id
              FROM base)
            SELECT doc_id, chunk_id,
                   least(256, n - chunk_id * 192) AS chunk_tokens
            FROM ch
        """,
        'dup_clusters': f"""
            WITH RECURSIVE {_shingle_jaccard_cte('documents')},
            edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            cc(node, lbl) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, c.lbl FROM edges e JOIN cc c ON e.v = c.node)
            SELECT node AS doc_id, MIN(lbl) AS cluster_id
            FROM cc GROUP BY node
        """,
        'clean_corpus_clustered': f"""
            WITH RECURSIVE clean AS (
              SELECT min(doc_id) AS doc_id FROM documents
              WHERE len(regexp_extract_all(lower(text), '\\w+')) >= 20
              GROUP BY md5(text)
            ), cdocs AS (
              SELECT d.doc_id, d.text
              FROM documents d JOIN clean c ON d.doc_id = c.doc_id
            ), {_shingle_jaccard_cte('cdocs')},
            edges AS (SELECT id_a AS u, id_b AS v FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            cc(node, lbl) AS (
              SELECT u, u FROM edges
              UNION
              SELECT e.u, c.lbl FROM edges e JOIN cc c ON e.v = c.node)
            SELECT doc_id FROM cdocs
            WHERE doc_id NOT IN (
              SELECT node FROM cc GROUP BY node
              HAVING node != MIN(lbl))
        """,
        'ngram_jaccard_dups': f"""
            WITH {_shingle_jaccard_cte('documents')}
            SELECT id_a, id_b, jaccard FROM pairs
        """,
        'clean_corpus_neardup': f"""
            WITH clean AS (
              SELECT min(doc_id) AS doc_id FROM documents
              WHERE len(regexp_extract_all(lower(text), '\\w+')) >= 20
              GROUP BY md5(text)
            ), cdocs AS (
              SELECT d.doc_id, d.text
              FROM documents d JOIN clean c ON d.doc_id = c.doc_id
            ), {_shingle_jaccard_cte('cdocs')}
            SELECT doc_id FROM cdocs
            WHERE doc_id NOT IN (SELECT greatest(id_a, id_b) FROM pairs)
        """,
        'simhash_fingerprints': f"""
            WITH {_simhash_cte('documents')}
            SELECT doc_id, simhash FROM fp
        """,
        # 4×16-bit band bucketing has exact recall for hamming <= 3
        # (pigeonhole: <= 3 flipped bits leave >= 1 of 4 bands intact),
        # and candidates verify exact hamming — so the dup list equals
        # exact all-pairs hamming <= 3
        'simhash_dups': f"""
            WITH {_simhash_cte('documents')}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
                       AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        'langid': _langid_sql(),
        'fingerprints': _fingerprints_sql(),
        'decontaminate': """
            -- word-8-gram overlap vs the held-out set (doc_id%100==0);
            -- <8-token docs contribute their whole token string
            -- (stages/dedup.py shingles() convention)
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\\w+') AS ts
                          FROM documents),
            sh AS (SELECT doc_id,
                     CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
                          WHEN len(ts) < 8 THEN [array_to_string(ts, ' ')]
                          ELSE list_distinct(list_transform(
                               range(1, len(ts) - 6),
                               i -> array_to_string(ts[i:i+7], ' '))) END
                       AS shs
                   FROM toks),
            ex AS (SELECT doc_id, unnest(shs) AS s FROM sh),
            ev AS (SELECT DISTINCT s FROM ex WHERE doc_id % 100 = 0)
            SELECT t.doc_id, CAST(count(DISTINCT t.s) AS BIGINT) AS n_overlap
            FROM ex t JOIN ev USING (s)
            WHERE t.doc_id % 100 <> 0 GROUP BY 1
        """,
        # order-0 KenLM proxy: mean token log-prob under the corpus
        # unigram distribution (ln/sum drift absorbed by round(4))
        'unigram_logprob': """
            WITH tk AS (SELECT doc_id,
                          unnest(regexp_extract_all(lower(text), '\\w+'))
                              AS w
                        FROM documents),
            tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tk),
            vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                      FROM tk GROUP BY w),
            per AS (SELECT t.doc_id,
                           CAST(count(*) AS BIGINT) AS n_tokens,
                           SUM(ln(v.c / (SELECT n FROM tot))) / count(*)
                               AS lp
                    FROM tk t JOIN vocab v USING (w)
                    GROUP BY t.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_tokens, 0) AS n_tokens,
                   round(COALESCE(p.lp, 0.0), 4) AS logprob_per_token
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """,
        # order-1 step toward the KenLM filter: mean ln P(w2|w1) with
        # add-0.1 smoothing over corpus bigram/unigram counts
        # (ln/sum drift absorbed by round(4), the unigram pattern)
        'bigram_logprob': """
            WITH tk AS (SELECT doc_id,
                          regexp_extract_all(lower(text), '\\w+') AS ts
                        FROM documents),
            uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
                    FROM (SELECT unnest(ts) AS w FROM tk) GROUP BY w),
            vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
            bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
                   FROM (SELECT doc_id, ts,
                                unnest(range(1, len(ts))) AS i
                         FROM tk WHERE len(ts) >= 2)),
            bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                   FROM bg GROUP BY w1, w2),
            per AS (SELECT g.doc_id,
                           CAST(count(*) AS BIGINT) AS n_bigrams,
                           SUM(ln((bc.c2 + 0.1)
                                  / (u.c + 0.1 * (SELECT v FROM vv))))
                             / count(*) AS lp
                    FROM bg g
                    JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
                    JOIN uni u ON u.w = g.w1
                    GROUP BY g.doc_id)
            SELECT d.doc_id,
                   COALESCE(p.n_bigrams, 0) AS n_bigrams,
                   round(COALESCE(p.lp, 0.0), 4) AS bigram_logprob
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        """,
        # ExactSubstr (Lee et al. 2022) as positional word-16-grams:
        # every (doc, pos) whose span text repeats corpus-wide
        'repeated_spans': """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\\w+') AS ts
                          FROM documents),
            ex AS (SELECT doc_id,
                          unnest(range(1, len(ts) - 14)) AS i, ts
                   FROM toks WHERE len(ts) >= 16),
            sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                          array_to_string(ts[i:i+15], ' ') AS s
                   FROM ex),
            cnt AS (SELECT s, CAST(count(*) AS BIGINT) AS n_occurrences
                    FROM sp GROUP BY s)
            SELECT doc_id, pos, n_occurrences
            FROM sp JOIN cnt USING (s) WHERE n_occurrences >= 2
        """,
        # full ExactSubstr cleaning: merged covering intervals
        # (gaps-and-islands) over the flagged positions, tokens
        # outside any interval re-joined in order
        'remove_repeated_spans': """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\\w+') AS ts
                          FROM documents),
            ex AS (SELECT doc_id, unnest(range(1, len(ts) - 14)) AS i, ts
                   FROM toks WHERE len(ts) >= 16),
            sp AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                          array_to_string(ts[i:i+15], ' ') AS s
                   FROM ex),
            cnt AS (SELECT s FROM sp GROUP BY s HAVING count(*) >= 2),
            flag AS (SELECT doc_id, pos, pos + 16 AS e
                     FROM sp JOIN cnt USING (s)),
            ordd AS (SELECT doc_id, pos, e,
                     max(e) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pm
                     FROM flag),
            isl AS (SELECT doc_id, pos, e,
                    SUM(CASE WHEN pm IS NULL OR pos > pm
                             THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY pos) AS island
                    FROM ordd),
            ivl AS (SELECT doc_id, island, min(pos) AS s0, max(e) AS e0
                    FROM isl GROUP BY 1, 2),
            tk AS (SELECT doc_id, unnest(ts) AS w,
                          CAST(unnest(range(0, len(ts))) AS BIGINT)
                              AS idx
                   FROM toks),
            keep AS (SELECT t.doc_id, t.w, t.idx FROM tk t
                     LEFT JOIN ivl v ON v.doc_id = t.doc_id
                                    AND t.idx >= v.s0 AND t.idx < v.e0
                     WHERE v.s0 IS NULL),
            agg AS (SELECT doc_id,
                           CAST(count(*) AS BIGINT) AS n_tokens_kept,
                           string_agg(w, ' ' ORDER BY idx) AS text_clean
                    FROM keep GROUP BY doc_id),
            nt AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n FROM toks)
            SELECT d.doc_id,
                   COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept,
                   nt.n - COALESCE(a.n_tokens_kept, 0)
                       AS n_tokens_removed,
                   COALESCE(a.text_clean, '') AS text_clean
            FROM documents d JOIN nt USING (doc_id)
            LEFT JOIN agg a ON a.doc_id = d.doc_id
        """,
        'repetition': """
            -- Gopher-style repetition: share of a doc's word bigrams
            -- taken by its most frequent bigram (<2-token docs: 0)
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\\w+') AS ts
                          FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_transform(range(1, len(ts)),
                                i -> array_to_string(ts[i:i+1], ' '))) AS g2
                  FROM toks WHERE len(ts) >= 2),
            c AS (SELECT doc_id, g2, count(*) AS c FROM g GROUP BY 1, 2),
            m AS (SELECT doc_id, max(c) AS mc,
                         CAST(sum(c) AS BIGINT) AS tot
                  FROM c GROUP BY 1)
            SELECT d.doc_id,
                   CAST(COALESCE(m.mc, 0) AS BIGINT) AS top_bigram_count,
                   COALESCE(CAST(m.mc AS DOUBLE) / m.tot, 0.0)
                       AS top_bigram_frac
            FROM documents d LEFT JOIN m USING (doc_id)
        """,
        # PII redaction: the oracle rebuilds the page html by
        # construction (docs_pages.py is a pure function of doc_id)
        # and applies the SAME RE2 patterns — a dual implementation
        # of the redaction semantics (Python re vs DuckDB RE2)
        'redact_pii': _redact_pii_sql(),
        # web-graph inversion / host graph: the oracle enumerates the
        # by-construction link graph (docs_pages.py — each page links
        # its tree children as l0/l1/l2 plus query/cross/media)
        'inlink_anchors': """
            WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                       FROM documents),
            links AS (
              SELECT 'http://src' || h || '.com/d/' || doc_id AS url,
                     'l' || ((k - 1) % 3) AS anchor
              FROM d WHERE k >= 1
              UNION ALL
              SELECT 'http://src' || h || '.com/q/' || doc_id
                       || '?a=1&b=2', 'query' FROM d
              UNION ALL
              SELECT 'http://src' || (h + 1) % 8 || '.com/x/' || doc_id,
                     'cross' FROM d
              UNION ALL
              SELECT 'http://src' || h || '.com/img/' || doc_id
                       || '.png', 'media' FROM d)
            SELECT url, CAST(count(*) AS BIGINT) AS n_inlinks,
                   string_agg(DISTINCT anchor, ',' ORDER BY anchor)
                       AS anchors
            FROM links GROUP BY url
        """,
        'host_graph': """
            WITH nd AS (SELECT count(*) AS n FROM documents),
            d AS (SELECT doc_id, doc_id % 8 AS h FROM documents),
            c AS (SELECT h,
                    LEAST(3, GREATEST(0, CAST(floor(
                      ((SELECT n FROM nd) - 1 - (3 * doc_id - 2 * h))
                      / 8.0) AS BIGINT))) + 2 AS same_links
                  FROM d)
            SELECT 'src' || h || '.com' AS src_host,
                   'src' || h || '.com' AS dst_host,
                   CAST(sum(same_links) AS BIGINT) AS n_links
            FROM c GROUP BY h
            UNION ALL
            SELECT 'src' || h || '.com', 'src' || (h + 1) % 8 || '.com',
                   CAST(count(*) AS BIGINT)
            FROM d GROUP BY h
        """,
        'pagerank': _pagerank_sql(),
        'hits': _hits_sql(),
        # Dataset-returning corpus-scale surface: same values as the
        # table-returning counterparts (tiers + the two-level-fold
        # normalizer are test-pinned equal at the 1e-6 output
        # rounding), so they share those oracles
        'pagerank_ds': _pagerank_sql(),
        'hits_ds': _hits_sql(),
        'inlink_anchors_ds': """
            WITH d AS (SELECT doc_id, doc_id % 8 AS h, doc_id // 8 AS k
                       FROM documents),
            links AS (
              SELECT 'http://src' || h || '.com/d/' || doc_id AS url,
                     'l' || ((k - 1) % 3) AS anchor
              FROM d WHERE k >= 1
              UNION ALL
              SELECT 'http://src' || h || '.com/q/' || doc_id
                       || '?a=1&b=2', 'query' FROM d
              UNION ALL
              SELECT 'http://src' || (h + 1) % 8 || '.com/x/' || doc_id,
                     'cross' FROM d
              UNION ALL
              SELECT 'http://src' || h || '.com/img/' || doc_id
                       || '.png', 'media' FROM d)
            SELECT url, CAST(count(*) AS BIGINT) AS n_inlinks,
                   string_agg(DISTINCT anchor, ',' ORDER BY anchor)
                       AS anchors
            FROM links GROUP BY url
        """,
        # CCNet perplexity bucketing: per-lang unigram cross-entropy,
        # NTILE(3) head/middle/tail per language (ties by doc_id, so
        # the tile assignment is float-drift-proof; ce drift absorbed
        # by round(6), the unigram_logprob pattern)
        'perplexity_buckets': """
            WITH tk AS (SELECT doc_id, lang,
                          unnest(regexp_extract_all(lower(text), '\\w+'))
                              AS w
                        FROM documents),
            lt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
                   FROM tk GROUP BY lang),
            vocab AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS c
                      FROM tk GROUP BY lang, w),
            per AS (SELECT t.doc_id, -SUM(ln(v.c / lt.n)) / count(*) AS ce
                    FROM tk t
                    JOIN vocab v ON t.lang = v.lang AND t.w = v.w
                    JOIN lt ON lt.lang = t.lang
                    GROUP BY t.doc_id),
            ced AS (SELECT d.doc_id, d.lang,
                           round(COALESCE(p.ce, 0.0), 6) AS ce
                    FROM documents d LEFT JOIN per p USING (doc_id)),
            tiled AS (SELECT doc_id, lang, ce,
                             CAST(NTILE(3) OVER (PARTITION BY lang
                                      ORDER BY ce, doc_id) AS BIGINT)
                                 AS tile
                      FROM ced)
            SELECT doc_id, lang, ce, tile,
                   CASE WHEN tile = 1 THEN 'head'
                        WHEN tile = 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM tiled
        """,
        # domain-level filter: keep docs whose source's mean token
        # count strictly exceeds the corpus mean (exact HUGEINT
        # cross-multiplication — no float threshold)
        'source_quality_filter': """
            WITH tk AS (SELECT doc_id, source,
                          CAST(len(regexp_extract_all(lower(text),
                                                      '\\w+')) AS BIGINT)
                              AS n
                        FROM documents),
            s AS (SELECT source, SUM(n) AS sn, count(*) AS cnt
                  FROM tk GROUP BY source),
            tot AS (SELECT SUM(n) AS tsn, count(*) AS tcnt FROM tk)
            SELECT t.doc_id, t.source,
                   round(CAST(s.sn AS DOUBLE) / s.cnt, 6)
                       AS src_mean_tokens
            FROM tk t JOIN s USING (source), tot
            WHERE s.sn * tot.tcnt > tot.tsn * s.cnt
        """,
        # approximate-family quality gates: the Ray side MEASURES the
        # sketch/index against the exact computation and emits integer
        # pass-evidence; the oracle states the exact-side values and
        # the all-pass flags, so a quality regression goes driver-red
        'knn_ivf_recall': """
            SELECT CAST(q AS BIGINT) AS query_id,
                   CAST(1 AS BIGINT) AS recall_ok
            FROM range(8) t(q)
        """,
        'hll_user_counts': """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
                   CAST(1 AS BIGINT) AS within_bound
            FROM events GROUP BY event_type
        """,
        'heavy_hitter_tokens': """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '\\w+'))
                     AS token
              FROM documents)
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY token
            HAVING count(*) * 50 > (SELECT count(*) FROM toks)
        """,
        'kll_token_quantiles': """
            SELECT * FROM (VALUES
              ('p10', CAST(1 AS BIGINT)), ('p25', CAST(1 AS BIGINT)),
              ('p50', CAST(1 AS BIGINT)), ('p75', CAST(1 AS BIGINT)),
              ('p90', CAST(1 AS BIGINT)))
            t(q_label, within_bound)
        """,
        'robots_filter': _robots_filter_sql(),
        # stream-to-stream as-of (attribution): latest same-user
        # purchase at or before each click; ties -> max event_id
        'events_asof_match': """
            WITH p AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'click'),
            b AS (SELECT event_id, ts, user_id, value FROM events
                  WHERE event_type = 'purchase')
            SELECT p.event_id,
                   COALESCE(m.event_id, -1) AS matched_purchase_id,
                   COALESCE(m.value, 0.0) AS matched_value
            FROM p LEFT JOIN LATERAL (
              SELECT b.event_id, b.value FROM b
              WHERE b.user_id = p.user_id AND b.ts <= p.ts
              ORDER BY b.ts DESC, b.event_id DESC LIMIT 1) m ON TRUE
        """,
        'sample_stratified': """
            SELECT doc_id, lang, CAST(rn AS BIGINT) AS rank
            FROM (SELECT doc_id, lang, row_number() OVER (
                    PARTITION BY lang
                    ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)),
                             doc_id) AS rn
                  FROM documents)
            WHERE rn <= 50
        """,
        # ranking is integer-only (tf desc, df asc, term) so the
        # compare never rides on float ties; score checked via round(6)
        'tfidf_top_terms': """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '\\w+') AS ts
                          FROM documents),
            tfr AS (SELECT doc_id, unnest(ts) AS term FROM toks),
            tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                    FROM tfr GROUP BY 1, 2),
            dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                    FROM tfc GROUP BY term),
            nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
            r AS (SELECT doc_id, term, tf, df,
                    row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, df ASC, term ASC) AS rn
                  FROM tfc JOIN dfc USING (term))
            SELECT doc_id, term, tf, df, CAST(rn AS BIGINT) AS rank,
                   round(tf * ln((SELECT n FROM nd) / df), 6) AS score
            FROM r WHERE rn <= 3
        """,
        'shuffle_assign': """
            WITH p AS (
              SELECT doc_id, row_number() OVER (
                ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)
                                          || ':shuffle'), doc_id) - 1
                  AS pos
              FROM documents)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST(pos // 256 AS BIGINT) AS shard
            FROM p
        """,
        'reservoir_sample': """
            -- deterministic exact-k sample: smallest k md5 keys
            SELECT doc_id, source FROM documents
            ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
            LIMIT 100
        """,
        'train_test_split': """
            -- exact per-source test counts: first n//10 docs per
            -- source in (md5_number_lower, doc_id) order are 'test'
            WITH r AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY md5_number_lower(
                                      CAST(doc_id AS VARCHAR)),
                                  doc_id) AS rk,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM documents)
            SELECT doc_id,
                   CASE WHEN rk <= n // 10 THEN 'test' ELSE 'train'
                   END AS split
            FROM r
        """,
        'sample_hash': """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 100 < 10
        """,
        'clean_corpus_quantile': """
            WITH n AS (SELECT doc_id, lang,
                         CAST(len(regexp_extract_all(lower(text), '\\w+'))
                              AS BIGINT) AS n_tokens
                       FROM documents),
            thr AS (SELECT lang, quantile_cont(n_tokens, 0.25) AS p25
                    FROM n GROUP BY lang)
            SELECT n.doc_id, n.lang, n.n_tokens
            FROM n JOIN thr USING (lang)
            WHERE n.n_tokens >= thr.p25
        """,
        'token_quantiles': """
            SELECT lang, quantile_cont(n_tok, 0.25) AS p25,
                   quantile_cont(n_tok, 0.5) AS p50,
                   quantile_cont(n_tok, 0.75) AS p75
            FROM (SELECT lang,
                         len(regexp_extract_all(lower(text), '\\w+')) AS n_tok
                  FROM documents)
            GROUP BY lang
        """,
    }


_KNN_JOIN_SQL = """
    -- exact cosine 5-NN self-join, rank-only output: cosine VALUES
    -- are excluded because DuckDB's list_cosine_similarity
    -- accumulates in float32 (≤2.4e-7 off the engine's float64
    -- matmul — no rounding makes the hashes match), while rank ORDER
    -- is stable: measured adjacent top-k gaps ≥1.4e-6 at every sf
    -- (the knn_query0 contract); ties by neighbor_id
    WITH pairs AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.embedding, b.embedding) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT vec_id, neighbor_id,
             CAST(row_number() OVER (
                 PARTITION BY vec_id
                 ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
      FROM pairs
    )
    SELECT vec_id, rank, neighbor_id
    FROM ranked WHERE rank <= 5
"""

_KNN_EXACT_SQL = """
    SELECT vec_id, CAST(row_number() OVER (
               ORDER BY list_cosine_similarity(
                   embedding,
                   (SELECT embedding FROM embeddings WHERE vec_id = 0)
               ) DESC, vec_id) AS BIGINT) AS rank
    FROM embeddings ORDER BY rank LIMIT 10
"""
