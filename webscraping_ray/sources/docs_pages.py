"""Deterministic page corpus derived from the driver's ``documents``
table — the bridge between the testdata tables and the crawl engine.

Each document becomes one web page whose url, title, links, and
embedded contacts are pure functions of ``doc_id``, so a SQL oracle can
reconstruct the expected extraction outputs by construction while the
engine exercises the real kernels (xpath, email de-obfuscation, link
canonicalization, BFS crawling).

Link graph (N docs, H hosts, branching B): host ``h = doc_id % H``
holds docs with local index ``k = doc_id // H`` forming a B-ary tree in
level order — the unique tree parent of local ``k >= 1`` is
``(k - 1) // B``.  A unique parent per doc makes the BFS depth /
visit-order / link-count of the flagship crawl expressible as a DuckDB
recursive CTE (the ``crawl_bfs`` oracle) while the page html still
exercises every kernel quirk:

- child m=1 carries a ``#top`` fragment (urldefrag canonicalization),
- child m=2 is written absolute, child m=3 relative (urljoin),
- a ``/q/{id}?a=1&amp;b=2`` link per page: entity unescaping, valid and
  followed but missing from the corpus → a deterministic 404 visit,
- a cross-host ``/x/{id}`` link: filtered by the same-domain check
  (registered-but-not-followed, the reference's found bookkeeping),
- a ``/img/{id}.png`` link: filtered by the media-extension check.

Layout of non-link content (unchanged from round 1):
- email:  'user{doc_id} AT example DOT com' on doc_id % 3 == 0
- phone:  '(555) 010-{doc_id%10000:04d}' on doc_id % 5 == 0
- title:  'Doc {doc_id}'; meta description 'Doc {doc_id} summary'
"""

from __future__ import annotations

import pyarrow as pa

N_HOSTS = 8
BRANCH = 3


def doc_url(doc_id: int) -> str:
    return 'http://src%d.com/d/%d' % (doc_id % N_HOSTS, doc_id)


def doc_children(doc_id: int, n_docs: int):
    """Same-host tree children of ``doc_id`` (unique-parent B-ary tree
    in per-host local index space)."""
    h = doc_id % N_HOSTS
    k = doc_id // N_HOSTS
    out = []
    for m in range(1, BRANCH + 1):
        j = h + N_HOSTS * (BRANCH * k + m)
        if j < n_docs:
            out.append(j)
    return out


def doc_html(doc_id: int, text: str, n_docs: int) -> bytes:
    h = doc_id % N_HOSTS
    parts = ['<html><head><meta charset=utf-8><title>Doc %d</title>' % doc_id,
             '<meta name="description" content="Doc %d summary">' % doc_id,
             '</head><body><h1>Doc %d</h1>' % doc_id,
             '<!-- generated -->',
             '<p>%s</p>' % text]
    if doc_id % 3 == 0:
        parts.append('<p>contact: user%d AT example DOT com</p>' % doc_id)
    if doc_id % 5 == 0:
        parts.append('<p>call (555) 010-%04d</p>' % (doc_id % 10000))
    for m, j in enumerate(doc_children(doc_id, n_docs)):
        if m == 0:
            parts.append('<a href="/d/%d#top">l%d</a>' % (j, m))
        elif m == 1:
            parts.append('<a href="http://src%d.com/d/%d">l%d</a>' % (j % N_HOSTS, j, m))
        else:
            parts.append('<a href="/d/%d">l%d</a>' % (j, m))
    parts.append('<a href="/q/%d?a=1&amp;b=2">query</a>' % doc_id)
    parts.append('<a href="http://src%d.com/x/%d">cross</a>' % ((h + 1) % N_HOSTS, doc_id))
    parts.append('<a href="/img/%d.png">media</a>' % doc_id)
    parts.append('</body></html>')
    return ''.join(parts).encode('utf-8')


class DocsToPages:
    """map_batches: documents rows → pages rows (url, html, doc_id)."""

    def __init__(self, n_docs: int):
        self.n_docs = n_docs

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('doc_id').to_pylist()
        texts = batch.column('text').to_pylist()
        return pa.table({
            'doc_id': pa.array(ids, pa.int64()),
            'url': pa.array([doc_url(i) for i in ids], pa.string()),
            'html': pa.array([doc_html(i, t, self.n_docs)
                              for i, t in zip(ids, texts)], pa.binary()),
        })


def pages_ds_from_documents(sf_dir: str):
    """Lazy Dataset of pages derived from {sf_dir}/documents.parquet."""
    import pyarrow.parquet as pq
    import ray.data

    n_docs = pq.ParquetFile(f'{sf_dir}/documents.parquet').metadata.num_rows
    docs = ray.data.read_parquet(f'{sf_dir}/documents.parquet',
                                 columns=['doc_id', 'text'])
    return docs.map_batches(DocsToPages(n_docs), batch_format='pyarrow'), n_docs


def pages_table_from_documents(sf_dir: str) -> tuple:
    """Driver-side (pages pyarrow.Table, n_docs) for crawl input."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f'{sf_dir}/documents.parquet',
                         columns=['doc_id', 'text'])
    n_docs = docs.num_rows
    return DocsToPages(n_docs)(docs), n_docs
