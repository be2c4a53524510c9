"""The extraction stage: html → text (+ links/emails/phones/excerpt).

This is the engine's hot stage (SURVEY.md §7 M1): one callable class
per concern, designed for ``ds.map_batches(Cls(), batch_format='pyarrow',
concurrency=N)``.  All regexes/kernels are compiled at import time;
actor ``__init__`` holds configuration only, so the per-batch body is a
tight loop over the html column.

Byte contract: the ``text`` output of :class:`ExtractPages` is
byte-identical to the reference pipeline
``common.normalize(common.remove_tags(html))`` after charset-sniffed
decode (reference common.py:109-116, 220-334).
"""

from __future__ import annotations

import pyarrow as pa

from ..kernels import extract as E
from ..kernels import text as T
from ..kernels import urls as U


def page_text(html) -> str:
    """Decode + normalize one page (the ``text`` column kernel)."""
    return T.normalize(T.html_to_unicode(html))


class ExtractPages:
    """html → text, raw links (document order), contacts, excerpt.

    Options mirror the reference callback surface
    (``CrawlerCallback``, reference download.py:949-1048 and ``alg``
    extractors):

    with_links:   raw hrefs via the crawl regex (download.py:1033)
    with_contacts: emails + phones (alg.py:29-82)
    with_excerpt: meta-description-else-largest-block (alg.py:7-25)
    """

    def __init__(self, with_links: bool = True, with_contacts: bool = False,
                 with_excerpt: bool = False, max_size: int | None = None,
                 force_html: bool = False, with_redirect: bool = False):
        self.with_links = with_links
        self.with_contacts = with_contacts
        self.with_excerpt = with_excerpt
        self.max_size = max_size
        self.force_html = force_html
        self.with_redirect = with_redirect

    def __call__(self, batch: pa.Table) -> pa.Table:
        if 'page' in batch.column_names:
            # pre-decoded page text (redirect-resolved re-extraction)
            pages_in = batch.column('page').to_pylist()
        else:
            pages_in = [T.html_to_unicode(raw) if raw is not None else ''
                        for raw in batch.column('html').to_pylist()]
        urls_in = batch.column('url').to_pylist()
        texts, links, emails, phones, excerpts, statuses = [], [], [], [], [], []
        redirects = []
        for url, page in zip(urls_in, pages_in):
            # _clean_content semantics (reference download.py:322-342)
            status = 200
            if self.max_size is not None and len(page) > self.max_size:
                page, status = '', 413
            elif self.force_html and not T.is_html(page):
                page, status = '', 415
            statuses.append(status)
            texts.append(T.normalize(page))
            if self.with_links:
                links.append(U.extract_raw_links(page))
            if self.with_contacts:
                emails.append(E.extract_emails(page))
                phones.append(E.extract_phones(page))
            if self.with_excerpt:
                excerpts.append(E.get_excerpt(page, try_meta=True))
            if self.with_redirect:
                redirects.append(U.get_redirect(url, page) or '')

        out = {'url': batch.column('url'),
               'text': pa.array(texts, pa.large_string()),
               'status': pa.array(statuses, pa.int32())}
        if self.with_redirect:
            out['redirect'] = pa.array(redirects, pa.string())
        if self.with_links:
            out['raw_links'] = pa.array(links, pa.list_(pa.string()))
        if self.with_contacts:
            out['emails'] = pa.array(emails, pa.list_(pa.string()))
            out['phones'] = pa.array(phones, pa.list_(pa.string()))
        if self.with_excerpt:
            out['excerpt'] = pa.array(excerpts, pa.string())
        # carry through columns the caller joined in (wave metadata)
        for name in batch.column_names:
            if name not in out and name not in ('html', 'page'):
                out[name] = batch.column(name)
        return pa.table(out)


class CanonicalizeLinks:
    """raw_links → canonical links + per-link metadata.

    Applies ``CrawlerCallback.normalize`` (reference download.py:987-1004)
    to every href against its page url, preserving document order and
    attaching ``link_idx``.  Emits one row per (page, link) via a list
    column the caller can explode, or flattened directly when
    ``explode=True``.
    """

    def __init__(self, explode: bool = False):
        self.explode = explode

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column('url').to_pylist()
        rawss = batch.column('raw_links').to_pylist()
        if not self.explode:
            def safe_norm(u, raws):
                out = []
                for l in (raws or []):
                    try:
                        out.append(U.normalize_url(u, l))
                    except UnicodeDecodeError:
                        continue  # reference skips undecodable links
                return out
            canon = [safe_norm(u, raws) for u, raws in zip(urls, rawss)]
            return batch.set_column(
                batch.schema.get_field_index('raw_links'), 'links',
                pa.array(canon, pa.list_(pa.string())))
        out_url, out_link, out_idx = [], [], []
        for u, raws in zip(urls, rawss):
            for i, l in enumerate(raws or []):
                try:
                    out_link.append(U.normalize_url(u, l))
                except UnicodeDecodeError:
                    continue  # reference skips undecodable links (download.py:1037)
                out_url.append(u)
                out_idx.append(i)
        return pa.table({'url': pa.array(out_url, pa.string()),
                         'link': pa.array(out_link, pa.string()),
                         'link_idx': pa.array(out_idx, pa.int32())})


class GetLinksStage:
    """``xpath.get_links`` as a batch stage (reference xpath.py:515-555).

    The alternate link extractor (a/@href + iframe/@src + JS
    location.href), with local/external filtering.
    """

    def __init__(self, local: bool = True, external: bool = True):
        self.local = local
        self.external = external

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import xpath as X
        urls = batch.column('url').to_pylist()
        htmls = batch.column('html').to_pylist()
        links = [X.get_links(T.html_to_unicode(h) if h is not None else '', u,
                             local=self.local, external=self.external)
                 for u, h in zip(urls, htmls)]
        return pa.table({'url': batch.column('url'),
                         'links': pa.array(links, pa.list_(pa.string()))})


class XPathStage:
    """Evaluate fixed xpaths per page → one string column per xpath.

    XPaths are parsed once per actor (reference parses per Doc; hoisted
    here per SURVEY §2.2 guidance).
    """

    def __init__(self, xpaths: dict, first_only: bool = True):
        self.xpaths = dict(xpaths)
        self.first_only = first_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels import xpath as X
        htmls = batch.column('html').to_pylist()
        cols = {name: [] for name in self.xpaths}
        for h in htmls:
            page = T.html_to_unicode(h) if h is not None else ''
            doc = X.Doc(page)
            for name, xp in self.xpaths.items():
                if self.first_only:
                    cols[name].append(doc.get(xp))
                else:
                    cols[name].append(doc.search(xp))
        out = {'url': batch.column('url')}
        for name, vals in cols.items():
            if self.first_only:
                out[name] = pa.array(vals, pa.string())
            else:
                out[name] = pa.array(vals, pa.list_(pa.string()))
        return pa.table(out)
