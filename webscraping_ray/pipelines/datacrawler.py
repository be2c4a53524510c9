"""Best-first data crawler (reference ``DataCrawler``, download.py:1051-1126).

The reference's best-first search is inherently sequential: pop the
lowest-``link_score`` url, fetch, extract matches via ``extract_fn``,
insert-sort new same-site links, stop at ``max_urls`` / ``max_results``.
We preserve those semantics exactly (they define the result set) and
use the corpus store's batched lookup as the fetch: the top-``prefetch``
queue entries are fetched together each step, which changes nothing
observable (processing order is still strict queue order; prefetched
pages are just warm).

``get_emails`` / ``get_phones`` (reference download.py:500-504) are the
canonical instantiations.
"""

from __future__ import annotations

import urllib.parse

import pyarrow as pa

from ..kernels import extract as E
from ..kernels import text as T
from ..kernels import urls as U
from ..oracle.refcrawl import crawl_oracle  # noqa: F401  (shared semantics doc)


class DataCrawlerRay:
    def __init__(self, corpus, prefetch: int = 32):
        """corpus: CorpusStore | pyarrow.Table | dict url->html."""
        self.corpus = corpus
        self.prefetch = prefetch
        self._cache = {}

    def _fetch_many(self, urls):
        missing = [u for u in urls if u not in self._cache]
        if missing:
            if isinstance(self.corpus, dict):
                for u in missing:
                    self._cache[u] = self.corpus.get(u)
            elif isinstance(self.corpus, pa.Table):
                import pyarrow.compute as pc
                tbl = self.corpus.filter(pc.is_in(
                    self.corpus.column('url'),
                    value_set=pa.array(missing, pa.string())))
                got = dict(zip(tbl.column('url').to_pylist(),
                               tbl.column('html').to_pylist()))
                for u in missing:
                    self._cache[u] = got.get(u)
            else:
                tbl = self.corpus.lookup_table(missing, columns=['url', 'html'])
                got = {} if tbl is None else dict(
                    zip(tbl.column('url').to_pylist(),
                        tbl.column('html').to_pylist()))
                for u in missing:
                    self._cache[u] = got.get(u)

    def find(self, website, extract_fn, max_depth=1, max_urls=10,
             max_results=1, max_links=100):
        """Reference ``DataCrawler.find`` semantics (download.py:1080-1126).

        Returns the ordered, deduped list of extract_fn matches.
        """
        domain = urllib.parse.urlparse(website).netloc
        parent_domain_of = {}
        found = {}          # CrawlerCallback.found analog (url-hash -> depth)
        scraped = set()
        outstanding = [(0, website)]
        results = []
        while outstanding and (max_urls is None or len(scraped) < max_urls) \
                and (max_results is None or len(results) < max_results):
            # speculative prefetch of the queue head (order-neutral)
            self._fetch_many([u for _, u in outstanding[:self.prefetch]])
            _, url = outstanding.pop(0)
            scraped.add(U.url_hash64(url))
            raw = self._cache.get(url)
            page = T.html_to_unicode(raw) if raw is not None else ''
            if page:
                for result in extract_fn(page):
                    if result not in results:
                        results.append(result)
                        if len(results) == max_results:
                            break
                # crawl links (CrawlerCallback.crawl semantics)
                h = U.url_hash64(url)
                if h in found:
                    depth = found[h]
                else:
                    found[h] = 0
                    depth = 0
                page_domain = T.get_domain(url)
                links = []
                if depth != max_depth:
                    for link in U.extract_raw_links(page):
                        try:
                            link = U.normalize_url(url, link)
                        except UnicodeDecodeError:
                            continue
                        lh = U.url_hash64(link)
                        if lh not in found:
                            found[lh] = depth + 1
                            if U.link_valid(link, page_domain):
                                links.append(link)
                                if len(links) == max_links:
                                    break
                for link in links:
                    if urllib.parse.urlparse(link).netloc == domain:
                        if U.url_hash64(link) not in scraped:
                            # insert-sort by link_score (reference
                            # download.py:1118-1125)
                            score = U.link_score(link)
                            for i, (other_score, _) in enumerate(outstanding):
                                if score < other_score:
                                    outstanding.insert(i, (score, link))
                                    break
                            else:
                                outstanding.append((score, link))
        return results

    def get_emails(self, website, max_depth=1, max_urls=10, max_emails=1):
        """Reference Download.get_emails (download.py:500-501)."""
        return self.find(website, E.extract_emails, max_depth, max_urls,
                         max_emails)

    def get_phones(self, website, max_depth=1, max_urls=10, max_phones=1):
        """Reference Download.get_phones (download.py:503-504)."""
        return self.find(website, E.extract_phones, max_depth, max_urls,
                         max_phones)
