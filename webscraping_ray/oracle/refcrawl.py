"""Sequential reference-semantics crawler (the byte-identity oracle).

Replicates ``download.threaded_get`` with one thread and FIFO order
(BFS — the north rule's pinned ordering; reference download.py:811
``popleft()`` when ``depth=False``) driving ``CrawlerCallback.crawl``
(reference download.py:1007-1048) over an in-memory corpus:

- pop url (FIFO) → "fetch" = corpus dict lookup (cache-hit semantics,
  download.py:195-219; miss → default '')
- ``depth = found[url]`` with defaultdict-int getitem registration
  (download.py:1029 via adt.HashDict(int))
- links via regex ``<a[^>]+href=["'](.*?)["']`` in document order
  (download.py:1033), normalized (download.py:987-1004), first-seen
  registered at depth+1 (download.py:1041-1042), validity-filtered
  (download.py:1010-1026), capped at max_links with loop break
  (download.py:1046-1047)
- appended to the queue in discovery order.

``found`` keys are ``url_hash64`` values so collisions (if any) are
identical to the engine's — mirroring how the reference itself keys by
64-bit ``hash()`` (adt.py:71-74).
"""

from __future__ import annotations

import re
from collections import deque

from ..kernels import text as T
from ..kernels import urls as U


def crawl_oracle(corpus: dict, seeds, max_depth: int = 1, max_links: int = 100,
                 allowed_urls: str = '', banned_urls: str = '^$',
                 robots=None, delay: float = 5.0, num_redirects: int = 0,
                 clock: str = 'frozen'):
    """Crawl the in-memory corpus {url: html_bytes} from ``seeds``.

    Returns (visits, found) where visits is a list of dicts
    (url, depth, visit_order, status, scheduled_ts, links) in crawl
    order and found is the url-hash -> depth registry.

    ``clock``: ``'frozen'`` (every wave starts at t=0; each host's
    timeline is an independent pacing contract) or ``'continuous'``
    (reference download.py:454-473 single wall clock: a BFS wave's
    fetches run concurrently, so wave k+1 starts at wave k's max
    scheduled slot and no fetch is ever scheduled before a fetch of an
    earlier wave).
    """
    allowed_re = re.compile(allowed_urls)
    banned_re = re.compile(banned_urls)
    found = {}          # url_hash64 -> depth  (adt.HashDict(int) semantics)
    queue = deque(seeds)
    visits = []
    visit_order = 0
    # virtual politeness clock (variance=0), per host
    next_ok = {}
    wave_start = 0.0
    wave_max = 0.0
    remaining_in_wave = len(queue)   # wave boundary bookkeeping

    while queue:
        if remaining_in_wave == 0:
            # all of the previous wave popped: its emissions are the
            # next wave
            remaining_in_wave = len(queue)
            if clock == 'continuous':
                wave_start = wave_max
        url = queue.popleft()
        remaining_in_wave -= 1
        host = T.get_domain(url)
        scheduled = max(next_ok.get(host, wave_start), wave_start)
        next_ok[host] = scheduled + delay
        wave_max = max(wave_max, scheduled)

        raw = corpus.get(url)
        page = T.html_to_unicode(raw) if raw is not None else ''
        status = 200 if raw is not None else 404
        # meta-redirect chase (reference download.py:254-268): follow up
        # to num_redirects hops; the final html's relative hrefs are
        # joined against the last hop's source url
        final_url = url
        n = num_redirects
        parent = url
        while n > 0 and page:
            r = U.get_redirect(final_url, page)
            if not r:
                break
            parent = final_url
            final_url = r
            raw2 = corpus.get(r)
            page = T.html_to_unicode(raw2) if raw2 is not None else ''
            n -= 1
        if final_url != url and page:
            page = U.rewrite_relative_hrefs(page, parent)

        h = U.url_hash64(url)
        if h in found:
            depth = found[h]
        else:
            found[h] = 0      # getitem on HashDict(int) registers default 0
            depth = 0

        outstanding = []
        if depth != max_depth:
            for link in U.extract_raw_links(page):
                try:
                    link = U.normalize_url(url, link)
                except UnicodeDecodeError:
                    continue
                lh = U.url_hash64(link)
                if lh not in found:
                    found[lh] = depth + 1
                    if U.link_valid(link, host, allowed_re, banned_re, robots):
                        outstanding.append(link)
                        if len(outstanding) == max_links:
                            break
        queue.extend(outstanding)
        visits.append({
            'url': url,
            'final_url': final_url,
            'depth': depth,
            'visit_order': visit_order,
            'status': status,
            'scheduled_ts': scheduled,
            'text': T.normalize(page),
            'links': outstanding,
        })
        visit_order += 1
    return visits, found


class StopCrawl(Exception):
    """Raise from a ``cb`` to halt the crawl (reference
    download.py:769-772; the visit that raised still records, its
    links are discarded, and no further url is processed)."""


def crawl_cb_oracle(corpus: dict, seeds, cb, max_urls=None, max_errors=None,
                    delay: float = 5.0, depth_first: bool = False):
    """Sequential oracle for the user-callback crawl surface
    (reference threaded_get, download.py:775-841 single-threaded).

    ``cb(url, page) -> iterable of urls`` — returned urls enqueue
    verbatim (no normalization/validity chain: that is the callback's
    business in the reference too).  Engine deviation mirrored here:
    dedup is engine-side first-seen (the reference leaves it to the
    callback's HashDict; our wave engine owns the seen set), and depth
    is bookkept the same way as the link-policy crawl.

    ``depth_first=True`` mirrors the reference DEFAULT ``depth=True``
    (deque.pop() LIFO, download.py:811).  Budgets: ``max_urls`` caps
    visits (DataCrawler len(scraped) < max_urls, download.py:1102);
    ``max_errors`` stops once errors exceed it (async.py:264-269).
    """
    found = {}
    queue = list(seeds)
    visits = []
    next_ok = {}
    num_errors = 0
    while queue:
        if max_urls is not None and len(visits) >= max_urls:
            break
        url = queue.pop() if depth_first else queue.pop(0)
        host = T.get_domain(url)
        scheduled = max(next_ok.get(host, 0.0), 0.0)
        next_ok[host] = scheduled + delay
        raw = corpus.get(url)
        page = T.html_to_unicode(raw) if raw is not None else ''
        status = 200 if raw is not None else 404
        h = U.url_hash64(url)
        depth = found.setdefault(h, 0)
        stop = False
        links = []
        try:
            links = list(cb(url, page) or [])
        except StopCrawl:
            stop = True
        except Exception:
            links = []          # reference swallows cb errors (830-831)
        outstanding = []
        if not stop:
            for link in links:
                lh = U.url_hash64(link)
                if lh not in found:
                    found[lh] = depth + 1
                    outstanding.append(link)
        queue.extend(outstanding)
        visits.append({
            'url': url, 'depth': depth, 'visit_order': len(visits),
            'status': status, 'scheduled_ts': scheduled,
            'text': T.normalize(page), 'links': outstanding,
        })
        if status != 200:
            num_errors += 1
            if max_errors is not None and num_errors > max_errors:
                break
        if stop:
            break
    return visits, found


def crawl_dfs_oracle(corpus: dict, seeds, max_depth: int = 1,
                     max_links: int = 100, allowed_urls: str = '',
                     banned_urls: str = '^$', robots=None,
                     delay: float = 5.0):
    """Sequential DFS oracle: the reference's DEFAULT order
    (``depth=True`` → deque.pop() LIFO, download.py:811) with the full
    CrawlerCallback link policy — the last-appended link is fetched
    first, so traversal runs in reverse document order depth-first."""
    allowed_re = re.compile(allowed_urls)
    banned_re = re.compile(banned_urls)
    found = {}
    queue = list(seeds)
    visits = []
    next_ok = {}
    while queue:
        url = queue.pop()       # LIFO
        host = T.get_domain(url)
        scheduled = max(next_ok.get(host, 0.0), 0.0)
        next_ok[host] = scheduled + delay
        raw = corpus.get(url)
        page = T.html_to_unicode(raw) if raw is not None else ''
        status = 200 if raw is not None else 404
        h = U.url_hash64(url)
        depth = found.setdefault(h, 0)
        outstanding = []
        if depth != max_depth:
            for link in U.extract_raw_links(page):
                try:
                    link = U.normalize_url(url, link)
                except UnicodeDecodeError:
                    continue
                lh = U.url_hash64(link)
                if lh not in found:
                    found[lh] = depth + 1
                    if U.link_valid(link, host, allowed_re, banned_re, robots):
                        outstanding.append(link)
                        if len(outstanding) == max_links:
                            break
        queue.extend(outstanding)
        visits.append({
            'url': url, 'depth': depth, 'visit_order': len(visits),
            'status': status, 'scheduled_ts': scheduled,
            'text': T.normalize(page), 'links': outstanding,
        })
    return visits, found
