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
                 robots=None, delay: float = 5.0, num_redirects: int = 0):
    """Crawl the in-memory corpus {url: html_bytes} from ``seeds``.

    Returns (visits, found) where visits is a list of dicts
    (url, depth, visit_order, status, scheduled_ts, links) in crawl
    order and found is the url-hash -> depth registry.
    """
    allowed_re = re.compile(allowed_urls)
    banned_re = re.compile(banned_urls)
    found = {}          # url_hash64 -> depth  (adt.HashDict(int) semantics)
    queue = deque(seeds)
    visits = []
    visit_order = 0
    # virtual politeness clock (variance=0), per host
    next_ok = {}
    clock = 0.0

    while queue:
        url = queue.popleft()
        host = T.get_domain(url)
        scheduled = max(next_ok.get(host, clock), clock)
        next_ok[host] = scheduled + delay

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
