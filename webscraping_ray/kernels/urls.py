"""URL kernels: canonicalization, link extraction, validity, hashing.

These define the crawl's key operations (SURVEY.md §2.2):

- ``normalize_url`` — the URL canonicalizer of
  ``CrawlerCallback.normalize`` (reference download.py:987-1004); its
  output is the partition/dedup key of the whole engine.
- ``CRAWL_LINK_RE`` — the crawl's link extractor regex (reference
  download.py:1033); note this is NOT ``xpath.get_links`` — crawl order
  is defined by this regex in document order.
- ``link_valid`` — the validity chain (reference download.py:1010-1026).
- ``link_score`` — best-first priority (reference download.py:1062-1078).
- ``url_hash64`` — stable 64-bit hash of the canonical URL, the
  engine's shuffle/dedup key (the reference uses py2 ``hash()`` in
  ``adt.HashDict`` (adt.py:71-74), which is also 64-bit and silently
  approximate; ours is process-stable so it can be a distributed key).
- ``get_redirect`` — meta-refresh target (reference download.py:619-624).
"""

from __future__ import annotations

import hashlib
import re
import urllib.parse

from . import text as common

# the crawl link extractor (reference download.py:1033) — document order
# of these matches defines BFS crawl order
CRAWL_LINK_RE = re.compile('<a[^>]+href=["\'](.*?)["\']', re.IGNORECASE)

# meta-refresh redirect target (reference download.py:622)
_META_REDIRECT_RE = re.compile('<meta[^>]*?url=(.*?)["\']', re.IGNORECASE)


def normalize_url(url, link):
    """Canonicalize ``link`` found on page ``url``
    (reference download.py:987-1004).

    urldefrag → unescape (&amp; / %XX) → urljoin → strip leading '/..'
    path segments.
    """
    link, _ = urllib.parse.urldefrag(link)
    link = common.unescape(link)
    link = urllib.parse.urljoin(url, link)
    while urllib.parse.urlsplit(link).path.startswith('/..'):
        link = link.replace('/..', '', 1)
    return link


def get_redirect(url, html):
    """Meta-refresh redirect URL if present (reference download.py:619-624)."""
    match = _META_REDIRECT_RE.search(html)
    if match:
        return urllib.parse.urljoin(url, common.unescape(match.groups()[0].strip()))
    return None


def url_hash64(url: str) -> int:
    """Stable 64-bit hash of a canonical URL (signed, fits Arrow int64).

    Used for: shuffle partitioning, seen-set membership, and the corpus
    store's bucket key.  blake2b is deterministic across processes and
    platforms (unlike py2/py3 ``hash()``).
    """
    h = int.from_bytes(hashlib.blake2b(url.encode('utf-8', 'surrogatepass'),
                                       digest_size=8).digest(), 'little')
    return h - (1 << 64) if h >= (1 << 63) else h


# relative-href absolutizer applied after a meta-redirect chase
# (reference download.py:264)
_RELATIVE_HREF_RE = re.compile(
    '(<\s*a[^>]+href\s*=\s*["\']?)(?!http)([^"\'>]+)', re.IGNORECASE)


def rewrite_relative_hrefs(html: str, base_url: str) -> str:
    """Make relative <a href> links absolute against ``base_url``
    (reference download.py:263-268; applied after chasing a
    meta-redirect so links still work for the original page url)."""
    try:
        return _RELATIVE_HREF_RE.sub(
            lambda m: m.group(1) + urllib.parse.urljoin(base_url, m.group(2)),
            html)
    except UnicodeDecodeError:
        return html


def link_valid(link, parent_domain, allowed_re=None, banned_re=None,
               robots=None, user_agent='Mozilla/5.0', seen_in_corpus=None,
               crawl_existing=True):
    """The reference's link-validity chain (download.py:1010-1026).

    parent_domain:
        ``get_domain(parent_url)`` — same-site check is against the
        *linking* page's domain.
    allowed_re / banned_re:
        compiled regexes (defaults: allow all / ban none, matching the
        reference defaults ``allowed_urls=''``, ``banned_urls='^$'``).
    robots:
        object with ``can_fetch(agent, url)`` or None (reference
        default: None ⇒ allow all).
    seen_in_corpus / crawl_existing:
        mirror of the ``crawl_existing`` cache check — when
        ``crawl_existing`` is False, a link already in the fetched-page
        cache (``seen_in_corpus(link)`` True) is not recrawled.
    """
    if common.get_extension(link) not in common.MEDIA_EXTENSIONS_SET:
        if link.lower().startswith('http'):
            if common.same_domain(parent_domain, link):
                if (allowed_re is None or allowed_re.match(link)) and \
                        not (banned_re is not None and banned_re.match(link)):
                    if not robots or robots.can_fetch(user_agent, link):
                        if crawl_existing or not (seen_in_corpus and seen_in_corpus(link)):
                            return True
    return False


def link_score(link):
    """Priority for best-first crawling — lower is better
    (reference download.py:1062-1078)."""
    link = link.lower()
    total = 0
    if 'contact' in link:
        pass  # top priority
    elif 'about' in link:
        total += 10
    elif 'help' in link:
        total += 20
    else:
        total += 100  # generic page
    total += len(link)
    return total


def extract_raw_links(html):
    """All href values in document order, un-normalized
    (reference download.py:1033-1034)."""
    return CRAWL_LINK_RE.findall(html)


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform of a url — the canonical
    key of web-archive CDX indexes (the public SURT convention used by
    Internet Archive tooling): lowercase; scheme and fragment dropped;
    one leading ``www.`` label dropped; default ports (80/443)
    dropped; host labels REVERSED and comma-joined, then ``)`` and the
    path; query parameters sorted by full ``k=v`` text (stable for
    duplicates).  ``surt('HTTP://WWW.Ex.COM:80/A?b=2&a=1#f')`` →
    ``'com,ex)/a?a=1&b=2'``.  Keys of one host sort contiguously and
    subdomains sort under their parent domain — the property CDX
    range scans rely on."""
    parts = urllib.parse.urlsplit(url.strip())
    host = (parts.hostname or '').lower()
    if host.startswith('www.') and host.count('.') >= 2:
        host = host[4:]
    port = parts.port
    default = {'http': 80, 'https': 443}.get(parts.scheme.lower())
    key = ','.join(reversed(host.split('.'))) if host else ''
    if port and port != default:
        key += ':%d' % port
    path = parts.path.lower() or '/'
    key += ')' + path
    if parts.query:
        key += '?' + '&'.join(sorted(parts.query.lower().split('&')))
    return key
