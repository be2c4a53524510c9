"""URL kernel tests: canonicalization doctests (reference
download.py:990-996), validity chain, link regex, hashing."""

import re

from webscraping_ray.kernels import text as T
from webscraping_ray.kernels import urls as U


# --- normalize_url (CrawlerCallback.normalize, download.py:990-996) ---

def test_normalize_url_doctests():
    assert U.normalize_url('http://example.com', '../abc.html') == 'http://example.com/abc.html'
    assert U.normalize_url('http://example.com', 'abc.html#link') == 'http://example.com/abc.html'
    assert U.normalize_url('http://example.com', 'abc.html?a=1&amp;b=2') == 'http://example.com/abc.html?a=1&b=2'


def test_normalize_url_percent():
    # %20 is decoded by the unescape step (py2 behavior)
    assert U.normalize_url('http://example.com/', 'a%20b.html') == 'http://example.com/a b.html'


def test_normalize_url_absolute():
    assert U.normalize_url('http://example.com/dir/page.html', 'other.html') == \
        'http://example.com/dir/other.html'
    assert U.normalize_url('http://example.com/', 'http://other.com/x') == 'http://other.com/x'


# --- crawl link regex (download.py:1033) ---

def test_extract_raw_links_document_order():
    html = '<a class="x" href="/b">B</a> text <a href=\'/a\'>A</a><a href="/b">B2</a>'
    assert U.extract_raw_links(html) == ['/b', '/a', '/b']


# --- validity chain (download.py:1010-1026) ---

def test_link_valid():
    dom = T.get_domain('http://example.com/page')
    assert U.link_valid('http://example.com/x.html', dom) is True
    assert U.link_valid('http://example.com/x.jpg', dom) is False        # media ext
    assert U.link_valid('ftp://example.com/x', dom) is False             # not http
    assert U.link_valid('http://other.com/x', dom) is False              # off-site
    assert U.link_valid('http://example.com/x', dom,
                        banned_re=re.compile('.*/x')) is False           # banned
    assert U.link_valid('http://example.com/x', dom,
                        allowed_re=re.compile('^$')) is False            # not allowed


def test_link_valid_robots():
    class DenyAll:
        def can_fetch(self, agent, url):
            return False
    dom = T.get_domain('http://example.com/')
    assert U.link_valid('http://example.com/x', dom, robots=DenyAll()) is False


def test_link_valid_crawl_existing():
    dom = T.get_domain('http://example.com/')
    seen = lambda link: True
    assert U.link_valid('http://example.com/x', dom,
                        seen_in_corpus=seen, crawl_existing=False) is False
    assert U.link_valid('http://example.com/x', dom,
                        seen_in_corpus=seen, crawl_existing=True) is True


# --- link_score (download.py:1062-1078) ---

def test_link_score():
    contact = U.link_score('http://x.com/contact')
    about = U.link_score('http://x.com/about')
    generic = U.link_score('http://x.com/page1')
    assert contact < about < generic


# --- url_hash64 ---

def test_url_hash64_stable_and_signed():
    h = U.url_hash64('http://example.com/')
    assert h == U.url_hash64('http://example.com/')
    assert -(1 << 63) <= h < (1 << 63)
    assert U.url_hash64('a') != U.url_hash64('b')


# --- get_redirect (download.py:619-624) ---

def test_get_redirect():
    html = '<meta http-equiv="refresh" content="0; url=/new.html">'
    assert U.get_redirect('http://example.com/old', html) == 'http://example.com/new.html'
    assert U.get_redirect('http://example.com/old', '<p>no redirect</p>') is None


# --- surt (public web-archive SURT convention) ---

def test_surt_docstring_example():
    assert U.surt('HTTP://WWW.Ex.COM:80/A?b=2&a=1#f') == 'com,ex)/a?a=1&b=2'


def test_surt_rules():
    # plain
    assert U.surt('http://src3.com/d/123') == 'com,src3)/d/123'
    # https default port dropped, non-default kept
    assert U.surt('https://src1.com:443/d/9') == 'com,src1)/d/9'
    assert U.surt('https://src1.com:8443/d/9') == 'com,src1:8443)/d/9'
    # one leading www. label dropped only when >=2 dots remain overall
    assert U.surt('http://www.example.com/') == 'com,example)/'
    assert U.surt('http://www.com/') == 'com,www)/'
    # subdomain sorts under parent domain (the CDX range-scan property)
    parent = U.surt('http://example.com/')
    sub = U.surt('http://a.example.com/')
    assert sub.startswith('com,example,')
    assert parent.split(')')[0] == 'com,example'
    # duplicate query keys: stable sort by full k=v text
    assert U.surt('http://x.com/p?b=2&a=1&a=0') == 'com,x)/p?a=0&a=1&b=2'
    # empty path -> '/', fragment dropped, path lowercased
    assert U.surt('http://X.com#frag') == 'com,x)/'


def test_surt_host_sort_contiguity():
    # all keys of one host share a prefix that no other host's keys match
    keys = sorted(U.surt('http://src%d.com/d/%d' % (i % 8, i)) for i in range(64))
    import itertools
    for host, grp in itertools.groupby(keys, key=lambda k: k.split(')')[0]):
        grp = list(grp)
        lo, hi = keys.index(grp[0]), keys.index(grp[-1])
        assert hi - lo + 1 == len(grp)
