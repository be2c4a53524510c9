"""Deterministic synthetic web corpus (FIXTURES.md §1).

Generates Common-Crawl-style pages with the ``input_hint`` schema
``(url: string, warc_ts: timestamp[us], html: binary, text:
large_string, lang: string)`` — fully deterministic per (seed, page id)
so any worker can generate any block independently (no shared RNG
state, no ordering dependency).

The generated HTML deliberately exercises every quirk the kernels
must reproduce (SURVEY.md §5): entities, numeric charrefs, cp1252
bytes, comments, meta charset (utf-8 and latin-1 pages), self-closing
and unbalanced tags, tbody-less tables, link variants (absolute,
relative, ``../``, fragments, ``&amp;`` queries, %-escapes), mailto /
media / off-domain links that the validity chain must reject, and
obfuscated emails/phones.

Host ids follow a Zipf(1.2)-ish distribution so per-host skew is real
(the politeness partition and salted-repartition paths get exercised).

The ``text`` column is the generation-time oracle: it is computed with
the same kernels the engine uses, so the engine's extracted text must
byte-equal it per url.
"""

from __future__ import annotations

import bisect
import random

import numpy as np
import pyarrow as pa

from ..kernels import text as T

BASE_TS_US = 1_600_000_000_000_000  # deterministic epoch base (us)

_WORDS = ('data crawl page link fetch index merge shard queue robot spider '
          'parse token batch block arrow stream wave host depth seed corpus '
          'filter hash bucket actor politeness frontier snapshot lineage').split()

_CP1252_SNIPPETS = ['caf\u00e9 \u201cquoted\u201d', '\u2013emdash\u2014', 'half\u00bd \u00ab\u00bb',
                    'plain ascii words', 'nb\u00a0sp']


def host_cumweights(n_hosts: int):
    """Cumulative Zipf(1.2) weights over host ids (deterministic)."""
    w = 1.0 / np.arange(1, n_hosts + 1) ** 1.2
    cum = np.cumsum(w)
    return (cum / cum[-1]).tolist()


def host_of(rng: random.Random, cumw) -> int:
    return bisect.bisect_left(cumw, rng.random())


def page_url(host_id: int, page_id: int) -> str:
    # distinct registrable domain per host: politeness and the
    # same-domain validity check operate per host (get_domain of
    # site{h}.com is site{h}.com)
    return 'http://site%d.com/p/%d' % (host_id, page_id)


def page_host_id(page_id: int, seed: int, cumw) -> int:
    """The host a page lives on — computable from anywhere (the host
    draw is the first draw of the page's own deterministic RNG)."""
    return host_of(random.Random((seed << 32) ^ page_id), cumw)


def _link_variant(rng: random.Random, target_host: int, my_host: int, target_id: int) -> str:
    """A messy href that canonicalizes to page_url(target_host, target_id)."""
    if target_host != my_host:
        return page_url(target_host, target_id)
    style = rng.randrange(5)
    if style == 0:
        return '/p/%d' % target_id
    elif style == 1:
        return '/p/%d#frag%d' % (target_id, rng.randrange(9))
    elif style == 2:
        return '../p/%d' % target_id
    elif style == 3:
        return page_url(target_host, target_id)
    else:
        return '%d' % target_id  # relative to /p/


SNAPSHOT_TS_STEP_US = 500_000_000_000  # second-snapshot offset (~139h)


def gen_page(i: int, n_pages: int, n_hosts: int, seed: int, cumw,
             mean_links: int = 8, weight: int = 1) -> dict:
    """Generate page ``i`` deterministically.

    ``weight`` scales body size (paragraph count): weight 1 ≈ 1 KB
    html (unit tests), weight 6 ≈ 5 KB (bench; closer to real pages).
    """
    rng = random.Random((seed << 32) ^ i)
    host = host_of(rng, cumw)
    url = page_url(host, i)
    lang = ('en', 'de', 'fr', 'es', 'it')[i % 5]
    charset = 'iso-8859-1' if rng.random() < 0.1 else 'utf-8'

    parts = ['<html><head><meta charset=%s><title>Page %d</title>' % (charset, i)]
    if rng.random() < 0.5:
        parts.append('<meta name="description" content="Summary of page %d &amp; friends">' % i)
    if rng.random() < 0.02:
        # meta-refresh page (reference download.py:619-624)
        tgt = '/p/%d' % rng.randrange(n_pages)
        parts.append('<meta http-equiv="refresh" content="0; url=%s">' % tgt)
    parts.append('</head><body>')
    parts.append('<h1>Page %d on site%d</h1>' % (i, host))
    if rng.random() < 0.3:
        parts.append('<!-- comment %d should vanish -->' % i)

    # paragraphs with entities and occasional cp1252-ish chars
    for p in range(rng.randrange(2, 6) * weight):
        words = ' '.join(rng.choice(_WORDS) for _ in range(rng.randrange(8, 30)))
        extra = ''
        r = rng.random()
        if r < 0.2:
            extra = ' ' + rng.choice(_CP1252_SNIPPETS)
        elif r < 0.3:
            extra = ' fish &amp; chips &#233;'
        elif r < 0.35:
            extra = ' spaced&nbsp;out'
        parts.append('<p>%s%s</p>' % (words, extra))

    if rng.random() < 0.15:
        parts.append('<table><tr><td>cell %d</td></tr></table>' % i)  # tbody-less
    if rng.random() < 0.1:
        parts.append('<span>unbalanced span')  # unclosed tag
    if rng.random() < 0.1:
        parts.append('line one<br />line two<br>')

    # contacts for the extractors
    if i % 7 == 0:
        parts.append('<p>mail me: user%d AT example DOT com</p>' % i)
    elif i % 7 == 1:
        parts.append('<p><a href="mailto:user%d@example.com">contact</a></p>' % i)
    if i % 11 == 0:
        parts.append('<p>call (555) %03d-%04d</p>' % (i % 1000, i % 10000))

    # links: mostly same-host, some cross-host, plus rejects
    n_links = max(1, int(rng.gauss(mean_links, 2)))
    for L in range(n_links):
        cross = rng.random() < 0.15
        # rejection-sample a target that really lives on the wanted
        # host (host assignment is page-local deterministic), so
        # same-host links resolve instead of dangling
        t_id = rng.randrange(n_pages)
        t_host = page_host_id(t_id, seed, cumw)
        if not cross:
            for _ in range(30):
                if t_host == host:
                    break
                t_id = rng.randrange(n_pages)
                t_host = page_host_id(t_id, seed, cumw)
        href = _link_variant(rng, t_host, host, t_id)
        parts.append('<a href="%s">link %d</a>' % (href, L))
        if rng.random() < 0.3:
            parts.append('<a href="%s">dup</a>' % href)  # duplicate link
    # links the validity chain must reject
    if rng.random() < 0.4:
        parts.append('<a href="/img/%d.jpg">media</a>' % i)
    if rng.random() < 0.3:
        parts.append('<a href="mailto:x%d@y.com">m</a>' % i)
    if rng.random() < 0.3:
        parts.append('<a href="http://offsite%d.other.org/x">away</a>' % (i % 5))
    if rng.random() < 0.2:
        # cross-host link variant that the same-domain check rejects
        # but which still must be registered in the seen set
        parts.append('<a href="%s?ref=%d">x</a>' % (
            page_url((host + 1) % n_hosts, rng.randrange(n_pages)), i))
    if rng.random() < 0.1:
        parts.append('<script>location.href = "/p/%d"</script>' % rng.randrange(n_pages))

    parts.append('</body></html>')
    html_str = ''.join(parts)
    html = html_str.encode(charset, 'ignore')
    # generation-time oracle: the byte contract's expected text
    text = T.normalize(T.html_to_unicode(html))
    return {
        'url': url,
        'warc_ts': BASE_TS_US + i * 1_000_000,
        'html': html,
        'text': text,
        'lang': lang,
    }


class GenPages:
    """Actor-pool batch generator: block of page ids -> pages table.

    Stateful setup (the Zipf cumulative table) runs once per actor.
    """

    def __init__(self, n_pages: int, n_hosts: int, seed: int = 42,
                 mean_links: int = 8, weight: int = 1):
        self.n_pages = n_pages
        self.n_hosts = n_hosts
        self.seed = seed
        self.mean_links = mean_links
        self.weight = weight
        self.cumw = host_cumweights(n_hosts)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('id').to_pylist()
        rows = [gen_page(i, self.n_pages, self.n_hosts, self.seed, self.cumw,
                         self.mean_links, self.weight) for i in ids]
        return pa.table({
            'url': pa.array([r['url'] for r in rows], pa.string()),
            'warc_ts': pa.array([r['warc_ts'] for r in rows], pa.timestamp('us')),
            'html': pa.array([r['html'] for r in rows], pa.binary()),
            'text': pa.array([r['text'] for r in rows], pa.large_string()),
            'lang': pa.array([r['lang'] for r in rows], pa.string()),
        })


def pages_dataset(n_pages: int, n_hosts: int = 50, seed: int = 42,
                  mean_links: int = 8, weight: int = 1,
                  override_num_blocks: int | None = None):
    """Lazy Dataset of n_pages synthetic pages (generation is distributed)."""
    import ray.data

    return ray.data.range(n_pages, override_num_blocks=override_num_blocks).map_batches(
        GenPages(n_pages, n_hosts, seed, mean_links, weight),
        batch_format='pyarrow', batch_size=512,
    )


def pages_table(n_pages: int, n_hosts: int = 10, seed: int = 42,
                mean_links: int = 8, snapshot_frac: float = 0.0) -> pa.Table:
    """Small in-memory corpus for unit tests (no Ray).

    ``snapshot_frac`` > 0 duplicates that fraction of urls with a later
    ``warc_ts`` snapshot (FIXTURES.md §1) whose html gains a marker
    paragraph — exercising the store's as-of (latest-snapshot) path.
    """
    cumw = host_cumweights(n_hosts)
    rows = [gen_page(i, n_pages, n_hosts, seed, cumw, mean_links)
            for i in range(n_pages)]
    if snapshot_frac > 0:
        extra = []
        for r in rows:
            i = int(r['url'].rsplit('/', 1)[1])
            if (i * 2654435761) % 1000 < snapshot_frac * 1000:
                r2 = dict(r)
                r2['warc_ts'] = r['warc_ts'] + SNAPSHOT_TS_STEP_US
                html2 = r['html'].replace(
                    b'</body>', b'<p>updated snapshot</p></body>')
                r2['html'] = html2
                from ..kernels import text as _T
                r2['text'] = _T.normalize(_T.html_to_unicode(html2))
                extra.append(r2)
        rows.extend(extra)
    return pa.table({
        'url': pa.array([r['url'] for r in rows], pa.string()),
        'warc_ts': pa.array([r['warc_ts'] for r in rows], pa.timestamp('us')),
        'html': pa.array([r['html'] for r in rows], pa.binary()),
        'text': pa.array([r['text'] for r in rows], pa.large_string()),
        'lang': pa.array([r['lang'] for r in rows], pa.string()),
    })
