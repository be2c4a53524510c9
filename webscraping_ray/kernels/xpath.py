"""Subset-XPath engine, a py3 port of the reference ``xpath.py``.

Navigates raw HTML directly (no DOM build) by scanning for balanced
tags, exactly as the reference ``xpath.Doc`` (reference xpath.py:25-421)
— including its quirks, which are part of the byte contract:

- missing ``tbody`` is skipped (reference xpath.py:317-319);
- unbalanced HTML gets a synthetic closing tag (reference xpath.py:404-408);
- attribute values match literal-then-regex with ``re.match(value+'$',
  IGNORECASE)`` (reference xpath.py:257);
- 1-based indices, negative from the end (reference xpath.py:121-124);
- ``EMPTY_TAGS`` never close; ``<x/>`` is self-closing.

Supported axes: ``/`` child, ``//`` descendant, ``[n]``/``[-n]`` index,
``[@k="v"]`` (regex values), ``[@k]`` presence, ``@attr``, ``text()``.
"""

from __future__ import annotations

import re
import sys
import urllib.parse

from . import text as common

_MAXINT = sys.maxsize

# per-tag compiled-pattern memo for the _split_tag hot loop (the re
# module's own cache costs a flags-normalizing hash lookup per call).
# CAPPED: tag names come from arbitrary page HTML, so the vocabulary
# is unbounded at web scale — past the cap a long-lived extract actor
# falls back to re.compile (whose internal cache is itself bounded)
# instead of leaking memory.
_SPLIT_RE_CACHE: dict = {}
_SPLIT_RE_CACHE_MAX = 512


class Doc:
    """Wrapper around a parsed webpage (reference xpath.py:25-74)."""

    # regex to find a tag
    _tag_regex = re.compile(r'<([\w\:]+)')
    # regex to find an attribute
    _attributes_regex = re.compile(r'([\w\:-]+)\s*=\s*(".*?"|\'.*?\'|\S+)', re.DOTALL)
    # regex to find content of a tag
    _content_regex = re.compile('<.*?>(.*)</.*?>$', re.DOTALL)

    def __init__(self, html, remove=None):
        # NOTE: like the reference (__init__ does not call _clean —
        # xpath.py:73-74), `remove` is only honored via module-level
        # get()/search() wrappers below.
        self.html = html
        self.num_searches = 0

    def get(self, xpath):
        """First result of this XPath selection (reference xpath.py:77-81)."""
        results = self._xpath(self.parse(xpath), self.html, limit=1)
        return common.first(results)

    def search(self, xpath):
        """All results of this XPath selection (reference xpath.py:83-86)."""
        return self._xpath(self.parse(xpath), self.html, limit=_MAXINT)

    def _xpath(self, path, html, limit):
        """Recursive evaluator (reference xpath.py:89-142)."""
        counter, separator, tag, index, attributes = path.pop(0)
        if counter == 0:
            self.num_searches += 1

        results = []
        if tag == '..':
            raise common.WebScrapingError('.. not yet supported')
        elif tag == 'text()':
            text = self._get_content(html)
            results.append(common.remove_tags(text, keep_children=False))
        elif tag.startswith('@'):
            attr = tag[1:].lower()
            value = self._get_attributes(html).get(attr, '')
            results.append(value)
        else:
            if counter > 0:
                # get child html when not at root
                html = self._get_content(html)
            search_fn = self._find_children if separator == '' else self._find_descendants
            matches = search_fn(html, tag)

            if index is not None and index < 0:
                # support negative indices
                matches = list(matches)
                index += len(matches) + 1

            for child_i, child in enumerate(matches):
                if index is None or index == child_i + 1:
                    if not attributes or self._match_attributes(attributes, self._get_attributes(child)):
                        if path:
                            results.extend(self._xpath(path[:], child, limit))
                        else:
                            results.append(self._get_content(child))
                        if len(results) > limit:
                            break
        return results

    def _clean(self, html, remove):
        """Remove unhelpful tags and comments (reference xpath.py:146-157)."""
        html = re.compile('<!--.*?-->', re.DOTALL).sub('', html)
        if remove:
            for tag in remove:
                html = re.compile('<' + tag + '[^>]*?/>', re.DOTALL | re.IGNORECASE).sub('', html)
                html = re.compile('<' + tag + '[^>]*?>.*?</' + tag + '>', re.DOTALL | re.IGNORECASE).sub('', html)
                html = re.compile('<' + tag + '[^>]*?>', re.DOTALL | re.IGNORECASE).sub('', html)
        return html

    def parse(self, xpath):
        """Tokenize xpath (reference xpath.py:160-197).

        Returns [(counter, separator, tag, index, attributes)].
        """
        tokens = []
        counter = 0
        for separator, token in re.compile(r'(|/|\.\.)/([^/]+)').findall(xpath):
            index, attributes = None, []
            if '[' in token:
                tag = token[:token.find('[')]
                for attribute in re.compile(r'\[(.*?)\]').findall(token):
                    try:
                        index = int(attribute)
                    except ValueError:
                        match = re.compile('@(.*?)=["\']?(.*?)["\']?$').search(attribute)
                        if match:
                            key, value = match.groups()
                            attributes.append((key.lower(), value.lower()))
                        else:
                            match = re.compile('@(.*?)$').search(attribute)
                            if match:
                                attributes.append((match.groups()[0].lower(), None))
                            else:
                                raise common.WebScrapingError('Unknown format: ' + attribute)
            else:
                tag = token
            tokens.append((counter, separator, tag, index, attributes))
            counter += 1
        return tokens

    def _get_attributes(self, html):
        """Attributes of the leading tag (reference xpath.py:200-220)."""
        for i, c in enumerate(html):
            if c == '>':
                html = html[:i]
                break
        attributes = dict((name.lower().strip(), value.strip('\'" '))
                          for (name, value) in Doc._attributes_regex.findall(html))
        for attribute in re.findall(r'\s+(checked|selected|required|multiple|disabled)', html):
            attributes[attribute] = None
        return attributes

    def _match_attributes(self, desired_attributes, available_attributes):
        """All desired attributes present; literal-then-regex compare
        (reference xpath.py:223-261)."""
        for name, value in desired_attributes:
            if name in available_attributes:
                available_value = available_attributes[name]
                if value != available_value:
                    if value is None or not re.match(re.compile(value + '$', re.IGNORECASE),
                                                     available_attributes[name]):
                        return False
            else:
                return False
        return True

    def _get_content(self, context, default=''):
        """Child HTML of the passed tag (reference xpath.py:275-287)."""
        match = Doc._content_regex.match(context)
        if match:
            return match.groups()[0]
        return default

    def _find_children(self, html, tag):
        """Yield balanced sibling blocks with this tag (reference xpath.py:290-319).

        Quirk preserved: a missing ``tbody`` yields the input unchanged.
        """
        found = True
        num_found = 0
        orig_html = html
        while found:
            html = self._jump_next_tag(html)
            if html:
                tag_html, html = self._split_tag(html)
                if tag_html:
                    if tag.lower() in ('*', (self._get_tag(tag_html) or '').lower()):
                        num_found += 1
                        yield tag_html
                else:
                    found = False
            else:
                found = False
        if tag == 'tbody' and num_found == 0:
            # skip tbody, which firefox includes in xpath when it does not exist
            yield orig_html

    def _find_descendants(self, html, tag):
        """Yield balanced blocks at every ``<tag`` occurrence (reference xpath.py:322-335)."""
        if tag == '*':
            raise common.WebScrapingError("`*' not currently supported for //")
        for match in re.compile('<%s' % tag, re.DOTALL | re.IGNORECASE).finditer(html):
            tag_html = html[match.start():]
            tag_html, _ = self._split_tag(tag_html)
            yield tag_html

    def _jump_next_tag(self, html):
        """HTML from the start of the next tag (reference xpath.py:338-356)."""
        match = Doc._tag_regex.search(html)
        if match:
            return html[match.start():]
        return None

    def _get_tag(self, html):
        """Tag name at this location (reference xpath.py:359-372)."""
        match = Doc._tag_regex.match(html)
        if match:
            return match.groups()[0]
        return None

    def _split_tag(self, html):
        """Split leading balanced tag from the rest (reference xpath.py:375-408).

        Depth-counts over ``</?tag.*?>``; EMPTY_TAGS never close;
        ``<x/>`` self-closes; an unclosed tag gets a synthetic close.
        """
        i = None
        tag = self._get_tag(html)
        depth = 0
        pat = _SPLIT_RE_CACHE.get(tag)
        if pat is None:
            pat = re.compile('</?%s.*?>' % tag,
                             re.DOTALL | re.IGNORECASE)
            if len(_SPLIT_RE_CACHE) < _SPLIT_RE_CACHE_MAX:
                _SPLIT_RE_CACHE[tag] = pat
        for match in pat.finditer(html):
            if html[match.start() + 1] == '/':
                depth -= 1  # closing tag
            elif tag in common.EMPTY_TAGS:
                pass  # this tag type does not close
            elif html[match.end() - 2] == '/':
                pass  # self-closing (e.g. <br />)
            else:
                depth += 1  # opening tag
            if depth == 0:
                i = match.end()
                break
        if i is None:
            # all html is within this tag
            return html + '</%s>' % tag, ''
        return html[:i], html[i:]


def get(html, xpath, remove=None):
    """First element from XPath search (reference xpath.py:470-473).

    NOTE: ``remove`` is accepted but has no effect, faithfully matching
    the reference, whose ``Doc.__init__`` ignores it (xpath.py:72-74) —
    ``alg.get_excerpt`` depends on this no-op for byte-identity.
    """
    return Doc(html, remove=remove).get(xpath)


def search(html, xpath, remove=None):
    """All elements from XPath search (reference xpath.py:475-478).

    ``remove`` is a no-op, as in the reference (see ``get``).
    """
    return Doc(html, remove=remove).search(xpath)


def find_children(html, tag, remove=None):
    """Children with this tag type (reference xpath.py:480-483)."""
    return Doc(html)._find_children(html, tag)


class Form:
    """Form fill/submit helper (reference xpath.py:487-508)."""

    def __init__(self, form):
        self.data = {}
        for input_name, input_value in zip(search(form, '//input/@name'), search(form, '//input/@value')):
            self.data[input_name] = input_value
        for text_name, text_value in zip(search(form, '//textarea/@name'), search(form, '//textarea')):
            self.data[text_name] = text_value
        for select_name, select_contents in zip(search(form, '//select/@name'), search(form, '//select')):
            self.data[select_name] = get(select_contents, '/option[@selected]/@value')
        if '' in self.data:
            del self.data['']

    def __getitem__(self, key):
        return self.data[key]

    def __setitem__(self, key, value):
        self.data[key] = value

    def __str__(self):
        return urllib.parse.urlencode(self.data)


js_re = re.compile('location.href ?= ?[\'"](.*?)[\'"]')


def get_links(html, url=None, local=True, external=True):
    """All links from html: a/@href + iframe/@src + JS location.href
    (reference xpath.py:515-555).  Order-preserving dedup; fragments
    stripped; relative links joined against ``url``.
    """
    def normalize_link(link):
        if urllib.parse.urlsplit(link).scheme in ('http', 'https', ''):
            if '#' in link:
                link = link[:link.index('#')]
            if url:
                link = urllib.parse.urljoin(url, link)
                if not local and common.same_domain(url, link):
                    link = None
                if not external and not common.same_domain(url, link):
                    link = None
        else:
            link = None  # ignore mailto, etc
        return link

    a_links = search(html, '//a/@href')
    i_links = search(html, '//iframe/@src')
    js_links = js_re.findall(html)
    links = []
    for link in a_links + i_links + js_links:
        try:
            link = normalize_link(link)
        except (UnicodeError, ValueError):
            pass
        else:
            if link and link not in links:
                links.append(link)
    return links


def get_anchor_pairs(html, url=None):
    """(target, anchor_text) pairs for every ``<a href>`` element.

    Link normalization mirrors ``get_links`` (reference
    xpath.py:515-555: scheme filter, fragment strip, urljoin against
    ``url``) but WITHOUT the order-preserving dedup — anchor-text
    collection keeps every link instance.  href/content pairing uses
    the zip-of-parallel-searches idiom the reference itself uses for
    forms (xpath.py:487-508 ``Form.__init__``): every ``<a>`` element
    contributes one pair in document order (the Doc engine emits ``''``
    for a missing href, which — exactly like an empty href in
    ``get_links`` — urljoins to the page's own url).

    The anchor text is the element's inner content with nested markup
    stripped (``common.remove_tags``, the same rule the ``text()``
    axis applies — reference xpath.py:119-121), so
    ``<a><b>hi</b></a>`` yields ``'hi'``, not ``'<b>hi</b>'``.
    """
    pairs = []
    for href, txt in zip(search(html, '//a/@href'),
                         search(html, '//a')):
        link = href
        try:
            if urllib.parse.urlsplit(link).scheme not in ('http', 'https',
                                                          ''):
                continue
            if '#' in link:
                link = link[:link.index('#')]
            if url:
                link = urllib.parse.urljoin(url, link)
        except (UnicodeError, ValueError):
            continue
        if link:
            pairs.append((link, common.remove_tags(txt)))
    return pairs


# ---------------------------------------------------------------------------
# lxml-backed Tree wrapper (reference xpath.py:427-467) — the alternate
# engine a user may pass around instead of the regex Doc.  NON-CANONICAL
# for byte-identity (SURVEY §2.2: the crawl contract pins the regex
# pipeline above); provided for API parity.  Mirrors the reference's
# import guard exactly: without lxml installed (this container),
# constructing a Tree raises ImportError, same as the reference would.

try:
    import lxml.etree
    import lxml.html
except ImportError:
    class Tree:
        """lxml is not installed — reference xpath.py:428-432 behavior."""

        def __init__(self, *args, **kwargs):
            raise ImportError('lxml not installed')
else:
    class Tree:
        """Thin lxml wrapper (reference xpath.py:434-467): same
        get/search surface as the module functions, returning node
        inner-HTML strings."""

        def __init__(self, html, **kwargs):
            if isinstance(html, lxml.html.HtmlElement):
                self.doc = html
            else:
                try:
                    self.doc = lxml.html.fromstring(html)
                except lxml.etree.LxmlError:
                    self.doc = None

        def xpath(self, path):
            return [] if self.doc is None else self.doc.xpath(path)

        def get(self, path):
            es = self.xpath(path)
            return self.tostring(es[0]) if es else ''

        def search(self, path):
            return [self.tostring(e) for e in self.xpath(path)]

        def tostring(self, node):
            try:
                parts = ([node.text]
                         + [c if isinstance(c, str)
                            else lxml.etree.tostring(c, encoding='unicode')
                            for c in node]
                         + [node.tail])
                return ''.join(p for p in parts if p) or str(node)
            except AttributeError:
                return str(node)
