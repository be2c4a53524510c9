"""Text-normalization kernels, py3 ports of the reference ``common.py``.

Byte contract (SURVEY.md §1): the reference is Python 2 and operates on
byte strings; this module operates on ``str`` such that
``result == py2_result_bytes.decode('utf-8', 'ignore')`` for utf-8
inputs.  Concretely that means:

- percent-decoding follows the py2-``unquote``-on-unicode behavior
  (each ``%XX`` becomes the codepoint ``XX``, i.e. latin-1 semantics),
  NOT py3's default utf-8 decoding;
- the "annoying characters" table of ``common.unescape``
  (reference ``common.py:284-314``) is applied at the codepoint level
  (its byte patterns are exactly the utf-8 encodings of U+0082..U+0331);
- whitespace classes use ASCII semantics (py2 ``\\s`` over bytes), via
  ``re.ASCII``.

Reference citations are per-function.  No code is copied from the
reference; regex patterns and data tables are reproduced because they
ARE the observable semantics.
"""

from __future__ import annotations

import json
import os
import re
import string as _string
import urllib.parse
from datetime import datetime, timedelta
from html.entities import name2codepoint


class WebScrapingError(Exception):
    pass


# known media file extensions (reference common.py:45)
MEDIA_EXTENSIONS = ['ai', 'aif', 'aifc', 'aiff', 'asc', 'avi', 'bcpio', 'bin', 'c', 'cc', 'ccad', 'cdf', 'class', 'cpio', 'cpt', 'csh', 'css', 'csv', 'dcr', 'dir', 'dms', 'doc', 'drw', 'dvi', 'dwg', 'dxf', 'dxr', 'eps', 'etx', 'exe', 'ez', 'f', 'f90', 'fli', 'flv', 'gif', 'gtar', 'gz', 'h', 'hdf', 'hh', 'hqx', 'ice', 'ico', 'ief', 'iges', 'igs', 'imq', 'ips', 'ipx', 'jpe', 'jpeg', 'jpg', 'js', 'kar', 'latex', 'lha', 'lsp', 'lzh', 'm', 'man', 'me', 'mesh', 'mid', 'midi', 'mif', 'mime', 'mov', 'movie', 'mp2', 'mp3', 'mpe', 'mpeg', 'mpg', 'mpga', 'ms', 'msh', 'nc', 'oda', 'pbm', 'pdb', 'pdf', 'pgm', 'pgn', 'png', 'pnm', 'pot', 'ppm', 'pps', 'ppt', 'ppz', 'pre', 'prt', 'ps', 'qt', 'ra', 'ram', 'ras', 'raw', 'rgb', 'rm', 'roff', 'rpm', 'rtf', 'rtx', 'scm', 'set', 'sgm', 'sgml', 'sh', 'shar', 'silo', 'sit', 'skd', 'skm', 'skp', 'skt', 'smi', 'smil', 'snd', 'sol', 'spl', 'src', 'step', 'stl', 'stp', 'sv4cpio', 'sv4crc', 'swf', 't', 'tar', 'tcl', 'tex', 'texi', 'tif', 'tiff', 'tr', 'tsi', 'tsp', 'tsv', 'unv', 'ustar', 'vcd', 'vda', 'viv', 'vivo', 'vrml', 'w2p', 'wav', 'wmv', 'wrl', 'xbm', 'xlc', 'xll', 'xlm', 'xls', 'xlw', 'xml', 'xpm', 'xsl', 'xwd', 'xyz', 'zip']
MEDIA_EXTENSIONS_SET = frozenset(MEDIA_EXTENSIONS)

# tags that do not contain content (reference common.py:48)
EMPTY_TAGS = ('br', 'hr', 'meta', 'link', 'base', 'img', 'embed', 'param', 'area', 'col', 'input')

DEFAULT_ENCODING = 'utf-8'

# ---------------------------------------------------------------------------
# precompiled patterns (hoisted: compile once per process, not per call)

_EMPTY_TAG_RE = re.compile('<(%s)[^>]*>' % '|'.join(EMPTY_TAGS))
_CHILD_TAG_NAME_RE = re.compile(r'<(\w+?)\W', re.ASCII)
_ANY_TAG_RE = re.compile('<[^<]*?>')
_ENTITY_RE = re.compile(r'&#?\w+;', re.ASCII)
_COMMENT_RE = re.compile('<!--.*?-->', re.DOTALL)
_WS_RUN_RE = re.compile(r'[\s]+', re.ASCII)
_NL_RUN_RE = re.compile('[\n\r]+')
_SP_RUN_RE = re.compile('[ \t\f\v]+')
_CHARSET_RE = re.compile(r'<meta[^<>]*charset=\s*([a-z\d\-]+)', re.IGNORECASE)
_IS_HTML_RE = re.compile('html|head|body')
_IS_URL_RE = re.compile('https?://')
_PRETTY_SEP_RE = re.compile('[-_]')
_PARA_BREAK_RE = re.compile('<(br|hr|/li)[^>]*>')
_IP_URL_RE = re.compile(r"^.*://(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})")
_SCHEME_RE = re.compile('^.*://')
_PROXY_RE = re.compile(r'((?P<username>\w+):(?P<password>\w+)@)?(?P<host>\d{1,3}.\d{1,3}.\d{1,3}.\d{1,3})(:(?P<port>\d+))?')

_ASCII_WS = ' \t\n\r\f\v'

# the reference's "annoying characters" byte table (common.py:284-314),
# re-expressed at codepoint level: each key below utf-8-encodes to the
# byte pattern in the reference table.
_ANNOYING_CHARS = {
    '\u0082': ',',      # high code comma          (b'\xc2\x82')
    '\u0084': ',,',     # high code double comma
    '\u0085': '...',    # triple dot
    '\u0088': '^',      # high carat
    '\u0091': "'",      # forward single quote
    '\u0092': "'",      # reverse single quote
    '\u0093': '"',      # forward double quote
    '\u0094': '"',      # reverse double quote
    '\u0095': ' ',
    '\u0096': '-',      # high hyphen
    '\u0097': '--',     # double hyphen
    '\u0099': ' ',
    '\u00a0': ' ',      # nbsp
    '\u00a6': '|',      # split vertical bar
    '\u00ab': '<<',     # double less than
    '\u00ae': '\u00ae',  # registered sign (identity in the reference table)
    '\u00bb': '>>',     # double greater than
    '\u00bc': '1/4',
    '\u00bd': '1/2',
    '\u00be': '3/4',
    '\u02bf': "'",      # c-single quote           (b'\xca\xbf')
    '\u0328': '',       # modifier - under curve   (b'\xcc\xa8')
    '\u0331': '',       # modifier - under line
}
_ANNOYING_RE = re.compile('(' + '|'.join(_ANNOYING_CHARS) + ')')


# ---------------------------------------------------------------------------
# scalar conversions (reference common.py:51-106)

def to_ascii(html):
    """Return ascii part of html (reference common.py:51-54)."""
    return ''.join(c for c in (html or '') if ord(c) < 128)


def to_float(s, default=0.0):
    """Return float from this string (reference common.py:72-97)."""
    result = default
    if s:
        valid = _string.digits + '.-'
        try:
            result = float(''.join(c for c in str(s) if c in valid))
        except ValueError:
            pass  # input does not contain a number
    return result


def to_int(s, default=0):
    """Return integer from this string (reference common.py:56-70)."""
    return int(to_float(s, default))


def to_unicode(obj, encoding=DEFAULT_ENCODING):
    """Decode bytes to str with errors ignored (reference common.py:100-106)."""
    if isinstance(obj, bytes):
        try:
            obj = obj.decode(encoding, 'ignore')
        except LookupError:
            # unknown codec declared in the page; fall back (deviation:
            # the reference would raise, but a corpus engine must not die
            # on one bad meta tag)
            obj = obj.decode(DEFAULT_ENCODING, 'ignore')
    return obj


def html_to_unicode(html, charset=DEFAULT_ENCODING):
    """Charset-sniffing decode (reference common.py:109-116).

    Accepts bytes (the corpus ``html: binary`` column) or str.
    """
    if isinstance(html, bytes):
        sniff = html.decode('latin-1')  # byte-transparent view for the regex
    else:
        sniff = html
    m = _CHARSET_RE.search(sniff)
    if m:
        charset = m.groups()[0].strip().lower()
    return to_unicode(html, charset)


def is_html(html):
    """Content sniff for common tags (reference common.py:119-126)."""
    try:
        result = _IS_HTML_RE.search(html) is not None
    except TypeError:
        result = False
    return result


def is_url(text):
    """Whether text is an http(s) URL (reference common.py:129-139)."""
    return _IS_URL_RE.match(text) is not None


# ---------------------------------------------------------------------------
# list helpers (reference common.py:142-217)

def unique(l):
    """Order-preserving dedup (reference common.py:142-156)."""
    checked = []
    for e in l:
        if e not in checked:
            checked.append(e)
    return checked


def flatten(l):
    """Flatten one level of nesting (reference common.py:159-165)."""
    return [item for sublist in l for item in sublist]


def nth(l, i, default=''):
    """nth item or default (reference common.py:168-174)."""
    try:
        return l[i]
    except IndexError:
        return default


def first(l, default=''):
    """First item or default (reference common.py:176-184)."""
    return nth(l, i=0, default=default)


def last(l, default=''):
    """Last item or default (reference common.py:186-189)."""
    return nth(l, i=-1, default=default)


def pad(l, size, default=None, end=True):
    """Pad/truncate list to size (reference common.py:192-217)."""
    l = list(l)
    while len(l) < size:
        if end:
            l.append(default)
        else:
            l.insert(0, default)
    while len(l) > size:
        if end:
            l.pop()
        else:
            l.pop(0)
    return l


# ---------------------------------------------------------------------------
# the text kernel: remove_tags → unescape → normalize
# (reference common.py:220-334 — this defines the ``text`` output column)

def remove_tags(html, keep_children=True):
    """Remove HTML tags leaving just text (reference common.py:220-238)."""
    html = _EMPTY_TAG_RE.sub('', html)
    if not keep_children:
        for tag in unique(_CHILD_TAG_NAME_RE.findall(html)):
            if tag not in EMPTY_TAGS:
                html = re.compile('<\\s*%s.*?>.*?</\\s*%s\\s*>' % (tag, tag), re.DOTALL).sub('', html)
    return _ANY_TAG_RE.sub('', html)


def _entity_fixup(m):
    text = m.group(0)
    if text[:2] == '&#':
        # numeric character reference
        try:
            if text[:3] == '&#x':
                return chr(int(text[3:-1], 16))
            else:
                return chr(int(text[2:-1]))
        except (ValueError, OverflowError):
            pass
    else:
        # named entity
        try:
            text = chr(name2codepoint[text[1:-1].lower()])
        except KeyError:
            pass
    return text  # leave as is


def unescape(text, encoding=DEFAULT_ENCODING, keep_unicode=False):
    """Interpret escape characters (reference common.py:241-314).

    Order matters and is preserved from the reference: entities first,
    then percent-decoding, then (unless ``keep_unicode``) the
    "annoying characters" table for utf-8.
    """
    if not text:
        return ''
    text = to_unicode(text, encoding)
    text = _ENTITY_RE.sub(_entity_fixup, text)
    # py2-unquote-on-unicode semantics: %XX -> codepoint XX (latin-1)
    text = urllib.parse.unquote(text, encoding='latin-1')
    if keep_unicode:
        return text
    # py2 here encodes to `encoding` bytes with errors ignored; our str
    # equivalent drops anything unencodable in that charset
    try:
        text = text.encode(encoding, 'ignore').decode(encoding, 'ignore')
    except (UnicodeError, LookupError):
        pass
    if encoding != 'utf-8':
        return text
    return _ANNOYING_RE.sub(lambda m: _ANNOYING_CHARS[m.group(0)], text)


def normalize(s, encoding=DEFAULT_ENCODING, newlines=False, keep_unicode=False):
    """remove_tags + unescape + whitespace collapse (reference common.py:317-334).

    ``keep_unicode`` mirrors the reference's ``isinstance(s, unicode)``
    switch; the corpus byte contract uses the default ``False`` (the py2
    bytes path, with the annoying-characters table applied).
    """
    if isinstance(s, str):
        s = unescape(remove_tags(s), encoding=encoding, keep_unicode=keep_unicode)
        if newlines:
            s = _NL_RUN_RE.sub('\n', s)
            s = _SP_RUN_RE.sub(' ', s)
        else:
            s = _WS_RUN_RE.sub(' ', s)
        s = _COMMENT_RE.sub('', s).strip(_ASCII_WS)
    return s


def regex_get(html, pattern, index=None, normalized=True,
              flag=re.DOTALL | re.IGNORECASE, default='', one=False):
    """Regex extraction helper (reference common.py:337-353)."""
    m = re.compile(pattern, flag).search(html)
    if m:
        if len(m.groups()) == 1:
            return normalize(m.groups()[0]) if normalized else m.groups()[0]
        elif index is not None:
            return normalize(m.groups()[index]) if normalized else m.groups()[index]
        else:
            return [normalize(item) if normalized else item for item in m.groups()]
    return default


def parse_jsonp(s):
    """Strip fn(...) wrapper and parse JSON (reference common.py:356-363)."""
    try:
        rindex = s.index('(')
        lindex = s.rindex(')')
    except (ValueError, IndexError):
        return None
    return json.loads(s[rindex + 1:lindex])


# ---------------------------------------------------------------------------
# display helpers (reference common.py:366-394)

def safe(s):
    """URL-safe characters only (reference common.py:366-373)."""
    safe_chars = _string.ascii_letters + _string.digits + '-_ '
    return ''.join(c for c in s if c in safe_chars).replace(' ', '-')


def pretty(s):
    """Title-case with separators as spaces (reference common.py:376-382)."""
    return _PRETTY_SEP_RE.sub(' ', s.title())


def pretty_paragraph(s):
    """br/hr/li to newlines then strip tags (reference common.py:385-394)."""
    s = _PARA_BREAK_RE.sub('\n', s)
    s = unescape(remove_tags(s))

    def fixup(m):
        text = m.group(0)
        if '\r' in text or '\n' in text:
            return '\n'
        return ' '
    return re.sub(r'\s+', fixup, s, flags=re.ASCII).strip(_ASCII_WS)


# ---------------------------------------------------------------------------
# URL scalar helpers (reference common.py:397-442)

def get_extension(url):
    """Lowercased path extension (reference common.py:397-405)."""
    return os.path.splitext(urllib.parse.urlsplit(url).path)[-1].lower().replace('.', '')


# embedded TLD suffix list (reference common.py:421 — data, part of the
# observable partition-key semantics of get_domain)
_DOMAIN_SUFFIXES = frozenset((
    'ac', 'ad', 'ae', 'aero', 'af', 'ag', 'ai', 'al', 'am', 'an', 'ao', 'aq', 'ar', 'arpa', 'as', 'asia', 'at', 'au', 'aw', 'ax', 'az', 'ba', 'bb', 'bd', 'be', 'bf', 'bg', 'bh', 'bi', 'biz', 'bj', 'bm', 'bn', 'bo', 'br', 'bs', 'bt', 'bv', 'bw', 'by', 'bz', 'ca', 'cat', 'cc', 'cd', 'cf', 'cg', 'ch', 'ci', 'ck', 'cl', 'cm', 'cn', 'co', 'com', 'coop', 'cr', 'cu', 'cv', 'cx', 'cy', 'cz', 'de', 'dj', 'dk', 'dm', 'do', 'dz', 'ec', 'edu', 'ee', 'eg', 'er', 'es', 'et', 'eu', 'fi', 'fj', 'fk', 'fm', 'fo', 'fr', 'ga', 'gb', 'gd', 'ge', 'gf', 'gg', 'gh', 'gi', 'gl', 'gm', 'gn', 'gov', 'gp', 'gq', 'gr', 'gs', 'gt', 'gu', 'gw', 'gy', 'hk', 'hm', 'hn', 'hr', 'ht', 'hu', 'id', 'ie', 'il', 'im', 'in', 'info', 'int', 'io', 'iq', 'ir', 'is', 'it', 'je', 'jm', 'jo', 'jobs', 'jp', 'ke', 'kg', 'kh', 'ki', 'km', 'kn', 'kp', 'kr', 'kw', 'ky', 'kz', 'la', 'lb', 'lc', 'li', 'lk', 'lr', 'ls', 'lt', 'lu', 'lv', 'ly', 'ma', 'mc', 'md', 'me', 'mg', 'mh', 'mil', 'mk', 'ml', 'mm', 'mn', 'mo', 'mobi', 'mp', 'mq', 'mr', 'ms', 'mt', 'mu', 'mv', 'mw', 'mx', 'my', 'mz', 'na', 'name', 'nc', 'ne', 'net', 'nf', 'ng', 'ni', 'nl', 'no', 'np', 'nr', 'nu', 'nz', 'om', 'org', 'pa', 'pe', 'pf', 'pg', 'ph', 'pk', 'pl', 'pm', 'pn', 'pr', 'pro', 'ps', 'pt', 'pw', 'py', 'qa', 're', 'ro', 'rs', 'ru', 'rw', 'sa', 'sb', 'sc', 'sd', 'se', 'sg', 'sh', 'si', 'sj', 'sk', 'sl', 'sm', 'sn', 'so', 'sr', 'st', 'su', 'sv', 'sy', 'sz', 'tc', 'td', 'tel', 'tf', 'tg', 'th', 'tj', 'tk', 'tl', 'tm', 'tn', 'to', 'tp', 'tr', 'tt', 'tv', 'tw', 'tz', 'ua', 'ug', 'uk', 'us', 'uy', 'uz', 'va', 'vc', 've', 'vg', 'vi', 'vn', 'vu', 'wf', 'ws', 'xn', 'ye', 'yt', 'za', 'zm', 'zw'))


def get_domain(url):
    """Registrable domain of the URL (reference common.py:408-429).

    This is the crawl's partition key (``host`` column / politeness key).
    """
    m = _IP_URL_RE.search(url)
    if m:
        return m.groups()[0]
    url = _SCHEME_RE.sub('', url).partition('/')[0].lower()
    domain = []
    for section in url.split('.'):
        if section in _DOMAIN_SUFFIXES:
            domain.append(section)
        else:
            domain = [section]
    return '.'.join(domain)


def same_domain(url1, url2):
    """Substring-containment domain match (reference common.py:432-442)."""
    server1 = get_domain(url1)
    server2 = get_domain(url2)
    return bool(server1 and server2 and (server1 in server2 or server2 in server1))


def pretty_duration(dt):
    """English description of a time difference (reference common.py:445-490)."""
    if isinstance(dt, datetime):
        dt = datetime.now() - dt
    if not isinstance(dt, timedelta):
        return ''
    if dt.days >= 2 * 365:
        return '%d years' % int(dt.days / 365)
    elif dt.days >= 365:
        return '1 year'
    elif dt.days >= 60:
        return '%d months' % int(dt.days / 30)
    elif dt.days > 21:
        return '1 month'
    elif dt.days >= 14:
        return '%d weeks' % int(dt.days / 7)
    elif dt.days >= 7:
        return '1 week'
    elif dt.days > 1:
        return '%d days' % dt.days
    elif dt.days == 1:
        return '1 day'
    elif dt.seconds >= 2 * 60 * 60:
        return '%d hours' % int(dt.seconds / 3600)
    elif dt.seconds >= 60 * 60:
        return '1 hour'
    elif dt.seconds >= 2 * 60:
        return '%d minutes' % int(dt.seconds / 60)
    elif dt.seconds >= 60:
        return '1 minute'
    elif dt.seconds > 1:
        return '%d seconds' % dt.seconds
    elif dt.seconds == 1:
        return '1 second'
    else:
        return ''


def parse_proxy(proxy):
    """Parse proxy string into fragments (reference common.py:493-521)."""
    fragments = {'username': '', 'password': '', 'host': None, 'port': ''}
    if isinstance(proxy, str):
        match = _PROXY_RE.match(proxy)
        if match:
            groups = match.groupdict()
            fragments['username'] = groups.get('username') or ''
            fragments['password'] = groups.get('password') or ''
            fragments['host'] = groups.get('host')
            fragments['port'] = groups.get('port') or ''
    return fragments
