"""Ported doctest corpus for the text kernels (reference common.py).

Each case is a doctest from the reference (SURVEY.md §5 / FIXTURES.md §6)
— these strings ARE the conformance spec.
"""

from datetime import timedelta

import pytest

from webscraping_ray.kernels import text as T


# --- to_int / to_float (common.py:59-89) ---

@pytest.mark.parametrize("s,expected", [
    ('90', 90), ('-90.2432', -90), ('a90a', 90), ('a', 0),
])
def test_to_int(s, expected):
    assert T.to_int(s) == expected


def test_to_int_default():
    assert T.to_int('a', 90) == 90


@pytest.mark.parametrize("s,expected", [
    ('90.45', 90.45), ('', 0.0), ('90', 90.0), ('..9', 0.0), ('.9', 0.9),
    (None, 0.0), (1, 1.0),
])
def test_to_float(s, expected):
    assert T.to_float(s) == expected


# --- is_url (common.py:132-137) ---

@pytest.mark.parametrize("s,expected", [
    ('abc', False), ('webscraping.com', False),
    ('http://webscraping.com/blog', True),
])
def test_is_url(s, expected):
    assert T.is_url(s) is expected


# --- list ops (common.py:145-204) ---

def test_unique():
    assert T.unique([3, 6, 4, 4, 6]) == [3, 6, 4]
    assert T.unique([]) == []
    assert T.unique([3, 6, 4]) == [3, 6, 4]


def test_flatten():
    assert T.flatten([[1, 2, 3], [4, 5, 6]]) == [1, 2, 3, 4, 5, 6]


def test_first_last_nth():
    assert T.first([1, 2, 3]) == 1
    assert T.first([], None) is None
    assert T.last([1, 2, 3]) == 3
    assert T.nth([1, 2, 3], 1) == 2
    assert T.nth([], 5, 'd') == 'd'


def test_pad():
    assert T.pad(list(range(5)), 5) == [0, 1, 2, 3, 4]
    assert T.pad(list(range(5)), 3) == [0, 1, 2]
    assert T.pad(list(range(5)), 7, -1) == [0, 1, 2, 3, 4, -1, -1]
    assert T.pad(list(range(5)), 7, end=False) == [None, None, 0, 1, 2, 3, 4]


# --- remove_tags (common.py:224-231) ---

def test_remove_tags():
    assert T.remove_tags('hello <b>world</b>!') == 'hello world!'
    assert T.remove_tags('hello <b>world</b>!', False) == 'hello !'
    assert T.remove_tags('hello <br>world<br />!', False) == 'hello world!'
    assert T.remove_tags('<span><b></b></span>test</span>', False) == 'test'


# --- unescape (common.py:244-245) ---

def test_unescape():
    assert T.unescape('&lt;hello&nbsp;&amp;%20world&gt;') == '<hello & world>'


def test_unescape_numeric_refs():
    assert T.unescape('&#65;&#x42;') == 'AB'
    assert T.unescape('') == ''
    assert T.unescape(None) == ''


def test_unescape_annoying_chars():
    # cp1252-ish punctuation is ASCII-ified on the bytes path
    assert T.unescape('a\u0093b\u0094c') == 'a"b"c'
    assert T.unescape('x\u0085') == 'x...'
    assert T.unescape('1\u00bd') == '11/2'
    # but preserved verbatim when keep_unicode=True (py2 unicode path)
    assert T.unescape('a\u0093b', keep_unicode=True) == 'a\u0093b'


def test_unescape_percent_latin1():
    # py2 unquote-on-unicode semantics: %XX -> codepoint XX
    assert T.unescape('%C3%A9') == '\xc3\xa9'


# --- normalize (common.py:320-322) ---

def test_normalize():
    assert T.normalize('<span>Tel.:   029&nbsp;-&nbsp;12345678   </span>') == 'Tel.: 029 - 12345678'


def test_normalize_newlines():
    assert T.normalize('a\n\n\nb\t c', newlines=True) == 'a\nb c'
    assert T.normalize(123) == 123  # non-strings pass through


# --- regex_get (common.py:340-343) ---

def test_regex_get():
    html = '<div><span>Phone: 029&nbsp;01054609</span><span></span></div>'
    assert T.regex_get(html, r'<span>Phone:([^<>]+)') == '029 01054609'
    assert T.regex_get(html, r'<span>Phone:\s*(\d+)&nbsp;(\d+)') == ['029', '01054609']


# --- safe / pretty (common.py:369-381) ---

def test_safe():
    assert T.safe('U@#$_#^&*-2') == 'U_-2'


def test_pretty():
    assert T.pretty('hello_world') == 'Hello World'


# --- get_extension (common.py:400-403) ---

def test_get_extension():
    assert T.get_extension('hello_world.JPG') == 'jpg'
    assert T.get_extension('http://www.google-analytics.com/__utm.gif?utmwv=1.3&utmn=420639071') == 'gif'


# --- get_domain / same_domain (common.py:411-438) ---

def test_get_domain():
    assert T.get_domain('http://www.google.com.au/tos.html') == 'google.com.au'
    assert T.get_domain('www.google.com') == 'google.com'
    assert T.get_domain('http://127.0.0.1/x') == '127.0.0.1'


def test_same_domain():
    assert T.same_domain('http://www.google.com.au', 'code.google.com') is True
    assert T.same_domain('http://www.facebook.com', 'http://www.myspace.com') is False


# --- pretty_duration (common.py:448-454) ---

def test_pretty_duration():
    assert T.pretty_duration(timedelta(seconds=1)) == '1 second'
    assert T.pretty_duration(timedelta(hours=1)) == '1 hour'
    assert T.pretty_duration(timedelta(days=2)) == '2 days'
    assert T.pretty_duration('nonsense') == ''


# --- parse_proxy (common.py:497-510) ---

def test_parse_proxy():
    f = T.parse_proxy('login:pw@66.197.208.200:8080')
    assert f['username'] == 'login'
    assert f['password'] == 'pw'
    assert f['host'] == '66.197.208.200'
    assert f['port'] == '8080'
    f = T.parse_proxy('66.197.208.200')
    assert f['username'] == f['password'] == f['port'] == ''
    assert f['host'] == '66.197.208.200'


# --- misc ---

def test_is_html():
    assert T.is_html('<html><body>x</body></html>') is True
    assert T.is_html(None) is False


def test_html_to_unicode_charset_sniff():
    html = b'<meta charset=iso-8859-1>caf\xe9'
    assert T.html_to_unicode(html) == '<meta charset=iso-8859-1>caf\xe9'


def test_parse_jsonp():
    assert T.parse_jsonp('cb({"a": 1})') == {"a": 1}
    assert T.parse_jsonp('nope') is None


def test_pretty_paragraph():
    assert T.pretty_paragraph('a<br>b   c') == 'a\nb c'
