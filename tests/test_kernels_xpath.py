"""Ported doctest corpus for the subset-XPath engine (reference xpath.py)."""

from webscraping_ray.kernels import xpath


DOC_HTML = '<div>abc<a class="link">LINK 1</a><div><a>LINK 2</a>def</div>abc</div>ghi<div><a>LINK 3</a>jkl</div>'


# --- Doc class doctests (xpath.py:33-61) ---

def test_doc_search_child():
    doc = xpath.Doc(DOC_HTML)
    assert doc.search('/div/a') == ['LINK 1', 'LINK 3']


def test_doc_search_attr_filter():
    doc = xpath.Doc(DOC_HTML)
    assert doc.search('/div/a[@class="link"]') == ['LINK 1']


def test_doc_search_index_descendant():
    doc = xpath.Doc(DOC_HTML)
    assert doc.search('/div[1]//a') == ['LINK 1', 'LINK 2']


def test_doc_search_attr_select():
    doc = xpath.Doc(DOC_HTML)
    assert doc.search('/div/a/@class') == ['link', '']


def test_doc_negative_index():
    doc = xpath.Doc(DOC_HTML)
    assert doc.search('/div[-1]/a') == ['LINK 3']


def test_doc_unicode():
    doc = xpath.Doc('<a href="http://www.google.com" class="flink">google</a>')
    assert doc.get('//a[@class="flink"]') == 'google'


def test_doc_first_match_large():
    doc = xpath.Doc('<div><span>content</span></div>' * 10000)
    assert doc.get('//span') == 'content'


def test_doc_self_closing_attr():
    assert xpath.Doc('<div><img src="img.png"></div>').get('/div/img/@src') == 'img.png'


def test_doc_after_self_closing():
    assert xpath.Doc('<div><br><p>content</p></br></div>').get('/div/p') == 'content'


# --- parse (xpath.py:163-171) ---

def test_parse():
    doc = xpath.Doc('')
    assert doc.parse('/div[1]//span[@class="text"]') == \
        [(0, '', 'div', 1, []), (1, '/', 'span', None, [('class', 'text')])]
    assert doc.parse('//li[-2]') == [(0, '/', 'li', -2, [])]
    assert doc.parse('//option[@selected]') == [(0, '/', 'option', None, [('selected', None)])]
    assert doc.parse('/div[@id="content"]//span[1][@class="text"][@title=""]/a') == \
        [(0, '', 'div', None, [('id', 'content')]),
         (1, '/', 'span', 1, [('class', 'text'), ('title', '')]),
         (2, '', 'a', None, [])]


# --- _get_attributes (xpath.py:203-209) ---

def test_get_attributes():
    doc = xpath.Doc('')
    assert doc._get_attributes(
        '<div id="ID" name="MY NAME" max-width="20" class=abc>content <span class="inner name">SPAN</span></div>') == \
        {'max-width': '20', 'class': 'abc', 'id': 'ID', 'name': 'MY NAME'}
    assert doc._get_attributes('<td width=200 valign=top class=textelien>') == \
        {'width': '200', 'class': 'textelien', 'valign': 'top'}
    assert doc._get_attributes('<option value="1" selected>') == {'selected': None, 'value': '1'}


# --- _match_attributes incl. regex values (xpath.py:227-251) ---

def test_match_attributes():
    doc = xpath.Doc('')
    assert doc._match_attributes([], {}) is True
    assert doc._match_attributes([('class', 'test')], {}) is False
    assert doc._match_attributes([], {'id': 'test', 'class': 'test2'}) is True
    assert doc._match_attributes([('class', 'test')], {'id': 'test', 'class': 'test2'}) is False
    assert doc._match_attributes([('class', 'test')], {'id': 'test2', 'class': 'test'}) is True
    assert doc._match_attributes([('class', 'test'), ('id', 'content')],
                                 {'id': 'test', 'class': 'content'}) is False
    assert doc._match_attributes([('class', 'test'), ('id', 'content')],
                                 {'id': 'content', 'class': 'test'}) is True
    assert doc._match_attributes([('class', r'test\d')], {'id': 'test', 'class': 'test2'}) is True
    assert doc._match_attributes([('class', r'test\d')], {'id': 'test2', 'class': 'test'}) is False
    assert doc._match_attributes([('selected', None)], {'selected': None, 'class': 'test'}) is True
    assert doc._match_attributes([('selected', None)], {'class': 'test'}) is False
    assert doc._match_attributes([('class', 'test')], {'selected': None, 'class': 'test'}) is True


# --- _get_content (xpath.py:278-280) ---

def test_get_content():
    doc = xpath.Doc('')
    assert doc._get_content('<div id="ID" name="NAME">content <span>SPAN</span></div>') == \
        'content <span>SPAN</span>'


# --- _find_children incl. tbody quirk (xpath.py:293-299) ---

def test_find_children():
    doc = xpath.Doc('')
    assert list(doc._find_children('<span>1</span><div>abc<div>def</div>abc</div>ghi<div>jkl</div>', 'div')) == \
        ['<div>abc<div>def</div>abc</div>', '<div>jkl</div>']
    assert list(doc._find_children('<tbody><tr><td></td></tr></tbody>', 'tbody')) == \
        ['<tbody><tr><td></td></tr></tbody>']
    # the tbody quirk: a missing tbody is skipped
    assert list(doc._find_children('<tr><td></td></tr>', 'tbody')) == ['<tr><td></td></tr>']


# --- _find_descendants (xpath.py:325-327) ---

def test_find_descendants():
    doc = xpath.Doc('')
    assert list(doc._find_descendants('<span>1</span><div>abc<div>def</div>abc</div>ghi<div>jkl</div>', 'div')) == \
        ['<div>abc<div>def</div>abc</div>', '<div>def</div>', '<div>jkl</div>']


# --- _jump_next_tag (xpath.py:341-349) ---

def test_jump_next_tag():
    doc = xpath.Doc('')
    assert doc._jump_next_tag('<div>abc</div>') == '<div>abc</div>'
    assert doc._jump_next_tag(' <div>abc</div>') == '<div>abc</div>'
    assert doc._jump_next_tag('</span> <div>abc</div>') == '<div>abc</div>'
    assert doc._jump_next_tag(' <br> <div>abc</div>') == '<br> <div>abc</div>'


# --- _get_tag (xpath.py:362-366) ---

def test_get_tag():
    doc = xpath.Doc('')
    assert doc._get_tag('<div>abc</div>') == 'div'
    assert doc._get_tag(' <div>') is None
    assert doc._get_tag('div') is None


# --- _split_tag incl. unbalanced recovery (xpath.py:378-386) ---

def test_split_tag():
    doc = xpath.Doc('')
    assert doc._split_tag('<div>abc<div>def</div>abc</div>ghi<div>jkl</div>') == \
        ('<div>abc<div>def</div>abc</div>', 'ghi<div>jkl</div>')
    assert doc._split_tag('<br /><div>abc</div>') == ('<br />', '<div>abc</div>')
    assert doc._split_tag('<div>abc<div>def</div>abc</span>') == \
        ('<div>abc<div>def</div>abc</span></div>', '')


# --- get_links (xpath.py:515-555) ---

def test_get_links():
    html = ('<a href="/a.html">x</a><a href="b.html#frag">y</a>'
            '<iframe src="/f.html"></iframe>'
            '<script>location.href = "/js.html"</script>'
            '<a href="mailto:x@y.com">m</a><a href="/a.html">dup</a>')
    assert xpath.get_links(html, url='http://example.com/index.html') == [
        'http://example.com/a.html', 'http://example.com/b.html',
        'http://example.com/f.html', 'http://example.com/js.html']


def test_get_links_local_external():
    html = '<a href="/in.html">i</a><a href="http://other.com/out.html">o</a>'
    assert xpath.get_links(html, url='http://example.com/', local=False) == \
        ['http://other.com/out.html']
    assert xpath.get_links(html, url='http://example.com/', external=False) == \
        ['http://example.com/in.html']


# --- Form (xpath.py:487-508) ---

def test_form():
    form = ('<form><input name="a" value="1"><input name="b" value="2">'
            '<select name="c"><option value="x">X</option><option value="y" selected>Y</option></select></form>')
    f = xpath.Form(form)
    assert f['a'] == '1'
    assert f['b'] == '2'
    assert f['c'] == 'y'


def test_tree_wrapper_matches_reference_import_guard():
    """xpath.Tree (reference xpath.py:427-467): with lxml installed it
    wraps lxml.html; without (this container), constructing one raises
    ImportError — byte-for-byte the reference's fallback behavior."""
    from webscraping_ray.kernels.xpath import Tree

    try:
        import lxml.html  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match='lxml not installed'):
            Tree('<p>hi</p>')
    else:
        t = Tree('<div><p>hi</p> there</div>')
        assert t.search('//p') == ['hi']
        assert t.get('//div') == 'hi there' or 'hi' in t.get('//div')
