"""Ported doctest corpus for the extractors (reference alg.py)."""

import random

from webscraping_ray.kernels import extract as E


# --- extract_emails (alg.py:35-46) ---

def test_extract_emails():
    assert E.extract_emails('') == []
    assert E.extract_emails('hello contact@webscraping.com world') == ['contact@webscraping.com']
    assert E.extract_emails('hello contact@<!-- trick comment -->webscraping.com world') == \
        ['contact@webscraping.com']
    assert E.extract_emails('hello contact AT webscraping DOT com world') == \
        ['contact@webscraping.com']
    assert E.extract_emails(' info+hn@gmail.com ') == ['info+hn@gmail.com']
    assert E.extract_emails('<a href="mailto:first.last@mail.co.uk">Contact</a>') == \
        ['first.last@mail.co.uk']


def test_extract_emails_filters():
    # media extension TLD, digit TLD, dummy emails are rejected
    assert E.extract_emails('x@y.jpg') == []
    assert E.extract_emails('x@y.a1b') == []
    assert E.extract_emails('username@location.com') == []


# --- extract_phones (alg.py:71-80) ---

def test_extract_phones():
    assert E.extract_phones('Phone: (123) 456-7890 <br>') == ['(123) 456-7890']
    assert E.extract_phones('Phone 123.456.7890 ') == ['123.456.7890']
    assert E.extract_phones('+1-123-456-7890<br />123 456 7890n') == \
        ['123-456-7890', '123 456 7890']
    assert E.extract_phones('456-7890') == []
    assert E.extract_phones('<a href="tel:0234673460">Contact</a>') == ['0234673460']


# --- parse_us_address (alg.py:88-90) ---

def test_parse_us_address():
    assert E.parse_us_address('6200 20th Street, Vero Beach, FL 32966') == \
        ('6200 20th Street', 'Vero Beach', 'FL', '32966')


# --- distance (alg.py:126-129) ---

def test_distance():
    melbourne = -37.7833, 144.9667
    san_francisco = 37.7750, -122.4183
    assert int(E.distance(melbourne, san_francisco, 'km')) == 12659
    assert E.distance(melbourne, melbourne) == 0


# --- get_excerpt (alg.py:7-25) ---

def test_get_excerpt_meta():
    html = ('<html><head><meta name="description" content="the description"></head>'
            '<body><p>short</p></body></html>')
    assert E.get_excerpt(html, try_meta=True) == 'the description'


def test_get_excerpt_largest_block():
    html = ('<html><body><p>tiny</p>\n'
            '<p>this is the much larger text block that wins</p></body></html>')
    out = E.get_excerpt(html)
    assert 'larger text block' in out


# --- filter_min_distance (alg.py:187-200) ---

def test_filter_min_distance():
    records = [('a', 0.0, 0.0), ('b', 0.1, 0.1), ('c', 50.0, 50.0)]
    kept = list(E.filter_min_distance(records, min_distance=100, scale='miles'))
    assert [k for k, _, _ in kept] == ['a', 'c']
    # min_distance=0 keeps everything
    assert len(list(E.filter_min_distance(records, min_distance=0))) == 3


# --- find_json_path (alg.py:203-217) ---

def test_find_json_path():
    data = {'a': [1, {'b': 2}], 'c': 2}
    paths = E.find_json_path(data, 2)
    assert sorted(paths) == ['["a"][1]["b"]', '["c"]']


# --- coordinates ---

def test_move_coordinate_and_grid():
    lat, lng = E.move_coordinate(0.0, 0.0, 100, 0, 'km')
    assert lat > 0 and lng == 0.0
    coords = list(E.find_coordinates(ch_lat=5000, ch_lng=5000, ch_scale='km',
                                     min_lat=-10, max_lat=10, min_lng=-10, max_lng=10))
    assert len(coords) >= 1


# --- rand_agent (alg.py:254-258): deterministic under a seeded RNG ---

def test_rand_agent_deterministic():
    a1 = E.rand_agent(random.Random(42))
    a2 = E.rand_agent(random.Random(42))
    assert a1 == a2
    assert 'Mozilla/5.0' in a1


def test_ua_component_public_aliases():
    """Reference-public UA component fns (alg.py:223-251) exist with
    the reference signatures and compose like rand_agent."""
    r = random.Random(7)
    assert E.linux_os(random.Random(1)) == E.linux_os(random.Random(1))
    assert E.osx_os(r).startswith('Macintosh; Intel Mac OS X 10.')
    assert E.windows_os(r).startswith('Windows NT')
    assert E.rand_os(r)
    os_v = E.linux_os(random.Random(2))
    assert 'Firefox/' in E.firefox_browser(os_v, random.Random(3))
    assert 'MSIE' in E.ie_browser(rng=random.Random(4))
    assert 'Chrome/' in E.chrome_browser(os_v, random.Random(5))


def test_get_zip_codes_greedy_distance_filter(tmp_path):
    """Greedy first-wins filter in file order (alg.py:187-201): a zip
    within min_distance of an already-kept one is dropped; lat/lng
    come back as the file's original strings."""
    f = tmp_path / 'zips.csv'
    f.write_text('Zip,Latitude,Longitude\n'
                 '10001,40.75,-73.99\n'     # kept (first)
                 '10002,40.76,-74.00\n'     # ~1 mile away -> dropped
                 '90210,34.09,-118.41\n'    # far -> kept
                 '90211,34.08,-118.40\n')   # near 90210 -> dropped
    assert list(E.get_zip_codes(str(f), min_distance=50)) == [
        '10001', '90210']
    rows = list(E.get_zip_lat_lngs(str(f), min_distance=0))
    assert rows[0] == ('10001', '40.75', '-73.99')
    assert len(rows) == 4
