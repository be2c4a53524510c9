"""High-level extractors, py3 ports of the reference ``alg.py``.

Each of these is used inside vectorized ``map_batches`` stages
(`stages/extract_stage.py`); patterns are compiled at module import so
actors pay the cost once.
"""

from __future__ import annotations

import math
import random
import re

from . import text as common
from . import xpath

_ASCII_WS = ' \t\n\r\f\v'

# email patterns (reference alg.py:50,60)
_EMAIL_RE = re.compile(r'([\w\.\-\+]{1,64})@(\w[\w\.-]{1,255})\.(\w+)')
_OBFUSCATED_EMAIL_RE = re.compile(r'([\w\.\-\+]{1,64})\s?.?AT.?\s?([\w\.-]{1,255})\s?.?DOT.?\s?(\w+)', re.IGNORECASE)
_COMMENT_RE = re.compile('<!--.*?-->', re.DOTALL)
_DIGIT_RE = re.compile(r'\d')
# phone patterns (reference alg.py:82)
# non-capturing country-code group: findall then returns whole
# matches, so extract_phones runs one C-level findall instead of a
# Python finditer+group() loop (match set identical)
_PHONE_RE = re.compile(r'(?:\+\d{1,2}\s)?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}')
_TEL_RE = re.compile(r'tel:(\d+)')
# US address state/zip (reference alg.py:94)
_STATE_ZIP_RE = re.compile(r'([A-Z]{2,})\s*(\d[\d\-\s]+\d)')

IGNORED_EMAILS = ('username@location.com', 'johndoe@domain.com')


def get_excerpt(html, try_meta=False, max_chars=255):
    """Excerpt = meta description else largest text block of /html/body
    (reference alg.py:7-25).

    NOTE the ``remove=bad_tags`` argument passed to ``xpath.get`` in the
    reference is a no-op (Doc.__init__ ignores it); we reproduce that.
    """
    excerpt = ''
    if try_meta:
        excerpt = xpath.get(html, '/html/head/meta[@name="description"]/@content')
    if not excerpt:
        bad_tags = ('hr', 'br', 'script', 'h1', 'h2', 'h3', 'h4', 'h5', 'h6')
        content = common.remove_tags(xpath.get(html, '/html/body', remove=bad_tags))
        if content:
            excerpt = max((len(p.strip(_ASCII_WS)), p) for p in content.splitlines())[1]
    return common.unescape(excerpt.strip(_ASCII_WS))[:max_chars]


def _email_ok(ext, domain):
    return (ext.lower() not in common.MEDIA_EXTENSIONS_SET and len(ext) >= 2
            and not _DIGIT_RE.search(ext) and domain.count('.') <= 3)


def extract_emails(html, ignored=IGNORED_EMAILS):
    """De-obfuscate and extract emails, ordered dedup (reference alg.py:29-65)."""
    emails = []
    if html:
        # cheap necessary-condition guards (hot-path: this runs per
        # page in the extract sweep).  Each skipped step is an exact
        # no-op on pages failing the guard: the comment sub and
        # mailto replace are identity without their literals, the
        # plain regex needs a literal '@', and the obfuscated regex
        # needs a contiguous case-insensitive 'DOT'.  Outputs are
        # byte-identical to the unguarded reference path
        # (alg.py:29-65); pinned by the kernel tests.
        if '<!--' in html:
            html = _COMMENT_RE.sub('', html)
        if 'mailto:' in html:
            html = html.replace('mailto:', '')
        if '@' in html:
            for user, domain, ext in _EMAIL_RE.findall(html):
                if _email_ok(ext, domain):
                    email = '%s@%s.%s' % (user, domain, ext)
                    if email not in emails:
                        emails.append(email)
        if 'dot' in html.lower():
            for user, domain, ext in _OBFUSCATED_EMAIL_RE.findall(html):
                if _email_ok(ext, domain):
                    email = '%s@%s.%s' % (user, domain, ext)
                    if email not in emails:
                        emails.append(email)
    return [email for email in emails if email not in ignored]


def extract_phones(html):
    """Extract phone numbers + tel: hrefs (reference alg.py:68-82)."""
    return _PHONE_RE.findall(html) + _TEL_RE.findall(html)


def parse_us_address(address):
    """Split into (address, city, state, zip) (reference alg.py:85-105)."""
    city = state = zipcode = ''
    addrs = [x.strip() for x in address.split(',')]
    if addrs:
        m = _STATE_ZIP_RE.search(addrs[-1])
        if m:
            state = m.groups()[0].strip()
            zipcode = m.groups()[1].strip()
            if len(addrs) >= 3:
                city = addrs[-2].strip()
                address = ','.join(addrs[:-2])
            else:
                address = ','.join(addrs[:-1])
    return address, city, state, zipcode


def get_earth_radius(scale):
    """Earth radius for a unit (reference alg.py:108-116)."""
    if scale is None:
        return 1.0
    elif scale == 'km':
        return 6373.0
    elif scale == 'miles':
        return 3960.0
    else:
        raise common.WebScrapingError('Invalid scale: %s' % str(scale))


def distance(p1, p2, scale=None):
    """Great-circle distance between (lat, lng) points (reference alg.py:119-157)."""
    if p1 == p2:
        return 0
    lat1, long1 = p1
    lat2, long2 = p2
    degrees_to_radians = math.pi / 180.0
    phi1 = (90.0 - lat1) * degrees_to_radians
    phi2 = (90.0 - lat2) * degrees_to_radians
    theta1 = long1 * degrees_to_radians
    theta2 = long2 * degrees_to_radians
    cos = (math.sin(phi1) * math.sin(phi2) * math.cos(theta1 - theta2) +
           math.cos(phi1) * math.cos(phi2))
    arc = math.acos(cos)
    return arc * get_earth_radius(scale)


def move_coordinate(lat, lng, ch_lat, ch_lng, ch_scale=None):
    """Shift a coordinate by an increment (reference alg.py:172-178)."""
    r_earth = get_earth_radius(ch_scale)
    new_lat = lat + (ch_lat / r_earth) * (180 / math.pi)
    new_lng = lng + (ch_lng / r_earth) * (180 / math.pi) / math.cos(lat * math.pi / 180.0)
    return new_lat, new_lng


def find_coordinates(ch_lat=100, ch_lng=100, ch_scale='miles',
                     min_lat=-90, max_lat=90, min_lng=-180, max_lng=180):
    """Grid of coordinates over a bounding box (reference alg.py:160-169)."""
    cur_lat = min_lat
    while cur_lat < max_lat:
        cur_lng = min_lng
        while cur_lng < max_lng:
            yield cur_lat, cur_lng
            _, cur_lng = move_coordinate(cur_lat, cur_lng, 0, ch_lng, ch_scale)
        cur_lat, _ = move_coordinate(cur_lat, cur_lng, ch_lat, 0, ch_scale)


def filter_min_distance(records, min_distance=100, scale='miles'):
    """Greedy min-distance filter over (key, lat, lng) records
    (reference alg.py:187-200, ``get_zip_lat_lngs`` with the file I/O
    replaced by an iterable).  Order-dependent by design: a record is
    kept iff it is ≥ min_distance from every previously-kept record.
    """
    if min_distance > 0:
        locations = []
        for key, lat, lng in records:
            lat_f, lng_f = float(lat), float(lng)
            for other_lat, other_lng in locations:
                if distance((lat_f, lng_f), (other_lat, other_lng), scale=scale) < min_distance:
                    break
            else:
                locations.append((lat_f, lng_f))
                yield key, lat, lng
    else:
        for key, lat, lng in records:
            yield key, lat, lng


def find_json_path(e, value, path=''):
    """JSON paths pointing at ``value`` (reference alg.py:203-217)."""
    results = []
    if e == value:
        results.append(path)
    if isinstance(e, dict):
        for k, v in e.items():
            results.extend(find_json_path(v, value, '{}["{}"]'.format(path, k)))
    elif isinstance(e, list):
        for i, v in enumerate(e):
            results.extend(find_json_path(v, value, '{}[{}]'.format(path, i)))
    return results


# ---------------------------------------------------------------------------
# random User-Agent synthesis (reference alg.py:220-258).  Determinism:
# pass a seeded ``random.Random`` for reproducible runs.

def _linux_os(rng):
    dist = rng.choice(['', ' U;', ' Ubuntu;'])
    system = rng.choice(['', ' x86_64', ' i686'])
    return 'X11;%s Linux%s' % (dist, system)


def _osx_os(rng):
    return 'Macintosh; Intel Mac OS X 10.%d' % rng.randint(6, 9)


def _windows_os(rng):
    system = rng.choice(['', '; Win64; x64', '; WOW64'])
    return 'Windows NT %d.%d%s' % (rng.randint(5, 6), rng.randint(0, 2), system)


def _rand_os(rng):
    return rng.choice([_linux_os, _osx_os, _windows_os])(rng)


def _firefox_browser(os_version, rng):
    v = rng.randint(20, 25)
    return 'Mozilla/5.0 (%s; rv:%d.0) Gecko/20100101 Firefox/%d.0' % (os_version, v, v)


def _ie_browser(os_version, rng):
    os_version = _windows_os(rng)  # always windows with IE
    return 'Mozilla/5.0 (compatible; MSIE %d.0; %s; Trident/%d.0)' % (
        rng.randint(8, 10), os_version, rng.randint(5, 6))


def _chrome_browser(os_version, rng):
    return 'Mozilla/5.0 (%s) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/%d.0.%d.%d Safari/537.36' % (
        os_version, rng.randint(28, 32), rng.randint(1464, 1667), rng.randint(0, 9))


def rand_agent(rng=None):
    """Random User-Agent (reference alg.py:254-258)."""
    rng = rng or random
    browser = rng.choice([_firefox_browser, _ie_browser, _chrome_browser])
    return browser(_rand_os(rng), rng)


# reference-public aliases of the UA components (alg.py:223-251): user
# code calls these directly; an optional seeded rng keeps determinism
def linux_os(rng=None):
    return _linux_os(rng or random)


def osx_os(rng=None):
    return _osx_os(rng or random)


def windows_os(rng=None):
    return _windows_os(rng or random)


def rand_os(rng=None):
    return _rand_os(rng or random)


def firefox_browser(os_version, rng=None):
    return _firefox_browser(os_version, rng or random)


def ie_browser(os_version=None, rng=None):
    return _ie_browser(os_version, rng or random)


def chrome_browser(os_version, rng=None):
    return _chrome_browser(os_version, rng or random)


def get_zip_lat_lngs(filename, min_distance=100, scale='miles',
                     lat_key='Latitude', lng_key='Longitude',
                     zip_key='Zip'):
    """Yield (zip, lat, lng) rows of a zip-code CSV whose locations
    are at least ``min_distance`` apart (reference alg.py:187-201 —
    greedy first-wins filter in file order, O(kept) comparisons per
    row, lat/lng yielded as the file's original strings).  The filter
    itself is :func:`filter_min_distance`; this adds only the CSV
    framing."""
    import csv

    yield from filter_min_distance(
        ((r[zip_key], r[lat_key], r[lng_key])
         for r in csv.DictReader(open(filename))),
        min_distance, scale)


def get_zip_codes(filename, min_distance=100, scale='miles',
                  lat_key='Latitude', lng_key='Longitude',
                  zip_key='Zip'):
    """Zip codes of :func:`get_zip_lat_lngs` (reference alg.py:181-185)."""
    for zip_code, _lat, _lng in get_zip_lat_lngs(
            filename, min_distance, scale, lat_key, lng_key, zip_key):
        yield zip_code


def parse_location(result):
    """Flatten a geocoding API result into a flat dict
    (reference download.py:729-765, ``GoogleMaps.parse_location``).

    Pure JSON processing — the API transport is out of scope (no
    network), but the flattener is the reusable operator (map → struct
    per SURVEY §2.2).
    """
    import collections

    results = collections.defaultdict(str)
    for e in result['address_components']:
        types, value, abbrev = e['types'], e['long_name'], e['short_name']
        if 'street_number' in types:
            results['number'] = value
        elif 'route' in types:
            results['street'] = value
        elif 'postal_code' in types:
            results['postcode'] = value
        elif 'locality' in types:
            results['suburb'] = value
        elif 'administrative_area_level_1' in types:
            results['state'] = value
            results['state_code'] = abbrev
        elif 'administrative_area_level_2' in types:
            results['county'] = value
        elif 'administrative_area_level_3' in types:
            results['district'] = value
        elif 'country' in types:
            results['country'] = value
            results['country_code'] = abbrev
    results['full_address'] = result['formatted_address']
    if 'street' in results:
        results['address'] = (results['number'] + ' ' + results['street']).strip()
    results['lat'] = result['geometry']['location']['lat']
    results['lng'] = result['geometry']['location']['lng']
    results['types'] = result['types']
    return results


def load_api_result(html):
    """Parse a JSON API response with a ``status`` field
    (reference download.py:703-726 semantics, transport stripped)."""
    import json as _json

    if html:
        try:
            data = _json.loads(html)
        except ValueError:
            return {}
        if data.get('status') == 'OK':
            return data
    return {}
