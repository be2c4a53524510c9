"""Best-first DataCrawler: priority ordering, budgets, contact-page
preference (reference download.py:1051-1126)."""

import pyarrow as pa


def _mini_corpus():
    def page(body):
        return ('<html><body>%s</body></html>' % body).encode()

    site = 'http://biz.com'
    corpus = {
        site + '/': page('<a href="/about.html">a</a>'
                         '<a href="/contact.html">c</a>'
                         '<a href="/products.html">p</a>'),
        site + '/contact.html': page('reach us: sales@biz.com '
                                     'or (555) 123-4567'),
        site + '/about.html': page('we are biz <a href="/team.html">t</a>'),
        site + '/products.html': page('widgets galore'),
        site + '/team.html': page('ceo@biz.com'),
    }
    return site, corpus


def test_contact_page_crawled_first():
    from webscraping_ray.pipelines.datacrawler import DataCrawlerRay
    site, corpus = _mini_corpus()
    dc = DataCrawlerRay(corpus)
    emails = dc.get_emails(site + '/', max_depth=2, max_urls=3, max_emails=1)
    # contact page has the lowest link_score -> visited before about/products
    assert emails == ['sales@biz.com']


def test_phones_and_budgets():
    from webscraping_ray.pipelines.datacrawler import DataCrawlerRay
    site, corpus = _mini_corpus()
    dc = DataCrawlerRay(corpus)
    phones = dc.get_phones(site + '/', max_depth=2, max_urls=5, max_phones=2)
    assert phones == ['(555) 123-4567']
    # max_urls=1: only the seed is scraped -> no emails found
    dc2 = DataCrawlerRay(corpus)
    assert dc2.get_emails(site + '/', max_urls=1, max_emails=1) == []


def test_find_on_arrow_corpus():
    from webscraping_ray.pipelines.datacrawler import DataCrawlerRay
    from webscraping_ray.kernels.extract import extract_emails
    site, corpus = _mini_corpus()
    tbl = pa.table({'url': pa.array(list(corpus), pa.string()),
                    'html': pa.array(list(corpus.values()), pa.binary())})
    dc = DataCrawlerRay(tbl)
    out = dc.find(site + '/', extract_emails, max_depth=2, max_urls=10,
                  max_results=None)
    assert 'sales@biz.com' in out and 'ceo@biz.com' in out


def test_parse_location_kernel():
    from webscraping_ray.kernels.extract import parse_location, load_api_result
    result = {
        'address_components': [
            {'types': ['street_number'], 'long_name': '48', 'short_name': '48'},
            {'types': ['route'], 'long_name': 'Pirrama Road', 'short_name': 'Pirrama Rd'},
            {'types': ['locality', 'political'], 'long_name': 'Pyrmont', 'short_name': 'Pyrmont'},
            {'types': ['administrative_area_level_1', 'political'],
             'long_name': 'New South Wales', 'short_name': 'NSW'},
            {'types': ['country', 'political'], 'long_name': 'Australia', 'short_name': 'AU'},
            {'types': ['postal_code'], 'long_name': '2009', 'short_name': '2009'},
        ],
        'formatted_address': '48 Pirrama Road, Pyrmont NSW 2009, Australia',
        'geometry': {'location': {'lat': -33.866, 'lng': 151.196}},
        'types': ['street_address'],
    }
    loc = parse_location(result)
    assert loc['address'] == '48 Pirrama Road'
    assert loc['suburb'] == 'Pyrmont'
    assert loc['state_code'] == 'NSW'
    assert loc['country'] == 'Australia'
    assert loc['postcode'] == '2009'
    assert loc['lat'] == -33.866

    import json
    ok = load_api_result(json.dumps({'status': 'OK', 'results': [1]}))
    assert ok.get('results') == [1]
    assert load_api_result('not json') == {}
    assert load_api_result(json.dumps({'status': 'ZERO_RESULTS'})) == {}
