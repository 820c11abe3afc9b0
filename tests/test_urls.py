"""URL canonicalization (operators/urls.py): goldens recomputed by hand
per the documented canonical form, plus an independent Python
urllib-based recheck for the structural parts."""

from urllib.parse import urlsplit

import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.urls import (
    host_expr, host_stats, normalize_url_expr, url_dedup_groups)
from tests.test_spark_operators import spark  # shared session fixture

CASES = [
    # (input, canonical)
    ('https://www.Site.Example/a/', 'https://site.example/a'),
    ('HTTP://SITE.EXAMPLE:80/a', 'http://site.example/a'),
    ('https://site.example:443/a', 'https://site.example/a'),
    ('https://site.example:8443/a', 'https://site.example:8443/a'),
    ('http://site.example:443/a', 'http://site.example:443/a'),
    ('https://site.example/a#frag', 'https://site.example/a'),
    ('https://site.example/a?utm_source=x&b=2&a=1',
     'https://site.example/a?a=1&b=2'),
    ('https://site.example/a?utm_source=x&gclid=1&fbclid=2',
     'https://site.example/a'),
    ('https://site.example/a?ref=tw&refresh=1',
     'https://site.example/a?refresh=1'),  # 'ref' exact, not prefix
    ('https://site.example/', 'https://site.example/'),  # root / kept
    ('https://site.example', 'https://site.example'),
    ('  https://site.example/a  ', 'https://site.example/a'),
    ('not a url #x', 'not a url'),
    ('ftp://Files.Example/Dir/', 'ftp://files.example/Dir'),  # path case kept
    ('https://www.site.example/A/B?z=1&y=2&utm_medium=m#s',
     'https://site.example/A/B?y=2&z=1'),
]


@pytest.fixture(scope='module')
def urls(spark):
    rows = [(i, u) for i, (u, _) in enumerate(CASES)]
    return spark.createDataFrame(rows, 'doc_id long, url string')


def test_normalize_goldens(spark, urls):
    got = {r['doc_id']: r['n'] for r in
           urls.select('doc_id',
                       normalize_url_expr(F.col('url')).alias('n')).collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_structure_against_urllib(spark, urls):
    """For well-formed inputs the canonical scheme/host must agree with
    urllib's parse of the canonical output (independent library)."""
    got = [r['n'] for r in
           urls.select(normalize_url_expr(F.col('url')).alias('n')).collect()]
    for n in got:
        if '://' not in n:
            continue
        parts = urlsplit(n)
        assert parts.scheme == parts.scheme.lower()
        assert parts.netloc == parts.netloc.lower()
        assert not parts.netloc.startswith('www.')
        assert parts.fragment == ''


def test_host_expr(spark, urls):
    got = {r['doc_id']: r['h'] for r in
           urls.select('doc_id', host_expr(F.col('url')).alias('h')).collect()}
    assert got[0] == 'site.example'
    assert got[3] == 'site.example'   # ANY port stripped for host grouping
    assert got[13] == 'files.example'
    assert got[12] == ''              # non-URL -> empty host


def test_url_dedup_and_host_stats(spark):
    rows = [(1, 'https://www.a.example/x/'),
            (2, 'HTTPS://A.EXAMPLE:443/x?utm_source=f'),
            (3, 'https://a.example/x#top'),
            (4, 'https://b.example/y'),
            (5, 'https://a.example/z')]
    df = spark.createDataFrame(rows, 'doc_id long, url string')
    groups = {r['norm_url']: (r['canonical_id'], r['n_docs'])
              for r in url_dedup_groups(df).collect()}
    assert groups['https://a.example/x'] == (1, 3)
    assert groups['https://b.example/y'] == (4, 1)
    hosts = {r['host']: (r['n_pages'], r['n_distinct_urls'])
             for r in host_stats(df).collect()}
    assert hosts['a.example'] == (4, 2)
    assert hosts['b.example'] == (1, 1)
