"""URL canonicalization + host analytics for web-crawl corpora.

The input_hint table is Common-Crawl-style pages keyed by ``url``; every
real crawl pipeline dedupes and quota-caps by CANONICAL url/host, because
the same page arrives as ``HTTP://WWW.Site.Example:80/a/?utm_source=x#top``
and ``http://site.example/a``. None of this exists in the reference (a
geometry library) — engine addition per SURVEY.md §2.9.

Canonical form (applied in this order, each step a pure Column expr —
JVM codegen, zero Python, runs at scan stage):

1. trim; drop the ``#fragment``.
2. lowercase the scheme and host (path/query case is preserved —
   path case is significant per RFC 3986).
3. strip a leading ``www.`` host label and the scheme-default port
   (``:80`` for http, ``:443`` for https).
4. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``ref``, ``mc_cid``, ``mc_eid``), sort the surviving parameters
   (param order is not semantic), drop the ``?`` entirely when none
   survive.
5. strip a single trailing ``/`` from a non-root path.

The parameter filter/sort uses array HOFs over the split query string —
bounded by the number of ``&``-separated params (single digits in
practice), so the interpreted-lambda cost that disqualifies HOFs on
embedding-size arrays (see simsearch.py's GEMM rewrite) is irrelevant
here; everything else is regexp_replace/lower/concat.

All regexes avoid lookahead/backreferences so the same pattern text runs
identically under Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ['normalize_url_expr', 'host_expr', 'url_dedup_groups',
           'host_stats', 'TRACKING_PARAMS']

TRACKING_PARAMS = ('utm_', 'gclid', 'fbclid', 'ref', 'mc_cid', 'mc_eid')

# scheme://host[:port] split: group 1 = scheme, 2 = host[:port], 3 = rest
_URL_RE = r'^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$'


def _is_tracking(p: Column) -> Column:
    name = F.split(p, '=', 2).getItem(0)
    out = F.lit(False)
    for t in TRACKING_PARAMS:
        out = out | (name.startswith(t) if t.endswith('_')
                     else (name == t))
    return out


def normalize_url_expr(url: Column) -> Column:
    """Canonical URL (see module docstring). Non-URL strings (no
    ``scheme://``) pass through trimmed and fragment-stripped."""
    u = F.trim(F.regexp_replace(F.trim(url), r'#.*$', ''))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.lower(F.regexp_extract(u, _URL_RE, 2))
    rest = F.regexp_extract(u, _URL_RE, 3)
    host = F.regexp_replace(host, r'^www\.', '')
    host = F.when(scheme == 'http', F.regexp_replace(host, r':80$', '')) \
            .when(scheme == 'https', F.regexp_replace(host, r':443$', '')) \
            .otherwise(host)
    path = F.regexp_replace(rest, r'\?.*$', '')
    query = F.when(rest.contains('?'),
                   F.regexp_replace(rest, r'^[^?]*\?', '')).otherwise(F.lit(''))
    kept = F.array_sort(F.filter(F.split(query, '&'),
                                 lambda p: (p != '') & ~_is_tracking(p)))
    query_norm = F.when(F.size(kept) > 0,
                        F.concat(F.lit('?'), F.array_join(kept, '&'))
                        ).otherwise(F.lit(''))
    path = F.when(path.rlike('^/.+/$'),
                  F.regexp_replace(path, r'/$', '')).otherwise(path)
    canon = F.concat(scheme, F.lit('://'), host, path, query_norm)
    return F.when(scheme != '', canon).otherwise(u)


def host_expr(url: Column) -> Column:
    """Canonical host of a URL ('' for non-URLs): lowercased, www- and
    port-stripped (ANY port — host grouping ignores ports entirely)."""
    host = F.lower(F.regexp_extract(F.trim(url), _URL_RE, 2))
    host = F.regexp_replace(host, r'^www\.', '')
    return F.regexp_replace(host, r':[0-9]+$', '')


def url_dedup_groups(df: DataFrame, url_col: str = 'url',
                     id_col: str = 'doc_id') -> DataFrame:
    """(norm_url, canonical_id = min id, n_docs) per canonical URL — the
    URL-level member of the dedup family (operators/dedup.py). Hash
    groupBy on the normalized key: one shuffle of (url, id), scales like
    exact_dedup_groups."""
    return (df.select(normalize_url_expr(F.col(url_col)).alias('norm_url'),
                      F.col(id_col))
            .groupBy('norm_url')
            .agg(F.min(id_col).alias('canonical_id'),
                 F.count('*').alias('n_docs')))


def host_stats(df: DataFrame, url_col: str = 'url') -> DataFrame:
    """(host, n_pages, n_distinct_urls) per canonical host — the crawl
    domain-stats table (feeds per_key_cap for domain quotas)."""
    return (df.select(host_expr(F.col(url_col)).alias('host'),
                      normalize_url_expr(F.col(url_col)).alias('norm_url'))
            .groupBy('host')
            .agg(F.count('*').alias('n_pages'),
                 F.count_distinct('norm_url').alias('n_distinct_urls')))
