"""Coordinate mining: pages(html/text) -> points(url, warc_ts, point_idx, lon, lat).

The first stage of the engine's pipeline (SURVEY.md §2.1 "pages scan +
text -> coordinate mining"). Two steps:

1. ``extract_text``: html BINARY -> text STRING, a pure JVM-side expression
   (cast + regexp) — byte-identical inverse of the generator's wrapper,
   enforced by tests (north_rule: byte-identical extracted text per url).
2. ``mine_points``: one Arrow-batched pandas UDF running a single combined
   regex via pandas' vectorized ``str.extractall``, then NumPy conversion of
   DMS/QDMS groups using the reference's exact formulas
   (coordinates.py:127-148 from_dms — no rounding; :181-203 from_qdms —
   round_half_up at 6 decimals).

The mined mentions are returned as an array column and ``posexplode``d so
``point_idx`` is the mention ordinal within the page (FIXTURES.md §2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geostructures_spark.kernels.geodesy import normalize_lonlat, round_half_up

__all__ = ['extract_text_expr', 'mine_points', 'MENTION_REGEX']

_DEC = r'coords@(?P<flag>lonlat|latlon): (?P<a>-?\d+(?:\.\d+)?), (?P<b>-?\d+(?:\.\d+)?)'
_DMS = (r'(?P<lod>\d+)°(?P<lom>\d+)\'(?P<los>\d+(?:\.\d+)?)"(?P<loq>[EW]) '
        r'(?P<lad>\d+)°(?P<lam>\d+)\'(?P<las>\d+(?:\.\d+)?)"(?P<laq>[NS])')
_QDMS = r'(?P<qlon>[EW]\d{9}) (?P<qlat>[NS]\d{8})'
MENTION_REGEX = f'(?:{_DEC})|(?:{_DMS})|(?:{_QDMS})'

_POINT_ARRAY_TYPE = T.ArrayType(T.StructType([
    T.StructField('lon', T.DoubleType()),
    T.StructField('lat', T.DoubleType()),
    T.StructField('fmt', T.StringType()),
]))


def extract_text_expr(html_col: Column) -> Column:
    """html BINARY -> text STRING, byte-exact inverse of the generator
    wrapper. JVM-side: binary->string cast is UTF-8; (?s) keeps newlines."""
    return F.regexp_extract(html_col.cast('string'), r'(?s)^<html><body>(.*)</body></html>$', 1)


@F.pandas_udf(_POINT_ARRAY_TYPE)
def _mine_udf(text: pd.Series) -> pd.Series:
    out = pd.Series([[] for _ in range(len(text))], index=text.index, dtype=object)
    if len(text) == 0:
        return out
    matches = text.str.extractall(MENTION_REGEX)
    if len(matches) == 0:
        return out

    # decimal mentions
    dec = matches[matches['flag'].notna()]
    lon = np.where(dec['flag'].to_numpy() == 'lonlat',
                   dec['a'].to_numpy(np.float64), dec['b'].to_numpy(np.float64))
    lat = np.where(dec['flag'].to_numpy() == 'lonlat',
                   dec['b'].to_numpy(np.float64), dec['a'].to_numpy(np.float64))
    dec_vals = pd.DataFrame({'lon': lon, 'lat': lat, 'fmt': 'decimal'}, index=dec.index)

    # DMS mentions (from_dms: deg + min/60 + sec/3600, sign by quadrant;
    # no rounding — coordinates.py:145-148)
    dms = matches[matches['lod'].notna()]
    dlon = (dms['lod'].to_numpy(np.float64) + dms['lom'].to_numpy(np.float64) / 60
            + dms['los'].to_numpy(np.float64) / 3600)
    dlon = dlon * np.where(dms['loq'].to_numpy() == 'W', -1.0, 1.0)
    dlat = (dms['lad'].to_numpy(np.float64) + dms['lam'].to_numpy(np.float64) / 60
            + dms['las'].to_numpy(np.float64) / 3600)
    dlat = dlat * np.where(dms['laq'].to_numpy() == 'S', -1.0, 1.0)
    dms_vals = pd.DataFrame({'lon': dlon, 'lat': dlat, 'fmt': 'dms'}, index=dms.index)

    # QDMS mentions (from_qdms: seconds carry two implied decimals;
    # round_half_up at 6dp — coordinates.py:181-203)
    q = matches[matches['qlon'].notna()]
    if len(q):
        qlon_s = q['qlon'].astype(str)
        qlat_s = q['qlat'].astype(str)
        qlon = (qlon_s.str[1:4].astype(np.float64)
                + qlon_s.str[4:6].astype(np.float64) / 60
                + (qlon_s.str[6:8] + '.' + qlon_s.str[8:]).astype(np.float64) / 3600)
        qlon = qlon.to_numpy() * np.where(qlon_s.str[0].to_numpy() == 'W', -1.0, 1.0)
        qlat = (qlat_s.str[1:3].astype(np.float64)
                + qlat_s.str[3:5].astype(np.float64) / 60
                + (qlat_s.str[5:7] + '.' + qlat_s.str[7:]).astype(np.float64) / 3600)
        qlat = qlat.to_numpy() * np.where(qlat_s.str[0].to_numpy() == 'S', -1.0, 1.0)
        q_vals = pd.DataFrame({'lon': round_half_up(qlon, 6),
                               'lat': round_half_up(qlat, 6), 'fmt': 'qdms'},
                              index=q.index)
    else:
        q_vals = pd.DataFrame(columns=['lon', 'lat', 'fmt'])

    allv = pd.concat([dec_vals, dms_vals, q_vals]).sort_index()
    if len(allv):
        nl, na = normalize_lonlat(allv['lon'].to_numpy(np.float64),
                                  allv['lat'].to_numpy(np.float64))
        allv['lon'], allv['lat'] = nl, na
    for row_idx, grp in allv.groupby(level=0):
        out.at[row_idx] = list(grp[['lon', 'lat', 'fmt']].itertuples(index=False, name=None))
    return out


def mine_points(pages: DataFrame, from_html: bool = False) -> DataFrame:
    """pages -> points with (url, warc_ts, point_idx, lon, lat, fmt).

    Column-prunes to (url, warc_ts, text) before the UDF so the heavy
    ``html`` binary never crosses the Arrow boundary (unless ``from_html``
    exercises the extraction path).
    """
    text_col = extract_text_expr(F.col('html')) if from_html else F.col('text')
    mined = (pages
             .select('url', 'warc_ts', text_col.alias('_text'))
             .withColumn('mentions', _mine_udf(F.col('_text')))
             .drop('_text'))
    return (mined
            .select('url', 'warc_ts',
                    F.posexplode('mentions').alias('point_idx', 'pt'))
            .select('url', 'warc_ts', 'point_idx',
                    F.col('pt.lon').alias('lon'),
                    F.col('pt.lat').alias('lat'),
                    F.col('pt.fmt').alias('fmt')))
