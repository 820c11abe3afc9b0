"""Coordinate mining: pages(html/text) -> points(url, warc_ts, point_idx, lon, lat).

The first stage of the engine's pipeline (SURVEY.md §2.1 "pages scan +
text -> coordinate mining"). Two steps:

1. ``extract_text``: html BINARY -> text STRING, a pure JVM-side expression
   (cast + regexp) — byte-identical inverse of the generator's wrapper,
   enforced by tests (north_rule: byte-identical extracted text per url).
2. ``mine_points``: Arrow-batched ``mapInPandas``. Each batch joins its
   texts into one buffer and runs a single compiled-regex scan (one C-level
   pass per batch, no per-row regex calls), maps match offsets back to rows
   with searchsorted, converts DMS/QDMS groups vectorized with NumPy using
   the reference's exact formulas (coordinates.py:127-148 from_dms — no
   rounding; :181-203 from_qdms — round_half_up at 6 decimals), and emits
   the exploded points frame directly (no intermediate array column).

``point_idx`` is the mention ordinal within the page (FIXTURES.md §2);
matches come out of the single scan in position order, so a per-row running
count gives the ordinal.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geostructures_spark.kernels.geodesy import normalize_lonlat, round_half_up

__all__ = ['extract_text_expr', 'mine_points', 'MENTION_REGEX']

_DEC = r'coords@(?P<flag>lonlat|latlon): (?P<a>-?\d+(?:\.\d+)?), (?P<b>-?\d+(?:\.\d+)?)'
_DMS = (r'(?P<lod>\d+)°(?P<lom>\d+)\'(?P<los>\d+(?:\.\d+)?)"(?P<loq>[EW]) '
        r'(?P<lad>\d+)°(?P<lam>\d+)\'(?P<las>\d+(?:\.\d+)?)"(?P<laq>[NS])')
_QDMS = r'(?P<qlon>[EW]\d{9}) (?P<qlat>[NS]\d{8})'
MENTION_REGEX = f'(?:{_DEC})|(?:{_DMS})|(?:{_QDMS})'
_COMPILED = re.compile(MENTION_REGEX)

# batch separator that can never occur inside a match
_SEP = '\n\x00\n'

POINTS_SCHEMA = ('url string, warc_ts timestamp, point_idx int, '
                 'lon double, lat double, fmt string')


def extract_text_expr(html_col: Column) -> Column:
    """html BINARY -> text STRING, byte-exact inverse of the generator
    wrapper. JVM-side: binary->string cast is UTF-8; (?s) keeps newlines."""
    return F.regexp_extract(html_col.cast('string'), r'(?s)^<html><body>(.*)</body></html>$', 1)


def _mine_batch(texts: pd.Series) -> tuple:
    """One regex scan over the whole batch. Returns (row_positions,
    point_idx, lon, lat, fmt) numpy arrays."""
    tl = texts.fillna('').tolist()
    if not tl:
        z = np.zeros(0)
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), z, z.copy(),
                np.zeros(0, dtype=object))
    big = _SEP.join(tl)
    starts = np.zeros(len(tl), dtype=np.int64)
    lens = np.fromiter((len(t) for t in tl), dtype=np.int64, count=len(tl))
    if len(tl) > 1:
        starts[1:] = np.cumsum(lens[:-1] + len(_SEP))

    rows, kinds = [], []
    g_dec, g_dms, g_q = [], [], []
    for m in _COMPILED.finditer(big):
        rows.append(m.start())
        if m.group('flag') is not None:
            kinds.append(0)
            g_dec.append((m.group('flag'), m.group('a'), m.group('b')))
        elif m.group('lod') is not None:
            kinds.append(1)
            g_dms.append((m.group('lod'), m.group('lom'), m.group('los'),
                          m.group('loq'), m.group('lad'), m.group('lam'),
                          m.group('las'), m.group('laq')))
        else:
            kinds.append(2)
            g_q.append((m.group('qlon'), m.group('qlat')))

    n = len(rows)
    if n == 0:
        z = np.zeros(0)
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), z, z.copy(),
                np.zeros(0, dtype=object))

    pos = np.asarray(rows, dtype=np.int64)
    row_idx = np.searchsorted(starts, pos, side='right') - 1
    kinds = np.asarray(kinds, dtype=np.int64)

    lon = np.zeros(n)
    lat = np.zeros(n)
    fmt = np.empty(n, dtype=object)

    if g_dec:
        d = np.array(g_dec, dtype=object)
        a = d[:, 1].astype(np.float64)
        b = d[:, 2].astype(np.float64)
        is_lonlat = d[:, 0] == 'lonlat'
        sel = kinds == 0
        lon[sel] = np.where(is_lonlat, a, b)
        lat[sel] = np.where(is_lonlat, b, a)
        fmt[sel] = 'decimal'

    if g_dms:
        d = np.array(g_dms, dtype=object)
        # from_dms: deg + min/60 + sec/3600, sign by quadrant; no rounding
        dlon = (d[:, 0].astype(np.float64) + d[:, 1].astype(np.float64) / 60
                + d[:, 2].astype(np.float64) / 3600)
        dlon *= np.where(d[:, 3] == 'W', -1.0, 1.0)
        dlat = (d[:, 4].astype(np.float64) + d[:, 5].astype(np.float64) / 60
                + d[:, 6].astype(np.float64) / 3600)
        dlat *= np.where(d[:, 7] == 'S', -1.0, 1.0)
        sel = kinds == 1
        lon[sel] = dlon
        lat[sel] = dlat
        fmt[sel] = 'dms'

    if g_q:
        qlon_s = np.array([s for s, _ in g_q])
        qlat_s = np.array([s for _, s in g_q])
        # from_qdms: QDDDMMSSHH -> deg + min/60 + 'SS.HH'/3600; 6dp round_half_up
        lon_deg = np.array([s[1:4] for s in qlon_s], dtype=np.float64)
        lon_min = np.array([s[4:6] for s in qlon_s], dtype=np.float64)
        lon_sec = np.array([s[6:8] + '.' + s[8:] for s in qlon_s], dtype=np.float64)
        vlon = (lon_deg + lon_min / 60 + lon_sec / 3600)
        vlon *= np.where(np.array([s[0] for s in qlon_s]) == 'W', -1.0, 1.0)
        lat_deg = np.array([s[1:3] for s in qlat_s], dtype=np.float64)
        lat_min = np.array([s[3:5] for s in qlat_s], dtype=np.float64)
        lat_sec = np.array([s[5:7] + '.' + s[7:] for s in qlat_s], dtype=np.float64)
        vlat = (lat_deg + lat_min / 60 + lat_sec / 3600)
        vlat *= np.where(np.array([s[0] for s in qlat_s]) == 'S', -1.0, 1.0)
        sel = kinds == 2
        lon[sel] = round_half_up(vlon, 6)
        lat[sel] = round_half_up(vlat, 6)
        fmt[sel] = 'qdms'

    lon, lat = normalize_lonlat(lon, lat)

    # point_idx: running count within each row (matches are in position order)
    point_idx = np.zeros(n, dtype=np.int64)
    if n > 1:
        # vectorized segmented cumcount (reset at each row change)
        change = np.r_[True, row_idx[1:] != row_idx[:-1]]
        seg_starts = np.flatnonzero(change)
        seg_id = np.cumsum(change) - 1
        point_idx = np.arange(n) - seg_starts[seg_id]
    return row_idx, point_idx, lon, lat, fmt


def mine_points(pages: DataFrame, from_html: bool = False) -> DataFrame:
    """pages -> points with (url, warc_ts, point_idx, lon, lat, fmt).

    Column-prunes to (url, warc_ts, text) before the Arrow boundary so the
    heavy ``html`` binary never crosses it (unless ``from_html`` exercises
    the extraction path)."""
    text_col = extract_text_expr(F.col('html')) if from_html else F.col('text')
    pruned = pages.select('url', 'warc_ts', text_col.alias('_text'))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            row_idx, point_idx, lon, lat, fmt = _mine_batch(pdf['_text'])
            urls = pdf['url'].to_numpy()[row_idx]
            ts = pdf['warc_ts'].to_numpy()[row_idx]
            yield pd.DataFrame({
                'url': urls,
                'warc_ts': ts,
                'point_idx': point_idx.astype(np.int32),
                'lon': lon,
                'lat': lat,
                'fmt': fmt,
            })

    return pruned.mapInPandas(run, schema=POINTS_SCHEMA)
