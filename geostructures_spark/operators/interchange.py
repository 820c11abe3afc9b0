"""WKT / GeoJSON interchange operators.

The Spark-side of the reference's parsers/serializers (parsers.py:121-191,
serializers.py:55-120, per-shape from_wkt/to_wkt): batch UDF parsing of WKT
and GeoJSON geometry strings into canonical shapes-table rows
(SURVEY.md §1.3), and the inverse emitters.

The WKT grammar mirrors the reference's regex grammar (_base.py:30-75):
POINT/LINESTRING/POLYGON and MULTI* with optional Z/M designators and
scientific-notation numbers. Z/M values are preserved in a ``zm`` side
channel and re-emitted on serialization (reference _base.py:169-183); the
geometry rows stay 2-D, matching the reference's geometric operations
which ignore Z/M. Emitted WKT is byte-identical to the reference's to_wkt
(bare commas inside rings, comma-space between parts, Coordinate.to_str
float formatting).

Sibling connectors: KML/KMZ (operators/kml.py), ESRI shapefile
(operators/shapefile.py), OGC WKB (operators/wkb.py) — all from their
published specs.
"""

from __future__ import annotations

import json
import re
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['parse_wkt_df', 'to_wkt_df', 'parse_geojson_df', 'to_geojson_df',
           'explode_feature_collections',
           'wkt_to_shape_row', 'shape_row_to_wkt', 'SHAPE_ROW_SCHEMA']

SHAPE_ROW_SCHEMA = ('kind string, '
                    'rings array<array<struct<lon:double,lat:double>>>, '
                    'poly_sizes array<int>')
# poly_sizes preserves the reference's per-polygon [outline, *holes] grouping
# for multipolygons (multistructures.py:663-682): rings are stored flat and
# poly_sizes[i] counts the rings of child polygon i (NULL for other kinds).

_HEAD_RE = re.compile(
    r'^\s*(MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|POINT|LINESTRING|POLYGON)'
    r'\s*([ZM]{0,2})\s*\((.*)\)\s*$', re.IGNORECASE | re.DOTALL)
_RING_RE = re.compile(r'\(([^()]*)\)')


def _parse_coords(body: str, zm_order: str = 'ZM') -> List[Tuple[float, float, Optional[float], Optional[float]]]:
    """'x y [z [m]], x y ...' -> [(lon, lat, z, m), ...].

    Extra values are assigned per the header designator like
    Coordinate.from_wkt(zm_order) (coordinates.py:666-694): the designator
    defaults to 'ZM', so a bare third value is Z and a fourth is M; a bare
    'M' designator routes the third value to M."""
    order = (zm_order or 'ZM').lower()
    out = []
    for part in body.split(','):
        nums = part.split()
        if len(nums) < 2:
            continue
        z = m = None
        if len(nums) > 2:
            zmap = dict(zip(list(order), [float(v) for v in nums[2:]]))
            z, m = zmap.get('z'), zmap.get('m')
        out.append((float(nums[0]), float(nums[1]), z, m))
    return out


def _finish_row(kind: str, rings_zm, poly_sizes=None) -> dict:
    """rings of (lon, lat, z, m) tuples -> canonical row, with a parallel
    ``zm`` nesting only when any Z/M value is present (None element =
    absent value; nulls survive JSON/Arrow where NaN would not)."""
    rings = [[{'lon': p[0], 'lat': p[1]} for p in ring] for ring in rings_zm]
    has_zm = any(p[2] is not None or p[3] is not None
                 for ring in rings_zm for p in ring)
    row = {'kind': kind, 'rings': rings}
    if poly_sizes is not None:
        row['poly_sizes'] = poly_sizes
    if has_zm:
        row['zm'] = [[[p[2], p[3]] for p in ring] for ring in rings_zm]
    return row


def wkt_to_shape_row(wkt: str) -> Optional[dict]:
    """One WKT string -> {'kind', 'rings'[, 'poly_sizes', 'zm']} canonical
    row (None if invalid).

    multishapes explode into ring lists: multipolygon rings are flattened
    [outline1, holes1..., outline2, ...] with kind retained. Z/M values are
    preserved in the ``zm`` side channel (the geometry stays 2-D like the
    reference's geometric ops; round-trips re-emit them, _base.py:169-183)."""
    m = _HEAD_RE.match(wkt or '')
    if not m:
        return None
    tag = m.group(1).upper()
    zm_order = m.group(2).upper() or 'ZM'
    body = m.group(3)

    if tag == 'POINT':
        pts = _parse_coords(body, zm_order)
        if not pts:
            return None
        return _finish_row('point', [[pts[0]]])
    if tag == 'LINESTRING':
        pts = _parse_coords(body, zm_order)
        return _finish_row('linestring', [pts])
    if tag == 'POLYGON':
        rings = [_parse_coords(r, zm_order) for r in _RING_RE.findall(f'({body})')]
        return _finish_row('polygon', [r for r in rings if r])
    if tag == 'MULTIPOINT':
        # both '(1 2, 3 4)' and '((1 2), (3 4))' forms
        inner = _RING_RE.findall(f'({body})')
        if len(inner) > 1 or (inner and inner[0] != body):
            pts = [p for r in inner for p in _parse_coords(r, zm_order)]
        else:
            pts = _parse_coords(body, zm_order)
        return _finish_row('multipoint', [[p] for p in pts])
    if tag == 'MULTILINESTRING':
        rings = [_parse_coords(r, zm_order) for r in _RING_RE.findall(f'({body})')]
        return _finish_row('multilinestring', [r for r in rings if r])
    if tag == 'MULTIPOLYGON':
        # split top-level ring groups; keep [outline, *holes] per polygon
        # (reference multistructures.py:663-682)
        groups = []
        depth = 0
        start = None
        for i, ch in enumerate(body):
            if ch == '(':
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ')':
                depth -= 1
                if depth == 0:
                    groups.append(body[start:i + 1])
        rings = []
        poly_sizes = []
        for g in groups:
            n = 0
            for r in _RING_RE.findall(g):
                pts = _parse_coords(r, zm_order)
                if pts:
                    rings.append(pts)
                    n += 1
            if n:
                poly_sizes.append(n)
        return _finish_row('multipolygon', rings, poly_sizes)
    return None


def _ring_groups(rings, poly_sizes):
    """Flat rings + poly_sizes -> per-polygon [outline, *holes] groups
    (one ring per group when sizes are absent)."""
    if poly_sizes is None or len(poly_sizes) == 0:
        return [[r] for r in rings]
    groups, i = [], 0
    for n in poly_sizes:
        groups.append(list(rings[i:i + n]))
        i += n
    return groups


def _fmt_wkt_float(val: float) -> str:
    """Coordinate.to_str float formatting (coordinates.py:352-397):
    fixed-point at 12 decimals, trailing zeros/point trimmed, scientific
    notation suppressed."""
    formatted = f'{val:.12f}'.rstrip('0').rstrip('.')
    return formatted if formatted else '0.0'


def shape_row_to_wkt(kind: str, rings, poly_sizes=None, zm=None) -> str:
    """Canonical row -> WKT, byte-identical to the reference emitters:
    coords joined with bare commas inside a ring, rings/parts with
    comma-space, no space between the tag (or ZM designator) and '('
    (_base.py:207-220 _linear_ring_to_wkt, structures.py:217-233,
    multistructures.py:241-245,424-437,736-757), floats per
    Coordinate.to_str. ``zm`` optionally carries per-coord [z, m] values
    (NaN = absent) in rings nesting; the designator is derived from which
    values are present, like _wkt_zm_designator."""
    def xy(c):
        try:
            return c['lon'], c['lat']
        except (KeyError, TypeError, IndexError):
            return c[0], c[1]

    def zm_vals(ri, ci):
        if zm is None:
            return []
        try:
            pair = zm[ri][ci]
        except (IndexError, TypeError):
            return []
        out = []
        for v in pair or []:
            out.append(None if v is None or v != v else float(v))
        return out

    has_z = has_m = False
    if zm is not None:
        for ring in zm:
            for pair in ring or []:
                if pair:
                    if len(pair) > 0 and pair[0] is not None and pair[0] == pair[0]:
                        has_z = True
                    if len(pair) > 1 and pair[1] is not None and pair[1] == pair[1]:
                        has_m = True
    desig = ('Z' if has_z else '') + ('M' if has_m else '')
    desig = f' {desig}' if desig else ''

    def coord_str(c, ri, ci):
        lon, lat = xy(c)
        parts = [_fmt_wkt_float(lon), _fmt_wkt_float(lat)]
        extras = zm_vals(ri, ci)
        for v in extras:
            if v is not None:
                parts.append(_fmt_wkt_float(v))
        return ' '.join(parts)

    def ring_str(ring, ri):
        return '(' + ','.join(coord_str(c, ri, ci)
                              for ci, c in enumerate(ring)) + ')'

    if kind == 'point':
        return f'POINT{desig}({coord_str(rings[0][0], 0, 0)})'
    if kind == 'linestring':
        return f'LINESTRING{desig}' + ring_str(rings[0], 0)
    if kind == 'polygon':
        return f'POLYGON{desig}(' + ', '.join(
            ring_str(r, i) for i, r in enumerate(rings)) + ')'
    if kind == 'multipoint':
        return f'MULTIPOINT{desig}(' + ', '.join(
            f'({coord_str(r[0], i, 0)})' for i, r in enumerate(rings)) + ')'
    if kind == 'multilinestring':
        return f'MULTILINESTRING{desig}(' + ', '.join(
            ring_str(r, i) for i, r in enumerate(rings)) + ')'
    if kind == 'multipolygon':
        groups = _ring_groups(rings, poly_sizes)
        out = []
        base = 0
        for g in groups:
            out.append('(' + ', '.join(
                ring_str(r, base + j) for j, r in enumerate(g)) + ')')
            base += len(g)
        return f'MULTIPOLYGON{desig}(' + ', '.join(out) + ')'
    raise ValueError(f'cannot emit WKT for kind: {kind}')


def parse_wkt_df(df: DataFrame, wkt_col: str = 'wkt') -> DataFrame:
    """DataFrame with a WKT string column -> parsed (kind, rings) columns
    appended, plus a ``zm`` column carrying per-coordinate [z, m] values
    (NULL row-wise when the WKT is 2-D). Arrow-batched."""
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in df.schema.fields) + ', ' + SHAPE_ROW_SCHEMA
                  + ', zm array<array<array<double>>>')

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, rings, sizes, zms = [], [], [], []
            for w in pdf[wkt_col]:
                row = wkt_to_shape_row(w)
                kinds.append(row['kind'] if row else None)
                rings.append([[(c['lon'], c['lat']) for c in ring]
                              for ring in row['rings']] if row else None)
                sizes.append(row.get('poly_sizes') if row else None)
                zms.append(row.get('zm') if row else None)
            pdf = pdf.copy()
            pdf['kind'] = kinds
            pdf['rings'] = rings
            pdf['poly_sizes'] = sizes
            pdf['zm'] = zms
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def to_wkt_df(shapes: DataFrame, kind_col: str = 'kind',
              rings_col: str = 'rings', out_col: str = 'wkt') -> DataFrame:
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    has_sizes = 'poly_sizes' in shapes.columns
    has_zm = 'zm' in shapes.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            rings = [decode_rings_json(s) for s in pdf[rings_col]]
            sizes = pdf['poly_sizes'] if has_sizes else [None] * len(pdf)
            zms = ([decode_rings_json(s) for s in pdf['zm']]
                   if has_zm else [None] * len(pdf))
            pdf[rings_col] = rings
            if has_zm:
                pdf['zm'] = zms
            pdf[out_col] = [shape_row_to_wkt(k, r, s, zm=z)
                            for k, r, s, z in zip(pdf[kind_col], rings,
                                                  sizes, zms)]
            yield pdf

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields) + f', {out_col} string'
    enc = encode_rings_json(shapes, rings_col)
    if has_zm:
        enc = encode_rings_json(enc, 'zm')
    return enc.mapInPandas(run, schema=out_schema)


# --- GeoJSON ---------------------------------------------------------------

_GJ_KIND = {'Point': 'point', 'LineString': 'linestring', 'Polygon': 'polygon',
            'MultiPoint': 'multipoint', 'MultiLineString': 'multilinestring',
            'MultiPolygon': 'multipolygon'}
_KIND_GJ = {v: k for k, v in _GJ_KIND.items()}


def _gj_to_rings(kind: str, coords):
    """-> (rings, poly_sizes, zm): sizes keep the multipolygon hole
    grouping; zm carries per-coord [z, None] when any position has a third
    element (GeoJSON positions carry Z only, never M —
    reference coordinates.py:278-292)."""
    def pos_rings():
        if kind == 'point':
            return [[coords]]
        if kind in ('linestring',):
            return [coords]
        if kind == 'polygon':
            return list(coords)
        if kind == 'multipoint':
            return [[c] for c in coords]
        if kind == 'multilinestring':
            return list(coords)
        if kind == 'multipolygon':
            return [ring for poly in coords for ring in poly]
        raise ValueError(kind)

    pr = pos_rings()
    rings = [[{'lon': c[0], 'lat': c[1]} for c in ring] for ring in pr]
    sizes = ([len(poly) for poly in coords]
             if kind == 'multipolygon' else None)
    zm = None
    if any(len(c) > 2 for ring in pr for c in ring):
        zm = [[[float(c[2]) if len(c) > 2 else None, None] for c in ring]
              for ring in pr]
    return rings, sizes, zm


def parse_geojson_df(df: DataFrame, geojson_col: str = 'geojson') -> DataFrame:
    """GeoJSON geometry/Feature strings -> (kind, rings, properties)
    appended. Dispatch on 'type' (reference parsers.py:121-171)."""
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in df.schema.fields)
                  + ', ' + SHAPE_ROW_SCHEMA + ', properties map<string,string>'
                  + ', zm array<array<array<double>>>')

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, rings, sizes, props, zms = [], [], [], [], []
            for s in pdf[geojson_col]:
                try:
                    obj = json.loads(s)
                    if obj.get('type') == 'Feature':
                        geom = obj['geometry']
                        prop = {str(k): str(v) for k, v in
                                (obj.get('properties') or {}).items()}
                    else:
                        geom = obj
                        prop = {}
                    kind = _GJ_KIND[geom['type']]
                    rr, ps, zm = _gj_to_rings(kind, geom['coordinates'])
                    kinds.append(kind)
                    rings.append([[(c['lon'], c['lat']) for c in ring] for ring in rr])
                    sizes.append(ps)
                    props.append(prop)
                    zms.append(zm)
                except Exception:
                    kinds.append(None)
                    rings.append(None)
                    sizes.append(None)
                    props.append(None)
                    zms.append(None)
            pdf = pdf.copy()
            pdf['kind'] = kinds
            pdf['rings'] = rings
            pdf['poly_sizes'] = sizes
            pdf['properties'] = props
            pdf['zm'] = zms
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def to_geojson_df(shapes: DataFrame, kind_col: str = 'kind',
                  rings_col: str = 'rings', out_col: str = 'geojson') -> DataFrame:
    """Canonical rows -> GeoJSON geometry strings (serializers.py:55-120;
    multipolygon hole grouping via poly_sizes, multistructures.py:684-698)."""
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    has_sizes = 'poly_sizes' in shapes.columns
    has_zm = 'zm' in shapes.columns

    def emit(kind, rings, poly_sizes=None, zm=None):
        def xy(c):
            try:
                return float(c['lon']), float(c['lat'])
            except (KeyError, TypeError, IndexError):
                return float(c[0]), float(c[1])

        def pos(c, ri, ci):
            p = list(xy(c))
            if zm is not None:
                try:
                    z = (zm[ri][ci] or [None])[0]
                except (IndexError, TypeError):
                    z = None
                # GeoJSON positions carry Z only, never M
                # (reference coordinates.py:278-292)
                if z is not None and z == z:
                    p.append(float(z))
            return p

        rr = [[pos(c, ri, ci) for ci, c in enumerate(ring)]
              for ri, ring in enumerate(rings)]
        if kind == 'point':
            coords = rr[0][0]
        elif kind == 'linestring':
            coords = rr[0]
        elif kind == 'polygon':
            coords = rr
        elif kind == 'multipoint':
            coords = [r[0] for r in rr]
        elif kind == 'multilinestring':
            coords = rr
        elif kind == 'multipolygon':
            coords = _ring_groups(rr, poly_sizes)
        else:
            raise ValueError(kind)
        return json.dumps({'type': _KIND_GJ[kind], 'coordinates': coords},
                          separators=(',', ':'))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            rings = [decode_rings_json(s) for s in pdf[rings_col]]
            sizes = pdf['poly_sizes'] if has_sizes else [None] * len(pdf)
            zms = ([decode_rings_json(s) for s in pdf['zm']]
                   if has_zm else [None] * len(pdf))
            pdf[rings_col] = rings
            if has_zm:
                pdf['zm'] = zms
            pdf[out_col] = [emit(k, r, s, z)
                            for k, r, s, z in zip(pdf[kind_col], rings,
                                                  sizes, zms)]
            yield pdf

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields) + f', {out_col} string'
    enc = encode_rings_json(shapes, rings_col)
    if has_zm:
        enc = encode_rings_json(enc, 'zm')
    return enc.mapInPandas(run, schema=out_schema)


def explode_feature_collections(df: DataFrame,
                                geojson_col: str = 'geojson') -> DataFrame:
    """GeoJSON FeatureCollection documents -> one parsed row per feature
    (reference parsers.py:146-148: 'FEATURECOLLECTION' -> FeatureCollection).

    The Spark form of a collection is rows, so the document explodes via
    JVM-side json path extraction (get_json_object + explode over
    json_array_length — no Python in the fan-out) and each feature then
    runs through parse_geojson_df. Non-collection documents (bare
    geometry/Feature) pass through as a single feature."""
    is_fc = F.get_json_object(F.col(geojson_col), '$.type') == 'FeatureCollection'
    feats = F.when(
        is_fc, F.from_json(F.get_json_object(F.col(geojson_col), '$.features'),
                           'array<string>')
    ).otherwise(F.array(F.col(geojson_col)))
    exploded = (df.withColumn('feature_idx_tmp', feats)
                .select('*', F.posexplode('feature_idx_tmp')
                        .alias('feature_idx', '_feature'))
                .drop('feature_idx_tmp', geojson_col)
                .withColumnRenamed('_feature', geojson_col))
    return parse_geojson_df(exploded, geojson_col)
