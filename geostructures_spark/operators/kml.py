"""KML / KMZ interchange, from scratch on stdlib XML (no fastkml).

Replicates the reference's parse_kml surface (parsers.py:228-351) over the
canonical shapes schema: Placemarks are extracted recursively through
Folders (``sub_folder_i`` properties record folder names, parsers.py
folder-walk), name/description become properties, ExtendedData merges both
plain ``Data`` elements and ``SchemaData/SimpleData`` fields
(parsers.py:60-107 incl. the mixed-ExtendedData regression), TimeStamp /
TimeSpan become the dt interval, and geometries cover Point / LineString /
LinearRing (parsed as its polygon, parsers.py LinearRing regression) /
Polygon with inner boundaries / MultiGeometry. KMZ is the zipped form: the
first ``*.kml`` member (serializers.py KMZ handling).

DataFrame form: one input row carries one KML document; parse explodes to
one output row per Placemark with (kind, rings, poly_sizes, properties,
dt_start, dt_end). ``to_kml_df`` emits one <Placemark> per shape row.
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import datetime
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['parse_kml_blob', 'parse_kml_df', 'parse_kmz_df', 'to_kml_df',
           'kmz_to_kml']

_TAG_RE = re.compile(r'\{[^}]*\}')


def _local(tag: str) -> str:
    return _TAG_RE.sub('', tag)


def _children(el):
    for c in el:
        yield _local(c.tag), c


def _find(el, name):
    for tag, c in _children(el):
        if tag == name:
            return c
    return None


def _parse_coords(text: str):
    """KML coordinate blob: whitespace-separated lon,lat[,alt] tuples.
    Returns (points, alts) with alts[i] None when no altitude is given."""
    out = []
    alts = []
    for tok in (text or '').split():
        parts = tok.split(',')
        if len(parts) >= 2:
            out.append((float(parts[0]), float(parts[1])))
            alts.append(float(parts[2]) if len(parts) > 2 else None)
    return out, alts


def _parse_dt(s: Optional[str]):
    if not s:
        return None
    s = s.strip()
    if s.endswith('Z'):
        s = s[:-1]
    try:
        return datetime.fromisoformat(s)
    except ValueError:
        return None


def _with_zm(row, zrings):
    """Attach the [z, None]-pair nesting when any altitude is present."""
    if any(z is not None for zr in zrings for z in zr):
        row['zm'] = [[[z, None] for z in zr] for zr in zrings]
    return row


def _geometry_to_row(el) -> Optional[Dict]:
    tag = _local(el.tag)
    if tag == 'Point':
        c = _find(el, 'coordinates')
        pts, alts = _parse_coords(c.text if c is not None else '')
        if not pts:
            return None
        return _with_zm({'kind': 'point', 'rings': [[pts[0]]],
                         'poly_sizes': None}, [[alts[0]]])
    if tag == 'LineString':
        c = _find(el, 'coordinates')
        pts, alts = _parse_coords(c.text if c is not None else '')
        return _with_zm({'kind': 'linestring', 'rings': [pts],
                         'poly_sizes': None}, [alts])
    if tag == 'LinearRing':
        # direct LinearRing geometry parses as its polygon (reference
        # regression, parsers.py)
        c = _find(el, 'coordinates')
        pts, alts = _parse_coords(c.text if c is not None else '')
        return _with_zm({'kind': 'polygon', 'rings': [pts],
                         'poly_sizes': None}, [alts])
    if tag == 'Polygon':
        rings = []
        zrings = []
        outer = _find(el, 'outerBoundaryIs')
        if outer is not None:
            lr = _find(outer, 'LinearRing')
            c = _find(lr, 'coordinates') if lr is not None else None
            pts, alts = _parse_coords(c.text if c is not None else '')
            rings.append(pts)
            zrings.append(alts)
        for t, child in _children(el):
            if t == 'innerBoundaryIs':
                lr = _find(child, 'LinearRing')
                c = _find(lr, 'coordinates') if lr is not None else None
                pts, alts = _parse_coords(c.text if c is not None else '')
                rings.append(pts)
                zrings.append(alts)
        return _with_zm({'kind': 'polygon', 'rings': rings,
                         'poly_sizes': None}, zrings)
    if tag == 'MultiGeometry':
        subs = [_geometry_to_row(c) for _, c in _children(el)]
        subs = [s for s in subs if s]
        if not subs:
            return None
        kinds = {s['kind'] for s in subs}

        def child_zm(s, i):
            zm = s.get('zm')
            if zm is not None:
                return zm[i]
            return [None for _ in s['rings'][i]]

        if kinds == {'point'}:
            rows = {'kind': 'multipoint',
                    'rings': [s['rings'][0] for s in subs], 'poly_sizes': None}
            zr = [[(p or [None])[0] if isinstance(p, list) else p
                   for p in child_zm(s, 0)] for s in subs]
            return _with_zm(rows, zr)
        if kinds == {'linestring'}:
            rows = {'kind': 'multilinestring',
                    'rings': [s['rings'][0] for s in subs], 'poly_sizes': None}
            zr = [[(p or [None])[0] if isinstance(p, list) else p
                   for p in child_zm(s, 0)] for s in subs]
            return _with_zm(rows, zr)
        if kinds == {'polygon'}:
            rings, sizes, zrings = [], [], []
            for s in subs:
                rings.extend(s['rings'])
                sizes.append(len(s['rings']))
                for i in range(len(s['rings'])):
                    zrings.append([(p or [None])[0] if isinstance(p, list) else p
                                   for p in child_zm(s, i)])
            return _with_zm({'kind': 'multipolygon', 'rings': rings,
                             'poly_sizes': sizes}, zrings)
        # heterogeneous MultiGeometry: keep the first geometry (reference
        # explodes into the collection; one row per placemark here)
        return subs[0]
    return None


def _placemark_to_row(el, folders: List[str]) -> Optional[Dict]:
    props: Dict[str, str] = {}
    for i, fname in enumerate(folders):
        props[f'sub_folder_{i}'] = fname
    geom_row = None
    dt_start = dt_end = None
    for tag, c in _children(el):
        if tag in ('name', 'description') and c.text is not None:
            props[tag] = c.text
        elif tag == 'ExtendedData':
            for t2, d in _children(c):
                if t2 == 'Data':
                    v = _find(d, 'value')
                    props[d.get('name', '')] = (v.text if v is not None else '')
                elif t2 == 'SchemaData':
                    for t3, sd in _children(d):
                        if t3 == 'SimpleData':
                            props[sd.get('name', '')] = sd.text or ''
        elif tag == 'TimeStamp':
            w = _find(c, 'when')
            dt_start = dt_end = _parse_dt(w.text if w is not None else None)
        elif tag == 'TimeSpan':
            b, e = _find(c, 'begin'), _find(c, 'end')
            dt_start = _parse_dt(b.text if b is not None else None)
            dt_end = _parse_dt(e.text if e is not None else None)
        elif geom_row is None:
            g = _geometry_to_row(c)
            if g is not None:
                geom_row = g
    if geom_row is None:
        return None
    return {**geom_row, 'properties': props,
            'dt_start': dt_start, 'dt_end': dt_end}


def parse_kml_blob(kml_text) -> List[Dict]:
    """One KML document (str or bytes; BOM tolerated) -> one dict per
    Placemark: kind, rings, poly_sizes, properties, dt_start, dt_end."""
    import xml.etree.ElementTree as ET
    if isinstance(kml_text, bytes):
        kml_text = kml_text.decode('utf-8-sig')
    kml_text = kml_text.lstrip('﻿')
    root = ET.fromstring(kml_text)

    out: List[Dict] = []

    def walk(el, folders: List[str]):
        tag = _local(el.tag)
        if tag == 'Placemark':
            row = _placemark_to_row(el, folders)
            if row is not None:
                out.append(row)
            return
        next_folders = folders
        if tag == 'Folder':
            nm = _find(el, 'name')
            next_folders = folders + [nm.text if nm is not None and nm.text else '']
        for _, c in _children(el):
            walk(c, next_folders)

    walk(root, [])
    return out


def kmz_to_kml(blob: bytes) -> str:
    """KMZ bytes -> the first .kml member's text."""
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        for name in z.namelist():
            base = name.rsplit('/', 1)[-1]
            # skip macOS AppleDouble resource forks (__MACOSX/._doc.kml),
            # which match the extension but hold binary metadata
            if name.startswith('__MACOSX/') or base.startswith('._'):
                continue
            if name.lower().endswith('.kml'):
                return z.read(name).decode('utf-8-sig')
    raise ValueError('no .kml member in KMZ archive')


_PARSED_SCHEMA = (', kind string, '
                  'rings array<array<struct<lon:double,lat:double>>>, '
                  'poly_sizes array<int>, properties map<string,string>, '
                  'dt_start timestamp, dt_end timestamp, placemark_idx int, '
                  'zm array<array<array<double>>>')


def _explode_kml(df: DataFrame, col: str, decode) -> DataFrame:
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in df.schema.fields) + _PARSED_SCHEMA)
    cols = list(df.columns)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                base = tuple(row)
                blob = getattr(row, col)
                try:
                    parsed = parse_kml_blob(decode(blob))
                except Exception:
                    parsed = []
                for i, p in enumerate(parsed):
                    rings = [[{'lon': float(x), 'lat': float(y)} for x, y in r]
                             for r in p['rings']]
                    rows.append((*base, p['kind'], rings, p['poly_sizes'],
                                 p['properties'], p['dt_start'], p['dt_end'],
                                 i, p.get('zm')))
            yield pd.DataFrame(rows, columns=[
                *cols, 'kind', 'rings', 'poly_sizes', 'properties',
                'dt_start', 'dt_end', 'placemark_idx', 'zm'])

    return df.mapInPandas(run, schema=out_schema)


def parse_kml_df(df: DataFrame, kml_col: str = 'kml') -> DataFrame:
    """KML document strings -> one canonical shape row per Placemark."""
    return _explode_kml(df, kml_col, lambda b: b)


def parse_kmz_df(df: DataFrame, kmz_col: str = 'kmz') -> DataFrame:
    """KMZ binary blobs -> one canonical shape row per Placemark."""
    return _explode_kml(df, kmz_col, lambda b: kmz_to_kml(bytes(b)))


_KIND_KML = {'point': 'Point', 'linestring': 'LineString',
             'polygon': 'Polygon'}


def _ring_coords(ring, zring=None) -> str:
    def xy(c):
        try:
            return c['lon'], c['lat']
        except (KeyError, TypeError, IndexError):
            return c[0], c[1]

    def tok(ci, c):
        x, y = xy(c)
        z = None
        if zring is not None:
            try:
                pair = zring[ci]
                z = (pair or [None])[0] if isinstance(pair, list) else pair
            except (IndexError, TypeError):
                z = None
        if z is not None and z == z:
            return f'{x},{y},{z}'
        return f'{x},{y}'

    return ' '.join(tok(ci, c) for ci, c in enumerate(ring))


def _shape_kml(kind, rings, poly_sizes, props, zm=None) -> str:
    from geostructures_spark.operators.interchange import _ring_groups

    def zr(i):
        if zm is None:
            return None
        try:
            return zm[i]
        except (IndexError, TypeError):
            return None

    def poly_xml(poly_rings, base=0):
        parts = [f'<outerBoundaryIs><LinearRing><coordinates>'
                 f'{_ring_coords(poly_rings[0], zr(base))}</coordinates></LinearRing>'
                 f'</outerBoundaryIs>']
        for hi, hole in enumerate(poly_rings[1:]):
            parts.append(f'<innerBoundaryIs><LinearRing><coordinates>'
                         f'{_ring_coords(hole, zr(base + 1 + hi))}</coordinates></LinearRing>'
                         f'</innerBoundaryIs>')
        return f'<Polygon>{"".join(parts)}</Polygon>'

    if kind == 'point':
        geo = (f'<Point><coordinates>{_ring_coords(rings[0], zr(0))}'
               f'</coordinates></Point>')
    elif kind == 'linestring':
        geo = (f'<LineString><coordinates>{_ring_coords(rings[0], zr(0))}'
               f'</coordinates></LineString>')
    elif kind == 'polygon':
        geo = poly_xml(rings)
    elif kind == 'multipoint':
        geo = '<MultiGeometry>' + ''.join(
            f'<Point><coordinates>{_ring_coords(r, zr(i))}</coordinates></Point>'
            for i, r in enumerate(rings)) + '</MultiGeometry>'
    elif kind == 'multilinestring':
        geo = '<MultiGeometry>' + ''.join(
            f'<LineString><coordinates>{_ring_coords(r, zr(i))}</coordinates>'
            f'</LineString>' for i, r in enumerate(rings)) + '</MultiGeometry>'
    elif kind == 'multipolygon':
        groups = _ring_groups(rings, poly_sizes)
        geo_parts = []
        base = 0
        for g in groups:
            geo_parts.append(poly_xml(g, base))
            base += len(g)
        geo = '<MultiGeometry>' + ''.join(geo_parts) + '</MultiGeometry>'
    else:
        raise ValueError(f'cannot emit KML for kind: {kind}')
    name = ''
    data = ''
    if props:
        if 'name' in props:
            name = f'<name>{props["name"]}</name>'
        rest = {k: v for k, v in props.items() if k != 'name'}
        if rest:
            data = '<ExtendedData>' + ''.join(
                f'<Data name="{k}"><value>{v}</value></Data>'
                for k, v in sorted(rest.items())) + '</ExtendedData>'
    return f'<Placemark>{name}{data}{geo}</Placemark>'


def to_kml_df(shapes: DataFrame, out_col: str = 'kml') -> DataFrame:
    """Canonical shape rows -> one <Placemark> KML fragment per row."""
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    has_sizes = 'poly_sizes' in shapes.columns
    has_props = 'properties' in shapes.columns
    has_zm = 'zm' in shapes.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            rings = [decode_rings_json(s) for s in pdf['rings']]
            sizes = pdf['poly_sizes'] if has_sizes else [None] * len(pdf)
            props = pdf['properties'] if has_props else [None] * len(pdf)
            zms = ([decode_rings_json(s) for s in pdf['zm']]
                   if has_zm else [None] * len(pdf))
            pdf['rings'] = rings
            if has_zm:
                pdf['zm'] = zms
            pdf[out_col] = [_shape_kml(k, r, s, p, z) for k, r, s, p, z in
                            zip(pdf['kind'], rings, sizes, props, zms)]
            yield pdf

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields) + f', {out_col} string'
    enc = encode_rings_json(shapes)
    if has_zm:
        enc = encode_rings_json(enc, 'zm')
    return enc.mapInPandas(run, schema=out_schema)
