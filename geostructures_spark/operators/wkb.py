"""OGC Well-Known Binary (WKB) interchange, from the published spec.

The reference round-trips geometries through shapely (``to_shapely`` /
``from_shapely``, _base.py:236-260 and structures.py per-kind
constructors); shapely's canonical serialization is WKB, so this module
implements the format itself — little-endian ISO WKB for the geometry
kinds the engine models (Point=1, LineString=2, Polygon=3, MultiPoint=4,
MultiLineString=5, MultiPolygon=6), including the ISO Z/M dims variants
(+1000/+2000 type codes) which round-trip through the ``zm`` side channel. Multipolygon hole grouping maps onto
the canonical table's ``poly_sizes`` exactly as the WKT path does
(operators/interchange.py).

Golden: POINT(2 4) encodes to 0101000000 + two IEEE754 LE doubles — the
spec's own worked example.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

from geostructures_spark.operators.interchange import _ring_groups

__all__ = ['shape_row_to_wkb', 'wkb_to_shape_row', 'to_wkb_df',
           'parse_wkb_df']

_KIND_CODE = {'point': 1, 'linestring': 2, 'polygon': 3,
              'multipoint': 4, 'multilinestring': 5, 'multipolygon': 6}
_CODE_KIND = {v: k for k, v in _KIND_CODE.items()}


def _zm_flags(zm):
    has_z = has_m = False
    for ring in zm or []:
        for pair in ring or []:
            if pair:
                if len(pair) > 0 and pair[0] is not None and pair[0] == pair[0]:
                    has_z = True
                if len(pair) > 1 and pair[1] is not None and pair[1] == pair[1]:
                    has_m = True
    return has_z, has_m


def _coord_vals(c, pair, has_z, has_m):
    vals = [c['lon'], c['lat']]
    if has_z:
        z = (pair or [None])[0] if pair else None
        vals.append(0.0 if z is None or z != z else float(z))
    if has_m:
        m = (pair or [None, None])[1] if pair and len(pair) > 1 else None
        vals.append(0.0 if m is None or m != m else float(m))
    return vals


def _pts(ring, zring=None, has_z=False, has_m=False) -> bytes:
    nd = 2 + int(has_z) + int(has_m)
    out = struct.pack('<I', len(ring))
    for ci, c in enumerate(ring):
        pair = None
        if zring is not None:
            try:
                pair = zring[ci]
            except (IndexError, TypeError):
                pair = None
        out += struct.pack(f'<{nd}d', *_coord_vals(c, pair, has_z, has_m))
    return out


def shape_row_to_wkb(kind: str, rings, poly_sizes=None, zm=None,
                     _dims=None) -> Optional[bytes]:
    """Canonical row (kind + materialized rings) -> little-endian ISO WKB.
    Z/M values from the ``zm`` side channel emit the +1000/+2000 type
    codes (uniform dims per geometry; absent values fill as 0.0 — WKB has
    no per-value no-data convention). ``_dims`` is internal: the parent
    multi-geometry's (has_z, has_m), threaded into every child so an ISO
    Z/M collection emits uniform dims even when only some members carry
    Z/M values (ISO WKB forbids mixed-dim children)."""
    if kind not in _KIND_CODE or not rings:
        return None
    has_z, has_m = _zm_flags(zm) if _dims is None else _dims
    code = _KIND_CODE[kind] + 1000 * int(has_z) + 2000 * int(has_m)
    head = struct.pack('<BI', 1, code)

    def zr(i):
        if zm is None:
            return None
        try:
            return zm[i]
        except (IndexError, TypeError):
            return None

    if kind == 'point':
        c = rings[0][0]
        pair = (zr(0) or [None])[0] if zr(0) else None
        nd = 2 + int(has_z) + int(has_m)
        return head + struct.pack(f'<{nd}d',
                                  *_coord_vals(c, pair, has_z, has_m))
    if kind == 'linestring':
        return head + _pts(rings[0], zr(0), has_z, has_m)
    if kind == 'polygon':
        return head + struct.pack('<I', len(rings)) + b''.join(
            _pts(r, zr(i), has_z, has_m) for i, r in enumerate(rings))
    if kind == 'multipoint':
        return head + struct.pack('<I', len(rings)) + b''.join(
            shape_row_to_wkb('point', [r], zm=[zr(i)] if zm else None,
                             _dims=(has_z, has_m))
            for i, r in enumerate(rings))
    if kind == 'multilinestring':
        return head + struct.pack('<I', len(rings)) + b''.join(
            shape_row_to_wkb('linestring', [r], zm=[zr(i)] if zm else None,
                             _dims=(has_z, has_m))
            for i, r in enumerate(rings))
    groups = _ring_groups(rings, poly_sizes)
    out = head + struct.pack('<I', len(groups))
    base = 0
    for g in groups:
        g_zm = [zr(base + j) for j in range(len(g))] if zm else None
        out += shape_row_to_wkb('polygon', g, zm=g_zm,
                                _dims=(has_z, has_m))
        base += len(g)
    return out


def _read_pts(b: bytes, pos: int, swap: str, has_z: bool, has_m: bool):
    n = struct.unpack_from(swap + 'I', b, pos)[0]
    pos += 4
    nd = 2 + int(has_z) + int(has_m)
    ring = []
    zring = []
    for _ in range(n):
        vals = struct.unpack_from(f'{swap}{nd}d', b, pos)
        pos += 8 * nd
        ring.append({'lon': vals[0], 'lat': vals[1]})
        if has_z or has_m:
            z = vals[2] if has_z else None
            m = vals[2 + int(has_z)] if has_m else None
            zring.append([z, m])
    return ring, (zring if (has_z or has_m) else None), pos


def _parse_geom(b: bytes, pos: int):
    order = b[pos]
    swap = '<' if order == 1 else '>'
    code = struct.unpack_from(swap + 'I', b, pos + 1)[0]
    dims = code // 1000   # ISO: +1000 Z, +2000 M, +3000 ZM
    kind = _CODE_KIND.get(code % 1000)
    has_z = dims in (1, 3)
    has_m = dims in (2, 3)
    if kind is None or dims > 3:
        raise ValueError(f'unsupported WKB geometry code {code}')
    pos += 5
    nd = 2 + int(has_z) + int(has_m)
    if kind == 'point':
        vals = struct.unpack_from(f'{swap}{nd}d', b, pos)
        zm = None
        if has_z or has_m:
            z = vals[2] if has_z else None
            m = vals[2 + int(has_z)] if has_m else None
            zm = [[[z, m]]]
        return kind, [[{'lon': vals[0], 'lat': vals[1]}]], None, zm, pos + 8 * nd
    if kind == 'linestring':
        ring, zring, pos = _read_pts(b, pos, swap, has_z, has_m)
        return kind, [ring], None, ([zring] if zring else None), pos
    if kind == 'polygon':
        n = struct.unpack_from(swap + 'I', b, pos)[0]
        pos += 4
        rings = []
        zrings = []
        for _ in range(n):
            ring, zring, pos = _read_pts(b, pos, swap, has_z, has_m)
            rings.append(ring)
            zrings.append(zring)
        zm = zrings if any(z is not None for z in zrings) else None
        return kind, rings, None, zm, pos
    # multi kinds: n embedded full WKB geometries
    n = struct.unpack_from(swap + 'I', b, pos)[0]
    pos += 4
    rings, sizes = [], []
    zms = []
    saw_zm = False
    for _ in range(n):
        _, child_rings, _, child_zm, pos = _parse_geom(b, pos)
        rings.extend(child_rings)
        if child_zm is not None:
            saw_zm = True
            zms.extend(child_zm)
        else:
            zms.extend([None] * len(child_rings))
        if kind == 'multipolygon':
            sizes.append(len(child_rings))
    zm = zms if saw_zm else None
    return kind, rings, (sizes if kind == 'multipolygon' else None), zm, pos


def wkb_to_shape_row(blob) -> Optional[dict]:
    """WKB bytes -> {'kind', 'rings', 'poly_sizes'[, 'zm']} (either byte
    order; ISO +1000/+2000 Z/M dims parsed into the zm side channel)."""
    if blob is None or len(bytes(blob)) < 5:
        return None
    try:
        kind, rings, sizes, zm, _ = _parse_geom(bytes(blob), 0)
    except (ValueError, struct.error, IndexError):
        return None
    row = {'kind': kind, 'rings': rings, 'poly_sizes': sizes}
    if zm is not None:
        row['zm'] = zm
    return row


def to_wkb_df(shapes: DataFrame, kind_col: str = 'kind',
              rings_col: str = 'rings', out_col: str = 'wkb') -> DataFrame:
    """Mirror of to_wkt_df for the binary format (Arrow-batched)."""
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
            pdf[out_col] = [shape_row_to_wkb(k, r, s, zm=z)
                            for k, r, s, z in zip(pdf[kind_col], rings,
                                                  sizes, zms)]
            yield pdf

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields) + f', {out_col} binary'
    enc = encode_rings_json(shapes, rings_col)
    if has_zm:
        enc = encode_rings_json(enc, 'zm')
    return enc.mapInPandas(run, schema=out_schema)


def parse_wkb_df(df: DataFrame, wkb_col: str = 'wkb') -> DataFrame:
    """DataFrame with a WKB binary column -> parsed (kind, rings,
    poly_sizes) columns appended (invalid rows get NULL kind); same output
    contract as parse_wkt_df."""
    from geostructures_spark.operators.interchange import SHAPE_ROW_SCHEMA
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in df.schema.fields) + ', ' + SHAPE_ROW_SCHEMA
                  + ', zm array<array<array<double>>>')

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            kinds, rings, sizes, zms = [], [], [], []
            for b in pdf[wkb_col]:
                row = wkb_to_shape_row(b)
                kinds.append(row['kind'] if row else None)
                rings.append([[(c['lon'], c['lat']) for c in ring]
                              for ring in row['rings']] if row else None)
                sizes.append(row['poly_sizes'] if row else None)
                zms.append(row.get('zm') if row else None)
            pdf['kind'] = kinds
            pdf['rings'] = rings
            pdf['poly_sizes'] = sizes
            pdf['zm'] = zms
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
