"""OGC Well-Known Binary (WKB) interchange, from the published spec.

The reference round-trips geometries through shapely (``to_shapely`` /
``from_shapely``, _base.py:236-260 and structures.py per-kind
constructors); shapely's canonical serialization is WKB, so this module
implements the format itself — little-endian ISO WKB for the 2D geometry
kinds the engine models (Point=1, LineString=2, Polygon=3, MultiPoint=4,
MultiLineString=5, MultiPolygon=6). Multipolygon hole grouping maps onto
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


def _pts(ring) -> bytes:
    return struct.pack('<I', len(ring)) + b''.join(
        struct.pack('<dd', c['lon'], c['lat']) for c in ring)


def shape_row_to_wkb(kind: str, rings, poly_sizes=None) -> Optional[bytes]:
    """Canonical row (kind + materialized rings) -> little-endian WKB."""
    if kind not in _KIND_CODE or not rings:
        return None
    head = struct.pack('<BI', 1, _KIND_CODE[kind])
    if kind == 'point':
        c = rings[0][0]
        return head + struct.pack('<dd', c['lon'], c['lat'])
    if kind == 'linestring':
        return head + _pts(rings[0])
    if kind == 'polygon':
        return head + struct.pack('<I', len(rings)) + b''.join(
            _pts(r) for r in rings)
    if kind == 'multipoint':
        return head + struct.pack('<I', len(rings)) + b''.join(
            shape_row_to_wkb('point', [r]) for r in rings)
    if kind == 'multilinestring':
        return head + struct.pack('<I', len(rings)) + b''.join(
            shape_row_to_wkb('linestring', [r]) for r in rings)
    groups = _ring_groups(rings, poly_sizes)
    return head + struct.pack('<I', len(groups)) + b''.join(
        shape_row_to_wkb('polygon', g) for g in groups)


def _read_pts(b: bytes, pos: int, swap: str):
    n = struct.unpack_from(swap + 'I', b, pos)[0]
    pos += 4
    ring = []
    for _ in range(n):
        x, y = struct.unpack_from(swap + 'dd', b, pos)
        pos += 16
        ring.append({'lon': x, 'lat': y})
    return ring, pos


def _parse_geom(b: bytes, pos: int):
    order = b[pos]
    swap = '<' if order == 1 else '>'
    code = struct.unpack_from(swap + 'I', b, pos + 1)[0]
    kind = _CODE_KIND.get(code & 0xFF)  # mask any Z/M/SRID flag bits
    if kind is None:
        raise ValueError(f'unsupported WKB geometry code {code}')
    pos += 5
    if kind == 'point':
        x, y = struct.unpack_from(swap + 'dd', b, pos)
        return kind, [[{'lon': x, 'lat': y}]], None, pos + 16
    if kind == 'linestring':
        ring, pos = _read_pts(b, pos, swap)
        return kind, [ring], None, pos
    if kind == 'polygon':
        n = struct.unpack_from(swap + 'I', b, pos)[0]
        pos += 4
        rings = []
        for _ in range(n):
            ring, pos = _read_pts(b, pos, swap)
            rings.append(ring)
        return kind, rings, None, pos
    # multi kinds: n embedded full WKB geometries
    n = struct.unpack_from(swap + 'I', b, pos)[0]
    pos += 4
    rings, sizes = [], []
    for _ in range(n):
        _, child_rings, _, pos = _parse_geom(b, pos)
        rings.extend(child_rings)
        if kind == 'multipolygon':
            sizes.append(len(child_rings))
    return kind, rings, (sizes if kind == 'multipolygon' else None), pos


def wkb_to_shape_row(blob) -> Optional[dict]:
    """WKB bytes -> {'kind', 'rings', 'poly_sizes'} (either byte order;
    Z/M/SRID variants rejected via the masked code check)."""
    if blob is None or len(bytes(blob)) < 5:
        return None
    try:
        kind, rings, sizes, _ = _parse_geom(bytes(blob), 0)
    except (ValueError, struct.error, IndexError):
        return None
    return {'kind': kind, 'rings': rings, 'poly_sizes': sizes}


def to_wkb_df(shapes: DataFrame, kind_col: str = 'kind',
              rings_col: str = 'rings', out_col: str = 'wkb') -> DataFrame:
    """Mirror of to_wkt_df for the binary format (Arrow-batched)."""
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    has_sizes = 'poly_sizes' in shapes.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            rings = [decode_rings_json(s) for s in pdf[rings_col]]
            sizes = pdf['poly_sizes'] if has_sizes else [None] * len(pdf)
            pdf[rings_col] = rings
            pdf[out_col] = [shape_row_to_wkb(k, r, s)
                            for k, r, s in zip(pdf[kind_col], rings, sizes)]
            yield pdf

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields) + f', {out_col} binary'
    return encode_rings_json(shapes, rings_col).mapInPandas(run, schema=out_schema)


def parse_wkb_df(df: DataFrame, wkb_col: str = 'wkb') -> DataFrame:
    """DataFrame with a WKB binary column -> parsed (kind, rings,
    poly_sizes) columns appended (invalid rows get NULL kind); same output
    contract as parse_wkt_df."""
    from geostructures_spark.operators.interchange import SHAPE_ROW_SCHEMA
    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in df.schema.fields) + ', ' + SHAPE_ROW_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            kinds, rings, sizes = [], [], []
            for b in pdf[wkb_col]:
                row = wkb_to_shape_row(b)
                kinds.append(row['kind'] if row else None)
                rings.append([[(c['lon'], c['lat']) for c in ring]
                              for ring in row['rings']] if row else None)
                sizes.append(row['poly_sizes'] if row else None)
            pdf['kind'] = kinds
            pdf['rings'] = rings
            pdf['poly_sizes'] = sizes
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
