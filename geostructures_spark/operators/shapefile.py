"""ESRI shapefile read/write, from scratch (no pyshp).

The reference's parse_shapefile / serialize path delegates to the pyshp
package over a zip archive of component files (parsers.py:194-226,
collections.py from_shapefile). This module implements the published
binary format directly:

- ``.shp``: 100-byte header (file code 9994 BE, version 1000 LE, shape
  type, bbox) + records of (record# BE, content-length BE in 16-bit words,
  shape type LE, geometry). Types covered: 1 Point, 3 PolyLine, 5 Polygon,
  8 MultiPoint, plus their Z (11/13/15/18) and M (21/23/25/28) variants —
  Z/M payloads are preserved in the ``zm`` side channel (per-coord [z, m],
  -1e38 no-data sentinel respected) and re-emitted on write; the geometry
  rows stay 2-D like the reference's geometric operations.
- ``.shx``: same header + (offset, content length) per record.
- ``.dbf``: dBase III — version byte 0x03, record counts/sizes, 32-byte
  field descriptors ('C' text / 'N' numeric), fixed-width records.
- zip archive of the three members, like the reference's API surface.

Polygon part grouping: parts are kept in record order as
[outline, *holes] of one polygon row (the layout pyshp emits for the
reference's to_pyshp writers).
"""

from __future__ import annotations

import io
import struct
import zipfile
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['write_shapefile_zip', 'read_shapefile_zip',
           'parse_shapefile_df', 'to_shapefile_zip']

_KIND_TO_TYPE = {'point': 1, 'linestring': 3, 'polygon': 5, 'multipoint': 8,
                 'multilinestring': 3, 'multipolygon': 5}
_Z_OFFSET = {11: 1, 13: 3, 15: 5, 18: 8, 21: 1, 23: 3, 25: 5, 28: 8}


_M_NODATA = -1e40  # ESRI spec: measures below -1e38 mean "no data"

# Z and M variants of each base type (ESRI spec table: 11/13/15/18 carry Z
# [+ optional M arrays]; 21/23/25/28 carry M arrays)
_Z_TYPE = {1: 11, 3: 13, 5: 15, 8: 18}
_M_TYPE = {1: 21, 3: 23, 5: 25, 8: 28}


def _flatten_zm(rings, zm):
    """Per-coord (z, m) aligned with the flattened point order; (None, None)
    when absent."""
    out = []
    for ri, ring in enumerate(rings):
        for ci in range(len(ring)):
            pair = None
            if zm is not None:
                try:
                    pair = zm[ri][ci]
                except (IndexError, TypeError):
                    pair = None
            z = pair[0] if pair and len(pair) > 0 else None
            m = pair[1] if pair and len(pair) > 1 else None
            z = None if z is None or z != z else float(z)
            m = None if m is None or m != m else float(m)
            out.append((z, m))
    return out


def _range_arr(vals, nodata):
    """(min, max, packed array) with nodata fill for absent values."""
    filled = [nodata if v is None else v for v in vals]
    present = [v for v in vals if v is not None]
    lo = min(present) if present else 0.0
    hi = max(present) if present else 0.0
    return struct.pack('<2d', lo, hi) + b''.join(
        struct.pack('<d', v) for v in filled)


def _shape_record(kind: str, rings: List[List[Tuple[float, float]]],
                  zm=None, dims=None) -> bytes:
    """``dims`` is the file-wide (has_z, has_m) decided by the writer: the
    ESRI spec requires every record in a .shp to carry the header's shape
    type, so per-record Z/M presence may not choose the type (a dataset
    where only some rows carry Z would otherwise emit mixed record types,
    which external readers reject). Absent values pad with 0.0 / the
    -1e38 M no-data sentinel."""
    base = _KIND_TO_TYPE[kind]
    flat_zm = _flatten_zm(rings, zm)
    if dims is None:
        has_z = any(z is not None for z, _ in flat_zm)
        has_m = any(m is not None for _, m in flat_zm)
    else:
        has_z, has_m = dims
    stype = _Z_TYPE[base] if has_z else (_M_TYPE[base] if has_m else base)

    if base == 1:
        x, y = rings[0][0]
        z, m = flat_zm[0]
        if has_z:
            out = struct.pack('<iddd', stype, x, y, z if z is not None else 0.0)
            if has_m:
                out += struct.pack('<d', m if m is not None else _M_NODATA)
            return out
        if has_m:
            return struct.pack('<iddd', stype, x, y,
                               m if m is not None else _M_NODATA)
        return struct.pack('<idd', 1, x, y)

    pts = [p for ring in rings for p in ring]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    bbox = struct.pack('<4d', min(xs), min(ys), max(xs), max(ys))
    if base == 8:
        body = struct.pack('<i', len(pts)) + b''.join(
            struct.pack('<2d', x, y) for x, y in pts)
    else:
        # PolyLine / Polygon: parts are ring start offsets
        offsets, off = [], 0
        for ring in rings:
            offsets.append(off)
            off += len(ring)
        body = struct.pack('<2i', len(rings), len(pts))
        body += b''.join(struct.pack('<i', o) for o in offsets)
        body += b''.join(struct.pack('<2d', x, y) for x, y in pts)
    out = struct.pack('<i', stype) + bbox + body
    if has_z:
        out += _range_arr([z for z, _ in flat_zm], 0.0)
    if has_m:
        out += _range_arr([m for _, m in flat_zm], _M_NODATA)
    return out


def _read_zm_arrays(content: bytes, pos: int, n: int, stype: int):
    """Optional Z then M blocks (range + n values each) from ``pos``.
    Returns (z_list_or_None, m_list_or_None); measures below -1e38 are the
    spec's no-data sentinel -> None."""
    has_z_type = stype in (11, 13, 15, 18)
    has_m_type = stype in (21, 23, 25, 28)
    blk = 16 + 8 * n
    zs = ms = None
    if has_z_type and pos + blk <= len(content):
        zs = list(struct.unpack_from(f'<{n}d', content, pos + 16))
        pos += blk
    if (has_z_type or has_m_type) and pos + blk <= len(content):
        raw = struct.unpack_from(f'<{n}d', content, pos + 16)
        ms = [None if v < -1e38 else v for v in raw]
    return zs, ms


def _attach_zm(row, rings, zs, ms):
    """Align flat z/m arrays back to ring nesting; only attach when any
    value is present."""
    if zs is None and (ms is None or all(m is None for m in ms)):
        return row
    zm = []
    i = 0
    for ring in rings:
        r = []
        for _ in ring:
            z = zs[i] if zs is not None else None
            m = ms[i] if ms is not None else None
            r.append([z, m])
            i += 1
        zm.append(r)
    row['zm'] = zm
    return row


def _parse_record(content: bytes):
    (stype,) = struct.unpack_from('<i', content, 0)
    base = _Z_OFFSET.get(stype, stype)
    if stype == 0:
        return None
    if base == 1:
        x, y = struct.unpack_from('<2d', content, 4)
        row = {'kind': 'point', 'rings': [[(x, y)]]}
        if stype == 11:  # PointZ: z [+ optional m]
            (z,) = struct.unpack_from('<d', content, 20)
            m = None
            if len(content) >= 36:
                (m,) = struct.unpack_from('<d', content, 28)
                m = None if m < -1e38 else m
            row['zm'] = [[[z, m]]]
        elif stype == 21:  # PointM
            (m,) = struct.unpack_from('<d', content, 20)
            if m >= -1e38:
                row['zm'] = [[[None, m]]]
        return row
    if base == 8:
        (n,) = struct.unpack_from('<i', content, 36)
        pts = list(struct.iter_unpack('<2d', content[40:40 + 16 * n]))
        rings = [[p] for p in pts]
        zs, ms = _read_zm_arrays(content, 40 + 16 * n, n, stype)
        return _attach_zm({'kind': 'multipoint', 'rings': rings}, rings, zs, ms)
    if base in (3, 5):
        n_parts, n_pts = struct.unpack_from('<2i', content, 36)
        offs = list(struct.unpack_from(f'<{n_parts}i', content, 44))
        pt_base = 44 + 4 * n_parts
        pts = [tuple(p) for p in
               struct.iter_unpack('<2d', content[pt_base:pt_base + 16 * n_pts])]
        bounds = offs + [n_pts]
        rings = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
        if base == 3:
            kind = 'linestring' if n_parts == 1 else 'multilinestring'
        else:
            kind = 'polygon'
        zs, ms = _read_zm_arrays(content, pt_base + 16 * n_pts, n_pts, stype)
        return _attach_zm({'kind': kind, 'rings': rings}, rings, zs, ms)
    raise ValueError(f'unsupported shape type: {stype}')


def _write_shp_shx(shapes: List[Dict]) -> Tuple[bytes, bytes]:
    records = []
    header_stype = 0
    # File-wide Z/M: the spec allows exactly one shape type per file, so
    # decide dims across ALL records and pad rows that lack values.
    file_z = file_m = False
    for s in shapes:
        for z, m in _flatten_zm(s['rings'], s.get('zm')):
            file_z = file_z or z is not None
            file_m = file_m or m is not None
    for i, s in enumerate(shapes):
        content = _shape_record(s['kind'], s['rings'], s.get('zm'),
                                dims=(file_z, file_m))
        if i == 0:
            (header_stype,) = struct.unpack_from('<i', content, 0)
        records.append(struct.pack('>2i', i + 1, len(content) // 2) + content)
    all_pts = [p for s in shapes for ring in s['rings'] for p in ring]
    xs = [p[0] for p in all_pts] or [0.0]
    ys = [p[1] for p in all_pts] or [0.0]
    total = 100 + sum(len(r) for r in records)
    stype = header_stype

    def header(file_len_bytes: int) -> bytes:
        return (struct.pack('>7i', 9994, 0, 0, 0, 0, 0, file_len_bytes // 2) +
                struct.pack('<2i', 1000, stype) +
                struct.pack('<8d', min(xs), min(ys), max(xs), max(ys),
                            0.0, 0.0, 0.0, 0.0))

    shp = header(total) + b''.join(records)
    shx_recs = []
    off = 100
    for r in records:
        shx_recs.append(struct.pack('>2i', off // 2, (len(r) - 8) // 2))
        off += len(r)
    shx = header(100 + 8 * len(records)) + b''.join(shx_recs)
    return shp, shx


def _write_dbf(props: List[Dict[str, str]]) -> bytes:
    fields = sorted({k for p in props for k in (p or {})})
    if not fields:
        fields = ['id']
        props = [{'id': str(i)} for i in range(len(props))]
    widths = {f: max(1, *(len(str((p or {}).get(f, ''))) for p in props))
              for f in fields}
    widths = {f: min(w, 254) for f, w in widths.items()}
    rec_size = 1 + sum(widths.values())
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack('<B3BI2H20x', 0x03, 95, 1, 1, len(props),
                       hdr_size, rec_size)
    for f in fields:
        name = f.encode('ascii', 'replace')[:10].ljust(11, b'\x00')
        out += struct.pack('<11sc4xBB14x', name, b'C', widths[f], 0)
    out += b'\x0d'
    for p in props:
        out += b' '
        for f in fields:
            out += str((p or {}).get(f, '')).encode(
                'utf-8', 'replace')[:widths[f]].ljust(widths[f], b' ')
    out += b'\x1a'
    return bytes(out)


def _read_dbf(blob: bytes) -> List[Dict[str, str]]:
    n_rec, hdr_size, rec_size = struct.unpack_from('<I2H', blob, 4)
    fields = []
    pos = 32
    while blob[pos] != 0x0D:
        name = blob[pos:pos + 11].split(b'\x00')[0].decode('ascii', 'replace')
        width = blob[pos + 16]
        fields.append((name, width))
        pos += 32
    out = []
    base = hdr_size
    for i in range(n_rec):
        rec = blob[base + i * rec_size: base + (i + 1) * rec_size]
        vals = {}
        off = 1
        for name, width in fields:
            vals[name] = rec[off:off + width].decode('utf-8', 'replace').strip()
            off += width
        out.append(vals)
    return out


def write_shapefile_zip(shapes: List[Dict], name: str = 'shapes') -> bytes:
    """Shape dicts ({'kind', 'rings', 'properties'?}) -> zipped
    shp+shx+dbf archive bytes."""
    shp, shx = _write_shp_shx(shapes)
    dbf = _write_dbf([s.get('properties') or {} for s in shapes])
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, 'w') as z:
        z.writestr(f'{name}.shp', shp)
        z.writestr(f'{name}.shx', shx)
        z.writestr(f'{name}.dbf', dbf)
    return buf.getvalue()


def read_shapefile_zip(blob: bytes) -> List[Dict]:
    """Zipped shapefile archive -> shape dicts with properties."""
    shp = dbf = None
    with zipfile.ZipFile(io.BytesIO(blob)) as z:
        for nm in z.namelist():
            base = nm.rsplit('/', 1)[-1]
            if base.startswith('._') or nm.startswith('__MACOSX/'):
                continue
            if nm.lower().endswith('.shp'):
                shp = z.read(nm)
            elif nm.lower().endswith('.dbf'):
                dbf = z.read(nm)
    if shp is None:
        raise ValueError('no .shp member in archive')
    (file_len_words,) = struct.unpack_from('>i', shp, 24)
    end = file_len_words * 2
    pos = 100
    shapes = []
    while pos < min(end, len(shp)):
        _, content_words = struct.unpack_from('>2i', shp, pos)
        content = shp[pos + 8: pos + 8 + content_words * 2]
        row = _parse_record(content)
        if row is not None:
            shapes.append(row)
        pos += 8 + content_words * 2
    props = _read_dbf(dbf) if dbf else [{}] * len(shapes)
    for s, p in zip(shapes, props):
        s['properties'] = p
    return shapes


_PARSED_SCHEMA = (', kind string, '
                  'rings array<array<struct<lon:double,lat:double>>>, '
                  'properties map<string,string>, record_idx int, '
                  'zm array<array<array<double>>>')


def parse_shapefile_df(df: DataFrame, zip_col: str = 'shp_zip') -> DataFrame:
    """Zipped-shapefile binary column -> one canonical shape row per
    record (reference parse_shapefile, parsers.py:194-226)."""
    cols = list(df.columns)
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in df.schema.fields) + _PARSED_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                base = tuple(row)
                try:
                    shapes = read_shapefile_zip(bytes(getattr(row, zip_col)))
                except Exception:
                    shapes = []
                for i, s in enumerate(shapes):
                    rings = [[{'lon': float(x), 'lat': float(y)}
                              for x, y in ring] for ring in s['rings']]
                    rows.append((*base, s['kind'], rings,
                                 {str(k): str(v) for k, v in
                                  (s.get('properties') or {}).items()}, i,
                                 s.get('zm')))
            yield pd.DataFrame(rows, columns=[
                *cols, 'kind', 'rings', 'properties', 'record_idx', 'zm'])

    return df.mapInPandas(run, schema=out_schema)


def to_shapefile_zip(shapes: DataFrame, rings_col: str = 'rings') -> bytes:
    """Collect a (small) canonical shapes frame and serialize one zipped
    shapefile archive — the reference's whole-collection serializer shape
    (driver-side by design; one archive is one file artifact)."""
    rows = shapes.collect()
    dicts = []
    for r in rows:
        d = r.asDict(recursive=True)
        rings = [[(c['lon'], c['lat']) for c in ring]
                 for ring in (d.get(rings_col) or [])]
        dicts.append({'kind': d['kind'], 'rings': rings,
                      'properties': d.get('properties') or {},
                      'zm': d.get('zm')})
    return write_shapefile_zip(dicts)
