"""Canonical shape equality: rotation/orientation-invariant dedup + joins.

The reference defines polygon equality on the *canonical* ring — drop the
closing point, start at the lexicographic minimum vertex, take
min(forward, reverse) — so rotated and reversed vertex lists compare equal
(structures.py:348-355), and collection set-equality hashes shapes by that
form (_base.py:880-888). The distributed form is a deterministic string key
per shape row: equal shapes get equal keys, so dedup is a hash groupBy and
equality join is an equi-join on the key — no pairwise comparisons.

Key composition per kind:
- polygon / linestring-like rows with vertex rings: canonical outline +
  *sorted* canonical hole forms (hole order is insignificant, set semantics);
- parametric kinds (circle/ellipse/ring/box/point): kind + params values
  (reference __eq__ compares parameters, e.g. structures.py:884-893);
- dt bounds participate when present (__eq__ includes dt, _base.py:268-279).

Vertices are repr()'d at full float precision — keys match iff the doubles
are bit-identical, exactly like the reference's tuple equality.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostructures_spark.kernels.shapes import canonical_ring

__all__ = ['canonical_shape_key', 'with_canonical_key', 'dedup_shapes',
           'shape_equality_join']

_PARAM_ORDER = ('center_lon', 'center_lat', 'radius', 'semi_major',
                'semi_minor', 'rotation', 'inner_radius', 'outer_radius',
                'angle_min', 'angle_max', 'min_lon', 'min_lat', 'max_lon',
                'max_lat')


def canonical_shape_key(kind, rings=None, params=None,
                        dt_start=None, dt_end=None, poly_sizes=None) -> str:
    """Deterministic equality key for one canonical shape row."""
    parts = [str(kind)]
    n_rings = 0 if rings is None else len(rings)
    if kind in ('polygon', 'multipolygon') and n_rings:
        forms = []
        for i, ring in enumerate(rings):
            arr = np.asarray([(c['lon'], c['lat']) if isinstance(c, dict)
                              else (c[0], c[1]) for c in ring], dtype=np.float64)
            form = repr(canonical_ring(arr))
            forms.append((i, form))
        if kind == 'polygon':
            # outline ordered first; holes as an unordered set
            parts.append(forms[0][1])
            parts.extend(sorted(f for _, f in forms[1:]))
        else:
            # multipolygon: unordered set of per-polygon
            # (outline, sorted holes) groups, respecting poly_sizes
            sizes = ([1] * n_rings if poly_sizes is None or not len(poly_sizes)
                     else [int(n) for n in poly_sizes])
            groups, i = [], 0
            for n in sizes:
                g = forms[i:i + n]
                groups.append(g[0][1] + '||' + '|'.join(sorted(f for _, f in g[1:])))
                i += n
            parts.extend(sorted(groups))
    elif n_rings:
        # linestring / point-list kinds: vertex order is significant
        for ring in rings:
            parts.append(repr([(c['lon'], c['lat']) if isinstance(c, dict)
                               else (c[0], c[1]) for c in ring]))
    if params:
        parts.append(repr([params.get(k) for k in _PARAM_ORDER
                           if params.get(k) is not None]))
    parts.append(repr((None if dt_start is None or pd.isna(dt_start) else str(dt_start),
                       None if dt_end is None or pd.isna(dt_end) else str(dt_end))))
    return hashlib.md5('|'.join(parts).encode('utf-8')).hexdigest()


def with_canonical_key(shapes: DataFrame, key_col: str = 'canon_key') -> DataFrame:
    """Adds the canonical equality key column (Arrow-batched; rings travel
    JSON-encoded to survive inhomogeneous nesting, see operators/ringio.py)."""
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    cols = shapes.columns
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in shapes.schema.fields) + f', {key_col} string')
    has = {c: c in cols for c in ('rings', 'params', 'dt_start', 'dt_end',
                                  'poly_sizes')}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, rings_out = [], []
            for row in pdf.to_dict('records'):
                rings = (decode_rings_json(row.get('rings'))
                         if has['rings'] else None)
                rings_out.append(rings)
                keys.append(canonical_shape_key(
                    row['kind'],
                    rings=rings,
                    params=row.get('params') if has['params'] else None,
                    dt_start=row.get('dt_start') if has['dt_start'] else None,
                    dt_end=row.get('dt_end') if has['dt_end'] else None,
                    poly_sizes=row.get('poly_sizes') if has['poly_sizes'] else None))
            pdf = pdf.copy()
            if has['rings']:
                pdf['rings'] = rings_out
            pdf[key_col] = keys
            yield pdf

    inp = encode_rings_json(shapes) if has['rings'] else shapes
    return inp.mapInPandas(run, schema=out_schema)


def dedup_shapes(shapes: DataFrame, id_col: str = 'shape_id') -> DataFrame:
    """Duplicate-shape groups: (canon_key, n_shapes, min_shape_id) per group
    of canonically-equal shapes — min_shape_id is the canonical survivor."""
    return (with_canonical_key(shapes)
            .groupBy('canon_key')
            .agg(F.count('*').alias('n_shapes'), F.min(id_col).alias('min_shape_id')))


def shape_equality_join(shapes_a: DataFrame, shapes_b: DataFrame,
                        id_col: str = 'shape_id') -> DataFrame:
    """Equality join (reference __eq__ across two shape sets): pairs
    (a_id, b_id) of canonically-equal shapes, as a key equi-join."""
    a = with_canonical_key(shapes_a).select(F.col(id_col).alias('a_id'), 'canon_key')
    b = with_canonical_key(shapes_b).select(F.col(id_col).alias('b_id'), 'canon_key')
    return a.join(b, 'canon_key').select('a_id', 'b_id')
