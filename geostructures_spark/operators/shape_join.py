"""Shape-vs-shape spatial join: contains / intersects between shape sets.

The distributed form of the reference's collection filters
(filter_by_intersection :119-131, filter_contained_by :133-145,
filter_contains :147-159, intersects :433-458 in collections.py):

  covers_a = cover_shapes(A)         (exploded cell covers)
  covers_b = cover_shapes(B)
  candidates = covers_a ⋈ covers_b ON cell  (distinct id pairs)
  time gate  = right-open interval Column predicate
  exact      = shapes_intersect / shape_contains_shape kernels per pair

Shape geometries travel once as broadcast catalogs. Candidate pairs only
exist where covers overlap — the cell join is the pruning structure
(replacing the reference's per-pair sweep line at cluster scale).
"""

from __future__ import annotations

from typing import Dict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geostructures_spark.functions.geo import (
    interval_contains_expr, interval_intersects_expr,
)
from geostructures_spark.operators.tiling import cover_shapes, shape_row_to_kernel

__all__ = ['shape_join', 'filter_shapes_by_probe']


def _catalog_broadcast(spark: SparkSession, shapes: DataFrame):
    cols = ['shape_id', 'kind', 'params', 'rings'] + (
        ['poly_sizes'] if 'poly_sizes' in shapes.columns else [])
    rows = shapes.select(*cols).collect()
    cat = {}
    for r in rows:
        d = r.asDict(recursive=True)
        cat[d['shape_id']] = shape_row_to_kernel(d)
    return spark.sparkContext.broadcast(cat)


def shape_join(shapes_a: DataFrame, shapes_b: DataFrame,
               predicate: str = 'intersects',
               length: int = 6, base: int = 16,
               scheme: str = 'niemeyer', resolution: int = 7,
               time_gated: bool = True) -> DataFrame:
    """Pairs (a_id, b_id) where predicate(A, B) holds.

    predicate: 'intersects' (A ∩ B ≠ ∅) or 'contains' (A ⊇ B). Time
    semantics follow the reference: intersects requires interval overlap
    when both sides carry dt (intersects_time, _base.py:387-401); contains
    requires A's interval to contain B's (contains_time, _base.py:326-340);
    shapes without dt are tested spatially only (collections.py:447-452).
    """
    if predicate not in ('intersects', 'contains'):
        raise ValueError(predicate)
    from geostructures_spark.operators.spatial_join import (
        _BROADCAST_MAX_SHAPES, _BROADCAST_MAX_RING_VERTS, _catalog_size,
        _shape_spec_col)
    spark = shapes_a.sparkSession
    na, va = _catalog_size(shapes_a)[:2]
    nb, vb = _catalog_size(shapes_b)[:2]
    use_broadcast = (na + nb <= _BROADCAST_MAX_SHAPES and
                     va + vb <= _BROADCAST_MAX_RING_VERTS)

    cov_a = cover_shapes(shapes_a, length, base, scheme, resolution,
                         n_partitions=min(64, max(4, na // 25 + 1))) \
        .withColumnRenamed('shape_id', 'a_id')
    cov_b = cover_shapes(shapes_b, length, base, scheme, resolution,
                         n_partitions=min(64, max(4, nb // 25 + 1))) \
        .withColumnRenamed('shape_id', 'b_id')
    cand = cov_a.join(cov_b, 'cell').select('a_id', 'b_id').distinct()

    dt_a = shapes_a.select(F.col('shape_id').alias('a_id'),
                           F.col('dt_start').alias('a_start'),
                           F.col('dt_end').alias('a_end'))
    dt_b = shapes_b.select(F.col('shape_id').alias('b_id'),
                           F.col('dt_start').alias('b_start'),
                           F.col('dt_end').alias('b_end'))
    if use_broadcast:
        cand = cand.join(F.broadcast(dt_a), 'a_id').join(F.broadcast(dt_b), 'b_id')
    else:
        cand = cand.join(dt_a, 'a_id').join(dt_b, 'b_id')

    if time_gated:
        untimed = (F.col('a_start').isNull() | F.col('a_end').isNull() |
                   F.col('b_start').isNull() | F.col('b_end').isNull())
        a_us = (F.unix_micros(F.col('a_start')), F.unix_micros(F.col('a_end')))
        b_us = (F.unix_micros(F.col('b_start')), F.unix_micros(F.col('b_end')))
        if predicate == 'intersects':
            gate = untimed | interval_intersects_expr(*a_us, *b_us)
        else:
            gate = untimed | interval_contains_expr(*a_us, *b_us)
        cand = cand.filter(gate)

    from geostructures_spark.kernels import shapes as shp

    if use_broadcast:
        bc_a = _catalog_broadcast(spark, shapes_a)
        bc_b = _catalog_broadcast(spark, shapes_b)

        @F.pandas_udf(T.BooleanType())
        def _pred(a_id: pd.Series, b_id: pd.Series) -> pd.Series:
            ca, cb = bc_a.value, bc_b.value
            out = []
            for a, b in zip(a_id, b_id):
                sa = ca.get(a)
                sb = cb.get(b)
                if sa is None or sb is None:
                    out.append(False)
                elif predicate == 'intersects':
                    out.append(shp.shapes_intersect(sa, sb))
                else:
                    out.append(shp.shape_contains_shape(sa, sb))
            return pd.Series(out, index=a_id.index)

        return (cand.filter(_pred(F.col('a_id'), F.col('b_id')))
                .select('a_id', 'b_id'))

    # no-broadcast path: geometry specs travel through shape_id equi-joins;
    # kernels built once per distinct shape per Arrow batch
    import json as _json
    from geostructures_spark.operators.tiling import shape_row_to_kernel

    spec_a = shapes_a.select(F.col('shape_id').alias('a_id'),
                             _shape_spec_col(shapes_a).alias('_spec_a'))
    spec_b = shapes_b.select(F.col('shape_id').alias('b_id'),
                             _shape_spec_col(shapes_b).alias('_spec_b'))
    cand = cand.join(spec_a, 'a_id').join(spec_b, 'b_id')

    @F.pandas_udf(T.BooleanType())
    def _pred_spec(a_id: pd.Series, sa_js: pd.Series,
                   b_id: pd.Series, sb_js: pd.Series) -> pd.Series:
        memo_a, memo_b = {}, {}
        out = []
        for a, sa_j, b, sb_j in zip(a_id, sa_js, b_id, sb_js):
            sa = memo_a.get(a)
            if sa is None:
                sa = memo_a[a] = shape_row_to_kernel(_json.loads(sa_j))
            sb = memo_b.get(b)
            if sb is None:
                sb = memo_b[b] = shape_row_to_kernel(_json.loads(sb_j))
            if predicate == 'intersects':
                out.append(shp.shapes_intersect(sa, sb))
            else:
                out.append(shp.shape_contains_shape(sa, sb))
        return pd.Series(out, index=a_id.index)

    return (cand.filter(_pred_spec(F.col('a_id'), F.col('_spec_a'),
                                   F.col('b_id'), F.col('_spec_b')))
            .select('a_id', 'b_id'))


def filter_shapes_by_probe(shapes: DataFrame, probe: DataFrame,
                           predicate: str = 'intersects', **kwargs) -> DataFrame:
    """filter_by_intersection / filter_contained_by with a broadcastable
    probe set: keeps shapes related to ANY probe (left-semi)."""
    if predicate == 'contained_by':
        pairs = shape_join(probe, shapes, predicate='contains', **kwargs) \
            .select(F.col('b_id').alias('shape_id'))
    elif predicate == 'contains':
        pairs = shape_join(shapes, probe, predicate='contains', **kwargs) \
            .select(F.col('a_id').alias('shape_id'))
    else:
        pairs = shape_join(shapes, probe, predicate='intersects', **kwargs) \
            .select(F.col('a_id').alias('shape_id'))
    return shapes.join(pairs.distinct(), 'shape_id', 'left_semi')
