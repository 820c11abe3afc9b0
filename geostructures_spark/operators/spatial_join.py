"""The spatial join: points x shapes via cell candidates + exact kernels.

Architecture (SURVEY.md §3.2):

  points --with_cell--> keyed by cell
  shapes --cover_shapes--> (shape_id, cell), broadcast
  candidates = points ⋈ broadcast(covers) ON cell        (equi-join)
  time gate  = right-open interval Column predicate      (JVM, pre-UDF)
  exact      = Arrow-batched kernel predicate per shape  (pandas UDF)

The cell equi-join replaces the reference's per-pair sweep-line pruning
(_geometry.py:223-316) as the candidate structure; the exact predicate
replays contains_coordinate/intersects semantics (structures.py:440-458 etc.)
bit-for-bit via kernels.shapes.

Scale notes:
- the shapes side is broadcast (shape catalogs are ~10^4-10^6 rows; the
  pages/points side is the 10^12-row one);
- shape *geometries* travel to executors once as a Spark broadcast variable,
  not per-row through the join;
- hot cells (cities) can be salted: ``salt_shards > 0`` replicates cover
  rows per shard and salts the points side, splitting a hot cell across
  ``shards`` tasks; AQE skew-join is the backstop.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geostructures_spark.functions.geo import interval_contains_instant_expr
from geostructures_spark.operators.tiling import (
    cover_shapes, shape_row_to_kernel, with_cell,
)

__all__ = ['spatial_join_points', 'filter_points_by_shape']


_BROADCAST_MAX_SHAPES = 200_000
_BROADCAST_MAX_RING_VERTS = 20_000_000   # ~640 MB of packed ring floats


def _catalog_size(shapes: DataFrame):
    """(n_shapes, total ring vertices) — one cheap agg over the catalog side
    to decide broadcast vs shipped-spec execution."""
    row = shapes.agg(
        F.count('*').alias('n'),
        F.coalesce(F.sum(F.aggregate(
            F.coalesce(F.col('rings'),
                       F.array().cast('array<array<struct<lon:double,lat:double>>>')),
            F.lit(0), lambda acc, ring: acc + F.size(ring))), F.lit(0)).alias('verts')
    ).collect()[0]
    return int(row['n']), int(row['verts'])


def _shape_broadcast(spark: SparkSession, shapes: DataFrame):
    """Collect the (small) shapes side and broadcast kernel dicts keyed by
    shape_id. One driver collect of catalog metadata — not data-path collect.
    Callers guard with _catalog_size before taking this path."""
    cols = ['shape_id', 'kind', 'params', 'rings'] + (
        ['poly_sizes'] if 'poly_sizes' in shapes.columns else [])
    rows = shapes.select(*cols).collect()
    catalog = {}
    for r in rows:
        d = r.asDict(recursive=True)
        catalog[d['shape_id']] = shape_row_to_kernel(d)
    return spark.sparkContext.broadcast(catalog)


def _shape_spec_col(shapes: DataFrame):
    """One JSON column carrying the whole shape geometry — the no-broadcast
    transport: specs travel through the equi-join instead of the driver."""
    fields = [F.col('kind'), F.col('params'), F.col('rings')] + (
        [F.col('poly_sizes')] if 'poly_sizes' in shapes.columns else [])
    names = ['kind', 'params', 'rings'] + (
        ['poly_sizes'] if 'poly_sizes' in shapes.columns else [])
    return F.to_json(F.struct(*[c.alias(n) for c, n in zip(fields, names)]))


def _exact_predicate_spec_udf():
    """Exact containment over shipped shape specs: per Arrow batch, group
    candidate rows by shape_id (argsort), build each kernel dict once from
    its JSON spec, evaluate vectorized. No driver collect, no broadcast —
    the scale path for catalogs beyond the broadcast guard."""
    import json

    from geostructures_spark.kernels import shapes as shp

    @F.pandas_udf(T.BooleanType())
    def _pred(shape_id: pd.Series, spec: pd.Series,
              lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(shape_id), dtype=bool)
        if len(shape_id) == 0:
            return pd.Series(out)
        sid = shape_id.to_numpy()
        lons = lon.to_numpy(np.float64)
        lats = lat.to_numpy(np.float64)
        specs = spec.to_numpy()
        order = np.argsort(sid, kind='stable')
        sorted_sid = sid[order]
        bounds = np.flatnonzero(np.r_[True, sorted_sid[1:] != sorted_sid[:-1], True])
        for i in range(len(bounds) - 1):
            sel = order[bounds[i]:bounds[i + 1]]
            shape = shape_row_to_kernel(json.loads(specs[sel[0]]))
            out[sel] = shp.shape_contains_points(shape, lons[sel], lats[sel])
        return pd.Series(out, index=shape_id.index)

    return _pred


def _exact_predicate_udf(bc, predicate: str):
    from geostructures_spark.kernels import shapes as shp

    @F.pandas_udf(T.BooleanType())
    def _pred(shape_id: pd.Series, lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = np.zeros(len(shape_id), dtype=bool)
        if len(shape_id) == 0:
            return pd.Series(out)
        sid = shape_id.to_numpy()
        lons = lon.to_numpy(np.float64)
        lats = lat.to_numpy(np.float64)
        catalog = bc.value
        # batch by shape: vectorized kernel per shape over its candidates
        order = np.argsort(sid, kind='stable')
        sorted_sid = sid[order]
        bounds = np.flatnonzero(np.r_[True, sorted_sid[1:] != sorted_sid[:-1], True])
        for i in range(len(bounds) - 1):
            sel = order[bounds[i]:bounds[i + 1]]
            shape = catalog.get(sorted_sid[bounds[i]])
            if shape is None:
                continue
            out[sel] = shp.shape_contains_points(shape, lons[sel], lats[sel])
        return pd.Series(out, index=shape_id.index)

    return _pred


def spatial_join_points(
    points: DataFrame,
    shapes: DataFrame,
    length: int = 8,
    base: int = 16,
    time_gated: bool = True,
    salt_shards: int = 0,
    cell_col: str = 'cell',
    max_broadcast_shapes: int = _BROADCAST_MAX_SHAPES,
    max_broadcast_ring_verts: int = _BROADCAST_MAX_RING_VERTS,
) -> DataFrame:
    """points ⨝ shapes with exact containment (point-probe semantics of
    contains/intersects, which coincide for points — structures.py:156-157).

    Returns candidate-join columns: all point columns + shape_id.
    ``time_gated`` applies the right-open instant-in-interval predicate
    (reference _base.py:282-291: time gate short-circuits before spatial)
    using points.warc_ts vs shapes dt_start/dt_end; shapes with NULL dt
    match all times (untimed shapes tested spatially, collections.py:447-452).

    Physical strategy is size-guarded: catalogs within the broadcast budget
    collect once to the driver and broadcast kernel dicts (fastest); larger
    catalogs never touch the driver — covers join as a shuffle join and the
    geometry travels to its candidate rows as a JSON spec through a
    shape_id equi-join (set the thresholds to 0 to force that path)."""
    spark = points.sparkSession
    if cell_col not in points.columns:
        points = with_cell(points, length, base, cell_col=cell_col)

    n_shapes, n_verts = _catalog_size(shapes)
    use_broadcast = (n_shapes <= max_broadcast_shapes and
                     n_verts <= max_broadcast_ring_verts)

    cover_parts = min(64, max(4, n_shapes // 25 + 1))
    covers = cover_shapes(shapes, length, base, n_partitions=cover_parts)
    dt_map = shapes.select('shape_id', 'dt_start', 'dt_end')
    covers = covers.join(F.broadcast(dt_map) if use_broadcast else dt_map,
                         'shape_id')

    if salt_shards > 0:
        # replicate the broadcast side per shard; salt the big side
        shards = spark.range(salt_shards).select(F.col('id').cast('int').alias('_shard'))
        covers = covers.crossJoin(F.broadcast(shards)).withColumn(
            'join_key', F.concat_ws('#', 'cell', F.col('_shard').cast('string')))
        points = points.withColumn(
            'join_key',
            F.concat_ws('#', F.col(cell_col),
                        F.pmod(F.xxhash64(*[c for c in ('url', 'lon', 'lat')
                                            if c in points.columns]),
                               F.lit(salt_shards)).cast('string')))
        join_key = 'join_key'
    else:
        covers = covers.withColumnRenamed('cell', cell_col)
        join_key = cell_col

    covers_sel = covers.select(join_key, 'shape_id', 'dt_start', 'dt_end')
    cand = points.join(F.broadcast(covers_sel) if use_broadcast else covers_sel,
                       join_key)

    if time_gated and 'warc_ts' in points.columns:
        no_dt = F.col('dt_start').isNull() | F.col('dt_end').isNull()
        gate = no_dt | interval_contains_instant_expr(
            F.col('dt_start'), F.col('dt_end'), F.col('warc_ts'))
        cand = cand.filter(gate)

    if use_broadcast:
        bc = _shape_broadcast(spark, shapes)
        pred = _exact_predicate_udf(bc, 'contains')
        out = cand.filter(pred(F.col('shape_id'), F.col('lon'), F.col('lat')))
    else:
        specs = shapes.select('shape_id', _shape_spec_col(shapes).alias('_spec'))
        pred = _exact_predicate_spec_udf()
        out = (cand.join(specs, 'shape_id')
               .filter(pred(F.col('shape_id'), F.col('_spec'),
                            F.col('lon'), F.col('lat')))
               .drop('_spec'))
    drop = ['dt_start', 'dt_end'] + (['join_key', '_shard'] if salt_shards else [])
    return out.drop(*[c for c in drop if c in out.columns])


def filter_points_by_shape(points: DataFrame, shapes: DataFrame,
                           **kwargs) -> DataFrame:
    """filter_by_intersection with a point-set left side
    (collections.py:119-131): semi-join — points that fall in ANY shape."""
    joined = spatial_join_points(points, shapes, **kwargs)
    key_cols = [c for c in ('url', 'warc_ts', 'point_idx') if c in points.columns]
    return points.join(joined.select(*key_cols).distinct(), key_cols, 'left_semi')
