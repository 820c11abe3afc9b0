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


def _plain_circle_expr():
    """Plain circle = no holes, radius set (Columns built lazily — module
    import must not require an active SparkContext)."""
    return (
        (F.col('kind') == 'circle') &
        F.col('params').getField('radius').isNotNull() &
        (F.size(F.coalesce(
            F.col('rings'),
            F.array().cast('array<array<struct<lon:double,lat:double>>>'))) <= 0))


def _catalog_size(shapes: DataFrame, length: int = None, base: int = 16):
    """(n_shapes, total ring vertices, n_plain_circles, n_sql_cover) — ONE
    cheap agg over the catalog side deciding broadcast vs shipped-spec
    execution, the all-circle JVM exact predicate (plain circle = no holes,
    radius set), and how many shapes the pure-SQL circle cover can serve
    (when ``length`` is given and base is 16)."""
    sql_ok = (_sql_cover_ok_expr(length) if (length is not None and base == 16)
              else F.lit(False))
    row = shapes.agg(
        F.count('*').alias('n'),
        F.coalesce(F.sum(F.aggregate(
            F.coalesce(F.col('rings'),
                       F.array().cast('array<array<struct<lon:double,lat:double>>>')),
            F.lit(0), lambda acc, ring: acc + F.size(ring))), F.lit(0)).alias('verts'),
        F.coalesce(F.sum(_plain_circle_expr().cast('int')), F.lit(0)).alias('plain'),
        F.coalesce(F.sum(sql_ok.cast('int')), F.lit(0)).alias('sql_cover'),
    ).collect()[0]
    return (int(row['n']), int(row['verts']), int(row['plain']),
            int(row['sql_cover']))


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


_SQL_COVER_MAX_BOXES = 65_536


def _circle_window_exprs(length: int):
    """Bbox-window box-index Columns for plain circles (keyed off the
    ``params`` struct): the spherical-cap bounding box. Every point p with
    hav(p, center) <= r satisfies |lat_p - clat| <= ang and |lon_p - clon|
    <= asin(sin(ang)/cos(clat)) (cap not containing a pole), so the
    window — with a +-1 cell slack for quantization-rule edge cases —
    contains every cell that holds a matching point; cells outside it can
    only hold candidates the exact predicate would reject anyway.
    Full-longitude fallback when the cap touches a pole or the window
    crosses the antimeridian (mirroring the Python cover's fallback).

    Returns (i0, i1, j0, j1, nbox, full) Columns; NULL-free for plain
    circles (radius non-null)."""
    from geostructures_spark.kernels.geodesy import EARTH_RADIUS_METERS
    m = (4 * length) // 2
    w = 360.0 / (1 << m)
    h = 180.0 / (1 << m)
    hi = (1 << m) - 1
    clon = F.col('params').getField('center_lon')
    clat = F.col('params').getField('center_lat')
    ang = F.degrees(F.col('params').getField('radius').cast('double') /
                    F.lit(EARTH_RADIUS_METERS))
    lat_lo = clat - ang
    lat_hi = clat + ang
    pole = (lat_hi >= 90.0) | (lat_lo <= -90.0)
    # tight cap extent; the asin argument is < 1 when no pole is inside,
    # clamped against fp overshoot
    extent = F.degrees(F.asin(F.least(
        F.sin(F.radians(ang)) /
        F.greatest(F.cos(F.radians(clat)), F.lit(1e-12)),
        F.lit(1.0))))
    full = pole | (clon - extent < -180.0) | (clon + extent > 180.0)
    lon_lo = F.when(full, F.lit(-180.0)).otherwise(clon - extent)
    lon_hi = F.when(full, F.lit(180.0)).otherwise(clon + extent)
    i0 = F.greatest(F.floor((lon_lo + 180.0) / w) - 1, F.lit(0)).cast('long')
    i1 = F.least(F.floor((lon_hi + 180.0) / w) + 1, F.lit(hi)).cast('long')
    j0 = F.greatest(F.floor((F.greatest(lat_lo, F.lit(-90.0)) + 90.0) / h) - 1,
                    F.lit(0)).cast('long')
    j1 = F.least(F.floor((F.least(lat_hi, F.lit(90.0)) + 90.0) / h) + 1,
                 F.lit(hi)).cast('long')
    nbox = (i1 - i0 + 1) * (j1 - j0 + 1)
    return i0, i1, j0, j1, nbox, full


def _sql_cover_ok_expr(length: int):
    """Deterministic routing predicate: this shape's cover can be built by
    the pure-SQL circle window (plain circle, bounded box count). Never
    NULL (FALSE for non-circles by three-valued AND)."""
    nbox = _circle_window_exprs(length)[4]
    return _plain_circle_expr() & (nbox <= _SQL_COVER_MAX_BOXES)


def _circle_cover_sql(circles: DataFrame, length: int,
                      drop_chars: int = 0,
                      with_params: bool = False,
                      numeric_key: bool = False) -> DataFrame:
    """(shape_id, cell) cover rows for plain circles as a pure Column plan:
    the bbox enumeration window of kernels.tiling_niemeyer._enum_cover,
    trimmed by a triangle-inequality distance test — a SUPERSET of the
    Python cover, so the exact containment predicate downstream sees every
    candidate it saw before (plus a few extra it rejects; results
    identical). Cells are built by interleaving the (i, j) box indices
    directly — no Python stage. Base 16 only; caller routes with
    _sql_cover_ok_expr so the per-shape explode stays bounded.

    Trim-safety: a cell containing a point p inside the circle satisfies
    hav(center, clamp(center)) <= hav(center, p) + hav(p, clamp(center))
    <= r + (widest parallel arc + meridian height of the cell), so keeping
    every cell with clamped-distance <= r + pad can drop no needed cell.
    Clamping ignores longitude wrap, which over-estimates distance only
    when the window wraps — those shapes fall into the full-longitude
    branch, where the trim is skipped.

    ``drop_chars`` > 0 emits the cover at PARENT-cell granularity (the
    Niemeyer prefix of length - drop_chars chars; one dropped char = 2
    bits per axis): ~16x fewer cover rows per dropped char for the same
    candidate-superset guarantee — the knob that keeps the broadcast
    relation small when candidates are cheap to reject (all-circle JVM
    predicate). Join such covers against a substring of the points' cell
    column."""
    import math as _math

    from geostructures_spark.functions.geo import (
        haversine_expr, niemeyer_interleave_expr)
    from geostructures_spark.kernels.geodesy import EARTH_RADIUS_METERS
    out_len = length - drop_chars
    assert out_len >= 1
    s = 2 * drop_chars          # bits dropped per axis
    m = (4 * length) // 2
    w = 360.0 / (1 << (m - s))  # parent-cell geometry
    h = 180.0 / (1 << (m - s))
    i0, i1, j0, j1, _, full = _circle_window_exprs(length)
    clon = F.col('params').getField('center_lon')
    clat = F.col('params').getField('center_lat')
    r = F.col('params').getField('radius').cast('double')
    if s:
        i0, i1 = F.shiftright(i0, s), F.shiftright(i1, s)
        j0, j1 = F.shiftright(j0, s), F.shiftright(j1, s)
    base = circles.select(
        'shape_id', clon.alias('_clon'), clat.alias('_clat'),
        r.alias('_r'), full.alias('_full'),
        i0.alias('_i0'), i1.alias('_i1'),
        j0.alias('_j0'), j1.alias('_j1'))
    if drop_chars == 0:
        # parallelize big fine-grained explodes: the shapes side typically
        # scans from a small file (1-2 input partitions) — a tiny keyed
        # repartition spreads the window enumeration over the cluster.
        # Prefix covers (~16x fewer rows per dropped char) skip the extra
        # shuffle stage.
        spark = circles.sparkSession
        n_parts = max(8, spark.sparkContext.defaultParallelism)
        base = base.repartition(n_parts, 'shape_id')
    rows = (base
            .select('shape_id', '_clon', '_clat', '_r', '_full', '_j0', '_j1',
                    F.explode(F.sequence('_i0', '_i1')).alias('_i'))
            .select('shape_id', '_clon', '_clat', '_r', '_full', '_i',
                    F.explode(F.sequence('_j0', '_j1')).alias('_j')))
    lon_lo = F.lit(-180.0) + F.col('_i') * w
    lat_lo = F.lit(-90.0) + F.col('_j') * h
    lon_cl = F.least(F.greatest(F.col('_clon'), lon_lo), lon_lo + w)
    lat_cl = F.least(F.greatest(F.col('_clat'), lat_lo), lat_lo + h)
    # widest parallel of the cell (the latitude nearest the equator)
    lat_wide = F.when((lat_lo <= 0.0) & (lat_lo + h >= 0.0), F.lit(0.0)) \
        .otherwise(F.least(F.abs(lat_lo), F.abs(lat_lo + h)))
    pad = (haversine_expr(F.lit(0.0), lat_wide, F.lit(w), lat_wide) +
           F.lit(EARTH_RADIUS_METERS * _math.radians(h)))
    keep = F.col('_full') | (
        haversine_expr(F.col('_clon'), F.col('_clat'), lon_cl, lat_cl)
        <= F.col('_r') + pad)
    extra = ['_clon', '_clat', '_r'] if with_params else []
    # numeric_key: skip building the cell STRING — the join key is the
    # packed (i, j) box-index pair. Only valid when the points side derives
    # the same packed key from the same quantization (caller-guarded), and
    # it lets Catalyst prune the string encode wholesale.
    key = (F.shiftleft(F.col('_i'), 32).bitwiseOR(F.col('_j')).alias('cell')
           if numeric_key else
           niemeyer_interleave_expr(F.col('_i'), F.col('_j'), out_len)
           .alias('cell'))
    return rows.filter(keep).select('shape_id', key, *extra)


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
    had_cell = cell_col in points.columns
    if not had_cell:
        points = with_cell(points, length, base, cell_col=cell_col)

    n_shapes, n_verts, n_plain, n_sql = _catalog_size(shapes, length, base)
    use_broadcast = (n_shapes <= max_broadcast_shapes and
                     n_verts <= max_broadcast_ring_verts)
    all_plain_circles = n_shapes > 0 and n_plain == n_shapes
    gated = time_gated and 'warc_ts' in points.columns

    # cover side: plain circles within the box cap get the pure-SQL window
    # cover (no Python stage); everything else keeps the per-shape
    # applyInPandas covering. The SQL cover is a superset of the Python one
    # for the same circle, so candidates only grow and the exact predicate
    # keeps results identical. When ALL covers are SQL-built, the JVM
    # predicate is cheap, and the covers broadcast, emit the cover at
    # parent-cell granularity (one prefix char dropped): ~16x fewer rows in
    # the broadcast relation for a modest candidate inflation the codegen
    # haversine filter absorbs.
    prefix_drop = 1 if (n_sql == n_shapes and n_sql > 0 and use_broadcast
                        and all_plain_circles and length >= 2) else 0
    # when every cover row is SQL-built for a plain circle, the circle's
    # (center, radius) triple rides the cover rows themselves — the exact
    # predicate then needs NO second join at all
    carry_params = all_plain_circles and n_sql == n_shapes and n_sql > 0
    # when we assigned the points' cells ourselves (same closed-form
    # quantization as the SQL cover windows), join on the packed (i, j)
    # integer key instead of cell strings: no string building on either
    # side, and Catalyst prunes the points' string encode wholesale when
    # the caller doesn't read it
    numeric_key = carry_params and not had_cell and base == 16
    if n_sql > 0:
        sql_ok = _sql_cover_ok_expr(length)
        covers = _circle_cover_sql(shapes.filter(sql_ok), length, prefix_drop,
                                   with_params=carry_params,
                                   numeric_key=numeric_key)
        if n_sql < n_shapes:
            rest = shapes.filter(~sql_ok)
            cover_parts = min(64, max(4, (n_shapes - n_sql) // 25 + 1))
            covers = covers.unionByName(
                cover_shapes(rest, length, base, n_partitions=cover_parts))
    else:
        cover_parts = min(64, max(4, n_shapes // 25 + 1))
        covers = cover_shapes(shapes, length, base, n_partitions=cover_parts)

    if gated:
        # only attach interval columns when the gate is live — an untimed
        # join skips the dt map join outright
        dt_map = shapes.select('shape_id', 'dt_start', 'dt_end')
        covers = covers.join(F.broadcast(dt_map) if use_broadcast else dt_map,
                             'shape_id')

    if numeric_key:
        from geostructures_spark.functions.geo import niemeyer_quantize_exprs
        s = 2 * prefix_drop
        qlon, qlat = niemeyer_quantize_exprs(F.col('lon'), F.col('lat'),
                                             length)
        points = points.withColumn(
            '_ck', F.shiftleft(F.shiftright(qlon, s), 32)
            .bitwiseOR(F.shiftright(qlat, s)))
        pkey = '_ck'
    elif prefix_drop:
        points = points.withColumn(
            '_ck', F.substring(F.col(cell_col), 1, length - prefix_drop))
        pkey = '_ck'
    else:
        pkey = cell_col

    if salt_shards > 0:
        # replicate the broadcast side per shard; salt the big side
        shards = spark.range(salt_shards).select(F.col('id').cast('int').alias('_shard'))
        covers = covers.crossJoin(F.broadcast(shards)).withColumn(
            'join_key', F.concat_ws('#', 'cell', F.col('_shard').cast('string')))
        points = points.withColumn(
            'join_key',
            F.concat_ws('#', F.col(pkey),
                        F.pmod(F.xxhash64(*[c for c in ('url', 'lon', 'lat')
                                            if c in points.columns]),
                               F.lit(salt_shards)).cast('string')))
        join_key = 'join_key'
    else:
        covers = covers.withColumnRenamed('cell', pkey)
        join_key = pkey

    dt_cols = ['dt_start', 'dt_end'] if gated else []
    param_cols = ['_clon', '_clat', '_r'] if carry_params else []
    covers_sel = covers.select(join_key, 'shape_id', *dt_cols, *param_cols)
    cand = points.join(F.broadcast(covers_sel) if use_broadcast else covers_sel,
                       join_key)

    if gated:
        no_dt = F.col('dt_start').isNull() | F.col('dt_end').isNull()
        gate = no_dt | interval_contains_instant_expr(
            F.col('dt_start'), F.col('dt_end'), F.col('warc_ts'))
        cand = cand.filter(gate)

    if all_plain_circles:
        # exact containment for a circle is haversine(point, center) <=
        # radius — the identical formula (and argument order) the NumPy
        # kernel evaluates (kernels/shapes.py:291-293), as a JVM Column
        # expression: no Arrow boundary, no Python workers, whole-stage
        # codegen through the candidate join. The (center, radius) triple
        # rides the cover rows when all covers are SQL-built (no second
        # join); otherwise it joins by shape_id (24 bytes/shape — never
        # driver-collected on the no-broadcast path).
        from geostructures_spark.functions.geo import haversine_expr
        if not carry_params:
            params = shapes.select(
                'shape_id',
                F.col('params').getField('center_lon').alias('_clon'),
                F.col('params').getField('center_lat').alias('_clat'),
                F.col('params').getField('radius').cast('double').alias('_r'))
            cand = cand.join(F.broadcast(params) if use_broadcast else params,
                             'shape_id')
        out = (cand.filter(haversine_expr(F.col('lon'), F.col('lat'),
                                          F.col('_clon'), F.col('_clat'))
                           <= F.col('_r'))
               .drop('_clon', '_clat', '_r'))
    elif use_broadcast:
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
    drop = dt_cols + (['join_key', '_shard'] if salt_shards else []) + \
        (['_ck'] if (prefix_drop or numeric_key) else [])
    return out.drop(*[c for c in drop if c in out.columns])


def filter_points_by_shape(points: DataFrame, shapes: DataFrame,
                           **kwargs) -> DataFrame:
    """filter_by_intersection with a point-set left side
    (collections.py:119-131): semi-join — points that fall in ANY shape."""
    joined = spatial_join_points(points, shapes, **kwargs)
    key_cols = [c for c in ('url', 'warc_ts', 'point_idx') if c in points.columns]
    return points.join(joined.select(*key_cols).distinct(), key_cols, 'left_semi')
