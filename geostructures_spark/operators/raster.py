"""Raster-grid -> vector tile assignment (the north star's raster<->vector
surface).

Assigns slippy-map raster tiles (functions/geo.py XYZ scheme) to vector
shapes: a tile belongs to a shape iff its center point is inside the shape
— the standard rasterization rule, so per-shape tile sets partition the
grid exactly like a raster burn.

Scale shape: the per-shape tile-range fan-out is a JVM-side
sequence+explode over the shape's bounding box (no Python in the
row-multiplication), and containment for the parametric hot kinds
(circle, box) stays a pure column predicate; ring-bearing kinds
(polygon/ellipse/ring/multi*) filter through the same Arrow-batched exact
kernels the spatial join uses. A ``max_tiles_per_shape`` guard drops
shapes whose bbox would explode at the chosen zoom (callers pick zoom to
match shape size, exactly as with H3/Niemeyer cover resolutions).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['xyz_assign_tiles', 'zonal_stats']


def _tile_x_expr(lon, n):
    x = F.floor((lon + 180.0) / 360.0 * n)
    return F.least(F.greatest(x, F.lit(0)), F.lit(int(n) - 1)).cast('long')


def _tile_y_expr(lat, n):
    lat_r = F.radians(lat)
    y = F.floor((1.0 - F.log(F.tan(lat_r) + 1.0 / F.cos(lat_r)) / math.pi)
                / 2.0 * n)
    return F.least(F.greatest(y, F.lit(0)), F.lit(int(n) - 1)).cast('long')


def xyz_assign_tiles(shapes: DataFrame, zoom: int,
                     max_tiles_per_shape: int = 100_000) -> DataFrame:
    """shapes (canonical table WITH bounds columns min_lon/min_lat/
    max_lon/max_lat, e.g. from with_shape_derived) -> one row per
    (shape_id, tile_x, tile_y) whose tile center lies inside the shape.

    Center coordinates: lon = (x+0.5)/2^z*360-180,
    lat = atan(sinh(pi*(1-2*(y+0.5)/2^z))) — the inverse Web Mercator grid.
    """
    n = float(1 << zoom)
    x_min = _tile_x_expr(F.col('min_lon'), n)
    x_max = _tile_x_expr(F.col('max_lon'), n)
    y_min = _tile_y_expr(F.col('max_lat'), n)   # y grows southward
    y_max = _tile_y_expr(F.col('min_lat'), n)
    n_tiles = (x_max - x_min + 1) * (y_max - y_min + 1)
    guarded = shapes.filter(n_tiles <= F.lit(max_tiles_per_shape))

    # parametric fast path: JVM-side sequence+explode fan-out + pure
    # containment predicate, entirely inside codegen (built only for the
    # param fields the input schema actually carries)
    from geostructures_spark.functions.geo import (box_contains_expr,
                                                   haversine_expr)
    p = F.col('params')
    pfields = {f.name for f in shapes.schema['params'].dataType.fields}
    fast_kinds, fast_pred = [], F.lit(False)
    if {'center_lon', 'center_lat', 'radius'} <= pfields:
        fast_kinds.append('circle')
        fast_pred = fast_pred | (
            (F.col('kind') == 'circle') &
            (haversine_expr(F.col('tc_lon'), F.col('tc_lat'),
                            p.getField('center_lon'),
                            p.getField('center_lat')) <= p.getField('radius')))
    if {'min_lon', 'min_lat', 'max_lon', 'max_lat'} <= pfields:
        fast_kinds.append('box')
        fast_pred = fast_pred | (
            (F.col('kind') == 'box') &
            box_contains_expr(F.col('tc_lon'), F.col('tc_lat'),
                              p.getField('min_lon'), p.getField('min_lat'),
                              p.getField('max_lon'), p.getField('max_lat')))
    fast = (guarded.filter(F.col('kind').isin(*fast_kinds)
                           if fast_kinds else F.lit(False))
            .withColumn('tile_x', F.explode(F.sequence(x_min, x_max)))
            .withColumn('tile_y', F.explode(F.sequence(y_min, y_max)))
            .withColumn('tc_lon', (F.col('tile_x') + 0.5) / n * 360.0 - 180.0)
            .withColumn('tc_lat', F.degrees(F.atan(F.sinh(
                math.pi * (1.0 - 2.0 * (F.col('tile_y') + 0.5) / n)))))
            .filter(fast_pred))

    # ring-bearing kinds: per-SHAPE fan-out inside the Arrow batch (the
    # cover_shapes pattern) — the grid for one shape is generated and
    # PIP-filtered as one NumPy meshgrid, so rings are deserialized once
    # per shape, never replicated across exploded tile rows (which at high
    # zoom would ship a polygon's rings through the shuffle per tile).
    from geostructures_spark.kernels.shapes import shape_contains_points
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    from geostructures_spark.operators.tiling import shape_row_to_kernel

    slow_src = encode_rings_json(
        guarded.filter(~F.col('kind').isin(*fast_kinds) if fast_kinds
                       else F.lit(True)))
    n_int = 1 << zoom

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, txs, tys = [], [], []
            for row in pdf.to_dict('records'):
                row['rings'] = decode_rings_json(row.get('rings'))
                shape = shape_row_to_kernel(row)
                x0 = min(max(int((row['min_lon'] + 180.0) / 360.0 * n_int), 0), n_int - 1)
                x1 = min(max(int((row['max_lon'] + 180.0) / 360.0 * n_int), 0), n_int - 1)
                la0, la1 = np.radians(row['max_lat']), np.radians(row['min_lat'])
                y0 = min(max(int((1.0 - math.log(math.tan(la0) + 1.0 / math.cos(la0))
                                  / math.pi) / 2.0 * n_int), 0), n_int - 1)
                y1 = min(max(int((1.0 - math.log(math.tan(la1) + 1.0 / math.cos(la1))
                                  / math.pi) / 2.0 * n_int), 0), n_int - 1)
                xs = np.arange(x0, x1 + 1)
                ys = np.arange(y0, y1 + 1)
                gx, gy = np.meshgrid(xs, ys, indexing='ij')
                gx, gy = gx.ravel(), gy.ravel()
                tc_lon = (gx + 0.5) / n_int * 360.0 - 180.0
                tc_lat = np.degrees(np.arctan(np.sinh(
                    np.pi * (1.0 - 2.0 * (gy + 0.5) / n_int))))
                hit = shape_contains_points(shape, tc_lon, tc_lat)
                ids.extend([row['shape_id']] * int(hit.sum()))
                txs.extend(gx[hit].tolist())
                tys.extend(gy[hit].tolist())
            yield pd.DataFrame({'shape_id': ids, 'tile_x': txs, 'tile_y': tys})

    slow = slow_src.mapInPandas(
        run, schema='shape_id long, tile_x long, tile_y long')
    out_cols = ['shape_id', 'tile_x', 'tile_y']
    return fast.select(*out_cols).unionByName(slow)


def zonal_stats(shapes: DataFrame, raster: DataFrame, zoom: int,
                value_col: str = 'value',
                max_tiles_per_shape: int = 100_000) -> DataFrame:
    """Zonal statistics: aggregate a raster's cell values per shape.

    ``raster`` is a (tile_x, tile_y, value) table at the given zoom;
    ``shapes`` is the canonical table WITH bounds columns (see
    xyz_assign_tiles). A cell contributes to a shape iff its center is
    inside the shape (the same burn rule as the assignment, so
    assignment and statistics agree exactly).

    Scale shape: both sides of the cell join are keyed on
    (tile_x, tile_y) — the raster never fans out per shape and the
    shape never ships its geometry into the join (only its assigned
    tile ids); the aggregate is one map-side-combined groupBy(shape).
    Shapes whose tile sets are empty (ocean-only bounds, value gaps)
    still return a row with n_cells = 0.

    Returns (shape_id, n_cells, sum_value, mean_value, min_value,
    max_value).
    """
    tiles = xyz_assign_tiles(shapes, zoom, max_tiles_per_shape)
    joined = tiles.join(raster.select('tile_x', 'tile_y', value_col),
                        ['tile_x', 'tile_y'])
    agg = joined.groupBy('shape_id').agg(
        F.count('*').cast('long').alias('n_cells'),
        F.sum(value_col).alias('sum_value'),
        F.avg(value_col).alias('mean_value'),
        F.min(value_col).alias('min_value'),
        F.max(value_col).alias('max_value'))
    base = shapes.select(F.col('shape_id').cast('long').alias('shape_id'))
    return (base.join(agg, 'shape_id', 'left')
            .select('shape_id',
                    F.coalesce('n_cells', F.lit(0)).alias('n_cells'),
                    'sum_value', 'mean_value', 'min_value', 'max_value'))
