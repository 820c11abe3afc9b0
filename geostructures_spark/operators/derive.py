"""Per-shape derived columns: the reference's "SELECT surface"
(SURVEY.md §2.4) over the canonical shapes table.

``with_shape_derived`` adds, per shape row:
  bounds (min_lon, min_lat, max_lon, max_lat)   structures.py bounds impls
  centroid_lon / centroid_lat                   per-kind centroid rules
  area_m2                                       exact WGS84 ellipsoidal area
                                                (kernels/karney.py quadrature;
                                                matches pyproj's
                                                geometry_area_perimeter |abs|,
                                                structures.py:69-76 — holes
                                                subtract, multipolygons sum)
  circum_radius_m / circum_lon / circum_lat     circumscribing circle
                                                (Welzl for polygons,
                                                _geometry.py:147-182; per-kind
                                                shortcuts elsewhere)
  volume_m2s                                    area * interval seconds
                                                (_base.py:697-712)

Runs as one Arrow-batched mapInPandas over the shape rows (shape catalogs
are small relative to the points side; this is a dimension-table transform).
Also exposes unit conversions (reference conversion.py:7-70) as plain
constants/Column helpers.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['with_shape_derived', 'METERS_PER', 'convert_to_meters',
           'buffer_dt', 'set_dt', 'strip_dt', 'track_extremes',
           'covariance_from_ellipse_exprs', 'ellipse_from_covariance_exprs',
           'with_ellipse_covariance', 'with_ellipse_from_covariance',
           'split_by_length', 'with_bounding_coords', 'split_multishapes',
           'set_property']

# unit conversions (reference conversion.py:7-70)
METERS_PER = {
    'km': 1000.0, 'mi': 1609.344, 'ft': 0.3048, 'nmi': 1852.0,
    'yd': 0.9144, 'm': 1.0,
}


def convert_to_meters(col, unit: str):
    return col * F.lit(METERS_PER[unit])


def with_shape_derived(shapes: DataFrame) -> DataFrame:
    from geostructures_spark.kernels import geometry as geom
    from geostructures_spark.kernels import shapes as shp
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    from geostructures_spark.operators.tiling import shape_row_to_kernel

    has_rings = 'rings' in shapes.columns
    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in shapes.schema.fields) +
                  ', min_lon double, min_lat double, max_lon double, max_lat double'
                  ', centroid_lon double, centroid_lat double, area_m2 double'
                  ', circum_lon double, circum_lat double, circum_radius_m double'
                  ', volume_m2s double')

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geostructures_spark.kernels.karney import ellipsoidal_area_batch
        for pdf in batches:
            rows = pdf.to_dict('records')
            if has_rings:
                for row in rows:
                    row['rings'] = decode_rings_json(row.get('rings'))
            cols = {k: [] for k in ('min_lon', 'min_lat', 'max_lon', 'max_lat',
                                    'centroid_lon', 'centroid_lat', 'area_m2',
                                    'circum_lon', 'circum_lat', 'circum_radius_m',
                                    'volume_m2s')}
            # Exact area needs an inverse-geodesic solve per edge; flatten all
            # rings of all shapes in the batch into ONE vectorized call.
            shapes_k = [shape_row_to_kernel(row) for row in rows]
            # One [outline, *holes] group per simple polygon (multishape
            # children sum); all groups of the batch solve in one call.
            groups, owner = [], []
            for i, shape in enumerate(shapes_k):
                for g in shp.shape_area_ring_groups(shape):
                    groups.append(g)
                    owner.append(i)
            areas = np.zeros(len(shapes_k), dtype=np.float64)
            if groups:
                np.add.at(areas, np.asarray(owner, dtype=np.int64),
                          ellipsoidal_area_batch(groups))
            for row, shape, area in zip(rows, shapes_k, areas):
                b = shp.shape_bounds(shape)
                c = shp.shape_centroid(shape)
                # circumscribing circle
                kind = shape['kind']
                p = shape['params']
                if kind == 'circle':
                    cc = (p['center_lon'], p['center_lat'], p['radius'])
                elif kind == 'ellipse':
                    cc = (p['center_lon'], p['center_lat'], p['semi_major'])
                elif kind == 'ring':
                    cc = (p['center_lon'], p['center_lat'], p['outer_radius'])
                elif kind == 'point':
                    cc = (c[0], c[1], 0.0)
                else:
                    outline = shp.shape_linear_rings(shape)[0]
                    (ctr, rad) = geom.min_enclosing_circle(outline[:-1])
                    cc = (float(ctr[0]), float(ctr[1]), float(rad))
                # volume = area * elapsed seconds (_base.py:697-712)
                t0, t1 = row.get('dt_start'), row.get('dt_end')
                vol = 0.0
                if t0 is not None and t1 is not None and not pd.isna(t0) and not pd.isna(t1):
                    vol = area * (pd.Timestamp(t1) - pd.Timestamp(t0)).total_seconds()
                for k, v in zip(cols, (*b, *c, area, *cc, vol)):
                    cols[k].append(float(v))
            out = pdf.copy()
            if has_rings:
                out['rings'] = [row['rings'] for row in rows]
            for k, v in cols.items():
                out[k] = v
            yield out

    inp = encode_rings_json(shapes) if has_rings else shapes
    return inp.mapInPandas(run, schema=out_schema)


def with_bounding_coords(shapes: DataFrame, k: int = None) -> DataFrame:
    """Materialize the discretized geometry: fills the ``rings`` column for
    parametric shapes (circle/ellipse/ring/box) from their params using the
    reference's bounding_coords/linear_rings rules and k-defaults
    (structures.py:728-740, 873-882, 1023-1038, 1265-1297, 1346-1361).
    Rows that already carry rings pass through unchanged."""
    from geostructures_spark.kernels.shapes import shape_linear_rings
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)
    from geostructures_spark.operators.tiling import shape_row_to_kernel

    out_schema = ', '.join(f'{f.name} {f.dataType.simpleString()}'
                           for f in shapes.schema.fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = pdf.to_dict('records')
            out_rings = []
            for row in rows:
                rings = decode_rings_json(row.get('rings'))
                if rings:
                    out_rings.append(rings)
                    continue
                row['rings'] = None
                shape = shape_row_to_kernel(row)
                rr = shape_linear_rings(shape, k)
                out_rings.append([[{'lon': float(x), 'lat': float(y)}
                                   for x, y in ring] for ring in rr])
            pdf = pdf.copy()
            pdf['rings'] = out_rings
            yield pdf

    return encode_rings_json(shapes).mapInPandas(run, schema=out_schema)


# --- ellipse <-> 2x2 covariance (reference structures.py:1066-1147) --------

def covariance_from_ellipse_exprs(semi_major, semi_minor, rotation,
                                  to_trigonometric_rotation: bool = True):
    """GeoEllipse.covariance_matrix as pure column expressions (JVM-side,
    SQL-oracle-checkable). Returns (varx1, cov, varx2) Columns for the
    symmetric 2x2 [[varx1, cov], [cov, varx2]].

    Mirrors structures.py:1066-1093: rotation converted bearing->trig
    ((90 - r) % 360, _geometry.py:485-501) unless disabled."""
    rot = (F.pmod(F.lit(90.0) - rotation, F.lit(360.0))
           if to_trigonometric_rotation else rotation)
    rot = F.radians(rot)
    cos_phi, sin_phi = F.cos(rot), F.sin(rot)
    a2, b2 = semi_major * semi_major, semi_minor * semi_minor
    varx1 = a2 * cos_phi * cos_phi + b2 * sin_phi * sin_phi
    varx2 = a2 * sin_phi * sin_phi + b2 * cos_phi * cos_phi
    cov = (a2 - b2) * sin_phi * cos_phi
    return varx1, cov, varx2


def ellipse_from_covariance_exprs(varx1, cov, varx2,
                                  from_trigonometric_rotation: bool = True):
    """GeoEllipse.from_covariance_matrix as column expressions. Closed-form
    symmetric-2x2 eigenvalues ((a+c)/2 +- sqrt(((a-c)/2)^2 + b^2)) replace
    the reference's np.linalg.eigvalsh (structures.py:1126-1129) — equal to
    machine precision, and SQL-expressible. Returns
    (semi_major, semi_minor, rotation_deg) Columns."""
    a, b, c = varx1, cov, varx2
    mean = (a + c) / 2
    d = F.sqrt(((a - c) / 2) * ((a - c) / 2) + b * b)
    l1, l2 = mean + d, mean - d
    rot_trig = (F.when(b == 0, F.when(a >= c, F.lit(0.0)).otherwise(F.lit(90.0)))
                .otherwise(F.degrees(F.atan2(l1 - a, b))))
    rotation = (F.pmod(F.lit(90.0) - rot_trig, F.lit(360.0))
                if from_trigonometric_rotation else rot_trig)
    return F.sqrt(l1), F.sqrt(l2), rotation


def with_ellipse_covariance(shapes: DataFrame,
                            to_trigonometric_rotation: bool = True) -> DataFrame:
    """Adds cov_xx / cov_xy / cov_yy per ellipse row of a canonical shapes
    table (NULL for other kinds)."""
    p = F.col('params')
    varx1, cov, varx2 = covariance_from_ellipse_exprs(
        p.getField('semi_major'), p.getField('semi_minor'),
        F.coalesce(p.getField('rotation'), F.lit(0.0)),
        to_trigonometric_rotation)
    is_ellipse = F.col('kind') == 'ellipse'
    return (shapes
            .withColumn('cov_xx', F.when(is_ellipse, varx1))
            .withColumn('cov_xy', F.when(is_ellipse, cov))
            .withColumn('cov_yy', F.when(is_ellipse, varx2)))


def with_ellipse_from_covariance(df: DataFrame,
                                 xx_col: str = 'cov_xx', xy_col: str = 'cov_xy',
                                 yy_col: str = 'cov_yy',
                                 from_trigonometric_rotation: bool = True) -> DataFrame:
    """Batch ellipse fitting: covariance columns -> semi_major / semi_minor /
    rotation columns (from_covariance_matrix over a DataFrame)."""
    maj, mino, rot = ellipse_from_covariance_exprs(
        F.col(xx_col), F.col(xy_col), F.col(yy_col), from_trigonometric_rotation)
    return (df.withColumn('semi_major', maj)
            .withColumn('semi_minor', mino)
            .withColumn('rotation', rot))


def split_by_length(shapes: DataFrame, meters: float,
                    rings_col: str = 'rings') -> DataFrame:
    """GeoLineString.split_by_length (reference structures.py:1657-1726) over
    a canonical shapes table: every linestring row explodes into one row per
    chunk (chunk_idx, chunk vertices in ``rings``); all other columns are
    replicated (the reference copies dt/properties onto every chunk).
    Non-linestring rows pass through with chunk_idx 0.

    Arrow-batched mapInPandas; each linestring is walked independently
    (per-row sequential cut loop — the parallelism axis is rows)."""
    if meters <= 0:
        raise ValueError('Split length must be greater than 0.')
    from geostructures_spark.kernels.shapes import split_linestring_by_length
    from geostructures_spark.operators.ringio import (
        decode_rings_json, encode_rings_json)

    out_schema = (', '.join(f'{f.name} {f.dataType.simpleString()}'
                            for f in shapes.schema.fields) + ', chunk_idx int')
    kind_idx = shapes.columns.index('kind')
    rings_idx = shapes.columns.index(rings_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.itertuples(index=False):
                rings = decode_rings_json(row[rings_idx])
                if row[kind_idx] != 'linestring' or rings is None:
                    r = list(row)
                    r[rings_idx] = rings
                    out_rows.append((*r, 0))
                    continue
                verts = [(c['lon'], c['lat']) for c in rings[0]]
                chunks = split_linestring_by_length(np.asarray(verts), meters)
                for ci, chunk in enumerate(chunks):
                    new_rings = [[{'lon': float(x), 'lat': float(y)}
                                  for x, y in chunk]]
                    r = list(row)
                    r[rings_idx] = new_rings
                    out_rows.append((*r, ci))
            yield pd.DataFrame(out_rows, columns=[*pdf.columns, 'chunk_idx'])

    return encode_rings_json(shapes, rings_col).mapInPandas(run, schema=out_schema)


def split_multishapes(shapes: DataFrame) -> DataFrame:
    """MultiShapeBase.split (reference _base.py:940-946): every multishape
    row explodes into one row per child shape — multipolygon children keep
    their [outline, *holes] ring group via ``poly_sizes`` slicing — with
    dt/properties replicated onto each child (the reference copies both).
    Non-multi rows pass through with child_idx 0.

    Entirely JVM-side: per-child ring slices come from a higher-order
    transform over poly_sizes (prefix sums of a per-row list are O(k^2) in
    the child count k, which is tiny), then one posexplode. No Python, so
    the explode participates in whole-stage codegen at any scale."""
    sizes = F.coalesce(
        F.col('poly_sizes'),
        F.when(F.col('kind').startswith('multi'),
               F.transform(F.col('rings'), lambda r: F.lit(1))))
    # child i covers rings [offset_i, offset_i + sizes[i])
    groups = F.transform(
        F.sequence(F.lit(1), F.size(sizes)),
        lambda i: F.slice(
            F.col('rings'),
            F.aggregate(F.slice(sizes, F.lit(1), i - 1), F.lit(0),
                        lambda a, x: a + x) + 1,
            F.element_at(sizes, i)))
    child_kind = F.expr("substring(kind, 6)")  # multipolygon -> polygon
    is_multi = F.col('kind').startswith('multi') & F.col('rings').isNotNull()
    exploded = (shapes
                .withColumn('_groups', F.when(is_multi, groups)
                            .otherwise(F.array(F.col('rings'))))
                .select('*', F.posexplode('_groups').alias('child_idx', '_child'))
                .drop('_groups', 'rings', 'poly_sizes')
                .withColumnRenamed('_child', 'rings')
                .withColumn('kind', F.when(F.col('child_idx').isNotNull() & is_multi,
                                           child_kind).otherwise(F.col('kind'))))
    return exploded.withColumn(
        'poly_sizes', F.lit(None).cast('array<int>'))


def set_property(shapes: DataFrame, key: str, value) -> DataFrame:
    """BaseShape.set_property (reference _base.py:436-461) over the
    properties map column."""
    return shapes.withColumn(
        'properties',
        F.map_concat(
            F.map_filter(F.coalesce(F.col('properties'),
                                    F.create_map().cast('map<string,string>')),
                         lambda k, v: k != F.lit(key)),
            F.create_map(F.lit(key), F.lit(str(value)))))


# --- dt mutation helpers (reference _base.py:403-461) -----------------------

def buffer_dt(shapes: DataFrame, before_sec: int, after_sec: int) -> DataFrame:
    """Expand every shape's interval (buffer_dt)."""
    return (shapes
            .withColumn('dt_start', F.col('dt_start') - F.expr(f'INTERVAL {before_sec} SECOND'))
            .withColumn('dt_end', F.col('dt_end') + F.expr(f'INTERVAL {after_sec} SECOND')))


def set_dt(shapes: DataFrame, start, end) -> DataFrame:
    return (shapes.withColumn('dt_start', F.lit(start).cast('timestamp'))
            .withColumn('dt_end', F.lit(end).cast('timestamp')))


def strip_dt(shapes: DataFrame) -> DataFrame:
    return (shapes.withColumn('dt_start', F.lit(None).cast('timestamp'))
            .withColumn('dt_end', F.lit(None).cast('timestamp')))


def track_extremes(tracks: DataFrame, entity_col: str = 'entity',
                   time_col: str = 'dt_start') -> DataFrame:
    """Track.first/last/start/end (collections.py:807-857) as min_by/max_by."""
    return tracks.groupBy(entity_col).agg(
        F.min(time_col).alias('start'),
        F.max(time_col).alias('end'),
        F.min_by('lon', time_col).alias('first_lon'),
        F.min_by('lat', time_col).alias('first_lat'),
        F.max_by('lon', time_col).alias('last_lon'),
        F.max_by('lat', time_col).alias('last_lat'),
        F.count('*').alias('n_pings'))
