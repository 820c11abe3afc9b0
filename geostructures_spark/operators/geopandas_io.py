"""GeoPandas interop (reference collections.py:236-311 from_geopandas,
collections.py:481-513 to_geopandas).

The reference round-trips collections through a GeoDataFrame whose payload
is exactly (WKT geometry, one column per property). geopandas/shapely are
not installable in this sandbox (SURVEY.md §7.1), so the bridge is built in
two layers:

- the *core* conversions operate on plain pandas DataFrames carrying a WKT
  ``geometry`` column — the same payload, no optional dependency;
- ``to_geopandas`` / ``from_geopandas`` upgrade that payload to/from an
  actual GeoDataFrame behind an import-try, raising a clear ImportError
  where the reference would too (utils/conditional_imports.py:24-45).
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostructures_spark.operators.interchange import parse_wkt_df, to_wkt_df

__all__ = ['to_pandas_features', 'from_pandas_features',
           'to_geopandas', 'from_geopandas']


def to_pandas_features(shapes: DataFrame,
                       property_keys: Optional[List[str]] = None) -> pd.DataFrame:
    """Shapes DataFrame -> pandas DataFrame with a WKT ``geometry`` column
    and one column per property key (reference to_geopandas semantics:
    properties become columns, collections.py:481-513).

    ``property_keys`` limits/orders the property columns; by default the
    distinct keys of the ``properties`` map are discovered with one
    aggregation (key sets are small catalog metadata)."""
    wkt = to_wkt_df(shapes, out_col='geometry')
    cols = [F.col('geometry')]
    if 'properties' in shapes.columns:
        if property_keys is None:
            row = (wkt.select(F.explode(F.map_keys('properties')).alias('k'))
                   .agg(F.sort_array(F.collect_set('k')).alias('ks')).collect())
            property_keys = list(row[0]['ks']) if row else []
        cols += [F.col('properties').getItem(k).alias(k) for k in property_keys]
    keep = [c for c in ('shape_id', 'dt_start', 'dt_end') if c in shapes.columns]
    return wkt.select(*([F.col(c) for c in keep] + cols)).toPandas()


def from_pandas_features(spark: SparkSession, pdf: pd.DataFrame,
                         geometry_col: str = 'geometry') -> DataFrame:
    """pandas DataFrame with a WKT geometry column -> shapes DataFrame
    (kind/rings/poly_sizes + a ``properties`` map built from the remaining
    columns, reference from_geopandas collections.py:236-311).

    NaN/None property values are dropped per row, matching the reference's
    NaN-stripping of GeoDataFrame columns. The NaN test applies only to
    floating-point dtyped columns (like the reference's float-only
    stripping) — a genuine string property whose value is "NaN" is
    kept."""
    prop_cols = [c for c in pdf.columns if c != geometry_col]
    float_cols = {c for c in prop_cols
                  if pd.api.types.is_float_dtype(pdf[c])}
    sdf = spark.createDataFrame(pdf.rename(columns={geometry_col: 'wkt'}))
    parsed = parse_wkt_df(sdf, 'wkt')
    if prop_cols:
        entries = []
        for c in prop_cols:
            v = F.col(c).cast('string')
            not_nan = (~F.isnan(F.col(c)) if c in float_cols
                       else F.lit(True))
            v = F.when(F.col(c).isNotNull() & not_nan, v)
            entries += [F.lit(c), v]
        props = F.map_filter(F.create_map(*entries), lambda k, v: v.isNotNull())
        parsed = parsed.withColumn('properties', props).drop(*prop_cols)
    return parsed


def to_geopandas(shapes: DataFrame,
                 property_keys: Optional[List[str]] = None):
    """Shapes DataFrame -> geopandas.GeoDataFrame (requires geopandas +
    shapely at the call site, like the reference's optional import)."""
    pdf = to_pandas_features(shapes, property_keys)
    try:
        import geopandas as gpd
    except ImportError as e:  # mirror conditional_imports failure mode
        raise ImportError(
            'to_geopandas requires the geopandas package; use '
            'to_pandas_features for the dependency-free WKT payload') from e
    geom = gpd.GeoSeries.from_wkt(pdf['geometry'])
    return gpd.GeoDataFrame(pdf.drop(columns=['geometry']), geometry=geom)


def from_geopandas(spark: SparkSession, gdf) -> DataFrame:
    """geopandas.GeoDataFrame -> shapes DataFrame (requires geopandas)."""
    try:
        import geopandas as gpd  # noqa: F401
    except ImportError as e:
        raise ImportError(
            'from_geopandas requires the geopandas package; use '
            'from_pandas_features with a WKT geometry column instead') from e
    pdf = pd.DataFrame(gdf.drop(columns=[gdf.geometry.name]))
    pdf['geometry'] = gdf.geometry.to_wkt()
    return from_pandas_features(spark, pdf)
