"""Distributed convex hull (reference collections.py:72-92; monotone chain
_geometry.py:40-79).

Hull is merge-associative — hull(A ∪ B) = hull(hull(A) ∪ hull(B)) — so the
distributed form is hierarchical: local hulls per (key, salt) shard, then
the hull of the surviving vertices per key. No group ever loads all its
points into one task (the round-1 single-stage form OOMs on a hot key at
100x); stage-2 input is O(shards x hull_size), tiny regardless of group
row count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostructures_spark.kernels import geometry as geom

__all__ = ['convex_hull_by_key']


def _hull_pdf(pdf: pd.DataFrame, key_col: str, lon_col: str,
              lat_col: str) -> pd.DataFrame:
    ring = geom.convex_hull(pdf[[lon_col, lat_col]].to_numpy(np.float64))
    # emit open-ring vertices (drop the closing duplicate when present)
    verts = ring[:-1] if len(ring) > 1 and (ring[0] == ring[-1]).all() else ring
    return pd.DataFrame({key_col: pdf[key_col].iloc[0],
                         lon_col: verts[:, 0], lat_col: verts[:, 1]})


def convex_hull_by_key(points: DataFrame, key_col: str,
                       lon_col: str = 'lon', lat_col: str = 'lat',
                       shards: int = 32) -> DataFrame:
    """Per-key convex hull vertices (open ring), two-stage.

    Returns (key, lon, lat) rows — one per hull vertex."""
    salted = points.withColumn(
        '_shard', F.pmod(F.xxhash64(lon_col, lat_col), F.lit(shards)))

    schema1 = (f'{points.schema[key_col].dataType.simpleString()}')
    out_schema = f'{key_col} {schema1}, {lon_col} double, {lat_col} double'

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        return _hull_pdf(pdf, key_col, lon_col, lat_col)

    stage1 = (salted.select(key_col, lon_col, lat_col, '_shard')
              .groupBy(key_col, '_shard')
              .applyInPandas(local, schema=out_schema))

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        return _hull_pdf(pdf, key_col, lon_col, lat_col)

    return stage1.groupBy(key_col).applyInPandas(merge, schema=out_schema)
