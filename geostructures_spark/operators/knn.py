"""kNN between point sets (driver-mandated operator, BASELINE.json).

Semantics derive from the reference's ``distance_meters`` + min
(SURVEY.md §2.6): for each query point, the k nearest data points by
haversine distance.

Two physical strategies:

- ``knn_join``: cell candidate generation — queries expand their Niemeyer
  cell by ``ring`` neighbor hops (geohash.py:565-590 neighbors), equi-join
  on cell, JVM-side haversine, per-query top-k window. Scales: the big
  points side shuffles once on cell; queries are broadcast. The ring must
  cover the k-th neighbor distance; pick ``ring`` from data density or use
  ``knn_join_exact`` for the correctness oracle.
- ``knn_join_exact``: broadcast cross join + top-k window — exact for any k,
  right when |queries| is small (the oracle-checkable baseline).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geostructures_spark.functions.geo import haversine_expr

__all__ = ['knn_join_exact', 'knn_join']


def _topk(cand: DataFrame, k: int, query_id: str = 'query_id') -> DataFrame:
    w = Window.partitionBy(query_id).orderBy(F.col('dist_m').asc(), F.col('neighbor_key').asc())
    return (cand.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))


def knn_join_exact(points: DataFrame, queries: DataFrame, k: int,
                   point_key: str = 'url') -> DataFrame:
    """Brute-force kNN: broadcast(queries) x points -> top-k per query.

    Output: query_id, neighbor_key, dist_m, rank. Deterministic tie-break on
    neighbor_key. queries needs (query_id, q_lon, q_lat)."""
    cand = (points
            .withColumnRenamed(point_key, 'neighbor_key')
            .crossJoin(F.broadcast(queries.select('query_id', 'q_lon', 'q_lat')))
            .withColumn('dist_m', haversine_expr(
                F.col('q_lon'), F.col('q_lat'), F.col('lon'), F.col('lat')))
            .select('query_id', 'neighbor_key', 'dist_m', 'lon', 'lat'))
    return _topk(cand, k)


def knn_join(points: DataFrame, queries: DataFrame, k: int,
             length: int = 6, base: int = 16, ring: int = 1,
             point_key: str = 'url', cell_col: str = 'cell') -> DataFrame:
    """Cell-pruned kNN: queries cover their cell + ``ring`` neighbor hops;
    candidates come from the cell equi-join; exact distances + top-k.

    The scale path: points shuffle/bucket once on ``cell`` and are reused
    across many kNN queries. Completeness holds when the true k-th neighbor
    lies within ``ring`` cells of the query cell — callers size (length,
    ring) to the data density, or verify counts vs knn_join_exact at sample
    scale.
    """
    from geostructures_spark.kernels import niemeyer as nie

    from geostructures_spark.operators.tiling import with_cell

    if cell_col not in points.columns:
        points = with_cell(points, length, base, cell_col=cell_col)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _expand(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = []
        for lo, la in zip(lon, lat):
            center = nie.encode_scalar(float(lo), float(la), length, base)
            cells = {center}
            frontier = {center}
            for _ in range(ring):
                nxt = set()
                for c in frontier:
                    nxt.update(nie.surrounding(c, base))
                nxt -= cells
                cells |= nxt
                frontier = nxt
            out.append(sorted(cells))
        return pd.Series(out)

    q_cells = (queries
               .withColumn(cell_col, F.explode(_expand(F.col('q_lon'), F.col('q_lat'))))
               .select('query_id', 'q_lon', 'q_lat', cell_col))

    cand = (points
            .withColumnRenamed(point_key, 'neighbor_key')
            .join(F.broadcast(q_cells), cell_col)
            .withColumn('dist_m', haversine_expr(
                F.col('q_lon'), F.col('q_lat'), F.col('lon'), F.col('lat')))
            .select('query_id', 'neighbor_key', 'dist_m', 'lon', 'lat'))
    return _topk(cand, k)
