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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geostructures_spark.functions.geo import haversine_expr

__all__ = ['knn_join_exact', 'knn_join', 'knn_join_auto', 'suggest_ring']

_M_PER_DEG = 111194.92664455873  # pi * 6371000 / 180, matches haversine R


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
        if len(lon) == 0:
            return pd.Series([], dtype=object)
        # one vectorized batch encode for the whole (2r+1)^2 block of
        # every query (kernels/niemeyer.py:ring_neighbors) — replaces the
        # per-query scalar BFS over surrounding()
        block = nie.ring_neighbors(lon.to_numpy(np.float64),
                                   lat.to_numpy(np.float64),
                                   length, base, ring)
        block = np.sort(block, axis=1)
        out = []
        for row in block:
            keep = np.ones(len(row), dtype=bool)
            keep[1:] = row[1:] != row[:-1]
            out.append([str(c) for c in row[keep]])
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


def suggest_ring(points: DataFrame, k: int,
                 length: int = 6, base: int = 16,
                 cell_col: str = 'cell') -> int:
    """Sizing rule for ``knn_join``'s ring from a density sample.

    One aggregate over the (cell-assigned) points: rho = points per
    OCCUPIED cell. A ring of h hops sees up to (2h+1)^2 cells, so the
    expected candidate count is (2h+1)^2 * rho; solving
    (2h+1)^2 * rho >= 2k (safety factor 2 for non-uniform density) gives
    h = ceil((sqrt(2k/rho) - 1) / 2), floored at 1. This is an
    expectation, not a guarantee — ``knn_join_auto`` adds the per-query
    completeness certificate and expand/exact fallback on top."""
    import math

    from geostructures_spark.operators.tiling import with_cell

    if cell_col not in points.columns:
        points = with_cell(points, length, base, cell_col=cell_col)
    row = points.agg(F.count('*').alias('n'),
                     F.countDistinct(cell_col).alias('c')).collect()[0]
    if not row['n'] or not row['c']:
        return 1
    rho = row['n'] / row['c']
    return max(1, math.ceil((math.sqrt(2.0 * k / rho) - 1.0) / 2.0))


def knn_join_auto(points: DataFrame, queries: DataFrame, k: int,
                  length: int = 6, base: int = 16,
                  point_key: str = 'url', cell_col: str = 'cell',
                  init_ring: int | None = None,
                  max_ring: int = 8) -> DataFrame:
    """Cell-pruned kNN with a per-query completeness certificate and
    expand-until-complete fallback (r2-verdict task 6: ``knn_join``'s
    ring was parameter-trusted — wrong sizing silently truncated top-k).

    Round structure: run ``knn_join`` at the current ring, then CERTIFY
    each query from its own results — the ring provably covers every
    point within ring*cell_extent degrees of the query point (the ring
    cells enclose that box by construction), so a query whose k-th
    neighbor distance converts to lat/lon spans inside that reach cannot
    have a closer uncovered neighbor. Certified queries are done;
    uncertified ones re-run with ring*2, and whatever survives
    ``max_ring`` (pathologically sparse regions, polar cos-collapse)
    falls back to ``knn_join_exact``. Every round is a distributed job
    over only the still-uncertified queries; the driver handles counts,
    never rows. Initial ring comes from ``suggest_ring``'s density
    sample unless given."""
    from geostructures_spark.kernels import niemeyer as nie
    from geostructures_spark.operators.tiling import with_cell

    if cell_col not in points.columns:
        points = with_cell(points, length, base, cell_col=cell_col)
    # cell extents in degrees are uniform per (length, base): binary
    # subdivision of the whole lon/lat domain
    _, _, lon_e, lat_e = nie.decode_scalar('0' * length, base)
    cell_w, cell_h = 2.0 * lon_e, 2.0 * lat_e

    ring = init_ring if init_ring is not None else suggest_ring(
        points, k, length, base, cell_col)
    remaining = queries.select('query_id', 'q_lon', 'q_lat')
    parts = []
    while ring <= max_ring:
        topk = knn_join(points, remaining, k, length, base, ring,
                        point_key, cell_col).localCheckpoint(eager=True)
        perq = topk.groupBy('query_id').agg(
            F.max('dist_m').alias('d_k'), F.count('*').alias('n_got'))
        # conservative reach test: lat span at d_k, lon span at the
        # worst-case latitude the disc can reach (cos shrinks there)
        reach_lat = F.col('d_k') / F.lit(_M_PER_DEG)
        worst_lat = F.least(F.lit(89.9),
                            F.abs(F.col('q_lat')) + reach_lat)
        reach_lon = (F.col('d_k') /
                     (F.lit(_M_PER_DEG) * F.cos(F.radians(worst_lat))))
        cert = (perq.join(remaining.select('query_id', 'q_lat'), 'query_id')
                .withColumn('ok', (F.col('n_got') >= k) &
                            (reach_lat <= F.lit(ring * cell_h)) &
                            (reach_lon <= F.lit(ring * cell_w)) &
                            # pole-crossing discs void the box argument
                            (F.abs(F.col('q_lat')) + reach_lat
                             < F.lit(89.9))))
        ok_ids = cert.filter('ok').select('query_id')
        parts.append(topk.join(ok_ids, 'query_id'))
        remaining = (remaining.join(ok_ids, 'query_id', 'left_anti')
                     .localCheckpoint(eager=True))
        if remaining.isEmpty():
            remaining = None
            break
        ring *= 2
    if remaining is not None and not remaining.isEmpty():
        parts.append(knn_join_exact(points, remaining, k, point_key))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
