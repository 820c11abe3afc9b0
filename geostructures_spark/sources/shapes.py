"""Deterministic shapes + tracks generators (FIXTURES.md §3-4).

Seed-fixed synthetic inputs for the shape-side of spatial joins and for the
track analytics operators. Stateless per id (same hashing scheme as
sources/pages.py) so generation is partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geostructures_spark.sources.pages import HOT_CLUSTERS, _hash_stream, _uniform01

__all__ = ['shapes_df', 'tracks_df']

_KINDS = np.array(['circle', 'circle', 'box', 'polygon', 'ellipse', 'ring',
                   'linestring', 'circle'])


def _shape_batch(pdf: pd.DataFrame, seed: int) -> pd.DataFrame:
    ids = pdf['id'].to_numpy(np.int64)
    n = len(ids)
    kind = _KINDS[(_hash_stream(ids, seed + 21) % np.uint64(len(_KINDS))).astype(np.int64)]
    # centers: clustered on the hot cities (join skew by design) or uniform
    hot = _uniform01(ids, seed + 22) < 0.7
    ci = (_hash_stream(ids, seed + 23) % np.uint64(len(HOT_CLUSTERS))).astype(np.int64)
    lon = np.where(hot, HOT_CLUSTERS[ci, 0] + (_uniform01(ids, seed + 24) - 0.5),
                   _uniform01(ids, seed + 25) * 360 - 180)
    lat = np.where(hot, HOT_CLUSTERS[ci, 1] + (_uniform01(ids, seed + 26) - 0.5),
                   _uniform01(ids, seed + 27) * 160 - 80)
    radius = 100.0 + _uniform01(ids, seed + 28) * 49_900.0
    rot = _uniform01(ids, seed + 29) * 180.0
    has_dt = _uniform01(ids, seed + 30) < 0.6
    t0 = (np.datetime64('2020-01-01') +
          (_hash_stream(ids, seed + 31) % np.uint64(86400 * 30)).astype('timedelta64[s]'))
    t1 = t0 + (np.uint64(600) + _hash_stream(ids, seed + 32) % np.uint64(86400)).astype('timedelta64[s]')

    rows = []
    for i in range(n):
        k = kind[i]
        params = {p: None for p in
                  ('center_lon', 'center_lat', 'radius', 'semi_major',
                   'semi_minor', 'rotation', 'inner_radius', 'outer_radius',
                   'angle_min', 'angle_max', 'min_lon', 'min_lat',
                   'max_lon', 'max_lat')}
        rings = None
        lo, la, r = float(lon[i]), float(lat[i]), float(radius[i])
        half_deg = r / 111_000.0
        if k == 'circle':
            params.update(center_lon=lo, center_lat=la, radius=r)
        elif k == 'box':
            params.update(min_lon=lo - half_deg, min_lat=la - half_deg,
                          max_lon=lo + half_deg, max_lat=la + half_deg)
        elif k == 'ellipse':
            params.update(center_lon=lo, center_lat=la, semi_major=r,
                          semi_minor=max(r / 2, 100.0), rotation=float(rot[i]))
        elif k == 'ring':
            params.update(center_lon=lo, center_lat=la,
                          inner_radius=r / 2, outer_radius=r,
                          angle_min=0.0, angle_max=360.0 if i % 3 else 270.0)
        elif k == 'polygon':
            # a seeded pentagon around the center (CCW, self-closing)
            ang = np.linspace(0, 2 * np.pi, 6)[:-1]
            ring = [{'lon': lo + half_deg * float(np.cos(a)),
                     'lat': la + half_deg * float(np.sin(a))} for a in ang]
            rings = [ring + ring[:1]]
        elif k == 'linestring':
            pts = [{'lon': lo + half_deg * j * 0.5,
                    'lat': la + half_deg * (j % 2) * 0.3} for j in range(4)]
            rings = [pts]
        props = {'entity': f'e{int(ids[i]) % 7}'} if ids[i] % 2 == 0 else {}
        rows.append({
            'shape_id': int(ids[i]),
            'kind': k,
            'params': params,
            'rings': [[(c['lon'], c['lat']) for c in ring] for ring in rings] if rings else None,
            'dt_start': pd.Timestamp(t0[i]) if has_dt[i] else None,
            'dt_end': pd.Timestamp(t1[i]) if has_dt[i] else None,
            'properties': props,
        })
    return pd.DataFrame(rows)


def shapes_df(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    from geostructures_spark.operators.tiling import SHAPES_SCHEMA_DDL
    rng = spark.range(0, n_rows, 1, max(4, min(32, n_rows // 200 + 1)))

    def gen(it):
        for pdf in it:
            yield _shape_batch(pdf, seed)

    return rng.mapInPandas(gen, schema=SHAPES_SCHEMA_DDL)


def tracks_df(spark: SparkSession, n_entities: int = 50,
              pings_per_entity: int = 200, seed: int = 42) -> DataFrame:
    """Seeded random-walk pings with deliberate anomalies: ~5% teleports
    (for filter_impossible_journeys) and ~3% duplicated timestamps (for
    convolve_duplicate_timestamps). Stateless per (entity, ping) id."""
    n = n_entities * pings_per_entity
    rng = spark.range(0, n, 1, max(4, min(32, n // 2000 + 1)))

    def gen(it):
        for pdf in it:
            ids = pdf['id'].to_numpy(np.int64)
            ent = ids // pings_per_entity
            idx = ids % pings_per_entity
            # random walk: cumulative steps are a hash-sum — recompute the
            # prefix deterministically per ping via a smooth base path +
            # bounded jitter (stateless per id)
            base_lon = (ent.astype(np.float64) * 7.3) % 360 - 180
            base_lat = ((ent.astype(np.float64) * 3.7) % 140) - 70
            walk_lon = base_lon + idx * 0.002 + (_uniform01(ids, seed + 41) - 0.5) * 0.001
            walk_lat = base_lat + (_uniform01(ids, seed + 42) - 0.5) * 0.002
            teleport = _uniform01(ids, seed + 43) < 0.05
            walk_lon = np.where(teleport, walk_lon + 5.0, walk_lon)
            # timestamps: 60s cadence; ~3% duplicate the previous second
            step = np.where(_uniform01(ids, seed + 44) < 0.03, 0, 60)
            ts = (np.datetime64('2021-01-01') +
                  (idx * 60 + step * 0).astype('timedelta64[s]'))
            dup = _uniform01(ids, seed + 44) < 0.03
            ts = np.where(dup & (idx > 0),
                          (np.datetime64('2021-01-01') +
                           ((idx - 1) * 60).astype('timedelta64[s]')), ts)
            yield pd.DataFrame({
                'entity': [f'e{int(e)}' for e in ent],
                'ping_idx': idx.astype(np.int32),
                'lon': walk_lon,
                'lat': walk_lat,
                'dt_start': ts,
                'dt_end': ts,
            })

    return rng.mapInPandas(
        gen, schema=('entity string, ping_idx int, lon double, lat double, '
                     'dt_start timestamp, dt_end timestamp'))
