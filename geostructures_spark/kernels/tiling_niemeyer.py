"""Niemeyer shape-cover kernels (pure NumPy, no Spark).

Reimplements NiemeyerHasher's shape covering
(``/root/reference/geostructures/geohash.py:592-764``): BFS flood fill from
a seed cell, expanding through the 8-neighborhood and keeping cells whose
GeoBox intersects the shape.

At engine scale this runs per-shape inside ``applyInPandas`` — one shape's
cover is small and bounded, the distributed dimension is the number of
shapes (SURVEY.md §7.4). The output cell set feeds the engine's
explode -> groupBy(cell) tiling aggregation and the cell equi-join.
"""

from __future__ import annotations

from typing import Dict, Set

import numpy as np

from geostructures_spark.kernels import geometry as geom
from geostructures_spark.kernels import niemeyer as nie
from geostructures_spark.kernels import shapes as shp
from geostructures_spark.kernels.geodesy import normalize_lonlat

__all__ = ['cover_shape', 'hash_coordinates']


def _cell_box_shape(cell: str, base: int) -> Dict:
    min_lon, min_lat, max_lon, max_lat = nie.cell_to_box(cell, base)
    return shp.make_shape('box', {'min_lon': min_lon, 'min_lat': min_lat,
                                  'max_lon': max_lon, 'max_lat': max_lat})


def _boxes_intersect_shape(bounds: np.ndarray, shape: Dict,
                           shape_edges: np.ndarray,
                           first_pt: np.ndarray) -> np.ndarray:
    """Vectorized GeoBox.intersects_shape (structures.py:146-171) for a
    batch of boxes vs one shape: any box-edge/shape-edge intersection, OR
    the shape's first boundary point inside the box, OR the box's NW corner
    inside the shape. bounds is (B, 4) = min_lon, min_lat, max_lon, max_lat."""
    B = len(bounds)
    if B == 0:
        return np.zeros(0, dtype=bool)
    # box edges in bounding_coords order: NW->SW->SE->NE->NW (structures.py:728-740)
    min_lon, min_lat, max_lon, max_lat = bounds[:, 0], bounds[:, 1], bounds[:, 2], bounds[:, 3]
    nw = np.stack([min_lon, max_lat], 1)
    sw = np.stack([min_lon, min_lat], 1)
    se = np.stack([max_lon, min_lat], 1)
    ne = np.stack([max_lon, max_lat], 1)
    corners = np.stack([nw, sw, se, ne, nw], axis=1)       # (B, 5, 2)
    edges = np.concatenate([corners[:, :-1], corners[:, 1:]], axis=2)  # (B, 4, 4)
    hit_edges = geom.intersect_matrix(edges.reshape(B * 4, 4), shape_edges)
    out = hit_edges.reshape(B, 4, -1).any(axis=(1, 2))

    # boundary fallback 1: shape's first boundary point inside the box
    # (boxes have no holes -> plain range test, structures.py:752-763)
    px, py = first_pt[0], first_pt[1]
    out |= ((min_lon <= px) & (px <= max_lon) & (min_lat <= py) & (py <= max_lat))

    # boundary fallback 2: box NW corner inside the shape
    remaining = ~out
    if remaining.any():
        inside = shp.shape_contains_points(shape, nw[remaining, 0], nw[remaining, 1])
        idx = np.where(remaining)[0]
        out[idx[inside]] = True
    return out


def _bfs_cover(shape: Dict, seed_lon: float, seed_lat: float,
               length: int, base: int) -> Set[str]:
    """BFS flood fill (reference geohash.py:592-629 / 654-690): start from
    the seed's cell, expand via 8-neighbors, keep cells whose box intersects
    the shape. The seed cell is always kept, mirroring the reference.

    Batched: each BFS level tests the whole frontier's neighbor set in one
    vectorized intersects kernel; the shape's edges are discretized once."""
    start = nie.encode_scalar(seed_lon, seed_lat, length, base)
    shape_edges = shp.shape_edges(shape)
    # the shape's first boundary point = o_edges[0][0] (structures.py:167-171)
    if len(shape_edges):
        first_pt = shape_edges[0, :2]
    else:
        first_pt = np.array(shp.shape_centroid(shape))

    valid: Set[str] = {start}
    checked: Set[str] = set()
    frontier = [start]
    while frontier:
        # batched 8-neighborhood of the frontier
        cells = np.array(frontier)
        lon, lat, lon_e, lat_e = nie.decode(cells, base)
        offs = [(0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (2.0, -2.0),
                (0.0, -2.0), (-2.0, -2.0), (-2.0, 0.0), (-2.0, 2.0)]
        nb_lon = np.concatenate([lon + dx * lon_e for dx, _ in offs])
        nb_lat = np.concatenate([lat + dy * lat_e for _, dy in offs])
        nb_lon, nb_lat = normalize_lonlat(nb_lon, nb_lat)
        neighbors = nie.encode(nb_lon, nb_lat, length, base)

        new = []
        seen_batch = set()
        for c in neighbors:
            c = str(c)
            if c not in checked and c not in seen_batch:
                seen_batch.add(c)
                new.append(c)
        checked.update(new)
        if not new:
            break
        arr = np.array(new)
        blon, blat, blon_e, blat_e = nie.decode(arr, base)
        bounds = np.stack([blon - blon_e, blat - blat_e,
                           blon + blon_e, blat + blat_e], axis=1)
        hits = _boxes_intersect_shape(bounds, shape, shape_edges, first_pt)
        frontier = [new[i] for i in np.where(hits)[0]]
        valid.update(frontier)
    return valid


def cover_shape(shape: Dict, length: int, base: int) -> Set[str]:
    """NiemeyerHasher.hash_shape dispatch (reference geohash.py:746-764)."""
    kind = shape['kind']
    if kind in shp.MULTI_KINDS:
        out: Set[str] = set()
        for child in shape['children']:
            out |= cover_shape(child, length, base)
        return out
    if kind == 'point':
        p = shape['params']
        return {nie.encode_scalar(p['center_lon'], p['center_lat'], length, base)}
    if kind == 'linestring':
        v = np.asarray(shape['rings'][0], dtype=np.float64)
        return _bfs_cover(shape, float(v[0, 0]), float(v[0, 1]), length, base)
    # polygon-like: seed from the first bounding coordinate (geohash.py:667)
    outline = shp.shape_linear_rings(shape)[0]
    return _bfs_cover(shape, float(outline[0, 0]), float(outline[0, 1]), length, base)


def hash_coordinates(lons, lats, length: int, base: int) -> Dict[str, int]:
    """NiemeyerHasher.hash_coordinates (reference geohash.py:722-744) —
    {cell: count}. In the engine this is groupBy(cell).count(); this kernel
    exists for golden parity tests."""
    cells = nie.encode(np.asarray(lons, dtype=np.float64),
                       np.asarray(lats, dtype=np.float64), length, base)
    out: Dict[str, int] = {}
    for c in cells:
        out[str(c)] = out.get(str(c), 0) + 1
    return out
