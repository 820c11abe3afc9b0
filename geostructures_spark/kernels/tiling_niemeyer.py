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

from geostructures_spark.kernels import niemeyer as nie
from geostructures_spark.kernels import shapes as shp

__all__ = ['cover_shape', 'hash_coordinates']


def _cell_box_shape(cell: str, base: int) -> Dict:
    min_lon, min_lat, max_lon, max_lat = nie.cell_to_box(cell, base)
    return shp.make_shape('box', {'min_lon': min_lon, 'min_lat': min_lat,
                                  'max_lon': max_lon, 'max_lat': max_lat})


def _bfs_cover(shape: Dict, seed_lon: float, seed_lat: float,
               length: int, base: int) -> Set[str]:
    """BFS flood fill (reference geohash.py:592-629 / 654-690): start from
    the seed's cell, expand via 8-neighbors, keep cells whose box intersects
    the shape. The seed cell is always kept, mirroring the reference."""
    start = nie.encode_scalar(seed_lon, seed_lat, length, base)
    valid: Set[str] = {start}
    checked: Set[str] = set()
    queue: Set[str] = {start}
    while queue:
        gh = queue.pop()
        for near in nie.surrounding(gh, base):
            if near in checked:
                continue
            checked.add(near)
            if shp.shapes_intersect(_cell_box_shape(near, base), shape):
                valid.add(near)
                queue.add(near)
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
