"""Golden-parity tests for Niemeyer geohash + time-interval kernels.

Goldens copied from the reference's tests (tests/test_geohash.py:16-287,
tests/test_time.py), replayed through the vectorized kernels.
"""

from datetime import datetime, timezone

import numpy as np

from geostructures_spark.kernels import niemeyer as nie
from geostructures_spark.kernels import shapes as shp
from geostructures_spark.kernels import tiling_niemeyer as tn
from geostructures_spark.kernels import timeops as t


def us(*args):
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1_000_000)


def test_coord_to_niemeyer_golden():
    # tests/test_geohash.py:16-18
    assert nie.encode_scalar(0.1, -0.1, 8, 16) == '9555534d'


def test_subhashes_golden():
    # tests/test_geohash.py:24-30
    assert nie.subhashes('95555659', 16) == {
        '955556590', '955556591', '955556592', '955556593', '955556594', '955556595',
        '955556596', '955556597', '955556598', '955556599', '95555659a', '95555659b',
        '95555659c', '95555659d', '95555659e', '95555659f'
    }


def test_decode_golden():
    # tests/test_geohash.py:36-41: niemeyer_to_geobox('95555659', 16) box
    lon, lat, lon_e, lat_e = nie.decode_scalar('95555659', 16)
    assert lon - lon_e == 0.098876953125
    assert lon + lon_e == 0.1043701171875
    assert lat + lat_e == -0.0494384765625
    assert lat - lat_e == -0.05218505859375


def test_hash_coordinates_golden():
    # tests/test_geohash.py:251-261
    got = tn.hash_coordinates([0.0, 1.0, 0.0], [0.0, 1.0, 0.0], 8, 16)
    assert got == {'3fffffff': 2, 'c0019e78': 1}


def test_circle_cover_golden():
    # tests/test_geohash.py:264-272
    circle = shp.make_shape('circle', {'center_lon': 0.0, 'center_lat': 0.0,
                                       'radius': 700.0})
    got = tn.cover_shape(circle, 8, 16)
    assert got == {
        '3ffffffb', '3ffffffc', '3ffffffd', '3ffffffe', '3fffffff', '6aaaaaa8', '6aaaaaa9',
        '6aaaaaaa', '6aaaaaab', '6aaaaaae', '95555551', '95555554', '95555555', '95555556',
        '95555557', 'c0000000', 'c0000001', 'c0000002', 'c0000003', 'c0000004'
    }


def test_multi_and_point_and_linestring_cover_goldens():
    # tests/test_geohash.py:273-287
    multi = shp.make_shape('multipolygon', children=[
        shp.make_shape('circle', {'center_lon': 0.0001, 'center_lat': 0.0001, 'radius': 5.0}),
        shp.make_shape('circle', {'center_lon': 1.0001, 'center_lat': 1.0001, 'radius': 5.0}),
    ])
    assert tn.cover_shape(multi, 8, 16) == {'c0000000', 'c0019e78'}

    pt = shp.make_shape('point', {'center_lon': 0.0, 'center_lat': 0.0})
    assert tn.cover_shape(pt, 8, 16) == {'3fffffff'}

    mpt = shp.make_shape('multipoint', children=[
        shp.make_shape('point', {'center_lon': 0.0, 'center_lat': 0.0}),
        shp.make_shape('point', {'center_lon': 1.0, 'center_lat': 1.0}),
    ])
    assert tn.cover_shape(mpt, 8, 16) == {'3fffffff', 'c0019e78'}

    ls = shp.make_shape('linestring', rings=[np.array([[0.0, 0.0], [0.001, 0.001]])])
    assert tn.cover_shape(ls, 8, 16) == {'3fffffff', '6aaaaaaa', '95555555', 'c0000000'}

    mls = shp.make_shape('multilinestring', children=[
        shp.make_shape('linestring', rings=[np.array([[0.0, 0.0], [0.001, 0.001]])]),
        shp.make_shape('linestring', rings=[np.array([[0.1, 0.1], [0.1001, 0.1001]])]),
    ])
    assert tn.cover_shape(mls, 8, 16) == {
        '3fffffff', '6aaaaaaa', '95555555', 'c0000000', 'c0000618'}


def test_linestring_collection_cover_golden():
    # the linestring member of tests/test_geohash.py:185-249 (48-cell map):
    # verify the full collection cover reproduces the reference keyset
    circle = shp.make_shape('circle', {'center_lon': 0.0, 'center_lat': 0.0, 'radius': 700.0})
    point = shp.make_shape('point', {'center_lon': 0.0, 'center_lat': 0.0})
    ls = shp.make_shape('linestring', rings=[np.array([[0.0, 0.0], [0.02, 0.03], [0.04, 0.0]])])
    counts = {}
    for s in (circle, point, ls):
        for cell in tn.cover_shape(s, 8, 16):
            counts[cell] = counts.get(cell, 0) + 1
    expected = {
        'c0000000': 2, '6aaaaaa8': 1, '6aaaaaae': 1, 'c0000004': 2, '6aaaaaab': 1,
        '3fffffff': 3, 'c0000001': 2, '3ffffffe': 1, 'c0000003': 1, '95555556': 1,
        '95555554': 1, 'c0000002': 1, '3ffffffd': 1, '3ffffffc': 1, '95555551': 1,
        '6aaaaaaa': 2, '3ffffffb': 1, '6aaaaaa9': 1, '95555555': 2, '95555557': 1,
        'c0000033': 1, 'c000001c': 1, 'c000004b': 1, 'c0000013': 1, 'c0000016': 1,
        'c0000027': 1, 'c0000019': 1, 'c0000060': 1, 'c0000029': 1, 'c0000048': 1,
        'c0000006': 1, 'c0000012': 1, 'c0000032': 1, 'c0000061': 1, 'c0000007': 1,
        'c000002d': 1, '9555557f': 1, 'c000002c': 1, 'c0000005': 1, 'c000004a': 1,
        'c0000028': 1, 'c0000049': 1, 'c000002a': 1, 'c0000036': 1, 'c000004e': 1,
        'c0000035': 1, 'c0000034': 1, 'c000001d': 1
    }
    assert counts == expected


def test_surrounding_neighbors():
    nbrs = nie.surrounding('9555534d', 16)
    assert len(nbrs) == 8
    assert len(set(nbrs)) == 8
    assert '9555534d' not in nbrs


def test_interval_contains():
    # tests/test_time.py:35-44
    assert t.contains_instant(us(2020, 1, 1), us(2020, 1, 3), us(2020, 1, 2))
    assert t.contains_instant(us(2020, 1, 1), us(2020, 1, 3), us(2020, 1, 1))
    assert not t.contains_instant(us(2020, 1, 1), us(2020, 1, 3), us(2020, 1, 3))
    # interval in interval (closed containment)
    assert t.issubset(us(2020, 1, 1), us(2020, 1, 3), us(2020, 1, 1), us(2020, 1, 3))
    assert t.issubset(us(2020, 1, 2), us(2020, 1, 2, 12), us(2020, 1, 1), us(2020, 1, 3))
    assert not t.issubset(us(2020, 1, 1), us(2020, 1, 4), us(2020, 1, 1), us(2020, 1, 3))


def test_interval_isdisjoint():
    # right-open: touching intervals are disjoint
    assert t.isdisjoint(us(2020, 1, 2), us(2020, 1, 3), us(2020, 1, 3), us(2020, 1, 4))
    assert not t.isdisjoint(us(2020, 1, 2), us(2020, 1, 3), us(2020, 1, 2, 12), us(2020, 1, 4))
    # instants: disjoint unless equal
    assert t.isdisjoint(us(2020, 1, 1), us(2020, 1, 1), us(2020, 1, 2), us(2020, 1, 2))
    assert not t.isdisjoint(us(2020, 1, 1), us(2020, 1, 1), us(2020, 1, 1), us(2020, 1, 1))
    # instant at an interval's exclusive end bound is disjoint
    assert t.isdisjoint(us(2020, 1, 3), us(2020, 1, 3), us(2020, 1, 1), us(2020, 1, 3))
    # instant at the inclusive start is not
    assert not t.isdisjoint(us(2020, 1, 1), us(2020, 1, 1), us(2020, 1, 1), us(2020, 1, 3))


def test_elapsed_seconds():
    assert float(t.elapsed_seconds(us(2024, 1, 1), us(2024, 1, 1, 1))) == 3600.0


def test_enum_cover_equals_bfs_adversarial():
    """The vectorized enumeration cover must equal the BFS flood fill on
    the geometries where their domains differ most: near-pole and
    antimeridian-straddling analytic kinds (the corner-in-shape test
    reaches beyond the discretized vertices' bbox there) and sparse
    linestrings."""
    import numpy as np
    from geostructures_spark.kernels import shapes as shp
    from geostructures_spark.kernels.tiling_niemeyer import (
        _bfs_cover, _enum_cover)

    cases = [
        ('circle', {'center_lon': -179.999877, 'center_lat': -84.999679,
                    'radius': 500000.0}),
        ('circle', {'center_lon': 10.0, 'center_lat': 89.0, 'radius': 500000.0}),
        ('circle', {'center_lon': 0.0, 'center_lat': -89.9, 'radius': 300000.0}),
        ('ellipse', {'center_lon': 179.5, 'center_lat': 82.0,
                     'semi_major': 400000.0, 'semi_minor': 150000.0,
                     'rotation': 30.0}),
        ('ring', {'center_lon': -179.2, 'center_lat': -83.0,
                  'inner_radius': 50000.0, 'outer_radius': 350000.0,
                  'angle_min': 0.0, 'angle_max': 360.0}),
    ]
    for kind, params in cases:
        s = shp.make_shape(kind, params)
        o = shp.shape_linear_rings(s)[0]
        seed = (float(o[0, 0]), float(o[0, 1]))
        for length in (4, 5):
            assert _enum_cover(s, *seed, length, 16) == \
                _bfs_cover(s, *seed, length, 16), (kind, length)

    ls = shp.make_shape('linestring', rings=[np.array(
        [[-179.5, 85.0], [-175.0, 87.5], [-170.0, 84.0], [-160.0, 88.0]])])
    seed = (-179.5, 85.0)
    assert _enum_cover(ls, *seed, 4, 16) == _bfs_cover(ls, *seed, 4, 16)
