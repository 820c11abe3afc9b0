"""Golden-parity tests for geometry + shape kernels (PIP, intersections,
discretization). Goldens copied from the reference's own tests
(tests/structures/test_geopolygon.py:426-458,525-545, tests/test_geometry.py).
"""

import numpy as np

from geostructures_spark.kernels import geometry as geom
from geostructures_spark.kernels import shapes as shp


TRIANGLE = np.array([[0., 1.], [1., 1.], [0.5, 0.], [0., 1.]])


def test_pip_triangle():
    # test_geopolygon.py:426-441
    lons = np.array([0.5, 2.0, 0.75])
    lats = np.array([0.5, 2.0, 0.25])
    res = geom.points_in_polygon(lons, lats, TRIANGLE)
    assert list(res) == [True, False, False]


def test_pip_hole():
    shape = shp.make_shape(
        'polygon',
        rings=[TRIANGLE, shp.circle_ring(0.5, 0.5, 5000)[::-1]],
    )
    assert not shp.shape_contains_points(shape, [0.5], [0.5])[0]
    # without the hole it is contained
    shape2 = shp.make_shape('polygon', rings=[TRIANGLE])
    assert shp.shape_contains_points(shape2, [0.5], [0.5])[0]


def test_pip_vertex_ray_regression():
    # test_geopolygon.py:444-458: ray through the (5,0) vertex
    diamond = np.array([[0., -1.], [5., 0.], [0., 1.], [-5., 0.], [0., -1.]])
    shape = shp.make_shape('polygon', rings=[diamond])
    got = shp.shape_contains_points(
        shape, [0., -2., 6., -6., 5., 2.5], [0., 0., 0., 0., 0., 0.5])
    assert list(got) == [True, True, False, False, False, False]


def test_pip_horizontal_edge():
    # test_geopolygon.py:525-532: point on horizontal bottom edge not contained
    square = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.], [0., 0.]])
    shape = shp.make_shape('polygon', rings=[square])
    assert not shp.shape_contains_points(shape, [0.5], [0.0])[0]


def test_pip_antimeridian():
    # test_geopolygon.py:534-545
    outline = np.array([[179., 0.], [-179., 0.], [-179., 1.], [179., 1.], [179., 0.]])
    assert geom.point_in_polygon(179.5, 0.5, outline)
    assert geom.point_in_polygon(-179.5, 0.5, outline)
    assert not geom.point_in_polygon(178., 0.5, outline)


def test_find_line_intersection():
    # crossing segments
    got = geom.find_line_intersection(((0., 0.), (1., 1.)), ((0., 1.), (1., 0.)))
    assert got is not None
    (x, y), boundary = got
    assert (x, y) == (0.5, 0.5)
    assert not boundary
    # endpoint touch is a boundary intersection
    got = geom.find_line_intersection(((0., 0.), (1., 1.)), ((1., 1.), (2., 0.)))
    assert got is not None and got[1]
    # parallel lines never intersect
    assert geom.find_line_intersection(((0., 0.), (1., 0.)), ((0., 1.), (1., 1.))) is None
    # disjoint bboxes
    assert geom.find_line_intersection(((0., 0.), (1., 0.)), ((5., 5.), (6., 5.))) is None


def test_segments_intersect_any():
    a = np.array([[0., 0., 1., 1.]])
    b = np.array([[0., 1., 1., 0.]])
    assert geom.segments_intersect_any(a, b)
    c = np.array([[5., 5., 6., 6.]])
    assert not geom.segments_intersect_any(a, c)


def test_is_counter_clockwise():
    ccw = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.]])
    assert geom.is_counter_clockwise(ccw)
    assert not geom.is_counter_clockwise(ccw[::-1])


def test_convex_hull():
    pts = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.], [0.5, 0.5], [0.2, 0.8]])
    hull = geom.convex_hull(pts)
    # self-closing ring over the 4 square corners
    assert hull.shape == (5, 2)
    assert set(map(tuple, hull.tolist())) == {(0., 0.), (1., 0.), (1., 1.), (0., 1.)}
    assert tuple(hull[0]) == tuple(hull[-1])


def test_min_enclosing_circle():
    pts = np.array([[0., 0.], [2., 0.], [1., 1.], [1., 0.5]])
    (ctr, rad) = geom.min_enclosing_circle(pts)
    # every point within radius (+tolerance), radius minimal-ish
    from geostructures_spark.kernels.geodesy import haversine_distance
    d = haversine_distance(pts[:, 0], pts[:, 1], ctr[0], ctr[1])
    assert float(d.max()) <= rad + 1e-6
    # circle through (0,0),(2,0) has radius ~111km
    assert 110_000 < rad < 115_000


def test_circle_discretization_matches_reference_k():
    ring = shp.circle_ring(0., 0., 500.)
    assert ring.shape == (37, 2)  # 36 points + closure
    assert tuple(ring[0]) == tuple(ring[-1])
    # all points ~500m from center
    from geostructures_spark.kernels.geodesy import haversine_distance
    d = haversine_distance(ring[:, 0], ring[:, 1], 0., 0.)
    assert np.allclose(d, 500., atol=1e-6)
    assert geom.is_counter_clockwise(ring[:-1])


def test_ellipse_contains():
    e = shp.make_shape('ellipse', {'center_lon': 0., 'center_lat': 0.,
                                   'semi_major': 2000., 'semi_minor': 1000.,
                                   'rotation': 0.})
    # reference _radius_at_angle (structures.py:1003-1021): at rotation 0 the
    # semi-major axis points north (bearing 0 -> radius = semi_major), so an
    # eastward point at ~1889 m is outside (radius there = semi_minor = 1000)
    inside = shp.shape_contains_points(e, [0.0170, 0.0, 0.0], [0.0, 0.0170, 0.0])
    assert list(inside) == [False, True, True]


def test_ring_wedge_contains():
    r = shp.make_shape('ring', {'center_lon': 0., 'center_lat': 0.,
                                'inner_radius': 1000., 'outer_radius': 2000.,
                                'angle_min': 315., 'angle_max': 405.})
    # bearing 0 (north), distance 1500 -> inside the wedge
    assert shp.shape_contains_points(r, [0.], [0.0135])[0]
    # bearing 90, distance 1500 -> outside wedge angles
    assert not shp.shape_contains_points(r, [0.0135], [0.])[0]
    # annulus: too close
    assert not shp.shape_contains_points(r, [0.], [0.005])[0]


def test_box_contains_and_ring():
    b = shp.make_shape('box', {'min_lon': 0., 'min_lat': 0., 'max_lon': 1., 'max_lat': 1.})
    assert shp.shape_contains_points(b, [0.5, 1.5], [0.5, 0.5]).tolist() == [True, False]
    ring = shp.box_ring(0., 0., 1., 1.)
    assert ring.shape == (5, 2)
    assert tuple(ring[0]) == (0., 1.)  # starts at NW, parity with structures.py:728-740


def test_shape_vs_shape():
    big = shp.make_shape('circle', {'center_lon': 0., 'center_lat': 0., 'radius': 5000.})
    small = shp.make_shape('circle', {'center_lon': 0., 'center_lat': 0., 'radius': 500.})
    off = shp.make_shape('circle', {'center_lon': 1., 'center_lat': 1., 'radius': 500.})
    assert shp.shape_contains_shape(big, small)
    assert not shp.shape_contains_shape(small, big)
    assert shp.shapes_intersect(big, small)
    assert not shp.shapes_intersect(big, off)
    # overlapping circles intersect but neither contains
    near = shp.make_shape('circle', {'center_lon': 0.06, 'center_lat': 0., 'radius': 3000.})
    assert shp.shapes_intersect(big, near)
    assert not shp.shape_contains_shape(big, near)


def test_linestring_semantics():
    ls = shp.make_shape('linestring',
                        rings=[np.array([[0., 0.], [1., 1.], [2., 0.]])])
    sub = shp.make_shape('linestring', rings=[np.array([[1., 1.], [2., 0.]])])
    other = shp.make_shape('linestring', rings=[np.array([[0., 0.], [2., 0.]])])
    assert shp.shape_contains_shape(ls, sub)          # contiguous sublist
    assert not shp.shape_contains_shape(ls, other)
    # vertex-only containment (structures.py:1499-1502)
    assert shp.shape_contains_points(ls, [1.0, 0.5], [1.0, 0.5]).tolist() == [True, False]
    # crossing line intersects
    crossing = shp.make_shape('linestring', rings=[np.array([[0.5, -1.], [0.5, 2.]])])
    assert shp.shapes_intersect(ls, crossing)


def test_canonical_ring_invariance():
    ring1 = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 0.]])
    ring2 = np.array([[1., 1.], [0., 0.], [1., 0.], [1., 1.]])     # rotated start
    ring3 = np.array([[0., 0.], [1., 1.], [1., 0.], [0., 0.]])     # reversed
    c1 = shp.canonical_ring(ring1)
    assert c1 == shp.canonical_ring(ring2) == shp.canonical_ring(ring3)


def test_polygon_centroid():
    square = np.array([[0., 0.], [1., 0.], [1., 1.], [0., 1.], [0., 0.]])
    cx, cy = geom.polygon_centroid(square)
    assert abs(cx - 0.5) < 1e-12 and abs(cy - 0.5) < 1e-12
