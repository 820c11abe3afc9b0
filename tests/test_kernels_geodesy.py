"""Golden-parity tests for geodesy kernels.

Expected values are the reference library's own test goldens
(/root/reference/tests/test_calc.py, tests/test_geodesic.py) — exact copies
of the asserted constants, replayed through the vectorized kernels.
"""

import math

import numpy as np

from geostructures_spark.kernels import geodesy as g


def test_haversine_distance_goldens():
    # tests/test_calc.py:13-26 (sourced from the haversine package)
    assert round(float(g.haversine_distance(0.0, 0.0, 0.001, 0.001))) == round(157.25359)
    assert abs(round(float(g.haversine_distance(0.0, 0.0, 1.0, 1.0))) - round(157_249.59847)) < 2
    # antimeridian via the calc-path unbounding
    assert round(float(g.calc_haversine_distance_meters(179., 0., -179., 0.))) == 222390
    # plain haversine handles the wrap implicitly (dlon=±358 -> same sine)
    assert round(float(g.haversine_distance(179., 0., -179., 0.))) == 222390


def test_bearing_goldens():
    # tests/test_calc.py:6-9
    assert float(g.calc_bearing_degrees(0.0, 0.0, 0.001, 0.001)) == 45.0
    assert float(g.calc_bearing_degrees(0.0, 0.0, 0.001, 0.001, precision=9)) == 44.999999996


def test_inverse_haversine_goldens():
    # tests/test_calc.py:28-34
    lon, lat = g.inverse_haversine_degrees(0.0, 0.0, 45.0, 111_000)
    assert (float(lon), float(lat)) == (0.7059029, 0.7058494)


def test_destination_roundtrip():
    lon, lat = g.haversine_destination(10.0, 50.0, 37.0, 5000.0)
    d = float(g.haversine_distance(10.0, 50.0, float(lon), float(lat)))
    assert abs(d - 5000.0) < 1e-6
    b = float(g.haversine_bearing(10.0, 50.0, float(lon), float(lat)))
    assert abs(b - 37.0) < 1e-6


def test_vincenty_goldens():
    # tests/test_geodesic.py:56-85 (checked against PyGeodesy)
    assert abs(float(g.vincenty_distance(0.0, 0.0, 0.001, 0.001)) - 156.903468) < 1e-6
    assert abs(float(g.vincenty_distance(0.0, 0.0, 1.0, 1.0)) - 156_899.568291) < 1e-6
    assert abs(float(g.vincenty_distance(179., 0., -179., 0.)) - 222_638.981586) < 1e-6
    assert abs(float(g.vincenty_distance(0.0, 0.0, 1.0, 0.0)) - 111_319.490793) < 1e-6
    assert float(g.vincenty_distance(5., 5., 5., 5.)) == 0.0
    # antipodal: non-convergence falls back to haversine
    assert float(g.vincenty_distance(0., 0., 180., 0.)) == float(
        g.haversine_distance(0., 0., 180., 0.))
    # tests/test_geodesic.py:39-53 bearing goldens
    assert abs(float(g.vincenty_bearing(0.0, 0.0, 0.001, 0.001)) - 45.192423) < 1e-6
    assert float(g.vincenty_bearing(0.0, 0.0, 1.0, 0.0)) == 90.0
    # tests/test_geodesic.py:88-94 destination golden
    lon, lat = g.vincenty_destination(0.0, 0.0, 45.0, 111_000)
    assert abs(float(lon) - 0.705113) < 1e-6 and abs(float(lat) - 0.709811) < 1e-6


def test_vincenty_vs_haversine_magnitude():
    rng = np.random.RandomState(7)
    lons = rng.uniform(-179, 179, 50)
    lats = rng.uniform(-80, 80, 50)
    lons2 = lons + rng.uniform(-1, 1, 50)
    lats2 = lats + rng.uniform(-1, 1, 50)
    hv = g.haversine_distance(lons, lats, lons2, lats2)
    vc = g.vincenty_distance(lons, lats, lons2, lats2)
    # ellipsoid vs sphere differ < 1%
    assert np.all(np.abs(hv - vc) <= 0.01 * np.maximum(hv, 1.0))


def test_rotate_coordinates_goldens():
    # tests/test_calc.py:36-66
    lons, lats = g.rotate_coordinates([1.0], [0.0], 0.0, 0.0, 45)
    assert float(g.round_half_up(lons[0], 3)) == 0.707
    assert float(g.round_half_up(lats[0], 3)) == 0.707

    lons, lats = g.rotate_coordinates([-179., 179.], [0., 0.], 179.999, 0., 135)
    assert [float(x) for x in g.round_half_up(lons, 7)] == [179.2911861, -179.2946003]
    assert [float(x) for x in g.round_half_up(lats, 7)] == [0.7078139, -0.7063997]


def test_round_half_up():
    # utils/functions.py:60-74 semantics
    assert float(g.round_half_up(0.5, 0)) == 1.0
    assert float(g.round_half_up(1.5, 0)) == 2.0
    assert float(g.round_half_up(0.25, 1)) == 0.3
    assert float(g.round_half_up(44.9999999955, 9)) == 44.999999996


def test_normalize_lonlat():
    # coordinates.py:53-65: +180 -> -180, antimeridian wrap, pole wrap
    lon, lat = g.normalize_lonlat(180.0, 10.0)
    assert float(lon) == -180.0
    lon, lat = g.normalize_lonlat(190.0, 10.0)
    assert float(lon) == -170.0
    lon, lat = g.normalize_lonlat(10.0, 100.0)
    assert (float(lon), float(lat)) == (-170.0, 80.0)
    lon, lat = g.normalize_lonlat(-10.0, -100.0)
    assert (float(lon), float(lat)) == (170.0, -80.0)


def test_dist_xyz_matches_haversine():
    a = g.lonlat_to_xyz(0.0, 0.0)
    b = g.lonlat_to_xyz(1.0, 1.0)
    d1 = float(g.dist_xyz_meters(a, b))
    d2 = float(g.haversine_distance(0.0, 0.0, 1.0, 1.0))
    assert abs(d1 - d2) < 1e-6


def test_scalar_math_parity_with_python_math():
    # NumPy float64 must agree bit-for-bit with CPython math for the
    # haversine formula (both call libm); spot-check a grid
    for lon1, lat1, lon2, lat2 in [(0, 0, 0.001, 0.001), (12.3, 45.6, -7.8, 9.1),
                                   (179, 0, -179, 0), (-122.4, 37.8, -74.0, 40.7)]:
        rlon1, rlat1 = math.radians(lon1), math.radians(lat1)
        rlon2, rlat2 = math.radians(lon2), math.radians(lat2)
        a = (math.sin((rlat2 - rlat1) / 2) ** 2 +
             math.cos(rlat1) * math.cos(rlat2) * math.sin((rlon2 - rlon1) / 2) ** 2)
        expected = g.EARTH_RADIUS_METERS * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
        assert float(g.haversine_distance(lon1, lat1, lon2, lat2)) == expected
