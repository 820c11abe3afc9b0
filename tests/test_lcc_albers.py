"""Lambert Conformal Conic (1SP/2SP) + Albers Equal-Area kernels and the
grid-CRS registry entries built on them (kernels/datum.py).

Goldens are the EPSG Guidance Note 7-2 worked examples (public):
- method 9802 (LCC 2SP): NAD27 / Texas South Central, EPSG:32040
- method 9801 (LCC 1SP): Jamaica 1969 / Jamaica National Grid params
Reference parity target: coordinates.py:210-234 routes any pyproj CRS;
these are the LCC/Albers members of that family rebuilt from published
parameters.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostructures_spark.kernels import datum as D
from tests.test_spark_operators import spark  # shared session fixture


def test_lcc_2sp_epsg_worked_example():
    """EPSG GN7-2 worked example (NAD27-native coordinates, so the
    projection alone is tested, no datum shift): 28°30'N 96°W ->
    E 2963503.91 ftUS, N 254759.80 ftUS."""
    g = D.GRID_CRS['EPSG:32040']
    x, y = D.lcc_forward_ell(np.array([-96.0]), np.array([28.5]), g.ell, g.tm)
    assert abs(x[0] / D.US_SURVEY_FOOT - 2963503.91) < 5e-3
    assert abs(y[0] / D.US_SURVEY_FOOT - 254759.80) < 5e-3
    lo, la = D.lcc_inverse_ell(x, y, g.ell, g.tm)
    assert abs(lo[0] + 96.0) < 1e-12 and abs(la[0] - 28.5) < 1e-12


def test_lcc_1sp_epsg_worked_example():
    """EPSG GN7-2 worked example (Clarke 1866, k0=1): 17°55'55.80"N
    76°56'37.26"W -> E 255966.58 m, N 142493.51 m."""
    p = D.LCCParams(lon0=-77.0, lat0=18.0, lat1=18.0, lat2=18.0, k0=1.0,
                    x0=250000.0, y0=150000.0)
    phi = 17 + 55 / 60 + 55.80 / 3600
    lam = -(76 + 56 / 60 + 37.26 / 3600)
    x, y = D.lcc_forward_ell(np.array([lam]), np.array([phi]),
                             D.CLARKE1866, p)
    assert abs(x[0] - 255966.58) < 5e-3
    assert abs(y[0] - 142493.51) < 5e-3
    lo, la = D.lcc_inverse_ell(x, y, D.CLARKE1866, p)
    assert abs(lo[0] - lam) < 1e-12 and abs(la[0] - phi) < 1e-12


def test_lcc_1sp_is_2sp_degenerate_limit():
    """lat1 == lat2 takes the analytic n = sin(lat1) branch; it must be
    the continuous limit of the generic 2SP formula as lat2 -> lat1."""
    base = dict(lon0=3.0, lat0=46.5, k0=1.0, x0=0.0, y0=0.0)
    exact = D.LCCParams(lat1=46.5, lat2=46.5, **base)
    near = D.LCCParams(lat1=46.5 - 5e-8, lat2=46.5 + 5e-8, **base)
    lon = np.array([1.0, 5.5]); lat = np.array([44.2, 48.9])
    xe, ye = D.lcc_forward_ell(lon, lat, D.GRS80, exact)
    xn, yn = D.lcc_forward_ell(lon, lat, D.GRS80, near)
    assert np.allclose(xe, xn, atol=1e-4) and np.allclose(ye, yn, atol=1e-4)


def test_lambert93_false_origin_and_roundtrip():
    """EPSG:2154: the false origin (3°E, 46.5°N) maps to exactly
    (700000, 6600000); a grid of points over France round-trips to
    machine precision (RGF93 == WGS84 here, so no Helmert asymmetry)."""
    g = D.GRID_CRS['EPSG:2154']
    x, y = D.lcc_forward_ell(3.0, 46.5, g.ell, g.tm)
    assert abs(float(x) - 700000.0) < 1e-6
    assert abs(float(y) - 6600000.0) < 1e-6
    lon = np.linspace(-4.5, 8.0, 23)
    lat = np.linspace(41.5, 51.0, 23)
    LO, LA = np.meshgrid(lon, lat)
    x, y = D.grid_forward(LO.ravel(), LA.ravel(), 'EPSG:2154')
    lo, la = D.grid_inverse(x, y, 'EPSG:2154')
    assert np.max(np.abs(lo - LO.ravel())) < 1e-11
    assert np.max(np.abs(la - LA.ravel())) < 1e-11


def test_ntf_lambert2e_roundtrip_and_plausibility():
    """EPSG:27572 (NTF / Lambert II étendu): WGS84 end-to-end through the
    3-param NTF shift; Paris lands in the legacy-grid ballpark and the
    round trip closes to the 2D-Helmert height-drop level (~5e-9 deg,
    same asymmetry the OSGB tests document)."""
    x, y = D.grid_forward(np.array([2.3522]), np.array([48.8566]),
                          'EPSG:27572')
    assert 550_000 < x[0] < 650_000
    assert 2_380_000 < y[0] < 2_480_000
    lon = np.linspace(-4.0, 8.0, 15)
    lat = np.linspace(42.5, 50.5, 15)
    LO, LA = np.meshgrid(lon, lat)
    x, y = D.grid_forward(LO.ravel(), LA.ravel(), 'EPSG:27572')
    lo, la = D.grid_inverse(x, y, 'EPSG:27572')
    assert np.max(np.abs(lo - LO.ravel())) < 1e-7
    assert np.max(np.abs(la - LA.ravel())) < 1e-7


def test_texas_ftus_units_through_registry():
    """EPSG:32040 registry output is US survey feet: the registry value at
    the worked-example point must be the metre kernel value / 1200÷3937.
    (The registry path also applies the NAD27 Helmert, so compare units
    via the same chain, not against the NAD27-native golden.)"""
    g = D.GRID_CRS['EPSG:32040']
    lon = np.array([-96.0]); lat = np.array([28.5])
    x_ft, y_ft = D.grid_forward(lon, lat, 'EPSG:32040')
    X, Y, Z = D.geodetic_to_ecef(lon, lat, D.WGS84)
    X, Y, Z = D.helmert_apply(X, Y, Z, g.wgs84_to_datum)
    dlon, dlat, _ = D.ecef_to_geodetic(X, Y, Z, g.ell)
    x_m, y_m = D.lcc_forward_ell(dlon, dlat, g.ell, g.tm)
    assert abs(x_ft[0] * D.US_SURVEY_FOOT - x_m[0]) < 1e-9
    assert abs(y_ft[0] * D.US_SURVEY_FOOT - y_m[0]) < 1e-9
    lo, la = D.grid_inverse(x_ft, y_ft, 'EPSG:32040')
    assert abs(lo[0] + 96.0) < 1e-7 and abs(la[0] - 28.5) < 1e-7


def test_albers_equal_area_property():
    """EPSG:5070 is equal-area on the ellipsoid: the planar shoelace area
    of a densely-sampled projected ring must equal the exact ellipsoidal
    area (kernels/karney.py) to ~1e-6 relative — an independent
    cross-kernel verification (no shared code between the two paths)."""
    from geostructures_spark.kernels.karney import ellipsoidal_area_rings
    t = np.linspace(0.0, 2.0 * np.pi, 721)
    # ~100 km quasi-circle around (-96, 38) in degree space
    lon = -96.0 + 1.1 * np.cos(t)
    lat = 38.0 + 0.9 * np.sin(t)
    ring = np.column_stack([lon, lat])
    exact = ellipsoidal_area_rings([ring])
    x, y = D.grid_forward(lon, lat, 'EPSG:5070')
    planar = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
    assert abs(planar - exact) / exact < 1e-6


def test_albers_roundtrip_conus():
    lon = np.linspace(-124.0, -67.0, 25)
    lat = np.linspace(25.0, 49.0, 25)
    LO, LA = np.meshgrid(lon, lat)
    x, y = D.grid_forward(LO.ravel(), LA.ravel(), 'EPSG:5070')
    lo, la = D.grid_inverse(x, y, 'EPSG:5070')
    assert np.max(np.abs(lo - LO.ravel())) < 1e-11
    assert np.max(np.abs(la - LA.ravel())) < 1e-11


def test_projection_udf_lcc_dispatch(spark):
    """to/from_projection_udf route EPSG:2154 through the LCC registry
    path (reference parity: Coordinate.to_projection accepts the code)."""
    from geostructures_spark.functions.geo import (
        from_projection_udf, to_projection_udf)
    df = spark.createDataFrame(
        [(1, 2.3522, 48.8566), (2, 5.3698, 43.2965)],
        'id long, lon double, lat double')
    fwd = to_projection_udf('EPSG:2154')
    inv = from_projection_udf('EPSG:2154')
    out = (df.withColumn('p', fwd(F.col('lon'), F.col('lat')))
           .withColumn('b', inv(F.col('p.x'), F.col('p.y')))
           .collect())
    for r in out:
        assert abs(r['b']['lon'] - r['lon']) < 1e-5
        assert abs(r['b']['lat'] - r['lat']) < 1e-5
    paris = [r for r in out if r['id'] == 1][0]
    assert 650_000 < paris['p']['x'] < 655_000
    assert 6_859_000 < paris['p']['y'] < 6_865_000
