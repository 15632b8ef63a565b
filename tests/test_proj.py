"""Parametric projection engine: published anchor points, exact origins,
roundtrips, scale properties, and the to_crs stage integration."""

import numpy as np
import pyarrow as pa
import pytest

from geopandas_ray import proj as P
from geopandas_ray.crs import _resolve_transform


def test_origins_exact():
    # natural origin maps exactly to the false origin for every conic/azimuthal
    for code, lonlat, expect in [
        ("EPSG:3035", (10.0, 52.0), (4321000.0, 3210000.0)),
        ("EPSG:5070", (-96.0, 23.0), (0.0, 0.0)),
        ("EPSG:2154", (3.0, 46.5), (700000.0, 6600000.0)),
        ("EPSG:3310", (-120.0, 0.0), (0.0, -4000000.0)),
    ]:
        fn = _resolve_transform("EPSG:4326", code)
        x, y = fn(np.array([lonlat[0]]), np.array([lonlat[1]]))
        assert np.allclose([x[0], y[0]], expect, atol=1e-6), code


def test_osgb_tm_published_example():
    # OS 'A guide to coordinate systems in Great Britain' worked example:
    # OSGB36 geodetic lat 52d39'27.2531"N lon 1d43'4.5177"E
    # -> E 651409.903, N 313177.270 (Airy TM, no datum change involved)
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    a, f = P.ELLIPSOIDS["airy"]
    x, y = P.tm_forward(np.array([lon]), np.array([lat]), a, f, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    assert abs(x[0] - 651409.903) < 0.01
    assert abs(y[0] - 313177.270) < 0.01
    lon2, lat2 = P.tm_inverse(x, y, a, f, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    # the inverse series truncates at D^6: ~3mm at dlon=3.7deg
    assert abs(lon2[0] - lon) < 5e-8 and abs(lat2[0] - lat) < 5e-8


def test_roundtrips_all_registered():
    rng = np.random.RandomState(5)
    windows = {
        "EPSG:3035": (0.0, 30.0, 40.0, 65.0),
        "EPSG:5070": (-120.0, -75.0, 25.0, 48.0),
        "EPSG:3310": (-124.0, -114.0, 32.0, 42.0),
        "EPSG:3577": (115.0, 150.0, -40.0, -12.0),
        "EPSG:2154": (-4.0, 8.0, 42.0, 51.0),
        "EPSG:3082": (-106.0, -94.0, 26.0, 36.0),
        "EPSG:27700": (-6.0, 1.5, 50.0, 58.0),
        "EPSG:25832": (6.0, 12.0, 40.0, 60.0),
    }
    for code, (lo, hi, la, ha) in windows.items():
        lon = rng.uniform(lo, hi, 200)
        lat = rng.uniform(la, ha, 200)
        fwd = _resolve_transform("EPSG:4326", code)
        inv = _resolve_transform(code, "EPSG:4326")
        x, y = fwd(lon, lat)
        lon2, lat2 = inv(x, y)
        # sub-mm in degrees ~ 1e-8; Helmert codes get 1e-7 (iterative geodetic)
        assert np.allclose(lon2, lon, atol=1e-7) and np.allclose(lat2, lat, atol=1e-7), code


def test_conic_scale_on_standard_parallels():
    # along a standard parallel the scale factor is 1 for LCC and the
    # east-west scale is 1 for Albers: projected distance of a small
    # east-west step equals the ellipsoidal parallel arc
    a, f = P.ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    for fwd, lat_sp in [
        (lambda lon, lat: P.lcc_forward(lon, lat, a, f, 44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0), 44.0),
        (lambda lon, lat: P.aea_forward(lon, lat, a, f, 29.5, 45.5, 23.0, -96.0, 0.0, 0.0), 29.5),
    ]:
        dlon = 1e-4
        lon0 = np.array([0.0, dlon]) + (3.0 if lat_sp > 40 else -96.0)
        lat0 = np.full(2, lat_sp)
        x, y = fwd(lon0, lat0)
        proj_d = float(np.hypot(x[1] - x[0], y[1] - y[0]))
        sphi = np.sin(np.radians(lat_sp))
        arc = (a * np.cos(np.radians(lat_sp)) / np.sqrt(1 - e2 * sphi * sphi)) * np.radians(dlon)
        assert abs(proj_d / arc - 1.0) < 1e-6


def test_laea_preserves_area():
    # equal-area property: a small geodesic quad keeps its area on the
    # 3035 plane (to first order)
    a, f = P.ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    lat, lon, d = 48.0, 12.0, 0.01
    lons = np.array([lon, lon + d, lon + d, lon])
    lats = np.array([lat, lat, lat + d, lat + d])
    x, y = P.laea_forward(lons, lats, a, f, 52.0, 10.0, 4321000.0, 3210000.0)
    planar = 0.5 * abs(
        np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
    )
    sphi = np.sin(np.radians(lat + d / 2))
    M = a * (1 - e2) / (1 - e2 * sphi * sphi) ** 1.5
    N = a / np.sqrt(1 - e2 * sphi * sphi)
    ellip = (M * np.radians(d)) * (N * np.cos(np.radians(lat + d / 2)) * np.radians(d))
    assert abs(planar / ellip - 1.0) < 1e-4


def test_helmert_roundtrip_and_magnitude():
    # OSGB36 <-> WGS84 datum change: inverse undoes it to sub-mm, and the
    # shift magnitude over Britain is the familiar ~50-120 m
    fwd = _resolve_transform("EPSG:4326", "EPSG:27700")
    inv = _resolve_transform("EPSG:27700", "EPSG:4326")
    lon = np.array([-0.1278, -3.1883])  # London, Edinburgh-ish
    lat = np.array([51.5074, 55.9533])
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    assert np.allclose(lon2, lon, atol=1e-7) and np.allclose(lat2, lat, atol=1e-7)
    # vs no-datum-shift TM: the Helmert change moves the grid result ~100 m
    a, f = P.ELLIPSOIDS["airy"]
    x0, y0 = P.tm_forward(lon, lat, a, f, -2.0, 49.0, 0.9996012717, 400000.0, -100000.0)
    shift = np.hypot(x - x0, y - y0)
    assert (shift > 40).all() and (shift < 200).all(), shift


def test_cross_crs_composition():
    # any-to-any composes through WGS84: 27700 -> 2154 and back
    fn = _resolve_transform("EPSG:27700", "EPSG:2154")
    back = _resolve_transform("EPSG:2154", "EPSG:27700")
    x = np.array([530000.0])  # London-ish grid
    y = np.array([180000.0])
    fx, fy = fn(x, y)
    bx, by = back(fx, fy)
    assert abs(bx[0] - x[0]) < 1e-3 and abs(by[0] - y[0]) < 1e-3
    # sane magnitude: London in Lambert-93 is west of the false easting
    assert 0 < fx[0] < 700000 and 6_800_000 < fy[0] < 7_300_000


def test_to_crs_stage_with_registry_codes():
    import ray.data
    from geopandas_ray.crs import to_crs
    from geopandas_ray.geom.wkb import from_wkb, points_to_wkb
    from geopandas_ray.geom import kernels as K

    t = pa.table({"id": pa.array([0, 1]), "geometry": points_to_wkb([10.0, 11.0], [52.0, 53.0])})
    out = to_crs(ray.data.from_arrow(t), "EPSG:4326", "EPSG:3035").to_pandas()
    g = from_wkb(out.geometry.tolist())
    b = K.bounds(g)
    assert abs(b[0, 0] - 4321000.0) < 1e-6 and abs(b[0, 1] - 3210000.0) < 1e-6


def test_self_transform_is_bit_exact_identity():
    # src == dst must NOT route through a lossy WGS84 round-trip
    import numpy as np

    for code in ["EPSG:27700", "EPSG:2154", "EPSG:3035", "EPSG:3857", "EPSG:4326"]:
        fn = _resolve_transform(code, code)
        assert fn is not None, code
        x = np.array([531000.0, 12345.678])
        y = np.array([181000.0, 98765.432])
        ox, oy = fn(x, y)
        assert np.array_equal(np.asarray(ox, dtype=float), x), code
        assert np.array_equal(np.asarray(oy, dtype=float), y), code
