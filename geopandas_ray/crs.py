"""CRS handling (reference base.py:89, geoseries.py:800 set_crs /
:878 to_crs, array.py:38 _check_crs, :52 _crs_mismatch_warn).

pyproj is unavailable in this sandbox, so:

- CRS is an opaque string (EPSG code / WKT) carried in the dataset's "geo"
  schema metadata (sources/geoparquet.py), exactly like the reference
  carries pyproj.CRS per geometry column;
- ``set_crs`` is metadata-only (matching the reference: no coordinate
  change);
- ``to_crs`` supports a pluggable transform registry. In-sandbox it ships
  linear/affine transforms (unit scaling, false-easting offsets - enough to
  exercise the plumbing and tests); on a cluster, register
  pyproj.Transformer.transform as the callable and nothing else changes;
- ``check_crs`` mirrors _check_crs: None matches anything unless
  allow_none=False; mismatch raises the reference's error text shape.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

from .geom.wkb import from_wkb, to_wkb

# (src, dst) -> fn(x, y) -> (x2, y2)
_TRANSFORMS: dict[tuple[str, str], Callable] = {}


def register_transform(src: str, dst: str, fn: Callable) -> None:
    _TRANSFORMS[(src, dst)] = fn


def _linear(sx, sy, ox=0.0, oy=0.0):
    return lambda x, y: (x * sx + ox, y * sy + oy)


# built-in demo transforms: meters <-> kilometers style unit scaling and a
# false-easting shift, deterministic + invertible for tests
register_transform("EPSG:32600", "EPSG:32600+km", _linear(0.001, 0.001))
register_transform("EPSG:32600+km", "EPSG:32600", _linear(1000.0, 1000.0))
register_transform("TEST:unit", "TEST:offset", _linear(1.0, 1.0, 500000.0, 0.0))
register_transform("TEST:offset", "TEST:unit", _linear(1.0, 1.0, -500000.0, 0.0))


# ---------------------------------------------------------------------------
# Real projections (closed-form / series, public formulas - no pyproj needed)
# ---------------------------------------------------------------------------

_R_MERC = 6378137.0  # WGS84 semi-major axis (Web Mercator sphere radius)
_WGS84_F = 1.0 / 298.257223563


def _lonlat_to_webmercator(lon, lat):
    """EPSG:4326 -> EPSG:3857 (spherical Mercator on the WGS84 semi-major
    axis - the published Web Mercator definition)."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128779806604, 85.051128779806604)
    x = _R_MERC * np.radians(np.asarray(lon, dtype=np.float64))
    y = _R_MERC * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def _webmercator_to_lonlat(x, y):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _R_MERC)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / _R_MERC)) - np.pi / 2.0)
    return lon, lat


def _utm_consts():
    """Kruger-series constants for WGS84 (Karney 2011, public formulas)."""
    f = _WGS84_F
    n = f / (2.0 - f)
    n2, n3, n4 = n * n, n**3, n**4
    A = _R_MERC / (1.0 + n) * (1.0 + n2 / 4.0 + n4 / 64.0)
    alpha = np.array(
        [
            n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
            13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
            61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
            49561.0 * n4 / 161280.0,
        ]
    )
    beta = np.array(
        [
            n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0,
            n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
            17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
            4397.0 * n4 / 161280.0,
        ]
    )
    e2 = f * (2.0 - f)
    return n, A, alpha, beta, np.sqrt(e2)


def _lonlat_to_utm(lon, lat, zone: int, south: bool):
    """EPSG:4326 -> UTM zone (transverse Mercator, Kruger series to n^4:
    sub-mm accuracy within a zone)."""
    n, A, alpha, _, e = _utm_consts()
    k0, E0 = 0.9996, 500000.0
    N0 = 10000000.0 if south else 0.0
    lam0 = np.radians(zone * 6.0 - 183.0)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - (2.0 * np.sqrt(n) / (1.0 + n)) * np.arctanh((2.0 * np.sqrt(n) / (1.0 + n)) * s))
    xi = np.arctan2(t, np.cos(lam))
    eta = np.arctanh(np.sin(lam) / np.sqrt(1.0 + t * t))
    x, y = eta.copy(), xi.copy()
    for j, a in enumerate(alpha, start=1):
        y = y + a * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        x = x + a * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    return E0 + k0 * A * x, N0 + k0 * A * y


def _utm_to_lonlat(E, N, zone: int, south: bool):
    n, A, _, beta, e = _utm_consts()
    k0, E0 = 0.9996, 500000.0
    N0 = 10000000.0 if south else 0.0
    lam0 = np.radians(zone * 6.0 - 183.0)
    xi = (np.asarray(N, dtype=np.float64) - N0) / (k0 * A)
    eta = (np.asarray(E, dtype=np.float64) - E0) / (k0 * A)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, b in enumerate(beta, start=1):
        xi_p = xi_p - b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        eta_p = eta_p - b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    tau_p = np.sin(xi_p) / np.sqrt(np.sinh(eta_p) ** 2 + np.cos(xi_p) ** 2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # Newton-solve tau from tau' (Karney's exact tau <-> tau' relation)
    tau = tau_p.copy()
    for _ in range(3):
        sig = np.sinh(e * np.arctanh(e * tau / np.sqrt(1.0 + tau * tau)))
        f_tau = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau)
        dtau = (
            (tau_p - f_tau)
            * (1.0 + (1.0 - e * e) * tau * tau)
            / ((1.0 - e * e) * np.sqrt((1.0 + f_tau * f_tau) * (1.0 + tau * tau)))
        )
        tau = tau + dtau
    return np.degrees(lam + lam0), np.degrees(np.arctan(tau))


def _parse_utm(code: str):
    """EPSG:326xx (north) / 327xx (south) -> (zone, south) or None."""
    if not code.upper().startswith("EPSG:") or len(code) != 10:
        return None
    try:
        num = int(code[5:])
    except ValueError:
        return None
    if 32601 <= num <= 32660:
        return num - 32600, False
    if 32701 <= num <= 32760:
        return num - 32700, True
    return None


def _to_4326(code: str):
    """(x, y) -> (lon, lat) for any supported CRS, or None."""
    if code == "EPSG:4326":
        return lambda x, y: (x, y)
    if code == "EPSG:3857":
        return _webmercator_to_lonlat
    utm = _parse_utm(code)
    if utm:
        z, south = utm
        return lambda x, y: _utm_to_lonlat(x, y, z, south)
    from . import proj as _proj

    d = _proj.REGISTRY.get(code)
    if d is not None:
        return lambda x, y: _proj._to_wgs84(d, x, y)
    return None


def _from_4326(code: str):
    """(lon, lat) -> (x, y) for any supported CRS, or None."""
    if code == "EPSG:4326":
        return lambda x, y: (x, y)
    if code == "EPSG:3857":
        return _lonlat_to_webmercator
    utm = _parse_utm(code)
    if utm:
        z, south = utm
        return lambda x, y: _lonlat_to_utm(x, y, z, south)
    from . import proj as _proj

    d = _proj.REGISTRY.get(code)
    if d is not None:
        return lambda lon, lat: _proj._from_wgs84(d, lon, lat)
    return None


def _resolve_transform(src: str, dst: str):
    """User registry first, then ANY supported pair routed through WGS84
    geodetic: web mercator, WGS84 UTM, and the parametric projection
    engine (proj.py: TM/LCC/Albers/LAEA + Helmert datum shifts over the
    common EPSG codes)."""
    fn = _TRANSFORMS.get((src, dst))
    if fn is not None:
        return fn
    s, d = src.upper(), dst.upper()
    if s == d:
        # src == dst must be a bit-exact identity, never a lossy WGS84
        # round-trip (value-hash parity downstream).
        return lambda x, y: (x, y)
    to_ll = _to_4326(s)
    from_ll = _from_4326(d)
    if to_ll is None or from_ll is None:
        return None
    if s == "EPSG:4326":
        return from_ll
    if d == "EPSG:4326":
        return to_ll
    return lambda x, y: from_ll(*to_ll(x, y))


def check_crs(left_crs: str | None, right_crs: str | None, allow_none: bool = True) -> bool:
    """array.py:38 semantics: None matches anything (with a warning at the
    caller); otherwise exact match."""
    if left_crs is None or right_crs is None:
        return allow_none
    return left_crs == right_crs


def crs_mismatch_error(left_crs, right_crs) -> ValueError:
    return ValueError(
        "CRS mismatch between the CRS of left geometries and the CRS of "
        f"right geometries.\nLeft CRS: {left_crs}\nRight CRS: {right_crs}"
    )


def set_crs(crs: str) -> dict:
    """Metadata-only: returns the 'geo' schema metadata dict to attach at
    the sink (write_geoparquet(..., crs=crs))."""
    from .sources.geoparquet import create_geo_metadata

    return create_geo_metadata(crs=crs)


def to_crs(
    ds: ray.data.Dataset, src: str, dst: str, geometry: str = "geometry"
) -> ray.data.Dataset:
    """Reproject every coordinate (pure per-row map - embarrassingly
    parallel, reference array.py:385). Raises if no transform is registered
    for (src, dst)."""
    fn = _resolve_transform(src, dst)
    if fn is None:
        raise NotImplementedError(
            f"no transform registered for {src} -> {dst}; built-ins cover "
            "EPSG:4326 <-> EPSG:3857 <-> UTM (EPSG:326xx/327xx); register "
            "pyproj.Transformer.transform via register_transform for others"
        )

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        x2, y2 = fn(g.coords[:, 0], g.coords[:, 1])
        g.coords = np.column_stack([np.asarray(x2, dtype=np.float64), np.asarray(y2, dtype=np.float64)])
        idx = b.column_names.index(geometry)
        return b.set_column(idx, geometry, to_wkb(g))

    return ds.map_batches(f, batch_format="pyarrow")


def estimate_utm_zone(total_bounds) -> str:
    """geoseries.py:957 analog: pick a UTM-like zone from the global bounds
    midpoint (formula from the public UTM definition; needs lon/lat input)."""
    minx, miny, maxx, maxy = total_bounds
    lon = (minx + maxx) / 2.0
    lat = (miny + maxy) / 2.0
    zone = int(np.floor((lon + 180.0) / 6.0)) % 60 + 1
    epsg = (32600 if lat >= 0 else 32700) + zone
    return f"EPSG:{epsg}"


def estimate_utm_crs(ds, geometry: str = "geometry") -> str:
    """geoseries.py:957: estimate the WGS84 UTM CRS covering the dataset.

    Returns an "EPSG:326xx"/"EPSG:327xx" code straight from the proj
    REGISTRY, so the result is consumable by :func:`to_crs`. Geometry must
    be in lon/lat (EPSG:4326), like the reference (it raises without a
    geographic CRS). One streaming total_bounds pass."""
    from .stages.dissolve import total_bounds

    tb = total_bounds(ds, geometry=geometry)
    return estimate_utm_zone(tb)
