"""Parametric map-projection engine for ``to_crs`` breadth (reference
reprojects via pyproj between any CRS — geopandas/array.py:385,
geoseries.py:878; pyproj is unavailable in-sandbox, so the common EPSG
codes are served by closed-form ellipsoidal projections instead).

All formulas are the published ellipsoidal forms from J.P. Snyder, "Map
Projections — A Working Manual" (USGS PP 1395): Transverse Mercator
(Krüger series), Lambert Conformal Conic (2SP), Albers Equal-Area Conic,
Lambert Azimuthal Equal-Area; datum changes use the standard 7-parameter
position-vector Helmert transform through geocentric XYZ.

Every registered CRS defines (ellipsoid, optional datum shift to WGS84,
projection + parameters); any pair routes through EPSG:4326 (WGS84
geodetic). Vectorized over numpy arrays throughout — one batch in, one
batch out, no per-point Python."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# ellipsoids
# ---------------------------------------------------------------------------

ELLIPSOIDS = {
    "WGS84": (6378137.0, 1.0 / 298.257223563),
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "airy": (6377563.396, 1.0 / 299.3249646),
    "clrk66": (6378206.4, 1.0 / 294.978698214),  # f from a,b 6356583.8
    "intl": (6378388.0, 1.0 / 297.0),
    "bessel": (6377397.155, 1.0 / 299.1528128),
}


def _e2(f: float) -> float:
    return f * (2.0 - f)


# ---------------------------------------------------------------------------
# geodetic <-> geocentric + Helmert (position-vector convention)
# ---------------------------------------------------------------------------


def geodetic_to_xyz(lon, lat, a, f):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    e2 = _e2(f)
    sphi = np.sin(phi)
    nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
    X = nu * np.cos(phi) * np.cos(lam)
    Y = nu * np.cos(phi) * np.sin(lam)
    Z = nu * (1.0 - e2) * sphi
    return X, Y, Z


def xyz_to_geodetic(X, Y, Z, a, f):
    e2 = _e2(f)
    p = np.hypot(X, Y)
    lam = np.arctan2(Y, X)
    phi = np.arctan2(Z, p * (1.0 - e2))
    for _ in range(6):  # converges to sub-mm in 3-4 rounds
        sphi = np.sin(phi)
        nu = a / np.sqrt(1.0 - e2 * sphi * sphi)
        phi = np.arctan2(Z + e2 * nu * sphi, p)
    return np.degrees(lam), np.degrees(phi)


@dataclass(frozen=True)
class Helmert:
    """7-parameter position-vector transform (rotations in arc-seconds,
    scale in ppm), source datum -> WGS84 when used as ``to_wgs84``."""

    tx: float
    ty: float
    tz: float
    rx: float
    ry: float
    rz: float
    s_ppm: float

    def apply(self, X, Y, Z):
        rx, ry, rz = (np.radians(v / 3600.0) for v in (self.rx, self.ry, self.rz))
        m = 1.0 + self.s_ppm * 1e-6
        Xo = self.tx + m * (X - rz * Y + ry * Z)
        Yo = self.ty + m * (rz * X + Y - rx * Z)
        Zo = self.tz + m * (-ry * X + rx * Y + Z)
        return Xo, Yo, Zo

    def apply_inverse(self, X, Y, Z):
        """EXACT inverse of :meth:`apply` (negating the parameters is only
        first-order and leaves ~mm-cm residuals: |r|*|t| + s*|t|)."""
        rx, ry, rz = (np.radians(v / 3600.0) for v in (self.rx, self.ry, self.rz))
        m = 1.0 + self.s_ppm * 1e-6
        u = (X - self.tx) / m
        v = (Y - self.ty) / m
        w = (Z - self.tz) / m
        M = np.array([[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]])
        Minv = np.linalg.inv(M)
        Xo = Minv[0, 0] * u + Minv[0, 1] * v + Minv[0, 2] * w
        Yo = Minv[1, 0] * u + Minv[1, 1] * v + Minv[1, 2] * w
        Zo = Minv[2, 0] * u + Minv[2, 1] * v + Minv[2, 2] * w
        return Xo, Yo, Zo


def datum_shift(lon, lat, a_src, f_src, helm: Helmert, a_dst, f_dst, inverse: bool = False):
    X, Y, Z = geodetic_to_xyz(lon, lat, a_src, f_src)
    X, Y, Z = helm.apply_inverse(X, Y, Z) if inverse else helm.apply(X, Y, Z)
    return xyz_to_geodetic(X, Y, Z, a_dst, f_dst)


# ---------------------------------------------------------------------------
# Transverse Mercator (Krüger series, Snyder 8-9..8-13 / 4th-order)
# ---------------------------------------------------------------------------


def _tm_m(phi, a, e2):
    """Meridian arc length from the equator (Snyder 3-21)."""
    e4 = e2 * e2
    e6 = e4 * e2
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


def tm_forward(lon, lat, a, f, lon0, lat0, k0, fe, fn):
    e2 = _e2(f)
    ep2 = e2 / (1.0 - e2)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0)
    sphi, cphi = np.sin(phi), np.cos(phi)
    N = a / np.sqrt(1 - e2 * sphi * sphi)
    T = (sphi / cphi) ** 2
    C = ep2 * cphi * cphi
    A = lam * cphi
    M = _tm_m(phi, a, e2)
    M0 = _tm_m(np.radians(lat0), a, e2)
    x = k0 * N * (
        A
        + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A**5 / 120
    )
    y = k0 * (
        M
        - M0
        + N * sphi / cphi * (
            A * A / 2
            + (5 - T + 9 * C + 4 * C * C) * A**4 / 24
            + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return x + fe, y + fn


def tm_inverse(x, y, a, f, lon0, lat0, k0, fe, fn):
    e2 = _e2(f)
    ep2 = e2 / (1.0 - e2)
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    x = np.asarray(x, dtype=np.float64) - fe
    y = np.asarray(y, dtype=np.float64) - fn
    M0 = _tm_m(np.radians(lat0), a, e2)
    M = M0 + y / k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sphi, cphi = np.sin(phi1), np.cos(phi1)
    C1 = ep2 * cphi * cphi
    T1 = (sphi / cphi) ** 2
    N1 = a / np.sqrt(1 - e2 * sphi * sphi)
    R1 = a * (1 - e2) / (1 - e2 * sphi * sphi) ** 1.5
    D = x / (N1 * k0)
    phi = phi1 - (N1 * sphi / cphi / R1) * (
        D * D / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1 * C1 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1 * T1 - 252 * ep2 - 3 * C1 * C1) * D**6 / 720
    )
    lam = (
        D
        - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1 * C1 + 8 * ep2 + 24 * T1 * T1) * D**5 / 120
    ) / cphi
    return np.degrees(lam) + lon0, np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Conformal Conic 2SP (Snyder 15-1..15-11)
# ---------------------------------------------------------------------------


def _lcc_mt(phi, e):
    m = np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)
    t = np.tan(np.pi / 4 - phi / 2) / (
        (1 - e * np.sin(phi)) / (1 + e * np.sin(phi))
    ) ** (e / 2)
    return m, t


def lcc_forward(lon, lat, a, f, lat1, lat2, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    m1, t1 = _lcc_mt(p1, e)
    m2, t2 = _lcc_mt(p2, e)
    _, t0 = _lcc_mt(p0, e)
    n = np.log(m1 / m2) / np.log(t1 / t2) if lat1 != lat2 else np.sin(p1)
    F = m1 / (n * t1**n)
    rho0 = a * F * t0**n
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    _, t = _lcc_mt(phi, e)
    rho = a * F * t**n
    th = n * lam
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, a, f, lat1, lat2, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    m1, t1 = _lcc_mt(p1, e)
    m2, t2 = _lcc_mt(p2, e)
    _, t0 = _lcc_mt(p0, e)
    n = np.log(m1 / m2) / np.log(t1 / t2) if lat1 != lat2 else np.sin(p1)
    F = m1 / (n * t1**n)
    rho0 = a * F * t0**n
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    rho = np.sign(n) * np.hypot(xp, yp)
    t = (rho / (a * F)) ** (1.0 / n)
    th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    lam = th / n + np.radians(lon0)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        es = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(t * ((1 - es) / (1 + es)) ** (e / 2))
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Albers Equal-Area Conic 2SP (Snyder 14-1..14-21)
# ---------------------------------------------------------------------------


def _aea_q(phi, e):
    s = np.sin(phi)
    return (1 - e * e) * (
        s / (1 - (e * s) ** 2) - (1.0 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
    )


def aea_forward(lon, lat, a, f, lat1, lat2, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    m1 = np.cos(p1) / np.sqrt(1 - (e * np.sin(p1)) ** 2)
    m2 = np.cos(p2) / np.sqrt(1 - (e * np.sin(p2)) ** 2)
    q1, q2, q0 = _aea_q(p1, e), _aea_q(p2, e), _aea_q(p0, e)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    q = _aea_q(phi, e)
    rho = a * np.sqrt(C - n * q) / n
    th = n * lam
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def _phi_from_q(q, e):
    """Invert q(phi) by Snyder 3-16 iteration."""
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    for _ in range(8):
        s = np.sin(phi)
        es = e * s
        phi = phi + ((1 - es * es) ** 2 / (2 * np.cos(phi))) * (
            q / (1 - e * e) - s / (1 - es * es) + (1.0 / (2 * e)) * np.log((1 - es) / (1 + es))
        )
    return phi


def aea_inverse(x, y, a, f, lat1, lat2, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p1, p2, p0 = (np.radians(v) for v in (lat1, lat2, lat0))
    m1 = np.cos(p1) / np.sqrt(1 - (e * np.sin(p1)) ** 2)
    m2 = np.cos(p2) / np.sqrt(1 - (e * np.sin(p2)) ** 2)
    q1, q2, q0 = _aea_q(p1, e), _aea_q(p2, e), _aea_q(p0, e)
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = a * np.sqrt(C - n * q0) / n
    xp = np.asarray(x, dtype=np.float64) - fe
    yp = rho0 - (np.asarray(y, dtype=np.float64) - fn)
    # Snyder 14-10/14-11: when n < 0 the signs of x, rho0 - y (and rho)
    # must be reversed before the arctan
    rho = np.sign(n) * np.hypot(xp, yp)
    th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
    q = (C - (rho * n / a) ** 2) / n
    phi = _phi_from_q(q, e)
    lam = th / n + np.radians(lon0)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# Lambert Azimuthal Equal-Area, oblique ellipsoidal (Snyder 24-2..24-31)
# ---------------------------------------------------------------------------


def laea_forward(lon, lat, a, f, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p0 = np.radians(lat0)
    qp = _aea_q(np.pi / 2, e)
    q0 = _aea_q(p0, e)
    b0 = np.arcsin(np.clip(q0 / qp, -1, 1))
    Rq = a * np.sqrt(qp / 2.0)
    m0 = np.cos(p0) / np.sqrt(1 - (e * np.sin(p0)) ** 2)
    D = a * m0 / (Rq * np.cos(b0))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lon, dtype=np.float64)) - np.radians(lon0)
    q = _aea_q(phi, e)
    b = np.arcsin(np.clip(q / qp, -1, 1))
    B = Rq * np.sqrt(
        2.0 / (1 + np.sin(b0) * np.sin(b) + np.cos(b0) * np.cos(b) * np.cos(lam))
    )
    x = fe + B * D * np.cos(b) * np.sin(lam)
    y = fn + (B / D) * (np.cos(b0) * np.sin(b) - np.sin(b0) * np.cos(b) * np.cos(lam))
    return x, y


def laea_inverse(x, y, a, f, lat0, lon0, fe, fn):
    e = np.sqrt(_e2(f))
    p0 = np.radians(lat0)
    qp = _aea_q(np.pi / 2, e)
    q0 = _aea_q(p0, e)
    b0 = np.arcsin(np.clip(q0 / qp, -1, 1))
    Rq = a * np.sqrt(qp / 2.0)
    m0 = np.cos(p0) / np.sqrt(1 - (e * np.sin(p0)) ** 2)
    D = a * m0 / (Rq * np.cos(b0))
    xp = (np.asarray(x, dtype=np.float64) - fe) / D
    yp = (np.asarray(y, dtype=np.float64) - fn) * D
    rho = np.hypot(xp, yp)
    with np.errstate(invalid="ignore"):
        ce = 2 * np.arcsin(np.clip(rho / (2 * Rq), -1, 1))
        q = qp * (
            np.cos(ce) * np.sin(b0) + np.where(rho == 0, 0.0, yp * np.sin(ce) * np.cos(b0) / np.where(rho == 0, 1.0, rho))
        )
    phi = _phi_from_q(q, e)
    lam = np.radians(lon0) + np.arctan2(
        xp * np.sin(ce), rho * np.cos(b0) * np.cos(ce) - yp * np.sin(b0) * np.sin(ce)
    )
    # rho == 0: the projection origin
    phi = np.where(rho == 0, p0, phi)
    lam = np.where(rho == 0, np.radians(lon0), lam)
    return np.degrees(lam), np.degrees(phi)


# ---------------------------------------------------------------------------
# CRS registry: EPSG code -> (ellipsoid, Helmert-to-WGS84 | None, proj, params)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CrsDef:
    ellipsoid: str
    to_wgs84: Helmert | None  # None = datum coincides with WGS84 for our purposes
    proj: str  # "tm" | "lcc" | "aea" | "laea" | "geodetic"
    params: tuple


# OSGB36 <- WGS84 published small-angle params (OS 'A guide to coordinate
# systems in Great Britain', tx..s); stored as OSGB36->WGS84 (the inverse)
_OSGB_TO_WGS84 = Helmert(446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)

REGISTRY: dict[str, CrsDef] = {
    "EPSG:4326": CrsDef("WGS84", None, "geodetic", ()),
    "EPSG:4258": CrsDef("GRS80", None, "geodetic", ()),  # ETRS89 ~ WGS84 here
    "EPSG:4269": CrsDef("GRS80", None, "geodetic", ()),  # NAD83 ~ WGS84 here
    # ETRS89 / LAEA Europe
    "EPSG:3035": CrsDef("GRS80", None, "laea", (52.0, 10.0, 4321000.0, 3210000.0)),
    # NAD83 / Conus Albers
    "EPSG:5070": CrsDef("GRS80", None, "aea", (29.5, 45.5, 23.0, -96.0, 0.0, 0.0)),
    # NAD83 / California Albers
    "EPSG:3310": CrsDef("GRS80", None, "aea", (34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0)),
    # GDA94 / Australian Albers
    "EPSG:3577": CrsDef("GRS80", None, "aea", (-18.0, -36.0, 0.0, 132.0, 0.0, 0.0)),
    # RGF93 / Lambert-93
    "EPSG:2154": CrsDef("GRS80", None, "lcc", (44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0)),
    # NAD83 / Texas Centric Lambert Conformal
    "EPSG:3082": CrsDef("GRS80", None, "lcc", (27.5, 35.0, 18.0, -100.0, 1500000.0, 5000000.0)),
    # OSGB36 / British National Grid (TM on Airy + Helmert datum change)
    "EPSG:27700": CrsDef("airy", _OSGB_TO_WGS84, "tm", (-2.0, 49.0, 0.9996012717, 400000.0, -100000.0)),
    # ETRS89 / UTM zones (GRS80 TM) — common European codes
    **{
        f"EPSG:258{z:02d}": CrsDef("GRS80", None, "tm", (z * 6 - 183.0, 0.0, 0.9996, 500000.0, 0.0))
        for z in range(28, 38)
    },
    # WGS 84 / UTM north (326xx) + south (327xx) — the estimate_utm_crs
    # targets (geoseries.py:957); standard UTM TM parameters
    **{
        f"EPSG:326{z:02d}": CrsDef("WGS84", None, "tm", (z * 6 - 183.0, 0.0, 0.9996, 500000.0, 0.0))
        for z in range(1, 61)
    },
    **{
        f"EPSG:327{z:02d}": CrsDef(
            "WGS84", None, "tm", (z * 6 - 183.0, 0.0, 0.9996, 500000.0, 10000000.0)
        )
        for z in range(1, 61)
    },
}


def _proj_forward(d: CrsDef, lon, lat):
    a, f = ELLIPSOIDS[d.ellipsoid]
    if d.proj == "geodetic":
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if d.proj == "tm":
        lon0, lat0, k0, fe, fn = d.params
        return tm_forward(lon, lat, a, f, lon0, lat0, k0, fe, fn)
    if d.proj == "lcc":
        return lcc_forward(lon, lat, a, f, *d.params)
    if d.proj == "aea":
        return aea_forward(lon, lat, a, f, *d.params)
    if d.proj == "laea":
        return laea_forward(lon, lat, a, f, *d.params)
    raise NotImplementedError(d.proj)


def _proj_inverse(d: CrsDef, x, y):
    a, f = ELLIPSOIDS[d.ellipsoid]
    if d.proj == "geodetic":
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if d.proj == "tm":
        lon0, lat0, k0, fe, fn = d.params
        return tm_inverse(x, y, a, f, lon0, lat0, k0, fe, fn)
    if d.proj == "lcc":
        return lcc_inverse(x, y, a, f, *d.params)
    if d.proj == "aea":
        return aea_inverse(x, y, a, f, *d.params)
    if d.proj == "laea":
        return laea_inverse(x, y, a, f, *d.params)
    raise NotImplementedError(d.proj)


def _to_wgs84(d: CrsDef, x, y):
    lon, lat = _proj_inverse(d, x, y)
    if d.to_wgs84 is not None:
        a, f = ELLIPSOIDS[d.ellipsoid]
        aw, fw = ELLIPSOIDS["WGS84"]
        lon, lat = datum_shift(lon, lat, a, f, d.to_wgs84, aw, fw)
    return lon, lat


def _from_wgs84(d: CrsDef, lon, lat):
    if d.to_wgs84 is not None:
        aw, fw = ELLIPSOIDS["WGS84"]
        a, f = ELLIPSOIDS[d.ellipsoid]
        lon, lat = datum_shift(lon, lat, aw, fw, d.to_wgs84, a, f, inverse=True)
    return _proj_forward(d, lon, lat)


def resolve(src: str, dst: str):
    """Transform callable (x, y) -> (x, y) between two registered CRS,
    routed through WGS84 geodetic; None when either code is unknown."""
    s = REGISTRY.get(src.upper())
    d = REGISTRY.get(dst.upper())
    if s is None or d is None:
        return None
    if src.upper() == dst.upper():
        # bit-exact identity, never a lossy WGS84 round trip (value-hash
        # parity invariant — same guard as crs.py's resolver)
        return lambda x, y: (x, y)

    def fn(x, y):
        lon, lat = _to_wgs84(s, x, y)
        return _from_wgs84(d, lon, lat)

    return fn
