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
    if (src, dst) not in _TRANSFORMS:
        raise NotImplementedError(
            f"no transform registered for {src} -> {dst}; register "
            "pyproj.Transformer.transform via register_transform on a cluster"
        )
    fn = _TRANSFORMS[(src, dst)]

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
