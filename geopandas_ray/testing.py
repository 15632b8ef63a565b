"""Equality assertions for tests (reference geopandas/testing.py:
assert_geoseries_equal / assert_geodataframe_equal, geom_equals /
geom_almost_equals helpers) over the engine's Dataset/GeoDataset model.

Testing utilities pull both sides to the driver by design (assertions are
driver-sized); for dataset-scale comparison use an anti-join on a key."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_table(obj) -> tuple[pa.Table, str]:
    """(arrow table, geometry column name) from GeoDataset / Dataset /
    pa.Table / pandas."""
    import ray.data

    from .frame import GeoDataset
    from .util import pull_table

    geometry = "geometry"
    if isinstance(obj, GeoDataset):
        geometry = obj.geometry
        obj = obj.ds
    if isinstance(obj, ray.data.Dataset):
        return pull_table(obj), geometry
    if isinstance(obj, pa.Table):
        return obj, geometry
    return pa.Table.from_pandas(obj, preserve_index=False), geometry


def geom_equals(a, b, geometry: str = "geometry") -> bool:
    """True iff the two geometry columns are row-wise spatially equal
    (testing.py:33). Spatial equality via the engine's geom_equals
    predicate kernels; null rows must match null rows."""
    from .geom.wkb import from_wkb
    from .stages.core import eval_pairs

    ta, _ = _to_table(a)
    tb, _ = _to_table(b)
    ga = from_wkb(ta.column(geometry))
    gb = from_wkb(tb.column(geometry))
    if len(ga) != len(gb):
        return False
    na = np.asarray(ga.is_missing)
    nb = np.asarray(gb.is_missing)
    if not np.array_equal(na, nb):
        return False
    idx = np.nonzero(~na)[0]
    if len(idx) == 0:
        return True
    res = eval_pairs("geom_equals", ga, idx, gb, idx)
    return bool(res.all())


def geom_almost_equals(a, b, decimal: int = 3, geometry: str = "geometry") -> bool:
    """testing.py:60: row-wise coordinate equality to ``decimal`` places
    (tolerance 0.5 * 10**-decimal, like GeoSeries.geom_almost_equals)."""
    from .geom import kernels as K
    from .geom.wkb import from_wkb

    ta, _ = _to_table(a)
    tb, _ = _to_table(b)
    ga = from_wkb(ta.column(geometry))
    gb = from_wkb(tb.column(geometry))
    if len(ga) != len(gb):
        return False
    na = np.asarray(ga.is_missing)
    if not np.array_equal(na, np.asarray(gb.is_missing)):
        return False
    tol = 0.5 * 10.0 ** (-decimal)
    ca, cb = ga.coords, gb.coords
    if ca.shape != cb.shape:
        return False
    if len(ca) == 0:
        return True
    # structural offsets must agree for a coordinate-wise compare
    for attr in ("ring_offsets", "part_offsets", "row_offsets"):
        if not np.array_equal(np.asarray(getattr(ga, attr)), np.asarray(getattr(gb, attr))):
            return False
    return bool((np.abs(ca - cb) <= tol).all())


def assert_geodataset_equal(
    left,
    right,
    check_like: bool = False,
    check_less_precise: bool = False,
    check_column_order: bool = True,
    check_crs: bool = True,
    geometry: str = "geometry",
) -> None:
    """assert_geodataframe_equal analog (testing.py:197): columns, row
    count, attribute values and geometry equality.

    ``check_like=True`` ignores row order (rows are matched after a stable
    sort on all non-geometry columns — the engine has no index).
    ``check_less_precise`` compares geometry to 3 decimals instead of
    spatial equality. ``check_crs`` compares GeoDataset.crs when both
    sides carry one."""
    from .frame import GeoDataset

    if check_crs and isinstance(left, GeoDataset) and isinstance(right, GeoDataset):
        if (left.crs is None) != (right.crs is None) or (
            left.crs is not None and str(left.crs) != str(right.crs)
        ):
            raise AssertionError(f"CRS mismatch: {left.crs!r} != {right.crs!r}")
    ta, _ = _to_table(left)
    tb, _ = _to_table(right)
    cols_a, cols_b = list(ta.column_names), list(tb.column_names)
    if check_column_order:
        if cols_a != cols_b:
            raise AssertionError(f"column mismatch: {cols_a} != {cols_b}")
    elif sorted(cols_a) != sorted(cols_b):
        raise AssertionError(f"column mismatch: {sorted(cols_a)} != {sorted(cols_b)}")
    if ta.num_rows != tb.num_rows:
        raise AssertionError(f"row count mismatch: {ta.num_rows} != {tb.num_rows}")
    attrs = [c for c in cols_a if c != geometry]
    if check_like:
        import pandas as pd  # noqa: F401

        # geometry-only frames still honor check_like: sort on WKB bytes
        sort_cols = attrs or ([geometry] if geometry in cols_a else [])
        if sort_cols:
            da = ta.to_pandas().sort_values(sort_cols, kind="stable").reset_index(drop=True)
            db = (
                tb.to_pandas()[cols_a].sort_values(sort_cols, kind="stable").reset_index(drop=True)
            )
            ta = pa.Table.from_pandas(da, preserve_index=False)
            tb = pa.Table.from_pandas(db, preserve_index=False)
    for c in attrs:
        va, vb = ta.column(c).to_pylist(), tb.column(c).to_pylist()
        if not all(
            (x == y) or (x is None and y is None)
            or (isinstance(x, float) and isinstance(y, float) and np.isnan(x) and np.isnan(y))
            for x, y in zip(va, vb)
        ):
            raise AssertionError(f"column {c!r} values differ")
    if geometry in cols_a:
        ok = (
            geom_almost_equals(ta, tb, geometry=geometry)
            if check_less_precise
            else geom_equals(ta, tb, geometry=geometry)
        )
        if not ok:
            raise AssertionError("geometry columns are not equal")


# reference naming aliases
assert_geoseries_equal = assert_geodataset_equal
assert_geodataframe_equal = assert_geodataset_equal


def show_versions() -> None:
    """tools/_show_versions.py analog: engine + dependency versions."""
    import platform
    import sys

    import numpy
    import pyarrow
    import ray

    from . import __version__

    print(f"geopandas_ray : {__version__}")
    print(f"python        : {sys.version.split()[0]}")
    print(f"platform      : {platform.platform()}")
    print(f"ray           : {ray.__version__}")
    print(f"pyarrow       : {pyarrow.__version__}")
    print(f"numpy         : {numpy.__version__}")
