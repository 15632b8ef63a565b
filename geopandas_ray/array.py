"""pandas ExtensionArray protocol for geometry columns (reference
geopandas/array.py:29 GeometryDtype, :256 GeometryArray, :66-255 module
constructors isna/from_wkb/to_wkb/from_wkt/to_wkt/points_from_xy).

The engine's data model is WKB-in-Arrow on distributed Datasets; this
module is the PANDAS-INTEROP EDGE: a ``geometry``-dtyped column for the
driver-sized frames that ``GeoDataset.to_pandas(geometry_dtype=True)``
returns, so downstream pandas code sees a first-class geometry dtype
(groupby / factorize / concat / unique / isna all work) instead of raw
``object`` bytes. Scalars are WKB ``bytes`` (no shapely in-sandbox — the
reference boxes shapely geometries; we box the wire format itself).

All geometry math delegates to the SAME vectorized kernels the
distributed stages use (``geom.kernels`` / ``geom.wkt`` / ``crs``):
there is one implementation of area/length/bounds/centroid/to_crs, not a
pandas fork. These arrays are driver-sized by contract — dataset-scale
work belongs on the GeoDataset facade.
"""

from __future__ import annotations

import numbers

import numpy as np
import pandas as pd
from pandas.api.extensions import (
    ExtensionArray,
    ExtensionDtype,
    register_extension_dtype,
)

from .geom import kernels as K
from .geom import wkb as _wkb
from .geom import wkt as _wkt

import pyarrow as pa


@register_extension_dtype
class GeometryDtype(ExtensionDtype):
    """reference array.py:29 — dtype name 'geometry'; scalar type is WKB
    bytes in this engine."""

    type = bytes
    name = "geometry"
    na_value = None

    @classmethod
    def construct_array_type(cls):
        return GeometryArray


def isna(value) -> bool:
    """reference array.py:66 — missing-geometry scalar check (None, NaN,
    pd.NA)."""
    if value is None or value is pd.NA:
        return True
    return isinstance(value, float) and np.isnan(value)


def _coerce_scalar(v) -> bytes | None:
    if isna(v):
        return None
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v)
    if isinstance(v, str):  # WKT scalar (covers _from_sequence_of_strings)
        g = _wkt.from_wkt([v])
        return _wkb.to_wkb(g)[0].as_py()
    raise TypeError(f"cannot interpret {type(v)!r} as a geometry (WKB bytes/WKT str)")


class GeometryArray(ExtensionArray):
    """reference array.py:256 — numpy object array of WKB bytes + crs."""

    _dtype = GeometryDtype()

    def __init__(self, data, crs=None):
        if isinstance(data, GeometryArray):
            crs = crs or data.crs
            data = data._data
        elif isinstance(data, (pa.Array, pa.ChunkedArray)):
            data = np.asarray(data.to_pylist(), dtype=object)
        elif not isinstance(data, np.ndarray) or data.dtype != object:
            # coerce per scalar (WKT strings parse, junk raises loudly);
            # object ndarrays are the internal fast path (take/concat/
            # factorize always hand back object arrays of bytes)
            data = np.asarray(
                [_coerce_scalar(v) for v in data], dtype=object
            )
        self._data = data
        self._crs = crs

    # --- dtype / basic protocol ---------------------------------------
    @property
    def dtype(self) -> GeometryDtype:
        return self._dtype

    @property
    def crs(self):
        return self._crs

    @crs.setter
    def crs(self, value):
        self._crs = value

    def __len__(self) -> int:
        return len(self._data)

    @property
    def nbytes(self) -> int:
        return int(sum(len(v) for v in self._data if v is not None)) + 8 * len(self)

    def __getitem__(self, idx):
        if isinstance(idx, numbers.Integral):
            return self._data[int(idx)]
        if isinstance(idx, (slice, range)):
            return GeometryArray(self._data[idx], crs=self._crs)
        idx = pd.api.indexers.check_array_indexer(self, idx)
        return GeometryArray(self._data[idx], crs=self._crs)

    def __setitem__(self, key, value):
        key = pd.api.indexers.check_array_indexer(self, key)
        if isinstance(value, GeometryArray):
            self._data[key] = value._data
        elif isinstance(value, (list, np.ndarray)) and not isinstance(
            value, (bytes, bytearray)
        ):
            self._data[key] = np.asarray(
                [_coerce_scalar(v) for v in value], dtype=object
            )
        else:
            self._data[key] = _coerce_scalar(value)

    def isna(self) -> np.ndarray:
        return np.array([isna(v) for v in self._data], dtype=bool)

    def take(self, indices, allow_fill: bool = False, fill_value=None):
        from pandas.core.algorithms import take as _take

        if allow_fill and not isna(fill_value):
            fill_value = _coerce_scalar(fill_value)
        else:
            fill_value = None
        out = _take(self._data, indices, allow_fill=allow_fill, fill_value=fill_value)
        if allow_fill and fill_value is None:
            # pandas fills object arrays with np.nan by default; the
            # array's missing sentinel is None (keeps bytes-only invariant
            # for argsort/factorize)
            out = np.asarray(
                [v if isinstance(v, bytes) else None for v in out], dtype=object
            )
        return GeometryArray(out, crs=self._crs)

    def copy(self):
        return GeometryArray(self._data.copy(), crs=self._crs)

    @classmethod
    def _from_sequence(cls, scalars, dtype=None, copy=False):
        # always through the coercing list path: user scalars may be WKT
        # strings / memoryviews even inside an object ndarray
        return cls(list(scalars))

    @classmethod
    def _from_sequence_of_strings(cls, strings, *, dtype=None, copy=False):
        # reference array.py:647 — WKT strings
        return cls(list(strings))

    def _values_for_factorize(self):
        return self._data, None

    @classmethod
    def _from_factorized(cls, values, original):
        return cls(values, crs=original.crs)

    def _values_for_argsort(self) -> np.ndarray:
        # bytes sort lexicographically; missing handled by pandas via isna
        return np.array(
            [v if v is not None else b"" for v in self._data], dtype=object
        )

    @classmethod
    def _concat_same_type(cls, to_concat):
        crss = [a.crs for a in to_concat if a.crs is not None]
        crs = crss[0] if crss and all(str(c) == str(crss[0]) for c in crss) else None
        return cls(
            np.concatenate([a._data for a in to_concat])
            if to_concat
            else np.array([], dtype=object),
            crs=crs,
        )

    def unique(self):
        return GeometryArray(pd.unique(self._data), crs=self._crs)

    def value_counts(self, dropna: bool = True) -> pd.Series:
        # reference array.py:567
        mask = self.isna()
        vals = self._data[~mask]
        codes, uniq = pd.factorize(vals)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        keys = list(uniq)
        if not dropna and mask.any():
            keys.append(None)
            counts = np.concatenate([counts, [int(mask.sum())]])
        idx = pd.Index(GeometryArray(np.asarray(keys, dtype=object), crs=self._crs))
        out = pd.Series(counts, index=idx, name="count")
        return out.sort_values(ascending=False, kind="stable")

    def __array__(self, dtype=None, copy=None):
        return self._data if dtype in (None, object) else self._data.astype(dtype)

    def __arrow_array__(self, type=None):
        # pa.Table.from_pandas on a geometry-dtyped frame lands on the
        # engine's canonical Arrow encoding directly
        return pa.array(list(self._data), type=type or pa.large_binary())

    def __eq__(self, other):
        if isinstance(other, GeometryArray):
            other = other._data
        elif isinstance(other, (bytes, bytearray)) or other is None:
            # NOT np.full — numpy expands bytes as a sequence of ints
            other = [other] * len(self)
        elif not hasattr(other, "__len__"):
            # non-geometry scalar: nothing matches (pandas eq semantics)
            return np.zeros(len(self), dtype=bool)
        elif len(other) != len(self):
            raise ValueError(
                f"Lengths must match: {len(self)} vs {len(other)}"
            )
        return np.array(
            [a == b and a is not None for a, b in zip(self._data, other)], dtype=bool
        )

    def __ne__(self, other):
        return ~self.__eq__(other)

    def __contains__(self, item) -> bool:
        if isna(item):
            return bool(self.isna().any())
        return bool(self.__eq__(item).any())

    def _formatter(self, boxed=False):
        def fmt(v):
            if v is None:
                return "None"
            w = _wkt.to_wkt(self._geoms_of([v]), rounding_precision=3)[0]
            return w if len(w) <= 60 else w[:57] + "..."

        return fmt

    def astype(self, dtype, copy=True):
        # reference array.py:541 — to string means WKT, not repr(bytes)
        if isinstance(dtype, GeometryDtype):
            return self.copy() if copy else self
        d = pd.api.types.pandas_dtype(dtype)
        if d == np.dtype(object):
            # object means the scalars themselves (WKB bytes) — NOT a
            # lossy WKT rendering (is_string_dtype is True for object!)
            return self._data.copy() if copy else self._data
        if dtype in (str, "str"):
            return np.asarray(self.to_wkt(), dtype=object)
        if pd.api.types.is_string_dtype(d) and not isinstance(d, pd.CategoricalDtype):
            return pd.array(self.to_wkt(), dtype=d)
        return super().astype(dtype, copy=copy)

    # --- geometry math (shared kernels; driver-sized arrays) -----------
    @staticmethod
    def _geoms_of(data) -> "_wkb.Geoms":
        return _wkb.from_wkb(pa.array(list(data), type=pa.large_binary()))

    def _geoms(self) -> "_wkb.Geoms":
        return self._geoms_of(self._data)

    @property
    def area(self) -> np.ndarray:
        return K.area(self._geoms())

    @property
    def length(self) -> np.ndarray:
        return K.length(self._geoms())

    @property
    def bounds(self) -> np.ndarray:
        return K.bounds(self._geoms())

    @property
    def total_bounds(self) -> np.ndarray:
        return K.total_bounds(self._geoms())

    @property
    def geom_type(self) -> np.ndarray:
        return np.asarray(K.geom_type(self._geoms()), dtype=object)

    @property
    def is_empty(self) -> np.ndarray:
        g = self._geoms()
        return np.array(
            [int(g.row_types[i]) != 0 and g.row_part_range(i)[0] == g.row_part_range(i)[1]
             for i in range(len(g))],
            dtype=bool,
        )

    @property
    def x(self) -> np.ndarray:
        g = self._geoms()
        if any(t not in (0, _wkb.POINT) for t in np.asarray(g.row_types)):
            raise ValueError("x attribute access only provided for Point geometries")
        return K.bounds(g)[:, 0]

    @property
    def y(self) -> np.ndarray:
        g = self._geoms()
        if any(t not in (0, _wkb.POINT) for t in np.asarray(g.row_types)):
            raise ValueError("y attribute access only provided for Point geometries")
        return K.bounds(g)[:, 1]

    @property
    def centroid(self) -> "GeometryArray":
        g = self._geoms()
        cx, cy = K.centroid(g)
        wk = _wkb.points_to_wkb(cx, cy).to_pylist()
        out = [
            None if (v is None or np.isnan(cx[i])) else wk[i]
            for i, v in enumerate(self._data)
        ]
        return GeometryArray(out, crs=self._crs)

    def to_crs(self, crs) -> "GeometryArray":
        """reference array.py:385 — driver-side reprojection through the
        same registered transforms crs.to_crs uses on Datasets."""
        from .crs import _resolve_transform

        if self._crs is None:
            raise ValueError(
                "Cannot transform naive geometries. Please set a crs first."
            )
        fn = _resolve_transform(str(self._crs), str(crs))
        if fn is None:
            raise NotImplementedError(f"no transform {self._crs} -> {crs}")
        g = self._geoms()
        x2, y2 = fn(g.coords[:, 0], g.coords[:, 1])
        g.coords = np.column_stack(
            [np.asarray(x2, dtype=np.float64), np.asarray(y2, dtype=np.float64)]
        )
        return GeometryArray(_wkb.to_wkb(g), crs=crs)

    def to_wkt(self, rounding_precision: int = 6) -> list[str | None]:
        return _wkt.to_wkt(self._geoms(), rounding_precision=rounding_precision)

    def to_wkb(self, hex: bool = False):
        if hex:
            return np.array(
                [v.hex().upper() if v is not None else None for v in self._data],
                dtype=object,
            )
        return self._data.copy()


@pd.api.extensions.register_series_accessor("geo")
class GeoAccessor:
    """``series.geo.<op>`` on a geometry-dtyped pandas Series — the
    GeoSeries-method surface for frames produced by
    ``GeoDataset.to_pandas(geometry_dtype=True)`` (driver-sized by
    contract; dataset-scale work stays on the GeoDataset facade)."""

    def __init__(self, s: pd.Series):
        if not isinstance(s.array, GeometryArray):
            raise AttributeError(
                ".geo accessor requires a geometry-dtyped Series "
                "(GeoDataset.to_pandas(geometry_dtype=True))"
            )
        self._s = s

    @property
    def _arr(self) -> GeometryArray:
        return self._s.array

    @property
    def crs(self):
        return self._arr.crs

    @property
    def area(self) -> pd.Series:
        return pd.Series(self._arr.area, index=self._s.index, name="area")

    @property
    def length(self) -> pd.Series:
        return pd.Series(self._arr.length, index=self._s.index, name="length")

    @property
    def x(self) -> pd.Series:
        return pd.Series(self._arr.x, index=self._s.index, name="x")

    @property
    def y(self) -> pd.Series:
        return pd.Series(self._arr.y, index=self._s.index, name="y")

    @property
    def geom_type(self) -> pd.Series:
        return pd.Series(self._arr.geom_type, index=self._s.index, name="geom_type")

    @property
    def bounds(self) -> pd.DataFrame:
        b = self._arr.bounds
        return pd.DataFrame(
            b, columns=["minx", "miny", "maxx", "maxy"], index=self._s.index
        )

    @property
    def total_bounds(self) -> np.ndarray:
        return self._arr.total_bounds

    @property
    def centroid(self) -> pd.Series:
        return pd.Series(self._arr.centroid, index=self._s.index, name="centroid")

    def to_crs(self, crs) -> pd.Series:
        return pd.Series(self._arr.to_crs(crs), index=self._s.index, name=self._s.name)

    def to_wkt(self, rounding_precision: int = 6) -> pd.Series:
        return pd.Series(
            self._arr.to_wkt(rounding_precision), index=self._s.index, name=self._s.name
        )


# --- module constructors (reference array.py:118-255) -------------------


def from_wkb(data, crs=None) -> GeometryArray:
    vals = [None if isna(v) else bytes(v) for v in data]
    return GeometryArray(np.asarray(vals, dtype=object), crs=crs)


def to_wkb(geoms: GeometryArray, hex: bool = False):
    return geoms.to_wkb(hex=hex)


def from_wkt(data, crs=None) -> GeometryArray:
    g = _wkt.from_wkt([None if isna(v) else str(v) for v in data])
    return GeometryArray(_wkb.to_wkb(g), crs=crs)


def to_wkt(geoms: GeometryArray, rounding_precision: int = 6):
    return np.asarray(geoms.to_wkt(rounding_precision), dtype=object)


def points_from_xy(x, y, z=None, crs=None) -> GeometryArray:
    """reference array.py:210 (z is accepted and dropped — the engine is
    2D; same Z handling as from_wkb)."""
    xa = np.asarray(x, dtype=np.float64)
    ya = np.asarray(y, dtype=np.float64)
    return GeometryArray(_wkb.points_to_wkb(xa, ya), crs=crs)
