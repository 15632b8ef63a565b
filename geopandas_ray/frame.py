"""GeoPandas-shaped fluent facade over ``ray.data.Dataset``.

A user of the reference writes ``gdf.buffer(10).area`` / ``gdf.sjoin(zones)``
/ ``gdf.dissolve("region")``. This module gives that surface over the
engine: :class:`GeoDataset` wraps a Dataset (geometry carried as WKB in an
Arrow ``large_binary`` column, SURVEY.md §1.3) and delegates every method to
the corresponding stage, so the fluent API and the functional stage API are
the same physical plans.

Conventions (documented deviations from pandas-object semantics):
- scalar-out accessors (``area()``, ``length()``, ``is_valid()``, ...)
  APPEND the named column and return the GeoDataset — a distributed engine
  has no free-floating Series; select_columns() narrows when needed.
- geometry-out operations (``buffer``, ``centroid``, ``simplify``, ...)
  REPLACE the active geometry column and return a GeoDataset, matching the
  ``gdf.geometry = gdf.buffer(...)`` idiom in one step.
- ``cx`` is a real 2-D slice indexer: ``gd.cx[x0:x1, y0:y1]``.
- anything not defined here falls through to the wrapped Dataset
  (``count``, ``take_batch``, ``map_batches``, ``write_parquet``, ...).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .stages import ops as _ops
from .stages import ops2 as _ops2
from .stages import ops3 as _ops3


def _swap_geometry(ds: ray.data.Dataset, tmp: str, geometry: str) -> ray.data.Dataset:
    """Drop the old geometry column and rename ``tmp`` into its place."""

    def f(b: pa.Table) -> pa.Table:
        b = b.drop_columns([geometry])
        return b.rename_columns([geometry if c == tmp else c for c in b.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def concat(objs, axis: int = 0) -> "GeoDataset":
    """pandas.concat analog over GeoDatasets/Datasets (reference CRS rules
    on axis=0; duplicate-geometry ValueError on axis=1)."""
    from .stages.merge import concat_columns, concat_rows

    dss, crss, gcols = [], [], []
    for o in objs:
        if isinstance(o, GeoDataset):
            dss.append(o.ds)
            crss.append(o.crs)
            gcols.append(o.geometry)
        else:
            dss.append(o)
            crss.append(None)
            gcols.append("geometry" if "geometry" in o.schema().names else None)
    out_crs = next((c for c in crss if c is not None), None)
    if axis == 1:
        # the ACTIVE geometry of the zipped frame is the first input's
        # (duplicate geometry names already raise inside concat_columns)
        out_geom = next((g for g in gcols if g is not None), "geometry")
        return GeoDataset(concat_columns(dss, geometry_cols=gcols), geometry=out_geom,
                          crs=out_crs)
    return GeoDataset(concat_rows(dss, crs_list=crss), crs=out_crs)


class _CxIndexer:
    """``gd.cx[xmin:xmax, ymin:ymax]`` bbox-intersects row filter
    (base.py:5514)."""

    def __init__(self, gd: "GeoDataset"):
        self._gd = gd

    def __getitem__(self, key):
        xs, ys = key
        inf = float("inf")
        minx = -inf if xs.start is None else xs.start
        maxx = inf if xs.stop is None else xs.stop
        miny = -inf if ys.start is None else ys.start
        maxy = inf if ys.stop is None else ys.stop
        g = self._gd
        return g._wrap(_ops.cx_filter(g.ds, minx, miny, maxx, maxy, geometry=g.geometry))


class GeoDataset:
    """Fluent GeoPandas-style surface over a Dataset with a WKB geometry
    column. See the module docstring for return conventions."""

    def __init__(self, ds: ray.data.Dataset, geometry: str = "geometry", crs=None):
        self.ds = ds
        self.geometry = geometry
        self.crs = crs
        self._sindex = None

    # --- construction / IO --------------------------------------------
    @classmethod
    def read_parquet(cls, path, geometry: str = "geometry", crs=None, **kw) -> "GeoDataset":
        from .sources.geoparquet import read_geoparquet

        return cls(read_geoparquet(path, geometry=geometry, **kw), geometry=geometry, crs=crs)

    @classmethod
    def read_file(cls, path, geometry: str = "geometry", **kw) -> "GeoDataset":
        from .sources.geojson import read_file

        return cls(read_file(path, **kw), geometry=geometry)

    @classmethod
    def read_feather(cls, path, geometry: str = "geometry", **kw) -> "GeoDataset":
        from .sources.feather import read_feather

        return cls(read_feather(path, **kw), geometry=geometry)

    @classmethod
    def read_postgis(cls, sql, con_factory, geometry: str = "geometry",
                     crs=None, **kw) -> "GeoDataset":
        """Reference geodataframe.py from_postgis / io/sql.py:158 — sharded
        DB-API read (``shard_col=`` fans out range shards)."""
        from .sources.sql import read_postgis

        return cls(read_postgis(sql, con_factory, geometry=geometry, **kw),
                   geometry=geometry, crs=crs)

    @classmethod
    def from_xy(
        cls, ds: ray.data.Dataset, x: str = "x", y: str = "y", geometry: str = "geometry", crs=None
    ) -> "GeoDataset":
        """points_from_xy over columns (geoseries.py from_xy): appends a
        point-WKB geometry column built from the x/y columns."""
        from .geom.wkb import points_to_wkb

        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                geometry,
                points_to_wkb(
                    np.asarray(b.column(x), dtype=np.float64),
                    np.asarray(b.column(y), dtype=np.float64),
                ),
            )

        return cls(ds.map_batches(f, batch_format="pyarrow"), geometry=geometry, crs=crs)

    @classmethod
    def from_wkt(
        cls, ds: ray.data.Dataset, column: str = "wkt", geometry: str = "geometry", crs=None
    ) -> "GeoDataset":
        """GeoSeries.from_wkt over a string column -> WKB geometry column."""
        from .geom.wkb import to_wkb
        from .geom.wkt import from_wkt

        def f(b: pa.Table) -> pa.Table:
            return b.append_column(geometry, to_wkb(from_wkt(b.column(column).to_pylist())))

        return cls(ds.map_batches(f, batch_format="pyarrow"), geometry=geometry, crs=crs)

    @classmethod
    def from_features(cls, features, geometry: str = "geometry", crs=None) -> "GeoDataset":
        from .sources.geojson import from_features

        return cls(ray.data.from_arrow(from_features(list(features), geometry=geometry)),
                   geometry=geometry, crs=crs)

    @classmethod
    def from_dict(cls, data: dict, geometry: str = "geometry", crs=None) -> "GeoDataset":
        """GeoDataFrame.from_dict: dict of columns; the geometry column
        accepts WKB bytes / GeoJSON dicts / WKT strings per row."""
        from .sources.geojson import from_dict

        return cls(ray.data.from_arrow(from_dict(data, geometry=geometry)),
                   geometry=geometry, crs=crs)

    @classmethod
    def from_pandas(cls, df, geometry: str = "geometry", crs=None) -> "GeoDataset":
        """A pandas DataFrame whose geometry column is either WKB bytes
        (object) or the engine's pandas ``GeometryArray`` extension dtype
        (reference array.py) — the inverse of
        ``to_pandas(geometry_dtype=True)``."""
        from .array import GeometryArray

        col = df[geometry] if geometry in df.columns else None
        if col is not None and isinstance(col.array, GeometryArray):
            crs = crs or col.array.crs
            # GeometryArray.__arrow_array__ encodes straight to large_binary
            t = pa.Table.from_pandas(df, preserve_index=False)
            return cls(ray.data.from_arrow(t), geometry=geometry, crs=crs)
        return cls(ray.data.from_pandas(df), geometry=geometry, crs=crs)

    def to_pandas(self, limit: int | None = None, geometry_dtype: bool = False):
        """Pull to a driver-sized pandas DataFrame. ``geometry_dtype=True``
        boxes the geometry column as the pandas extension dtype
        ``geometry`` (GeometryArray — reference array.py:256), carrying
        the CRS, so pandas-side groupby/unique/concat see a first-class
        geometry column instead of raw bytes."""
        df = self.ds.to_pandas(limit) if limit is not None else self.ds.to_pandas()
        if geometry_dtype and self.geometry in df.columns:
            from .array import GeometryArray

            df[self.geometry] = pd.Series(
                GeometryArray(
                    np.asarray(
                        [None if v is None else bytes(v) for v in df[self.geometry]],
                        dtype=object,
                    ),
                    crs=self.crs,
                ),
                index=df.index,
            )
        return df

    @classmethod
    def from_wkb(
        cls, ds: ray.data.Dataset, column: str = "wkb", geometry: str = "geometry", crs=None
    ) -> "GeoDataset":
        """GeoSeries.from_wkb over a binary column: parse + re-encode through
        the decoder (normalizes endianness / type codes) into the canonical
        geometry encoding."""
        from .geom.wkb import from_wkb as _dec
        from .geom.wkb import to_wkb as _enc

        def f(b: pa.Table) -> pa.Table:
            arr = _enc(_dec(b.column(column)))
            if column == geometry:
                return b.set_column(b.column_names.index(column), geometry, arr)
            return b.append_column(geometry, arr)

        return cls(ds.map_batches(f, batch_format="pyarrow"), geometry=geometry, crs=crs)

    @classmethod
    def from_arrow(
        cls, ds: ray.data.Dataset, encoding: str, geometry: str = "geometry", crs=None
    ) -> "GeoDataset":
        """GeoSeries.from_arrow: decode a GeoArrow-native nested-list column
        (any of the 6 encodings) into WKB geometry."""
        from .sources.geoarrow import from_geoarrow

        return cls(from_geoarrow(ds, encoding, geometry=geometry), geometry=geometry, crs=crs)

    def to_wkt(self, rounding_precision: int | None = 6, out: str = "wkt") -> "GeoDataset":
        """Append a WKT string column (GeoSeries.to_wkt).

        ``rounding_precision=None`` consults ``geopandas_ray.options
        .display_precision`` (reference ``_config.py`` — the display surface;
        our lazy frame repr never renders coordinates, so WKT materialization
        is where display precision applies), falling back to 6."""
        from .geom.wkb import from_wkb
        from .geom.wkt import to_wkt

        if rounding_precision is None:
            from ._config import options

            dp = options.display_precision
            rounding_precision = 6 if dp is None else dp
        geometry = self.geometry

        def f(b: pa.Table) -> pa.Table:
            w = to_wkt(from_wkb(b.column(geometry)), rounding_precision=rounding_precision)
            return b.append_column(out, pa.array(w, type=pa.large_string()))

        return self._wrap(self.ds.map_batches(f, batch_format="pyarrow"))

    def to_json(self, out: str = "feature_json") -> "GeoDataset":
        """Append a GeoJSON Feature string column per row."""
        from .sources.geojson import to_json_column

        return self._wrap(to_json_column(self.ds, geometry=self.geometry, out=out))

    def to_wkb(self, out: str = "wkb") -> "GeoDataset":
        """GeoSeries.to_wkb: geometry is already canonical WKB — append a
        zero-copy alias column named ``out``."""
        geometry = self.geometry

        def f(b: pa.Table) -> pa.Table:
            return b.append_column(out, b.column(geometry))

        return self._wrap(self.ds.map_batches(f, batch_format="pyarrow"))

    def to_arrow(self, encoding: str | None = None, interleaved: bool = True) -> ray.data.Dataset:
        """GeoSeries.to_arrow: encode the geometry column as GeoArrow native
        nested lists (returns a plain Dataset — the column is no longer WKB)."""
        from .sources.geoarrow import to_geoarrow

        return to_geoarrow(self.ds, encoding=encoding, geometry=self.geometry,
                           interleaved=interleaved)

    def to_geo_dict(self, na: str = "null", show_bbox: bool = False) -> dict:
        """FeatureCollection dict (geodataframe.py:638). Driver-sized by
        definition — use iterfeatures()/to_file() for large data."""
        from .sources.geojson import to_geo_dict

        return to_geo_dict(self.ds, geometry=self.geometry, na=na, show_bbox=show_bbox)

    def iterfeatures(self, na: str = "null", show_bbox: bool = False):
        """Streaming generator of GeoJSON Feature dicts (geodataframe.py:667);
        iterates block by block, never materializing the dataset."""
        from .sources.geojson import iterfeatures

        return iterfeatures(self.ds, geometry=self.geometry, na=na, show_bbox=show_bbox)

    @property
    def __geo_interface__(self) -> dict:
        return self.to_geo_dict(show_bbox=True)

    def to_parquet(self, path, **kw):
        from .sources.geoparquet import write_geoparquet

        return write_geoparquet(self.ds, path, geometry=self.geometry, crs=self.crs, **kw)

    def to_feather(self, path, **kw):
        from .sources.feather import write_feather

        return write_feather(self.ds, path, geometry=self.geometry, crs=self.crs, **kw)

    def to_file(self, path, **kw):
        from .sources.geojson import to_file

        return to_file(self.ds, path, geometry=self.geometry, **kw)

    def to_postgis(self, name, con_factory, **kw):
        """Reference geodataframe.py to_postgis -> io/sql.py:199 — parallel
        DB-API insert from worker-owned connections."""
        from .sources.sql import write_postgis

        return write_postgis(self.ds, name, con_factory,
                             geometry=self.geometry, **kw)

    # --- plumbing ------------------------------------------------------
    def _wrap(self, ds: ray.data.Dataset, crs=None) -> "GeoDataset":
        return GeoDataset(ds, geometry=self.geometry, crs=self.crs if crs is None else crs)

    def _append(self, fn, **kw) -> "GeoDataset":
        return self._wrap(fn(self.ds, geometry=self.geometry, **kw))

    def _replace(self, fn, **kw) -> "GeoDataset":
        """Geometry-out stage that appends ``out`` -> swap into geometry."""
        tmp = "__newgeom"
        return self._wrap(
            _swap_geometry(fn(self.ds, geometry=self.geometry, out=tmp, **kw), tmp, self.geometry)
        )

    def _inplace(self, fn, *a, **kw) -> "GeoDataset":
        """Stage that already replaces the geometry column in place."""
        return self._wrap(fn(self.ds, *a, geometry=self.geometry, **kw))

    def __getattr__(self, name):
        # fall through to the wrapped Dataset (count, take, schema, ...)
        return getattr(self.ds, name)

    def __repr__(self):
        return f"GeoDataset({self.ds!r}, geometry={self.geometry!r}, crs={self.crs!r})"

    # --- scalar-out accessors (append column) --------------------------
    def area(self):
        return self._append(_ops.with_area)

    def length(self):
        return self._append(_ops.with_length)

    def bounds(self):
        return self._append(_ops.with_bounds)

    def geom_type(self):
        return self._append(_ops.with_geom_type)

    def is_empty(self):
        return self._append(_ops.with_is_empty)

    def is_valid(self):
        return self._append(_ops2.with_is_valid)

    def is_valid_reason(self):
        return self._append(_ops3.with_is_valid_reason)

    def count_coordinates(self):
        return self._append(_ops.with_counts)

    count_geometries = count_coordinates  # with_counts emits both columns

    def count_interior_rings(self):
        return self._append(_ops3.with_count_interior_rings)

    def get_precision(self):
        return self._append(_ops2.with_get_precision)

    def minimum_clearance(self):
        return self._append(_ops3.with_minimum_clearance)

    def x(self):
        return self._append(_ops.with_xy)

    y = x  # with_xy emits both columns

    def z(self):
        return self._append(_ops3.with_z)

    def ring_flags(self):
        """is_simple / is_ring / is_ccw / is_closed / has_z columns."""
        return self._append(_ops2.with_ring_flags)

    is_simple = is_ring = is_ccw = is_closed = has_z = ring_flags

    def isna(self):
        return self._append(_ops3.geom_isna)

    def notna(self):
        return self._append(_ops3.geom_notna)

    isnull = isna  # geoseries.py isnull/notnull deprecated aliases
    notnull = notna

    def minimum_bounding_radius(self):
        """Appends mbc_x / mbc_y / minimum_bounding_radius columns
        (base.py:1542; the circle is fully described by center + radius —
        documented deviation: no approximation polygon is emitted)."""
        return self._append(_ops2.with_min_bounding_circle)

    minimum_bounding_circle = minimum_bounding_radius

    def hilbert_distance(self, total_bounds, level: int = 15):
        return self._append(_ops.with_hilbert, total_bounds=total_bounds, level=level)

    # --- geometry-out (replace geometry) --------------------------------
    def centroid(self):
        return self._replace(_ops.with_centroid)

    def envelope(self):
        return self._replace(_ops.with_envelope)

    def boundary(self):
        return self._replace(_ops2.with_boundary)

    def convex_hull(self):
        return self._replace(_ops2.with_convex_hull)

    def concave_hull(self, ratio: float = 0.5, allow_holes: bool = False):
        return self._replace(_ops3.with_concave_hull, ratio=ratio, allow_holes=allow_holes)

    def exterior(self):
        return self._replace(_ops3.with_exterior)

    def interiors(self):
        return self._replace(_ops3.with_interiors)

    def extract_unique_points(self):
        return self._replace(_ops3.extract_unique_points)

    def representative_point(self):
        return self._replace(_ops2.with_representative_point)

    def minimum_rotated_rectangle(self):
        return self._replace(_ops2.with_min_rotated_rect)

    def buffer(self, distance: float, quad_segs: int = 16, cap_style: str = "round",
               join_style: str = "round", mitre_limit: float = 5.0,
               single_sided: bool = False):
        return self._inplace(_ops2.buffer, distance, quad_segs=quad_segs,
                             cap_style=cap_style, join_style=join_style,
                             mitre_limit=mitre_limit, single_sided=single_sided)

    def simplify(self, tolerance: float):
        return self._inplace(_ops2.simplify, tolerance)

    def segmentize(self, max_segment_length: float):
        return self._inplace(_ops2.segmentize, max_segment_length)

    def remove_repeated_points(self, tolerance: float = 0.0):
        return self._inplace(_ops2.remove_repeated_points, tolerance)

    def reverse(self):
        return self._inplace(_ops2.reverse)

    def normalize(self):
        return self._inplace(_ops2.normalize)

    def set_precision(self, grid_size: float):
        return self._inplace(_ops2.set_precision, grid_size)

    def force_2d(self):
        return self._inplace(_ops2.force_2d)

    def force_3d(self, z: float = 0.0):
        return self._inplace(_ops3.force_3d, z=z)

    def make_valid(self):
        return self._inplace(_ops3.make_valid)

    def line_merge(self):
        return self._inplace(_ops2.line_merge)

    def offset_curve(self, distance: float, quad_segs: int = 8,
                     join_style: str = "round", mitre_limit: float = 5.0):
        return self._inplace(_ops3.offset_curve, distance, quad_segs=quad_segs,
                             join_style=join_style, mitre_limit=mitre_limit)

    def transform(self, fn):
        return self._inplace(_ops3.transform_coords, fn)

    def fillna(self, value=None):
        return self._inplace(_ops3.geom_fillna, value=value)

    def dropna(self):
        return self._inplace(_ops3.geom_dropna)

    def affine_transform(self, a, b, d, e, xoff, yoff):
        return self._inplace(_ops.affine_transform, a, b, d, e, xoff, yoff)

    def translate(self, xoff=0.0, yoff=0.0):
        return self._inplace(_ops.translate, xoff=xoff, yoff=yoff)

    def scale(self, xfact=1.0, yfact=1.0, origin=(0.0, 0.0)):
        return self._inplace(_ops.scale, xfact=xfact, yfact=yfact, origin=origin)

    def rotate(self, angle, origin=(0.0, 0.0), use_radians=False):
        return self._inplace(_ops.rotate, angle, origin=origin, use_radians=use_radians)

    def skew(self, xs=0.0, ys=0.0, origin=(0.0, 0.0), use_radians=False):
        return self._inplace(_ops.skew, xs=xs, ys=ys, origin=origin, use_radians=use_radians)

    def interpolate(self, distance: float, normalized: bool = False):
        return self._replace(_ops2.interpolate, distance=distance, normalized=normalized)

    def sample_points(self, size: int, seed: int = 42):
        return self._replace(_ops2.sample_points, size=size, seed=seed)

    def get_geometry(self, index: int):
        return self._replace(_ops2.get_geometry, index=index)

    def delaunay_triangles(self):
        return self._replace(_ops2.delaunay_triangles)

    def voronoi_polygons(self, extend_to=None):
        return self._replace(_ops2.voronoi_polygons, extend_to=extend_to)

    def polygonize(self):
        return self._replace(_ops3.polygonize)

    def build_area(self):
        return self._replace(_ops3.build_area)

    # --- element-wise binary vs `other` ---------------------------------
    @staticmethod
    def _check_operand(other):
        """Element-wise binaries align rows of ONE table: `other` must be a
        second geometry column of self (str) or a broadcast WKB scalar
        (bytes). A GeoDataset/Dataset operand needs a join — resolving its
        geometry column NAME against self's table would silently compute
        self-vs-self (ADVICE r2)."""
        if isinstance(other, (GeoDataset, ray.data.Dataset)):
            raise TypeError(
                "element-wise binary ops take a column name or WKB bytes; "
                "for two datasets use sjoin/sjoin_nearest (row alignment "
                "across distributed tables is a join, not a column ref)"
            )
        return other

    def _binary(self, fn, other, **kw):
        return self._wrap(fn(self.ds, self._check_operand(other), geometry=self.geometry, **kw))

    def intersects(self, other, **kw):
        return self.predicate("intersects", other, **kw)

    def predicate(self, name: str, other, **kw):
        from .stages.binary import binary_predicate

        return self._wrap(
            binary_predicate(self.ds, name, self._check_operand(other), geometry=self.geometry, **kw)
        )

    def within(self, other):
        return self.predicate("within", other)

    def contains(self, other):
        return self.predicate("contains", other)

    def touches(self, other):
        return self.predicate("touches", other)

    def crosses(self, other):
        return self.predicate("crosses", other)

    def overlaps(self, other):
        return self.predicate("overlaps", other)

    def covers(self, other):
        return self.predicate("covers", other)

    def covered_by(self, other):
        return self.predicate("covered_by", other)

    def disjoint(self, other):
        return self.predicate("disjoint", other)

    def geom_equals(self, other):
        return self.predicate("geom_equals", other)

    def contains_properly(self, other):
        return self.predicate("contains_properly", other)

    def dwithin(self, other, distance: float | str):
        """base.py:2294-2297 — ``distance`` is a scalar or a column name
        (per-row radii, the distributed analog of an aligned array)."""
        return self.predicate("dwithin", other, distance=distance)

    def distance(self, other, **kw):
        from .stages.binary import binary_distance

        return self._binary(binary_distance, other, **kw)

    def relate(self, other, **kw):
        from .stages.binary import binary_relate

        return self._binary(binary_relate, other, **kw)

    def relate_pattern(self, other, pattern: str, **kw):
        from .stages.binary import binary_relate_pattern

        return self._wrap(
            binary_relate_pattern(
                self.ds, pattern, self._check_operand(other), geometry=self.geometry, **kw
            )
        )

    def geom_almost_equals(self, other, decimal: int = 6):
        """Deprecated reference alias (base.py geom_almost_equals ->
        geom_equals_exact(tolerance=0.5 * 10**-decimal))."""
        from .stages.binary import binary_geom_almost_equals

        return self._binary(binary_geom_almost_equals, other, decimal=decimal)

    def intersection(self, other):
        from .stages.binary import binary_intersection

        tmp = "__newgeom"
        out = binary_intersection(self.ds, other, geometry=self.geometry, out=tmp)
        return self._wrap(_swap_geometry(out, tmp, self.geometry))

    def difference(self, other):
        from .stages.binary import binary_difference

        tmp = "__newgeom"
        out = binary_difference(self.ds, other, geometry=self.geometry, out=tmp)
        return self._wrap(_swap_geometry(out, tmp, self.geometry))

    def union(self, other):
        from .stages.binary import binary_union

        tmp = "__newgeom"
        out = binary_union(self.ds, other, geometry=self.geometry, out=tmp)
        return self._wrap(_swap_geometry(out, tmp, self.geometry))

    def symmetric_difference(self, other):
        from .stages.binary import binary_symmetric_difference

        tmp = "__newgeom"
        out = binary_symmetric_difference(self.ds, other, geometry=self.geometry, out=tmp)
        return self._wrap(_swap_geometry(out, tmp, self.geometry))

    def hausdorff_distance(self, other, **kw):
        from .stages.binary import binary_hausdorff

        return self._binary(binary_hausdorff, other, **kw)

    def frechet_distance(self, other, **kw):
        from .stages.binary import binary_frechet

        return self._binary(binary_frechet, other, **kw)

    def shortest_line(self, other, **kw):
        from .stages.binary import binary_shortest_line

        return self._binary(binary_shortest_line, other, **kw)

    def project(self, other, normalized: bool = False):
        from .stages.binary import binary_project

        return self._binary(binary_project, other, normalized=normalized)

    def snap(self, other, tolerance: float):
        from .stages.binary import binary_snap

        return self._binary(binary_snap, other, tolerance=tolerance)

    def shared_paths(self, other, **kw):
        from .stages.binary import binary_shared_paths

        return self._binary(binary_shared_paths, other, **kw)

    def geom_equals_exact(self, other, tolerance: float = 0.0):
        from .stages.binary import binary_geom_equals_exact

        return self._binary(binary_geom_equals_exact, other, tolerance=tolerance)

    # --- joins / table ops ----------------------------------------------
    @staticmethod
    def _right_side(right):
        if isinstance(right, GeoDataset):
            return right.ds
        return right

    def sjoin(self, right, how: str = "inner", predicate: str = "intersects", **kw):
        from .stages.sjoin import sjoin

        return self._wrap(sjoin(self.ds, self._right_side(right), how=how, predicate=predicate, **kw))

    def sjoin_shuffle(self, right, predicate: str = "intersects", **kw):
        from .stages.sjoin import sjoin_shuffle

        return self._wrap(
            sjoin_shuffle(self.ds, self._right_side(right), predicate=predicate, **kw)
        )

    def sjoin_nearest(self, right, **kw):
        from .stages.nearest import sjoin_nearest

        return self._wrap(sjoin_nearest(self.ds, self._right_side(right), **kw))

    def sjoin_nearest_shuffle(self, right, **kw):
        """Cell-partitioned nearest join for two large sides (bounded or
        unbounded via max_distance; point or general geometries on either
        side; ``salt`` for dense-cell straggler relief)."""
        from .stages.nearest import sjoin_nearest_shuffle

        return self._wrap(sjoin_nearest_shuffle(self.ds, self._right_side(right), **kw))

    def merge(self, right, on: str, how: str = "inner", broadcast: bool | None = None, **kw):
        """pandas-style attribute equi-join (GeoDataFrame inherits
        DataFrame.merge). A pa.Table / pandas right side broadcasts
        (dimension lookup); a Dataset right side takes the partitioned
        hash join (one shuffle, any size). ``broadcast=True`` forces the
        broadcast plan for a small Dataset."""
        from .stages.merge import broadcast_join, hash_join
        from .util import pull_table

        rds = self._right_side(right)
        if not isinstance(rds, ray.data.Dataset):
            if not isinstance(rds, pa.Table):
                rds = pa.Table.from_pandas(rds, preserve_index=False)
            if how in ("inner", "left"):
                return self._wrap(broadcast_join(self.ds, rds, on=on, how=how, **kw))
            # right/outer need unmatched-right padding the broadcast joiner
            # cannot do — route through the partitioned hash join instead of
            # silently degrading to inner
            return self._wrap(hash_join(self.ds, ray.data.from_arrow(rds), on=on, how=how, **kw))
        if broadcast:
            if how in ("inner", "left"):
                return self._wrap(broadcast_join(self.ds, pull_table(rds), on=on, how=how, **kw))
            return self._wrap(hash_join(self.ds, rds, on=on, how=how, **kw))
        return self._wrap(hash_join(self.ds, rds, on=on, how=how, **kw))

    def merge_asof(self, right, key: str, left_ts: str, right_ts: str | None = None,
                   direction: str = "backward"):
        """As-of join per key (stages/merge.py asof_join)."""
        from .stages.merge import asof_join

        return self._wrap(
            asof_join(self.ds, self._right_side(right), key=key, left_ts=left_ts,
                      right_ts=right_ts or left_ts, direction=direction)
        )

    def dissolve(self, by=None, aggfunc="first", **kw):
        from .stages.dissolve import dissolve

        return self._wrap(dissolve(self.ds, by=by, aggfunc=aggfunc, geometry=self.geometry, **kw))

    def union_all(self, method: str = "unary") -> bytes | None:
        from .stages.dissolve import union_all

        return union_all(self.ds, geometry=self.geometry, method=method)

    def unary_union(self) -> bytes | None:
        """Deprecated reference alias of union_all (base.py:922)."""
        return self.union_all()

    def intersection_all(self) -> bytes | None:
        from .stages.dissolve import intersection_all

        return intersection_all(self.ds, geometry=self.geometry)

    def total_bounds(self) -> np.ndarray:
        from .stages.dissolve import total_bounds

        return total_bounds(self.ds, geometry=self.geometry)

    def drop_duplicates(self, id_col: str | None = None) -> "GeoDataset":
        """One row per distinct geometry (array.py:582 unique / the
        drop_duplicates(subset=geometry) idiom). Byte-exact WKB equality;
        hash-partitioned (functions/geom_dedup.py). Deterministic when
        ``id_col`` orders rows, else arbitrary-first per duplicate set."""
        from .functions.geom_dedup import drop_duplicate_geometries

        return self._wrap(
            drop_duplicate_geometries(self.ds, geometry=self.geometry, id_col=id_col)
        )

    def unique(self, id_col: str | None = None) -> "GeoDataset":
        """Distinct geometries only (array.py:582) — drop_duplicates
        projected to the geometry column."""
        dd = self.drop_duplicates(id_col=id_col)
        return GeoDataset(
            dd.ds.select_columns([self.geometry]), geometry=self.geometry, crs=self.crs
        )

    def value_counts(self) -> ray.data.Dataset:
        """(geometry, count) per distinct geometry (array.py:567) — plain
        Dataset out: count is not a per-row geometry attribute."""
        from .functions.geom_dedup import geometry_value_counts

        return geometry_value_counts(self.ds, geometry=self.geometry)

    def overlay(self, right, how: str = "intersection", *, left_id=None, right_id=None, **kw):
        """overlay with automatic physical-plan selection: when unique id
        columns are given and the right side is a large Dataset, the
        cell-partitioned shuffle plan is used (byte-parity, measured faster
        above OVERLAY_SHUFFLE_THRESHOLD_ROWS=1000 right rows); otherwise
        the broadcast plan."""
        from .stages.overlay import overlay_auto

        return self._wrap(
            overlay_auto(
                self.ds, self._right_side(right), how, left_id=left_id, right_id=right_id, **kw
            )
        )

    def overlay_shuffle(self, right, how: str = "intersection", *, left_id: str, right_id: str, **kw):
        """Cell-partitioned overlay for two LARGE layers (no broadcast);
        byte-parity with overlay. Requires unique id columns on each side."""
        from .stages.overlay import overlay_shuffle

        rds = right.ds if isinstance(right, GeoDataset) else right
        return self._wrap(
            overlay_shuffle(self.ds, rds, how, left_id=left_id, right_id=right_id, **kw)
        )

    def clip(self, mask, keep_geom_type: bool = False, sort: bool = False, sort_col=None):
        from .stages.clip import clip

        return self._wrap(
            clip(
                self.ds,
                mask,
                geometry=self.geometry,
                keep_geom_type=keep_geom_type,
                sort=sort,
                sort_col=sort_col,
            )
        )

    def clip_by_rect(self, xmin, ymin, xmax, ymax):
        from .stages.clip import clip_rect

        return self._wrap(clip_rect(self.ds, xmin, ymin, xmax, ymax, geometry=self.geometry))

    def explode(self, **kw):
        from .stages.explode import explode

        return self._wrap(explode(self.ds, geometry=self.geometry, **kw))

    def get_coordinates(self, **kw):
        from .stages.explode import get_coordinates

        return get_coordinates(self.ds, geometry=self.geometry, **kw)

    # --- CRS --------------------------------------------------------------
    def set_crs(self, crs, allow_override: bool = False) -> "GeoDataset":
        """geoseries.py set_crs semantics: assign, refusing a silent
        override of an existing different CRS."""
        if self.crs is not None and not allow_override and str(self.crs) != str(crs):
            raise ValueError(
                "The GeoDataset already has a CRS which is not equal to the "
                "passed CRS. Use allow_override=True to replace it."
            )
        return GeoDataset(self.ds, geometry=self.geometry, crs=crs)

    def to_crs(self, crs) -> "GeoDataset":
        from .crs import to_crs

        if self.crs is None:
            raise ValueError("Cannot transform naive geometries. Please set a crs first.")
        out = to_crs(self.ds, self.crs, crs, geometry=self.geometry)
        return GeoDataset(out, geometry=self.geometry, crs=crs)

    def estimate_utm_crs(self) -> str:
        """geoseries.py:957: WGS84 UTM code covering the data; feed it
        straight back into to_crs. Requires lon/lat geometry."""
        from .crs import estimate_utm_crs

        if self.crs is not None and str(self.crs) not in ("EPSG:4326", "OGC:CRS84"):
            raise RuntimeError("estimate_utm_crs needs geographic (lon/lat) input")
        return estimate_utm_crs(self.ds, geometry=self.geometry)

    def rename_geometry(self, new_name: str) -> "GeoDataset":
        out = _ops3.rename_geometry(self.ds, new_name, geometry=self.geometry)
        return GeoDataset(out, geometry=new_name, crs=self.crs)

    def set_geometry(self, column: str, drop_old: bool = False) -> "GeoDataset":
        out = _ops3.set_geometry(self.ds, column, out=self.geometry, drop_old=drop_old)
        return GeoDataset(out, geometry=self.geometry, crs=self.crs)

    # --- indexers ----------------------------------------------------------
    @property
    def cx(self) -> _CxIndexer:
        return _CxIndexer(self)

    @property
    def active_geometry_name(self) -> str:
        return self.geometry

    @property
    def sindex(self):
        """Distributed positional spatial index (reference sindex): built
        lazily, materializes the dataset once; query/nearest/intersection
        fan out per block and return positional indices."""
        if self._sindex is None:
            from .stages.sindex import DistributedSpatialIndex

            self._sindex = DistributedSpatialIndex(self.ds, geometry=self.geometry)
        return self._sindex

    @property
    def has_sindex(self) -> bool:
        return self._sindex is not None

    def plot(self, *a, **kw):
        """Reference plotting.py — out of scope: matplotlib is not
        available in this environment (documented exclusion, SURVEY §2.11).
        Raising here beats __getattr__'s confusing Dataset AttributeError."""
        raise NotImplementedError(
            "GeoDataset.plot requires matplotlib (not available here). "
            "Export a bounded result with .to_pandas() or .to_file(...) and "
            "plot it with geopandas/matplotlib outside this engine."
        )

    def explore(self, *a, **kw):
        """Reference explore.py — out of scope: folium/mapclassify are not
        available in this environment (documented exclusion, SURVEY §2.11)."""
        raise NotImplementedError(
            "GeoDataset.explore requires folium (not available here). "
            "Export a bounded result with .to_file('out.geojson') and view "
            "it in an external map client."
        )

    # deprecated reference aliases (kept at the end: `type` shadows the
    # builtin inside the class body from here on)
    from_file = read_file
    type = geom_type


# --------------------------------------------------------------------------
# top-level functional forms (reference tools/: sjoin.py, overlay.py,
# clip.py expose module functions alongside the methods; __init__.py
# re-exports them as geopandas.sjoin / overlay / clip)
# --------------------------------------------------------------------------

def sjoin(left: GeoDataset, right: GeoDataset, how: str = "inner",
          predicate: str = "intersects", **kw) -> GeoDataset:
    """tools/sjoin.py:10 functional form of GeoDataset.sjoin."""
    return left.sjoin(right, how=how, predicate=predicate, **kw)


def sjoin_nearest(left: GeoDataset, right: GeoDataset, **kw) -> GeoDataset:
    """tools/sjoin.py functional form of GeoDataset.sjoin_nearest."""
    return left.sjoin_nearest(right, **kw)


def overlay(df1: GeoDataset, df2: GeoDataset, how: str = "intersection",
            **kw) -> GeoDataset:
    """tools/overlay.py functional form of GeoDataset.overlay."""
    return df1.overlay(df2, how, **kw)


def clip(gdf: GeoDataset, mask, **kw) -> GeoDataset:
    """tools/clip.py functional form of GeoDataset.clip."""
    return gdf.clip(mask, **kw)
