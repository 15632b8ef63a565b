"""GeoJSON encode/decode (reference geodataframe.py:416 from_features,
:573 to_json, :638 __geo_interface__, :667 iterfeatures).

Row-wise dict emit per the reference; implemented as map_batches returning
JSON strings (to_json as a column / whole-batch FeatureCollection) and a
from_features constructor building WKB from geometry dicts.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data

from ..geom.wkb import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geoms,
    from_wkb,
)
from .geoparquet import create_geo_metadata  # noqa: F401  (shared metadata shape)
from ..stages.clip import _parts_to_wkb


def geometry_to_geo_dict(g: Geoms, i: int) -> dict | None:
    t = int(g.row_types[i])
    if t == 0:
        return None
    p0, p1 = g.row_part_range(i)

    def part_coords(p):
        r0, r1 = g.part_ring_range(p)
        pt = int(g.part_types[p])
        if pt == POINT:
            c = g.ring_coords(r0)[0]
            return [float(c[0]), float(c[1])]
        if pt == LINESTRING:
            return [[float(x), float(y)] for x, y in g.ring_coords(r0)]
        return [
            [[float(x), float(y)] for x, y in g.ring_coords(r)] for r in range(r0, r1)
        ]

    parts = [part_coords(p) for p in range(p0, p1)]
    ptypes = [int(g.part_types[p]) for p in range(p0, p1)]
    if t == POINT:
        return {"type": "Point", "coordinates": parts[0] if parts else []}
    if t == LINESTRING:
        return {"type": "LineString", "coordinates": parts[0] if parts else []}
    if t == POLYGON:
        return {"type": "Polygon", "coordinates": parts[0] if parts else []}
    if t == MULTIPOINT:
        return {"type": "MultiPoint", "coordinates": parts}
    if t == MULTILINESTRING:
        return {"type": "MultiLineString", "coordinates": parts}
    if t == MULTIPOLYGON:
        return {"type": "MultiPolygon", "coordinates": parts}
    names = {POINT: "Point", LINESTRING: "LineString", POLYGON: "Polygon"}
    return {
        "type": "GeometryCollection",
        "geometries": [
            {"type": names[pt], "coordinates": c} for pt, c in zip(ptypes, parts)
        ],
    }


def geo_dict_to_wkb(d: dict | None) -> bytes | None:
    if d is None:
        return None
    t = d["type"]
    c = d.get("coordinates")
    if t == "Point":
        return _parts_to_wkb([(POINT, [np.asarray([c], dtype=np.float64)])])
    if t == "LineString":
        return _parts_to_wkb([(LINESTRING, [np.asarray(c, dtype=np.float64)])])
    if t == "Polygon":
        return _parts_to_wkb([(POLYGON, [np.asarray(r, dtype=np.float64) for r in c])])
    # force_multi: a one-part "MultiPolygon" stays MULTIPOLYGON — GeoJSON
    # declares the type explicitly, same OGR-parity rule as the GPX/GML/
    # KML/FGB readers (CLAUDE.md round-5; was a silent type transmutation)
    if t == "MultiPoint":
        return _parts_to_wkb(
            [(POINT, [np.asarray([p], dtype=np.float64)]) for p in c],
            force_multi=True,
        )
    if t == "MultiLineString":
        return _parts_to_wkb(
            [(LINESTRING, [np.asarray(l, dtype=np.float64)]) for l in c],
            force_multi=True,
        )
    if t == "MultiPolygon":
        return _parts_to_wkb(
            [(POLYGON, [np.asarray(r, dtype=np.float64) for r in poly]) for poly in c],
            force_multi=True,
        )
    if t == "GeometryCollection":
        parts = []
        for sub in d["geometries"]:
            st = sub["type"]
            sc = sub["coordinates"]
            if st == "Point":
                parts.append((POINT, [np.asarray([sc], dtype=np.float64)]))
            elif st == "LineString":
                parts.append((LINESTRING, [np.asarray(sc, dtype=np.float64)]))
            elif st == "Polygon":
                parts.append((POLYGON, [np.asarray(r, dtype=np.float64) for r in sc]))
        return _parts_to_wkb(parts)
    raise ValueError(t)


def to_json_column(ds: ray.data.Dataset, geometry="geometry", out="feature_json"):
    """One GeoJSON Feature string per row (iterfeatures semantics)."""

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        props_cols = [c for c in b.column_names if c != geometry]
        props = {c: b.column(c).to_pylist() for c in props_cols}
        vals = []
        for i in range(len(g)):
            vals.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "geometry": geometry_to_geo_dict(g, i),
                        "properties": {c: props[c][i] for c in props_cols},
                    },
                    default=str,
                )
            )
        return b.append_column(out, pa.array(vals, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def from_features(features: list[dict], geometry: str = "geometry") -> pa.Table:
    """GeoDataFrame.from_features analog -> Arrow table with WKB geometry."""
    wkbs = []
    prop_keys: list[str] = []
    for ft in features:
        wkbs.append(geo_dict_to_wkb(ft.get("geometry")))
        for k in (ft.get("properties") or {}):
            if k not in prop_keys:
                prop_keys.append(k)
    cols: dict = {}
    for k in prop_keys:
        cols[k] = pa.array([(ft.get("properties") or {}).get(k) for ft in features])
    cols[geometry] = pa.array(wkbs, type=pa.large_binary())
    return pa.table(cols)


def iterfeatures(ds: ray.data.Dataset, geometry: str = "geometry", na: str = "null",
                 show_bbox: bool = False):
    """geodataframe.py:667 ``iterfeatures``: a GENERATOR of GeoJSON Feature
    dicts. Streams block by block via ``iter_batches`` — never materializes
    the dataset — so it is the scale-safe export path for arbitrarily large
    inputs. ``id`` is the global row position (the engine carries no pandas
    index). ``na``: 'null' / 'keep' emit missing properties as None, 'drop'
    omits the key (reference na semantics)."""
    if na not in ("null", "drop", "keep"):
        raise ValueError(f"Unknown na option {na!r}; use 'null', 'drop' or 'keep'")
    from ..geom import kernels as K

    # Ray orders output bundles by task completion unless preserve_order is
    # set on the dataset's CAPTURED context (mutating the global DataContext
    # after creation is a no-op) — without this the positional 'id' would be
    # nondeterministic on multi-block inputs (same pattern as sindex.py).
    ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
    ds.context.execution_options.preserve_order = True

    pos = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        g = from_wkb(b.column(geometry))
        bb = K.bounds(g) if show_bbox else None
        attrs = [c for c in b.column_names if c != geometry]
        cols = {c: b.column(c).to_pylist() for c in attrs}
        for i in range(b.num_rows):
            props = {c: cols[c][i] for c in attrs}
            if na == "drop":
                props = {k: v for k, v in props.items() if v is not None}
            ft = {
                "id": str(pos),
                "type": "Feature",
                "properties": props,
                "geometry": geometry_to_geo_dict(g, i),
            }
            if show_bbox:
                row = bb[i]
                ft["bbox"] = (
                    None if np.isnan(row).any() else tuple(float(v) for v in row)
                )
            yield ft
            pos += 1


def to_geo_dict(ds: ray.data.Dataset, geometry: str = "geometry", na: str = "null",
                show_bbox: bool = False) -> dict:
    """geodataframe.py:638 ``__geo_interface__`` / to_geo_dict: a
    FeatureCollection dict. DRIVER-SIZED by definition (one Python dict) —
    use :func:`iterfeatures` or :func:`to_file` for large datasets."""
    feats = list(iterfeatures(ds, geometry=geometry, na=na, show_bbox=show_bbox))
    out: dict = {"type": "FeatureCollection", "features": feats}
    if show_bbox:
        from ..stages.dissolve import total_bounds

        tb = total_bounds(ds, geometry=geometry)
        out["bbox"] = tuple(float(v) for v in tb)
    return out


def from_dict(data: dict, geometry: str = "geometry") -> pa.Table:
    """GeoDataFrame.from_dict analog: dict of equal-length columns. The
    geometry column accepts WKB bytes, GeoJSON geometry dicts, or WKT
    strings (mixed per row), plus None."""
    cols: dict = {}
    for k, v in data.items():
        v = list(v)
        if k == geometry:
            vals: list[bytes | None] = []
            for item in v:
                if item is None or isinstance(item, (bytes, bytearray)):
                    vals.append(bytes(item) if item is not None else None)
                elif isinstance(item, dict):
                    vals.append(geo_dict_to_wkb(item))
                elif isinstance(item, str):
                    from ..geom.wkb import to_wkb
                    from ..geom.wkt import from_wkt

                    vals.append(to_wkb(from_wkt([item]))[0].as_py())
                else:
                    raise TypeError(f"geometry value of type {type(item)!r}")
            cols[k] = pa.array(vals, type=pa.large_binary())
        else:
            cols[k] = pa.array(v)
    return pa.table(cols)


def _filter_bbox_mask(t: pa.Table, bbox, mask, geometry: str = "geometry") -> pa.Table:
    """Row filter for read_file(bbox=/mask=): bbox keeps bounds-overlap rows
    (pyogrio bbox semantics); mask keeps exact-intersects rows."""
    from ..geom import kernels as K

    g = from_wkb(t.column(geometry))
    gb = K.bounds(g)
    if bbox is not None:
        minx, miny, maxx, maxy = (float(v) for v in bbox)
        keep = (gb[:, 0] <= maxx) & (gb[:, 2] >= minx) & (gb[:, 1] <= maxy) & (gb[:, 3] >= miny)
    else:
        from ..stages.core import eval_pairs

        mwkb = geo_dict_to_wkb(mask) if isinstance(mask, dict) else bytes(mask)
        mg = from_wkb(pa.array([mwkb], type=pa.large_binary()))
        n = len(g)
        keep = eval_pairs(
            "intersects", g, np.arange(n, dtype=np.int64), mg, np.zeros(n, dtype=np.int64)
        )
    return t.filter(pa.array(np.asarray(keep, dtype=bool)))


def read_file(
    path: str,
    columns: list[str] | None = None,
    rows: int | None = None,
    bbox=None,
    mask=None,
) -> ray.data.Dataset:
    """io/file.py:50 ``read_file`` for the GDAL-free formats this engine can
    parse itself: .geojson / .json FeatureCollections (single file or a
    directory of them). OGR formats (shapefile, GPKG, ...) still need GDAL
    on a real cluster. Supports the reference's ``columns`` / ``rows``
    narrowing and ``bbox`` / ``mask`` row filters (mutually exclusive,
    io/file.py bbox-mask guard); filtering happens per file before the
    ``rows`` slice, like a filtered OGR read.
    """
    import glob
    import os

    if bbox is not None and mask is not None:
        raise ValueError("bbox and mask cannot be used together")
    from .geojsonseq import EXTS as _SEQ_EXTS

    if path.lower().endswith(
        (".shp", ".gpkg", ".fgb", ".gpx", ".gml", ".kml", ".csv") + _SEQ_EXTS
    ):
        if path.lower().endswith(".shp"):
            from .shapefile import read_shapefile as _rd

            ds = _rd(path)
        elif path.lower().endswith(".gpkg"):
            from .geopackage import read_geopackage as _rd

            ds = _rd(path)
        elif path.lower().endswith(".gpx"):
            from .gpx import read_gpx

            ds = read_gpx(path)
        elif path.lower().endswith(".gml"):
            from .gml import read_gml

            ds = read_gml(path)
        elif path.lower().endswith(".kml"):
            from .kml import read_kml

            ds = read_kml(path)
        elif path.lower().endswith(_SEQ_EXTS):
            from .geojsonseq import read_geojsonseq

            ds = read_geojsonseq(path)
        elif path.lower().endswith(".csv"):
            from .csvgeo import read_csv_geo

            ds = read_csv_geo(path)
        else:
            # FlatGeobuf: bbox and columns push DOWN into the reader (the
            # packed R-tree prunes features before any bytes are parsed);
            # the exact post-filter below still applies for mask=
            from .flatgeobuf import read_flatgeobuf

            ds = read_flatgeobuf(
                path,
                columns=columns,
                bbox=tuple(bbox) if bbox is not None else None,
            )
            bbox = None  # already exact (reader applies the precise filter)
            columns = None
        # narrowing stays ON the dataset (streaming), unlike the
        # driver-parsed GeoJSON branch below
        if bbox is not None or mask is not None:
            if "geometry" not in ds.schema().names:
                # a geometry-less CSV read: fail on the driver with the
                # cause, not a KeyError inside a worker task
                raise ValueError(
                    f"read_file: {path!r} has no recognizable geometry "
                    "column, so bbox=/mask= cannot filter it"
                )
            ds = ds.map_batches(
                lambda b: _filter_bbox_mask(b, bbox, mask), batch_format="pyarrow"
            )
        if rows is not None:
            ds = ds.limit(rows)
        if columns is not None:
            schema_names = ds.schema().names
            keep = [c for c in columns if c in schema_names]
            if "geometry" not in keep and "geometry" in schema_names:
                keep.append("geometry")
            ds = ds.select_columns(keep)
        return ds
    if os.path.isdir(path):
        paths = sorted(
            glob.glob(os.path.join(path, "*.geojson")) + glob.glob(os.path.join(path, "*.json"))
        )
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no .geojson/.json files under {path!r}")
    if not all(p.endswith((".geojson", ".json")) for p in paths):
        raise NotImplementedError(
            "read_file parses GeoJSON / GeoJSONSeq (.geojsonl/.ndjson) / "
            "ESRI Shapefile / GeoPackage / FlatGeobuf / GPX / GML / KML "
            "in-sandbox; other OGR formats need GDAL (cluster path)"
        )
    tables = []
    taken = 0
    for p in paths:
        with open(p) as f:
            doc = json.load(f)
        feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
        t = from_features(feats)
        if (bbox is not None or mask is not None) and "geometry" in t.column_names:
            t = _filter_bbox_mask(t, bbox, mask)
        if rows is not None:
            t = t.slice(0, max(0, rows - taken))
            taken += t.num_rows
        if columns is not None:
            keep = [c for c in columns if c in t.column_names]
            if "geometry" not in keep and "geometry" in t.column_names:
                keep.append("geometry")
            t = t.select(keep)
        tables.append(t)
        if rows is not None and taken >= rows:
            break
    return ray.data.from_arrow(tables if len(tables) > 1 else tables[0])


def to_file(ds: ray.data.Dataset, path: str, geometry: str = "geometry") -> list[str]:
    """io/file.py:159 ``to_file``: GeoJSON (one FeatureCollection file per
    block, resumable fragments), or ESRI Shapefile / GeoPackage when the
    path extension says so. Attribute columns become properties."""
    import os

    if path.lower().endswith(".shp"):
        from .shapefile import write_shapefile

        return [write_shapefile(ds, path, geometry=geometry)]
    if path.lower().endswith(".gpkg"):
        from .geopackage import write_geopackage

        return [write_geopackage(ds, path, geometry=geometry)]
    if path.lower().endswith(".fgb"):
        from .flatgeobuf import write_flatgeobuf

        return [write_flatgeobuf(ds, path, geometry=geometry)]
    if path.lower().endswith(".gpx"):
        from .gpx import write_gpx

        return [write_gpx(ds, path, geometry=geometry)]
    if path.lower().endswith(".gml"):
        from .gml import write_gml

        return [write_gml(ds, path, geometry=geometry)]
    if path.lower().endswith(".kml"):
        from .kml import write_kml

        return [write_kml(ds, path, geometry=geometry)]
    from .geojsonseq import EXTS as _SEQ_EXTS

    if path.lower().endswith(_SEQ_EXTS):
        from .geojsonseq import write_geojsonseq

        return write_geojsonseq(ds, path, geometry=geometry)
    if path.lower().endswith(".csv"):
        from .csvgeo import write_csv_geo

        return write_csv_geo(ds, path, geometry=geometry)

    os.makedirs(path, exist_ok=True)
    paths: list[str] = []

    def write_block(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        attrs = [c for c in b.column_names if c != geometry]
        feats = []
        for i in range(len(b)):
            props = {c: b.column(c)[i].as_py() for c in attrs}
            feats.append(
                {
                    "type": "Feature",
                    "properties": props,
                    "geometry": geometry_to_geo_dict(g, i),
                }
            )
        return pa.table({"__json": pa.array([json.dumps({"type": "FeatureCollection", "features": feats})])})

    import uuid

    for i, block in enumerate(ds.map_batches(write_block, batch_format="pyarrow").iter_batches(batch_size=None, batch_format="pyarrow")):
        for j in range(len(block)):
            p = os.path.join(path, f"part-{i:05d}-{j}.geojson")
            with open(p, "w") as f:
                f.write(block.column("__json")[j].as_py())
            paths.append(p)
    return paths
