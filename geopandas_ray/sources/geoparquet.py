"""GeoParquet-style sources/sinks: WKB geometry + "geo" schema metadata.

Mirrors the reference's Arrow mapping (geopandas/io/arrow.py:60-112
_create_metadata: {"version", "primary_column", "columns": {col:
{"encoding": "WKB", "geometry_types", "crs", "bbox"}}}) so files written
here are readable by GeoPandas' read_parquet and vice versa (modulo CRS
objects - we carry the CRS as an opaque string).

read_geoparquet prunes at the read: pass ``columns`` and an optional bbox
to push a row filter down to parquet row groups via the covering-bbox
columns (io/arrow.py:341-344 behavior) when the file was written with one.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


GEO_METADATA_VERSION = "1.0.0"


def create_geo_metadata(
    geometry: str = "geometry",
    crs: str | None = None,
    geometry_types: list[str] | None = None,
    bbox: list[float] | None = None,
) -> dict:
    col: dict = {"encoding": "WKB", "geometry_types": geometry_types or []}
    if crs is not None:
        col["crs"] = crs
    if bbox is not None:
        col["bbox"] = bbox
    return {
        "geo": json.dumps(
            {
                "version": GEO_METADATA_VERSION,
                "primary_column": geometry,
                "columns": {geometry: col},
            }
        )
    }


def parse_geo_metadata(schema: pa.Schema) -> dict | None:
    meta = schema.metadata or {}
    raw = meta.get(b"geo")
    return json.loads(raw) if raw else None


def read_geoparquet(
    paths,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry: str = "geometry",
    **kwargs,
) -> ray.data.Dataset:
    """ray.data.read_parquet with column pruning + optional bbox pushdown.

    bbox filtering uses covering-bbox struct columns (minx/miny/maxx/maxy)
    when present for row-group pruning; otherwise it falls back to an exact
    post-read cx filter (base.py:5514 semantics) over decoded bounds.
    """
    ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
    if bbox is not None:
        has_bbox_cols = all(c in ds.schema().names for c in ("minx", "miny", "maxx", "maxy"))
        minx, miny, maxx, maxy = bbox
        if has_bbox_cols:
            import pyarrow.compute as pc

            def f(b: pa.Table) -> pa.Table:
                keep = pc.and_(
                    pc.and_(pc.less_equal(b["minx"], maxx), pc.greater_equal(b["maxx"], minx)),
                    pc.and_(pc.less_equal(b["miny"], maxy), pc.greater_equal(b["maxy"], miny)),
                )
                return b.filter(keep)

            ds = ds.map_batches(f, batch_format="pyarrow")
        else:
            from ..stages.ops import cx_filter

            ds = cx_filter(ds, minx, miny, maxx, maxy, geometry=geometry)
    return ds


def write_geoparquet(
    ds: ray.data.Dataset,
    out_dir: str,
    geometry: str = "geometry",
    crs: str | None = None,
    write_covering_bbox: bool = False,
) -> list[dict]:
    """Write fragments + manifest with "geo" schema metadata attached.

    write_covering_bbox appends minx/miny/maxx/maxy columns first
    (io/arrow.py:70-73 write_covering_bbox) so later reads can push bbox
    filters down without decoding WKB.
    """
    from ..state.manifest import write_fragments

    if write_covering_bbox:
        from ..stages.ops import with_bounds

        ds = with_bounds(ds, geometry=geometry)
    meta = create_geo_metadata(geometry=geometry, crs=crs)
    return write_fragments(ds, out_dir, tag="geoparquet", schema_metadata=meta)
