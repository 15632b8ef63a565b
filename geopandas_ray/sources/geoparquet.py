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


def bbox_filter_expr(minx: float, miny: float, maxx: float, maxy: float):
    """pyarrow dataset Expression: covering bbox intersects the query bbox.

    Passed into ``read_parquet(filter=...)`` it reaches
    ``ParquetFileFragment.to_batches`` where pyarrow prunes whole row
    groups from min/max column statistics BEFORE any data pages are read,
    then filters surviving rows exactly — io/arrow.py:341-344 semantics.
    """
    import pyarrow.dataset as pads

    f = pads.field
    return (f("minx") <= maxx) & (f("maxx") >= minx) & (f("miny") <= maxy) & (f("maxy") >= miny)


def _bbox_cols_everywhere(paths, filesystem=None) -> bool:
    """True iff minx/miny/maxx/maxy exist in EVERY fragment's physical
    schema (footers only, no data pages). Checking just the first file
    would push a filter that evaluates to null on files missing the bbox
    columns and silently drops all their rows (ADVICE r3); any mismatch
    falls back to the exact post-read cx filter instead."""
    import pyarrow.dataset as pads

    need = {"minx", "miny", "maxx", "maxy"}
    dset = pads.dataset(paths, filesystem=filesystem, format="parquet")
    if not need.issubset(set(dset.schema.names)):
        return False
    for frag in dset.get_fragments():
        if not need.issubset(set(frag.physical_schema.names)):
            return False
    return True


def read_geoparquet(
    paths,
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    geometry: str = "geometry",
    **kwargs,
) -> ray.data.Dataset:
    """ray.data.read_parquet with column pruning + optional bbox pushdown.

    When the file carries covering-bbox columns (minx/miny/maxx/maxy,
    written by ``write_geoparquet(write_covering_bbox=True)``), the bbox
    becomes a pyarrow filter expression pushed into the parquet scan:
    row groups whose bbox-column statistics cannot intersect are skipped
    at IO (no data pages read), and surviving rows are filtered exactly
    by pyarrow — so no post-read pass is needed. Without bbox columns it
    falls back to an exact post-read cx filter (base.py:5514 semantics)
    over decoded WKB bounds.

    A DIRECTORY path expands to its ``**/*.parquet`` fragments: the
    engine's own sink writes ``manifest.jsonl`` next to the fragments, and
    handing the bare directory to ``ray.data.read_parquet`` would try to
    parse the manifest as parquet (partition-key columns are stored in the
    data too, so nothing is lost by reading explicit fragment paths).
    """
    import glob as _glob
    import os as _os

    if isinstance(paths, str) and kwargs.get("filesystem") is None and _os.path.isdir(paths):
        found = sorted(_glob.glob(_os.path.join(paths, "**", "*.parquet"), recursive=True))
        if found:
            paths = found
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        if _bbox_cols_everywhere(paths, filesystem=kwargs.get("filesystem")):
            # the filter may reference columns outside `columns`: pyarrow
            # reads them for evaluation without projecting them
            return ray.data.read_parquet(
                paths,
                columns=columns,
                filter=bbox_filter_expr(minx, miny, maxx, maxy),
                **kwargs,
            )
        from ..stages.ops import cx_filter

        ds = ray.data.read_parquet(paths, columns=columns, **kwargs)
        return cx_filter(ds, minx, miny, maxx, maxy, geometry=geometry)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def write_geoparquet(
    ds: ray.data.Dataset,
    out_dir: str,
    geometry: str = "geometry",
    crs: str | None = None,
    write_covering_bbox: bool = False,
    partition_by: str | None = None,
) -> list[dict]:
    """Write fragments + manifest with "geo" schema metadata attached.

    write_covering_bbox appends minx/miny/maxx/maxy columns first
    (io/arrow.py:70-73 write_covering_bbox) so later reads can push bbox
    filters down without decoding WKB.

    ``partition_by``: column name — output lands one directory per distinct
    value (``fragments/<col>_<val>/``), the resumable/prunable shape for a
    100-TB sink: a failed run skips finished partitions via the manifest,
    and a reader narrows to key ranges by listing subdirectories. Each
    BLOCK writes one fragment per partition value it contains; to get few
    fragments per partition, hash-partition the dataset on the key first.
    """
    from ..state.manifest import write_fragments

    if write_covering_bbox:
        from ..stages.ops import with_bounds

        ds = with_bounds(ds, geometry=geometry)
    meta = create_geo_metadata(geometry=geometry, crs=crs)
    return write_fragments(
        ds, out_dir, tag="geoparquet", schema_metadata=meta, partition_by=partition_by
    )
