"""Feather (Arrow IPC file) source/sink (reference io/arrow.py:367
read_feather / :223 to_feather).

Same logical model as the GeoParquet path: WKB geometry column + "geo"
schema metadata, one IPC file per fragment plus the manifest the resume
machinery already understands. Ray Data has no native feather reader, so
reads fan out one task per file via ``from_items(paths).flat_map``-style
``map_batches`` - each task memory-maps its own file (zero-copy IPC).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.feather as paf
import ray
import ray.data

from .geoparquet import create_geo_metadata, parse_geo_metadata


def read_feather(path: str) -> ray.data.Dataset:
    """Read one .feather file or a directory of fragment .feather files into
    a streaming Dataset (one read task per file)."""
    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.feather")))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no feather files under {path}")
    items = ray.data.from_items([{"path": p} for p in paths])

    def load(batch: pa.Table) -> pa.Table:
        tables = [paf.read_table(p.as_py()) for p in batch.column("path")]
        out = pa.concat_tables(tables, promote_options="default")
        # strip schema-level metadata mismatch issues across fragments
        return out.replace_schema_metadata(tables[0].schema.metadata)

    return items.map_batches(load, batch_format="pyarrow")


def write_feather(
    ds: ray.data.Dataset,
    out_dir: str,
    geometry: str = "geometry",
    crs: str | None = None,
) -> list[str]:
    """Write one feather fragment per block + the standard manifest; returns
    fragment paths. Geo metadata rides in each fragment's schema."""
    os.makedirs(out_dir, exist_ok=True)
    meta = create_geo_metadata(geometry=geometry, crs=crs)

    def write_block(batch: pa.Table) -> pa.Table:
        # unique per block: Ray re-deserializes the function per task, so a
        # worker-local counter restarts at 0 and same-pid fragments collide
        import uuid

        frag = os.path.join(out_dir, f"frag-{os.getpid()}-{uuid.uuid4().hex[:12]}.feather")
        md = dict(batch.schema.metadata or {})
        md.update(meta)
        paf.write_feather(batch.replace_schema_metadata(md), frag)
        return pa.table({"path": pa.array([frag])})

    paths = [r["path"] for r in ds.map_batches(write_block, batch_format="pyarrow").take_all()]
    return sorted(paths)


def feather_geo_metadata(path: str) -> dict | None:
    """Decode the "geo" schema metadata of a feather file (io/arrow.py:383)."""
    schema = paf.read_table(path).schema
    return parse_geo_metadata(schema)
