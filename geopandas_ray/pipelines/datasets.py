"""Deterministic geometry derivations over the driver's synthetic tables.

The correctness gate (driver __ray_entry__ contract) compares Ray pipelines
against DuckDB SQL on the same parquet - and DuckDB here has no spatial
extension. So every geometry is derived from integer columns with exact
integer arithmetic, reproducible on both sides:

- document points:  px = (doc_id*37) % 1000,  py = (doc_id*91) % 1000
- part zones:       rect [(k*13)%900, (k*29)%880] + (40+(k%5)*30, 30+(k%7)*25)
- supplier zones:   rect [(k*53)%800, (k*71)%800] + square 100+(k%4)*50

All coordinates are whole numbers stored as float64 (exactly representable),
so areas / distances² / bounds are integer-exact in both engines and the
driver's value-hash comparison cannot drift on floating-point rounding.
The Ray side goes through REAL WKB geometry and the engine's kernels; the
SQL side reproduces the arithmetic directly - that asymmetry is the test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..geom.wkb import boxes_to_wkb, points_to_wkb

DOMAIN = (0.0, 0.0, 1024.0, 1024.0)

# SQL CTE prelude mirrored by the NumPy derivations below
SQL_PTS = (
    "pts AS (SELECT doc_id, source, CAST((doc_id*37)%1000 AS DOUBLE) AS px, "
    "CAST((doc_id*91)%1000 AS DOUBLE) AS py FROM documents)"
)
SQL_ZONES = (
    "zones AS (SELECT p_partkey AS zone_key, p_brand AS category, p_retailprice AS weight, "
    "CAST((p_partkey*13)%900 AS DOUBLE) AS zminx, CAST((p_partkey*29)%880 AS DOUBLE) AS zminy, "
    "CAST((p_partkey*13)%900 + 40 + (p_partkey%5)*30 AS DOUBLE) AS zmaxx, "
    "CAST((p_partkey*29)%880 + 30 + (p_partkey%7)*25 AS DOUBLE) AS zmaxy FROM part)"
)
SQL_ZONES2 = (
    "zones2 AS (SELECT s_suppkey AS s_key, "
    "CAST((s_suppkey*53)%800 AS DOUBLE) AS sminx, CAST((s_suppkey*71)%800 AS DOUBLE) AS sminy, "
    "CAST((s_suppkey*53)%800 + 100 + (s_suppkey%4)*50 AS DOUBLE) AS smaxx, "
    "CAST((s_suppkey*71)%800 + 100 + (s_suppkey%4)*50 AS DOUBLE) AS smaxy FROM supplier)"
)


def _derive_points(b: pa.Table) -> pa.Table:
    did = np.asarray(b.column("doc_id"), dtype=np.int64)
    px = ((did * 37) % 1000).astype(np.float64)
    py = ((did * 91) % 1000).astype(np.float64)
    return b.append_column("geometry", points_to_wkb(px, py))


def doc_points(sf_dir: str, columns=("doc_id",), replicate: int = 1) -> ray.data.Dataset:
    """Document point table as a Ray dataset (geometry = WKB Point).

    ``replicate`` > 1 deterministically expands the table (doc_id offset per
    replica) for bench-scale runs; replica points shift by the replica index
    so density stays uniform rather than stacking identical points.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=sorted(set(columns) | {"doc_id"})
    )
    if replicate > 1:
        n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

        def expand(b: pa.Table) -> pa.Table:
            parts = []
            for r in range(replicate):
                t = b
                did = np.asarray(t.column("doc_id"), dtype=np.int64) + r * n_docs
                t = t.set_column(t.column_names.index("doc_id"), "doc_id", pa.array(did))
                parts.append(t)
            return pa.concat_tables(parts)

        ds = ds.map_batches(expand, batch_format="pyarrow")
        # the tiny synthetic corpus is ONE parquet file -> one block -> one
        # task for the whole expanded table AND (worse) the downstream
        # groupby inherits that partition count; split so every later stage
        # (indexer, shuffle, join, tiling) actually fans out. A 100TB corpus
        # has thousands of fragments and never needs this.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        except Exception:
            cpus = 8
        ds = ds.repartition(min(max(4 * cpus, 32), 512))
    return ds.map_batches(_derive_points, batch_format="pyarrow")


def zone_table(sf_dir: str) -> pa.Table:
    """Zone rectangles from the part table (small broadcast side)."""
    t = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_retailprice"]
    )
    k = t.column("p_partkey").to_numpy().astype(np.int64)
    minx = ((k * 13) % 900).astype(np.float64)
    miny = ((k * 29) % 880).astype(np.float64)
    maxx = minx + (40 + (k % 5) * 30)
    maxy = miny + (30 + (k % 7) * 25)
    return pa.table(
        {
            "zone_key": pa.array(k),
            "category": t.column("p_brand"),
            "weight": t.column("p_retailprice"),
            "geometry": boxes_to_wkb(minx, miny, maxx, maxy),
        }
    )


def zone_dataset(sf_dir: str) -> ray.data.Dataset:
    return ray.data.from_arrow(zone_table(sf_dir))


def supplier_zone_table(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = t.column("s_suppkey").to_numpy().astype(np.int64)
    minx = ((k * 53) % 800).astype(np.float64)
    miny = ((k * 71) % 800).astype(np.float64)
    size = (100 + (k % 4) * 50).astype(np.float64)
    return pa.table(
        {
            "s_key": pa.array(k),
            "geometry": boxes_to_wkb(minx, miny, minx + size, miny + size),
        }
    )


def doc_multipoints(sf_dir: str) -> ray.data.Dataset:
    """Per-doc MultiPoint with 1 + doc_id%3 parts at (px+j, py-j) - the
    explode fixture (part count and coords reproducible in SQL)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def f(b: pa.Table) -> pa.Table:
        import struct

        did = np.asarray(b.column("doc_id"), dtype=np.int64)
        px = ((did * 37) % 1000).astype(np.float64)
        py = ((did * 91) % 1000).astype(np.float64)
        nparts = (did % 3) + 1
        vals = []
        for i in range(len(did)):
            body = b"".join(
                struct.pack("<BI2d", 1, 1, px[i] + j, py[i] - j) for j in range(nparts[i])
            )
            vals.append(struct.pack("<BII", 1, 4, int(nparts[i])) + body)
        return b.append_column("geometry", pa.array(vals, type=pa.large_binary()))

    return ds.map_batches(f, batch_format="pyarrow")


# --- concave (L-shaped) zones for the general boolean kernel ---------------
# L = big rect minus its top-right quadrant [cutx..maxx, cuty..maxy], with
# cutx = minx + floor((maxx-minx)/2) etc. - single concave 6-vertex ring,
# all integer coords, SQL-exact via inclusion-exclusion A(L1∩L2) =
# A(B1∩B2) - A(B1∩C2) - A(C1∩B2) + A(C1∩C2).

SQL_LZONES = (
    "lzones AS (SELECT zone_key, zminx, zminy, zmaxx, zmaxy, "
    "zminx + CAST(floor((zmaxx-zminx)/2) AS DOUBLE) AS zcutx, "
    "zminy + CAST(floor((zmaxy-zminy)/2) AS DOUBLE) AS zcuty FROM zones)"
)
SQL_LZONES2 = (
    "lzones2 AS (SELECT s_key, sminx, sminy, smaxx, smaxy, "
    "sminx + CAST(floor((smaxx-sminx)/2) AS DOUBLE) AS scutx, "
    "sminy + CAST(floor((smaxy-sminy)/2) AS DOUBLE) AS scuty FROM zones2)"
)


def _l_rings_wkb(minx, miny, maxx, maxy):
    """Vectorized L-shape WKB (6-vertex concave ring per row)."""
    from ..geom.wkb import Geoms, to_wkb

    cutx = minx + np.floor((maxx - minx) / 2)
    cuty = miny + np.floor((maxy - miny) / 2)
    n = len(minx)
    coords = np.empty((n * 7, 2), dtype=np.float64)
    coords[0::7] = np.column_stack([minx, miny])
    coords[1::7] = np.column_stack([maxx, miny])
    coords[2::7] = np.column_stack([maxx, cuty])
    coords[3::7] = np.column_stack([cutx, cuty])
    coords[4::7] = np.column_stack([cutx, maxy])
    coords[5::7] = np.column_stack([minx, maxy])
    coords[6::7] = np.column_stack([minx, miny])
    g = Geoms(
        coords,
        np.arange(n + 1) * 7,
        np.arange(n + 1),
        np.arange(n + 1),
        np.full(n, 3, dtype=np.int8),
        np.full(n, 3, dtype=np.int8),
    )
    return to_wkb(g)


def zone_l_table(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    k = t.column("p_partkey").to_numpy().astype(np.int64)
    minx = ((k * 13) % 900).astype(np.float64)
    miny = ((k * 29) % 880).astype(np.float64)
    maxx = minx + (40 + (k % 5) * 30)
    maxy = miny + (30 + (k % 7) * 25)
    return pa.table(
        {"zone_key": pa.array(k), "geometry": _l_rings_wkb(minx, miny, maxx, maxy)}
    )


def zone_l_dataset(sf_dir: str) -> ray.data.Dataset:
    return ray.data.from_arrow(zone_l_table(sf_dir))


def supplier_l_table(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    k = t.column("s_suppkey").to_numpy().astype(np.int64)
    minx = ((k * 53) % 800).astype(np.float64)
    miny = ((k * 71) % 800).astype(np.float64)
    size = (100 + (k % 4) * 50).astype(np.float64)
    return pa.table(
        {"s_key": pa.array(k), "geometry": _l_rings_wkb(minx, miny, minx + size, miny + size)}
    )


def bowtie_table(sf_dir: str) -> pa.Table:
    """Self-intersecting bowtie ring per part row (make_valid fixture):
    (minx,miny)->(maxx,maxy)->(maxx,miny)->(minx,maxy)->close; regularized
    area = w*h/2 exactly."""
    from ..geom.wkb import Geoms, to_wkb

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    k = t.column("p_partkey").to_numpy().astype(np.int64)
    minx = ((k * 13) % 900).astype(np.float64)
    miny = ((k * 29) % 880).astype(np.float64)
    maxx = minx + (40 + (k % 5) * 30)
    maxy = miny + (30 + (k % 7) * 25)
    n = len(k)
    coords = np.empty((n * 5, 2), dtype=np.float64)
    coords[0::5] = np.column_stack([minx, miny])
    coords[1::5] = np.column_stack([maxx, maxy])
    coords[2::5] = np.column_stack([maxx, miny])
    coords[3::5] = np.column_stack([minx, maxy])
    coords[4::5] = np.column_stack([minx, miny])
    g = Geoms(
        coords,
        np.arange(n + 1) * 5,
        np.arange(n + 1),
        np.arange(n + 1),
        np.full(n, 3, dtype=np.int8),
        np.full(n, 3, dtype=np.int8),
    )
    return pa.table({"zone_key": pa.array(k), "geometry": to_wkb(g)})


SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)


def doc_spans(sf_dir: str) -> ray.data.Dataset:
    """Documents with the FIXTURES.md F1 interleaved-span column, derived
    deterministically from doc_id (so a SQL oracle can reproduce the
    flattened rows): n_spans = doc_id % 5 + 1; kind cycles
    text/image/audio by span index j; text = "{doc_id}-s{j}" for text
    spans else ""; media_ref = "ref://{doc_id}/{j}" for media spans else
    ""; offset = j. Exercises the exact input_hint schema
    list<struct<kind,text,media_ref,offset>>."""

    def synth(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        counts = ids % 5 + 1
        parent = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        offsets = np.zeros(len(ids) + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        j = np.arange(len(parent), dtype=np.int64) - offsets[:-1][parent]
        pid = ids[parent]
        kind_code = j % 3
        kinds = np.array(["text", "image", "audio"], dtype=object)[kind_code]
        texts = np.where(kind_code == 0, [f"{d}-s{k}" for d, k in zip(pid, j)], "")
        refs = np.where(kind_code != 0, [f"ref://{d}/{k}" for d, k in zip(pid, j)], "")
        struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, type=pa.string()),
                pa.array(texts, type=pa.string()),
                pa.array(refs, type=pa.string()),
                pa.array(j.astype(np.int32)),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans = pa.ListArray.from_arrays(pa.array(offsets), struct)
        return b.append_column("spans", spans.cast(SPANS_TYPE))

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )
