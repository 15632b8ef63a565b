import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from geopandas_ray.state.manifest import (
    load_manifest,
    pending_inputs,
    read_shard,
    run_resumable,
    shard_inputs,
    write_fragments,
)


@pytest.fixture
def inputs(tmp_path):
    files = []
    for i in range(3):
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(np.arange(i * 10, i * 10 + 10, dtype=np.int64))}), p
        )
        files.append(p)
    return files


def test_write_fragments_and_manifest(tmp_path):
    out = str(tmp_path / "out")
    ds = ray.data.from_arrow(pa.table({"a": pa.array([1, 2, 3], type=pa.int64())}))
    rows = write_fragments(ds, out, tag="t0")
    assert sum(r["rows"] for r in rows) == 3
    man = load_manifest(out)
    assert len(man) == len(rows)
    for r in man:
        assert os.path.exists(r["output"])
        assert not os.path.basename(r["output"]).startswith(".")
    # fragments read back
    back = ray.data.read_parquet(os.path.join(out, "fragments")).to_pandas()
    assert sorted(back.a) == [1, 2, 3]


def test_resume_skips_completed(inputs, tmp_path):
    out = str(tmp_path / "out")

    def pipeline(ds):
        return ds.map_batches(lambda b: b, batch_format="pyarrow")

    s1 = run_resumable(inputs, out, pipeline)
    assert s1["processed"] == 3 and s1["skipped"] == 0 and s1["rows"] == 30
    s2 = run_resumable(inputs, out, pipeline)
    assert s2["processed"] == 0 and s2["skipped"] == 3
    # partial manifest -> only missing inputs rerun
    man = load_manifest(out)
    keep = [r for r in man if r["input_fragment"] != inputs[1]]
    with open(os.path.join(out, "manifest.jsonl"), "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    assert pending_inputs(inputs, out) == [inputs[1]]
    s3 = run_resumable(inputs, out, pipeline)
    assert s3["processed"] == 1 and s3["rows"] == 10


def test_shard_inputs_row_groups(tmp_path):
    # 100 rows in 10 row groups; ~25-row shards -> rg0-3, rg3-6, rg6-9, rg9-10
    p = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64))}), p, row_group_size=10
    )
    shards = shard_inputs([p], target_rows=25)
    assert shards == [f"{p}::rg0-3", f"{p}::rg3-6", f"{p}::rg6-9", f"{p}::rg9-10"]
    # shards read back to exactly the file, each in its own Ray task
    got = []
    for s in shards:
        got.extend(read_shard(s).to_pandas().doc_id.tolist())
    assert sorted(got) == list(range(100))
    # a single-row-group file (or one covering shard) stays a plain path
    small = str(tmp_path / "small.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1, 2])}), small)
    assert shard_inputs([small], target_rows=25) == [small]
    assert shard_inputs([p], target_rows=10**9) == [p]


def test_resume_over_shards_with_partition_lineage(tmp_path):
    # the north-rule lineage: input shard -> cell -> output block, resumable
    p = str(tmp_path / "in.parquet")
    n = 60
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "cell": pa.array(np.arange(n, dtype=np.int64) % 3),
            }
        ),
        p,
        row_group_size=10,
    )
    shards = shard_inputs([p], target_rows=20)
    assert len(shards) == 3
    out = str(tmp_path / "out")

    def pipeline(ds):
        return ds.map_batches(lambda b: b, batch_format="pyarrow")

    s1 = run_resumable(shards, out, pipeline, partition_by="cell")
    assert s1["processed"] == 3 and s1["rows"] == n
    man = [r for r in load_manifest(out) if not r["input_fragment"].endswith("#metrics")]
    # every manifest line carries shard + cell + block path
    assert {r["partition"] for r in man} == {"0", "1", "2"}
    assert {r["input_fragment"] for r in man} == set(shards)
    for r in man:
        assert os.path.exists(r["output"])
    # resume: drop one shard's lines, only that shard reruns
    keep = [r for r in load_manifest(out) if shards[1] not in r["input_fragment"]]
    with open(os.path.join(out, "manifest.jsonl"), "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    s2 = run_resumable(shards, out, pipeline, partition_by="cell")
    assert s2["processed"] == 1 and s2["skipped"] == 2 and s2["rows"] == 20
    # read-back of the partitioned fragment tree covers every row once
    back = ray.data.read_parquet(os.path.join(out, "fragments")).to_pandas()
    assert sorted(back.doc_id) == list(range(n))


def test_geoparquet_metadata_roundtrip(tmp_path):
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoparquet import (
        parse_geo_metadata,
        read_geoparquet,
        write_geoparquet,
    )

    out = str(tmp_path / "geo")
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "geometry": points_to_wkb([1.0, 50.0, 90.0], [1.0, 50.0, 90.0]),
            }
        )
    )
    write_geoparquet(ds, out, crs="EPSG:4326", write_covering_bbox=True)
    frag_dir = os.path.join(out, "fragments")
    f = [os.path.join(frag_dir, p) for p in os.listdir(frag_dir)][0]
    meta = parse_geo_metadata(pq.read_schema(f))
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    assert meta["columns"]["geometry"]["crs"] == "EPSG:4326"
    # bbox pushdown read
    got = read_geoparquet(frag_dir, bbox=(0, 0, 10, 10)).to_pandas()
    assert got.doc_id.tolist() == [0]


def test_partitioned_write_and_selective_read(tmp_path):
    import numpy as np
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoparquet import read_geoparquet, write_geoparquet
    from geopandas_ray.state.manifest import load_manifest

    out = str(tmp_path / "parts")
    n = 400
    cell = np.repeat(np.arange(4, dtype=np.int64), n // 4)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n)),
            "cell": pa.array(cell),
            "geometry": points_to_wkb(np.arange(n, dtype=float), np.zeros(n)),
        }
    )
    rows = write_geoparquet(
        ray.data.from_arrow(t).repartition(3), out, partition_by="cell"
    )
    frag_dir = os.path.join(out, "fragments")
    subdirs = sorted(d for d in os.listdir(frag_dir))
    assert subdirs == ["cell_0", "cell_1", "cell_2", "cell_3"]
    # full read-back: same rows, original arrow types preserved
    full = read_geoparquet(frag_dir).to_pandas()
    assert len(full) == n and full.cell.dtype == np.int64
    assert sorted(full.doc_id) == list(range(n))
    # selective read: one partition directory only
    one = read_geoparquet(os.path.join(frag_dir, "cell_2")).to_pandas()
    assert (one.cell == 2).all() and len(one) == n // 4
    # manifest carries per-partition lineage
    m = load_manifest(out)
    assert len(m) == len(rows) and all("partition" in r for r in m)
    assert {r["partition"] for r in m} == {"0", "1", "2", "3"}


def test_partitioned_write_null_keys_and_collisions(tmp_path):
    import numpy as np
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoparquet import read_geoparquet, write_geoparquet

    out = str(tmp_path / "nullparts")
    keys = pa.array(["a/b", "a_b", None, "a_b", None, "c"])
    n = len(keys)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n)),
            "k": keys,
            "geometry": points_to_wkb(np.arange(n, dtype=float), np.zeros(n)),
        }
    )
    write_geoparquet(ray.data.from_arrow(t), out, partition_by="k")
    frag_dir = os.path.join(out, "fragments")
    subdirs = sorted(os.listdir(frag_dir))
    # null keys land in their own directory; sanitized 'a/b' must NOT share
    # a directory with literal 'a_b'
    assert "k___null__" in subdirs
    assert len(subdirs) == 4, subdirs
    full = read_geoparquet(frag_dir).to_pandas()
    assert len(full) == n  # no silently dropped rows
    assert sorted(full.doc_id) == list(range(n))
    null_part = read_geoparquet(os.path.join(frag_dir, "k___null__")).to_pandas()
    assert sorted(null_part.doc_id) == [2, 4]


def test_partitioned_write_literal_null_sentinel(tmp_path):
    # ADVICE r3: a LITERAL "__null__" string value must not share the null
    # sentinel's directory, and the manifest records nulls as a distinct
    # marker (not str(None))
    import numpy as np
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoparquet import read_geoparquet, write_geoparquet
    from geopandas_ray.state.manifest import load_manifest

    out = str(tmp_path / "sentinel")
    keys = pa.array(["__null__", None, "None", "__null__"])
    n = len(keys)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n)),
            "k": keys,
            "geometry": points_to_wkb(np.arange(n, dtype=float), np.zeros(n)),
        }
    )
    write_geoparquet(ray.data.from_arrow(t), out, partition_by="k")
    frag_dir = os.path.join(out, "fragments")
    subdirs = sorted(os.listdir(frag_dir))
    assert "k___null__" in subdirs
    assert len(subdirs) == 3, subdirs  # null sentinel, literal (hashed), "None"
    null_part = read_geoparquet(os.path.join(frag_dir, "k___null__")).to_pandas()
    assert sorted(null_part.doc_id) == [1]
    lit_dir = next(d for d in subdirs if d.startswith("k___null__-"))
    lit = read_geoparquet(os.path.join(frag_dir, lit_dir)).to_pandas()
    assert sorted(lit.doc_id) == [0, 3]
    m = load_manifest(out)
    vals = {r["partition"] for r in m}
    # actual nulls record as JSON null — unambiguous with the literal
    # strings "__null__" and "None"
    assert vals == {None, "__null__", "None"}
    null_lines = [r for r in m if r["partition"] is None]
    assert sum(r["rows"] for r in null_lines) == 1


def test_sanitize_tag_collision_free_and_orphan_scrub_scoped(tmp_path):
    """r4 review: two shard tags identical in their last 80 sanitized chars
    (long lake paths differing only in an early segment) must not share a
    fragment-name tag — the orphan scrub deletes by tag, and a collision
    would remove a COMMITTED shard's fragments."""
    from geopandas_ray.state.manifest import _sanitize_tag, clean_orphan_fragments

    tail = "x" * 100 + ".parquet::rg1-2"
    tag_a = "/lake/region=us-east/" + tail
    tag_b = "/lake/region=eu-west/" + tail
    assert _sanitize_tag(tag_a) != _sanitize_tag(tag_b)

    out = str(tmp_path / "out")
    ds = ray.data.from_arrow(pa.table({"a": pa.array([1, 2, 3], type=pa.int64())}))
    write_fragments(ds, out, tag=tag_a)
    write_fragments(ds, out, tag=tag_b)
    frag_dir = os.path.join(out, "fragments")
    n_before = sum(len(fs) for _, _, fs in os.walk(frag_dir))
    removed = clean_orphan_fragments(out, tag_a)
    assert removed > 0
    # tag_b's committed fragments survive
    n_after = sum(len(fs) for _, _, fs in os.walk(frag_dir))
    assert n_after == n_before - removed
    back = ray.data.read_parquet(frag_dir).to_pandas()
    assert sorted(back.a) == [1, 2, 3]
