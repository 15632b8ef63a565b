"""Native FlatGeobuf source/sink (sources/flatgeobuf.py): round-trip,
packed-R-tree math, bbox pushdown (index-pruned shards never touch the
feature section), read_file/to_file dispatch, driver-size guardrail."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.sources.flatgeobuf import (
    _read_header,
    _tree_levels,
    _tree_num_nodes,
    read_flatgeobuf,
    write_flatgeobuf,
)


@pytest.fixture
def rng():
    return np.random.RandomState(11)


def test_tree_level_math():
    # reference do-while: n=ceil(n/ns) accumulated until n==1 (1 item -> 2
    # nodes: its leaf + the root)
    assert _tree_levels(1, 16) == [1, 1]
    assert _tree_levels(16, 16) == [16, 1]
    assert _tree_levels(17, 16) == [17, 2, 1]
    assert _tree_num_nodes(1000, 4) == 1000 + 250 + 63 + 16 + 4 + 1
    # node_size clamps to [2, 65535]
    assert _tree_levels(8, 0) == _tree_levels(8, 2)


def test_point_roundtrip_all_column_types(tmp_path, rng):
    n = 500
    x, y = rng.uniform(0, 100, n), rng.uniform(0, 100, n)
    t = pa.table({
        "pid": pa.array(np.arange(n)),
        "nm": pa.array([f"r{i}" if i % 7 else None for i in range(n)]),
        "val": pa.array(rng.uniform(-5, 5, n)),
        "flag": pa.array((np.arange(n) % 3 == 0)),
        "f32": pa.array(rng.uniform(0, 1, n).astype(np.float32)),
        "i32": pa.array(np.arange(n, dtype=np.int32)),
        "raw": pa.array([bytes([i % 250]) for i in range(n)], type=pa.large_binary()),
        "geometry": W.points_to_wkb(x, y),
    })
    path = str(tmp_path / "pts.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), path, crs_code=4326, node_size=8)
    m = _read_header(path)
    assert m["features_count"] == n and m["crs_code"] == 4326 and m["has_index"]
    out = read_flatgeobuf(path, shard_features=64).to_pandas().set_index("pid")
    assert len(out) == n
    idx = np.arange(n)
    assert np.allclose(out["val"].reindex(idx).values, t.column("val").to_numpy())
    assert np.allclose(out["f32"].reindex(idx).values, t.column("f32").to_numpy())
    assert (out["i32"].reindex(idx).values == np.arange(n)).all()
    assert (out["flag"].reindex(idx).values == (idx % 3 == 0)).all()
    assert out["nm"].isna().sum() == sum(1 for i in range(n) if i % 7 == 0)
    assert out["raw"].reindex(idx).iloc[42] == bytes([42])
    g = W.from_wkb(pa.array(out["geometry"].reindex(idx).tolist(), type=pa.large_binary()))
    b = K.bounds(g)
    assert np.allclose(b[:, 0], x) and np.allclose(b[:, 1], y)


def test_mixed_geometry_roundtrip(tmp_path):
    from geopandas_ray.stages.clip import _parts_to_wkb

    geoms = []
    for i in range(60):
        base = float(i)
        if i % 4 == 0:
            geoms.append(_parts_to_wkb(
                [(3, [np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], float) + base,
                      np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], float) + base])]
            ))  # polygon with hole
        elif i % 4 == 1:
            geoms.append(_parts_to_wkb([(2, [np.array([[0, 0], [5, 5], [9, 2]], float) + base])]))
        elif i % 4 == 2:
            geoms.append(_parts_to_wkb(
                [(3, [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], float) + base]),
                 (3, [np.array([[5, 5], [7, 5], [7, 7], [5, 7], [5, 5]], float) + base])]
            ))  # multipolygon
        else:
            geoms.append(_parts_to_wkb(
                [(1, [np.array([[base, base]])]), (1, [np.array([[base + 1, base]])])]
            ))  # multipoint
    t = pa.table({"k": pa.array(np.arange(60)),
                  "geometry": pa.array(geoms, type=pa.large_binary())})
    path = str(tmp_path / "mixed.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), path)
    assert _read_header(path)["geometry_type"] == 0  # mixed -> Unknown
    out = read_flatgeobuf(path).to_pandas().set_index("k")
    g2 = W.from_wkb(pa.array(out["geometry"].reindex(np.arange(60)).tolist(),
                             type=pa.large_binary()))
    g0 = W.from_wkb(pa.array(geoms, type=pa.large_binary()))
    assert np.allclose(K.area(g2), K.area(g0))
    assert np.allclose(K.length(g2), K.length(g0))
    assert (np.asarray(g2.row_types) == np.asarray(g0.row_types)).all()


def test_bbox_pushdown_skips_feature_section(tmp_path, rng, monkeypatch):
    """Shards whose leaf bboxes all miss the query must return WITHOUT a
    single feature-section read (index-only pruning)."""
    import geopandas_ray.sources.flatgeobuf as F

    n = 2000
    # two well-separated clusters so whole shards are prunable
    x = np.where(np.arange(n) < n // 2, rng.uniform(0, 10, n), rng.uniform(500, 510, n))
    y = rng.uniform(0, 10, n)
    t = pa.table({"pid": pa.array(np.arange(n)), "geometry": W.points_to_wkb(x, y)})
    path = str(tmp_path / "two.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), path, node_size=16)

    reads: list[tuple[int, int]] = []
    orig = F._FgbShard._read_span

    def spy(self, start, size):
        reads.append((start, size))
        return orig(self, start, size)

    monkeypatch.setattr(F._FgbShard, "_read_span", spy)
    meta = _read_header(path)
    out = read_flatgeobuf(path, bbox=(0.0, 0.0, 20.0, 20.0), shard_features=200).to_pandas()
    exp = int((x <= 20.0).sum())
    assert len(out) == exp
    # feature-section reads must cover only ~the matching half of the file
    feat_reads = [r for r in reads if r[0] >= meta["features_start"]]
    feat_bytes = sum(s for _, s in feat_reads)
    total_feat = meta["file_size"] - meta["features_start"]
    assert feat_bytes < 0.7 * total_feat, (feat_bytes, total_feat)
    # and the result is exact (bounds-overlap semantics)
    assert sorted(out["pid"].tolist()) == sorted(np.nonzero(x <= 20.0)[0].tolist())


def test_read_file_to_file_dispatch(tmp_path, rng):
    from geopandas_ray.sources.geojson import read_file, to_file

    n = 300
    x, y = rng.uniform(0, 50, n), rng.uniform(0, 50, n)
    t = pa.table({"pid": pa.array(np.arange(n)), "v": pa.array(rng.uniform(0, 1, n)),
                  "geometry": W.points_to_wkb(x, y)})
    path = str(tmp_path / "d.fgb")
    to_file(ray.data.from_arrow(t), path)
    full = read_file(path).to_pandas()
    assert len(full) == n
    sub = read_file(path, bbox=(0, 0, 25, 25), columns=["pid"]).to_pandas()
    exp = int(((x <= 25) & (y <= 25)).sum())
    assert len(sub) == exp
    assert sorted(sub.columns) == ["geometry", "pid"]
    lim = read_file(path, rows=10).to_pandas()
    assert len(lim) == 10


def test_no_index_sequential_and_empty(tmp_path):
    # node_size=0 writes no index -> single sequential scan task
    t = pa.table({"k": pa.array([1, 2, 3]),
                  "geometry": W.points_to_wkb(np.array([1.0, 2.0, 3.0]),
                                              np.array([1.0, 2.0, 3.0]))})
    path = str(tmp_path / "noidx.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), path, node_size=0)
    assert not _read_header(path)["has_index"]
    out = read_flatgeobuf(path).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2, 3]
    sub = read_flatgeobuf(path, bbox=(0.5, 0.5, 1.5, 1.5)).to_pandas()
    assert sub["k"].tolist() == [1]

    # empty input
    e = pa.table({"k": pa.array([], type=pa.int64()),
                  "geometry": pa.array([], type=pa.large_binary())})
    pe = str(tmp_path / "empty.fgb")
    write_flatgeobuf(ray.data.from_arrow(e), pe)
    oute = read_flatgeobuf(pe).to_pandas()
    assert len(oute) == 0


def test_null_geometry_and_guardrail(tmp_path):
    t = pa.table({"k": pa.array([0, 1]),
                  "geometry": pa.array([None, W.points_to_wkb(
                      np.array([5.0]), np.array([6.0]))[0].as_py()],
                      type=pa.large_binary())})
    path = str(tmp_path / "nulls.fgb")
    write_flatgeobuf(ray.data.from_arrow(t), path)
    out = read_flatgeobuf(path).to_pandas().set_index("k")
    assert out["geometry"].reindex([0]).isna().all()
    g = W.from_wkb(pa.array([out["geometry"].loc[1]], type=pa.large_binary()))
    assert K.bounds(g)[0, 0] == 5.0

    with pytest.raises(ValueError, match="parquet"):
        write_flatgeobuf(ray.data.range(60_000_000), str(tmp_path / "huge.fgb"))
