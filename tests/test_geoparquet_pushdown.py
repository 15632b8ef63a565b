"""read_geoparquet bbox pushdown: the filter must reach the parquet scan.

Three layers of evidence:
1. our expression prunes row groups from statistics alone
   (``split_by_row_group`` is the exact mechanism the scanner uses);
2. ``read_geoparquet`` hands that expression to ``ray.data.read_parquet``
   as ``filter=`` (captured via monkeypatch);
3. end-to-end rows match a driver-side recompute of the bbox filter.
"""

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from geopandas_ray.geom.wkb import points_to_wkb
from geopandas_ray.sources.geoparquet import bbox_filter_expr, read_geoparquet


@pytest.fixture()
def bbox_parquet(tmp_path):
    # 400 points along x, sorted, 4 row groups of 100 -> disjoint x-stats
    x = np.arange(400, dtype=np.float64)
    y = np.zeros(400)
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(400)]),
            "geometry": points_to_wkb(x, y),
            "minx": x,
            "maxx": x,
            "miny": y,
            "maxy": y,
        }
    )
    path = str(tmp_path / "pts.parquet")
    pq.write_table(t, path, row_group_size=100)
    return path, x


def test_row_groups_outside_bbox_are_pruned(bbox_parquet):
    path, _ = bbox_parquet
    frag = next(iter(pads.dataset(path, format="parquet").get_fragments()))
    assert frag.num_row_groups == 4
    expr = bbox_filter_expr(150.0, -1.0, 249.0, 1.0)
    kept = frag.split_by_row_group(expr)
    # only the two row groups whose [minx,maxx] stats overlap [150,249]
    assert len(kept) == 2
    assert sorted(rg.id for f in kept for rg in f.row_groups) == [1, 2]


def test_filter_expression_reaches_read_parquet(bbox_parquet, monkeypatch):
    path, _ = bbox_parquet
    import ray.data

    captured = {}
    real = ray.data.read_parquet

    def spy(paths, **kw):
        captured.update(kw)
        return real(paths, **kw)

    monkeypatch.setattr(ray.data, "read_parquet", spy)
    ds = read_geoparquet(path, bbox=(150.0, -1.0, 249.0, 1.0))
    assert isinstance(captured.get("filter"), pads.Expression)
    assert ds.count() == 100


def test_pushdown_rows_match_post_filter(bbox_parquet):
    path, x = bbox_parquet
    got = read_geoparquet(path, bbox=(37.5, -0.5, 202.5, 0.5)).to_pandas()
    want = x[(x >= 37.5) & (x <= 202.5)]
    assert sorted(got["minx"]) == list(want)
    # column pruning composes with the pushdown (filter references
    # non-projected bbox columns)
    slim = read_geoparquet(path, columns=["doc_id"], bbox=(37.5, -0.5, 202.5, 0.5))
    st = slim.to_pandas()
    assert list(st.columns) == ["doc_id"] and len(st) == len(want)


def test_fallback_without_bbox_columns(tmp_path):
    x = np.array([0.0, 10.0, 20.0])
    t = pa.table({"id": [0, 1, 2], "geometry": points_to_wkb(x, x)})
    path = str(tmp_path / "nobbox.parquet")
    pq.write_table(t, path)
    got = read_geoparquet(path, bbox=(5.0, 5.0, 25.0, 25.0)).to_pandas()
    assert sorted(got["id"]) == [1, 2]


def test_bbox_pushdown_mixed_fragment_schemas(tmp_path):
    """ADVICE r3: a multi-file read where only SOME files carry the bbox
    covering columns must fall back to the exact cx filter instead of
    pushing a filter that nulls out (and silently drops) the bare files."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.sources.geoparquet import read_geoparquet

    d = tmp_path / "mixed"
    os.makedirs(d)
    x = np.array([1.0, 5.0, 9.0])
    t_bbox = pa.table(
        {
            "doc_id": pa.array([0, 1, 2]),
            "geometry": points_to_wkb(x, x),
            "minx": pa.array(x), "miny": pa.array(x),
            "maxx": pa.array(x), "maxy": pa.array(x),
        }
    )
    t_bare = pa.table(
        {
            "doc_id": pa.array([10, 11, 12]),
            "geometry": points_to_wkb(x, x),
        }
    )
    pq.write_table(t_bbox, str(d / "a.parquet"))
    pq.write_table(t_bare, str(d / "b.parquet"))
    got = read_geoparquet(str(d), bbox=(0.0, 0.0, 6.0, 6.0)).to_pandas()
    # both files' in-bbox rows survive (bare file rows were the data-loss
    # hazard); doc_id 2/12 at (9,9) are outside
    assert sorted(got.doc_id) == [0, 1, 10, 11]
