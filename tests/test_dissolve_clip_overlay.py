import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.clip import clip, clip_rect
from geopandas_ray.stages.dissolve import dissolve, total_bounds, union_all
from geopandas_ray.stages.overlay import overlay


def _areas(df):
    return K.area(W.from_wkb(df.geometry.tolist()))


@pytest.fixture
def zones():
    return ray.data.from_arrow(
        pa.table(
            {
                "cat": pa.array(["A", "A", "B", "B"]),
                "w": pa.array([1.0, 2.0, 3.0, 4.0]),
                "geometry": W.boxes_to_wkb(
                    [0.0, 1.0, 10.0, 20.0], [0.0, 1.0, 10.0, 20.0], [2.0, 3.0, 12.0, 22.0], [2.0, 3.0, 12.0, 22.0]
                ),
            }
        )
    )


def test_dissolve_union_and_aggs(zones):
    d = dissolve(zones, by="cat", aggfunc={"w": ["sum", "min", "max", "count"]}).to_pandas()
    d = d.sort_values("cat").reset_index(drop=True)
    a = _areas(d)
    assert np.allclose(sorted(a), [7.0, 8.0])  # A overlaps (7), B disjoint (8)
    assert d.w_sum.tolist() == [3.0, 7.0]
    assert d.w_min.tolist() == [1.0, 3.0]
    assert d.w_max.tolist() == [2.0, 4.0]
    assert d.w_count.tolist() == [2, 2]


def test_dissolve_points_dedup():
    pts = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 1, 1]),
                "geometry": W.points_to_wkb([0.0, 0.0, 1.0], [0.0, 0.0, 1.0]),
            }
        )
    )
    d = dissolve(pts, by="k").to_pandas()
    g = W.from_wkb(d.geometry.tolist())
    assert K.count_geometries(g)[0] == 2  # coincident points merged


def test_dissolve_global_and_union_all(zones):
    g = dissolve(zones, by=None).to_pandas()
    assert len(g) == 1
    assert np.isclose(_areas(g)[0], 15.0)
    w = union_all(zones)
    assert np.isclose(K.area(W.from_wkb([w]))[0], 15.0)
    assert np.allclose(total_bounds(zones), [0, 0, 22, 22])


def test_dissolve_dropna():
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(["a", None, "a"]),
                "geometry": W.points_to_wkb([0.0, 1.0, 2.0], [0.0, 1.0, 2.0]),
            }
        )
    )
    d = dissolve(ds, by="k", dropna=True).to_pandas()
    assert d.k.tolist() == ["a"]


def test_clip_line():
    import struct

    line = struct.pack("<BII", 1, 2, 2) + np.array([-5.0, 5.0, 15.0, 5.0]).astype("<f8").tobytes()
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([0]), "geometry": pa.array([line], type=pa.large_binary())})
    )
    c = clip_rect(ds, 0, 0, 10, 10).to_pandas()
    g = W.from_wkb(c.geometry.tolist())
    assert np.isclose(K.length(g)[0], 10.0)


def test_clip_drops_outside():
    ds = ray.data.from_arrow(
        pa.table(
            {"id": pa.array([0, 1]), "geometry": W.points_to_wkb([5.0, 50.0], [5.0, 50.0])}
        )
    )
    assert clip_rect(ds, 0, 0, 10, 10).to_pandas().id.tolist() == [0]


def test_overlay_golden_2x2():
    """The reference docstring example (tools/overlay.py:131-165)."""
    df1 = ray.data.from_arrow(
        pa.table(
            {"col1": pa.array([1, 2]), "geometry": W.boxes_to_wkb([0.0, 2.0], [0.0, 2.0], [2.0, 4.0], [2.0, 4.0])}
        )
    )
    df2 = pa.table(
        {"col2": pa.array([1, 2]), "geometry": W.boxes_to_wkb([1.0, 3.0], [1.0, 3.0], [3.0, 5.0], [3.0, 5.0])}
    )
    expect = {
        "intersection": (3, 3.0),
        "difference": (2, 5.0),
        "union": (7, 13.0),
        "identity": (5, 8.0),
        "symmetric_difference": (4, 10.0),
    }
    for how, (nrows, area) in expect.items():
        df = overlay(df1, df2, how).to_pandas()
        assert len(df) == nrows, how
        assert np.isclose(_areas(df).sum(), area), how


def test_overlay_attrs_nulls():
    df1 = ray.data.from_arrow(
        pa.table({"col1": pa.array([1]), "geometry": W.boxes_to_wkb([0.0], [0.0], [2.0], [2.0])})
    )
    df2 = pa.table(
        {"col2": pa.array([9]), "geometry": W.boxes_to_wkb([10.0], [10.0], [12.0], [12.0])}
    )
    u = overlay(df1, df2, "union").to_pandas()
    assert len(u) == 2
    assert u.col1.isna().sum() == 1 and u.col2.isna().sum() == 1


def test_overlay_points_layer():
    """Point-layer overlay (reference benchmarks/overlay.py:63-70 shape):
    keep_geom_type filters to the POINT dimension of df1."""
    pts = ray.data.from_arrow(
        pa.table(
            {
                "pid": pa.array([0, 1, 2], type=pa.int64()),
                "geometry": W.points_to_wkb([1.0, 5.0, 50.0], [1.0, 5.0, 50.0]),
            }
        )
    )
    polys = pa.table(
        {"zid": pa.array([0], type=pa.int64()), "geometry": W.boxes_to_wkb([0.0], [0.0], [10.0], [10.0])}
    )
    inter = overlay(pts, polys, "intersection").to_pandas()
    assert sorted(inter.pid) == [0, 1]
    g = W.from_wkb(inter.geometry.tolist())
    assert all(t == 1 for t in g.row_types)
    diff = overlay(pts, polys, "difference").to_pandas()
    assert diff.pid.tolist() == [2]


def test_overlay_keep_geom_type_false_keeps_all():
    df1 = ray.data.from_arrow(
        pa.table({"a": pa.array([1], type=pa.int64()), "geometry": W.boxes_to_wkb([0.0], [0.0], [2.0], [2.0])})
    )
    df2 = pa.table(
        {"b": pa.array([1], type=pa.int64()), "geometry": W.boxes_to_wkb([1.0], [1.0], [3.0], [3.0])}
    )
    on = overlay(df1, df2, "intersection", keep_geom_type=False).to_pandas()
    assert len(on) == 1


def test_overlay_union_fully_covered_df2_row():
    # a df2 row fully covered by df1 has an EMPTY reverse difference and must
    # not reappear with its full geometry in union output (r1 latent bug)
    df1 = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([1]),
                "geometry": W.boxes_to_wkb([0.0], [0.0], [10.0], [10.0]),
            }
        )
    )
    df2 = pa.table(
        {
            "b": pa.array([1, 2]),
            # first box inside df1's box (fully covered), second disjoint
            "geometry": W.boxes_to_wkb([2.0, 20.0], [2.0, 20.0], [4.0, 30.0], [4.0, 30.0]),
        }
    )
    out = overlay(df1, df2, "union").to_pandas()
    g = W.from_wkb(out.geometry.tolist())
    areas = K.area(g)
    rows = [
        (row.a if row.a == row.a else None, row.b if row.b == row.b else None, round(a, 6))
        for (_, row), a in zip(out.iterrows(), areas)
    ]
    # expected: intersection (1,1,4), df1 diff (1,None,96), df2-unmatched (None,2,100)
    assert (1.0, 1.0, 4.0) in rows
    total = sorted(round(a, 6) for a in areas)
    assert total == [4.0, 96.0, 100.0]


def test_union_rows_line_overlap_and_mixed_absorption():
    """GEOS unary_union parity: overlapping linework appears once; points
    on lines / in polygons and line portions inside polygons are absorbed."""
    from geopandas_ray.geom.union import union_wkb_values
    from geopandas_ray.geom import wkb as W
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.stages.clip import _parts_to_wkb
    import numpy as np

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    sq = _parts_to_wkb(
        [(W.POLYGON, [np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])])]
    )
    # two collinear overlapping lines: [0,10] + [5,15] -> length 15, not 20
    u = union_wkb_values([line((0, 0), (10, 0)), line((5, 0), (15, 0))])
    g = W.from_wkb([u])
    assert K.length(g)[0] == 15.0
    # overlap-free lines keep their original representation
    u = union_wkb_values([line((0, 0), (10, 0)), line((0, 5), (10, 5))])
    g = W.from_wkb([u])
    assert K.length(g)[0] == 20.0 and int(g.row_types[0]) == 5
    # line through polygon: inside portion absorbed -> total line length 10
    u = union_wkb_values([line((-5, 5), (15, 5)), sq])
    g = W.from_wkb([u])
    # 2 outside stubs of 5 + perimeter 40
    assert K.area(g)[0] == 100.0
    assert abs(K.length(g)[0] - 50.0) < 1e-12
    # points absorbed by line / polygon; surviving point kept
    pts = W.points_to_wkb([5.0, 5.0, 50.0], [0.0, 5.0, 50.0])
    u = union_wkb_values([pts[0].as_py(), pts[1].as_py(), pts[2].as_py(),
                          line((0, 0), (10, 0)), sq])
    g = W.from_wkb([u])
    # one surviving point (50,50): find point parts
    pt_parts = [p for p in range(len(g.part_types)) if int(g.part_types[p]) == 1]
    assert len(pt_parts) == 1
    r0, _ = g.part_ring_range(pt_parts[0])
    assert g.ring_coords(r0).tolist() == [[50.0, 50.0]]


def test_rects_to_polygon_wkb_fast_path_bytes():
    """The single-rect direct encoder must stay byte-identical to the
    generic _parts_to_wkb path (WKB byte stability feeds dedup hashing)."""
    import numpy as np
    from geopandas_ray.stages.clip import _parts_to_wkb
    from geopandas_ray.stages.overlay import _rects_to_polygon_wkb

    x0, y0, x1, y1 = 1.5, -2.0, 7.25, 9.0
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
    assert _rects_to_polygon_wkb(np.array([[x0, y0, x1, y1]])) == _parts_to_wkb([(3, [ring])])


def test_dissolve_sort_and_observed_categorical():
    import pandas as pd

    df = pd.DataFrame(
        {
            "cat": pd.Categorical(["b", "a", "b"], categories=["a", "b", "c"]),
            "w": [1.0, 2.0, 3.0],
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    tbl = tbl.append_column("geometry", W.points_to_wkb([0.0, 1.0, 2.0], [0.0, 1.0, 2.0]))
    ds = ray.data.from_arrow(tbl)
    # observed=False -> category "c" appears with empty aggregates
    d = dissolve(ds, by="cat", aggfunc={"w": "sum"}, observed=False).to_pandas()
    assert d.cat.astype(str).tolist() == ["a", "b", "c"]  # sort=True default
    assert d.w_sum.tolist()[:2] == [2.0, 4.0]
    assert d.geometry.iloc[2] is None or d.geometry.isna().iloc[2]
    # observed=True drops the unobserved category
    d = dissolve(ds, by="cat", aggfunc={"w": "sum"}, observed=True).to_pandas()
    assert d.cat.astype(str).tolist() == ["a", "b"]


def test_union_all_and_dissolve_method_param(zones):
    from geopandas_ray.stages.dissolve import dissolve as _dis, union_all as _ua

    a = _ua(zones, method="unary")
    b = _ua(zones, method="coverage")
    assert a == b  # same exact union; coverage is a parity-accepted hint
    with pytest.raises(ValueError):
        _ua(zones, method="nope")
    with pytest.raises(ValueError):
        _dis(zones, by="cat", method="nope")


def test_dissolve_high_cardinality_matches_pandas():
    # 20k distinct keys spread over many blocks, some keys spanning blocks:
    # exercises the hash-partitioned final (vectorized attrs, singleton
    # geometry passthrough, per-key union only for multi-block keys)
    import pandas as pd
    from geopandas_ray.geom.union import union_wkb_values

    rng = np.random.RandomState(7)
    n = 60000
    keys = rng.randint(0, 20000, n)
    x = (keys % 97).astype(np.float64)
    y = rng.randint(0, 3, n).astype(np.float64)  # some keys get >1 distinct point
    w = rng.randint(0, 1000, n).astype(np.float64)
    t = pa.table({"k": pa.array(keys), "w": pa.array(w), "geometry": W.points_to_wkb(x, y)})
    ds = ray.data.from_arrow(t).repartition(16)
    got = dissolve(ds, by="k", aggfunc={"w": ["sum", "min", "count"]}).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)

    pdf = pd.DataFrame({"k": keys, "w": w, "g": W.points_to_wkb(x, y).to_pylist()})
    exp = pdf.groupby("k").agg(w_sum=("w", "sum"), w_min=("w", "min"), w_count=("w", "count")).reset_index()
    assert len(got) == len(exp) == pdf.k.nunique()
    assert np.allclose(got.w_sum, exp.w_sum) and np.allclose(got.w_min, exp.w_min)
    assert (got.w_count.to_numpy() == exp.w_count.to_numpy()).all()
    # per-key geometry union matches a driver-side union of the same rows
    sub = got[got.k < 200].reset_index(drop=True)
    for _, r in sub.iterrows():
        expected = union_wkb_values(pdf[pdf.k == r.k].g.tolist())
        assert r.geometry == expected, int(r.k)


def test_dissolve_first_last_block_order_preserved():
    # first/last must be iloc[0]/iloc[-1] over arrival order WITHIN a
    # key (NaN not skipped) — the gather-by-first/last-index path
    import pandas as pd

    t = pa.table(
        {
            "k": pa.array([1, 1, 1]),
            "v": pa.array([None, 5.0, None], type=pa.float64()),
            "geometry": W.points_to_wkb([0.0, 1.0, 2.0], [0.0, 0.0, 0.0]),
        }
    )
    d = dissolve(ray.data.from_arrow(t), by="k", aggfunc={"v": ["first", "last"]}).to_pandas()
    # single block: partial stage already takes iloc[0]=NaN, iloc[-1]=NaN
    assert pd.isna(d.v_first.iloc[0]) and pd.isna(d.v_last.iloc[0])


def test_clip_sort_and_keep_geom_type_homogeneous():
    # keep_geom_type over homogeneous polygons routes through the filter and
    # keeps everything (dims match); sort orders by the id column
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([3, 1, 2]),
                "geometry": W.boxes_to_wkb(
                    [0.0, 4.0, 8.0], [0.0, 4.0, 8.0], [3.0, 7.0, 11.0], [3.0, 7.0, 11.0]
                ),
            }
        )
    )
    got = clip_rect(ds, 1, 1, 9, 9, keep_geom_type=True, sort=True).to_pandas()
    assert got.id.tolist() == [1, 2, 3]
    plain = clip_rect(ds, 1, 1, 9, 9).to_pandas().sort_values("id")
    assert got.geometry.tolist() == plain.geometry.tolist()


def test_clip_keep_geom_type_mixed_warns():
    # reference tests/test_clip.py:308-319: mixed-dim input warns and the
    # filter is skipped (everything clipped comes back)
    pts = W.points_to_wkb([1.0, 20.0], [1.0, 20.0]).to_pylist()
    box = W.boxes_to_wkb([0.0], [0.0], [5.0], [5.0]).to_pylist()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2]),
                "geometry": pa.array(pts + box, type=pa.large_binary()),
            }
        )
    )
    with pytest.warns(UserWarning, match="Geometry types of input geodataframe"):
        got = clip_rect(ds, 0, 0, 10, 10, keep_geom_type=True, sort=True).to_pandas()
    assert got.id.tolist() == [0, 2]


def test_clip_general_mask_sort_kwargs():
    # kwargs thread through the general-mask path too
    pts = W.points_to_wkb([1.0, 3.0, 9.0], [1.0, 3.0, 9.0])
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([2, 0, 1]), "geometry": pts})
    )
    mask = pa.table({"geometry": W.boxes_to_wkb([0.5], [0.5], [4.0], [4.0])})
    got = clip(ds, mask, keep_geom_type=True, sort=True).to_pandas()
    assert got.id.tolist() == [0, 2]


def test_dissolve_level():
    # level= groups by index-role columns (index-as-columns model,
    # geodataframe.py:1338): int levels positional into index_cols, str
    # levels name the column directly
    from geopandas_ray.stages.dissolve import dissolve

    ds = ray.data.from_arrow(
        pa.table(
            {
                "lvl_a": pa.array(["x", "x", "y", "y"]),
                "lvl_b": pa.array([0, 1, 0, 1]),
                "w": pa.array([1.0, 2.0, 3.0, 4.0]),
                "geometry": W.boxes_to_wkb(
                    [0.0, 1.0, 10.0, 20.0], [0.0, 1.0, 10.0, 20.0],
                    [2.0, 3.0, 12.0, 22.0], [2.0, 3.0, 12.0, 22.0],
                ),
            }
        )
    )
    by_int = dissolve(
        ds, level=0, index_cols=["lvl_a", "lvl_b"], aggfunc={"w": "sum"}
    ).to_pandas().sort_values("lvl_a").reset_index(drop=True)
    by_str = dissolve(ds, level="lvl_a", aggfunc={"w": "sum"}).to_pandas().sort_values(
        "lvl_a"
    ).reset_index(drop=True)
    by_col = dissolve(ds, by="lvl_a", aggfunc={"w": "sum"}).to_pandas().sort_values(
        "lvl_a"
    ).reset_index(drop=True)
    assert by_int.w_sum.tolist() == by_col.w_sum.tolist() == [3.0, 7.0]
    assert by_str.geometry.tolist() == by_col.geometry.tolist()
    with pytest.raises(ValueError, match="not both"):
        dissolve(ds, by="lvl_a", level=0, index_cols=["lvl_a"])
    with pytest.raises(ValueError, match="index_cols"):
        dissolve(ds, level=1)


def test_estimate_utm_crs_roundtrip():
    from geopandas_ray.crs import estimate_utm_crs, to_crs
    from geopandas_ray.frame import GeoDataset

    # NYC-ish points -> zone 18 north; Sydney-ish -> zone 56 south
    nyc = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1]),
                "geometry": W.points_to_wkb([-74.0, -73.9], [40.7, 40.8]),
            }
        )
    )
    syd = ray.data.from_arrow(
        pa.table(
            {"id": pa.array([0]), "geometry": W.points_to_wkb([151.2], [-33.9])}
        )
    )
    assert estimate_utm_crs(nyc) == "EPSG:32618"
    assert estimate_utm_crs(syd) == "EPSG:32756"
    # the estimated code is consumable by to_crs and roundtrips
    back = to_crs(to_crs(nyc, "EPSG:4326", "EPSG:32618"), "EPSG:32618", "EPSG:4326")
    got = back.to_pandas().sort_values("id")
    bb = _areas.__globals__["K"].bounds(W.from_wkb(got.geometry.tolist()))
    assert np.allclose(bb[:, 0], [-74.0, -73.9], atol=1e-9)
    assert np.allclose(bb[:, 1], [40.7, 40.8], atol=1e-9)
    # facade: metadata-carrying path
    gd = GeoDataset(nyc, crs="EPSG:4326")
    assert gd.estimate_utm_crs() == "EPSG:32618"
    with pytest.raises(RuntimeError, match="geographic"):
        GeoDataset(nyc, crs="EPSG:3035").estimate_utm_crs()


def test_clip_sort_geometry_only_raises():
    """r4 review: sort=True with no derivable sort column raises a clear
    ValueError, not a bare StopIteration."""
    ds = ray.data.from_arrow(
        pa.table({"geometry": W.points_to_wkb([1.0, 2.0], [1.0, 2.0])})
    )
    with pytest.raises(ValueError, match="sort_col"):
        clip_rect(ds, 0, 0, 10, 10, sort=True).to_pandas()
