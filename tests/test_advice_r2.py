"""Regression tests for the round-2 ADVICE findings."""

import numpy as np
import pyarrow as pa
import pytest


def test_compact_with_own_descendants_does_not_over_collapse():
    # Input contains P plus P's 4 children plus two of P's siblings (S3
    # absent). Collapsing the children re-adds P; without dedupe the next
    # level saw rows [P, P, S1, S2] under parent G and collapsed to G,
    # silently covering S3's region.
    from geopandas_ray.grid import cell_children, cell_id, compact_cells

    g = cell_id([512.0], [512.0], 1)
    _, sibs = cell_children(g, 1)  # P, S1, S2, S3 at res 2
    p, s1, s2 = sibs[0:1], sibs[1:2], sibs[2:3]
    _, p_kids = cell_children(p, 1)  # res 3
    out = compact_cells(np.concatenate([p, s1, s2, p_kids]))
    assert set(out.tolist()) == {int(p[0]), int(s1[0]), int(s2[0])}
    # still collapses fully when S3 is present too
    out2 = compact_cells(np.concatenate([sibs, p_kids]))
    assert set(out2.tolist()) == {int(g[0])}


def test_geodataset_binary_operand_rejected():
    import ray.data
    from geopandas_ray.frame import GeoDataset

    gd = GeoDataset.from_xy(ray.data.from_items([{"x": 1.0, "y": 2.0}]), "x", "y")
    other = GeoDataset.from_xy(ray.data.from_items([{"x": 9.0, "y": 9.0}]), "x", "y")
    with pytest.raises(TypeError, match="join"):
        gd.distance(other)
    with pytest.raises(TypeError, match="join"):
        gd.intersects(other)
    with pytest.raises(TypeError, match="join"):
        gd.within(other.ds)


def test_geoarrow_point_all_null_block():
    from geopandas_ray.geom.wkb import from_wkb
    from geopandas_ray.sources.geoarrow import geoms_to_geoarrow

    g = from_wkb(pa.array([None, None, None], type=pa.large_binary()))
    arr = geoms_to_geoarrow(g, "point")
    assert len(arr) == 3 and arr.null_count == 3
    assert pa.types.is_fixed_size_list(arr.type)


def test_hausdorff_densify_rint_and_validation():
    from geopandas_ray.geom.kernels import hausdorff_distance_pair
    from geopandas_ray.geom.wkb import from_wkb
    from geopandas_ray.stages.clip import _parts_to_wkb
    from geopandas_ray.geom import wkb as W

    line = _parts_to_wkb([(W.LINESTRING, [np.array([[0.0, 0.0], [10.0, 0.0]])])])
    ends = _parts_to_wkb(
        [(W.POINT, [np.array([[0.0, 0.0]])]), (W.POINT, [np.array([[10.0, 0.0]])])]
    )
    g = from_wkb(pa.array([line, ends], type=pa.large_binary()))
    # target = the line's own endpoints, so the directed sup is attained at
    # the sample nearest mid-segment. GEOS rint(1/0.3)=3 subsegments samples
    # x in {0, 10/3, 20/3, 10} -> sup 10/3; ceil would give 4 subsegments
    # sampling x=5 -> sup 5. Distinguishes the rounding modes.
    d = hausdorff_distance_pair(g, 0, g, 1, densify=0.3)
    assert np.isclose(d, 10.0 / 3.0)
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="densify"):
            hausdorff_distance_pair(g, 0, g, 1, densify=bad)


def test_triu_cache_bounded():
    from geopandas_ray.geom import booleans as B

    B._TRIU_CACHE.clear()
    for n in (64, 128, 129, 600):
        edges = np.zeros((n, 4))
        edges[:, 2] = 1.0
        B._crossing_xs(edges)
    assert 129 not in B._TRIU_CACHE and 600 not in B._TRIU_CACHE
    assert all(k <= 128 for k in B._TRIU_CACHE)
