"""geopandas_ray.testing — assert_geodataset_equal / geom_equals helpers
(reference geopandas/testing.py)."""

import numpy as np
import pyarrow as pa
import pytest

from geopandas_ray.geom import wkb as W
from geopandas_ray.testing import (
    assert_geodataset_equal,
    geom_almost_equals,
    geom_equals,
)


def _t(xs, ys, ids=None):
    cols = {"geometry": W.points_to_wkb(np.asarray(xs, float), np.asarray(ys, float))}
    if ids is not None:
        cols = {"id": pa.array(ids, type=pa.int64()), **cols}
    return pa.table(cols)


def test_geom_equals_spatial_not_bytewise():
    # same box, ring rotated: spatially equal, byte-different
    a = pa.table({"geometry": W.boxes_to_wkb([0.0], [0.0], [4.0], [4.0])})
    from geopandas_ray.stages.clip import _parts_to_wkb

    rot = _parts_to_wkb(
        [(3, [np.array([[4, 0], [4, 4], [0, 4], [0, 0], [4, 0]], dtype=np.float64)])]
    )
    b = pa.table({"geometry": pa.array([rot], type=pa.large_binary())})
    assert a.column("geometry")[0].as_py() != rot
    assert geom_equals(a, b)


def test_geom_equals_null_alignment():
    a = pa.table({"geometry": pa.array([None], type=pa.large_binary())})
    b = pa.table({"geometry": W.points_to_wkb([1.0], [1.0])})
    assert not geom_equals(a, b)
    assert geom_equals(a, a)


def test_geom_almost_equals_decimal():
    a = _t([1.0, 2.0], [1.0, 2.0])
    b = _t([1.0 + 2e-4, 2.0], [1.0, 2.0 - 2e-4])
    assert geom_almost_equals(a, b, decimal=3)
    assert not geom_almost_equals(a, b, decimal=5)


def test_assert_geodataset_equal_paths():
    a = _t([1.0, 2.0], [3.0, 4.0], ids=[1, 2])
    assert_geodataset_equal(a, a)
    # row order ignored only with check_like
    b = _t([2.0, 1.0], [4.0, 3.0], ids=[2, 1])
    with pytest.raises(AssertionError):
        assert_geodataset_equal(a, b)
    assert_geodataset_equal(a, b, check_like=True)
    # column mismatch
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_geodataset_equal(a, _t([1.0], [3.0]))
    # value mismatch
    c = _t([1.0, 2.0], [3.0, 4.0], ids=[1, 7])
    with pytest.raises(AssertionError, match="values differ"):
        assert_geodataset_equal(a, c)
    # geometry mismatch
    d = _t([1.0, 9.0], [3.0, 4.0], ids=[1, 2])
    with pytest.raises(AssertionError, match="geometry"):
        assert_geodataset_equal(a, d)
    # less precise tolerance
    e = _t([1.0 + 1e-4, 2.0], [3.0, 4.0], ids=[1, 2])
    with pytest.raises(AssertionError):
        assert_geodataset_equal(a, e)
    assert_geodataset_equal(a, e, check_less_precise=True)


def test_assert_crs_and_show_versions(capsys):
    import ray.data

    from geopandas_ray import GeoDataset

    t = _t([1.0], [1.0])
    ga = GeoDataset(ray.data.from_arrow(t), crs="EPSG:4326")
    gb = GeoDataset(ray.data.from_arrow(t), crs="EPSG:3857")
    with pytest.raises(AssertionError, match="CRS"):
        assert_geodataset_equal(ga, gb)
    assert_geodataset_equal(ga, ga)
    from geopandas_ray.testing import show_versions

    show_versions()
    out = capsys.readouterr().out
    assert "geopandas_ray" in out and "ray" in out
