"""overlay_shuffle (cell-partitioned, two large sides) must reproduce the
broadcast overlay exactly: same rows, same bytes, for every `how`."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.overlay import overlay, overlay_shuffle


def _layer(keys, minx, miny, maxx, maxy, id_name, cut=None):
    """Rect layer; with cut, each rect becomes a concave L (rect minus its
    top-right quadrant) via an explicit rectilinear polygon ring."""
    if cut is None:
        geom = W.boxes_to_wkb(
            np.asarray(minx, float), np.asarray(miny, float),
            np.asarray(maxx, float), np.asarray(maxy, float),
        )
    else:
        from geopandas_ray.stages.clip import _parts_to_wkb

        geoms = []
        for x0, y0, x1, y1 in zip(minx, miny, maxx, maxy):
            cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
            ring = np.array(
                [[x0, y0], [x1, y0], [x1, cy], [cx, cy], [cx, y1], [x0, y1], [x0, y0]],
                dtype=float,
            )
            geoms.append(_parts_to_wkb([(3, [ring])]))
        geom = pa.array(geoms, type=pa.large_binary())
    return ray.data.from_arrow(
        pa.table({id_name: pa.array(keys, type=pa.int64()), "geometry": geom})
    )


def _canon(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    df["__g"] = df["geometry"].map(lambda b: b.hex() if b is not None else "")
    df = df.drop(columns=["geometry"])
    df = df.sort_values(list(df.columns), na_position="last")
    return df.reset_index(drop=True)


@pytest.fixture(scope="module")
def layers():
    rng = np.random.RandomState(11)
    n1, n2 = 60, 45
    k1 = np.arange(n1)
    x1 = rng.randint(0, 900, n1).astype(float)
    y1 = rng.randint(0, 900, n1).astype(float)
    a = _layer(k1, x1, y1, x1 + rng.randint(30, 120, n1), y1 + rng.randint(30, 120, n1), "akey", cut=True)
    k2 = np.arange(n2)
    x2 = rng.randint(0, 900, n2).astype(float)
    y2 = rng.randint(0, 900, n2).astype(float)
    b = _layer(k2, x2, y2, x2 + rng.randint(30, 150, n2), y2 + rng.randint(30, 150, n2), "bkey")
    return a.materialize(), b.materialize()


@pytest.mark.parametrize("how", ["intersection", "difference", "identity", "union", "symmetric_difference"])
def test_overlay_shuffle_matches_broadcast(layers, how):
    a, b = layers
    want = _canon(overlay(a, b, how=how))
    got = _canon(
        overlay_shuffle(a, b, how=how, left_id="akey", right_id="bkey", res=4, shuffle_partitions=8)
    )
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (how, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_overlay_shuffle_overlapping_colnames(layers):
    a, b = layers
    # same attr name on both sides -> _1/_2 suffixes like broadcast
    a2 = a.map_batches(lambda t: t.rename_columns(["key", "geometry"]), batch_format="pyarrow")
    b2 = b.map_batches(lambda t: t.rename_columns(["key", "geometry"]), batch_format="pyarrow")
    want = _canon(overlay(a2, b2, how="intersection"))
    got = _canon(
        overlay_shuffle(a2, b2, how="intersection", left_id="key", right_id="key", res=4)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_overlay_shuffle_requires_ids(layers):
    a, b = layers
    with pytest.raises(ValueError, match="left_id"):
        overlay_shuffle(a, b, how="union")


def test_overlay_auto_plan_selection(layers):
    """r3 VERDICT next-round #5: the facade entry picks the shuffle plan for
    two large Datasets with ids, the broadcast plan otherwise - and the auto
    result is byte-parity with the dedicated plans."""
    from geopandas_ray.stages.overlay import choose_overlay_plan, overlay_auto

    a, b = layers
    # no ids -> broadcast regardless of size
    plan, _ = choose_overlay_plan(b, None, None, threshold_rows=1)
    assert plan == "broadcast"
    # ids + right side above threshold -> shuffle
    plan, _ = choose_overlay_plan(b, "akey", "bkey", threshold_rows=10)
    assert plan == "shuffle"
    # ids but right side below threshold -> broadcast
    plan, _ = choose_overlay_plan(b, "akey", "bkey", threshold_rows=10_000)
    assert plan == "broadcast"
    # a pa.Table right side is broadcast-only
    plan, _ = choose_overlay_plan(pa.table({"x": [1]}), "akey", "bkey", threshold_rows=0)
    assert plan == "broadcast"

    want = _canon(overlay(a, b, "intersection"))
    got_shuffle = _canon(
        overlay_auto(a, b, "intersection", left_id="akey", right_id="bkey", threshold_rows=10)
    )
    got_bcast = _canon(
        overlay_auto(a, b, "intersection", left_id="akey", right_id="bkey", threshold_rows=10_000)
    )
    pd.testing.assert_frame_equal(want, got_shuffle)
    pd.testing.assert_frame_equal(want, got_bcast)


def test_overlay_auto_facade(layers):
    from geopandas_ray.frame import GeoDataset
    from geopandas_ray.stages import overlay as OV

    a, b = layers
    orig = OV.OVERLAY_SHUFFLE_THRESHOLD_ROWS
    try:
        OV.OVERLAY_SHUFFLE_THRESHOLD_ROWS = 10
        got = _canon(
            GeoDataset(a).overlay(GeoDataset(b), "difference", left_id="akey", right_id="bkey").ds
        )
    finally:
        OV.OVERLAY_SHUFFLE_THRESHOLD_ROWS = orig
    want = _canon(overlay(a, b, "difference"))
    pd.testing.assert_frame_equal(want, got)
