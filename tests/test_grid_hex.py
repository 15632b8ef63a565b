"""H3-analog hex grid (grid_hex.py): assignment, hierarchy, kring, polyfill."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray import grid_hex as H
from geopandas_ray.geom import wkb as W


def test_roundtrip_pack_unpack():
    rng = np.random.default_rng(3)
    q = rng.integers(-1000, 1000, 500)
    r = rng.integers(-1000, 1000, 500)
    for res in (0, 5, 9):
        c = H.hex_pack(res, q, r)
        res2, q2, r2 = H.hex_unpack(c)
        assert (res2 == res).all() and (q2 == q).all() and (r2 == r).all()


def test_center_reassigns_to_same_cell():
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1024, 2000)
    y = rng.uniform(0, 1024, 2000)
    for res in (6, 8, 10):
        c = H.hex_cell(x, y, res)
        cx, cy = H.hex_center(c)
        assert (H.hex_cell(cx, cy, res) == c).all()
        # every point is within one hex size of its cell center
        s = H.hex_size(res)
        assert (np.hypot(x - cx, y - cy) <= s + 1e-9).all()


def test_nearest_center_property():
    # the assigned cell's center is the NEAREST hex center (cube rounding)
    rng = np.random.default_rng(5)
    x = rng.uniform(100, 200, 300)
    y = rng.uniform(100, 200, 300)
    res = 7
    c = H.hex_cell(x, y, res)
    cx, cy = H.hex_center(c)
    d_own = np.hypot(x - cx, y - cy)
    for nb_off in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        _, q, r = H.hex_unpack(c)
        nb = H.hex_pack(res, q + nb_off[0], r + nb_off[1])
        nx, ny = H.hex_center(nb)
        d_nb = np.hypot(x - nx, y - ny)
        assert (d_own <= d_nb + 1e-9).all()


def test_parent_contains_child_center():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1024, 1000)
    y = rng.uniform(0, 1024, 1000)
    c = H.hex_cell(x, y, 9)
    p = H.hex_parent(c, 1)
    res, _, _ = H.hex_unpack(p)
    assert (res == 8).all()
    cx, cy = H.hex_center(c)
    # the child's center maps into the parent at res 8
    assert (H.hex_cell(cx, cy, 8) == p).all()


def test_kring_sizes_and_distance():
    c = int(H.hex_cell(np.array([512.0]), np.array([512.0]), 8)[0])
    for k in (0, 1, 2, 3):
        ring = H.hex_kring(c, k)
        assert len(ring) == 1 + 3 * k * (k + 1)  # hex disk size
        assert max(H.hex_grid_distance(c, int(b)) for b in ring) == (k if k else 0)


def test_polyfill_center_semantics():
    # brute force: enumerate a dense lattice of points, their cells must all
    # be in the polyfill iff the CELL CENTER is inside
    ring = np.array([[100.0, 100], [300, 100], [300, 260], [100, 260], [100, 100]])
    res = 6
    cells = set(int(c) for c in H.hex_polyfill([ring], res))
    # every cell whose center is inside must be present; spot check via grid
    xs, ys = np.meshgrid(np.linspace(90, 310, 60), np.linspace(90, 270, 60))
    cand = np.unique(H.hex_cell(xs.ravel(), ys.ravel(), res))
    cx, cy = H.hex_center(cand)
    inside = (cx > 100) & (cx < 300) & (cy > 100) & (cy < 260)
    for cc, inn in zip(cand, inside):
        assert (int(cc) in cells) == bool(inn)


def test_with_hex_cell_stage():
    from geopandas_ray.stages.cells import with_hex_cell, with_hex_kring

    pts = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1], type=pa.int64()),
                "geometry": W.points_to_wkb([10.0, 900.0], [10.0, 900.0]),
            }
        )
    )
    out = with_hex_cell(pts, res=8).to_pandas().sort_values("id")
    exp = H.hex_cell(np.array([10.0, 900.0]), np.array([10.0, 900.0]), 8)
    assert out.hex_cell.tolist() == exp.tolist()
    kr = with_hex_kring(with_hex_cell(pts, res=8), k=1).to_pandas()
    assert len(kr) == 2 * 7  # 1 + 3*1*2 per row


def test_with_hex_cover_stage():
    from geopandas_ray.stages.cells import with_hex_cover

    zones = ray.data.from_arrow(
        pa.table(
            {
                "zid": pa.array([0, 1], type=pa.int64()),
                "geometry": W.boxes_to_wkb([100.0, 0.0], [100.0, 0.0], [300.0, 2.0], [260.0, 2.0]),
            }
        )
    )
    out = with_hex_cover(zones, res=6).to_pandas()
    big = out[out.zid == 0]
    assert len(big) > 10  # a 200x160 box at res 6 covers many hexes
    # brute check against the module polyfill
    ring = np.array([[100.0, 100], [300, 100], [300, 260], [100, 260], [100, 100]])
    assert set(big.hex_cell) == set(int(c) for c in H.hex_polyfill([ring], 6))
    # the thin box may polyfill to zero centers -> centroid fallback keeps it
    assert (out.zid == 1).sum() >= 1
