"""crosses / overlaps / disjoint predicates (reference base.py:2113-2350,
sindex.py:6-8) across all evaluation tiers: bbox-equivalent fast path,
point-batch kernels, and the general per-pair DE-9IM path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.geom.wkb import boxes_to_wkb, points_to_wkb
from geopandas_ray.stages.binary import binary_predicate
from geopandas_ray.stages.clip import _parts_to_wkb
from geopandas_ray.stages.sjoin import sjoin, sjoin_shuffle


def poly(*pts):
    r = np.array(list(pts) + [pts[0]], dtype=float)
    return _parts_to_wkb([(3, [r])])


def line(*pts):
    return _parts_to_wkb([(2, [np.array(pts, dtype=float)])])


def rect(x0, y0, x1, y1):
    return boxes_to_wkb(np.array([x0]), np.array([y0]), np.array([x1]), np.array([y1]))[
        0
    ].as_py()


def pt(x, y):
    return points_to_wkb(np.array([float(x)]), np.array([float(y)]))[0].as_py()


def run_pred(pred, pairs):
    t = pa.table(
        {
            "geometry": pa.array([p[0] for p in pairs], type=pa.large_binary()),
            "other": pa.array([p[1] for p in pairs], type=pa.large_binary()),
        }
    )
    out = binary_predicate(ray.data.from_arrow(t), pred, "other").to_pandas()
    return list(out[pred])


def test_overlaps_rects_and_points():
    a = rect(0, 0, 10, 10)
    got = run_pred(
        "overlaps",
        [
            (a, rect(5, 5, 15, 15)),  # partial overlap -> True
            (a, rect(2, 2, 8, 8)),  # contained -> False
            (a, a),  # equal -> False
            (a, rect(10, 0, 20, 10)),  # shared edge only -> False
            (a, rect(20, 20, 30, 30)),  # disjoint -> False
            (pt(5, 5), a),  # dim mismatch -> False
            (pt(5, 5), pt(5, 5)),  # equal points -> False
        ],
    )
    assert got == [True, False, False, False, False, False, False]


def test_overlaps_general_polygons_and_lines():
    tri = poly((0, 0), (40, 0), (0, 40))
    tri2 = poly((5, 5), (45, 5), (5, 45))
    l1 = line((0, 0), (10, 10))
    got = run_pred(
        "overlaps",
        [
            (tri, tri2),  # partial interior overlap -> True
            (tri, rect(2, 2, 8, 8)),  # rect inside triangle -> False
            (tri, poly((100, 0), (140, 0), (100, 40))),  # disjoint -> False
            (l1, line((5, 5), (15, 15))),  # collinear partial overlap -> True
            (l1, line((0, 10), (10, 0))),  # proper cross, dim-0 meet -> False
            (l1, l1),  # equal -> False
            (l1, line((2, 2), (8, 8))),  # contained -> False
        ],
    )
    assert got == [True, False, False, True, False, False, False]


def test_crosses_line_polygon_and_line_line():
    a = rect(0, 0, 10, 10)
    got = run_pred(
        "crosses",
        [
            (line((-5, 5), (25, 5)), a),  # through -> True
            (a, line((-5, 5), (25, 5))),  # swapped -> True
            (line((2, 2), (8, 8)), a),  # inside -> False
            (line((0, -5), (0, 15)), a),  # along the edge -> False
            (line((0, 0), (10, 10)), line((0, 10), (10, 0))),  # X -> True
            (line((0, 0), (10, 10)), line((5, 5), (15, 15))),  # collinear -> False
            (pt(5, 5), a),  # single point never crosses -> False
            (a, rect(5, 5, 15, 15)),  # equal dims (areal) -> False
        ],
    )
    assert got == [True, True, False, False, True, False, False, False]


def test_crosses_multipoint():
    # MULTIPOINT with one point in the interior and one outside crosses
    mp = _parts_to_wkb([(1, [np.array([[5.0, 5.0]])]), (1, [np.array([[50.0, 50.0]])])])
    a = rect(0, 0, 10, 10)
    got = run_pred("crosses", [(mp, a)])
    assert got == [True]


def test_disjoint_all_tiers():
    a = rect(0, 0, 10, 10)
    tri = poly((0, 0), (40, 0), (0, 40))
    got = run_pred(
        "disjoint",
        [
            (pt(5, 5), a),  # inside -> False
            (pt(0, 5), a),  # on boundary -> False
            (pt(50, 50), a),  # far -> True
            (a, rect(20, 20, 30, 30)),  # rect/rect -> True
            (a, rect(10, 10, 20, 20)),  # corner touch -> False
            (tri, rect(30, 30, 40, 40)),  # beyond hypotenuse -> True
            (tri, rect(5, 5, 8, 8)),  # inside -> False
            (line((20, 0), (30, 0)), a),  # off to the side -> True
        ],
    )
    assert got == [False, False, True, True, False, True, False, True]


def test_sjoin_overlaps_and_crosses_match_brute():
    rng = np.random.default_rng(7)
    n_l, n_r = 60, 25
    lx = rng.integers(0, 80, n_l).astype(float)
    ly = rng.integers(0, 80, n_l).astype(float)
    lw = rng.integers(1, 25, n_l).astype(float)
    lh = rng.integers(1, 25, n_l).astype(float)
    rx = rng.integers(0, 80, n_r).astype(float)
    ry = rng.integers(0, 80, n_r).astype(float)
    rw = rng.integers(1, 25, n_r).astype(float)
    rh = rng.integers(1, 25, n_r).astype(float)
    left = pa.table(
        {"lid": pa.array(np.arange(n_l)), "geometry": boxes_to_wkb(lx, ly, lx + lw, ly + lh)}
    )
    right = pa.table(
        {"rid": pa.array(np.arange(n_r)), "geometry": boxes_to_wkb(rx, ry, rx + rw, ry + rh)}
    )

    def brute(pred):
        out = set()
        for i in range(n_l):
            for j in range(n_r):
                ox = min(lx[i] + lw[i], rx[j] + rw[j]) - max(lx[i], rx[j])
                oy = min(ly[i] + lh[i], ry[j] + rh[j]) - max(ly[i], ry[j])
                a_in_b = (
                    lx[i] >= rx[j]
                    and ly[i] >= ry[j]
                    and lx[i] + lw[i] <= rx[j] + rw[j]
                    and ly[i] + lh[i] <= ry[j] + rh[j]
                )
                b_in_a = (
                    rx[j] >= lx[i]
                    and ry[j] >= ly[i]
                    and rx[j] + rw[j] <= lx[i] + lw[i]
                    and ry[j] + rh[j] <= ly[i] + lh[i]
                )
                if pred == "overlaps" and ox > 0 and oy > 0 and not a_in_b and not b_in_a:
                    out.add((i, j))
        return out

    j = sjoin(ray.data.from_arrow(left), right, predicate="overlaps").to_pandas()
    assert set(zip(j.lid, j.rid)) == brute("overlaps")
    js = sjoin_shuffle(
        ray.data.from_arrow(left),
        ray.data.from_arrow(right),
        predicate="overlaps",
        res=4,
        domain=(0.0, 0.0, 128.0, 128.0),
    ).to_pandas()
    assert set(zip(js.lid, js.rid)) == brute("overlaps")


def test_sjoin_rejects_disjoint():
    t = pa.table({"geometry": points_to_wkb([0.0], [0.0])})
    with pytest.raises(ValueError):
        sjoin(ray.data.from_arrow(t), t, predicate="disjoint")
