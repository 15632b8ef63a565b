"""Hierarchical cell algebra (grid.py) + cell stages (stages/cells.py).

Brute-force oracles: k-ring vs Chebyshev enumeration, children/parent
roundtrip, compact/uncompact set identities, polyfill vs dense-grid
rasterization of the concave L fixture.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.grid import (
    DEFAULT_DOMAIN,
    cell_children,
    cell_decode,
    cell_from_coords,
    cell_id,
    cell_neighbors,
    cell_parent,
    compact_cells,
    compact_keyed,
    uncompact_cells,
)


def test_decode_roundtrip():
    rng = np.random.RandomState(7)
    x = rng.uniform(0, 1024, 200)
    y = rng.uniform(0, 1024, 200)
    for res in (3, 5, 8):
        c = cell_id(x, y, res)
        r, cx, cy = cell_decode(c)
        assert (r == res).all()
        assert (cell_from_coords(r, cx, cy) == c).all()
        lim = 1 << res
        assert cx.min() >= 0 and cx.max() < lim
        assert cy.min() >= 0 and cy.max() < lim


def test_children_parent_roundtrip():
    rng = np.random.RandomState(8)
    c = cell_id(rng.uniform(0, 1024, 50), rng.uniform(0, 1024, 50), 6)
    for levels in (1, 2):
        row, ch = cell_children(c, levels)
        assert len(ch) == 50 * 4**levels
        # every child's ancestor at the original res is its source cell
        assert (cell_parent(ch, levels) == c[row]).all()
        # children are distinct
        assert len(np.unique(ch)) == len(np.unique(c)) * 4**levels


def test_kring_vs_brute():
    rng = np.random.RandomState(9)
    res = 4  # 16x16 grid: borders matter
    c = np.unique(cell_id(rng.uniform(0, 1024, 40), rng.uniform(0, 1024, 40), res))
    for k in (1, 2):
        row, nb = cell_neighbors(c, k)
        got = {(int(r), int(v)) for r, v in zip(row, nb)}
        want = set()
        _, cx, cy = cell_decode(c)
        lim = 1 << res
        for i in range(len(c)):
            for dx in range(-k, k + 1):
                for dy in range(-k, k + 1):
                    nx, ny = cx[i] + dx, cy[i] + dy
                    if 0 <= nx < lim and 0 <= ny < lim:
                        want.add((i, int(cell_from_coords(res, [nx], [ny])[0])))
        assert got == want
    # exclude-center drops exactly one row per cell
    row_all, _ = cell_neighbors(c, 1, include_center=True)
    row_no, nb_no = cell_neighbors(c, 1, include_center=False)
    assert len(row_all) - len(row_no) == len(c)
    assert not np.isin(nb_no, c[row_no]).any() or (nb_no != c[row_no]).all()


def test_uncompact_full_square():
    # a res-3 cell uncompacts to exactly its 16 res-5 descendants
    c = cell_id([100.0], [100.0], 3)
    row, ids = uncompact_cells(c, 5)
    assert len(ids) == 16
    assert (cell_parent(ids, 2) == c[0]).all()
    assert len(np.unique(ids)) == 16


def test_compact_collapses_full_quartets():
    # all 4**2 descendants of one res-4 cell, plus a lone distant cell
    base = cell_id([512.0], [512.0], 4)
    _, ids = uncompact_cells(base, 6)
    lone = cell_id([1.0], [1.0], 6)
    out = compact_cells(np.concatenate([ids, lone]))
    assert set(out.tolist()) == {int(base[0]), int(lone[0])}
    # idempotent
    assert (compact_cells(out) == out).all()


def test_compact_partial_quartet_untouched():
    base = cell_id([512.0], [512.0], 4)
    _, ids = uncompact_cells(base, 5)  # 4 children
    out = compact_cells(ids[:3])  # missing one sibling
    assert (np.sort(out) == np.sort(ids[:3])).all()


def test_compact_uncompact_inverse_random():
    rng = np.random.RandomState(10)
    res = 6
    cells = np.unique(cell_id(rng.uniform(0, 1024, 300), rng.uniform(0, 1024, 300), res))
    comp = compact_cells(cells)
    assert len(comp) <= len(cells)
    # no full quartet remains
    r = (comp >> np.uint64(58)).astype(np.int64)
    for level in np.unique(r):
        sub = comp[r == level]
        par, cnt = np.unique(cell_parent(sub), return_counts=True)
        assert (cnt < 4).all()
    # expansion restores the exact original set
    _, back = uncompact_cells(comp, res)
    assert set(back.tolist()) == set(cells.tolist())


def test_compact_keyed_independent_keys():
    base = cell_id([512.0], [512.0], 4)
    _, quartet = uncompact_cells(base, 5)
    # key 0 holds the full quartet (collapses), key 1 only 3 (stays)
    keys = np.array([0, 0, 0, 0, 1, 1, 1])
    cells = np.concatenate([quartet, quartet[:3]])
    ko, co = compact_keyed(keys, cells)
    assert (ko == np.array([0, 1, 1, 1])).all()
    assert co[0] == base[0]
    assert set(co[1:].tolist()) == set(quartet[:3].tolist())


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------


def _l_fixture():
    """One concave L polygon + one point, via the fixture builder."""
    from geopandas_ray.pipelines.datasets import _l_rings_wkb

    wkb = _l_rings_wkb(
        np.array([64.0]), np.array([64.0]), np.array([192.0]), np.array([192.0])
    )
    return wkb


def test_cell_cover_exact_vs_raster(ray_session):
    from geopandas_ray.stages.cells import with_cell_cover

    wkb = _l_fixture()
    ds = ray.data.from_arrow(pa.table({"gid": pa.array([0]), "geometry": wkb}))
    res = 5  # 32px cells
    out = with_cell_cover(ds, res).to_pandas()
    got = set(out["cell"].tolist())
    # brute rasterization with the stage's contract: candidates are the
    # half-open bbox enumeration (floor(min)..floor(max)), kept when the
    # closed cell rect meets closed L = [64,192]^2 minus the open
    # top-right quadrant (x>128 and y>128 outside; cut edges stay)
    want = set()
    for cx in range(64 // 32, 192 // 32 + 1):
        for cy in range(64 // 32, 192 // 32 + 1):
            x0, y0 = cx * 32.0, cy * 32.0
            # cell meets L unless its B-overlap lies strictly inside the cut
            if max(x0, 64.0) > 128 and max(y0, 64.0) > 128:
                continue
            want.add(int(cell_id([x0 + 1e-9], [y0 + 1e-9], res)[0]))
    assert got == want
    # bbox (exact=False) covering is a strict superset for the concave L
    loose = with_cell_cover(ds, res, exact=False).to_pandas()
    assert set(loose["cell"].tolist()) > got


def test_cell_cover_point_rows(ray_session):
    from geopandas_ray.geom.wkb import points_to_wkb
    from geopandas_ray.stages.cells import with_cell_cover

    x = np.array([5.0, 100.0, 1000.0])
    y = np.array([5.0, 200.0, 999.0])
    ds = ray.data.from_arrow(
        pa.table({"gid": pa.array([0, 1, 2]), "geometry": points_to_wkb(x, y)})
    )
    out = with_cell_cover(ds, 8).to_pandas().sort_values("gid")
    assert (out["cell"].to_numpy() == cell_id(x, y, 8).astype(np.int64)).all()


def test_kring_children_stages(ray_session):
    from geopandas_ray.stages.cells import with_cell_children, with_cell_kring

    cells = cell_id([0.5, 512.0], [0.5, 512.0], 4).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"k": pa.array([0, 1]), "cell": pa.array(cells)}))
    kr = with_cell_kring(ds, k=1).to_pandas()
    # corner cell has 4 in-grid neighbors, interior cell 9
    counts = kr.groupby("k").size()
    assert counts[0] == 4 and counts[1] == 9
    ch = with_cell_children(ds, levels=1).to_pandas()
    assert len(ch) == 8
    assert (cell_parent(ch["child_cell"].to_numpy().astype(np.uint64)) == cells[ch["k"].to_numpy()].astype(np.uint64)).all()


def test_compact_cover_stage(ray_session):
    from geopandas_ray.stages.cells import compact_cover

    base = cell_id([512.0, 256.0], [512.0, 256.0], 4)
    _, q0 = uncompact_cells(base[:1], 6)  # 16 cells -> collapses to base0
    _, q1 = uncompact_cells(base[1:], 5)  # 4 cells -> collapses to base1
    tbl = pa.table(
        {
            "zone": pa.array([7] * 16 + [9] * 4),
            "cell": pa.array(np.concatenate([q0, q1]).astype(np.int64)),
        }
    )
    out = compact_cover(ray.data.from_arrow(tbl), "zone").to_pandas()
    out = out.sort_values(["zone", "cell"]).reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "zone"] == 7 and out.loc[0, "cell"] == int(base[0])
    assert out.loc[1, "zone"] == 9 and out.loc[1, "cell"] == int(base[1])


def test_pairs_intersect_rects_equiv_brute():
    """Vectorized geom-vs-rect kernel == per-pair geom_intersects_geom on
    random mixed fixtures (L-polygons, polygons with holes, lines, points,
    empties), including touch-only and containment cases."""
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.geom.wkb import from_wkb
    from geopandas_ray.pipelines.datasets import _l_rings_wkb
    import pyarrow as pa

    rng = np.random.RandomState(11)
    # L-shapes
    minx = rng.randint(0, 50, 12).astype(float)
    miny = rng.randint(0, 50, 12).astype(float)
    wkbs = list(_l_rings_wkb(minx, miny, minx + 20, miny + 16).to_pylist())
    # polygon with a hole (shell 0..40, hole 10..30) via WKT
    from geopandas_ray.geom.wkt import from_wkt as geoms_from_wkt

    extra = geoms_from_wkt(
        pa.array(
            [
                "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), (10 10, 10 30, 30 30, 30 10, 10 10))",
                "LINESTRING (5 5, 25 5, 25 25)",
                "POINT (7 7)",
                "MULTIPOINT (1 1, 35 35)",
                "POLYGON EMPTY",
            ]
        )
    )
    from geopandas_ray.geom.wkb import to_wkb

    wkbs += list(to_wkb(extra).to_pylist())
    g = from_wkb(pa.array(wkbs, type=pa.large_binary()))
    n = len(g)
    # random rects incl. tiny ones inside the hole and touch-aligned ones
    m = 200
    rx = rng.randint(-5, 60, m).astype(float)
    ry = rng.randint(-5, 60, m).astype(float)
    rw = rng.randint(1, 25, m).astype(float)
    rects = np.column_stack([rx, ry, rx + rw, ry + rw])
    gi = rng.randint(0, n, m).astype(np.int64)
    got = K.pairs_intersect_rects(g, gi, rects)
    from geopandas_ray.geom.wkb import box_geoms

    boxes = box_geoms(rects[:, 0], rects[:, 1], rects[:, 2], rects[:, 3])
    want = np.array(
        [K.geom_intersects_geom(g, int(gi[k]), boxes, k) for k in range(m)]
    )
    assert (got == want).all(), np.nonzero(got != want)[0][:10]


def test_pairs_intersect_rects_hole_case():
    """A rect strictly inside a polygon hole is NOT intersecting; one
    crossing the hole boundary is."""
    import pyarrow as pa
    from geopandas_ray.geom import kernels as K
    from geopandas_ray.geom.wkt import from_wkt as geoms_from_wkt

    g = geoms_from_wkt(
        pa.array(
            ["POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0), (10 10, 10 30, 30 30, 30 10, 10 10))"]
        )
    )
    rects = np.array(
        [
            [15.0, 15.0, 25.0, 25.0],  # inside the hole -> False
            [5.0, 15.0, 15.0, 25.0],  # crosses hole boundary -> True
            [2.0, 2.0, 8.0, 8.0],  # inside the solid ring -> True
            [41.0, 41.0, 50.0, 50.0],  # outside -> False
            [40.0, 10.0, 50.0, 20.0],  # touches shell edge -> True
            [10.0, 10.0, 30.0, 30.0],  # exactly the hole (touch ring) -> True
        ]
    )
    got = K.pairs_intersect_rects(g, np.zeros(len(rects), dtype=np.int64), rects)
    assert got.tolist() == [False, True, True, False, True, True]
