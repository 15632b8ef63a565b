import numpy as np

from geopandas_ray import grid as G


def test_cell_roundtrip(rng):
    x = rng.uniform(0, 1024, 1000)
    y = rng.uniform(0, 1024, 1000)
    for res in (4, 8, 12):
        cells = G.cell_id(x, y, res)
        b = G.cell_bounds(cells)
        assert ((x >= b[:, 0]) & (x < b[:, 2]) & (y >= b[:, 1]) & (y < b[:, 3])).all()


def test_cell_hierarchy(rng):
    x = rng.uniform(0, 1024, 200)
    y = rng.uniform(0, 1024, 200)
    child = G.cell_id(x, y, 10)
    parent = G.cell_parent(child, 2)
    direct = G.cell_id(x, y, 8)
    assert np.array_equal(parent, direct)


def test_cells_for_bbox_covers(rng):
    minx = rng.uniform(0, 900, 50)
    miny = rng.uniform(0, 900, 50)
    maxx = minx + rng.uniform(0, 100, 50)
    maxy = miny + rng.uniform(0, 100, 50)
    ri, cells = G.cells_for_bbox(minx, miny, maxx, maxy, 7)
    b = G.cell_bounds(cells)
    # every emitted cell overlaps its bbox
    assert (
        (b[:, 0] <= maxx[ri]) & (b[:, 2] >= minx[ri]) & (b[:, 1] <= maxy[ri]) & (b[:, 3] >= miny[ri])
    ).all()
    # and the corners' cells are all present
    for i in range(50):
        for cx, cy in ((minx[i], miny[i]), (maxx[i], maxy[i])):
            c = G.cell_id([cx], [cy], 7)[0]
            assert c in set(cells[ri == i])


def test_hilbert_locality_and_bijection():
    n = 1 << 4
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = G.hilbert_d(xs.ravel(), ys.ravel(), 4)
    assert sorted(d.tolist()) == list(range(n * n))  # bijective
    # consecutive curve positions are adjacent cells
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    step = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (step == 1).all()


def test_tiles_half_open():
    tx, ty = G.point_tiles([0.0, 31.999, 32.0, 1023.0], [0.0, 0.0, 0.0, 0.0], 5)
    assert tx.tolist() == [0, 0, 1, 31]
    tid = G.tile_id(5, tx, ty)
    assert tid[0] == (5 << 40)
