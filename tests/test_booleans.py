"""Property tests for the general polygon boolean kernel (slab sweep).

Oracle strategy: for random concave integer-lattice polygons, (a) the area
from the trapezoid sweep must equal the shoelace area of the stitched
rings, and (b) membership of random probe points in the stitched result
must equal op(point in A, point in B) evaluated on the INPUTS - an exact,
implementation-independent check.
"""

import numpy as np
import pytest

from geopandas_ray.geom.booleans import (
    _ring_area,
    boolean_area,
    make_valid_rings,
    rings_boolean,
)


def ring(*xy):
    return np.array(list(xy) + [xy[0]], dtype=float)


def rand_lattice_poly(rng, cx, cy, r=6, n=8):
    """Random star-shaped (usually concave) lattice polygon around (cx,cy)."""
    angles = np.sort(rng.uniform(0, 2 * np.pi, size=n))
    radii = rng.integers(2, r + 1, size=n)
    pts = np.column_stack(
        [
            np.round(cx + radii * np.cos(angles)),
            np.round(cy + radii * np.sin(angles)),
        ]
    )
    # dedupe consecutive duplicates after rounding
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.diff(pts, axis=0) != 0).any(axis=1)
    pts = pts[keep]
    if len(pts) < 3 or abs(_ring_area(np.vstack([pts, pts[:1]]))) < 1:
        return None
    if _ring_area(np.vstack([pts, pts[:1]])) < 0:
        pts = pts[::-1]
    return np.vstack([pts, pts[:1]]).astype(float)


def member(polys, px, py):
    """Even-odd membership over the assembled [[shell, holes...]] output."""
    from geopandas_ray.geom.booleans import _point_in_ring

    cnt = 0
    for p in polys:
        for r in p:
            if _point_in_ring(r, px, py):
                cnt += 1
    return cnt % 2 == 1


OPS = ["intersection", "union", "difference", "symmetric_difference"]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_concave_booleans(seed):
    rng = np.random.default_rng(seed)
    for trial in range(8):
        ra = rand_lattice_poly(rng, 10, 10)
        rb = rand_lattice_poly(rng, 12 - (trial % 5), 9 + (trial % 4))
        if ra is None or rb is None:
            continue
        A, B = [[ra]], [[rb]]
        for op in OPS:
            out = rings_boolean(A, B, op)
            area_sweep = boolean_area(A, B, op)
            area_rings = sum(_ring_area(r) for p in out for r in p)
            assert area_sweep >= -1e-9
            assert abs(area_sweep - area_rings) < 1e-6, (op, seed, trial)
            # probe membership at non-lattice points (never on boundaries)
            for _ in range(40):
                px = rng.uniform(0, 20) + 0.25 + 1e-3
                py = rng.uniform(0, 20) + 0.25 + 1e-3
                in_a = member(A, px, py)
                in_b = member(B, px, py)
                want = {
                    "intersection": in_a and in_b,
                    "union": in_a or in_b,
                    "difference": in_a and not in_b,
                    "symmetric_difference": in_a != in_b,
                }[op]
                got = member(out, px, py)
                assert got == want, (op, seed, trial, px, py)


def test_holes_survive():
    outer = ring((0, 0), (20, 0), (20, 20), (0, 20))
    hole = ring((5, 5), (5, 15), (15, 15), (15, 5))  # CW
    A = [[outer, hole]]
    B = [[ring((-5, -5), (25, -5), (25, 25), (-5, 25))]]
    out = rings_boolean(A, B, "intersection")
    assert len(out) == 1 and len(out[0]) == 2
    assert abs(sum(_ring_area(r) for r in out[0]) - 300.0) < 1e-9
    # difference against the hole's region fills nothing back in
    out2 = rings_boolean(A, [[ring((5, 5), (15, 5), (15, 15), (5, 15))]], "union")
    assert abs(sum(_ring_area(r) for p in out2 for r in p) - 400.0) < 1e-9


def test_shared_edge_and_degenerate():
    a = [[ring((0, 0), (4, 0), (4, 4), (0, 4))]]
    b = [[ring((4, 0), (8, 0), (8, 4), (4, 4))]]  # shares the x=4 edge
    assert boolean_area(a, b, "intersection") == 0.0
    u = rings_boolean(a, b, "union")
    assert abs(sum(_ring_area(r) for p in u for r in p) - 32.0) < 1e-9
    # union of edge-sharing rects should merge into ONE polygon
    assert len(u) == 1
    d = rings_boolean(a, b, "difference")
    assert abs(sum(_ring_area(r) for p in d for r in p) - 16.0) < 1e-9


def test_make_valid_bowtie():
    bow = [[ring((0, 0), (4, 4), (4, 0), (0, 4))]]
    mv = make_valid_rings(bow)
    assert len(mv) == 2
    assert sorted(round(sum(_ring_area(r) for r in p), 9) for p in mv) == [4.0, 4.0]


def test_multi_part_and_multiple_partners():
    # overlapping B parts must union (per-part parity), not cancel
    A = [[ring((0, 0), (10, 0), (10, 10), (0, 10))]]
    B = [
        [ring((2, 2), (8, 2), (8, 8), (2, 8))],
        [ring((5, 5), (12, 5), (12, 12), (5, 12))],
    ]
    # B union area = 36 + 49 - 9 = 76; inside A: 36 + (area of second within A:
    # x,y in [5,10] -> 25) - overlap 9 = 52
    assert abs(boolean_area(A, B, "intersection") - 52.0) < 1e-9
    assert abs(boolean_area(A, B, "difference") - 48.0) < 1e-9


def test_trapezoid_vec_matches_loop():
    """The all-slabs vectorized sweep must agree with the per-slab loop on
    area and ring structure across ops and operand sizes (both gate sides)."""
    import geopandas_ray.geom.booleans as B

    def ngon(n, cx, cy, r):
        a = np.linspace(0, 2 * np.pi, n + 1)
        return [[np.column_stack([cx + r * np.cos(a), cy + r * np.sin(a)])]]

    orig = B._trapezoids_vec
    try:
        for n1, n2 in ((6, 8), (24, 24), (40, 16)):
            A = ngon(n1, 0, 0, 10)
            Bp = ngon(n2, 6, 4, 9)
            for op in ("intersection", "union", "difference", "symmetric_difference"):
                av = B.boolean_area(A, Bp, op)
                rv = sorted(
                    round(abs(B._ring_area(r)), 9)
                    for rings in B.rings_boolean(A, Bp, op)
                    for r in rings
                )
                B._trapezoids_vec = lambda *a, **k: None
                al = B.boolean_area(A, Bp, op)
                rl = sorted(
                    round(abs(B._ring_area(r)), 9)
                    for rings in B.rings_boolean(A, Bp, op)
                    for r in rings
                )
                B._trapezoids_vec = orig
                assert abs(av - al) <= 1e-9 * max(1.0, abs(al)), (n1, n2, op)
                assert rv == rl, (n1, n2, op)
    finally:
        B._trapezoids_vec = orig
