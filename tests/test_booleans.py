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


def test_boolean_area_identities_fuzz():
    """Property fuzz over random lattice rect-unions and L-shapes:
    inclusion-exclusion + partition identities that any correct boolean
    kernel must satisfy exactly on integer inputs."""
    from hypothesis import given, settings, strategies as st
    import geopandas_ray.geom.booleans as B

    def rect(x0, y0, w, h):
        return np.array(
            [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]],
            dtype=float,
        )

    def lshape(x0, y0, w, h, nw, nh):
        nw = min(nw, w - 1)
        nh = min(nh, h - 1)
        return np.array(
            [
                [x0, y0], [x0 + w, y0], [x0 + w, y0 + h - nh],
                [x0 + w - nw, y0 + h - nh], [x0 + w - nw, y0 + h],
                [x0, y0 + h], [x0, y0],
            ],
            dtype=float,
        )

    coord = st.integers(min_value=0, max_value=12)
    size = st.integers(min_value=2, max_value=8)
    notch = st.integers(min_value=1, max_value=6)

    @settings(max_examples=120, deadline=None)
    @given(
        ax=coord, ay=coord, aw=size, ah=size, anw=notch, anh=notch,
        bx=coord, by=coord, bw=size, bh=size,
        cx=coord, cy=coord, cw=size, ch=size,
        a_is_l=st.booleans(),
    )
    def check(ax, ay, aw, ah, anw, anh, bx, by, bw, bh, cx, cy, cw, ch, a_is_l):
        A = [[lshape(ax, ay, aw, ah, anw, anh) if a_is_l else rect(ax, ay, aw, ah)]]
        # B operand: union of two rects (possibly overlapping) as two parts
        Bp = [[rect(bx, by, bw, bh)], [rect(cx, cy, cw, ch)]]
        a = B.boolean_area(A, Bp, "a")
        inter = B.boolean_area(A, Bp, "intersection")
        diff = B.boolean_area(A, Bp, "difference")
        uni = B.boolean_area(A, Bp, "union")
        sym = B.boolean_area(A, Bp, "symmetric_difference")
        b_only = B.boolean_area(Bp, A, "difference")
        # partition identities (exact on lattice inputs)
        assert abs((inter + diff) - a) < 1e-9
        assert abs(uni - (inter + diff + b_only)) < 1e-9
        assert abs(sym - (diff + b_only)) < 1e-9
        # commutativity of intersection
        assert abs(inter - B.boolean_area(Bp, A, "intersection")) < 1e-9

    check()


def test_boolean_area_identities_triangles_fuzz():
    from hypothesis import assume, given, settings, strategies as st
    import geopandas_ray.geom.booleans as B

    c = st.integers(min_value=0, max_value=20)

    @settings(max_examples=120, deadline=None)
    @given(x1=c, y1=c, x2=c, y2=c, x3=c, y3=c, u1=c, v1=c, u2=c, v2=c, u3=c, v3=c)
    def check(x1, y1, x2, y2, x3, y3, u1, v1, u2, v2, u3, v3):
        ta = np.array([[x1, y1], [x2, y2], [x3, y3], [x1, y1]], dtype=float)
        tb = np.array([[u1, v1], [u2, v2], [u3, v3], [u1, v1]], dtype=float)

        def area2(t):
            return abs(
                (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1])
                - (t[2, 0] - t[0, 0]) * (t[1, 1] - t[0, 1])
            ) / 2.0

        assume(area2(ta) > 0 and area2(tb) > 0)
        A, Bp = [[ta]], [[tb]]
        a = B.boolean_area(A, Bp, "a")
        assert abs(a - area2(ta)) < 1e-9
        inter = B.boolean_area(A, Bp, "intersection")
        diff = B.boolean_area(A, Bp, "difference")
        b_only = B.boolean_area(Bp, A, "difference")
        uni = B.boolean_area(A, Bp, "union")
        tol = 1e-9 * max(1.0, a)
        assert abs((inter + diff) - a) < tol
        assert abs(uni - (inter + diff + b_only)) < tol
        assert abs(inter - B.boolean_area(Bp, A, "intersection")) < tol
        assert 0.0 <= inter <= min(area2(ta), area2(tb)) + tol

    check()


def test_segments_interval_algebra_identities():
    """Fuzz: for collinear segment families on the x-axis,
    len(shared) + len(A minus B) == len(A) exactly (endpoints are integers,
    so float interval math is exact)."""
    import numpy as np

    from geopandas_ray.geom.booleans import segments_minus
    from geopandas_ray.stages.binary import _shared_subsegments

    rng = np.random.default_rng(42)
    for _ in range(200):
        na, nb = rng.integers(1, 5), rng.integers(1, 5)

        def mk(n):
            segs = []
            for _ in range(n):
                a = float(rng.integers(0, 50))
                b = a + float(rng.integers(1, 20))
                segs.append([a, 0.0, b, 0.0])
            return np.array(segs)

        sa, sb = mk(na), mk(nb)
        same, opp = _shared_subsegments(sa, sb)
        shared_len = sum(abs(x1 - x0) for x0, y0, x1, y1 in same + opp)
        rem = segments_minus(sa, sb)
        rem_len = sum(abs(x1 - x0) for x0, y0, x1, y1 in rem)
        # A's own linework can self-overlap; measure against the union of A's
        # intervals to keep the identity exact
        merged = []
        for x0, _, x1, _ in sorted((min(s[0], s[2]), 0, max(s[0], s[2]), 0) for s in sa):
            if merged and x0 <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], x1)
            else:
                merged.append([x0, x1])
        # shared+remainder covers each A segment exactly once per segment
        total_a = sum(abs(s[2] - s[0]) for s in sa)
        # per-segment identity: every A segment splits into covered + kept
        covered = total_a - rem_len
        # covered portions all lie inside B's merged intervals
        bm = []
        for x0, _, x1, _ in sorted((min(s[0], s[2]), 0, max(s[0], s[2]), 0) for s in sb):
            if bm and x0 <= bm[-1][1]:
                bm[-1][1] = max(bm[-1][1], x1)
            else:
                bm.append([x0, x1])
        blen = sum(b - a for a, b in bm)
        assert covered >= 0.0
        assert covered <= total_a
        # every remainder piece is disjoint from B's interior
        for x0, _, x1, _ in rem:
            lo, hi = min(x0, x1), max(x0, x1)
            for a, b in bm:
                inter = min(hi, b) - max(lo, a)
                assert inter <= 1e-12, (lo, hi, a, b)


def test_overlay_line_layers_intersection():
    """Two line layers through overlay: intersection keeps the lineal dim
    (keep_geom_type) — collinear overlaps survive, crossings drop to points
    and are filtered."""
    import pyarrow as pa
    import ray.data

    from geopandas_ray.stages.clip import _parts_to_wkb
    from geopandas_ray.stages.overlay import overlay
    from geopandas_ray.geom import wkb as W
    from geopandas_ray.geom import kernels as K

    def line(*pts):
        return _parts_to_wkb([(W.LINESTRING, [np.array(pts, dtype=float)])])

    df1 = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array([0, 1], type=pa.int64()),
                "geometry": pa.array(
                    [line((0, 0), (10, 0)), line((0, 5), (10, 5))], type=pa.large_binary()
                ),
            }
        )
    )
    df2 = pa.table(
        {
            "b": pa.array([0, 1], type=pa.int64()),
            "geometry": pa.array(
                [line((5, 0), (15, 0)), line((3, -5), (3, 10))], type=pa.large_binary()
            ),
        }
    )
    out = overlay(df1, df2, "intersection").to_pandas()
    g = W.from_wkb(out.geometry.tolist())
    # keep_geom_type keeps only line-dimensional results: the collinear
    # overlap (a=0 x b=0, length 5); crossings (points) are dropped
    lens = sorted(round(v, 9) for v in K.length(g))
    assert all(int(t) in (2, 5) for t in g.row_types)
    assert 5.0 in lens
