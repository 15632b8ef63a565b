"""Property-based CSR-kernel invariants (hypothesis).

The r4 reduceat bug class — a row's value silently depending on its batch
NEIGHBORS (trailing nulls, multi-part rows, position) — is exactly what a
self-consistency property catches: every per-row kernel must give the same
answer for a row computed alone and in any batch, under any shuffle."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W
from geopandas_ray.stages.clip import _parts_to_wkb

coord = st.integers(min_value=-100, max_value=100).map(float)


@st.composite
def geom_wkb(draw):
    kind = draw(st.sampled_from(["null", "point", "box", "line", "mline", "poly_hole", "mpoly"]))
    if kind == "null":
        return None
    x = draw(coord)
    y = draw(coord)
    if kind == "point":
        return W.points_to_wkb([x], [y])[0].as_py()
    w = draw(st.integers(min_value=1, max_value=20))
    h = draw(st.integers(min_value=1, max_value=20))
    if kind == "box":
        return W.boxes_to_wkb([x], [y], [x + w], [y + h])[0].as_py()
    if kind == "line":
        x2, y2 = draw(coord), draw(coord)
        return _parts_to_wkb([(2, [np.array([[x, y], [x2, y2]], dtype=np.float64)])])
    if kind == "mline":
        k = draw(st.integers(min_value=2, max_value=4))
        parts = []
        for i in range(k):
            x2, y2 = draw(coord), draw(coord)
            parts.append((2, [np.array([[x + i, y], [x2, y2]], dtype=np.float64)]))
        return _parts_to_wkb(parts)
    shell = np.array(
        [[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]], dtype=np.float64
    )
    if kind == "poly_hole":
        hw = max(1, w // 3)
        hh = max(1, h // 3)
        hole = np.array(
            [
                [x + 0.25 * w, y + 0.25 * h],
                [x + 0.25 * w + hw * 0.5, y + 0.25 * h],
                [x + 0.25 * w + hw * 0.5, y + 0.25 * h + hh * 0.5],
                [x + 0.25 * w, y + 0.25 * h + hh * 0.5],
                [x + 0.25 * w, y + 0.25 * h],
            ],
            dtype=np.float64,
        )
        return _parts_to_wkb([(3, [shell, hole])])
    k = draw(st.integers(min_value=2, max_value=3))
    return _parts_to_wkb([(3, [shell + 50.0 * i]) for i in range(k)])


def _rows(vals, fn):
    """Per-row singleton evaluation of a batch kernel."""
    out = []
    for v in vals:
        g = W.from_wkb(pa.array([v], type=pa.large_binary()))
        out.append(fn(g)[0])
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(geom_wkb(), min_size=1, max_size=12))
def test_batch_equals_singleton_area_length_bounds(vals):
    g = W.from_wkb(pa.array(vals, type=pa.large_binary()))
    for fn in (K.area, K.length):
        batch = np.asarray(fn(g), dtype=np.float64)
        single = np.asarray(_rows(vals, fn), dtype=np.float64)
        assert np.allclose(batch, single, equal_nan=True), (fn.__name__, vals)
    bb = K.bounds(g)
    sb = np.vstack(_rows(vals, K.bounds))
    assert np.allclose(bb, sb, equal_nan=True), ("bounds", vals)


@settings(max_examples=60, deadline=None)
@given(st.lists(geom_wkb(), min_size=1, max_size=12))
def test_wkb_roundtrip_identity(vals):
    g = W.from_wkb(pa.array(vals, type=pa.large_binary()))
    back = W.to_wkb(g)
    g2 = W.from_wkb(back)
    assert np.array_equal(np.asarray(g.row_types), np.asarray(g2.row_types))
    assert np.array_equal(g.coords, g2.coords)
    for attr in ("ring_offsets", "part_offsets", "row_offsets"):
        assert np.array_equal(np.asarray(getattr(g, attr)), np.asarray(getattr(g2, attr))), attr


@settings(max_examples=40, deadline=None)
@given(st.lists(geom_wkb(), min_size=2, max_size=10), st.randoms())
def test_permutation_invariance(vals, rnd):
    order = list(range(len(vals)))
    rnd.shuffle(order)
    g = W.from_wkb(pa.array(vals, type=pa.large_binary()))
    gp = W.from_wkb(pa.array([vals[i] for i in order], type=pa.large_binary()))
    a = np.asarray(K.area(g), dtype=np.float64)
    ap = np.asarray(K.area(gp), dtype=np.float64)
    assert np.allclose(a[order], ap, equal_nan=True)
    l = np.asarray(K.length(g), dtype=np.float64)
    lp = np.asarray(K.length(gp), dtype=np.float64)
    assert np.allclose(l[order], lp, equal_nan=True)


@settings(max_examples=60, deadline=None)
@given(st.lists(geom_wkb().filter(lambda v: v is not None), min_size=1, max_size=8),
       st.lists(geom_wkb().filter(lambda v: v is not None), min_size=1, max_size=8))
def test_predicate_duality(avals, bvals):
    """intersects/disjoint complement; within/contains and covers/covered_by
    transposes — for every cross pair of generated geometries."""
    from geopandas_ray.stages.core import eval_pairs

    ga = W.from_wkb(pa.array(avals, type=pa.large_binary()))
    gb = W.from_wkb(pa.array(bvals, type=pa.large_binary()))
    ii, jj = np.meshgrid(np.arange(len(avals)), np.arange(len(bvals)), indexing="ij")
    li, ri = ii.ravel(), jj.ravel()
    inter = eval_pairs("intersects", ga, li, gb, ri)
    disj = eval_pairs("disjoint", ga, li, gb, ri)
    assert not np.any(inter & disj) and np.all(inter | disj)
    within = eval_pairs("within", ga, li, gb, ri)
    contains_t = eval_pairs("contains", gb, ri, ga, li)
    assert np.array_equal(within, contains_t)
    cov = eval_pairs("covered_by", ga, li, gb, ri)
    covers_t = eval_pairs("covers", gb, ri, ga, li)
    assert np.array_equal(cov, covers_t)
    # geom_equals is symmetric
    eq = eval_pairs("geom_equals", ga, li, gb, ri)
    eq_t = eval_pairs("geom_equals", gb, ri, ga, li)
    assert np.array_equal(eq, eq_t)


def test_geometry_out_stages_permutation_parity():
    """Batched geometry-out stages (convex_hull one-lexsort, simplify
    global keep-mask, boundary fast path, ...) must not let a row's output
    depend on its batch position/neighbors: run each stage on the same rows
    in two different orders (nulls and multis interleaved, trailing null
    included) and compare per-id output bytes."""
    import ray.data

    from geopandas_ray.stages import ops as _ops
    from geopandas_ray.stages import ops2 as _ops2

    rng = np.random.RandomState(7)
    vals = []
    for i in range(40):
        kind = i % 5
        x, y = rng.randint(-50, 50), rng.randint(-50, 50)
        if kind == 0:
            vals.append(None)
        elif kind == 1:
            vals.append(W.points_to_wkb([float(x)], [float(y)])[0].as_py())
        elif kind == 2:
            vals.append(W.boxes_to_wkb([float(x)], [float(y)], [float(x + 5)], [float(y + 3)])[0].as_py())
        elif kind == 3:
            pts = rng.randint(-50, 50, size=(6, 2)).astype(np.float64)
            vals.append(_parts_to_wkb([(2, [pts[:3]]), (2, [pts[3:]])]))
        else:
            shell = np.array(
                [[x, y], [x + 8, y], [x + 8, y + 8], [x, y + 8], [x, y]], dtype=np.float64
            )
            vals.append(_parts_to_wkb([(3, [shell]), (3, [shell + 60.0])]))
    vals[-1] = None  # force a trailing null after a multi

    ids = np.arange(len(vals), dtype=np.int64)
    perm = rng.permutation(len(vals))

    def mk(order):
        return ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array(ids[order]),
                    "geometry": pa.array([vals[i] for i in order], type=pa.large_binary()),
                }
            )
        ).repartition(3)

    stages = [
        ("convex_hull", lambda d: _ops2.with_convex_hull(d, out="g")),
        ("boundary", lambda d: _ops2.with_boundary(d, out="g")),
        ("simplify", lambda d: _ops2.simplify(d, 1.0)),
        ("centroid", lambda d: _ops.with_centroid(d, out="g")),
        ("envelope", lambda d: _ops.with_envelope(d, out="g")),
        ("normalize", lambda d: _ops2.normalize(d)),
    ]
    a_ds = mk(np.arange(len(vals)))
    b_ds = mk(perm)
    for name, fn in stages:
        col = "g"
        ta = fn(a_ds).to_pandas()
        tb = fn(b_ds).to_pandas()
        if col not in ta.columns:
            col = "geometry"  # in-place stages
        da = ta.sort_values("id")[col].tolist()
        db = tb.sort_values("id")[col].tolist()
        assert da == db, f"stage {name} output depends on batch order"
