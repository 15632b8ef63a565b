"""Geocoding stages (functions/geocoding.py): forward + reverse through
provider factories, null handling, broadcast table provider."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from geopandas_ray.functions.geocoding import geocode, reverse_geocode, table_provider
from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W


def _make_provider():
    # defined INSIDE a function so cloudpickle ships it by value — a
    # module-level def in a pytest file pickles by reference to a module
    # Ray workers cannot import (the actor restarts forever)
    def _provider():
        class P:
            def geocode(self, s):
                if s == "nowhere":
                    return None
                i = int(s)
                return (f"addr {i}", (float(i), float(2 * i)))

        return P()

    return _provider


def test_geocode_forward_and_nulls():
    t = pa.table({"address_query": pa.array(["3", "nowhere", None, "7"])})
    out = geocode(ray.data.from_arrow(t), _make_provider()).to_pandas()
    assert out["address"].tolist() == ["addr 3", None, None, "addr 7"]
    g = W.from_wkb(pa.array(out["geometry"], type=pa.large_binary()))
    b = K.bounds(g)
    # geometry = Point(lon, lat); provider returns (lat, lon) = (i, 2i)
    assert tuple(b[0][:2]) == (6.0, 3.0)
    assert np.isnan(b[1][0]) and np.isnan(b[2][0])
    assert tuple(b[3][:2]) == (14.0, 7.0)


def test_geocode_overwrites_existing_geometry():
    t = pa.table({
        "address_query": pa.array(["5"]),
        "geometry": W.points_to_wkb(np.array([99.0]), np.array([99.0])),
    })
    out = geocode(ray.data.from_arrow(t), _make_provider()).to_pandas()
    g = W.from_wkb(pa.array(out["geometry"], type=pa.large_binary()))
    assert tuple(K.bounds(g)[0][:2]) == (10.0, 5.0)
    assert list(out.columns).count("geometry") == 1


def test_reverse_geocode_table_provider():
    fac = table_provider({
        "a": ("Alpha", (0.0, 0.0)),
        "b": ("Beta", (100.0, 100.0)),
    })
    # points at (lon, lat): (1,1) -> Alpha, (99,98) -> Beta, null -> null
    geoms = pa.array(
        list(W.points_to_wkb(np.array([1.0, 99.0]), np.array([1.0, 98.0])).to_pylist())
        + [None],
        type=pa.large_binary(),
    )
    t = pa.table({"fid": pa.array([0, 1, 2]), "geometry": geoms})
    out = reverse_geocode(ray.data.from_arrow(t), fac).to_pandas().sort_values("fid")
    assert out["address"].tolist() == ["Alpha", "Beta", None]


def test_forward_then_reverse_consistent():
    fac = table_provider({
        "home": ("Home", (10.0, 20.0)),
        "work": ("Work", (-5.0, 60.0)),
    })
    t = pa.table({"address_query": pa.array(["home", "work"])})
    fwd = geocode(ray.data.from_arrow(t), fac)
    back = reverse_geocode(fwd, geometry="geometry", provider_factory=fac).to_pandas()
    assert sorted(back["address"].tolist()) == ["Home", "Work"]
