"""Reference parity for the remaining top-level namespace: ``options``
(_config.py), ``datasets`` (deprecated stub), and the ``tools`` functional
module (tools/__init__.py exports)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

import geopandas_ray as gr
from geopandas_ray import GeoDataset
from geopandas_ray.geom import kernels as K
from geopandas_ray.geom import wkb as W


def test_options_surface():
    opts = gr.options
    assert opts.display_precision is None
    assert opts.io_engine is None
    assert opts.use_pygeos is False
    assert sorted(dir(opts)) == ["display_precision", "io_engine", "use_pygeos"]
    r = repr(opts)
    assert "display_precision" in r and "[default: None]" in r

    opts.display_precision = 2
    assert opts.display_precision == 2
    with pytest.raises(ValueError, match="positive integer or None"):
        opts.display_precision = -1
    with pytest.raises(ValueError, match="positive integer or None"):
        opts.display_precision = 2.5
    opts.display_precision = None

    with pytest.raises(ValueError, match="pyogrio"):
        opts.io_engine = "gdal"
    opts.io_engine = "pyogrio"  # accepted, ignored by the native readers
    opts.io_engine = None

    with pytest.warns(FutureWarning, match="use_pygeos is deprecated"):
        opts.use_pygeos = True
    with pytest.warns(FutureWarning):
        opts.use_pygeos = False

    with pytest.raises(AttributeError, match="existing options"):
        opts.no_such_option = 1
    with pytest.raises(AttributeError):
        opts.no_such_option


def test_to_wkt_uses_display_precision():
    ds = GeoDataset(
        ray.data.from_arrow(
            pa.table({"geometry": W.points_to_wkb([1.23456789], [2.0])})
        )
    )
    gr.options.display_precision = 2
    try:
        w = ds.to_wkt(rounding_precision=None).select_columns(["wkt"]).take_all()
        assert w[0]["wkt"] == "POINT (1.23 2)"
    finally:
        gr.options.display_precision = None
    # None option -> default 6 decimals
    w = ds.to_wkt(rounding_precision=None).select_columns(["wkt"]).take_all()
    assert w[0]["wkt"] == "POINT (1.234568 2)"


def test_datasets_stub():
    with pytest.raises(AttributeError, match="naturalearthdata"):
        gr.datasets.get_path("naturalearth_lowres")
    with pytest.raises(AttributeError, match="geodatasets"):
        gr.datasets.get_path("nybb")
    with pytest.raises(AttributeError, match="deprecated"):
        gr.datasets.get_path("anything_else")
    assert gr.datasets.available == []


def test_tools_module_exports():
    from geopandas_ray import tools

    assert sorted(tools.__all__) == [
        "clip", "collect", "geocode", "overlay",
        "reverse_geocode", "sjoin", "sjoin_nearest",
    ]
    # collect: WKB-in/WKB-out Multi assembly (tools/util.py:10)
    pts = W.points_to_wkb([0.0, 1.0], [0.0, 1.0]).to_pylist()
    out = W.from_wkb(pa.array([tools.collect(pts)], type=pa.large_binary()))
    b = K.bounds(out)
    assert tuple(b[0]) == (0.0, 0.0, 1.0, 1.0)


def test_tools_geocode_accepts_string_list():
    def _factory():
        class P:
            def geocode(self, s):
                i = int(s)
                return (f"addr {i}", (float(i), float(2 * i)))

        return P()

    out = gr.tools.geocode(["3", "7"], _factory)
    assert isinstance(out, GeoDataset)
    df = out.to_pandas().sort_values("address_query")
    assert df["address"].tolist() == ["addr 3", "addr 7"]
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert tuple(K.bounds(g)[0][:2]) == (6.0, 3.0)  # Point(lon=2i, lat=i)


def test_tools_reverse_geocode_geodataset():
    from geopandas_ray.functions.geocoding import table_provider

    fac = table_provider({"a": ("Alpha", (0.0, 0.0))})
    ds = GeoDataset(
        ray.data.from_arrow(
            pa.table({"geometry": W.points_to_wkb([1.0], [1.0])})
        )
    )
    out = gr.tools.reverse_geocode(ds, fac)
    assert isinstance(out, GeoDataset)
    assert out.to_pandas()["address"].tolist() == ["Alpha"]
