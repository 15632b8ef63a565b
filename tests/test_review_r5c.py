"""Round-5 continuation review findings (code-review pass over the
session diff) — regression pins."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from geopandas_ray.array import GeometryArray, points_from_xy
from geopandas_ray.geom import wkb as W


def test_geojsonseq_one_part_multi_preserved(tmp_path):
    # finding 1: declared Multi* stays Multi on read (OGR parity rule)
    from geopandas_ray.sources.geojsonseq import read_geojsonseq

    p = tmp_path / "m.geojsonl"
    p.write_text(
        '{"type": "MultiPolygon", "coordinates": [[[[0,0],[2,0],[2,2],[0,0]]]]}\n'
        '{"type": "MultiLineString", "coordinates": [[[0,0],[1,1]]]}\n'
        '{"type": "MultiPoint", "coordinates": [[5,6]]}\n'
    )
    df = read_geojsonseq(str(p)).to_pandas()
    g = W.from_wkb(pa.array(df["geometry"], type=pa.large_binary()))
    assert sorted(int(t) for t in g.row_types) == [
        W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON,
    ]


def test_astype_object_returns_wkb_bytes():
    # finding 2: object means the scalar (bytes), never rounded WKT
    s = pd.Series(points_from_xy([1.123456789], [2.0]))
    out = s.astype(object)
    assert isinstance(out.iloc[0], bytes)
    assert out.iloc[0] == s.iloc[0]
    # str still means WKT
    assert s.astype(str).iloc[0].startswith("POINT")


def test_from_sequence_coerces_numpy_strings():
    # finding 3: WKT in a numpy str array parses instead of storing junk
    a = GeometryArray._from_sequence(np.array(["POINT (1 2)", "POINT (3 4)"]))
    assert a.x.tolist() == [1.0, 3.0]
    arr2 = GeometryArray(np.array(["POINT (5 6)"]))  # non-object ndarray path
    assert arr2.y.tolist() == [6.0]
    with pytest.raises(TypeError, match="geometry"):
        GeometryArray._from_sequence([3.5])


def test_eq_scalar_and_length_mismatch():
    # finding 5: junk scalar -> all-False; wrong-length sequence -> raise
    a = points_from_xy([0.0, 1.0], [0.0, 1.0])
    assert (a == 5).tolist() == [False, False]
    assert (pd.Series(a) == 5).tolist() == [False, False]
    with pytest.raises(ValueError, match="Lengths"):
        a == [a[0]]


def test_read_csv_geo_half_xy_raises(tmp_path):
    # finding 4
    from geopandas_ray.sources.csvgeo import read_csv_geo

    p = tmp_path / "h.csv"
    p.write_text("id,lon,lat\n1,2.0,3.0\n")
    with pytest.raises(ValueError, match="together"):
        read_csv_geo(str(p), x="lon")


def test_read_file_bbox_on_geometryless_csv(tmp_path):
    # finding 7: driver-side error, not a worker KeyError
    from geopandas_ray.sources.geojson import read_file

    p = tmp_path / "plain.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="no recognizable geometry"):
        read_file(str(p), bbox=(0, 0, 1, 1))
