"""CSV with geometry (OGR ``CSV`` driver semantics; reference
io/file.py:50 read_file format table).

Like GeoJSONSeq, CSV is line-delimited, so ``ray.data.read_csv`` shards a
single large file across tasks natively — no driver parse. Geometry
travels as a WKT column (OGR's convention: a field named ``WKT``) or as
X/Y point columns (OGR's ``X_POSSIBLE_NAMES``/``Y_POSSIBLE_NAMES`` open
options).

Type pinning: pyarrow's CSV inference runs per read chunk; on
multi-file/huge inputs pass ``convert_options=pyarrow.csv.ConvertOptions(
column_types={...})`` through ``**arrow_csv_args`` to pin cross-task
schemas (same contract as the GeoJSONSeq reader's ``column_types``).

Writer float fidelity: geometry is encoded with
``to_wkt(rounding_precision=-1)`` (shortest-roundtrip repr) and attribute
doubles go through Arrow's CSV writer (also shortest-roundtrip), so a
write → read roundtrip is bit-exact.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from ..geom.wkb import from_wkb, points_to_wkb, to_wkb
from ..geom.wkt import from_wkt, to_wkt

_WKT_NAMES = ("WKT", "wkt", "geometry")
_X_NAMES = ("x", "X", "lon", "longitude", "Longitude", "LON")
_Y_NAMES = ("y", "Y", "lat", "latitude", "Latitude", "LAT")


def read_csv_geo(
    path: str | list[str],
    geometry: str = "geometry",
    wkt: str | None = None,
    x: str | None = None,
    y: str | None = None,
    keep_geom_columns: bool = False,
    **arrow_csv_args,
) -> ray.data.Dataset:
    """Read CSV into a WKB-geometry dataset. Resolution order: ``wkt=``
    names the WKT column explicitly; else ``x=``/``y=`` name point
    columns; else auto-detect (first of WKT/wkt/geometry, then an x/y
    name pair — OGR's possible-names behavior). A CSV with no
    recognizable geometry loads as a plain attribute dataset.
    ``keep_geom_columns`` keeps the source WKT / x/y columns alongside
    the decoded geometry (OGR ``KEEP_GEOM_COLUMNS``)."""
    if "convert_options" not in arrow_csv_args:
        from pyarrow import csv as pacsv

        # empty cells are nulls even in string columns (OGR semantics;
        # arrow's default keeps them as "") — callers passing their own
        # convert_options own this choice
        arrow_csv_args["convert_options"] = pacsv.ConvertOptions(
            strings_can_be_null=True
        )
    if (x is None) != (y is None):
        raise ValueError(
            "read_csv_geo: x= and y= must be given together "
            f"(got x={x!r}, y={y!r})"
        )
    ds = ray.data.read_csv(path, **arrow_csv_args)
    names = ds.schema().names
    if wkt is None and x is None and y is None:
        wkt = next((c for c in _WKT_NAMES if c in names), None)
        if wkt is None:
            x = next((c for c in _X_NAMES if c in names), None)
            y = next((c for c in _Y_NAMES if c in names), None)
    if wkt is not None:
        if wkt not in names:
            raise ValueError(f"read_csv_geo: WKT column {wkt!r} not in {names}")
        src = wkt

        def decode(b: pa.Table) -> pa.Table:
            vals = b.column(src).to_pylist()
            g = from_wkt([v if v else None for v in vals])
            if src == geometry:
                # replace in place — never two columns of the same name
                return b.set_column(b.column_names.index(src), geometry, to_wkb(g))
            if not keep_geom_columns:
                b = b.drop_columns([src])
            return b.append_column(geometry, to_wkb(g))

        return ds.map_batches(decode, batch_format="pyarrow")
    if x is not None and y is not None:
        if x not in names or y not in names:
            raise ValueError(f"read_csv_geo: x/y columns {x!r}/{y!r} not in {names}")
        xc, yc = x, y

        def decode_xy(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            xs = pc.cast(b.column(xc), pa.float64()).to_numpy(zero_copy_only=False)
            ys = pc.cast(b.column(yc), pa.float64()).to_numpy(zero_copy_only=False)
            if not keep_geom_columns:
                b = b.drop_columns([xc, yc])
            return b.append_column(geometry, points_to_wkb(xs, ys))

        return ds.map_batches(decode_xy, batch_format="pyarrow")
    return ds  # no geometry — plain table, like OGR on a geometry-less CSV


def _wkt_column(geometry: str, wkt_name: str):
    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        txt = to_wkt(g, rounding_precision=-1)
        b = b.drop_columns([geometry])
        # OGR writes the geometry field first
        cols = {wkt_name: pa.array(txt, type=pa.string())}
        for c in b.column_names:
            cols[c] = b.column(c)
        return pa.table(cols)

    return f


def write_csv_geo(
    ds: ray.data.Dataset,
    path: str,
    geometry: str = "geometry",
    wkt_name: str = "WKT",
) -> list[str]:
    """Write CSV with the geometry as a leading WKT column. Path shapes
    (same contract as the GeoJSONSeq writer): a ``.csv`` file path
    streams ONE file on the driver (serialization stays parallel in
    tasks; the driver only concatenates byte buffers, O(batch) memory);
    any other path is a directory — Ray's native parallel ``write_csv``
    part layout, the scale path."""
    txt = ds.map_batches(_wkt_column(geometry, wkt_name), batch_format="pyarrow")
    if path.lower().endswith(".csv") and not path.endswith(os.sep):
        from pyarrow import csv as pacsv

        txt.context.execution_options.preserve_order = True
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            first = True
            for b in txt.iter_batches(batch_format="pyarrow", batch_size=8192):
                sink = pa.BufferOutputStream()
                pacsv.write_csv(
                    b,
                    sink,
                    write_options=pacsv.WriteOptions(include_header=first),
                )
                f.write(sink.getvalue())
                first = False
        return [path]
    txt.write_csv(path)
    return sorted(
        os.path.join(path, n) for n in os.listdir(path) if n.endswith(".csv")
    )
