"""Newline-delimited GeoJSON (OGR driver ``GeoJSONSeq``; reference
io/file.py:50 read_file / :159 to_file format table).

This is the one interchange format whose wire layout matches Ray Data's
native sharding: one Feature per line means ``ray.data.read_text`` splits
a SINGLE large file into parallel tasks (every other format here shards
per-file or needs an index walk), and the output of independent writers
can be concatenated byte-for-byte. That makes ``.geojsonl`` the scale
path for text interchange — a 100 TB export is a directory of part files
each written inside its own task, no driver assembly.

Schema contract: Ray's line sharding puts arbitrary lines in arbitrary
tasks, so attribute schemas must be pinned BEFORE parallel parse. The
reader head-probes the first ``probe_lines`` records on the driver (key
order + int64 -> float64 -> string inference, same ladder as the GML/KML
readers), ``column_types=`` overrides win, and any LATER key the probe
never saw raises an actionable error instead of silently dropping data.
Values that defy the probed type (int probe, float later) also raise —
declare ``column_types={col: pa.float64()}`` to widen.

RFC 8142 record-separator (0x1e) prefixes are tolerated; multi-line
pretty-printed RS records are out of scope (the parse error says so).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data

from .geojson import geo_dict_to_wkb, geometry_to_geo_dict

EXTS = (".geojsonl", ".geojsons", ".ndjson")

_GEOM_TYPES = {
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
}


def _clean(line: str) -> str:
    return line.lstrip("\x1e").strip()


def _build_array(vals: list) -> pa.Array:
    """pyarrow inference over already-typed JSON values. The GML/KML
    readers' int->float->string ladder would TRUNCATE here (int(2.5)
    succeeds on a python float; it only raises on the string "2.5"), so
    JSON columns must infer via pa.array and only stringify on mixed."""
    try:
        return pa.array(vals)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return pa.array(
            [None if v is None else str(v) for v in vals], type=pa.string()
        )


def _stable_type(t: pa.DataType) -> pa.DataType:
    """Normalize inferred types so every task lands on one block schema."""
    if pa.types.is_null(t):
        return pa.string()
    if pa.types.is_integer(t):
        return pa.int64()
    if pa.types.is_floating(t):
        return pa.float64()
    if pa.types.is_large_string(t):
        return pa.string()
    return t


def _parse_record(s: str) -> tuple[dict | None, dict]:
    """One line -> (geometry dict | None, properties dict)."""
    try:
        obj = json.loads(s)
    except json.JSONDecodeError as e:
        raise ValueError(
            "geojsonseq: line is not a complete JSON object — the reader "
            "handles one record per line (RS prefixes ok); multi-line "
            f"pretty-printed records are not supported: {e}"
        ) from None
    t = obj.get("type")
    if t == "Feature":
        return obj.get("geometry"), (obj.get("properties") or {})
    if t in _GEOM_TYPES:  # bare geometry per line is legal GeoJSONSeq
        return obj, {}
    raise ValueError(f"geojsonseq: unsupported record type {t!r}")


def _expand_paths(path: str | list[str]) -> list[str]:
    if isinstance(path, (list, tuple)):
        return list(path)
    if os.path.isdir(path):
        out = sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.lower().endswith(EXTS)
        )
        if not out:
            raise FileNotFoundError(f"no {'/'.join(EXTS)} files under {path!r}")
        return out
    return [path]


def probe_schema(
    path: str | list[str],
    probe_lines: int | None = 4096,
    column_types: dict | None = None,
) -> tuple[list[str], dict]:
    """Driver-side head probe: reads at most ``probe_lines`` records
    (``None`` = every record — driver-sized, use only on small files)
    and returns (ordered attribute names, {name: pyarrow type})."""
    names: list[str] = []
    samples: dict[str, list] = {}
    n = 0
    for p in _expand_paths(path):
        with open(p, encoding="utf-8") as f:
            for raw in f:
                s = _clean(raw)
                if not s:
                    continue
                _, props = _parse_record(s)
                for k, v in props.items():
                    if k not in samples:
                        names.append(k)
                        samples[k] = []
                    samples[k].append(v)
                n += 1
                if probe_lines is not None and n >= probe_lines:
                    break
        if probe_lines is not None and n >= probe_lines:
            break
    types: dict = {}
    for k in names:
        if column_types and k in column_types:
            types[k] = column_types[k]
        else:
            types[k] = _stable_type(_build_array(samples[k]).type)
    # caller-declared columns the probe never reached still join the schema
    if column_types:
        for k, t in column_types.items():
            if k not in types:
                names.append(k)
                types[k] = t
    return names, types


def read_geojsonseq(
    path: str | list[str],
    geometry: str = "geometry",
    column_types: dict | None = None,
    probe_lines: int | None = 4096,
) -> ray.data.Dataset:
    """Line-sharded parallel read of one or more ``.geojsonl`` files (a
    directory reads every part file — the parallel writer's layout).
    Unlike the per-file XML readers, a single huge file still fans out:
    ``read_text`` splits it by byte ranges."""
    paths = _expand_paths(path)
    names, types = probe_schema(paths, probe_lines, column_types)
    if geometry in names:
        raise ValueError(
            f"geojsonseq: attribute {geometry!r} collides with the geometry "
            "column name; pass geometry= a different name"
        )
    known = set(names)

    def parse(b: pa.Table) -> pa.Table:
        wkbs: list[bytes | None] = []
        cols: dict[str, list] = {k: [] for k in names}
        for ln in b.column("text").to_pylist():
            s = _clean(ln)
            if not s:
                continue
            geom, props = _parse_record(s)
            extra = [k for k in props if k not in known]
            if extra:
                raise ValueError(
                    f"geojsonseq: key(s) {extra!r} appear after the "
                    f"{probe_lines}-record schema probe; re-read with "
                    "column_types={name: pa_type} for them or a larger "
                    "probe_lines"
                )
            wkbs.append(geo_dict_to_wkb(geom))
            for k in names:
                cols[k].append(props.get(k))
        out: dict = {}
        for k in names:
            t = types[k]
            # infer first, then SAFE cast — pa.array(vals, type=int64)
            # silently truncates python floats (2.5 -> 2); the cast raises
            # on lossy values instead (same hardening as the GPKG/SQL readers)
            inferred = _build_array(cols[k])
            try:
                out[k] = inferred if inferred.type.equals(t) else inferred.cast(t)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise ValueError(
                    f"geojsonseq: column {k!r} has values outside its probed "
                    f"type {t} ({e}); declare column_types={{{k!r}: <type>}}"
                ) from None
        out[geometry] = pa.array(wkbs, type=pa.large_binary())
        return pa.table(out)

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def _line_column(geometry: str):
    """map_batches fn: serialize each row to one Feature line (attribute
    floats and coordinates go through json's shortest-roundtrip float
    repr, so numeric columns survive bit-exact)."""
    from ..geom.wkb import from_wkb

    def f(b: pa.Table) -> pa.Table:
        g = from_wkb(b.column(geometry))
        attrs = [c for c in b.column_names if c != geometry]
        cols = {c: b.column(c).to_pylist() for c in attrs}
        lines = []
        for i in range(b.num_rows):
            lines.append(
                json.dumps(
                    {
                        "type": "Feature",
                        "properties": {c: cols[c][i] for c in attrs},
                        "geometry": geometry_to_geo_dict(g, i),
                    },
                    default=str,
                )
            )
        return pa.table({"__line": pa.array(lines, type=pa.string())})

    return f


def write_geojsonseq(
    ds: ray.data.Dataset, path: str, geometry: str = "geometry"
) -> list[str]:
    """Write ``.geojsonl``. Two layouts by path shape:

    - ``path`` names a file (has one of the geojsonl extensions): every
      task serializes its block, the driver streams the line batches to
      ONE file in input order (O(batch) driver memory — serialization
      stays parallel; only the byte concatenation is serial).
    - ``path`` names a directory (no geojsonl extension, or endswith the
      path separator): each block writes its OWN part file inside its
      task — the fully parallel, resumable 100 TB layout; parts
      concatenate into a valid single file because the format is
      line-delimited.
    """
    lines = ds.map_batches(_line_column(geometry), batch_format="pyarrow")
    single = path.lower().endswith(EXTS) and not path.endswith(os.sep)
    if single:
        # positional determinism for the single-file roundtrip (Ray orders
        # bundles by task completion otherwise — CLAUDE.md r4 note)
        lines.context.execution_options.preserve_order = True
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            for b in lines.iter_batches(batch_format="pyarrow", batch_size=8192):
                f.write("\n".join(b.column("__line").to_pylist()))
                f.write("\n")
        return [path]

    os.makedirs(path, exist_ok=True)

    def sink(b: pa.Table) -> pa.Table:
        import uuid

        p = os.path.join(path, f"part-{uuid.uuid4().hex}.geojsonl")
        with open(p, "w", encoding="utf-8") as f:
            f.write("\n".join(b.column("__line").to_pylist()))
            f.write("\n")
        return pa.table({"path": pa.array([p], type=pa.string())})

    # batch_size=None: one part file per block (blocks are already sized
    # by target_max_block_size; don't let batch coalescing merge them)
    out = lines.map_batches(sink, batch_format="pyarrow", batch_size=None)
    return sorted(r["path"] for r in out.take_all())
