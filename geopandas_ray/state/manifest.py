"""Checkpoint manifests + resumable fragment sink (north rule: "resumable
mid-run with per-partition lineage + metrics").

Output layout ("Lance-style" fragment model, SURVEY.md §7.0 item 2 - the
real lance lib is unavailable offline, so a directory of parquet fragments
plus a JSON-lines manifest emulates it and reads back with
ray.data.read_parquet):

    out_dir/
      fragments/part-<input>-<seq>.parquet     # written atomically (tmp+rename)
      manifest.jsonl                           # one line per completed unit:
        {"input_fragment": ..., "output": ..., "rows": N, "bytes": B,
         "wall_s": S, "stage": ...}

Resume = anti-join of the plan against the manifest: `pending_inputs`
returns input fragments without a manifest entry; a rerun processes only
those. Fragment files land under tmp names and are renamed on close, so a
killed run never leaves a half-fragment that a resume would double-count.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import ray



def _sanitize_tag(tag: str) -> str:
    """Filesystem-safe, COLLISION-FREE fragment-name tag: sanitized last 80
    chars for readability plus a stable hash of the full raw tag. Distinct
    shard specs that sanitize or truncate alike (long lake paths differing
    only in an early path segment) must not share a tag — the resume-time
    orphan scrub deletes by tag prefix, and a collision there would remove
    a COMMITTED shard's fragments."""
    import hashlib

    safe = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in tag)[-80:]
    return f"{safe}.{hashlib.md5(tag.encode()).hexdigest()[:10]}"


class FragmentWriter:
    """map_batches sink stage: writes each batch as one parquet fragment
    (atomic rename) and emits a manifest row instead of data.

    ``partition_by``: a column name — each batch splits into one fragment
    per distinct value, landed under ``fragments/<col>_<val>/`` (the
    resumable-output shape: a failed run skips finished partitions, and a
    reader narrows to the key ranges it needs by listing subdirectories).
    The column stays IN the data (non-hive directory names on purpose, so
    read-back keeps the original arrow type)."""

    def __init__(
        self,
        out_dir: str,
        tag: str = "",
        schema_metadata: dict | None = None,
        partition_by: str | None = None,
    ):
        self.frag_dir = os.path.join(out_dir, "fragments")
        os.makedirs(self.frag_dir, exist_ok=True)
        self.tag = tag
        self.schema_metadata = schema_metadata
        self.partition_by = partition_by

    def _write_one(self, batch: pa.Table, subdir: str | None, partition: str) -> dict:
        t0 = time.time()
        safe_tag = _sanitize_tag(self.tag)
        name = f"part-{safe_tag}-{uuid.uuid4().hex[:12]}.parquet"
        d = self.frag_dir if subdir is None else os.path.join(self.frag_dir, subdir)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, "." + name + ".tmp")
        final = os.path.join(d, name)
        pq.write_table(batch, tmp, compression="snappy")
        os.rename(tmp, final)
        return {
            "input_fragment": self.tag,
            "output": final,
            "partition": partition,
            "rows": batch.num_rows,
            "bytes": os.path.getsize(final),
            "wall_s": time.time() - t0,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.schema_metadata:
            meta = dict(batch.schema.metadata or {})
            meta.update(
                {k.encode(): v.encode() if isinstance(v, str) else v for k, v in self.schema_metadata.items()}
            )
            batch = batch.replace_schema_metadata(meta)
        rows: list[dict] = []
        if self.partition_by is None:
            rows.append(self._write_one(batch, None, ""))
        else:
            import pyarrow.compute as pc

            col = batch.column(self.partition_by)
            for v in pc.unique(col).to_pylist():
                # pc.equal(col, None) yields an all-null mask that selects 0
                # rows — null keys need an explicit is_null filter or they'd
                # be silently dropped from the sink.
                if v is None:
                    sub = batch.filter(pc.is_null(col))
                    safe_v = "__null__"
                    # the manifest marker for the null partition is JSON
                    # null (None) — unambiguous with ANY string value,
                    # including literal "None" and literal "__null__"
                    part_value = None
                else:
                    sub = batch.filter(pc.equal(col, v))
                    raw = str(v)
                    safe_v = "".join(c if (c.isalnum() or c in "-_.") else "_" for c in raw)[-60:]
                    # distinct values can collide after sanitization or the
                    # 60-char truncation ("a/b" vs "a_b"); a stable hash
                    # suffix keeps one directory per distinct value. The
                    # null sentinel directory is reserved: a LITERAL
                    # "__null__" value sanitizes to itself, so force the
                    # hash-suffix path for it too.
                    if safe_v != raw or raw == "__null__":
                        import hashlib

                        safe_v += "-" + hashlib.md5(raw.encode()).hexdigest()[:8]
                    part_value = raw
                rows.append(
                    self._write_one(sub, f"{self.partition_by}_{safe_v}", part_value)
                )
        return pa.table(
            {
                "input_fragment": pa.array([r["input_fragment"] for r in rows]),
                "output": pa.array([r["output"] for r in rows]),
                "partition": pa.array([r["partition"] for r in rows], type=pa.string()),
                "rows": pa.array([r["rows"] for r in rows], type=pa.int64()),
                "bytes": pa.array([r["bytes"] for r in rows], type=pa.int64()),
                "wall_s": pa.array([r["wall_s"] for r in rows]),
            }
        )


def write_fragments(
    ds: ray.data.Dataset,
    out_dir: str,
    tag: str = "",
    schema_metadata: dict | None = None,
    partition_by: str | None = None,
) -> list[dict]:
    """Drive the sink; append manifest lines; return them."""
    # STATELESS tasks, not an actor pool: the writer's per-worker state is
    # four strings (CLAUDE.md — pools for trivial-state stages invert
    # scaling on startup churn). The instance pickles by value per task;
    # _write_one makedirs its target so any node can land fragments.
    writer = FragmentWriter(
        out_dir=out_dir, tag=tag, schema_metadata=schema_metadata,
        partition_by=partition_by,
    )
    rows = ds.map_batches(
        writer,
        batch_format="pyarrow",
        batch_size=None,  # one fragment per block, not per default-size batch
    ).take_all()
    append_manifest(out_dir, rows)
    return rows


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def append_manifest(out_dir: str, rows: list[dict]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(manifest_path(out_dir), "a") as f:
        for r in rows:
            f.write(json.dumps({k: r[k] for k in sorted(r)}) + "\n")


def load_manifest(out_dir: str) -> list[dict]:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def completed_inputs(out_dir: str) -> set[str]:
    return {r["input_fragment"] for r in load_manifest(out_dir)}


def pending_inputs(input_files: list[str], out_dir: str) -> list[str]:
    """The resume anti-join: inputs with no manifest entry yet."""
    done = completed_inputs(out_dir)
    return [f for f in input_files if f not in done]


def clean_orphan_fragments(out_dir: str, tag: str) -> int:
    """Remove fragments written for ``tag`` that never committed to the
    manifest (a killed run renames fragments as it goes but appends
    manifest lines only once the whole shard finishes), so a resumed shard
    starts clean and a directory-glob read-back never double-counts.
    Returns the number of files removed."""
    frag_dir = os.path.join(out_dir, "fragments")
    if not os.path.isdir(frag_dir):
        return 0
    prefix = f"part-{_sanitize_tag(tag)}-"
    # exact shape: prefix + 12 hex chars + ".parquet" (tmp files included)
    n_removed = 0
    for root, _dirs, files in os.walk(frag_dir):
        for name in files:
            base = name[1:-4] if name.startswith(".") and name.endswith(".tmp") else name
            if (
                base.startswith(prefix)
                and base.endswith(".parquet")
                and len(base) == len(prefix) + 12 + len(".parquet")
            ):
                os.remove(os.path.join(root, name))
                n_removed += 1
    return n_removed


def shard_inputs(paths: list[str], target_rows: int = 2_000_000) -> list[str]:
    """Split parquet inputs into row-group-range shard specs
    ``path::rg<lo>-<hi>`` (half-open) of roughly ``target_rows`` each.

    At 100 TB the resume unit must be smaller than a file: a killed run
    that processed 90% of a monolithic input would otherwise redo it all.
    Sharding on row-group boundaries keeps reads zero-copy (no row
    slicing) and each shard commits independently in the manifest. Files
    whose metadata can't be read (or with a single row group) stay whole.
    """
    shards: list[str] = []
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            shards.append(p)
            continue
        n_rg = md.num_row_groups
        if n_rg <= 1:
            shards.append(p)
            continue
        lo, acc = 0, 0
        for i in range(n_rg):
            acc += md.row_group(i).num_rows
            if acc >= target_rows or i == n_rg - 1:
                shards.append(f"{p}::rg{lo}-{i + 1}")
                lo, acc = i + 1, 0
        if len(shards) and shards[-1] == f"{p}::rg0-{n_rg}":
            shards[-1] = p  # one shard covering the whole file = the file
    return shards


@ray.remote
def _read_row_group(path: str, i: int, columns: list[str] | None) -> pa.Table:
    return pq.ParquetFile(path).read_row_groups([i], columns=columns)


def read_shard(spec: str, columns: list[str] | None = None):
    """Dataset for a shard spec from :func:`shard_inputs`.

    Row-group shards read each group in its own Ray task
    (``from_arrow_refs`` over remote reads — no driver materialization);
    plain paths go through ``ray.data.read_parquet``.
    """
    import ray.data as rd

    if "::rg" not in spec:
        return rd.read_parquet(spec, columns=columns)
    path, _, rng = spec.rpartition("::rg")
    lo, hi = (int(x) for x in rng.split("-"))
    refs = [_read_row_group.remote(path, i, columns) for i in range(lo, hi)]
    return rd.from_arrow_refs(refs)


def run_resumable(
    input_files: list[str],
    out_dir: str,
    pipeline,
    schema_metadata: dict | None = None,
    partition_by: str | None = None,
    columns: list[str] | None = None,
) -> dict:
    """Run ``pipeline(ds_for_one_input) -> Dataset`` over every input
    shard (file path or ``shard_inputs`` row-group spec) not yet in the
    manifest; each shard commits independently so a killed run resumes
    where it stopped.

    ``partition_by`` threads to the fragment sink: output blocks land in
    one directory per key value and the manifest line records the value —
    the full input fragment → cell → output block lineage.

    Returns summary {"processed": n, "skipped": n, "rows": n}.
    """
    todo = pending_inputs(input_files, out_dir)
    skipped = len(input_files) - len(todo)
    total_rows = 0
    for f in todo:
        t0 = time.time()
        clean_orphan_fragments(out_dir, f)
        ds = read_shard(f, columns=columns)
        out = pipeline(ds)
        rows = write_fragments(
            out, out_dir, tag=f, schema_metadata=schema_metadata, partition_by=partition_by
        )
        n = sum(r["rows"] for r in rows)
        total_rows += n
        # per-partition lineage + stage metrics line (north rule)
        try:
            stats = out.stats()
        except Exception:
            stats = ""
        append_manifest(
            out_dir,
            [
                {
                    "input_fragment": f + "#metrics",
                    "output": "",
                    "rows": n,
                    "bytes": sum(r["bytes"] for r in rows),
                    "wall_s": round(time.time() - t0, 3),
                    "stage_stats": stats[-2000:] if stats else "",
                }
            ],
        )
    return {"processed": len(todo), "skipped": skipped, "rows": total_rows}
