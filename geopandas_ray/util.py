"""Small shared runtime helpers."""

from __future__ import annotations


def default_pool(concurrency=None) -> tuple[int, int]:
    """Actor-pool size that scales with the cluster instead of a fixed cap.

    A hardcoded (1, 8) pool caps every stateful stage at 8 actors and
    destroys scaling beyond 8 CPUs (measured: 0.40 efficiency 8->32).
    Default: autoscale up to the cluster's CPU count (stages share the node;
    Ray's streaming executor balances pools via backpressure).
    """
    if concurrency is not None:
        return concurrency
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return (1, max(2, cpus))


def pull_table(ds, columns: list[str] | None = None, ordered: bool = False):
    """Bounded driver-side pull that is safe on ANY block type.

    ``filter(expr=...)`` and pandas-stage outputs can leave PANDAS blocks in
    a dataset; ``to_arrow_refs()`` on those raises (CLAUDE.md pitfall).
    ``iter_batches(batch_format="pyarrow")`` converts per block regardless of
    the underlying block type. Only for results already known to be small
    (broadcast sides, unmatched tails, distinct keys) - never a full big
    dataset.

    ``ordered=True`` pins Ray's output-bundle order to input order
    (bundles otherwise arrive in task-completion order — a multi-block
    pull is ROTATED run to run). Writers that promise deterministic
    feature order (the driver-assembled interchange sinks) opt in;
    order-free pulls (broadcast sides, key sets) keep the cheap default.
    """
    import pyarrow as pa

    if columns is not None:
        ds = ds.select_columns(columns)
    if ordered:
        # preserve_order must be set on the DATASET's captured context
        # (mutating the global DataContext after creation is a no-op) —
        # same pattern as DistributedSpatialIndex / iterfeatures
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
        ds.context.execution_options.preserve_order = True
    tables = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="default")


def default_shuffle_partitions(n: int | None = None) -> int:
    """Partition count to repartition to BEFORE a groupby shuffle.

    Ray's sort-based groupby emits one output partition per INPUT BLOCK; a
    2-block input collapses the whole shuffle to 2 tasks (measured - see
    CLAUDE.md invariant). ~4 blocks per CPU keeps the reduce side fanned out
    without drowning the scheduler.
    """
    if n is not None:
        return n
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return min(max(4 * cpus, 64), 512)


def estimate_rows_bytes(ds) -> tuple:
    """Metadata-only (row_count, byte_size) estimate for a Dataset — no
    execution. Works for read-rooted plans (parquet/feather metadata);
    returns (None, None) when the plan's size cannot be inferred (e.g.
    after a map_batches). Used by driver-sized surfaces (``sindex``, the
    .shp/.gpkg writers) to refuse obviously oversized inputs up front."""
    try:
        m = ds._logical_plan.dag.infer_metadata()
        return m.num_rows, m.size_bytes
    except Exception:
        return None, None


def guard_driver_sized(ds, surface: str, alternative: str,
                       max_rows: int | None, max_bytes: int | None) -> None:
    """Raise if metadata proves the dataset exceeds a driver-size cap.

    Unknown sizes (post-transform plans) pass through — the caps are a
    guardrail against the obvious foot-gun (``.sindex`` / ``to_file('.shp')``
    on a freshly-read 100-TB table), not a hard admission control."""
    rows, nbytes = estimate_rows_bytes(ds)
    if max_rows is not None and rows is not None and rows > max_rows:
        raise ValueError(
            f"{surface}: input has {rows:,} rows (> cap {max_rows:,}); this "
            f"surface materializes on/through the driver. {alternative} "
            f"Pass a larger cap explicitly to override."
        )
    if max_bytes is not None and nbytes is not None and nbytes > max_bytes:
        raise ValueError(
            f"{surface}: input is ~{nbytes / 2**30:.1f} GiB (> cap "
            f"{max_bytes / 2**30:.1f} GiB); this surface materializes "
            f"on/through the driver. {alternative} Pass a larger cap "
            f"explicitly to override."
        )
