"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` DuckDB result on
the same parquet tables and compares row count, schema (column names), and
exact values (rows sorted by all columns). Exits nonzero on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="stable", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(ours.columns) != sorted(oracle.columns):
        return [f"{name}: columns {sorted(ours.columns)} != {sorted(oracle.columns)}"]
    if len(ours) != len(oracle):
        errs.append(f"{name}: rows {len(ours)} != {len(oracle)}")
        return errs
    a, b = canon(ours), canon(oracle)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            bad = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
        else:
            bad = ~(pd.Series(av).eq(pd.Series(bv)) | (pd.isna(av) & pd.isna(bv)))
            bad = np.asarray(bad)
        if bad.any():
            i = int(np.nonzero(bad)[0][0])
            errs.append(
                f"{name}: col {c} differs at sorted-row {i}: ours={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r} ({int(bad.sum())} rows)"
            )
    return errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(f"{name}: ENGINE ERROR {type(e).__name__}: {e}")
            print(f"[FAIL-ENGINE] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(ours)} rows")
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(f"{name}: ORACLE SQL ERROR {e}")
            print(f"[FAIL-SQL] {name}: {e}")
            continue
        errs = compare(name, ours, oracle)
        if errs:
            failures.extend(errs)
            for e in errs:
                print(f"[FAIL] {e}")
        else:
            print(f"[ok] {name}: {len(ours)} rows match")
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main()
