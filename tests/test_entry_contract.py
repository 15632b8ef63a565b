"""Driver-contract smoke: entry()/queries()/oracle_sql() shape checks.

Mirrors how the driver consumes __ray_entry__: Ray pre-initialised (the
session fixture), module imported, callables invoked with sf_dir. Full
value-level verification lives in tools/check_correctness.py (run
separately; it owns its own Ray session)."""

import importlib
import sys

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entrymod():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


def test_entry_returns_rows(entrymod):
    import ray.data

    res = entrymod.entry()
    assert isinstance(res, ray.data.Dataset)
    df = res.to_pandas()
    assert len(df) > 0
    assert {"doc_id", "zone_key", "tile_id", "geometry"} <= set(df.columns)


def test_every_oracle_has_a_query(entrymod):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40
    assert len(oracles) >= 40


def test_sample_queries_run(entrymod):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    qs = entrymod.queries()
    for name in ("sjoin_pip", "tile_counts", "dedup_nchars", "q1_lineitem"):
        res = qs[name](SF)
        assert isinstance(res, (ray.data.Dataset, pd.DataFrame, pa.Table))


def test_no_ray_init_in_module_source():
    import ast

    src = open("/root/repo/__ray_entry__.py").read()
    calls = [
        node.func.attr
        for node in ast.walk(ast.parse(src))
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    ]
    assert "init" not in calls and "shutdown" not in calls
