"""Driver-contract smoke: entry() runs and yields rows; queries()
and oracle_sql() keys line up."""

from __future__ import annotations

import importlib.util
import os


def _load_entry_module():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry_module()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["n_name", "revenue"]


def test_oracle_keys_subset_of_queries():
    mod = _load_entry_module()
    q, o = mod.queries(), mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
