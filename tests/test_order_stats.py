"""Unit tests for operators/order_stats.py (exact quantile via
histogram narrowing)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from aws_datalake_spark.operators.order_stats import exact_quantile


def _expected(vals, q):
    return sorted(vals)[int(q * (len(vals) - 1))]


def test_exact_quantile_direct_path(spark):
    vals = [3.5, 1.0, 2.25, 9.0, 4.5, 4.5, 0.125]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert exact_quantile(df, "x", q) == _expected(vals, q)


def test_exact_quantile_multi_round_with_duplicates(spark):
    # deterministic pseudo-random doubles with heavy duplication;
    # force several narrowing rounds with tiny bins + threshold
    vals = [((i * 2654435761) % 1000) / 7.0 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    for q in (0.01, 0.5, 0.99):
        got = exact_quantile(df, "x", q, n_bins=16, direct_threshold=50)
        assert got == _expected(vals, q), q


def test_exact_quantile_nulls_excluded_and_constant(spark):
    df = spark.createDataFrame(
        [(None,), (7.0,), (7.0,), (None,), (7.0,)], "x double"
    )
    assert exact_quantile(df, "x", 0.5) == 7.0


def test_exact_quantile_empty_raises(spark):
    df = spark.createDataFrame([], "x double")
    with pytest.raises(ValueError):
        exact_quantile(df, "x", 0.5)


def test_exact_quantile_by_group_matches_per_group_sort(spark):
    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    import random

    rnd = random.Random(7)
    rows = [(f"g{i % 3}", float(rnd.randrange(0, 1000)) / 7.0) for i in range(900)]
    # one group dominated by a single repeated value (never shrinks)
    rows += [("g3", 42.0)] * 200 + [("g3", 41.0), ("g3", 43.0)]
    df = spark.createDataFrame(rows, "g string, x double").repartition(8)
    got = {
        r["g"]: r["quantile"]
        for r in exact_quantile_by_group(
            df, "g", "x", 0.5, n_bins=8, direct_threshold=20, max_rounds=4
        ).collect()
    }
    import collections

    byg = collections.defaultdict(list)
    for g, x in rows:
        byg[g].append(x)
    for g, vals in byg.items():
        assert got[g] == sorted(vals)[int(0.5 * (len(vals) - 1))], g


def test_exact_quantile_by_group_long_keys(spark):
    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(101)], "g long, x double"
    )
    got = {
        r["g"]: r["quantile"]
        for r in exact_quantile_by_group(df, "g", "x", 1.0).collect()
    }
    assert got == {0: 100.0, 1: 99.0}


def test_quantile_q_out_of_range_raises(spark):
    """ADVICE r04 item 3: q outside [0,1] must fail fast with a clear
    ValueError, not surface later as an opaque lost-rank error."""
    from aws_datalake_spark.operators.order_stats import (
        exact_quantile_by_group,
        exact_quantiles,
    )

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    g = spark.createDataFrame([("a", 1.0)], "g string, x double")
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            exact_quantile(df, "x", bad)
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            exact_quantiles(df, "x", (0.5, bad))
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            exact_quantile_by_group(g, "g", "x", bad)


def test_quantiles_by_group_high_cardinality_guard(spark):
    """VERDICT r10 item 3 / r11 item 8: above max_edges the shared-
    pass narrowing (one when()-struct per (group, q) edge in a single
    projection + an |edges|-wide driver histogram) must hand off to
    the window-rank path, and both paths must agree exactly."""
    from aws_datalake_spark.operators.order_stats import (
        exact_quantiles_by_group,
    )

    rows = [(f"g{i % 500}", float((i * 37) % 1000)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    qs = (0.1, 0.5, 0.9)
    # 500 groups x 3 qs = 1500 edges: force BOTH paths and compare
    fast = {
        (r["g"], r["__qi"]): r["quantile"]
        for r in exact_quantiles_by_group(
            df, "g", "v", qs, max_edges=10_000
        ).collect()
    }
    guarded = {
        (r["g"], r["__qi"]): r["quantile"]
        for r in exact_quantiles_by_group(
            df, "g", "v", qs, max_edges=10
        ).collect()
    }
    assert fast == guarded
    assert len(guarded) == 500 * len(qs)
