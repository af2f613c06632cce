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
