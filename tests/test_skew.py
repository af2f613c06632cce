"""Skew operators: salted join/agg equivalence with plain plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.skew import (
    salted_agg_sum,
    salted_join,
    skew_safe_distinct_count,
)
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, ["o_custkey"], salt_from="o_orderkey").select(
        "o_orderkey", "c_name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (2, 99)], "id long, k long")
    small = spark.createDataFrame([(10, "x")], "k long, v string")
    out = {r.id: r.v for r in salted_join(big, small, ["k"], "id", how="left").collect()}
    assert out == {1: "x", 2: None}


def test_salted_agg_sum_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, k string, v long"
    )
    out = {r.k: r.v for r in salted_agg_sum(df, ["k"], ["v"], "id", 4).collect()}
    assert out == {"a": 30, "b": 5}


def test_skew_safe_distinct_count(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], "k string, v long"
    )
    out = {r.k: r.n_distinct for r in skew_safe_distinct_count(df, ["k"], "v").collect()}
    assert out == {"a": 2, "b": 1}
