"""Bucketed co-located join: shuffle elision verified on the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_datalake_spark.sources.bucketing import colocated_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    l = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "bkt_orders", ["o_orderkey"], 8)
    write_bucketed(l, "bkt_lineitem", ["o_orderkey"], 8)
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_elides_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # force the sort-merge path (broadcast would hide the bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, lt, rt, ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, ["o_orderkey"])
    plain = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
    )
    assert joined.count() == plain.count()
    a = joined.agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("s")).collect()[0].s
    b = plain.agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).alias("s")).collect()[0].s
    assert a == b
