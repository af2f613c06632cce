"""Bucketed tables for co-located joins (100 TB posture).

A fact⋈fact equi-join (orders⋈lineitem at 100 TB) shuffles BOTH
sides every query. Writing both tables bucketed by the join key into
the warehouse pays that shuffle once at write time; every subsequent
join reads co-located buckets and elides the Exchange entirely
(verified by tests/test_bucketing.py on the physical plan).

Rules that make bucketing actually work:
* Equal bucket counts on both tables (or an integer multiple).
* Bucket count sized so one bucket ≈ one task's worth of data at the
  target scale (100 TB / 128 MB ≈ 800k ⇒ thousands of buckets; the
  local tests use 8).
* `sortBy` within buckets upgrades SortMergeJoin to skip the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key — the plan carries no
    Exchange on either side when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
