"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in the ``aws_datalake_spark`` package;
this module is the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_datalake_spark.queries import (  # noqa: E402
    all_oracles,
    driver_ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-way star join + agg) on /root/testdata/sf0.001."""
    from aws_datalake_spark.queries.relational import q05_region_revenue

    return q05_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the driver's correctness window certifies not-yet-green queries
    first (rotates as CORRECTNESS_r*.json artifacts accumulate)."""
    return driver_ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-SQL twin for each SQL-expressible query."""
    return all_oracles()
