"""Shared helpers for query definitions.

Numeric determinism policy: any aggregate whose value the DuckDB
oracle must hash-match is accumulated in DECIMAL (exact, order-
independent) and only then cast to DOUBLE. Summing raw doubles is
order-dependent (partial aggregation order differs between Spark
tasks and DuckDB threads); decimal accumulation removes that, and
decimal→double conversion is correctly rounded in both engines for
unscaled values < 2^53.

The decimal scale must make the true value exactly representable:
test-lake money columns carry 2 decimal digits, so a three-factor
product like price*(1-disc)*(1+tax) carries 6 — rounding it at scale
4 lands exactly on half-boundaries where Spark (HALF_UP) and DuckDB
disagree. Scale 6 is the default for that reason.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent sum of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double")
        / F.count(c).cast("double")
    ).alias(alias)


def o_dsum(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`dsum` (without alias)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`davg` (without alias)."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )
