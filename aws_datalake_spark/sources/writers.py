"""Writers (SURVEY.md S10-S12, S16-S17).

Distributed sinks. ``partitionBy('year','month','day')`` reproduces
the reference's hive-style zone layout (ingestion.py:247) — partition
pruning then comes free on read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cast_void_to_string(df: DataFrame) -> DataFrame:
    """Cast NullType columns to string — CSV (and several other
    datasources) reject VOID on both write AND schema'd re-read."""
    from pyspark.sql.types import NullType

    if not any(isinstance(f.dataType, NullType) for f in df.schema.fields):
        return df
    return df.select(
        *[
            F.col(f.name).cast("string").alias(f.name)
            if isinstance(f.dataType, NullType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def write_pipe_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S11 — pipe-delimited CSV with header
    (transformation.py:410-412: to_csv(sep='|', index=False)).

    VOID-typed columns (all-NULL rule outputs, padding) are cast to
    string: the reference writes such columns as empty CSV cells
    (pandas NaN), while Spark's CSV sink rejects NullType outright."""
    df = cast_void_to_string(df)
    (
        df.write.mode(mode)
        .option("sep", "|")
        .option("header", True)
        .option("quote", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S10 — JSON sink (ingestion.py:273-279; line-delimited rather
    than indent=4 pretty arrays: at scale a JSON file per record
    array doesn't parallelize, JSONL does)."""
    df.write.mode(mode).json(path)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str, mode: str = "overwrite") -> None:
    """S12 — hive-style year=/month=/day= layout with zero-padded
    month/day (ingestion.py:230-247 key templating)."""
    (
        df.withColumn("year", F.date_format(ts_col, "yyyy"))
        .withColumn("month", F.date_format(ts_col, "MM"))
        .withColumn("day", F.date_format(ts_col, "dd"))
        .write.mode(mode)
        .partitionBy("year", "month", "day")
        .parquet(path)
    )


def append_report(df: DataFrame, path: str) -> None:
    """S16 — append-only report sink (loading.py:1937-1956: COPY into
    final table, no SCD)."""
    df.write.mode("append").parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar-format parity beyond parquet: ORC sink (built-in
    vectorized reader/writer; same predicate-pushdown and pruning
    contract as parquet on read)."""
    df.write.mode(mode).orc(path)


def write_ordered_shards(
    df: DataFrame, path: str, order_col: str, n_shards: int
) -> None:
    """Export a globally-ORDERED dataset as ``n_shards`` files whose
    filename-order concatenation reproduces the order — the training-
    shard last mile after ``training_order`` assigns positions.

    ``repartitionByRange`` samples the order column to cut balanced
    range boundaries (ascending ranges land in ascending partition
    ids, i.e. ascending part-file numbers) and
    ``sortWithinPartitions`` orders inside each shard — so the global
    order materializes WITHOUT a single-task global sort: every shard
    sorts its own slice in parallel, and no task ever holds more than
    ~rows/n_shards rows.
    """
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "overwrite") -> None:
    """XML sink (Spark 4 built-in): one ``row_tag`` element per row,
    one ``root_tag`` document per partition file — the same
    parallel-files contract as the CSV/JSON sinks."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )
