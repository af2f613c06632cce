"""Table catalog over the parquet test lake.

The reference discovers its inputs by listing S3 prefixes and
templating hive-style ``year=/month=/day=`` keys
(/root/reference/partitioning.py:28-32, ingestion.py:247). Spark
gets the same behavior from path-glob discovery + partition
discovery; this module is the thin naming layer on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table. Parquet scan → column pruning and filter
    pushdown are automatic once downstream operators are declarative."""
    # set defensively for sessions not built by get_spark() (the
    # driver builds its own): timestamps must render in UTC to match
    # the DuckDB oracle's naive timestamps
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts arrives either as parquet TIMESTAMP(NANOS) (read as
        # ns-since-epoch via nanosAsLong — truncate to µs with integer
        # div; float division would lose precision > 2^53) or, when the
        # fixture writer emits µs precision, as TIMESTAMP_NTZ — align
        # both to session-TZ TimestampType (session TZ is UTC above, so
        # the wall-clock values are identical).
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every lake table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so ``spark.sql`` works
    against the same names the DuckDB oracle uses."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
