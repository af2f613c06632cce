"""Event-time window queries over the events table (SURVEY.md §2.6).

The window builders are shared with the true streaming path
(streaming/windows.py); running them on the batch events table makes
them oracle-checkable. The genuinely streaming behaviors (watermark
late-drop, foreachBatch DQ, applyInPandasWithState) are exercised in
tests/test_streaming.py with real readStream/writeStream runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query
from aws_datalake_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)


@query(
    "st_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def st_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — 1-hour tumbling event-time windows per event_type."""
    ev = t(spark, sf_dir, "events")
    return tumbling_counts(ev, duration="1 hour", keys=["event_type"])


@query(
    "st_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT event_id,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE])
               AS window_start
      FROM events)
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           COUNT(*) AS n_events
    FROM starts GROUP BY 1, 2
    """,
)
def st_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — 1-hour windows sliding every 30 minutes (each event in
    exactly two windows)."""
    ev = t(spark, sf_dir, "events")
    return sliding_counts(ev, duration="1 hour", slide="30 minutes")


@query(
    "st_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           CAST(MAX(ts) + INTERVAL 5 MINUTE AS TIMESTAMP) AS session_end,
           user_id, COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
)
def st_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — 5-minute-gap session windows per user (gaps-and-islands
    twin in the oracle; session end = last event + gap)."""
    ev = t(spark, sf_dir, "events")
    return session_counts(ev, gap="5 minutes", keys=["user_id"])


@query(
    "st_json_props_extract",
    oracle="""
    SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS k,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def st_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/E2 on the stream fixture: parse the props JSON column and
    aggregate on an extracted field (from_json, JVM-side)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(F.from_json("props", "k int").alias("p"))
        .select(F.col("p.k").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
    )


@query(
    "st_first_event_per_key",
    oracle="""
    SELECT user_id, event_type, ts, event_id FROM (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def st_first_event_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic first-arrival-per-key — the batch twin of
    streaming/windows.py:stream_dedup (whose streaming form drops
    within-watermark re-deliveries with bounded, expiring state)."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    win = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.select("user_id", "event_type", "ts", "event_id",
                 F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "st_hourly_daily_rollup",
    oracle="""
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*) AS n_events,
             SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS sum_s
      FROM events GROUP BY 1
    )
    SELECT CAST(date_trunc('day', hour) AS TIMESTAMP) AS day,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(sum_s) AS DOUBLE) / 1000000.0 AS sum_value
    FROM hourly GROUP BY 1
    """,
)
def st_hourly_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the daily grain is
    computed FROM the hourly partials, not from raw events — at
    100 TB each coarser grain re-aggregates ~24× fewer rows than a
    fresh raw scan, and in production the hourly table is the
    incrementally-maintained Delta table this query's first stage
    stands in for. Exactness survives re-aggregation because hourly
    sums are carried as scaled BIGINTs (see queries/_shared.py) and
    only converted to double at the final grain."""
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * F.lit(1000000.0), 0).cast("long")).alias("sum_s"),
    )
    return hourly.groupBy(F.date_trunc("day", "hour").alias("day")).agg(
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_hours"),
        (F.sum("sum_s").cast("double") / F.lit(1000000.0)).alias("sum_value"),
    )


@query(
    "st_json_path_functions",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(CASE WHEN json_extract_string(props, '$.missing')
                           IS NULL THEN 1 END) AS BIGINT) AS n_no_field
    FROM events GROUP BY 1
    """,
)
def st_json_path_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-path function surface (get_json_object) as the untyped
    twin of st_json_props_extract's schema-full from_json: path
    extraction stays JVM-side, absent paths yield NULL."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(
            F.when(F.get_json_object("props", "$.missing").isNull(), F.lit(1))
        ).alias("n_no_field"),
    )
