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
from aws_datalake_spark.scratch import scratch_dir


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


@query(
    "st_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS hourly_value
      FROM events WHERE user_id % 5 = 0
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS TIMESTAMP)
               AS hour
      FROM span
    )
    SELECT g.user_id, g.hour,
           last_value(h.hourly_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS value_filled,
           CAST(h.hourly_value IS NOT NULL AS BOOLEAN) AS observed
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour = h.hour
    """,
)
def st_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward (the
    hypertable `time_bucket_gapfill` + `locf` pattern): densify each
    user's hourly series over its own active span (`sequence` +
    `explode` — per-key bounded, no global calendar cross join), then
    carry the last non-null hourly value forward with an
    ignore-nulls `last()` window.

    Scale: the grid is generated FROM the per-user span aggregate
    (150 rows here; |keys| rows in general), so no shuffle ever
    carries more than keys x span_hours rows, partitioned by the same
    user_id key as the window that follows — one exchange feeds both
    the join and the fill.
    """
    from aws_datalake_spark.queries._shared import dsum

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(dsum("value", "hourly_value"))
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .withColumn("value_filled", F.last("hourly_value", ignorenulls=True).over(w))
        .withColumn("observed", F.col("hourly_value").isNotNull())
        .select("user_id", "hour", "value_filled", "observed")
    )


@query(
    "st_gap_fill_interp",
    oracle="""
    WITH hourly AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS hourly_value
      FROM events WHERE user_id % 7 = 0
      GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS TIMESTAMP)
               AS hour
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.hour, h.hourly_value,
             epoch(g.hour) AS sec
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.hour = h.hour
    ),
    w AS (
      SELECT user_id, hour, hourly_value, sec,
             last_value(hourly_value IGNORE NULLS) OVER back  AS pv,
             last_value(CASE WHEN hourly_value IS NOT NULL THEN sec END
                        IGNORE NULLS) OVER back               AS ps,
             first_value(hourly_value IGNORE NULLS) OVER fwd  AS nv,
             first_value(CASE WHEN hourly_value IS NOT NULL THEN sec END
                         IGNORE NULLS) OVER fwd               AS ns
      FROM j
      WINDOW back AS (PARTITION BY user_id ORDER BY hour
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd  AS (PARTITION BY user_id ORDER BY hour
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, hour,
           CASE WHEN ns = ps THEN pv
                ELSE pv + (nv - pv) * (CAST(sec - ps AS DOUBLE)
                                       / CAST(ns - ps AS DOUBLE))
           END AS value_interp
    FROM w
    """,
)
def st_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by linear interpolation between the surrounding
    observations (the hypertable `interpolate` companion to
    st_gap_fill_locf): bracket each grid hour with ignore-nulls
    last()/first() windows (value and observation time), then lerp
    in epoch seconds. Observed hours fall out exactly (fraction 0).

    Scale: same single user_id exchange as LOCF — both directional
    windows and the join reuse one partitioning; state per key is
    the span's hour count, never the raw events.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.queries._shared import dsum

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(dsum("value", "hourly_value"))
    # Consecutive-observation pairs instead of grid ⋈ observations +
    # two ignore-null directional windows: every grid hour between
    # obs (h, v) and the next obs (nh, nv) has exactly pv=v, ps=sec(h),
    # nv=nv, ns=sec(nh) under the original windows, and the observed
    # hour itself lerps with fraction 0 → v. One lead() window and an
    # explode replace the span aggregate, the (user_id, hour) join
    # (which also re-executed the hourly lineage) and both
    # unbounded-frame window passes — the lerp expression and operands
    # are IDENTICAL, so every output double is bit-equal.
    w = Window.partitionBy("user_id").orderBy("hour")
    pairs = hourly.select(
        "user_id",
        "hour",
        "hourly_value",
        F.lead("hour").over(w).alias("nh"),
        F.lead("hourly_value").over(w).alias("nv"),
    )
    g = pairs.select(
        "user_id",
        "hour",
        "hourly_value",
        "nh",
        "nv",
        F.explode(
            F.expr(
                "sequence(hour, coalesce(nh - interval 1 hour, hour),"
                " interval 1 hour)"
            )
        ).alias("ghour"),
    )
    frac = (F.unix_timestamp("ghour") - F.unix_timestamp("hour")).cast(
        "double"
    ) / (F.unix_timestamp("nh") - F.unix_timestamp("hour")).cast("double")
    interp = F.when(
        F.col("ghour") == F.col("hour"), F.col("hourly_value")
    ).otherwise(
        F.col("hourly_value") + (F.col("nv") - F.col("hourly_value")) * frac
    )
    return g.select(
        "user_id", F.col("ghour").alias("hour"), interp.alias("value_interp")
    )


@query(
    "st_interval_join",
    oracle="""
    SELECT p.event_id AS p_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS p_ts,
           v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS lead_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts
    """,
)
def st_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — stream-stream interval join, batch twin: each purchase
    matched to the same user's views in the preceding hour (the
    attribution shape). The SAME builder
    (streaming/windows.py:interval_join) runs on watermarked streams —
    where the time-range predicate is what lets Spark expire join
    state — exercised with real readStream runs in
    tests/test_streaming.py."""
    from aws_datalake_spark.streaming.windows import interval_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    out = interval_join(
        purchases, views, "user_id", "v_user", "p_ts", "v_ts", lookback="1 hour"
    )
    return out.select(
        "p_id", "user_id", "p_ts", "v_id", "v_ts",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias("lead_seconds"),
    )


@query(
    "st_txn_stream_ingest",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 1000000.0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS sum_value
    FROM events GROUP BY event_type
    """,
)
def st_txn_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — exactly-once streaming ingest into the transaction-log
    table (sources/txn_table.py:stream_append_sink): the events
    table arrives as three deterministic micro-batches, each one
    atomic stream-append commit; batch 0 is then REPLAYED (the
    at-least-once retry window) and must no-op, or the aggregate
    double-counts and the oracle hash catches it. The aggregate runs
    over the committed table, so the result certifies commit
    atomicity + idempotence, not just the transformation."""

    from aws_datalake_spark.queries._shared import dsum
    from aws_datalake_spark.sources import txn_table as tt

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    root = scratch_dir(prefix="txn_stream_") + "/events_tt"
    sink = tt.stream_append_sink(root)
    for b in range(3):
        sink(ev.filter(F.col("event_id") % 3 == b), b)
    sink(ev.filter(F.col("event_id") % 3 == 0), 0)  # replay → no-op
    table = tt.read(spark, root)
    return table.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    )


@query(
    "st_interval_join_outer",
    oracle="""
    SELECT p.event_id AS p_id, p.user_id,
           CAST(p.ts AS TIMESTAMP) AS p_ts,
           v.event_id AS v_id, CAST(v.ts AS TIMESTAMP) AS v_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL 5 MINUTE AND v.ts <= p.ts
    """,
)
def st_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST — stream-stream LEFT OUTER interval join, batch twin:
    purchases with no view in the preceding 5 minutes keep their row
    NULL-padded (the unattributed-conversion report). In streaming,
    the outer row is emitted only once the watermark passes the join
    window — exercised with real readStream runs in
    tests/test_streaming.py::test_stream_stream_left_outer_join_*;
    this twin certifies the matching/null semantics against SQL."""
    from aws_datalake_spark.streaming.windows import interval_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", F.col("ts").alias("p_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    out = interval_join(
        purchases, views, "user_id", "v_user", "p_ts", "v_ts",
        lookback="5 minutes", how="left_outer",
    )
    return out.select("p_id", "user_id", "p_ts", "v_id", "v_ts")
