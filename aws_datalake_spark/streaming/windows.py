"""Event-time windowed aggregations with watermarks (SURVEY.md §2.6).

The same builders serve batch DataFrames (watermark is a no-op in
batch — useful for oracle checking) and streaming DataFrames (where
the watermark bounds state and late data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    return df.withWatermark(ts_col, delay)


def stream_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming deduplication with BOUNDED state: keep the first
    arrival per key, drop re-deliveries that arrive within the
    watermark delay, and expire key state once the watermark passes
    (``dropDuplicatesWithinWatermark``). The unbounded-state
    ``dropDuplicates`` is a leak at 100 TB/day — state must expire.
    Batch twin: first-row-per-key (queries/streaming_batch.py:
    st_first_event_per_key)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    keys: list[str] | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time window: count + decimal-exact sum."""
    group = [F.window(ts_col, duration).alias("w")] + [F.col(k) for k in (keys or [])]
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(30,6)")).cast("double").alias("sum_value")
        )
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *[c for c in ["n_events", "sum_value"] if value_col or c == "n_events"],
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding window: each event lands in duration/slide windows."""
    group = [F.window(ts_col, duration, slide).alias("w")] + [
        F.col(k) for k in (keys or [])
    ]
    out = df.groupBy(*group).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        "n_events",
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    how: str = "inner",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-stream (or batch-twin) INTERVAL join: right events for
    the same key whose timestamp falls in ``[left_ts - lookback,
    left_ts]`` — the attribution shape (purchase ← views in the prior
    hour).

    On STREAMING inputs pass ``watermark``: both sides get
    ``withWatermark`` and the time-range predicate lets Spark bound
    the join state — each side holds only rows inside
    watermark + lookback, then drops them (without the range bound a
    stream-stream join's state grows forever). Outer joins emit their
    NULL-padded rows once the watermark passes the join window.
    On batch inputs (watermark=None or not — it is a no-op in batch)
    the same builder is the oracle-checkable twin, and Catalyst runs
    the equi-key part as a hash join with the range as a post-filter.

    Column contract: key/ts columns keep their caller names; rows
    carry every column of both sides (right's join key dropped).
    """
    lt, rt = F.col(left_ts), F.col(right_ts)
    cond = (
        (F.col(key) == F.col(right_key))
        & (rt >= lt - F.expr(f"INTERVAL {lookback}"))
        & (rt <= lt)
    )
    lhs, rhs = left, right
    if watermark is not None:
        lhs = lhs.withWatermark(left_ts, watermark)
        rhs = rhs.withWatermark(right_ts, watermark)
    return lhs.join(rhs, cond, how).drop(right_key)


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session window: sessions close after ``gap`` of inactivity;
    session end = last event + gap (Spark session_window contract)."""
    group = [F.session_window(ts_col, gap).alias("w")] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *(keys or []),
        "n_events",
    )


def drop_late_events(
    df: DataFrame,
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Batch twin of the watermark LATE-DATA DROP: Structured
    Streaming's watermark is GLOBAL — wm = max(event time seen so
    far) − delay, and any row older than wm is discarded before it
    reaches stateful operators. The batch-replay equivalent (the
    end-state a stream converges to once all input is seen) keeps
    rows with ``ts >= max(ts) − delay``.

    SCALE: max(ts) is a map-side-combinable scalar aggregate whose
    one-row result broadcasts back onto the corpus — the data side
    is filter-only (no shuffle of data rows), and the filter prunes
    every downstream stateful stage, exactly like the streaming
    engine's pre-state late-row discard.
    """
    mx = df.agg(F.max(ts_col).alias("__mx"))
    return (
        df.join(F.broadcast(mx))
        .where(F.col(ts_col) >= F.col("__mx") - F.expr(f"INTERVAL {delay}"))
        .drop("__mx")
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    bar: str = "1 hour",
    id_col: str = "event_id",
) -> DataFrame:
    """OHLC downsampling (open/high/low/close + volume) per tumbling
    bar — the canonical time-series compaction for tick/metric data.
    Open/close are exact first/last by event time via ``min_by`` /
    ``max_by`` over the (ts, id) struct: deterministic under ts ties
    (id breaks them), no window-sort pass — one hash aggregate,
    map-side combinable, scales to any bar count.
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    group = [F.window(ts_col, bar).alias("w")] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group).agg(
        F.min_by(value_col, order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    return out.select(
        F.col("w.start").alias("bar_start"),
        *(keys or []),
        "open", "high", "low", "close", "n_ticks",
    )
