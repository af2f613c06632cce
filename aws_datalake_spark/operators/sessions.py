"""Gap-based sessionization: label every event with a per-user
session sequence number and derive per-session journey facts.

Spark's built-in ``session_window`` produces windowed AGGREGATES;
this operator produces the session LABELING (each event keeps its
row, gaining a session id) that funnel/journey analysis needs, and
the per-session rollup on top of it.

SCALE (100 TB): both windows are PARTITIONED BY the user key —
Spark plans one hash exchange on ``key_col`` and per-partition
sorts; no global window, no driver state. Session boundaries are
integer epoch-second comparisons (no interval arithmetic), so the
labeling is engine-portable and deterministic under timestamp ties
via the ``id_col`` tie-break. The subsequent per-session rollup
reuses the same (key) partitioning — AQE coalesces the second
exchange into a local aggregate after the window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 4 * 3600,
) -> DataFrame:
    """Append ``session_seq`` (1-based per key): a new session starts
    when the gap to the previous event of the same key exceeds
    ``gap_seconds``. lag + running-sum over one per-key window."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | (epoch - prev > F.lit(int(gap_seconds))), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_seq",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def sequence_ngrams(
    df: DataFrame,
    n: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Frequent contiguous event-type n-grams across per-key event
    sequences (sequential pattern mining, contiguous-window flavor):
    ``(step_1..step_n, support, occurrences)`` where ``support`` is
    the number of distinct keys whose ordered event stream contains
    the n-gram at least once and ``occurrences`` the total
    (overlapping) match count; rows kept when support >=
    ``min_support``.

    SCALE: ``lead()`` over one per-key window — a single hash
    exchange on the key plus per-partition sorts (the sessionize
    shape) — then one map-combinable count_distinct aggregate over at
    most |event types|^n groups. No per-key collect_list (the naive
    formulation materializes whole user histories in one row; this
    never does).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    grams = df.select(
        F.col(key_col).alias("__k"),
        *[s.alias(f"step_{i + 1}") for i, s in enumerate(steps)],
    ).where(F.col(f"step_{n}").isNotNull())
    return (
        grams.groupBy(*[f"step_{i + 1}" for i in range(n)])
        .agg(
            F.countDistinct("__k").alias("support"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .where(F.col("support") >= min_support)
    )


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-session journey facts: start/end, duration (integer
    seconds), event count, entry/exit event types (exact first/last
    by (ts, id) via min_by/max_by — one map-combinable aggregate,
    no second window sort)."""
    order = F.struct(F.col(ts_col), F.col(id_col))
    return sessions.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_sec"),
        F.count(F.lit(1)).alias("n_events"),
        F.min_by(type_col, order).alias("entry_event"),
        F.max_by(type_col, order).alias("exit_event"),
        F.countDistinct(type_col).alias("n_event_types"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: ``(from_state, to_state, n, n_from, p)`` where ``p``
    is the exact conditional probability n / n_from (count of
    from→to steps over all steps leaving from_state). The
    clickstream / user-journey model behind next-step prediction and
    anomaly scoring (improbable transitions).

    EXACTNESS: counts are int64; p is one correctly-rounded divide
    of exact ints — bit-identical cross-engine.

    SCALE: one per-key window (hash exchange on the key, same shape
    as sessionize) emits (from, to) steps; the count aggregate is
    states²-bounded, and the per-from totals come from a second
    aggregate on the ALREADY states²-sized counts (no second pass
    over events, no window over anything unbounded).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    steps = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
    )
    counts = steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("n_from"))
    return counts.join(totals, "from_state").select(
        "from_state",
        "to_state",
        F.col("n").cast("long").alias("n"),
        F.col("n_from").cast("long").alias("n_from"),
        F.round(
            F.col("n").cast("double") / F.col("n_from").cast("double"), 6
        ).alias("p"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key union length of (possibly overlapping) integer
    intervals: ``(key, n_intervals, n_islands, covered)`` — total
    DISTINCT time covered (true active seconds under overlapping
    sessions, effective on-air time, covered genome ranges). Naive
    SUM(end−start) double-counts overlaps; the exact answer is the
    classic sweep, here as the gaps-and-islands idiom:

    order each key's intervals by start; an interval OPENS a new
    island when its start exceeds the running max end of everything
    before it; covered = Σ per island (max end − min start).

    EXACTNESS: starts/ends must be integral (epoch seconds/micros);
    every step — running max, island ids, min/max per island, the
    final sum — is exact integer arithmetic, hash-checkable.

    SCALE: two windows PARTITIONED by key over the intervals frame
    plus one aggregate — never a global sort; a hot key degrades to
    that key's interval count, not the corpus.
    """
    from pyspark.sql.window import Window

    per = df.select(
        F.col(key_col).alias("__k"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
    )
    w = Window.partitionBy("__k").orderBy("__s", "__e")
    prev_max = F.max("__e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = per.withColumn(
        "__new",
        F.when(
            prev_max.isNull() | (F.col("__s") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__isl",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = marked.groupBy("__k", "__isl").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.max("__e") - F.min("__s")).alias("__len"),
    )
    return islands.groupBy("__k").agg(
        F.sum("__n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("__len").alias("covered"),
    ).select(
        F.col("__k").alias(key_col), "n_intervals", "n_islands", "covered"
    )
