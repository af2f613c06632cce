"""Cumulative→delta stateful computation (SURVEY.md A3/J1/S20/S21).

Reference semantics (/root/reference/transformation.py:78-241): for
each row of today's snapshot, look up the stored cumulative metrics
by (_id, reference_id); emit delta = current − stored (stored
defaults to 0 when the key is new / the metric is NULL); then upsert
the state store to the current cumulative.

The reference does this with TWO DynamoDB RPCs PER ROW inside
df.apply(axis=1) (transformation.py:85-118,407) — its biggest
anti-pattern. The Spark-first form is two set-based operations:

* delta:  snapshot LEFT JOIN state ON keys;
          delta_i = coalesce(cur_i,0) − coalesce(prev_i,0)
* upsert: new state = snapshot's cumulative values, plus state rows
          for keys absent from the snapshot (a full-outer coalesce).

State is expected to be small relative to the snapshot (one row per
entity key), so the join broadcasts; at 100 TB the state table is
partitioned by key and AQE picks sort-merge when it outgrows the
broadcast threshold.

A temporal variant (:func:`deltas_over_history`) computes the same
thing across an ordered history of snapshots with a window lag —
used when all snapshots are already in the lake. The streaming twin
lives in streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compute_deltas(
    snapshot: DataFrame,
    state: DataFrame | None,
    keys: list[str],
    metrics: list[str],
    state_suffix: str = "_value",
) -> DataFrame:
    """Emit snapshot rows with each metric replaced by its delta vs
    the stored cumulative (transformation.py:87-98: new_delta =
    current − stored, stored→0 when absent)."""
    if state is None:
        return snapshot.select(
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                if c in metrics
                else F.col(c)
                for c in snapshot.columns
            ]
        )
    st = state.select(
        *keys, *[F.col(f"{m}{state_suffix}").alias(f"__prev_{m}") for m in metrics]
    )
    joined = snapshot.join(st, on=keys, how="left")
    out_cols = []
    for c in snapshot.columns:
        if c in metrics:
            out_cols.append(
                (
                    F.coalesce(F.col(c), F.lit(0)).cast("long")
                    - F.coalesce(F.col(f"__prev_{c}"), F.lit(0)).cast("long")
                ).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def upsert_state(
    snapshot: DataFrame,
    state: DataFrame | None,
    keys: list[str],
    metrics: list[str],
    state_suffix: str = "_value",
    ts_col: str = "time_stamp",
) -> DataFrame:
    """New state table = current cumulative per snapshot key, keeping
    state rows for keys not in today's snapshot (the reference's
    update_item upsert, transformation.py:100-118)."""
    fresh = snapshot.select(
        *keys,
        *[
            F.coalesce(F.col(m), F.lit(0)).cast("long").alias(f"{m}{state_suffix}")
            for m in metrics
        ],
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias(ts_col),
    )
    if state is None:
        return fresh
    stale = state.join(fresh.select(*keys).distinct(), on=keys, how="left_anti")
    return stale.select(*fresh.columns).unionByName(fresh)


def deltas_over_history(
    history: DataFrame,
    keys: list[str],
    order_col: str,
    metrics: list[str],
) -> DataFrame:
    """Temporal form over an in-lake snapshot history: delta vs the
    previous snapshot per key via a window lag — equivalent to
    running the state-store loop over every day in order."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    out = []
    for c in history.columns:
        if c in metrics:
            cur = F.coalesce(F.col(c), F.lit(0)).cast("long")
            prev = F.coalesce(F.lag(F.coalesce(F.col(c), F.lit(0))).over(w), F.lit(0)).cast("long")
            out.append((cur - prev).alias(c))
        else:
            out.append(F.col(c))
    return history.select(*out)
