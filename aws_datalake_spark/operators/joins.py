"""Temporal join operators Spark lacks as built-ins: as-of join and
bucketed range join.

The reference has no general join surface (SURVEY.md §2.3 — its joins
are keyed lookups, `/root/reference/transformation.py:85-98`, and
merge predicates, `/root/reference/loading.py:32-35`); these operators
supply the time-series capabilities a lake engine needs, composed
from shuffles Spark already does well.

100 TB design notes:
* asof_join is ONE hash shuffle of each side on the `by` key plus a
  per-key sort — the same cost as a sort-merge join. No point-lookup
  loop, no broadcast of the big side, no range explosion.
* bucketed_range_join converts an inequality join (which Spark would
  execute as BroadcastNestedLoop — quadratic) into an equi-join on a
  time bucket plus an exact residual filter. Interval sides explode
  into ceil(span/width) bucket rows; pick `bucket_width` near the
  typical interval span so the blow-up stays O(1) per interval.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the right row
    with the greatest ``on`` value <= the left row's (inclusive),
    within the same ``by`` group; NULLs when no prior right row.

    Union-and-carry-forward formulation: tag rows, sort each ``by``
    group by (ts, right-before-left-on-ties), and `last(ignorenulls)`
    carries the most recent right payload onto each left row. Ties
    among right rows at the same ts resolve to the max payload tuple
    (column order), deterministically.
    """
    by = list(by)
    rpay = [c for c in right.columns if c not in by]
    l2 = left.withColumn("__r", F.lit(0)).withColumn("__t", F.col(on))
    # Payload travels as ONE struct so the carried values always come
    # from the same right row — per-column last(ignorenulls) could
    # otherwise mix rows when a payload field is legitimately NULL.
    r2 = right.select(
        *by,
        F.struct(*rpay).alias("__pay"),
        F.lit(1).alias("__r"),
        F.col(on).alias("__t"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy("__t", F.desc("__r"), "__pay")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        "__r",
        F.last("__pay", ignorenulls=True).over(w).alias("__pay"),
    )
    return filled.filter(F.col("__r") == 0).select(
        *left.columns,
        *[F.col(f"__pay.{c}").alias(c + right_suffix) for c in rpay],
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Join points to intervals with ``start <= ts <= end`` (plus
    optional ``by`` equi-keys) WITHOUT a nested-loop join: both sides
    map to epoch-time buckets of ``bucket_width_s`` seconds (an
    interval explodes into every bucket it overlaps), equi-join on
    (by..., bucket), then apply the exact range predicate.

    The physical plan is a plain shuffled hash join on the bucket key
    — linear in input + overlap size at any scale.
    """
    by = list(by)
    pb = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_width_s)
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_width_s),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_width_s),
            )
        ),
    )
    joined = pb.join(ib, on=by + ["__bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bucket")


def cogroup_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = ("user_id",),
    right_suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join via ``cogroup().applyInPandas`` — the
    Python-side twin of :func:`asof_join` (same semantics, verified
    equal in tests) and the template for per-key logic that outgrows
    SQL: both inputs arrive per ``by``-group as pandas frames in one
    Arrow batch, ``pandas.merge_asof`` does the backward scan.

    Prefer :func:`asof_join` (JVM, codegen) when the union-window
    form can express the logic; use THIS shape when the per-group
    computation needs real Python (model scoring, scipy, custom
    matching). Scale: one shuffle per side on ``by``; each task sees
    whole groups — skewed groups are the limit, exactly as with any
    grouped-map op.
    """
    import pandas as pd

    by = list(by)
    rpay = [c for c in right.columns if c not in by]
    out_fields = (
        [left.schema[c] for c in left.columns]
        + [
            (lambda f, n: type(f)(n, f.dataType, True))(right.schema[c], c + right_suffix)
            for c in rpay
        ]
    )
    from pyspark.sql.types import StructType

    out_schema = StructType(out_fields)
    lcols = list(left.columns)

    def merge(key, ldf: "pd.DataFrame", rdf: "pd.DataFrame") -> "pd.DataFrame":
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        ldf = ldf.sort_values(on, kind="mergesort")
        rdf = rdf.sort_values(on, kind="mergesort")
        # ties at equal ts resolve to the max payload tuple, matching
        # asof_join — merge_asof takes the LAST right row at each ts,
        # so pre-sort right by (ts, payload)
        rdf = rdf.sort_values([on] + rpay, kind="mergesort")
        # payload keeps its own copy of every right column (incl. the
        # ts, as <col><suffix>) next to the bare join key
        rsel = rdf[[on]].copy()
        for c in rpay:
            rsel[c + right_suffix] = rdf[c].values
        merged = pd.merge_asof(
            ldf,
            rsel,
            left_on=on,
            right_on=on,
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[[f.name for f in out_fields]]

    return (
        left.groupBy(*by)
        .cogroup(right.groupBy(*by))
        .applyInPandas(merge, out_schema)
        .select(*lcols, *[c + right_suffix for c in rpay])
    )


def bucketed_interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: Sequence[str] = (),
    bucket_width_s: int = 3600,
) -> DataFrame:
    """Join two INTERVAL tables on overlap (``l_start <= r_end AND
    r_start <= l_end``, plus optional ``by`` equi-keys) without a
    nested loop AND without a dedup pass: both sides explode into the
    epoch buckets they cover, equi-join on (by..., bucket), and a
    pair is kept only in the FIRST bucket both intervals share —
    ``bucket == max(floor(l_start/w), floor(r_start/w))`` — so each
    overlapping pair survives in exactly one bucket and no distinct()
    over wide payloads is ever needed.

    The plan is a plain shuffled hash join on the bucket key; work is
    linear in Σ interval-length/bucket_width + matches. Pick
    ``bucket_width_s`` near the typical interval length: too small
    explodes rows, too big piles unrelated intervals into one bucket.
    """
    by = list(by)

    def buckets(start: str, end: str):
        return F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bucket_width_s),
                F.floor(F.unix_timestamp(F.col(end)) / bucket_width_s),
            )
        )

    lb = left.withColumn("__bucket", buckets(l_start, l_end))
    rb = right.withColumn("__bucket", buckets(r_start, r_end))
    first_shared = F.greatest(
        F.floor(F.unix_timestamp(F.col(l_start)) / bucket_width_s),
        F.floor(F.unix_timestamp(F.col(r_start)) / bucket_width_s),
    )
    return (
        lb.join(rb, on=by + ["__bucket"])
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bucket") == first_shared)
        )
        .drop("__bucket")
    )
