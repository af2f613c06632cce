"""Distributed 2-D skyline (Pareto frontier).

A point survives when no other point is >= in BOTH dimensions and
> in at least one (maximize/maximize convention; flip a sign
upstream to minimize). The naive formulation is a quadratic
NOT-EXISTS self-join; this operator decomposes it so nothing
all-pairs ever runs:

1. bucket points by x-range (B buckets from the global min/max);
2. a suffix-max of per-bucket max-y kills any point dominated from a
   strictly higher bucket (those dominators have x' > x by bucket
   construction, so y' >= y suffices) — one B-row broadcast table;
3. inside a bucket, two partitioned windows finish the dominance
   test exactly: max y over strictly-larger x (ascending RANGE frame
   [1, +inf)), and max y among equal x.

Every window partitions by bucket (bounded rows per partition at any
scale, pick B ~ sqrt(n)); the only global structure is the B-row
suffix table. Exact — ties and duplicates follow the standard
definition (equal points are mutually non-dominating and both
survive). The reference has no skyline surface; this is
engine-extension analytics (Börzsönyi et al., ICDE 2001 semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x: Column,
    y: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` on the maximize-(x, y) Pareto frontier. ``x``
    must be integral (bucket arithmetic is exact); ``y`` any ordered
    type. Adds nothing to the schema — returns surviving input rows.
    """
    base = df.withColumn("__x", x.cast("long")).withColumn("__y", y)
    lo, hi = base.agg(F.min("__x"), F.max("__x")).collect()[0]
    if lo is None:
        return df.limit(0)
    width = max(1, (int(hi) - int(lo)) // n_buckets + 1)
    b = base.withColumn("__b", ((F.col("__x") - int(lo)) / width).cast("long"))
    # suffix max of per-bucket max y over STRICTLY higher buckets
    per_bucket = b.groupBy("__b").agg(F.max("__y").alias("__by"))
    # frame bound: n_buckets rows (the per-bucket maxima), a
    # constructor constant — never the input table (r05 sweep)
    w_suffix = (
        Window.orderBy("__b").rowsBetween(1, Window.unboundedFollowing)
    )
    suffix = per_bucket.select(
        "__b", F.max("__by").over(w_suffix).alias("__higher_max")
    )
    w_larger_x = (
        Window.partitionBy("__b")
        .orderBy("__x")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    w_same_x = Window.partitionBy("__b", "__x")
    marked = (
        b.join(F.broadcast(suffix), "__b")
        .withColumn("__in_bucket_max", F.max("__y").over(w_larger_x))
        .withColumn("__same_x_max", F.max("__y").over(w_same_x))
    )
    dominated = (
        (F.col("__higher_max").isNotNull() & (F.col("__higher_max") >= F.col("__y")))
        | (
            F.col("__in_bucket_max").isNotNull()
            & (F.col("__in_bucket_max") >= F.col("__y"))
        )
        | (F.col("__same_x_max") > F.col("__y"))
    )
    return marked.where(~dominated).select(*df.columns)
