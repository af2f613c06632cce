"""Game-theoretic (Shapley) marketing attribution.

First/last-touch attribution (q_attribution_first_last) credits one
touchpoint per conversion; Shapley attribution credits every channel
by its AVERAGE MARGINAL CONTRIBUTION across all orders of exposure —
the canonical fair-division answer (Shapley 1953; the standard
upgrade in marketing-mix analytics).

Spark-first decomposition:

* the corpus collapses to one row per EXPOSURE SET (bitmask of
  channels a user touched): ``(mask, n_users, n_conv)`` — at most
  2^k rows for k channels (k is small by definition: channels are a
  curated taxonomy, never unbounded);
* the coalition enumeration is a LITERAL table generated at plan
  time (k·2^(k-1) rows: for each channel, each subset not containing
  it, with the exact rational Shapley weight s!(k−1−s)!/k! as
  numerator/denominator literals) — broadcast-joined twice against
  the bounded v-table;
* v(S) = observed conversion rate of users exposed to EXACTLY S
  (unobserved subsets contribute v = 0 — the standard empirical
  convention, documented at the query);
* φ_i folds in PINNED subset order (cumulative window over the
  literal table) so IEEE addition order matches the SQL twin.
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coalition_table(channels: list[str]) -> list[tuple]:
    """Literal coalition rows: (channel, mask_without, mask_with,
    weight_num, weight_den) for every channel × subset-not-containing-
    it. Weights are the exact Shapley rationals s!(k−1−s)!/k!."""
    k = len(channels)
    rows = []
    for i, ch in enumerate(channels):
        for mask in range(1 << k):
            if mask & (1 << i):
                continue
            s = bin(mask).count("1")
            rows.append(
                (
                    ch,
                    mask,
                    mask | (1 << i),
                    factorial(s) * factorial(k - 1 - s),
                    factorial(k),
                )
            )
    return rows


def channel_bit(channel_col: Column, channels: list[str]) -> Column:
    """Bit value for a channel name (literal CASE; unknown → 0)."""
    expr = F.lit(0)
    for i, ch in enumerate(channels):
        expr = F.when(channel_col == ch, F.lit(1 << i)).otherwise(expr)
    return expr


def shapley_attribution(
    exposures: DataFrame,
    user_col: str,
    channel_col: str,
    converted_col: str,
    channels: list[str],
) -> DataFrame:
    """Shapley credit per channel: ``(channel, phi)`` from a
    (user, channel, converted) exposure table (one row per user ×
    touched channel; ``converted`` constant per user).

    EXACTNESS: the per-mask (n_users, n_conv) counts are exact; each
    v(S) is ONE correctly-rounded divide; φ folds the weighted
    marginal contributions in pinned mask order (cumulative window
    over the literal coalition table) — bit-identical cross-engine.

    SCALE: one distinct + one bit-OR aggregate per user, one count
    aggregate to ≤ 2^k mask rows; everything downstream is literal-
    table-sized. The only corpus-width shuffles are keyed on user.
    """
    from pyspark.sql import Window

    spark = exposures.sparkSession
    per_user = (
        exposures.select(
            F.col(user_col).alias("__u"),
            channel_bit(F.col(channel_col), channels).alias("__bit"),
            F.col(converted_col).cast("int").alias("__conv"),
        )
        .groupBy("__u")
        .agg(
            F.bit_or("__bit").alias("__mask"),
            F.max("__conv").alias("__c"),
        )
    )
    v = per_user.groupBy("__mask").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__c").alias("__nc"),
    )
    coal = spark.createDataFrame(
        coalition_table(channels),
        "channel string, m0 long, m1 long, wn long, wd long",
    )
    j = (
        coal.join(
            v.select(
                F.col("__mask").alias("m0"),
                (F.col("__nc").cast("double") / F.col("__n").cast("double"))
                .alias("__v0"),
            ),
            "m0",
            "left",
        )
        .join(
            v.select(
                F.col("__mask").alias("m1"),
                (F.col("__nc").cast("double") / F.col("__n").cast("double"))
                .alias("__v1"),
            ),
            "m1",
            "left",
        )
        .select(
            "channel",
            "m0",
            (
                (F.col("wn").cast("double") / F.col("wd").cast("double"))
                * (
                    F.coalesce(F.col("__v1"), F.lit(0.0))
                    - F.coalesce(F.col("__v0"), F.lit(0.0))
                )
            ).alias("__term"),
        )
    )
    w = Window.partitionBy("channel").orderBy("m0")
    folded = j.select(
        "channel",
        F.sum("__term")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__phi"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1))
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__k"),
    ).where(F.col("__rn") == F.col("__k"))
    return folded.select("channel", F.col("__phi").alias("phi"))
