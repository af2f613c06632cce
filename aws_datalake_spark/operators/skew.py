"""Skew-handling operators (100 TB posture).

At scale a handful of hot keys (boilerplate documents, null-ish
defaults, one giant customer) dominate a shuffle partition and stall
the stage. Three mitigations, in preference order:

1. AQE skew-join splitting — free, on by default in session.py; it
   splits oversized partitions of sort-merge joins at runtime.
2. Two-phase (salted) aggregation — for aggregations AQE can't fix,
   e.g. exact distinct counts where one key holds most values.
3. Replicated (salted) broadcast-free join — when BOTH sides are too
   big to broadcast and one has hot keys: salt the big side, explode
   the small side across the salt range; the hot key spreads over
   ``salt_factor`` partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_safe_distinct_count(
    df: DataFrame, keys: Sequence[str], value_col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key without a hot partition:
    shuffle 1 deduplicates on (keys..., value) — the hot key's values
    spread over the whole cluster because value is in the hash — and
    shuffle 2 counts the (now unique, much smaller) pairs per key.

    Spark's own planner rewrites COUNT(DISTINCT) to a similar expand
    + two-shuffle plan; this form keeps it explicit and composable
    with additional per-key aggregates."""
    keys = list(keys)
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out))
    )


def salted_agg_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    salt_from: str | Column,
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase sum: partial per (keys..., salt) — spreading each hot
    key over ``salt_factor`` reducers — then final per keys. Exact for
    algebraic aggregates (sum/count/min/max).

    ``salt_from`` must be a deterministic per-row expression (an id
    column), NOT rand(): deterministic salting keeps retried tasks
    and the DuckDB oracle bit-identical."""
    keys = list(keys)
    salt = F.pmod(F.hash(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
                  F.lit(salt_factor))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return partial.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in sum_cols])


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: Sequence[str],
    salt_from: str | Column,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot join keys and ``skewed_small``
    is too big to broadcast: big rows get a deterministic salt in
    [0, salt_factor); the small side is replicated once per salt
    value (explode of a literal range — rows × salt_factor). The
    shuffle key becomes (on..., salt), so a hot key occupies
    ``salt_factor`` partitions instead of one."""
    on = list(on)
    salt = F.pmod(F.hash(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
                  F.lit(salt_factor))
    b = big.withColumn("__salt", salt)
    s = skewed_small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return b.join(s, on + ["__salt"], how).drop("__salt")
