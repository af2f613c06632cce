"""Frequent-itemset / association-rule mining on (context, item)
tables — the market-basket readout (support, confidence, lift) as
plain DataFrame ops.

Full Apriori/FP-growth enumerate itemsets of arbitrary size; at lake
scale the overwhelmingly useful slice is PAIRS (cross-sell matrices,
co-view graphs, feature co-occurrence), which needs no candidate
generation at all: one distinct, one bounded self-join per context,
two aggregates. That is what this module implements — the level-2
Apriori pass, exactly.

SCALE (100 TB): the per-context self-join fans out as C(m, 2) for a
context with m distinct items — bounded whenever context membership
is bounded (orders hold ~4-7 items at any TPC-H scale; cap upstream
for heavy contexts). Pair counts shuffle on the (item_a, item_b)
key; per-item counts are a tiny frame broadcast onto the pairs. All
rule metrics are quotients of exact integer counts evaluated in a
FIXED IEEE order, so results hash-match a SQL oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_pairs(
    df: DataFrame,
    context_col: str,
    item_col: str,
    min_pair_support: int = 2,
) -> DataFrame:
    """Association rules for every unordered item pair co-occurring
    in >= ``min_pair_support`` contexts:
    ``(item_a, item_b, n_ab, n_a, n_b, support, conf_a_b, conf_b_a,
    lift)`` with ``item_a < item_b`` canonical.

    support  = n_ab / N              (N = distinct contexts)
    conf_a_b = n_ab / n_a            (P(b | a))
    lift     = n_ab·N / (n_a·n_b)    (>1 ⇒ positive association)

    All three are ROUND(·, 6) doubles derived from exact long counts
    in a fixed operation order (cast each count, multiply/divide
    left-to-right) — the oracle mirrors the tree, so values are
    bit-identical cross-engine.

    SCALE: m = distinct (context, item) memberships shuffle once on
    the context key for the pair join; pair counts aggregate
    map-side; the item-count frame (|items| rows) and the one-row N
    frame broadcast — no second corpus shuffle.
    """
    # m feeds N, the item counts, and both pair-join sides — but it is
    # corpus-membership-scale, so a checkpoint would write ~the fact
    # table (ADVICE-r06 novelty lesson). The four consumers share the
    # identical distinct subplan, so AQE exchange reuse executes the
    # scan+join+distinct once; bounded DOWNSTREAM frames are what get
    # cut in this codebase, not corpus-scale ones.
    m = df.select(
        F.col(context_col).alias("__ctx"), F.col(item_col).alias("__item")
    ).distinct()
    n_total = m.select(
        F.count_distinct(F.col("__ctx")).alias("__n")
    )
    item_counts = m.groupBy(F.col("__item")).agg(
        F.count(F.lit(1)).alias("__ni")
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__ctx") == F.col("b.__ctx"))
            & (F.col("a.__item") < F.col("b.__item")),
        )
        .groupBy(
            F.col("a.__item").alias("item_a"),
            F.col("b.__item").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_support)
    )
    ia = item_counts.select(
        F.col("__item").alias("item_a"), F.col("__ni").alias("n_a")
    )
    ib = item_counts.select(
        F.col("__item").alias("item_b"), F.col("__ni").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_total))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        F.round(d("n_ab") / d("__n"), 6).alias("support"),
        F.round(d("n_ab") / d("n_a"), 6).alias("conf_a_b"),
        F.round(d("n_ab") / d("n_b"), 6).alias("conf_b_a"),
        F.round(d("n_ab") * d("__n") / d("n_a") / d("n_b"), 6).alias("lift"),
    )
