"""Graph centrality on edge tables: deterministic fixed-point
PageRank.

PageRank is usually float-iterated, which makes results depend on
partial-aggregation order — fine for ranking, useless for exact
cross-engine verification. This implementation runs the power
iteration entirely in SCALED INTEGER arithmetic (rank values are
int64 at a fixed scale; damping is a rational (85, 100); every
division is integral truncation), so partial sums are
order-independent and a SQL engine computes bit-identical ranks —
the iteration is exactly oracle-checkable, unlike the usual
float-Pregel formulation.

Semantics (per iteration, damping d = num/den):

    rank'(v) = base + Σ_{u→v} (rank(u) · num) div (den · outdeg(u))
    base     = (den − num) · scale div (den · N)

Dangling nodes (no out-edges) leak their mass — the standard
simplification; redistributing it adds one broadcast scalar per
iteration if needed.

SCALE (100 TB): each iteration is one shuffle join of the edge
table with the N-row rank frame on the source key plus one hash
aggregate on the destination key — the Pregel pattern as plain
DataFrame ops, partition-parallel, bounded state. Lineage is cut
per iteration (`_truncate`: reliable checkpoint when a checkpoint
dir is configured, eager localCheckpoint in local mode) so plan
depth stays constant across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    scale: int = 10**12,
    damping: tuple[int, int] = (85, 100),
) -> DataFrame:
    """Ranks after ``iterations`` exact integer power steps:
    ``(node, rank_scaled)`` with Σ rank_scaled ≤ scale (truncation
    and dangling loss only ever shrink mass). Distinct edges are
    assumed (dedupe upstream if parallel edges shouldn't double-
    count)."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must satisfy 0 < num < den, got {damping}")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = _truncate(
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    outdeg = _truncate(
        e.groupBy(F.col("__src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
    )
    n_nodes = nodes.count()
    init = scale // n_nodes
    base = (den - num) * scale // (den * n_nodes)
    rank = nodes.select("node", F.lit(init).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(rank.withColumnRenamed("node", "__src"), "__src")
            .join(outdeg.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr(f"(rank * {num}) div ({den}L * outdeg)").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        rank = _truncate(
            nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base).cast("long")
                 + F.coalesce(F.col("__in"), F.lit(0).cast("long"))
                 ).alias("rank"),
            )
        )
    return rank.select("node", F.col("rank").alias("rank_scaled"))
