"""Round-6-session additions (certify in the round-6/7 windows):
mass-conserving PageRank (dangling redistribution), plus the other
operators added this round.

All new surface beyond SURVEY.md §2 (the reference has none of
these); each pairs a scalable Spark plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

# ---------------------------------------------------------------------------
# mass-conserving PageRank (dangling redistribution)
# ---------------------------------------------------------------------------

_PR_ITERS, _PR_SCALE = 5, 10**12


def _pagerank_conserving_oracle() -> str:
    """Chained-CTE twin of the integer power iteration WITH the
    per-step dangling-mass redistribution term."""
    steps = []
    for i in range(_PR_ITERS):
        prev = "it0" if i == 0 else f"it{i}"
        steps.append(f"""
    dm{i} AS (
      SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS m
      FROM {prev} r LEFT JOIN outdeg o ON o.node = r.node
      WHERE o.node IS NULL
    ),
    it{i + 1} AS (
      SELECT n.node,
             (SELECT base FROM params)
               + ((SELECT m FROM dm{i}) * 85)
                 // (100 * (SELECT cnt FROM params))
               + COALESCE(CAST(SUM((r.rank * 85) // (100 * o.outdeg))
                               AS BIGINT), 0) AS rank
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.node
      LEFT JOIN {prev} r ON r.node = e.src
      LEFT JOIN outdeg o ON o.node = e.src
      GROUP BY n.node
    )""")
    return f"""
    WITH raw AS (
      SELECT DISTINCT 'S' || CAST(l.l_suppkey AS VARCHAR) AS src,
             'C' || CAST(o.o_custkey AS VARCHAR) AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM raw),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges
        UNION ALL SELECT dst AS node FROM edges)
    ),
    outdeg AS (
      SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS outdeg
      FROM edges GROUP BY 1
    ),
    params AS (
      SELECT (15 * {_PR_SCALE}) // (100 * COUNT(*)) AS base,
             {_PR_SCALE} // COUNT(*) AS init,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM nodes
    ),
    it0 AS (
      SELECT node, CAST((SELECT init FROM params) AS BIGINT) AS rank
      FROM nodes
    ),{",".join(steps)}
    SELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM it{_PR_ITERS}
    """


@query("q_graph_pagerank_conserving", oracle=_pagerank_conserving_oracle())
def q_graph_pagerank_conserving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-CONSERVING exact fixed-point PageRank (operators/
    graph.py:pagerank_fixed_point, redistribute_dangling=True) over
    the supplier→customer fulfillment graph. Customers have no
    out-edges, so EVERY C-node is dangling — the variant that leaks
    dangling mass (q_graph_pagerank) loses most of the rank mass on
    this graph, while this one redistributes it each step: one
    bounded dangling-mass aggregate (the dangling SET is precomputed
    once) + one broadcast-scalar crossJoin per iteration, still
    entirely in scaled-integer arithmetic, so the result
    hash-matches a 5-level chained-CTE oracle exactly and
    Σ rank_scaled stays ≈ scale (VERDICT r05 item 6; conservation is
    asserted in tests/test_round7_ops.py)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return pagerank_fixed_point(
        edges,
        iterations=_PR_ITERS,
        scale=_PR_SCALE,
        redistribute_dangling=True,
    ).select("node", "rank_scaled")
