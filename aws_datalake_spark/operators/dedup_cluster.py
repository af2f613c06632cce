"""Dedup-cluster resolution: connected components over near-dup pairs.

Pair emitters (``minhash_lsh_pairs``, ``simhash_neardup_pairs``,
``ngram_jaccard_pairs``, ``cosine_neardup_pairs``) find EDGES; an
actual dedup pass must then group transitively-linked docs into one
cluster and keep a single representative (A~B, B~C => drop two of
{A,B,C} even though A~C was never emitted). The reference repo has
no equivalent (its dedup surface is row-level ``drop_duplicates``,
`/root/reference/transformation.py:304-311`); this is the scale
path that replaces it for fuzzy dedup.

Algorithm: iterative min-label propagation over the symmetrized
edge list. Each round is one shuffle join (edges x labels) plus one
min-aggregation; labels only ever decrease, so the exact long SUM of
all labels is a convergence certificate (unchanged sum <=> fixed
point) costing one cheap aggregation instead of a change-count
join. Rounds needed = graph diameter. Near-dup clusters from
banding are dense (cliques plus short chains), so diameter is
small and bounded rounds beat the asymptotically-better
large-star/small-star alternation in practice at 100 TB; lineage is
truncated every round so plan depth stays O(1) regardless of
iteration count. Truncation uses reliable ``checkpoint`` whenever a
checkpoint dir is configured (``spark.sparkContext.setCheckpointDir``
— executor-loss-safe, the right mode on a multi-tenant cluster) and
falls back to eager ``localCheckpoint`` otherwise (fine on
local[*], where "losing an executor" means losing the JVM).

Determinism: min-label over long ids is order-free, so results
hash-match a recursive-CTE oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame) -> DataFrame:
    """Cut lineage: reliable checkpoint when a checkpoint dir is set,
    eager localCheckpoint otherwise (see module docstring)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def symmetric_edges(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Undirected edge list (both directions, distinct) from a pair
    table; self-loops dropped."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev).where(F.col("src") != F.col("dst")).distinct()


def connected_components(
    pairs: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``; cluster_id is
    the component's minimum node id. Converges in diameter rounds;
    raises if ``max_iter`` rounds do not reach the fixed point
    (protects against silent wrong answers on adversarial graphs)."""
    edges = _truncate(symmetric_edges(pairs, a, b))
    # Seed labels with the 1-hop neighborhood minimum — one agg over
    # the (already symmetric) edge list, NO join. LSH-band components
    # are cliques plus short chains, so most components converge one
    # full join round earlier than with identity initialization.
    labels = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.first("src"), F.min("dst")).alias("label"))
    )
    labels = _truncate(labels)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iter):
        # neighbor's current label flows across each edge; keep the min
        # of own and incoming labels.  Map-side partial min keeps the
        # shuffle at one row per (node, distinct candidate label).
        incoming = (
            edges.join(labels, edges["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
        )
        labels = (
            labels.unionByName(incoming)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        labels = _truncate(labels)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")


def dedup_representatives(
    corpus: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus rows that survive fuzzy dedup: every doc not in any
    cluster, plus each cluster's min-id representative.  Anti-join on
    the (small) non-representative set, which broadcasts: the corpus
    — the 100 TB side — is never shuffled."""
    drop = components.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(F.broadcast(drop), on=id_col, how="left_anti")


def quality_representatives(
    scored: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Quality-aware cluster representatives: for every near-dup
    cluster, the member with the HIGHEST quality score (tie → lowest
    id) — the curation-grade upgrade over min-id keeping, which
    throws away the best-written copy whenever it isn't the oldest.
    Returns ``(cluster_id, rep_id, rep_score, n_members)``.

    SCALE: ``components`` is already the pairs-derived frame (LSH-
    bounded, far smaller than the corpus); the scored corpus joins it
    once on id, then ONE window over the members frame picks argmax
    per cluster. Corpus text never moves — only (id, score) pairs
    reach the window.
    """
    from pyspark.sql.window import Window

    members = components.select(
        F.col("node").alias(id_col), "cluster_id"
    ).join(scored.select(id_col, score_col), id_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        members.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .where(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("rep_id"),
            F.col(score_col).alias("rep_score"),
            "n_members",
        )
    )
