"""Trainable quality classifier — the published LM-data recipe
(GPT-3 / LLaMA data curation: a linear classifier over hashed text
features scores documents against a high-quality reference corpus;
fastText is the usual implementation). Spark-first distributed
logistic regression:

* features: hashed unigram counts (md5-prefix buckets — the same
  cross-engine family as sampling.importance_weights), kept in LONG
  form (doc, bucket, count) so the corpus never materializes a dense
  vector;
* training: full-batch gradient descent; each iteration is ONE
  broadcast join (current weights, B rows) + ONE agg shuffle keyed
  on bucket — the only driver state is the B-float weight vector,
  exactly the k-means-centroid pattern (`operators/clustering.py`);
* scoring: one broadcast join + per-doc agg; sigmoid stays in Spark.

100 TB posture: per-iteration cost is a scan + a B-row shuffle;
iterations are fixed (default 30) so the job count is bounded. The
weight vector (n_buckets floats) is the entire driver footprint.

Determinism: given fixed data and iteration count, every step is the
same float arithmetic in the same order (aggregation of per-bucket
gradient sums uses exact scaled-long accumulation, so partial-agg
order cannot perturb the result) — retrains reproduce bit-for-bit.
Sigmoid is transcendental, so there is no cross-engine SQL oracle;
the registry query is rows-only by design (like llm_kmeans_cells).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 10**6


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """(id, bucket, count) long-form hashed unigram features."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("__w"),
        )
        .select(
            id_col,
            (
                F.conv(F.substring(F.md5("__w"), 1, 15), 16, 10).cast("long")
                % F.lit(n_buckets)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _weights_df(spark, weights: list[float]) -> DataFrame:
    return spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], ["bucket", "w"]
    )


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> list[float]:
    """Full-batch logistic regression; returns the weight vector
    (index = bucket; bias folded in as bucket feature via the
    implicit count-normalization — features are L1-normalized per
    doc so long docs don't dominate). ``labeled[label_col]`` is 0/1."""
    spark = labeled.sparkSession
    feats = hashed_features(labeled, text_col, id_col, n_buckets)
    norm = feats.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    x = (
        feats.join(norm, id_col)
        .select(
            id_col,
            "bucket",
            (F.col("cnt") / F.col("__tot")).alias("x"),
        )
        .join(labeled.select(id_col, F.col(label_col).alias("y")), id_col)
    )
    x = x.localCheckpoint(eager=True)  # reused every iteration
    n_docs = labeled.count()
    weights = [0.0] * n_buckets
    for _ in range(iters):
        wdf = F.broadcast(_weights_df(spark, weights))
        # margin per doc, error, then per-bucket gradient — exact
        # scaled-long sums so shuffle order can't perturb training
        margins = (
            x.join(wdf, "bucket")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
            .select(
                id_col,
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))) - F.col("y"))
                .alias("err"),
            )
        )
        grad_rows = (
            x.join(margins, id_col)
            .groupBy("bucket")
            .agg(
                (
                    F.sum(
                        F.round(F.col("x") * F.col("err") * F.lit(_SCALE), 0)
                        .cast("long")
                    ).cast("double")
                    / F.lit(float(_SCALE))
                ).alias("g")
            )
            .collect()
        )
        grad = {r["bucket"]: r["g"] for r in grad_rows}
        weights = [
            w - lr * (grad.get(b, 0.0) / n_docs + l2 * w)
            for b, w in enumerate(weights)
        ]
    return weights


def score_quality(
    df: DataFrame,
    weights: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """(id, quality_score) — sigmoid of the weighted normalized
    feature sum; one broadcast join + one agg, corpus text never
    shuffles (reduced to (id, bucket, count) first)."""
    n_buckets = n_buckets or len(weights)
    spark = df.sparkSession
    feats = hashed_features(df, text_col, id_col, n_buckets)
    norm = feats.groupBy(id_col).agg(F.sum("cnt").alias("__tot"))
    wdf = F.broadcast(_weights_df(spark, weights))
    return (
        feats.join(norm, id_col)
        .join(wdf, "bucket")
        .groupBy(id_col)
        .agg(F.sum((F.col("cnt") / F.col("__tot")) * F.col("w")).alias("z"))
        .select(
            id_col,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias(
                "quality_score"
            ),
        )
    )


def sanity_auc(scored: DataFrame, labels: DataFrame,
               id_col: str = "doc_id", label_col: str = "label") -> float:
    """Rank-based AUC (Mann-Whitney) of quality_score vs labels —
    the training sanity metric; exact, one window pass."""
    from pyspark.sql import Window

    j = scored.join(labels.select(id_col, label_col), id_col)
    # frame bound: the LABELED eval set (a join against hand/heuristic
    # labels) — bounded by annotation budget, never corpus-sized
    # (r05 sweep)
    ranked = j.withColumn(
        "r", F.row_number().over(Window.orderBy("quality_score", id_col))
    )
    agg = ranked.agg(
        F.sum(F.when(F.col(label_col) == 1, F.col("r"))).alias("rsum"),
        F.sum(F.col(label_col)).alias("npos"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    npos, n = agg["npos"], agg["n"]
    nneg = n - npos
    if not npos or not nneg:
        return float("nan")
    return (agg["rsum"] - npos * (npos + 1) / 2) / (npos * nneg)
