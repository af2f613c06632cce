"""Distributed k-means (Lloyd's) over embedding columns — the
iterative-algorithm class the driver contract calls out as
non-SQL-expressible, and the production source of IVF centroids
(operators/similarity.py:ann_ivf_topk).

100 TB design notes:
* The data never collects: each iteration is one broadcast-join
  assignment pass + one (cell, position) aggregation. Only the k×dim
  centroid matrix crosses to the driver (a few KB), matching how
  MLlib's k-means and FAISS IVF training are structured.
* Deterministic: init = the k lowest-id vectors, fixed iteration
  count, decimal-exact component sums — rerunning yields identical
  centroids, so downstream cell assignments are reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_datalake_spark.operators.similarity import assign_cells


def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(centroids)],
        "centroid_id long, cvec array<double>",
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Fit k centroids; returns them as plain lists (broadcast-sized).

    Assignment reuses assign_cells (cosine, broadcast centroids);
    the update step computes element-wise means via posexplode →
    (cell, pos) aggregation — a single shuffle of (cell, pos, value)
    triples per iteration, never of whole vectors."""
    spark = vectors.sparkSession
    init = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init]
    for _ in range(max_iter):
        cdf = _centroid_df(spark, centroids)
        assigned = assign_cells(vectors, cdf, 1, id_col, vec_col)
        stats = (
            assigned.select("centroid_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(30,12)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cells keep position
        by_cell: dict[int, list[tuple[int, float]]] = {}
        for r in stats:
            by_cell.setdefault(r.centroid_id, []).append(
                (r.pos, float(r.s) / r.n)
            )
        for cell, comps in by_cell.items():
            vec = [0.0] * len(comps)
            for pos, val in comps:
                vec[pos] = val
            new[cell] = vec
        centroids = new
    return centroids


def kmeans_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) assignment for fitted centroids — the table you
    would persist `partitionBy(centroid_id)` for IVF probes."""
    cdf = _centroid_df(vectors.sparkSession, centroids)
    return assign_cells(vectors, cdf, 1, id_col, vec_col).select(
        id_col, "centroid_id"
    )
