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


# --- exact-integer variant (hash-checkable against a chained-CTE oracle) ----

def quantize_vectors_int(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """(id, array<long>) with components ``floor(x * scale)`` — the
    shared quantization step of the exact-integer k-means / PQ paths.
    floor of an identical IEEE product is identical in every engine
    (ROUND is not: Spark half-up on decimal text vs DuckDB on binary
    doubles diverge on ties), so every downstream distance is an
    exact integer both engines agree on."""
    return df.select(
        id_col,
        F.transform(
            vec_col, lambda x: F.floor(x.cast("double") * F.lit(float(scale)))
        ).alias(vec_col),
    )


def _d2_to_literal(vec_col: str, centroid: list[int]) -> "F.Column":
    """Exact squared euclidean distance of an array<long> column to a
    literal integer centroid, as a single JVM fold (no shuffle)."""
    lit = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def _argmin_cell(vec_col: str, centroids: list[list[int]]) -> "F.Column":
    """centroid_id of the nearest literal centroid (squared euclidean,
    lowest-id tiebreak) as a pure projection: least() over k
    (distance, id) structs — zero shuffle for the assignment pass,
    the update aggregate is the iteration's only exchange."""
    structs = [
        F.struct(
            _d2_to_literal(vec_col, c).alias("d2"),
            F.lit(i).cast("long").alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    picked = structs[0] if len(structs) == 1 else F.least(*structs)
    return picked.getField("cid")


def kmeans_fit_exact(
    vectors: DataFrame,
    k: int,
    max_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]]:
    """Lloyd's over integer-quantized vectors with EXACT arithmetic
    end-to-end: init = the k lowest-id vectors, assignment = argmin of
    squared euclidean distance (exact int64), update = per-component
    ``Σx DIV n`` (truncating integer division — Spark's DIV and
    DuckDB's // share trunc-toward-zero semantics, so a chained-CTE
    oracle reproduces every centroid bit-for-bit). Empty cells keep
    their previous centroid. ``vectors`` must already be
    :func:`quantize_vectors_int` output.

    SCALE: same shape as :func:`kmeans_fit` — assignment is a pure
    projection (k literal-centroid folds, no shuffle), the update is
    ONE (cell, position) aggregate per iteration shuffling narrow
    (cid, pos, x) triples with map-side combine; only k×dim exact
    sums reach the driver. Component sums accumulate in
    DECIMAL(38,0), so no corpus size overflows them."""
    init = (
        vectors.orderBy(id_col)
        .limit(k)
        .select(F.col(vec_col).alias("v"))
        .collect()
    )
    centroids = [[int(x) for x in r.v] for r in init]
    for _ in range(max_iter):
        assigned = vectors.select(
            _argmin_cell(vec_col, centroids).alias("__cid"), F.col(vec_col)
        )
        stats = (
            assigned.select("__cid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("__cid", "pos")
            .agg(
                F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty cells keep position
        by_cell: dict[int, list[tuple[int, int]]] = {}
        for r in stats:
            s, n = int(r.s), int(r.n)
            # trunc-toward-zero division (Python // floors on negatives)
            q = abs(s) // n
            # bracket access: Row.__getattr__ rejects dunder-prefixed names
            by_cell.setdefault(int(r["__cid"]), []).append(
                (r.pos, q if s >= 0 else -q)
            )
        for cell, comps in by_cell.items():
            vec = list(new[cell])
            for pos, val in comps:
                vec[pos] = val
            new[cell] = vec
        centroids = new
    return centroids


def kmeans_assign_exact(
    vectors: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id) for exact integer centroids — one shuffle-free
    projection over the corpus."""
    return vectors.select(
        id_col, _argmin_cell(vec_col, centroids).alias("centroid_id")
    )
