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
    literal integer centroid, as a single JVM fold (no shuffle).

    MEASURED anti-case (r11): unrolling this to flat element_at
    arithmetic (k·dim ≈ 512 expression nodes inside a least() of k
    structs) made llm_cluster_db_index 4.4x SLOWER same-session
    (5.7 → 25.1 s): every Lloyd iteration plans a FRESH query (new
    centroid literals), so the giant trees pay catalyst
    canonicalization + codegen compilation per iteration per run,
    and at bench scale planning dominates the per-row fold cost the
    unroll was meant to remove. The fold keeps the tree one literal
    array + one aggregate node per centroid."""
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
    dim = len(centroids[0])
    for _ in range(max_iter):
        assigned = vectors.select(
            _argmin_cell(vec_col, centroids).alias("__cid"), F.col(vec_col)
        )
        if dim <= 256:
            # per-component sums as dim aggregate COLUMNS in one pass —
            # the posexplode form materialized dim× the row count
            # through a Generate before the same aggregate (same exact
            # DECIMAL(38,0) sums, so centroids are bit-identical).
            # Bounded: one aggregate row per cell is k×dim decimals —
            # fine to 256 dims; beyond that the wide row + codegen'd
            # update projection degrade, so fall back to the narrow
            # (cid, pos, x) triple aggregate below.
            stats = (
                assigned.groupBy("__cid")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    *[
                        F.sum(
                            F.element_at(F.col(vec_col), p + 1).cast(
                                "decimal(38,0)"
                            )
                        ).alias(f"s{p}")
                        for p in range(dim)
                    ],
                )
                .collect()
            )
            comp = {
                (int(r["__cid"]), pos): (int(r[f"s{pos}"]), int(r.n))
                for r in stats
                for pos in range(dim)
            }
        else:
            stats = (
                assigned.select(
                    "__cid", F.posexplode(vec_col).alias("pos", "x")
                )
                .groupBy("__cid", "pos")
                .agg(
                    F.sum(F.col("x").cast("decimal(38,0)")).alias("s"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            comp = {
                (int(r["__cid"]), int(r.pos)): (int(r.s), int(r.n))
                for r in stats
            }
        new = [list(c) for c in centroids]  # empty cells keep position
        for (cid, pos), (s, n) in comp.items():
            # trunc-toward-zero division (Python // floors on
            # negatives)
            q = abs(s) // n
            new[cid][pos] = q if s >= 0 else -q
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


def davies_bouldin_exact(
    vectors: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 10**6,
) -> DataFrame:
    """Davies–Bouldin cluster-quality index over an exact-integer
    k-means fit (squared-distance variant): per cluster
    ``(cid, n, s_mean, r_max, db_index)`` where S_i is the mean
    SQUARED distance of members to their centroid (the sqrt-free
    scatter — exact rational), M_ij the squared centroid distance
    (exact int), R_i = max_{j≠i} (S_i+S_j)/M_ij, and the index the
    mean of the R_i. Lower = tighter, better-separated clusters —
    the eval harness that says whether llm_kmeans_cells' k fits.

    DETERMINISM: member scatter sums accumulate in DECIMAL(38,0)
    (the assignment's argmin distance IS least() of the k literal
    folds — no recompute drift); pair ratios are mirrored IEEE
    divides; the final mean folds the k R_i in a PINNED order
    (cumulative window by cid — the kruskal_wallis device).
    ``s_mean`` is reported in natural units (÷ scale², the
    representability discipline). Duplicate centroids (M = 0) are
    excluded from R like every standard implementation.

    SCALE: assignment + scatter is ONE shuffle-free projection and
    one k-row aggregate over the corpus; everything after is k²-row
    arithmetic on literal frames.
    """
    # ONE least() over the k (d2, cid) structs yields both the
    # assignment and its distance — evaluating _argmin_cell and a
    # separate least(d2s) paid the k distance folds twice per row.
    # Two-stage projection: the struct is a bound attribute referenced
    # twice, which stops CollapseProject from re-inlining the folds.
    structs = [
        F.struct(
            _d2_to_literal(vec_col, c).alias("d2"),
            F.lit(i).cast("long").alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    picked = structs[0] if len(structs) == 1 else F.least(*structs)
    per = vectors.select(picked.alias("__p")).select(
        F.col("__p.cid").alias("cid"), F.col("__p.d2").alias("__d2")
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # the scatter frame feeds si, sj, and the output join — without a
    # cut the corpus-wide scatter pass re-executes three times
    s = _truncate(
        per.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("__d2").cast("decimal(38,0)")).alias("__sd"),
        )
    )
    spark = vectors.sparkSession
    pair_rows = []
    for i, ci in enumerate(centroids):
        for j, cj in enumerate(centroids):
            if i != j:
                m = sum((a - b) * (a - b) for a, b in zip(ci, cj))
                pair_rows.append((i, j, m))
    pairs = spark.createDataFrame(pair_rows, "i long, j long, m long")
    si = s.select(
        F.col("cid").alias("i"),
        F.col("n").alias("__ni"),
        F.col("__sd").alias("__sdi"),
    )
    sj = s.select(
        F.col("cid").alias("j"),
        F.col("n").alias("__nj"),
        F.col("__sd").alias("__sdj"),
    )
    ratios = (
        pairs.where(F.col("m") > 0)
        .join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            F.col("i").alias("cid"),
            (
                (
                    F.col("__sdi").cast("double")
                    / F.col("__ni").cast("double")
                    + F.col("__sdj").cast("double")
                    / F.col("__nj").cast("double")
                )
                / F.col("m").cast("double")
            ).alias("__ratio"),
        )
    )
    r = ratios.groupBy("cid").agg(F.max("__ratio").alias("__rmax"))
    from pyspark.sql import Window

    wg = Window.orderBy("cid")
    db = (
        r.select(
            F.sum("__rmax")
            .over(wg.rowsBetween(Window.unboundedPreceding, 0))
            .alias("__srm"),
            F.row_number().over(wg).alias("__rn"),
            F.count(F.lit(1))
            .over(
                wg.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("__k"),
        )
        .where(F.col("__rn") == F.col("__k"))
        .select(
            (F.col("__srm") / F.col("__k").cast("double")).alias("__db")
        )
    )
    unit = F.lit(float(scale) * float(scale))
    return (
        s.join(r, "cid")
        .crossJoin(F.broadcast(db))
        .select(
            "cid",
            "n",
            F.round(
                F.col("__sd").cast("double") / F.col("n").cast("double") / unit,
                6,
            ).alias("s_mean"),
            F.round(F.col("__rmax"), 6).alias("r_max"),
            F.round(F.col("__db"), 6).alias("db_index"),
        )
    )
