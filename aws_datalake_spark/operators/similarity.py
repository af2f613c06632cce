"""Similarity search over embedding columns (north star,
BASELINE.json): brute-force cosine top-k baseline + LSH-bucketed
approximate variant as the scale path.

100 TB design notes:
* Queries broadcast (a query batch is small); the corpus never
  shuffles for brute force — each partition scores its slice and
  TakeOrdered/top-k-per-group aggregates partials.
* Dot products run as JVM array expressions (zip_with + aggregate):
  no Python, no UDF. For very wide vectors a Pandas-UDF matmul
  (numpy BLAS) path exists in bench comparisons — flip
  ``use_pandas=True``.
* The LSH variant buckets by random-hyperplane signs: candidates
  collide in at least one band; only buckets shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from aws_datalake_spark.operators.text import hash60


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right fold — same op order as a scalar
    loop, so engines agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force exact top-k by cosine. ``queries`` broadcasts;
    ranking uses row_number with id tiebreak for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
    scored = c.join(F.broadcast(q)).filter(F.col("neighbor_id") != F.col(query_id_col)).select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: Column | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: all pairs with cosine ≥ threshold.
    With ``bucket_col`` (e.g. an LSH signature or a label) the join
    is restricted to same-bucket pairs — the scale path; without it,
    a full cross self-join (only for small corpora / verification).
    """
    if bucket_col is not None:
        base = corpus.withColumn("__bucket", bucket_col).select(
            F.col(id_col), F.col(vec_col), "__bucket"
        )
        a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "__bucket")
        b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "__bucket")
        pairs = a.join(b, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        base = corpus.select(F.col(id_col), F.col(vec_col))
        a = base.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = base.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_signature(
    vec_col: Column, dim: int, num_planes: int = 16, seed: str = "lsh"
) -> Column:
    """Random-hyperplane LSH signature as an int: bit p = 1 iff
    dot(v, h_p) > 0, with h_p components derived deterministically
    from hash60 — reproducible across engines and runs (no RNG
    state, no collect)."""
    def plane_component(p: int, i: Column) -> Column:
        h = hash60(F.concat(F.lit(f"{seed}|{p}|"), i.cast("string")))
        return (h % F.lit(2001) - F.lit(1000)).cast("double") / F.lit(1000.0)

    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    bits = []
    for p in range(num_planes):
        plane = F.transform(idx, lambda i: plane_component(p, i))
        s = F.aggregate(
            F.zip_with(vec_col, plane, lambda x, y: x * y),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose hyperplane
    signature matches the query's (same bucket). Recall is tunable
    via num_planes; the scored candidate set shrinks ~2^-planes."""
    sig = hyperplane_signature(F.col(vec_col), dim, num_planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), sig.alias("__sig"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"), sig.alias("__sig"))
    scored = c.join(F.broadcast(q), "__sig").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    ).select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qvec"), F.col("__cvec")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )
