"""Similarity search over embedding columns (north star,
BASELINE.json): brute-force cosine top-k baseline + LSH-bucketed
approximate variant as the scale path.

100 TB design notes:
* Queries broadcast (a query batch is small); the corpus never
  shuffles for brute force — each partition scores its slice and
  TakeOrdered/top-k-per-group aggregates partials.
* Dot products run as JVM array expressions (zip_with + aggregate):
  no Python, no UDF. For very wide vectors flip
  ``cosine_topk(..., use_pandas=True)`` — an Arrow-batched numpy
  scorer (BLAS) with the same ranking semantics.
* The LSH variant buckets by random-hyperplane signs: candidates
  collide in at least one band; only buckets shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dot_sql(a_name: str, b_name: str, dim: int) -> str:
    """SQL text of the unrolled dot product — a left-associated
    0.0D + Σ element_at chain, the exact IEEE op sequence of the
    sequential fold (0.0+t₁ == t₁ except on an all-(-0.0) row, which
    no norm/cosine consumer can distinguish after division)."""
    terms = " + ".join(
        f"element_at({a_name}, {p}) * element_at({b_name}, {p})"
        for p in range(1, dim + 1)
    )
    return f"(0.0D + {terms})"


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential left-to-right fold — same op order as a scalar
    loop, so engines agree bit-for-bit.

    With ``dim`` (caller GUARANTEES both arrays have exactly that
    length — true for every embedding fixture path, dim 64; a shorter
    row would yield NULL instead of a partial sum) ``a``/``b`` must be
    COLUMN NAMES and the fold unrolls to flat multiply-adds with the
    fold's own 0.0 seed — the identical IEEE op sequence, so results
    stay bit-for-bit, but whole-stage-codegen'd instead of the
    CodegenFallback interpreted lambda walk (2·dim lambda evals per
    pair, the dominant cost of every O(pairs) cosine stage). The
    unroll is built as ONE F.expr string — constructing dim Column
    objects individually costs ~ms-per-node driver py4j round trips
    PER QUERY CALL (the hyperplane_signature lesson, PERF §23; the
    Column-built form measured 0.26x on llm_cosine_topk)."""
    if dim is not None:
        if not isinstance(a, str) or not isinstance(b, str):
            raise TypeError("dot(..., dim=) requires column NAMES")
        return F.expr(_dot_sql(a, b, dim))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    if dim is not None:
        if not isinstance(a, str):
            raise TypeError("l2_norm(..., dim=) requires a column NAME")
        return F.expr(f"SQRT({_dot_sql(a, a, dim)})")
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is not None:
        return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _norm_of(name: str, dim: int | None) -> Column:
    return l2_norm(name, dim) if dim is not None else l2_norm(F.col(name))


def _dot_of(a_name: str, b_name: str, dim: int | None) -> Column:
    return (
        dot(a_name, b_name, dim)
        if dim is not None
        else dot(F.col(a_name), F.col(b_name))
    )


def _cosine_pandas() -> Column:
    """Arrow-batched numpy cosine over (qvec, cvec) pairs — the
    Pandas-UDF escape hatch for very wide vectors where BLAS beats
    the JVM fold. NOT bit-identical to :func:`cosine` (numpy sums
    pairwise, the fold is sequential) — use the JVM path when an
    oracle must hash-match."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _cos(q, c):
        qm = np.asarray(q.tolist(), dtype="float64")
        cm = np.asarray(c.tolist(), dtype="float64")
        num = (qm * cm).sum(axis=1)
        den = np.linalg.norm(qm, axis=1) * np.linalg.norm(cm, axis=1)
        return pd.Series(num / den)

    return pandas_udf(_cos, DoubleType())


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    use_pandas: bool = False,
    band: tuple[float, float] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Brute-force exact top-k by cosine. ``queries`` broadcasts;
    ranking uses row_number with id tiebreak for determinism.
    ``use_pandas=True`` scores through an Arrow-batched numpy UDF
    (faster for wide vectors; same neighbors, last-ulp cosine
    differences possible). ``band=(lo, hi)`` restricts candidates to
    lo < round(cos, 6) < hi BEFORE ranking — the hard-negative-mining
    shape: similar enough to be informative, below the near-dup
    ceiling (rounded so the band edges are engine-exact)."""
    # norms fold once per input row below the join (bit-identical to
    # folding per pair; see cosine_neardup_pairs)
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    ).withColumn("__nq", _norm_of("__qvec", dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    ).withColumn("__nc", _norm_of("__cvec", dim))
    score = (
        _cosine_pandas()(F.col("__qvec"), F.col("__cvec"))
        if use_pandas
        else _dot_of("__qvec", "__cvec", dim)
        / (F.col("__nq") * F.col("__nc"))
    )
    scored = c.join(F.broadcast(q)).filter(F.col("neighbor_id") != F.col(query_id_col)).select(
        query_id_col,
        "neighbor_id",
        score.alias("cos"),
    )
    if band is not None:
        lo, hi = band
        scored = scored.filter(
            (F.round("cos", 6) > F.lit(float(lo)))
            & (F.round("cos", 6) < F.lit(float(hi)))
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: all pairs with cosine ≥ threshold.
    With ``bucket_col`` (e.g. an LSH signature or a label) the join
    is restricted to same-bucket pairs — the scale path; without it,
    a full cross self-join (only for small corpora / verification).
    """
    # each vector's norm is folded ONCE on its input side, below the
    # join — not re-folded per pair. Same fold, same value, so results
    # stay bit-identical to the naive form, but the O(n²) pair loop
    # evaluates one dot product instead of three (3× less interpreted
    # HOF work; the join boundary keeps the projection per-row).
    if bucket_col is not None:
        base = corpus.withColumn("__bucket", bucket_col).select(
            F.col(id_col), F.col(vec_col), "__bucket"
        )
        a = base.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "__bucket"
        ).withColumn("__na", _norm_of("va", dim))
        b = base.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "__bucket"
        ).withColumn("__nb", _norm_of("vb", dim))
        pairs = a.join(b, "__bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        base = corpus.select(F.col(id_col), F.col(vec_col))
        a = base.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        ).withColumn("__na", _norm_of("va", dim))
        b = base.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        ).withColumn("__nb", _norm_of("vb", dim))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot_of("va", "vb", dim) / (F.col("__na") * F.col("__nb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "cvec",
    dim: int | None = None,
) -> DataFrame:
    """IVF cell assignment: each vector gets its ``n_probe`` nearest
    centroids by cosine (deterministic centroid_id tiebreak).
    Centroids broadcast — the vector side never shuffles for
    assignment (the row_number window runs inside the same stage).

    The vector×centroid fan-out frame is NARROW — (id, centroid_id,
    score) only; the wide vector column re-joins after the pick.
    Carrying the embedding through the fan-out multiplies the
    intermediate bytes by the centroid count (r05 scaling curve:
    exponent 1.6 on the sf1 fixture, 70 s of a 75 s query — the
    n·nlist wide rows went through a window shuffle). For
    ``n_probe == 1`` (corpus-side assignment, every k-means
    iteration) the pick is a map-side-combinable ``max_by``
    aggregate — the fan-out frame never shuffles at all; the
    n_probe>1 path keeps the ranking window but shuffles only the
    3-column frame. Requires a NUMERIC centroid id (the max_by
    tiebreak negates it; every caller uses int ids).

    The fan-out side is repartitioned up to the default parallelism
    when the input arrives in fewer slices (a single parquet file
    reads as 1-2 partitions; the per-pair cosine is the CPU cost, so
    starving cores dominates wall time long before shuffle does).

    Formulation note: a pure-projection variant (literal centroid
    arrays + array_sort argmax) measured 4× SLOWER here — nested
    interpreted higher-order functions fall off codegen. For large
    centroid counts (real IVF, k in the thousands) the production
    assignment is an Arrow-batched numpy matmul via mapInPandas +
    corpus stored partitionBy(cell); the broadcast-join form keeps
    the oracle bit-exact at test scale."""
    c = centroids.select(centroid_id_col, centroid_vec_col).withColumn(
        "__cn", _norm_of(centroid_vec_col, dim)
    )
    base = vectors.select(id_col, vec_col)
    par = vectors.sparkSession.sparkContext.defaultParallelism
    v = base.withColumn("__vn", _norm_of(vec_col, dim))
    if v.rdd.getNumPartitions() < par:
        v = v.repartition(par)
    ccos = (
        _dot_of(vec_col, centroid_vec_col, dim)
        / (F.col("__vn") * F.col("__cn"))
    ).alias("__ccos")
    scored = v.join(F.broadcast(c)).select(id_col, centroid_id_col, ccos)
    if n_probe == 1:
        picked = scored.groupBy(id_col).agg(
            F.max_by(
                centroid_id_col,
                F.struct(
                    F.col("__ccos"),
                    (-F.col(centroid_id_col)).cast("double").alias("__nid"),
                ),
            ).alias(centroid_id_col)
        )
    else:
        w = Window.partitionBy(id_col).orderBy(F.desc("__ccos"), centroid_id_col)
        picked = (
            scored.withColumn("__crank", F.row_number().over(w))
            .filter(F.col("__crank") <= n_probe)
            .select(id_col, centroid_id_col)
        )
    return base.join(picked, id_col).select(id_col, vec_col, centroid_id_col)


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    band: tuple[float, float] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single
    nearest-centroid cell; each query probes its ``n_probe`` nearest
    cells and scores only those vectors. At 100 TB the corpus is
    written partitioned by cell, so a probe is a partition-pruned
    scan; centroids come from driver-side k-means on a sample and
    broadcast (here any small (centroid_id, cvec) table works).

    ``band=(lo, hi)`` restricts candidates to lo < round(cos,6) < hi
    before ranking — hard-negative mining at ANN cost: informative
    similars only, near-dups excluded (same contract as
    :func:`cosine_topk`)."""
    c_cells = assign_cells(corpus, centroids, 1, id_col, vec_col, dim=dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"), "centroid_id"
    )
    q_cells = assign_cells(queries, centroids, n_probe, query_id_col, vec_col, dim=dim).select(
        query_id_col, F.col(vec_col).alias("__qvec"), "centroid_id"
    )
    c_cells = c_cells.withColumn("__nc", _norm_of("__cvec", dim))
    q_cells = q_cells.withColumn("__nq", _norm_of("__qvec", dim))
    scored = c_cells.join(F.broadcast(q_cells), "centroid_id").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    ).select(
        query_id_col,
        "neighbor_id",
        (
            _dot_of("__qvec", "__cvec", dim)
            / (F.col("__nq") * F.col("__nc"))
        ).alias("cos"),
    )
    if band is not None:
        lo, hi = band
        scored = scored.filter(
            (F.round("cos", 6) > F.lit(float(lo)))
            & (F.round("cos", 6) < F.lit(float(hi)))
        )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def make_planes(dim: int, num_planes: int, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, i) is
    md5-derived, mapped to [-1, 1]. Computed ONCE driver-side (planes
    are row-independent) and embedded as literal arrays — never
    re-derived per row, and exactly reproducible by the SQL oracle
    (same decimal literals parse to the same doubles)."""
    import hashlib

    planes = []
    for p in range(num_planes):
        comps = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}|{p}|{i}".encode()).hexdigest()[:15], 16)
            comps.append((h % 2001 - 1000) / 1000.0)
        planes.append(comps)
    return planes


def hyperplane_signature(
    vec_col: Column, dim: int, num_planes: int = 16, seed: str = "lsh"
) -> Column:
    """Random-hyperplane LSH signature as an int: bit p = 1 iff
    dot(v, h_p) > 0 over literal plane arrays (see make_planes).

    The plane dot products unroll to codegen'd `element_at` addition
    chains instead of the interpreted zip_with/aggregate fold — 10×
    executor-side at 1M rows × 20 planes (32.3 → 3.2 s, PERF §23)
    and BIT-IDENTICAL: a left-to-right addition chain performs the
    exact IEEE op sequence of the fold (the fold's 0.0+x1 seed only
    differs on -0.0, which the >0 sign test cannot see), so bucket
    assignments still hash-match the oracle's fold. The whole
    signature is built as ONE `F.expr` string — constructing the
    ~dim·planes Column objects individually costs ~8 s of driver
    py4j round-trips per call (PERF §23). Double literals carry the
    `D` suffix (a bare decimal literal would parse as DECIMAL and
    change the arithmetic). Very wide unrolls (dim·planes > 8192)
    fall back to the fold to stay clear of codegen method-size
    splits."""
    planes = make_planes(dim, num_planes, seed)
    if dim * num_planes > 8192:
        bits = []
        for p, plane in enumerate(planes):
            s = dot(vec_col, F.array(*[F.lit(v) for v in plane]))
            bits.append(
                F.when(s > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                    F.lit(0).cast("long")
                )
            )
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out
    vec_sql = vec_col._jc.toString()  # simple column refs only
    cases = []
    for p, plane in enumerate(planes):
        chain = " + ".join(
            f"element_at({vec_sql}, {i + 1}) * {w!r}D"
            for i, w in enumerate(plane)
        )
        cases.append(
            f"CASE WHEN ({chain}) > 0.0D THEN {1 << p}L ELSE 0L END"
        )
    return F.expr("(" + " + ".join(cases) + ")")


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
    c = c.withColumn("__nc", _norm_of("__cvec", dim))
    q = q.withColumn("__nq", _norm_of("__qvec", dim))
    scored = c.join(F.broadcast(q), "__sig").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    ).select(
        query_id_col,
        "neighbor_id",
        (
            _dot_of("__qvec", "__cvec", dim)
            / (F.col("__nq") * F.col("__nc"))
        ).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """L2-normalize + symmetric int8 quantization: q_i =
    round(127 * x_i / ||x||). Shrinks an embedding store 4x (and 8x
    vs float64) before ANN indexing — at 100 TB the scan-time win is
    what makes brute-force re-ranking affordable. Returns (id, norm,
    q_int8 csv-string); zero vectors quantize to all-zero.

    Staged projections keep the norm an attribute: referenced three
    times (output + guard + per-element lambda), so CollapseProject
    cannot re-inline the O(dim) fold into the element loop (which
    would make quantization O(dim^2) per row — see
    operators/dedup.py:shingles for the same trap)."""
    staged = df.select(id_col, F.col(vec_col).alias("__v")).withColumn(
        "__nrm", l2_norm(F.col("__v"))
    )
    q = F.when(
        F.col("__nrm") == 0.0, F.transform("__v", lambda x: F.lit("0"))
    ).otherwise(
        F.transform(
            "__v",
            lambda x: F.round(x * 127.0 / F.col("__nrm"), 0).cast("int").cast("string"),
        )
    )
    return staged.select(
        id_col,
        F.round("__nrm", 6).alias("norm"),
        F.array_join(q, ",").alias("q_int8"),
    )


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Büttcher, SIGIR 2009)
    — the standard hybrid-search combiner: each retriever's ranked
    list contributes ``1/(k + rank)`` per item and the fused score is
    the sum, so agreement across retrievers dominates any single
    list's score scale (scores never need calibrating against each
    other — only RANKS matter). k=60 is the published default.

    Contributions are exact fixed-point (``round(1e6/(k+rank))`` —
    integer-derived, no float drift), so fused output hash-matches a
    SQL twin. Input frames need ``(id_col, rank_col)``; returns
    ``(id_col, n_lists, rrf)``. Plan: unions of already-top-k lists
    (tiny) + one aggregate — the expensive part is the retrievers,
    not the fusion."""
    parts = [
        df.select(
            F.col(id_col),
            F.round(F.lit(1_000_000.0) / (F.lit(k) + F.col(rank_col)))
            .cast("long")
            .alias("__c6"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.round(F.sum("__c6").cast("double") / 1_000_000.0, 6).alias("rrf"),
    )


def cross_rerank(
    candidates: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-encoder RERANK stage — the third hop of a retrieval
    stack (retrieve → fuse → rerank): every (query, candidate-text)
    pair runs through a scoring model, batched Arrow-side via
    ``mapInPandas`` exactly as a real cross-encoder would (pairs in,
    scores out; batch size capped by arrow.maxRecordsPerBatch = the
    model's activation-memory knob; no shuffle — candidates are
    already top-k-bounded).

    The scorer is a deterministic stub (term-overlap blended with a
    60-bit md5 of the pair, reproducible bit-for-bit by the SQL
    oracle) because no model runtime ships in this container; a real
    deployment swaps ONLY the inner loop for an ONNX/torch call with
    the same iterator, schema contract, and partition inheritance —
    which is what this function actually tests. Returns
    ``(id_col, rerank_score)``."""
    from collections.abc import Iterator

    import hashlib

    import pandas as pd

    q = " ".join(query_terms)
    nq = float(len(query_terms))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            scores = []
            for text in pdf[text_col].astype(str):
                toks = set(text.split())
                overlap = sum(1 for t in query_terms if t in toks) / nq
                h = int(
                    hashlib.md5(f"{q}\x01{text}".encode()).hexdigest()[:15],
                    16,
                )
                scores.append(
                    round(0.7 * overlap + 0.3 * (h % 1048576) / 1048576.0, 6)
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "rerank_score": scores}
            )

    return candidates.mapInPandas(
        batches, f"{id_col} long, rerank_score double"
    )


def mutual_nearest_neighbors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """Mutual-nearest-neighbor pairs within blocks — the embedding-
    alignment / bitext-mining primitive (two items pair only when
    each is the other's top-1 cosine neighbor): ``(id_a, id_b,
    cosine)`` with ``id_a < id_b``.

    SCALE: the pair join is BLOCKED on ``block_col`` (here a label; a
    coarse k-means cell or LSH bucket at corpus scale — same recall
    logic as the banded near-dup path), so work is Σ block², never
    corpus². Top-1 per item via one per-block window with id
    tie-break; mutuality is a self-join of the |items|-sized top-1
    table on the reversed pair. Norms fold once per row below the
    join.
    """
    v = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
    ).withColumn("__n", _norm_of("__vec", dim))
    a = v.select(
        "__blk", F.col("__id").alias("id_a"),
        F.col("__vec").alias("__va"), F.col("__n").alias("__na"),
    )
    b = v.select(
        "__blk", F.col("__id").alias("id_b"),
        F.col("__vec").alias("__vb"), F.col("__n").alias("__nb"),
    )
    scored = (
        a.join(b, "__blk")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a", "id_b",
            (_dot_of("__va", "__vb", dim)
             / (F.col("__na") * F.col("__nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), "id_b")
    top1 = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id_a", "id_b", "cos")
    )
    rev = top1.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
    )
    return (
        top1.join(rev, ["id_a", "id_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
    )


def mutual_nearest_neighbors_gemm(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """:func:`mutual_nearest_neighbors` with the per-block top-1
    search done by ONE numpy GEMM per block (`applyInPandas`) instead
    of a pair-exploding join — the production constant-factor path.

    Why: the join form materializes Σ block² pair ROWS and evaluates
    an interpreted zip_with/aggregate cosine per pair (~7 µs/pair
    measured — 85%+ of wall at sf1/sf3, PERF §23); the GEMM form
    computes the same Σ block² cosines as dense BLAS inside one
    Arrow batch per block and emits only N (id, top-1-id) rows. No
    pair frame, no 2×Σblock² sorts, no window.

    EXACTNESS: the GEMM only picks each row's argmax (ties → lowest
    id, matching the window's `desc(cos), id` order); the RETURNED
    cosine is re-computed for the ≤N winning pairs with the exact
    sequential JVM fold, so output values hash-match the join form
    bit-for-bit. The argmax itself could differ from the sequential
    fold's only when two DISTINCT neighbors sit within ~1 ulp of
    cosine — equality on the full fixture family is pinned by test;
    exact duplicates (the common real tie) produce bit-equal GEMM
    columns and take the same id tiebreak both ways.

    SCALE: one shuffle on block_col (same as the join form's build
    side), one Arrow batch per block (rows×dim floats), GEMM row-
    chunked at 2048 so a hot block never allocates rows² doubles at
    once; the mutuality join and re-score run on N-row frames.
    """
    import numpy as np
    import pandas as pd

    def _top1(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        ids = pdf["__id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.asarray(pdf["__vec"].tolist(), dtype="float64")[order]
        norms = np.sqrt((X * X).sum(axis=1))
        norms[norms == 0.0] = 1.0
        Xh = X / norms[:, None]
        best = np.empty(n, dtype="int64")
        for s in range(0, n, 2048):
            e = min(s + 2048, n)
            S = Xh[s:e] @ Xh.T
            S[np.arange(s, e) - s, np.arange(s, e)] = -np.inf
            # argmax returns the FIRST max → ids sorted asc → lowest
            # id on ties, matching Window.orderBy(desc(cos), id)
            best[s:e] = S.argmax(axis=1)
        return pd.DataFrame({"id_a": ids, "id_b": ids[best]})

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # v feeds the GEMM pass and BOTH re-score sides; without a cut the
    # upstream projection (e.g. the 20 literal-plane dot products of
    # the bucketed caller, plus the scan) re-executes three times
    v = _truncate(
        df.select(
            F.col(block_col).alias("__blk"),
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
        )
    )
    cand = v.groupBy("__blk").applyInPandas(_top1, "id_a long, id_b long")
    # exact sequential-fold re-score of the N winning pairs only
    side = v.select(
        F.col("__id"), F.col("__vec"), _norm_of("__vec", dim).alias("__n")
    )
    # scored feeds the mutuality self-join twice (itself + the
    # reversed side); cut it so the exact re-score fold runs once
    scored = _truncate(
        cand.join(
            side.select(
                F.col("__id").alias("id_a"),
                F.col("__vec").alias("__va"), F.col("__n").alias("__na"),
            ),
            "id_a",
        )
        .join(
            side.select(
                F.col("__id").alias("id_b"),
                F.col("__vec").alias("__vb"), F.col("__n").alias("__nb"),
            ),
            "id_b",
        )
        .select(
            "id_a", "id_b",
            (_dot_of("__va", "__vb", dim)
             / (F.col("__na") * F.col("__nb"))).alias("cos"),
        )
    )
    rev = scored.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
    )
    return (
        scored.join(rev, ["id_a", "id_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round("cos", 6).alias("cosine"))
    )


def label_centroid_distances(
    emb: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = 1 << 20,
) -> DataFrame:
    """Pairwise L2 distances between per-label embedding centroids:
    ``(label_a, label_b, n_a, n_b, dist)`` — the cluster-separation /
    source-drift report (two labels whose centroids collapse are not
    separable; a source whose centroid drifts from the rest is
    distributionally off).

    EXACTNESS: components fix-point to int64 at ``fp_scale``; the
    per-label sums are exact DECIMAL(38,0). Centroid means are never
    divided (integer division would truncate differently per
    engine): the difference is taken over a COMMON denominator —
    d_k = sa_k·nb − sb_k·na, dist = sqrt(Σ d_k²) / (na·nb·fp) — all
    exact integers until the final sqrt/divide of correctly-rounded
    doubles. Bit-identical cross-engine.

    SCALE: one posexplode + one (label, dim) aggregate → labels×dim
    rows; the pair join runs on labels² × dim rows — both bounded by
    the label-space size, never by the corpus.
    """
    x = emb.select(
        F.col(label_col).alias("__lbl"),
        F.posexplode(vec_col).alias("dim", "v"),
    ).withColumn("xi", F.round(F.col("v") * F.lit(int(fp_scale)), 0).cast("long"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = x.groupBy("__lbl", "dim").agg(
        F.sum(dec(F.col("xi"))).alias("sx"),
        F.count(F.lit(1)).alias("n"),
    )
    a = s.select(
        F.col("__lbl").alias("label_a"), "dim",
        F.col("sx").alias("sa"), F.col("n").alias("na"),
    )
    b = s.select(
        F.col("__lbl").alias("label_b"), "dim",
        F.col("sx").alias("sb"), F.col("n").alias("nb"),
    )
    d = (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .withColumn(
            "__dk",
            F.col("sa") * dec(F.col("nb")) - F.col("sb") * dec(F.col("na")),
        )
        .groupBy("label_a", "label_b")
        # Σ d_k² stays DECIMAL(38,0): d_k ≤ n·fp·n ≈ 1e18, d_k² ≤
        # 1e36 < 10^38, and a double Σ would be partition-order
        # dependent. Cast to double only after the exact sum.
        .agg(
            F.sum(F.col("__dk") * F.col("__dk")).alias("__ss"),
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
        )
    )
    denom = (
        F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
        * F.lit(float(fp_scale))
    )
    return d.select(
        "label_a", "label_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.sqrt(F.col("__ss").cast("double")) / denom, 6).alias("dist"),
    )
