"""Product quantization (PQ) for billion-scale similarity search —
the published IVF-ADC design (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the FAISS
IVF-PQ index): split each vector into ``m`` contiguous subvectors,
learn a ``k``-entry codebook per subspace, store each corpus vector
as ``m`` small codes, and answer queries by Asymmetric Distance
Computation (ADC) — a per-query lookup table of exact
query-to-codeword partial distances, summed per corpus code.

Why this is THE 100 TB ANN shape:

* **Memory/IO.** A 64-dim float64 vector is 512 bytes; its PQ code
  (m=8, k=16) is 8 small ints — a 64× scan-size reduction. The raw
  embedding column is read ONCE at encode time; every query after
  that scans only codes.
* **Training is sample-based and driver-side** (numpy k-means per
  subspace on a bounded deterministic sample — published practice;
  codebooks are tiny: m·k·(dim/m) doubles) and broadcast as plain
  literals.
* **Encoding is the only full scan** — one Arrow-batched pandas_udf
  doing a vectorized argmin per subspace; embarrassingly parallel,
  no shuffle.
* **Scoring stays JVM-side.** The per-query LUT (m·k partial
  distances) joins onto the code table; the ADC sum is a codegen'd
  higher-order-function fold over the code array — no Python in the
  corpus-side hot path, no vector bytes moving. LUTs build
  driver-side (and broadcast) only for bounded query batches; above
  ``DRIVER_LUT_MAX_QUERIES`` they are computed by an Arrow-batched
  pandas_udf on the executors AND joined without broadcast
  (SHUFFLE_REPLICATE_NL cartesian / shuffle merge on the cell key),
  since a LUT is larger than its query vector — broadcasting it
  would re-create the driver bottleneck (bit-identical arithmetic,
  pytest-pinned parity + plan gate on the join).
* Composes with IVF (operators/similarity.py:ann_ivf_topk): probe
  cells first, ADC-score only the probed cells' codes
  (:func:`ann_ivf_pq_topk`).

Reference parity: none (the reference has no vector search); this is
a north-star LLM-pipeline operator per BASELINE.json.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType
from pyspark.sql.window import Window


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Learn per-subspace codebooks on a deterministic sample (the
    ``sample`` lowest ids — content-stable, so retraining on the same
    corpus reproduces the same codebooks bit-for-bit). Returns
    ``m × k × (dim/m)`` plain floats; k-means per subspace with
    first-k init and ``iters`` Lloyd rounds, all driver-side numpy —
    the corpus is never shuffled for training."""
    rows = (
        vectors.orderBy(id_col)
        .limit(sample)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    X = np.asarray([r[0] for r in rows], dtype="float64")
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    if len(X) < k:
        raise ValueError(f"sample {len(X)} smaller than k={k}")
    books = []
    for j in range(m):
        S = X[:, j * ds:(j + 1) * ds]
        C = S[:k].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(k):
                pts = S[a == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books.append(C.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code) for every vector — the one full-corpus pass.
    Vectorized per Arrow batch: distance of every subvector to every
    codeword via one GEMM per subspace, argmin per row. Zero
    shuffles; output is ~m bytes/vector."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m = len(codebooks)
    ds = len(codebooks[0][0])
    C = [np.asarray(b, dtype="float64") for b in codebooks]
    c_sq = [(b * b).sum(1) for b in C]

    # no type hints: `from __future__ import annotations` would turn
    # them into strings pandas_udf cannot resolve under local imports
    @pandas_udf(ArrayType(IntegerType()))
    def _enc(v):
        X = np.asarray(v.tolist(), dtype="float64")
        codes = np.empty((len(X), m), dtype="int32")
        for j in range(m):
            S = X[:, j * ds:(j + 1) * ds]
            d2 = -2.0 * (S @ C[j].T) + c_sq[j][None, :]  # + |S|² constant
            codes[:, j] = d2.argmin(1)
        return pd.Series([list(map(int, r)) for r in codes])

    return df.select(
        F.col(id_col), _enc(F.col(vec_col).cast("array<double>")).alias(code_col)
    )


def _query_luts(
    queries: list[tuple], codebooks: list[list[list[float]]]
) -> list[tuple]:
    """Per query: the flattened m·k table of EXACT squared distances
    from its subvectors to every codeword — ADC's asymmetry: the
    query side is never quantized."""
    m = len(codebooks)
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    out = []
    for qid, vec in queries:
        q = np.asarray(vec, dtype="float64")
        lut = np.empty(m * k, dtype="float64")
        for j in range(m):
            sub = q[j * ds:(j + 1) * ds]
            lut[j * k:(j + 1) * k] = (
                (np.asarray(codebooks[j]) - sub[None, :]) ** 2
            ).sum(1)
        out.append((qid, [float(x) for x in lut]))
    return out


DRIVER_LUT_MAX_QUERIES = 10_000
"""Above this query-batch size the LUTs are built distributed
(Arrow-batched pandas_udf over the queries DataFrame) instead of a
driver-side collect — a 10M-query batch would otherwise bottleneck
the driver (r02 verdict item 6). Below it, collect() is cheaper:
LUTs are m·k doubles per query and skip a Python-worker round-trip."""


def _lut_frame(
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    query_id_col: str,
    vec_col: str,
    max_driver_queries: int | None = None,
) -> tuple[DataFrame, bool]:
    """``((query_id, __lut) frame, driver_side)`` for the query batch.
    Small batches collect to the driver and return a local frame —
    ``driver_side=True`` tells the caller a broadcast join is safe;
    batches above ``max_driver_queries`` compute the LUT inside an
    Arrow-batched pandas_udf so query vectors never leave the
    executors (``driver_side=False`` — the caller must NOT broadcast:
    a LUT is m·k doubles, LARGER than the vector it came from, so
    broadcasting it would re-create the driver bottleneck the
    distributed path exists to remove). Same arithmetic both paths
    (:func:`_query_luts`), same schema, pytest-pinned parity.

    The path decision and the driver-side build share ONE bounded
    job: ``limit+1`` rows are collected; overflow proves the batch is
    big (a ``count()`` probe would execute the query frame's lineage
    a second time)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, DoubleType

    limit = DRIVER_LUT_MAX_QUERIES if max_driver_queries is None else max_driver_queries
    spark = queries.sparkSession
    probe_rows = queries.select(query_id_col, vec_col).limit(limit + 1).collect()
    if len(probe_rows) <= limit:
        q_rows = [(r[0], list(r[1])) for r in probe_rows]
        return (
            spark.createDataFrame(
                _query_luts(q_rows, codebooks),
                f"{query_id_col} long, __lut array<double>",
            ),
            True,
        )

    m = len(codebooks)
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    C = [np.asarray(b, dtype="float64") for b in codebooks]

    @pandas_udf(ArrayType(DoubleType()))
    def _lut(v):
        X = np.asarray(v.tolist(), dtype="float64")
        out = np.empty((len(X), m * k), dtype="float64")
        for j in range(m):
            S = X[:, j * ds:(j + 1) * ds]
            # direct |q_sub - c|² (not the GEMM expansion): bit-for-bit
            # the same floats as the driver-side _query_luts path, so
            # both paths survive the 6-dp oracle rounding identically
            d2 = ((S[:, None, :] - C[j][None, :, :]) ** 2).sum(-1)
            out[:, j * k:(j + 1) * k] = d2
        return pd.Series([[float(x) for x in r] for r in out])

    return (
        queries.select(
            F.col(query_id_col),
            _lut(F.col(vec_col).cast("array<double>")).alias("__lut"),
        ),
        False,
    )


def _adc_rank(
    scored_input: DataFrame,
    k: int,
    k_neighbors: int,
    id_col: str,
    code_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared ADC fold + top-k tail: ``Σ_j LUT[j·k + code_j]`` as a
    codegen'd higher-order function over the (codes × LUT) join,
    then per-query row_number ranking. Both pq_topk and
    ann_ivf_pq_topk ride this — the oracle-pinned arithmetic lives in
    exactly one place."""
    scored = scored_input.filter(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.transform(F.col(code_col), lambda c, j: c + j * F.lit(k)),
            F.lit(0.0).cast("double"),
            lambda acc, i: acc + F.element_at("__lut", i + 1),
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            query_id_col, "neighbor_id", "rank",
            F.round("adc_dist", 6).alias("adc_dist"),
        )
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: broadcast (query_id, LUT) onto the code table and
    fold ``Σ_j LUT[j·k + code_j]`` with a codegen'd higher-order
    function — the entire corpus-side scan is JVM arithmetic over
    ~m-byte codes. Returns (query_id, neighbor_id, rank, adc_dist);
    smaller distance = nearer. LUTs build driver-side for bounded
    query batches and distributed (pandas_udf) above
    DRIVER_LUT_MAX_QUERIES — and above that threshold the codes×LUT
    pairing is a SHUFFLE_REPLICATE_NL cartesian (each code partition
    meets each LUT partition on the executors), never a broadcast:
    a broadcast would materialize every LUT on the driver, which is
    exactly the bottleneck the distributed build removes."""
    k = len(codebooks[0])
    luts, driver_side = _lut_frame(queries, codebooks, query_id_col, vec_col)
    if driver_side:
        joined = codes.crossJoin(F.broadcast(luts))
    else:
        joined = codes.crossJoin(luts.hint("shuffle_replicate_nl"))
    return _adc_rank(
        joined, k, k_neighbors, id_col, code_col, query_id_col,
    )


# --- exact-integer variant (hash-checkable against a chained-CTE oracle) ----
#
# Same IVF-ADC pipeline shape as the float path above, but every
# intermediate is an exact integer (the integer-PageRank technique):
# vectors quantized to floor(x·1e6) int64, per-subspace Lloyd with
# trunc-division centroid updates, squared-euclidean everywhere, and
# the ADC fold summing exact int64 partials. A DuckDB chained-CTE
# oracle reproduces every code and every distance bit-for-bit, so the
# query graduates from rows-only to hash-certified. The float path
# stays as the production index (cosine semantics, GEMM encode).


def _sub_d2(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _trunc_div(s: int, n: int) -> int:
    # trunc-toward-zero, matching Spark DIV and DuckDB // (Python //
    # floors on negatives, so route through abs)
    q = abs(s) // n
    return q if s >= 0 else -q


def pq_train_exact(
    vectors: DataFrame,
    m: int = 4,
    k: int = 8,
    sample: int = 256,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[int]]]:
    """Per-subspace codebooks over integer-quantized vectors with
    EXACT arithmetic: train on the ``sample`` lowest-id vectors
    (content-stable), init = first-k subvectors, assignment = argmin
    of exact squared euclidean (lowest-cid tiebreak), update =
    per-component trunc-division of integer sums; empty cells keep
    their previous centroid. All driver-side plain-Python ints —
    like :func:`pq_train`, training is sample-bounded by design
    (codebooks are tiny, the corpus never shuffles for training) and
    a chained-CTE oracle reproduces every centroid bit-for-bit.
    ``vectors`` must be ``quantize_vectors_int`` output."""
    rows = (
        vectors.orderBy(id_col).limit(sample).select(vec_col).collect()
    )
    X = [[int(x) for x in r[0]] for r in rows]
    dim = len(X[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(X) < k:
        raise ValueError(f"sample {len(X)} smaller than k={k}")
    ds = dim // m
    books: list[list[list[int]]] = []
    for j in range(m):
        S = [v[j * ds:(j + 1) * ds] for v in X]
        C = [list(s) for s in S[:k]]
        for _ in range(iters):
            sums = [[0] * ds for _ in range(k)]
            counts = [0] * k
            for s in S:
                a = min(range(k), key=lambda c: (_sub_d2(s, C[c]), c))
                counts[a] += 1
                for p in range(ds):
                    sums[a][p] += s[p]
            C = [
                [_trunc_div(sums[c][p], counts[c]) for p in range(ds)]
                if counts[c]
                else C[c]
                for c in range(k)
            ]
        books.append(C)
    return books


def _sub_d2_sql(vec_col: str, j: int, ds: int, centroid: list[int]) -> str:
    """Exact squared distance of subspace ``j`` of an array<long>
    column to a literal integer codeword, as a SQL fragment — the
    same zip_with/aggregate fold tree the Column API would build, but
    parsed in ONE py4j call. Building the m·k folds as individual
    Column objects costs seconds of driver round-trips per query
    (the same finding as hyperplane_signature, PERF §23/§25)."""
    lit = "array(" + ",".join(f"{int(c)}L" for c in centroid) + ")"
    return (
        f"aggregate(zip_with(slice({vec_col}, {j * ds + 1}, {ds}), {lit}, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), "
        f"(acc, d) -> acc + d)"
    )


def pq_encode_exact(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """(id, pq_code array<int>) — the one full-corpus pass, as a pure
    JVM projection: per subspace, ``least()`` over k (d2, cid)
    structs against literal codewords (lowest-cid tiebreak). Zero
    shuffles, zero Python in the scan, exact int64 distances. Built
    as one expr string per subspace (driver py4j economy)."""
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    cols = []
    for j, book in enumerate(codebooks):
        structs = [
            f"named_struct('d2', {_sub_d2_sql(vec_col, j, ds, book[c])}, "
            f"'cid', CAST({c} AS INT))"
            for c in range(k)
        ]
        picked = structs[0] if k == 1 else "least(" + ", ".join(structs) + ")"
        cols.append(F.expr(f"({picked}).cid"))
    return df.select(F.col(id_col), F.array(*cols).alias(code_col))


def pq_query_lut_exact(
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    lut_col: str = "__lut",
) -> DataFrame:
    """(query_id, LUT array<long>) with ``LUT[j·k + c] = d2(q_sub_j,
    codeword_jc)`` — exact integers via m·k literal folds, fully
    distributed (no driver collect, unlike the float `_lut_frame`
    small-batch branch): the codebooks are literals, so the LUT is
    just a wide projection over the query frame — ONE expr string."""
    k = len(codebooks[0])
    ds = len(codebooks[0][0])
    entries = ", ".join(
        _sub_d2_sql(vec_col, j, ds, codebooks[j][c])
        for j in range(len(codebooks))
        for c in range(k)
    )
    return queries.select(
        F.col(query_id_col), F.expr(f"array({entries})").alias(lut_col)
    )


def assign_cells_exact(
    df: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    id_col: str,
    vec_col: str = "embedding",
    cvec_col: str = "cvec",
) -> DataFrame:
    """(id, centroid_id) — nearest ``n_probe`` cells by exact integer
    squared euclidean (lowest-centroid_id tiebreak). Centroid frame is
    tiny by construction → broadcast; the corpus never shuffles."""
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(cvec_col), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )
    scored = df.crossJoin(F.broadcast(centroids)).select(
        id_col, "centroid_id", d2.alias("__d2")
    )
    w = Window.partitionBy(id_col).orderBy("__d2", "centroid_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_probe)
        .select(id_col, "centroid_id")
    )


def ann_ivf_pq_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[int]]],
    k_neighbors: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ with exact integer arithmetic end-to-end: corpus codes
    live in their nearest-centroid cell, a query probes ``n_probe``
    cells, the ADC fold sums exact int64 LUT partials — returns
    (query_id, neighbor_id, rank, adc_dist) with adc_dist a plain
    BIGINT (no rounding, hashable as-is). Same pruning shape as
    :func:`ann_ivf_pq_topk`: IVF cuts candidates, PQ cuts bytes."""
    k = len(codebooks[0])
    cells = assign_cells_exact(corpus, centroids, 1, id_col, vec_col)
    codes = pq_encode_exact(corpus, codebooks, id_col, vec_col).join(
        cells, id_col
    )
    probe = assign_cells_exact(
        queries, centroids, n_probe, query_id_col, vec_col
    ).join(pq_query_lut_exact(queries, codebooks, query_id_col, vec_col),
           query_id_col)
    scored = codes.join(
        F.broadcast(probe), "centroid_id"
    ).filter(F.col(id_col) != F.col(query_id_col)).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        F.aggregate(
            F.transform("pq_code", lambda c, j: c.cast("long") + j * F.lit(k)),
            F.lit(0).cast("long"),
            lambda acc, i: acc + F.element_at("__lut", (i + 1).cast("int")),
        ).alias("adc_dist"),
    )
    w = Window.partitionBy(query_id_col).orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(query_id_col, "neighbor_id", "rank", "adc_dist")
    )


def ann_ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    k_neighbors: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The full FAISS-style IVF-PQ pipeline: corpus codes live in
    their nearest-centroid cell (at 100 TB: a table partitioned by
    cell holding only ~m-byte codes); a query probes ``n_probe``
    cells and ADC-scores only those cells' codes. Both prunings
    compose: IVF cuts the candidate count, PQ cuts bytes per
    candidate."""
    from aws_datalake_spark.operators.similarity import assign_cells

    k = len(codebooks[0])
    cells = assign_cells(corpus, centroids, 1, id_col, vec_col).select(
        id_col, "centroid_id", vec_col
    )
    codes = pq_encode(cells, codebooks, id_col, vec_col).join(
        cells.select(id_col, "centroid_id"), id_col
    )
    q_cells = assign_cells(
        queries, centroids, n_probe, query_id_col, vec_col
    ).select(query_id_col, "centroid_id", vec_col)
    luts, driver_side = _lut_frame(queries, codebooks, query_id_col, vec_col)
    probe = q_cells.join(luts, query_id_col).select(
        query_id_col, "centroid_id", "__lut"
    )
    if driver_side:
        scored = codes.join(F.broadcast(probe), "centroid_id")
    else:
        # big query batch: equi-join on the cell key shuffles both
        # sides by centroid_id — probe LUTs never funnel through the
        # driver (broadcast would collect them all)
        scored = codes.join(probe.hint("merge"), "centroid_id")
    return _adc_rank(
        scored, k, k_neighbors, id_col, "pq_code", query_id_col,
    )
