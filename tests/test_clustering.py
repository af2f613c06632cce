"""Distributed k-means: blob recovery, determinism, IVF handoff."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_datalake_spark.operators.clustering import kmeans_assign, kmeans_fit


def _blobs(spark):
    # three well-separated 4-d blobs, 20 points each
    centers = [[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]]
    rows = []
    i = 0
    for b, c in enumerate(centers):
        for j in range(20):
            jitter = [((i * 7 + d * 3 + j) % 5) / 10.0 for d in range(4)]
            rows.append((i, [c[d] + jitter[d] for d in range(4)], b))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, blob int")


def test_kmeans_recovers_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, k=3, max_iter=5)
    assigned = kmeans_assign(df, cents)
    joined = assigned.join(df.select("vec_id", "blob"), "vec_id").collect()
    # every blob maps to exactly one cell and vice versa
    mapping = {}
    for r in joined:
        mapping.setdefault(r.blob, set()).add(r.centroid_id)
    assert all(len(cells) == 1 for cells in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3
    # centroids sit near the true centers
    best = [max(c) for c in cents]
    assert all(9.5 <= b <= 10.6 for b in best)


def test_kmeans_deterministic(spark):
    df = _blobs(spark)
    a = kmeans_fit(df, k=3, max_iter=3)
    b = kmeans_fit(df, k=3, max_iter=3)
    assert a == b


# --- quality classifier (fastText-style LR over hashed features) --------------


@pytest.mark.slow
def test_quality_classifier_separates_and_is_deterministic(spark):
    from aws_datalake_spark.operators.classifier import (
        sanity_auc,
        score_quality,
        train_quality_classifier,
    )

    rows = [(i, "good clean prose text here " * 3, 1) for i in range(40)]
    rows += [(i, "spam junk noise garbage words " * 3, 0) for i in range(40, 80)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    w = train_quality_classifier(df, iters=20, lr=2.0, n_buckets=64)
    auc = sanity_auc(score_quality(df, w), df)
    assert auc > 0.95
    assert w == train_quality_classifier(df, iters=20, lr=2.0, n_buckets=64)


def test_quality_classifier_scores_bounded(spark):
    from aws_datalake_spark.operators.classifier import (
        score_quality,
        train_quality_classifier,
    )

    df = spark.createDataFrame(
        [(1, "a b", 1), (2, "c d", 0)], ["doc_id", "text", "label"]
    )
    w = train_quality_classifier(df, iters=3, n_buckets=16)
    got = score_quality(df, w).collect()
    assert all(0.0 < r.quality_score < 1.0 for r in got)


# ------------------------------------------------------ product quantization


def _emb(spark):
    from tests.conftest import SF_SMOKE

    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def test_pq_train_shape_and_determinism(spark):
    from aws_datalake_spark.operators.pq import pq_train

    emb = _emb(spark)
    b1 = pq_train(emb, m=8, k=16, sample=256, iters=5)
    b2 = pq_train(emb, m=8, k=16, sample=256, iters=5)
    assert b1 == b2  # content-stable sample + fixed init => bitwise repeat
    assert len(b1) == 8 and len(b1[0]) == 16 and len(b1[0][0]) == 8


def test_pq_encode_codes_in_range_zero_shuffle(spark):
    from aws_datalake_spark.operators.pq import pq_encode, pq_train

    emb = _emb(spark)
    books = pq_train(emb, m=8, k=16, sample=256, iters=5)
    codes = pq_encode(emb, books)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r.pq_code) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_code)
    assert "Exchange" not in codes._jdf.queryExecution().executedPlan().toString()


def test_pq_adc_recall_vs_exact_l2(spark):
    from aws_datalake_spark.operators.pq import pq_encode, pq_topk, pq_train

    emb = _emb(spark)
    books = pq_train(emb, m=16, k=32, sample=512, iters=10)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(codes, queries, books, k_neighbors=10)
    assert got.groupBy("query_id").count().filter("count != 10").count() == 0
    # exact L2 top-10 via brute force for the same queries
    from aws_datalake_spark.operators.similarity import dot

    q = queries.select(F.col("query_id"), F.col("embedding").alias("qv"))
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    d2 = F.aggregate(
        F.zip_with("embedding", "qv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 10")
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    assert len(g & e) / len(e) >= 0.4  # m=16/k=32 books: recall floor


def test_pq_lut_distributed_path_parity_and_no_collect(spark, monkeypatch):
    """VERDICT r02 item 6: above DRIVER_LUT_MAX_QUERIES the per-query
    ADC lookup tables are computed by an Arrow-batched pandas_udf on
    the executors (query vectors never collect to the driver); below
    it the driver-side path stays. Both must produce bit-identical
    results, and the distributed LUT frame's plan must be a real scan
    + Python eval, not a driver-materialized LocalTableScan."""
    from aws_datalake_spark.operators import pq

    emb = _emb(spark)
    books = pq.pq_train(emb, m=8, k=16, sample=256, iters=5)
    codes = pq.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    small = pq.pq_topk(codes, queries, books, k_neighbors=10)
    small_rows = {tuple(r) for r in small.collect()}
    monkeypatch.setattr(pq, "DRIVER_LUT_MAX_QUERIES", 0)
    big = pq.pq_topk(codes, queries, books, k_neighbors=10)
    big_rows = {tuple(r) for r in big.collect()}
    assert small_rows == big_rows  # same arithmetic, same 6-dp rounding

    # plan gate: the >threshold LUT frame is computed distributed
    luts, driver_side = pq._lut_frame(queries, books, "query_id", "embedding")
    assert driver_side is False
    plan = luts._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "EvalPython" in plan
    # ...and the codes×LUT JOIN itself must not broadcast the LUTs
    # (a broadcast materializes every LUT on the driver — the exact
    # bottleneck the distributed build removes; ADVICE r03)
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in big_plan
    assert "CartesianProduct" in big_plan
    # and the <=threshold path IS the local frame (no Python workers)
    monkeypatch.setattr(pq, "DRIVER_LUT_MAX_QUERIES", 10_000)
    luts_small, small_driver = pq._lut_frame(queries, books, "query_id", "embedding")
    assert small_driver is True
    assert "EvalPython" not in (
        luts_small._jdf.queryExecution().executedPlan().toString()
    )


def test_ivf_pq_composes_and_scoring_is_jvm_side(spark):
    from aws_datalake_spark.operators.pq import ann_ivf_pq_topk, pq_train

    emb = _emb(spark)
    books = pq_train(emb, m=8, k=16, sample=256, iters=5)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_ivf_pq_topk(emb, queries, centroids, books, k_neighbors=5, n_probe=3)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(1 <= r.rank <= 5 for r in rows)
    # ADC fold must be plain JVM expressions: no python udf in scoring
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_ivf_pq_distributed_probe_joins_without_broadcast(spark, monkeypatch):
    """ADVICE r03 (pq.py): above DRIVER_LUT_MAX_QUERIES the IVF-PQ
    probe (query LUTs) must NOT ride a broadcast — broadcasting
    funnels every LUT through the driver. The big-batch path is a
    shuffle merge join on the cell key, result-identical to the
    broadcast path."""
    from aws_datalake_spark.operators import pq

    emb = _emb(spark)
    books = pq.pq_train(emb, m=8, k=16, sample=256, iters=5)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    small = pq.ann_ivf_pq_topk(emb, queries, centroids, books,
                               k_neighbors=5, n_probe=3)
    small_rows = {tuple(r) for r in small.collect()}
    monkeypatch.setattr(pq, "DRIVER_LUT_MAX_QUERIES", 0)
    big = pq.ann_ivf_pq_topk(emb, queries, centroids, books,
                             k_neighbors=5, n_probe=3)
    assert {tuple(r) for r in big.collect()} == small_rows
    plan = big._jdf.queryExecution().executedPlan().toString()
    # codes ⋈ probe is the shuffle merge join; centroid assignment may
    # still broadcast the (tiny) centroid table — that one is fine
    assert "SortMergeJoin" in plan


def test_pq_train_validates_inputs(spark):
    import pytest

    from aws_datalake_spark.operators.pq import pq_train

    emb = _emb(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=7, k=16, sample=64)  # 64 % 7 != 0
    with pytest.raises(ValueError, match="smaller than k"):
        pq_train(emb.limit(3), m=8, k=16, sample=64)
