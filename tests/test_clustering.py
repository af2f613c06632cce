"""Distributed k-means: blob recovery, determinism, IVF handoff."""

from __future__ import annotations

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
