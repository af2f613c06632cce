"""Skew operators: salted join/agg equivalence with plain plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.skew import (
    salted_agg_sum,
    salted_join,
    skew_safe_distinct_count,
)
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(o, c, ["o_custkey"], salt_from="o_orderkey").select(
        "o_orderkey", "c_name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (2, 99)], "id long, k long")
    small = spark.createDataFrame([(10, "x")], "k long, v string")
    out = {r.id: r.v for r in salted_join(big, small, ["k"], "id", how="left").collect()}
    assert out == {1: "x", 2: None}


def test_salted_agg_sum_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], "id long, k string, v long"
    )
    out = {r.k: r.v for r in salted_agg_sum(df, ["k"], ["v"], "id", 4).collect()}
    assert out == {"a": 30, "b": 5}


def test_skew_safe_distinct_count(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], "k string, v long"
    )
    out = {r.k: r.n_distinct for r in skew_safe_distinct_count(df, ["k"], "v").collect()}
    assert out == {"a": 2, "b": 1}


def _hot_bucket_corpus(spark, n=3000, hot_frac=0.10):
    """Synthetic skew fixture (VERDICT r02 item 7): hot_frac of the
    corpus shares ONE text, so a single LSH band bucket (and a single
    segment-hash key) holds 10% of all docs — the adversarial shape
    for the dedup stack's self-join/groupBy shuffles."""
    hot = int(n * hot_frac)
    rows = [
        (i, "the quick brown fox jumps over the lazy dog shared hot boilerplate")
        for i in range(hot)
    ]
    rows += [
        (
            hot + i,
            f"unique document body number {i} carrying diverse shingles "
            f"{i * 7} alpha {i * 13} beta {i * 29} gamma",
        )
        for i in range(n - hot)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), hot


def test_minhash_lsh_hot_bucket_aqe_skew_split(spark):
    """One LSH bucket holding 10% of docs makes the candidate
    self-join's (band_id, band_hash) key skewed. The join must be a
    shuffle join AQE can skew-split (not a cartesian / not
    salted-by-hand), and with skew thresholds scaled to the fixture
    AQE must actually mark the hot partition split (skew=true in the
    final adaptive plan). At 100 TB the same mechanism engages at the
    default 256 MB threshold — plan shape, not luck."""
    import time

    from aws_datalake_spark.operators.dedup import minhash_lsh_pairs

    df, hot = _hot_bucket_corpus(spark)
    confs = {
        # scale AQE's size thresholds down to fixture size so the
        # skew handler (not the fixture's smallness) is what's tested
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        # the candidate join feeds downstream SMJs that would inherit
        # its partitioning; allow AQE the extra shuffle so the skew
        # handler isn't vetoed by the downstream distribution
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        pairs = minhash_lsh_pairs(df, jaccard_threshold=0.5)
        t0 = time.time()
        # collect() (not count()) so THIS Dataset's QueryExecution is
        # the one that runs — count() builds a separate plan and the
        # inspected adaptive plan would stay isFinalPlan=false
        n_pairs = len(pairs.collect())
        wall = time.time() - t0
        # identical hot docs: all hot×hot pairs verify at jaccard 1.0
        assert n_pairs >= hot * (hot - 1) // 2
        # bounded wall: the hot bucket is quadratic in CANDIDATES but
        # the join itself must stay parallel (32 cores, sf-tiny data)
        assert wall < 120, f"hot-bucket pairs took {wall:.0f}s"
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_segment_dedup_hot_key_partial_agg_bounded(spark):
    """The same hot text as segments: one seg-hash key carries 10%
    of the corpus. Segment counting must rely on map-side partial
    aggregation (hot key collapses to one row per map task BEFORE the
    shuffle — the scalable answer to groupBy skew), and the full
    drop_boilerplate pass stays bounded."""
    import time

    from aws_datalake_spark.operators.segment_dedup import boilerplate_keys, drop_boilerplate, segment_docs

    df, hot = _hot_bucket_corpus(spark)
    segs = segment_docs(df, "text", "doc_id", k=5)
    keys = boilerplate_keys(segs, min_df=2)
    plan = keys._jdf.queryExecution().executedPlan().toString()
    # partial_count / partial aggregation before the exchange
    assert "partial" in plan.lower(), plan[:3000]
    t0 = time.time()
    out = drop_boilerplate(df, k=5, min_df=2)
    cleaned = {r.doc_id: r.clean_text for r in out.collect()}
    wall = time.time() - t0
    assert wall < 60, f"drop_boilerplate took {wall:.0f}s"
    # every hot doc fully boilerplate → emptied; unique docs keep text
    assert cleaned[0] == "" and cleaned[hot + 1] != ""
