"""Unit tests for operators/sketches.py: heavy hitters, Bloom filter,
mergeable HLL rollups."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.sketches import (
    heavy_hitters_by_group,
    bloom_filter_table,
    bloom_prune,
    heavy_hitters,
    hourly_hll_partials,
    rollup_hll_daily,
)


# --- heavy hitters -----------------------------------------------------------


def test_heavy_hitters_exact_counts_and_threshold(spark):
    # 100 rows: 'a'×50, 'b'×30, 'c'×15, d0..d4 once each.
    rows = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + [f"d{i}" for i in range(5)]
    df = spark.createDataFrame([(v,) for v in rows], "token string")
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", 0.10).collect()}
    assert got == {"a": 50, "b": 30, "c": 15}
    # strict >: an item at exactly the support boundary is excluded
    got20 = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", 0.15).collect()}
    assert got20 == {"a": 50, "b": 30}


def test_heavy_hitters_no_candidates(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(20)], "token string")
    out = heavy_hitters(df, "token", 0.5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["token", "cnt"]


def test_heavy_hitters_tiny_support_falls_back_exact(spark):
    """support/2 < 1e-4 would crash Spark's freqItems; the operator
    must fall back to the exact path and still answer correctly."""
    rows = ["a"] * 50 + ["b"] * 30 + [f"d{i}" for i in range(20)]
    df = spark.createDataFrame([(v,) for v in rows], "token string")
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", 1e-4).collect()}
    assert got["a"] == 50 and got["b"] == 30
    # every singleton clears a 1e-4 threshold on 100 rows too
    assert len(got) == 22


def test_heavy_hitters_by_group_skewed_groups_fall_back_exact(spark):
    """A group holding <2% of rows at support=0.01 pushes the freqItems
    threshold under 1e-4 — previously an IllegalArgumentException."""
    rows = [("big", "x")] * 990 + [("small", "y")] * 8 + [("small", "z")] * 2
    df = spark.createDataFrame(rows, "g string, tok string")
    got = {
        (r["g"], r["tok"]): r["cnt"]
        for r in heavy_hitters_by_group(df, "g", "tok", 0.01).collect()
    }
    # per-group thresholds: big needs >9.9 rows, small needs >0.1 rows
    assert got == {("big", "x"): 990, ("small", "y"): 8, ("small", "z"): 2}


# --- Bloom filter ------------------------------------------------------------


def test_bloom_no_false_negatives_and_prunes(spark):
    n_bits = 1 << 12
    members = spark.range(0, 200).select(F.col("id").alias("k"))
    bloom = bloom_filter_table(members, "k", n_bits)
    # probe = members ∪ 2000 non-members
    probe = spark.range(0, 2200).select(F.col("id").alias("k"))
    kept = bloom_prune(probe, "k", bloom, n_bits)
    kept_ids = {r["k"] for r in kept.collect()}
    assert set(range(200)) <= kept_ids, "Bloom filter dropped a true member"
    # 4096 bits / 200 keys / k=3 → false-positive rate well under 20%
    fp = len(kept_ids - set(range(200)))
    assert fp < 400, f"false-positive rate too high: {fp}/2000"


def test_bloom_pruned_join_equals_plain_join(spark):
    n_bits = 1 << 12
    build = spark.range(0, 500).filter(F.col("id") % 7 == 0).select(
        F.col("id").alias("bk"), (F.col("id") * 2).alias("bval")
    )
    probe = spark.range(0, 1000).select(
        F.col("id").alias("pk"), (F.col("id") % 13).alias("pval")
    )
    bloom = bloom_filter_table(build, "bk", n_bits)
    via_bloom = (
        bloom_prune(probe, "pk", bloom, n_bits)
        .join(build, F.col("pk") == F.col("bk"))
        .select("pk", "pval", "bval")
    )
    plain = probe.join(build, F.col("pk") == F.col("bk")).select("pk", "pval", "bval")
    assert sorted(map(tuple, via_bloom.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_word_table_is_small(spark):
    n_bits = 1 << 12
    members = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bloom = bloom_filter_table(members, "k", n_bits)
    # at most n_bits/64 rows no matter how many keys went in
    assert bloom.count() <= n_bits // 64


# --- HLL rollup --------------------------------------------------------------


def _events(spark):
    # 3 days × 24 h, user u{i%97} each hour → 97 distinct users/day
    rows = []
    for d in range(1, 4):
        for h in range(24):
            for i in range(40):
                rows.append((f"2024-03-0{d} {h:02d}:15:00", f"u{(h * 40 + i) % 97}"))
    return spark.createDataFrame(rows, "ts string, user_id string").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )


def test_hll_rollup_merge_equals_direct_sketch(spark):
    ev = _events(spark)
    daily_from_partials = rollup_hll_daily(hourly_hll_partials(ev, "ts", "user_id"))
    direct = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(12))
            ).alias("uniques_est")
        )
    )
    a = {r["day"]: r["uniques_est"] for r in daily_from_partials.collect()}
    b = {r["day"]: r["uniques_est"] for r in direct.collect()}
    assert a == b, "union of hourly partials must equal the direct daily sketch"


def test_hll_estimate_close_to_exact(spark):
    ev = _events(spark)
    est = {
        r["day"]: r["uniques_est"]
        for r in rollup_hll_daily(hourly_hll_partials(ev, "ts", "user_id")).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for day, n in exact.items():
        assert abs(est[day] - n) / n < 0.05, (day, est[day], n)


def test_heavy_hitters_by_group_per_group_thresholds(spark):
    # group A: 40 rows ('x'×20, 'y'×10, 10 singletons)
    # group B: 10 rows ('x'×2, 8 singletons) — 'x' is 20% of B but
    # only 2 occurrences; thresholds must be PER GROUP.
    rows = (
        [("A", "x")] * 20 + [("A", "y")] * 10 + [("A", f"a{i}") for i in range(10)]
        + [("B", "x")] * 2 + [("B", f"b{i}") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "g string, tok string")
    got = {
        (r["g"], r["tok"]): r["cnt"]
        for r in heavy_hitters_by_group(df, "g", "tok", 0.15).collect()
    }
    assert got == {("A", "x"): 20, ("A", "y"): 10, ("B", "x"): 2}


def test_heavy_hitters_by_group_empty(spark):
    df = spark.createDataFrame([], "g string, tok string")
    assert heavy_hitters_by_group(df, "g", "tok", 0.5).count() == 0
