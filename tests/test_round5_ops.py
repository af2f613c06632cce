"""Unit tests for the round-5 operators: record linkage, fixed-width
reads, watermark late-drop, OHLC bars, stratified eval split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_blocked_fuzzy_join_matches_within_block_only(spark):
    from aws_datalake_spark.operators.linkage import blocked_fuzzy_join

    left = spark.createDataFrame(
        [(1, "acme corp"), (2, "zenith ltd")], "id long, name string"
    )
    right = spark.createDataFrame(
        [
            (10, "acme corq"),   # dist 1, same block (first token 'acme')
            (11, "acme corporation"),  # same first token, len bucket differs
            (12, "zénith ltd"),  # different first token → different block
        ],
        "rid long, rname string",
    )
    got = {
        (r.id, r.rid): r.edit_dist
        for r in blocked_fuzzy_join(left, right, "name", "rname").collect()
    }
    assert got == {(1, 10): 1}


def test_blocked_fuzzy_join_custom_block_and_zero_distance(spark):
    from aws_datalake_spark.operators.linkage import blocked_fuzzy_join

    df = spark.createDataFrame([(1, "AB-1234")], "id long, code string")
    other = spark.createDataFrame([(2, "AB-1234")], "oid long, ocode string")
    out = blocked_fuzzy_join(
        df, other, "code", "ocode",
        block=F.substring("code", 1, 2),
        block_right=F.substring("ocode", 1, 2),
    ).collect()
    assert len(out) == 1 and out[0].edit_dist == 0


def test_read_fixed_width_parses_and_nulls_blank_numerics(spark, tmp_path):
    from aws_datalake_spark.sources.readers import read_fixed_width

    p = str(tmp_path / "fw")
    spark.createDataFrame(
        [("1     alpha       7   ",), ("22    beta            ",)],
        "value string",
    ).write.mode("overwrite").text(p)
    rows = {
        r.k: (r.name, r.v)
        for r in read_fixed_width(
            spark, p, [("k", 1, 6, "int"), ("name", 7, 12, "string"), ("v", 19, 4, "int")]
        ).collect()
    }
    assert rows == {1: ("alpha", 7), 22: ("beta", None)}


def test_drop_late_events_keeps_watermark_boundary(spark):
    from aws_datalake_spark.streaming.windows import drop_late_events

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 11:00:00"),
         (3, "2024-01-01 12:00:00")],
        "id long, ts string",
    ).select("id", F.col("ts").cast("timestamp").alias("ts"))
    kept = {r.id for r in drop_late_events(df, delay="1 hour").collect()}
    # wm = 12:00 − 1h = 11:00; ts == wm is NOT late (>= comparison)
    assert kept == {2, 3}


def test_ohlc_bars_known_values_and_tie_break(spark):
    from aws_datalake_spark.streaming.windows import ohlc_bars

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:05:00", 5.0),
            (2, "2024-01-01 10:05:00", 9.0),  # ts tie → event_id breaks it
            (3, "2024-01-01 10:40:00", 1.0),
            (4, "2024-01-01 11:10:00", 4.0),
        ],
        "event_id long, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    out = {
        str(r.bar_start): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in ohlc_bars(df, keys=[], bar="1 hour").collect()
    }
    assert out["2024-01-01 10:00:00"] == (5.0, 9.0, 1.0, 1.0, 3)
    assert out["2024-01-01 11:00:00"] == (4.0, 4.0, 4.0, 4.0, 1)


def test_stratified_eval_split_exact_total_and_apportionment(spark):
    from aws_datalake_spark.operators.sampling import stratified_eval_split

    rows = [(i, "en" if i % 4 else "fr", f"s{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = stratified_eval_split(df, n_eval=37).collect()
    assert len(out) == 200
    ev = [r for r in out if r.split == "eval"]
    assert len(ev) == 37  # exact, not ±√n
    # per-stratum allocation is floor or floor+1 of the exact share
    from collections import Counter

    strata = Counter((r.lang, r.source) for r in out)
    got = Counter((r.lang, r.source) for r in ev)
    for k, c in strata.items():
        share = 37 * c / 200
        assert int(share) <= got.get(k, 0) <= int(share) + 1, (k, share, got.get(k))
    # deterministic on rerun
    again = {(r.doc_id): r.split for r in stratified_eval_split(df, n_eval=37).collect()}
    assert again == {r.doc_id: r.split for r in out}


def test_stratified_eval_split_budget_over_total_takes_everything(spark):
    from aws_datalake_spark.operators.sampling import stratified_eval_split

    df = spark.createDataFrame(
        [(1, "en", "a"), (2, "en", "a"), (3, "fr", "b")],
        "doc_id long, lang string, source string",
    )
    out = stratified_eval_split(df, n_eval=10).collect()
    assert all(r.split == "eval" for r in out)
    with pytest.raises(ValueError):
        stratified_eval_split(df, n_eval=-1)
