"""asof_join / bucketed_range_join edge cases."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from aws_datalake_spark.operators.joins import asof_join, bucketed_range_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_null(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 12:00:00")),
         (3, 20, _ts("2024-01-01 09:00:00"))],
        "id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:00:00"), 100.0),   # tie: inclusive
         (10, _ts("2024-01-01 11:00:00"), 200.0),
         (20, _ts("2024-01-01 11:00:00"), 300.0)],  # after left's ts
        "user_id long, ts timestamp, price double",
    )
    out = {r.id: (r.ts_r, r.price_r) for r in asof_join(left, right).collect()}
    assert out[1] == (_ts("2024-01-01 10:00:00"), 100.0)  # same-ts match
    assert out[2] == (_ts("2024-01-01 11:00:00"), 200.0)  # latest prior
    assert out[3] == (None, None)                         # nothing prior


def test_asof_payload_not_mixed_across_rows(spark):
    # Most recent right row has a NULL field — it must NOT be
    # backfilled from an older right row.
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 12:00:00"))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7.0), (1, _ts("2024-01-01 11:00:00"), None)],
        "user_id long, ts timestamp, price double",
    )
    row = asof_join(left, right).collect()[0]
    assert row.ts_r == _ts("2024-01-01 11:00:00")
    assert row.price_r is None


def test_asof_tie_picks_max_payload(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 12:00:00"))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 11:00:00"), 5.0), (1, _ts("2024-01-01 11:00:00"), 9.0)],
        "user_id long, ts timestamp, price double",
    )
    assert asof_join(left, right).collect()[0].price_r == 9.0


def test_bucketed_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")),
         (2, _ts("2024-01-01 11:30:00")),
         (3, _ts("2024-01-01 13:00:00"))],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:30:00"))],
        "iid long, s timestamp, e timestamp",
    )
    out = bucketed_range_join(
        points, intervals, point_ts="ts", start_col="s", end_col="e",
        bucket_width_s=900,
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2]  # both ends inclusive


def test_bucketed_range_join_matches_naive(spark):
    from aws_datalake_spark.catalog import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("pid"), "ts",
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("s"),
        F.col("ts").alias("e"),
    )
    v = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("vid"), F.col("ts").alias("vts")
    )
    fast = bucketed_range_join(
        v, p.drop("ts"), point_ts="vts", start_col="s", end_col="e",
        by=["user_id"], bucket_width_s=1800,
    ).select("pid", "vid")
    naive = v.join(p, "user_id").filter(
        (F.col("vts") >= F.col("s")) & (F.col("vts") <= F.col("e"))
    ).select("pid", "vid")
    assert fast.exceptAll(naive).count() == 0
    assert naive.exceptAll(fast).count() == 0
    assert naive.count() > 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00"))], "id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame([], "user_id long, ts timestamp, price double")
    out = asof_join(left, right).collect()
    assert len(out) == 1 and out[0].price_r is None


def test_scd2_empty_staging_noop(spark):
    from aws_datalake_spark.operators.scd2 import scd2_merge

    target = spark.createDataFrame(
        [(1, "x", "Y", None)], "entity_id long, v string, actv_flg string, record_to timestamp"
    )
    staging = spark.createDataFrame([], "entity_id long, v string")
    out = scd2_merge(target, staging, ["entity_id"]).collect()
    assert len(out) == 1 and out[0].actv_flg == "Y"


def test_snapshot_diff_classifies_all_change_types(spark):
    from aws_datalake_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),    # unchanged -> dropped
         (2, "b", None),    # NULL == NULL -> unchanged
         (3, "c", None),    # value -> NULL: update
         (5, "e", 50.0)],   # insert; 4 deleted
        "k long, name string, v double",
    )
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {3: "update", 4: "delete", 5: "insert"}


def test_apply_changes_roundtrips_snapshot_diff(spark):
    from aws_datalake_spark.operators.cdc import apply_changes, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    diff = snapshot_diff(old, new, ["k"])
    upserts = new.join(
        diff.filter("change_type != 'delete'").select("k"), "k", "left_semi"
    )
    deletes = diff.filter("change_type = 'delete'").select("k")
    applied = apply_changes(old, upserts, deletes, ["k"])
    assert sorted((r.k, r.v) for r in applied.collect()) == sorted(
        (r.k, r.v) for r in new.collect()
    )


def test_cogroup_asof_join_matches_native(spark):
    from aws_datalake_spark.operators.joins import asof_join, cogroup_asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d"), (3, 9, "e")],
        "user_id long, ts long, ev string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 1, 10.0), (2, 8, 80.0)],
        "user_id long, ts long, px double",
    )
    native = asof_join(left, right, on="ts", by=("user_id",))
    cg = cogroup_asof_join(left, right, on="ts", by=("user_id",))
    assert sorted(map(tuple, native.select(*cg.columns).collect())) == sorted(
        map(tuple, cg.collect())
    )


def test_cogroup_asof_join_tie_resolution_matches_native(spark):
    from aws_datalake_spark.operators.joins import asof_join, cogroup_asof_join

    left = spark.createDataFrame([(1, 10, "a")], "user_id long, ts long, ev string")
    # two right rows at the SAME ts — both impls must pick the max payload
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 10, 200.0)], "user_id long, ts long, px double"
    )
    native = asof_join(left, right, on="ts", by=("user_id",))
    cg = cogroup_asof_join(left, right, on="ts", by=("user_id",))
    assert [tuple(r) for r in native.select(*cg.columns).collect()] == [
        tuple(r) for r in cg.collect()
    ]


# ---------------------------------------------------------------------------
# bucketed_interval_overlap_join
# ---------------------------------------------------------------------------


def _iv(spark, rows, prefix):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=e))
            for i, (s, e) in enumerate(rows)
        ],
        f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp",
    )


def test_interval_overlap_join_no_duplicates_across_buckets(spark):
    """A pair overlapping MANY shared buckets must appear exactly
    once (first-shared-bucket rule), including containment and
    touching-endpoint cases."""
    from aws_datalake_spark.operators.joins import bucketed_interval_overlap_join

    left = _iv(spark, [(0, 10000), (20000, 20010)], "l")     # long + short
    right = _iv(spark, [(500, 9000), (9999, 12000), (20010, 20020)], "r")
    got = sorted(
        (r.l_id, r.r_id)
        for r in bucketed_interval_overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            bucket_width_s=1000,
        ).collect()
    )
    # l0 contains r0 (10 shared buckets → once), l0 touches r1 at
    # 9999..10000, l1 touches r2 at exactly 20010
    assert got == [(0, 0), (0, 1), (1, 2)]


def test_interval_overlap_join_matches_naive(spark):
    import random

    from aws_datalake_spark.operators.joins import bucketed_interval_overlap_join

    rng = random.Random(5)
    lrows = [(s := rng.randint(0, 50000), s + rng.randint(0, 8000)) for _ in range(60)]
    rrows = [(s := rng.randint(0, 50000), s + rng.randint(0, 8000)) for _ in range(60)]
    want = sorted(
        (i, j)
        for i, (ls, le) in enumerate(lrows)
        for j, (rs, re_) in enumerate(rrows)
        if ls <= re_ and rs <= le
    )
    got = sorted(
        (r.l_id, r.r_id)
        for r in bucketed_interval_overlap_join(
            _iv(spark, lrows, "l"), _iv(spark, rrows, "r"),
            "l_start", "l_end", "r_start", "r_end", bucket_width_s=3600,
        ).collect()
    )
    assert got == want
