"""SCD2 merge semantics (SURVEY B3; loading.py:25-133 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.scd2 import scd2_merge

def _close():
    # built lazily — F.lit needs an active session
    return F.lit("2024-06-01 00:00:00").cast("timestamp")


def _target(spark, rows):
    return spark.createDataFrame(
        rows, "entity_id long, attr string, actv_flg string, record_to timestamp"
    )


def _staging(spark, rows):
    return spark.createDataFrame(rows, "entity_id long, attr string")


def test_new_key_insert_only(spark):
    tgt = _target(spark, [(1, "a", "Y", None)])
    stg = _staging(spark, [(2, "b")])
    out = scd2_merge(tgt, stg, ["entity_id"], close_ts=_close()).collect()
    by_key = {(r.entity_id, r.actv_flg): r for r in out}
    assert len(out) == 2
    assert by_key[(1, "Y")].record_to is None  # untouched
    assert by_key[(2, "Y")].record_to is None  # fresh insert


def test_existing_active_closed_and_reinserted(spark):
    tgt = _target(spark, [(1, "old", "Y", None)])
    stg = _staging(spark, [(1, "new")])
    out = scd2_merge(tgt, stg, ["entity_id"], close_ts=_close()).collect()
    assert len(out) == 2
    closed = [r for r in out if r.actv_flg == "N"]
    fresh = [r for r in out if r.actv_flg == "Y"]
    assert len(closed) == 1 and closed[0].attr == "old"
    assert closed[0].record_to is not None
    assert len(fresh) == 1 and fresh[0].attr == "new" and fresh[0].record_to is None


def test_unchanged_row_still_reinserted(spark):
    # reference inserts unconditionally even when nothing changed
    tgt = _target(spark, [(1, "same", "Y", None)])
    stg = _staging(spark, [(1, "same")])
    out = scd2_merge(tgt, stg, ["entity_id"], close_ts=_close()).collect()
    assert sorted(r.actv_flg for r in out) == ["N", "Y"]


def test_already_inactive_untouched(spark):
    import datetime

    old_ts = datetime.datetime(2020, 1, 1)
    tgt = _target(spark, [(1, "v1", "N", old_ts), (1, "v2", "Y", None)])
    stg = _staging(spark, [(1, "v3")])
    out = scd2_merge(tgt, stg, ["entity_id"], close_ts=_close()).collect()
    assert len(out) == 3
    n_rows = sorted(
        [(r.attr, r.record_to) for r in out if r.actv_flg == "N"], key=lambda x: x[0]
    )
    assert n_rows[0] == ("v1", old_ts)  # keeps original close-out ts
    assert n_rows[1][0] == "v2" and n_rows[1][1] is not None


def test_duplicate_staging_keys(spark):
    # distinct-key close-out predicate (loading.py:33-34); both
    # staged duplicates still insert
    tgt = _target(spark, [(1, "old", "Y", None)])
    stg = _staging(spark, [(1, "d1"), (1, "d2")])
    out = scd2_merge(tgt, stg, ["entity_id"], close_ts=_close()).collect()
    assert len(out) == 3
    assert sorted(r.attr for r in out if r.actv_flg == "Y") == ["d1", "d2"]


def test_columnwise_in_quirk(spark):
    # (loading.py:934-938): row closed when creative_id matches ANY
    # staged creative AND line_item_id matches ANY staged line item —
    # even if the PAIR was never staged
    tgt = spark.createDataFrame(
        [(10, 100, "x", "Y", None), (20, 200, "y", "Y", None), (10, 300, "z", "Y", None)],
        "creative_id long, line_item_id long, attr string, actv_flg string, record_to timestamp",
    )
    stg = spark.createDataFrame(
        [(10, 200, "s")], "creative_id long, line_item_id long, attr string"
    )
    out = scd2_merge(
        tgt, stg, ["creative_id", "line_item_id"], close_ts=_close(), columnwise_keys=True
    ).collect()
    flags = {(r.creative_id, r.line_item_id, r.attr): r.actv_flg for r in out}
    # (10,200) never staged as a pair, but 10 ∈ staged creatives and
    # 200 ∈ staged line items → nothing at (10,200) in target; check
    # each target row:
    assert flags[(10, 100, "x")] == "Y"  # 100 not in staged line items
    assert flags[(20, 200, "y")] == "Y"  # 20 not in staged creatives
    assert flags[(10, 300, "z")] == "Y"  # 300 not staged
    assert flags[(10, 200, "s")] == "Y"  # the insert
    assert len(out) == 4


def test_columnwise_in_quirk_closes_cross_pair(spark):
    tgt = spark.createDataFrame(
        [(10, 200, "cross", "Y", None)],
        "creative_id long, line_item_id long, attr string, actv_flg string, record_to timestamp",
    )
    stg = spark.createDataFrame(
        [(10, 999, "a"), (77, 200, "b")],
        "creative_id long, line_item_id long, attr string",
    )
    out = scd2_merge(
        tgt, stg, ["creative_id", "line_item_id"], close_ts=_close(), columnwise_keys=True
    ).collect()
    closed = [r for r in out if r.attr == "cross"]
    assert closed[0].actv_flg == "N"  # column-wise match fires


def test_scd2_asof_selects_covering_version(spark):
    from aws_datalake_spark.operators.scd2 import scd2_asof

    dim = spark.createDataFrame(
        [
            (1, "old", "2019-01-01 00:00:00", "2024-06-01 00:00:00"),
            (1, "new", "2024-06-01 00:00:00", None),
            (2, "only", "2019-01-01 00:00:00", None),
        ],
        "k long, v string, record_from string, record_to string",
    ).selectExpr(
        "k", "v",
        "CAST(record_from AS TIMESTAMP) AS record_from",
        "CAST(record_to AS TIMESTAMP) AS record_to",
    )
    asof_2022 = {(r.k, r.v) for r in scd2_asof(dim, "2022-01-01 00:00:00").collect()}
    asof_2025 = {(r.k, r.v) for r in scd2_asof(dim, "2025-01-01 00:00:00").collect()}
    assert asof_2022 == {(1, "old"), (2, "only")}
    assert asof_2025 == {(1, "new"), (2, "only")}
    # boundary instant belongs to the NEW version (from <= ts < to)
    boundary = {(r.k, r.v) for r in scd2_asof(dim, "2024-06-01 00:00:00").collect()}
    assert boundary == {(1, "new"), (2, "only")}
