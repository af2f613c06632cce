"""Cumulative→delta state operator (SURVEY B2;
transformation.py:78-241 parity)."""

from __future__ import annotations

from aws_datalake_spark.operators.state_delta import (
    compute_deltas,
    deltas_over_history,
    upsert_state,
)


def _snapshot(spark, rows):
    return spark.createDataFrame(rows, "_id long, reference_id string, m1 long, m2 long")


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "_id long, reference_id string, m1_value long, m2_value long, time_stamp string"
    )


KEYS = ["_id", "reference_id"]
METRICS = ["m1", "m2"]


def test_key_absent_from_state_delta_is_raw(spark):
    snap = _snapshot(spark, [(1, "a", 100, 7)])
    state = _state(spark, [(9, "z", 50, 1, "t")])
    out = compute_deltas(snap, state, KEYS, METRICS).collect()
    assert (out[0].m1, out[0].m2) == (100, 7)


def test_key_present_subtracts_stored(spark):
    snap = _snapshot(spark, [(1, "a", 100, 7)])
    state = _state(spark, [(1, "a", 60, 5, "t")])
    out = compute_deltas(snap, state, KEYS, METRICS).collect()
    assert (out[0].m1, out[0].m2) == (40, 2)


def test_null_metric_treated_as_zero(spark):
    snap = _snapshot(spark, [(1, "a", None, 7)])
    state = _state(spark, [(1, "a", 60, None, "t")])
    out = compute_deltas(snap, state, KEYS, METRICS).collect()
    assert (out[0].m1, out[0].m2) == (-60, 7)


def test_no_state_table(spark):
    snap = _snapshot(spark, [(1, "a", None, 7)])
    out = compute_deltas(snap, None, KEYS, METRICS).collect()
    assert (out[0].m1, out[0].m2) == (0, 7)


def test_upsert_overwrites_and_keeps_unseen(spark):
    snap = _snapshot(spark, [(1, "a", 100, 7)])
    state = _state(spark, [(1, "a", 60, 5, "t0"), (2, "b", 9, 9, "t0")])
    out = {(r._id, r.reference_id): r for r in upsert_state(snap, state, KEYS, METRICS).collect()}
    assert out[(1, "a")].m1_value == 100 and out[(1, "a")].m2_value == 7
    assert out[(2, "b")].m1_value == 9  # unseen key survives
    assert len(out) == 2


def test_history_deltas_recover_per_period(spark):
    hist = spark.createDataFrame(
        [(1, "a", 1, 10, 3), (1, "a", 2, 25, 4), (1, "a", 3, 25, 9)],
        "_id long, reference_id string, day int, m1 long, m2 long",
    )
    out = {r.day: r for r in deltas_over_history(hist, KEYS, "day", METRICS).collect()}
    assert (out[1].m1, out[2].m1, out[3].m1) == (10, 15, 0)
    assert (out[1].m2, out[2].m2, out[3].m2) == (3, 1, 5)
