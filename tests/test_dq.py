"""DQ expectations engine (SURVEY B4; great_expectations.py parity)."""

from __future__ import annotations

from aws_datalake_spark.operators.dq import Expectation, evaluate, expectations_from_config


def _dirty_batch(spark):
    # nulls + duplicate order_ids, per the B4 fixture
    rows = [
        ("o1", "delivered", "2021-01-01 10:00:00"),
        ("o1", "delivered", "2021-01-01 11:00:00"),
        ("o2", None, "2021-01-02 10:00:00"),
        (None, "shipped", "bad-ts"),
        ("o3", "UNKNOWN_STATE", "2021-01-03 10:00:00"),
    ]
    return spark.createDataFrame(
        rows, "order_id string, order_status string, order_purchase_timestamp string"
    )


def test_counts_per_expectation(spark):
    df = _dirty_batch(spark)
    exps = [
        Expectation("order_id", "not_null"),
        Expectation("order_status", "not_null"),
        Expectation("order_status", "in_set", {"values": ["delivered", "shipped"]}),
        Expectation("order_purchase_timestamp", "matches_regex", {"regex": r"^\d{4}-\d{2}-\d{2} "}),
        Expectation("order_id", "unique"),
    ]
    audit = {
        (r.column_name, r.expectation_type): r
        for r in evaluate(df, exps, file_identifier="dirty", batch_id=3).collect()
    }
    a = audit[("order_id", "expect_column_values_to_not_be_null")]
    assert (a.element_count, a.unexpected_count, a.success) == (5, 1, False)
    b = audit[("order_status", "expect_column_values_to_be_in_set")]
    assert (b.unexpected_count, b.success) == (2, False)  # NULL + UNKNOWN_STATE
    c = audit[("order_purchase_timestamp", "expect_column_values_to_match_regex")]
    assert c.unexpected_count == 1
    d = audit[("order_id", "expect_column_values_to_be_unique")]
    assert (d.unexpected_count, d.success) == (2, False)  # both o1 rows
    assert all(r.file_identifier == "dirty" and r.batchID == 3 for r in audit.values())


def test_clean_batch_succeeds(spark):
    df = _dirty_batch(spark).filter("order_id = 'o3'")
    exps = [Expectation("order_id", "not_null"), Expectation("order_id", "unique")]
    audit = evaluate(df, exps).collect()
    assert all(r.success and r.unexpected_count == 0 for r in audit)


def test_config_compilation_skips_inactive():
    rows = [
        {"col_name": "a", "rule": "not_null", "Active": "y"},
        {"col_name": "b", "rule": "unique", "Active": "n"},
        {"col_name": "c", "rule": "between", "Active": "Y", "kwargs": {"min": 0, "max": 1}},
    ]
    exps = expectations_from_config(rows)
    assert [(e.column, e.kind) for e in exps] == [("a", "not_null"), ("c", "between")]


def test_category_drift_chi_square_contributions(spark):
    from aws_datalake_spark.operators.dq import category_drift

    base = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 2 + [("gone",)] * 2, "cat string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 6 + [("new",)] * 1, "cat string"
    )
    out = {r.cat: r for r in category_drift(base, cur, "cat").collect()}
    # expected_a = 6/10 * 10 = 6 -> (3-6)^2/6 = 1.5
    assert out["a"].expected == 6.0 and out["a"].chi2_part == 1.5
    # expected_b = 2/10 * 10 = 2 -> (6-2)^2/2 = 8.0
    assert out["b"].expected == 2.0 and out["b"].chi2_part == 8.0
    # category vanished: expected 2, observed 0 -> contribution 2.0
    assert out["gone"].n_cur == 0 and out["gone"].chi2_part == 2.0
    # brand-new category has no baseline expectation -> excluded
    assert "new" not in out


def test_observed_expectations_match_evaluate_zero_extra_scan(spark, tmp_path):
    from aws_datalake_spark.operators.dq import (
        Expectation,
        audit_from_observation,
        evaluate,
        observe_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (3, "c", 2.0), (4, None, 50.0)],
        "id long, name string, score double",
    )
    exps = [
        Expectation("name", "not_null"),
        Expectation("score", "between", {"min": 0.0, "max": 10.0}),
    ]
    observed, obs, scalar = observe_expectations(df, exps)
    # the metrics ride this write — no separate validation scan
    observed.write.mode("overwrite").parquet(str(tmp_path / "sink"))
    audit = audit_from_observation(spark, obs, scalar).collect()
    baseline = {
        (r["column_name"], r["expectation_type"]): r
        for r in evaluate(df, exps).collect()
    }
    assert len(audit) == 2
    for r in audit:
        b = baseline[(r["column_name"], r["expectation_type"])]
        assert (r["element_count"], r["unexpected_count"], r["success"]) == (
            b["element_count"], b["unexpected_count"], b["success"]
        )


def test_numeric_drift_identical_zero_shifted_positive(spark):
    from aws_datalake_spark.operators.dq import numeric_drift

    a = spark.createDataFrame([(float(i % 10),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i % 10) + 3.0,) for i in range(100)], "x double")
    same = numeric_drift(a, a, "x").collect()[0]
    assert same["tvd"] == 0.0 and same["n_base"] == 100
    moved = numeric_drift(a, b, "x").collect()[0]
    # 3/10 of current mass clamps past the baseline range → drift
    assert moved["tvd"] > 0.25
    # far-out-of-range current mass clamps to the top bin, which also
    # holds the baseline's max (p=0.1) → tvd = 1 − overlap = 0.9
    c = spark.createDataFrame([(1000.0,)] * 50, "x double")
    assert numeric_drift(a, c, "x").collect()[0]["tvd"] == 0.9


def test_quarantine_partitions_batch_with_reasons(spark):
    from aws_datalake_spark.operators.dq import Expectation, quarantine

    df = spark.createDataFrame(
        [(1, "ok", 5.0), (2, None, 5.0), (3, "ok", -1.0), (4, None, 99.0)],
        "id long, name string, score double",
    )
    exps = [
        Expectation("name", "not_null"),
        Expectation("score", "between", {"min": 0.0, "max": 10.0}),
    ]
    good, bad = quarantine(df, exps)
    assert [r["id"] for r in good.orderBy("id").collect()] == [1]
    got = {r["id"]: list(r["__reasons"]) for r in bad.collect()}
    assert got == {
        2: ["name:not_null"],
        3: ["score:between"],
        4: ["name:not_null", "score:between"],
    }
    # good ∪ bad partitions the input exactly
    assert good.count() + bad.count() == df.count()
