"""Schema-drift reconciliation + config write-back (SURVEY B6;
ingestion.py:84-123 parity)."""

from __future__ import annotations

from aws_datalake_spark.operators.drift import reconcile_schema
from aws_datalake_spark.operators.scalar import normalize_name
from aws_datalake_spark.sources.config_store import ConfigStore

EXPECTED = ["id", "name", "status"]


def test_normalize_name_reference_cases():
    assert normalize_name("Ad Unit.Name") == "name"
    assert normalize_name("Some Col") == "some_col"
    assert normalize_name("ID") == "id"


def test_exact_match_passthrough(spark):
    df = spark.createDataFrame([(1, "a", "ok")], "id long, name string, status string")
    res = reconcile_schema(df, EXPECTED)
    assert res.columns == EXPECTED
    assert res.added_to_config == [] and res.filled_null == []


def test_extra_column_appended_to_config_order(spark):
    df = spark.createDataFrame(
        [(1, "a", "ok", 9)], "id long, name string, status string, extra long"
    )
    res = reconcile_schema(df, EXPECTED)
    assert res.columns == EXPECTED + ["extra"]
    assert res.added_to_config == ["extra"]
    assert res.df.columns == EXPECTED + ["extra"]


def test_missing_column_null_filled_and_reordered(spark):
    df = spark.createDataFrame([("ok", 1)], "status string, id long")
    res = reconcile_schema(df, EXPECTED)
    assert res.filled_null == ["name"]
    row = res.df.collect()[0]
    assert row.name is None and row.id == 1 and row.status == "ok"
    assert res.df.columns == EXPECTED


def test_messy_headers_normalized(spark):
    df = spark.createDataFrame([(1, "a")], ["Ad Unit.ID", "Ad Unit.Name"])
    res = reconcile_schema(df, EXPECTED)
    assert res.df.columns == EXPECTED
    assert res.filled_null == ["status"]


def test_config_store_write_back(tmp_path):
    store = ConfigStore(str(tmp_path))
    store.put("report_job_columns", "line_item", {"columns": ["id", "name"]})
    doc = store.append_to_list("report_job_columns", "line_item", "columns", ["extra", "id"])
    assert doc["columns"] == ["id", "name", "extra"]  # dedup, append order
    assert store.get("report_job_columns", "line_item")["columns"] == ["id", "name", "extra"]


def test_widen_types_promotes_numeric(spark):
    from aws_datalake_spark.operators.drift import widen_types

    df = spark.createDataFrame([(1, 2.5)], "a int, b float")
    out = widen_types(df, {"a": "long", "b": "double"})
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "a": "bigint", "b": "double"
    }


def test_widen_types_refuses_narrowing(spark):
    import pytest

    from aws_datalake_spark.operators.drift import widen_types

    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="non-widening"):
        widen_types(df, {"a": "integer"})
