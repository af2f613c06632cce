"""Flatten/explode operators (SURVEY B1; transformation.py:36-56,
321-389 and cleansing.py:32-33 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_datalake_spark.operators.nested import (
    deep_get,
    explode_child,
    first_element,
    flatten_rows,
    flatten_struct,
)

LINE_ITEM_JSON = """
{"id": 1, "name": "li", "startDateTime": {"date": {"year": 2024, "month": 5, "day": 2},
 "hour": 3, "minute": 4, "second": 5, "timeZoneId": "UTC"},
 "targeting": {"geoTargeting": {"targetedLocations":
   [{"id": 11, "type": "CITY"}, {"id": 12, "type": "STATE"}]}},
 "types": ["SPONSORSHIP", "NETWORK"]}
"""
EMPTY_TARGETING_JSON = """
{"id": 2, "name": "li2", "startDateTime": {"date": {"year": 2023, "month": 1, "day": 1},
 "hour": 0, "minute": 0, "second": 0, "timeZoneId": "UTC"},
 "targeting": {"geoTargeting": {"targetedLocations": []}}, "types": []}
"""


def _line_items(spark):
    return spark.read.json(spark.sparkContext.parallelize([LINE_ITEM_JSON, EMPTY_TARGETING_JSON]))


def test_flatten_struct_underscore_names(spark):
    df = _line_items(spark).select("id", "startDateTime")
    flat = flatten_struct(df)
    assert "startDateTime_date_year" in flat.columns
    assert "startDateTime_timeZoneId" in flat.columns
    row = {r.id: r for r in flat.collect()}
    assert row[1].startDateTime_date_year == 2024


def test_flatten_rows_position_index(spark):
    df = _line_items(spark).select("id", "types")
    out = flatten_rows(df)
    rows = sorted([(r.id, r.types_pos, r.types) for r in out.collect()])
    # explode_outer keeps the empty-array parent as a NULL row
    assert rows == [(1, 0, "SPONSORSHIP"), (1, 1, "NETWORK"), (2, None, None)]


def test_explode_child_drops_empty_parents(spark):
    df = _line_items(spark)
    child = explode_child(
        df,
        "targeting.geoTargeting.targetedLocations",
        ["id"],
        element_fields={"id": "location_id", "type": "location_type", "nope": "absent"},
    )
    rows = child.collect()
    assert {r.id for r in rows} == {1}  # id=2's empty array dropped (E1)
    assert sorted((r.location_id, r.location_type, r.absent) for r in rows) == [
        (11, "CITY", None),
        (12, "STATE", None),
    ]


def test_explode_child_keep_empty(spark):
    df = _line_items(spark)
    child = explode_child(
        df,
        "targeting.geoTargeting.targetedLocations",
        ["id"],
        element_fields={"id": "location_id"},
        keep_empty=True,
    )
    assert {r.id for r in child.collect()} == {1, 2}


def test_first_element_and_empty(spark):
    df = _line_items(spark)
    out = {r.id: r.t for r in df.select("id", first_element("types").alias("t")).collect()}
    assert out[1] == "SPONSORSHIP"
    assert out[2] is None  # element_at on empty → NULL


def test_deep_get_missing_path_default(spark):
    df = _line_items(spark)
    col = deep_get(df, "targeting.geoTargeting.noSuchField", default=F.lit("dflt"))
    vals = {r.id: r.v for r in df.select("id", col.alias("v")).collect()}
    assert vals == {1: "dflt", 2: "dflt"}
