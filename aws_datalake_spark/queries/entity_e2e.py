"""The reference's signature GAM-entity flow, composed END-TO-END.

Round-1 coverage proved every stage in isolation; this module runs
them as ONE pipeline on a line_item-shaped nested fixture — the exact
composition of /root/reference/transformation.py:259-416 (rule
projection, geoTargeting.targetedLocations child explode, generic
padding, audit timestamp, pipe-CSV zone write) with
/root/reference/loading.py:25-133 + 2137 (pipe-CSV staging read, SCD2
close-out + unconditional re-insert per entity, single-commit batch
visibility) — and checks the published warehouse state against a
DuckDB twin.

Two batches run: batch 1 snapshots every order as a line_item entity;
batch 2 re-stages the ``_id % 7 == 0`` entities with a changed status,
so the final state exercises real SCD2 history (closed 'N' versions
with a pinned record_to + re-inserted 'Y' versions) rather than a
first-load append. All timestamps are pinned (historical_date /
close_ts), making the run replayable and hash-checkable.

Scale posture: every stage is the operators' own distributed path —
the JSON zone read, one-select rule projection, explode, and SCD2
broadcast-semi merges. Nothing here collects; the fixture tables are
the only sf-sized inputs.
"""

from __future__ import annotations

import os
import shutil
from aws_datalake_spark.scratch import scratch_root

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query

_B1_DATE = "2024-01-01"
_B2_DATE = "2024-01-02"
_B1_TS = f"{_B1_DATE} 00:00:01"  # add_audit_ts stamps date + 1s
_B2_TS = f"{_B2_DATE} 00:00:01"

_MAIN_SCHEMA = (
    "_id bigint, name string, status string, cost_type string, "
    "start_year int, budget double, device_targeting string, "
    "generic1 string, insrt_ts timestamp"
)
_LOC_SCHEMA = (
    "_id bigint, location_id bigint, location_type string, "
    "canonical_parent_id bigint, location_name string, insrt_ts timestamp"
)

_E2E_ORACLE = f"""
WITH src AS (
  SELECT o_orderkey AS _id, CAST(o_custkey AS VARCHAR) AS name,
         o_orderstatus AS status,
         o_orderpriority AS cost_type,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS start_year,
         o_totalprice AS budget
  FROM orders
),
loc AS (
  SELECT l_orderkey AS _id, CAST(COUNT(*) AS BIGINT) AS n_locations
  FROM lineitem GROUP BY l_orderkey
),
main AS (
  -- batch-1 versions of re-staged keys: closed at the batch-2 merge
  SELECT _id, name, status, cost_type, start_year, budget,
         'N' AS actv_flg,
         TIMESTAMP '{_B2_TS}' AS record_to,
         TIMESTAMP '{_B1_TS}' AS insrt_ts
  FROM src WHERE _id % 7 = 0
  UNION ALL
  -- batch-2 re-inserted versions (status changed upstream)
  SELECT _id, name, 'X', cost_type, start_year, budget,
         'Y', NULL, TIMESTAMP '{_B2_TS}'
  FROM src WHERE _id % 7 = 0
  UNION ALL
  -- untouched keys keep their batch-1 active version
  SELECT _id, name, status, cost_type, start_year, budget,
         'Y', NULL, TIMESTAMP '{_B1_TS}'
  FROM src WHERE _id % 7 <> 0
)
SELECT m._id, m.name, m.status, m.cost_type, m.start_year, m.budget,
       CAST(NULL AS VARCHAR) AS device_targeting,
       CAST(NULL AS VARCHAR) AS generic1,
       m.actv_flg, m.record_to, m.insrt_ts,
       COALESCE(l.n_locations, 0) AS n_locations
FROM main m LEFT JOIN loc l ON l._id = m._id
"""


def _raw_entity_docs(orders: DataFrame, lineitem: DataFrame, status) -> DataFrame:
    """Nested line_item-shaped documents (transformation.py:321-340
    input shape): targeting.geoTargeting.targetedLocations is an
    array of {{id, type, canonicalParentId, displayName}} structs built
    from the order's lineitems. Orders with no lineitems carry a NULL
    array — the explode stage must drop them (E1 semantics)."""
    locs = lineitem.groupBy(F.col("l_orderkey").alias("_id")).agg(
        F.collect_list(
            F.struct(
                F.col("l_partkey").alias("id"),
                F.col("l_returnflag").alias("type"),
                F.col("l_suppkey").alias("canonicalParentId"),
                F.col("l_linestatus").alias("displayName"),
            )
        ).alias("__locs")
    )
    return (
        orders.select(
            F.col("o_orderkey").alias("_id"),
            F.col("o_custkey").cast("string").alias("name"),
            status.alias("status"),
            F.col("o_orderpriority").alias("costType"),
            F.struct(
                F.struct(
                    F.year("o_orderdate").alias("year"),
                    F.month("o_orderdate").alias("month"),
                    F.dayofmonth("o_orderdate").alias("day"),
                ).alias("date")
            ).alias("startDateTime"),
            F.col("o_totalprice").alias("totalBudget"),
        )
        .join(locs, "_id", "left")
        .select(
            "_id",
            "name",
            "status",
            "costType",
            "startDateTime",
            "totalBudget",
            F.struct(
                F.struct(F.col("__locs").alias("targetedLocations")).alias(
                    "geoTargeting"
                )
            ).alias("targeting"),
        )
    )


def _run_batch(
    spark: SparkSession, root: str, batch_id: str, raw: DataFrame, date: str,
    close_ts: str | None,
) -> None:
    """One full reference batch: JSON raw zone → run_transformation
    (rules → child explode → padding → audit ts → pipe-CSV staging)
    → run_batch_load (SCD2 merge per entity → atomic publish)."""
    from aws_datalake_spark.operators.rules import Rule
    from aws_datalake_spark.operators.scalar import add_audit_ts
    from aws_datalake_spark.pipelines import (
        EntityLoad,
        TransformationJob,
        run_batch_load,
        run_transformation,
    )
    from aws_datalake_spark.sources.writers import write_pipe_csv

    raw_path = f"{root}/raw/line_item/{batch_id}"
    raw.write.mode("overwrite").json(raw_path)

    job = TransformationJob(
        rules=[
            Rule("_id", "_id"),
            Rule("name", "name"),
            Rule("status", "status"),
            Rule("costType", "cost_type"),
            # P3: double-nested datetime expansion in-flow
            Rule("startDateTime.date.year", "start_year", kind="nested"),
            Rule("totalBudget", "budget"),
            # P2: schema-absent nested path must surface as NULL
            Rule(
                "targeting.technologyTargeting.deviceCategories",
                "device_targeting",
                kind="nested",
            ),
        ],
        final_columns=[
            "_id", "name", "status", "cost_type", "start_year", "budget",
            "device_targeting", "generic1", "insrt_ts",
        ],
        key_cols=["_id"],
        child_arrays={
            "line_item_targeting_locations": (
                "targeting.geoTargeting.targetedLocations"
            )
        },
        generic_padding=1,
        historical_date=date,
    )
    main_staging = f"{root}/staging/line_item/{batch_id}"
    outputs = run_transformation(spark, raw_path, main_staging, job, multi_line=False)

    # child table: element struct → reference column list
    # (transformation.py:329-336), same padding-free audit stamp
    loc_staging = f"{root}/staging/line_item_targeting_locations/{batch_id}"
    child = outputs["line_item_targeting_locations"].select(
        "_id",
        F.col("elem.id").alias("location_id"),
        F.col("elem.type").alias("location_type"),
        F.col("elem.canonicalParentId").alias("canonical_parent_id"),
        F.col("elem.displayName").alias("location_name"),
    )
    write_pipe_csv(add_audit_ts(child, historical_date=date), loc_staging)

    run_batch_load(
        spark,
        f"{root}/warehouse",
        batch_id,
        {
            "line_item": EntityLoad(
                staging_path=main_staging,
                keys=["_id"],
                staging_schema=_MAIN_SCHEMA,
                close_ts=close_ts,
            ),
            "line_item_targeting_locations": EntityLoad(
                staging_path=loc_staging,
                keys=["_id", "location_id"],
                staging_schema=_LOC_SCHEMA,
                close_ts=close_ts,
            ),
        },
    )


@query("ref_entity_end_to_end", oracle=_E2E_ORACLE)
def ref_entity_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed reference pipeline, not just its parts: nested
    line_item fixture → rules → child-table explode → padding + audit
    → pipe-CSV zones → per-entity SCD2 batch loads → single-commit
    publish → published-state readback. Batch 2 mutates _id%7==0
    entities so close-out + re-insert provably fire; the result is the
    published line_item SCD2 table with each version's ACTIVE child
    location count."""
    from aws_datalake_spark.sources.publish import read_published

    root = os.path.join(
        scratch_root(),
        f"spark_graft_e2e_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")

    _run_batch(
        spark, root, "b1",
        _raw_entity_docs(orders, lineitem, F.col("o_orderstatus")),
        _B1_DATE, close_ts=None,
    )
    _run_batch(
        spark, root, "b2",
        _raw_entity_docs(
            orders.filter(F.col("o_orderkey") % 7 == 0), lineitem, F.lit("X")
        ),
        _B2_DATE, close_ts=_B2_TS,
    )

    wh = f"{root}/warehouse"
    main = read_published(spark, wh, "line_item")
    active_locs = (
        read_published(spark, wh, "line_item_targeting_locations")
        .filter(F.col("actv_flg") == "Y")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_locations"))
    )
    return main.join(active_locs, "_id", "left").select(
        "_id", "name", "status", "cost_type", "start_year", "budget",
        "device_targeting", "generic1", "actv_flg", "record_to", "insrt_ts",
        F.coalesce("n_locations", F.lit(0).cast("long")).alias("n_locations"),
    )
