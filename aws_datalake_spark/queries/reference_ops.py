"""Reference-operator parity queries (SURVEY.md §2) over the lake
tables, each with a DuckDB oracle twin.

Inputs are deterministic derivations of the test-lake tables (the
lake has no GAM-shaped raw files), so every operator's semantics —
rule projection, flatten, explode-drops-empty, SCD2 close-out incl.
the column-wise-IN quirk, cumulative→delta state, DQ counts, crypto
round-trip — is checked end-to-end against plain SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.functions.crypto import generate_key, make_crypto_udfs, sha224_hash
from aws_datalake_spark.functions.datetime_parts import decompose_ts, recompose_ts
from aws_datalake_spark.operators.dq import Expectation, evaluate
from aws_datalake_spark.operators.drift import reconcile_schema
from aws_datalake_spark.operators.nested import (
    explode_child,
    first_element,
    flatten_rows,
    flatten_struct,
)
from aws_datalake_spark.operators.rules import Rule, compile_rules
from aws_datalake_spark.operators.scalar import (
    add_audit_ts,
    add_generic_padding,
    floats_to_int,
    mask_columns,
    project_final,
    replace_null_sentinel,
)
from aws_datalake_spark.operators.scd2 import scd2_merge
from aws_datalake_spark.operators.state_delta import (
    compute_deltas,
    deltas_over_history,
    upsert_state,
)
from aws_datalake_spark.queries._shared import dsum, o_dsum, t
from aws_datalake_spark.queries.registry import query
from aws_datalake_spark.sources.readers import (
    read_csv_inferred,
    read_json_docs,
    read_orc,
    read_pipe_staging,
    read_tsv,
    read_xml,
)
from aws_datalake_spark.sources.writers import (
    write_date_partitioned,
    write_json,
    write_orc,
    write_pipe_csv,
    write_xml,
)
from aws_datalake_spark.scratch import scratch_dir


# --- P1/P2 rule-driven projection --------------------------------------------

@query(
    "ref_rules_projection",
    oracle="""
    SELECT event_id AS evt_id, event_type AS etype,
           CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS INT) AS prop_k
    FROM events
    """,
)
def ref_rules_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 plain rename + P2 JSON-column nested extraction
    (transformation.py:259-283) compiled to one select."""
    ev = t(spark, sf_dir, "events")
    rules = [
        Rule(old="event_id", final="evt_id"),
        Rule(old="props.k", final="prop_k", kind="json", json_schema="k int"),
    ]
    ev2 = compile_rules(ev, rules + [Rule(old="event_type", final="etype")])
    return ev2.select("evt_id", "etype", "prop_k")


@query(
    "ref_rules_nested_missing",
    oracle="""
    SELECT user_id, event_type AS etype, CAST(NULL AS INT) AS absent
    FROM events
    """,
)
def ref_rules_nested_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2's missing-field branch: a nested rule over a path absent
    from the schema materializes NULL (transformation.py:275-280)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.struct("event_type", "value").alias("info")
    )
    rules = [
        Rule(old="user_id", final="user_id"),
        Rule(old="info.event_type", final="etype", kind="nested"),
        Rule(old="info.no_such_field", final="absent", kind="nested"),
    ]
    return compile_rules(ev, rules).withColumn("absent", F.col("absent").cast("int"))


# --- E2 flatten ---------------------------------------------------------------

@query(
    "ref_flatten_struct",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS odate_date_year,
           CAST(MONTH(o_orderdate) AS INT) AS odate_date_month,
           CAST(DAY(o_orderdate) AS INT) AS odate_date_day,
           o_orderstatus AS meta_status, o_orderpriority AS meta_priority
    FROM orders
    """,
)
def ref_flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 — recursive struct flatten with underscore-joined names
    (cleansing.py:32-33), on a GAM-decomposed-datetime-shaped nest
    (loading.py:65-71)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.struct(
                F.year("o_orderdate").alias("year"),
                F.month("o_orderdate").alias("month"),
                F.dayofmonth("o_orderdate").alias("day"),
            ).alias("date")
        ).alias("odate"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("meta"),
    )
    flat = flatten_struct(o)
    return flat.select(
        "o_orderkey",
        F.col("odate_date_year"),
        F.col("odate_date_month"),
        F.col("odate_date_day"),
        "meta_status",
        "meta_priority",
    )


@query(
    "ref_flatten_rows",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(l, 1) - 1 AS INT) AS words_pos,
           unnest(l) AS words
    FROM (SELECT doc_id, string_split(text, ' ') AS l
          FROM documents WHERE doc_id < 50)
    """,
)
def ref_flatten_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 arrays→rows with position index (flatten_json list parity,
    normalized to rows — see operators/nested.py docstring)."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    return flatten_rows(d)


# --- E1/E4 explode child tables ----------------------------------------------

@query(
    "ref_explode_drops_empty",
    oracle="""
    SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                      w -> LENGTH(w) > 8)) AS word
    FROM documents
    """,
)
def ref_explode_drops_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 — extend_columns_in_rows drops parents with empty arrays
    (transformation.py:45-56); plain explode matches exactly."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda w: F.length(w) > 8).alias("arr"),
    )
    return explode_child(d, "arr", ["doc_id"]).withColumnRenamed("elem", "word")


@query(
    "ref_explode_child_fields",
    oracle="""
    SELECT doc_id, lang,
           unnest(string_split(text, ' ')) AS word,
           'targetted' AS targetting_type
    FROM documents WHERE doc_id < 30
    """,
)
def ref_explode_child_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 — array-of-struct → child table with per-element field
    extraction + literal column (transformation.py:321-370)."""
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select(
            "doc_id",
            "lang",
            F.transform(
                F.split("text", " "), lambda w: F.struct(w.alias("w"), F.length(w).alias("n"))
            ).alias("elems"),
        )
    )
    child = explode_child(
        d, "elems", ["doc_id", "lang"], element_fields={"w": "word", "missing": "gone"}
    )
    return child.select(
        "doc_id", "lang", "word", F.lit("targetted").alias("targetting_type")
    )


@query(
    "ref_first_element",
    oracle="""
    SELECT o_orderkey,
           CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_rank
    FROM orders
    """,
)
def ref_first_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 — types[0] first-element (transformation.py:392-393)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        first_element(F.split("o_orderpriority", "-")).cast("int").alias("prio_rank"),
    )


# --- scalar hygiene -----------------------------------------------------------

@query(
    "ref_null_sentinel",
    oracle="""
    SELECT NULLIF(c_mktsegment, 'BUILDING') AS segment, COUNT(*) AS n
    FROM customer GROUP BY 1
    """,
)
def ref_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — sentinel→NULL (ingestion.py:83), sentinel parameterized."""
    c = replace_null_sentinel(
        t(spark, sf_dir, "customer"), sentinel="BUILDING", cols=["c_mktsegment"]
    )
    return (
        c.select(F.col("c_mktsegment").alias("segment"))
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
    )


@query(
    "ref_floats_to_int",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(TRUNC(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(TRUNC(l_extendedprice) AS BIGINT)) AS BIGINT) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ref_floats_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — float→int coercion of every float column
    (ingestion.py:38-43). Spark's long cast truncates; oracle TRUNCs
    explicitly because DuckDB's cast rounds."""
    l = floats_to_int(
        t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity", "l_extendedprice")
    )
    return l.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_extendedprice").alias("sum_price"),
    )


@query(
    "ref_padding_audit_ts",
    oracle="""
    SELECT r_regionkey, r_name,
           CAST(NULL AS VARCHAR) AS generic1, CAST(NULL AS VARCHAR) AS generic2,
           CAST(NULL AS VARCHAR) AS generic3, CAST(NULL AS VARCHAR) AS generic4,
           CAST(NULL AS VARCHAR) AS generic5,
           TIMESTAMP '2024-01-15 00:00:01' AS insrt_ts
    FROM region
    """,
)
def ref_padding_audit_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 generic padding + P13 historical audit ts (date + 1s,
    ingestion.py:24-36)."""
    r = add_generic_padding(t(spark, sf_dir, "region"), n=5)
    return add_audit_ts(r, historical_date="2024-01-15 00:00:00")


@query(
    "ref_mask_and_project",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS VARCHAR) AS c_phone
    FROM customer
    """,
)
def ref_mask_and_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17 masking drop (partitioning.py:62-69) + P6 final-list
    projection with NULL-fill (transformation.py:395)."""
    c = mask_columns(t(spark, sf_dir, "customer"), ["c_acctbal", "not_a_column"])
    return project_final(c, ["c_custkey", "c_name", "c_mktsegment", "c_phone"])


@query(
    "ref_schema_reconcile",
    oracle="""
    SELECT n_nationkey AS nationkey, n_name AS name,
           CAST(NULL AS VARCHAR) AS comment_col, n_regionkey AS regionkey
    FROM nation
    """,
)
def ref_schema_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 — drift reconciliation (ingestion.py:84-123): messy
    incoming names normalized, expected-but-missing column NULL-
    filled, newly-seen column appended after the config order."""
    n = t(spark, sf_dir, "nation").toDF("Nation.NationKey", "Nation.Name", "Region Key")
    res = reconcile_schema(n, ["nationkey", "name", "comment_col"])
    assert res.added_to_config == ["region_key"]
    assert res.filled_null == ["comment_col"]
    return res.df.withColumnRenamed("region_key", "regionkey")


# --- decomposed datetime ------------------------------------------------------

@query(
    "ref_decompose_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(DAY(o_orderdate) AS INT) AS o_orderdate_date_day,
           CAST(MONTH(o_orderdate) AS INT) AS o_orderdate_date_month,
           CAST(YEAR(o_orderdate) AS INT) AS o_orderdate_date_year,
           CAST(HOUR(o_orderdate) AS INT) AS o_orderdate_hour,
           CAST(MINUTE(o_orderdate) AS INT) AS o_orderdate_minute,
           CAST(SECOND(o_orderdate) AS INT) AS o_orderdate_second,
           'UTC' AS o_orderdate_timezoneid
    FROM orders
    """,
)
def ref_decompose_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/§1.2 — GAM 7-column decomposed datetime (loading.py:65-71)."""
    o = decompose_ts(t(spark, sf_dir, "orders"), "o_orderdate")
    return o.select("o_orderkey", *[c for c in o.columns if c.startswith("o_orderdate_")])


@query(
    "ref_recompose_datetime",
    oracle="SELECT o_orderkey, o_orderdate AS rebuilt FROM orders",
)
def ref_recompose_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_timestamp reconstruction round-trip (SURVEY §1.2)."""
    o = decompose_ts(t(spark, sf_dir, "orders"), "o_orderdate")
    return o.select("o_orderkey", recompose_ts("o_orderdate").alias("rebuilt"))


# --- SCD2 merge ---------------------------------------------------------------

_SCD2_ORACLE = """
WITH target AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN 'N' ELSE 'Y' END AS actv_flg,
         CASE WHEN o_orderkey % 5 = 0 THEN TIMESTAMP '2020-01-01 00:00:00' END AS record_to
  FROM orders WHERE o_orderkey % 2 = 0),
staging AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 3 = 0)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       CASE WHEN actv_flg = 'Y'
             AND o_orderkey IN (SELECT o_orderkey FROM staging)
            THEN 'N' ELSE actv_flg END AS actv_flg,
       CASE WHEN actv_flg = 'Y'
             AND o_orderkey IN (SELECT o_orderkey FROM staging)
            THEN TIMESTAMP '2024-06-01 00:00:00' ELSE record_to END AS record_to
FROM target
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus, 'Y', NULL FROM staging
"""


@query("ref_scd2_merge", oracle=_SCD2_ORACLE)
def ref_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — SCD2 close-out + unconditional re-insert
    (loading.py:25-133): staged keys close active target rows; every
    staging row lands as a new 'Y' version; already-inactive rows
    keep their original record_to."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    target = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn(
            "actv_flg", F.when(F.col("o_orderkey") % 5 == 0, "N").otherwise("Y")
        )
        .withColumn(
            "record_to",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.lit("2020-01-01 00:00:00")
            ).cast("timestamp"),
        )
    )
    staging = o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    return scd2_merge(
        target,
        staging,
        keys=["o_orderkey"],
        close_ts=F.lit("2024-06-01 00:00:00").cast("timestamp"),
    )


_SCD2_CW_ORACLE = """
WITH target AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, 'Y' AS actv_flg,
         CAST(NULL AS TIMESTAMP) AS record_to
  FROM lineitem WHERE l_orderkey % 7 = 0),
staging AS (
  SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
  FROM lineitem WHERE l_orderkey % 11 = 0)
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity,
       CASE WHEN l_partkey IN (SELECT l_partkey FROM staging)
             AND l_suppkey IN (SELECT l_suppkey FROM staging)
            THEN 'N' ELSE 'Y' END AS actv_flg,
       CASE WHEN l_partkey IN (SELECT l_partkey FROM staging)
             AND l_suppkey IN (SELECT l_suppkey FROM staging)
            THEN TIMESTAMP '2024-06-01 00:00:00' END AS record_to
FROM target
UNION ALL
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, 'Y', NULL FROM staging
"""


@query("ref_scd2_columnwise_in", oracle=_SCD2_CW_ORACLE)
def ref_scd2_columnwise_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — the composite-key COLUMN-WISE IN quirk
    (loading.py:934-938): close when creative_id matches ANY staged
    creative AND line_item_id matches ANY staged line item — not the
    pair. Reproduced here on (l_partkey, l_suppkey)."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    target = (
        l.filter(F.col("l_orderkey") % 7 == 0)
        .withColumn("actv_flg", F.lit("Y"))
        .withColumn("record_to", F.lit(None).cast("timestamp"))
    )
    staging = l.filter(F.col("l_orderkey") % 11 == 0)
    return scd2_merge(
        target,
        staging,
        keys=["l_partkey", "l_suppkey"],
        close_ts=F.lit("2024-06-01 00:00:00").cast("timestamp"),
        columnwise_keys=True,
    )


# --- cumulative→delta state ---------------------------------------------------

_STATE_DELTA_ORACLE = """
WITH state AS (
  SELECT o_custkey, COUNT(*) AS n_orders_value,
         CAST(SUM(CAST(TRUNC(o_totalprice) AS BIGINT)) AS BIGINT) AS spend_value
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY o_custkey),
snapshot AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(TRUNC(o_totalprice) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY o_custkey)
SELECT s.o_custkey,
       s.n_orders - COALESCE(st.n_orders_value, 0) AS n_orders,
       s.spend - COALESCE(st.spend_value, 0) AS spend
FROM snapshot s LEFT JOIN state st ON s.o_custkey = st.o_custkey
"""


@query("ref_state_delta", oracle=_STATE_DELTA_ORACLE)
def ref_state_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/J1 — delta = current cumulative − stored cumulative with
    0 defaults (transformation.py:87-98), set-based instead of the
    reference's per-row DynamoDB RPC (transformation.py:407)."""
    o = t(spark, sf_dir, "orders")
    spend = F.sum(F.floor("o_totalprice").cast("long")).alias("spend")
    state = (
        o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders_value"),
            spend.alias("spend_value"),
        )
    )
    snapshot = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"), spend)
    return compute_deltas(snapshot, state, keys=["o_custkey"], metrics=["n_orders", "spend"])


_STATE_UPSERT_ORACLE = """
WITH state AS (
  SELECT o_custkey, COUNT(*) AS n_orders_value
  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
snapshot AS (
  SELECT o_custkey, COUNT(*) AS n_orders
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
SELECT o_custkey, n_orders_value FROM state
WHERE o_custkey NOT IN (SELECT o_custkey FROM snapshot)
UNION ALL
SELECT o_custkey, n_orders AS n_orders_value FROM snapshot
"""


@query("ref_state_upsert", oracle=_STATE_UPSERT_ORACLE)
def ref_state_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S21 — state upsert: snapshot keys overwrite, unseen state keys
    survive (transformation.py:100-118)."""
    o = t(spark, sf_dir, "orders")
    state = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders_value"))
        .withColumn("time_stamp", F.lit("2024-01-01 00:00:00"))
    )
    snapshot = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    new_state = upsert_state(snapshot, state, keys=["o_custkey"], metrics=["n_orders"])
    return new_state.select("o_custkey", "n_orders_value")


_DELTA_HISTORY_ORACLE = """
SELECT o_custkey, yr,
       cum - COALESCE(LAG(cum) OVER (PARTITION BY o_custkey ORDER BY yr), 0) AS n_orders
FROM (
  SELECT o_custkey, CAST(YEAR(o_orderdate) AS INT) AS yr,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY o_custkey
                                  ORDER BY CAST(YEAR(o_orderdate) AS INT)) AS BIGINT) AS cum
  FROM orders GROUP BY o_custkey, YEAR(o_orderdate))
"""


@query("ref_state_delta_history", oracle=_DELTA_HISTORY_ORACLE)
def ref_state_delta_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 temporal form — lag-window deltas over an in-lake snapshot
    history recover the per-period values (SURVEY §2.5 A3)."""
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_custkey").orderBy("yr")
    history = yearly.select(
        "o_custkey", "yr", F.sum("n").over(w).cast("long").alias("cum")
    )
    out = deltas_over_history(history, keys=["o_custkey"], order_col="yr", metrics=["cum"])
    return out.withColumnRenamed("cum", "n_orders")


# --- DQ expectations ----------------------------------------------------------

_DQ_ORACLE = """
SELECT 'orders' AS file_identifier, CAST(7 AS BIGINT) AS batchID,
       'o_custkey' AS column_name,
       'expect_column_values_to_not_be_null' AS expectation_type,
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) = 0 AS success,
       COUNT(*) AS element_count,
       COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS unexpected_count
FROM orders
UNION ALL
SELECT 'orders', 7, 'o_orderstatus', 'expect_column_values_to_be_in_set',
       COUNT(CASE WHEN o_orderstatus NOT IN ('F','O') OR o_orderstatus IS NULL THEN 1 END) = 0,
       COUNT(*),
       COUNT(CASE WHEN o_orderstatus NOT IN ('F','O') OR o_orderstatus IS NULL THEN 1 END)
FROM orders
UNION ALL
SELECT 'orders', 7, 'o_orderpriority', 'expect_column_values_to_match_regex',
       COUNT(CASE WHEN NOT regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 END) = 0,
       COUNT(*),
       COUNT(CASE WHEN NOT regexp_matches(o_orderpriority, '^[0-9]-') THEN 1 END)
FROM orders
UNION ALL
SELECT 'orders', 7, 'o_totalprice', 'expect_column_values_to_be_between',
       COUNT(CASE WHEN o_totalprice < 0 OR o_totalprice > 100000 THEN 1 END) = 0,
       COUNT(*),
       COUNT(CASE WHEN o_totalprice < 0 OR o_totalprice > 100000 THEN 1 END)
FROM orders
UNION ALL
SELECT 'orders', 7, 'o_custkey', 'expect_column_values_to_be_unique',
       (SELECT COALESCE(SUM(n), 0) FROM (
          SELECT COUNT(*) n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1)) = 0,
       COUNT(*),
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
          SELECT COUNT(*) n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1))
FROM orders
"""


@query("ref_dq_expectations", oracle=_DQ_ORACLE)
def ref_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A4/A5/ST2-ST3 — config-compiled expectation suite in one
    aggregation pass; audit schema per great_expectations.py:318-338."""
    o = t(spark, sf_dir, "orders")
    exps = [
        Expectation("o_custkey", "not_null"),
        Expectation("o_orderstatus", "in_set", {"values": ["F", "O"]}),
        Expectation("o_orderpriority", "matches_regex", {"regex": "^[0-9]-"}),
        Expectation("o_totalprice", "between", {"min": 0, "max": 100000}),
        Expectation("o_custkey", "unique"),
    ]
    return evaluate(o, exps, file_identifier="orders", batch_id=7)


# --- crypto -------------------------------------------------------------------

@query(
    "ref_crypto_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(*) AS n_roundtrip_ok, COUNT(*) AS n_distinct_tokens
    FROM customer WHERE c_custkey <= 200
    """,
)
def ref_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2/U4/U6 — Fernet encrypt→decrypt round-trip with a
    broadcast key via Arrow-batched pandas_udfs (createKey.py:107-140,
    ccrypto.py:15-46). The oracle asserts every row round-trips and
    every token is unique (Fernet IVs are random per value)."""
    encrypt_col, decrypt_col = make_crypto_udfs(spark, generate_key())
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    enc = c.select(
        "c_name", encrypt_col(F.col("c_name")).alias("token")
    ).select("c_name", "token", decrypt_col(F.col("token")).alias("back"))
    return enc.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("back") == F.col("c_name"), 1)).alias("n_roundtrip_ok"),
        F.countDistinct("token").alias("n_distinct_tokens"),
    )


@query(
    "ref_sha224_pseudonymize",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS n_distinct_hash,
           CAST(56 AS INT) AS len_min, CAST(56 AS INT) AS len_max
    FROM customer
    """,
)
def ref_sha224_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — sha2(col, 224) JVM-side pseudonymization (ccrypto.py:48-52).
    DuckDB lacks SHA-224, so the oracle checks distinctness + digest
    length; the fixed golden digests live in tests/test_crypto.py."""
    c = t(spark, sf_dir, "customer").select(sha224_hash("c_custkey").alias("h"))
    return c.agg(
        F.count("*").alias("n"),
        F.countDistinct("h").alias("n_distinct_hash"),
        F.min(F.length("h")).cast("int").alias("len_min"),
        F.max(F.length("h")).cast("int").alias("len_max"),
    )


# --- sinks/sources round-trip -------------------------------------------------

@query(
    "ref_pipe_csv_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
    FROM orders
    """,
)
def ref_pipe_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 + S15 — pipe-CSV sink (transformation.py:410-412) read
    back under the warehouse COPY contract (loading.py:26-30),
    including the 'yyyy-MM-dd HH:mm:ss' timestamp format."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    tmp = scratch_dir(prefix="pipe_csv_")
    path = f"{tmp}/orders_pipe"
    write_pipe_csv(o, path)
    back = read_pipe_staging(
        spark, path, schema="o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    )
    return back.agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )


@query(
    "ref_profile_columns",
    oracle="""
    SELECT 'l_orderkey' AS col_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT l_orderkey) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_s,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_s
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', COUNT(*),
           CAST(SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_linenumber),
           CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_returnflag),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
    FROM lineitem
    """,
)
def ref_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan column profiler (operators/dq.py:profile_columns)
    — the table-level DQ summary feeding expectation thresholds; the
    oracle's UNION-ALL-of-aggregates form is the N-scan shape the
    one-scan stack plan replaces."""
    from aws_datalake_spark.operators.dq import profile_columns

    return profile_columns(
        t(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber", "l_returnflag"]
    )


@query(
    "ref_orc_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(p_partkey) AS BIGINT) AS sum_key,
           MIN(p_type) AS min_type, MAX(p_type) AS max_type
    FROM part
    """,
)
def ref_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-parity check for the ORC source/sink pair: write a
    projection out as ORC, read it back, aggregate. Widens the S4-S17
    source surface beyond csv/json/parquet/text."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    tmp = scratch_dir(prefix="orc_roundtrip_")
    path = f"{tmp}/part_orc"
    write_orc(p, path)
    back = read_orc(spark, path)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("p_partkey").alias("sum_key"),
        F.min("p_type").alias("min_type"),
        F.max("p_type").alias("max_type"),
    )


@query(
    "ref_json_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
           MIN(n_name) AS min_name, MAX(n_name) AS max_name
    FROM nation
    """,
)
def ref_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S10 — JSON sink (ingestion.py:273-279) then the JSON
    document reader (ingestion.py:274-275) with an explicit schema
    (line-delimited at scale; multiLine off for the splittable path),
    aggregated so any dropped/duplicated/retyped row hash-mismatches
    against the source-table oracle."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tmp = scratch_dir(prefix="json_roundtrip_")
    path = f"{tmp}/nation_json"
    write_json(n, path)
    back = read_json_docs(
        spark, path, schema="n_nationkey bigint, n_name string", multi_line=False
    )
    return back.agg(
        F.count("*").alias("n"),
        F.sum("n_nationkey").alias("sum_key"),
        F.min("n_name").alias("min_name"),
        F.max("n_name").alias("max_name"),
    )


@query(
    "ref_csv_inferred_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
           CAST(SUM(CAST(ROUND(s_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS sum_bal_cents
    FROM supplier
    """,
)
def ref_csv_inferred_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — header + inferSchema CSV read
    (great_expectations.py:60-63) over a CSV the engine itself wrote;
    inference must recover bigint/double exactly (cents-sum pins the
    float parse)."""
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    tmp = scratch_dir(prefix="csv_inferred_")
    path = f"{tmp}/supplier_csv"
    s.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv_inferred(spark, path)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("s_suppkey").alias("sum_key"),
        F.sum(F.round(F.col("s_acctbal") * F.lit(100.0), 0).cast("long")).alias(
            "sum_bal_cents"
        ),
    )


@query(
    "ref_tsv_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(r_regionkey) AS BIGINT) AS sum_key,
           MIN(r_name) AS min_name, MAX(r_name) AS max_name
    FROM region
    """,
)
def ref_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — tab-delimited read (Great Expectation PoC.py:13-14):
    write region as TSV, read back with header + delimiter='\\t' +
    inferSchema, aggregate against the source table."""
    r = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    tmp = scratch_dir(prefix="tsv_roundtrip_")
    path = f"{tmp}/region_tsv"
    r.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
    back = read_tsv(spark, path)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("r_regionkey").alias("sum_key"),
        F.min("r_name").alias("min_name"),
        F.max("r_name").alias("max_name"),
    )


@query(
    "ref_partitioned_layout",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) AS year,
           lpad(CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR), 2, '0') AS month,
           COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1996
    GROUP BY 1, 2
    """,
)
def ref_partitioned_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 — hive-style year=/month=/day= date-partitioned layout
    with zero-padded month/day (ingestion.py:230-247 key templating):
    write orders partitioned, read back with a year filter that must
    resolve by partition-directory pruning (asserted: the scan's
    partition count), then aggregate per month. Partition values come
    back as strings from the hive path segments — the query keeps
    them as such and the oracle casts to match, pinning the
    zero-padding contract ('03', not '3')."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    tmp = scratch_dir(prefix="part_layout_")
    path = f"{tmp}/orders_by_date"
    write_date_partitioned(o, path, "o_orderdate")
    # keep partition values as the path-segment strings ('03', not 3):
    # type inference would coerce them to int and drop the zero-pad
    # the reference's key templating guarantees
    conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        back = spark.read.parquet(path).filter(F.col("year") == "1996")
    finally:
        spark.conf.set(conf, prev)
    # partition pruning must reach the file listing: a full-layout
    # scan would read ~7 years of directories for a 1-year answer
    plan = back._jdf.queryExecution().executedPlan().toString()
    n_part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert n_part and "year" in n_part[0], plan
    return back.groupBy("year", "month").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
    )


@query(
    "ref_xml_roundtrip",
    oracle="""
    SELECT COUNT(*) AS n, CAST(SUM(p_partkey) AS BIGINT) AS sum_key,
           MIN(p_brand) AS min_mfgr, MAX(p_brand) AS max_mfgr
    FROM part
    """,
)
def ref_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink parity (Spark 4 built-in spark-xml): write a
    projection as row-tagged XML, read it back with an explicit
    schema, aggregate against the source table. Completes the
    interchange-format matrix (csv/tsv/pipe/json/orc/parquet/xml)."""
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    tmp = scratch_dir(prefix="xml_roundtrip_")
    path = f"{tmp}/part_xml"
    write_xml(p, path)
    back = read_xml(spark, path, schema="p_partkey bigint, p_brand string")
    return back.agg(
        F.count("*").alias("n"),
        F.sum("p_partkey").alias("sum_key"),
        F.min("p_brand").alias("min_mfgr"),
        F.max("p_brand").alias("max_mfgr"),
    )


@query(
    "ref_snapshot_diff",
    oracle="""
    WITH oldt AS (SELECT * FROM customer),
    newt AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 17 = 0
    ), j AS (
      SELECT o.c_custkey AS ok, n.c_custkey AS nk,
             CASE WHEN o.c_custkey IS NULL THEN 'insert'
                  WHEN n.c_custkey IS NULL THEN 'delete'
                  WHEN (o.c_name IS DISTINCT FROM n.c_name)
                       OR (o.c_nationkey IS DISTINCT FROM n.c_nationkey)
                       OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
                       OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
                  THEN 'update' END AS change_type
      FROM oldt o FULL OUTER JOIN newt n ON o.c_custkey = n.c_custkey
    )
    SELECT COALESCE(ok, nk) AS c_custkey, change_type
    FROM j WHERE change_type IS NOT NULL
    """,
)
def ref_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two daily snapshots (operators/cdc.py): the change
    set the reference's SCD2 load (loading.py:32-130) should have
    merged instead of re-versioning every row. New snapshot is
    synthesized deterministically from customer: ~1/13 deleted,
    ~1/10 updated (acctbal +100), ~1/17 re-inserted under new keys."""
    from aws_datalake_spark.operators.cdc import snapshot_diff

    cust = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    updated = cust.filter(k % 13 != 0).withColumn(
        "c_acctbal",
        F.when(k % 10 == 0, F.col("c_acctbal") + F.lit(100.0)).otherwise(
            F.col("c_acctbal")
        ),
    )
    inserted = cust.filter(k % 17 == 0).withColumn(
        "c_custkey", k + F.lit(10000000)
    )
    new = updated.unionByName(inserted)
    return snapshot_diff(cust, new, ["c_custkey"])


@query(
    "ref_apply_changes",
    oracle="""
    WITH newt AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 17 = 0
    )
    SELECT COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS sum_key,
           CAST(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_bal
    FROM newt
    """,
)
def ref_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply (operators/cdc.py:apply_changes): replays the
    ref_snapshot_diff change set onto the old snapshot and aggregates
    the result — which must equal the new snapshot exactly, proving
    diff→apply round-trips."""
    from aws_datalake_spark.operators.cdc import apply_changes

    cust = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    updated = cust.filter(k % 13 != 0).withColumn(
        "c_acctbal",
        F.when(k % 10 == 0, F.col("c_acctbal") + F.lit(100.0)).otherwise(
            F.col("c_acctbal")
        ),
    )
    inserted = cust.filter(k % 17 == 0).withColumn(
        "c_custkey", k + F.lit(10000000)
    )
    new = updated.unionByName(inserted)
    # change set: upserts = new-side rows that differ or are new;
    # deletes = keys present only in old
    from aws_datalake_spark.operators.cdc import snapshot_diff

    diff = snapshot_diff(cust, new, ["c_custkey"])
    upserts = new.join(
        diff.filter(F.col("change_type") != "delete").select("c_custkey"),
        "c_custkey",
        "left_semi",
    )
    deletes = diff.filter(F.col("change_type") == "delete").select("c_custkey")
    applied = apply_changes(cust, upserts, deletes, ["c_custkey"])
    return applied.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_custkey").alias("sum_key"),
        (
            F.sum(F.round(F.col("c_acctbal") * F.lit(100.0), 0).cast("long"))
            .cast("double")
            / F.lit(100.0)
        ).alias("sum_bal"),
    )


_SCD2_ASOF_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice,
         TIMESTAMP '2019-01-01 00:00:00' AS record_from,
         CASE WHEN o_orderkey % 3 = 0
              THEN TIMESTAMP '2024-06-01 00:00:00' END AS record_to
  FROM orders WHERE o_orderkey % 2 = 0),
v2 AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
         TIMESTAMP '2024-06-01 00:00:00' AS record_from,
         CAST(NULL AS TIMESTAMP) AS record_to
  FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0),
dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT o_orderkey, o_totalprice, '2022' AS as_of FROM dim
WHERE record_from <= TIMESTAMP '2022-07-01 00:00:00'
  AND (record_to IS NULL OR record_to > TIMESTAMP '2022-07-01 00:00:00')
UNION ALL
SELECT o_orderkey, o_totalprice, '2025' AS as_of FROM dim
WHERE record_from <= TIMESTAMP '2025-01-01 00:00:00'
  AND (record_to IS NULL OR record_to > TIMESTAMP '2025-01-01 00:00:00')
"""


@query("ref_scd2_asof_read", oracle=_SCD2_ASOF_ORACLE)
def ref_scd2_asof_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time read over a versioned dimension
    (operators/scd2.py:scd2_asof): as of 2022 every key shows its v1
    price; as of 2025 re-priced keys show v2 — the time-travel
    semantics the reference's actv_flg/record_to columns exist for
    (loading.py:32-130) but that it never exposes as a query."""
    from aws_datalake_spark.operators.scd2 import scd2_asof

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    even = o.filter(F.col("o_orderkey") % 2 == 0)
    v1 = even.select(
        "o_orderkey",
        "o_totalprice",
        F.lit("2019-01-01 00:00:00").cast("timestamp").alias("record_from"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.lit("2024-06-01 00:00:00").cast("timestamp"),
        ).alias("record_to"),
    )
    v2 = even.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit("2024-06-01 00:00:00").cast("timestamp").alias("record_from"),
        F.lit(None).cast("timestamp").alias("record_to"),
    )
    dim = v1.unionByName(v2)
    early = scd2_asof(dim, "2022-07-01 00:00:00").select(
        "o_orderkey", "o_totalprice", F.lit("2022").alias("as_of")
    )
    late = scd2_asof(dim, "2025-01-01 00:00:00").select(
        "o_orderkey", "o_totalprice", F.lit("2025").alias("as_of")
    )
    return early.unionByName(late)


@query(
    "ref_temporal_dim_join",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey AS k, o_totalprice AS price,
             TIMESTAMP '1990-01-01 00:00:00' AS record_from,
             CASE WHEN o_orderkey % 3 = 0
                  THEN TIMESTAMP '1996-01-01 00:00:00' END AS record_to
      FROM orders WHERE o_orderkey % 2 = 0),
    v2 AS (
      SELECT o_orderkey AS k, o_totalprice * 2 AS price,
             TIMESTAMP '1996-01-01 00:00:00' AS record_from,
             CAST(NULL AS TIMESTAMP) AS record_to
      FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey % 3 = 0),
    dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT o.o_orderkey, o.o_orderdate, dim.price AS price_at_order
    FROM orders o JOIN dim ON o.o_orderkey = dim.k
    WHERE dim.record_from <= o.o_orderdate
      AND (dim.record_to IS NULL OR dim.record_to > o.o_orderdate)
    """,
)
def ref_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal fact→dimension join: each order picks the dimension
    VERSION valid at its own order date (re-priced keys flip at
    1996-01-01). The equi key drives a hash join; the validity
    interval is a post-join filter, so no nested-loop plan appears —
    the standard point-in-time-correct feature-join shape (training
    pipelines call this preventing feature leakage)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    base = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    even = base.filter(F.col("o_orderkey") % 2 == 0)
    v1 = even.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.lit("1990-01-01 00:00:00").cast("timestamp").alias("record_from"),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
        ).alias("record_to"),
    )
    v2 = even.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") * 2).alias("price"),
        F.lit("1996-01-01 00:00:00").cast("timestamp").alias("record_from"),
        F.lit(None).cast("timestamp").alias("record_to"),
    )
    dim = v1.unionByName(v2)
    j = o.join(dim, o.o_orderkey == dim.k)
    return j.filter(
        (F.col("record_from") <= F.col("o_orderdate"))
        & (F.col("record_to").isNull() | (F.col("record_to") > F.col("o_orderdate")))
    ).select("o_orderkey", "o_orderdate", F.col("price").alias("price_at_order"))


@query(
    "ref_numeric_drift",
    oracle="""
    WITH base AS (SELECT value FROM events
                  WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
                    AND value IS NOT NULL),
    cur AS (SELECT value FROM events
            WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
              AND value IS NOT NULL),
    bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM base),
    pb AS (SELECT LEAST(19, GREATEST(0,
              CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT))) AS bin,
              COUNT(*) AS n_base
           FROM base, bounds GROUP BY 1),
    pc AS (SELECT LEAST(19, GREATEST(0,
              CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT))) AS bin,
              COUNT(*) AS n_cur
           FROM cur, bounds GROUP BY 1),
    j AS (SELECT COALESCE(pb.bin, pc.bin) AS bin,
                 COALESCE(n_base, 0) AS n_base,
                 COALESCE(n_cur, 0) AS n_cur
          FROM pb FULL OUTER JOIN pc ON pb.bin = pc.bin),
    t AS (SELECT n_base, n_cur,
                 CAST(n_base AS DOUBLE) / CAST(SUM(n_base) OVER () AS DOUBLE) AS p,
                 CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE) AS q
          FROM j)
    SELECT 0.5 * CAST(SUM(CAST(ROUND(ABS(p - q) * 1000000000.0) AS BIGINT))
                      AS DOUBLE) / 1000000000.0 AS tvd,
           CAST(SUM(n_base) AS BIGINT) AS n_base,
           CAST(SUM(n_cur) AS BIGINT) AS n_cur
    FROM t
    """,
)
def ref_numeric_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric distribution drift between ingest batches (first vs
    second half of the month) as total-variation distance over a
    20-bin histogram — the log-free companion to ref_category_drift
    (operators/dq.py:numeric_drift)."""
    from aws_datalake_spark.operators.dq import numeric_drift

    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    return numeric_drift(
        ev.filter(F.col("ts") < cut),
        ev.filter(F.col("ts") >= cut),
        "value",
    )


@query(
    "ref_dq_quarantine",
    oracle="""
    WITH tagged AS (
      SELECT list_filter([
               CASE WHEN value < 0.0 OR value > 400.0 OR value IS NULL
                    THEN 'value:between' END,
               CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup')
                         OR event_type IS NULL
                    THEN 'event_type:in_set' END
             ], x -> x IS NOT NULL) AS reasons
      FROM events
    )
    SELECT array_to_string(reasons, ',') AS reason_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM tagged WHERE len(reasons) > 0
    GROUP BY 1
    """,
)
def ref_dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine split over the events batch: rows violating any
    scalar expectation divert with their violation reasons
    (operators/dq.py:quarantine); the query rolls quarantined rows
    up by reason combination. Good-row continuation is asserted in
    unit tests (good + bad partitions the batch)."""
    from aws_datalake_spark.operators.dq import Expectation, quarantine

    ev = t(spark, sf_dir, "events")
    exps = [
        Expectation("value", "between", {"min": 0.0, "max": 400.0}),
        Expectation(
            "event_type", "in_set",
            {"values": ["view", "click", "purchase", "signup"]},
        ),
    ]
    _good, bad = quarantine(ev, exps)
    return (
        bad.groupBy(F.array_join("__reasons", ",").alias("reason_key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- transaction-log table format ---------------------------------------------

@query(
    "ref_txn_merge_time_travel",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 3 <> 0
    ), upd AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
      FROM orders WHERE o_orderkey % 5 = 0
    ), merged AS (
      SELECT * FROM base
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL SELECT * FROM upd
    )
    SELECT 'v_base' AS snap, o_orderstatus,
           COUNT(*) AS n, {o_dsum('o_totalprice', scale=2)} AS sum_price
    FROM base GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v_merged', o_orderstatus,
           COUNT(*), {o_dsum('o_totalprice', scale=2)}
    FROM merged GROUP BY o_orderstatus
    """,
)
def ref_txn_merge_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native transaction-log table (sources/txn_table.py): write a
    base snapshot, MERGE a keyed CDC batch (matched rows replaced,
    new keys appended, only stats-intersecting files rewritten), then
    aggregate BOTH the merged head and the pre-merge version through
    time travel — the single-table half of the reference's one-commit
    batch visibility (loading.py:2137), with Delta-paper semantics
    the image's missing delta-spark jar would otherwise provide."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = o.filter(F.col("o_orderkey") % 3 != 0)
    upd = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    root = scratch_dir(prefix="txn_tbl_") + "/orders"
    # two range-split appends so the MERGE has disjoint files to prune
    mid = base.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    tt.write(base.filter(F.col("o_orderkey") <= mid), root, mode="append")
    tt.write(base.filter(F.col("o_orderkey") > mid), root, mode="append")
    v_base = tt.snapshot(root)["version"]
    tt.merge_upsert(spark, root, upd, keys=["o_orderkey"])

    def snap_agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum("o_totalprice", "sum_price", scale=2),
            )
            .withColumn("snap", F.lit(tag))
        )

    cur = tt.read(spark, root)
    old = tt.read(spark, root, version=v_base)
    return (
        snap_agg(old, "v_base")
        .unionByName(snap_agg(cur, "v_merged"))
        .select("snap", "o_orderstatus", "n", "sum_price")
    )


@query(
    "ref_txn_zorder_pruned_read",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {o_dsum('l_extendedprice', scale=2)} AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
      AND l_partkey BETWEEN 100 AND 400
    GROUP BY l_returnflag
    """,
)
def ref_txn_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering + stats-skipped read on the txn table
    (sources/txn_table.py:zorder_compact): load a lineitem
    projection, cluster on (l_orderkey, l_partkey), then answer a
    two-column range query through ``read(prune=...)`` — files whose
    footer stats cannot match are never opened, on EITHER column.
    The residual filter keeps pruning an optimization, so the oracle
    is the plain predicate aggregate."""
    from aws_datalake_spark.sources import txn_table as tt

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_returnflag", "l_extendedprice"
    )
    root = scratch_dir(prefix="txn_z_") + "/lineitem"
    tt.write(li.repartition(4), root)
    tt.zorder_compact(spark, root, ["l_orderkey", "l_partkey"], target_files=8)
    out = tt.read(
        spark, root,
        prune={"l_orderkey": (1000, 2000), "l_partkey": (100, 400)},
    ).filter(
        (F.col("l_orderkey").between(1000, 2000))
        & (F.col("l_partkey").between(100, 400))
    )
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", "sum_price", scale=2),
    )


@query(
    "ref_txn_datasource_read",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sum_id
    FROM events
    GROUP BY event_type
    """,
)
def ref_txn_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The txn table read back through its registered Spark
    DataSource (sources/txn_stream.py): ingest events as two
    stream-append commits, then `spark.read.format("txn_table")` —
    planning from the log, one partition per file — and aggregate.
    Certifies the DataSource path end-to-end under the oracle gate
    (row fidelity through the pyarrow reader, schema from the logged
    contract)."""
    from aws_datalake_spark.sources import txn_table as tt
    from aws_datalake_spark.sources.txn_stream import register

    register(spark)
    ev = t(spark, sf_dir, "events").select("event_id", "event_type")
    root = scratch_dir(prefix="txn_ds_") + "/events_tt"
    sink = tt.stream_append_sink(root)
    sink(ev.filter(F.col("event_id") % 2 == 0), 0)
    sink(ev.filter(F.col("event_id") % 2 == 1), 1)
    back = spark.read.format("txn_table").load(root)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_id"),
    )


_SCD2_TXN_ORACLE = """
WITH target AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN 'N' ELSE 'Y' END AS actv_flg,
         CASE WHEN o_orderkey % 5 = 0 THEN TIMESTAMP '2020-01-01 00:00:00' END AS record_to
  FROM orders WHERE o_orderkey % 2 = 0),
staging AS (
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey < 1000)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       CASE WHEN actv_flg = 'Y'
             AND o_orderkey IN (SELECT o_orderkey FROM staging)
            THEN 'N' ELSE actv_flg END AS actv_flg,
       CASE WHEN actv_flg = 'Y'
             AND o_orderkey IN (SELECT o_orderkey FROM staging)
            THEN TIMESTAMP '2024-06-01 00:00:00' ELSE record_to END AS record_to
FROM target
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus, 'Y', NULL FROM staging
"""


@query("ref_scd2_on_txn", oracle=_SCD2_TXN_ORACLE)
def ref_scd2_on_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 on the table format: the same SCD2 close-out+insert as
    ref_scd2_merge, executed as ONE atomic file-pruned commit on the
    transaction log (sources/txn_table.py:scd2_merge_txn). The target
    dimension is written as two key-range files; staging touches only
    keys < 1000, so the upper file survives the load untouched —
    asserted in-query, so the driver-green row certifies the pruning,
    not just the result."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    target = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .withColumn(
            "actv_flg", F.when(F.col("o_orderkey") % 5 == 0, "N").otherwise("Y")
        )
        .withColumn(
            "record_to",
            F.when(
                F.col("o_orderkey") % 5 == 0, F.lit("2020-01-01 00:00:00")
            ).cast("timestamp"),
        )
    )
    root = scratch_dir(prefix="scd2_txn_") + "/dim_orders"
    tt.write(target.filter(F.col("o_orderkey") < 1000), root)
    tt.write(target.filter(F.col("o_orderkey") >= 1000), root)
    staging = o.filter(
        (F.col("o_orderkey") % 3 == 0) & (F.col("o_orderkey") < 1000)
    ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
    res = tt.scd2_merge_txn(
        spark, root, staging, keys=["o_orderkey"],
        close_ts=F.lit("2024-06-01 00:00:00").cast("timestamp"),
    )
    assert res["untouched"] >= 1, res  # file pruning must engage
    return tt.read(spark, root)


@query(
    "ref_txn_restore",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_orderkey % 2 = 0
    GROUP BY o_orderstatus
    """,
)
def ref_txn_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE on the transaction log (sources/txn_table.py:restore):
    load a base snapshot, clobber it with a bad overwrite, roll back
    with a NEW linear commit, and aggregate the restored head — the
    oracle sees only the base data, so a restore that leaked bad rows
    or lost good ones hash-mismatches. The bad commit stays readable
    via time travel (audit), asserted in-query."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    root = scratch_dir(prefix="txn_restore_") + "/orders"
    tt.write(o.filter(F.col("o_orderkey") % 2 == 0), root)          # v1: good
    tt.write(o.filter(F.col("o_orderkey") % 7 == 0), root,
             mode="overwrite")                                      # v2: bad
    tt.restore(root, 1)                                             # v3
    assert tt.snapshot(root)["version"] == 3
    assert tt.read(spark, root, version=2).count() > 0  # audit intact
    return tt.read(spark, root).groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
    )


@query(
    "ref_txn_version_drift",
    oracle="""
    WITH base AS (SELECT o_totalprice AS value FROM orders
                  WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
    cur AS (SELECT o_totalprice * 1.5 AS value FROM orders
            WHERE o_orderkey % 3 = 0 AND o_totalprice IS NOT NULL),
    bounds AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM base),
    pb AS (SELECT LEAST(19, GREATEST(0,
              CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT))) AS bin,
              COUNT(*) AS n_base
           FROM base, bounds GROUP BY 1),
    pc AS (SELECT LEAST(19, GREATEST(0,
              CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT))) AS bin,
              COUNT(*) AS n_cur
           FROM cur, bounds GROUP BY 1),
    j AS (SELECT COALESCE(pb.bin, pc.bin) AS bin,
                 COALESCE(n_base, 0) AS n_base,
                 COALESCE(n_cur, 0) AS n_cur
          FROM pb FULL OUTER JOIN pc ON pb.bin = pc.bin),
    t AS (SELECT n_base, n_cur,
                 CAST(n_base AS DOUBLE) / CAST(SUM(n_base) OVER () AS DOUBLE) AS p,
                 CAST(n_cur AS DOUBLE) / CAST(SUM(n_cur) OVER () AS DOUBLE) AS q
          FROM j)
    SELECT 0.5 * CAST(SUM(CAST(ROUND(ABS(p - q) * 1000000000.0) AS BIGINT))
                      AS DOUBLE) / 1000000000.0 AS tvd,
           CAST(SUM(n_base) AS BIGINT) AS n_base,
           CAST(SUM(n_cur) AS BIGINT) AS n_cur
    FROM t
    """,
)
def ref_txn_version_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift between two TABLE VERSIONS: overwrite a txn table with a
    shifted batch, then run the DQ numeric-drift operator
    (operators/dq.py:numeric_drift) across time travel — v1 as the
    baseline, the head as current. This is the monitoring loop a
    daily load runs for free once history is retained: no baseline
    extracts to manage, the log IS the baseline store."""
    from aws_datalake_spark.operators.dq import numeric_drift
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    root = scratch_dir(prefix="txn_drift_") + "/orders"
    tt.write(o.filter(F.col("o_orderkey") % 2 == 0), root)            # v1
    tt.write(
        o.filter(F.col("o_orderkey") % 3 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.5
        ),
        root,
        mode="overwrite",
    )                                                                  # v2
    return numeric_drift(
        tt.read(spark, root, version=1),
        tt.read(spark, root),
        col="o_totalprice",
    )


@query(
    "ref_txn_delete_vectors",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), post AS (
      SELECT * FROM base
      WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0)
    )
    SELECT 'v_pre' AS snap, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(0 AS BIGINT) AS files_rewritten
    FROM base GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v_post', o_orderstatus, COUNT(*),
           CAST(SUM(o_orderkey) AS BIGINT), CAST(0 AS BIGINT)
    FROM post GROUP BY o_orderstatus
    """,
)
def ref_txn_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read row deletes via DELETION VECTORS
    (sources/txn_table.py:delete_where_dv): a predicate delete lands
    as (file, row-position) pairs in a small ``_dv/`` parquet — ZERO
    data files rewritten (the ``files_rewritten`` column carries the
    actual count into the hash, so a silent fallback to copy-on-write
    fails the oracle). Reads anti-join the broadcast delete set;
    time travel to the pre-delete version still sees every row
    (both snapshots aggregated and hash-checked). At 100 TB this is
    the difference between a GDPR erasure costing O(deleted rows)
    bytes and one costing a table rewrite."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir(prefix="txn_dv_") + "/orders"
    # two range-split appends -> multiple files under the delete
    mid = o.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    tt.write(o.filter(F.col("o_orderkey") <= mid), root, mode="append")
    tt.write(o.filter(F.col("o_orderkey") > mid), root, mode="append")
    v_pre = tt.snapshot(root)["version"]
    res = tt.delete_where_dv(
        spark, root, "o_orderstatus = 'F' AND o_orderkey % 7 = 0"
    )

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_orderkey").alias("sum_key"),
            )
            .select(
                F.lit(tag).alias("snap"),
                "o_orderstatus",
                "n",
                "sum_key",
                F.lit(res["rewritten"]).cast("long").alias("files_rewritten"),
            )
        )

    return agg(tt.read(spark, root, version=v_pre), "v_pre").unionByName(
        agg(tt.read(spark, root), "v_post")
    )


@query(
    "ref_txn_hidden_partitioning",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE o_custkey = 7
       OR (o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01')
    GROUP BY o_orderstatus
    """,
)
def ref_txn_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style HIDDEN PARTITIONING on the txn table
    (sources/txn_table.py:write_partitioned/read_partitioned): orders
    laid out by bucket(8, o_custkey) x month(o_orderdate) — derived
    values live in directory names only, data files keep just the
    source columns. Queries filter on the SOURCE columns; the engine
    converts the predicates through the transform spec (bucket:
    equality, month: monotonic range) and opens only matching
    partitions — asserted in-query (each branch's scan must open
    fewer files than the table holds). The two pruned branches are
    unioned and aggregated; the oracle recomputes from raw orders, so
    any partition misroute (wrong bucket fn, month boundary off by
    one) loses rows and hash-mismatches."""
    import datetime

    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"
    )
    root = scratch_dir(prefix="txn_hp_") + "/orders"
    tt.write_partitioned(
        o, root, [("bucket", "o_custkey", 8), ("month", "o_orderdate")]
    )
    n_files = len(tt.snapshot(root)["files"])

    cust = tt.read_partitioned(spark, root, eq={"o_custkey": 7}).filter(
        F.col("o_custkey") == 7
    )
    assert len(cust.inputFiles()) < n_files, "bucket pruning must engage"
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 12, 31, 23, 59, 59)
    dated = tt.read_partitioned(
        spark, root, ranges={"o_orderdate": (lo, hi)}
    ).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    assert len(dated.inputFiles()) < n_files, "month pruning must engage"
    both = cust.unionByName(dated).dropDuplicates(["o_orderkey"])
    return both.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
    )


@query(
    "ref_incremental_mv",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_custkey FROM orders),
    appended AS (
      SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey
      FROM orders WHERE o_custkey < 50
    ),
    allr AS (SELECT * FROM base UNION ALL SELECT * FROM appended),
    final AS (
      SELECT * FROM allr WHERE NOT (o_custkey BETWEEN 100 AND 120)
    )
    SELECT o_custkey, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM final GROUP BY o_custkey
    """,
)
def ref_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized view (sources/mv.py)
    over the txn table: a per-customer aggregate stays current
    through an append AND a deletion-vector delete by recomputing
    ONLY the dirty groups found in the commits' changed files — the
    refresh is asserted in-query to be incremental and to touch far
    fewer groups than the table holds. The oracle rebuilds the final
    state from scratch in SQL, so a stale group, a resurrected
    deleted row, or a missed vanished group all hash-mismatch."""
    from aws_datalake_spark.sources import mv
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    src = scratch_dir(prefix="mv_src_") + "/orders"
    root = scratch_dir(prefix="mv_") + "/by_cust"
    tt.write(o, src)
    mv.mv_create(
        spark, src, root, ["o_custkey"],
        {"n": ("count",), "sum_key": ("sum", "o_orderkey")},
    )
    n_groups = o.select("o_custkey").distinct().count()
    tt.write(
        o.filter(F.col("o_custkey") < 50).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
        ),
        src, mode="append",
    )
    tt.delete_where_dv(spark, src, "o_custkey BETWEEN 100 AND 120")
    r = mv.mv_refresh(spark, root)
    assert r["mode"] == "incremental", r
    assert 0 < r["dirty_groups"] < n_groups, r
    return mv.mv_read(spark, root)


@query(
    "ref_txn_bloom_lookup",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders WHERE o_custkey = 7
    GROUP BY o_orderstatus
    """,
)
def ref_txn_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM INDEX point lookup on the txn table
    (sources/txn_table.py:build_bloom_index/bloom_lookup): orders
    land in hash-sharded files, so every file's o_custkey min/max
    spans the whole domain — footer stats cannot prune — but each
    file's key SET is small and its bloom is decisive. The lookup is
    asserted in-query to open fewer files than the table holds; the
    oracle recomputes the same point query from raw orders, so a
    bloom that false-NEGATIVES (loses rows) hash-mismatches."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    root = scratch_dir(prefix="txn_bloom_") + "/orders"
    for shard in range(4):
        tt.write(
            o.filter(F.col("o_custkey") % 4 == shard), root, mode="append"
        )
    tt.build_bloom_index(spark, root, "o_custkey")
    got = tt.bloom_lookup(spark, root, "o_custkey", 7)
    assert len(got.inputFiles()) < len(tt.snapshot(root)["files"]), (
        "bloom pruning must engage"
    )
    return (
        got.filter(F.col("o_custkey") == 7)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
        )
    )


@query(
    "ref_txn_equality_delete",
    oracle="""
    WITH survivors AS (
      SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
      WHERE o_custkey NOT BETWEEN 0 AND 9
    ), reappended AS (
      SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, o_orderstatus
      FROM orders WHERE o_custkey = 4
    ), final AS (
      SELECT * FROM survivors UNION ALL SELECT * FROM reappended
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(0 AS BIGINT) AS files_rewritten
    FROM final GROUP BY o_orderstatus
    """,
)
def ref_txn_equality_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUALITY deletes on the txn table
    (sources/txn_table.py:delete_where_eq — Iceberg v2's second
    delete type): dropping ten customers' orders is an O(keys)
    metadata commit that reads and writes ZERO data files (the
    actual rewrite count rides the hash). Sequence semantics are
    exercised end-to-end: one deleted customer's rows are re-appended
    AFTER the delete and must survive the read, because the equality
    delete applies only to files with older data sequence numbers —
    the ordering a CDC delete-then-insert stream depends on."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    root = scratch_dir(prefix="txn_eq_") + "/orders"
    mid = o.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    tt.write(o.filter(F.col("o_orderkey") <= mid), root, mode="append")
    tt.write(o.filter(F.col("o_orderkey") > mid), root, mode="append")
    res = tt.delete_where_eq(
        spark, root,
        spark.range(0, 10).select(F.col("id").alias("o_custkey")),
    )
    tt.write(
        o.filter(F.col("o_custkey") == 4).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(20_000_000)
        ),
        root, mode="append",
    )
    return (
        tt.read(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
        )
        .withColumn(
            "files_rewritten", F.lit(res["rewritten"]).cast("long")
        )
    )


@query(
    "ref_txn_change_feed",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0
    ), dvdel AS (
      SELECT o_orderkey FROM orders
      WHERE o_orderstatus = 'F' AND o_orderkey % 7 = 0
    )
    SELECT 'merge' AS commit_op, 'insert' AS change_type,
           COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM upd
    UNION ALL
    SELECT 'merge', 'delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
    FROM upd
    UNION ALL
    SELECT 'delete-dv', 'delete', COUNT(*), CAST(SUM(o_orderkey) AS BIGINT)
    FROM dvdel
    """,
)
def ref_txn_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed change feed (sources/txn_table.py:read_changes_typed —
    Delta CDF parity): a MERGE reports exactly its changed rows as
    delete/insert pairs (carried-over rows cancel in the logical
    diff), and a deletion-vector commit reports exactly the rows it
    shadowed. The oracle recomputes every expected change set from
    raw orders, so an over-report (carried rows leaking into the
    feed) or under-report both hash-mismatch."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir(prefix="txn_cdf_") + "/orders"
    mid = o.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    tt.write(o.filter(F.col("o_orderkey") <= mid), root, mode="append")
    tt.write(o.filter(F.col("o_orderkey") > mid), root, mode="append")
    v0 = tt.snapshot(root)["version"]
    tt.merge_upsert(
        spark, root,
        o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
        ),
        keys=["o_orderkey"],
    )
    tt.delete_where_dv(
        spark, root, "o_orderstatus = 'F' AND o_orderkey % 7 = 0"
    )
    ch = tt.read_changes_typed(spark, root, since_version=v0)
    return (
        ch.groupBy(
            F.col("_commit_op").alias("commit_op"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
        )
    )


@query(
    "ref_txn_constraints",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
           CAST(1 AS BIGINT) AS bad_batch_refused
    FROM orders WHERE o_totalprice > 0
    GROUP BY o_orderstatus
    """,
)
def ref_txn_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-level CHECK constraints
    (sources/txn_table.py:add_constraint): writes are validated
    against log-declared predicates BEFORE the commit — a batch
    carrying negated prices is refused atomically (nothing becomes
    visible), the clean load lands, and the refusal itself is carried
    into the hash (``bad_batch_refused``): if enforcement silently
    stopped working, the poisoned rows would change every aggregate
    AND flip the flag."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir(prefix="txn_chk_") + "/orders"
    tt.write(o.filter(F.col("o_totalprice") > 0).limit(0), root)  # schema seed
    tt.add_constraint(root, "price_positive", "o_totalprice > 0")
    tt.write(o.filter(F.col("o_totalprice") > 0), root, mode="append")
    refused = 0
    try:
        tt.write(
            o.withColumn("o_totalprice", -F.abs(F.col("o_totalprice")) - 1),
            root, mode="append",
        )
    except tt.ConstraintViolation:
        refused = 1
    return (
        tt.read(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sum_key"),
        )
        .withColumn("bad_batch_refused", F.lit(refused).cast("long"))
    )


@query(
    "ref_txn_column_mapping",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), appended AS (
      SELECT o_orderkey + 30000000 AS o_orderkey, 'Z' AS o_orderstatus,
             100.0 AS o_totalprice
      FROM orders WHERE o_custkey = 3
    ), allr AS (
      SELECT * FROM base UNION ALL SELECT * FROM appended
    )
    SELECT o_orderstatus AS status, COUNT(*) AS n,
           {o_dsum('o_totalprice', scale=2)} AS sum_price_usd
    FROM allr GROUP BY 1
    """,
)
def ref_txn_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping on the txn table
    (sources/txn_table.py:rename_column/drop_column): renames are
    metadata-only — zero files rewritten (asserted in-query) — and
    later writes speak the NEW logical schema while landing under the
    original physical names, so old and new files stay one physical
    schema. The oracle aggregates the renamed price column across
    pre- AND post-rename data: a mapping bug that lost either
    generation's values hash-mismatches."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_dir(prefix="txn_map_") + "/orders"
    tt.write(o.drop("o_custkey"), root)
    files_before = set(tt.snapshot(root)["files"])
    tt.rename_column(root, "o_totalprice", "price_usd")
    tt.rename_column(root, "o_orderstatus", "status")
    assert set(tt.snapshot(root)["files"]) == files_before, (
        "rename must not rewrite files"
    )
    tt.write(
        o.filter(F.col("o_custkey") == 3).select(
            (F.col("o_orderkey") + F.lit(30_000_000)).alias("o_orderkey"),
            F.lit("Z").alias("status"),
            F.lit(100.0).alias("price_usd"),
        ),
        root, mode="append",
    )
    return (
        tt.read(spark, root)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("price_usd", "sum_price_usd", scale=2),
        )
    )


@query(
    "ref_txn_metadata_tables",
    oracle="""
    WITH tot AS (SELECT COUNT(*) AS n FROM orders),
    evens AS (
      SELECT COUNT(*) AS n_lo FROM orders WHERE o_orderkey % 2 = 0
    ),
    dv AS (SELECT COUNT(*) AS n_dv FROM orders WHERE o_orderkey % 13 = 0)
    SELECT 1 AS version, 1 AS live_files,
           CAST(n_lo AS BIGINT) AS rows, CAST(0 AS BIGINT) AS dv_rows
    FROM evens
    UNION ALL
    SELECT 2, 2, CAST(n AS BIGINT), 0 FROM tot
    UNION ALL
    SELECT 3, 2, CAST(n AS BIGINT), CAST(n_dv AS BIGINT) FROM tot, dv
    """,
)
def ref_txn_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Queryable metadata tables (sources/txn_table.py:metadata_df —
    Iceberg's files/history/snapshots surface): the per-version
    snapshots table is derived from the log alone and carries live
    file counts, physical rows, and dv-shadowed rows; the oracle
    recomputes every figure from raw orders, so log bookkeeping that
    drifted from the data (miscounted rows, lost dv attribution)
    hash-mismatches."""
    from aws_datalake_spark.sources import txn_table as tt

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    root = scratch_dir(prefix="txn_meta_") + "/orders"
    tt.write(o.filter(F.col("o_orderkey") % 2 == 0).coalesce(1), root)
    tt.write(o.filter(F.col("o_orderkey") % 2 == 1).coalesce(1), root,
             mode="append")
    tt.delete_where_dv(spark, root, "o_orderkey % 13 = 0")
    return tt.metadata_df(spark, root, "snapshots").select(
        "version", "live_files", "rows", "dv_rows"
    )


# ---------------------------------------------------------------------------
# S1/S2/S3 — paginated API scan, driver-checkable (VERDICT r03 item 5)
# ---------------------------------------------------------------------------
# The "remote API" is the file-backed fixture service in
# sources/paginated.py: it serves pages of customer.parquet, so the
# exact same rows are reachable by plain SQL — the pagination
# machinery (InputPartition per page, server-side predicate, keyed
# allow-list) is what's under test.

_PAGED_SELECT = """
    SELECT c_custkey AS id, c_name AS name,
           CASE WHEN c_acctbal >= 0 THEN 'ACTIVE' ELSE 'PAUSED' END AS status,
           CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS metric
    FROM customer
"""

_PAGED_KEYS = "1,2,3,5,8,13,21,34,55,89,144"


def _paged(spark: SparkSession, sf_dir: str, **opts) -> DataFrame:
    from aws_datalake_spark.catalog import table_path
    from aws_datalake_spark.sources.paginated import register

    register(spark)
    r = (
        spark.read.format("paged_api")
        .option("path", table_path(sf_dir, "customer"))
        # page size grows with the table so page count stays ~32 at
        # any SF (64-row floor keeps real pagination at sf0.001)
        .option("page_size", 64)
        .option("pages_target", 32)
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


@query("ref_paginated_scan", oracle=_PAGED_SELECT)
def ref_paginated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — paginated API read as a real Spark DataSource
    (sources/paginated.py): every 64-row page is an InputPartition
    fetched in parallel on the executors, vs the reference's serial
    driver-side offset/limit loop (reference ingestion.py:259-272).
    The oracle is the same rows via plain SQL, so a lost/duplicated
    page, a wrong slice boundary, or a mis-mapped field
    hash-mismatches."""
    return _paged(spark, sf_dir)


@query(
    "ref_paginated_pushdown",
    oracle=_PAGED_SELECT + " WHERE c_acctbal >= 0",
)
def ref_paginated_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — source-side predicate (the reference's PQL ``WHERE
    endDateTime > :now``, ingestion.py:144-179): `active_only` is
    applied INSIDE the page fetch, so filtered rows never leave the
    "API" — at scale the wire/bytes saving, not a post-filter."""
    return _paged(spark, sf_dir, active_only="true")


@query(
    "ref_paginated_keyed",
    oracle=_PAGED_SELECT + f" WHERE c_custkey IN ({_PAGED_KEYS})",
)
def ref_paginated_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 — keyed two-phase scan (reference ingestion.py:189-223:
    fetch ids, then fetch full records for those ids): the allow-list
    rides the fetch as a server-side restriction. The fixed key set
    exists at every SF (custkeys are dense from 0)."""
    return _paged(spark, sf_dir, keys=_PAGED_KEYS)


@query(
    "ref_zone_promote_roundtrip",
    oracle="""
    SELECT n_nationkey, n_name, 'transformed' AS zone,
           1 AS n_raw_datasets, 1 AS n_cleansed_datasets
    FROM nation
    """,
)
def ref_zone_promote_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/S14/P20 — medallion zone orchestration end-to-end
    (sources/zones.py): land `nation` in the raw zone, P20-rewrite
    the path raw→cleansed→transformed (ZonePaths.promote), S13-copy
    the dataset zone-to-zone as a distributed read→write, and
    S14-discover what each zone holds. The oracle is the same rows
    via plain SQL plus the expected discovery counts, so a lost
    row in the copy, a wrong promote target, or a discovery miss
    hash-mismatches. Reference parity: cleansing.py:24-25 /
    transformation.py:250-252 key rewriting, partitioning.py:54-56
    copy, partitioning.py:28-32 list-keys discovery."""
    from aws_datalake_spark.sources.zones import (
        ZonePaths,
        copy_zone,
        discover_datasets,
    )

    zp = ZonePaths(scratch_dir(prefix="zones_"))
    t(spark, sf_dir, "nation").select("n_nationkey", "n_name").write.mode(
        "overwrite"
    ).parquet(zp.path("raw", "nation"))
    src, dst = zp.promote("raw", "nation")
    copy_zone(spark, src, dst)
    src2, dst2 = zp.promote("cleansed", "nation")
    copy_zone(spark, src2, dst2)
    n_raw = len(discover_datasets(os.path.join(zp.root, "raw")))
    n_cleansed = len(discover_datasets(os.path.join(zp.root, "cleansed")))
    return (
        spark.read.parquet(zp.path("transformed", "nation"))
        .select(
            "n_nationkey",
            "n_name",
            F.lit("transformed").alias("zone"),
            F.lit(n_raw).alias("n_raw_datasets"),
            F.lit(n_cleansed).alias("n_cleansed_datasets"),
        )
    )
