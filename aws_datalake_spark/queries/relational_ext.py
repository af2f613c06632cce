"""Extended relational surface: temporal joins (as-of, range), outer
join modes, pivot/unpivot, percentiles, grouping sets, deterministic
hash sampling, and the union-based duplicate check (SURVEY.md J4).

These close the general-capability gaps SURVEY.md §2.5 notes the
reference never exercises but any lake engine must offer.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.operators.joins import asof_join, bucketed_range_join
from aws_datalake_spark.operators.text import hash60
from aws_datalake_spark.queries._shared import dsum, o_dsum, t
from aws_datalake_spark.queries.registry import query
from aws_datalake_spark.scratch import scratch_dir


# --- temporal joins -----------------------------------------------------------

@query(
    "q_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id, ts, value, user_id FROM events
          WHERE event_type = 'view'),
    j AS (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             v.event_id AS view_event_id, v.ts AS view_ts, v.value AS view_value,
             ROW_NUMBER() OVER (
               PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
    SELECT event_id, user_id, ts, value,
           view_event_id, view_ts, view_value
    FROM j WHERE rn = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/joins.py:asof_join): each
    purchase event picks up the latest prior view by the same user —
    one shuffle per side on user_id, sort-merge within groups; no
    nested-loop, no per-row lookup."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(purchases, views, on="ts", by=["user_id"], right_suffix="_r")
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("view_event_id_r").alias("view_event_id"),
        F.col("ts_r").alias("view_ts"),
        F.col("view_value_r").alias("view_value"),
    )


@query(
    "q_range_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    v AS (SELECT event_id AS view_event_id, user_id, ts AS view_ts FROM events
          WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, v.view_event_id,
           CAST(date_diff('second', v.view_ts, p.ts) AS BIGINT) AS lag_s
    FROM p JOIN v
      ON v.user_id = p.user_id
     AND v.view_ts >= p.ts - INTERVAL 1 HOUR
     AND v.view_ts <= p.ts
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution range join (operators/joins.py:
    bucketed_range_join): views within the hour before each purchase,
    executed as a bucketed EQUI-join + residual filter — never a
    BroadcastNestedLoop."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_event_id"), "user_id", F.col("ts").alias("view_ts")
    )
    joined = bucketed_range_join(
        views, purchases, point_ts="view_ts", start_col="w_start", end_col="w_end",
        by=["user_id"], bucket_width_s=3600,
    )
    return joined.select(
        "event_id", "user_id", "view_event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("view_ts")).alias("lag_s"),
    )


# --- join modes not yet covered ----------------------------------------------

@query(
    "q_join_right_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000) o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    c = t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
    sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
           FROM supplier WHERE s_acctbal > 3000 GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey, cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 3000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, "nk", "full_outer").select(
        F.coalesce(cn["nk"], sn["nk"]).alias("nationkey"), "n_cust", "n_supp"
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region").select("r_name")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


# --- pivot / unpivot ----------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "q_pivot",
    oracle=f"""
    SELECT o_orderstatus,
           {", ".join(
               f'''COUNT(CASE WHEN o_orderpriority = '{p}' THEN 1 END) AS "{p}"'''
               for p in _PRIORITIES
           )}
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list — explicit
    values keep the pivot single-pass (no extra distinct job) and
    the output schema stable."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .na.fill(0, _PRIORITIES)
    )


@query(
    "q_unpivot",
    oracle=f"""
    WITH agg AS (
      SELECT l_returnflag,
             {o_dsum('l_quantity')} AS sum_qty,
             {o_dsum('l_extendedprice')} AS sum_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price"))
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "value"
    )


# --- percentiles / grouping sets ---------------------------------------------

@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles. Note for 100 TB: exact
    percentile sorts each group's values — switch to
    approx_percentile (t-digest, mergeable partials) when the group
    cardinality is unbounded."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 4).alias(f"p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75, 0.95)
        ]
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --- deterministic sampling ---------------------------------------------------

@query(
    "q_sample_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 20 = 0
    """,
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample by key hash — reproducible across
    engines, runs, and cluster sizes (unlike TABLESAMPLE, whose RNG
    is engine-local), and stable under repartitioning, which makes
    it the right primitive for train/eval splits."""
    o = t(spark, sf_dir, "orders")
    return o.filter(hash60(F.col("o_orderkey").cast("string")) % 20 == 0).select(
        "o_orderkey", "o_totalprice"
    )


# --- union-based duplicate check (SURVEY J4) ---------------------------------

@query(
    "q_union_dup_check",
    oracle="""
    SELECT o_custkey AS key, COUNT(*) AS n
    FROM (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
          UNION ALL
          SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)
    GROUP BY o_custkey HAVING COUNT(*) > 1
    """,
)
def q_union_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-free duplicate detection across two datasets (SURVEY.md
    J4, /root/reference/Great Expectation PoC.py:21,57): union the
    key columns and flag keys seen more than once."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select(F.col("o_custkey").alias("key"))
    b = o.filter(F.col("o_orderkey") % 2 == 1).select(F.col("o_custkey").alias("key"))
    return (
        a.unionAll(b)
        .groupBy("key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


# --- skew-safe aggregation (operators/skew.py) -------------------------------

@query(
    "q_skew_distinct_count",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_skew_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count via the explicit two-shuffle rewrite
    (operators/skew.py:skew_safe_distinct_count) — a hot key's values
    spread across the cluster in shuffle 1."""
    from aws_datalake_spark.operators.skew import skew_safe_distinct_count

    return skew_safe_distinct_count(
        t(spark, sf_dir, "orders"), ["o_orderstatus"], "o_custkey"
    )


@query(
    "q_salted_agg",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted sum (operators/skew.py:salted_agg_sum) over a
    deterministic salt; decimal accumulation keeps the result exactly
    equal to the single-phase plan the oracle runs."""
    from aws_datalake_spark.operators.skew import salted_agg_sum

    l = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        F.col("l_extendedprice").cast("decimal(30,6)").alias("sum_price"),
    )
    out = salted_agg_sum(
        l, ["l_returnflag"], ["sum_price"], salt_from="l_orderkey", salt_factor=16
    )
    return out.select("l_returnflag", F.col("sum_price").cast("double"))


# --- array / map / correlated-subquery function surface ----------------------

@query(
    "q_array_functions",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             list_sort(list(l_linenumber)) AS nums,
             list_sort(list(DISTINCT l_returnflag)) AS flags
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           CAST(len(nums) AS INT) AS n_lines,
           CAST(nums[1] AS INT) AS first_line,
           CAST(nums[-1] AS INT) AS last_line,
           CAST(list_sum(nums) AS BIGINT) AS line_sum,
           CAST(list_contains(flags, 'R') AS BOOLEAN) AS has_returns
    FROM per_order WHERE l_orderkey % 100 = 0
    """,
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface: collect → sort → size/element_at/
    aggregate/contains. collect_list alone is order-nondeterministic
    across tasks; array_sort restores determinism (the pattern any
    reproducible pipeline needs)."""
    l = t(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("nums"),
        F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
    )
    return per_order.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        F.size("nums").alias("n_lines"),
        F.element_at("nums", 1).cast("int").alias("first_line"),
        F.element_at("nums", -1).cast("int").alias("last_line"),
        F.aggregate("nums", F.lit(0).cast("long"), lambda a, x: a + x).alias("line_sum"),
        F.array_contains("flags", "R").alias("has_returns"),
    )


@query(
    "q_map_functions",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_filled
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function surface: per-customer status→count map built with
    map_from_entries(collect_list(struct)), read back via
    element_at — the map is constructed and consumed in-plan; the
    oracle checks the extracted scalars."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey", "o_orderstatus").agg(F.count("*").alias("n"))
    mapped = counts.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m"),
        F.sum("n").alias("total"),
    )
    return mapped.filter(F.col("total") >= 15).select(
        "o_custkey",
        F.coalesce(F.element_at("m", "O"), F.lit(0)).alias("n_open"),
        F.coalesce(F.element_at("m", "F"), F.lit(0)).alias("n_filled"),
    )


@query(
    "q_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 300000)
    """,
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via spark.sql — Catalyst decorrelates it
    into the same semi-join q_join_semi writes by hand."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("__c_ex")
    t(spark, sf_dir, "orders").createOrReplaceTempView("__o_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM __c_ex c
        WHERE EXISTS (SELECT 1 FROM __o_ex o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT'
                        AND o.o_totalprice > 300000)
        """
    )


# --- window frames / distribution functions ----------------------------------

@query(
    "q_window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w_price AS INT) AS price_quartile,
           ROUND(percent_rank() OVER w_price, 6) AS price_pct_rank,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_sum3,
           FIRST_VALUE(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_order
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame + distribution surface: ntile, percent_rank,
    ROWS-frame moving sum (decimal-exact), first_value. Unique
    (orderdate, orderkey) tiebreaks keep every function
    deterministic."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_mov = w_time.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w_price).alias("price_quartile"),
        F.round(F.percent_rank().over(w_price), 6).alias("price_pct_rank"),
        F.sum(F.col("o_totalprice").cast("decimal(30,6)")).over(w_mov)
        .cast("double").alias("moving_sum3"),
        F.first("o_orderkey").over(w_time).alias("first_order"),
    )


@query(
    "q_small_quantity_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE)) AS qty_cut
      FROM lineitem GROUP BY l_partkey)
    SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100.0, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0 / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size < 15
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_cut
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate self-join; the part
    dimension broadcasts. Quantities are integral doubles, so the
    per-part mean is exact and the 20%-threshold comparison is
    deterministic in both engines."""
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("qty_cut")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 15).select("p_partkey")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return joined.agg(
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100.0, 0).cast("long")).cast("double")
            / 100.0
            / 7.0,
            6,
        ).alias("avg_yearly")
    )


@query(
    "q_event_funnel",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
      FROM events GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS first_click
      FROM events e JOIN u ON u.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > u.first_view
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
      GROUP BY e.user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(u.first_view) AS n_viewed,
           COUNT(c.first_click) AS n_clicked_after_view,
           COUNT(p.first_purchase) AS n_purchased_after_click
    FROM u
    LEFT JOIN c ON c.user_id = u.user_id
    LEFT JOIN p ON p.user_id = u.user_id
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view → later click → later
    purchase) — per-user conditional-min aggregation chained twice;
    each stage is one groupBy on user_id so the three stages reuse
    the same hash partitioning (one real shuffle, then co-located
    joins under AQE)."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    u = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    )
    c = (
        e.join(u, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        e.join(c, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("first_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        u.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("first_view").alias("n_viewed"),
            F.count("first_click").alias("n_clicked_after_view"),
            F.count("first_purchase").alias("n_purchased_after_click"),
        )
    )


@query(
    "q_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           lower(p_type) AS type_l,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS pk_pad,
           reverse(p_name) AS name_rev,
           substr(p_name, 3, 5) AS name_mid,
           CAST(strpos(p_name, 'a') AS INT) AS pos_a,
           translate(p_brand, '#', '_') AS brand_tr,
           concat_ws('|', p_brand, p_type) AS brand_type
    FROM part
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (upper/lower/lpad/reverse/substr/
    instr/translate/concat_ws) — all JVM built-ins inside whole-stage
    codegen; cross-engine parity pins the exact semantics (1-based
    substr/instr, 0 on no-match)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("pk_pad"),
        F.reverse("p_name").alias("name_rev"),
        F.substring("p_name", 3, 5).alias("name_mid"),
        F.instr("p_name", "a").cast("int").alias("pos_a"),
        F.translate("p_brand", "#", "_").alias("brand_tr"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


@query(
    "q_datetime_functions",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
           CAST(EXTRACT(year FROM ts) AS INT) AS y,
           CAST(EXTRACT(month FROM ts) AS INT) AS m,
           CAST(EXTRACT(day FROM ts) AS INT) AS d,
           CAST(EXTRACT(hour FROM ts) AS INT) AS h,
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(ts + INTERVAL 7 DAY AS TIMESTAMP) AS ts_plus7
    FROM events
    """,
)
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-function surface (trunc/extract/dow/interval math)
    over microsecond-precision event times; dow aligned to Spark's
    Sunday=1 convention."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.dayofweek("ts").cast("int").alias("dow"),
        (F.col("ts") + F.expr("INTERVAL 7 DAY")).alias("ts_plus7"),
    )


@query(
    "q_join_shuffle_hash",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS n,
           {o_dsum('l_extendedprice', 2)} AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy surface: SHUFFLE_HASH hint for a build side too
    big to broadcast but small enough to hash per partition — skips
    both sort phases of sort-merge. At 100 TB this is the right
    strategy for mid-sized dimensions (orders vs lineitem here);
    plan gate in tests/test_plans.py asserts ShuffledHashJoin."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = li.join(o.hint("SHUFFLE_HASH"), li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", "sum_price", 2),
    )


@query(
    "q_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id,
             event_id - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY event_id) AS grp
      FROM events
    ), runs AS (
      SELECT user_id, grp, COUNT(*) AS run_len FROM seq GROUP BY 1, 2
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(run_len) AS BIGINT) AS max_run,
           CAST(SUM(run_len) AS BIGINT) AS n_events
    FROM runs GROUP BY 1
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive event ids per user via
    the id-minus-row_number trick — sequence-continuity analysis
    (session stitching, missing-data detection) with windows
    partitioned per user, so the work parallelizes across keys and
    no global window collapses to one task."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select("user_id", "event_id")
    win = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.withColumn(
        "grp", F.col("event_id") - F.row_number().over(win).cast("long")
    )
    runs = seq.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").alias("max_run"),
        F.sum("run_len").alias("n_events"),
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ), first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY 1
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
           CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
    FROM act JOIN first ON act.user_id = first.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active day, counted
    per day offset. Both the first-touch aggregate and the activity
    set shuffle on user_id, so the join reuses one partitioning; the
    distinct-user count is two-phase (partial sets per partition)."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query(
    "q_sql_entrypoint",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY 1
    """,
)
def q_sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The textual-SQL API surface: the same catalog the DataFrame
    queries use, registered as views and queried via spark.sql (a
    TPC-H q4 shape with a correlated EXISTS — parsed, decorrelated,
    and optimized entirely by Catalyst)."""
    from aws_datalake_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_recursive_calendar",
    oracle="""
    WITH RECURSIVE days(n) AS (
      SELECT 0 UNION ALL SELECT n + 1 FROM days WHERE n < 89
    ), cal AS (
      SELECT DATE '1995-01-01' + n AS day FROM days
    ), daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             COUNT(*) AS c
      FROM orders GROUP BY 1
    )
    SELECT cal.day, CAST(COALESCE(daily.c, 0) AS BIGINT) AS n_orders
    FROM cal LEFT JOIN daily ON cal.day = daily.day
    """,
)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4) building a 90-day calendar
    scaffold, zero-filling days with no orders — the gap-filling
    shape reporting pipelines need; the recursion is driver-bounded
    (90 rows) while the fact-side aggregate stays distributed."""
    from aws_datalake_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE days(n) AS (
          SELECT 0 UNION ALL SELECT n + 1 FROM days WHERE n < 89
        ), cal AS (
          SELECT date_add(DATE '1995-01-01', n) AS day FROM days
        ), daily AS (
          SELECT CAST(date_trunc('DAY', o_orderdate) AS DATE) AS day,
                 COUNT(*) AS c
          FROM orders GROUP BY 1
        )
        SELECT cal.day, CAST(COALESCE(daily.c, 0) AS BIGINT) AS n_orders
        FROM cal LEFT JOIN daily ON cal.day = daily.day
        """
    )


@query(
    "q_sql_scalar_udf",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {o_dsum('l_extendedprice * (1.0 - l_discount)', 4)} AS revenue
    FROM lineitem GROUP BY 1
    """,
)
def q_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL scalar UDF (Spark 4 CREATE FUNCTION … RETURN):
    the body is inlined by Catalyst, so unlike a Python UDF it stays
    inside whole-stage codegen — the right way to package reusable
    business expressions."""
    from aws_datalake_spark.catalog import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(disc_price(l_extendedprice, l_discount)
                                   * 10000.0, 0) AS BIGINT)) AS DOUBLE)
                 / 10000.0 AS revenue
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query(
    "st_variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def st_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse_json once into
    the binary variant encoding, then typed path extraction — the
    schema-on-read path for heterogeneous event payloads (cheaper
    than re-parsing JSON text per field access)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(F.parse_json("props").alias("v"))
        .select(
            (F.try_variant_get("v", "$.k", "int") % 10).alias("k_mod")
        )
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_null_semantics",
    oracle=f"""
    WITH d AS (
      SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
             c_mktsegment AS seg
      FROM customer
    )
    SELECT seg, COUNT(*) AS n_rows,
           CAST(COUNT(bal) AS BIGINT) AS n_nonnull,
           CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           {o_dsum('bal', 2)} AS sum_bal
    FROM d GROUP BY 1
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL NULL-semantics parity: COUNT(*) vs COUNT(col), conditional
    null counting, and aggregates skipping NULLs — the semantics every
    ANSI engine must agree on, checked value-for-value."""
    c = t(spark, sf_dir, "customer").select(
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.col("c_mktsegment").alias("seg"),
    )
    return c.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("bal").alias("n_nonnull"),
        F.sum(F.when(F.col("bal").isNull(), 1).otherwise(0)).alias("n_null"),
        dsum("bal", "sum_bal", 2),
    )


@query(
    "q_decimal_exact_sum",
    oracle="""
    SELECT l_linestatus,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                     AS DECIMAL(38,2)) AS VARCHAR) AS total_s
    FROM lineitem GROUP BY 1
    """,
)
def q_decimal_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic surface: money accumulated as
    DECIMAL(12,2) (BigDecimal path — slower than the scaled-long
    trick in queries/_shared.py but unbounded), emitted as a plain
    decimal string so both engines' precision widening compares
    equal."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("decimal(38,2)")
        .cast("string")
        .alias("total_s")
    )


@query(
    "q_yoy_growth",
    oracle=f"""
    WITH yearly AS (
      SELECT c_mktsegment AS seg,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
             {o_dsum('o_totalprice', 2)} AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    )
    SELECT seg, yr, revenue,
           revenue - LAG(revenue) OVER (PARTITION BY seg ORDER BY yr)
             AS yoy_delta
    FROM yearly
    """,
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per market segment: two-level time
    aggregate + lag window over the YEARS-sized frame (the window
    never sees fact rows; at 100 TB the lag input is |segments|×|years|).
    The delta is a single IEEE subtract of two exact dsum outputs."""
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    yearly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(dsum("o_totalprice", "revenue", 2))
    )
    win = Window.partitionBy("seg").orderBy("yr")
    return yearly.select(
        "seg", "yr", "revenue",
        (F.col("revenue") - F.lag("revenue").over(win)).alias("yoy_delta"),
    )


@query(
    "q_window_rank_stats",
    oracle="""
    SELECT c_custkey, n_name,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST()    OVER w AS cd,
           NTILE(4)       OVER w AS quartile
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal, c_custkey)
    """,
)
def q_window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window surface: percent_rank, cume_dist,
    ntile over per-nation balance order (total order via the custkey
    tiebreak, so ranks are deterministic in both engines)."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "n_name",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
        )
    )


@query(
    "q_lateral_topn",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) c
    """,
)
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated-subquery surface: top-2 customers per
    nation via a per-row subquery, parsed and decorrelated by
    Catalyst (physically a ranked window, not a nested loop)."""
    from aws_datalake_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n, LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        """
    )


@query(
    "q_exact_median_histogram",
    oracle="""
    SELECT v AS median_extprice FROM (
      SELECT l_extendedprice AS v,
             ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER () AS n
      FROM lineitem
    ) WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    """,
)
def q_exact_median_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median of l_extendedprice with no global sort: iterative
    histogram narrowing (operators/order_stats.py) — each pass is a
    scan with ~4096 aggregation groups, never a shuffle of data rows;
    2-3 passes then an exact bounded finish."""
    from aws_datalake_spark.operators.order_stats import exact_quantile

    l = t(spark, sf_dir, "lineitem")
    med = exact_quantile(l, "l_extendedprice", 0.5, direct_threshold=10_000)
    return spark.createDataFrame([(float(med),)], "median_extprice double")


@query(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized-SQL surface: named parameter markers bound via
    spark.sql(..., args=...) — values are injected as typed literals
    by the parser (no string splicing, no injection surface), then
    optimized exactly like inline constants (the IN-list still prunes
    and pushes down)."""
    from aws_datalake_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_price
        FROM orders
        WHERE o_orderdate >= :cutoff
          AND o_orderpriority IN (:p1, :p2)
        GROUP BY o_orderpriority
        """,
        args={
            "cutoff": datetime.datetime(1997, 1, 1),
            "p1": "1-URGENT",
            "p2": "2-HIGH",
        },
    )


@query(
    "q_grouped_median_histogram",
    oracle="""
    SELECT l_returnflag, v AS median_extprice FROM (
      SELECT l_returnflag, l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ) WHERE rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
    """,
)
def q_grouped_median_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median with no per-group sort of the input:
    one shared histogram pass per round narrows every group at once
    (operators/order_stats.py:exact_quantile_by_group); only each
    group's surviving slice is ever ranked."""
    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    l = t(spark, sf_dir, "lineitem")
    return exact_quantile_by_group(
        l, "l_returnflag", "l_extendedprice", 0.5, direct_threshold=5_000
    ).withColumnRenamed("quantile", "median_extprice")


@query(
    "q_window_time_range_frame",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
             CAST(ROUND(value * 1000000.0) AS BIGINT) AS v6
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(v6) OVER (
             PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS hour_sum,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS hour_n
    FROM e
    """,
)
def q_window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame — the sliding-by-event-time
    aggregate ROWS frames cannot express (a frame of "everything in
    the trailing hour", however many rows that is, ties included).
    ``Window.orderBy(epoch).rangeBetween(-3600, 0)`` keeps it one
    per-user exchange + sort; values fixed-point so the running sums
    hash-match regardless of either engine's accumulation order."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 1_000_000.0).cast("long").alias("v6"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (F.sum("v6").over(w).cast("double") / 1_000_000.0).alias("hour_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("hour_n"),
    )


@query(
    "q_dynamic_partition_pruning",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
    FROM orders
    WHERE CAST(EXTRACT(year FROM o_orderdate) AS INT) = 1996
    GROUP BY o_orderstatus
    """,
)
def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: the fact table lands
    hive-partitioned by order year; the star join's dimension filter
    (a year dim restricted to 1996) is NOT visible at plan time on
    the fact side, so Catalyst injects a runtime dynamic-pruning
    subquery into the fact scan — only 1996's partition directories
    are read. Asserted in-query via the physical plan; the oracle
    recomputes from raw orders, so pruning that dropped or
    duplicated rows hash-mismatches."""

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.year("o_orderdate").alias("o_year"),
    )
    d = scratch_dir(prefix="dpp_")
    o.write.partitionBy("o_year").mode("overwrite").parquet(d + "/orders")
    # the filter is on a NON-join dim column, so the fact-side
    # partition predicate is unknowable at plan time (a literal
    # year filter would constraint-propagate into STATIC pruning —
    # still good, but then there is nothing dynamic to prove)
    spark.createDataFrame(
        [(y, "pick" if y == 1996 else "skip") for y in range(1995, 2002)],
        "d_year int, tag string",
    ).write.mode("overwrite").parquet(d + "/years")
    fact = spark.read.parquet(d + "/orders")
    dim = spark.read.parquet(d + "/years").filter(F.col("tag") == "pick")
    joined = fact.join(dim, fact.o_year == dim.d_year)
    out = joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").alias("sum_key"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "dynamic partition pruning must be injected into the fact scan"
    )
    return out
