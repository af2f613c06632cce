"""Remaining classic TPC-H query shapes, adapted to the fixture schema.

The reference has no general query engine (SURVEY.md §2.5 note);
``relational.py`` covers Q1/Q3/Q5 and the q17 shape lives in
``relational_ext.py``. This module adds the rest — since r08 every
one of the 22 canonical numbers has a qNN-named implementation
(Q4/Q6 added last: the EXISTS-to-semi-join priority check and the
multi-range-predicate scan aggregate). No partsupp/shipmode/commitdate columns exist, so Q12/Q21/
Q22 are adapted and Q2/Q9/Q11/Q16/Q20 run against a synthetic
partsupp (distinct shipped part-supplier pairs; see the section
comment below):

* Q7  volume shipping — bidirectional nation-pair trade by year
* Q8  market share — conditional-sum ratio per year
* Q10 returned items — fact-side filter + 4-way join + top-k
* Q12 priority classes — conditional counts (adapted: returnflag
  stands in for shipmode)
* Q13 customer distribution — left outer join + count-of-counts
* Q14 promo revenue — conditional-sum percentage over one month
* Q15 top supplier — agg + global-max scalar equality
* Q18 large orders — HAVING over a fact rollup joined back to dims
* Q19 disjunctive predicates — OR-of-ANDs pushed into one scan
* Q21 blame supplier — multi-supplier orders where exactly one
  supplier returned lines (adapted: returnflag = lateness marker)
* Q22 dormant customers — scalar-subquery threshold + windowed
  anti-join (adapted: nationkey stands in for phone country code)
* Q2  best supplier per part — correlated max via window equality
* Q9  product-type profit — multi-dim profit rollup per nation-year
* Q11 important stock — nested scalar-aggregate threshold
* Q16 supplier-part counts — count-distinct with NOT-IN exclusion
* Q20 excess inventory — double-nested aggregate semi-join

Scale notes (100 TB posture): every query keeps the lineitem fact
table on one side of at most one shuffle; dims (nation, supplier,
part at fixture scale) broadcast; conditional aggregation replaces
multi-pass scans; the Q15 global max rides an unpartitioned window
over the already-aggregated 100-row supplier frame (PERF.md case 4),
never a re-executed subtree.

Numeric determinism: all money sums use the scaled-long exact
accumulation from ``_shared`` (see its module docstring); ratios
divide two exactly-reproducible doubles in a fixed order, so the
IEEE result is identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import dsum, o_davg, o_dsum, t
from aws_datalake_spark.queries.registry import query

def _rev():
    # Built lazily: creating a Column at import time requires an active
    # SparkContext (pyspark classic asserts one in F.col).
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REV = "l_extendedprice * (1 - l_discount)"


# --- Q7: volume shipping between two nations ----------------------------------

@query(
    "q07_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
           {o_dsum(_O_REV)} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev(), "revenue"))
    )


# --- Q8: market share of one supplier nation inside a region ------------------

@query(
    "q08_market_share",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
           ({o_dsum("CASE WHEN sn.n_name = 'NATION_3' THEN " + _O_REV + " ELSE 0.0 END")})
             / ({o_dsum(_O_REV)}) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (dsum(nation_rev, "_num") / dsum(_rev(), "_den")).alias("mkt_share")
        )
    )


# --- Q10: returned-item ranking -----------------------------------------------

@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {o_dsum(_O_REV)} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- Q12 (adapted): priority classes per return flag --------------------------

@query(
    "q12_priority_classes",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q13: customer order-count distribution -----------------------------------

@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q14: promotion revenue percentage ----------------------------------------

@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * ({o_dsum("CASE WHEN p.p_type = 'ECONOMY' THEN " + _O_REV + " ELSE 0.0 END")})
             / ({o_dsum(_O_REV)}) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "ECONOMY", _rev()).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * dsum(promo, "_num") / dsum(_rev(), "_den")).alias(
                "promo_revenue"
            )
        )
    )


# --- Q15: top supplier (global-max scalar equality) ---------------------------

@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {o_dsum(_O_REV)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), "total_revenue")
    )
    # Global max rides an unpartitioned window over the supplier-sized
    # aggregate (PERF.md case 4) — no re-executed subtree, no second
    # scan of lineitem.
    w = Window.partitionBy(F.lit(1))
    top = revenue.withColumn("_max_rev", F.max("total_revenue").over(w)).filter(
        F.col("total_revenue") == F.col("_max_rev")
    )
    return (
        F.broadcast(top)
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q18: large-volume orders -------------------------------------------------

@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           SUM(l.l_quantity) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 300.0
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_quantity is integer-valued (FIXTURES.md) so a double SUM is
    # exact and order-independent — no scaled accumulation needed.
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 300.0)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "_big_key"),
               F.col("l_orderkey") == F.col("_big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --- Q19: disjunctive pushdown ------------------------------------------------

@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {o_dsum(_O_REV)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & (q >= qlo)
        & (q <= qhi)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(
            branch("Brand#1", 15, 1, 11)
            | branch("Brand#2", 25, 10, 20)
            | branch("Brand#3", 35, 20, 30)
        )
        .agg(dsum(_rev(), "revenue"))
    )


# --- Q21 (adapted): sole returning supplier on multi-supplier orders ----------

@query(
    "q21_blame_supplier",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem
      GROUP BY l_orderkey, l_suppkey
    ),
    blamed AS (
      SELECT l_orderkey,
             MAX(CASE WHEN has_r = 1 THEN l_suppkey END) AS blame_key
      FROM per_supp
      GROUP BY l_orderkey
      HAVING COUNT(*) > 1 AND SUM(has_r) = 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM blamed b
    JOIN supplier s ON s.s_suppkey = b.blame_key
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: find the one supplier 'to blame' per order.

    The fixture lacks commit/receipt dates, so ``l_returnflag = 'R'``
    marks the failing lineitems (reference's lateness predicate).
    Two-level aggregation replaces the EXISTS / NOT EXISTS self-joins
    of textbook Q21: one shuffle on (orderkey, suppkey), one map-side
    combinable rollup to orderkey — no O(n²) self-join of lineitem.
    """
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    per_supp = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    blamed = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("_n_supp"),
            F.sum("has_r").alias("_n_r"),
            F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("blame_key"),
        )
        .filter((F.col("_n_supp") > 1) & (F.col("_n_r") == 1))
    )
    return (
        blamed.join(F.broadcast(s), F.col("blame_key") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --- Q22 (adapted): dormant high-balance customers ----------------------------

@query(
    "q22_dormant_customers",
    oracle=f"""
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           {o_dsum('c.c_acctbal', 2)} AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT {o_davg('c_acctbal', 2)} FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: high-balance customers with no recent orders.

    The scalar average-balance threshold is computed once (customer is
    dim-sized; the unpartitioned window keeps it a single subtree, no
    re-scan), then the anti-join against recent orders prunes with a
    broadcast of the distinct recent custkeys.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    w = Window.partitionBy(F.lit(1))
    avg_pos = (
        F.sum(
            F.when(
                F.col("c_acctbal") > 0.0,
                F.round(F.col("c_acctbal") * F.lit(100.0), 0).cast("long"),
            )
        ).over(w).cast("double")
        / F.lit(100.0)
        / F.sum(F.when(F.col("c_acctbal") > 0.0, 1).otherwise(0)).over(w).cast("double")
    )
    rich = c.withColumn("_avg_pos", avg_pos).filter(
        F.col("c_acctbal") > F.col("_avg_pos")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal", scale=2),
        )
    )


# ---------------------------------------------------------------------------
# Partsupp-dependent shapes (Q2/Q9/Q11/Q16/Q20), adapted
# ---------------------------------------------------------------------------
# The fixture has no partsupp table, so these five use a SYNTHETIC
# partsupp: the distinct (l_partkey, l_suppkey) pairs observed in
# lineitem ("a supplier supplies the parts it has shipped"), with
# s_acctbal standing in for supply cost rank (Q2), 0.6*p_retailprice
# for unit supply cost (Q9), shipped-quantity value for stock value
# (Q11/Q20), and negative account balance for the customer-complaint
# exclusion (Q16). The SHAPES are faithful: correlated max, nested
# scalar threshold, count-distinct over an excluded set, and a
# double-nested semi-join — each the canonical plan pattern of its
# original. Pair-derivation is one hash shuffle of 8-byte keys off
# the fact scan; everything dimensional broadcasts.


@query(
    "q02_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    elig AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN part p     ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON ps.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    )
    SELECT p_partkey, s_name, n_name, s_acctbal
    FROM elig e
    WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM elig e2
                       WHERE e2.p_partkey = e.p_partkey)
    """,
)
def q02_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part correlated max over eligible suppliers
    (best supplier per part in a region). The correlated subquery
    compiles to ONE window max over the already-joined eligible set —
    no re-scan, no self-join; ties keep all rows as in the spec."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    # broadcast-filter the fact to the ~0.1% matching parts BEFORE the
    # pair-distinct: the dedup shuffle then carries only eligible pairs
    # (SHUFFLE.md round 2: 5.77 MB -> ~0) — semantically identical, the
    # filter and the distinct commute
    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_name", "n_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        elig.withColumn("__max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__max_bal"))
        .drop("__max_bal")
    )


@query(
    "q09_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           EXTRACT(YEAR FROM l.l_shipdate) AS o_year,
           {o_dsum("(l_extendedprice * (1 - l_discount)) - ((0.6 * p_retailprice) * l_quantity)")} AS sum_profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year
    """,
)
def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier-nation per year over a
    name-filtered product line; unit supply cost adapted to
    0.6*p_retailprice (no partsupp). One fact scan, three broadcast
    joins, one agg shuffle on (nation, year)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))) - (
        (0.6 * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey AS p_key,
             {o_dsum("l_quantity * p_retailprice", scale=2)} AS part_value
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    ), tot AS (
      SELECT {o_dsum("l_quantity * p_retailprice", scale=2)} AS total_value
      FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
    )
    SELECT p_key, part_value
    FROM pv, tot
    WHERE part_value > total_value * 0.001
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part stock value for one nation's suppliers,
    kept only above a fraction of the NATION-WIDE total (nested
    scalar aggregate). The total re-aggregates the exact scaled-long
    sum from base data — never a float re-sum of per-part doubles,
    which is order-dependent and would break the strict hash — and
    reaches the filter as a broadcast 1-row cross join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    value = F.col("l_quantity") * F.col("p_retailprice")
    pv = base.groupBy(F.col("l_partkey").alias("p_key")).agg(
        dsum(value, "part_value", scale=2)
    )
    tot = base.agg(dsum(value, "total_value", scale=2))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total_value") * 0.001)
        .select("p_key", "part_value")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute
    bucket, excluding a subquery-defined supplier set (complaint
    suppliers adapted to negative account balance). The NOT IN
    compiles to a broadcast left-anti join — never a per-row
    subquery."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    # part filter pushed below the pair-distinct (commutes; shrinks the
    # dedup shuffle to the eligible-part fraction of pairs)
    ps = (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .distinct()
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        ps.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_inventory_suppliers",
    oracle=f"""
    WITH q96 AS (
      SELECT l_partkey, l_suppkey,
             {o_dsum("l_quantity", scale=2)} AS qty_96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ), qall AS (
      SELECT l_partkey, {o_dsum("l_quantity", scale=2)} AS qty_all
      FROM lineitem GROUP BY l_partkey
    ), cand AS (
      SELECT DISTINCT q96.l_suppkey
      FROM q96
      JOIN qall ON q96.l_partkey = qall.l_partkey
      JOIN part p ON q96.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%'
        AND q96.qty_96 > qall.qty_all * 0.05
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM cand)
    """,
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: double-nested semi-join — suppliers whose 1996
    shipped volume of a name-filtered part exceeds a fraction of
    that part's all-time volume (availqty adapted to shipped
    quantity). Both aggregates group on the same l_partkey prefix,
    so AQE coalesces them onto one exchange lineage; the final IN
    is a broadcast semi-join into the 100-row supplier dim."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    # both aggregates are consumed only for 'small%' parts; the
    # broadcast semi-join below the group-bys shrinks both agg
    # shuffles to that fraction (filter/agg commute on the join key)
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    q96 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "qty_96", scale=2))
    )
    qall = li.groupBy("l_partkey").agg(dsum("l_quantity", "qty_all", scale=2))
    cand = (
        q96.join(qall, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .filter(F.col("qty_96") > F.col("qty_all") * 0.05)
        .select("l_suppkey")
        .distinct()
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(cand),
            s.s_suppkey == cand.l_suppkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name", "n_name")
    )


# --- Q4: order priority checking (r08: the last two canonical numbers
# get their qNN-named forms; the fixture lacks commitdate/receiptdate,
# so "late" is adapted to shipped > 60 days after the order date) ------


@query(
    "q04_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: quarterly orders
    with at least one lineitem shipped more than 60 days after the
    order date, counted per priority — the EXISTS-to-semi-join shape.
    Plan: the date filter prunes orders BEFORE the semi-join, the
    fact side carries only (orderkey, shipdate), one shuffle each
    side, and the priority rollup is map-combinable."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --- Q6: forecasting revenue change -----------------------------------


@query(
    "q06_forecast_revenue",
    oracle=f"""
    SELECT {o_dsum("l_extendedprice * l_discount")} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    multi-range-predicate scan-aggregate — revenue that would have
    been earned by dropping mid-band discounts on small quantities.
    No joins; the whole query is one scan whose THREE range filters
    must all reach PushedFilters and whose aggregate is one
    map-combined row per task."""
    li = t(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
