"""Driver-round r09 query batch (driver's round counter, per VERDICT
r07 item 8).

Widens the engine's analytics surface with the operator families a
warehouse-replacement user still reaches for elsewhere, all
exact-arithmetic and hash-certifiable:

* parametric statistics: one-way ANOVA F (the parametric sibling of
  the r07 Kruskal–Wallis on the same column), Brown–Forsythe
  equal-variance test (median-based Levene), Jarque–Bera normality
  (exact raw moments → skewness/kurtosis), Durbin–Watson residual
  autocorrelation on the monthly trend fit, point-biserial
  correlation, Cohen's d effect size;
* market / finance analytics: Herfindahl–Hirschman concentration,
  Paasche + Fisher price indexes (closing the Laspeyres family),
  maximum drawdown on the cumulative revenue curve, brand VWAP;
* retrieval / classifier eval: MRR@k and MAP@k over the embedding
  space (the ranking complements of r08's kNN accuracy + PR curve),
  a threshold-sweep confusion matrix, Brier score + reliability
  (calibration) bins from an integer-exact milli-probability score;
* graph: BFS hop layers from a pinned anchor (reachability /
  diameter probe; frontier iteration vs a recursive-CTE oracle);
* spatial: grid-bucketed radius join over deterministic synthetic
  coordinates (the geohash pattern: 3×3 neighbor-cell replication
  of the smaller side, home-cell join, exact integer distance);
* text: per-source type-token ratio (lexical diversity rollup).

Reference parity: the reference's GAM/statistics module stops at
describe()-level aggregates (reference: etl/transforms.py) — these
queries are the Spark-first extensions of that surface to the tests
an analyst actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import t
from aws_datalake_spark.queries.registry import query


# ---------------------------------------------------------------------------
# one-way ANOVA F
# ---------------------------------------------------------------------------


@query(
    "q_anova_f",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS x
      FROM customer
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM v GROUP BY 1
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS ncum, SUM(s) AS scum, SUM(q) AS qcum,
             list_reduce(list(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY g), (p, q) -> p + q) AS ssg
      FROM per_g HAVING COUNT(*) > 0
    )
    SELECT k, CAST(ncum AS BIGINT) AS n,
           ssg - CAST(scum * scum AS DOUBLE) / CAST(ncum AS DOUBLE)
             AS ss_between,
           CAST(qcum AS DOUBLE) - ssg AS ss_within,
           CASE WHEN k > 1 AND ncum > k
                     AND CAST(qcum AS DOUBLE) - ssg > 0.0 THEN
             ((ssg - CAST(scum * scum AS DOUBLE) / CAST(ncum AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(qcum AS DOUBLE) - ssg)
                / (CAST(ncum AS DOUBLE) - CAST(k AS DOUBLE)))
           END AS f_stat
    FROM folded
    """,
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the five customer segments on balance
    cents (operators/stats.py:anova_oneway): the PARAMETRIC sibling
    of q_kruskal_wallis on the same column — equal-means test from
    exact DECIMAL moments, per-group S²/n terms folded in pinned
    group order (ordered-list reduce, k-unbounded per ADVICE r09),
    F one mirrored IEEE tree."""
    from aws_datalake_spark.operators.stats import anova_oneway

    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    return anova_oneway(c, "c_mktsegment", F.col("cents"))


# ---------------------------------------------------------------------------
# Brown–Forsythe (median-based Levene) equal-variance test
# ---------------------------------------------------------------------------


@query(
    "q_brown_forsythe",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x
      FROM lineitem
    ),
    med AS (
      SELECT g, x AS m FROM (
        SELECT g, x, ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS n
        FROM v
      ) WHERE rn = (n - 1) // 2 + 1
    ),
    z AS (
      SELECT v.g, ABS(2 * v.x - 2 * med.m) AS x
      FROM v JOIN med USING (g)
    ),
    per_g AS (
      SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s,
             SUM(CAST(x AS HUGEINT) * x) AS q
      FROM z GROUP BY 1
    ),
    folded AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(n) AS ncum, SUM(s) AS scum, SUM(q) AS qcum,
             list_reduce(list(CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)
                              ORDER BY g), (p, q) -> p + q) AS ssg
      FROM per_g HAVING COUNT(*) > 0
    )
    SELECT k, CAST(ncum AS BIGINT) AS n,
           ssg - CAST(scum * scum AS DOUBLE) / CAST(ncum AS DOUBLE)
             AS ss_between,
           CAST(qcum AS DOUBLE) - ssg AS ss_within,
           CASE WHEN k > 1 AND ncum > k
                     AND CAST(qcum AS DOUBLE) - ssg > 0.0 THEN
             ((ssg - CAST(scum * scum AS DOUBLE) / CAST(ncum AS DOUBLE))
              / (CAST(k AS DOUBLE) - 1.0))
             / ((CAST(qcum AS DOUBLE) - ssg)
                / (CAST(ncum AS DOUBLE) - CAST(k AS DOUBLE)))
           END AS f_stat
    FROM folded
    """,
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe equal-variance test on quantity across return
    flags (operators/stats.py:anova_oneway over median absolute
    deviations): ANOVA F applied to |2x − 2·median_g| — the
    robust Levene variant ("do these groups have the same SPREAD",
    the precondition check for q_anova_f). Doubling keeps the
    deviations integral for even-n lower-discrete medians; F is
    scale-invariant so the statistic is unchanged. Medians come from
    a per-group rank window over the bounded quantity domain."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.stats import anova_oneway

    v = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("long").alias("x"),
    )
    w = Window.partitionBy("g").orderBy("x")
    wn = Window.partitionBy("g")
    med = (
        v.select(
            "g",
            "x",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.col("rn") == F.floor((F.col("n") - F.lit(1)) / F.lit(2)) + 1)
        .select("g", F.col("x").alias("m"))
    )
    z = v.join(med, "g").select(
        "g", F.abs(2 * F.col("x") - 2 * F.col("m")).alias("z2")
    )
    return anova_oneway(z, "g", F.col("z2"))


# ---------------------------------------------------------------------------
# Jarque–Bera normality test
# ---------------------------------------------------------------------------


@query(
    "q_jarque_bera",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x
      FROM lineitem
    ),
    agg AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS s1,
             SUM(CAST(x AS HUGEINT) * x) AS s2,
             SUM(CAST(x AS HUGEINT) * x * x) AS s3,
             SUM(CAST(x AS HUGEINT) * x * x * x) AS s4
      FROM v GROUP BY 1
    ),
    d AS (
      SELECT g, n, CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
             CAST(s3 AS DOUBLE) AS s3d, CAST(s4 AS DOUBLE) AS s4d
      FROM agg
    ),
    c1 AS (SELECT *, s1d / nd AS m1 FROM d),
    c2 AS (
      SELECT *,
             s2d / nd - m1 * m1 AS m2,
             s3d / nd - 3.0 * m1 * (s2d / nd) + 2.0 * m1 * m1 * m1 AS m3,
             s4d / nd - 4.0 * m1 * (s3d / nd)
               + 6.0 * (m1 * m1) * (s2d / nd)
               - 3.0 * (m1 * m1 * m1 * m1) AS m4
      FROM c1
    ),
    c3 AS (
      SELECT *, m3 / (m2 * SQRT(m2)) AS sk, m4 / (m2 * m2) AS ku
      FROM c2
    )
    SELECT g AS l_returnflag, n,
           CASE WHEN m2 > 0.0 THEN sk END AS skewness,
           CASE WHEN m2 > 0.0 THEN ku END AS kurtosis,
           CASE WHEN m2 > 0.0 THEN
             (nd / 6.0) * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0)
           END AS jb
    FROM c3
    """,
)
def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test on quantity per return flag
    (operators/stats.py:jarque_bera): exact Σx..Σx⁴ DECIMAL moments
    → skewness/kurtosis → JB, a fixed mirrored IEEE tree (no POWER —
    libm pow differs across engines; m₂^1.5 is m₂·√m₂). The uniform
    quantity column should read as aggressively non-normal (negative
    excess kurtosis) — the "is a t-test even valid here" gate."""
    from aws_datalake_spark.operators.stats import jarque_bera

    v = t(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag"), F.col("l_quantity").cast("long").alias("x")
    )
    return jarque_bera(v, "l_returnflag", F.col("x"))


# ---------------------------------------------------------------------------
# Durbin–Watson residual autocorrelation
# ---------------------------------------------------------------------------


@query(
    "q_durbin_watson",
    oracle="""
    WITH ser AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS t,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(t AS HUGEINT)) AS st,
             SUM(CAST(t AS HUGEINT) * t) AS stt,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(t AS HUGEINT) * y) AS sty
      FROM ser
    ),
    par AS (
      SELECT n,
             CAST(CAST(n AS HUGEINT) * sty - st * sy AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * stt - st * st AS DOUBLE) AS b,
             (CAST(sy AS DOUBLE)
              - (CAST(CAST(n AS HUGEINT) * sty - st * sy AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * stt - st * st AS DOUBLE))
                * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS a
      FROM mom
    ),
    resid AS (
      SELECT ser.t, par.n, par.b,
             CAST(ser.y AS DOUBLE)
               - (par.a + par.b * CAST(ser.t AS DOUBLE)) AS e
      FROM ser, par
    ),
    diffd AS (
      SELECT t, n, b, e, e - LAG(e) OVER (ORDER BY t) AS dd FROM resid
    ),
    folded AS (
      SELECT n, b,
             list_reduce(list(e * e ORDER BY t), (p, q) -> p + q)
               AS den,
             list_reduce(list(COALESCE(dd * dd, 0.0) ORDER BY t),
                         (p, q) -> p + q) AS num
      FROM diffd GROUP BY n, b
    )
    SELECT CAST(n AS BIGINT) AS n, b AS slope,
           CASE WHEN den > 0.0 THEN num / den END AS dw
    FROM folded
    """,
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic on the residuals of the monthly
    revenue trend line (operators/stats.py:durbin_watson): fit
    y ~ month by exact-moment OLS, then DW = Σ(Δe)²/Σe² — "did the
    linear trend leave serially-correlated errors" (DW ≈ 2 clean;
    → 0 means momentum the trend missed). The corpus collapses to
    the ~84-month series in one aggregate; residual folds run in
    pinned month order."""
    from aws_datalake_spark.operators.stats import durbin_watson

    ser = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.year("o_orderdate") * 12 + F.month("o_orderdate")
            ).cast("long").alias("m")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("y")
        )
    )
    return durbin_watson(ser, F.col("m"), F.col("y"))


# ---------------------------------------------------------------------------
# point-biserial correlation
# ---------------------------------------------------------------------------


@query(
    "q_point_biserial",
    oracle="""
    WITH v AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS x,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx,
             SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy
      FROM v
    )
    SELECT n,
           CASE WHEN CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                     > 0.0
                 AND CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)
                     > 0.0 THEN
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(CAST(n AS HUGEINT) * syy - sy * sy
                            AS DOUBLE)))
           END AS corr
    FROM agg
    """,
)
def q_point_biserial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-biserial correlation between the urgent-priority flag
    and order value (operators/stats.py:exact_corr — point-biserial
    IS Pearson with a 0/1 regressor): "do urgent orders run larger",
    the dichotomous-vs-continuous association readout beside
    q_ab_test_proportions' rate test. Exact integer moments; one
    mirrored IEEE combination."""
    from aws_datalake_spark.operators.stats import exact_corr

    v = t(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT")
        .cast("long")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    return exact_corr(v, F.col("x"), F.col("y"))


# ---------------------------------------------------------------------------
# Cohen's d effect size
# ---------------------------------------------------------------------------


@query(
    "q_cohens_d",
    oracle="""
    WITH v AS (
      SELECT c.c_mktsegment AS g,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS x
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    agg AS (
      SELECT SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN g = 'AUTOMOBILE' THEN CAST(x AS HUGEINT)
                      ELSE 0 END) AS sa,
             SUM(CASE WHEN g = 'AUTOMOBILE'
                      THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qa,
             SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS nb,
             SUM(CASE WHEN g = 'BUILDING' THEN CAST(x AS HUGEINT)
                      ELSE 0 END) AS sb,
             SUM(CASE WHEN g = 'BUILDING'
                      THEN CAST(x AS HUGEINT) * x ELSE 0 END) AS qb
      FROM v
    ),
    e AS (
      SELECT na, nb,
             CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd,
             CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
             (CAST(qa AS DOUBLE)
              - CAST(sa * sa AS DOUBLE) / CAST(na AS DOUBLE))
               / (CAST(na AS DOUBLE) - 1.0) AS va,
             (CAST(qb AS DOUBLE)
              - CAST(sb * sb AS DOUBLE) / CAST(nb AS DOUBLE))
               / (CAST(nb AS DOUBLE) - 1.0) AS vb
      FROM agg
    ),
    p AS (
      SELECT *,
             SQRT(((nad - 1.0) * va + (nbd - 1.0) * vb)
                  / (nad + nbd - 2.0)) AS pooled
      FROM e
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CASE WHEN na > 0 THEN ma END AS mean_a,
           CASE WHEN nb > 0 THEN mb END AS mean_b,
           CASE WHEN na > 1 AND nb > 1 AND pooled > 0.0
                THEN (ma - mb) / pooled END AS d
    FROM p
    """,
)
def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d effect size for order value, AUTOMOBILE vs BUILDING
    (operators/stats.py:cohens_d): HOW different are the segment
    means in pooled-σ units — the magnitude companion to
    q_welch_ttest's significance. Exact DECIMAL moments; one
    mirrored IEEE tree."""
    from aws_datalake_spark.operators.stats import cohens_d

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    v = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("g"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("x"),
    )
    return cohens_d(v, "g", F.col("x"), "AUTOMOBILE", "BUILDING")


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman concentration
# ---------------------------------------------------------------------------


@query(
    "q_hhi_concentration",
    oracle="""
    WITH per_u AS (
      SELECT s.s_nationkey AS nk, l.l_suppkey AS u,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS v
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    sh AS (
      SELECT nk, u,
             CAST(v AS DOUBLE)
               / CAST(SUM(v) OVER (PARTITION BY nk) AS DOUBLE) AS s,
             SUM(v) OVER (PARTITION BY nk) AS tot
      FROM per_u
    ),
    agg AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS k, MIN(tot) AS tot,
             list_reduce(list(s * s ORDER BY u), (p, q) -> p + q)
               AS hhi
      FROM sh GROUP BY 1
    )
    SELECT n.n_name, k AS n_units,
           CASE WHEN tot > 0 THEN hhi END AS hhi,
           CASE WHEN tot > 0 THEN 1.0 / hhi END AS effective_units
    FROM agg JOIN nation n ON agg.nk = n.n_nationkey
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation
    (operators/stats.py:hhi_concentration): HHI = Σ share² over each
    nation's suppliers with the effective-supplier count 1/HHI —
    "is this market one hub or a level field". Per-supplier shares
    are one correctly-rounded divide each of exact integer cents
    over the exact group total, and HHI folds Σ share² in pinned
    supplier order (ordered-list reduce — NOT the one-divide
    Σv²/(Σv)² form, whose >2^53 squared totals cast to double
    non-correctly-rounded in DuckDB; see the operator's comment).
    The corpus collapses in one (nation, supplier) aggregate and
    the nation dim broadcasts."""
    from aws_datalake_spark.operators.stats import hhi_concentration

    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    v = li.join(
        F.broadcast(s.select("s_suppkey", "s_nationkey")),
        li.l_suppkey == F.col("s_suppkey"),
    ).select(
        F.col("s_nationkey").alias("nk"),
        F.col("l_suppkey").alias("u"),
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents"),
    )
    hhi = hhi_concentration(v, "nk", "u", F.col("cents"))
    return hhi.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        hhi.nk == F.col("n_nationkey"),
    ).select("n_name", "n_units", "hhi", "effective_units")


# ---------------------------------------------------------------------------
# Paasche + Fisher price indexes (closing the Laspeyres family)
# ---------------------------------------------------------------------------

_PI9_BASE = 1996


@query(
    "q_paasche_fisher",
    oracle=f"""
    WITH py AS (
      SELECT l_partkey,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS y,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS c,
             SUM(CAST(l_quantity AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    base AS (SELECT l_partkey, c AS c0, q AS q0 FROM py
             WHERE y = {_PI9_BASE}),
    j AS (
      SELECT py.y, py.l_partkey,
             CAST(CAST(py.c AS HUGEINT) * base.q0 AS DOUBLE)
               / CAST(py.q AS DOUBLE) AS lnum_term,
             CAST(CAST(base.c0 AS HUGEINT) * py.q AS DOUBLE)
               / CAST(base.q0 AS DOUBLE) AS pden_term,
             py.c, base.c0
      FROM py JOIN base ON py.l_partkey = base.l_partkey
    ),
    folded AS (
      SELECT y, CAST(COUNT(*) AS BIGINT) AS k,
             list_reduce(list(lnum_term ORDER BY l_partkey),
                         (p, q) -> p + q) AS lnum,
             list_reduce(list(pden_term ORDER BY l_partkey),
                         (p, q) -> p + q) AS pden,
             SUM(CAST(c0 AS HUGEINT)) AS lden,
             SUM(CAST(c AS HUGEINT)) AS pnum
      FROM j GROUP BY y
    )
    SELECT y AS year, k AS n_parts,
           lnum / CAST(lden AS DOUBLE) AS laspeyres,
           CAST(pnum AS DOUBLE) / pden AS paasche,
           SQRT((lnum / CAST(lden AS DOUBLE))
                * (CAST(pnum AS DOUBLE) / pden)) AS fisher
    FROM folded
    """,
)
def q_paasche_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paasche and Fisher price indexes per ship year vs the 1996
    basket (the two CPI constructions q_laspeyres_index leaves
    open): P_t = Σp_t·q_t / Σp₀·q_t prices the CURRENT basket at
    base prices (Laspeyres prices the base basket at current
    prices); Fisher = √(L·P) is the geometric compromise. Numerator
    and denominator terms are exact-DECIMAL products with one
    correctly-rounded divide each, folded in PINNED partkey order
    (the ordered-list reduce; per-term products stay < 2^53 —
    part-year cents × part-year quantity); the telescoping sides
    Σc₀ / Σc_t are exact integers. One (part, year) aggregate
    collapses the corpus."""
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    li = t(spark, sf_dir, "lineitem")
    py = _truncate(
        li.groupBy(
            "l_partkey",
            F.year("l_shipdate").cast("long").alias("y"),
        ).agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("c"),
            F.sum(F.col("l_quantity").cast("long")).alias("q"),
        )
    )
    base = py.where(F.col("y") == _PI9_BASE).select(
        "l_partkey", F.col("c").alias("c0"), F.col("q").alias("q0")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = py.join(base, "l_partkey").select(
        "y",
        "l_partkey",
        (
            (dec(F.col("c")) * dec(F.col("q0"))).cast("double")
            / F.col("q").cast("double")
        ).alias("lnum_term"),
        (
            (dec(F.col("c0")) * dec(F.col("q"))).cast("double")
            / F.col("q0").cast("double")
        ).alias("pden_term"),
        "c",
        "c0",
    )

    def _fold(col: str):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_partkey", col))),
                lambda st: st[col],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = j.groupBy("y").agg(
        F.count(F.lit(1)).alias("k"),
        _fold("lnum_term").alias("lnum"),
        _fold("pden_term").alias("pden"),
        F.sum(dec(F.col("c0"))).alias("lden"),
        F.sum(dec(F.col("c"))).alias("pnum"),
    )
    lasp = F.col("lnum") / F.col("lden").cast("double")
    paas = F.col("pnum").cast("double") / F.col("pden")
    return folded.select(
        F.col("y").alias("year"),
        F.col("k").cast("long").alias("n_parts"),
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# maximum drawdown on the cumulative revenue curve
# ---------------------------------------------------------------------------


@query(
    "q_max_drawdown",
    oracle="""
    WITH daily AS (
      SELECT l_shipdate AS d,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS r
      FROM lineitem GROUP BY 1
    ),
    cumc AS (
      SELECT d,
             SUM(r) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum
      FROM daily
    ),
    curve AS (
      SELECT d, cum,
             MAX(cum) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS runmax
      FROM cumc
    ),
    dd AS (
      SELECT CAST(d AS TIMESTAMP) AS trough_date,
             CAST(runmax AS BIGINT) AS peak_cents,
             CAST(cum AS BIGINT) AS trough_cents,
             CAST(runmax - cum AS BIGINT) AS drawdown_cents,
             ROW_NUMBER() OVER (ORDER BY runmax - cum DESC, d) AS rn
      FROM curve
    )
    SELECT trough_date, peak_cents, trough_cents, drawdown_cents,
           CAST(drawdown_cents AS DOUBLE) / CAST(peak_cents AS DOUBLE)
             AS drawdown_frac
    FROM dd WHERE rn = 1
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily revenue curve: the
    day where revenue-to-date fell furthest below its running peak,
    with the peak/trough levels and the fractional depth — the
    risk-analytics staple, here entirely in EXACT integer cents
    (cumulative and running-max windows over longs are
    order-independent; the curve is day-domain-sized, ~2.5k rows, so
    the unpartitioned window is bounded). One divide at the end."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.col("l_shipdate").alias("d")).agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
        ).alias("r")
    )
    wo = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = daily.select(
        "d", F.sum("r").over(wo).alias("cum")
    ).select(
        "d", "cum", F.max("cum").over(wo).alias("runmax")
    )
    ranked = curve.select(
        F.col("d").alias("trough_date"),
        F.col("runmax").alias("peak_cents"),
        F.col("cum").alias("trough_cents"),
        (F.col("runmax") - F.col("cum")).alias("drawdown_cents"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("runmax") - F.col("cum")), F.asc("d")))
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return ranked.select(
        "trough_date",
        "peak_cents",
        "trough_cents",
        "drawdown_cents",
        (
            F.col("drawdown_cents").cast("double")
            / F.col("peak_cents").cast("double")
        ).alias("drawdown_frac"),
    )


# ---------------------------------------------------------------------------
# brand VWAP
# ---------------------------------------------------------------------------


@query(
    "q_vwap_brand",
    oracle="""
    SELECT p.p_brand,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS year,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0
             AS vwap
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
)
def q_vwap_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average unit price per brand and ship year:
    VWAP = Σ(price·qty)/Σqty — and since extendedprice IS the
    line's price×quantity, the numerator is the exact cents total.
    One divide of exact integers (then /100 back to dollars), one
    aggregate over the broadcast part join."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand", F.year("l_shipdate").cast("long").alias("year")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                ).cast("double")
                / F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.lit(100.0)
            ).alias("vwap"),
        )
    )


# ---------------------------------------------------------------------------
# grid-bucketed spatial radius join
# ---------------------------------------------------------------------------

_GRID_CELL = 150
_GRID_R2 = 150 * 150


@query(
    "q_spatial_grid_join",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey,
             (c_custkey * 7919) % 10000 AS xc,
             (c_custkey * 104729) % 10000 AS yc
      FROM customer
    ),
    offs AS (
      SELECT dx, dy
      FROM (VALUES (-1), (0), (1)) o(dx), (VALUES (-1), (0), (1)) p(dy)
    ),
    c9 AS (
      SELECT c_custkey, xc, yc,
             CAST(FLOOR(xc / {_GRID_CELL}) AS BIGINT) + dx AS cx,
             CAST(FLOOR(yc / {_GRID_CELL}) AS BIGINT) + dy AS cy
      FROM c, offs
    ),
    s AS (
      SELECT s_suppkey, s_nationkey,
             (s_suppkey * 7919 + 3571) % 10000 AS xs,
             (s_suppkey * 104729 + 9973) % 10000 AS ys
      FROM supplier
    ),
    sc AS (
      SELECT s_suppkey, s_nationkey, xs, ys,
             CAST(FLOOR(xs / {_GRID_CELL}) AS BIGINT) AS cx,
             CAST(FLOOR(ys / {_GRID_CELL}) AS BIGINT) AS cy
      FROM s
    ),
    pairs AS (
      SELECT c9.c_custkey, sc.s_suppkey, sc.s_nationkey
      FROM c9 JOIN sc USING (cx, cy)
      WHERE (xc - xs) * (xc - xs) + (yc - ys) * (yc - ys) <= {_GRID_R2}
    )
    SELECT n.n_name, COUNT(*) AS n_pairs,
           CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
    FROM pairs JOIN nation n ON pairs.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed radius join (the geohash / S2-cell pattern):
    customers and suppliers get deterministic synthetic coordinates
    (pure integer arithmetic on their keys — reproducible in any
    engine, unlike hash-derived), the SMALLER side (customers here
    per pair semantics; cells are the scale lever) is replicated to
    its 3×3 neighbor cells with cell size ≥ radius, suppliers join
    on their HOME cell only — so every within-radius pair matches in
    exactly one cell and the join never goes quadratic: work is
    Σ_cell |c_cell|·|s_cell|, not |C|·|S|. Per-nation pair counts;
    all exact integers."""
    c = t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 10000).alias("xc"),
        ((F.col("c_custkey") * 104729) % 10000).alias("yc"),
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    c9 = c.crossJoin(F.broadcast(offs)).select(
        "c_custkey",
        "xc",
        "yc",
        (F.floor(F.col("xc") / _GRID_CELL) + F.col("dx")).alias("cx"),
        (F.floor(F.col("yc") / _GRID_CELL) + F.col("dy")).alias("cy"),
    )
    s = t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        ((F.col("s_suppkey") * 7919 + 3571) % 10000).alias("xs"),
        ((F.col("s_suppkey") * 104729 + 9973) % 10000).alias("ys"),
    )
    sc = s.select(
        "s_suppkey",
        "s_nationkey",
        "xs",
        "ys",
        F.floor(F.col("xs") / _GRID_CELL).alias("cx"),
        F.floor(F.col("ys") / _GRID_CELL).alias("cy"),
    )
    pairs = c9.join(F.broadcast(sc), ["cx", "cy"]).where(
        (F.col("xc") - F.col("xs")) * (F.col("xc") - F.col("xs"))
        + (F.col("yc") - F.col("ys")) * (F.col("yc") - F.col("ys"))
        <= _GRID_R2
    )
    n = t(spark, sf_dir, "nation")
    agg = pairs.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
        F.countDistinct("c_custkey").alias("n_customers"),
    )
    return agg.join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        agg.s_nationkey == F.col("n_nationkey"),
    ).select("n_name", "n_pairs", "n_suppliers", "n_customers")


# ---------------------------------------------------------------------------
# type-token ratio (lexical diversity) rollup
# ---------------------------------------------------------------------------


@query(
    "llm_ttr_diversity",
    oracle="""
    WITH per AS (
      SELECT source,
             CAST(len(list_distinct(string_split(text, ' ')))
                  AS BIGINT) AS n_types,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_types) AS BIGINT) AS sum_types,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_types) AS DOUBLE) / CAST(SUM(n_tokens) AS DOUBLE)
             AS pooled_ttr
    FROM per GROUP BY 1
    """,
)
def llm_ttr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio per source (pooled): distinct-token count
    over token count — the lexical-diversity screen (template/spam
    sources score low; TTR complements llm_simpson_diversity's
    concentration view with a per-document vocabulary view). Exact
    integer counts; ONE divide per source row."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    per = d.select(
        "source",
        F.size(F.array_distinct(toks)).cast("long").alias("n_types"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_types").alias("sum_types"),
        F.sum("n_tokens").alias("sum_tokens"),
        (
            F.sum("n_types").cast("double")
            / F.sum("n_tokens").cast("double")
        ).alias("pooled_ttr"),
    )


# ---------------------------------------------------------------------------
# threshold-sweep confusion matrix
# ---------------------------------------------------------------------------

_CONF_THRESHOLDS = (100000, 200000, 300000, 400000)


@query(
    "q_confusion_thresholds",
    oracle=f"""
    WITH th AS (
      SELECT CAST(threshold AS BIGINT) AS threshold
      FROM (VALUES {", ".join(f"({v})" for v in _CONF_THRESHOLDS)})
           v(threshold)
    ),
    lab AS (
      SELECT o_totalprice AS score,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
               AS y
      FROM orders
    ),
    cells AS (
      SELECT th.threshold,
             SUM(CASE WHEN score >= threshold AND y = 1
                      THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN score >= threshold AND y = 0
                      THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN score < threshold AND y = 1
                      THEN 1 ELSE 0 END) AS fn,
             SUM(CASE WHEN score < threshold AND y = 0
                      THEN 1 ELSE 0 END) AS tn
      FROM lab, th GROUP BY 1
    )
    SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
           CASE WHEN tp + fp > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END
             AS precision,
           CASE WHEN tp + fn > 0 THEN
             CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
    FROM cells
    """,
)
def q_confusion_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix swept over four decision thresholds of a
    score (order value) against a binary outcome (urgent priority):
    tp/fp/fn/tn plus precision/recall per threshold — the operating-
    point picker that llm_pr_curve's decile cuts don't give when the
    thresholds are business-fixed. One scan fans each row into the
    four cells per threshold via a tiny broadcast cross join; exact
    counts, guarded divides."""
    o = t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )
    th = spark.createDataFrame(
        [(v,) for v in _CONF_THRESHOLDS], "threshold long"
    )
    cells = o.crossJoin(F.broadcast(th)).groupBy("threshold").agg(
        F.sum(
            ((F.col("score") >= F.col("threshold")) & (F.col("y") == 1))
            .cast("long")
        ).alias("tp"),
        F.sum(
            ((F.col("score") >= F.col("threshold")) & (F.col("y") == 0))
            .cast("long")
        ).alias("fp"),
        F.sum(
            ((F.col("score") < F.col("threshold")) & (F.col("y") == 1))
            .cast("long")
        ).alias("fn"),
        F.sum(
            ((F.col("score") < F.col("threshold")) & (F.col("y") == 0))
            .cast("long")
        ).alias("tn"),
    )
    return cells.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Brier score + reliability (calibration) bins
# ---------------------------------------------------------------------------

_CAL_STOPS = "('the', 'and', 'of', 'to', 'a')"


@query(
    "llm_brier_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT (1000 * len(list_filter(string_split(text, ' '),
                                     w -> w IN {_CAL_STOPS})))
               // len(string_split(text, ' ')) AS p_milli,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT p_milli // 100 AS bin, COUNT(*) AS n,
           CAST(SUM(p_milli) AS DOUBLE) / 1000.0
             / CAST(COUNT(*) AS DOUBLE) AS mean_pred,
           CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS frac_pos,
           CAST(SUM((p_milli - 1000 * y) * (p_milli - 1000 * y))
                AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
             AS brier
    FROM scored GROUP BY 1
    """,
)
def llm_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability (calibration) bins + per-bin Brier score for an
    integer-exact milli-probability classifier (stopword-ratio →
    "is this English"): bin by predicted probability decile, report
    mean prediction vs realized positive rate (the reliability
    diagram) and the Brier mean-squared error. The score is
    (1000·stopwords) div tokens — an exact INTEGER in both engines
    (no float rounding anywhere), so (p − y)²·10⁶ sums exactly in
    int64 and every output is exact-over-exact divides."""
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stops = ["the", "and", "of", "to", "a"]
    scored = d.select(
        F.size(F.filter(toks, lambda w: w.isin(stops))).alias("stop"),
        F.size(toks).alias("tok"),
        (F.col("lang") == "en").cast("int").alias("y"),
    ).selectExpr("(1000 * stop) DIV tok AS p_milli", "y")
    return (
        scored.selectExpr("p_milli DIV 100 AS bin", "p_milli", "y")
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("p_milli").cast("double")
                / F.lit(1000.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_pred"),
            (
                F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("frac_pos"),
            (
                F.sum(
                    (F.col("p_milli") - 1000 * F.col("y"))
                    * (F.col("p_milli") - 1000 * F.col("y"))
                ).cast("double")
                / F.lit(1000000.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("brier"),
        )
    )


# ---------------------------------------------------------------------------
# MRR@k and MAP@k retrieval eval over the embedding space
# ---------------------------------------------------------------------------

_EV_NQ = 100
_EV_K = 10


def _ev_ranked_sql() -> str:
    """Shared CTE prefix: cosine top-k per held-out query with the
    ground-truth (same-label) flag — the llm_knn_eval device."""
    from aws_datalake_spark.queries.llm_similarity import _cos

    cos = _cos("q.v", "c.v")
    return f"""
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
          FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {_EV_NQ}),
    c AS (SELECT * FROM e WHERE vec_id >= {_EV_NQ}),
    top AS (
      SELECT qid, tlabel, nlabel, rk FROM (
        SELECT q.vec_id AS qid, q.label AS tlabel, c.label AS nlabel,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos} DESC, c.vec_id) AS rk
        FROM q, c
      ) WHERE rk <= {_EV_K}
    )"""


@query(
    "llm_mrr_eval",
    oracle=f"""
    WITH {_ev_ranked_sql()},
    fr AS (
      SELECT qid, CAST(MIN(rk) AS BIGINT) AS fr FROM top
      WHERE nlabel = tlabel GROUP BY 1
    ),
    per_q AS (
      SELECT q.vec_id AS qid, q.label AS tlabel,
             COALESCE(fr.fr, 0) AS fr0
      FROM q LEFT JOIN fr ON q.vec_id = fr.qid
    ),
    counts AS (
      SELECT tlabel, fr0, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM per_q GROUP BY 1, 2
    ),
    folded AS (
      SELECT tlabel, CAST(SUM(cnt) AS BIGINT) AS n,
             list_reduce(list(CASE WHEN fr0 > 0 THEN
                                CAST(cnt AS DOUBLE)
                                * (1.0 / CAST(fr0 AS DOUBLE))
                              ELSE 0.0 END ORDER BY fr0),
                         (p, q) -> p + q) AS s
      FROM counts GROUP BY 1
    )
    SELECT tlabel AS label, n AS n_queries,
           s / CAST(n AS DOUBLE) AS mrr
    FROM folded
    """,
)
def llm_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the first same-label neighbor in the
    cosine top-10, per label (operators/similarity.py:cosine_topk):
    the "how fast does retrieval find something relevant" eval
    beside llm_knn_eval's majority-vote accuracy. Queries with no
    relevant hit in the window contribute 0. The reciprocal ranks
    take only k+1 distinct values, so MRR folds over the tiny
    (label, first-rank) count grid in pinned rank order — exact
    counts, one divide per term, one per label."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.similarity import cosine_topk
    from aws_datalake_spark.queries.llm_similarity import _emb_double

    e = _emb_double(spark, sf_dir)
    queries = e.where(F.col("vec_id") < _EV_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("tlabel"),
        "embedding",
    )
    corpus = e.where(F.col("vec_id") >= _EV_NQ)
    topk = cosine_topk(
        corpus, queries.select("query_id", "embedding"), k=_EV_K
    )
    rel = (
        topk.join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .join(queries.select("query_id", "tlabel"), "query_id")
        .where(F.col("nlabel") == F.col("tlabel"))
    )
    fr = rel.groupBy("query_id").agg(
        F.min("rank").cast("long").alias("fr")
    )
    # fr is bounded by the query-set size (<= _EV_NQ rows): broadcast
    # the outer join's build side — Catalyst's stats can't see the
    # bound through the aggregate and picks SMJ otherwise
    per_q = queries.select("query_id", "tlabel").join(
        F.broadcast(fr), "query_id", "left"
    ).select("tlabel", F.coalesce(F.col("fr"), F.lit(0)).alias("fr0"))
    counts = per_q.groupBy("tlabel", "fr0").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    term = F.when(
        F.col("fr0") > 0,
        F.col("cnt").cast("double")
        * (F.lit(1.0) / F.col("fr0").cast("double")),
    ).otherwise(F.lit(0.0))
    folded = (
        counts.select("tlabel", "fr0", "cnt", term.alias("term"))
        .groupBy("tlabel")
        .agg(
            F.sum("cnt").alias("n"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("fr0", "term"))),
                    lambda st: st["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
    )
    return folded.select(
        F.col("tlabel").alias("label"),
        F.col("n").alias("n_queries"),
        (F.col("s") / F.col("n").cast("double")).alias("mrr"),
    )


@query(
    "llm_map_eval",
    oracle=f"""
    WITH {_ev_ranked_sql()},
    flagged AS (
      SELECT qid, tlabel, rk,
             CASE WHEN nlabel = tlabel THEN 1 ELSE 0 END AS rel
      FROM top
    ),
    cum AS (
      SELECT qid, tlabel, rk, rel,
             SUM(rel) OVER (PARTITION BY qid ORDER BY rk
                            ROWS UNBOUNDED PRECEDING) AS cr
      FROM flagged
    ),
    apq AS (
      SELECT qid, tlabel,
             list_reduce(list(CASE WHEN rel = 1 THEN
                                CAST(cr AS DOUBLE) / CAST(rk AS DOUBLE)
                              ELSE 0.0 END ORDER BY rk),
                         (p, q) -> p + q) AS ap_num
      FROM cum GROUP BY 1, 2
    ),
    counts AS (
      SELECT tlabel, ap_num, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM apq GROUP BY 1, 2
    ),
    folded AS (
      SELECT tlabel, CAST(SUM(cnt) AS BIGINT) AS n,
             list_reduce(list(CAST(cnt AS DOUBLE) * ap_num
                              ORDER BY ap_num), (p, q) -> p + q) AS s
      FROM counts GROUP BY 1
    ),
    rlab AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS r FROM c GROUP BY 1
    )
    SELECT folded.tlabel AS label, folded.n AS n_queries,
           CASE WHEN LEAST(rlab.r, {_EV_K}) > 0 THEN
             folded.s / CAST(LEAST(rlab.r, {_EV_K}) AS DOUBLE)
               / CAST(folded.n AS DOUBLE)
           ELSE 0.0 END AS map10
    FROM folded JOIN rlab ON folded.tlabel = rlab.label
    """,
)
def llm_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision at 10 per label over the embedding
    space (operators/similarity.py:cosine_topk): AP rewards putting
    ALL relevant neighbors early, not just the first (MRR) or the
    majority (kNN accuracy) — the standard ranking-quality eval
    triple is completed by this query. AP@10 = Σ_{{rel hits}} P@i /
    min(R, 10) with R the label's corpus frequency; precision terms
    are exact-count divides folded in pinned rank order per query (a
    10-row partitioned fold), and the per-label mean folds over the
    (label, ap_num) COUNT GRID in pinned ap_num order — ap_num takes
    values from the bounded Σ-of-(cr/rk)-terms domain, so the final
    fold never collects a corpus-sized query list per label (the r09
    form did, and measured sf1→3 exponent 1.25 in-session vs MRR's
    1.01; this is the MRR count-grid device applied to MAP)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.similarity import cosine_topk
    from aws_datalake_spark.queries.llm_similarity import _emb_double

    e = _emb_double(spark, sf_dir)
    queries = e.where(F.col("vec_id") < _EV_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("tlabel"),
        "embedding",
    )
    corpus = e.where(F.col("vec_id") >= _EV_NQ)
    topk = cosine_topk(
        corpus, queries.select("query_id", "embedding"), k=_EV_K
    )
    flagged = (
        topk.join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
        .join(queries.select("query_id", "tlabel"), "query_id")
        .select(
            "query_id",
            "tlabel",
            "rank",
            (F.col("nlabel") == F.col("tlabel")).cast("int").alias("rel"),
        )
    )
    wq = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = flagged.select(
        "query_id",
        "tlabel",
        "rank",
        "rel",
        F.sum("rel").over(wq).alias("cr"),
    )
    p_at = F.when(
        F.col("rel") == 1,
        F.col("cr").cast("double") / F.col("rank").cast("double"),
    ).otherwise(F.lit(0.0))
    apq = (
        cum.select("query_id", "tlabel", "rank", p_at.alias("p_at"))
        .groupBy("query_id", "tlabel")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "p_at"))),
                    lambda st: st["p_at"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("ap_num")
        )
    )
    counts = apq.groupBy("tlabel", "ap_num").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    folded = counts.groupBy("tlabel").agg(
        F.sum("cnt").alias("n"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ap_num",
                            (
                                F.col("cnt").cast("double")
                                * F.col("ap_num")
                            ).alias("term"),
                        )
                    )
                ),
                lambda st: st["term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    rlab = corpus.groupBy(F.col("label").alias("tlabel")).agg(
        F.count(F.lit(1)).alias("r")
    )
    denom = F.least(F.col("r"), F.lit(_EV_K))
    return folded.join(F.broadcast(rlab), "tlabel").select(
        F.col("tlabel").alias("label"),
        F.col("n").alias("n_queries"),
        F.when(
            denom > 0,
            F.col("s")
            / denom.cast("double")
            / F.col("n").cast("double"),
        ).otherwise(F.lit(0.0)).alias("map10"),
    )


# ---------------------------------------------------------------------------
# BFS hop layers from a pinned anchor
# ---------------------------------------------------------------------------

_BFS_EDGE_SQL = """
      SELECT a.item AS s, b.item AS d
      FROM (SELECT DISTINCT l_orderkey AS ctx, l_partkey AS item
            FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey AS ctx, l_partkey AS item
            FROM lineitem) b
        ON a.ctx = b.ctx AND a.item < b.item
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""

_BFS_HOPS = 4


@query(
    "q_graph_bfs_layers",
    oracle=f"""
    WITH RECURSIVE e AS ({_BFS_EDGE_SQL}),
    bi AS (SELECT s, d FROM e UNION SELECT d, s FROM e),
    src AS (SELECT MIN(s) AS v FROM bi),
    walk(node, hop) AS (
      SELECT v, 0 FROM src
      UNION
      SELECT bi.d, walk.hop + 1
      FROM walk JOIN bi ON bi.s = walk.node
      WHERE walk.hop < {_BFS_HOPS}
    ),
    dist AS (
      SELECT node, CAST(MIN(hop) AS INTEGER) AS hop
      FROM walk GROUP BY 1
    )
    SELECT hop, COUNT(*) AS n_nodes FROM dist GROUP BY 1
    """,
)
def q_graph_bfs_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop-distance layers from the minimum part node over the
    co-order graph (operators/graph.py:bfs_layers): how many parts
    are 1, 2, 3, 4 co-order hops from the anchor — the reachability/
    small-world probe beside PageRank's centrality view. Frontier
    iteration with per-hop anti-joins computes min-hop exactly and
    distributes on the node key (the oracle's recursive CTE would
    enumerate paths — fine for the twin, quadratic at scale; the
    frontier form is the production shape). Lineage cut per hop."""
    from aws_datalake_spark.operators.graph import (
        bfs_layers,
        cooccurrence_edges,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return bfs_layers(edges, max_hops=_BFS_HOPS)


# ---------------------------------------------------------------------------
# Mann–Whitney U rank-sum test
# ---------------------------------------------------------------------------


@query(
    "q_mann_whitney_u",
    oracle="""
    WITH v AS (
      SELECT c_mktsegment AS g,
             CAST(ROUND(c_acctbal * 100.0) AS BIGINT) AS val
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    gv AS (
      SELECT g, val, CAST(COUNT(*) AS BIGINT) AS cgv
      FROM v GROUP BY 1, 2
    ),
    pv AS (SELECT val, SUM(cgv) AS cv FROM gv GROUP BY 1),
    ranked AS (
      SELECT val, cv,
             2 * COALESCE(SUM(cv) OVER (ORDER BY val
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) + cv + 1 AS dr
      FROM pv
    ),
    per_g AS (
      SELECT gv.g, SUM(gv.cgv) AS n,
             SUM(CAST(gv.cgv AS HUGEINT) * ranked.dr) AS d
      FROM gv JOIN ranked USING (val) GROUP BY 1
    ),
    piv AS (
      SELECT SUM(CASE WHEN g = 'AUTOMOBILE' THEN n END) AS na,
             SUM(CASE WHEN g = 'AUTOMOBILE' THEN d END) AS da,
             SUM(CASE WHEN g = 'BUILDING' THEN n END) AS nb
      FROM per_g
    ),
    ties AS (
      SELECT SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS t FROM pv
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(da - CAST(na AS HUGEINT) * (na + 1) AS BIGINT) AS u2,
           CAST(t AS BIGINT) AS ties_t,
           CASE WHEN na > 0 AND nb > 0 AND
                     (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                     * ((CAST(na + nb AS DOUBLE) + 1.0)
                        - CAST(t AS DOUBLE)
                          / (CAST(na + nb AS DOUBLE)
                             * (CAST(na + nb AS DOUBLE) - 1.0))) > 0.0
           THEN
             (CAST(da - CAST(na AS HUGEINT) * (na + 1) AS DOUBLE)
              - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
             / (2.0 * SQRT(
                 (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                 * ((CAST(na + nb AS DOUBLE) + 1.0)
                    - CAST(t AS DOUBLE)
                      / (CAST(na + nb AS DOUBLE)
                         * (CAST(na + nb AS DOUBLE) - 1.0)))))
           END AS z
    FROM piv, ties
    """,
)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between AUTOMOBILE and BUILDING balances
    (operators/stats.py:mann_whitney_u): the nonparametric
    two-sample location test with the doubled-rank exact-integer U
    certificate (2U = 2R − n(n+1)) and the tie-corrected normal z —
    completing the two-sample family beside Welch (means), KS
    (distributions) and Kruskal–Wallis (k groups)."""
    from aws_datalake_spark.operators.stats import mann_whitney_u

    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100.0, 0).cast("long").alias("cents"),
    )
    return mann_whitney_u(
        c, "c_mktsegment", F.col("cents"), "AUTOMOBILE", "BUILDING"
    )


# ---------------------------------------------------------------------------
# Wilson score interval for conversion rates
# ---------------------------------------------------------------------------


@query(
    "q_wilson_ci",
    oracle="""
    WITH conv AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderpriority = '1-URGENT')
                  THEN 1 ELSE 0 END AS s
      FROM customer c
    ),
    agg AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s) AS BIGINT) AS x
      FROM conv GROUP BY 1
    ),
    e AS (
      SELECT segment, n, x,
             CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(n AS DOUBLE) AS nd
      FROM agg WHERE n > 0
    ),
    w AS (
      SELECT *,
             1.0 + (1.96 * 1.96) / nd AS denom,
             p + (1.96 * 1.96) / (2.0 * nd) AS center,
             1.96 * SQRT(p * (1.0 - p) / nd
                         + (1.96 * 1.96) / (4.0 * (nd * nd))) AS half
      FROM e
    )
    SELECT segment, n, x AS conversions, p,
           (center - half) / denom AS wilson_lo,
           (center + half) / denom AS wilson_hi
    FROM w
    """,
)
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score interval for the urgent-order conversion
    rate per segment: the interval that stays inside [0,1] and
    behaves at small n where the naive Wald interval collapses —
    the uncertainty companion to q_ab_test_proportions' point test.
    Exact integer (n, x) per segment; the interval is a fixed
    mirrored IEEE tree (the 1.96 literal parses to the same double
    in both engines)."""
    c = t(spark, sf_dir, "customer")
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("__u", F.lit(1))
    )
    conv = c.join(urgent, "c_custkey", "left").select(
        F.col("c_mktsegment").alias("segment"),
        F.coalesce(F.col("__u"), F.lit(0)).alias("s"),
    )
    agg = conv.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"), F.sum("s").cast("long").alias("x")
    ).where(F.col("n") > 0)
    nd = F.col("n").cast("double")
    p = F.col("x").cast("double") / nd
    z = F.lit(1.96)
    denom = F.lit(1.0) + (z * z) / nd
    center = p + (z * z) / (F.lit(2.0) * nd)
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / nd + (z * z) / (F.lit(4.0) * (nd * nd))
    )
    return agg.select(
        "segment",
        "n",
        F.col("x").alias("conversions"),
        p.alias("p"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    )


# ---------------------------------------------------------------------------
# odds ratio / relative risk (2×2 association)
# ---------------------------------------------------------------------------


@query(
    "q_odds_ratio",
    oracle="""
    WITH conv AS (
      SELECT c.c_mktsegment AS g,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderpriority = '1-URGENT')
                  THEN 1 ELSE 0 END AS s
      FROM customer c
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
    ),
    cells AS (
      SELECT SUM(CASE WHEN g = 'AUTOMOBILE' AND s = 1
                      THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN g = 'AUTOMOBILE' AND s = 0
                      THEN 1 ELSE 0 END) AS b,
             SUM(CASE WHEN g = 'BUILDING' AND s = 1
                      THEN 1 ELSE 0 END) AS c,
             SUM(CASE WHEN g = 'BUILDING' AND s = 0
                      THEN 1 ELSE 0 END) AS d
      FROM conv
    )
    SELECT CAST(a AS BIGINT) AS n_exp_pos, CAST(b AS BIGINT) AS n_exp_neg,
           CAST(c AS BIGINT) AS n_ctl_pos, CAST(d AS BIGINT) AS n_ctl_neg,
           CASE WHEN b > 0 AND c > 0 THEN
             CAST(CAST(a AS HUGEINT) * d AS DOUBLE)
             / CAST(CAST(b AS HUGEINT) * c AS DOUBLE) END AS odds_ratio,
           CASE WHEN a + b > 0 AND c + d > 0 AND c > 0 THEN
             (CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
             / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE))
           END AS relative_risk
    FROM cells
    """,
)
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk for urgent-order conversion,
    AUTOMOBILE (exposed) vs BUILDING (control): the 2×2 epidemiology
    readout beside the z-test's significance — OR = ad/bc is one
    correctly-rounded divide of exact DECIMAL cross products, RR a
    mirrored two-divide tree. Exact cells are the certificate."""
    c = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(["AUTOMOBILE", "BUILDING"])
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("__u", F.lit(1))
    )
    conv = c.join(urgent, "c_custkey", "left").select(
        F.col("c_mktsegment").alias("g"),
        F.coalesce(F.col("__u"), F.lit(0)).alias("s"),
    )
    cells = conv.agg(
        F.sum(((F.col("g") == "AUTOMOBILE") & (F.col("s") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("g") == "AUTOMOBILE") & (F.col("s") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("g") == "BUILDING") & (F.col("s") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("g") == "BUILDING") & (F.col("s") == 0)).cast("long")).alias("d"),
    )
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    orr = (dec("a") * dec("d")).cast("double") / (
        dec("b") * dec("c")
    ).cast("double")
    rr = (
        F.col("a").cast("double") / (F.col("a") + F.col("b")).cast("double")
    ) / (
        F.col("c").cast("double") / (F.col("c") + F.col("d")).cast("double")
    )
    return cells.select(
        F.col("a").alias("n_exp_pos"),
        F.col("b").alias("n_exp_neg"),
        F.col("c").alias("n_ctl_pos"),
        F.col("d").alias("n_ctl_neg"),
        F.when((F.col("b") > 0) & (F.col("c") > 0), orr).alias("odds_ratio"),
        F.when(
            (F.col("a") + F.col("b") > 0)
            & (F.col("c") + F.col("d") > 0)
            & (F.col("c") > 0),
            rr,
        ).alias("relative_risk"),
    )


# ---------------------------------------------------------------------------
# resource-allocation link prediction
# ---------------------------------------------------------------------------

_RA_K = 50
_RA_MAXDEG = 1000


@query(
    "q_graph_resource_allocation",
    oracle=f"""
    WITH e AS ({_BFS_EDGE_SQL}),
    bi AS (
      SELECT s AS node, d AS nbr FROM e
      UNION ALL SELECT d, s FROM e
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM bi GROUP BY 1
    ),
    mid AS (
      SELECT bi.node, bi.nbr, deg.deg
      FROM bi JOIN deg USING (node) WHERE deg.deg <= {_RA_MAXDEG}
    ),
    wed AS (
      SELECT a.nbr AS u, b.nbr AS v, a.node AS m,
             1.0 / CAST(a.deg AS DOUBLE) AS term
      FROM mid a JOIN mid b ON a.node = b.node AND a.nbr < b.nbr
    ),
    cand AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
             list_reduce(list(term ORDER BY m), (p, q) -> p + q) AS ra
      FROM wed GROUP BY 1, 2
    ),
    nonadj AS (
      SELECT cand.u, cand.v, cand.cn, cand.ra
      FROM cand LEFT JOIN e ON cand.u = e.s AND cand.v = e.d
      WHERE e.s IS NULL
    ),
    pruned AS (
      SELECT u, v, cn, ra FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY u
                                     ORDER BY ra DESC, v) AS pk
        FROM nonadj
      ) WHERE pk <= {_RA_K}
    ),
    ranked AS (
      SELECT u, v, cn, ra,
             ROW_NUMBER() OVER (ORDER BY ra DESC, u, v) AS rk
      FROM pruned
    )
    SELECT u, v, cn, ra FROM ranked WHERE rk <= {_RA_K}
    """,
)
def q_graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction over the part co-order
    graph (operators/graph.py:resource_allocation_candidates):
    common neighbors weighted by 1/degree — the index that raw
    common-neighbor counts (q_graph_common_neighbors) get wrong for
    hub-heavy graphs, since a promiscuous middle carries almost no
    signal. RA folds in pinned middle order so the float ranking is
    bit-identical cross-engine; per-u partial top-k bounds the
    global ranking window."""
    from aws_datalake_spark.operators.graph import (
        cooccurrence_edges,
        resource_allocation_candidates,
    )

    li = t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return resource_allocation_candidates(
        edges, k=_RA_K, max_degree=_RA_MAXDEG
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 by canonical number
# ---------------------------------------------------------------------------


def _q17_alias():
    from aws_datalake_spark.queries.registry import all_oracles
    from aws_datalake_spark.queries.relational_ext import (
        q_small_quantity_revenue,
    )

    @query(
        "q17_small_quantity_revenue",
        oracle=all_oracles()["q_small_quantity_revenue"],
    )
    def q17_small_quantity_revenue(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """TPC-H Q17 under its canonical number — the same
        correlated-scalar-subquery shape registered as
        q_small_quantity_revenue since round 1 (decorrelated
        aggregate self-join, broadcast part dim); aliased so all 22
        canonical TPC-H numbers resolve as qNN names."""
        return q_small_quantity_revenue(spark, sf_dir)


_q17_alias()


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank (paired before/after)
# ---------------------------------------------------------------------------


@query(
    "q_wilcoxon_signed_rank",
    oracle="""
    WITH pair AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) IN (1995, 1996)
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x1,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) IN (1997, 1998)
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x2
      FROM orders GROUP BY 1
    ),
    np AS (SELECT CAST(COUNT(*) AS BIGINT) AS npairs FROM pair),
    nz AS (
      SELECT CASE WHEN x2 - x1 > 0 THEN 1 ELSE -1 END AS sg,
             ABS(x2 - x1) AS ad
      FROM pair WHERE x2 - x1 <> 0
    ),
    gv AS (SELECT sg, ad, CAST(COUNT(*) AS BIGINT) AS cgv
           FROM nz GROUP BY 1, 2),
    pv AS (SELECT ad, SUM(cgv) AS cv FROM gv GROUP BY 1),
    ranked AS (
      SELECT ad, cv,
             2 * COALESCE(SUM(cv) OVER (ORDER BY ad
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) + cv + 1 AS dr
      FROM pv
    ),
    agg AS (
      SELECT SUM(gv.cgv) AS n,
             SUM(CASE WHEN gv.sg = 1
                      THEN CAST(gv.cgv AS HUGEINT) * ranked.dr
                      ELSE 0 END) AS w2
      FROM gv JOIN ranked USING (ad)
    ),
    ties AS (
      SELECT SUM(CAST(cv AS HUGEINT) * cv * cv - cv) AS t FROM pv
    )
    SELECT np.npairs AS n_pairs, CAST(n AS BIGINT) AS n_nonzero,
           CAST(w2 AS BIGINT) AS w2_plus, CAST(t AS BIGINT) AS ties_t,
           CASE WHEN n > 0 AND
                     CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                     * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                     - CAST(t AS DOUBLE) / 48.0 > 0.0 THEN
             (CAST(w2 AS DOUBLE)
              - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
             / (2.0 * SQRT(
                 CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                 * (2.0 * CAST(n AS DOUBLE) + 1.0) / 24.0
                 - CAST(t AS DOUBLE) / 48.0))
           END AS z
    FROM agg, ties, np
    """,
)
def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank on paired per-customer spend, 1995-96 vs
    1997-98 (operators/stats.py:wilcoxon_signed_rank): did the SAME
    customers spend more in the later window — the paired complement
    to q_mann_whitney_u. Doubled-rank exact-integer 2W⁺ certificate;
    tie-corrected normal z as a mirrored IEEE tree."""
    from aws_datalake_spark.operators.stats import wilcoxon_signed_rank

    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    pair = o.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.year("o_orderdate").isin([1995, 1996]), cents).otherwise(
                F.lit(0)
            )
        ).alias("x1"),
        F.sum(
            F.when(F.year("o_orderdate").isin([1997, 1998]), cents).otherwise(
                F.lit(0)
            )
        ).alias("x2"),
    )
    return wilcoxon_signed_rank(pair, F.col("x1"), F.col("x2"))


# ---------------------------------------------------------------------------
# Cochran's Q (k repeated binary measures)
# ---------------------------------------------------------------------------


@query(
    "q_cochran_q",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                      THEN 1 ELSE 0 END) AS s95,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                      THEN 1 ELSE 0 END) AS s96,
             MAX(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                      THEN 1 ELSE 0 END) AS s97
      FROM orders GROUP BY 1
    ),
    cells AS (
      SELECT o_custkey AS i, '1995' AS yr, s95 AS s FROM per
      UNION ALL
      SELECT o_custkey, '1996', s96 FROM per
      UNION ALL
      SELECT o_custkey, '1997', s97 FROM per
    ),
    per_i AS (SELECT i, SUM(s) AS r FROM cells GROUP BY 1),
    per_j AS (SELECT yr, SUM(s) AS c FROM cells GROUP BY 1),
    ri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ns,
             SUM(CAST(r AS HUGEINT)) AS sr,
             SUM(CAST(r AS HUGEINT) * r) AS sr2
      FROM per_i
    ),
    cj AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(c AS HUGEINT) * c) AS sc2
      FROM per_j
    )
    SELECT ns AS n_subjects, k,
           CASE WHEN CAST(k * sr - sr2 AS DOUBLE) > 0.0 THEN
             CAST((k - 1) * (k * sc2 - sr * sr) AS DOUBLE)
             / CAST(k * sr - sr2 AS DOUBLE)
           END AS q
    FROM ri, cj
    """,
)
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across three repeated binary measures — did each
    customer order in 1995 / 1996 / 1997 (operators/stats.py:
    cochran_q): the k-sample McNemar ("did participation RATE change
    across years on the same subjects"). Exact DECIMAL numerator and
    denominator; Q is one correctly-rounded divide."""
    from aws_datalake_spark.operators.stats import cochran_q

    o = t(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        *[
            F.max(
                (F.year("o_orderdate") == y).cast("long")
            ).alias(f"s{str(y)[2:]}")
            for y in (1995, 1996, 1997)
        ]
    )
    cells = per.selectExpr(
        "o_custkey",
        "stack(3, '1995', s95, '1996', s96, '1997', s97) AS (yr, s)",
    )
    return cochran_q(cells, "o_custkey", "yr", "s")


# ---------------------------------------------------------------------------
# Wasserstein-1 drift
# ---------------------------------------------------------------------------


@query(
    "q_wasserstein_drift",
    oracle="""
    WITH v AS (
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS g,
             CAST(l_quantity AS BIGINT) AS val
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) IN (1995, 1998)
    ),
    pv AS (
      SELECT val,
             CAST(SUM(CASE WHEN g = 1995 THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN g = 1998 THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM v GROUP BY 1
    ),
    cum AS (
      SELECT val,
             SUM(ca) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS fa,
             SUM(cb) OVER (ORDER BY val ROWS UNBOUNDED PRECEDING) AS fb,
             LEAD(val) OVER (ORDER BY val) - val AS dv
      FROM pv
    ),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(cb) AS BIGINT) AS nb
      FROM pv
    ),
    terms AS (
      SELECT ABS(CAST(fa AS HUGEINT) * nb - CAST(fb AS HUGEINT) * na)
               * dv AS term
      FROM cum, tot WHERE dv IS NOT NULL
    ),
    agg AS (
      SELECT COALESCE(SUM(term), 0::HUGEINT) AS num FROM terms
    )
    SELECT na AS n_a, nb AS n_b,
           CAST(num AS VARCHAR) AS w1_num,
           CAST(CAST(na AS HUGEINT) * nb AS VARCHAR) AS w1_den,
           CASE WHEN CAST(CAST(na AS HUGEINT) * nb AS DOUBLE) > 0.0 THEN
             CAST(num AS DOUBLE)
             / CAST(CAST(na AS HUGEINT) * nb AS DOUBLE)
           END AS w1
    FROM agg, tot
    """,
)
def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 distance between the 1995 and 1998 quantity
    distributions (operators/stats.py:wasserstein_1): the
    magnitude-aware drift measure — q_tvd_drift counts mismatched
    mass, W1 also weighs HOW FAR it moved (Σ|F₁−F₂|·Δv over the
    sorted value domain). Exact DECIMAL numerator/denominator
    certificate strings; w1 is one correctly-rounded divide."""
    from aws_datalake_spark.operators.stats import wasserstein_1

    li = t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin([1995, 1998])
    ).select(
        F.year("l_shipdate").cast("long").alias("g"),
        F.col("l_quantity").cast("long").alias("val"),
    )
    return wasserstein_1(li, "g", F.col("val"), 1995, 1998)


# ---------------------------------------------------------------------------
# Holt linear (double-exponential) smoothing
# ---------------------------------------------------------------------------


@query(
    "q_holt_linear",
    oracle="""
    WITH ser AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS y
      FROM orders GROUP BY 1
    ),
    lst AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list(list_value(CAST(y AS DOUBLE), CAST(0.0 AS DOUBLE))
                  ORDER BY m) AS els
      FROM ser
    ),
    fold AS (
      SELECT n,
             list_reduce(els, (acc, x) -> list_value(
               0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
               0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                 + 0.5 * acc[2])) AS st
      FROM lst
    )
    SELECT n, st[1] AS level, st[2] AS trend,
           st[1] + 3.0 * st[2] AS forecast_3
    FROM fold
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) smoothing of monthly revenue
    with α=β=0.5: level + trend state folded over the pinned month
    order, final state and the 3-months-ahead forecast — the
    trend-aware sibling of q_ewma_smoothing. The 2-vector state
    rides the ordered-list reduce as a DOUBLE[] accumulator (both
    engines fold left with the FIRST element [y₁, 0] as init), so
    the recursion — inherently order-dependent — is bit-identical
    cross-engine. The corpus collapses to the month series in one
    aggregate."""
    ser = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("y")
        )
    )
    lst = ser.agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("m"),
                        F.array(
                            F.col("y").cast("double"), F.lit(0.0)
                        ).alias("el"),
                    )
                )
            ),
            lambda st: st["el"],
        ).alias("els"),
    )

    def _merge(acc, x):
        lvl = F.lit(0.5) * F.element_at(x, 1) + F.lit(0.5) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = F.lit(0.5) * (
            (
                F.lit(0.5) * F.element_at(x, 1)
                + F.lit(0.5)
                * (F.element_at(acc, 1) + F.element_at(acc, 2))
            )
            - F.element_at(acc, 1)
        ) + F.lit(0.5) * F.element_at(acc, 2)
        return F.array(lvl, tr)

    # try_element_at + clamped slice length: an EMPTY series must
    # yield a NULL state row, not an ANSI out-of-bounds error
    fold = lst.select(
        "n",
        F.aggregate(
            F.slice(
                F.col("els"),
                2,
                F.greatest(F.size(F.col("els")) - 1, F.lit(0)),
            ),
            F.try_element_at(F.col("els"), F.lit(1)),
            _merge,
        ).alias("st"),
    )
    return fold.select(
        "n",
        F.element_at(F.col("st"), 1).alias("level"),
        F.element_at(F.col("st"), 2).alias("trend"),
        (
            F.element_at(F.col("st"), 1)
            + F.lit(3.0) * F.element_at(F.col("st"), 2)
        ).alias("forecast_3"),
    )


# ---------------------------------------------------------------------------
# classical seasonal decomposition (additive, monthly)
# ---------------------------------------------------------------------------


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH ser AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT m, y,
             LAG(y, 6) OVER (ORDER BY m)
               + 2 * SUM(y) OVER (ORDER BY m ROWS BETWEEN 5 PRECEDING
                                  AND 5 FOLLOWING)
               + LEAD(y, 6) OVER (ORDER BY m) AS cma24
      FROM ser
    ),
    det AS (
      SELECT m, y, cma24, m % 12 AS moy,
             24 * y - cma24 AS detr24
      FROM tr
    ),
    szn AS (
      SELECT moy, CAST(COUNT(detr24) AS BIGINT) AS cnt,
             SUM(detr24) AS sd
      FROM det WHERE detr24 IS NOT NULL GROUP BY 1
    )
    SELECT det.m AS month_index, det.y AS revenue_cents,
           CAST(det.cma24 AS DOUBLE) / 24.0 AS trend,
           (CAST(szn.sd AS DOUBLE) / CAST(szn.cnt AS DOUBLE)) / 24.0
             AS seasonal,
           CASE WHEN det.cma24 IS NOT NULL THEN
             CAST(det.y AS DOUBLE)
             - CAST(det.cma24 AS DOUBLE) / 24.0
             - (CAST(szn.sd AS DOUBLE) / CAST(szn.cnt AS DOUBLE)) / 24.0
           END AS remainder
    FROM det JOIN szn ON det.moy = szn.moy
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of monthly revenue:
    trend = centered 12-month moving average (half-weight endpoints,
    kept EXACT by working at ×24: cma24 = y₋₆ + 2Σ±5 + y₊₆ is an
    integer window), seasonal = per-calendar-month mean of the ×24
    detrended series (month-mean variant, not recentered), remainder
    = the rest. Every window is an INTEGER window (order-free);
    the only floats are three mirrored divides per row. The corpus
    collapses to the ~84-month series in one aggregate; edge months
    (first/last 6) carry NULL trend/remainder by construction."""
    from pyspark.sql import Window

    ser = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("y")
        )
    )
    wo = Window.orderBy("m")
    tr = ser.select(
        "m",
        "y",
        (
            F.lag("y", 6).over(wo)
            + 2 * F.sum("y").over(wo.rowsBetween(-5, 5))
            + F.lead("y", 6).over(wo)
        ).alias("cma24"),
    )
    det = tr.select(
        "m",
        "y",
        "cma24",
        (F.col("m") % 12).alias("moy"),
        (24 * F.col("y") - F.col("cma24")).alias("detr24"),
    )
    szn = (
        det.where(F.col("detr24").isNotNull())
        .groupBy("moy")
        .agg(
            F.count("detr24").alias("cnt"),
            F.sum("detr24").alias("sd"),
        )
    )
    seasonal = (
        F.col("sd").cast("double") / F.col("cnt").cast("double")
    ) / F.lit(24.0)
    trend = F.col("cma24").cast("double") / F.lit(24.0)
    return det.join(F.broadcast(szn), "moy").select(
        F.col("m").alias("month_index"),
        F.col("y").alias("revenue_cents"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(
            F.col("cma24").isNotNull(),
            F.col("y").cast("double") - trend - seasonal,
        ).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# Friedman test (k related samples, complete blocks)
# ---------------------------------------------------------------------------


@query(
    "q_friedman_test",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x1,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x2,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS x3
      FROM orders GROUP BY 1
    ),
    dr AS (
      SELECT
        2 * (CASE WHEN x2 < x1 THEN 1 ELSE 0 END
             + CASE WHEN x3 < x1 THEN 1 ELSE 0 END)
          + (CASE WHEN x2 = x1 THEN 1 ELSE 0 END
             + CASE WHEN x3 = x1 THEN 1 ELSE 0 END) + 2 AS d1,
        2 * (CASE WHEN x1 < x2 THEN 1 ELSE 0 END
             + CASE WHEN x3 < x2 THEN 1 ELSE 0 END)
          + (CASE WHEN x1 = x2 THEN 1 ELSE 0 END
             + CASE WHEN x3 = x2 THEN 1 ELSE 0 END) + 2 AS d2,
        2 * (CASE WHEN x1 < x3 THEN 1 ELSE 0 END
             + CASE WHEN x2 < x3 THEN 1 ELSE 0 END)
          + (CASE WHEN x1 = x3 THEN 1 ELSE 0 END
             + CASE WHEN x2 = x3 THEN 1 ELSE 0 END) + 2 AS d3
      FROM per
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(d1 AS HUGEINT)) AS r1,
             SUM(CAST(d2 AS HUGEINT)) AS r2,
             SUM(CAST(d3 AS HUGEINT)) AS r3
      FROM dr
    )
    SELECT n, 3 AS k,
           CASE WHEN n > 0 THEN
             3.0 * (CAST(r1 * r1 AS DOUBLE) + CAST(r2 * r2 AS DOUBLE)
                    + CAST(r3 * r3 AS DOUBLE))
             / (CAST(n AS DOUBLE) * 3.0 * 4.0)
             - 3.0 * CAST(n AS DOUBLE) * 4.0
           END AS chi2
    FROM agg
    """,
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test across three repeated yearly spend measures on
    the same customers (complete blocks; missing years spend 0):
    "did the ranking of years differ consistently across customers"
    — the k-sample sibling of q_wilcoxon_signed_rank, rank-based
    where q_cochran_q is binary. Within-block tie-averaged ranks are
    computed ARITHMETICALLY for k=3 (doubled: 2·less + ties + 2 —
    no window at all), the per-year doubled rank sums are exact
    DECIMAL integers, and χ²_F = 12·ΣR_j²/(nk(k+1)) − 3n(k+1)
    (= 3·ΣR2_j²/(n·k·(k+1)) − 3n(k+1) in doubled form) is a
    mirrored IEEE tree. One scan, one aggregate."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per = o.groupBy("o_custkey").agg(
        *[
            F.sum(
                F.when(F.year("o_orderdate") == y, cents).otherwise(F.lit(0))
            ).alias(f"x{i + 1}")
            for i, y in enumerate((1995, 1996, 1997))
        ]
    )

    def _dr(j: int):
        others = [i for i in (1, 2, 3) if i != j]
        less = sum(
            (F.col(f"x{i}") < F.col(f"x{j}")).cast("long") for i in others
        )
        tie = sum(
            (F.col(f"x{i}") == F.col(f"x{j}")).cast("long") for i in others
        )
        return (2 * less + tie + 2).alias(f"d{j}")

    dr = per.select(_dr(1), _dr(2), _dr(3))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = dr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("d1"))).alias("r1"),
        F.sum(dec(F.col("d2"))).alias("r2"),
        F.sum(dec(F.col("d3"))).alias("r3"),
    )
    n_d = F.col("n").cast("double")
    chi2 = (
        F.lit(3.0)
        * (
            (F.col("r1") * F.col("r1")).cast("double")
            + (F.col("r2") * F.col("r2")).cast("double")
            + (F.col("r3") * F.col("r3")).cast("double")
        )
        / (n_d * F.lit(3.0) * F.lit(4.0))
        - F.lit(3.0) * n_d * F.lit(4.0)
    )
    return agg.select(
        F.col("n"),
        F.lit(3).cast("int").alias("k"),
        F.when(F.col("n") > 0, chi2).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# partial correlation
# ---------------------------------------------------------------------------


@query(
    "q_partial_correlation",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS z
      FROM lineitem
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(z AS HUGEINT)) AS sz,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy,
             SUM(CAST(z AS HUGEINT) * z) AS szz,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * z) AS sxz,
             SUM(CAST(y AS HUGEINT) * z) AS syz
      FROM v
    ),
    r AS (
      SELECT n,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
               / (SQRT(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(CAST(n AS HUGEINT) * syy - sy * sy
                              AS DOUBLE))) AS rxy,
             CAST(CAST(n AS HUGEINT) * sxz - sx * sz AS DOUBLE)
               / (SQRT(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(CAST(n AS HUGEINT) * szz - sz * sz
                              AS DOUBLE))) AS rxz,
             CAST(CAST(n AS HUGEINT) * syz - sy * sz AS DOUBLE)
               / (SQRT(CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
                  * SQRT(CAST(CAST(n AS HUGEINT) * szz - sz * sz
                              AS DOUBLE))) AS ryz
      FROM m
    )
    SELECT n, rxy AS r_xy, rxz AS r_xz, ryz AS r_yz,
           CASE WHEN (1.0 - rxz * rxz) > 0.0 AND (1.0 - ryz * ryz) > 0.0
                THEN (rxy - rxz * ryz)
                     / (SQRT(1.0 - rxz * rxz) * SQRT(1.0 - ryz * ryz))
           END AS partial_xy_z
    FROM r
    """,
)
def q_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and line revenue CONTROLLING
    for discount: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²))
    — "is the qty↔revenue association real or discount-mediated",
    the three-variable step beyond q_correlation_matrix. All nine
    moment sums are exact DECIMAL integers from ONE aggregate; the
    three Pearsons and the partial are a fixed mirrored IEEE tree."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("z"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("z"))).alias("sz"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
        F.sum(dec(F.col("z")) * dec(F.col("z"))).alias("szz"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x")) * dec(F.col("z"))).alias("sxz"),
        F.sum(dec(F.col("y")) * dec(F.col("z"))).alias("syz"),
    )
    n = dec(F.col("n"))

    def _r(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)).cast("double") / (
            F.sqrt(
                (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
            )
            * F.sqrt(
                (n * F.col(sbb) - F.col(sb) * F.col(sb)).cast("double")
            )
        )

    rxy = _r("sxy", "sx", "sy", "sxx", "syy")
    rxz = _r("sxz", "sx", "sz", "sxx", "szz")
    ryz = _r("syz", "sy", "sz", "syy", "szz")
    r = m.select(
        "n", rxy.alias("rxy"), rxz.alias("rxz"), ryz.alias("ryz")
    )
    ok = (
        (F.lit(1.0) - F.col("rxz") * F.col("rxz")) > 0.0
    ) & ((F.lit(1.0) - F.col("ryz") * F.col("ryz")) > 0.0)
    partial = (F.col("rxy") - F.col("rxz") * F.col("ryz")) / (
        F.sqrt(F.lit(1.0) - F.col("rxz") * F.col("rxz"))
        * F.sqrt(F.lit(1.0) - F.col("ryz") * F.col("ryz"))
    )
    return r.select(
        "n",
        F.col("rxy").alias("r_xy"),
        F.col("rxz").alias("r_xz"),
        F.col("ryz").alias("r_yz"),
        F.when(ok, partial).alias("partial_xy_z"),
    )


# ---------------------------------------------------------------------------
# weekly churn (growth accounting, the loss side)
# ---------------------------------------------------------------------------


@query(
    "q_churn_rate",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7
                  AS BIGINT) AS w
      FROM events
    ),
    prev AS (SELECT user_id, w + 1 AS w FROM uw),
    act AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS active_prev
            FROM prev GROUP BY 1),
    ret AS (
      SELECT prev.w, CAST(COUNT(*) AS BIGINT) AS retained
      FROM prev JOIN uw ON prev.user_id = uw.user_id AND prev.w = uw.w
      GROUP BY 1
    ),
    wk AS (SELECT DISTINCT w FROM uw)
    SELECT act.w AS week_index, act.active_prev,
           COALESCE(ret.retained, 0) AS retained,
           act.active_prev - COALESCE(ret.retained, 0) AS churned,
           CAST(act.active_prev - COALESCE(ret.retained, 0) AS DOUBLE)
             / CAST(act.active_prev AS DOUBLE) AS churn_rate
    FROM act JOIN wk ON act.w = wk.w
    LEFT JOIN ret ON act.w = ret.w
    """,
)
def q_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn from the events stream: of last week's active
    users, how many did NOT return this week — the loss side of
    st_new_vs_returning's growth accounting (weekly buckets: the
    fixture's event stream spans ~one month). The ghost week after
    the lake's end is excluded by joining back to observed weeks.
    Exact distinct-user counts; one divide."""
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.unix_date(F.col("ts").cast("date")) / F.lit(7)
        ).cast("long").alias("w"),
    ).distinct()
    prev = ev.select("user_id", (F.col("w") + 1).alias("w"))
    act = prev.groupBy("w").agg(F.count(F.lit(1)).alias("active_prev"))
    ret = prev.join(ev, ["user_id", "w"]).groupBy("w").agg(
        F.count(F.lit(1)).alias("retained")
    )
    wk = ev.select("w").distinct()
    out = (
        act.join(wk, "w")
        .join(ret, "w", "left")
        .select(
            F.col("w").alias("week_index"),
            "active_prev",
            F.coalesce(F.col("retained"), F.lit(0)).alias("retained"),
            (
                F.col("active_prev") - F.coalesce(F.col("retained"), F.lit(0))
            ).alias("churned"),
            (
                (
                    F.col("active_prev")
                    - F.coalesce(F.col("retained"), F.lit(0))
                ).cast("double")
                / F.col("active_prev").cast("double")
            ).alias("churn_rate"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------


@query(
    "q_dau_mau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
             CAST((CAST(ts AS DATE) - DATE '1970-01-01') // 7
                  AS BIGINT) AS m
      FROM events
    ),
    daily AS (
      SELECT m, d, CAST(COUNT(*) AS BIGINT) AS dau
      FROM du GROUP BY 1, 2
    ),
    per_m AS (
      SELECT m, CAST(SUM(dau) AS BIGINT) AS dau_sum,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily GROUP BY 1
    ),
    mau AS (
      SELECT m, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      FROM du GROUP BY 1
    )
    SELECT per_m.m AS week_index, per_m.n_days, per_m.dau_sum,
           mau.mau,
           CAST(per_m.dau_sum AS DOUBLE) / CAST(per_m.n_days AS DOUBLE)
             / CAST(mau.mau AS DOUBLE) AS stickiness
    FROM per_m JOIN mau ON per_m.m = mau.m
    """,
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per week: average daily active users over
    weekly active users — "of the people who show up at all, how
    many show up daily" (1.0 = everyone, every day; weekly buckets
    because the fixture's event stream spans ~one month). Exact
    distinct counts; two mirrored divides. One (user, day) distinct
    collapses the corpus; everything after is day/week-domain
    sized."""
    du = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.floor(
            F.unix_date(F.col("ts").cast("date")) / F.lit(7)
        ).cast("long").alias("m"),
    ).distinct()
    daily = du.groupBy("m", "d").agg(F.count(F.lit(1)).alias("dau"))
    per_m = daily.groupBy("m").agg(
        F.sum("dau").alias("dau_sum"), F.count(F.lit(1)).alias("n_days")
    )
    mau = du.groupBy("m").agg(
        F.countDistinct("user_id").alias("mau")
    )
    return per_m.join(mau, "m").select(
        F.col("m").alias("week_index"),
        "n_days",
        "dau_sum",
        "mau",
        (
            F.col("dau_sum").cast("double")
            / F.col("n_days").cast("double")
            / F.col("mau").cast("double")
        ).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# rank-function surface: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------


@query(
    "q_window_ntile_cume",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment AS segment, c_custkey,
             NTILE(4) OVER w AS quartile,
             PERCENT_RANK() OVER w AS pct_rank,
             CUME_DIST() OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                            c_custkey)
    )
    SELECT segment, CAST(quartile AS INTEGER) AS quartile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(pct_rank) AS min_pct_rank, MAX(cume) AS max_cume
    FROM ranked GROUP BY 1, 2
    """,
)
def q_window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-function surface in one query: NTILE(4)
    bucket sizes per segment with PERCENT_RANK / CUME_DIST extrema —
    quartile assignment plus the two normalized-rank functions the
    q_window_rank_stats family doesn't cover. The total window order
    is pinned by (balance cents, custkey) so bucket boundaries are
    deterministic; percent_rank = (rank−1)/(n−1) and cume_dist =
    rank/n are exact-count divides in both engines."""
    from pyspark.sql import Window

    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round(F.col("c_acctbal") * 100, 0).cast("long"), F.col("c_custkey")
    )
    ranked = c.select(
        F.col("c_mktsegment").alias("segment"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
    return ranked.groupBy("segment", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pct_rank").alias("min_pct_rank"),
        F.max("cume").alias("max_cume"),
    )


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (survival family completion)
# ---------------------------------------------------------------------------


@query(
    "q_nelson_aalen",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    marked AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    sess AS (
      SELECT user_id, us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    subj AS (
      SELECT (MAX(us) - MIN(us)) // 60000000 AS dur,
             CASE WHEN MAX(us) <= epoch_us(MIN(g.gmax)) - 3600000000
                  THEN 1 ELSE 0 END AS obs
      FROM sess, g GROUP BY user_id, sid
    ),
    dom AS (
      SELECT dur AS t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(obs) AS BIGINT) AS d
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d,
             SUM(m) OVER () - COALESCE(SUM(m) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_risk
      FROM dom
    ),
    cum AS (
      SELECT t, d, n_risk,
             list(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS hs,
             list(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
                                       * CAST(n_risk AS DOUBLE)))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS vs
      FROM risk
    )
    SELECT t, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
           list_reduce(hs, (p, q) -> p + q) AS cum_hazard,
           list_reduce(vs, (p, q) -> p + q) AS var_hazard
    FROM cum WHERE d > 0
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard of session durations
    (operators/stats.py:nelson_aalen) — the hazard-scale companion
    to q_kaplan_meier on the SAME sessionization (30-min gaps,
    1-hour right-censoring, event_id-pinned ties): H(t) = Σ d/n with
    variance Σ d/n², both folding in pinned ascending-t order via
    the cumulative-collect_list reduce (the KM device)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.stats import nelson_aalen
    from aws_datalake_spark.queries.r08_batch import (
        _KM_CENSOR_US,
        _KM_GAP_US,
    )

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("__us"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("__us", "event_id")
    marked = ev.select(
        "user_id",
        "__us",
        "event_id",
        (
            (F.col("__us") - F.lag("__us", 1).over(wo))
            > F.lit(_KM_GAP_US)
        )
        .cast("int")
        .alias("__brk"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("__us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id",
        "__us",
        F.coalesce(F.sum("__brk").over(wc), F.lit(0)).alias("__sid"),
    )
    gmax = t(spark, sf_dir, "events").agg(
        F.unix_micros(F.max("ts")).alias("__gus")
    )
    subj = (
        sess.groupBy("user_id", "__sid")
        .agg(F.min("__us").alias("__f"), F.max("__us").alias("__l"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr("(__l - __f) div 60000000").alias("dur"),
            (F.col("__l") <= F.col("__gus") - F.lit(_KM_CENSOR_US))
            .cast("int")
            .alias("obs"),
        )
    )
    return nelson_aalen(subj, "dur", "obs")


# ---------------------------------------------------------------------------
# two-group log-rank test
# ---------------------------------------------------------------------------


@query(
    "q_logrank",
    oracle="""
    WITH lake AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS mxd
                  FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS g,
             CAST(CAST(MAX(o.o_orderdate) AS DATE)
                  - CAST(MIN(o.o_orderdate) AS DATE) AS BIGINT) AS dur,
             CASE WHEN CAST(MAX(o.o_orderdate) AS DATE)
                       <= (SELECT mxd FROM lake) - 90
                  THEN 1 ELSE 0 END AS obs
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    dom AS (
      SELECT dur AS t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(obs) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ma,
             CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN obs ELSE 0 END)
                  AS BIGINT) AS da
      FROM subj GROUP BY 1
    ),
    cum AS (
      SELECT t, d, da,
             SUM(m) OVER () - COALESCE(SUM(m) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n,
             SUM(ma) OVER () - COALESCE(SUM(ma) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS na
      FROM dom
    ),
    terms AS (
      SELECT t, d, da, n, na,
             CAST(d AS DOUBLE) * CAST(na AS DOUBLE) / CAST(n AS DOUBLE)
               AS e_term,
             CASE WHEN n > 1 THEN
               CAST(d AS DOUBLE) * (CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
               * (1.0 - CAST(na AS DOUBLE) / CAST(n AS DOUBLE))
               * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                  / (CAST(n AS DOUBLE) - 1.0))
             ELSE 0.0 END AS v_term
      FROM cum WHERE d > 0
    ),
    agg AS (
      SELECT CAST(SUM(da) AS BIGINT) AS oa,
             list_reduce(list(e_term ORDER BY t), (p, q) -> p + q) AS ea,
             list_reduce(list(v_term ORDER BY t), (p, q) -> p + q) AS v
      FROM terms
    ),
    tot AS (
      SELECT CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tna,
             CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tnb
      FROM subj
    )
    SELECT tna AS n_a, tnb AS n_b, oa AS observed_a, ea AS expected_a,
           CASE WHEN v > 0.0 THEN
             (CAST(oa AS DOUBLE) - ea) / SQRT(v) END AS z,
           CASE WHEN v > 0.0 THEN
             ((CAST(oa AS DOUBLE) - ea) / SQRT(v))
             * ((CAST(oa AS DOUBLE) - ea) / SQRT(v)) END AS chi2
    FROM agg, tot
    """,
)
def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test on customer order-span lifetimes,
    AUTOMOBILE vs BUILDING (operators/stats.py:logrank_test):
    lifetime = days from first to last order, right-censored when
    the last order falls within 90 days of the lake's end — "do the
    two segments retain differently", the hypothesis test behind a
    KM plot comparison. O_A is an exact integer certificate; E and V
    fold in pinned event-time order."""
    from aws_datalake_spark.operators.stats import logrank_test

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    lake = o.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("mxd")
    )
    subj = (
        o.join(
            F.broadcast(
                c.select("c_custkey", "c_mktsegment").where(
                    F.col("c_mktsegment").isin(["AUTOMOBILE", "BUILDING"])
                )
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__mx"),
            F.min(F.col("o_orderdate").cast("date")).alias("__mn"),
        )
        .crossJoin(F.broadcast(lake))
        .select(
            F.col("c_mktsegment").alias("g"),
            F.datediff(F.col("__mx"), F.col("__mn"))
            .cast("long")
            .alias("dur"),
            (F.col("__mx") <= F.date_sub(F.col("mxd"), 90))
            .cast("int")
            .alias("obs"),
        )
    )
    return logrank_test(subj, "g", "dur", "obs", "AUTOMOBILE", "BUILDING")


# ---------------------------------------------------------------------------
# Holt walk-forward backtest (forecast accuracy)
# ---------------------------------------------------------------------------

_BT_H = 6


@query(
    "q_forecast_backtest",
    oracle=f"""
    WITH ser AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    cutoff AS (SELECT MAX(m) - {_BT_H} AS c FROM ser),
    lst AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             list(list_value(CAST(y AS DOUBLE), CAST(0.0 AS DOUBLE))
                  ORDER BY m) AS els
      FROM ser, cutoff WHERE m <= cutoff.c
    ),
    fold AS (
      SELECT n,
             list_reduce(els, (acc, x) -> list_value(
               0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
               0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                 + 0.5 * acc[2])) AS st
      FROM lst
    )
    SELECT CAST(ser.m - cutoff.c AS BIGINT) AS h,
           ser.y AS actual_cents,
           fold.st[1] + CAST(ser.m - cutoff.c AS DOUBLE) * fold.st[2]
             AS forecast,
           ABS(CAST(ser.y AS DOUBLE)
               - (fold.st[1] + CAST(ser.m - cutoff.c AS DOUBLE)
                  * fold.st[2])) AS abs_err,
           ABS(CAST(ser.y AS DOUBLE)
               - (fold.st[1] + CAST(ser.m - cutoff.c AS DOUBLE)
                  * fold.st[2])) / CAST(ser.y AS DOUBLE) AS ape
    FROM ser, cutoff, fold WHERE ser.m > cutoff.c
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward forecast backtest: fit Holt(0.5, 0.5) on all but
    the last {h} months, forecast each held-out horizon, report
    actual vs forecast with absolute and percentage errors — the
    eval loop that turns q_holt_linear from a smoother into a
    forecasting claim. The fold state is the bit-identical Holt
    device; errors are mirrored per-row trees over the exact
    held-out integers. One aggregate collapses the corpus."""
    ser = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("m")
        )
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("y")
        )
    )
    cutoff = ser.agg((F.max("m") - F.lit(_BT_H)).alias("c"))
    train = ser.crossJoin(F.broadcast(cutoff)).where(
        F.col("m") <= F.col("c")
    )
    lst = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("m"),
                        F.array(
                            F.col("y").cast("double"), F.lit(0.0)
                        ).alias("el"),
                    )
                )
            ),
            lambda st: st["el"],
        ).alias("els"),
    )

    def _merge(acc, x):
        lvl = F.lit(0.5) * F.element_at(x, 1) + F.lit(0.5) * (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        )
        tr = F.lit(0.5) * (
            (
                F.lit(0.5) * F.element_at(x, 1)
                + F.lit(0.5)
                * (F.element_at(acc, 1) + F.element_at(acc, 2))
            )
            - F.element_at(acc, 1)
        ) + F.lit(0.5) * F.element_at(acc, 2)
        return F.array(lvl, tr)

    fold = lst.select(
        F.aggregate(
            F.slice(
                F.col("els"),
                2,
                F.greatest(F.size(F.col("els")) - 1, F.lit(0)),
            ),
            F.try_element_at(F.col("els"), F.lit(1)),
            _merge,
        ).alias("st"),
    )
    held = ser.crossJoin(F.broadcast(cutoff)).where(
        F.col("m") > F.col("c")
    )
    out = held.crossJoin(F.broadcast(fold))
    h = (F.col("m") - F.col("c")).cast("long")
    fc = F.element_at(F.col("st"), 1) + h.cast("double") * F.element_at(
        F.col("st"), 2
    )
    return out.select(
        h.alias("h"),
        F.col("y").alias("actual_cents"),
        fc.alias("forecast"),
        F.abs(F.col("y").cast("double") - fc).alias("abs_err"),
        (
            F.abs(F.col("y").cast("double") - fc)
            / F.col("y").cast("double")
        ).alias("ape"),
    )


# ---------------------------------------------------------------------------
# restricted mean survival time (area under the KM curve)
# ---------------------------------------------------------------------------

_RMST_TAU = 60


@query(
    "q_rmst",
    oracle=f"""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    marked AS (
      SELECT user_id, epoch_us(ts) AS us, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    sess AS (
      SELECT user_id, us,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ),
    subj AS (
      SELECT (MAX(us) - MIN(us)) // 60000000 AS dur,
             CASE WHEN MAX(us) <= epoch_us(MIN(g.gmax)) - 3600000000
                  THEN 1 ELSE 0 END AS obs
      FROM sess, g GROUP BY user_id, sid
    ),
    dom AS (
      SELECT dur AS t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(obs) AS BIGINT) AS d
      FROM subj GROUP BY 1
    ),
    risk AS (
      SELECT t, d,
             SUM(m) OVER () - COALESCE(SUM(m) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_risk
      FROM dom
    ),
    cum AS (
      SELECT t, d, n_risk,
             list(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS fs
      FROM risk
    ),
    km AS (
      SELECT t, list_reduce(fs, (p, q) -> p * q) AS survival
      FROM cum WHERE d > 0
    ),
    seg AS (
      SELECT t, survival,
             COALESCE(LAG(survival) OVER (ORDER BY t), 1.0) AS prev_s,
             COALESCE(LAG(t) OVER (ORDER BY t), 0) AS prev_t,
             LEAD(t) OVER (ORDER BY t) AS nxt
      FROM km
    ),
    terms AS (
      SELECT t,
             prev_s * CAST(LEAST(t, {_RMST_TAU})
                           - LEAST(prev_t, {_RMST_TAU}) AS DOUBLE)
             + CASE WHEN nxt IS NULL THEN
                 survival * CAST({_RMST_TAU} - LEAST(t, {_RMST_TAU})
                                 AS DOUBLE)
               ELSE 0.0 END AS term
      FROM seg
    )
    SELECT CAST({_RMST_TAU} AS BIGINT) AS tau,
           CAST(COUNT(*) AS BIGINT) AS n_event_times,
           CASE WHEN COUNT(*) = 0 THEN CAST({_RMST_TAU} AS DOUBLE)
                ELSE list_reduce(list(term ORDER BY t), (p, q) -> p + q)
           END AS rmst
    FROM terms
    """,
)
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time at τ=60 minutes over the KM
    session-survival curve: the area under the step curve — "the
    expected session minutes within the first hour", the one-number
    summary a survival CURVE doesn't give (and the estimand of
    choice when hazards aren't proportional). Segment areas are
    prev-survival × exact integer widths (τ-clamped), folded in
    pinned event-time order; survival values are the bit-identical
    KM folds, so the area matches cross-engine. With ZERO event
    times (every session censored, or an empty lake) the KM curve
    never steps, survival stays 1 on [0, τ], and RMST is exactly τ —
    guarded explicitly on both engines (ADVICE r09: the unguarded
    fold read 0.0 on Spark and NULL on DuckDB)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.stats import kaplan_meier
    from aws_datalake_spark.queries.r08_batch import (
        _KM_CENSOR_US,
        _KM_GAP_US,
    )

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("__us"),
        "event_id",
    )
    wo = Window.partitionBy("user_id").orderBy("__us", "event_id")
    marked = ev.select(
        "user_id",
        "__us",
        "event_id",
        (
            (F.col("__us") - F.lag("__us", 1).over(wo))
            > F.lit(_KM_GAP_US)
        )
        .cast("int")
        .alias("__brk"),
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("__us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = marked.select(
        "user_id",
        "__us",
        F.coalesce(F.sum("__brk").over(wc), F.lit(0)).alias("__sid"),
    )
    gmax = t(spark, sf_dir, "events").agg(
        F.unix_micros(F.max("ts")).alias("__gus")
    )
    subj = (
        sess.groupBy("user_id", "__sid")
        .agg(F.min("__us").alias("__f"), F.max("__us").alias("__l"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr("(__l - __f) div 60000000").alias("dur"),
            (F.col("__l") <= F.col("__gus") - F.lit(_KM_CENSOR_US))
            .cast("int")
            .alias("obs"),
        )
    )
    km = kaplan_meier(subj, "dur", "obs")
    w = Window.orderBy("t")
    seg = km.select(
        "t",
        "survival",
        F.lag("survival", 1, 1.0).over(w).alias("prev_s"),
        F.lag("t", 1, 0).over(w).alias("prev_t"),
        F.lead("t", 1).over(w).alias("nxt"),
    )
    tau = F.lit(_RMST_TAU)
    term = F.col("prev_s") * (
        F.least(F.col("t"), tau) - F.least(F.col("prev_t"), tau)
    ).cast("double") + F.when(
        F.col("nxt").isNull(),
        F.col("survival")
        * (tau - F.least(F.col("t"), tau)).cast("double"),
    ).otherwise(F.lit(0.0))
    terms = seg.select("t", term.alias("term"))
    return terms.agg(
        F.lit(_RMST_TAU).cast("long").alias("tau"),
        F.count(F.lit(1)).alias("n_event_times"),
        F.when(
            F.count(F.lit(1)) == 0, F.lit(float(_RMST_TAU))
        ).otherwise(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("t", "term"))),
                    lambda st: st["term"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("rmst"),
    )


# ---------------------------------------------------------------------------
# per-segment Kaplan–Meier curves (the plot behind q_logrank)
# ---------------------------------------------------------------------------


@query(
    "q_km_by_segment",
    oracle="""
    WITH lake AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS mxd
                  FROM orders),
    subj AS (
      SELECT c.c_mktsegment AS g,
             CAST(CAST(MAX(o.o_orderdate) AS DATE)
                  - CAST(MIN(o.o_orderdate) AS DATE) AS BIGINT) AS dur,
             CASE WHEN CAST(MAX(o.o_orderdate) AS DATE)
                       <= (SELECT mxd FROM lake) - 90
                  THEN 1 ELSE 0 END AS obs
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      GROUP BY c.c_custkey, c.c_mktsegment
    ),
    dom AS (
      SELECT g, dur AS t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(obs) AS BIGINT) AS d
      FROM subj GROUP BY 1, 2
    ),
    risk AS (
      SELECT g, t, d,
             SUM(m) OVER (PARTITION BY g)
               - COALESCE(SUM(m) OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM dom
    ),
    cum AS (
      SELECT g, t, d, n_risk,
             list(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (PARTITION BY g ORDER BY t
                     ROWS UNBOUNDED PRECEDING) AS fs
      FROM risk
    )
    SELECT g AS segment, t, CAST(n_risk AS BIGINT) AS n_risk,
           d AS d_events,
           list_reduce(fs, (p, q) -> p * q) AS survival
    FROM cum WHERE d > 0
    """,
)
def q_km_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier customer-lifetime curves per segment
    (operators/stats.py:kaplan_meier_by_group) on the exact cohorts
    q_logrank tests — the stratified retention PLOT beside the
    hypothesis test. Per-group risk sets are exact integers and the
    survival products fold in pinned order WITHIN each group
    partition (no single-partition funnel)."""
    from aws_datalake_spark.operators.stats import kaplan_meier_by_group

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    lake = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("mxd"))
    subj = (
        o.join(
            F.broadcast(
                c.select("c_custkey", "c_mktsegment").where(
                    F.col("c_mktsegment").isin(["AUTOMOBILE", "BUILDING"])
                )
            ),
            o.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("__mx"),
            F.min(F.col("o_orderdate").cast("date")).alias("__mn"),
        )
        .crossJoin(F.broadcast(lake))
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.datediff(F.col("__mx"), F.col("__mn"))
            .cast("long")
            .alias("dur"),
            (F.col("__mx") <= F.date_sub(F.col("mxd"), 90))
            .cast("int")
            .alias("obs"),
        )
    )
    return kaplan_meier_by_group(subj, "segment", "dur", "obs")


# ---------------------------------------------------------------------------
# two-count Poisson rate test
# ---------------------------------------------------------------------------


@query(
    "q_poisson_rate_test",
    oracle="""
    WITH k AS (
      SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS k1,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS k2
      FROM events
    )
    SELECT CAST(k1 AS BIGINT) AS n_purchase,
           CAST(k2 AS BIGINT) AS n_error,
           CASE WHEN k1 + k2 > 0 THEN
             (CAST(k1 AS DOUBLE) - CAST(k2 AS DOUBLE))
             / SQRT(CAST(k1 AS DOUBLE) + CAST(k2 AS DOUBLE))
           END AS z,
           CASE WHEN k1 + k2 > 0 THEN
             CAST(k1 AS DOUBLE) / CAST(k1 + k2 AS DOUBLE)
           END AS p_purchase
    FROM k
    """,
)
def q_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-count Poisson rate test over a shared observation window:
    are purchases and errors arriving at the same rate — the
    conditional (binomial) test z = (k₁−k₂)/√(k₁+k₂), the standard
    incident-rate comparison when both streams share the exposure
    (same lake, same window). Exact counts are the certificate; z
    and the conditional proportion are one mirrored IEEE tree. One
    conditional-count aggregate collapses the corpus."""
    ev = t(spark, sf_dir, "events")
    k = ev.agg(
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("k1"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("k2"),
    )
    ok = F.col("k1") + F.col("k2") > 0
    return k.select(
        F.col("k1").alias("n_purchase"),
        F.col("k2").alias("n_error"),
        F.when(
            ok,
            (F.col("k1").cast("double") - F.col("k2").cast("double"))
            / F.sqrt(F.col("k1").cast("double") + F.col("k2").cast("double")),
        ).alias("z"),
        F.when(
            ok,
            F.col("k1").cast("double")
            / (F.col("k1") + F.col("k2")).cast("double"),
        ).alias("p_purchase"),
    )
