"""Unit tests for the driver-round-r09 operator batch: parametric
statistics (ANOVA F, Jarque–Bera, Durbin–Watson, Cohen's d,
Mann–Whitney U), concentration (HHI), the grid-bucketed spatial
radius join, BFS layers, resource-allocation link prediction, and
the calibration / ranking-eval queries — each checked against an
independent pure-Python reference on small inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ANOVA F
# ---------------------------------------------------------------------------


def _anova_f_ref(groups):
    """Textbook one-way ANOVA F from a dict g -> [values]."""
    k = len(groups)
    allv = [v for vs in groups.values() for v in vs]
    n = len(allv)
    gm = sum(allv) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2 for vs in groups.values())
    ssw = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_oneway_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import anova_oneway

    groups = {"a": [1, 2, 3, 4], "b": [4, 5, 6, 7], "c": [9, 9, 10, 12]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x long")
    r = anova_oneway(df, "g", F.col("x")).collect()[0]
    assert r.k == 3 and r.n == 12
    assert r.f_stat == pytest.approx(_anova_f_ref(groups), rel=1e-12)
    allv = [v for vs in groups.values() for v in vs]
    gm = sum(allv) / len(allv)
    assert r.ss_between + r.ss_within == pytest.approx(
        sum((v - gm) ** 2 for v in allv), rel=1e-9
    )


def test_anova_single_group_null_f(spark):
    from aws_datalake_spark.operators.stats import anova_oneway

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, x long")
    r = anova_oneway(df, "g", F.col("x")).collect()[0]
    assert r.k == 1 and r.f_stat is None


def test_anova_zero_within_variance_null_f(spark):
    from aws_datalake_spark.operators.stats import anova_oneway

    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 7), ("b", 7)], "g string, x long"
    )
    r = anova_oneway(df, "g", F.col("x")).collect()[0]
    assert r.f_stat is None and r.ss_within == 0.0


# ---------------------------------------------------------------------------
# Jarque–Bera
# ---------------------------------------------------------------------------


def _jb_ref(vals):
    n = len(vals)
    m = sum(vals) / n
    m2 = sum((v - m) ** 2 for v in vals) / n
    m3 = sum((v - m) ** 3 for v in vals) / n
    m4 = sum((v - m) ** 4 for v in vals) / n
    s = m3 / m2**1.5
    k = m4 / m2**2
    return s, k, n / 6 * (s * s + (k - 3) ** 2 / 4)


def test_jarque_bera_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import jarque_bera

    vals = [1, 2, 2, 3, 3, 3, 4, 4, 9]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x long")
    r = jarque_bera(df, "g", F.col("x")).collect()[0]
    s, k, jb = _jb_ref(vals)
    assert r.skewness == pytest.approx(s, rel=1e-9)
    assert r.kurtosis == pytest.approx(k, rel=1e-9)
    assert r.jb == pytest.approx(jb, rel=1e-9)


def test_jarque_bera_constant_column_null(spark):
    from aws_datalake_spark.operators.stats import jarque_bera

    df = spark.createDataFrame([("g", 5)] * 4, "g string, x long")
    r = jarque_bera(df, "g", F.col("x")).collect()[0]
    assert r.skewness is None and r.jb is None


# ---------------------------------------------------------------------------
# Durbin–Watson
# ---------------------------------------------------------------------------


def test_durbin_watson_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import durbin_watson

    ts = list(range(10))
    ys = [3, 5, 4, 8, 7, 11, 9, 14, 12, 16]
    df = spark.createDataFrame(list(zip(ts, ys)), "t long, y long")
    n = len(ts)
    st, stt = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(ys), sum(t * y for t, y in zip(ts, ys))
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = (sy - b * st) / n
    es = [y - (a + b * t) for t, y in zip(ts, ys)]
    dw = sum(
        (es[i] - es[i - 1]) ** 2 for i in range(1, n)
    ) / sum(e * e for e in es)
    r = durbin_watson(df, F.col("t"), F.col("y")).collect()[0]
    assert r.n == 10
    assert r.slope == pytest.approx(b, rel=1e-12)
    assert r.dw == pytest.approx(dw, rel=1e-9)
    # the alternating residual pattern should read as negative
    # autocorrelation: DW > 2
    assert r.dw > 2.0


# ---------------------------------------------------------------------------
# Cohen's d
# ---------------------------------------------------------------------------


def test_cohens_d_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import cohens_d

    av, bv = [2, 4, 6, 8], [1, 2, 3, 4, 5]
    rows = [("a", v) for v in av] + [("b", v) for v in bv]
    df = spark.createDataFrame(rows, "g string, x long")
    r = cohens_d(df, "g", F.col("x"), "a", "b").collect()[0]
    ma, mb = sum(av) / len(av), sum(bv) / len(bv)
    va = sum((v - ma) ** 2 for v in av) / (len(av) - 1)
    vb = sum((v - mb) ** 2 for v in bv) / (len(bv) - 1)
    pooled = math.sqrt(
        ((len(av) - 1) * va + (len(bv) - 1) * vb) / (len(av) + len(bv) - 2)
    )
    assert r.n_a == 4 and r.n_b == 5
    assert r.mean_a == pytest.approx(ma) and r.mean_b == pytest.approx(mb)
    assert r.d == pytest.approx((ma - mb) / pooled, rel=1e-12)


def test_cohens_d_degenerate_group_null(spark):
    from aws_datalake_spark.operators.stats import cohens_d

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("b", 3)], "g string, x long"
    )
    r = cohens_d(df, "g", F.col("x"), "a", "b").collect()[0]
    assert r.n_a == 1 and r.d is None  # n_a <= 1: no pooled variance


# ---------------------------------------------------------------------------
# Mann–Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_u_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import mann_whitney_u

    av, bv = [1, 3, 3, 7], [2, 4, 6]
    rows = [("a", v) for v in av] + [("b", v) for v in bv]
    df = spark.createDataFrame(rows, "g string, x long")
    r = mann_whitney_u(df, "g", F.col("x"), "a", "b").collect()[0]
    # U_a = #(a beats b) + 0.5 * ties, over all cross pairs
    u = sum(
        1.0 if a > b else (0.5 if a == b else 0.0) for a in av for b in bv
    )
    assert r.n_a == 4 and r.n_b == 3
    assert r.u2 == int(2 * u)
    # tie group of size 2 (the two 3s): T = 2^3 - 2 = 6
    assert r.ties_t == 6
    # z against the tie-corrected normal approximation
    n = 7
    var = (4 * 3 / 12) * ((n + 1) - 6 / (n * (n - 1)))
    assert r.z == pytest.approx((2 * u - 4 * 3) / (2 * math.sqrt(var)), rel=1e-12)


def test_mann_whitney_empty_group_null_z(spark):
    from aws_datalake_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, x long")
    r = mann_whitney_u(df, "g", F.col("x"), "a", "b").collect()[0]
    assert r.n_b is None or r.z is None


# ---------------------------------------------------------------------------
# HHI
# ---------------------------------------------------------------------------


def test_hhi_equal_units(spark):
    from aws_datalake_spark.operators.stats import hhi_concentration

    rows = [("m", f"u{i}", 100) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, u string, v long")
    r = hhi_concentration(df, "g", "u", F.col("v")).collect()[0]
    assert r.n_units == 4
    assert r.hhi == pytest.approx(0.25, abs=1e-12)
    assert r.effective_units == pytest.approx(4.0, abs=1e-9)


def test_hhi_monopoly_and_rollup(spark):
    from aws_datalake_spark.operators.stats import hhi_concentration

    rows = [("m", "u1", 70), ("m", "u1", 30), ("m", "u2", 0)]
    df = spark.createDataFrame(rows, "g string, u string, v long")
    r = hhi_concentration(df, "g", "u", F.col("v")).collect()[0]
    # u1 holds 100 of 100 after the unit rollup; u2 holds 0
    assert r.n_units == 2 and r.hhi == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# BFS layers
# ---------------------------------------------------------------------------


def test_bfs_layers_path_graph(spark):
    from aws_datalake_spark.operators.graph import bfs_layers

    # path 1-2-3-4-5-6: from node 1, hops 0..4 reach one node each;
    # node 6 is beyond max_hops=4
    edges = [(i, i + 1) for i in range(1, 6)]
    e = spark.createDataFrame(edges, "s long, d long")
    out = {r.hop: r.n_nodes for r in bfs_layers(e, max_hops=4).collect()}
    assert out == {0: 1, 1: 1, 2: 1, 3: 1, 4: 1}


def test_bfs_layers_star_min_anchor(spark):
    from aws_datalake_spark.operators.graph import bfs_layers

    # star centered at 5 with leaves 1..4: anchor is MIN node (1),
    # so hub at hop 1 and the other leaves at hop 2
    e = spark.createDataFrame([(5, i) for i in range(1, 5)], "s long, d long")
    out = {r.hop: r.n_nodes for r in bfs_layers(e, max_hops=4).collect()}
    assert out == {0: 1, 1: 1, 2: 3}


# ---------------------------------------------------------------------------
# resource allocation
# ---------------------------------------------------------------------------


def test_resource_allocation_prefers_exclusive_middles(spark):
    from aws_datalake_spark.operators.graph import (
        resource_allocation_candidates,
    )

    # pair (1,2) shares a degree-2 middle (10); pair (3,4) shares a
    # degree-4 hub middle (20): RA must rank (1,2) above (3,4) even
    # though both have cn=1
    edges = [(1, 10), (2, 10), (3, 20), (4, 20), (5, 20), (6, 20)]
    e = spark.createDataFrame(edges, "s long, d long")
    rows = resource_allocation_candidates(e, k=50).collect()
    ra = {(r.u, r.v): r.ra for r in rows}
    assert ra[(1, 2)] == pytest.approx(0.5)
    assert ra[(3, 4)] == pytest.approx(0.25)
    ordered = [(r.u, r.v) for r in rows]
    assert ordered.index((1, 2)) < ordered.index((3, 4))


# ---------------------------------------------------------------------------
# spatial grid join invariant
# ---------------------------------------------------------------------------


def test_spatial_grid_join_matches_bruteforce(spark):
    """The 3×3 neighbor-cell join must find EXACTLY the within-radius
    pairs a brute-force cross join finds (cell size >= radius)."""
    cust = [(k, (k * 7919) % 10000, (k * 104729) % 10000) for k in range(1, 400)]
    supp = [
        (k, (k * 7919 + 3571) % 10000, (k * 104729 + 9973) % 10000)
        for k in range(1, 60)
    ]
    r2, cell = 150 * 150, 150
    brute = {
        (c, s)
        for c, xc, yc in cust
        for s, xs, ys in supp
        if (xc - xs) ** 2 + (yc - ys) ** 2 <= r2
    }
    cdf = spark.createDataFrame(cust, "ck long, xc long, yc long")
    sdf = spark.createDataFrame(supp, "sk long, xs long, ys long")
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long",
    )
    c9 = cdf.crossJoin(offs).select(
        "ck",
        "xc",
        "yc",
        (F.floor(F.col("xc") / cell) + F.col("dx")).alias("cx"),
        (F.floor(F.col("yc") / cell) + F.col("dy")).alias("cy"),
    )
    sc = sdf.select(
        "sk",
        "xs",
        "ys",
        F.floor(F.col("xs") / cell).alias("cx"),
        F.floor(F.col("ys") / cell).alias("cy"),
    )
    got = {
        (r.ck, r.sk)
        for r in c9.join(sc, ["cx", "cy"])
        .where(
            (F.col("xc") - F.col("xs")) * (F.col("xc") - F.col("xs"))
            + (F.col("yc") - F.col("ys")) * (F.col("yc") - F.col("ys"))
            <= r2
        )
        .select("ck", "sk")
        .collect()
    }
    assert got == brute
    assert brute  # non-vacuous


# ---------------------------------------------------------------------------
# Wilson interval sanity
# ---------------------------------------------------------------------------


def test_wilson_interval_brackets_p_and_stays_in_unit(spark, sf_dir):
    import __spark_entry__ as entry

    df = entry.queries()["q_wilson_ci"](spark, sf_dir)
    for r in df.collect():
        assert 0.0 <= r.wilson_lo <= r.p <= r.wilson_hi <= 1.0


# ---------------------------------------------------------------------------
# MRR / MAP bounds
# ---------------------------------------------------------------------------


def test_mrr_map_within_unit_interval(spark, sf_dir):
    import __spark_entry__ as entry

    mrr = entry.queries()["llm_mrr_eval"](spark, sf_dir).collect()
    assert sum(r.n_queries for r in mrr) == 100
    for r in mrr:
        assert 0.0 <= r.mrr <= 1.0
    m = entry.queries()["llm_map_eval"](spark, sf_dir).collect()
    for r in m:
        assert 0.0 <= r.map10 <= 1.0


# ---------------------------------------------------------------------------
# Brier / calibration invariants
# ---------------------------------------------------------------------------


def test_brier_calibration_bins(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["llm_brier_calibration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.frac_pos <= 1.0
        assert 0.0 <= r.mean_pred <= 1.0
        assert 0.0 <= r.brier <= 1.0
        # mean_pred must sit inside its decile bin
        assert r.bin * 0.1 <= r.mean_pred < r.bin * 0.1 + 0.1 + 1e-9


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def test_wilcoxon_signed_rank_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import wilcoxon_signed_rank

    # diffs: +2, -1, +3, +3, 0 (dropped) -> |d| ranks: 1->1,
    # 2->2, 3->avg(3,4)=3.5 ; W+ = 2 + 3.5 + 3.5 = 9
    rows = [(10, 12), (10, 9), (10, 13), (20, 23), (7, 7)]
    df = spark.createDataFrame(rows, "x1 long, x2 long")
    r = wilcoxon_signed_rank(df, F.col("x1"), F.col("x2")).collect()[0]
    assert r.n_pairs == 5 and r.n_nonzero == 4
    assert r.w2_plus == 18  # doubled W+
    assert r.ties_t == 6  # one tie group of 2: 2^3-2
    n = 4
    var = n * (n + 1) * (2 * n + 1) / 24 - 6 / 48
    assert r.z == pytest.approx((18 - n * (n + 1) / 2) / (2 * math.sqrt(var)), rel=1e-12)


def test_wilcoxon_all_zero_diffs(spark):
    from aws_datalake_spark.operators.stats import wilcoxon_signed_rank

    df = spark.createDataFrame([(5, 5), (7, 7)], "x1 long, x2 long")
    rows = wilcoxon_signed_rank(df, F.col("x1"), F.col("x2")).collect()
    # no nonzero diffs: the aggregate side is empty -> no row or a
    # row with n_nonzero null; either way no crash and no z
    assert all(r.z is None for r in rows)


# ---------------------------------------------------------------------------
# Cochran's Q
# ---------------------------------------------------------------------------


def test_cochran_q_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import cochran_q

    # 4 subjects x 3 treatments binary grid
    grid = {
        "s1": (1, 1, 0),
        "s2": (1, 0, 0),
        "s3": (1, 1, 1),
        "s4": (0, 1, 0),
    }
    rows = [
        (s, f"t{j}", v)
        for s, vs in grid.items()
        for j, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "i string, j string, s long")
    r = cochran_q(df, "i", "j", "s").collect()[0]
    k = 3
    cj = [sum(grid[s][j] for s in grid) for j in range(k)]
    ri = [sum(vs) for vs in grid.values()]
    n = sum(cj)
    q = (k - 1) * (k * sum(c * c for c in cj) - n * n) / (
        k * n - sum(r_ * r_ for r_ in ri)
    )
    assert r.n_subjects == 4 and r.k == 3
    assert r.q == pytest.approx(q, rel=1e-12)


# ---------------------------------------------------------------------------
# Wasserstein-1
# ---------------------------------------------------------------------------


def test_wasserstein_matches_scipy_formula(spark):
    from aws_datalake_spark.operators.stats import wasserstein_1

    av, bv = [1, 1, 2, 4], [2, 3, 3, 5]
    rows = [("a", v) for v in av] + [("b", v) for v in bv]
    df = spark.createDataFrame(rows, "g string, v long")
    r = wasserstein_1(df, "g", F.col("v"), "a", "b").collect()[0]

    # reference: integral of |F_a - F_b| over the value line
    def cdf(vals, x):
        return sum(1 for v in vals if v <= x) / len(vals)

    ref = sum(
        abs(cdf(av, x) - cdf(bv, x)) for x in range(1, 5)
    )  # unit steps between 1..5
    assert r.n_a == 4 and r.n_b == 4
    assert r.w1 == pytest.approx(ref, rel=1e-12)
    assert int(r.w1_num) / int(r.w1_den) == pytest.approx(r.w1, rel=1e-12)


def test_wasserstein_identical_distributions_zero(spark):
    from aws_datalake_spark.operators.stats import wasserstein_1

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = wasserstein_1(df, "g", F.col("v"), "a", "b").collect()[0]
    assert r.w1 == 0.0


# ---------------------------------------------------------------------------
# Holt linear
# ---------------------------------------------------------------------------


def test_holt_linear_matches_python_recursion(spark, sf_dir):
    """The Spark fold must reproduce the plain-Python Holt recursion
    on the actual monthly series, bit-for-bit."""
    import duckdb
    import __spark_entry__ as entry

    ser = duckdb.sql(
        f"""SELECT CAST(EXTRACT(year FROM o_orderdate) * 12
                 + EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
                 CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS y
           FROM '{sf_dir}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    lvl, tr = float(ser[0][1]), 0.0
    for _, y in ser[1:]:
        nl = 0.5 * float(y) + 0.5 * (lvl + tr)
        tr = 0.5 * (nl - lvl) + 0.5 * tr
        lvl = nl
    r = entry.queries()["q_holt_linear"](
        spark._jsparkSession and spark, sf_dir
    ).collect()[0]
    assert r.n == len(ser)
    assert r.level == lvl and r.trend == tr  # exact: same IEEE fold
    assert r.forecast_3 == lvl + 3.0 * tr


# ---------------------------------------------------------------------------
# seasonal decomposition invariants
# ---------------------------------------------------------------------------


def test_seasonal_decompose_identity_and_edges(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["q_seasonal_decompose"](spark, sf_dir).collect()
    rows.sort(key=lambda r: r.month_index)
    assert len(rows) >= 24
    # first and last 6 months: no trend
    for r in rows[:6] + rows[-6:]:
        assert r.remainder is None
    # interior months: y = trend + seasonal + remainder (exact
    # reconstruction up to the two divides' rounding)
    for r in rows[7:-7]:
        assert r.trend is not None
        assert float(r.revenue_cents) == pytest.approx(
            r.trend + r.seasonal + r.remainder, rel=1e-12
        )


# ---------------------------------------------------------------------------
# Friedman test
# ---------------------------------------------------------------------------


def test_friedman_matches_textbook(spark):
    """Arithmetic within-block ranks vs the textbook Friedman χ² on
    a hand grid (with one tied block)."""
    import __spark_entry__  # noqa: F401  (registers queries)
    from pyspark.sql import functions as F  # noqa: F811

    # blocks of (x1, x2, x3)
    blocks = [(1, 2, 3), (2, 2, 5), (9, 4, 1), (3, 6, 8)]

    def ranks(row):
        out = []
        for j in range(3):
            less = sum(1 for i in range(3) if row[i] < row[j])
            tie = sum(1 for i in range(3) if i != j and row[i] == row[j])
            out.append(less + (tie + 2) / 2)  # avg rank
        return out

    rj = [sum(ranks(b)[j] for b in blocks) for j in range(3)]
    n, k = len(blocks), 3
    chi2 = 12.0 * sum(r * r for r in rj) / (n * k * (k + 1)) - 3 * n * (k + 1)

    # replicate the query's arithmetic-rank device on this grid
    df = spark.createDataFrame(blocks, "x1 long, x2 long, x3 long")

    def _dr(j):
        others = [i for i in (1, 2, 3) if i != j]
        less = sum((F.col(f"x{i}") < F.col(f"x{j}")).cast("long") for i in others)
        tie = sum((F.col(f"x{i}") == F.col(f"x{j}")).cast("long") for i in others)
        return (2 * less + tie + 2).alias(f"d{j}")

    agg = df.select(_dr(1), _dr(2), _dr(3)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d1").alias("r1"),
        F.sum("d2").alias("r2"),
        F.sum("d3").alias("r3"),
    ).collect()[0]
    assert [agg.r1 / 2, agg.r2 / 2, agg.r3 / 2] == rj
    got = 3.0 * (agg.r1**2 + agg.r2**2 + agg.r3**2) / (agg.n * 3.0 * 4.0) - 3.0 * agg.n * 4.0
    assert got == pytest.approx(chi2, rel=1e-12)


# ---------------------------------------------------------------------------
# partial correlation
# ---------------------------------------------------------------------------


def test_partial_correlation_zeroes_out_mediated_link(spark, sf_dir):
    """On data where y = z exactly, r_xy.z must be ~the residual
    association; sanity: output within [-1, 1] and consistent with
    the direct Pearson identity."""
    import __spark_entry__ as entry

    r = entry.queries()["q_partial_correlation"](spark, sf_dir).collect()[0]
    for v in (r.r_xy, r.r_xz, r.r_yz, r.partial_xy_z):
        assert v is None or -1.0 <= v <= 1.0
    expected = (r.r_xy - r.r_xz * r.r_yz) / (
        math.sqrt(1 - r.r_xz**2) * math.sqrt(1 - r.r_yz**2)
    )
    assert r.partial_xy_z == pytest.approx(expected, rel=1e-12)


# ---------------------------------------------------------------------------
# churn / stickiness invariants
# ---------------------------------------------------------------------------


def test_churn_identity_and_bounds(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["q_churn_rate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.retained + r.churned == r.active_prev
        assert 0.0 <= r.churn_rate <= 1.0


def test_stickiness_bounds(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["q_dau_mau_stickiness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.stickiness <= 1.0
        assert r.mau <= r.dau_sum  # every MAU member has >= 1 active day


# ---------------------------------------------------------------------------
# Nelson–Aalen / log-rank
# ---------------------------------------------------------------------------


def test_nelson_aalen_matches_textbook(spark):
    from aws_datalake_spark.operators.stats import nelson_aalen

    # durations (obs): 1+, 2+, 2, 3(censored), 4+  ("+" = event)
    rows = [(1, 1), (2, 1), (2, 1), (3, 0), (4, 1)]
    df = spark.createDataFrame(rows, "dur long, obs int")
    out = {r.t: r for r in nelson_aalen(df, "dur", "obs").collect()}
    # t=1: d=1, n=5 -> H=1/5 ; t=2: d=2, n=4 -> H=1/5+2/4 ;
    # t=4: d=1, n=1 -> H=1/5+2/4+1
    assert out[1].cum_hazard == pytest.approx(0.2)
    assert out[2].cum_hazard == pytest.approx(0.2 + 0.5)
    assert out[4].cum_hazard == pytest.approx(0.2 + 0.5 + 1.0)
    assert 3 not in out  # censoring-only time emits no row
    assert out[2].var_hazard == pytest.approx(1 / 25 + 2 / 16)


def test_logrank_identical_groups_z_near_zero(spark):
    from aws_datalake_spark.operators.stats import logrank_test

    rows = [("a", d, 1) for d in (1, 2, 3, 4)] + [
        ("b", d, 1) for d in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    r = logrank_test(df, "g", "dur", "obs", "a", "b").collect()[0]
    assert r.n_a == 4 and r.n_b == 4
    assert r.observed_a == 4
    assert r.expected_a == pytest.approx(4.0)
    assert r.z == pytest.approx(0.0, abs=1e-12)


def test_logrank_separated_groups_large_chi2(spark):
    from aws_datalake_spark.operators.stats import logrank_test

    # group a dies early, group b late: strongly separated curves
    rows = [("a", d, 1) for d in (1, 1, 2, 2)] + [
        ("b", d, 1) for d in (8, 9, 10, 11)
    ]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    r = logrank_test(df, "g", "dur", "obs", "a", "b").collect()[0]
    assert r.observed_a == 4
    assert r.expected_a < 2.5
    assert r.chi2 > 3.84  # significant at 5%


def test_logrank_matches_lifelines_formula(spark):
    """Hand-computed O/E/V on a small mixed-censoring case."""
    from aws_datalake_spark.operators.stats import logrank_test

    rows = [
        ("a", 1, 1), ("a", 2, 0), ("a", 3, 1),
        ("b", 1, 1), ("b", 2, 1), ("b", 4, 1),
    ]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    r = logrank_test(df, "g", "dur", "obs", "a", "b").collect()[0]
    # event times: t=1 (d=2, n=6, na=3), t=2 (d=1 [b], n=4, na=2),
    # t=3 (d=1 [a], n=2, na=1), t=4 (d=1, n=1, na=0)
    e = 2 * 3 / 6 + 1 * 2 / 4 + 1 * 1 / 2 + 0.0
    v = (
        2 * (3 / 6) * (1 - 3 / 6) * ((6 - 2) / 5)
        + 1 * (2 / 4) * (1 - 2 / 4) * (3 / 3)
        + 1 * (1 / 2) * (1 - 1 / 2) * (1 / 1)
        + 0.0
    )
    assert r.observed_a == 2
    assert r.expected_a == pytest.approx(e, rel=1e-12)
    assert r.z == pytest.approx((2 - e) / math.sqrt(v), rel=1e-9)


# ---------------------------------------------------------------------------
# forecast backtest invariants
# ---------------------------------------------------------------------------


def test_forecast_backtest_horizons_and_errors(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["q_forecast_backtest"](spark, sf_dir).collect()
    assert sorted(r.h for r in rows) == [1, 2, 3, 4, 5, 6]
    for r in rows:
        assert r.abs_err == pytest.approx(
            abs(float(r.actual_cents) - r.forecast), rel=1e-12
        )
        assert r.ape >= 0.0


# ---------------------------------------------------------------------------
# degenerate-input sweep (r09 operators)
# ---------------------------------------------------------------------------


def test_friedman_constant_blocks_chi2_zero(spark):
    """All-tied blocks: every rank is the average 2 -> chi2 exactly
    0 (the 12/(nk(k+1))·ΣR² term equals 3n(k+1))."""
    import __spark_entry__  # noqa: F401

    from pyspark.sql import functions as F  # noqa: F811

    df = spark.createDataFrame([(5, 5, 5)] * 3, "x1 long, x2 long, x3 long")

    def _dr(j):
        others = [i for i in (1, 2, 3) if i != j]
        less = sum((F.col(f"x{i}") < F.col(f"x{j}")).cast("long") for i in others)
        tie = sum((F.col(f"x{i}") == F.col(f"x{j}")).cast("long") for i in others)
        return (2 * less + tie + 2).alias(f"d{j}")

    agg = df.select(_dr(1), _dr(2), _dr(3)).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d1").alias("r1"),
        F.sum("d2").alias("r2"),
        F.sum("d3").alias("r3"),
    ).collect()[0]
    chi2 = 3.0 * (agg.r1**2 + agg.r2**2 + agg.r3**2) / (agg.n * 12.0) - 12.0 * agg.n
    assert chi2 == pytest.approx(0.0, abs=1e-9)


def test_durbin_watson_two_points_degenerate(spark):
    """n=2: the line fits exactly, residuals 0, DW undefined (0/0)
    -> NULL, not a crash."""
    from aws_datalake_spark.operators.stats import durbin_watson

    df = spark.createDataFrame([(0, 1), (1, 3)], "t long, y long")
    r = durbin_watson(df, F.col("t"), F.col("y")).collect()[0]
    assert r.n == 2 and r.slope == pytest.approx(2.0)
    assert r.dw is None


def test_bfs_layers_isolated_single_edge(spark):
    from aws_datalake_spark.operators.graph import bfs_layers

    e = spark.createDataFrame([(7, 9)], "s long, d long")
    out = {r.hop: r.n_nodes for r in bfs_layers(e, max_hops=4).collect()}
    assert out == {0: 1, 1: 1}


def test_nelson_aalen_all_censored_empty(spark):
    from aws_datalake_spark.operators.stats import nelson_aalen

    df = spark.createDataFrame([(3, 0), (5, 0)], "dur long, obs int")
    assert nelson_aalen(df, "dur", "obs").where("d_events > 0").count() == 0


def test_logrank_no_events_null_z(spark):
    from aws_datalake_spark.operators.stats import logrank_test

    rows = [("a", 1, 0), ("b", 2, 0)]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    r = logrank_test(df, "g", "dur", "obs", "a", "b").collect()[0]
    assert r.observed_a in (0, None)
    assert r.z is None


def test_cochran_q_constant_rows_zero_denominator(spark):
    """Every subject all-1: k*N == ΣR², denominator 0 -> NULL q."""
    from aws_datalake_spark.operators.stats import cochran_q

    rows = [(s, t_, 1) for s in ("a", "b") for t_ in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "i string, j string, s long")
    r = cochran_q(df, "i", "j", "s").collect()[0]
    assert r.q is None


# ---------------------------------------------------------------------------
# cross-operator consistency identities
# ---------------------------------------------------------------------------


def test_mann_whitney_complement_identity(spark):
    """U_a + U_b = n_a·n_b (doubled: u2_a + u2_b = 2·n_a·n_b) for
    any data — the rank-sum bookkeeping identity."""
    from aws_datalake_spark.operators.stats import mann_whitney_u

    rows = [("a", v) for v in (1, 5, 5, 9, 12)] + [
        ("b", v) for v in (2, 5, 7)
    ]
    df = spark.createDataFrame(rows, "g string, x long")
    ra = mann_whitney_u(df, "g", F.col("x"), "a", "b").collect()[0]
    rb = mann_whitney_u(df, "g", F.col("x"), "b", "a").collect()[0]
    assert ra.u2 + rb.u2 == 2 * ra.n_a * ra.n_b
    assert rb.z == pytest.approx(-ra.z, rel=1e-12)


def test_wasserstein_symmetry(spark):
    from aws_datalake_spark.operators.stats import wasserstein_1

    rows = [("a", v) for v in (1, 4, 4, 9)] + [
        ("b", v) for v in (2, 3, 8)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    ab = wasserstein_1(df, "g", F.col("v"), "a", "b").collect()[0]
    ba = wasserstein_1(df, "g", F.col("v"), "b", "a").collect()[0]
    assert ab.w1 == ba.w1 and ab.w1_num == ba.w1_num


def test_cochran_k2_equals_mcnemar_chi2(spark):
    """Cochran's Q with k=2 treatments IS McNemar's χ² = (b−c)²/(b+c)
    (without continuity correction) — cross-operator identity."""
    from aws_datalake_spark.operators.stats import cochran_q, mcnemar_test

    pairs = [(1, 1), (1, 0), (1, 0), (0, 1), (0, 0), (1, 0), (0, 0)]
    cells = [
        (f"s{i}", t_, v)
        for i, (x, y) in enumerate(pairs)
        for t_, v in (("before", x), ("after", y))
    ]
    cdf = spark.createDataFrame(cells, "i string, j string, s long")
    q = cochran_q(cdf, "i", "j", "s").collect()[0]
    mdf = spark.createDataFrame(pairs, "before int, after int")
    m = mcnemar_test(mdf, "before", "after").collect()[0]
    assert q.q == pytest.approx(m.chi2, rel=1e-12)


def test_logrank_antisymmetric_in_groups(spark):
    from aws_datalake_spark.operators.stats import logrank_test

    rows = [("a", 1, 1), ("a", 4, 0), ("b", 2, 1), ("b", 3, 1)]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    ab = logrank_test(df, "g", "dur", "obs", "a", "b").collect()[0]
    ba = logrank_test(df, "g", "dur", "obs", "b", "a").collect()[0]
    assert ab.z == pytest.approx(-ba.z, rel=1e-9)
    assert ab.chi2 == pytest.approx(ba.chi2, rel=1e-9)


def test_rmst_textbook_area(spark):
    """RMST = area under the KM step curve, clamped at tau — checked
    against a hand-computed case via the same device the query
    uses (kaplan_meier + segment fold)."""
    from pyspark.sql import Window

    from aws_datalake_spark.operators.stats import kaplan_meier

    # events at t=2 (1 of 4) and t=5 (1 of 2), censored at 3, 8
    rows = [(2, 1), (3, 0), (5, 1), (8, 0)]
    df = spark.createDataFrame(rows, "dur long, obs int")
    km = kaplan_meier(df, "dur", "obs")
    w = Window.orderBy("t")
    tau = F.lit(6)
    seg = km.select(
        "t",
        "survival",
        F.lag("survival", 1, 1.0).over(w).alias("prev_s"),
        F.lag("t", 1, 0).over(w).alias("prev_t"),
        F.lead("t", 1).over(w).alias("nxt"),
    )
    term = F.col("prev_s") * (
        F.least(F.col("t"), tau) - F.least(F.col("prev_t"), tau)
    ).cast("double") + F.when(
        F.col("nxt").isNull(),
        F.col("survival") * (tau - F.least(F.col("t"), tau)).cast("double"),
    ).otherwise(F.lit(0.0))
    got = seg.agg(F.sum(term)).collect()[0][0]
    # S=1 on [0,2), S=0.75 on [2,5), S=0.375 on [5,6]
    assert got == pytest.approx(2 * 1.0 + 3 * 0.75 + 1 * 0.375, rel=1e-12)


def test_rmst_bounded_by_tau(spark, sf_dir):
    import __spark_entry__ as entry

    r = entry.queries()["q_rmst"](spark, sf_dir).collect()[0]
    assert 0.0 < r.rmst <= r.tau


def test_km_by_group_matches_global_on_single_group(spark):
    """With one group the stratified estimator must equal the global
    kaplan_meier bit-for-bit."""
    from aws_datalake_spark.operators.stats import (
        kaplan_meier,
        kaplan_meier_by_group,
    )

    rows = [(2, 1), (3, 0), (5, 1), (8, 0), (8, 1)]
    df = spark.createDataFrame(rows, "dur long, obs int").withColumn(
        "g", F.lit("only")
    )
    glob = {
        (r.t): (r.n_risk, r.d_events, r.survival)
        for r in kaplan_meier(df, "dur", "obs").collect()
    }
    strat = {
        (r.t): (r.n_risk, r.d_events, r.survival)
        for r in kaplan_meier_by_group(df, "g", "dur", "obs").collect()
    }
    assert glob == strat


def test_km_by_group_partitions_are_independent(spark):
    from aws_datalake_spark.operators.stats import kaplan_meier_by_group

    rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 1), ("b", 9, 0)]
    df = spark.createDataFrame(rows, "g string, dur long, obs int")
    out = {
        (r.g, r.t): (r.n_risk, r.survival)
        for r in kaplan_meier_by_group(df, "g", "dur", "obs").collect()
    }
    assert out[("a", 1)] == (2, 0.5)
    assert out[("a", 2)][1] == pytest.approx(0.0)
    assert out[("b", 1)] == (2, 0.5)
    assert ("b", 9) not in out  # censored-only time


def test_poisson_rate_equal_counts_z_zero(spark, sf_dir):
    import __spark_entry__ as entry

    r = entry.queries()["q_poisson_rate_test"](spark, sf_dir).collect()[0]
    assert r.n_purchase > 0 and r.n_error > 0
    assert abs(r.z) < 5.0  # same generator -> rates close
    assert 0.0 < r.p_purchase < 1.0
