"""Unit tests for the driver-round-r08 operator batch: rank
statistics (Spearman, Kendall), categorical association (Cramér's V),
autocorrelation, TWAP, freshness audit, and the two new graph
readouts — each checked against an independent pure-Python/numpy
reference on small inputs."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _avg_ranks(vals):
    """Tie-averaged ranks (1-based), the textbook definition."""
    s = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and vals[s[j + 1]] == vals[s[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[s[k]] = avg
        i = j + 1
    return ranks


def _pearson(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
    dx = math.sqrt(sum((a - mx) ** 2 for a in xs))
    dy = math.sqrt(sum((b - my) ** 2 for b in ys))
    return num / (dx * dy)


def test_spearman_matches_reference_with_ties(spark):
    from aws_datalake_spark.operators.stats import spearman_rho

    xs = [1, 2, 2, 3, 3, 3, 10, 9, 8, 1]
    ys = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    r = spearman_rho(df, F.col("x"), F.col("y"), by=["g"]).collect()[0]
    want = _pearson(_avg_ranks(xs), _avg_ranks(ys))
    assert r.n == 10
    assert r.rho == pytest.approx(want, abs=1e-12)


def test_spearman_perfect_monotone_is_one(spark):
    from aws_datalake_spark.operators.stats import spearman_rho

    df = spark.createDataFrame(
        [("g", i, i * i) for i in range(1, 9)], "g string, x long, y long"
    )
    r = spearman_rho(df, F.col("x"), F.col("y"), by=["g"]).collect()[0]
    assert r.rho == pytest.approx(1.0, abs=1e-12)


def _kendall_ref(xs, ys):
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[j] - xs[i]) * (ys[j] - ys[i])
            if s > 0:
                c += 1
            elif s < 0:
                d += 1
    from collections import Counter

    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in Counter(xs).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(ys).values())
    return c, d, (c - d) / math.sqrt((n0 - n1) * (n0 - n2))


def test_kendall_tau_b_matches_reference(spark):
    from aws_datalake_spark.operators.stats import kendall_tau_b

    xs = [12, 2, 1, 12, 2, 7, 7, 3]
    ys = [1, 4, 7, 1, 0, 8, 8, 3]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x long, y long"
    )
    r = kendall_tau_b(df, "g", F.col("x"), F.col("y")).collect()[0]
    c, d, tau = _kendall_ref(xs, ys)
    assert (r.concordant, r.discordant) == (c, d)
    assert r.tau_b == pytest.approx(tau, abs=1e-12)


def test_kendall_reversed_is_minus_one(spark):
    from aws_datalake_spark.operators.stats import kendall_tau_b

    df = spark.createDataFrame(
        [("g", i, 10 - i) for i in range(10)], "g string, x long, y long"
    )
    r = kendall_tau_b(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert r.tau_b == pytest.approx(-1.0, abs=1e-12)


def test_cramers_v_matches_reference(spark):
    from aws_datalake_spark.operators.stats import cramers_v

    # 2x2: strong association
    rows = (
        [("a", "x")] * 40 + [("a", "y")] * 10
        + [("b", "x")] * 10 + [("b", "y")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    # textbook chi2 for this table
    n = 100
    chi2 = 0.0
    counts = {("a", "x"): 40, ("a", "y"): 10, ("b", "x"): 10, ("b", "y"): 40}
    for (ra, cb), o in counts.items():
        e = 50 * 50 / n
        chi2 += (o - e) ** 2 / e
    assert r.n == 100 and r.n_rows == 2 and r.n_cols == 2
    assert r.chi2 == pytest.approx(chi2, abs=1e-6)
    assert r.v == pytest.approx(math.sqrt(chi2 / n), abs=1e-6)


def test_cramers_v_independent_is_zero(spark):
    from aws_datalake_spark.operators.stats import cramers_v

    rows = [(a, b) for a in ("p", "q") for b in ("x", "y", "z")
            for _ in range(7)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.chi2 == 0.0 and r.v == 0.0


def test_autocorrelation_matches_numpy(spark):
    import numpy as np

    from aws_datalake_spark.operators.stats import autocorrelation

    rng = np.random.RandomState(7)
    x = np.cumsum(rng.randint(-5, 6, size=60)) + 100
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(x)], "t long, x long"
    )
    got = {r.lag: r.acf
           for r in autocorrelation(df, "t", F.col("x"), max_lag=3).collect()}
    xb = x - x.mean()
    den = float((xb * xb).sum())
    for k in (1, 2, 3):
        want = float((xb[:-k] * xb[k:]).sum()) / den
        assert got[k] == pytest.approx(want, abs=1e-6), k


def test_time_weighted_avg_hand_case(spark):
    from aws_datalake_spark.operators.stats import time_weighted_avg

    rows = [
        # value 100 held 10s, value 200 held 30s, last holds nothing
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.00),
        (2, datetime(2024, 1, 1, 0, 0, 10), 2.00),
        (3, datetime(2024, 1, 1, 0, 0, 40), 9.99),
        # second day: single event -> NULL twa
        (4, datetime(2024, 1, 2, 12, 0, 0), 5.00),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r.day.day: r for r in time_weighted_avg(
        df, "ts", F.round(F.col("value") * 100, 0), "event_id"
    ).collect()}
    d1 = out[1]
    assert d1.n_obs == 3 and d1.held_seconds == 40
    assert d1.twa == pytest.approx((100 * 10 + 200 * 30) / 40, abs=1e-6)
    d2 = out[2]
    assert d2.n_obs == 1 and d2.held_seconds == 0 and d2.twa is None


def test_time_weighted_avg_equal_ts_tiebreak(spark):
    """Two same-instant events: the LOWER event_id holds the zero-
    length interval, the higher one holds to the next event —
    deterministic either way, but the sums must be stable."""
    from aws_datalake_spark.operators.stats import time_weighted_avg

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.00),
        (2, datetime(2024, 1, 1, 0, 0, 0), 3.00),
        (3, datetime(2024, 1, 1, 0, 0, 20), 0.00),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    r = time_weighted_avg(
        df, "ts", F.round(F.col("value") * 100, 0), "event_id"
    ).collect()[0]
    assert r.held_seconds == 20
    assert r.twa == pytest.approx(300.0, abs=1e-9)  # id 2 holds all 20s


def test_freshness_audit(spark):
    from aws_datalake_spark.operators.dq import freshness_audit

    rows = [
        ("live", datetime(2024, 1, 10, 12, 0, 0)),
        ("live", datetime(2024, 1, 10, 11, 0, 0)),
        ("stale", datetime(2024, 1, 9, 12, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = {r.src: r for r in
           freshness_audit(df, "ts", "src", sla_seconds=3600).collect()}
    assert out["live"].lag_seconds == 0 and out["live"].fresh
    assert out["stale"].lag_seconds == 86400 and not out["stale"].fresh
    assert out["live"].n == 2


def test_degree_assortativity_star_is_minus_one(spark):
    from aws_datalake_spark.operators.graph import degree_assortativity

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "s long, d long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.m_edges == 4
    assert r.r == pytest.approx(-1.0, abs=1e-9)


def test_degree_assortativity_regular_graph_degenerate(spark):
    """A cycle is degree-regular: zero variance -> NULL r."""
    from aws_datalake_spark.operators.graph import degree_assortativity

    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "s long, d long"
    )
    r = degree_assortativity(cyc).collect()[0]
    assert r.r is None


def test_common_neighbors_square(spark):
    """4-cycle: the two diagonals are the only non-adjacent pairs,
    each sharing both neighbors -> cn=2, jaccard=1."""
    from aws_datalake_spark.operators.graph import common_neighbor_candidates

    sq = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "s long, d long"
    )
    out = sorted((r.u, r.v, r.cn, r.jaccard)
                 for r in common_neighbor_candidates(sq, k=10).collect())
    assert out == [(1, 3, 2, 1.0), (2, 4, 2, 1.0)]


def test_common_neighbors_excludes_adjacent_and_caps(spark):
    from aws_datalake_spark.operators.graph import common_neighbor_candidates

    # triangle + pendant: (1,2),(2,3),(1,3),(3,4)
    g = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "s long, d long"
    )
    out = {(r.u, r.v): r for r in
           common_neighbor_candidates(g, k=10).collect()}
    # adjacent pairs never appear; (1,4) and (2,4) share neighbor 3
    assert set(out) == {(1, 4), (2, 4)}
    assert out[(1, 4)].cn == 1
    # degree cap: only middles with deg <= 2 route wedges (nodes 1, 2);
    # their wedge pairs (2,3) and (1,3) are existing edges, so the
    # anti-join leaves nothing — the cap dropped the (1,4)/(2,4)
    # candidates that needed the deg-3 middle
    capped = common_neighbor_candidates(g, k=10, max_degree=2).collect()
    assert capped == []


# --- batch 2: PR curve, EWMA ---------------------------------------------


def test_pr_curve_perfect_separation(spark):
    """Scores perfectly separate labels: precision stays 1.0 until
    the positives are exhausted, recall hits 1.0 there, and the
    deciles cover k = N/10 ... N."""
    from aws_datalake_spark.operators.order_stats import (
        precision_recall_at_deciles,
    )

    rows = [(100 + i, 1) for i in range(30)] + [(i, 0) for i in range(70)]
    df = spark.createDataFrame(rows, "score long, pos int")
    out = {r.decile: r for r in
           precision_recall_at_deciles(df, "score", "pos").collect()}
    assert len(out) == 10
    assert out[1].k == 10 and out[1].tp == 10 and out[1].precision == 1.0
    assert out[3].recall == 1.0  # all 30 positives found at k=30
    assert out[10].k == 100 and out[10].recall == 1.0
    assert out[10].precision == pytest.approx(0.3, abs=1e-9)
    # F1 is the exact rational 2tp/(k+P)
    assert out[3].f1 == pytest.approx(2 * 30 / (30 + 30), abs=1e-9)


def test_pr_curve_cuts_on_score_boundaries(spark):
    """Ties never straddle a cut: with one massive tie block the
    first covering boundary is the whole block."""
    from aws_datalake_spark.operators.order_stats import (
        precision_recall_at_deciles,
    )

    rows = [(5, 1)] * 50 + [(1, 0)] * 50
    df = spark.createDataFrame(rows, "score long, pos int")
    out = {r.decile: r for r in
           precision_recall_at_deciles(df, "score", "pos").collect()}
    for d in range(1, 6):  # deciles 1-5 all cut at the block edge
        assert out[d].k == 50 and out[d].tp == 50


def test_ewma_constant_series_is_identity(spark):
    """EWMA of a constant series equals the constant at every row
    (including the ramp-up rows that normalize by partial weights)."""
    from aws_datalake_spark.operators.stats import ewma_truncated

    df = spark.createDataFrame([(i, 700) for i in range(30)],
                               "t long, x long")
    out = ewma_truncated(df, "t", F.col("x")).collect()
    assert len(out) == 30
    assert all(r.ewma == 700.0 for r in out)


def test_ewma_matches_python_reference(spark):
    """Truncated-window EWMA against a direct python evaluation of
    the same weight algebra."""
    from aws_datalake_spark.operators.stats import ewma_truncated

    xs = [100, 200, 50, 400, 0, 300, 250, 75]
    df = spark.createDataFrame(list(enumerate(xs)), "t long, x long")
    got = {r.t: r.ewma for r in
           ewma_truncated(df, "t", F.col("x"), window=4).collect()}
    for t in range(len(xs)):
        terms = [(xs[t - j], 2 ** (3 - j)) for j in range(4) if t - j >= 0]
        want = sum(v * w for v, w in terms) / sum(w for _, w in terms)
        assert got[t] == pytest.approx(want, abs=1e-12), t


def test_knn_eval_labels_consistent(spark, sf_dir):
    """Registered query sanity on the fixture: per-class counts sum
    to the 100 held-out queries and accuracy is a valid rational."""
    from aws_datalake_spark.queries import all_queries

    out = all_queries()["llm_knn_eval"](spark, sf_dir).collect()
    assert sum(r.n for r in out) == 100
    for r in out:
        assert 0 <= r.n_correct <= r.n
        assert r.accuracy == pytest.approx(r.n_correct / r.n, abs=1e-6)


# --- batch 3: survival, proportions, Lorenz ---------------------------------


def test_kaplan_meier_textbook_case(spark):
    """Classic small example: durations (6,6,6,7,10) observed and
    (6+,9+,10+,11+) censored — the Kaplan & Meier (1958) values."""
    from aws_datalake_spark.operators.stats import kaplan_meier

    rows = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
            (10, 0), (11, 0)]
    df = spark.createDataFrame(rows, "dur long, obs int")
    out = {r.t: r for r in kaplan_meier(df, "dur", "obs").collect()}
    assert set(out) == {6, 7, 10}
    assert out[6].n_risk == 9 and out[6].d_events == 3
    assert out[6].survival == pytest.approx(6 / 9 * 1.0, abs=1e-12)
    assert out[7].n_risk == 5
    assert out[7].survival == pytest.approx((6 / 9) * (4 / 5), abs=1e-12)
    assert out[10].n_risk == 3
    assert out[10].survival == pytest.approx(
        (6 / 9) * (4 / 5) * (2 / 3), abs=1e-12
    )


def test_kaplan_meier_all_censored_is_empty(spark):
    from aws_datalake_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame([(5, 0), (8, 0)], "dur long, obs int")
    assert kaplan_meier(df, "dur", "obs").collect() == []


def test_two_proportion_ztest_reference(spark):
    import math

    from aws_datalake_spark.operators.stats import two_proportion_ztest

    rows = [("A", 1)] * 40 + [("A", 0)] * 60 + [("B", 1)] * 25 + [("B", 0)] * 75
    df = spark.createDataFrame(rows, "g string, s int")
    r = two_proportion_ztest(df, "g", "s", "A", "B").collect()[0]
    assert (r.n_a, r.x_a, r.n_b, r.x_b) == (100, 40, 100, 25)
    pool = 65 / 200
    want = (0.40 - 0.25) / math.sqrt(pool * (1 - pool) * (2 / 100))
    assert r.z == pytest.approx(want, abs=1e-12)


def test_two_proportion_equal_rates_z_zero(spark):
    from aws_datalake_spark.operators.stats import two_proportion_ztest

    rows = [("A", i % 2) for i in range(50)] + [("B", i % 2) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, s int")
    r = two_proportion_ztest(df, "g", "s", "A", "B").collect()[0]
    assert r.z == pytest.approx(0.0, abs=1e-12)


def test_lorenz_uniform_is_diagonal(spark):
    from aws_datalake_spark.operators.order_stats import lorenz_curve

    df = spark.createDataFrame([(i, 7) for i in range(100)],
                               "id long, v long")
    out = {r.point: r for r in lorenz_curve(df, F.col("v")).collect()}
    # all values equal -> one domain row covers every cut at k=N
    for p in range(1, 11):
        assert out[p].n_cum == 100 and out[p].share == 1.0


def test_lorenz_concentrated_tail(spark):
    """90 subjects hold 0, 10 hold everything: bottom 90% share = 0,
    the last decile jumps to 1."""
    from aws_datalake_spark.operators.order_stats import lorenz_curve

    rows = [(i, 0) for i in range(90)] + [(90 + i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v long")
    out = {r.point: r for r in lorenz_curve(df, F.col("v")).collect()}
    for p in range(1, 10):
        assert out[p].n_cum == 90 and out[p].share == 0.0
    assert out[10].n_cum == 100 and out[10].share == 1.0


# --- batch 4: McNemar, kappa, bootstrap -----------------------------------


def test_mcnemar_reference(spark):
    from aws_datalake_spark.operators.stats import mcnemar_test

    rows = ([(1, 1)] * 20 + [(0, 0)] * 30 + [(1, 0)] * 12 + [(0, 1)] * 4)
    df = spark.createDataFrame(rows, "before_f int, after_f int")
    r = mcnemar_test(df, "before_f", "after_f").collect()[0]
    assert (r.n, r.n_both, r.n_neither, r.n_flip_10, r.n_flip_01) == (
        66, 20, 30, 12, 4)
    assert r.chi2 == pytest.approx((12 - 4) ** 2 / 16, abs=1e-12)


def test_mcnemar_no_discordant_is_null(spark):
    from aws_datalake_spark.operators.stats import mcnemar_test

    df = spark.createDataFrame([(1, 1), (0, 0)], "before_f int, after_f int")
    assert mcnemar_test(df, "before_f", "after_f").collect()[0].chi2 is None


def test_cohens_kappa_reference(spark):
    """Textbook 2x2: a=20 agree-yes, d=15 agree-no, b=5, c=10 —
    kappa = (po-pe)/(1-pe)."""
    from aws_datalake_spark.operators.stats import cohens_kappa

    rows = ([(1, 1)] * 20 + [(0, 0)] * 15 + [(1, 0)] * 5 + [(0, 1)] * 10)
    df = spark.createDataFrame(rows, "ra int, rb int")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    n = 50
    po = 35 / n
    pe = (25 / n) * (30 / n) + (25 / n) * (20 / n)
    assert r.n == 50 and r.n_agree == 35
    assert int(r.pe_num_s) == 25 * 30 + 25 * 20
    assert r.kappa == pytest.approx((po - pe) / (1 - pe), abs=1e-12)


def test_cohens_kappa_perfect_agreement(spark):
    from aws_datalake_spark.operators.stats import cohens_kappa

    df = spark.createDataFrame([(i % 3, i % 3) for i in range(30)],
                               "ra int, rb int")
    assert cohens_kappa(df, "ra", "rb").collect()[0].kappa == 1.0


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from aws_datalake_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, 1000 + (i * 37) % 200) for i in range(80)], "t long, x long"
    )
    a = bootstrap_mean_ci(df, "t", F.col("x"), b_reps=50).collect()[0]
    b = bootstrap_mean_ci(df, "t", F.col("x"), b_reps=50).collect()[0]
    assert a == b  # pure function of (seed, b, i)
    assert a.ci_lo_scaled <= a.mean_scaled <= a.ci_hi_scaled
    assert a.n == 80 and a.b_reps == 50
    # CI is tight around the true mean for this low-variance series
    assert (a.ci_hi_scaled - a.ci_lo_scaled) / 1e6 < 60


# --- batch 5: Shapley attribution ------------------------------------------


def test_shapley_hand_case_and_efficiency(spark):
    """2 channels: v(A)=.6, v(B)=.2, v(AB)=.8 -> phi_A=.6, phi_B=.2;
    efficiency: phi sums to v(grand coalition)."""
    from aws_datalake_spark.operators.attribution import (
        shapley_attribution,
    )

    rows = []
    uid = 0
    for chans, n, conv in ((["A"], 10, 6), (["B"], 10, 2),
                           (["A", "B"], 10, 8)):
        for i in range(n):
            for ch in chans:
                rows.append((uid, ch, 1 if i < conv else 0))
            uid += 1
    df = spark.createDataFrame(rows, "u long, ch string, conv int")
    out = {r.channel: r.phi for r in
           shapley_attribution(df, "u", "ch", "conv", ["A", "B"]).collect()}
    assert out["A"] == pytest.approx(0.6, abs=1e-12)
    assert out["B"] == pytest.approx(0.2, abs=1e-12)
    assert out["A"] + out["B"] == pytest.approx(0.8, abs=1e-12)


def test_shapley_symmetric_channels_equal_credit(spark):
    from aws_datalake_spark.operators.attribution import (
        shapley_attribution,
    )

    rows = []
    for u in range(20):
        rows.append((u, "A", 1 if u < 10 else 0))
        rows.append((u, "B", 1 if u < 10 else 0))
    df = spark.createDataFrame(rows, "u long, ch string, conv int")
    out = {r.channel: r.phi for r in
           shapley_attribution(df, "u", "ch", "conv", ["A", "B"]).collect()}
    assert out["A"] == pytest.approx(out["B"], abs=1e-12)


def test_coalition_table_weights_sum_to_one(spark):
    """For each channel the Shapley weights over subsets sum to 1."""
    from collections import defaultdict

    from aws_datalake_spark.operators.attribution import coalition_table

    sums = defaultdict(lambda: (0, 1))
    for ch, _, _, wn, wd in coalition_table(["a", "b", "c", "d"]):
        n, d = sums[ch]
        sums[ch] = (n * wd + wn * d, d * wd)
    for ch, (n, d) in sums.items():
        assert n == d, ch


# --- batch 6: RFM, Laspeyres, new-vs-returning ------------------------------


def test_rfm_codes_partition_customers(spark, sf_dir):
    from aws_datalake_spark.queries import all_queries

    out = all_queries()["q_rfm_segments"](spark, sf_dir).collect()
    total = sum(r.n_customers for r in out)
    # every ordering customer lands in exactly one cell; codes in 1-4
    for r in out:
        assert 1 <= r.r_code <= 4 and 1 <= r.f_code <= 4 \
            and 1 <= r.m_code <= 4
        assert r.avg_m_scaled > 0
    # quartile marginals are near-equal quarters of the total
    from collections import Counter
    for dim in ("r_code", "f_code", "m_code"):
        marg = Counter()
        for r in out:
            marg[getattr(r, dim)] += r.n_customers
        assert set(marg) == {1, 2, 3, 4}
        assert max(marg.values()) - min(marg.values()) <= 1, (dim, marg)
    assert total == sum(marg.values())


def test_laspeyres_base_year_is_one(spark, sf_dir):
    from aws_datalake_spark.queries import all_queries

    out = {r.year: r for r in
           all_queries()["q_laspeyres_index"](spark, sf_dir).collect()}
    assert out[1996].laspeyres == pytest.approx(1.0, abs=1e-12)
    for r in out.values():
        assert r.laspeyres > 0 and r.n_parts > 0


def test_new_vs_returning_first_month_all_new(spark, sf_dir):
    from aws_datalake_spark.queries import all_queries

    out = sorted(
        all_queries()["st_new_vs_returning"](spark, sf_dir).collect(),
        key=lambda r: r.month_idx,
    )
    first = out[0]
    assert first.new_users == first.active_users
    assert first.returning_users == 0
    for r in out:
        assert r.new_users + r.returning_users == r.active_users


# --- degenerate-input sweep over the r08 operator batch ---------------------


def test_spearman_zero_variance_is_null(spark):
    from aws_datalake_spark.operators.stats import spearman_rho

    df = spark.createDataFrame([("g", 5, i) for i in range(6)],
                               "g string, x long, y long")
    assert spearman_rho(df, F.col("x"), F.col("y"),
                        by=["g"]).collect()[0].rho is None


def test_kendall_single_observation_group_drops(spark):
    """A 1-row group has no pairs: since ADVICE r08 it SURFACES as
    (n=1, 0, 0, NULL tau_b) — tau undefined but the group visible —
    instead of vanishing through the old inner join."""
    from aws_datalake_spark.operators.stats import kendall_tau_b

    rows = [("solo", 1, 1)] + [("ok", v, v) for v in range(4)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in
           kendall_tau_b(df, "g", F.col("x"), F.col("y")).collect()}
    assert set(out) == {"ok", "solo"}
    assert out["solo"].n == 1 and out["solo"].tau_b is None
    assert out["ok"].tau_b == pytest.approx(1.0, abs=1e-12)


def test_cramers_v_single_category_null_v(spark):
    from aws_datalake_spark.operators.stats import cramers_v

    df = spark.createDataFrame([("only", b) for b in "xyzxyz"],
                               "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.n_rows == 1 and r.v is None and r.chi2 == 0.0


def test_autocorr_series_shorter_than_lag(spark):
    from aws_datalake_spark.operators.stats import autocorrelation

    df = spark.createDataFrame([(0, 5), (1, 9)], "t long, x long")
    out = {r.lag: r.acf
           for r in autocorrelation(df, "t", F.col("x"), max_lag=3).collect()}
    assert out[1] is not None  # one lag-1 pair exists
    assert out[2] is None and out[3] is None  # no pairs -> NULL


def test_lorenz_all_zero_values(spark):
    """Total value 0: shares are NULL (0/0), counts still populate."""
    from aws_datalake_spark.operators.order_stats import lorenz_curve

    df = spark.createDataFrame([(i, 0) for i in range(20)],
                               "id long, v long")
    out = lorenz_curve(df, F.col("v")).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_cum == 20 and r.value_cum == 0
        assert r.share is None or math.isnan(r.share)


def test_bootstrap_empty_series_returns_empty(spark):
    from aws_datalake_spark.operators.stats import bootstrap_mean_ci

    df = spark.createDataFrame([], "t long, x long")
    assert bootstrap_mean_ci(df, "t", F.col("x"), b_reps=5).collect() == []


def test_ewma_empty_series(spark):
    from aws_datalake_spark.operators.stats import ewma_truncated

    df = spark.createDataFrame([], "t long, x long")
    assert ewma_truncated(df, "t", F.col("x")).collect() == []


def test_freshness_single_group(spark):
    from datetime import datetime as dt

    from aws_datalake_spark.operators.dq import freshness_audit

    df = spark.createDataFrame([("s", dt(2024, 1, 1))],
                               "src string, ts timestamp")
    r = freshness_audit(df, "ts", "src").collect()[0]
    assert r.lag_seconds == 0 and r.fresh


def test_assortativity_single_edge(spark):
    """One edge: both endpoints degree 1 -> zero variance -> NULL."""
    from aws_datalake_spark.operators.graph import degree_assortativity

    df = spark.createDataFrame([(1, 2)], "s long, d long")
    r = degree_assortativity(df).collect()[0]
    assert r.m_edges == 1 and r.r is None


def test_common_neighbors_empty_graph(spark):
    from aws_datalake_spark.operators.graph import common_neighbor_candidates

    df = spark.createDataFrame([], "s long, d long")
    assert common_neighbor_candidates(df).collect() == []


def test_pr_curve_all_one_class(spark):
    """All positives: precision 1 everywhere, recall reaches 1."""
    from aws_datalake_spark.operators.order_stats import (
        precision_recall_at_deciles,
    )

    df = spark.createDataFrame([(i % 7, 1) for i in range(70)],
                               "score long, pos int")
    out = {r.decile: r for r in
           precision_recall_at_deciles(df, "score", "pos").collect()}
    assert all(r.precision == 1.0 for r in out.values())
    assert out[10].recall == 1.0


def test_shapley_no_conversions_all_zero(spark):
    from aws_datalake_spark.operators.attribution import (
        shapley_attribution,
    )

    rows = [(u, ch, 0) for u in range(10) for ch in ("A", "B")]
    df = spark.createDataFrame(rows, "u long, ch string, conv int")
    out = shapley_attribution(df, "u", "ch", "conv", ["A", "B"]).collect()
    assert all(r.phi == 0.0 for r in out)


def test_mcnemar_empty_input(spark):
    from aws_datalake_spark.operators.stats import mcnemar_test

    df = spark.createDataFrame([], "before_f int, after_f int")
    r = mcnemar_test(df, "before_f", "after_f").collect()[0]
    assert r.n == 0 and r.chi2 is None


def test_kappa_one_rater_constant(spark):
    """Rater B constant: pe = n*n... kappa degenerates to NULL or a
    defined value; assert no crash and n_agree consistent."""
    from aws_datalake_spark.operators.stats import cohens_kappa

    rows = [(i % 2, 1) for i in range(10)]
    df = spark.createDataFrame(rows, "ra int, rb int")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert r.n == 10 and r.n_agree == 5
    # pe_num = n * (marginal product) = 10*5... den = 100-50=50 > 0
    assert r.kappa == pytest.approx((10 * 5 - 50) / (100 - 50), abs=1e-12)


def test_two_proportion_missing_group_nulls(spark):
    from aws_datalake_spark.operators.stats import two_proportion_ztest

    df = spark.createDataFrame([("A", 1), ("A", 0)], "g string, s int")
    r = two_proportion_ztest(df, "g", "s", "A", "B").collect()[0]
    assert r.n_b == 0 and r.p_b is None and r.z is None


def test_pr_curve_no_positives_null_recall(spark):
    from aws_datalake_spark.operators.order_stats import (
        precision_recall_at_deciles,
    )

    df = spark.createDataFrame([(i % 5, 0) for i in range(50)],
                               "score long, pos int")
    out = precision_recall_at_deciles(df, "score", "pos").collect()
    assert all(r.recall is None for r in out)
    assert all(r.precision == 0.0 for r in out)


def test_granger_y_is_lagged_x_high_f(spark):
    """y_t = x_t exactly: y_{t-1} then equals x_{t-1}... make y the
    LEAD of x so y_{t-1} = x_t — a perfect predictor, F explodes;
    and an independent-noise y gives a small F."""
    import numpy as np

    from aws_datalake_spark.operators.stats import granger_f

    rng = np.random.RandomState(3)
    x = np.cumsum(rng.randint(-9, 10, size=120)) + 500
    # predictive y: y_t = x_{t+1} + noise (lag-1 of y nearly equals
    # today's x; exact equality would drive RSS_U to float-zero and
    # the singular-fit guard correctly NULLs F)
    y_pred = np.append(x[1:], x[-1]) + rng.randint(-2, 3, size=120)
    rows = [(i, int(x[i]), int(y_pred[i])) for i in range(120)]
    df = spark.createDataFrame(rows, "t long, x long, y long")
    strong = granger_f(df, "t", F.col("x"), F.col("y")).collect()[0]
    assert strong.f_stat is not None and strong.f_stat > 100.0
    assert strong.rss_unrestricted < strong.rss_restricted

    y_noise = rng.randint(0, 100, size=120)
    rows2 = [(i, int(x[i]), int(y_noise[i])) for i in range(120)]
    df2 = spark.createDataFrame(rows2, "t long, x long, y long")
    weak = granger_f(df2, "t", F.col("x"), F.col("y")).collect()[0]
    assert weak.f_stat is not None and weak.f_stat < strong.f_stat


def test_granger_matches_numpy_ols(spark):
    """F against a direct numpy lstsq computation."""
    import numpy as np

    from aws_datalake_spark.operators.stats import granger_f

    rng = np.random.RandomState(11)
    x = np.cumsum(rng.randint(-5, 6, size=80)) + 200
    y = np.cumsum(rng.randint(-3, 4, size=80)) + 50
    df = spark.createDataFrame(
        [(i, int(x[i]), int(y[i])) for i in range(80)],
        "t long, x long, y long",
    )
    got = granger_f(df, "t", F.col("x"), F.col("y")).collect()[0]
    z, w, v = x[1:].astype(float), x[:-1].astype(float), y[:-1].astype(float)
    n = len(z)

    def rss(cols):
        A = np.column_stack([np.ones(n)] + cols)
        beta, *_ = np.linalg.lstsq(A, z, rcond=None)
        r = z - A @ beta
        return float(r @ r)

    rss_r, rss_u = rss([w]), rss([w, v])
    want_f = (rss_r - rss_u) * (n - 3) / rss_u
    assert got.n == n
    assert got.f_stat == pytest.approx(want_f, rel=1e-6)
    # rss columns are N-scaled: compare ratios instead of magnitudes
    assert got.rss_restricted / got.rss_unrestricted == pytest.approx(
        rss_r / rss_u, rel=1e-9
    )
