"""Regression tests for the four ADVICE-r07 findings.

1. mann_kendall: Theil–Sen pairwise slope Δx·scale must not wrap in
   int64 — the product now runs in DECIMAL(38,0) before the integral
   divide.
2. hits_fixed_point: iterations < 1 raises instead of crashing with
   AttributeError on the unset auth frame.
3. ks_two_sample / tvd_drift / t_closeness_audit: num/den certificate
   columns are exact decimal-integer STRINGS (a long cast wraps to
   NULL past 2^63 in non-ANSI mode).
4. ktruss_peel: canonicalizes edges on entry — reversed / duplicated /
   self-loop edges no longer silently peel real truss edges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mann_kendall_slope_survives_int64_wrap(spark):
    """Δx = 10^13 with slope_scale 10^6: the int64 product 10^19
    wraps (2^63 ≈ 9.22e18) but the decimal product is exact —
    sen_slope must be Δx/Δt = 10^12 exactly."""
    from aws_datalake_spark.operators.stats import mann_kendall

    big = 10**13
    rows = [("g", 0, 0), ("g", 10, big)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = mann_kendall(df, "g", "t", F.col("x")).collect()[0]
    assert r.sen_slope == pytest.approx(big / 10, rel=1e-12)


def test_mann_kendall_small_values_unchanged(spark):
    """The decimal path must not perturb ordinary magnitudes."""
    from aws_datalake_spark.operators.stats import mann_kendall

    rows = [("g", t, 100 + 7 * t) for t in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = mann_kendall(df, "g", "t", F.col("x")).collect()[0]
    assert r.sen_slope == pytest.approx(7.0, abs=1e-6)
    assert r.s == 15  # all 15 pairs increasing


def test_hits_zero_iterations_raises(spark):
    from aws_datalake_spark.operators.graph import hits_fixed_point

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits_fixed_point(e, iterations=0)


def test_certificates_are_exact_integer_strings(spark):
    from aws_datalake_spark.operators.dq import t_closeness_audit
    from aws_datalake_spark.operators.stats import ks_two_sample, tvd_drift

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    ks = ks_two_sample(df, "g", F.col("v"), "a", "b").collect()[0]
    assert isinstance(ks.d_num, str) and ks.d_num.isdigit()
    assert int(ks.d_den) == 9
    assert int(ks.d_num) / int(ks.d_den) == pytest.approx(ks.d, abs=1e-6)

    tv = tvd_drift(df.selectExpr("g", "CAST(v AS STRING) AS c"), "g", "c")
    for r in tv.collect():
        assert isinstance(r.tvd_num, str) and isinstance(r.tvd_den, str)
        assert int(r.tvd_num) / int(r.tvd_den) == pytest.approx(r.tvd, abs=1e-6)

    tc = t_closeness_audit(
        df.selectExpr("g AS q", "v AS sens"), ["q"], "sens"
    ).collect()
    for r in tc:
        assert isinstance(r.emd_num, str) and isinstance(r.emd_den, str)
        assert int(r.emd_num) / int(r.emd_den) == pytest.approx(r.emd, abs=1e-6)


def _k4_clique_edges():
    """K4 on nodes 1..4 — every edge is in 2 triangles, so the whole
    clique survives k=4 (support >= 2)."""
    return [(s, d) for s in range(1, 5) for d in range(s + 1, 5)]


def test_ktruss_canonicalizes_reversed_and_duplicate_edges(spark):
    from aws_datalake_spark.operators.graph import ktruss_peel

    clean = spark.createDataFrame(_k4_clique_edges(), "s long, d long")
    messy_rows = (
        [(d, s) for s, d in _k4_clique_edges()]  # all reversed
        + _k4_clique_edges()  # plus duplicates
        + [(2, 2)]  # and a self-loop
    )
    messy = spark.createDataFrame(messy_rows, "s long, d long")
    want = sorted(
        (r.s, r.d, r.support) for r in ktruss_peel(clean, k=4).collect()
    )
    got = sorted(
        (r.s, r.d, r.support) for r in ktruss_peel(messy, k=4).collect()
    )
    assert want == got
    assert len(got) == 6 and all(sup == 2 for _, _, sup in got)
