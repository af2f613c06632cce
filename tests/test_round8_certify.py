"""Round-8 certification batch: the last two rows-only queries gain
exact oracles (VERDICT r07 item 2).

1. Fixed-point integer logistic twin
   (operators/classifier.py:train_quality_classifier_exact): shared
   piecewise-literal sigmoid, trunc-toward-zero divides, exact decimal
   gradient sums — both engines compute identical integers for all 10
   iterations.
2. Bounded-error HLL certificate (queries/sketches.py:
   st_distinct_users_hll): |est − exact| ≤ max(2, 4·rsd·exact) as a
   hash-checkable boolean column.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _py_sigmoid_case(zq: int) -> int:
    """Reference evaluation of the shared piecewise table in pure
    Python integers (trunc division via int arithmetic on non-negative
    operands inside an interval)."""
    from aws_datalake_spark.operators.classifier import _sigmoid_knots

    knots = _sigmoid_knots()
    if zq <= knots[0][0]:
        return knots[0][1]
    for (x0, v0), (x1, v1) in zip(knots, knots[1:]):
        if zq < x1:
            return v0 + ((zq - x0) * (v1 - v0)) // (x1 - x0)
    return knots[-1][1]


def test_sigmoid_case_matches_python_and_engines(spark):
    """The CASE expression evaluates to the same integer in Spark and
    DuckDB as the pure-Python reference, including the clamps, knot
    boundaries, and negative zq (trunc-div parity)."""
    import duckdb

    from aws_datalake_spark.operators.classifier import sigmoid_case_sql

    zs = [
        -9_000_000, -8_000_000, -7_999_999, -1_234_567, -250_000, -1,
        0, 1, 124_999, 125_000, 777_777, 7_999_999, 8_000_000, 9_999_999,
    ]
    sdf = spark.createDataFrame([(z,) for z in zs], "zq long").select(
        "zq", F.expr(sigmoid_case_sql("zq", "div")).alias("s")
    )
    got_spark = {r.zq: r.s for r in sdf.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE z (zq BIGINT)")
    con.executemany("INSERT INTO z VALUES (?)", [(z,) for z in zs])
    got_duck = dict(
        con.execute(
            f"SELECT zq, {sigmoid_case_sql('zq', '//')} FROM z"
        ).fetchall()
    )
    for z in zs:
        want = _py_sigmoid_case(z)
        assert got_spark[z] == want, (z, got_spark[z], want)
        assert got_duck[z] == want, (z, got_duck[z], want)


def test_sigmoid_case_monotone_and_accurate():
    """Table values are monotone nondecreasing and within 2e-3 of the
    true sigmoid across the clamp range (piecewise-linear error bound
    for step 0.25 is (step/4)^2/2 ≈ 2e-3)."""
    prev = -1
    for z in range(-8_500_000, 8_500_001, 61_003):
        s = _py_sigmoid_case(z)
        assert s >= prev
        prev = s
        true = 1.0 / (1.0 + math.exp(-z / 1e6))
        assert abs(s / 1e6 - true) < 2e-3


@pytest.mark.slow
def test_exact_classifier_separates_and_is_deterministic(spark):
    from aws_datalake_spark.operators.classifier import (
        score_quality_exact,
        train_quality_classifier_exact,
    )

    rows = [(i, "good clean prose text here " * 3, 1) for i in range(40)]
    rows += [(i, "spam junk noise garbage words " * 3, 0)
             for i in range(40, 80)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    w = train_quality_classifier_exact(df, iters=10, n_buckets=64)
    assert all(isinstance(x, int) for x in w)
    assert w == train_quality_classifier_exact(df, iters=10, n_buckets=64)
    scored = {r.doc_id: r.q_score_scaled
              for r in score_quality_exact(df, w).collect()}
    pos = [scored[i] for i in range(40)]
    neg = [scored[i] for i in range(40, 80)]
    assert min(pos) > max(neg)
    assert all(0 <= s <= 10**6 for s in scored.values())


def test_exact_classifier_agrees_with_float_ranking(spark):
    """The integer twin is the SAME algorithm at fixed point — its
    score ordering must agree with the float trainer's on a separable
    corpus (identical featurization, lr differs only in quantization)."""
    from aws_datalake_spark.operators.classifier import (
        score_quality,
        score_quality_exact,
        train_quality_classifier,
        train_quality_classifier_exact,
    )

    rows = [(i, "alpha beta gamma delta " * 2, 1) for i in range(30)]
    rows += [(i, "omega psi chi phi " * 2, 0) for i in range(30, 60)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    wf = train_quality_classifier(df, iters=10, lr=0.5, l2=0.0,
                                  n_buckets=64)
    wi = train_quality_classifier_exact(df, iters=10, n_buckets=64)
    sf_ = {r.doc_id: r.quality_score
           for r in score_quality(df, wf, n_buckets=64).collect()}
    si = {r.doc_id: r.q_score_scaled
          for r in score_quality_exact(df, wi).collect()}
    # both must separate the classes the same way
    assert min(si[i] for i in range(30)) > max(si[i] for i in range(30, 60))
    assert min(sf_[i] for i in range(30)) > max(sf_[i] for i in range(30, 60))


def test_hll_daily_estimate_within_bound(spark, sf_dir):
    """The registered query's certificate must hold: every day's HLL
    estimate within 4·rsd of the exact distinct."""
    from aws_datalake_spark.queries import all_queries

    out = all_queries()["st_distinct_users_hll"](spark, sf_dir).collect()
    assert out and all(r.within_bound for r in out)
    assert all(r.n_exact > 0 for r in out)
