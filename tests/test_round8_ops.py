"""Round-7-session operator tests: k-anonymity, histogram matching,
contamination coverage, grouped mode, quality representatives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_k_anonymity_flags_small_groups(spark):
    from aws_datalake_spark.operators.dq import k_anonymity_audit

    rows = [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", 1)]
    df = spark.createDataFrame(rows, "seg string, nat int")
    got = {(r.seg, r.nat): (r.n, r.violates)
           for r in k_anonymity_audit(df, ["seg", "nat"], k=3).collect()}
    assert got == {("a", 1): (5, False), ("a", 2): (2, True),
                   ("b", 1): (1, True)}
    with pytest.raises(ValueError):
        k_anonymity_audit(df, [], k=3)


def test_histogram_match_exact_thresholds_and_feasibility(spark):
    """Kept counts must respect the integer-DIV feasibility math:
    a_b = M*w_b DIV W with M = min_b(n_b*W DIV w_b); every kept count
    is <= n_before and the scarcest bin binds."""
    from aws_datalake_spark.operators.sampling import histogram_match

    rows = (
        [(i, "en") for i in range(200)]
        + [(i + 1000, "zh") for i in range(50)]
        + [(i + 2000, "fr") for i in range(30)]
        + [(i + 3000, "xx") for i in range(40)]  # not in target: dropped
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    target = {"en": 4, "zh": 3, "fr": 3}
    sampled, report = histogram_match(df, "lang", target)
    rep = {r.lang: r for r in report.collect()}
    assert set(rep) == {"en", "zh", "fr"}
    # M = min(200*10//4, 50*10//3, 30*10//3) = min(500,166,100) = 100
    assert rep["en"].target_rows == 100 * 4 // 10
    assert rep["zh"].target_rows == 100 * 3 // 10
    assert rep["fr"].target_rows == 100 * 3 // 10
    for r in rep.values():
        assert 0 <= r.n_kept <= r.n_before
    got = sampled.groupBy("lang").count().collect()
    assert {r.lang for r in got} <= {"en", "zh", "fr"}
    # deterministic: same seed -> same sample
    s2, _ = histogram_match(df, "lang", target)
    assert sorted(r.doc_id for r in sampled.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )
    with pytest.raises(ValueError):
        histogram_match(df, "lang", {})
    with pytest.raises(ValueError):
        histogram_match(df, "lang", {"en": 0})


def test_contamination_coverage_full_partial_none(spark):
    from aws_datalake_spark.operators.decontam import contamination_coverage

    corpus = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "a b c d"),          # fully contained: 2/2 grams hit
            (11, "a b c q r s"),      # partial: 1 of 4 grams hit
            (12, "p q r s t"),        # none
            (13, "one two"),          # too short for a 3-gram
        ],
        "eval_id long, text string",
    )
    got = {r.eval_id: (r.n_grams, r.n_hit, r.coverage)
           for r in contamination_coverage(corpus, ev, k=3).collect()}
    assert got[10] == (2, 2, 1.0)
    assert got[11] == (4, 1, 0.25)
    assert got[12] == (3, 0, 0.0)
    assert got[13] == (0, 0, 0.0)


def test_group_mode_tiebreak_lowest_value(spark):
    from aws_datalake_spark.operators.stats import group_mode

    rows = [("u1", "b"), ("u1", "b"), ("u1", "a"), ("u1", "a"),  # tie -> a
            ("u2", "z"), ("u2", "z"), ("u2", "y")]
    df = spark.createDataFrame(rows, "u string, v string")
    got = {r.u: (r.mode_value, r.mode_n) for r in group_mode(df, "u", "v").collect()}
    assert got == {"u1": ("a", 2), "u2": ("z", 2)}


def test_group_mode_window_runs_above_aggregate(spark):
    """Plan gate: the ranking window must consume the aggregated
    (group, value) frame, so HashAggregate appears below Window."""
    from aws_datalake_spark.operators.stats import group_mode

    df = spark.createDataFrame([("u", "v")], "u string, v string")
    plan = group_mode(df, "u", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.index("Window") < plan.index("HashAggregate")


def test_quality_representatives_argmax_and_counts(spark):
    from aws_datalake_spark.operators.dedup_cluster import quality_representatives

    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "node long, cluster_id long"
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.1)],
        "doc_id long, quality_score double",
    )
    got = {r.cluster_id: (r.rep_id, r.rep_score, r.n_members)
           for r in quality_representatives(scored, comp).collect()}
    # cluster 1: 0.9 tie between 2 and 3 -> lowest id 2
    assert got == {1: (2, 0.9, 3), 7: (7, 0.1, 2)}


def test_gopher_rules_flags_and_conjunction(spark):
    from aws_datalake_spark.operators.text import gopher_rules

    good = "the quick brown fox and the lazy dog walk to the old park " \
           "while the sun is high and the wind is soft today it moves"
    rows = [
        (1, good),                                  # passes everything
        (2, "short text here"),                     # fails r_words
        (3, " ".join(["spam ham"] * 30)),           # top bigram dominates
        (4, "x1 y2 z3 q4 " * 5 + "aa bb cc dd"),    # no stopwords
        (5, ""),                                    # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert got[1].passes
    assert not got[2].r_words and not got[2].passes
    assert not got[3].r_bigram and not got[3].r_trigram
    assert not got[4].r_stop
    assert got[5].n_words == 0 and not got[5].passes


def test_gopher_rules_is_mapper_only(spark):
    from aws_datalake_spark.operators.text import gopher_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: per-doc math only


def test_mixed_language_stats_dominant_and_flag(spark):
    from aws_datalake_spark.operators.text import mixed_language_stats

    rows = [
        # 3 en sentences -> dominant en, share 1.0, not mixed
        (1, "the cat is here. the dog is there. the end is near."),
        # 2 en + 2 de -> tie, 'de' < 'en' lexicographically, share 0.5 -> mixed
        (2, "the cat is old. the dog is new. der hund ist alt. die katze ist da."),
        # single sentence, no markers -> 'und', share 1.0
        (3, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_sentences, r.dominant_lang, r.n_dominant, r.mixed)
           for r in mixed_language_stats(df).collect()}
    assert got[1] == (3, "en", 3, False)
    assert got[2] == (4, "de", 2, True)
    assert got[3] == (1, "und", 1, False)
