"""Unit tests for the round-5-session batch-2 operators: triangle
counting, sequence n-gram mining, exact-arithmetic correlation, and
weighted exact quantiles."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "s long, d long"
    )


def test_triangle_counts_k4(spark):
    """K4: every vertex sits in C(3,2)=3 triangles, degree 3."""
    from aws_datalake_spark.operators.graph import triangle_counts

    e = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {r.node: (r.degree, r.triangles) for r in triangle_counts(e).collect()}
    assert got == {n: (3, 3) for n in range(4)}


def test_triangle_counts_mixed_graph(spark):
    """One triangle (1,2,3) + pendant vertex 4 + isolated edge (5,6):
    pendant and isolated-edge nodes report degree but 0 triangles."""
    from aws_datalake_spark.operators.graph import triangle_counts

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (5, 6)])
    got = {r.node: (r.degree, r.triangles) for r in triangle_counts(e).collect()}
    assert got == {
        1: (2, 1), 2: (2, 1), 3: (3, 1), 4: (1, 0), 5: (1, 0), 6: (1, 0),
    }


def test_triangle_counts_matches_bruteforce(spark):
    """Random G(n, p): degree-oriented count == brute-force count,
    per node."""
    from aws_datalake_spark.operators.graph import triangle_counts

    rng = random.Random(7)
    n = 30
    pairs = [
        (a, b) for a in range(n) for b in range(a + 1, n) if rng.random() < 0.25
    ]
    adj = {v: set() for v in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v in range(n):
        nb = sorted(adj[v])
        tri = sum(
            1
            for i in range(len(nb))
            for j in range(i + 1, len(nb))
            if nb[j] in adj[nb[i]]
        )
        if nb:
            want[v] = (len(nb), tri)
    got = {
        r.node: (r.degree, r.triangles)
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }
    assert got == want


def test_cooccurrence_edges_support(spark):
    """Edge weight = number of shared contexts; min_support prunes."""
    from aws_datalake_spark.operators.graph import cooccurrence_edges

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"), (3, "b")],
        "ctx long, item string",
    )
    got = {
        (r.s, r.d): r.w
        for r in cooccurrence_edges(df, "ctx", "item").collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    pruned = {
        (r.s, r.d): r.w
        for r in cooccurrence_edges(df, "ctx", "item", min_support=2).collect()
    }
    assert pruned == {("a", "b"): 3}


# ---------------------------------------------------------------------------
# sequence n-grams
# ---------------------------------------------------------------------------


def _seq_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, t, dt.datetime(2024, 1, 1, 0, 0, i))
            for i, (u, t) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )


def test_sequence_ngrams_support_and_occurrences(spark):
    from aws_datalake_spark.operators.sessions import sequence_ngrams

    # user 1: a b a b  → bigrams ab, ba, ab (ab occurs 2x, 1 user)
    # user 2: a b      → bigram ab
    ev = _seq_events(
        spark, [(1, "a"), (1, "b"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    )
    got = {
        (r.step_1, r.step_2): (r.support, r.occurrences)
        for r in sequence_ngrams(ev, n=2).collect()
    }
    assert got == {("a", "b"): (2, 3), ("b", "a"): (1, 1)}


def test_sequence_ngrams_min_support_and_no_cross_user(spark):
    from aws_datalake_spark.operators.sessions import sequence_ngrams

    # the b→c transition would only exist across the user boundary
    ev = _seq_events(spark, [(1, "a"), (1, "b"), (2, "c"), (2, "d")])
    got = {
        (r.step_1, r.step_2)
        for r in sequence_ngrams(ev, n=2).collect()
    }
    assert got == {("a", "b"), ("c", "d")}
    assert sequence_ngrams(ev, n=2, min_support=2).count() == 0


# ---------------------------------------------------------------------------
# exact correlation
# ---------------------------------------------------------------------------


def test_exact_corr_matches_closed_form(spark):
    from aws_datalake_spark.operators.stats import exact_corr

    rows = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 6), (6, 20)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = exact_corr(df, F.col("x"), F.col("y")).collect()[0]
    n = len(rows)
    sx = sum(x for x, _ in rows)
    sy = sum(y for _, y in rows)
    sxx = sum(x * x for x, _ in rows)
    syy = sum(y * y for _, y in rows)
    sxy = sum(x * y for x, y in rows)
    want = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert got["n"] == n
    assert got["corr"] == pytest.approx(want, rel=1e-12)


def test_exact_corr_perfect_and_degenerate(spark):
    from aws_datalake_spark.operators.stats import exact_corr

    df = spark.createDataFrame(
        [("p", 1, 2), ("p", 2, 4), ("p", 3, 6), ("z", 5, 1), ("z", 5, 9)],
        "g string, x long, y long",
    )
    got = {
        r.g: r.corr
        for r in exact_corr(df, F.col("x"), F.col("y"), by=["g"]).collect()
    }
    assert got["p"] == pytest.approx(1.0)
    assert got["z"] is None  # zero variance in x → NULL, not NaN


def test_exact_corr_sum_of_squares_past_int64(spark):
    """y ~ 3e9 per row, 2k rows → Σy² ≈ 1.8e22 — far past int64; the
    DECIMAL(38,0) accumulation must stay exact: corr of an exactly
    linear relation lands within a couple of ulps of 1.0 (the only
    inexact steps are the final cast/sqrt/divide — an int64 overflow
    would instead produce NULL or garbage)."""
    from aws_datalake_spark.operators.stats import exact_corr

    df = spark.range(2000).select(
        F.col("id").alias("x"), (F.col("id") * 1_500_000 + 3).alias("y")
    )
    got = exact_corr(df, F.col("x"), F.col("y")).collect()[0]
    assert got["corr"] is not None
    assert abs(got["corr"] - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# weighted exact quantile
# ---------------------------------------------------------------------------


def _wq_brute(pairs, num, den):
    total = sum(w for _, w in pairs)
    target = -((-total * num) // den) or 1
    acc = 0
    for v, w in sorted(pairs):
        acc += w
        if acc >= target:
            return v
    raise AssertionError("unreachable")


def test_weighted_quantile_matches_bruteforce(spark):
    from aws_datalake_spark.operators.order_stats import exact_weighted_quantile

    rng = random.Random(3)
    pairs = [(rng.randint(0, 1000), rng.randint(1, 50)) for _ in range(500)]
    df = spark.createDataFrame(pairs, "v long, w long")
    for num, den in [(1, 2), (9, 10), (1, 4), (0, 1), (1, 1)]:
        got = exact_weighted_quantile(
            df, "v", "w", num, den, direct_threshold=64
        )
        assert got == _wq_brute(pairs, num, den), (num, den)


def test_weighted_quantile_narrowing_crosses_rounds(spark):
    """Tiny direct_threshold forces several histogram rounds; the
    answer must not drift."""
    from aws_datalake_spark.operators.order_stats import exact_weighted_quantile

    pairs = [(i, 1 + (i % 7)) for i in range(2000)]
    df = spark.createDataFrame(pairs, "v long, w long")
    got = exact_weighted_quantile(
        df, "v", "w", 1, 2, n_bins=8, direct_threshold=16
    )
    assert got == _wq_brute(pairs, 1, 2)


def test_weighted_quantile_validation(spark):
    from aws_datalake_spark.operators.order_stats import exact_weighted_quantile

    df = spark.createDataFrame([(1, 1)], "v long, w long")
    with pytest.raises(ValueError, match="q_num"):
        exact_weighted_quantile(df, "v", "w", 3, 2)
    with pytest.raises(ValueError, match="empty"):
        exact_weighted_quantile(df.where(F.lit(False)), "v", "w", 1, 2)


def test_weighted_quantile_by_group_matches_bruteforce(spark):
    from aws_datalake_spark.operators.order_stats import (
        exact_weighted_quantile_by_group,
    )

    rng = random.Random(11)
    rows = [
        (g, rng.randint(0, 500), rng.randint(1, 9))
        for g in ("a", "b", "c")
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r.g: r.quantile
        for r in exact_weighted_quantile_by_group(
            df, "g", "v", "w", 1, 2, n_bins=8, direct_threshold=32
        ).collect()
    }
    for g in ("a", "b", "c"):
        pairs = [(v, w) for gg, v, w in rows if gg == g]
        assert got[g] == _wq_brute(pairs, 1, 2), g


def test_weighted_quantile_by_group_small_groups_skip_narrowing(spark):
    from aws_datalake_spark.operators.order_stats import (
        exact_weighted_quantile_by_group,
    )

    rows = [("a", 1, 1), ("a", 2, 1), ("a", 3, 1), ("b", 10, 5), ("b", 20, 1)]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r.g: r.quantile
        for r in exact_weighted_quantile_by_group(df, "g", "v", "w", 1, 2).collect()
    }
    # a: W=3, target 2 → v=2 ; b: W=6, target 3 → v=10
    assert got == {"a": 2, "b": 10}


# ---------------------------------------------------------------------------
# span excision + phrase search
# ---------------------------------------------------------------------------


def test_excise_contaminated_spans_exact_tokens(spark):
    """The matched 3-gram removes exactly its covered tokens;
    overlapping matches union their spans; clean docs pass through
    re-joined; fully-contaminated docs come back empty, not NULL."""
    from aws_datalake_spark.operators.decontam import excise_contaminated_spans

    corpus = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # eval gram 'b c d' → remove idx 1-3
            (2, "x y z"),              # fully contaminated by 'x y z'
            (3, "p q r s"),            # clean
            (4, "a b c d c d e f"),    # 'b c d' at 1 and 'c d e' ... only seeded grams
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "b c d"), (101, "x y z")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in excise_contaminated_spans(corpus, eval_df).collect()
    }
    assert got[1] == (6, 3, "a e f")
    assert got[2] == (3, 3, "")
    assert got[3] == (4, 0, "p q r s")
    # doc 4: 'b c d' matches at idx 1 only → remove 1,2,3
    assert got[4] == (8, 3, "a c d e f")


def test_phrase_occurrences_adjacency(spark):
    """Matches require exact adjacency; overlapping occurrences and
    repeated words are all found."""
    from aws_datalake_spark.operators.text import (
        phrase_occurrences,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # 'a b a' at 0 and 2 (overlap)
            (2, "a b c"),       # no 'a b a'
            (3, "b a b a x"),   # at 1
        ],
        "doc_id long, text string",
    )
    phrase = spark.createDataFrame([("a", "b", "a")], "w_1 string, w_2 string, w_3 string")
    got = sorted(
        (r.doc_id, r.pos)
        for r in phrase_occurrences(positional_postings(docs), phrase).collect()
    )
    assert got == [(1, 0), (1, 2), (3, 1)]


# ---------------------------------------------------------------------------
# DQ: functional dependency + referential integrity
# ---------------------------------------------------------------------------


def test_fd_violations_finds_only_conflicting_keys(spark):
    from aws_datalake_spark.operators.dq import fd_violations

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "b"), (3, None), (3, "c"),
         (4, None), (4, None)],
        "k long, v string",
    )
    got = {
        r.k: (r.n_rhs_values, r.n_rows)
        for r in fd_violations(df, ["k"], "v").collect()
    }
    # key 1: one distinct value (duplicate rows are fine)
    # key 3: NULL counts as its own rhs value (ADVICE r05 #5) — a key
    #        mapping to {NULL, 'c'} violates the dependency
    # key 4: all-NULL is still a single value — not a violation
    assert got == {2: (2, 2), 3: (2, 2)}


def test_fd_violations_composite_lhs(spark):
    from aws_datalake_spark.operators.dq import fd_violations

    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (1, 2, "z")], "a long, b long, v string"
    )
    got = [(r.a, r.b) for r in fd_violations(df, ["a", "b"], "v").collect()]
    assert got == [(1, 2)]


def test_ri_violations_orphans_and_null_exemption(spark):
    from aws_datalake_spark.operators.dq import ri_violations

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = {r.fk: r.n_orphans for r in ri_violations(child, parent, "fk", "pk").collect()}
    assert got == {9: 3}  # NULL fk exempt; matched keys absent


# ---------------------------------------------------------------------------
# winnowing match stage
# ---------------------------------------------------------------------------


def test_winnow_matches_finds_copies_and_caps_hot_fps(spark):
    from aws_datalake_spark.operators.dedup import winnow_matches

    # 1 & 2 share a long run; 3 is unrelated; 4..9 all share one
    # boilerplate run whose fingerprints exceed max_df and must not
    # mint pairs on their own
    run = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "one two three four five six seven eight"
    rows = [
        (1, run + " tail1 x y z"),
        (2, run + " tail2 p q r"),
        (3, "completely different words entirely here now okay fine"),
    ] + [(10 + i, boiler + f" unique{i} a b c") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in winnow_matches(df, min_shared=2, max_df=3).collect()
    }
    assert (1, 2) in got
    # boilerplate-only pairs are suppressed by the max_df cap
    assert not any(a >= 10 and b >= 10 for a, b in got)


def test_exact_corr_matrix_all_pairs_single_scan(spark):
    """Matrix values match pairwise exact_corr; the whole matrix is
    one aggregate (plan has exactly one pair of hash aggregates)."""
    from aws_datalake_spark.operators.stats import exact_corr, exact_corr_matrix

    df = spark.createDataFrame(
        [(1, 2, 30), (2, 1, 10), (3, 4, 20), (4, 3, 50), (5, 6, 40)],
        "a long, b long, c long",
    )
    cols = {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    got = {
        (r.col_x, r.col_y): r.corr
        for r in exact_corr_matrix(df, cols).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (x, y), v in got.items():
        single = exact_corr(df, F.col(x), F.col(y)).collect()[0]["corr"]
        assert v == single, (x, y)
    plan = exact_corr_matrix(df, cols)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one partial->final agg exchange


# ---------------------------------------------------------------------------
# 2-D skyline
# ---------------------------------------------------------------------------


def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in points
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_2d_matches_bruteforce(spark):
    from aws_datalake_spark.operators.skyline import skyline_2d

    rng = random.Random(13)
    pts = [(rng.randint(0, 100), rng.randint(0, 100)) for _ in range(300)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(df, F.col("x"), F.col("y"), n_buckets=7).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_2d_ties_and_duplicates(spark):
    """Equal points are mutually non-dominating (both survive);
    a point equal in one dim and worse in the other is dominated."""
    from aws_datalake_spark.operators.skyline import skyline_2d

    pts = [(5, 5), (5, 5), (5, 4), (4, 5), (6, 1), (1, 6)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted(
        (r.x, r.y)
        for r in skyline_2d(df, F.col("x"), F.col("y"), n_buckets=2).collect()
    )
    assert got == [(1, 6), (5, 5), (5, 5), (6, 1)]


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_corr_matrix_underscore_names_no_alias_collision(spark):
    """cols {'a','b_c'} and {'a_b','c'} would both alias __x_a_b_c
    under name-based aliases; positional aliases must disambiguate."""
    from aws_datalake_spark.operators.stats import exact_corr_matrix

    df = spark.createDataFrame(
        [(1, 2, 3, 4), (2, 4, 5, 9), (3, 5, 8, 1)],
        "a long, b_c long, a_b long, c long",
    )
    cols = {n: F.col(n) for n in ("a", "b_c", "a_b", "c")}
    got = exact_corr_matrix(df, cols).collect()
    assert len(got) == 6
    assert all(r["corr"] is not None for r in got)


def test_weighted_quantile_by_group_null_key_raises(spark):
    from aws_datalake_spark.operators.order_stats import (
        exact_weighted_quantile_by_group,
    )

    df = spark.createDataFrame(
        [("a", 1, 1), (None, 2, 1)], "g string, v long, w long"
    )
    with pytest.raises(ValueError, match="NULL group key"):
        exact_weighted_quantile_by_group(df, "g", "v", "w", 1, 2)


def test_quantile_by_group_date_typed_keys(spark):
    """Non-str/non-long group keys (dates) must round-trip through
    the broadcast rank table."""
    import datetime as _dt

    from aws_datalake_spark.operators.order_stats import exact_quantile_by_group

    d1, d2 = _dt.date(2024, 1, 1), _dt.date(2024, 1, 2)
    df = spark.createDataFrame(
        [(d1, 1), (d1, 5), (d1, 9), (d2, 4)], "g date, v long"
    )
    got = {
        r.g: r.quantile
        for r in exact_quantile_by_group(df, "g", "v", 0.5).collect()
    }
    assert got == {d1: 5, d2: 4}


def test_phrase_occurrences_multi_row_phrase_raises(spark):
    from aws_datalake_spark.operators.text import (
        phrase_occurrences,
        positional_postings,
    )

    docs = spark.createDataFrame([(1, "a y c")], "doc_id long, text string")
    phrase = spark.createDataFrame(
        [("a", "b", "c"), ("x", "y", "z")], "w_1 string, w_2 string, w_3 string"
    )
    with pytest.raises(ValueError, match="exactly one row"):
        phrase_occurrences(positional_postings(docs), phrase)
