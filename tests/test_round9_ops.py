"""Round-7-session batch-2 operator tests: association-rule mining,
exact OLS regression, CUSUM change-point, l-diversity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# association_pairs
# ---------------------------------------------------------------------------


def test_association_pairs_counts_and_metrics(spark):
    from aws_datalake_spark.operators.mining import association_pairs

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"),
        (4, "c"),  # duplicate membership must not double-count
    ]
    df = spark.createDataFrame(rows, "ctx int, item string")
    got = {(r.item_a, r.item_b): r
           for r in association_pairs(df, "ctx", "item", 2).collect()}
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    # N=4 contexts, n_a=3, n_b=3, n_ab=3
    assert (r.n_ab, r.n_a, r.n_b) == (3, 3, 3)
    assert r.support == round(3 / 4, 6)
    assert r.conf_a_b == round(3 / 3, 6)
    assert r.conf_b_a == 1.0
    assert r.lift == round(3 * 4 / 3 / 3, 6)


def test_association_pairs_canonical_order_and_support_floor(spark):
    from aws_datalake_spark.operators.mining import association_pairs

    rows = [(1, "z"), (1, "a"), (2, "z"), (2, "a"), (3, "q"), (3, "r")]
    df = spark.createDataFrame(rows, "ctx int, item string")
    out = association_pairs(df, "ctx", "item", 2).collect()
    assert [(r.item_a, r.item_b) for r in out] == [("a", "z")]
    # support floor: the (q, r) pair co-occurs once -> dropped
    out1 = association_pairs(df, "ctx", "item", 1).collect()
    assert {(r.item_a, r.item_b) for r in out1} == {("a", "z"), ("q", "r")}
    for r in out1:
        assert r.item_a < r.item_b


def test_association_pairs_item_counts_broadcast(spark):
    """The item-count and N frames must broadcast onto the pair
    frame — no extra corpus-keyed shuffle after the pair aggregate."""
    from aws_datalake_spark.operators.mining import association_pairs

    df = spark.createDataFrame(
        [(i % 7, f"it{i % 3}") for i in range(50)], "ctx int, item string"
    )
    plan = _plan(association_pairs(df, "ctx", "item", 1))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# ols_by_group
# ---------------------------------------------------------------------------


def test_ols_exact_line(spark):
    """Points exactly on y = 3x + 7 -> slope 3, intercept 7, r2 1."""
    from aws_datalake_spark.operators.stats import ols_by_group

    rows = [("g", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_by_group(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert (r.n, r.slope, r.intercept, r.r2) == (10, 3.0, 7.0, 1.0)


def test_ols_matches_numpy(spark):
    import numpy as np

    from aws_datalake_spark.operators.stats import ols_by_group

    rng = np.random.RandomState(7)
    x = np.arange(40)
    y = (5 * x + 100 + rng.randint(-20, 20, size=40)).astype(int)
    df = spark.createDataFrame(
        [("g", int(a), int(b)) for a, b in zip(x, y)],
        "g string, x long, y long",
    )
    r = ols_by_group(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    assert r.slope == pytest.approx(slope, abs=1e-6)
    assert r.intercept == pytest.approx(intercept, abs=1e-6)
    cc = np.corrcoef(x, y)[0, 1]
    assert r.r2 == pytest.approx(cc * cc, abs=1e-6)


def test_ols_degenerate_single_x(spark):
    """All x equal -> den_x = 0 -> slope/intercept/r2 NULL."""
    from aws_datalake_spark.operators.stats import ols_by_group

    df = spark.createDataFrame(
        [("g", 5, 1), ("g", 5, 2)], "g string, x long, y long"
    )
    r = ols_by_group(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert r.slope is None and r.intercept is None and r.r2 is None


def test_ols_y_scale_natural_units(spark):
    from aws_datalake_spark.operators.stats import ols_by_group

    rows = [("g", x, (3 * x + 7) * 10000) for x in range(10)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_by_group(df, ["g"], F.col("x"), F.col("y"), y_scale=4).collect()[0]
    assert (r.slope, r.intercept, r.r2) == (3.0, 7.0, 1.0)


def test_ols_single_partial_aggregate(spark):
    """One map-combinable aggregate: exactly one shuffle exchange."""
    from aws_datalake_spark.operators.stats import ols_by_group

    df = spark.createDataFrame(
        [("g", i, i * 2) for i in range(100)], "g string, x long, y long"
    )
    plan = _plan(ols_by_group(df, ["g"], F.col("x"), F.col("y")))
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# cusum_report
# ---------------------------------------------------------------------------


def test_cusum_flat_series_is_zero(spark):
    from aws_datalake_spark.operators.stats import cusum_report

    df = spark.createDataFrame(
        [("g", d, 10) for d in range(8)], "g string, day int, x long"
    )
    out = cusum_report(df, "g", "day", "x").collect()
    assert all(r.cusum_scaled == 0 and not r.alarm for r in out)


def test_cusum_matches_reference_recursion(spark):
    """The window closed form must equal the textbook
    S_t = max(0, S_{t-1} + n*x_t - T) recursion."""
    from aws_datalake_spark.operators.stats import cusum_report

    xs = [10, 12, 8, 9, 30, 35, 33, 11, 10, 9]
    n, tot = len(xs), sum(xs)
    s, expect = 0, []
    for x in xs:
        s = max(0, s + n * x - tot)
        expect.append(s)
    df = spark.createDataFrame(
        [("g", d, x) for d, x in enumerate(xs)], "g string, day int, x long"
    )
    got = [
        r.cusum_scaled
        for r in cusum_report(df, "g", "day", "x").orderBy("day").collect()
    ]
    assert got == expect


def test_cusum_alarm_threshold_and_grouping(spark):
    from aws_datalake_spark.operators.stats import cusum_report

    # group "shift" jumps from 1 to 100 halfway -> huge positive CUSUM
    rows = [("shift", d, 1 if d < 10 else 100) for d in range(20)]
    rows += [("flat", d, 5) for d in range(20)]
    df = spark.createDataFrame(rows, "g string, day int, x long")
    out = cusum_report(df, "g", "day", "x", threshold_mult=1).collect()
    by = {}
    for r in out:
        by.setdefault(r.g, []).append(r)
    assert any(r.alarm for r in by["shift"])
    assert not any(r.alarm for r in by["flat"])


def test_cusum_windows_are_partitioned(spark):
    """No single-partition global window: every Window in the plan
    carries a partition spec."""
    from aws_datalake_spark.operators.stats import cusum_report

    df = spark.createDataFrame(
        [("g", d, 10) for d in range(8)], "g string, day int, x long"
    )
    plan = _plan(cusum_report(df, "g", "day", "x"))
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__g" in line.split("windowspecdefinition")[1][:80]


# ---------------------------------------------------------------------------
# l_diversity_audit
# ---------------------------------------------------------------------------


def test_l_diversity_flags_homogeneous_groups(spark):
    from aws_datalake_spark.operators.dq import l_diversity_audit

    rows = (
        [("a", 1, "X")] * 5          # 1 distinct sensitive -> violates
        + [("a", 2, "X"), ("a", 2, "Y"), ("a", 2, "Z")]  # 3 -> ok at l=2
        + [("b", 1, "X"), ("b", 1, "X"), ("b", 1, "Y")]  # 2 -> ok at l=2
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, s string")
    got = {(r.q1, r.q2): (r.n, r.n_sensitive, r.violates)
           for r in l_diversity_audit(df, ["q1", "q2"], "s", l=2).collect()}
    assert got == {
        ("a", 1): (5, 1, True),
        ("a", 2): (3, 3, False),
        ("b", 1): (3, 2, False),
    }
    with pytest.raises(ValueError):
        l_diversity_audit(df, [], "s", l=2)


def test_l_diversity_vs_k_anonymity_orthogonal(spark):
    """A k-safe group (large n) can still violate l-diversity."""
    from aws_datalake_spark.operators.dq import (
        k_anonymity_audit,
        l_diversity_audit,
    )

    rows = [("big", "X")] * 50
    df = spark.createDataFrame(rows, "q string, s string")
    k = k_anonymity_audit(df, ["q"], k=5).collect()[0]
    l = l_diversity_audit(df, ["q"], "s", l=2).collect()[0]
    assert not k.violates and l.violates


# ---------------------------------------------------------------------------
# hits_fixed_point
# ---------------------------------------------------------------------------


def test_hits_star_graph_ranks_center(spark):
    """Star: one supplier serves all customers, others serve one.
    The center must be the top hub; shared customers top auths."""
    from aws_datalake_spark.operators.graph import hits_fixed_point

    edges = [("S0", f"C{i}") for i in range(5)] + [("S1", "C0"), ("S2", "C9")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = hits_fixed_point(df, iterations=3).collect()
    hubs = {r.node: r.score_scaled for r in out if r.side == "hub"}
    auths = {r.node: r.score_scaled for r in out if r.side == "auth"}
    assert max(hubs, key=hubs.get) == "S0"
    # C0 is served by the strong hub S0 AND S1 -> strongest authority
    assert max(auths, key=auths.get) == "C0"
    # C9's only supplier never touches a strong customer
    assert auths["C9"] < auths["C1"]


def test_hits_l1_mass_conserved(spark):
    """After each normalization the L1 mass is scale minus
    truncation dust (< one unit per node)."""
    from aws_datalake_spark.operators.graph import hits_fixed_point

    edges = [(f"S{i % 4}", f"C{(i * 7) % 6}") for i in range(20)]
    df = spark.createDataFrame(edges, "src string, dst string").distinct()
    out = hits_fixed_point(df, iterations=2, scale=10**12).collect()
    for side in ("hub", "auth"):
        scores = [r.score_scaled for r in out if r.side == side]
        assert all(s >= 0 for s in scores)
        assert 10**12 - len(scores) <= sum(scores) <= 10**12


def test_hits_matches_python_reference(spark):
    """Exact integer twin of the operator's arithmetic in plain
    Python (trunc-div L1 normalization) must agree node-for-node."""
    from aws_datalake_spark.operators.graph import hits_fixed_point

    edges = {("a", "x"), ("a", "y"), ("b", "y"), ("c", "z"), ("b", "x")}
    scale = 10**9
    h = {s: scale for s in {e[0] for e in edges}}
    a = {}
    for _ in range(3):
        raw = {}
        for s, d in edges:
            raw[d] = raw.get(d, 0) + h[s]
        tot = sum(raw.values())
        a = {d: v * scale // tot for d, v in raw.items()}
        raw = {}
        for s, d in edges:
            raw[s] = raw.get(s, 0) + a[d]
        tot = sum(raw.values())
        h = {s: v * scale // tot for s, v in raw.items()}
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    out = hits_fixed_point(df, iterations=3, scale=scale).collect()
    got_h = {r.node: r.score_scaled for r in out if r.side == "hub"}
    got_a = {r.node: r.score_scaled for r in out if r.side == "auth"}
    assert got_h == h
    assert got_a == a


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------


def test_rake_phrase_segmentation_and_scores(spark):
    """Hand-computed RAKE on a two-doc corpus: stopword 'the' splits
    phrases; degree counts phrase length per occurrence."""
    from aws_datalake_spark.operators.text import rake_keywords

    docs = [
        (1, "red fox the red fox"),
        (2, "lazy dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.phrase: r for r in rake_keywords(
        df, stopwords=["the"], top_k=10, score_scale=100
    ).collect()}
    # "red fox" occurs twice (two islands); red: freq 2, deg 4 -> 200
    # fox same -> phrase score 400; "lazy dog" words freq 1 deg 2 -> 400
    assert out["red fox"].n_occ == 2
    assert out["red fox"].score_scaled == 400
    assert out["lazy dog"].n_occ == 1
    assert out["lazy dog"].score_scaled == 400


def test_rake_max_phrase_len_drops_runs(spark):
    from aws_datalake_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "a b c d e the x y")], "doc_id long, text string"
    )
    out = {r.phrase for r in rake_keywords(
        df, stopwords=["the"], max_phrase_len=4, top_k=10
    ).collect()}
    assert out == {"x y"}  # the 5-word run is dropped entirely


def test_rake_deterministic_tiebreak_order(spark):
    from aws_datalake_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "aa the bb the cc")], "doc_id long, text string"
    )
    rows = rake_keywords(df, stopwords=["the"], top_k=10).collect()
    # all three single-word phrases score identically -> lexicographic
    assert [r.phrase for r in rows] == ["aa", "bb", "cc"]


# ---------------------------------------------------------------------------
# interarrival_burstiness
# ---------------------------------------------------------------------------


def test_burstiness_periodic_is_minus_one(spark):
    """Perfectly periodic gaps: sigma = 0 -> B = -1."""
    import datetime

    from aws_datalake_spark.operators.stats import interarrival_burstiness

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (7, base + datetime.timedelta(seconds=10 * i), i) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    r = interarrival_burstiness(df, "user_id", "ts", "event_id").collect()[0]
    assert r.n_gaps == 7
    assert r.mean_gap_s == 10.0
    assert r.burstiness == -1.0


def test_burstiness_matches_numpy(spark):
    import datetime

    import numpy as np

    from aws_datalake_spark.operators.stats import interarrival_burstiness

    gaps = [1, 1, 1, 50, 1, 1, 1, 120, 1, 2]
    ts, acc = [], 0
    base = datetime.datetime(2024, 1, 1)
    ts.append(base)
    for g in gaps:
        acc += g
        ts.append(base + datetime.timedelta(seconds=acc))
    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(ts)],
        "user_id long, ts timestamp, event_id long",
    )
    r = interarrival_burstiness(df, "user_id", "ts", "event_id").collect()[0]
    g = np.array(gaps, dtype=float)
    mu, sd = g.mean(), g.std(ddof=1)
    assert r.mean_gap_s == pytest.approx(mu, abs=1e-6)
    assert r.burstiness == pytest.approx((sd - mu) / (sd + mu), abs=1e-6)


def test_burstiness_min_gaps_filter_and_tiebreak(spark):
    import datetime

    from aws_datalake_spark.operators.stats import interarrival_burstiness

    base = datetime.datetime(2024, 1, 1)
    # user 1: 3 gaps (< 5 -> filtered); user 2: 6 equal-ts events
    # disambiguated by event_id -> zero gaps, B = NULL (sd+mu == 0)
    rows = [(1, base + datetime.timedelta(seconds=i), i) for i in range(4)]
    rows += [(2, base, 100 + i) for i in range(7)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {r.user_id: r for r in
           interarrival_burstiness(df, "user_id", "ts", "event_id").collect()}
    assert set(out) == {2}
    assert out[2].mean_gap_s == 0.0 and out[2].burstiness is None


# ---------------------------------------------------------------------------
# clustering_coefficients
# ---------------------------------------------------------------------------


def test_clustering_coefficient_clique_and_path(spark):
    """Triangle abc -> every node cc=1; path endpoint d has deg 1 ->
    NULL; center of a 2-path has cc 0."""
    from aws_datalake_spark.operators.graph import clustering_coefficients

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "s string, d string")
    got = {r.node: r for r in clustering_coefficients(df).collect()}
    assert got["a"].cc == 1.0 and got["b"].cc == 1.0
    # c: degree 3, 1 triangle -> 2/(3*2) = 0.333333
    assert got["c"].cc == round(2 * 1 / (3 * 2), 6)
    assert got["e"].cc is None  # degree 1
    assert got["d"].cc == 0.0   # degree 2, no triangle


# ---------------------------------------------------------------------------
# interval_coverage
# ---------------------------------------------------------------------------


def test_interval_coverage_merges_overlaps(spark):
    from aws_datalake_spark.operators.sessions import interval_coverage

    rows = [
        ("u", 0, 10), ("u", 5, 12),   # overlap -> [0,12]
        ("u", 12, 20),                 # touching (s == max_e) -> merged
        ("u", 30, 40),                 # separate island
        ("v", 0, 1),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r.k: r for r in interval_coverage(df, "k", "s", "e").collect()}
    assert (got["u"].n_intervals, got["u"].n_islands, got["u"].covered) == (
        4, 2, 30)
    assert (got["v"].n_intervals, got["v"].n_islands, got["v"].covered) == (
        1, 1, 1)


def test_interval_coverage_contained_interval(spark):
    """An interval fully inside an earlier one must not reopen or
    extend the island (the running-max, not lag-end, discipline)."""
    from aws_datalake_spark.operators.sessions import interval_coverage

    rows = [("u", 0, 100), ("u", 10, 20), ("u", 150, 160)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = interval_coverage(df, "k", "s", "e").collect()[0]
    assert (r.n_islands, r.covered) == (2, 110)


def test_interval_coverage_randomized_vs_naive(spark):
    import random

    from aws_datalake_spark.operators.sessions import interval_coverage

    rng = random.Random(13)
    rows = []
    expect = {}
    for k in ("a", "b", "c"):
        ivs = [(s := rng.randrange(0, 500), s + rng.randrange(1, 60))
               for _ in range(40)]
        rows += [(k, s, e) for s, e in ivs]
        covered = set()
        for s, e in ivs:
            covered.update(range(s, e))
        expect[k] = len(covered)
    df = spark.createDataFrame(rows, "k string, s long, e long")
    got = {r.k: r.covered
           for r in interval_coverage(df, "k", "s", "e").collect()}
    assert got == expect


# ---------------------------------------------------------------------------
# tvd_drift
# ---------------------------------------------------------------------------


def test_tvd_identical_mix_is_zero(spark):
    from aws_datalake_spark.operators.stats import tvd_drift

    rows = [(g, c) for g in ("g1", "g2") for c in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, c string")
    out = tvd_drift(df, "g", "c").collect()
    assert all(r.tvd == 0.0 and r.tvd_num == "0" for r in out)


def test_tvd_disjoint_mix_and_missing_cells(spark):
    """g1 all-x, g2 all-y (equal sizes): q = (1/2, 1/2), each group's
    TVD = 1/2; the missing cell must contribute."""
    from aws_datalake_spark.operators.stats import tvd_drift

    rows = [("g1", "x")] * 10 + [("g2", "y")] * 10
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in tvd_drift(df, "g", "c").collect()}
    for g in ("g1", "g2"):
        assert out[g].tvd == 0.5
        assert int(out[g].tvd_num) * 2 == int(out[g].tvd_den)


def test_tvd_matches_python_reference(spark):
    import random

    from aws_datalake_spark.operators.stats import tvd_drift

    rng = random.Random(99)
    rows = [(f"g{rng.randrange(3)}", f"c{rng.randrange(4)}")
            for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, c string")
    got = {r.g: r.tvd for r in tvd_drift(df, "g", "c").collect()}
    from collections import Counter
    cells = Counter(rows)
    ng = Counter(g for g, _ in rows)
    nc = Counter(c for _, c in rows)
    n = len(rows)
    for g in ng:
        tvd = sum(abs(cells.get((g, c), 0) / ng[g] - nc[c] / n)
                  for c in nc) / 2
        assert got[g] == pytest.approx(tvd, abs=1e-6)


# ---------------------------------------------------------------------------
# llm_bpe_encode (train -> apply wiring)
# ---------------------------------------------------------------------------


def test_bpe_encode_fertility_consistency(spark):
    """Applying the trained merges to the training corpus: piece
    counts per word never exceed word length and never fall below 1;
    fertility = total_pieces/n_tokens in (0, max_word_len]."""
    from aws_datalake_spark.operators.bpe import bpe_encode, bpe_merges

    docs = spark.createDataFrame(
        [(1, "low low lower lowest low"), (2, "low lower newest newest")],
        "doc_id long, text string",
    )
    merges_rows = bpe_merges(docs, num_merges=4).orderBy("merge_rank").collect()
    merges = [tuple(r.pair.split(" ", 1)) for r in merges_rows]
    enc = bpe_encode(docs, merges).collect()
    assert all(1 <= r.n_pieces <= len(r.token) for r in enc)
    # 'low' occurs 4 times and is the most frequent word: after 4
    # merges on this corpus its pieces must have merged below letters
    low = [r for r in enc if r.token == "low"][0]
    assert low.n_pieces < 3
    # same word -> identical pieces everywhere
    by_tok = {}
    for r in enc:
        by_tok.setdefault(r.token, set()).add(tuple(r.pieces))
    assert all(len(v) == 1 for v in by_tok.values())


# ---------------------------------------------------------------------------
# ks_two_sample
# ---------------------------------------------------------------------------


def test_ks_identical_samples_zero(spark):
    from aws_datalake_spark.operators.stats import ks_two_sample

    rows = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_two_sample(df, "g", F.col("v"), "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d_num, r.d) == (4, 4, "0", 0.0)


def test_ks_matches_scipy_convention(spark):
    """Exact D against the brute-force ECDF max over all values."""
    import random

    from aws_datalake_spark.operators.stats import ks_two_sample

    rng = random.Random(5)
    a = [rng.randrange(0, 30) for _ in range(40)]
    b = [rng.randrange(10, 50) for _ in range(25)]
    df = spark.createDataFrame(
        [("a", v) for v in a] + [("b", v) for v in b], "g string, v long"
    )
    r = ks_two_sample(df, "g", F.col("v"), "a", "b").collect()[0]
    vals = sorted(set(a) | set(b))
    d = max(
        abs(sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b))
        for v in vals
    )
    assert r.d == pytest.approx(d, abs=1e-6)
    assert int(r.d_num) / int(r.d_den) == pytest.approx(d, abs=1e-12)


def test_ks_disjoint_supports_is_one(spark):
    from aws_datalake_spark.operators.stats import ks_two_sample

    rows = [("a", v) for v in (1, 2)] + [("b", v) for v in (10, 11, 12)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_two_sample(df, "g", F.col("v"), "a", "b").collect()[0]
    assert r.d == 1.0


def test_ks_ignores_other_groups(spark):
    from aws_datalake_spark.operators.stats import ks_two_sample

    rows = [("a", 1), ("b", 1), ("zz", 999)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = ks_two_sample(df, "g", F.col("v"), "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.d) == (1, 1, 0.0)


# ---------------------------------------------------------------------------
# kruskal_wallis
# ---------------------------------------------------------------------------


def test_kruskal_wallis_matches_scipy_formula(spark):
    """Against a plain-Python implementation of the tie-corrected
    textbook formula (scipy.stats.kruskal convention)."""
    import random
    from collections import Counter

    from aws_datalake_spark.operators.stats import kruskal_wallis

    rng = random.Random(11)
    groups = {
        "a": [rng.randrange(0, 20) for _ in range(30)],
        "b": [rng.randrange(5, 25) for _ in range(20)],
        "c": [rng.randrange(0, 10) for _ in range(25)],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    # python reference
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    cnt = Counter(allv)
    # average rank per value
    ranks, cum = {}, 0
    for v in sorted(cnt):
        ranks[v] = cum + (cnt[v] + 1) / 2
        cum += cnt[v]
    s = sum(
        (sum(ranks[v] for v in vs)) ** 2 / len(vs) for vs in groups.values()
    )
    h = 12.0 * s / (n * (n + 1)) - 3 * (n + 1)
    t = sum(c**3 - c for c in cnt.values())
    h_adj = h / (1 - t / (n**3 - n))
    assert r.k == 3 and r.n == n and r.ties_t == t
    assert r.h == pytest.approx(h, abs=1e-6)
    assert r.h_adj == pytest.approx(h_adj, abs=1e-6)


def test_kruskal_wallis_identical_groups_zero(spark):
    from aws_datalake_spark.operators.stats import kruskal_wallis

    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    assert r.h == 0.0 and r.h_adj == 0.0


def test_kruskal_wallis_all_tied_null_adj(spark):
    """Every value identical: tie factor hits 0 -> h_adj NULL."""
    from aws_datalake_spark.operators.stats import kruskal_wallis

    rows = [("a", 7)] * 3 + [("b", 7)] * 4
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", F.col("v")).collect()[0]
    assert r.h_adj is None


# ---------------------------------------------------------------------------
# t_closeness_audit
# ---------------------------------------------------------------------------


def test_t_closeness_identical_distribution_zero(spark):
    from aws_datalake_spark.operators.dq import t_closeness_audit

    rows = [(g, s) for g in ("a", "b") for s in (0, 1, 2) for _ in range(4)]
    df = spark.createDataFrame(rows, "q string, sens int")
    out = t_closeness_audit(df, ["q"], "sens").collect()
    assert all(r.emd == 0.0 and not r.violates for r in out)


def test_t_closeness_matches_python_emd(spark):
    """Exact EMD against the textbook ordered-distance formula,
    including a group missing a sensitive value entirely."""
    import random
    from collections import Counter

    from aws_datalake_spark.operators.dq import t_closeness_audit

    rng = random.Random(3)
    rows = [(f"g{rng.randrange(3)}", rng.randrange(4)) for _ in range(300)]
    rows += [("gskew", 3)] * 20  # extreme group, misses values 0-2
    df = spark.createDataFrame(rows, "q string, sens int")
    got = {r.q: r for r in t_closeness_audit(df, ["q"], "sens").collect()}
    nc = Counter(s for _, s in rows)
    n = len(rows)
    m = len(nc)
    by_g = {}
    for g, s in rows:
        by_g.setdefault(g, []).append(s)
    for g, vals in by_g.items():
        cg = Counter(vals)
        cum, acc = 0.0, 0.0
        for s in sorted(nc):
            cum += cg.get(s, 0) / len(vals) - nc[s] / n
            acc += abs(cum)
        emd = acc / (m - 1)
        assert got[g].emd == pytest.approx(emd, abs=1e-6), g
    # the skewed group is far from the global mix
    assert got["gskew"].violates
    assert got["gskew"].emd > 0.3


def test_t_closeness_integer_gate_boundary(spark):
    """violates is an exact-integer comparison: emd exactly at the
    threshold must NOT violate (strict >)."""
    from aws_datalake_spark.operators.dq import t_closeness_audit

    # two groups, two values; g1 = (1,0), g2 = (0,1), global = (1/2,1/2)
    # EMD(g1) = |1/2| / 1 = 1/2 -> with t = 1/2 the gate is AT the
    # boundary -> not violated; with t = 1/4 it is.
    rows = [("g1", 0)] * 6 + [("g2", 1)] * 6
    df = spark.createDataFrame(rows, "q string, sens int")
    at = {r.q: r for r in t_closeness_audit(
        df, ["q"], "sens", t_threshold_num=1, t_threshold_den=2).collect()}
    assert all(not r.violates for r in at.values())
    below = {r.q: r for r in t_closeness_audit(
        df, ["q"], "sens", t_threshold_num=1, t_threshold_den=4).collect()}
    assert all(r.violates for r in below.values())


# ---------------------------------------------------------------------------
# mann_kendall
# ---------------------------------------------------------------------------


def test_mann_kendall_monotone_series(spark):
    """Strictly increasing series: S = n(n-1)/2, sen = the exact
    common slope, z > 0."""
    from aws_datalake_spark.operators.stats import mann_kendall

    rows = [("g", i, 10 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = mann_kendall(df, "g", "t", F.col("x")).collect()[0]
    assert r.s == 45 and r.sen_slope == 10.0 and r.z > 0


def test_mann_kendall_matches_python_reference(spark):
    import itertools
    import math
    import random
    from collections import Counter

    from aws_datalake_spark.operators.stats import mann_kendall

    rng = random.Random(17)
    xs = [rng.randrange(0, 50) for _ in range(30)]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = mann_kendall(df, "g", "t", F.col("x")).collect()[0]
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i, j in itertools.combinations(range(n), 2)
    )
    ties = Counter(xs)
    var = (n * (n - 1) * (2 * n + 5)
           - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())) / 18
    z = ((s - 1) / math.sqrt(var) if s > 0
         else (s + 1) / math.sqrt(var) if s < 0 else 0.0)
    slopes = sorted(
        (xs[j] - xs[i]) * 10**6 // (j - i) if (xs[j] - xs[i]) >= 0
        else -((xs[i] - xs[j]) * 10**6 // (j - i))
        for i, j in itertools.combinations(range(n), 2)
    )
    sen = slopes[(len(slopes) + 1) // 2 - 1] / 1e6
    assert r.s == s
    assert r.z == pytest.approx(z, abs=1e-6)
    assert r.sen_slope == pytest.approx(sen, abs=1e-6)


def test_mann_kendall_flat_series(spark):
    """All values equal: S = 0, z NULL (zero variance), sen 0."""
    from aws_datalake_spark.operators.stats import mann_kendall

    rows = [("g", i, 7) for i in range(6)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    r = mann_kendall(df, "g", "t", F.col("x")).collect()[0]
    assert r.s == 0 and r.z is None and r.sen_slope == 0.0


# ---------------------------------------------------------------------------
# kcore_peel
# ---------------------------------------------------------------------------


def test_kcore_peels_tail_keeps_clique(spark):
    """K4 clique + a pendant path: 3-core = exactly the clique, and
    the cascade (removing the path tip exposes the next node) must
    propagate across rounds."""
    from aws_datalake_spark.operators.graph import kcore_peel

    clique = [("a", "b"), ("a", "c"), ("a", "d"),
              ("b", "c"), ("b", "d"), ("c", "d")]
    path = [("d", "e"), ("e", "f"), ("f", "g")]
    df = spark.createDataFrame(clique + path, "s string, d string")
    out = {r.node: r for r in kcore_peel(df, k=3, rounds=4).collect()}
    assert set(out) == {"a", "b", "c", "d"}
    assert all(r.degree == 3 and r.converged for r in out.values())


def test_kcore_insufficient_rounds_reports_not_converged(spark):
    """A long pendant chain needs one round per link: with rounds=1
    the survivors still contain degree<k nodes -> converged False."""
    from aws_datalake_spark.operators.graph import kcore_peel

    # 2-core test: a triangle with a chain of 3 hanging off it
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    chain = [("c", "x1"), ("x1", "x2"), ("x2", "x3")]
    df = spark.createDataFrame(tri + chain, "s string, d string")
    short = kcore_peel(df, k=2, rounds=1).collect()
    assert any(not r.converged for r in short)
    full = {r.node for r in kcore_peel(df, k=2, rounds=4).collect()}
    assert full == {"a", "b", "c"}


def test_kcore_empty_result(spark):
    from aws_datalake_spark.operators.graph import kcore_peel

    df = spark.createDataFrame([("a", "b"), ("b", "c")], "s string, d string")
    assert kcore_peel(df, k=3, rounds=3).count() == 0


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------


def test_lpa_two_cliques_with_bridge(spark):
    """Two triangles joined by one bridge edge: each triangle
    converges to its min member label; the bridge does not merge
    them (unlike connected components)."""
    from aws_datalake_spark.operators.graph import label_propagation

    t1 = [(1, 2), (1, 3), (2, 3)]
    t2 = [(7, 8), (7, 9), (8, 9)]
    bridge = [(3, 7)]
    df = spark.createDataFrame(t1 + t2 + bridge, "s long, d long")
    got = {r.node: r.label
           for r in label_propagation(df, iterations=4).collect()}
    assert got[1] == got[2] == got[3]
    assert got[7] == got[8] == got[9]
    assert got[1] != got[7]


def test_lpa_deterministic_across_runs(spark):
    from aws_datalake_spark.operators.graph import label_propagation

    edges = [(i, (i * 3 + 1) % 17) for i in range(17)]
    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "s long, d long").distinct()
    a = sorted((r.node, r.label)
               for r in label_propagation(df, iterations=3).collect())
    b = sorted((r.node, r.label)
               for r in label_propagation(df, iterations=3).collect())
    assert a == b


def test_lpa_matches_python_sync_reference(spark):
    """Node-for-node equality with a plain-Python synchronous LPA
    using the same min-label tie-break."""
    import random
    from collections import Counter

    from aws_datalake_spark.operators.graph import label_propagation

    rng = random.Random(23)
    edges = {tuple(sorted((rng.randrange(12), rng.randrange(12))))
             for _ in range(20)}
    edges = {(a, b) for a, b in edges if a != b}
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n in nbrs:
            c = Counter(lab[m] for m in nbrs[n])
            best = max(c.values())
            new[n] = min(l for l, v in c.items() if v == best)
        lab = new
    df = spark.createDataFrame(sorted(edges), "s long, d long")
    got = {r.node: r.label
           for r in label_propagation(df, iterations=3).collect()}
    assert got == lab


# ---------------------------------------------------------------------------
# ktruss_peel
# ---------------------------------------------------------------------------


def test_ktruss_keeps_clique_drops_tail(spark):
    """K4 + pendant triangle chain: the 4-truss is exactly the K4
    (every K4 edge sits in 2 triangles); a lone triangle (support 1
    per edge) is peeled."""
    from aws_datalake_spark.operators.graph import ktruss_peel

    k4 = [("a", "b"), ("a", "c"), ("a", "d"),
          ("b", "c"), ("b", "d"), ("c", "d")]
    lone = [("x", "y"), ("x", "z"), ("y", "z"), ("d", "x")]
    df = spark.createDataFrame(k4 + lone, "s string, d string")
    out = ktruss_peel(df, k=4, rounds=3).collect()
    got = {(r.s, r.d) for r in out}
    assert got == set(k4)
    assert all(r.support == 2 and r.converged for r in out)


def test_ktruss_cascade_needs_rounds(spark):
    """Peeling cascades: removing the weakest edge can drop a
    neighbor below threshold only in the NEXT round."""
    from aws_datalake_spark.operators.graph import ktruss_peel

    # two triangles sharing edge (b,c): each outer edge support 1,
    # shared edge support 2. 4-truss: drop outer edges round 1 ->
    # shared edge loses all triangles -> dropped round 2.
    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")],
        "s string, d string",
    )
    assert ktruss_peel(df, k=4, rounds=3).count() == 0
    one = ktruss_peel(df, k=4, rounds=1).collect()
    assert len(one) == 1 and not one[0].converged


# ---------------------------------------------------------------------------
# ams_f2_report
# ---------------------------------------------------------------------------


def test_ams_f2_truth_and_unbiasedness_shape(spark):
    from aws_datalake_spark.operators.sketches import ams_f2_report

    rows = [("g", f"w{i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "g string, w string")
    r = ams_f2_report(df, "g", "w", num_sketches=8).collect()[0]
    assert r.f2_true == 5 * 10 * 10
    assert r.ams_estimate > 0
    assert r.rel_err is not None and r.rel_err >= 0


def test_ams_f2_single_item_exact(spark):
    """One distinct item: every sketch is ±c, X² = c² exactly ->
    zero error regardless of signs."""
    from aws_datalake_spark.operators.sketches import ams_f2_report

    df = spark.createDataFrame([("g", "only")] * 7, "g string, w string")
    r = ams_f2_report(df, "g", "w", num_sketches=4).collect()[0]
    assert r.f2_true == 49 and r.ams_estimate == 49.0 and r.rel_err == 0.0


def test_ams_f2_deterministic(spark):
    from aws_datalake_spark.operators.sketches import ams_f2_report

    rows = [("g", f"w{i % 13}") for i in range(100)]
    df = spark.createDataFrame(rows, "g string, w string")
    a = ams_f2_report(df, "g", "w").collect()[0]
    b = ams_f2_report(df, "g", "w").collect()[0]
    assert a.ams_estimate == b.ams_estimate


# ---------------------------------------------------------------------------
# personalized_pagerank
# ---------------------------------------------------------------------------


def test_ppr_mass_concentrates_near_seeds(spark):
    """Two disjoint S->C stars; seeding only star 1's supplier gives
    star 2's customers zero rank."""
    from aws_datalake_spark.operators.graph import personalized_pagerank

    edges = [("s1", f"c{i}") for i in range(3)] + [
        ("s2", f"d{i}") for i in range(3)
    ]
    e = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("s1",)], "node string")
    got = {r.node: r.rank_scaled
           for r in personalized_pagerank(e, seeds, iterations=3).collect()}
    assert got["s1"] > 0
    assert all(got[f"c{i}"] > 0 for i in range(3))
    assert all(got[f"d{i}"] == 0 for i in range(3)) and got["s2"] == 0


def test_ppr_matches_python_integer_reference(spark):
    from aws_datalake_spark.operators.graph import personalized_pagerank

    edges = {("a", "x"), ("a", "y"), ("b", "y"), ("x", "b")}
    scale, iters = 10**9, 4
    nodes = sorted({n for e in edges for n in e})
    seeds = ["a"]
    outdeg = {}
    for s, d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    init = scale // len(seeds)
    base = 15 * scale // (100 * len(seeds))
    rank = {n: (init if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        new = {n: (base if n in seeds else 0) for n in nodes}
        for s, d in edges:
            new[d] += (rank[s] * 85) // (100 * outdeg[s])
        rank = new
    e = spark.createDataFrame(sorted(edges), "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {r.node: r.rank_scaled for r in personalized_pagerank(
        e, sdf, iterations=iters, scale=scale).collect()}
    assert got == rank


def test_ppr_requires_seed_in_graph(spark):
    import pytest as _pytest

    from aws_datalake_spark.operators.graph import personalized_pagerank

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("zz",)], "node string")
    with _pytest.raises(ValueError):
        personalized_pagerank(e, seeds)


# ---------------------------------------------------------------------------
# davies_bouldin_exact
# ---------------------------------------------------------------------------


def test_db_index_tight_vs_loose_clusters(spark):
    """Two well-separated tight blobs score a much lower DB index
    than the same points pushed together."""
    from aws_datalake_spark.operators.clustering import davies_bouldin_exact

    def blob(center, n, spread):
        return [[center + (i % 3) * spread, center - (i % 2) * spread]
                for i in range(n)]

    tight = blob(0, 6, 1) + blob(1000, 6, 1)
    cents_tight = [[0, 0], [1000, 1000]]
    rows = [(i, [int(a), int(b)]) for i, (a, b) in enumerate(tight)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<long>")
    out = davies_bouldin_exact(df, cents_tight, scale=1).collect()
    assert all(r.db_index < 0.01 for r in out)

    loose = blob(0, 6, 40) + blob(100, 6, 40)
    cents_loose = [[0, 0], [100, 100]]
    rows2 = [(i, [int(a), int(b)]) for i, (a, b) in enumerate(loose)]
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<long>")
    out2 = davies_bouldin_exact(df2, cents_loose, scale=1).collect()
    assert out2[0].db_index > out[0].db_index * 10


def test_db_index_matches_python_reference(spark):
    import random

    from aws_datalake_spark.operators.clustering import davies_bouldin_exact

    rng = random.Random(7)
    cents = [[0, 0], [50, 0], [0, 50]]
    pts = []
    for c in cents:
        pts += [[c[0] + rng.randrange(-5, 6), c[1] + rng.randrange(-5, 6)]
                for _ in range(10)]
    rows = [(i, p) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<long>")
    got = {r.cid: r for r in davies_bouldin_exact(df, cents, scale=1).collect()}
    # python reference (squared-distance variant, argmin assignment)
    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))
    assign = {}
    for i, p in enumerate(pts):
        ds = [(d2(p, c), ci) for ci, c in enumerate(cents)]
        assign.setdefault(min(ds)[1], []).append(p)
    S = {ci: sum(d2(p, cents[ci]) for p in ps) / len(ps)
         for ci, ps in assign.items()}
    R = {}
    for i in S:
        R[i] = max((S[i] + S[j]) / d2(cents[i], cents[j])
                   for j in S if j != i)
    dbi = sum(R.values()) / len(R)
    for ci in S:
        assert got[ci].s_mean == pytest.approx(S[ci], abs=1e-6)
        assert got[ci].r_max == pytest.approx(R[ci], abs=1e-6)
        assert got[ci].db_index == pytest.approx(dbi, abs=1e-6)


def test_db_index_duplicate_centroid_excluded(spark):
    """A duplicate centroid pair (M = 0) must not produce inf — it is
    excluded from R like standard implementations."""
    from aws_datalake_spark.operators.clustering import davies_bouldin_exact

    rows = [(0, [0, 0]), (1, [1, 0]), (2, [100, 100]), (3, [101, 100])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<long>")
    cents = [[0, 0], [0, 0], [100, 100]]
    out = davies_bouldin_exact(df, cents, scale=1).collect()
    assert all(r.r_max is not None and r.r_max < float("inf") for r in out)


# ---------------------------------------------------------------------------
# rolling_ols
# ---------------------------------------------------------------------------


def test_rolling_ols_exact_line_and_window_bound(spark):
    from aws_datalake_spark.operators.stats import rolling_ols

    rows = [("g", i, 5 * i + 3) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    out = {r.t: r for r in rolling_ols(df, "g", "t", F.col("y"),
                                       window_rows=4).collect()}
    assert out[0].n_window == 1 and out[0].slope is None  # den = 0
    assert out[3].n_window == 4 and out[3].slope == 5.0
    assert out[9].n_window == 4 and out[9].slope == 5.0


def test_rolling_ols_matches_numpy_per_window(spark):
    import numpy as np

    from aws_datalake_spark.operators.stats import rolling_ols

    rng = np.random.RandomState(3)
    ys = rng.randint(0, 100, size=20)
    rows = [("g", i, int(y)) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t long, y long")
    got = {r.t: r.slope for r in rolling_ols(
        df, "g", "t", F.col("y"), window_rows=5).collect()}
    for t_end in range(4, 20):
        xs = np.arange(t_end - 4, t_end + 1)
        yw = ys[t_end - 4:t_end + 1]
        slope = np.polyfit(xs, yw, 1)[0]
        assert got[t_end] == pytest.approx(slope, abs=1e-6)


# ---------------------------------------------------------------------------
# simpson_diversity
# ---------------------------------------------------------------------------


def test_simpson_extremes(spark):
    from aws_datalake_spark.operators.stats import simpson_diversity

    rows = [("mono", "x")] * 10 + [(f"uniq", f"w{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "g string, w string")
    got = {r.g: r for r in simpson_diversity(df, "g", "w").collect()}
    assert got["mono"].simpson == 0.0        # two draws always equal
    assert got["uniq"].simpson == 1.0        # two draws never equal
    assert got["uniq"].n_types == 10


def test_simpson_matches_formula(spark):
    from collections import Counter
    import random

    from aws_datalake_spark.operators.stats import simpson_diversity

    rng = random.Random(4)
    items = [f"w{rng.randrange(6)}" for _ in range(200)]
    df = spark.createDataFrame([("g", w) for w in items], "g string, w string")
    r = simpson_diversity(df, "g", "w").collect()[0]
    c = Counter(items)
    n = len(items)
    d = 1 - sum(v * (v - 1) for v in c.values()) / (n * (n - 1))
    assert r.simpson == pytest.approx(d, abs=1e-6)


def test_simpson_single_row_null(spark):
    from aws_datalake_spark.operators.stats import simpson_diversity

    df = spark.createDataFrame([("g", "x")], "g string, w string")
    r = simpson_diversity(df, "g", "w").collect()[0]
    assert r.simpson is None


# ---------------------------------------------------------------------------
# q_decile_lift / q_abc_pareto / q_runs_test (query-level invariants)
# ---------------------------------------------------------------------------


def test_decile_lift_partitions_and_rates(spark):
    from aws_datalake_spark.queries.round9 import q_decile_lift

    out = q_decile_lift(spark, "/root/testdata/sf0.001").collect()
    assert sorted(r.decile for r in out) == list(range(1, 11))
    n = sum(r.n_customers for r in out)
    # equal-size deciles within 1
    sizes = [r.n_customers for r in out]
    assert max(sizes) - min(sizes) <= 1
    for r in out:
        assert 0.0 <= r.response_rate <= 1.0
    # weighted mean rate * n == total responders
    assert sum(r.responders for r in out) <= n


def test_abc_pareto_class_invariants(spark):
    from aws_datalake_spark.queries.round9 import q_abc_pareto

    out = {r.abc_class: r for r in
           q_abc_pareto(spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"A", "B", "C"}
    total = sum(r.revenue_cents for r in out.values())
    # A holds <= 80% of revenue but more than B or C per-part density:
    assert out["A"].revenue_cents * 100 <= total * 80 + total  # boundary slack
    a_density = out["A"].revenue_cents / out["A"].n_parts
    c_density = out["C"].revenue_cents / out["C"].n_parts
    assert a_density > c_density


def test_runs_test_detects_trend_vs_alternating(spark):
    """Query-level smoke on the operator's math: an alternating
    sign pattern yields many runs (z > 0), a sorted pattern few
    (z < 0) — verified via a direct mini-frame computation."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    def runs_z(xs):
        n = len(xs)
        tot = sum(xs)
        s = [1 if n * x > tot else 0 for x in xs]
        r = sum(1 for i, v in enumerate(s) if i == 0 or s[i - 1] != v)
        n1, n2 = sum(s), len(s) - sum(s)
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        var = (2 * n1 * n2 * (2 * n1 * n2 - (n1 + n2))
               / ((n1 + n2) ** 2 * (n1 + n2 - 1)))
        return (r - mu) / var**0.5

    trend = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    alt = [1, 10, 1, 10, 1, 10, 1, 10, 1, 10]
    assert runs_z(trend) < -1.5
    assert runs_z(alt) > 1.5
