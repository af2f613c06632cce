"""Round-6-session operator tests: mass-conserving PageRank."""

from __future__ import annotations


def _pr_bruteforce_conserving(edges, iterations, scale=10**12, num=85, den=100):
    """Pure-Python twin of the conserving integer power iteration."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    base = (den - num) * scale // (den * n)
    rank = {v: scale // n for v in nodes}
    for _ in range(iterations):
        dangling = sum(rank[v] for v in nodes if v not in outdeg)
        share = (dangling * num) // (den * n)
        incoming = {v: 0 for v in nodes}
        for u, v in edges:
            incoming[v] += (rank[u] * num) // (den * outdeg[u])
        rank = {v: base + incoming[v] + share for v in nodes}
    return rank


def test_pagerank_conserving_matches_integer_bruteforce(spark):
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    # 'd' and 'e' are dangling sinks — their mass must flow back
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("a", "e"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(
            df, iterations=4, redistribute_dangling=True
        ).collect()
    }
    assert got == _pr_bruteforce_conserving(edges, 4)


def test_pagerank_conserving_preserves_mass(spark):
    """Σ rank_scaled ≈ scale: only integral-truncation dust is lost
    (< E + 3N units per iteration), unlike the leaking variant which
    loses the entire dangling share each step (VERDICT r05 item 6)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    # star into a sink: ALL mass funnels into a dangling node, the
    # worst case for the leaking variant
    edges = [(f"u{i}", "sink") for i in range(10)]
    df = spark.createDataFrame(edges, "src string, dst string")
    scale, iters = 10**12, 3
    n_nodes, n_edges = 11, 10

    conserving = pagerank_fixed_point(
        df, iterations=iters, scale=scale, redistribute_dangling=True
    ).collect()
    total = sum(r.rank_scaled for r in conserving)
    assert total <= scale
    assert total >= scale - iters * (n_edges + 3 * n_nodes + 3)

    leaking = pagerank_fixed_point(df, iterations=iters, scale=scale).collect()
    leaked_total = sum(r.rank_scaled for r in leaking)
    assert leaked_total < total * 0.8  # the leak is real and large here


def test_pagerank_conserving_no_dangling_equals_plain(spark):
    """On a graph where every node has an out-edge the two variants
    are identical (share term is exactly zero)."""
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plain = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(df, iterations=3).collect()
    }
    cons = {
        r.node: r.rank_scaled
        for r in pagerank_fixed_point(
            df, iterations=3, redistribute_dangling=True
        ).collect()
    }
    assert plain == cons


# ---------------------------------------------------------------------------
# chi-square feature selection
# ---------------------------------------------------------------------------


def test_chi2_feature_scores_hand_computed(spark):
    from aws_datalake_spark.operators.stats import chi2_feature_scores

    # 3 units in the presence table: u1,u2 labeled 1; u3 labeled 0.
    # feature 'x' present in u1,u2 only  -> strongly discriminative
    # feature 'y' present in u1,u3       -> weak association
    rows = [
        (1, "x", 1), (2, "x", 1),
        (1, "y", 1), (3, "y", 0),
    ]
    df = spark.createDataFrame(rows, "u long, f string, l int")
    got = {
        r.feature: (r.a, r.b, r.c, r.d, r.chi2)
        for r in chi2_feature_scores(df, "u", "f", "l", top_k=10).collect()
    }
    # N=3; x: a=2,b=0,c=0,d=1 -> chi2 = 3*(2·1-0)^2/(2*1*2*1) = 3.0
    assert got["x"] == (2, 0, 0, 1, 3.0)
    # y: a=1,b=1,c=1,d=0 -> det=-1 -> chi2 = 3*1/(2*1*2*1) = 0.75
    assert got["y"] == (1, 1, 1, 0, 0.75)


def test_chi2_top_k_is_distributed_no_unbounded_window(spark):
    from aws_datalake_spark.operators.stats import chi2_feature_scores

    rows = [(i, f"f{i % 7}", i % 2) for i in range(100)]
    df = spark.createDataFrame(rows, "u long, f string, l int")
    out = chi2_feature_scores(df, "u", "f", "l", top_k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert len(out.collect()) == 3


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------


def test_transition_matrix_exact_probabilities(spark):
    import datetime

    from aws_datalake_spark.operators.sessions import transition_matrix

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, u, typ):
        return (i, t0 + datetime.timedelta(minutes=i), u, typ)

    rows = [
        ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "a"), ev(4, 1, "c"),
        ev(5, 2, "a"), ev(6, 2, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.from_state, r.to_state): (r.n, r.n_from, r.p)
        for r in transition_matrix(df).collect()
    }
    # a->b twice, a->c once (n_from(a)=3); b->a once (n_from(b)=1)
    assert got[("a", "b")] == (2, 3, round(2 / 3, 6))
    assert got[("a", "c")] == (1, 3, round(1 / 3, 6))
    assert got[("b", "a")] == (1, 1, 1.0)
    # no cross-user transition (user 1's last 'c' never chains to user 2)
    assert ("c", "a") not in got


# ---------------------------------------------------------------------------
# MAD outliers
# ---------------------------------------------------------------------------


def test_mad_outliers_flags_only_the_wild_rows(spark):
    from aws_datalake_spark.operators.stats import mad_outliers

    vals = list(range(100, 201)) + [10_000, -5_000]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v long")
    out = mad_outliers(df, "v", k=3.5).collect()
    got = {r.id: (r.v, r.abs_dev) for r in out}
    assert set(got) == {101, 102}  # only the two seeds
    r = out[0]
    # lower median of 103 values is 150; the 52nd sorted deviation
    # (0,1,1,2,2,...) is 26
    assert r.median == 150 and r.mad == 26


def test_mad_outliers_fence_robust_to_the_outlier_itself(spark):
    """The defining MAD property: adding one wild value does not
    move the fence (a stddev fence would widen and can miss it)."""
    from aws_datalake_spark.operators.stats import mad_outliers

    base = [(i, v) for i, v in enumerate(range(1000, 1101))]
    df1 = spark.createDataFrame(base, "id long, v long")
    df2 = spark.createDataFrame(base + [(999, 10**9)], "id long, v long")
    m1 = mad_outliers(df1, "v").select("median", "mad").limit(1).collect()
    m2 = mad_outliers(df2, "v").select("median", "mad").limit(1).collect()
    assert not m1  # clean data: no outliers at all
    assert m2 and (m2[0].median, m2[0].mad) == (1050, 25)


# ---------------------------------------------------------------------------
# first-occurrence novelty
# ---------------------------------------------------------------------------


def test_novelty_scores_first_occurrence_semantics(spark):
    from aws_datalake_spark.operators.dedup import novelty_scores

    rows = [
        (1, "a b c d e"),          # all 3 shingles first here -> 1.0
        (2, "a b c d e"),          # exact dup of 1 -> 0.0
        (3, "a b c x y z"),        # shares 'a b c' with doc 1 -> 3/4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novelty)
        for r in novelty_scores(df).collect()
    }
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (4, 3, 0.75)


# ---------------------------------------------------------------------------
# label centroid distances
# ---------------------------------------------------------------------------


def test_label_centroid_distances_exact_values(spark):
    from aws_datalake_spark.operators.similarity import label_centroid_distances

    rows = [
        (1, [0.0, 0.0], 0), (2, [2.0, 0.0], 0),   # centroid (1, 0)
        (3, [1.0, 3.0], 1), (4, [1.0, 5.0], 1),   # centroid (1, 4)
        (5, [9.0, 0.0], 2),                       # centroid (9, 0)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.dist)
        for r in label_centroid_distances(df).collect()
    }
    assert got[(0, 1)] == (2, 2, 4.0)
    assert got[(0, 2)] == (2, 1, 8.0)
    assert got[(1, 2)] == (2, 1, round((8**2 + 4**2) ** 0.5, 6))


# ---------------------------------------------------------------------------
# code detection
# ---------------------------------------------------------------------------


def test_code_features_flags_code_not_prose(spark):
    from aws_datalake_spark.operators.text import code_features

    rows = [
        (1, "def f(x): return g(x); y = [1]"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "import os ; return None ;"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in code_features(df).collect()}
    assert got[1].is_code and got[3].is_code
    assert not got[2].is_code
    assert got[2].n_symbols == 0 and got[2].keyword_hits == 0
    # doc 1: symbols ( ) ( ) ; = [ ] -> exactly 8
    assert got[1].n_symbols == 8
    assert got[1].keyword_hits == 2  # def, return


# ---------------------------------------------------------------------------
# exact ROC AUC (Mann-Whitney, tie-corrected)
# ---------------------------------------------------------------------------


def _auc_bruteforce(pairs):
    """Naive tie-as-half-win AUC over (score, label) rows."""
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    )
    return wins / (len(pos) * len(neg))


def test_exact_auc_matches_bruteforce_with_ties(spark):
    from aws_datalake_spark.operators.stats import exact_auc

    rows = [
        (5, 1), (4, 1), (4, 0), (3, 1), (3, 0), (3, 0), (1, 0), (5, 0),
        (2, 1), (2, 1),
    ]
    df = spark.createDataFrame(rows, "s long, l int")
    got = exact_auc(df, "s", "l").collect()[0]
    assert (got.n_pos, got.n_neg) == (5, 5)
    assert got.auc == round(_auc_bruteforce(rows), 6)


def test_exact_auc_perfect_and_inverted_separation(spark):
    from aws_datalake_spark.operators.stats import exact_auc

    perfect = spark.createDataFrame(
        [(10, 1), (9, 1), (2, 0), (1, 0)], "s long, l int"
    )
    assert exact_auc(perfect, "s", "l").collect()[0].auc == 1.0
    inverted = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 0), (10, 0)], "s long, l int"
    )
    assert exact_auc(inverted, "s", "l").collect()[0].auc == 0.0


def test_exact_auc_grouped_and_degenerate_groups(spark):
    from aws_datalake_spark.operators.stats import exact_auc

    rows = [
        ("a", 3, 1), ("a", 1, 0), ("a", 2, 0),
        ("b", 1, 1), ("b", 1, 1),  # no negatives -> NULL auc
    ]
    df = spark.createDataFrame(rows, "g string, s long, l int")
    got = {r.g: r for r in exact_auc(df, "s", "l", by=["g"]).collect()}
    assert got["a"].auc == 1.0
    assert got["b"].auc is None and got["b"].n_neg == 0


def test_exact_auc_window_runs_on_aggregated_frame(spark):
    """The only window must sit ABOVE the distinct-score aggregate
    (frame bounded by the score's value domain, never corpus rows) —
    the r05 vocab-window discipline."""
    from aws_datalake_spark.operators.stats import exact_auc

    df = spark.createDataFrame([(i % 7, i % 2) for i in range(100)], "s long, l int")
    plan = exact_auc(df, "s", "l")._jdf.queryExecution().optimizedPlan().toString()
    win_pos = plan.index("Window")
    agg_below = plan.index("Aggregate", win_pos)
    assert agg_below > win_pos  # an aggregate feeds the window


# ---------------------------------------------------------------------------
# Welch's t-test pairs
# ---------------------------------------------------------------------------


def test_welch_ttest_hand_computed(spark):
    from aws_datalake_spark.operators.stats import welch_ttest_pairs
    from pyspark.sql import functions as F

    a = [10, 12, 14, 16, 18]          # mean 14, var 10
    b = [20, 25, 30]                  # mean 25, var 25
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    got = welch_ttest_pairs(df, "g", F.col("v")).collect()[0]
    assert (got.group_a, got.group_b, got.n_a, got.n_b) == ("a", "b", 5, 3)
    assert (got.mean_a, got.mean_b) == (14.0, 25.0)
    va_n, vb_n = 10.0 / 5, 25.0 / 3
    se2 = va_n + vb_n
    t = (14.0 - 25.0) / se2 ** 0.5
    dfw = se2 * se2 / (va_n * va_n / 4 + vb_n * vb_n / 2)
    assert got.t_stat == round(t, 6)
    assert got.df_w == round(dfw, 6)


def test_welch_ttest_all_pairs_zero_variance_null(spark):
    from aws_datalake_spark.operators.stats import welch_ttest_pairs
    from pyspark.sql import functions as F

    rows = [("a", 5), ("a", 5), ("b", 7), ("b", 7), ("c", 1), ("c", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {(r.group_a, r.group_b): r for r in
           welch_ttest_pairs(df, "g", F.col("v")).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # both groups constant -> se2 == 0 -> NULL t
    assert got[("a", "b")].t_stat is None
    assert got[("a", "c")].t_stat is not None


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_subset_is_directional(spark):
    from aws_datalake_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon"           # 3 shingles
    long_ = short + " zeta eta theta iota kappa"       # 8 shingles, superset
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "one two three four five")],
        "doc_id long, text string",
    )
    got = {(r.id_sub, r.id_sup): r for r in
           containment_pairs(df, threshold=0.9, min_shingles=3).collect()}
    # 1 ⊂ 2 qualifies; the reverse direction is 3/8 and must not
    assert set(got) == {(1, 2)}
    r = got[(1, 2)]
    assert (r.n_sub, r.n_sup, r.n_common, r.containment) == (3, 8, 3, 1.0)


def test_containment_min_shingles_guards_tiny_docs(spark):
    from aws_datalake_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    # doc 1 has exactly ONE shingle -> excluded as sub at min_shingles=2
    got = containment_pairs(df, threshold=0.5, min_shingles=2).collect()
    assert all(r.id_sub != 1 for r in got)


def test_containment_max_df_path_equals_default_on_rare_grams(spark):
    from aws_datalake_spark.operators.dedup import containment_pairs

    rows = [(i, f"w{i} alpha beta gamma delta u{i} v{i} x{i}") for i in range(6)]
    rows += [(100, "alpha beta gamma delta extra tail words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {(r.id_sub, r.id_sup): r.containment
            for r in containment_pairs(df, threshold=0.3, min_shingles=2).collect()}
    capped = {(r.id_sub, r.id_sup): r.containment
              for r in containment_pairs(
                  df, threshold=0.3, min_shingles=2, max_df=50).collect()}
    assert base == capped and base


# ---------------------------------------------------------------------------
# blocklist features
# ---------------------------------------------------------------------------


def test_blocklist_counts_occurrences_not_distinct(spark):
    from aws_datalake_spark.operators.text import blocklist_features

    df = spark.createDataFrame(
        [(1, "bad bad bad word"), (2, "bad word"), (3, "clean text only"),
         (4, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           blocklist_features(df, ["bad", "word"], min_hits=3).collect()}
    assert (got[1].bl_hits, got[1].flagged) == (4, True)   # occurrences
    assert (got[2].bl_hits, got[2].flagged) == (2, False)
    assert (got[3].bl_hits, got[3].flagged) == (0, False)
    assert (got[4].n_tokens, got[4].bl_hits) == (0, 0)


def test_blocklist_whole_token_not_substring(spark):
    from aws_datalake_spark.operators.text import blocklist_features

    df = spark.createDataFrame([(1, "scanner scans scan")], "doc_id long, text string")
    got = blocklist_features(df, ["scan"], min_hits=1).collect()[0]
    assert got.bl_hits == 1  # 'scanner'/'scans' must not match


# ---------------------------------------------------------------------------
# keyed PageRank (TextRank substrate)
# ---------------------------------------------------------------------------


def _pr_bruteforce_keyed(edges, nodes, iterations, scale, num=85, den=100):
    """Per-key pure-Python twin of the keyed integer power iteration
    (dangling mass leaks, as in the unkeyed default)."""
    keys = {k for k, _ in nodes}
    out = {}
    for k in keys:
        vs = sorted(n for kk, n in nodes if kk == k)
        es = [(u, v) for kk, u, v in edges if kk == k]
        outdeg = {}
        for u, _ in es:
            outdeg[u] = outdeg.get(u, 0) + 1
        n = len(vs)
        base = (den - num) * scale // (den * n)
        rank = {v: scale // n for v in vs}
        for _ in range(iterations):
            incoming = {v: 0 for v in vs}
            for u, v in es:
                incoming[v] += (rank[u] * num) // (den * outdeg[u])
            rank = {v: base + incoming[v] for v in vs}
        for v, r in rank.items():
            out[(k, v)] = r
    return out


def test_pagerank_keyed_matches_per_key_bruteforce(spark):
    from aws_datalake_spark.operators.graph import pagerank_keyed

    nodes = [("d1", 0), ("d1", 1), ("d1", 2), ("d1", 3),
             ("d2", 0), ("d2", 1)]
    edges = [("d1", 0, 1), ("d1", 1, 0), ("d1", 1, 2), ("d1", 2, 0),
             ("d2", 0, 1), ("d2", 1, 0)]
    # d1 node 3 is ISOLATED: holds exactly base after any iteration
    e = spark.createDataFrame(edges, "key string, src int, dst int")
    n = spark.createDataFrame(nodes, "key string, idx int")
    got = {(r.key, r.node): r.rank_scaled
           for r in pagerank_keyed(e, n, key="key", src="src", dst="dst",
                                   iterations=3, scale=10**9).collect()}
    assert got == _pr_bruteforce_keyed(edges, nodes, 3, 10**9)
    assert got[("d1", 3)] == (100 - 85) * 10**9 // (100 * 4)


def test_pagerank_keyed_keys_do_not_interact(spark):
    """A key's ranks must be identical whether other keys exist."""
    from aws_datalake_spark.operators.graph import pagerank_keyed

    edges_one = [("d1", 0, 1), ("d1", 1, 0), ("d1", 1, 2), ("d1", 2, 1)]
    nodes_one = [("d1", 0), ("d1", 1), ("d1", 2)]
    edges_two = edges_one + [("dX", 0, 1), ("dX", 1, 0)]
    nodes_two = nodes_one + [("dX", 0), ("dX", 1)]

    def run(edges, nodes):
        e = spark.createDataFrame(edges, "key string, src int, dst int")
        n = spark.createDataFrame(nodes, "key string, idx int")
        return {
            (r.key, r.node): r.rank_scaled
            for r in pagerank_keyed(e, n, key="key", src="src", dst="dst",
                                    iterations=2).collect()
        }

    solo = run(edges_one, nodes_one)
    both = run(edges_two, nodes_two)
    assert {kv: v for kv, v in both.items() if kv[0] == "d1"} == solo


# ---------------------------------------------------------------------------
# repeated-span excision (ExactSubstr shape)
# ---------------------------------------------------------------------------


def test_excise_repeated_spans_keeper_keeps_copy_loses(spark):
    from aws_datalake_spark.operators.decontam import excise_repeated_spans

    shared = "one two three four"           # the duplicated 4-token span
    rows = [
        (1, shared + " tail1 tail2"),       # keeper (min doc_id)
        (2, "head " + shared + " other"),   # loses the shared span
        (3, "completely unrelated words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_repeated_spans(df, k=4).collect()}
    assert got[1].n_excised == 0 and got[1].clean_text == rows[0][1]
    assert got[2].n_excised == 4
    assert got[2].clean_text == "head other"
    assert got[3].n_excised == 0 and got[3].clean_text == rows[2][1]


def test_excise_repeated_spans_overlapping_windows_union(spark):
    from aws_datalake_spark.operators.decontam import excise_repeated_spans

    # a 5-token shared run: two overlapping 4-windows, excised as one
    # 5-token region in the non-keeper
    shared = "a1 a2 a3 a4 a5"
    rows = [(1, shared), (2, "x " + shared + " y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_repeated_spans(df, k=4).collect()}
    assert got[2].n_excised == 5
    assert got[2].clean_text == "x y"


def test_excise_repeated_spans_short_docs_untouched(spark):
    from aws_datalake_spark.operators.decontam import excise_repeated_spans

    # both docs identical but SHORTER than k: no k-window exists,
    # nothing to match (whole-doc dedup is a different operator)
    rows = [(1, "same short text"), (2, "same short text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_repeated_spans(df, k=8).collect()}
    assert got[1].n_excised == 0 and got[2].n_excised == 0
    assert got[2].clean_text == "same short text"


def test_excise_repeated_spans_within_doc_repeat_not_cut(spark):
    from aws_datalake_spark.operators.decontam import excise_repeated_spans

    # the span repeats INSIDE one doc only -> cross-doc dedup leaves it
    rows = [(1, "r1 r2 r3 r4 mid r1 r2 r3 r4"),
            (2, "totally different words here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in excise_repeated_spans(df, k=4).collect()}
    assert got[1].n_excised == 0


# ---------------------------------------------------------------------------
# seasonal anomaly + bucketed mutual-NN invariants
# ---------------------------------------------------------------------------


def test_seasonal_anomaly_fence_invariants(spark, sf_dir):
    from aws_datalake_spark.queries.round7 import q_seasonal_anomaly

    rows = q_seasonal_anomaly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # fence definition holds row-by-row
        assert r.is_anomaly == (float(r.abs_dev) > 3.5 * float(r.mad))
        assert r.abs_dev == abs(r.n - r.med)
        assert 0 <= r.hr <= 23
    # the hourly median is an actual observed value of its hour group
    by_hr = {}
    for r in rows:
        by_hr.setdefault(r.hr, []).append(r)
    for hr, grp in by_hr.items():
        meds = {r.med for r in grp}
        assert len(meds) == 1
        assert meds.pop() in {r.n for r in grp}


def test_mutual_nn_bucketed_pairs_are_mutual_and_deterministic(spark, sf_dir):
    from aws_datalake_spark.queries.llm_similarity import llm_mutual_nn_bucketed

    a = sorted((r.id_a, r.id_b) for r in llm_mutual_nn_bucketed(spark, sf_dir).collect())
    b = sorted((r.id_a, r.id_b) for r in llm_mutual_nn_bucketed(spark, sf_dir).collect())
    assert a == b and a            # deterministic, non-empty
    assert all(x < y for x, y in a)  # canonical orientation


# ---------------------------------------------------------------------------
# round-7 ADVICE regressions
# ---------------------------------------------------------------------------

def test_welch_ttest_survives_large_values(spark):
    """ADVICE r06: squaring in int64 wraps past |x| ~ 3.0e9; the square
    must happen in DECIMAL(38,0) so Spark matches a HUGEINT oracle.
    5e9-scale values with real variance would produce garbage t-stats
    (or sign flips) under int64 wraparound."""
    from pyspark.sql import functions as F
    from aws_datalake_spark.operators.stats import welch_ttest_pairs

    big = 5_000_000_000  # > 2^31.5, square overflows int64 by ~1e6x
    rows = [("a", big), ("a", big + 2), ("a", big + 4),
            ("b", big + 100), ("b", big + 102), ("b", big + 104)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = welch_ttest_pairs(df, "g", F.col("v")).collect()[0]
    # exact moments: both groups have sample variance 4, means differ
    # by exactly 100 -> t = -100 / sqrt(4/3 + 4/3) = -61.237244
    assert (r.n_a, r.n_b) == (3, 3)
    assert abs(r.mean_a - float(big + 2)) < 1e-3
    assert abs(r.t_stat - round(-100.0 / (8.0 / 3.0) ** 0.5, 6)) < 1e-6


def test_novelty_checkpoint_carries_hashes_not_strings(spark):
    """ADVICE r06: the pre-explode checkpoint must hold array<long>
    hash60 values, not the ~3x-corpus shingle strings."""
    from aws_datalake_spark.operators.dedup import novelty_scores

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id int, text string",
    )
    out = novelty_scores(df)
    # semantics unchanged: doc 1 owns every gram first, doc 2 restates
    got = {r.doc_id: (r.n_shingles, r.n_novel) for r in out.collect()}
    assert got == {1: (3, 3), 2: (3, 0), 3: (3, 3)}
    # hashing happens INSIDE the array before the checkpoint, so the
    # post-checkpoint physical plan (rooted at Scan ExistingRDD) does
    # no md5 work at all — and therefore never touches gram strings
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "md5" not in plan


def test_containment_hash_arrays_match_string_semantics(spark):
    """ADVICE r06: containment_pairs intersects hash60 arrays instead
    of string arrays; results must be identical (collision-free at
    test scale) on both the capped and uncapped paths."""
    from aws_datalake_spark.operators.dedup import containment_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "quick brown fox jumps over"),  # contained in 1
        (3, "completely different words here now folks"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    base = {(r.id_sub, r.id_sup): (r.n_sub, r.n_sup, r.n_common, r.containment)
            for r in containment_pairs(df, threshold=0.9, min_shingles=3).collect()}
    assert base[(2, 1)] == (3, 8, 3, 1.0)
    capped = {(r.id_sub, r.id_sup): (r.n_sub, r.n_sup, r.n_common, r.containment)
              for r in containment_pairs(
                  df, threshold=0.9, min_shingles=3, max_df=10).collect()}
    assert capped == base


def test_blocklist_empty_terms_short_circuits(spark):
    """ADVICE r06: empty blocklist must yield bl_hits=0 rows, not an
    isin()-with-zero-args error."""
    from aws_datalake_spark.operators.text import blocklist_features

    df = spark.createDataFrame(
        [(1, "anything at all"), (2, "")], "doc_id int, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.bl_hits, r.flagged)
           for r in blocklist_features(df, [], min_hits=1).collect()}
    assert got == {1: (3, 0, False), 2: (0, 0, False)}


# ---------------------------------------------------------------------------
# exact-integer IVF-PQ (hash-certification twin of the float path)
# ---------------------------------------------------------------------------

def _py_pq_reference(vecs, m, k, iters):
    """Independent pure-Python mirror of train+encode for parity."""
    dim = len(vecs[0][1])
    ds = dim // m

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def tdiv(s, n):
        q = abs(s) // n
        return q if s >= 0 else -q

    books = []
    for j in range(m):
        S = [v[j * ds:(j + 1) * ds] for _, v in vecs]
        C = [list(s) for s in S[:k]]
        for _ in range(iters):
            sums = [[0] * ds for _ in range(k)]
            cnt = [0] * k
            for s in S:
                a = min(range(k), key=lambda c: (d2(s, C[c]), c))
                cnt[a] += 1
                for p in range(ds):
                    sums[a][p] += s[p]
            C = [[tdiv(sums[c][p], cnt[c]) for p in range(ds)] if cnt[c]
                 else C[c] for c in range(k)]
        books.append(C)
    codes = {}
    for vid, v in vecs:
        codes[vid] = [
            min(range(k), key=lambda c: (d2(v[j * ds:(j + 1) * ds], books[j][c]), c))
            for j in range(m)
        ]
    return books, codes


def test_pq_exact_train_encode_parity_with_python(spark):
    """Spark-side exact train/encode must reproduce an independent
    pure-Python Lloyd bit-for-bit (incl. negative-sum trunc division
    and lowest-cid tiebreaks)."""
    from aws_datalake_spark.operators.pq import pq_encode_exact, pq_train_exact

    rng_vals = [((i * 2654435761) % 2001) - 1000 for i in range(12 * 8)]
    vecs = [(i, rng_vals[i * 8:(i + 1) * 8]) for i in range(12)]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<long>"
    )
    books = pq_train_exact(df, m=2, k=3, sample=12, iters=2)
    ref_books, ref_codes = _py_pq_reference(vecs, m=2, k=3, iters=2)
    assert books == ref_books
    got = {r.vec_id: list(r.pq_code)
           for r in pq_encode_exact(df, books).collect()}
    assert got == ref_codes


def test_pq_exact_topk_is_jvm_side_and_broadcast(spark):
    """The exact ADC scan must stay JVM-side (no Python evals in the
    corpus path post-encode) and join probe LUTs via broadcast."""
    from pyspark.sql import functions as F
    from aws_datalake_spark.operators.pq import (
        ann_ivf_pq_topk_exact,
        pq_train_exact,
    )

    vals = [((i * 40503 + j * 97) % 401) - 200 for i in range(40) for j in range(8)]
    df = spark.createDataFrame(
        [(i, vals[i * 8:(i + 1) * 8]) for i in range(40)],
        "vec_id long, embedding array<long>",
    )
    books = pq_train_exact(df, m=2, k=4, sample=40, iters=2)
    cents = df.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    qs = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_ivf_pq_topk_exact(df, qs, cents, books, k_neighbors=4, n_probe=2)
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    for q in (0, 1, 2):
        ranked = sorted((r for r in rows if r.query_id == q), key=lambda r: r.rank)
        assert [r.rank for r in ranked] == list(range(1, len(ranked) + 1))
        dists = [r.adc_dist for r in ranked]
        assert dists == sorted(dists)           # exact ints, monotone
        assert all(isinstance(d, int) for d in dists)
        assert all(r.neighbor_id != q for r in ranked)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_mutual_nn_gemm_matches_join_form(spark):
    """PERF §23: the GEMM top-1 per block + exact re-score must equal
    the pair-join + window form bit-for-bit (values AND argmax
    tiebreaks), including blocks with exact duplicates and
    singleton/empty blocks."""
    import numpy as np
    from aws_datalake_spark.operators.similarity import (
        mutual_nearest_neighbors,
        mutual_nearest_neighbors_gemm,
    )

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for blk in range(6):
        n = [1, 2, 5, 40, 63, 9][blk]  # singleton block included
        base = rng.normal(0, 1, (n, 16))
        for i in range(n):
            rows.append((vid, [float(x) for x in base[i]], blk))
            vid += 1
    # exact duplicates inside one block (the realistic tie case)
    rows.append((vid, rows[10][1], rows[10][2])); vid += 1
    rows.append((vid, rows[10][1], rows[10][2])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    a = sorted(map(tuple, mutual_nearest_neighbors(df).collect()))
    b = sorted(map(tuple, mutual_nearest_neighbors_gemm(df).collect()))
    assert a == b and a


def test_mutual_nn_gemm_plan_has_no_pair_window(spark, sf_dir, monkeypatch):
    """PERF §23 plan gate: the production mutual-NN must run the
    per-block top-1 as a grouped Arrow GEMM (FlatMapGroupsInPandas),
    with NO pair-exploding window (the join form's Window over
    Σ block² rows) and no interpreted HOF signature (the LSH
    signature unrolls to a codegen'd element_at chain — zero
    `aggregate(zip_with` below the grouping)."""
    from aws_datalake_spark.queries.llm_similarity import llm_mutual_nn_bucketed

    # the GEMM + re-score stages sit below eager checkpoints since the
    # r11 duplication cut — disable truncation so the whole plan is
    # visible to the assertions
    import aws_datalake_spark.operators.dedup_cluster as dc

    monkeypatch.setattr(dc, "_truncate", lambda df: df)
    out = llm_mutual_nn_bucketed(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "Window" not in plan
    # the only zip_with/aggregate folds allowed are the <=N-row exact
    # re-score of winning pairs (2 norms + 1 dot per side-join row);
    # the signature itself must be the unrolled chain
    assert plan.count("zip_with") <= 6


def test_pagerank_materializes_edges_once(spark):
    """PERF §26: the caller's edge lineage (typically a fact-fact
    join + distinct) must execute exactly ONCE, not once per power
    iteration. An accumulator inside a UDF in the edge lineage counts
    evaluations: 5 iterations must not multiply it."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType
    from aws_datalake_spark.operators.graph import pagerank_fixed_point

    acc = spark.sparkContext.accumulator(0)

    def _tap(x):
        acc.add(1)
        return x

    tap = F.udf(_tap, LongType())
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "s long, d long"
    ).select(tap("s").alias("src"), F.col("d").alias("dst"))
    out = pagerank_fixed_point(edges, iterations=5)
    assert out.count() == 3
    # edge lineage ran once for the materialization plus once for the
    # nodes/outdeg pre-aggregates that consume the SAME materialized
    # frame — the tap must count each edge row a BOUNDED number of
    # times (1 with perfect reuse), never once per iteration
    assert acc.value <= 4 * 2, acc.value  # 4 edges x <=2 evals
