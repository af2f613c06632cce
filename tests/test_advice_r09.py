"""Regression tests for the five ADVICE-r09 findings.

1. q_rmst: with ZERO event times (every session censored) both
   engines now return rmst = τ (survival stays 1 on [0, τ]) instead
   of Spark 0.0 vs DuckDB NULL.
2. anova_oneway: the per-group S²/n float fold is an ORDERED-LIST
   reduce (true left fold at any k), not a cumulative window sum
   that silently chunk-associates past ~64 groups in DuckDB.
3. q_hhi_concentration: the docstring describes the share-fold
   formulation actually implemented, not the rejected one-divide
   Σv²/(Σv)² form.
4. bfs_layers: the frontier broadcast hint is gated on the COUNTED
   frontier size, not a fixed hop threshold.
5. q_churn_rate: comment/aliases say weekly (w), matching the
   week_index output.
"""

from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. q_rmst zero-event-times guard
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def censored_lake(spark, tmp_path_factory):
    """An events lake where EVERY session ends within the censoring
    horizon of the lake max — the KM curve never steps."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("censored_lake")
    df = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3], dtype="int64"),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:10:00",
                    "2024-01-01 10:20:00",
                ]
            ),
            "user_id": pd.array([7, 7, 8], dtype="int64"),
            "event_type": ["view", "view", "view"],
            "value": [1.0, 1.0, 1.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(df), str(root / "events.parquet")
    )
    return str(root)


def test_rmst_all_censored_is_tau_engine(spark, censored_lake):
    from aws_datalake_spark.queries.r09_batch import _RMST_TAU, q_rmst

    r = q_rmst(spark, censored_lake).collect()[0]
    assert r.n_event_times == 0
    assert r.rmst == float(_RMST_TAU)


def test_rmst_all_censored_matches_oracle(spark, censored_lake):
    from aws_datalake_spark.queries import all_oracles, all_queries
    from aws_datalake_spark.testing import check_query, duckdb_con

    con = duckdb_con(censored_lake)
    r = check_query(
        spark,
        con,
        censored_lake,
        "q_rmst",
        all_queries()["q_rmst"],
        all_oracles()["q_rmst"],
    )
    assert r.status == "PASS", r.errors


# ---------------------------------------------------------------------------
# 2. anova_oneway ordered-list reduce at k >> 64
# ---------------------------------------------------------------------------


def test_anova_100_groups_exact_left_fold(spark):
    """k=100 groups: the engine's S²/n fold must equal a strict
    sequential left fold in pinned group order, bit-for-bit — the
    regime where the old cumulative-window fold chunk-associates in
    DuckDB."""
    from aws_datalake_spark.operators.stats import anova_oneway

    rows = []
    for g in range(100):
        for i in range(3):
            rows.append((f"g{g:03d}", 10 * g + 3 * i + (g * i) % 7))
    df = spark.createDataFrame(rows, "g string, x long")
    r = anova_oneway(df, "g", F.col("x")).collect()[0]

    # strict left-fold reference in pinned (sorted-group) order
    per_g: dict[str, list[int]] = {}
    for g, x in rows:
        per_g.setdefault(g, []).append(x)
    ssg = 0.0
    n_tot = 0
    s_tot = 0
    q_tot = 0
    for g in sorted(per_g):
        xs = per_g[g]
        n, s, q = len(xs), sum(xs), sum(v * v for v in xs)
        ssg += float(s * s) / float(n)
        n_tot += n
        s_tot += s
        q_tot += q
    ssb = ssg - float(s_tot * s_tot) / float(n_tot)
    ssw = float(q_tot) - ssg
    assert r.k == 100 and r.n == n_tot
    assert r.ss_between == ssb  # bit-exact: same IEEE fold order
    assert r.ss_within == ssw
    k_d, n_d = 100.0, float(n_tot)
    assert r.f_stat == (ssb / (k_d - 1.0)) / (ssw / (n_d - k_d))


def test_anova_engine_no_window_in_plan(spark):
    """The fold must not introduce a single-partition window."""
    from aws_datalake_spark.operators.stats import anova_oneway

    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, x long")
    plan = (
        anova_oneway(df, "g", F.col("x"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_anova_oracles_use_list_reduce():
    import __spark_entry__ as entry

    for name in ("q_anova_f", "q_brown_forsythe"):
        sql = entry.oracle_sql()[name]
        assert "list_reduce" in sql
        assert "OVER (ORDER BY g ROWS UNBOUNDED PRECEDING" not in sql


# ---------------------------------------------------------------------------
# 3. q_hhi_concentration docstring describes the real formulation
# ---------------------------------------------------------------------------


def test_hhi_docstring_matches_implementation():
    from aws_datalake_spark.queries.r09_batch import q_hhi_concentration

    doc = inspect.getdoc(q_hhi_concentration)
    assert "share" in doc
    assert "NOT the one-divide" in doc
    # the old claim ("Exact DECIMAL Σv²/(Σv)²; two correctly-rounded
    # divides") must be gone
    assert "two correctly-rounded divides" not in doc


# ---------------------------------------------------------------------------
# 4. bfs_layers size-gated broadcast
# ---------------------------------------------------------------------------


def test_bfs_layers_same_result_without_broadcast(spark):
    """broadcast_max=0 (never broadcast) must give the identical
    layer histogram — the hint is a physical-plan choice only."""
    from aws_datalake_spark.operators.graph import bfs_layers

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 3)]
    e = spark.createDataFrame(edges, "s long, d long")
    base = sorted(
        (r.hop, r.n_nodes) for r in bfs_layers(e, max_hops=4).collect()
    )
    gated = sorted(
        (r.hop, r.n_nodes)
        for r in bfs_layers(e, max_hops=4, broadcast_max=0).collect()
    )
    assert base == gated
    assert base[0] == (0, 1)


def test_bfs_layers_gate_is_count_based():
    """No fixed hop threshold left in the source; the gate reads the
    counted frontier size."""
    from aws_datalake_spark.operators import graph

    src = inspect.getsource(graph.bfs_layers)
    assert "frontier_n <= broadcast_max" in src
    assert "h <= 2" not in src
    assert "frontier.count()" in src


# ---------------------------------------------------------------------------
# 5. q_churn_rate weekly naming
# ---------------------------------------------------------------------------


def test_churn_rate_weekly_aliases():
    import __spark_entry__ as entry
    from aws_datalake_spark.queries import r09_batch

    sql = entry.oracle_sql()["q_churn_rate"]
    assert "AS w" in sql and "uw" in sql
    assert " AS m" not in sql
    src = inspect.getsource(r09_batch.q_churn_rate)
    assert 'alias("w")' in src and 'alias("m")' not in src


def test_churn_rate_output_unchanged(spark):
    from aws_datalake_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    df = all_queries()["q_churn_rate"](spark, SF_SMOKE)
    assert df.columns == [
        "week_index",
        "active_prev",
        "retained",
        "churned",
        "churn_rate",
    ]
