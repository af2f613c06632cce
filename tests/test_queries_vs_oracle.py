"""Every registered query must match its DuckDB oracle at sf0.001
(the driver re-checks at sf0.01; tools/check_correctness.py runs
that locally)."""

from __future__ import annotations

import pytest

from aws_datalake_spark.queries import all_oracles, all_queries
from aws_datalake_spark.testing import check_query, duckdb_con
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_SMOKE)


# The handful of queries whose sf0.001 oracle check alone costs 10-50s
# (iterative fits, bucketed NN, partitioned-layout writes). Marked
# `slow` so the driver's time-budgeted pytest gate skips them — they
# stay covered by the driver's own correctness harness and the
# round-end full-registry check_correctness run.
_SLOW_ORACLE = {
    "llm_semantic_dedup_keep",
    "llm_mutual_nn_bucketed",
    "q_graph_hits",
    "llm_embedding_neardup",
    "ref_partitioned_layout",
    "ref_paginated_keyed",
    "ref_txn_hidden_partitioning",
}


def _mark_slow(names):
    return [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ORACLE else n
        for n in names
    ]


@pytest.mark.parametrize("name", _mark_slow(sorted(all_queries())))
def test_query_matches_oracle(spark, con, name):
    fn = all_queries()[name]
    oracle = all_oracles().get(name)
    r = check_query(spark, con, SF_SMOKE, name, fn, oracle)
    assert r.status != "FAIL", r.errors
    if r.status == "ROWS":
        assert r.n_rows >= 0


@pytest.mark.parametrize("name", _mark_slow(sorted(all_oracles())))
def test_oracle_types_not_hash_hostile(con, name):
    """Round-2 driver root cause: DuckDB types integer SUM() as
    HUGEINT (int128) and exact arithmetic as DECIMAL, but the
    driver's value hash is type-sensitive — value-identical results
    still hash-mismatch. Every oracle must CAST such aggregates to
    BIGINT/DOUBLE; this gate catches any regression in ~2s without
    Spark."""
    from aws_datalake_spark.testing import hostile_oracle_types

    offending = hostile_oracle_types(con, all_oracles()[name])
    assert not offending, (
        f"oracle for {name} emits hash-hostile types {offending}; "
        "wrap the aggregate in CAST(... AS BIGINT/DOUBLE)"
    )


def test_harness_is_hash_strict_on_hugeint(spark, con):
    """The local harness must PREDICT the driver's hash: a
    value-identical result whose oracle types the aggregate as
    HUGEINT (DuckDB SUM over integers) must FAIL locally. This is
    the regression that let 13 r02 driver-reds coexist with a green
    local run."""
    from aws_datalake_spark.testing import check_query

    fn = lambda s, d: s.range(3).selectExpr("CAST(sum(id) AS BIGINT) AS s")  # noqa: E731
    bad = "SELECT SUM(x) AS s FROM (VALUES (0), (1), (2)) t(x)"  # HUGEINT
    good = "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (0), (1), (2)) t(x)"
    r_bad = check_query(spark, con, SF_SMOKE, "synthetic", fn, bad)
    assert r_bad.status == "FAIL" and any("type mismatch" in e for e in r_bad.errors)
    r_good = check_query(spark, con, SF_SMOKE, "synthetic", fn, good)
    assert r_good.status == "PASS"


def test_harness_tolerates_int_width_difference(spark, con):
    """Driver evidence (r01/r02 greens): Spark int32 vs DuckDB
    BIGINT hashes identically — both surface as plain ints. The
    strict harness must not false-alarm on width."""
    from aws_datalake_spark.testing import check_query

    fn = lambda s, d: s.range(3).selectExpr("CAST(id AS INT) AS v")  # noqa: E731
    oracle = "SELECT CAST(x AS BIGINT) AS v FROM (VALUES (0), (1), (2)) t(x)"
    r = check_query(spark, con, SF_SMOKE, "synthetic", fn, oracle)
    assert r.status == "PASS", r.errors


def test_check_query_executes_oracle_once(spark, con):
    """ADVICE r03: check_query must run each oracle exactly once
    (rows + column names + hash-strict schema all derive from the
    same Arrow result) — a second execute doubles the whole suite's
    oracle cost."""
    calls = {"n": 0}

    class CountingCon:  # DuckDBPyConnection attrs are read-only
        def __init__(self, inner):
            self._inner = inner

        def execute(self, sql, *a, **kw):
            calls["n"] += 1
            return self._inner.execute(sql, *a, **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    r = check_query(
        spark, CountingCon(con), SF_SMOKE, "probe",
        lambda s, d: s.range(3).selectExpr("id AS n"),
        "SELECT CAST(range AS BIGINT) AS n FROM range(3)",
    )
    assert r.status == "PASS", r.errors
    assert calls["n"] == 1
