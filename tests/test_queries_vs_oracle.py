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


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, con, name):
    fn = all_queries()[name]
    oracle = all_oracles().get(name)
    r = check_query(spark, con, SF_SMOKE, name, fn, oracle)
    assert r.status != "FAIL", r.errors
    if r.status == "ROWS":
        assert r.n_rows >= 0
