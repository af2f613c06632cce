"""Empty-input robustness: a lake with 0-row tables (schema intact)
must not crash the core query families — the day-one-partition /
empty-source-directory production case."""

from __future__ import annotations

import os

import pytest

from aws_datalake_spark.catalog import TABLE_NAMES, load_table
from tests.conftest import SF_SMOKE

# families that are structurally exercised by an empty lake; driver-
# collecting ops that REQUIRE data (exact_quantile raises by design,
# freqItems candidates) are covered by their own unit tests instead
EMPTY_SAFE_QUERIES = [
    "q01_pricing_summary",
    "q05_region_revenue",
    "q07_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q18_large_orders",
    "q21_blame_supplier",
    "q_join_full_outer",
    "q_window_topk_per_group",
    "q_set_except",
    "q_rollup",
    "q_pivot",
    "st_tumbling_window",
    "st_session_window",
    "llm_exact_dedup",
    "llm_minhash_lsh_pairs",
    "llm_token_counts",
    "llm_sequence_packing",
    "ref_scd2_merge",
    "ref_snapshot_diff",
    # r09 additions that collapse to zero rows on an empty lake
    "q_max_drawdown",
    "q_churn_rate",
    "q_seasonal_decompose",
    "q_anova_f",
]

# r09 scalar-report queries: they survive an empty lake by emitting
# ONE all-NULL summary row (the Holt fold crashed outright under
# ANSI element_at/slice before the try_element_at + clamp fix)
EMPTY_SCALAR_QUERIES = [
    "q_holt_linear",
    "q_wasserstein_drift",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_lake")
    for name in TABLE_NAMES:
        df = load_table(spark, SF_SMOKE, name).limit(0)
        df.write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", EMPTY_SAFE_QUERIES)
def test_query_survives_empty_lake(spark, empty_sf_dir, name):
    from aws_datalake_spark.queries import all_queries

    df = all_queries()[name](spark, empty_sf_dir)
    assert df.count() == 0


@pytest.mark.parametrize("name", EMPTY_SCALAR_QUERIES)
def test_scalar_query_survives_empty_lake(spark, empty_sf_dir, name):
    from aws_datalake_spark.queries import all_queries

    rows = all_queries()[name](spark, empty_sf_dir).collect()
    assert len(rows) <= 1  # one NULL-state summary row or nothing


def test_dq_audit_on_empty_batch_reports_zero_counts(spark, empty_sf_dir):
    # an empty batch still AUDITS: one row per expectation, all clean
    from aws_datalake_spark.queries import all_queries

    rows = all_queries()["ref_dq_expectations"](spark, empty_sf_dir).collect()
    assert len(rows) > 0
    assert all(r["element_count"] == 0 and r["unexpected_count"] == 0 for r in rows)
