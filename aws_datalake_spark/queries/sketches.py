"""Sketch-backed queries: heavy hitters, Bloom-pruned join, HLL rollup.

Driver-contract surface for ``operators/sketches.py``. Two of the
three are fully oracle-checked because the sketches only shape
intermediate candidate sets — the final answers are exact:

* ``llm_heavy_hitters`` — corpus-wide frequent tokens. The candidate
  sketch bounds aggregation state at any corpus size; the verified
  counts are exact, so the DuckDB twin is a plain GROUP BY/HAVING.
* ``q_bloom_pruned_join`` — fact-side rows drop before the join
  shuffle when the Bloom word-table says the key cannot match; the
  real join removes false positives, so the twin is the plain join.
* ``st_distinct_users_hll`` — mergeable Datasketches HLL rollup
  (hourly partials unioned to daily). Estimates are engine-specific
  (DuckDB's approx_count_distinct is a different HLL), so the
  certificate is a BOUNDED-ERROR inequality: the query returns the
  exact per-day distinct plus ``within_bound`` (estimate within
  4·rsd of exact), which DuckDB asserts as exact-count + TRUE —
  hash-green since r08. Mergeability and the error bound are also
  unit-tested in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.queries._shared import o_dsum, t
from aws_datalake_spark.queries.registry import query

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@query(
    "llm_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS token FROM documents
                 WHERE trim(text) <> ''),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok WHERE token <> '')
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok, tot
    WHERE token <> ''
    GROUP BY token, tot.n
    HAVING COUNT(*) > 0.002 * tot.n
    """,
)
def llm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens above 0.2% corpus frequency, exact counts, bounded
    shuffle: candidates from a one-pass sketch, counts verified
    exactly (operators/sketches.py:heavy_hitters)."""
    from aws_datalake_spark.operators.sketches import heavy_hitters
    from aws_datalake_spark.operators.text import tokens_ws

    toks = (
        t(spark, sf_dir, "documents")
        .select(F.explode(tokens_ws(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    return heavy_hitters(toks, "token", 0.002)


@query(
    "q_bloom_pruned_join",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {o_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to urgent orders, with the fact
    scan pre-filtered by a Bloom filter built from the urgent order
    keys (operators/sketches.py). Result is identical to the plain
    join — the filter only prunes, the join still verifies."""
    from aws_datalake_spark.operators.sketches import bloom_filter_table, bloom_prune

    l = t(spark, sf_dir, "lineitem")
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bloom = bloom_filter_table(urgent.select("o_orderkey"), "o_orderkey")
    pruned = bloom_prune(l, "l_orderkey", bloom)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    from aws_datalake_spark.queries._shared import dsum

    return (
        pruned.join(urgent, pruned.l_orderkey == urgent.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_lines"), dsum(rev, "revenue"))
    )


@query(
    "st_distinct_users_hll",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS within_bound
    FROM events GROUP BY 1
    """,
)
def st_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users from stored hourly HLL partials — the
    continuous-aggregate pattern at sketch cost: the daily pass reads
    24 four-KiB sketches per day, never the raw events.

    Rows-only through r07 (the estimate is engine-specific: DuckDB's
    approx_count_distinct is a different HLL). Hash-certified since
    r08 via a BOUNDED-ERROR oracle (VERDICT r07 item 2): the query
    also computes the exact per-day distinct and returns
    ``within_bound`` ⇔ |est − exact| ≤ max(2, 4·rsd·exact) with
    rsd = 1.04/√2^lgK ≈ 1.625% at lgConfigK=12 — DataSketches HLL is
    deterministic for fixed input, and 4·rsd is ~4σ of its error
    envelope, so the boolean is a stable certificate: if the sketch
    path ever drifted out of bound, the hash would go red. The exact
    side is the certification twin only — the production rollup stays
    sketch-only (operators/sketches.py:rollup_hll_daily)."""
    from aws_datalake_spark.operators.sketches import (
        hourly_hll_partials,
        rollup_hll_daily,
    )

    ev = t(spark, sf_dir, "events")
    daily = rollup_hll_daily(hourly_hll_partials(ev, "ts", "user_id"))
    exact = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    rsd = 1.04 / (2.0**12) ** 0.5
    return daily.join(exact, "day").select(
        "day",
        "n_exact",
        (
            F.abs(F.col("uniques_est") - F.col("n_exact"))
            <= F.greatest(F.lit(2.0), F.lit(4.0 * rsd) * F.col("n_exact"))
        ).alias("within_bound"),
    )


@query(
    "llm_heavy_hitters_by_lang",
    oracle=f"""
    WITH tok AS (SELECT lang, unnest({_TOKS}) AS token FROM documents
                 WHERE trim(text) <> ''),
    tot AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n FROM tok
            WHERE token <> '' GROUP BY lang)
    SELECT t.lang, t.token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tok t JOIN tot ON t.lang = tot.lang
    WHERE t.token <> ''
    GROUP BY t.lang, t.token, tot.n
    HAVING COUNT(*) > 0.01 * tot.n
    """,
)
def llm_heavy_hitters_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens above 1% frequency WITHIN their language, exact counts,
    one global candidate sketch over the combined (lang, token) key
    (operators/sketches.py:heavy_hitters_by_group)."""
    from aws_datalake_spark.operators.sketches import heavy_hitters_by_group
    from aws_datalake_spark.operators.text import tokens_ws

    toks = (
        t(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens_ws(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
    )
    return heavy_hitters_by_group(toks, "lang", "token", 0.01)
