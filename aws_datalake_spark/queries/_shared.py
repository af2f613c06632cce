"""Shared helpers for query definitions.

Numeric determinism policy: any aggregate whose value the DuckDB
oracle must hash-match is accumulated EXACTLY and order-
independently. Summing raw doubles is order-dependent (partial
aggregation order differs between Spark tasks and DuckDB threads).

The fast exact form scales each value to an integer —
``round(x * 10^scale)`` → BIGINT — sums longs (exact, order-free,
whole-stage-codegen ~6× faster than a decimal sum), then divides
back in DOUBLE. Every step is the IDENTICAL double operation in
both engines (same product, same round-half-away-from-zero on the
same double, exact long sum, correctly-rounded cast and divide), so
values hash-match bit-for-bit.

Bounds: per-value |x|·10^scale and the group total must stay below
2^63 — at the test lake's magnitudes (≤1e6 values, ≤1e6 rows/group,
scale 6) the headroom is ~100×. For unbounded magnitudes use
``dsum_decimal`` (DECIMAL(30,s) accumulation — slower, wider).

Scale must cover the expression's true decimal digits: money columns
carry 2, so a three-factor product like price*(1-disc)*(1+tax)
carries 6 — rounding at a smaller scale lands on half-boundaries
where engines' rounding of intermediate decimals could diverge.

ROUND-ON-OUTPUT caveat (r08, found on q_ewma_smoothing): rounding an
ARBITRARY double quotient to 6 dp is itself engine-divergent when
x·10^6 lands within an ulp of a .5 boundary — Spark rounds via
BigDecimal on the double's exact binary expansion, DuckDB via a
float multiply-and-nearbyint, and one boundary hit in ~2400 rows
flipped the 6th decimal. The safe forms are (a) values that are
already k-dp-representable (the dsum family: scaled-int inputs make
the pre-round value exact) and (b) NO rounding at all — a divide of
exactly-reproducible operands is one correctly-rounded IEEE op and
hash-matches unrounded. For new quotient outputs prefer (b).

PINNED-ORDER FLOAT FOLD caveat (r08, found on q_laspeyres_index): a
cumulative window SUM over doubles is only sequentially-associated up
to DuckDB's vector size — partitions past ~2048 rows get chunk-tree
association and diverge from Spark's streaming frame (measured 3e-15
at ~2000 terms). The windowed fold (kruskal/cramers/shapley class)
is safe for SMALL folds (<= a few hundred terms); for domain-sized
folds use the ORDERED-LIST reduce instead — Spark
``aggregate(transform(array_sort(collect_list(struct(key, term))),
s -> s.term), 0d, (a, x) -> a + x)`` mirrors DuckDB
``list_reduce(list(term ORDER BY key), (p, q) -> p + q)`` as a true
left fold at any size (the Kaplan-Meier / Laspeyres device).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _scaled_long(c: Column, scale: int) -> Column:
    return F.round(c * F.lit(float(10**scale)), 0).cast("long")


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent exact sum of a double expression → double
    (scaled-integer accumulation; see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled_long(c, scale)).cast("double") / F.lit(float(10**scale))
    ).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent mean: exact scaled sum, then double division
    in a fixed order (sum/10^scale, then /count)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(_scaled_long(c, scale)).cast("double")
        / F.lit(float(10**scale))
        / F.count(c).cast("double")
    ).alias(alias)


def dsum_decimal(col: Column | str, alias: str, scale: int = 6) -> Column:
    """DECIMAL(30,s) accumulation — for magnitudes beyond the
    scaled-long bound. Oracle twin: CAST(SUM(CAST(x AS
    DECIMAL(30,s))) AS DOUBLE)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)


def o_dsum(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`dsum` (without alias)."""
    m = 10**scale
    return f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS BIGINT)) AS DOUBLE) / {m}.0"


def o_davg(expr: str, scale: int = 6) -> str:
    """Oracle-side twin of :func:`davg` (without alias)."""
    m = 10**scale
    return (
        f"CAST(SUM(CAST(ROUND(({expr}) * {m}.0) AS BIGINT)) AS DOUBLE) / {m}.0"
        f" / CAST(COUNT({expr}) AS DOUBLE)"
    )


def sc_edges_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier→customer fulfillment edges with INT64 node
    ids (2·suppkey = supplier, 2·custkey+1 = customer — disjoint and
    bijective to the oracles' 'S…'/'C…' labels). The distinct and
    every downstream power-iteration join/aggregate move 8-byte longs
    instead of strings; :func:`render_sc_node` recovers the label in
    the readout projection, so query output is byte-identical to the
    string-keyed form."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_suppkey") * 2).alias("src"),
            (F.col("o_custkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def render_sc_node(c: Column) -> Column:
    """Int node id from :func:`sc_edges_int` → the oracle's label."""
    half = F.shiftright(c, 1).cast("string")
    return F.when(
        c % 2 == 0, F.concat(F.lit("S"), half)
    ).otherwise(F.concat(F.lit("C"), half))
