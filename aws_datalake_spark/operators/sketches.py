"""Sketch-backed operators: heavy hitters, Bloom-pruned joins, HLL rollups.

The reference has no sketch surface (its only aggregate is COUNT —
SURVEY.md §2.5); these are the idiomatic-Spark additions a 100 TB
training-data pipeline needs when exact global state stops fitting:

* ``heavy_hitters`` — frequent-item detection without shuffling the
  full key cardinality: a one-pass candidate sketch (Karp/Misra-Gries
  via ``DataFrame.stat.freqItems``, map-side bounded memory, candidate
  set ≤ 1/support items on the driver) followed by an EXACT counting
  pass restricted to the candidates. The sketch guarantees a superset
  of every item above the support threshold, so the verified output is
  exact and deterministic — sketch error shapes the candidate set,
  never the answer (same detect-then-verify contract as the LSH →
  edit-distance path in ``operators/dedup.py``).

* ``bloom_filter_table`` / ``bloom_prune`` — a Bloom filter built and
  probed entirely with JVM-side expressions (``xxhash64`` → bit
  positions, ``bit_or`` over shifted masks), materialized as a tiny
  ``(word_idx, mask)`` table that broadcasts even when the build-side
  key SET is too wide to ship as an in-list. Probe rows drop before
  the join shuffle when any of the k probed bits is absent; false
  positives are removed by the real join, so results are exact. This
  is the runtime-filter pattern Spark injects for itself on columnar
  scans (spark.sql.optimizer.runtime.bloomFilter.*), exposed as a
  composable operator for sources the optimizer cannot see through.

* ``hourly_hll_partials`` / ``rollup_hll_daily`` — mergeable
  distinct-count rollups on Datasketches HLL (``hll_sketch_agg`` /
  ``hll_union_agg``): hourly partials are computed once per ingest
  increment and daily (or any coarser) uniques come from unioning the
  stored sketches — no re-scan of raw events, union of partials is
  EXACTLY the sketch of the union (tested), estimate error ~1.6% at
  lgConfigK=12 with 4 KiB state per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Heavy hitters: sketch candidates, verify exactly
# ---------------------------------------------------------------------------


def heavy_hitters(df: DataFrame, col: str, support: float) -> DataFrame:
    """Items of ``df[col]`` with frequency > ``support`` of all rows,
    with EXACT counts: ``(col, cnt)``.

    One full scan builds the candidate sketch (detection threshold
    support/2 — freqItems guarantees no false negatives above its
    threshold, the halved margin keeps boundary items in even across
    its per-partition merge order); one counting scan is pruned to the
    candidate in-list before its shuffle, so the aggregation state is
    ≤ 2/support keys no matter the input cardinality.

    Spark's ``freqItems`` requires its support argument ≥ 1e-4; when
    ``support/2`` falls below that the sketch path would throw an
    opaque ``IllegalArgumentException``, so we fall back to the exact
    un-pruned groupBy (correct, just a full-cardinality shuffle — at
    support < 2e-4 the answer set is huge anyway).
    """
    total = df.count()
    if support / 2.0 >= 1e-4:
        cand_row = df.stat.freqItems([col], support / 2.0).collect()[0][0]
        candidates = [c for c in cand_row if c is not None]
        if not candidates:
            empty = df.select(F.col(col), F.lit(0).cast("long").alias("cnt"))
            return empty.limit(0)
        pruned = df.filter(F.col(col).isin(candidates))
    else:
        pruned = df
    return (
        pruned.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > F.lit(float(support)) * F.lit(float(total)))
    )


# ---------------------------------------------------------------------------
# Bloom filter as data: build once, broadcast, prune before the shuffle
# ---------------------------------------------------------------------------

_SEEDS = (0x9E37, 0x85EB, 0xC2B2)  # k=3 hash functions


def _positions(key: Column, n_bits: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(n_bits)) for s in _SEEDS]


def bloom_filter_table(keys: DataFrame, key_col: str, n_bits: int = 1 << 20) -> DataFrame:
    """Aggregate the build-side keys into ``(word_idx, mask)`` rows —
    a Bloom filter of ``n_bits`` bits stored 64 per row.

    Size ``n_bits`` ≈ 10 × expected distinct keys for ~1% false
    positives with k=3. The result has at most n_bits/64 rows
    (2 MiB of longs at the 1<<20 default) regardless of key count —
    that is the whole point: it broadcasts when the key set wouldn't.
    """
    pos = F.array(*_positions(F.col(key_col), n_bits))
    return (
        keys.select(F.explode(pos).alias("_p"))
        .select(
            (F.col("_p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pmod(_p, 64) as int))").alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("mask"))
    )


def bloom_prune(probe: DataFrame, key_col: str, bloom: DataFrame,
                n_bits: int = 1 << 20) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the filter (no false
    negatives; false positives pass through for the real join to
    reject). k broadcast joins against the word table, each followed
    by a bit test — all whole-stage-codegen, no Python.
    """
    out = probe
    for i, p in enumerate(_positions(F.col(key_col), n_bits)):
        b = F.broadcast(
            bloom.select(
                F.col("word_idx").alias(f"_w{i}"), F.col("mask").alias(f"_m{i}")
            )
        )
        out = (
            out.withColumn(f"_p{i}", p)
            .join(b, (F.col(f"_p{i}") / 64).cast("long") == F.col(f"_w{i}"), "inner")
            .filter(
                F.expr(
                    f"(shiftrightunsigned(_m{i}, cast(pmod(_p{i}, 64) as int)) & 1) = 1"
                )
            )
            .drop(f"_p{i}", f"_w{i}", f"_m{i}")
        )
    return out


# ---------------------------------------------------------------------------
# Mergeable HLL distinct rollups (hypertable continuous-aggregate shape)
# ---------------------------------------------------------------------------


def hourly_hll_partials(events: DataFrame, ts_col: str, key_col: str,
                        lg_k: int = 12) -> DataFrame:
    """Per-hour HLL sketch of distinct ``key_col``: ``(hour, sketch)``.

    This is the stored increment: at ingest each new hour (or late
    partition) re-sketches only its own rows. 4 KiB per hour at
    lgConfigK=12.
    """
    return (
        events.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("hour"))
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch"))
    )


def rollup_hll_daily(hourly: DataFrame) -> DataFrame:
    """Union the stored hourly sketches to exact-per-day sketches and
    estimate: ``(day, uniques_est)``. Touches 24 tiny rows per day —
    never the raw events.
    """
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("uniques_est")
        )
    )


def heavy_hitters_by_group(
    df: DataFrame, group_col: str, col: str, support: float
) -> DataFrame:
    """Per-group heavy hitters with EXACT counts: items whose
    frequency within their group exceeds ``support`` of that group's
    rows — ``(group_col, col, cnt)``.

    Same detect-then-verify contract as :func:`heavy_hitters`, lifted
    to groups without per-group passes: candidates come from ONE
    global sketch over the combined ``group␁item`` key, detected at
    threshold ``support · min_group_share / 2``. Any item with
    within-group frequency > support has combined global frequency
    > support · (group rows / total rows) ≥ the detection threshold,
    so the candidate set provably covers every answer; the exact
    counting pass (pruned to candidates before its shuffle) then
    applies each group's own threshold. Candidate count is bounded by
    2 / (support · min_share) — fine when groups are balanced (the
    common corpus-by-language case).

    Spark's ``freqItems`` requires its support argument ≥ 1e-4, so the
    sketch path is only taken when ``support · min_share / 2`` clears
    that bar; for skewed group sizes (any group under ``2e-4/support``
    of the rows) we fall back to the exact un-pruned groupBy — the
    aggregate keys are then unbounded, but the answer is exact rather
    than an opaque ``IllegalArgumentException`` from freqItems.
    """
    totals = df.groupBy(group_col).count().collect()
    n_total = sum(r["count"] for r in totals)
    if n_total == 0:
        return (
            df.select(group_col, col).limit(0)
            .withColumn("cnt", F.lit(0).cast("long"))
        )
    min_share = min(r["count"] for r in totals) / n_total
    combined = df.withColumn(
        "__gk", F.concat_ws("\x01", F.col(group_col), F.col(col))
    )
    detect = support * min_share / 2.0
    if detect >= 1e-4:
        cand_row = combined.stat.freqItems(["__gk"], detect).collect()[0][0]
        candidates = [c for c in cand_row if c is not None]
        if not candidates:
            return (
                df.select(group_col, col).limit(0)
                .withColumn("cnt", F.lit(0).cast("long"))
            )
        combined = combined.filter(F.col("__gk").isin(candidates))
    group_totals = {r[group_col]: r["count"] for r in totals}
    thresholds = [
        (g, float(support) * float(n)) for g, n in group_totals.items()
    ]
    thr = F.create_map(
        *[x for g, t in thresholds for x in (F.lit(g), F.lit(t))]
    )
    return (
        combined.groupBy(group_col, col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > thr[F.col(group_col)])
    )
