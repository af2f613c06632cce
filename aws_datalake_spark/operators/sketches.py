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


# ---------------------------------------------------------------------------
# Count-min sketch: bounded-state frequency estimation
# ---------------------------------------------------------------------------


def countmin_table(
    df: DataFrame, col: str, depth: int = 4, width: int = 512,
    seed: str = "cm",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the
    frequency of ``df[col]``, materialized as ``(d, bucket, cnt)``
    rows — at most ``depth × width`` rows regardless of the input's
    key cardinality, so the sketch broadcasts and merges (sketches
    of two datasets ADD cell-wise) where an exact per-key count
    table would not.

    Hashes are the md5-backed :func:`~aws_datalake_spark.operators
    .text.hash60` family seeded per depth row — deterministic and
    shared with the DuckDB oracle twins. The explode multiplies rows
    by ``depth`` but carries only two small ints per row, and the
    aggregate is map-side combinable into bounded state: one scan,
    one shuffle of ≤ depth·width partial cells per task.
    """
    from aws_datalake_spark.operators.text import hash60

    cells = F.array(*[
        F.struct(
            F.lit(i).alias("d"),
            (hash60(F.col(col).cast("string"), seed=f"{seed}{i}")
             % F.lit(width)).alias("bucket"),
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("x"))
        .groupBy(F.col("x.d").alias("d"), F.col("x.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(
    cms: DataFrame, keys: DataFrame, col: str, depth: int = 4,
    width: int = 512, seed: str = "cm",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate
    is min over the ``depth`` probed cells — always ≥ the true count
    (one-sided error ≤ e·N/width with probability 1 − e^−depth).

    The sketch side is ≤ depth·width rows → broadcast hash joins;
    the probe side never shuffles. Missing cells count 0 (key never
    seen). Output: ``(col, est)``.
    """
    from aws_datalake_spark.operators.text import hash60

    probes = keys.select(
        F.col(col),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("d"),
                (hash60(F.col(col).cast("string"), seed=f"{seed}{i}")
                 % F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("x"),
    ).select(col, "x.d", "x.bucket")
    return (
        probes.join(F.broadcast(cms), ["d", "bucket"], "left")
        .select(col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt"))
        .groupBy(col)
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Mergeable fixed-bin histogram quantile sketch
# ---------------------------------------------------------------------------


def binned_histogram(
    df: DataFrame, col: str, lo: float, width: float, n_bins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-bin histogram of ``df[col]``: ``(group…, bin, cnt)``
    with ``bin = clamp(floor((x − lo)/width), 0, n_bins−1)``.

    This is the mergeable counterpart to
    ``operators/order_stats.py:exact_quantile``: exact quantiles
    need rounds of narrowing scans; the fixed-bin sketch is ONE scan
    into ≤ ``n_bins`` cells per group, partials from different
    ingests ADD bin-wise (sum cnt), and any quantile is then read
    from the tiny histogram with error ≤ one bin width. That trade
    is the 100 TB continuous-monitoring shape (per-day latency
    percentiles, per-source length profiles). Bin assignment is the
    identical IEEE double expression in Spark and the oracle —
    engine-portable, no sampling, no RNG.
    """
    bin_c = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(float(lo))) / F.lit(float(width))),
            F.lit(0),
        ),
        F.lit(int(n_bins) - 1),
    ).alias("bin")
    keys = [*(group_cols or []), bin_c]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, qs: list[float], lo: float, width: float,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Read quantile ESTIMATES from a binned histogram: for each q,
    the lower edge of the first bin whose cumulative count reaches
    ``ceil(q · total)`` — ``(group…, q, est, n)``.

    Runs entirely on the ≤ n_bins-per-group histogram, never the raw
    data: a per-group cumulative window over bin order (bounded
    partitions — n_bins rows each), then one aggregate per q. The
    rank threshold and the edge arithmetic are plain double ops,
    identical in the oracle.
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    # frame bound: n_bins rows per group (the histogram itself) —
    # never the input table (r05 sweep)
    w = (
        Window.partitionBy(*gcols).orderBy("bin")
        if gcols else Window.partitionBy().orderBy("bin")
    )
    cum = hist.select(
        *gcols, "bin", "cnt",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cum"),
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    parts = []
    for q in qs:
        rank = F.ceil(F.lit(float(q)) * F.col("n").cast("double"))
        parts.append(
            cum.where(F.col("cum") >= rank)
            .groupBy(*gcols)
            .agg(
                F.lit(float(q)).alias("q"),
                (F.lit(float(lo))
                 + F.min("bin").cast("double") * F.lit(float(width))).alias("est"),
                F.min("n").alias("n"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — oracle-exact
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002):
    per group, the ``k`` smallest distinct md5-60 hashes of ``col``
    — ``(group…, pos, h)``. Unlike HLL (whose register layout is
    engine-specific, so its queries are rows-only checkable), KMV is
    DETERMINISTIC given the hash family: the sketch and its estimate
    hash-match a SQL oracle exactly, and sketches MERGE (k smallest
    of the union of two sketches = sketch of the union).

    SCALE: two-phase top-k — a per-(group, input-partition) window
    prunes to ≤ k rows locally (partition-parallel), then the global
    per-group window ranks only ≤ k·P survivors; the full distinct
    hash set never sorts in one task. The intermediate depends on
    the physical partitioning, the RESULT never does (the k smallest
    of a set are the k smallest however it was pre-pruned).
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.text import hash60

    gcols = list(group_cols or [])
    base = (
        df.select(*gcols, hash60(F.col(col).cast("string"), seed="kmv").alias("h"))
        .distinct()
    )
    pre = base.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy(*gcols, "__pid").orderBy("h")
    cand = (
        pre.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .drop("__pid", "__rn")
    )
    # frame bound: w1 already pruned to k rows PER INPUT PARTITION,
    # so this merge window sees <= n_partitions * k rows per group —
    # never the full hashed input (r05 sweep)
    w2 = Window.partitionBy(*gcols).orderBy("h") if gcols else (
        Window.partitionBy().orderBy("h")
    )
    return (
        cand.withColumn("pos", F.row_number().over(w2).cast("long"))
        .where(F.col("pos") <= k)
        .select(*gcols, "pos", "h")
    )


# 2^60 — the md5-60 hash space size (see text.py:hash60)
_H60_SPACE = 1 << 60


def kmv_estimate(
    sketch: DataFrame, k: int, group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch:
    ``(group…, n_kept, n_distinct_est)``. Groups with fewer than
    ``k`` kept hashes are EXACT (the sketch saw every distinct
    value); saturated groups use the unbiased KMV estimator
    (k−1)·2^60 div h_k (h_k = the k-th smallest hash), computed in
    DECIMAL(38,0) (the product overflows int64) with integral
    division — bit-identical in the SQL oracle. Touches only the
    ≤ k-row-per-group sketch, never the data."""
    gcols = list(group_cols or [])
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("__hk"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0))"
            f" * CAST({_H60_SPACE} AS DECIMAL(38,0)) div __hk AS BIGINT)"
        )
    )
    return agg.select(*gcols, "n_kept", est.alias("n_distinct_est"))


def ams_f2_report(
    df: DataFrame,
    group_col: str,
    item_col: str,
    num_sketches: int = 8,
    seed: str = "ams",
) -> DataFrame:
    """AMS second-frequency-moment sketch vs exact truth, per group:
    ``(group, f2_true, ams_estimate, rel_err)`` — the
    Alon–Matias–Szegedy (STOC'96) tug-of-war estimator, the
    classical mergeable sketch for self-join size / skew estimation,
    shipped WITH its own accuracy harness (the lsh_recall_curve
    pattern: the estimator and its ground truth in one plan).

    Each of K sketches assigns item w a deterministic ±1 sign
    (hash60-seeded — both engines compute the identical bit), keeps
    X_k = Σ_w sign_k(w)·c_w, and estimates F2 as mean_k X_k². Every
    value here is an exact integer (signs, counts, X_k, X_k², Σ);
    only the final mean and rel-err divides are rounded doubles —
    hash-identical cross-engine.

    SCALE: one (group, item) count collapses the corpus; the K-way
    replication happens on the counts frame (explode of a K-literal
    array), and sketch state is K longs per group — the mergeable-
    bounded-state discipline of every sketch in this module.
    """
    from aws_datalake_spark.operators.text import hash60

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # counts feeds the truth aggregate AND the K-way sketch replication
    counts = _truncate(
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__w"))
        .groupBy("__g", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    truth = counts.groupBy("__g").agg(
        F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__c")).alias("__f2")
    )
    ks = F.array(*[F.lit(i) for i in range(num_sketches)])
    signed = counts.select(
        "__g",
        "__c",
        F.explode(ks).alias("__k"),
        "__w",
    ).select(
        "__g",
        "__k",
        (
            (
                F.lit(1)
                - F.lit(2)
                * (
                    hash60(
                        F.concat(
                            F.lit(seed),
                            F.col("__k").cast("string"),
                            F.lit("|"),
                            F.col("__w"),
                        )
                    )
                    % 2
                )
            )
            * F.col("__c")
        ).alias("__sc"),
    )
    sk = signed.groupBy("__g", "__k").agg(F.sum("__sc").alias("__x"))
    est = sk.groupBy("__g").agg(
        F.sum(F.col("__x").cast("decimal(38,0)") * F.col("__x")).alias(
            "__sx2"
        ),
        F.count(F.lit(1)).alias("__kcnt"),
    )
    j = truth.join(est, "__g")
    ams = F.round(
        F.col("__sx2").cast("double") / F.col("__kcnt").cast("double"), 6
    )
    rel = F.round(
        F.abs(
            F.col("__sx2").cast("double") / F.col("__kcnt").cast("double")
            - F.col("__f2").cast("double")
        )
        / F.col("__f2").cast("double"),
        6,
    )
    return j.select(
        F.col("__g").alias(group_col),
        F.col("__f2").cast("long").alias("f2_true"),
        ams.alias("ams_estimate"),
        F.when(F.col("__f2") > 0, rel).alias("rel_err"),
    )
