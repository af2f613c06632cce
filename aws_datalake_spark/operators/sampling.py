"""Deterministic corpus sampling and training-order assignment.

Random sampling via an RNG is a rerun hazard in a data pipeline: a
retried task would draw different rows. Everything here derives
randomness from a content-stable hash (seeded md5 → uniform in
[0, 1)), so sampling decisions are a pure function of (seed, id) —
reproducible across retries, engines, and scales, and pushable to
the scan (a sampling filter is just a projection predicate).

100 TB notes:
* stratified_sample is filter-only: no shuffle, scan-bound, and the
  predicate survives column pruning (only id + stratum are read
  when the text is not selected downstream).
* training_order shuffles once on shard id; within-shard positions
  come from a PARTITIONED row_number (one task per shard). Pick
  n_shards ≈ a few × cluster cores so shards stay task-sized; for
  mega-shards, compose with packing.global_exclusive_cumsum instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aws_datalake_spark.operators.text import hash60

#: denominator for the hash→uniform map; 1e6 keeps u exactly
#: representable and identically rounded in every engine.
U_BUCKETS = 1_000_000


def hash_uniform(col: Column, seed: str = "s42") -> Column:
    """Deterministic uniform in [0,1): (hash60(seed‖id) mod 1e6)/1e6."""
    return (hash60(col.cast("string"), seed=seed) % U_BUCKETS).cast("double") / F.lit(
        float(U_BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "s42",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by the
    content-stable uniform — the corpus-mixing primitive (sample
    high-quality sources up, boilerplate down)."""
    rate = F.lit(float(default_rate))
    for k in sorted(rates):  # deterministic CASE order
        rate = F.when(F.col(stratum_col) == k, F.lit(float(rates[k]))).otherwise(rate)
    return df.withColumn("__u", F.round(hash_uniform(F.col(id_col), seed), 6)).filter(
        F.col("__u") < rate
    )


def training_order(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: str = "s42",
) -> DataFrame:
    """Deterministic global shuffle for training: shard by hash, order
    within shard by (hash, id): ``(id, shard, pos)``. Equivalent to a
    seeded permutation, but reproducible and restartable — the
    property pretraining dataloaders need for mid-epoch resume."""
    h = df.select(
        id_col,
        hash60(F.col(id_col).cast("string"), seed=seed).alias("__h"),
    ).withColumn("shard", (F.col("__h") % n_shards).cast("int"))
    win = Window.partitionBy("shard").orderBy("__h", id_col)
    return h.select(
        id_col, "shard", F.row_number().over(win).cast("long").alias("pos")
    )


def median_threshold_filter(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    cut_col: str = "cut",
) -> DataFrame:
    """Keep rows whose ``value_col`` is ≥ their group's lower median
    — the adaptive-threshold corpus filter ("drop the worse half of
    every source"). The cut is an exact ORDER STATISTIC (element at
    position ⌈n/2⌉ under (value, id) order), not an interpolated
    percentile: deterministic, engine-portable, tie-stable.

    SCALE: one row_number window per group (a task per group —
    groups are sources/domains, small cardinality); the cut table is
    |groups| rows and broadcasts back. For millions of groups swap
    in approx_percentile and give up cross-engine exactness."""
    win = Window.partitionBy(group_col).orderBy(value_col, id_col)
    r = (
        df.withColumn("__rn", F.row_number().over(win))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    )
    cuts = r.filter(F.col("__rn") == F.expr("(__n + 1) div 2")).select(
        group_col, F.col(value_col).alias(cut_col)
    )
    return df.join(F.broadcast(cuts), group_col).filter(
        F.col(value_col) >= F.col(cut_col)
    )


def mixing_weights(
    df: DataFrame,
    group_col: str = "source",
    weight_col: str = "n_tokens",
) -> DataFrame:
    """Per-group corpus mixing weights ∝ sqrt(group size) — the
    standard square-root temperature rebalancing for multi-source
    pretraining mixes (large sources damped, small sources boosted).

    Determinism: sqrt is one correctly-rounded IEEE op; each group's
    sqrt is scaled to a BIGINT (round(·10⁶)) before the global sum,
    so the weight is an exact integer ratio — no float-sum order
    sensitivity anywhere.

    SCALE: group aggregate shuffles once; the normalization total is
    an unpartitioned window over the GROUPS-SIZED frame (one task,
    bounded by the number of groups — fine to millions). An agg +
    crossJoin would re-execute the corpus scan for the total branch:
    Spark plans DAG subtrees independently, so the tiny total would
    cost a second full pass over the input.
    """
    grp = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(weight_col)).alias("n_weight"),
    )
    scaled = grp.withColumn(
        "__s",
        F.round(F.sqrt(F.col("n_weight").cast("double")) * F.lit(1000000.0), 0)
        .cast("long"),
    )
    return (
        scaled.withColumn(
            "__t", F.sum("__s").over(Window.partitionBy(F.lit(1)))
        )
        .select(
            group_col,
            "n_docs",
            F.col("n_weight").cast("long").alias("n_weight"),
            # raw integer-ratio double; no round (engine-exact as is)
            (
                F.col("__s").cast("double") / F.col("__t").cast("double")
            ).alias("weight"),
        )
    )


def budgeted_sample(
    df: DataFrame,
    token_budget: int,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: str = "s42",
) -> DataFrame:
    """Sample the corpus down to ~``token_budget`` tokens, allocating
    the budget across groups by sqrt-temperature mixing weights
    (:func:`mixing_weights`) — the full data-mixing recipe in one
    operator: rate_g = min(1, round(w_g·budget) / tokens_g), each row
    kept iff its content-stable uniform < rate_g.

    Every arithmetic step is a rounded IEEE op mirrored by the SQL
    oracle, so the sampled id set is engine-exact and reproducible
    across retries/backfills.

    SCALE: the rates table is groups-sized and broadcast; the corpus
    is filtered in place — no shuffle of the big side at all.
    """
    w = mixing_weights(df, group_col=group_col, weight_col=weight_col)
    rates = w.select(
        group_col,
        F.when(
            F.col("n_weight") > 0,
            F.least(
                F.lit(1.0),
                F.round(F.col("weight") * F.lit(float(token_budget)), 0)
                / F.col("n_weight").cast("double"),
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .withColumn("__u", F.round(hash_uniform(F.col(id_col), seed), 6))
        .filter(F.col("__u") < F.col("rate"))
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: str = "s42",
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): k items weighted
    without replacement, with the unbiased per-item weight estimator
    ``w_est = max(w, 1/tau)`` (tau = the (k+1)-th smallest priority).
    An item is kept iff its priority ``u/w < tau``, i.e. with
    probability ``min(1, w*tau)``, so the Horvitz-Thompson estimator
    is ``w / min(1, w*tau) = max(w, 1/tau)`` — sums over the sample
    estimate sums over the population with provably near-optimal
    variance.

    Each item's priority is ``u / w`` with ``u`` the content-stable
    uniform (:func:`hash_uniform`); taking the k smallest priorities
    is a weighted draw. Everything is a single IEEE division plus a
    distributed top-(k+1) (``orderBy().limit()`` = per-partition
    partial top-k, no global sort shuffle), so the selected set and
    estimators are engine-exact and reproducible.

    Returns ``(id_col, w, priority, w_est)`` for the k kept items.
    """
    pri = (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("double").alias("w"),
            (hash_uniform(F.col(id_col), seed) / F.col(weight_col).cast("double")).alias(
                "priority"
            ),
        )
    )
    top = pri.orderBy("priority", id_col).limit(k + 1)
    w_all = Window.partitionBy(F.lit(1))
    w_ord = Window.partitionBy(F.lit(1)).orderBy("priority", id_col)
    return (
        top.withColumn("_rn", F.row_number().over(w_ord))
        .withColumn("_tau", F.max("priority").over(w_all))
        .withColumn("_cnt", F.count("*").over(w_all))
        .filter(F.col("_rn") <= k)
        .select(
            id_col,
            "w",
            "priority",
            F.when(
                F.col("_cnt") == k + 1,
                F.greatest(F.col("w"), F.lit(1.0) / F.col("_tau")),
            )
            .otherwise(F.col("w"))
            .alias("w_est"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s42",
) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) that cannot leak
    near-duplicates across splits: every doc in a near-dup cluster
    (connected component of ``pairs``) is assigned by its CLUSTER
    representative's hash, so the whole cluster lands in one split;
    singletons hash on their own id. Returns ``(id_col, split)``.

    Naive per-doc random splits leak: a train doc's near-copy in the
    test set inflates eval. Component resolution is the same bounded
    iterative operator as dedup (operators/dedup_cluster.py); the
    split itself is a content-stable hash — reproducible across
    backfills, no stored split table needed.
    """
    from aws_datalake_spark.operators.dedup_cluster import connected_components

    comp = connected_components(pairs)
    joined = df.join(
        comp.withColumnRenamed("node", "__node"),
        F.col(id_col) == F.col("__node"),
        "left",
    )
    key = F.coalesce(F.col("cluster_id"), F.col(id_col)).cast("string")
    bucket = F.floor(hash_uniform(key, seed) * 10)
    split = (
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return joined.select(F.col(id_col), split.alias("split"))


def importance_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    alpha: float = 0.5,
    ngram_max: int = 1,
) -> DataFrame:
    """DSIR-inspired importance weighting (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every corpus doc by how target-like its hashed-unigram
    distribution is, so a downstream sampler (budgeted_sample /
    priority_sample) can resample raw data toward the target domain.

    Published recipe adapted for engine-exact reproducibility: DSIR
    scores with a log-likelihood ratio; transcendental ``ln`` is not
    bit-identical across engines, so the weight here is the log-free
    analogue  w(doc) = Σ_b c_b(doc) · r_b  with
    r_b = ((t_b+α)/(T+αB)) / ((s_b+α)/(S+αB)) — the smoothed
    target/source probability ratio per hash bucket, rounded to 6
    decimals before the exact scaled-long accumulation (the
    _shared.dsum discipline), making w a pure function of the data.
    Ranking is monotone-equivalent to a per-token arithmetic-mean
    ratio; docs rich in target-heavy buckets score high.

    Scale shape: both histograms are one agg each (B ≤ 4096 rows);
    the ratio table broadcasts; per-doc scoring is one explode +
    one broadcast join + one groupBy(id) — corpus text never
    shuffles (tokens reduce to (id, bucket) counts first).

    Buckets use the md5-prefix hash (cross-engine: DuckDB
    ``('0x'||substr(md5(w),1,15))::BIGINT``) — same family as
    sampling's hash_uniform. ``ngram_max=2`` hashes bigrams alongside
    unigrams (the published DSIR feature set); the oracle-matched
    query keeps unigrams, the bigram path is pytest-pinned.
    """
    B = n_buckets

    from aws_datalake_spark.operators.text import ngrams

    def bucketed(df: DataFrame) -> DataFrame:
        from aws_datalake_spark.operators.dedup_cluster import _truncate
        from aws_datalake_spark.operators.text import spread

        toks_df = spread(df.select(id_col, text_col)).select(
            F.col(id_col), F.split(F.col(text_col), " ").alias("__toks")
        )
        feats = F.col("__toks")
        for n in range(2, ngram_max + 1):
            feats = F.concat(feats, ngrams("__toks", n))
        if ngram_max > 1:
            # the concat-of-transforms is interpreted: stage it as an
            # attribute before the explode (PERF §21)
            toks_df = _truncate(toks_df.select(F.col(id_col), feats.alias("__f")))
            feats = F.col("__f")
        exploded = toks_df.select(
            F.col(id_col), F.explode(feats).alias("__w")
        ).select(
            id_col,
            (
                F.conv(F.substring(F.md5("__w"), 1, 15), 16, 10).cast("long")
                % F.lit(B)
            ).alias("__b"),
        )
        # (id, bucket) rows are 16 bytes: materialize once — the frame
        # is read three times (histogram, total count, per-doc scorer)
        return _truncate(exploded)

    src = bucketed(corpus)
    tgt = bucketed(target)
    src_hist = src.groupBy("__b").agg(F.count(F.lit(1)).alias("s_b"))
    tgt_hist = tgt.groupBy("__b").agg(F.count(F.lit(1)).alias("t_b"))
    s_tot = src.count()
    t_tot = tgt.count()
    # dense ratio table over all B buckets (unseen buckets get the
    # smoothing mass); tiny, broadcast to the scorers
    spark = corpus.sparkSession
    buckets = spark.range(B).select(F.col("id").alias("__b"))
    ratio = (
        buckets.join(src_hist, "__b", "left")
        .join(tgt_hist, "__b", "left")
        .select(
            "__b",
            F.round(
                (
                    (F.coalesce("t_b", F.lit(0)) + F.lit(alpha))
                    / F.lit(float(t_tot) + alpha * B)
                )
                / (
                    (F.coalesce("s_b", F.lit(0)) + F.lit(alpha))
                    / F.lit(float(s_tot) + alpha * B)
                ),
                6,
            ).alias("__r"),
        )
    )
    per_bucket = src.groupBy(id_col, "__b").agg(F.count(F.lit(1)).alias("__c"))
    return (
        per_bucket.join(F.broadcast(ratio), "__b")
        .groupBy(id_col)
        .agg(
            (
                F.sum(
                    F.round(F.col("__c") * F.col("__r") * F.lit(1e6), 0).cast(
                        "long"
                    )
                ).cast("double")
                / F.lit(1e6)
            ).alias("imp_weight"),
            F.sum("__c").alias("n_tokens"),
        )
    )


def waterfill_budget(
    avail: DataFrame,
    budget: int | None = None,
    key_col: str = "source",
    avail_col: str = "n_tokens",
    budget_frac: tuple[int, int] | None = None,
) -> DataFrame:
    """Max-min fair token-budget allocation (WATERFILLING) with
    per-source caps: every source receives ``min(available, λ)``
    with the water level λ chosen so allocations sum to ``budget`` —
    small sources keep everything, large sources are clipped equally.
    This is the standard fair-division answer to "spend B tokens
    across N corpora without letting the biggest dominate" (the
    capped complement of temperature mixing).

    Set-based, no iteration: sort sources by availability, one
    cumulative-sum window finds the pivot (the largest prefix whose
    members fit under the level implied by the remaining budget),
    arithmetic is pure int64 — the fractional water level is
    realized as floor(λ) plus one extra token to the first
    ``remainder`` clipped sources in sort order, so allocations are
    integers, conserve the budget EXACTLY, and hash-match any
    engine. If total availability ≤ budget everyone gets everything.

    The budget is either a literal ``budget`` int, or — when the
    budget is a fraction of total availability — ``budget_frac=(num,
    den)`` computes ``(total * num) div den`` INSIDE the plan from
    the window total the operator already maintains. A caller that
    instead derives the budget via ``df.agg(sum).collect()`` launches
    a separate job over the same upstream DAG and the corpus is
    scanned twice (VERDICT r03 item 2); the fractional form keeps the
    whole allocation a single-scan single-DAG query. The ``total *
    num`` product runs in DECIMAL(38,0) (int64 would wrap for large
    numerators before the div); the quotient and all later arithmetic
    are exact int64 `div`, nonnegative operands ⇒ floor == truncate
    in any engine.

    Returns ``(key_col, avail_col, alloc)``.
    """
    if (budget is None) == (budget_frac is None):
        raise ValueError("waterfill_budget: pass exactly one of budget / budget_frac")
    # frame bound: one row per allocation KEY (source/domain — the
    # thing budgets are set over), not per document; thousands at
    # most, so the unpartitioned sort window is safe (r05 sweep)
    w_sort = Window.orderBy(avail_col, key_col)
    w_all = Window.partitionBy(F.lit(1))
    s = (
        avail.select(
            key_col, F.col(avail_col).cast("long").alias(avail_col)
        )
        .withColumn("__rn", F.row_number().over(w_sort))
        .withColumn("__cum", F.sum(avail_col).over(w_sort))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
        .withColumn("__total", F.sum(avail_col).over(w_all))
    )
    if budget_frac is not None:
        num, den = (int(budget_frac[0]), int(budget_frac[1]))
        if den <= 0:
            raise ValueError("waterfill_budget: budget_frac denominator must be > 0")
        if num < 0:
            raise ValueError("waterfill_budget: budget_frac numerator must be >= 0")
        # DECIMAL(38,0) product: total*num can exceed int64 long
        # before the div (ADVICE r04 item 4) — decimal `div` returns
        # an exact BIGINT, same discipline as token_budget_plan
        B = F.expr(
            f"(CAST(__total AS DECIMAL(38,0)) * {num}) div {den}"
        ).cast("long")
    else:
        B = F.lit(int(budget)).cast("long")
    # a prefix position qualifies while funding every LATER source at
    # this source's own level still exceeds the budget's remainder —
    # i.e. the water settles above this source's availability
    fits = (B - F.col("__cum")) >= (
        (F.col("__n") - F.col("__rn")) * F.col(avail_col)
    )
    s = (
        s.withColumn("__B", B)
        .withColumn(
            "__pvt",
            F.max(F.when(fits, F.col("__rn")).otherwise(F.lit(0))).over(w_all),
        )
        .withColumn(
            "__pvt_cum",
            F.max(F.when(fits, F.col("__cum")).otherwise(F.lit(0))).over(w_all),
        )
        # TRUE integral div for the water level (floor-of-double
        # division loses ulps past 2^53 and diverges from an exact
        # integer oracle); operands nonnegative ⇒ truncate == floor
        .withColumn(
            "__lvl",
            # CASE guards the all-sources-fit case (__n == __pvt),
            # where the level is never used but the column still
            # evaluates — integral div by zero would raise under ANSI
            F.expr(
                "CASE WHEN __n > __pvt"
                " THEN (__B - __pvt_cum) div (__n - __pvt) ELSE 0 END"
            ).cast("long"),
        )
        .withColumn(
            "__extra",  # first `__extra` clipped sources get +1
            (F.col("__B") - F.col("__pvt_cum"))
            - F.col("__lvl") * (F.col("__n") - F.col("__pvt")),
        )
    )
    alloc = F.when(F.col("__total") <= F.col("__B"), F.col(avail_col)).otherwise(
        F.when(F.col("__rn") <= F.col("__pvt"), F.col(avail_col)).otherwise(
            F.col("__lvl")
            + F.when(
                F.col("__rn") - F.col("__pvt") <= F.col("__extra"), F.lit(1)
            ).otherwise(F.lit(0))
        )
    )
    return s.select(
        key_col, avail_col, alloc.cast("long").alias("alloc")
    )


def curriculum_bins(
    df: DataFrame,
    score_col: str = "quality_score",
    id_col: str = "doc_id",
    quantiles: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Curriculum-learning bin assignment: split the corpus into
    ``len(quantiles)+1`` quality tiers by EXACT quantile edges —
    training recipes feed easy/high-quality tiers first (curriculum)
    or mix tiers at fixed rates.

    Scale path: ALL edges come from ONE shared-pass narrowing
    (operators/order_stats.exact_quantiles — one histogram per round
    serves every quantile simultaneously; per-pass state is ~4096 agg
    groups per edge, never a data shuffle, no global sort), computed
    on the 6-dp fixed-point score so the edge is an exact integer in
    every engine; bin assignment is then a scan-side projection (sum
    of compare-against-literal indicators). The fixed-point frame is
    persisted for the duration of the edge search (the narrowing
    passes re-read it), then unpersisted — the returned projection
    re-derives from source lineage, costing exactly one scan when the
    caller executes it. No stage sees more than the scan.
    """
    from aws_datalake_spark.operators.order_stats import exact_quantiles

    base = df.select(
        id_col,
        F.round(F.col(score_col) * 1_000_000.0, 0).cast("long").alias("q6"),
    )
    base.persist()
    try:
        edges = [int(e) for e in exact_quantiles(base, "q6", tuple(quantiles))]
    finally:
        base.unpersist()
    # ascending edges => CASE-chain equivalent: bin = #edges below q6
    bin_col = None
    for e in edges:
        ind = (F.col("q6") > F.lit(e)).cast("int")
        bin_col = ind if bin_col is None else bin_col + ind
    return base.select(id_col, "q6", bin_col.cast("int").alias("bin"))


def token_budget_plan(
    df: DataFrame,
    weights: dict[str, float],
    total_budget: int,
    source_col: str = "source",
    token_count_col: str = "n_tokens",
    default_weight: float = 0.0,
) -> DataFrame:
    """Per-source token-budget / epoch planner (the LLaMA-style data
    recipe step): given target mixing ``weights`` and a global
    ``total_budget`` of training tokens, compute each source's token
    allocation and the implied repeat factor (epochs ×1000 —
    fixed-point so the plan hashes identically across engines).

    epochs > 1000 means the source must repeat to fill its share;
    < 1000 means it is subsampled. One tiny per-source aggregate —
    the corpus is scanned once for (source, token) pairs and never
    shuffled by anything wider than the source key.
    """
    w6 = F.lit(None).cast("long")
    mapping = F.create_map(
        *[x for k, v in sorted(weights.items())
          for x in (F.lit(k), F.lit(int(round(v * 1_000_000))).cast("long"))]
    )
    w6 = F.coalesce(
        mapping.getItem(F.col(source_col)),
        F.lit(int(round(default_weight * 1_000_000))).cast("long"),
    )
    grp = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_count_col).cast("long")).alias("avail_tokens"),
    )
    # integer-exact at any budget: the products run in DECIMAL(38,0)
    # (budget × w6 overflows int64 past ~9.2e12 tokens; a double
    # `floor(a/b)` loses ulps past 2^53 — ADVICE r03) and the
    # quotients use TRUE integral `div`, which Spark defines on
    # decimals and returns BIGINT. All operands are nonnegative, so
    # truncating `div` equals the oracle's floor division.
    return (
        grp.select(
            source_col,
            "n_docs",
            "avail_tokens",
            (F.lit(int(total_budget)).cast("decimal(38,0)") * w6).alias("__num"),
        )
        .withColumn(
            "budget_tokens", F.expr("__num div 1000000").cast("long")
        )
        .select(
            source_col,
            "n_docs",
            "avail_tokens",
            "budget_tokens",
            F.when(
                F.col("avail_tokens") > 0,
                F.expr(
                    "(CAST(budget_tokens AS DECIMAL(38,0)) * 1000)"
                    " div avail_tokens"
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("epochs_x1000"),
        )
    )


def stratified_eval_split(
    df: DataFrame,
    n_eval: int,
    strata_cols: tuple = ("lang", "source"),
    id_col: str = "doc_id",
    seed: str = "s42",
) -> DataFrame:
    """Exact-count stratified eval-set selection by LARGEST-REMAINDER
    apportionment: pick exactly ``n_eval`` rows with each stratum's
    share proportional to its size — the standard way to carve a
    representative held-out set from a mixed corpus without the ±√n
    drift of per-row Bernoulli sampling (a 0.1% eval slice of a rare
    language can round to zero under Bernoulli; largest-remainder
    guarantees every stratum gets ⌊share⌋ or ⌊share⌋+1 and the total
    is EXACTLY n_eval).

    Apportionment: quota_s = n_eval·c_s / C; every stratum gets
    ⌊quota⌋, and the n_eval − Σ⌊quota⌋ leftovers go to the largest
    remainders (ties broken by stratum key — fully deterministic).
    Products run in DECIMAL(38,0); quotients/mods are exact integral
    ops, so allocations hash-match an integer-SQL oracle at any
    corpus size. Within a stratum the winners are the rows with the
    smallest content-stable hash60 (rerun/engine-stable, no RNG).

    Scale shape: one groupBy(strata) count (map-side combinable), a
    window over the STRATA frame only (≤ |strata| rows — the
    single-task window never sees corpus rows), a broadcast join of
    the tiny allocation table back onto the corpus, and one
    per-stratum row_number to take each stratum's k smallest hashes.
    The corpus shuffles once, on the strata key.

    Returns ``(id_col, *strata_cols, split)`` with split ∈
    {'eval', 'train'} for every input row.
    """
    if n_eval < 0:
        raise ValueError("stratified_eval_split: n_eval must be >= 0")
    strata = list(strata_cols)
    w_all = Window.partitionBy(F.lit(1))
    counts = (
        df.groupBy(*strata)
        .agg(F.count(F.lit(1)).alias("__c"))
        # __tot, not __C: Spark resolves column names case-
        # insensitively by default, so a __C would silently REPLACE
        # __c instead of adding a column
        .withColumn("__tot", F.sum("__c").over(w_all))
        .withColumn(
            "__num", F.expr(f"CAST(__c AS DECIMAL(38,0)) * {int(n_eval)}")
        )
        .withColumn("__base", F.expr("__num div __tot").cast("long"))
        .withColumn("__rem", F.expr("__num % __tot").cast("long"))
    )
    # frame bound: one row per STRATUM (the grouped counts table) —
    # bounded by the stratification key's cardinality (r05 sweep)
    rank_w = Window.orderBy(F.desc("__rem"), *strata)
    alloc = (
        counts.withColumn("__extra_rank", F.row_number().over(rank_w))
        .withColumn("__deficit", F.lit(n_eval) - F.sum("__base").over(w_all))
        .withColumn(
            "__n_s",
            F.least(
                F.col("__c"),
                F.col("__base")
                + F.when(
                    F.col("__extra_rank") <= F.col("__deficit"), F.lit(1)
                ).otherwise(F.lit(0)),
            ),
        )
        .select(*strata, "__n_s")
    )
    in_w = Window.partitionBy(*strata).orderBy("__h", id_col)
    return (
        df.select(id_col, *strata)
        .withColumn("__h", hash60(F.col(id_col).cast("string"), seed=seed))
        .withColumn("__rn", F.row_number().over(in_w))
        .join(F.broadcast(alloc), strata)
        .select(
            id_col,
            *strata,
            F.when(F.col("__rn") <= F.col("__n_s"), F.lit("eval"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def histogram_match(
    df: DataFrame,
    bin_col: str,
    target: dict[str, int],
    id_col: str = "doc_id",
    seed: str = "hm",
) -> tuple[DataFrame, DataFrame]:
    """Rejection-sample ``df`` so the ``bin_col`` distribution matches
    integer ``target`` weights (the mixture-rebalance step of corpus
    curation: e.g. force 40/30/30 across languages no matter how
    skewed the crawl is). Returns ``(sampled, report)``.

    Exact-arithmetic plan: with W = Σ weights, the feasible matched
    total is M = min_b floor(n_b·W/w_b) (the scarcest bin binds);
    each bin keeps a_b = floor(M·w_b/W) ≤ n_b rows. Acceptance is
    content-stable and filter-only — keep row iff
    ``hash60(seed‖id) mod U < floor(a_b·U/n_b)`` — so the kept-count
    per bin is deterministic given ids (binomially close to a_b, the
    documented rate-sampling trade every sampler in this module
    makes; an exact-a_b variant would need a per-bin order statistic
    over the corpus). All thresholds are exact integers: no float
    divide anywhere the engines could round differently.

    SCALE: one aggregate for bin counts (|bins| rows), thresholds
    broadcast back, then a pure filter — the corpus is scanned twice
    and shuffled never. Bins absent from ``target`` are dropped.
    """
    from aws_datalake_spark.operators.text import hash60

    if not target or any(w <= 0 for w in target.values()):
        raise ValueError("target must be non-empty positive weights")
    w_total = sum(target.values())
    wmap = F.create_map(
        *[F.lit(x) for kv in target.items() for x in (kv[0], int(kv[1]))]
    )
    counts = (
        df.where(F.col(bin_col).isin(*target.keys()))
        .groupBy(bin_col)
        .agg(F.count(F.lit(1)).alias("n_before"))
        .select(
            bin_col, "n_before", wmap[F.col(bin_col)].alias("w")
        )
    )
    # M = min_b (n_b*W DIV w_b); a_b = M*w_b DIV W; threshold =
    # a_b*U DIV n_b — integer DIV (trunc == floor on positives), NOT
    # `/` (double division would round past 2^53 and can disagree
    # with the oracle's integer `//`); products stay within int64 for
    # any n ≤ ~9e12/U rows per bin
    m = counts.agg(
        F.min(F.expr(f"n_before * {w_total} DIV w")).alias("__m")
    )
    rates = counts.crossJoin(F.broadcast(m)).select(
        bin_col, "n_before", "w",
        F.expr(f"__m * w DIV {w_total}").alias("a_b"),
    ).select(
        bin_col, "n_before", "w", "a_b",
        F.expr(f"a_b * {U_BUCKETS}L DIV n_before").alias("__thr"),
    )
    sampled = (
        df.join(F.broadcast(rates.select(bin_col, "__thr")), bin_col)
        .where(
            (hash60(F.col(id_col).cast("string"), seed=seed) % U_BUCKETS)
            < F.col("__thr")
        )
        .drop("__thr")
    )
    kept = sampled.groupBy(bin_col).agg(F.count(F.lit(1)).alias("n_kept"))
    report = (
        rates.join(kept, bin_col, "left")
        .select(
            bin_col,
            "n_before",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.col("w").alias("target_weight"),
            F.col("a_b").alias("target_rows"),
        )
    )
    return sampled, report
