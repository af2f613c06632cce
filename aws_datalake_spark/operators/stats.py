"""Exact-arithmetic descriptive statistics.

``F.corr`` (like any float-moment aggregate) accumulates doubles in
partition order, so two runs — or two engines — can disagree in the
last ulps. For verification-grade analytics this module computes the
five moment sums in EXACT integer arithmetic (inputs are scaled to
integers first, sums are int64/DECIMAL(38,0) — order-independent),
then derives the statistic with only correctly-rounded IEEE-754 ops
(int→double cast, multiply of exact products, sqrt, divide), so the
result is bit-identical across engines and partitionings.

SCALE (100 TB): one map-side-combinable aggregate per group — the
same single-shuffle shape as any groupBy().agg(); no second pass, no
window, no driver math beyond the final expression (which runs
in-plan anyway).

The reference has no statistics surface (SURVEY.md §2.5); this is
engine-extension surface for verification-grade profiling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def exact_corr(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
    by: list[str] | None = None,
) -> DataFrame:
    """Pearson correlation per group from exact integer moments:
    ``(by…, n, corr)``. ``x_int`` / ``y_int`` MUST be integral
    columns (pre-scale fixed-point values upstream, e.g. cents); the
    per-row products and the five sums stay in int64 (caller
    guarantees row products fit — e.g. |x|<=2^20, |y|<=2^30), the
    cross-moment combination is DECIMAL(38,0) (exact up to 38
    digits), and the only inexact steps are the final correctly-
    rounded casts / sqrt / divide. Groups with zero variance in
    either column yield NULL.
    """
    gcols = list(by or [])
    x = x_int.cast("long")
    y = y_int.cast("long")
    # per-row products stay in int64 (caller bounds |x|·|y|); the
    # SUMS accumulate in DECIMAL(38,0) — sum of squared fixed-point
    # values overflows int64 long before 100 TB row counts
    agg = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(x)).alias("sx"),
        F.sum(_dec(y)).alias("sy"),
        F.sum(_dec(x * x)).alias("sxx"),
        F.sum(_dec(y * y)).alias("syy"),
        F.sum(_dec(x * y)).alias("sxy"),
    )
    n, sx, sy = _dec(F.col("n")), _dec(F.col("sx")), _dec(F.col("sy"))
    sxx, syy, sxy = _dec(F.col("sxx")), _dec(F.col("syy")), _dec(F.col("sxy"))
    cov = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    corr = F.when(
        (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))
    )
    return agg.select(*gcols, "n", corr.alias("corr"))


def exact_corr_matrix(
    df: DataFrame,
    cols: dict[str, Column],
) -> DataFrame:
    """Full pairwise Pearson correlation matrix in ONE aggregate:
    ``(col_x, col_y, n, corr)`` for every unordered pair of the named
    integral columns. All k sums, k square-sums, and k·(k−1)/2 cross
    sums accumulate in the same map-combinable pass (DECIMAL(38,0),
    order-independent — see :func:`exact_corr`); the matrix rows are
    exploded from the single aggregate row, so the input is scanned
    exactly once however many pairs are requested. One-pass
    multi-statistic profiling for wide numeric tables.
    """
    names = list(cols)
    longs = {c: cols[c].cast("long") for c in names}
    # internal aliases are POSITIONAL ("__s_0", "__x_0_1"): aliases
    # built from user column names would collide for names containing
    # underscores (cols {"a","b_c"} vs {"a_b","c"})
    idx = {c: i for i, c in enumerate(names)}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(F.sum(_dec(longs[c])).alias(f"__s_{idx[c]}"))
        aggs.append(F.sum(_dec(longs[c] * longs[c])).alias(f"__q_{idx[c]}"))
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            aggs.append(
                F.sum(_dec(longs[a] * longs[b])).alias(f"__x_{idx[a]}_{idx[b]}")
            )
    agg = df.agg(*aggs)
    n = _dec(F.col("__n"))

    def corr(a: str, b: str) -> Column:
        sx, sy = F.col(f"__s_{idx[a]}"), F.col(f"__s_{idx[b]}")
        vx = (n * F.col(f"__q_{idx[a]}") - sx * sx).cast("double")
        vy = (n * F.col(f"__q_{idx[b]}") - sy * sy).cast("double")
        cov = (n * F.col(f"__x_{idx[a]}_{idx[b]}") - sx * sy).cast("double")
        return F.when((vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy)))

    pairs = F.array(*[
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            corr(a, b).alias("corr"),
        )
        for i, a in enumerate(names)
        for b in names[i + 1:]
    ])
    return agg.select(F.col("__n").alias("n"), F.explode(pairs).alias("p")).select(
        F.col("p.col_x").alias("col_x"),
        F.col("p.col_y").alias("col_y"),
        F.col("n").cast("long").alias("n"),
        F.col("p.corr").alias("corr"),
    )


def chi2_feature_scores(
    presence: DataFrame,
    unit_col: str,
    feature_col: str,
    label_col: str,
    top_k: int = 50,
) -> DataFrame:
    """Chi-square feature selection over a (unit, feature, label)
    PRESENCE table (one row per DISTINCT unit×feature — dedupe
    upstream — with the 0/1 label constant per unit): for each
    feature the 2×2 contingency vs the binary label — a = units
    with feature & label, b = with feature & ¬label, c/d the
    complements over the DISTINCT-unit totals — scored

        chi2 = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    and the top_k features by score returned as
    ``(feature, a, b, c, d, chi2)``. The classic
    curation/classification signal: which tokens most separate
    high-quality from low-quality (or lang X from ¬X) documents.

    EXACTNESS: all counts are exact int64; the score is derived in
    DECIMAL(38,0) products cast to double at the end — one
    correctly-rounded divide, bit-identical cross-engine (same
    discipline as exact_corr; sound for N up to ~10⁷ units — beyond
    that the decimal products saturate 38 digits and the score
    should be computed in doubles, which is still deterministic for
    a fixed expression tree).

    SCALE: one distinct + one feature-keyed aggregate; the label
    totals are a broadcast one-row frame; the top-k is a distributed
    TakeOrdered — no unbounded window (VERDICT r05 discipline).
    """
    # per-feature positives/negatives (a and b)
    per_f = (
        presence.select(
            F.col(feature_col).alias("feature"),
            F.col(label_col).cast("int").alias("__l"),
        )
        .groupBy("feature")
        .agg(
            F.sum("__l").cast("long").alias("a"),
            F.sum(1 - F.col("__l")).cast("long").alias("b"),
        )
    )
    totals = (
        presence.select(
            F.col(unit_col).alias("__u"),
            F.col(label_col).cast("int").alias("__l"),
        )
        .distinct()
        .agg(
            F.sum("__l").cast("long").alias("__npos"),
            F.sum(1 - F.col("__l")).cast("long").alias("__nneg"),
        )
    )
    j = per_f.crossJoin(F.broadcast(totals)).select(
        "feature", "a", "b",
        (F.col("__npos") - F.col("a")).alias("c"),
        (F.col("__nneg") - F.col("b")).alias("d"),
    )
    n = _dec(F.col("a") + F.col("b") + F.col("c") + F.col("d"))
    det = _dec(F.col("a")) * _dec(F.col("d")) - _dec(F.col("b")) * _dec(F.col("c"))
    den = (
        (_dec(F.col("a") + F.col("b")) * _dec(F.col("c") + F.col("d")))
        .cast("double")
        * (_dec(F.col("a") + F.col("c")) * _dec(F.col("b") + F.col("d")))
        .cast("double")
    )
    chi2 = F.when(
        den > 0.0,
        (n * det).cast("double") * det.cast("double") / den,
    ).otherwise(F.lit(0.0))
    scored = j.select(
        "feature", "a", "b", "c", "d", F.round(chi2, 6).alias("chi2")
    )
    return scored.orderBy(F.desc("chi2"), "feature").limit(int(top_k))


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact ROC AUC via the tie-corrected Mann-Whitney rank-sum:
    ``(by…, n_pos, n_neg, auc)`` — the standard scalar for "how well
    does this score rank positives above negatives" (quality /
    lang-ID / classifier eval without picking a threshold).

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    with R⁺ the sum of the positives' AVERAGE ranks (ties share the
    mean of their rank range — the Mann-Whitney convention, equal to
    counting ties as half-wins). Average ranks are half-integers, so
    the whole computation runs on DOUBLED ranks: for a score value
    with ``cum`` rows strictly below it and ``cnt`` rows tied at it,
    2·avg_rank = 2·cum + cnt + 1 — exact integers end-to-end, summed
    in DECIMAL(38,0); the single inexact step is the final divide.

    SCALE: the input collapses to one row per DISTINCT score value
    (``score_col`` must be exactly groupable — integral counts,
    fixed-point ints) before the only window runs; the window frame
    is therefore bounded by the score's value DOMAIN (e.g. ≤ a few
    hundred for a token-count score), never by corpus rows — the
    same discipline as the vocab-window fix (VERDICT r05). Per-group
    AUCs partition that window by the group keys.
    """
    gcols = list(by or [])
    from pyspark.sql import Window

    per = (
        df.select(
            *gcols,
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("int").alias("__l"),
        )
        .groupBy(*gcols, "__s")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.sum("__l").cast("long").alias("__np"),
        )
    )
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per.select(
        *gcols,
        "__cnt",
        "__np",
        F.coalesce(F.sum("__cnt").over(w), F.lit(0).cast("long")).alias("__cum"),
    )
    # Σ over values of n⁺(value) · 2·avg_rank(value), exact
    r2 = _dec(F.col("__np")) * _dec(
        2 * F.col("__cum") + F.col("__cnt") + 1
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum(r2).alias("__r2"),
        F.sum("__np").cast("long").alias("n_pos"),
        F.sum(F.col("__cnt") - F.col("__np")).cast("long").alias("n_neg"),
    )
    npos, nneg = _dec(F.col("n_pos")), _dec(F.col("n_neg"))
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (F.col("__r2") - npos * (npos + F.lit(1))).cast("double")
            / (F.lit(2).cast("decimal(38,0)") * npos * nneg).cast("double"),
            6,
        ),
    )
    return agg.select(*gcols, "n_pos", "n_neg", auc.alias("auc"))


def welch_ttest_pairs(
    df: DataFrame,
    group_col: str,
    value_int: Column,
) -> DataFrame:
    """Welch's unequal-variance t-test for EVERY pair of groups:
    ``(group_a, group_b, n_a, n_b, mean_a, mean_b, t_stat, df_w)``
    — the "are these two segments' means actually different" report
    (A/B readouts, source-drift significance) done verification-
    grade. ``value_int`` must be integral (pre-scale to cents /
    fixed-point upstream).

    EXACTNESS: per-group n, Σx, Σx² accumulate exactly
    (DECIMAL(38,0), order-independent); means and sample variances
    are derived per group with ONE correctly-rounded cast+divide
    each, then t = (mean_a − mean_b)/√(s²a/n_a + s²b/n_b) and the
    Welch–Satterthwaite df use only IEEE ops on those — the same
    expression tree the oracle mirrors, so results are bit-identical
    cross-engine.

    SCALE: one map-combinable aggregate to |groups| rows, then a
    self-join on the groups-sized frame — pair work is |groups|²/2,
    never corpus rows.
    """
    x = value_int.cast("long")
    # Square in DECIMAL(38,0), not int64: long*long wraps silently past
    # ~3.0e9 per value, while the DuckDB oracle squares in HUGEINT — the
    # decimal square keeps the two engines bit-identical at any scale.
    xd = _dec(x)
    g = (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(xd).alias("__sx"),
            F.sum(xd * xd).alias("__sxx"),
        )
    )
    n, sx, sxx = _dec(F.col("__n")), F.col("__sx"), F.col("__sxx")
    mean = F.round(sx.cast("double") / F.col("__n").cast("double"), 6)
    # sample variance from exact moments: (n·Σx² − (Σx)²) / (n(n−1))
    var = (n * sxx - sx * sx).cast("double") / (
        n * (n - F.lit(1))
    ).cast("double")
    gstats = g.select(
        "__g",
        F.col("__n").cast("long").alias("__nl"),
        mean.alias("__mean"),
        var.alias("__var"),
    )
    a = gstats.select(
        F.col("__g").alias("group_a"),
        F.col("__nl").alias("n_a"),
        F.col("__mean").alias("mean_a"),
        F.col("__var").alias("__var_a"),
    )
    b = gstats.select(
        F.col("__g").alias("group_b"),
        F.col("__nl").alias("n_b"),
        F.col("__mean").alias("mean_b"),
        F.col("__var").alias("__var_b"),
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    va_n = F.col("__var_a") / F.col("n_a").cast("double")
    vb_n = F.col("__var_b") / F.col("n_b").cast("double")
    se2 = va_n + vb_n
    t_stat = F.when(
        se2 > 0.0,
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 6),
    )
    df_w = F.when(
        se2 > 0.0,
        F.round(
            se2 * se2
            / (
                va_n * va_n / (F.col("n_a") - 1).cast("double")
                + vb_n * vb_n / (F.col("n_b") - 1).cast("double")
            ),
            6,
        ),
    )
    return pairs.select(
        "group_a", "group_b", "n_a", "n_b", "mean_a", "mean_b",
        t_stat.alias("t_stat"), df_w.alias("df_w"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    k: float = 3.5,
    direct_threshold: int = 100_000,
) -> DataFrame:
    """Robust outliers by Median Absolute Deviation: rows where
    ``|x − median| > k · MAD`` (MAD = median of |x − median|), the
    standard heavy-tail-safe alternative to z-scores (one wild value
    corrupts a mean/stddev fence; medians shrug it off). Requires an
    integral value column (exact arithmetic end-to-end). Returns the
    offending rows plus ``abs_dev``, with ``median`` and ``mad`` as
    literal columns.

    SCALE: two exact_quantile calls (iterative histogram narrowing —
    scans with ~4096-group aggregates, no global sort, no data-row
    shuffle) + one filter-only pass. The two medians are bounded
    driver scalars, same class as the iterative-loop control values.
    """
    from aws_datalake_spark.operators.order_stats import exact_quantile

    med = exact_quantile(df, value_col, 0.5, direct_threshold=direct_threshold)
    med = int(med)
    dev = df.select(
        F.abs(F.col(value_col) - F.lit(med)).alias("__dev")
    )
    mad = int(exact_quantile(dev, "__dev", 0.5, direct_threshold=direct_threshold))
    fence = float(k) * float(mad)
    return (
        df.withColumn("abs_dev", F.abs(F.col(value_col) - F.lit(med)).cast("long"))
        .where(F.col("abs_dev").cast("double") > F.lit(fence))
        .withColumn("median", F.lit(med).cast("long"))
        .withColumn("mad", F.lit(mad).cast("long"))
    )


def group_mode(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact mode per group with deterministic lowest-value tiebreak:
    ``(group, mode_value, mode_n)``.

    SCALE: the corpus collapses in ONE map-combinable (group, value)
    aggregate; the ranking window runs over the aggregated
    |groups × distinct values| frame, never corpus rows — the same
    window-above-aggregate discipline as exact_auc. A hot group is
    safe: its corpus rows pre-aggregate map-side.
    """
    from pyspark.sql.window import Window

    counts = (
        df.groupBy(
            F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("__g").orderBy(F.desc("__n"), F.asc("__v"))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__g").alias(group_col),
            F.col("__v").alias("mode_value"),
            F.col("__n").alias("mode_n"),
        )
    )


def ols_by_group(
    df: DataFrame,
    group_cols: list[str],
    x_int: Column,
    y_int: Column,
    y_scale: int = 0,
) -> DataFrame:
    """Exact-moment simple linear regression (OLS) per group:
    ``(group…, n, slope, intercept, r2)`` — the trend readout
    (is revenue growing? how fast? how linear?) computed
    verification-grade. ``x_int`` / ``y_int`` MUST be integral
    (pre-scale fixed-point upstream).

    EXACTNESS: n, Σx, Σy, Σx², Σy², Σxy accumulate exactly in
    DECIMAL(38,0) (order-independent; squares/products taken in
    decimal so no int64 wrap at any magnitude, the welch_ttest_pairs
    lesson). The first-order combos n·Σxy−Σx·Σy and n·Σx²−(Σx)²
    stay decimal-exact; slope / intercept / R² then use only
    correctly-rounded IEEE casts, multiplies, divides in a FIXED
    expression order the oracle mirrors — bit-identical cross-engine.

    Decimal headroom: n·Σy² is the widest term — at n ≤ 10⁴ rows per
    group and |y| ≤ 10¹¹ it reaches ~10³⁰, five orders below the
    DECIMAL(38,0) ceiling; beyond that pre-aggregate or rescale.

    ``y_scale``: the fixed-point scale of ``y_int`` (e.g. 4 for 1e-4
    money units). Slope and intercept divide by 10^y_scale BEFORE
    rounding, so coefficients come back in natural units — and,
    critically, ROUND(·, 6) stays well above the double
    representability cliff (at |v| ≈ 2e9 the ulp is ~4.8e-7, so a
    6-decimal round of the RAW fixed-point intercept is not
    cross-engine stable; in natural units it is).

    SCALE: ONE map-combinable aggregate to |groups| rows; every
    derived column is per-row arithmetic on that bounded frame.
    """
    x = _dec(x_int.cast("long"))
    y = _dec(y_int.cast("long"))
    g = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * x).alias("__sxx"),
        F.sum(y * y).alias("__syy"),
        F.sum(x * y).alias("__sxy"),
    )
    n = _dec(F.col("__n"))
    sx, sy = F.col("__sx"), F.col("__sy")
    sxx, syy, sxy = F.col("__sxx"), F.col("__syy"), F.col("__sxy")
    num = (n * sxy - sx * sy).cast("double")
    den_x = (n * sxx - sx * sx).cast("double")
    den_y = (n * syy - sy * sy).cast("double")
    ydiv = F.lit(float(10**y_scale))
    slope = F.when(den_x > 0.0, F.round(num / den_x / ydiv, 6))
    intercept = F.when(
        den_x > 0.0,
        F.round(
            (sy.cast("double") - (num / den_x) * sx.cast("double"))
            / F.col("__n").cast("double")
            / ydiv,
            6,
        ),
    )
    r2 = F.when(
        (den_x > 0.0) & (den_y > 0.0),
        F.round((num * num) / (den_x * den_y), 6),
    )
    return g.select(
        *group_cols,
        F.col("__n").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def cusum_report(
    df: DataFrame,
    group_col: str,
    order_col: str,
    count_col: str,
    threshold_mult: int = 2,
) -> DataFrame:
    """Offline CUSUM change-point detection per group over an already
    bucketed series (one row per (group, bucket) with an integer
    ``count_col``): ``(group, order, cusum_scaled, alarm)``.

    The textbook recursion S_t = max(0, S_{t−1} + (x_t − μ_g)) is not
    a window sum, but it has a closed form: with C_t = Σ_{j≤t} d_j,
    S_t = C_t − min(0, min_{j≤t} C_j) — two plain window functions.
    Deviations are kept integral by scaling out the mean's division:
    d_t = n_g·x_t − T_g (n_g = buckets in group, T_g = group total),
    so every value, running sum, running min, and the alarm threshold
    ``S_t > threshold_mult · T_g`` are EXACT integers in
    DECIMAL(38,0) — order-independent, oracle-checkable.

    SCALE: the input is the (group, bucket) aggregate, so the windows
    run over |groups × buckets| rows, never raw events, and both are
    PARTITIONED by group — no single-partition global window. One
    bounded aggregate + one broadcast join supply (n_g, T_g).
    """
    from pyspark.sql.window import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # per feeds totals AND the deviation join (PERF §26)
    per = _truncate(
        df.select(
            F.col(group_col).alias("__g"),
            F.col(order_col).alias("__o"),
            F.col(count_col).cast("long").alias("__x"),
        )
    )
    totals = per.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__ng"), F.sum("__x").alias("__tg")
    )
    j = per.join(F.broadcast(totals), "__g")
    d = (_dec(F.col("__ng")) * _dec(F.col("__x")) - _dec(F.col("__tg"))).alias(
        "__d"
    )
    w = Window.partitionBy("__g").orderBy("__o")
    c = F.sum(F.col("__d")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.min(F.col("__c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = F.col("__c") - F.least(F.lit(0).cast("decimal(38,0)"), F.col("__m"))
    return (
        j.select("__g", "__o", d)
        .withColumn("__c", c)
        .withColumn("__m", m)
        .withColumn("__s", s)
        .join(F.broadcast(totals), "__g")
        .select(
            F.col("__g").alias(group_col),
            F.col("__o").alias(order_col),
            F.col("__s").cast("long").alias("cusum_scaled"),
            (
                F.col("__s")
                > _dec(F.lit(threshold_mult)) * _dec(F.col("__tg"))
            ).alias("alarm"),
        )
    )


def interarrival_burstiness(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    min_gaps: int = 5,
) -> DataFrame:
    """Per-key inter-arrival gap statistics and the Goh–Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) ∈ (−1, 1): −1 = perfectly
    periodic, 0 = Poisson, →1 = bursty — the traffic-shape readout
    (bot detection, retry storms, scraper fingerprints):
    ``(key, n_gaps, mean_gap_s, burstiness)``.

    EXACTNESS: timestamps reduce to exact epoch MICROSECONDS
    (both engines integral — epoch seconds as double would not be);
    gap moments n, Σg, Σg² accumulate in DECIMAL(38,0); μ and σ
    convert to SECONDS before any rounding (a 6-decimal round of a
    µs-scale mean sits above the double representability cliff — the
    ols_by_group lesson); B uses only mirrored IEEE ops.

    SCALE: one per-key LAG window (partitioned — never global) over
    events ordered by (ts, tiebreak) for determinism under equal
    timestamps, then ONE map-combinable aggregate to |keys| rows.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("__k").orderBy("__us", "__tb")
    gaps = (
        df.select(
            F.col(key_col).alias("__k"),
            F.unix_micros(F.col(ts_col)).alias("__us"),
            F.col(tiebreak_col).alias("__tb"),
        )
        .select(
            "__k", (F.col("__us") - F.lag("__us").over(w)).alias("__g")
        )
        .where(F.col("__g").isNotNull())
    )
    m = gaps.groupBy("__k").agg(
        F.count("__g").alias("__n"),
        F.sum(_dec(F.col("__g"))).alias("__sg"),
        F.sum(_dec(F.col("__g")) * _dec(F.col("__g"))).alias("__sgg"),
    ).where(F.col("__n") >= min_gaps)
    n_d = F.col("__n").cast("double")
    mean_s = F.col("__sg").cast("double") / n_d / F.lit(1e6)
    var_us2 = (
        _dec(F.col("__n")) * F.col("__sgg") - F.col("__sg") * F.col("__sg")
    ).cast("double") / (n_d * (n_d - F.lit(1.0)))
    sd_s = F.sqrt(var_us2) / F.lit(1e6)
    b = F.when(
        (F.col("__n") >= 2) & (sd_s + mean_s > 0.0),
        F.round((sd_s - mean_s) / (sd_s + mean_s), 6),
    )
    return m.select(
        F.col("__k").alias(key_col),
        F.col("__n").alias("n_gaps"),
        F.round(mean_s, 6).alias("mean_gap_s"),
        b.alias("burstiness"),
    )


def tvd_drift(
    df: DataFrame,
    group_col: str,
    cat_col: str,
) -> DataFrame:
    """Per-group distribution drift vs the global mix as EXACT
    total-variation distance: ``(group, n, tvd_num, tvd_den, tvd)``
    (num/den are exact decimal-integer STRINGS — int64 would wrap at
    corpus scale, ADVICE r07) where
    TVD(p_g, q) = ½ Σ_c |p_g(c) − q(c)| — the log-free drift
    metric (PSI and KL need transcendentals; TVD is a quotient of
    integers). Putting both mixes over the common denominator
    n_g·N gives

        TVD = Σ_c |n_gc·N − n_c·n_g| / (2·n_g·N)

    with every term an exact DECIMAL(38,0) product. Cells MISSING in
    a group still contribute (|0 − q_c|), so the group×category grid
    is materialized from the two bounded marginal frames before the
    cell counts join in.

    SCALE: one (group, category) aggregate collapses the corpus;
    marginals derive from it; the grid is |groups|×|cats| — bounded
    frames cross-joined, never corpus rows. tvd itself is one
    correctly-rounded divide of exact integers.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # cell feeds both marginals, the total, and the grid's left join —
    # four consumers of the corpus-collapsing aggregate (PERF §26)
    cell = _truncate(
        df.groupBy(F.col(group_col).alias("__g"), F.col(cat_col).alias("__c"))
        .agg(F.count(F.lit(1)).alias("__ngc"))
    )
    per_g = cell.groupBy("__g").agg(F.sum("__ngc").alias("__ng"))
    per_c = cell.groupBy("__c").agg(F.sum("__ngc").alias("__nc"))
    total = cell.agg(F.sum("__ngc").alias("__nn"))
    grid = (
        per_g.crossJoin(F.broadcast(per_c))
        .join(cell, ["__g", "__c"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "__g",
            "__ng",
            "__nn",
            F.abs(
                _dec(F.coalesce(F.col("__ngc"), F.lit(0))) * _dec(F.col("__nn"))
                - _dec(F.col("__nc")) * _dec(F.col("__ng"))
            ).alias("__term"),
        )
    )
    out = grid.groupBy("__g", "__ng", "__nn").agg(
        F.sum("__term").alias("__num")
    )
    den = _dec(F.lit(2)) * _dec(F.col("__ng")) * _dec(F.col("__nn"))
    # certificate columns as exact decimal STRINGS (ADVICE r07): the
    # long cast wraps to NULL past 2^63 in non-ANSI mode while the
    # HUGEINT oracle stays exact; decimal(38,0)->string is exact and
    # hash-stable at any scale (the relational_ext total_s device)
    return out.select(
        F.col("__g").alias(group_col),
        F.col("__ng").alias("n"),
        F.col("__num").cast("string").alias("tvd_num"),
        den.cast("string").alias("tvd_den"),
        F.round(F.col("__num").cast("double") / den.cast("double"), 6).alias(
            "tvd"
        ),
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_int: Column,
    group_a: str,
    group_b: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic:
    ``(by…, n_a, n_b, d_num, d_den, d)`` with
    D = max_v |F_a(v) − F_b(v)| — the nonparametric "did this
    distribution shift" readout (drift detection without
    distributional assumptions; Welch answers means, KS answers
    SHAPE). ``value_int`` must be integral (fixed-point upstream).

    EXACTNESS: over the common denominator n_a·n_b,
    D = max_v |cum_a(v)·n_b − cum_b(v)·n_a| / (n_a·n_b) — every term
    an exact DECIMAL(38,0) product of exact counts; d_num/d_den are
    returned alongside the one correctly-rounded divide, as exact
    decimal-integer STRINGS (n_a·n_b can exceed 2^63 at corpus scale
    and a long cast would wrap to NULL silently — ADVICE r07).

    SCALE: the corpus collapses to one row per DISTINCT value
    (bounded by the value DOMAIN, the exact_auc discipline) before
    the cumulative window runs; totals are a bounded aggregate
    broadcast back.
    """
    from pyspark.sql import Window

    gcols = list(by or [])
    v = value_int.cast("long")
    per_v = (
        df.where(F.col(group_col).isin([group_a, group_b]))
        .select(
            *gcols,
            v.alias("__v"),
            F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("__ia"),
        )
        .groupBy(*gcols, "__v")
        .agg(
            F.sum("__ia").alias("__ca"),
            F.sum(1 - F.col("__ia")).alias("__cb"),
        )
    )
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    per_v = _truncate(per_v)  # feeds the cumulative window AND totals
    w = (
        Window.partitionBy(*gcols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_v.select(
        *gcols,
        F.sum("__ca").over(w).alias("__cuma"),
        F.sum("__cb").over(w).alias("__cumb"),
    )
    totals = per_v.groupBy(*gcols).agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    joined = (
        cum.join(F.broadcast(totals), gcols)
        if gcols
        else cum.crossJoin(F.broadcast(totals))
    )
    terms = joined.select(
        *gcols,
        "__na",
        "__nb",
        F.abs(
            _dec(F.col("__cuma")) * _dec(F.col("__nb"))
            - _dec(F.col("__cumb")) * _dec(F.col("__na"))
        ).alias("__t"),
    )
    out = terms.groupBy(*gcols, "__na", "__nb").agg(
        F.max("__t").alias("__dnum")
    )
    den = _dec(F.col("__na")) * _dec(F.col("__nb"))
    return out.select(
        *gcols,
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        # exact decimal STRINGS, not long (ADVICE r07): n_a·n_b can
        # exceed 2^63 at corpus scale and the non-ANSI long cast wraps
        # to NULL silently; string is exact at any magnitude
        F.col("__dnum").cast("string").alias("d_num"),
        den.cast("string").alias("d_den"),
        F.when(
            den > 0,
            F.round(F.col("__dnum").cast("double") / den.cast("double"), 6),
        ).alias("d"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_int: Column,
) -> DataFrame:
    """Exact-pipeline Kruskal–Wallis H test across k groups:
    one row ``(k, n, ties_t, h, h_adj)`` — the nonparametric ANOVA
    ("do these k segments draw from the same distribution"), with
    the standard tie correction h_adj = h / (1 − ΣT/(N³−N)).

    EXACTNESS: ranks use the exact_auc DOUBLED-rank device — for a
    distinct value with ``cum`` rows strictly below and ``cnt`` tied,
    2·avg_rank = 2·cum + cnt + 1 — so per-group rank sums D_i = 2·R_i
    and the tie term ΣT = Σ(t³−t) accumulate as exact DECIMAL(38,0)
    integers. The per-group float terms R_i²/n_i = D_i²/(4·n_i) are
    then summed in a FIXED left-to-right order (a cumulative window
    over the k-row group frame ordered by group key — both engines
    fold sequentially), so even the IEEE additions are
    order-pinned and the statistic hash-matches cross-engine.

    SCALE: one (group, value) aggregate collapses the corpus; the
    rank window runs over the DISTINCT-value domain only; everything
    after is k-row arithmetic.
    """
    from pyspark.sql import Window

    v = value_int.cast("long")
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # gv feeds per_v and the rank join; per_v feeds ranked and ties —
    # cut both (PERF §26 multi-consumer rule)
    gv = _truncate(
        df.select(F.col(group_col).alias("__g"), v.alias("__v"))
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__cgv"))
    )
    per_v = _truncate(gv.groupBy("__v").agg(F.sum("__cgv").alias("__cv")))
    w = Window.orderBy("__v")
    ranked = per_v.select(
        "__v",
        "__cv",
        (
            _dec(F.lit(2))
            * _dec(
                F.coalesce(
                    F.sum("__cv").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                )
            )
            + _dec(F.col("__cv"))
            + _dec(F.lit(1))
        ).alias("__dr"),
    )
    per_g = (
        gv.join(ranked, "__v")
        .groupBy("__g")
        .agg(
            F.sum("__cgv").alias("__n"),
            F.sum(_dec(F.col("__cgv")) * F.col("__dr")).alias("__d"),
        )
    )
    term = (F.col("__d") * F.col("__d")).cast("double") / (
        F.lit(4.0) * F.col("__n").cast("double")
    )
    wg = Window.orderBy("__g")
    folded = per_g.select(
        F.sum(term).over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias("__s"),
        F.sum("__n").over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias("__ncum"),
        F.row_number().over(wg).alias("__rn"),
        F.count(F.lit(1)).over(
            wg.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("__k"),
    ).where(F.col("__rn") == F.col("__k"))
    ties = per_v.agg(
        F.sum(
            _dec(F.col("__cv")) * _dec(F.col("__cv")) * _dec(F.col("__cv"))
            - _dec(F.col("__cv"))
        ).alias("__t")
    )
    j = folded.crossJoin(F.broadcast(ties))
    n_d = F.col("__ncum").cast("double")
    h_raw = F.lit(12.0) * F.col("__s") / (n_d * (n_d + F.lit(1.0))) - F.lit(
        3.0
    ) * (n_d + F.lit(1.0))
    tie_c = F.lit(1.0) - F.col("__t").cast("double") / (
        _dec(F.col("__ncum")) * _dec(F.col("__ncum")) * _dec(F.col("__ncum"))
        - _dec(F.col("__ncum"))
    ).cast("double")
    return j.select(
        F.col("__k").cast("long").alias("k"),
        F.col("__ncum").cast("long").alias("n"),
        F.col("__t").cast("long").alias("ties_t"),
        F.round(h_raw, 6).alias("h"),
        F.when(tie_c > 0.0, F.round(h_raw / tie_c, 6)).alias("h_adj"),
    )


def mann_kendall(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_int: Column,
    slope_scale: int = 10**6,
) -> DataFrame:
    """Mann–Kendall trend test + Theil–Sen slope per group over an
    already-bucketed series (one row per (group, t, x), x integral):
    ``(group, n, s, z, sen_slope)`` — the ROBUST trend readout
    (monotone trend without OLS's outlier sensitivity; Sen's slope
    is the median pairwise slope).

    EXACTNESS: S = Σ sign(x_j − x_i) and the tie-corrected variance
    numerator n(n−1)(2n+5) − Σ t(t−1)(2t+5) are exact integers
    (DECIMAL(38,0)); z applies the standard continuity correction
    with mirrored IEEE ops. Pairwise slopes are TRUNCATED scaled
    rationals ((Δx·scale) div Δt — both engines truncate toward
    zero); Sen's slope is the exact LOWER median of those ints
    (selecting the k-th order-statistic VALUE, so tie order between
    equal slopes cannot matter), reported in natural units.

    SCALE: the pair join is |T|²/2 per group ON THE AGGREGATED
    series frame — bucket upstream so |T| is bounded (months, days);
    corpus rows never pair. The only windows run over the pairs
    frame, partitioned by group.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # the series frame feeds FOUR consumers (both pair-join sides,
    # n_agg, tie_term) and the caller's lineage is typically a
    # multi-join aggregate — materialize ONCE (the PageRank edge-frame
    # lesson, PERF §26; measured 5× at sf1 on q_mann_kendall)
    per = _truncate(
        df.select(
            F.col(group_col).alias("__g"),
            F.col(order_col).cast("long").alias("__t"),
            value_int.cast("long").alias("__x"),
        )
    )
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__g") == F.col("b.__g")) & (F.col("a.__t") < F.col("b.__t")),
    ).select(
        F.col("a.__g").alias("__g"),
        F.signum((F.col("b.__x") - F.col("a.__x")).cast("double"))
        .cast("long")
        .alias("__sgn"),
        # scale in DECIMAL(38,0) BEFORE the integral divide: Δx·scale in
        # int64 wraps silently past 2^63 (ADVICE r07) while the DuckDB
        # twin's HUGEINT stays exact; the decimal product matches it at
        # any magnitude. The divide itself returns long — the SLOPE must
        # fit int64 (|Δx·scale/Δt| < 2^63), a far weaker bound than the
        # product's.
        F.expr(
            f"((CAST(b.__x AS DECIMAL(38,0)) - CAST(a.__x AS DECIMAL(38,0)))"
            f" * {slope_scale}) div (b.__t - a.__t)"
        ).alias("__sl"),
    )
    pairs = _truncate(pairs)  # consumed by sen AND s_agg
    w = Window.partitionBy("__g")
    sen = (
        pairs.withColumn(
            "__rn", F.row_number().over(w.orderBy("__sl"))
        )
        .withColumn("__cnt", F.count(F.lit(1)).over(w))
        .where(F.col("__rn") == F.expr("(__cnt + 1) div 2"))
        .select("__g", F.col("__sl").alias("__sen"))
    )
    s_agg = pairs.groupBy("__g").agg(F.sum("__sgn").alias("__s"))
    n_agg = per.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
    tie_term = (
        per.groupBy("__g", "__x")
        .agg(F.count(F.lit(1)).alias("__tc"))
        .groupBy("__g")
        .agg(
            F.sum(
                _dec(F.col("__tc"))
                * _dec(F.col("__tc") - 1)
                * _dec(2 * F.col("__tc") + 5)
            ).alias("__tt")
        )
    )
    j = (
        n_agg.join(s_agg, "__g")
        .join(tie_term, "__g")
        .join(sen, "__g")
    )
    n = _dec(F.col("__n"))
    var_num = n * (n - _dec(F.lit(1))) * (
        _dec(F.lit(2)) * n + _dec(F.lit(5))
    ) - F.col("__tt")
    var = var_num.cast("double") / F.lit(18.0)
    s_d = F.col("__s").cast("double")
    z = F.when(var <= 0.0, F.lit(None).cast("double")).otherwise(
        F.when(F.col("__s") > 0, F.round((s_d - 1.0) / F.sqrt(var), 6))
        .when(F.col("__s") < 0, F.round((s_d + 1.0) / F.sqrt(var), 6))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n"),
        F.col("__s").alias("s"),
        z.alias("z"),
        F.round(
            F.col("__sen").cast("double") / F.lit(float(slope_scale)), 6
        ).alias("sen_slope"),
    )


def rolling_ols(
    df: DataFrame,
    group_col: str,
    order_col: str,
    y_int: Column,
    window_rows: int = 30,
    y_scale: int = 0,
) -> DataFrame:
    """Rolling-window OLS trend per group: for every bucket of an
    already-aggregated series (one row per (group, t, y), t integral,
    y integral) the slope over the TRAILING ``window_rows`` buckets —
    "is this series accelerating right now", the windowed complement
    to ols_by_group's whole-series fit:
    ``(group, t, n_window, slope)``.

    EXACTNESS: the five regression moments are WINDOW sums of exact
    integers over the trailing frame (order-independent within the
    frame because integer addition commutes), combined with the same
    DECIMAL(38,0) first-order algebra as ols_by_group and one
    correctly-rounded divide; ``y_scale`` divides slope into natural
    units before ROUND(·,6) (the representability discipline).

    SCALE: ONE key-partitioned window pass over the aggregated series
    frame (never raw events) computing all five sums in the same
    frame spec — Spark evaluates them in a single WindowExec.
    """
    from pyspark.sql import Window

    per = df.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).cast("long").alias("__t"),
        y_int.cast("long").alias("__y"),
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__t")
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    x = _dec(F.col("__t"))
    y = _dec(F.col("__y"))
    agg = per.select(
        "__g",
        "__t",
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum(x).over(w).alias("__sx"),
        F.sum(y).over(w).alias("__sy"),
        F.sum(x * x).over(w).alias("__sxx"),
        F.sum(x * y).over(w).alias("__sxy"),
    )
    n = _dec(F.col("__n"))
    num = (n * F.col("__sxy") - F.col("__sx") * F.col("__sy")).cast("double")
    den = (n * F.col("__sxx") - F.col("__sx") * F.col("__sx")).cast("double")
    slope = F.when(
        den > 0.0, F.round(num / den / F.lit(float(10**y_scale)), 6)
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(order_col),
        F.col("__n").alias("n_window"),
        slope.alias("slope"),
    )


def simpson_diversity(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """Unbiased Gini–Simpson diversity per group:
    ``(group, n, n_types, simpson)`` with
    D = 1 − Σ n_i(n_i−1) / (N(N−1)) — the probability two draws
    WITHOUT replacement differ. The log-free diversity measure
    (Shannon entropy needs ln — never bit-identical cross-engine);
    low D = the collapse signal (templated sources, synthetic loops),
    complementing type-token ratios with an abundance-weighted view.

    EXACTNESS: Σ n_i(n_i−1) and N(N−1) are exact DECIMAL(38,0)
    integers; one correctly-rounded divide. Groups with N < 2 yield
    NULL.

    SCALE: one (group, item) aggregate collapses the corpus, one
    group aggregate collapses the items — both map-combinable.
    """
    counts = (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__w"))
        .groupBy("__g", "__w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    g = counts.groupBy("__g").agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).alias("__t"),
        F.sum(_dec(F.col("__c")) * _dec(F.col("__c") - 1)).alias("__ss"),
    )
    n = _dec(F.col("__n"))
    den = n * (n - _dec(F.lit(1)))
    simpson = F.when(
        F.col("__n") >= 2,
        F.round(
            F.lit(1.0) - F.col("__ss").cast("double") / den.cast("double"), 6
        ),
    )
    return g.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n"),
        F.col("__t").alias("n_types"),
        simpson.alias("simpson"),
    )


def _avg_rank2(df: DataFrame, gcols: list[str], val: str, out: str) -> DataFrame:
    """Per-group DOUBLED average rank of ``val``: ``(g…, val, out)``
    with out = 2·cum − cnt + 1 (cum = inclusive cumulative count over
    the sorted per-group DISTINCT-value domain) — the exact integer
    form of the tie-averaged rank (avg rank of a tie block is
    (first+last)/2, a half-integer; doubling keeps it integral). The
    window runs over the collapsed value DOMAIN, never corpus rows
    (the exact_auc discipline)."""
    from pyspark.sql import Window

    per_v = df.groupBy(*gcols, val).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*gcols)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_v.select(
        *gcols,
        val,
        (
            F.lit(2) * F.sum("__c").over(w) - F.col("__c") + F.lit(1)
        ).alias(out),
    )


def spearman_rho(
    df: DataFrame,
    x_int: Column,
    y_int: Column,
    by: list[str] | None = None,
) -> DataFrame:
    """Spearman rank correlation per group: ``(by…, n, rho)`` —
    Pearson over tie-AVERAGED ranks, the standard tie-corrected
    Spearman (monotone association robust to outliers and monotone
    transforms; the complement to q_correlation_exact's linear
    Pearson). ``x_int``/``y_int`` must be integral (fixed-point
    upstream).

    EXACTNESS: doubled average ranks are exact integers (2·cum −
    cnt + 1 over the per-group distinct-value domain); Pearson on
    them reuses :func:`exact_corr`'s exact DECIMAL(38,0) moments —
    doubling cancels in the correlation. Only the final cast / sqrt /
    divide are IEEE, mirrored by the oracle.

    SCALE: two domain-collapsing aggregates + two partitioned windows
    over the collapsed domains + two joins back + one map-combinable
    moment aggregate. Caller bound (exact_corr's contract): per-row
    rank products 4n² must fit int64 → n per group ≤ ~1.5e9; beyond
    that pre-bucket values upstream.
    """
    gcols = list(by or [])
    base = df.select(
        *gcols, x_int.cast("long").alias("__x"), y_int.cast("long").alias("__y")
    )
    rx = _avg_rank2(base, gcols, "__x", "__rx2")
    ry = _avg_rank2(base, gcols, "__y", "__ry2")
    ranked = base.join(rx, [*gcols, "__x"]).join(ry, [*gcols, "__y"])
    out = exact_corr(ranked, F.col("__rx2"), F.col("__ry2"), by=gcols)
    return out.select(*gcols, "n", F.col("corr").alias("rho"))


def kendall_tau_b(
    df: DataFrame,
    group_col: str,
    x_int: Column,
    y_int: Column,
) -> DataFrame:
    """Kendall's τ-b per group over an already-AGGREGATED series (one
    row per observation, x/y integral): ``(group, n, concordant,
    discordant, tau_b)`` — the ordinal association test whose tie
    correction Spearman lacks; τ-b = (C − D)/√((n0 − n1)(n0 − n2))
    with n0 = n(n−1)/2, n1/n2 = Σ t(t−1)/2 over x/y tie blocks.

    EXACTNESS: C − D = Σ sign(Δx)·sign(Δy) over unordered pairs and
    all tie counts are exact integers (DECIMAL(38,0) combination);
    the one sqrt/divide at the end is mirrored IEEE.

    SCALE: the pair join is |T|²/2 per group ON THE AGGREGATED series
    (the mann_kendall discipline — bucket upstream so |T| is months /
    days, never corpus rows); tie counts come from two domain-sized
    aggregates.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from pyspark.sql import Window

    per = _truncate(
        df.select(
            F.col(group_col).alias("__g"),
            x_int.cast("long").alias("__x"),
            y_int.cast("long").alias("__y"),
        ).withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__g").orderBy("__x", "__y")
            ),
        )
    )
    a, b = per.alias("a"), per.alias("b")
    pairs = a.join(
        b,
        (F.col("a.__g") == F.col("b.__g"))
        & (F.col("a.__rn") < F.col("b.__rn")),
    ).select(
        F.col("a.__g").alias("__g"),
        (
            F.signum((F.col("b.__x") - F.col("a.__x")).cast("double"))
            * F.signum((F.col("b.__y") - F.col("a.__y")).cast("double"))
        ).cast("long").alias("__cd"),
    )
    s_agg = pairs.groupBy("__g").agg(
        F.sum(F.when(F.col("__cd") == 1, 1).otherwise(0)).alias("__c"),
        F.sum(F.when(F.col("__cd") == -1, 1).otherwise(0)).alias("__d"),
    )
    n_agg = per.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))

    def _tie_pairs(col: str, alias: str) -> DataFrame:
        return (
            per.groupBy("__g", col)
            .agg(F.count(F.lit(1)).alias("__t"))
            .groupBy("__g")
            .agg(
                F.sum(
                    _dec(F.col("__t")) * _dec(F.col("__t") - 1)
                ).alias(alias)
            )
        )

    tx = _tie_pairs("__x", "__tx2")  # 2·n1
    ty = _tie_pairs("__y", "__ty2")  # 2·n2
    # LEFT join: an n=1 group has no pairs (no s_agg row) but must
    # still surface as (n=1, 0, 0, NULL tau_b), not vanish (ADVICE r08)
    j = (
        n_agg.join(s_agg, "__g", "left")
        .na.fill({"__c": 0, "__d": 0})
        .join(tx, "__g")
        .join(ty, "__g")
    )
    n = _dec(F.col("__n"))
    n0_2 = n * (n - _dec(F.lit(1)))  # 2·n0
    den = (
        F.sqrt((n0_2 - F.col("__tx2")).cast("double"))
        * F.sqrt((n0_2 - F.col("__ty2")).cast("double"))
    )
    num = F.lit(2.0) * (F.col("__c") - F.col("__d")).cast("double")
    return j.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n"),
        F.col("__c").cast("long").alias("concordant"),
        F.col("__d").cast("long").alias("discordant"),
        F.when(den > 0.0, num / den).alias("tau_b"),
    )


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """χ² test of independence + Cramér's V effect size over the
    ``a_col`` × ``b_col`` contingency grid: one row ``(n, n_rows,
    n_cols, chi2, v)`` — "are these two categoricals associated, and
    how strongly" (0 = independent, 1 = determined), the categorical
    complement to exact_corr.

    EXACTNESS: each cell term is ((n_ab·N − r_a·c_b)²)/(N·r_a·c_b)
    with numerator/denominator exact DECIMAL(38,0) products (χ² =
    Σ(O−E)²/E put over the common denominator N; MISSING cells
    contribute r_a·c_b/N² via the dense grid); the per-cell divide is
    one correctly-rounded IEEE op, and the sum of cell doubles folds
    in PINNED (a,b) order via a cumulative window over the grid (the
    kruskal_wallis device), so even IEEE addition order matches the
    oracle. V = √(χ²/(N·min(R−1,C−1))).

    SCALE: one (a,b) aggregate collapses the corpus; everything after
    is grid-sized (|A|×|B| rows, cross-joined bounded marginals).
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    cell = _truncate(
        df.groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__nab"))
    )
    per_a = cell.groupBy("__a").agg(F.sum("__nab").alias("__ra"))
    per_b = cell.groupBy("__b").agg(F.sum("__nab").alias("__cb"))
    tot = cell.agg(
        F.sum("__nab").alias("__nn"),
        F.count_distinct("__a").alias("__r"),
        F.count_distinct("__b").alias("__c"),
    )
    grid = (
        per_a.crossJoin(F.broadcast(per_b))
        # cell is grid-bounded (|A|×|B| observed combos) but sits
        # behind a checkpoint whose size the planner doesn't know —
        # without the hint this 125-row join planned as a full
        # sort-merge (two exchanges + sorts)
        .join(F.broadcast(cell), ["__a", "__b"], "left")
        .crossJoin(F.broadcast(tot))
    )
    dev = (
        _dec(F.coalesce(F.col("__nab"), F.lit(0))) * _dec(F.col("__nn"))
        - _dec(F.col("__ra")) * _dec(F.col("__cb"))
    )
    term = (dev * dev).cast("double") / (
        _dec(F.col("__nn")) * _dec(F.col("__ra")) * _dec(F.col("__cb"))
    ).cast("double")
    w = Window.orderBy("__a", "__b")
    folded = grid.select(
        "__nn",
        "__r",
        "__c",
        F.sum(term).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__chi2"),
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__k"),
    ).where(F.col("__rn") == F.col("__k"))
    mindim = F.least(F.col("__r") - 1, F.col("__c") - 1)
    return folded.select(
        F.col("__nn").cast("long").alias("n"),
        F.col("__r").cast("long").alias("n_rows"),
        F.col("__c").cast("long").alias("n_cols"),
        F.round(F.col("__chi2"), 6).alias("chi2"),
        F.when(
            mindim > 0,
            F.round(
                F.sqrt(
                    F.col("__chi2")
                    / (F.col("__nn") * mindim).cast("double")
                ),
                6,
            ),
        ).alias("v"),
    )


def autocorrelation(
    series: DataFrame,
    order_col: str,
    value_int: Column,
    max_lag: int = 3,
) -> DataFrame:
    """Sample autocorrelation of an already-AGGREGATED series at lags
    1..max_lag: ``(lag, n, acf)`` with the standard full-series-mean
    convention acf(k) = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² —
    the seasonality/memory readout (does yesterday predict today).

    EXACTNESS: multiplied through by n², every term is an exact
    DECIMAL(38,0) integer: n²·num_k = n²P_k − n·S1·(A_k+B_k) +
    (n−k)·S1², n·den = n·(n·S2 − S1²), with P_k the lag-k product sum
    (LEAD window), A_k/B_k the series sums minus the last/first k
    values. One correctly-rounded divide per lag.

    SCALE: the caller aggregates the corpus to the series first (one
    row per t — days/months, bounded domain); the LEAD/row windows
    run over that bounded frame only (documented unpartitioned-window
    class, PERF §19).
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    per = _truncate(
        series.select(
            F.col(order_col).alias("__t"),
            value_int.cast("long").alias("__x"),
        ).withColumn(
            "__rn", F.row_number().over(Window.orderBy("__t"))
        )
    )
    base = per.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(_dec(F.col("__x"))).alias("__s1"),
        F.sum(_dec(F.col("__x")) * _dec(F.col("__x"))).alias("__s2"),
    )
    w = Window.orderBy("__rn")
    rows = []
    for k in range(1, max_lag + 1):
        pk = per.select(
            (_dec(F.col("__x")) * _dec(F.lead("__x", k).over(w)))
            .alias("__p")
        ).agg(F.sum("__p").alias("__pk"))
        head = per.where(F.col("__rn") <= k).agg(
            F.sum(_dec(F.col("__x"))).alias("__head")
        )
        tail_ = per.crossJoin(F.broadcast(base.select("__n"))).where(
            F.col("__rn") > F.col("__n") - k
        ).agg(F.sum(_dec(F.col("__x"))).alias("__tail"))
        j = (
            base.crossJoin(F.broadcast(pk))
            .crossJoin(F.broadcast(head))
            .crossJoin(F.broadcast(tail_))
        )
        n, s1, s2 = (
            _dec(F.col("__n")),
            F.col("__s1"),
            F.col("__s2"),
        )
        a_k = s1 - F.col("__tail")
        b_k = s1 - F.col("__head")
        num = (
            n * n * F.col("__pk")
            - n * s1 * (a_k + b_k)
            + (n - _dec(F.lit(k))) * s1 * s1
        )
        den = n * (n * s2 - s1 * s1)
        rows.append(
            j.select(
                F.lit(k).alias("lag"),
                F.col("__n").cast("long").alias("n"),
                F.when(
                    den.cast("double") > 0.0,
                    F.round(num.cast("double") / den.cast("double"), 6),
                ).alias("acf"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_int: Column,
    tiebreak_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Time-weighted average per bucket (TWAP): each observation's
    value is held until the NEXT observation in the same bucket and
    weighted by that holding duration — the irregular-sampling mean
    (a value sampled once an hour must not count like one sampled
    every second). ``(bucket, n_obs, held_seconds, twa)`` with
    twa = Σ vᵢ·Δtᵢ / Σ Δtᵢ over intra-bucket gaps (the last
    observation holds zero seconds — the integral runs first→last).

    EXACTNESS: value_int is fixed-point, Δt exact integer
    MICROSECONDS (unix_micros ≡ DuckDB epoch_us — second-granularity
    conversions truncate engine-dependently on sub-second data); both
    sums are exact DECIMAL(38,0); one correctly-rounded divide (the
    µs unit cancels in the ratio).
    ``tiebreak_col`` pins the order of equal timestamps — WHICH of
    two same-instant values holds the following interval changes the
    sums, so the order must be total and engine-independent.

    SCALE: one LEAD window partitioned by bucket (parallel across
    buckets, corpus never in one partition) + one map-combinable
    aggregate.
    """
    from pyspark.sql import Window

    b = F.date_trunc(bucket, F.col(ts_col)).alias("__b")
    base = df.select(
        b,
        F.unix_micros(F.col(ts_col)).alias("__us"),
        value_int.cast("long").alias("__v"),
        F.col(tiebreak_col).alias("__tb"),
    )
    w = Window.partitionBy("__b").orderBy("__us", "__tb")
    gaps = base.select(
        "__b",
        "__v",
        (F.lead("__us", 1).over(w) - F.col("__us")).alias("__dt"),
    )
    agg = gaps.groupBy("__b").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(_dec(F.col("__v")) * _dec(F.col("__dt"))).alias("__num"),
        F.sum(_dec(F.col("__dt"))).alias("__den"),
    )
    return agg.select(
        F.col("__b").alias(bucket),
        F.col("n_obs").cast("long").alias("n_obs"),
        F.expr(
            "CAST(coalesce(__den, 0) div 1000000 AS BIGINT)"
        ).alias("held_seconds"),
        F.when(
            F.col("__den") > 0,
            F.round(
                F.col("__num").cast("double") / F.col("__den").cast("double"),
                6,
            ),
        ).alias("twa"),
    )


def ewma_truncated(
    series: DataFrame,
    order_col: str,
    value_int: Column,
    window: int = 20,
) -> DataFrame:
    """Exponentially-weighted moving average with α = 1/2, truncated
    at ``window`` lags: ``(order, value, ewma)`` — the float-free
    EWMA. The sequential s_t = αx_t + (1−α)s_{t−1} recurrence is
    order-dependent and never cross-engine exact; truncating the
    geometric tail turns it into per-row algebra: weights are exact
    powers of two (2^(w−1−j) for lag j), the weighted sum and the
    included-weight total are exact DECIMAL integers, and only the
    final divide is IEEE. The dropped tail mass is 2^−window of the
    signal (~1e-6 at w=20 — below any 6-dp readout). Rows earlier
    than ``window`` normalize by the weights actually present.

    SCALE: the caller pre-aggregates to the bounded series; the
    ``window`` LAG expressions share ONE pass over one ordered window
    (documented unpartitioned-window class for global series — use a
    partition column upstream for per-key smoothing).
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    num = None
    den = None
    for j in range(window):
        wt = 2 ** (window - 1 - j)
        lagx = F.lag("__x", j).over(w)
        nt = F.coalesce(_dec(lagx), _dec(F.lit(0))) * _dec(F.lit(wt))
        dt = F.when(lagx.isNotNull(), _dec(F.lit(wt))).otherwise(
            _dec(F.lit(0))
        )
        num = nt if num is None else num + nt
        den = dt if den is None else den + dt
    base = series.select(
        F.col(order_col), value_int.cast("long").alias("__x")
    )
    # UNROUNDED divide: exact integers through one correctly-rounded
    # IEEE op is bit-identical cross-engine; rounding to 6 dp would
    # re-introduce the engines' different round-half paths
    return base.select(
        order_col,
        F.col("__x").alias("value"),
        (num.cast("double") / den.cast("double")).alias("ewma"),
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan–Meier survival estimate over right-censored durations
    (one row per subject; ``observed`` = 1 when the terminal event
    was seen, 0 when censored): ``(t, n_risk, d_events, survival)``
    for every time with at least one event, survival =
    Π_{u≤t} (1 − d_u/n_u) — the churn/retention curve done
    correctly (a plain histogram of lifetimes is biased by the
    still-alive subjects; KM credits censored subjects to every risk
    set they survive through).

    EXACTNESS: d_t and the at-risk counts n_t are exact integers
    (n_t = N − #durations < t via one cumulative window over the
    duration DOMAIN); each factor is ONE correctly-rounded divide,
    and the running product folds in PINNED ascending-t order via an
    ordered-list reduce — the same sequential-fold device as the
    oracle's list_reduce, so the IEEE product matches bit-for-bit.

    SCALE: the subject table collapses to the duration domain in one
    aggregate; every window runs over that bounded domain. The fold
    list is domain-sized (distinct durations), not subject-sized.
    """
    from pyspark.sql import Window

    dom = durations.groupBy(
        F.col(duration_col).cast("long").alias("__t")
    ).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(F.col(observed_col).cast("long")).alias("__d"),
    )
    w = Window.orderBy("__t")
    cum = dom.select(
        "__t",
        "__d",
        (
            F.sum("__m").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(
                F.sum("__m").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("__n_risk"),
    )
    factor = F.lit(1.0) - F.col("__d").cast("double") / F.col(
        "__n_risk"
    ).cast("double")
    folded = cum.select(
        "__t",
        "__d",
        "__n_risk",
        F.aggregate(
            F.collect_list(factor).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("__s"),
    )
    return folded.where(F.col("__d") > 0).select(
        F.col("__t").alias("t"),
        F.col("__n_risk").cast("long").alias("n_risk"),
        F.col("__d").cast("long").alias("d_events"),
        F.col("__s").alias("survival"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-proportion z-test (pooled): ``(n_a, x_a, n_b, x_b, p_a,
    p_b, z)`` — the A/B conversion-rate readout (Welch answers
    means; this answers rates). ``success_col`` is 0/1 per subject.

    EXACTNESS: the four counts are exact integers; p_a, p_b, the
    pooled rate, and z are a fixed mirrored IEEE expression tree over
    those integers — bit-identical cross-engine, no rounding applied
    (the exact counts are the certificate).

    SCALE: one conditional-count aggregate; the corpus collapses to
    one row.
    """
    s = F.col(success_col).cast("long")
    agg = df.where(F.col(group_col).isin([group_a, group_b])).agg(
        F.sum(
            F.when(F.col(group_col) == group_a, 1).otherwise(0)
        ).alias("__na"),
        F.sum(F.when(F.col(group_col) == group_a, s).otherwise(0)).alias(
            "__xa"
        ),
        F.sum(
            F.when(F.col(group_col) == group_b, 1).otherwise(0)
        ).alias("__nb"),
        F.sum(F.when(F.col(group_col) == group_b, s).otherwise(0)).alias(
            "__xb"
        ),
    )
    na, xa = F.col("__na").cast("double"), F.col("__xa").cast("double")
    nb, xb = F.col("__nb").cast("double"), F.col("__xb").cast("double")
    pa, pb = xa / na, xb / nb
    pool = (xa + xb) / (na + nb)
    se = F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    both = (F.col("__na") > 0) & (F.col("__nb") > 0)  # ANSI /0 guard
    return agg.select(
        F.col("__na").alias("n_a"),
        F.col("__xa").alias("x_a"),
        F.col("__nb").alias("n_b"),
        F.col("__xb").alias("x_b"),
        F.when(F.col("__na") > 0, pa).alias("p_a"),
        F.when(F.col("__nb") > 0, pb).alias("p_b"),
        F.when(both & (se > 0.0), (pa - pb) / se).alias("z"),
    )


def mcnemar_test(
    df: DataFrame,
    before_col: str,
    after_col: str,
) -> DataFrame:
    """McNemar's paired-proportion test: ``(n, n_both, n_neither,
    n_flip_10, n_flip_01, chi2)`` over paired binary outcomes (same subject measured
    twice) — "did behavior CHANGE", which the two-sample z-test
    cannot answer because the samples aren't independent. Only the
    discordant cells matter: χ² = (b − c)²/(b + c) with b = 1→0 and
    c = 0→1 flips.

    EXACTNESS: the four cells are exact conditional counts; χ² is
    ONE correctly-rounded divide of exact integers.

    SCALE: one conditional-count aggregate; the corpus collapses to
    one row.
    """
    bf = F.col(before_col).cast("int")
    af = F.col(after_col).cast("int")
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(((bf == 1) & (af == 1)).cast("long")).alias("__both"),
        F.sum(((bf == 0) & (af == 0)).cast("long")).alias("__nei"),
        F.sum(((bf == 1) & (af == 0)).cast("long")).alias("__b"),
        F.sum(((bf == 0) & (af == 1)).cast("long")).alias("__c"),
    )
    num = _dec(F.col("__b") - F.col("__c")) * _dec(
        F.col("__b") - F.col("__c")
    )
    den = F.col("__b") + F.col("__c")
    # n_both/n_neither (not both/neither: BOTH is a SQL reserved word
    # and would force quoting in every oracle twin)
    return agg.select(
        F.col("__n").alias("n"),
        F.col("__both").alias("n_both"),
        F.col("__nei").alias("n_neither"),
        F.col("__b").alias("n_flip_10"),
        F.col("__c").alias("n_flip_01"),
        F.when(
            den > 0, num.cast("double") / den.cast("double")
        ).alias("chi2"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's κ inter-rater agreement over two categorical labelers:
    ``(n, po_num, pe_num_s, kappa)`` with κ = (p_o − p_e)/(1 − p_e) —
    chance-corrected agreement (raw % agreement rewards majority-
    class spam; κ doesn't). The workhorse for validating heuristic
    labelers against each other or against gold labels.

    EXACTNESS: over common denominators, κ = (n·Σ_k n_kk − Σ_k
    a_k·b_k) / (n² − Σ_k a_k·b_k) — numerator and denominator are
    exact DECIMAL(38,0) (a_k/b_k = marginal counts), certified as
    exact decimal strings; κ itself is one correctly-rounded divide.

    SCALE: one (a, b) contingency aggregate collapses the corpus;
    marginals derive from it; everything after is grid-sized.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    cell = _truncate(
        df.groupBy(
            F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
        ).agg(F.count(F.lit(1)).alias("__nab"))
    )
    diag = cell.where(F.col("__a") == F.col("__b")).agg(
        F.coalesce(F.sum("__nab"), F.lit(0)).alias("__agree")
    )
    ma = cell.groupBy("__a").agg(F.sum("__nab").alias("__ka"))
    mb = cell.groupBy("__b").agg(F.sum("__nab").alias("__kb"))
    pe = (
        ma.join(mb, ma.__a == mb.__b)
        .agg(
            F.coalesce(
                F.sum(_dec(F.col("__ka")) * _dec(F.col("__kb"))), F.lit(0)
            ).alias("__pe_num")
        )
    )
    tot = cell.agg(F.sum("__nab").alias("__n"))
    j = tot.crossJoin(F.broadcast(diag)).crossJoin(F.broadcast(pe))
    n = _dec(F.col("__n"))
    num = n * _dec(F.col("__agree")) - F.col("__pe_num")
    den = n * n - F.col("__pe_num")
    return j.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__agree").cast("long").alias("n_agree"),
        F.col("__pe_num").cast("string").alias("pe_num_s"),
        F.when(
            den.cast("double") > 0.0,
            num.cast("double") / den.cast("double"),
        ).alias("kappa"),
    )


def bootstrap_mean_ci(
    series: DataFrame,
    order_col: str,
    value_int: Column,
    b_reps: int = 100,
    lo_permille: int = 25,
    hi_permille: int = 975,
    seed: str = "boot",
    mean_scale: int = 10**6,
) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean of a
    BOUNDED series: ``(b_reps, n, mean_scaled, ci_lo_scaled,
    ci_hi_scaled)`` (scaled by ``mean_scale``) — the
    distribution-free CI (no normality assumption, unlike the t
    interval). Resampling is a PURE FUNCTION of (seed, replicate,
    draw): draw i of replicate b takes the row at
    hash60(seed‖b‖i) mod n — no RNG state, so retries are idempotent
    and a SQL twin computes the identical resamples.

    EXACTNESS: each replicate mean is the exact integer
    (Σx·scale) div n; the CI bounds are exact ORDER STATISTICS of the
    B means (ascending, positions ⌈B·lo/1000⌉ and ⌈B·hi/1000⌉) — no
    float anywhere.

    SCALE: the caller pre-aggregates the corpus to the series (days,
    months — bounded); the resample grid is B×|series| rows of two
    ints, one hash join back to values, one map-combinable per-
    replicate aggregate. B means reach the final order-statistic
    window; nothing corpus-sized moves.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate
    from aws_datalake_spark.operators.text import hash60

    per = _truncate(
        series.select(
            F.col(order_col).alias("__t"),
            value_int.cast("long").alias("__x"),
        ).withColumn("__rn", F.row_number().over(Window.orderBy("__t")))
    )
    nrow = per.agg(F.count(F.lit(1)).alias("__n"))
    reps = series.sparkSession.range(1, b_reps + 1).select(
        F.col("id").alias("__b")
    )
    grid = (
        reps.crossJoin(per.select(F.col("__rn").alias("__i")))
        .crossJoin(F.broadcast(nrow))
        .select(
            "__b",
            (
                hash60(
                    F.concat_ws("_", F.col("__b"), F.col("__i")), seed
                )
                % F.col("__n")
                + F.lit(1)
            ).alias("__idx"),
        )
    )
    means = (
        grid.join(per.select("__rn", "__x"), grid.__idx == per.__rn)
        .groupBy("__b")
        .agg(
            F.expr(
                f"SUM(CAST(__x AS DECIMAL(38,0))) * {mean_scale}"
                f" div COUNT(*)"
            ).alias("__m")
        )
    )
    w = Window.orderBy("__m")
    k_lo = (b_reps * lo_permille + 999) // 1000
    k_hi = (b_reps * hi_permille + 999) // 1000
    ranked = means.select(
        "__m", F.row_number().over(w).alias("__k")
    )
    lo = ranked.where(F.col("__k") == k_lo).select(
        F.col("__m").alias("ci_lo_scaled")
    )
    hi = ranked.where(F.col("__k") == k_hi).select(
        F.col("__m").alias("ci_hi_scaled")
    )
    point = per.agg(
        F.expr(
            f"SUM(CAST(__x AS DECIMAL(38,0))) * {mean_scale}"
            f" div COUNT(*)"
        ).alias("mean_scaled")
    )
    return (
        nrow.crossJoin(F.broadcast(point))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.lit(b_reps).cast("long").alias("b_reps"),
            F.col("__n").cast("long").alias("n"),
            "mean_scaled",
            "ci_lo_scaled",
            "ci_hi_scaled",
        )
    )


def granger_f(
    series: DataFrame,
    order_col: str,
    x_int: Column,
    y_int: Column,
) -> DataFrame:
    """Granger-causality F statistic (lag-1): does y help predict x
    beyond x's own past — ``(n, f_stat, rss_restricted,
    rss_unrestricted)`` comparing x_t ~ x_{t−1} against
    x_t ~ x_{t−1} + y_{t−1} on an already-AGGREGATED series (the
    forecasting-lineage question behind "does order volume LEAD
    revenue").

    EXACTNESS: both OLS fits reduce to closed forms over nine exact
    DECIMAL(38,0) moment sums (multiplied through by N so means never
    become floats): RSS_R·N = A − B²/C and RSS_U·N = A − (B²·V + D²·C
    − 2BDE)/(CV − E²) with A..E,V the centered cross-moments; the F
    ratio is a fixed mirrored IEEE tree over those (the N factors
    cancel). F = (RSS_R − RSS_U)·(n−3)/RSS_U for the single added
    regressor.

    SCALE: one LAG window over the bounded series + ONE map-
    combinable nine-sum aggregate; the corpus never appears (the
    caller aggregates first).
    """
    from pyspark.sql import Window

    w = Window.orderBy("__t")
    base = series.select(
        F.col(order_col).alias("__t"),
        x_int.cast("long").alias("__x"),
        y_int.cast("long").alias("__y"),
    )
    lagged = base.select(
        F.col("__x").alias("__z"),
        F.lag("__x", 1).over(w).alias("__w"),
        F.lag("__y", 1).over(w).alias("__v"),
    ).where(F.col("__w").isNotNull() & F.col("__v").isNotNull())
    agg = lagged.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(_dec(F.col("__z"))).alias("__sz"),
        F.sum(_dec(F.col("__z")) * _dec(F.col("__z"))).alias("__szz"),
        F.sum(_dec(F.col("__w"))).alias("__sw"),
        F.sum(_dec(F.col("__w")) * _dec(F.col("__w"))).alias("__sww"),
        F.sum(_dec(F.col("__v"))).alias("__sv"),
        F.sum(_dec(F.col("__v")) * _dec(F.col("__v"))).alias("__svv"),
        F.sum(_dec(F.col("__w")) * _dec(F.col("__z"))).alias("__swz"),
        F.sum(_dec(F.col("__v")) * _dec(F.col("__z"))).alias("__svz"),
        F.sum(_dec(F.col("__w")) * _dec(F.col("__v"))).alias("__swv"),
    )
    n = _dec(F.col("__n"))
    a = (n * F.col("__szz") - F.col("__sz") * F.col("__sz")).cast("double")
    c = (n * F.col("__sww") - F.col("__sw") * F.col("__sw")).cast("double")
    b = (n * F.col("__swz") - F.col("__sw") * F.col("__sz")).cast("double")
    d = (n * F.col("__svz") - F.col("__sv") * F.col("__sz")).cast("double")
    v = (n * F.col("__svv") - F.col("__sv") * F.col("__sv")).cast("double")
    e = (n * F.col("__swv") - F.col("__sw") * F.col("__sv")).cast("double")
    rssr = a - (b * b) / c
    det = c * v - e * e
    rssu = a - ((b * b) * v + (d * d) * c - F.lit(2.0) * b * d * e) / det
    ok = (c > 0.0) & (det > 0.0)
    f_stat = F.when(
        ok & (rssu > 0.0),
        (rssr - rssu) * (F.col("__n") - 3).cast("double") / rssu,
    )
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        f_stat.alias("f_stat"),
        F.when(ok, rssr).alias("rss_restricted"),
        F.when(ok, rssu).alias("rss_unrestricted"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    x_int: Column,
) -> DataFrame:
    """One-way ANOVA F across k groups: one row ``(k, n, ss_between,
    ss_within, f_stat)`` — the parametric sibling of kruskal_wallis
    ("do these k segments have the same MEAN", assuming equal
    variances). ``x_int`` must be integral (pre-scale to cents).

    EXACTNESS: per-group n, Σx, Σx² accumulate in DECIMAL(38,0); the
    per-group float terms S_g²/n_g fold in PINNED group order via the
    ORDERED-LIST reduce (the durbin_watson device — a true left fold
    at ANY k, immune to DuckDB's ~64-row windowed-float-sum chunk
    association; ADVICE r09 flagged the previous cumulative-window
    fold as silently k-bounded), and SSB/SSW/F are a fixed mirrored
    IEEE tree over those exact aggregates.

    SCALE: one groupBy collapses the corpus; everything after is
    k-row arithmetic in a single k-row final aggregate (no
    single-partition window).
    """
    x = x_int.cast("long")
    per_g = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(_dec(x)).alias("__s"),
        F.sum(_dec(x) * _dec(x)).alias("__q"),
    )
    term = (F.col("__s") * F.col("__s")).cast("double") / F.col(
        "__n"
    ).cast("double")
    folded = per_g.select(
        "__g", "__n", "__s", "__q", term.alias("__t")
    ).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__g", "__t"))),
                lambda st: st["__t"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__ssg"),
        F.sum("__n").alias("__ncum"),
        F.sum("__s").alias("__scum"),
        F.sum("__q").alias("__qcum"),
        F.count(F.lit(1)).alias("__k"),
    ).where(F.col("__k") > 0)  # empty lake → zero rows, not one NULL row
    n_d = F.col("__ncum").cast("double")
    k_d = F.col("__k").cast("double")
    ssb = (
        F.col("__ssg")
        - (F.col("__scum") * F.col("__scum")).cast("double") / n_d
    )
    ssw = F.col("__qcum").cast("double") - F.col("__ssg")
    ok = (
        (F.col("__k") > 1)
        & (F.col("__ncum") > F.col("__k"))
        & (ssw > 0.0)
    )
    f_stat = F.when(
        ok,
        (ssb / (k_d - F.lit(1.0))) / (ssw / (n_d - k_d)),
    )
    return folded.select(
        F.col("__k").cast("long").alias("k"),
        F.col("__ncum").cast("long").alias("n"),
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        f_stat.alias("f_stat"),
    )


def jarque_bera(
    df: DataFrame,
    group_col: str,
    x_int: Column,
) -> DataFrame:
    """Jarque–Bera normality test per group from exact raw moments:
    ``(group, n, skewness, kurtosis, jb)`` — "is this column's
    distribution remotely normal" (JB ~ χ²₂ under H₀; large JB =
    skewed and/or heavy-tailed). ``x_int`` must be integral and
    SMALL enough that Σx⁴ fits DECIMAL(38,0) (|x| ≤ ~3000 at 10⁹
    rows; quantities yes, cents no — pre-bucket wide columns).

    EXACTNESS: Σx..Σx⁴ accumulate exactly in DECIMAL(38,0); central
    moments, skewness = m₃/(m₂√m₂), kurtosis = m₄/m₂², and
    JB = n/6·(S² + (K−3)²/4) are one fixed mirrored IEEE tree over
    the exact moment casts (+ · / √ only — no POWER, whose libm
    differs across engines).

    SCALE: one groupBy collapses the corpus.
    """
    x = x_int.cast("long")
    d = _dec(x)
    agg = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(d).alias("__s1"),
        F.sum(d * d).alias("__s2"),
        F.sum(d * d * d).alias("__s3"),
        F.sum(d * d * d * d).alias("__s4"),
    )
    n_d = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    s3 = F.col("__s3").cast("double")
    s4 = F.col("__s4").cast("double")
    m1 = s1 / n_d
    m2 = s2 / n_d - m1 * m1
    m3 = s3 / n_d - F.lit(3.0) * m1 * (s2 / n_d) + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        s4 / n_d
        - F.lit(4.0) * m1 * (s3 / n_d)
        + F.lit(6.0) * (m1 * m1) * (s2 / n_d)
        - F.lit(3.0) * (m1 * m1 * m1 * m1)
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2)
    jb = (n_d / F.lit(6.0)) * (
        skew * skew
        + (kurt - F.lit(3.0)) * (kurt - F.lit(3.0)) / F.lit(4.0)
    )
    ok = m2 > 0.0
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__n").cast("long").alias("n"),
        F.when(ok, skew).alias("skewness"),
        F.when(ok, kurt).alias("kurtosis"),
        F.when(ok, jb).alias("jb"),
    )


def durbin_watson(
    df: DataFrame,
    t_int: Column,
    y_int: Column,
) -> DataFrame:
    """Durbin–Watson autocorrelation diagnostic on the residuals of
    the OLS line y ~ t: one row ``(n, slope, dw)`` — "did the trend
    fit leave serially-correlated errors" (DW ≈ 2 none, → 0 positive,
    → 4 negative). ``t_int``/``y_int`` must be integral (period
    index; cents).

    EXACTNESS: OLS slope/intercept come from exact DECIMAL(38,0)
    moments via a fixed mirrored IEEE tree; each residual is the
    same mirrored per-row expression; Σe² and Σ(Δe)² fold via the
    ORDERED-LIST reduce in PINNED t order (the Kaplan–Meier /
    Laspeyres device — measured here: DuckDB's cumulative window SUM
    over doubles departs from the strict left fold at ~64 rows, far
    below the previously-documented ~2048 vector bound, so windowed
    float folds are reserved for k-row group frames only); DW is one
    final divide.

    SCALE: callers aggregate the corpus to a period-domain series
    first (the mann_kendall discipline); the window runs over
    periods, never corpus rows.
    """
    from pyspark.sql import Window

    tt = t_int.cast("long")
    yy = y_int.cast("long")
    ser = df.select(tt.alias("__t"), yy.alias("__y"))
    mom = ser.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(_dec(F.col("__t"))).alias("__st"),
        F.sum(_dec(F.col("__t")) * _dec(F.col("__t"))).alias("__stt"),
        F.sum(_dec(F.col("__y"))).alias("__sy"),
        F.sum(_dec(F.col("__t")) * _dec(F.col("__y"))).alias("__sty"),
    )
    nn = _dec(F.col("__n"))
    num_b = (nn * F.col("__sty") - F.col("__st") * F.col("__sy")).cast(
        "double"
    )
    den_b = (nn * F.col("__stt") - F.col("__st") * F.col("__st")).cast(
        "double"
    )
    params = mom.select(
        F.col("__n"),
        (num_b / den_b).alias("__b"),
        (
            (
                F.col("__sy").cast("double")
                - (num_b / den_b) * F.col("__st").cast("double")
            )
            / F.col("__n").cast("double")
        ).alias("__a"),
    )
    e = F.col("__y").cast("double") - (
        F.col("__a") + F.col("__b") * F.col("__t").cast("double")
    )
    wo = Window.orderBy("__t")
    resid = ser.crossJoin(F.broadcast(params)).select(
        "__t",
        "__n",
        "__b",
        e.alias("__e"),
    )
    diffd = resid.select(
        "__t",
        "__n",
        "__b",
        "__e",
        (F.col("__e") - F.lag("__e", 1).over(wo)).alias("__d"),
    )
    terms = diffd.select(
        "__t",
        "__n",
        "__b",
        (F.col("__e") * F.col("__e")).alias("__se"),
        F.coalesce(F.col("__d") * F.col("__d"), F.lit(0.0)).alias("__sd"),
    )

    def _fold(col: str) -> Column:
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__t", col))),
                lambda st: st[col],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = terms.groupBy("__n", "__b").agg(
        _fold("__se").alias("__den"), _fold("__sd").alias("__num")
    )
    return folded.select(
        F.col("__n").cast("long").alias("n"),
        F.col("__b").alias("slope"),
        F.when(
            F.col("__den") > 0.0, F.col("__num") / F.col("__den")
        ).alias("dw"),
    )


def hhi_concentration(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    value_int: Column,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per group:
    ``(group, n_units, hhi, effective_units)`` — "how concentrated is
    this market" (HHI = Σ share², 1/k when k equal units → 1.0 for a
    monopoly; effective_units = 1/HHI is the equivalent equal-share
    count). ``value_int`` must be integral (cents).

    EXACTNESS: per-unit totals v_i and the group total are exact
    int64 (caller keeps |v_i| and Σv_i under 2^53 — cents through
    ~sf 10³; the Σv² / (Σv)² one-divide form is NOT used because
    casting >2^53 wide integers to double is not correctly rounded
    in DuckDB); each share v_i/Σv is one correctly-rounded divide of
    exactly-representable doubles, and Σ share² folds via the
    ORDERED-LIST reduce in pinned unit order.

    SCALE: one (group, unit) aggregate collapses the corpus; the
    group total is a unit-domain window sum and the fold collects
    one list per group — bounded by the units-per-group domain
    (suppliers per nation), never corpus rows.
    """
    from pyspark.sql import Window

    per_u = df.groupBy(
        F.col(group_col).alias("__g"), F.col(unit_col).alias("__u")
    ).agg(F.sum(value_int.cast("long")).alias("__v"))
    wg = Window.partitionBy("__g")
    shares = per_u.select(
        "__g",
        "__u",
        (
            F.col("__v").cast("double")
            / F.sum("__v").over(wg).cast("double")
        ).alias("__sh"),
        F.sum("__v").over(wg).alias("__tot"),
    )
    agg = shares.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__k"),
        F.min("__tot").alias("__tot"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("__u", (F.col("__sh") * F.col("__sh")).alias("__t2"))
                    )
                ),
                lambda st: st["__t2"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__hhi"),
    )
    ok = F.col("__tot") > 0
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__k").cast("long").alias("n_units"),
        F.when(ok, F.col("__hhi")).alias("hhi"),
        F.when(ok, F.lit(1.0) / F.col("__hhi")).alias("effective_units"),
    )


def cohens_d(
    df: DataFrame,
    group_col: str,
    x_int: Column,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Cohen's d effect size between two groups: one row ``(n_a, n_b,
    mean_a, mean_b, d)`` — "HOW DIFFERENT are the means in
    pooled-standard-deviation units" (the magnitude readout beside
    welch_ttest's significance; 0.2 small / 0.5 medium / 0.8 large).
    ``x_int`` must be integral (cents).

    EXACTNESS: both groups' n, Σx, Σx² are exact DECIMAL(38,0);
    means, pooled variance ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2),
    and d are a fixed mirrored IEEE tree over the exact casts.

    SCALE: one conditional aggregate; the corpus collapses to a row.
    """
    x = x_int.cast("long")
    in_a = F.col(group_col) == group_a
    in_b = F.col(group_col) == group_b
    agg = df.where(in_a | in_b).agg(
        F.sum(in_a.cast("long")).alias("__na"),
        F.sum(F.when(in_a, _dec(x)).otherwise(_dec(F.lit(0)))).alias("__sa"),
        F.sum(F.when(in_a, _dec(x) * _dec(x)).otherwise(_dec(F.lit(0)))).alias(
            "__qa"
        ),
        F.sum(in_b.cast("long")).alias("__nb"),
        F.sum(F.when(in_b, _dec(x)).otherwise(_dec(F.lit(0)))).alias("__sb"),
        F.sum(F.when(in_b, _dec(x) * _dec(x)).otherwise(_dec(F.lit(0)))).alias(
            "__qb"
        ),
    )
    na_d, nb_d = F.col("__na").cast("double"), F.col("__nb").cast("double")
    ma = F.col("__sa").cast("double") / na_d
    mb = F.col("__sb").cast("double") / nb_d
    va = (
        F.col("__qa").cast("double")
        - (F.col("__sa") * F.col("__sa")).cast("double") / na_d
    ) / (na_d - F.lit(1.0))
    vb = (
        F.col("__qb").cast("double")
        - (F.col("__sb") * F.col("__sb")).cast("double") / nb_d
    ) / (nb_d - F.lit(1.0))
    pooled = F.sqrt(
        ((na_d - F.lit(1.0)) * va + (nb_d - F.lit(1.0)) * vb)
        / (na_d + nb_d - F.lit(2.0))
    )
    ok = (F.col("__na") > 1) & (F.col("__nb") > 1)
    return agg.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.when(F.col("__na") > 0, ma).alias("mean_a"),
        F.when(F.col("__nb") > 0, mb).alias("mean_b"),
        F.when(ok & (pooled > 0.0), (ma - mb) / pooled).alias("d"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_int: Column,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups:
    one row ``(n_a, n_b, u2, ties_t, z)`` — the nonparametric
    two-sample location test (kruskal_wallis restricted to k=2 gives
    H = z²; U is the convention two-sample tooling expects). ``u2``
    is the DOUBLED U statistic 2U_a = 2R_a − n_a(n_a+1), an exact
    integer via the doubled-rank device (exact_auc/kruskal lineage);
    z uses the tie-corrected normal approximation WITHOUT continuity
    correction: z = (2U − n_a·n_b·... ) — precisely
    (u2 − n_a·n_b) / (2·√var), var = (n_a·n_b/12)·((n+1) − T/(n(n−1))),
    a fixed mirrored IEEE tree over exact integers.

    SCALE: one (group, value) aggregate collapses the corpus; the
    rank window runs over the pooled DISTINCT-value domain.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    v = value_int.cast("long")
    base = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    gv = _truncate(
        base.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__cgv"))
    )
    per_v = _truncate(gv.groupBy("__v").agg(F.sum("__cgv").alias("__cv")))
    w = Window.orderBy("__v")
    ranked = per_v.select(
        "__v",
        "__cv",
        (
            _dec(F.lit(2))
            * _dec(
                F.coalesce(
                    F.sum("__cv").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            )
            + _dec(F.col("__cv"))
            + _dec(F.lit(1))
        ).alias("__dr"),
    )
    per_g = (
        gv.join(ranked, "__v")
        .groupBy("__g")
        .agg(
            F.sum("__cgv").alias("__n"),
            F.sum(_dec(F.col("__cgv")) * F.col("__dr")).alias("__d"),
        )
    )
    piv = per_g.groupBy().agg(
        F.sum(F.when(F.col("__g") == group_a, F.col("__n"))).alias("__na"),
        F.sum(F.when(F.col("__g") == group_a, F.col("__d"))).alias("__da"),
        F.sum(F.when(F.col("__g") == group_b, F.col("__n"))).alias("__nb"),
    )
    ties = per_v.agg(
        F.sum(
            _dec(F.col("__cv")) * _dec(F.col("__cv")) * _dec(F.col("__cv"))
            - _dec(F.col("__cv"))
        ).alias("__t")
    )
    j = piv.crossJoin(F.broadcast(ties))
    u2 = (
        F.col("__da")
        - _dec(F.col("__na")) * _dec(F.col("__na") + 1)
    )
    na_d = F.col("__na").cast("double")
    nb_d = F.col("__nb").cast("double")
    n_d = (F.col("__na") + F.col("__nb")).cast("double")
    var_u = (na_d * nb_d / F.lit(12.0)) * (
        (n_d + F.lit(1.0))
        - F.col("__t").cast("double") / (n_d * (n_d - F.lit(1.0)))
    )
    z = (u2.cast("double") - na_d * nb_d) / (
        F.lit(2.0) * F.sqrt(var_u)
    )
    return j.select(
        F.col("__na").cast("long").alias("n_a"),
        F.col("__nb").cast("long").alias("n_b"),
        u2.cast("long").alias("u2"),
        F.col("__t").cast("long").alias("ties_t"),
        F.when(
            (F.col("__na") > 0) & (F.col("__nb") > 0) & (var_u > 0.0), z
        ).alias("z"),
    )


def wilcoxon_signed_rank(
    df: DataFrame,
    x1_int: Column,
    x2_int: Column,
) -> DataFrame:
    """Wilcoxon signed-rank test on paired integral measurements:
    one row ``(n_pairs, n_nonzero, w2_plus, ties_t, z)`` — the
    paired nonparametric location test (mann_whitney_u answers
    independent samples; this answers before/after on the SAME
    subjects). Zero differences drop per the standard treatment.

    EXACTNESS: ``w2_plus`` is the DOUBLED positive-rank sum
    Σ_{d>0} 2·avgrank(|d|), an exact integer via the doubled-rank
    device; z uses the tie-corrected normal approximation
    z = (2W⁺ − n(n+1)/2·...): precisely
    (w2 − n(n+1)/2) / (2·√(n(n+1)(2n+1)/24 − T/48)), a fixed
    mirrored IEEE tree over exact integers (no continuity
    correction).

    SCALE: one (sign, |d|) aggregate collapses the pair table; the
    rank window runs over the distinct-|d| domain.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    d = (x2_int.cast("long") - x1_int.cast("long")).alias("__dv")
    base = df.select(d)
    n_pairs = base.agg(F.count(F.lit(1)).alias("__np"))
    nz = base.where(F.col("__dv") != 0).select(
        F.signum(F.col("__dv").cast("double")).cast("int").alias("__sg"),
        F.abs(F.col("__dv")).alias("__ad"),
    )
    gv = _truncate(
        nz.groupBy("__sg", "__ad").agg(F.count(F.lit(1)).alias("__cgv"))
    )
    per_v = _truncate(gv.groupBy("__ad").agg(F.sum("__cgv").alias("__cv")))
    w = Window.orderBy("__ad")
    ranked = per_v.select(
        "__ad",
        "__cv",
        (
            _dec(F.lit(2))
            * _dec(
                F.coalesce(
                    F.sum("__cv").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                )
            )
            + _dec(F.col("__cv"))
            + _dec(F.lit(1))
        ).alias("__dr"),
    )
    agg = (
        gv.join(ranked, "__ad")
        .groupBy()
        .agg(
            F.sum("__cgv").alias("__n"),
            F.sum(
                F.when(
                    F.col("__sg") == 1, _dec(F.col("__cgv")) * F.col("__dr")
                ).otherwise(_dec(F.lit(0)))
            ).alias("__w2"),
        )
    )
    ties = per_v.agg(
        F.sum(
            _dec(F.col("__cv")) * _dec(F.col("__cv")) * _dec(F.col("__cv"))
            - _dec(F.col("__cv"))
        ).alias("__t")
    )
    j = agg.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(n_pairs))
    n_d = F.col("__n").cast("double")
    var_w = n_d * (n_d + F.lit(1.0)) * (
        F.lit(2.0) * n_d + F.lit(1.0)
    ) / F.lit(24.0) - F.col("__t").cast("double") / F.lit(48.0)
    z = (
        F.col("__w2").cast("double")
        - n_d * (n_d + F.lit(1.0)) / F.lit(2.0)
    ) / (F.lit(2.0) * F.sqrt(var_w))
    return j.select(
        F.col("__np").alias("n_pairs"),
        F.col("__n").cast("long").alias("n_nonzero"),
        F.col("__w2").cast("long").alias("w2_plus"),
        F.col("__t").cast("long").alias("ties_t"),
        F.when((F.col("__n") > 0) & (var_w > 0.0), z).alias("z"),
    )


def cochran_q(
    df: DataFrame,
    subject_col: str,
    treatment_col: str,
    success_col: str,
) -> DataFrame:
    """Cochran's Q test over a subjects × k-treatments binary grid:
    one row ``(n_subjects, k, q)`` — "did the success RATE change
    across the k repeated conditions" (the k-sample McNemar; k=2
    reduces to it). Missing (subject, treatment) cells are treated
    as 0.

    EXACTNESS: Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²) where C_j =
    treatment totals, R_i = subject totals, N = ΣC = ΣR — numerator
    and denominator are exact DECIMAL(38,0) integers and Q is ONE
    correctly-rounded divide.

    SCALE: two bounded aggregates (per subject, per treatment) over
    the one-pass pivot; the treatment domain is k.
    """
    s = F.col(success_col).cast("long")
    base = df.select(
        F.col(subject_col).alias("__i"),
        F.col(treatment_col).alias("__j"),
        s.alias("__s"),
    )
    per_i = base.groupBy("__i").agg(F.sum("__s").alias("__r"))
    per_j = base.groupBy("__j").agg(F.sum("__s").alias("__c"))
    ri = per_i.agg(
        F.count(F.lit(1)).alias("__ns"),
        F.sum(_dec(F.col("__r"))).alias("__sr"),
        F.sum(_dec(F.col("__r")) * _dec(F.col("__r"))).alias("__sr2"),
    )
    cj = per_j.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum(_dec(F.col("__c")) * _dec(F.col("__c"))).alias("__sc2"),
    )
    j = ri.crossJoin(F.broadcast(cj))
    kk = _dec(F.col("__k"))
    num = (kk - _dec(F.lit(1))) * (
        kk * F.col("__sc2") - F.col("__sr") * F.col("__sr")
    )
    den = kk * F.col("__sr") - F.col("__sr2")
    return j.select(
        F.col("__ns").alias("n_subjects"),
        F.col("__k").cast("long").alias("k"),
        F.when(
            den.cast("double") > 0.0,
            num.cast("double") / den.cast("double"),
        ).alias("q"),
    )


def wasserstein_1(
    df: DataFrame,
    group_col: str,
    value_int: Column,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between two groups'
    distributions over an integral value domain: one row ``(n_a,
    n_b, w1_num, w1_den, w1)`` — "how much probability mass must
    move, and how far" (the magnitude-aware drift measure; TVD
    counts mismatch, W1 also weighs the distance moved).

    EXACTNESS: over the sorted distinct-value domain, W1 =
    Σ_v |F_a(v) − F_b(v)|·Δv with the CDF difference put over the
    common denominator n_a·n_b: each term |cum_a·n_b − cum_b·n_a|·Δv
    is an exact DECIMAL integer. ``w1_num``/``w1_den`` are the exact
    certificate (strings — past 2^63 a long cast wraps); w1 is one
    correctly-rounded divide.

    SCALE: one (group, value) aggregate collapses the corpus; the
    CDF window runs over the distinct-value domain.
    """
    from pyspark.sql import Window

    from aws_datalake_spark.operators.dedup_cluster import _truncate

    v = value_int.cast("long")
    base = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    per_v = _truncate(
        base.groupBy("__v").agg(
            F.sum((F.col("__g") == group_a).cast("long")).alias("__ca"),
            F.sum((F.col("__g") == group_b).cast("long")).alias("__cb"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "__v",
        F.sum("__ca").over(w).alias("__fa"),
        F.sum("__cb").over(w).alias("__fb"),
        (
            F.lead("__v", 1).over(Window.orderBy("__v")) - F.col("__v")
        ).alias("__dv"),
    )
    tot = per_v.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    terms = cum.crossJoin(F.broadcast(tot)).where(
        F.col("__dv").isNotNull()
    ).select(
        (
            F.abs(
                _dec(F.col("__fa")) * _dec(F.col("__nb"))
                - _dec(F.col("__fb")) * _dec(F.col("__na"))
            )
            * _dec(F.col("__dv"))
        ).alias("__term"),
    )
    # aggregate WITHOUT a group key then rejoin totals: a
    # single-distinct-value domain (no Δv rows) must still yield the
    # one W1 = 0 row, not an empty frame
    agg = terms.agg(
        F.coalesce(F.sum("__term"), _dec(F.lit(0))).alias("__num")
    ).crossJoin(F.broadcast(tot))
    den = _dec(F.col("__na")) * _dec(F.col("__nb"))
    return agg.select(
        F.col("__na").alias("n_a"),
        F.col("__nb").alias("n_b"),
        F.col("__num").cast("string").alias("w1_num"),
        den.cast("string").alias("w1_den"),
        F.when(
            den.cast("double") > 0.0,
            F.col("__num").cast("double") / den.cast("double"),
        ).alias("w1"),
    )


def nelson_aalen(
    durations: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate over right-censored
    durations: ``(t, n_risk, d_events, cum_hazard, var_hazard)`` for
    every time with at least one event, H(t) = Σ_{u≤t} d_u/n_u with
    the standard variance Σ d_u/n_u² — the hazard-scale companion to
    :func:`kaplan_meier` (KM multiplies survival factors; NA adds
    hazard increments, the better-behaved quantity for small risk
    sets and the input to hazard-ratio eyeballing).

    EXACTNESS: the same exact risk-set frame as kaplan_meier; each
    increment is one (or two) correctly-rounded divides, and both
    running sums fold in PINNED ascending-t order via the
    cumulative-collect_list ordered reduce — the KM device — so the
    IEEE sums hash-match.

    SCALE: identical to kaplan_meier — the subject table collapses
    to the duration domain in one aggregate.
    """
    from pyspark.sql import Window

    dom = durations.groupBy(
        F.col(duration_col).cast("long").alias("__t")
    ).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(F.col(observed_col).cast("long")).alias("__d"),
    )
    w = Window.orderBy("__t")
    cum = dom.select(
        "__t",
        "__d",
        (
            F.sum("__m").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(
                F.sum("__m").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("__n_risk"),
    )
    nr = F.col("__n_risk").cast("double")
    inc = F.col("__d").cast("double") / nr
    inc2 = F.col("__d").cast("double") / (nr * nr)

    def _runfold(term):
        return F.aggregate(
            F.collect_list(term).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    folded = cum.select(
        "__t",
        "__d",
        "__n_risk",
        _runfold(inc).alias("__h"),
        _runfold(inc2).alias("__v"),
    )
    return folded.where(F.col("__d") > 0).select(
        F.col("__t").alias("t"),
        F.col("__n_risk").cast("long").alias("n_risk"),
        F.col("__d").cast("long").alias("d_events"),
        F.col("__h").alias("cum_hazard"),
        F.col("__v").alias("var_hazard"),
    )


def logrank_test(
    durations: DataFrame,
    group_col: str,
    duration_col: str,
    observed_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Two-group log-rank test over right-censored durations: one row
    ``(n_a, n_b, observed_a, expected_a, z, chi2)`` — "do these two
    cohorts have the same survival curve" (the hypothesis test the
    KM PLOT only suggests). At each event time t: O_A += d_At,
    E_A += d_t·n_At/n_t, V += d_t·(n_At/n_t)·(1−n_At/n_t)·(n_t−d_t)/
    (n_t−1); z = (O_A−E_A)/√V.

    EXACTNESS: per-time at-risk and event counts are exact integers
    (cumulative integer windows over the duration domain); each E/V
    term is a fixed mirrored IEEE tree, and the three accumulations
    fold in PINNED ascending-t order via ordered-list reduces. O_A
    is an exact integer certificate.

    SCALE: one (group × duration) aggregate collapses the subjects;
    every window and fold runs over the duration domain.
    """
    from pyspark.sql import Window

    base = durations.where(
        F.col(group_col).isin([group_a, group_b])
    ).select(
        (F.col(group_col) == group_a).cast("int").alias("__ga"),
        F.col(duration_col).cast("long").alias("__t"),
        F.col(observed_col).cast("long").alias("__o"),
    )
    dom = base.groupBy("__t").agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum("__o").alias("__d"),
        F.sum(F.col("__ga")).alias("__ma"),
        F.sum(F.col("__ga") * F.col("__o")).alias("__da"),
    )
    w = Window.orderBy("__t")

    def _atrisk(mcol: str):
        return F.sum(mcol).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ) - F.coalesce(
            F.sum(mcol).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )

    cum = dom.select(
        "__t",
        "__d",
        "__da",
        _atrisk("__m").alias("__n"),
        _atrisk("__ma").alias("__na"),
    )
    n_d = F.col("__n").cast("double")
    na_d = F.col("__na").cast("double")
    d_d = F.col("__d").cast("double")
    e_term = d_d * na_d / n_d
    v_term = F.when(
        F.col("__n") > 1,
        d_d
        * (na_d / n_d)
        * (F.lit(1.0) - na_d / n_d)
        * ((n_d - d_d) / (n_d - F.lit(1.0))),
    ).otherwise(F.lit(0.0))

    def _fold(term):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__t"), term.alias("__x")))),
                lambda st: st["__x"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    totals = base.groupBy().agg(
        F.sum("__ga").alias("__tna"),
        F.sum(F.lit(1) - F.col("__ga")).alias("__tnb"),
    )
    agg = cum.where(F.col("__d") > 0).groupBy().agg(
        F.sum("__da").alias("__oa"),
        _fold(e_term).alias("__ea"),
        _fold(v_term).alias("__v"),
    )
    j = agg.crossJoin(F.broadcast(totals))
    z = (F.col("__oa").cast("double") - F.col("__ea")) / F.sqrt(
        F.col("__v")
    )
    return j.select(
        F.col("__tna").cast("long").alias("n_a"),
        F.col("__tnb").cast("long").alias("n_b"),
        F.col("__oa").cast("long").alias("observed_a"),
        F.col("__ea").alias("expected_a"),
        F.when(F.col("__v") > 0.0, z).alias("z"),
        F.when(F.col("__v") > 0.0, z * z).alias("chi2"),
    )


def kaplan_meier_by_group(
    durations: DataFrame,
    group_col: str,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Per-group Kaplan–Meier curves: ``(group, t, n_risk, d_events,
    survival)`` — the stratified view behind a log-rank comparison
    (logrank_test answers "are the curves different"; this returns
    the curves). Same exactness contract as :func:`kaplan_meier`
    with every window/fold PARTITIONED by the group key — risk sets
    are exact integers per group and the survival product folds in
    pinned ascending-t order within each partition.

    SCALE: one (group, duration) aggregate collapses the subjects;
    all windows run partitioned over each group's duration domain —
    no single-partition funnel (unlike the global variant, which is
    domain-bounded but unpartitioned).
    """
    from pyspark.sql import Window

    dom = durations.groupBy(
        F.col(group_col).alias("__g"),
        F.col(duration_col).cast("long").alias("__t"),
    ).agg(
        F.count(F.lit(1)).alias("__m"),
        F.sum(F.col(observed_col).cast("long")).alias("__d"),
    )
    w = Window.partitionBy("__g").orderBy("__t")
    cum = dom.select(
        "__g",
        "__t",
        "__d",
        (
            F.sum("__m").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.coalesce(
                F.sum("__m").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("__n_risk"),
    )
    factor = F.lit(1.0) - F.col("__d").cast("double") / F.col(
        "__n_risk"
    ).cast("double")
    folded = cum.select(
        "__g",
        "__t",
        "__d",
        "__n_risk",
        F.aggregate(
            F.collect_list(factor).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(1.0),
            lambda acc, x: acc * x,
        ).alias("__s"),
    )
    return folded.where(F.col("__d") > 0).select(
        F.col("__g").alias(group_col),
        F.col("__t").alias("t"),
        F.col("__n_risk").cast("long").alias("n_risk"),
        F.col("__d").cast("long").alias("d_events"),
        F.col("__s").alias("survival"),
    )
