"""Data-quality expectations engine (SURVEY.md A2/A4-A6, ST2/ST3).

Re-expresses the reference's Great-Expectations-on-Spark notebooks
(/root/reference/great_expectations.py:238-340,
great_expectation_microbatch.py:16-104) as a tiny config-compiled
predicate engine:

* a rule = (column, expectation_type, kwargs), built from a config
  table the way streaming_dq_config rows are
  (great_expectations.py:208-217);
* evaluation computes element_count / unexpected_count per rule in
  ONE aggregation pass over the batch (conditional counts — no
  per-rule scans, no collect);
* results append to an audit sink with the reference's result schema
  (file_identifier, batchID, column_name, expectation_type, success,
  element_count, unexpected_count — great_expectations.py:318-338).

The streaming form wraps :func:`evaluate` in foreachBatch
(streaming/microbatch.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    column: str
    kind: str  # not_null | unique | in_set | matches_regex | between
    kwargs: dict = field(default_factory=dict)

    @property
    def expectation_type(self) -> str:
        return {
            "not_null": "expect_column_values_to_not_be_null",
            "unique": "expect_column_values_to_be_unique",
            "in_set": "expect_column_values_to_be_in_set",
            "matches_regex": "expect_column_values_to_match_regex",
            "between": "expect_column_values_to_be_between",
        }[self.kind]

    def violation(self) -> Column:
        """Predicate that is true for UNEXPECTED (violating) rows.
        ``unique`` is handled separately (needs a grouped count)."""
        c = F.col(self.column)
        if self.kind == "not_null":
            return c.isNull()
        if self.kind == "in_set":
            return ~c.isin(*self.kwargs["values"]) | c.isNull()
        if self.kind == "matches_regex":
            return ~c.rlike(self.kwargs["regex"]) | c.isNull()
        if self.kind == "between":
            lo, hi = self.kwargs["min"], self.kwargs["max"]
            return ~c.between(lo, hi) | c.isNull()
        raise ValueError(self.kind)


def expectations_from_config(rows: list[dict]) -> list[Expectation]:
    """Config rows shaped like streaming_dq_config
    (great_expectations.py:208-217): {'col_name', 'rule', 'Active',
    'kwargs'}; inactive rows are skipped."""
    out = []
    for r in rows:
        if str(r.get("Active", "y")).lower() != "y":
            continue
        out.append(Expectation(column=r["col_name"], kind=r["rule"], kwargs=r.get("kwargs", {})))
    return out


def evaluate(
    df: DataFrame,
    expectations: list[Expectation],
    file_identifier: str = "batch",
    batch_id: int = 0,
) -> DataFrame:
    """Run every expectation in one aggregation pass; return audit
    rows (one per expectation) in the reference's result schema."""
    spark = df.sparkSession
    scalar = [e for e in expectations if e.kind != "unique"]
    uniques = [e for e in expectations if e.kind == "unique"]

    aggs = [F.count(F.lit(1)).alias("__element_count")]
    for i, e in enumerate(scalar):
        aggs.append(F.count(F.when(e.violation(), 1)).alias(f"__unexpected_{i}"))
    row = df.agg(*aggs).collect()[0] if (scalar or uniques) else None
    element_count = int(row["__element_count"]) if row else 0

    results = []
    for i, e in enumerate(scalar):
        unexpected = int(row[f"__unexpected_{i}"])
        results.append((e, unexpected))
    if uniques:
        # rows participating in a duplicated key value are unexpected
        # (Great Expectations counts every row of a dup group). All
        # unique-expectation columns melt into (col_name, value)
        # pairs checked in ONE shuffle/job, not one job per column —
        # at scale the suite cost is constant in expectation count.
        pairs = None
        for e in uniques:
            p = df.select(
                F.lit(e.column).alias("__col"),
                F.col(e.column).cast("string").alias("__val"),
            )
            pairs = p if pairs is None else pairs.unionAll(p)
        dup_rows = {
            r["__col"]: int(r["__dups"])
            for r in (
                pairs.groupBy("__col", "__val")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .groupBy("__col")
                .agg(F.sum("__n").alias("__dups"))
                .collect()
            )
        }
        for e in uniques:
            results.append((e, dup_rows.get(e.column, 0)))

    audit_rows = [
        {
            "file_identifier": file_identifier,
            "batchID": int(batch_id),
            "column_name": e.column,
            "expectation_type": e.expectation_type,
            "success": unexpected == 0,
            "element_count": element_count,
            "unexpected_count": unexpected,
        }
        for e, unexpected in results
    ]
    schema = (
        "file_identifier string, batchID long, column_name string, "
        "expectation_type string, success boolean, element_count long, "
        "unexpected_count long"
    )
    return spark.createDataFrame(audit_rows, schema=schema)


def evaluate_to_sink(
    df: DataFrame,
    expectations: list[Expectation],
    sink_path: str,
    file_identifier: str = "batch",
    batch_id: int = 0,
) -> DataFrame:
    """Evaluate and append the audit rows to a parquet sink — the
    great_expectations_results Delta-append pattern
    (great_expectations.py:337-338)."""
    audit = evaluate(df, expectations, file_identifier, batch_id)
    audit.write.mode("append").parquet(sink_path)
    return audit


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column profile in ONE table scan: for each column —
    ``(col_name, n_rows, n_null, n_distinct, min_s, max_s)`` with
    min/max as strings (typed min/max taken first, cast after, so
    numeric order is preserved).

    Plan shape: a single wide aggregate computes every per-column
    metric map-side-combined, then a `stack` unpivots the one result
    row into |cols| rows — profiling N columns costs one scan, not N
    (the naive per-column loop re-reads the table each time).
    countDistinct compiles to expand+two-phase agg; for very-high-
    cardinality columns at 100 TB swap in approx_count_distinct."""
    aggs: list[Column] = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(col_name, n_rows, n_null, n_distinct, min_s, max_s)"
    )


def category_drift(
    baseline: DataFrame, current: DataFrame, cat_col: str
) -> DataFrame:
    """Batch-over-batch categorical drift: per category, observed
    current count vs expected count (baseline share × current total),
    with the chi-square contribution (o−e)²/e — summed, the classic
    drift statistic, kept log-free so every value is deterministic
    (products/divides of exact counts; the contribution sum uses the
    scaled-long trick).

    SCALE: both inputs collapse to category-sized aggregates before
    anything joins; the full-outer join and the window totals run on
    frames bounded by the category cardinality, never the input.
    """
    b = baseline.groupBy(cat_col).agg(F.count(F.lit(1)).alias("n_base"))
    c = current.groupBy(cat_col).agg(F.count(F.lit(1)).alias("n_cur"))
    from pyspark.sql import Window

    j = (
        b.join(c, cat_col, "full_outer")
        .na.fill(0, ["n_base", "n_cur"])
        .withColumn("t_base", F.sum("n_base").over(Window.partitionBy(F.lit(1))))
        .withColumn("t_cur", F.sum("n_cur").over(Window.partitionBy(F.lit(1))))
    )
    expected = (
        F.col("n_base").cast("double")
        / F.col("t_base").cast("double")
        * F.col("t_cur").cast("double")
    )
    diff = F.col("n_cur").cast("double") - F.col("expected")
    return (
        j.withColumn("expected", expected)
        .filter(F.col("n_base") > 0)
        .select(
            cat_col,
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_cur").cast("long").alias("n_cur"),
            "expected",
            (diff * diff / F.col("expected")).alias("chi2_part"),
        )
    )


def observe_expectations(
    df: DataFrame,
    expectations: list[Expectation],
    name: str = "dq",
):
    """Attach the scalar expectation counters to ``df`` as an
    ``Observation`` — the metrics ride the NEXT action on the
    returned frame (accumulator-style, collected by the driver at
    job end), so the write-then-validate pattern costs ZERO extra
    scans: write the batch, then read the counters.

    This is the scale path for ST2's per-batch gate: :func:`evaluate`
    re-aggregates the batch (fine when validation is the only
    action); this rides the sink write it was going to do anyway.
    Unique-key expectations need a shuffle and cannot ride an
    observation — route those through :func:`evaluate`.

    Returns ``(observed_df, observation, scalar_expectations)``;
    after an action, pass the triple to
    :func:`audit_from_observation`.
    """
    from pyspark.sql import Observation

    scalar = [e for e in expectations if e.kind != "unique"]
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("element_count")]
    for i, e in enumerate(scalar):
        metrics.append(F.count(F.when(e.violation(), 1)).alias(f"unexpected_{i}"))
    return df.observe(obs, *metrics), obs, scalar


def audit_from_observation(
    spark,
    obs,
    scalar: list[Expectation],
    file_identifier: str = "batch",
    batch_id: int = 0,
) -> DataFrame:
    """Audit rows (reference result schema) from a completed
    observation — call only after an action ran on the observed
    frame."""
    got = obs.get
    element_count = int(got["element_count"])
    audit_rows = [
        {
            "file_identifier": file_identifier,
            "batchID": int(batch_id),
            "column_name": e.column,
            "expectation_type": e.expectation_type,
            "success": int(got[f"unexpected_{i}"]) == 0,
            "element_count": element_count,
            "unexpected_count": int(got[f"unexpected_{i}"]),
        }
        for i, e in enumerate(scalar)
    ]
    schema = (
        "file_identifier string, batchID long, column_name string, "
        "expectation_type string, success boolean, element_count long, "
        "unexpected_count long"
    )
    return spark.createDataFrame(audit_rows, schema=schema)


def numeric_drift(
    baseline: DataFrame,
    current: DataFrame,
    col: str,
    n_bins: int = 20,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Batch-over-batch numeric drift as total-variation distance
    over a fixed histogram: ``tvd = 0.5 * Σ_bins |p_i − q_i|`` with
    p/q the per-bin probability masses of baseline/current.

    TVD is chosen over PSI/KL deliberately: it is log-free, so every
    step (bin = floor((x−lo)/w) clamp, count, count/n, |p−q| sum) is
    exact or correctly-rounded IEEE arithmetic that a SQL oracle
    reproduces bit-for-bit, and it is bounded in [0,1] (0 = same
    distribution, 1 = disjoint) which makes thresholds portable
    across columns. Bin range defaults to the BASELINE's min/max —
    current values outside it clamp to the edge bins, so new mass
    beyond the old range still registers as drift.

    SCALE: each input collapses to an ``n_bins``-sized aggregate
    (map-side combinable) before the tiny full-outer join; nothing
    larger than n_bins rows ever shuffles.
    """
    if lo is None or hi is None:
        row = baseline.agg(F.min(col), F.max(col)).collect()[0]
        lo = float(row[0]) if lo is None else lo
        hi = float(row[1]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / n_bins

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        return (
            df.where(F.col(col).isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1))
    j = (
        binned(baseline, "n_base")
        .join(binned(current, "n_cur"), "bin", "full_outer")
        .na.fill(0, ["n_base", "n_cur"])
    )
    p = F.col("n_base").cast("double") / F.sum("n_base").over(w).cast("double")
    q = F.col("n_cur").cast("double") / F.sum("n_cur").over(w).cast("double")
    return (
        j.withColumn("__d", F.abs(p - q))
        .agg(
            (F.lit(0.5) * F.sum(F.round(F.col("__d") * 1e9).cast("long")).cast("double") / F.lit(1e9)).alias("tvd"),
            F.sum("n_base").alias("n_base"),
            F.sum("n_cur").alias("n_cur"),
        )
    )


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (good, quarantined): rows violating ANY
    scalar expectation are diverted with a ``__reasons`` column
    naming every violated expectation — the write-side complement to
    :func:`evaluate` (which only counts): good rows continue to the
    sink, quarantined rows land in a side table for repair/replay.

    One projection computes all violation flags (no per-rule scans);
    the split is two filters over the same tagged frame, which Spark
    evaluates in one pass per sink. Unique-key checks need a shuffle
    and are not row-local — handle those via :func:`evaluate`.
    """
    scalar = [e for e in expectations if e.kind != "unique"]
    reasons = F.array_compact(
        F.array(
            *[
                F.when(e.violation(), F.lit(f"{e.column}:{e.kind}"))
                for e in scalar
            ]
        )
    )
    tagged = df.withColumn("__reasons", reasons)
    good = tagged.filter(F.size("__reasons") == 0).drop("__reasons")
    bad = tagged.filter(F.size("__reasons") > 0)
    return good, bad


def fd_violations(
    df: DataFrame, lhs: list[str], rhs: str,
) -> DataFrame:
    """Functional-dependency check ``lhs → rhs``: one row per LHS key
    that maps to more than one distinct RHS value —
    ``(lhs…, n_rhs_values, n_rows)``. An empty result certifies the
    dependency holds. One map-combinable aggregate (count_distinct
    partials merge); nothing but the violating keys leaves the
    executors.

    The standard schema-inference / conformance primitive the
    expectation suite lacks: uniqueness is FD(key → every column);
    this checks any declared dependency directly.

    NULL counts as its own RHS value (ADVICE r05 #5): a key mapping
    to {NULL, 'x'} reports n_rhs_values = 2 and IS flagged —
    ``countDistinct`` alone ignores NULLs and would silently pass
    it. Implemented as countDistinct(rhs) + max(rhs IS NULL),
    avoiding any coalesce-sentinel collision with real data.
    """
    has_null = F.max(F.when(F.col(rhs).isNull(), 1).otherwise(0))
    return (
        df.groupBy(*lhs)
        .agg(
            (F.countDistinct(rhs) + has_null).alias("n_rhs_values"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .where(F.col("n_rhs_values") > 1)
    )


def ri_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
) -> DataFrame:
    """Referential-integrity check: child rows whose ``fk`` has no
    matching ``pk`` in the parent — ``(fk, n_orphans)`` per orphaned
    key (NULL fks are exempt, SQL FK semantics). Aggregate the child
    to distinct keys FIRST, so the anti-join probes |child keys|
    rows, not |child rows|; broadcast-eligible when the parent key
    set is small.
    """
    keys = (
        child.where(F.col(fk).isNotNull())
        .groupBy(fk)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    return keys.join(
        parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    )


def k_anonymity_audit(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    distinct QI combo with its group size and a ``violates`` flag
    (n < k means the combo re-identifies a group smaller than k —
    the standard release-gate check before publishing a dataset
    keyed by demographic-ish columns).

    SCALE: ONE map-combinable aggregate on the QI key — the corpus
    collapses to |distinct combos| rows before anything else
    happens; no window, no join. Hot combos are by definition the
    SAFE ones (large n), so skew never concentrates violating rows.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(*qi_cols, "n", (F.col("n") < k).alias("violates"))
    )


def l_diversity_audit(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """l-diversity audit — k-anonymity's complement (Machanavajjhala
    et al., ICDE 2006): a QI group can be large (k-safe) yet still
    leak if everyone in it shares the same SENSITIVE value, so each
    distinct QI combo is reported with its size, its count of
    distinct sensitive values, and a ``violates`` flag
    (n_sensitive < l ⇒ a homogeneity attack reads the sensitive
    attribute off the quasi-identifiers alone).

    SCALE: ONE map-combinable aggregate (count + count_distinct) on
    the QI key; the corpus collapses to |distinct combos| rows.
    count_distinct expands to the standard two-phase partial-distinct
    plan — still a single shuffle on the QI key.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .select(
            *qi_cols,
            "n",
            "n_sensitive",
            (F.col("n_sensitive") < l).alias("violates"),
        )
    )


def t_closeness_audit(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_ord_col: str,
    t_threshold_num: int = 1,
    t_threshold_den: int = 4,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the third leg of the release-gate trio: a QI group can be k-safe
    AND l-diverse yet still leak if its sensitive-value DISTRIBUTION
    skews far from the global one (all-distinct-but-all-high salaries
    still tell you the group earns a lot). For an ORDERED sensitive
    attribute with unit ground distance the Earth Mover's Distance
    has the closed form

        EMD(p_g, q) = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_g(j) − q(j))|

    (m = number of ordered values). Over the common denominator
    n_g·N every cumulative term is an exact DECIMAL(38,0) integer:
    ``(qi…, n, emd_num, emd_den, emd, violates)`` with
    emd = emd_num/emd_den and violates ⇔ emd > t (compared in exact
    integers: emd_num·den > num·emd_den — no float in the gate).
    num/den are exact decimal-integer STRINGS: n_g·N·(m−1) exceeds
    2^63 at corpus scale and a long cast would wrap silently
    (ADVICE r07); the float ``emd`` and the exact ``violates`` gate
    are unaffected.

    SCALE: one (QI, value) aggregate collapses the corpus; the dense
    QI×value grid comes from the two bounded marginal frames (missing
    cells MUST contribute); the cumulative window is partitioned by
    QI over the m-row slices. Everything after the first aggregate is
    grid-sized.
    """
    from pyspark.sql import Window

    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cell = (
        df.groupBy(
            *[F.col(c) for c in qi_cols],
            F.col(sensitive_ord_col).alias("__c"),
        )
        .agg(F.count(F.lit(1)).alias("__ngc"))
    )
    per_g = cell.groupBy(*qi_cols).agg(F.sum("__ngc").alias("__ng"))
    per_c = cell.groupBy("__c").agg(F.sum("__ngc").alias("__nc"))
    total = cell.agg(
        F.sum("__ngc").alias("__nn"),
        F.count_distinct("__c").alias("__m"),
    )
    grid = (
        per_g.crossJoin(F.broadcast(per_c))
        .join(cell, [*qi_cols, "__c"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            *qi_cols,
            "__c",
            "__ng",
            "__nn",
            "__m",
            (
                dec(F.coalesce(F.col("__ngc"), F.lit(0))) * dec(F.col("__nn"))
                - dec(F.col("__nc")) * dec(F.col("__ng"))
            ).alias("__d"),
        )
    )
    w = (
        Window.partitionBy(*qi_cols)
        .orderBy("__c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("__cum", F.sum("__d").over(w))
    out = cum.groupBy(*qi_cols, "__ng", "__nn", "__m").agg(
        F.sum(F.abs(F.col("__cum"))).alias("__num")
    )
    den = dec(F.col("__ng")) * dec(F.col("__nn")) * dec(F.col("__m") - 1)
    return out.select(
        *qi_cols,
        F.col("__ng").alias("n"),
        # exact decimal STRINGS, not long (ADVICE r07): n_g·N·(m−1)
        # exceeds 2^63 at corpus scale; the non-ANSI long cast wraps
        # to NULL silently while the gate itself stays exact
        F.col("__num").cast("string").alias("emd_num"),
        den.cast("string").alias("emd_den"),
        F.round(F.col("__num").cast("double") / den.cast("double"), 6).alias(
            "emd"
        ),
        (
            F.col("__num") * dec(F.lit(t_threshold_den))
            > dec(F.lit(t_threshold_num)) * den
        ).alias("violates"),
    )


def freshness_audit(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    sla_seconds: int = 86400,
) -> DataFrame:
    """Per-source freshness/staleness audit — the ingest-observability
    counterpart of the DQ expectation checks: ``(group, n, last_ts,
    lag_seconds, fresh)`` where lag is each group's latest event vs
    the lake-wide latest (the "now" proxy that needs no wall clock,
    so the audit is deterministic and oracle-checkable) and
    fresh ⇔ lag ≤ sla_seconds. A feed whose connector silently died
    shows up as a stale group long before volume metrics move.

    SCALE: one map-combinable (group, max/count) aggregate collapses
    the corpus; the global max is a broadcast scalar over the bounded
    group frame. Exact integer second arithmetic.
    """
    from aws_datalake_spark.operators.dedup_cluster import _truncate

    # the bounded per-group frame feeds TWO consumers (the global max
    # and the output) — materialize once or the corpus scan re-runs
    per = _truncate(
        df.groupBy(F.col(group_col).alias("__g")).agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
    )
    glob = per.agg(F.max("last_ts").alias("__gmax"))
    # exact integer MICROSECONDS (unix_micros ≡ DuckDB epoch_us):
    # second-granularity unix_timestamp would truncate engine-
    # dependently on sub-second data
    lag_us = F.unix_micros(F.col("__gmax")) - F.unix_micros(
        F.col("last_ts")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .withColumn("__lag_us", lag_us)
        .select(
            F.col("__g").alias(group_col),
            F.col("n").cast("long").alias("n"),
            "last_ts",
            F.expr("__lag_us div 1000000").alias("lag_seconds"),
            (
                # multiply in PYTHON: lit(3600)*lit(1000000) is an
                # int32 product and overflows under ANSI
                F.col("__lag_us") <= F.lit(int(sla_seconds) * 1_000_000)
            ).alias("fresh"),
        )
    )
