"""Exact order statistics without a global sort.

``approx_percentile`` trades accuracy for one pass; a global
``orderBy`` pays a full-data shuffle. This operator gets the EXACT
k-th order statistic in O(log_bins(range)) cheap passes: each round
histograms the surviving value range into ``n_bins`` buckets (a
map-side-combinable groupBy on a 4096-key space — a few KiB of
aggregation state per task regardless of input size), locates the
bucket containing the k-th element, and recurses into it. When the
surviving population fits comfortably in one task, a bounded
``sort → take`` finishes exactly.

At 100 TB: every round is a full scan with a pushed-down range
filter but only ~4096 aggregation groups — no shuffle of data rows
ever happens, and the scan count is tiny (doubles with 4096 bins
cut the range 4096× per round; 2-3 rounds typical). The reference
has no quantile surface at all (SURVEY.md §2.5); this is the
idiomatic-Spark scale path, with ``approx_percentile`` as the
one-pass fallback when exactness is negotiable.

Determinism: bucket edges are fixed arithmetic on (lo, hi); counts
are exact; the final take is an exact k-th select — the result is
the unique k-th smallest value, hash-matching a ROW_NUMBER oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantile(
    df: DataFrame,
    col: str,
    q: float,
    n_bins: int = 4096,
    direct_threshold: int = 100_000,
    max_rounds: int = 8,
) -> float:
    """Exact lower-discrete quantile of ``df[col]`` (the value at
    0-indexed position ``floor(q * (n-1))`` in sorted order).

    Raises on an empty input or ``q`` outside [0, 1]. NULLs are
    excluded (SQL aggregate semantics).
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"exact_quantile: q must be in [0, 1], got {q!r}")
    base = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    lo, hi, n = base.agg(
        F.min("v"), F.max("v"), F.count("v")
    ).collect()[0]
    if n == 0:
        raise ValueError("exact_quantile: empty input")
    k = int(q * (n - 1))  # 0-indexed rank wanted within [lo, hi]
    cur = base
    for _ in range(max_rounds):
        if n <= direct_threshold or lo == hi:
            break
        width = (float(hi) - float(lo)) / n_bins
        bin_col = F.least(
            F.lit(n_bins - 1),
            F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)).cast("int"),
        )
        hist = (
            cur.groupBy(bin_col.alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts = {r["b"]: r["c"] for r in hist}
        acc = 0
        target_bin = n_bins - 1
        for b in range(n_bins):
            c = counts.get(b, 0)
            if acc + c > k:
                target_bin = b
                break
            acc += c
        # recurse into the target bucket: k becomes rank within it
        k -= acc
        b_lo = float(lo) + target_bin * width
        b_hi = float(lo) + (target_bin + 1) * width
        # survivors: by the same floor() the histogram used, so the
        # bucket's count matches exactly (no boundary drift)
        cur = cur.where(
            (
                F.least(
                    F.lit(n_bins - 1),
                    F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)).cast(
                        "int"
                    ),
                )
                == target_bin
            )
        )
        lo, hi, n = cur.agg(F.min("v"), F.max("v"), F.count("v")).collect()[0]
        if n == 0:  # cannot happen: k-th element is inside the bucket
            raise RuntimeError("exact_quantile: lost the target bucket")
    # exact finish on the (small) surviving population
    row = cur.orderBy("v").limit(k + 1).orderBy(F.desc("v")).limit(1).collect()
    return row[0]["v"]


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple,
    n_bins: int = 4096,
    direct_threshold: int = 100_000,
    max_rounds: int = 8,
    stats_out: dict | None = None,
) -> list:
    """Exact lower-discrete quantiles for ALL of ``qs`` with ONE
    histogram scan per narrowing round (VERDICT r03 item 3): each
    round groups the active edges by their surviving range (ranges
    are buckets of a common refinement tree — identical or disjoint,
    so one CASE assigns each row to at most one range), histograms
    every distinct range in a single ``groupBy(range, bin)`` pass,
    and advances each edge into its own target bucket. All edges
    finish together in one shared ranking pass over the (small)
    surviving slices.

    Per-pass state is ≤ ``len(qs) × n_bins`` aggregation groups —
    map-side combinable, no data-row shuffle, same contract as
    :func:`exact_quantile`. Bucket membership clamps BOTH ends (cf.
    exact_quantile_by_group): a next-round ``lo`` is a Python-float
    bucket edge, so a survivor may sit below it by one ulp — the
    clamp keeps it in bucket 0 instead of silently dropping it.

    Returns values aligned with ``qs``; raises on empty input.
    ``stats_out`` (optional) receives ``{"rounds": r, "scans": s}``
    so tests can pin the one-scan-per-round guarantee.

    Degenerate distributions (mass piled on one value) stop
    shrinking; the round cap hands them to the finishing pass, which
    is exact regardless — narrowing is purely an optimization (the
    same contract as exact_quantile_by_group). The finish shuffles
    only each edge's survivors, never the input.
    """
    bad = [q for q in qs if not 0.0 <= q <= 1.0]
    if bad:
        raise ValueError(f"exact_quantiles: qs must be in [0, 1], got {bad!r}")
    if not qs:
        if stats_out is not None:
            stats_out["rounds"] = stats_out["scans"] = 0
        return []
    base = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    lo0, hi0, n0 = base.agg(F.min("v"), F.max("v"), F.count("v")).collect()[0]
    if n0 == 0:
        raise ValueError("exact_quantiles: empty input")
    scans = rounds = 0

    def bucket(lo: float, width: float):
        # two-sided clamped floor bucket — the ONE formula used by
        # histogram, survivor membership, and the finish pass alike
        return F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )

    def member(chain: tuple):
        pred = F.lit(True)
        for lo, width, target in chain:
            pred = pred & (bucket(lo, width) == F.lit(target))
        return pred

    # per-edge narrowing state; edges with equal chains share a range
    edges = [
        {"lo": float(lo0), "hi": float(hi0), "n": n0,
         "k": int(q * (n0 - 1)), "chain": ()}
        for q in qs
    ]

    for _ in range(max_rounds):
        act = [e for e in edges if e["n"] > direct_threshold and e["lo"] < e["hi"]]
        if not act:
            break
        rounds += 1
        states: list[tuple] = []
        for e in act:
            if e["chain"] not in states:
                states.append(e["chain"])
        sid_of = {c: i for i, c in enumerate(states)}
        rep = {sid_of[c]: next(e for e in act if e["chain"] == c) for c in states}
        sid_col = None
        bin_col = None
        for c, i in sid_of.items():
            e = rep[i]
            width = (e["hi"] - e["lo"]) / n_bins
            sid_col = (
                F.when(member(c), F.lit(i)) if sid_col is None
                else sid_col.when(member(c), F.lit(i))
            )
            bin_col = (
                F.when(F.col("__sid") == i, bucket(e["lo"], width))
                if bin_col is None
                else bin_col.when(F.col("__sid") == i, bucket(e["lo"], width))
            )
        hist = (
            base.withColumn("__sid", sid_col)
            .where(F.col("__sid").isNotNull())
            .groupBy("__sid", bin_col.alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        scans += 1
        counts: dict = {}
        for r in hist:
            counts.setdefault(r["__sid"], {})[r["b"]] = r["c"]
        for e in act:
            sid = sid_of[e["chain"]]
            width = (e["hi"] - e["lo"]) / n_bins
            acc, target = 0, n_bins - 1
            for b in range(n_bins):
                c = counts.get(sid, {}).get(b, 0)
                if acc + c > e["k"]:
                    target = b
                    break
                acc += c
            e["chain"] = e["chain"] + ((e["lo"], width, target),)
            e["k"] -= acc
            e["n"] = counts.get(sid, {}).get(target, 0)
            e["hi"] = e["lo"] + (target + 1) * width
            e["lo"] = e["lo"] + target * width

    # One shared finishing pass: rank every distinct chain's slice.
    # Chains at this point are pairwise equal-or-DISJOINT, never a
    # proper prefix of another: two edges with the same chain see the
    # same buckets and therefore the same surviving n, so they go
    # inactive together — an edge can only stop "earlier" than
    # another after their chains have already diverged into disjoint
    # buckets. Hence the CASE below assigns each row at most one sid
    # regardless of branch order, and per-sid row_number ranks are
    # exact (the RuntimeError guard would trip loudly otherwise).
    from pyspark.sql import Window

    finals: list[tuple] = []
    for e in edges:
        if e["chain"] not in finals:
            finals.append(e["chain"])
    sid_col = None
    for i, c in enumerate(finals):
        sid_col = (
            F.when(member(c), F.lit(i)) if sid_col is None
            else sid_col.when(member(c), F.lit(i))
        )
    wanted = {
        (finals.index(e["chain"]), e["k"] + 1): None for e in edges
    }
    w = Window.partitionBy("__sid").orderBy("v")
    picked = None
    for sid, rn in wanted:
        cond = (F.col("__sid") == sid) & (F.col("__rn") == rn)
        picked = cond if picked is None else picked | cond
    rows = (
        base.withColumn("__sid", sid_col)
        .where(F.col("__sid").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(picked)
        .collect()
    )
    scans += 1
    got = {(r["__sid"], r["__rn"]): r["v"] for r in rows}
    out = []
    for e in edges:
        v = got.get((finals.index(e["chain"]), e["k"] + 1))
        if v is None:
            raise RuntimeError("exact_quantiles: lost a target rank")
        out.append(v)
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["scans"] = scans
    return out


def exact_weighted_quantile(
    df: DataFrame,
    col: str,
    weight_col: str,
    q_num: int,
    q_den: int,
    n_bins: int = 4096,
    direct_threshold: int = 100_000,
    max_rounds: int = 8,
) -> float:
    """Exact WEIGHTED quantile without a global sort: the smallest
    value ``v`` such that the total integer weight of rows with
    ``col <= v`` reaches ``ceil(W * q_num / q_den)`` (W = total
    weight). The quantile fraction is a RATIONAL (q_num, q_den) and
    weights must be integral, so the target threshold is computed in
    exact integer arithmetic — no float rank drift, bit-identical to
    a cumulative-sum SQL oracle.

    Same narrowing contract as :func:`exact_quantile`: each round is
    one full scan aggregated into <= n_bins weight cells (map-side
    combinable, no data-row shuffle); the finish pass groups the
    surviving slice BY VALUE (ties merge, so the answer is
    well-defined regardless of row order) and picks the crossing
    value. At 100 TB: O(log_bins(range)) cheap scans, bounded
    aggregation state, survivors-only final shuffle.
    """
    if not (q_den > 0 and 0 <= q_num <= q_den):
        raise ValueError(
            f"exact_weighted_quantile: need 0 <= q_num <= q_den, "
            f"got ({q_num}, {q_den})"
        )
    base = df.select(
        F.col(col).alias("v"), F.col(weight_col).cast("long").alias("w")
    ).where(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
    lo, hi, total, n = base.agg(
        F.min("v"), F.max("v"), F.sum("w"), F.count("v")
    ).collect()[0]
    if total is None:
        raise ValueError("exact_weighted_quantile: empty input")
    # smallest cumulative weight that reaches the q-fraction of W
    target = -((-int(total) * q_num) // q_den)  # ceil(W*num/den), exact
    if target == 0:
        target = 1  # q=0 → minimum value
    cur = base
    for _ in range(max_rounds):
        if n <= direct_threshold or lo == hi:
            break
        width = (float(hi) - float(lo)) / n_bins
        bin_col = F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("v") - F.lit(float(lo))) / F.lit(width)).cast("int"),
            ),
        )
        # ONE action per round: per-bin weight + row count + actual
        # value range, all from the same histogram scan (the bin's
        # own min/max give the tightened next-round range)
        hist = (
            cur.groupBy(bin_col.alias("b"))
            .agg(
                F.sum("w").alias("c"),
                F.count("v").alias("cnt"),
                F.min("v").alias("blo"),
                F.max("v").alias("bhi"),
            )
            .collect()
        )
        cells = {r["b"]: r for r in hist}
        acc = 0
        target_bin = n_bins - 1
        for b in range(n_bins):
            r = cells.get(b)
            c = r["c"] if r is not None else 0
            if acc + c >= target:
                target_bin = b
                break
            acc += c
        target -= acc
        cur = cur.where(bin_col == target_bin)
        r = cells.get(target_bin)
        if r is None:  # cannot happen: target weight is inside the bucket
            raise RuntimeError("exact_weighted_quantile: lost the target bucket")
        lo, hi, n = r["blo"], r["bhi"], r["cnt"]
    from pyspark.sql import Window

    # frame bound: distinct values INSIDE the final narrowed bucket
    # only — the histogram-narrowing loop above has already pinned
    # the bucket below the scan-count threshold (r05 sweep)
    wsum = Window.orderBy("vv").rowsBetween(Window.unboundedPreceding, 0)
    rows = (
        cur.groupBy(F.col("v").alias("vv"))
        .agg(F.sum("w").alias("ww"))
        .withColumn("cum", F.sum("ww").over(wsum))
        .where(F.col("cum") >= target)
        .orderBy("vv")
        .limit(1)
        .collect()
    )
    if not rows:
        raise RuntimeError("exact_weighted_quantile: lost the target weight")
    return rows[0]["vv"]


def exact_weighted_quantile_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    weight_col: str,
    q_num: int,
    q_den: int,
    n_bins: int = 256,
    direct_threshold: int = 50_000,
    max_rounds: int = 8,
) -> DataFrame:
    """:func:`exact_weighted_quantile` lifted to all groups at once —
    ``(group_col, quantile)`` where quantile is the smallest value
    whose per-group cumulative integer weight reaches
    ``ceil(W_g * q_num / q_den)``. Same contract as
    :func:`exact_quantile_by_group`: every narrowing round is ONE
    scan histogramming every active group's weights simultaneously
    (≤ groups × n_bins agg cells to the driver), shrunk groups drop
    out, and the single finish pass ranks each surviving slice
    grouped BY VALUE (ties merge — the answer is row-order-free)
    with a per-group window over survivors only.
    """
    if not (q_den > 0 and 0 <= q_num <= q_den):
        raise ValueError(
            "exact_weighted_quantile_by_group: need 0 <= q_num <= q_den, "
            f"got ({q_num}, {q_den})"
        )
    base = df.select(
        F.col(group_col).alias("__g"),
        F.col(col).alias("v"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("v").isNotNull() & F.col("w").isNotNull() & (F.col("w") > 0))
    stats = {}
    for r in (
        base.groupBy("__g")
        .agg(
            F.min("v").alias("lo"), F.max("v").alias("hi"),
            F.sum("w").alias("tw"), F.count("v").alias("n"),
        )
        .collect()
    ):
        if r["__g"] is None:
            # a NULL group key cannot ride the create_map narrowing
            # maps; fail loudly instead of silently dropping the group
            raise ValueError(
                "exact_weighted_quantile_by_group: NULL group key — "
                "filter or fill the group column first"
            )
        target = -((-int(r["tw"]) * q_num) // q_den) or 1
        stats[r["__g"]] = {
            "lo": float(r["lo"]), "hi": float(r["hi"]),
            "n": r["n"], "target": target,
        }
    if not stats:
        return df.select(F.col(group_col), F.col(col).alias("quantile")).limit(0)
    surv = base
    for _ in range(max_rounds):
        active = {
            g: s for g, s in stats.items()
            if s["n"] > direct_threshold and s["lo"] < s["hi"]
        }
        if not active:
            break
        lo_m = F.create_map(*[x for g, s in active.items() for x in (F.lit(g), F.lit(s["lo"]))])
        w_m = F.create_map(*[
            x for g, s in active.items()
            for x in (F.lit(g), F.lit((s["hi"] - s["lo"]) / n_bins))
        ])
        bin_e = F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col("v") - lo_m[F.col("__g")]) / w_m[F.col("__g")]
                ).cast("int"),
            ),
        )
        hist = (
            surv.filter(F.col("__g").isin(list(active)))
            .groupBy("__g", bin_e.alias("b"))
            .agg(F.sum("w").alias("c"), F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        cells: dict = {}
        for r in hist:
            cells.setdefault(r["__g"], {})[r["b"]] = (r["c"], r["cnt"])
        targets = {}
        for g, s in active.items():
            acc, target_bin = 0, n_bins - 1
            rows_in_bin = 0
            for b in range(n_bins):
                c, cnt = cells.get(g, {}).get(b, (0, 0))
                if acc + c >= s["target"]:
                    target_bin, rows_in_bin = b, cnt
                    break
                acc += c
            width = (s["hi"] - s["lo"]) / n_bins
            stats[g] = {
                "lo": s["lo"] + target_bin * width,
                "hi": s["lo"] + (target_bin + 1) * width,
                "n": rows_in_bin,
                "target": s["target"] - acc,
            }
            targets[g] = target_bin
        t_m = F.create_map(*[x for g, tb in targets.items() for x in (F.lit(g), F.lit(tb))])
        surv = surv.filter(
            (~F.col("__g").isin(list(active))) | (bin_e == t_m[F.col("__g")])
        )
    from pyspark.sql import Window

    from pyspark.sql.types import LongType, StructField, StructType

    # schema from the ACTUAL group-column type (a one-sample
    # isinstance sniff would mistype e.g. date keys)
    g_type = base.schema["__g"].dataType
    t_tbl = F.broadcast(
        df.sparkSession.createDataFrame(
            [(g, s["target"]) for g, s in stats.items()],
            StructType([
                StructField("__g", g_type),
                StructField("__target", LongType()),
            ]),
        )
    )
    w = Window.partitionBy("__g").orderBy("vv")
    cum = Window.partitionBy("__g").orderBy("vv").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        surv.groupBy("__g", F.col("v").alias("vv"))
        .agg(F.sum("w").alias("ww"))
        .withColumn("__cum", F.sum("ww").over(cum))
        .join(t_tbl, "__g")
        .filter(F.col("__cum") >= F.col("__target"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col("__g").alias(group_col), F.col("vv").alias("quantile"))
    )


def exact_quantile_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    q: float,
    n_bins: int = 256,
    direct_threshold: int = 50_000,
    max_rounds: int = 8,
) -> DataFrame:
    """Exact lower-discrete quantile PER GROUP — ``(group_col,
    quantile)`` — with the same no-global-sort contract as
    :func:`exact_quantile`, lifted to all groups at once: every
    narrowing round is ONE scan histogramming every active group
    simultaneously (groupBy(group, bin), ≤ groups × n_bins rows to
    the driver), groups that shrink below ``direct_threshold`` drop
    out of later rounds, and the single finishing pass ranks each
    group's surviving slice with a per-group window (shuffles only
    survivors, never the input).

    Groups whose mass piles onto one value stop shrinking; the round
    cap hands them to the finish pass, which is exact regardless —
    narrowing is purely an optimization.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(
            f"exact_quantile_by_group: q must be in [0, 1], got {q!r}"
        )
    base = df.select(
        F.col(group_col).alias("__g"), F.col(col).alias("v")
    ).where(F.col("v").isNotNull())
    stats = {
        r["__g"]: {"lo": float(r["lo"]), "hi": float(r["hi"]), "n": r["n"],
                   "k": int(q * (r["n"] - 1))}
        for r in base.groupBy("__g")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n"))
        .collect()
    }
    if not stats:
        return df.select(F.col(group_col), F.col(col).alias("quantile")).limit(0)
    surv = base
    for _ in range(max_rounds):
        active = {
            g: s for g, s in stats.items()
            if s["n"] > direct_threshold and s["lo"] < s["hi"]
        }
        if not active:
            break
        lo_m = F.create_map(*[x for g, s in active.items() for x in (F.lit(g), F.lit(s["lo"]))])
        w_m = F.create_map(*[
            x for g, s in active.items()
            for x in (F.lit(g), F.lit((s["hi"] - s["lo"]) / n_bins))
        ])
        # Clamp BOTH ends: next-round lo is a Python-float bucket edge
        # (lo + target*width), so a survivor can sit below it by one
        # ulp — without the lower clamp its bin would be -1 and the row
        # would silently vanish from histogram and survivors alike.
        bin_e = F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (F.col("v") - lo_m[F.col("__g")]) / w_m[F.col("__g")]
                ).cast("int"),
            ),
        )
        hist = (
            surv.filter(F.col("__g").isin(list(active)))
            .groupBy("__g", bin_e.alias("b"))
            .agg(F.count("*").alias("c"))
            .collect()
        )
        counts: dict = {}
        for r in hist:
            counts.setdefault(r["__g"], {})[r["b"]] = r["c"]
        targets = {}
        for g, s in active.items():
            acc, target = 0, n_bins - 1
            for b in range(n_bins):
                c = counts.get(g, {}).get(b, 0)
                if acc + c > s["k"]:
                    target = b
                    break
                acc += c
            width = (s["hi"] - s["lo"]) / n_bins
            stats[g] = {
                "lo": s["lo"] + target * width,
                "hi": s["lo"] + (target + 1) * width,
                "n": counts.get(g, {}).get(target, 0),
                "k": s["k"] - acc,
            }
            targets[g] = target
        t_m = F.create_map(*[x for g, t in targets.items() for x in (F.lit(g), F.lit(t))])
        # survivors: SAME floor arithmetic as the histogram, so bucket
        # membership cannot drift on boundary values
        surv = surv.filter(
            (~F.col("__g").isin(list(active))) | (bin_e == t_m[F.col("__g")])
        )
    from pyspark.sql import Window

    from pyspark.sql.types import LongType, StructField, StructType

    # schema from the ACTUAL group-column type (same rule as
    # exact_weighted_quantile_by_group; a one-sample isinstance sniff
    # would mistype e.g. date keys)
    k_tbl = F.broadcast(
        df.sparkSession.createDataFrame(
            [(g, s["k"]) for g, s in stats.items()],
            StructType([
                StructField("__g", base.schema["__g"].dataType),
                StructField("__k", LongType()),
            ]),
        )
    )
    w = Window.partitionBy("__g").orderBy("v")
    return (
        surv.withColumn("__rn", F.row_number().over(w))
        .join(k_tbl, "__g")
        .filter(F.col("__rn") == F.col("__k") + 1)
        .select(F.col("__g").alias(group_col), F.col("v").alias("quantile"))
    )


def exact_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    col: str,
    qs: tuple,
    n_bins: int = 256,
    direct_threshold: int = 50_000,
    max_rounds: int = 8,
    max_edges: int = 2048,
) -> DataFrame:
    """Exact lower-discrete quantiles PER GROUP for ALL of ``qs`` —
    ``(group_col, __qi, quantile)`` with ``__qi`` the index into
    ``qs`` — sharing ONE histogram scan per narrowing round across
    every (group, q) edge (callers that need two quantiles of the
    same frame previously paid two full narrowing passes).

    Mechanics: each (group, q) edge keeps a driver-side CHAIN of
    (lo, width, target-bin) triples — its narrowing history. A row
    belongs to an edge iff it reproduces every chain step under the
    SAME clamped-floor arithmetic the histogram used (so bucket
    membership cannot drift on boundary values, exactly as in
    :func:`exact_quantile_by_group`), which also keeps edges of one
    group independent after their ranges diverge. Per round: one
    scan exploding each row's active-edge memberships (≤ |edges|
    cheap predicates per row) → groupBy(edge, bin) histogram →
    driver advances each edge one bucket. The finish pass ranks each
    edge's surviving slice with one per-edge window — survivors
    only, never the input. Same exactness contract as
    :func:`exact_quantile_by_group` (narrowing is purely an
    optimization; the cap hands degenerate edges to the exact
    finish)."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(
                f"exact_quantiles_by_group: q must be in [0, 1], got {q!r}"
            )
    base = df.select(
        F.col(group_col).alias("__g"), F.col(col).alias("v")
    ).where(F.col("v").isNotNull())
    g_rows = (
        base.groupBy("__g")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("v").alias("n"),
        )
        .collect()
    )
    if not g_rows:
        return (
            df.select(
                F.col(group_col),
                F.lit(0).alias("__qi"),
                F.col(col).alias("quantile"),
            ).limit(0)
        )
    if len(g_rows) * len(qs) > max_edges:
        # High-cardinality guard (VERDICT r10 item 3): the narrowing
        # path compiles one membership predicate per (group, q) edge
        # into a single projection and collects an |edges|×bins
        # histogram per round — O(|groups|) expression size breaks
        # codegen / the driver well before 10k groups. Fall back to
        # the classic exact form: ONE exchange by group, one
        # in-partition sort, row_number, and a per-row match against
        # the ≤|qs| literal targets. Same IEEE k = trunc(q·(n−1))
        # arithmetic → identical results.
        from pyspark.sql import Window

        cnt = base.groupBy("__g").agg(F.count(F.lit(1)).alias("__n"))
        w = Window.partitionBy("__g").orderBy("v")
        targets = F.filter(
            F.array(*[
                F.struct(
                    F.lit(i).alias("__qi"),
                    (
                        F.floor(
                            F.lit(float(q))
                            * (F.col("__n") - F.lit(1)).cast("double")
                        ).cast("long")
                        + F.lit(1)
                    ).alias("__k"),
                )
                for i, q in enumerate(qs)
            ]),
            lambda s: s["__k"] == F.col("__rn"),
        )
        return (
            base.withColumn("__rn", F.row_number().over(w))
            .join(cnt, "__g")
            .select("__g", "v", F.explode(targets).alias("__t"))
            .select(
                F.col("__g").alias(group_col),
                F.col("__t.__qi").alias("__qi"),
                F.col("v").alias("quantile"),
            )
        )
    edges: dict = {}
    for r in g_rows:
        for i, q in enumerate(qs):
            edges[(r["__g"], i)] = {
                "lo": float(r["lo"]), "hi": float(r["hi"]), "n": r["n"],
                "k": int(q * (r["n"] - 1)), "chain": [],
            }

    def _bin(lo: float, width: float):
        return F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )

    def _member(g, chain):
        pred = F.col("__g") == F.lit(g)
        for lo_j, w_j, t_j in chain:
            pred = pred & (_bin(lo_j, w_j) == F.lit(t_j))
        return pred

    eids = {key: i for i, key in enumerate(edges)}
    for _ in range(max_rounds):
        active = {
            key: s for key, s in edges.items()
            if s["n"] > direct_threshold and s["lo"] < s["hi"]
        }
        if not active:
            break
        memb_cols = []
        for key, s in active.items():
            width = (s["hi"] - s["lo"]) / n_bins
            memb_cols.append(
                F.when(
                    _member(key[0], s["chain"]),
                    F.struct(
                        F.lit(eids[key]).alias("e"),
                        _bin(s["lo"], width).alias("b"),
                    ),
                )
            )
        hist = (
            base.select(F.explode(F.array(*memb_cols)).alias("x"))
            .where(F.col("x").isNotNull())
            .groupBy(F.col("x.e").alias("e"), F.col("x.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        counts: dict = {}
        for r in hist:
            counts.setdefault(r["e"], {})[r["b"]] = r["c"]
        for key, s in active.items():
            cs = counts.get(eids[key], {})
            acc, target = 0, n_bins - 1
            for b in range(n_bins):
                c = cs.get(b, 0)
                if acc + c > s["k"]:
                    target = b
                    break
                acc += c
            width = (s["hi"] - s["lo"]) / n_bins
            s["chain"].append((s["lo"], width, target))
            s["lo"] = s["lo"] + target * width
            s["hi"] = s["lo"] + width
            s["n"] = cs.get(target, 0)
            s["k"] = s["k"] - acc
    # finish: one pass ranking every edge's surviving slice
    from pyspark.sql import Window
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    fin_cols = [
        F.when(_member(key[0], s["chain"]), F.lit(eids[key]))
        for key, s in edges.items()
    ]
    slices = base.select(
        "v", F.explode(F.array(*fin_cols)).alias("__e")
    ).where(F.col("__e").isNotNull())
    k_tbl = F.broadcast(
        df.sparkSession.createDataFrame(
            [(eids[key], s["k"]) for key, s in edges.items()],
            StructType([
                StructField("__e", IntegerType()),
                StructField("__k", LongType()),
            ]),
        )
    )
    id_tbl = F.broadcast(
        df.sparkSession.createDataFrame(
            [(eids[key], key[0], key[1]) for key in edges],
            StructType([
                StructField("__e", IntegerType()),
                StructField("__g", base.schema["__g"].dataType),
                StructField("__qi", IntegerType()),
            ]),
        )
    )
    w = Window.partitionBy("__e").orderBy("v")
    return (
        slices.withColumn("__rn", F.row_number().over(w))
        .join(k_tbl, "__e")
        .filter(F.col("__rn") == F.col("__k") + 1)
        .join(id_tbl, "__e")
        .select(
            F.col("__g").alias(group_col),
            "__qi",
            F.col("v").alias("quantile"),
        )
    )


def precision_recall_at_deciles(
    scored: DataFrame,
    score_col: str,
    pos_col: str,
) -> DataFrame:
    """Precision/recall/F1 at the ten decile cuts of a score ranking:
    ``(decile, k, tp, precision, recall, f1)`` where each cut is the
    FIRST score boundary whose descending-cumulative count covers
    decile·N/10 rows (cuts land on score-domain boundaries, so ties
    never straddle a threshold and the curve is deterministic).

    EXACTNESS: per-score (n, positives) counts collapse the corpus;
    cumulative k/tp are exact integers over the sorted score DOMAIN;
    precision = tp/k, recall = tp/P, and F1 = 2tp/(k + P) are each
    ONE correctly-rounded divide of exact integers (F1 simplifies to
    an exact rational because P·R/(P+R) shares the tp factor).

    SCALE: one map-combinable (score → n, pos) aggregate; the
    cumulative window runs over the score domain (the exact_auc
    discipline), never corpus rows; the decile probe is a broadcast
    10-row cross join.
    """
    from pyspark.sql import Window

    dom = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(pos_col).cast("long")).alias("__np"),
    )
    w = Window.orderBy(F.desc("__s"))
    cum = dom.select(
        F.sum("__n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__k"),
        F.sum("__np")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__tp"),
        F.sum("__n")
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__total"),
        F.sum("__np")
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__pos"),
    )
    deciles = scored.sparkSession.range(1, 11).select(
        F.col("id").alias("decile")
    )
    hit = cum.crossJoin(F.broadcast(deciles)).where(
        F.col("__k") * 10 >= F.col("decile") * F.col("__total")
    )
    agg = hit.groupBy("decile").agg(
        F.min("__k").alias("k"),
        F.min_by("__tp", "__k").alias("tp"),
        F.min("__pos").alias("__p"),
    )
    return agg.select(
        "decile",
        F.col("k").cast("long").alias("k"),
        F.col("tp").cast("long").alias("tp"),
        F.round(
            F.col("tp").cast("double") / F.col("k").cast("double"), 6
        ).alias("precision"),
        # NULL recall/F1 when there are no positives at all (ANSI
        # divide-by-zero guard; k >= 1 always, __p can be 0)
        F.when(
            F.col("__p") > 0,
            F.round(
                F.col("tp").cast("double") / F.col("__p").cast("double"),
                6,
            ),
        ).alias("recall"),
        F.when(
            F.col("k") + F.col("__p") > 0,
            F.round(
                F.lit(2.0) * F.col("tp").cast("double")
                / (F.col("k") + F.col("__p")).cast("double"),
                6,
            ),
        ).alias("f1"),
    )


def lorenz_curve(
    df: DataFrame,
    value_int: Column,
    n_points: int = 10,
) -> DataFrame:
    """Lorenz curve at ``n_points`` population cuts: subjects sorted
    by value ASCENDING, each cut reports the cumulative share of the
    total held by the bottom fraction — ``(point, n_cum, value_cum,
    share)`` (point i ≈ bottom i/n_points of subjects). The
    concentration CURVE behind the Gini number (q_shard_skew_gini)
    and the ABC classes (q_abc_pareto): "the bottom 80% of customers
    hold 31% of revenue".

    EXACTNESS: cuts land on value-DOMAIN boundaries (first cumulative
    count covering i·N/points — ties never straddle a cut); n_cum /
    value_cum are exact integers; share is one correctly-rounded
    divide.

    SCALE: one (value → count) aggregate collapses the corpus; the
    cumulative window runs over the value domain; the cut probe is a
    broadcast n_points-row cross join.
    """
    from pyspark.sql import Window

    dom = df.select(value_int.cast("long").alias("__v")).groupBy(
        "__v"
    ).agg(F.count(F.lit(1)).alias("__n"))
    w = Window.orderBy("__v")
    cum = dom.select(
        F.sum("__n")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__k"),
        F.sum(F.col("__v").cast("decimal(38,0)") * F.col("__n"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__vc"),
        F.sum("__n")
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__total"),
        F.sum(F.col("__v").cast("decimal(38,0)") * F.col("__n"))
        .over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__vtotal"),
    )
    pts = df.sparkSession.range(1, n_points + 1).select(
        F.col("id").alias("point")
    )
    hit = cum.crossJoin(F.broadcast(pts)).where(
        F.col("__k") * n_points >= F.col("point") * F.col("__total")
    )
    agg = hit.groupBy("point").agg(
        F.min("__k").alias("n_cum"),
        F.min_by("__vc", "__k").alias("__vcum"),
        F.min("__vtotal").alias("__vt"),
    )
    return agg.select(
        "point",
        F.col("n_cum").cast("long").alias("n_cum"),
        F.col("__vcum").cast("long").alias("value_cum"),
        # NULL share when the total is zero (ANSI divide-by-zero guard)
        F.when(
            F.col("__vt") > 0,
            F.col("__vcum").cast("double") / F.col("__vt").cast("double"),
        ).alias("share"),
    )
